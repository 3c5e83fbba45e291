"""Pyramid parity: band geometry goldens + reduce/expand vs the reference
oracle, including the odd/even edge-correction quirk."""

import jax.numpy as jnp
import numpy as np
import pytest

from colorvideovdp_tpu.ops import pyramid as pyr


def test_band_freqs_1024x683():
    freqs, height = pyr.pyramid_band_freqs(1024, 683, 75.40244934516305)
    assert height + 1 == 9
    np.testing.assert_allclose(
        freqs,
        [37.701225, 12.169955, 6.084978, 3.042489, 1.521244, 0.760622,
         0.380311, 0.190156, 0.095078],
        rtol=1e-5,
    )


@pytest.mark.parametrize("H,W", [(64, 64), (63, 64), (64, 63), (63, 63),
                                 (17, 33), (48, 96)])
def test_reduce_matches_reference(reference, H, W):
    import torch

    rng = np.random.RandomState(0)
    x = rng.rand(2, 1, H, W).astype(np.float32) * 100
    lp = reference.lpyr_dec.lpyr_dec(W, H, 60.0, torch.device("cpu"))
    ref = lp.gausspyr_reduce(torch.tensor(x)).numpy()
    got = np.asarray(pyr.gausspyr_reduce(x))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("H,W", [(32, 32), (31, 33), (33, 31), (20, 50)])
def test_expand_matches_reference(reference, H, W):
    import torch

    rng = np.random.RandomState(1)
    x = rng.rand(2, 1, (H + 1) // 2, (W + 1) // 2).astype(np.float32)
    lp = reference.lpyr_dec.lpyr_dec(W, H, 60.0, torch.device("cpu"))
    ref = lp.gausspyr_expand(torch.tensor(x), [H, W]).numpy()
    got = np.asarray(pyr.gausspyr_expand(x, (H, W)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_weber_contrast_pyramid_matches_reference(reference):
    import torch

    rng = np.random.RandomState(2)
    R = (rng.rand(1, 6, 1, 48, 64).astype(np.float32) * 100 + 1.0)
    ref_pyr = reference.lpyr_dec.weber_contrast_pyr(
        64, 48, 60.0, torch.device("cpu"), contrast="weber_g1"
    )
    Br, Lr = ref_pyr.decompose(torch.tensor(R))
    mine = pyr.WeberContrastPyramid(64, 48, 60.0, contrast="weber_g1")
    Bm, Lm = mine.decompose(R)
    assert len(Bm) == len(Br)
    for bb in range(len(Br)):
        np.testing.assert_allclose(
            np.asarray(Bm[bb]), Br[bb].numpy(), atol=2e-5
        )
        # Our pyramid returns only the reference-channel log-luminance.
        ref_logL = Lr[bb].numpy()
        ref_logL = ref_logL[..., 1:2, :, :, :] if ref_logL.shape[-4] == 2 \
            else ref_logL
        np.testing.assert_allclose(np.asarray(Lm[bb]), ref_logL, atol=1e-4)


def test_reconstruct_inverts_decompose():
    rng = np.random.RandomState(3)
    x = rng.rand(1, 1, 40, 56).astype(np.float32)
    lp = pyr.LaplacianPyramid(56, 40, 60.0)
    bands, _ = lp.decompose(x)
    recon = np.asarray(lp.reconstruct(bands))
    np.testing.assert_allclose(recon, x, atol=1e-5)


@pytest.mark.parametrize("shape,exp", [
    ((3, 540, 960), (1080, 1920)),   # B=64 lane blocks
    ((2, 135, 240), (270, 480)),     # odd rows, small W (riffle gated off)
    ((1, 17, 480), (34, 960)),       # odd-length interleave + trailing even
    ((1, 50, 257), (99, 513)),       # odd W: stack+reshape fallback
    ((2, 64, 1920), (128, 3840)),    # B=128 lane blocks (4K band-0 shape)
])
def test_expand_mxu_riffle_bit_equal(shape, exp, monkeypatch):
    """The MXU riffle interleave (ops/pyramid.py:_riffle_mxu) must be
    bit-identical to the stack+reshape form: 0/1 scatter matrices at
    HIGHEST precision reproduce each operand exactly (disjoint-mantissa
    bf16 decomposition on TPU; a single x*1 FMA plus exact zeros on CPU)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32) * 100 - 50)
    monkeypatch.setenv("CVVDP_MXU_INTERLEAVE", "0")
    a = np.asarray(pyr.gausspyr_expand(x, exp))
    monkeypatch.setenv("CVVDP_MXU_INTERLEAVE", "1")
    b = np.asarray(pyr.gausspyr_expand(x, exp))
    assert np.array_equal(a, b)
