"""Interpret-mode parity tests for the TPU-only Pallas kernels.

These kernels are gated to the TPU backend in production (`jax.default_backend
() == "tpu"`), so the CPU golden suite never traces them; here they run in
Pallas interpret mode against the XLA reference paths so a semantic
regression fails on CPU before it ever reaches hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import colorvideovdp_tpu as cv
from colorvideovdp_tpu.ops import pyramid as pyr
from colorvideovdp_tpu.ops.kernels.pyramid_reduce import (
    can_reduce_tpu,
    reduce_tpu,
)


@pytest.mark.parametrize("shape", [(3, 256, 512), (2, 272, 320),
                                   (1, 544, 960), (6, 64, 256)])
def test_reduce_kernel_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = rng.rand(*shape).astype(np.float32)
    if not can_reduce_tpu(x.shape):
        pytest.skip(f"shape {shape} not kernel-eligible")
    y_ref = np.asarray(pyr.gausspyr_reduce(jnp.asarray(x)))
    y_k = np.asarray(reduce_tpu(jnp.asarray(x), interpret=True))
    assert y_k.shape == y_ref.shape
    assert np.abs(y_ref - y_k).max() < 1e-6 * max(1.0, np.abs(y_ref).max())


@pytest.mark.parametrize("contrast", ["weber_g1", "weber_g1_ref"])
def test_expand_contrast_kernel_matches_xla(contrast):
    from colorvideovdp_tpu.ops.kernels.pyramid_expand import (
        can_expand_tpu,
        expand_contrast_tpu,
    )

    rng = np.random.RandomState(1)
    C, F, H, W = 6, 2, 96, 1280
    if not can_expand_tpu((C, F, H, W), contrast):
        pytest.skip("shape not kernel-eligible")
    gi = (rng.rand(1, C, F, H, W).astype(np.float32) * 100.0)
    gnext = (rng.rand(1, C, F, (H + 1) // 2, (W + 1) // 2)
             .astype(np.float32) * 100.0)

    # XLA reference: the decompose() interior-level branch verbatim.
    glayer_ex = pyr.gausspyr_expand(jnp.asarray(gnext), (H, W))
    layer = jnp.asarray(gi) - glayer_ex
    if contrast == "weber_g1_ref":
        L_bkg = jnp.clip(glayer_ex[..., 1:2, :, :, :], 0.01, None)
        con_ref = jnp.clip(layer / L_bkg, None, 1000.0)
        logl_ref = jnp.log10(L_bkg)
    else:
        L_bkg = jnp.clip(glayer_ex[..., 0:2, :, :, :], 0.01, None)
        t = jnp.clip(layer[..., 0::2, :, :, :] / L_bkg[..., 0:1, :, :, :],
                     None, 1000.0)
        r = jnp.clip(layer[..., 1::2, :, :, :] / L_bkg[..., 1:2, :, :, :],
                     None, 1000.0)
        con_ref = jnp.stack([t, r], axis=-4).reshape(layer.shape)
        logl_ref = jnp.log10(L_bkg[..., 1:2, :, :, :])

    ve = pyr._expand_1d(jnp.asarray(gnext), -2, H)
    con_k, logl_k = expand_contrast_tpu(
        jnp.asarray(gi).reshape(C, F, H, W),
        ve.reshape(C, F, H, ve.shape[-1]),
        ref_only=contrast.endswith("ref"),
        interpret=True,
    )
    assert np.abs(np.asarray(con_ref).reshape(C, F, H, W)
                  - np.asarray(con_k)).max() < 1e-4
    assert np.abs(np.asarray(logl_ref).reshape(1, F, H, W)[0]
                  - np.asarray(logl_k)).max() < 1e-5


@pytest.mark.parametrize("padding", ["replicate", "symmetric"])
def test_ingest_kernel_video_parity(padding):
    """force_fused routes the video front end through the Pallas ingest
    kernel (interpret mode on CPU); JOD must match the XLA path."""
    rng = np.random.RandomState(3)
    H, W, N, fps = 48, 128, 12, 30
    V_ref = np.repeat((rng.rand(H, W, 3, 1) * 255).astype(np.uint8), N,
                      axis=3)
    noise = rng.randn(*V_ref.shape) * 0.04
    V_test = ((V_ref.astype(np.float32) / 255 + noise).clip(0, 1)
              * 255).astype(np.uint8)

    kw = dict(display_name="standard_4k", quiet=True, temp_padding=padding,
              gpu_mem=1e-9)  # force block_N_frames == 1 => tail mode too
    m0 = cv.cvvdp(**kw)
    Q0, _ = m0.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    m1 = cv.cvvdp(**kw)
    m1.force_fused = True
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    assert abs(float(Q0) - float(Q1)) < 1e-4, (float(Q0), float(Q1))


@pytest.mark.parametrize("shape,ks,sigma", [
    ((3, 128, 256), 13, 3.0),
    ((2, 96, 640), 13, 3.0),
    ((1, 88, 300), 5, 1.2),
])
def test_blur_kernel_matches_xla(shape, ks, sigma):
    from colorvideovdp_tpu.ops import blur as bl
    from colorvideovdp_tpu.ops.kernels.blur_halo import (
        blur_tpu,
        can_blur_tpu,
    )

    rng = np.random.RandomState(7)
    x = rng.rand(*shape).astype(np.float32)
    if not can_blur_tpu(x.shape, ks):
        pytest.skip("not kernel-eligible")
    k = bl.gaussian_kernel1d(ks, sigma)
    y_ref = np.asarray(bl._blur_1d(bl._blur_1d(jnp.asarray(x), k, -2),
                                   k, -1))
    y_k = np.asarray(blur_tpu(jnp.asarray(x), k, interpret=True))
    assert np.abs(y_ref - y_k).max() < 1e-6
