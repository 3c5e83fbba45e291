"""End-to-end image-path parity against the reference oracle and minted
goldens."""

import numpy as np
import pytest

import colorvideovdp_tpu as cv


@pytest.fixture(scope="module")
def wavy():
    from PIL import Image

    return np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )


def _blur(img, sigma=2.0):
    from scipy.ndimage import gaussian_filter

    out = np.zeros_like(img)
    for cc in range(3):
        out[:, :, cc] = gaussian_filter(img[:, :, cc], sigma, mode="nearest",
                                        truncate=2.0)
    return out


def test_blur_golden(wavy):
    m = cv.cvvdp(display_name="standard_4k")
    Q, stats = m.predict(_blur(wavy), wavy, dim_order="HWC")
    assert abs(float(Q) - 8.518456) < 0.005
    # Per-band features (BASELINE.md stage goldens), channels Ach/RG/YV.
    gold = np.array([
        [3.738553, 72.65038, 42.17788, 15.98913, 1.846401, 0.06112236,
         0.007023416, 0.02828912, 0.08452180],
        [6.435398, 39.17907, 9.629950, 2.918908, 0.8375531, 0.06492398,
         0.02340811, 0.3351972, 0.1466828],
        [0.6816489, 4.323902, 2.025141, 1.024767, 0.6011291, 0.1641636,
         0.1824552, 0.1721288, 0.1673864],
    ])
    got = stats["Q_per_ch"][0, :, 0, :]
    np.testing.assert_allclose(got, gold, rtol=5e-3, atol=5e-4)
    assert stats["rho_band"][0] == pytest.approx(37.701225, rel=1e-5)


def test_noise_golden(wavy):
    m = cv.cvvdp(display_name="standard_4k")
    np.random.seed(7)
    noise = np.random.randn(*wavy.shape) * np.sqrt(0.003)
    noisy = ((wavy.astype(np.float32) / 255 + noise).clip(0, 1) * 255).astype(
        np.uint8
    )
    Q, _ = m.predict(noisy, wavy, dim_order="HWC")
    assert abs(float(Q) - 8.953716) < 0.005


def test_small_image_matches_oracle(reference, wavy):
    """Full pipeline on a crop, cross-checked against the reference code
    running in-process."""
    import torch

    crop_ref = wavy[100:196, 200:328]  # 96x128
    crop_test = _blur(wavy)[100:196, 200:328]

    m = cv.cvvdp(display_name="standard_4k")
    Q, _ = m.predict(crop_test, crop_ref, dim_order="HWC")

    ref_m = reference.cvvdp(display_name="standard_4k", quiet=True,
                            device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(crop_test, crop_ref, dim_order="HWC")
    assert abs(float(Q) - float(Q_ref)) < 2e-3


def test_luminance_only_matches_oracle(reference, wavy):
    import torch

    L = (wavy.astype(np.float32).mean(axis=2) / 255 * 200 + 0.5)[100:196,
                                                                 200:328]
    Lb = _blur(np.repeat(L[:, :, None], 3, axis=2))[:, :, 0]

    pm = cv.vvdp_display_photo_eotf(Y_peak=200, contrast=1000,
                                    source_colorspace="luminance",
                                    EOTF="linear")
    gm = cv.vvdp_display_geometry((128, 96), ppd=75.4)
    m = cv.cvvdp(display_photometry=pm, display_geometry=gm)
    Q, _ = m.predict(Lb[:, :, None], L[:, :, None], dim_order="HWC")

    ref_pm = reference.vvdp_display_photo_eotf(
        Y_peak=200, contrast=1000, source_colorspace="luminance",
        EOTF="linear")
    ref_gm = reference.vvdp_display_geometry((128, 96), ppd=75.4)
    ref_m = reference.cvvdp(display_photometry=ref_pm, display_geometry=ref_gm,
                            quiet=True, device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(Lb[:, :, None], L[:, :, None],
                                 dim_order="HWC")
    assert abs(float(Q) - float(Q_ref)) < 2e-3


def test_batch_of_images(wavy):
    crop = wavy[:64, :96]
    t = np.stack([crop, _blur(wavy)[:64, :96]], axis=0)  # batch of 2 tests
    r = np.stack([crop, crop], axis=0)
    m = cv.cvvdp(display_name="standard_4k")
    Q, _ = m.predict(t, r, dim_order="BHWC")
    Q = np.asarray(Q)
    assert Q.shape == (2,)
    assert Q[0] > 9.9  # identical pair -> ~10 JOD
    assert Q[1] < Q[0]


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="grad-graph compile takes ~7 min on this single-core host; "
    "gradient correctness is covered by test_sharding's dryrun",
)
def test_loss_fn_gradients(wavy):
    """Public differentiable loss: finite gradients that point from a noisy
    image toward the reference."""
    import jax
    import jax.numpy as jnp

    crop = wavy[:64, :96].astype(np.float32) / 255.0
    ref = crop.transpose(2, 0, 1)[None, :, None]
    rng = np.random.RandomState(0)
    test = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.1,
                   0, 1)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    loss_fn = m.get_loss_fn(64, 96)
    val, g = jax.value_and_grad(loss_fn)(jnp.asarray(test),
                                         jnp.asarray(ref))
    assert np.isfinite(float(val)) and float(val) > 0
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0
    # One gradient step should reduce the loss.
    val2 = loss_fn(jnp.asarray(test) - 1e-2 * jnp.sign(g), jnp.asarray(ref))
    assert float(val2) < float(val)


def test_predict_under_debug_nans(wavy):
    """Sanitizer harness (SURVEY §5.2): the whole image pipeline runs under
    jax.debug_nans — any hidden NaN produced by log/pow/division in the
    perceptual core would raise here."""
    import jax

    jax.config.update("jax_debug_nans", True)
    try:
        crop = wavy[:64, :96]
        m = cv.cvvdp(display_name="standard_4k", quiet=True)
        Q, _ = m.predict(crop, crop, dim_order="HWC")
        assert float(Q) == 10.0
    finally:
        jax.config.update("jax_debug_nans", False)
