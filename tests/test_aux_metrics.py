"""Aux metrics (psnr_rgb, pu_psnr_y, pu_psnr_rgb2020, ssim) vs the reference
oracle on a seeded image pair (reference: pycvvdp/psnr_metric.py,
pycvvdp/ssim_metric.py)."""

import numpy as np
import pytest

from colorvideovdp_tpu.metrics.psnr import psnr_rgb, pu_psnr_rgb2020, pu_psnr_y
from colorvideovdp_tpu.metrics.ssim import ssim_metric


@pytest.fixture(scope="module")
def pair():
    from PIL import Image

    ref = np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )[100:196, 200:328]
    rng = np.random.RandomState(3)
    noise = rng.randn(*ref.shape) * 12.0
    test = np.clip(ref.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    return test, ref


def _ref_value(reference, cls_name, test, ref, **kwargs):
    import torch

    if hasattr(reference, cls_name):
        cls = getattr(reference, cls_name)
    else:
        # ssim_metric is not re-exported at package top level (the reference
        # CLI imports it from its module, run_cvvdp.py:27).
        import pycvvdp.ssim_metric as ref_ssim

        cls = getattr(ref_ssim, cls_name)
    m = cls(display_name="standard_4k", device=torch.device("cpu"), **kwargs)
    with torch.no_grad():
        Q, _ = m.predict(test, ref, dim_order="HWC")
    return float(Q)


@pytest.mark.parametrize("cls,ref_name", [
    (psnr_rgb, "psnr_rgb"),
    (pu_psnr_y, "pu_psnr_y"),
    (pu_psnr_rgb2020, "pu_psnr_rgb2020"),
])
def test_psnr_matches_oracle(reference, pair, cls, ref_name):
    test, ref = pair
    m = cls(display_name="standard_4k")
    Q, _ = m.predict(test, ref, dim_order="HWC")
    Q = float(np.asarray(Q).reshape(-1)[0])
    Q_ref = _ref_value(reference, ref_name, test, ref)
    assert Q == pytest.approx(Q_ref, abs=1e-3), (Q, Q_ref)


def test_ssim_matches_oracle(reference, pair):
    test, ref = pair
    m = ssim_metric(display_name="standard_4k")
    Q, _ = m.predict(test, ref, dim_order="HWC")
    Q = float(np.asarray(Q).reshape(-1)[0])
    Q_ref = _ref_value(reference, "ssim_metric", test, ref)
    assert Q == pytest.approx(Q_ref, abs=1e-4), (Q, Q_ref)


def test_psnr_identical_pair_is_inf_free(pair):
    """Identical inputs: reference yields inf dB; we should match that
    behaviour (no crash, inf value)."""
    _, ref = pair
    m = psnr_rgb(display_name="standard_4k")
    Q, _ = m.predict(ref, ref, dim_order="HWC")
    assert np.isinf(float(np.asarray(Q).reshape(-1)[0]))
