"""Luma SSIM on display-encoded/PU values (reference: pycvvdp/ssim_metric.py
+ vendored pytorch-msssim semantics: 11x11 Gaussian sigma=1.5 window, valid
separable convolution, K=(0.01, 0.03), data_range=1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import register_metric, vq_metric


def _gauss_win(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return g / g.sum()


def _filt2_valid(x, win: np.ndarray):
    """Separable valid convolution over the last two axes."""
    k = len(win)
    for axis in (-2, -1):
        x = jnp.moveaxis(x, axis, -1)
        n = x.shape[-1] - k + 1
        acc = None
        for i in range(k):
            term = win[i] * x[..., i : i + n]
            acc = term if acc is None else acc + term
        x = jnp.moveaxis(acc, -1, axis)
    return x


def ssim_index(X, Y, data_range: float = 1.0, win_size: int = 11,
               win_sigma: float = 1.5, K=(0.01, 0.03)):
    """Mean SSIM between two images/batches over the last two axes."""
    win = _gauss_win(win_size, win_sigma)
    K1, K2 = K
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu1 = _filt2_valid(X, win)
    mu2 = _filt2_valid(Y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filt2_valid(X * X, win) - mu1_sq
    sigma2_sq = _filt2_valid(Y * Y, win) - mu2_sq
    sigma12 = _filt2_valid(X * Y, win) - mu1_mu2
    cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    return jnp.mean(ssim_map)


def get_luma(img):
    return (
        0.212656 * img[..., 0, :, :, :]
        + 0.715158 * img[..., 1, :, :, :]
        + 0.072186 * img[..., 2, :, :, :]
    )


class ssim_metric(vq_metric):
    """Mean per-frame luma SSIM (reference: ssim_metric.py:17-58)."""

    def __init__(self, display_name="standard_4k", display_photometry=None,
                 color_space="sRGB", device=None, config_paths=None):
        self.set_display_model(
            display_name=display_name, display_photometry=display_photometry,
            config_paths=config_paths,
        )
        self.color_space = color_space
        self._jit_index = jax.jit(ssim_index)

    def predict_video_source(self, vid_source):
        _, _, N_frames = vid_source.get_video_size()
        acc = 0.0
        for ff in range(N_frames):
            T = get_luma(vid_source.get_test_frame(
                ff, colorspace="display_encoded_100nit"
            ))
            R = get_luma(vid_source.get_reference_frame(
                ff, colorspace="display_encoded_100nit"
            ))
            acc = acc + self._jit_index(T, R)
        return acc / N_frames, None

    def short_name(self):
        return "SSIM"

    def quality_unit(self):
        return ""


# Not CLI-registered in the reference either (imported directly by the CLI,
# reference: run_cvvdp.py:27); we register it so `-m ssim-metric` works.
register_metric(ssim_metric)
