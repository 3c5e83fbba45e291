"""Shared helpers for the examples (distortion generators, colour utils)."""

import numpy as np
from scipy.ndimage import gaussian_filter


def imnoise(clean, std, static=False, peak=None):
    """Add zero-mean Gaussian noise in normalised units."""
    dtype = clean.dtype
    if peak is None:
        peak = 1 if dtype.kind == "f" else np.iinfo(dtype).max
    if static:
        h, w, c, N = clean.shape  # frame axis last
        noise = np.repeat(np.random.randn(h, w, c, 1) * std, N, axis=-1)
    else:
        noise = np.random.randn(*clean.shape) * std
    noisy = clean.astype(np.float32) / peak + noise
    return (noisy.clip(0, 1) * peak).astype(dtype)


# BT.709 full-range RGB <-> YCbCr (standard matrix constants).
_RGB2YCBCR = np.array(
    [[0.2126, 0.7152, 0.0722],
     [-0.114572, -0.385428, 0.5],
     [0.5, -0.454153, -0.045847]], np.float32)
_YCBCR2RGB = np.linalg.inv(_RGB2YCBCR).astype(np.float32)


def srgb2ycbcr(rgb):
    """(H, W, 3) sRGB -> full-range BT.709 YCbCr."""
    return rgb.astype(np.float32) @ _RGB2YCBCR.T


def ycbcr2srgb(yuv):
    return yuv.astype(np.float32) @ _YCBCR2RGB.T


def imgaussblur(clean, sigmas):
    """Per-frame separable Gaussian blur (scipy, mode='nearest')."""
    if clean.ndim == 3:
        clean = clean[..., np.newaxis]
    if np.isscalar(sigmas):
        sigmas = np.repeat(sigmas, clean.shape[-1])
    blur = np.zeros_like(clean)
    for ff, sigma in enumerate(sigmas):
        for cc in range(3):
            blur[..., cc, ff] = gaussian_filter(
                clean[..., cc, ff], sigma, mode="nearest", truncate=2.0
            )
    return blur.squeeze()
