"""Separable Gaussian blur with reflect padding.

Replicates torchvision ``GaussianBlur`` as used for phase uncertainty and
texture masking (reference: pycvvdp/cvvdp_metric.py:157-159,963-971):
1-D kernel exp(-0.5 (x/sigma)^2) normalised to 1, reflect (edge-excluded)
padding, applied separably over the last two axes.

Each pass operates natively along its axis with shifted slices — no
transposes (layout changes are among the most expensive ops on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size, dtype=np.float32)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def _blur_1d(x, k: np.ndarray, axis: int):
    r = (len(k) - 1) // 2
    nd = x.ndim
    ax = axis % nd
    pad = [(0, 0)] * nd
    pad[ax] = (r, r)
    xp = jnp.pad(x, pad, mode="reflect")
    n = x.shape[ax]
    y = None
    for i in range(len(k)):
        term = float(k[i]) * lax.slice_in_dim(xp, i, i + n, axis=ax)
        y = term if y is None else y + term
    return y


def gaussian_blur(x, kernel_size: int, sigma: float):
    """Blur the last two axes of ``x``."""
    k = gaussian_kernel1d(kernel_size, sigma)
    return _blur_1d(_blur_1d(x, k, -2), k, -1)
