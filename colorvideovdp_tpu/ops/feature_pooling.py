"""Per-tile feature statistics for the ML metric heads.

Mean/variance of (S*|T|, S*|R|, D) over ~1-visual-degree tiles (reference:
pycvvdp/cvvdp_ml_metric.py:77-103). Replicates torch AvgPool2d with
ceil_mode=True: edge windows are clipped to the input and divide by the
number of valid samples.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _avg_pool_ceil(x, fs: int):
    """Average pool over the last two axes with window fs, stride fs,
    ceil_mode=True. x: (..., H, W)."""
    H, W = x.shape[-2], x.shape[-1]
    oh = -(-H // fs)
    ow = -(-W // fs)
    pad_h = oh * fs - H
    pad_w = ow * fs - W
    xp = jnp.pad(
        x, [(0, 0)] * (x.ndim - 2) + [(0, pad_h), (0, pad_w)]
    )
    xr = xp.reshape(x.shape[:-2] + (oh, fs, ow, fs))
    sums = xr.sum(axis=(-3, -1))
    # Valid-sample counts per output cell (edge windows are smaller).
    ch = np.minimum(np.arange(1, oh + 1) * fs, H) - np.arange(0, oh) * fs
    cw = np.minimum(np.arange(1, ow + 1) * fs, W) - np.arange(0, ow) * fs
    counts = np.outer(ch, cw).astype(np.float32)
    return sums / jnp.asarray(counts)


def feature_pooling(T, R, D, feature_size: int):
    """T, R, D: (B, C, F, H, W) -> features (B, F, h', w', C, 6) with the six
    statistics (mean_T, var_T, mean_R, var_R, mean_D, var_D)."""
    def stats(x):
        m = _avg_pool_ceil(x, feature_size)
        v = _avg_pool_ceil(x * x, feature_size) - m * m
        return m, v

    mean_T, var_T = stats(T)
    mean_R, var_R = stats(R)
    mean_D, var_D = stats(D)
    F = jnp.stack([mean_T, var_T, mean_R, var_R, mean_D, var_D], axis=-1)
    # (B, C, F, h', w', 6) -> (B, F, h', w', C, 6)
    return jnp.transpose(F, (0, 2, 3, 4, 1, 5))
