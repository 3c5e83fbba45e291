"""LUT interpolation primitives (host + device variants).

Mirrors the reference semantics (reference: pycvvdp/interp.py) with
TPU-friendly implementations: uniform-grid interpolation is index arithmetic
plus a small gather, non-uniform interpolation uses searchsorted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def np_batch_interp1d(x, xp, fp):
    """Row-wise linear interpolation with linear extrapolation, numpy/fp32.

    ``fp`` is (rows, len(xp)); ``x`` is (rows,). Equivalent to the reference
    ``batch_interp1d`` (interp.py:152-178): clamp the segment index to
    [0, len(xp)-2] and extrapolate linearly beyond both ends.
    """
    x = np.asarray(x, np.float32)
    xp = np.asarray(xp, np.float32)
    fp = np.asarray(fp, np.float32)
    idx = np.clip(np.searchsorted(xp, x) - 1, 0, len(xp) - 2)
    x0, x1 = xp[idx], xp[idx + 1]
    y0 = fp[np.arange(fp.shape[0]), idx]
    y1 = fp[np.arange(fp.shape[0]), idx + 1]
    slope = (y1 - y0) / (x1 - x0)
    return y0 + slope * (x - x0)


def interp1q_weights(x0: float, x_end: float, n: int, x_q):
    """Uniform-grid interpolants: returns (imin, imax, frac) for queries
    ``x_q`` on a grid of ``n`` samples spanning [x0, x_end] (reference:
    interp.py:55-60). Queries are clamped to the grid."""
    ind = jnp.clip((x_q - x0) / (x_end - x0) * (n - 1), 0.0, float(n - 1))
    imin = ind.astype(jnp.int32)
    frc = ind - imin.astype(ind.dtype)
    imax = jnp.minimum(imin + 1, n - 1)
    return imin, imax, frc


def interp1q(x, v, x_q):
    """Uniformly-sampled LUT lookup (reference: interp.py:92-100).
    ``x``/``v`` are 1-D device arrays; ``x_q`` any shape."""
    imin, imax, frc = interp1q_weights(x[0], x[-1], x.shape[0], x_q)
    return jnp.take(v, imin) * (1.0 - frc) + jnp.take(v, imax) * frc


def _interpolants_nonuniform(x_q, x):
    """Bucketed interpolants for a non-uniform grid (reference:
    interp.py:22-31). Clamps out-of-range queries; adds the reference's
    1e-6 denominator epsilon."""
    imax = jnp.searchsorted(x, x_q, side="right")
    imax = jnp.minimum(imax, x.shape[0] - 1)
    imin = jnp.clip(imax - 1, 0, x.shape[0] - 1)
    ifrc = (x_q - jnp.take(x, imin)) / (jnp.take(x, imax) - jnp.take(x, imin) + 1e-6)
    ifrc = jnp.where(imax == imin, 0.0, ifrc)
    ifrc = jnp.where(ifrc < 0.0, 0.0, ifrc)
    return imin, imax, ifrc


def interp1(x, v, x_q):
    """Non-uniform 1-D LUT lookup (reference: interp.py:81-89)."""
    imin, imax, ifrc = _interpolants_nonuniform(x_q, x)
    return jnp.take(v, imin) * (1.0 - ifrc) + jnp.take(v, imax) * ifrc


def interp1dim2(x, v, x_q):
    """Resample axis 1 of ``v`` at query points ``x_q`` (reference:
    interp.py:109-121). ``x`` and ``x_q`` are 1-D."""
    imin, imax, ifrc = _interpolants_nonuniform(x_q, x)
    sh = [1] * v.ndim
    sh[1] = ifrc.shape[0]
    ifrc = ifrc.reshape(sh)
    return jnp.take(v, imin, axis=1) * (1.0 - ifrc) + jnp.take(v, imax, axis=1) * ifrc


def interp3(x, y, z, v, x_q, y_q, z_q):
    """Trilinear interpolation on a 3-D LUT ``v[y, x, z]`` (reference:
    interp.py:63-79)."""
    shp = x_q.shape
    x_q, y_q, z_q = (a.flatten() for a in (x_q, y_q, z_q))
    imin, imax, ifrc = _interpolants_nonuniform(x_q, x)
    jmin, jmax, jfrc = _interpolants_nonuniform(y_q, y)
    kmin, kmax, kfrc = _interpolants_nonuniform(z_q, z)
    out = (
        (v[jmin, imin, kmin] * (1 - ifrc) + v[jmin, imax, kmin] * ifrc) * (1 - jfrc)
        + (v[jmax, imin, kmin] * (1 - ifrc) + v[jmax, imax, kmin] * ifrc) * jfrc
    ) * (1 - kfrc) + (
        (v[jmin, imin, kmax] * (1 - ifrc) + v[jmin, imax, kmax] * ifrc) * (1 - jfrc)
        + (v[jmax, imin, kmax] * (1 - ifrc) + v[jmax, imax, kmax] * ifrc) * jfrc
    ) * kfrc
    return out.reshape(shp)
