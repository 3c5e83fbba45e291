"""Pallas TPU kernel: per-pixel castleCSF LUT lookup (with custom VJP).

The CSF sensitivity is a piecewise-linear function (32 breakpoints over
log-luminance) evaluated per pixel for up to four channels. Expressed in
plain XLA this becomes either a gather (catastrophic tile padding on TPU) or
a ~128-term fused select chain (blows the scoped-VMEM budget at video sizes).
Here it is one Pallas kernel: the tables are baked in as immediate constants,
the breakpoint scan runs as a compact VPU loop per tile, and the output is
written once — a single memory-bound pass. The backward pass (needed for the
metric's differentiable ``loss`` mode) is a second kernel computing the
analytic derivative d(10^interp)/d(logL).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TILE_ROWS = 256  # (256, 128) fp32 tile = 128 KB per buffer
_LN10 = math.log(10.0)


def _interp_acc(logL, luts, x0, scale, with_slope):
    n = luts.shape[1]
    ind = jnp.clip((logL - x0) * scale, 0.0, float(n - 1))
    i0 = jnp.floor(ind)
    frc = ind - i0
    vals, slopes = [], []
    for c in range(luts.shape[0]):
        acc = None
        sacc = None
        for k in range(n - 1):
            v0 = float(luts[c, k])
            v1 = float(luts[c, k + 1])
            seg = v0 + frc * (v1 - v0)
            hit = i0 == float(k)
            term = jnp.where(hit, seg, 0.0)
            acc = term if acc is None else acc + term
            if with_slope:
                sterm = jnp.where(hit, v1 - v0, 0.0)
                sacc = sterm if sacc is None else sacc + sterm
        acc = acc + jnp.where(i0 == float(n - 1), float(luts[c, n - 1]), 0.0)
        vals.append(acc)
        slopes.append(sacc)
    return ind, vals, slopes


def _fwd_kernel(logL_ref, out_ref, *, luts, x0, scale):
    from .masking_fused import _exp10

    _, vals, _ = _interp_acc(logL_ref[:], luts, x0, scale, with_slope=False)
    for c in range(luts.shape[0]):
        out_ref[c] = _exp10(vals[c])


def _bwd_kernel(logL_ref, g_ref, out_ref, *, luts, x0, scale):
    n = luts.shape[1]
    x = logL_ref[:]
    ind, vals, slopes = _interp_acc(x, luts, x0, scale, with_slope=True)
    # d ind / d logL is `scale` inside the clip range, 0 outside it.
    raw = (x - x0) * scale
    in_range = jnp.logical_and(raw > 0.0, raw < float(n - 1))
    dind = jnp.where(in_range, scale, 0.0)
    from .masking_fused import _exp10

    acc = None
    for c in range(luts.shape[0]):
        S = _exp10(vals[c])
        term = g_ref[c] * S * _LN10 * slopes[c] * dind
        acc = term if acc is None else acc + term
    out_ref[:] = acc


def _pad_2d(logL, x0):
    orig_shape = logL.shape
    P = int(np.prod(orig_shape))
    rows = -(-P // _LANE)
    rows_pad = -(-rows // _TILE_ROWS) * _TILE_ROWS
    flat = jnp.ravel(logL)
    flat = jnp.pad(flat, (0, rows_pad * _LANE - P), constant_values=x0)
    return flat.reshape(rows_pad, _LANE), orig_shape, P, rows_pad


_FN_CACHE: dict = {}


def _make_lookup(luts_key, luts, x0, x1):
    C, n = luts.shape
    scale = float((n - 1) / (x1 - x0))
    interp = jax.default_backend() != "tpu"

    def _forward_natural(logL):
        """Tile directly over the trailing (H, W) dims — no relayout."""
        orig_shape = logL.shape
        H, W = orig_shape[-2], orig_shape[-1]
        L = int(np.prod(orig_shape[:-2])) if len(orig_shape) > 2 else 1
        x3 = logL.reshape(L, H, W)
        # Cap the (C+1) double-buffered fp32 tiles to ~6 MB of VMEM: a full
        # 4K row block (C=4, 128, 3840) alone is 7.9 MB and trips the 16 MB
        # scoped-vmem limit.
        tw = W if W <= 1024 else 1024
        budget = 6 * 1024 * 1024 // (2 * (C + 1) * 4 * tw)
        th = max(8, min(128, budget, H) // 8 * 8)
        grid = (L, -(-H // th), -(-W // tw))
        kern = functools.partial(_fwd_kernel, luts=luts, x0=float(x0),
                                 scale=scale)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec((1, th, tw), lambda l, i, j: (l, i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, 1, th, tw),
                                   lambda l, i, j: (0, l, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, L, H, W), jnp.float32),
            interpret=interp,
        )(x3)
        return out.reshape((C,) + orig_shape)

    def forward(logL):
        if (logL.ndim >= 2 and logL.shape[-1] >= _LANE
                and logL.shape[-2] >= 8):
            return _forward_natural(logL)
        x2d, orig_shape, P, rows_pad = _pad_2d(logL, x0)
        kern = functools.partial(_fwd_kernel, luts=luts, x0=float(x0),
                                 scale=scale)
        out = pl.pallas_call(
            kern,
            grid=(rows_pad // _TILE_ROWS,),
            in_specs=[pl.BlockSpec((_TILE_ROWS, _LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, _TILE_ROWS, _LANE),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, rows_pad, _LANE), jnp.float32),
            interpret=interp,
        )(x2d)
        return out.reshape(C, rows_pad * _LANE)[:, :P].reshape(
            (C,) + orig_shape
        )

    def backward(logL, g):
        x2d, orig_shape, P, rows_pad = _pad_2d(logL, x0)
        gflat = g.reshape(C, -1)
        gpad = jnp.pad(gflat, ((0, 0), (0, rows_pad * _LANE - P)))
        g2d = gpad.reshape(C, rows_pad, _LANE)
        kern = functools.partial(_bwd_kernel, luts=luts, x0=float(x0),
                                 scale=scale)
        out = pl.pallas_call(
            kern,
            grid=(rows_pad // _TILE_ROWS,),
            in_specs=[
                pl.BlockSpec((_TILE_ROWS, _LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, _TILE_ROWS, _LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_TILE_ROWS, _LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad, _LANE), jnp.float32),
            interpret=interp,
        )(x2d, g2d)
        return out.reshape(-1)[:P].reshape(orig_shape)

    @jax.custom_vjp
    def lookup(logL):
        return forward(logL)

    def lookup_fwd(logL):
        return forward(logL), (logL,)

    def lookup_bwd(res, g):
        (logL,) = res
        return (backward(logL, g),)

    lookup.defvjp(lookup_fwd, lookup_bwd)
    return lookup


def _jnp_lookup(logL, luts: np.ndarray, x0: float, x1: float):
    """Pure-jnp hat-basis evaluation (CPU fallback: exact same math, no
    Pallas; natively differentiable)."""
    C, n = luts.shape
    scale = (n - 1) / (x1 - x0)
    ind = jnp.clip((logL - x0) * scale, 0.0, float(n - 1))
    outs = []
    for c in range(C):
        acc = None
        for k in range(n):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(ind - float(k)))
            term = float(luts[c, k]) * w
            acc = term if acc is None else acc + term
        outs.append(10.0**acc)
    return jnp.stack(outs)


# When True, csf_lut_lookup uses the pure-jnp hat-basis path even on TPU.
# Set (with save/restore) while tracing GSPMD-sharded programs: XLA cannot
# partition a Pallas custom call, but the jnp chain shards cleanly.
FORCE_JNP = False


def csf_lut_lookup(logL, luts: np.ndarray, x0: float, x1: float):
    """Evaluate ``10**interp1q(logL)`` for each channel.

    logL: traced array, any shape. luts: static numpy (C, n) table of log10
    sensitivities sampled uniformly over [x0, x1]. Returns (C, *logL.shape).
    Differentiable w.r.t. logL (custom VJP with an analytic derivative on
    TPU; natively differentiable jnp elsewhere).
    """
    luts = np.asarray(luts, np.float32)
    if FORCE_JNP or jax.default_backend() != "tpu":
        return _jnp_lookup(logL, luts, float(x0), float(x1))
    key = (luts.tobytes(), float(x0), float(x1))
    if key not in _FN_CACHE:
        _FN_CACHE[key] = _make_lookup(key, luts, float(x0), float(x1))
    return _FN_CACHE[key](logL)
