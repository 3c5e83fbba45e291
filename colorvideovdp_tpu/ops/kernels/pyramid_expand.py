"""Pallas TPU kernel: fused pyramid expand + Weber contrast + log-luminance.

Per interior pyramid level the metric computes expand(G_{i+1}), the
Laplacian layer G_i - expand, the Weber division by the expanded sustained
channels, the 1000-contrast clip and log10 of the reference adaptation
field (reference: lpyr_dec.py:358-414). In XLA that chain costs ~6 full-
size HBM materialisations per level (~16 ms/frame at 4K across levels).

Split: the vertical polyphase expand runs in XLA (pyramid._expand_1d — it
is bit-exact and needs cross-tile rows), producing ``ve`` at (H, W/2).
This kernel then does, per row tile, the horizontal polyphase expand in
the transposed orientation (Mosaic cannot interleave along lanes), the
subtraction, the Weber division and the logL — one read of G_i and ve,
one write of contrast and logL.

Supports the calibrated contrasts ``weber_g1`` / ``weber_g1_ref`` with
even W >= 256; other modes and tiny levels use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pyramid import K5

# Disabled pending a vmem redesign: the transposed orientation pads the tile
# height (lanes) to 128, blowing the 16 MB scoped-vmem limit at W>=1024 and
# OOM-killing the axon compile helper at 4K. The interpret-mode parity test
# keeps the semantics pinned while the layout is reworked.
ENABLED = False


def _expand_h_T(plane, W):
    """Horizontal polyphase expand of one (th, W/2) plane, returned
    TRANSPOSED as (W, th). Bit-exact vs pyramid._expand_1d(axis=-1)."""
    th = plane.shape[0]
    Wh = plane.shape[1]
    vT = plane.T  # (Wh, th)
    xp = jnp.concatenate([vT[0:1], vT, vT[Wh - 1:Wh]], axis=0)
    k0, k1, k2, k3, k4 = (2.0 * float(K5[t]) for t in range(5))
    no = W // 2  # == n_even for even W
    ev = k0 * xp[0:no] + k2 * xp[1:no + 1] + k4 * xp[2:no + 2]
    od = k1 * xp[1:no + 1] + k3 * xp[2:no + 2]
    st = jnp.stack([ev, od], axis=1)  # (no, 2, th)
    return st.reshape(W, th)


def _expand_contrast_kernel(gi_ref, ve_ref, c_ref, logl_ref, *, C, W,
                            ref_only):
    exT = [_expand_h_T(ve_ref[c, 0], W) for c in range(C)]  # (W, th) each
    giT = [gi_ref[c, 0].T for c in range(C)]

    lb_r = jnp.maximum(exT[1], 0.01)
    lb_t = lb_r if ref_only else jnp.maximum(exT[0], 0.01)
    for c in range(C):
        layer = giT[c] - exT[c]
        con = layer / (lb_t if c % 2 == 0 else lb_r)
        c_ref[c, 0] = jnp.minimum(con, 1000.0).T
    logl_ref[0] = (jnp.log10(lb_r)).T


def expand_contrast_tpu(gi, ve, ref_only: bool, interpret=None):
    """gi: (C, F, H, W) Gaussian level; ve: (C, F, H, W/2) vertically
    expanded next level. Returns (contrast (C, F, H, W), logL (F, H, W))."""
    C, F, H, W = gi.shape
    assert W % 2 == 0 and ve.shape == (C, F, H, W // 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # ~<=6 MB of double-buffered fp32 planes per step.
    per_row = (2 * C + 1) * W * 4 + C * (W // 2) * 4
    th = max(8, min(128, (6 * 1024 * 1024 // (2 * per_row)) // 8 * 8, H))
    grid = (F, -(-H // th))
    kern = functools.partial(_expand_contrast_kernel, C=C, W=W,
                             ref_only=ref_only)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, 1, th, W), lambda f, i: (0, f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, th, W // 2), lambda f, i: (0, f, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, 1, th, W), lambda f, i: (0, f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W), lambda f, i: (f, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, F, H, W), jnp.float32),
            jax.ShapeDtypeStruct((F, H, W), jnp.float32),
        ),
        interpret=interpret,
    )(gi, ve)


def can_expand_tpu(shape_gi, contrast: str) -> bool:
    # W >= 1024 keeps this to the two largest levels (~94% of the pixels):
    # each level is its own Mosaic kernel instance, and the axon remote
    # compile helper OOMs when the per-module kernel count grows.
    H, W = shape_gi[-2], shape_gi[-1]
    return (contrast in ("weber_g1", "weber_g1_ref")
            and W % 2 == 0 and 1024 <= W <= 8192 and H >= 8)
