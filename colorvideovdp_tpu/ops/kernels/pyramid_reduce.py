"""Pallas TPU kernel: Gaussian-pyramid reduce (stride-2 separable 5-tap).

XLA lowers the stride-2 conv + boundary-correction chain (reference:
lpyr_dec.py:186-211) into several full-size materialisations — measured
~16 ms/frame for the 4K level-0 reduce, ~40x off the HBM bound. This kernel
reads each input row slab once (manual halo DMA: tile i needs input rows
2*r0-2 .. 2*(r0+th)+1, which regular BlockSpecs cannot express), runs both
separable passes and all boundary corrections in VMEM, and writes the
decimated tile once.

Alignment: HBM row slices must be 8-row aligned, so every tile DMAs the
slab starting at 2*r0-8 (tile 0: rows [0, LS) into scratch offset 8, with
8 zero lead-in rows standing in for the conv's zero padding). Global input
row g then lands at scratch[g - (2*r0 - 8)] for every tile — one static
offset (+6 relative to the 2r+t tap index) everywhere.

Mosaic cannot decimate along lanes, so the horizontal pass runs in the
transposed orientation: W on sublanes, phase split via a free sublane
reshape, 5-tap polyphase, transpose back.

Used for levels with H % 8 == 0, even W >= 256 and at least two row tiles;
smaller/odd levels fall back to the XLA path (they are KB-sized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pyramid import K5


def _reduce_kernel(x_hbm, out_ref, scratch, sem, *, th, H, W, nT):
    i = pl.program_id(1)
    p = pl.program_id(0)
    LS = 2 * th + 16  # slab rows DMA'd per interior tile
    He = H // 2
    Wo = W // 2
    k0, k1, k2, k3, k4 = (float(K5[t]) for t in range(5))

    # --- halo DMA: scratch[(g - (2*r0 - 8))] := x[g], zeros outside ------
    @pl.when(i == 0)
    def _():
        scratch[0:8, :] = jnp.zeros((8, W), jnp.float32)
        cp = pltpu.make_async_copy(
            x_hbm.at[p, pl.ds(0, LS), :], scratch.at[pl.ds(8, LS), :], sem
        )
        cp.start()
        cp.wait()

    r0_last = (nT - 1) * th
    base_l = 2 * r0_last - 8
    size_l = H - base_l  # static, multiple of 8 (H % 8 == 0, base_l % 8 == 0)

    @pl.when(i == nT - 1)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[p, pl.ds(base_l, size_l), :],
            scratch.at[pl.ds(0, size_l), :],
            sem,
        )
        cp.start()
        cp.wait()
        scratch[pl.ds(size_l, 8), :] = jnp.zeros((8, W), jnp.float32)

    if nT > 2:

        @pl.when(jnp.logical_and(i > 0, i < nT - 1))
        def _():
            base = pl.multiple_of(2 * i * th - 8, 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[p, pl.ds(base, LS), :],
                scratch.at[pl.ds(0, LS), :],
                sem,
            )
            cp.start()
            cp.wait()

    # --- vertical pass: yv[r] = sum_t K[t] * scratch[2r + t + 6] ---------
    v = scratch[:]
    v2 = v.reshape((2 * th + 24) // 2, 2, W)  # v2[k, q] = scratch[2k + q]
    # scratch row 2r + t + 6 -> v2[r + (t + 6) // 2, (t + 6) % 2]
    yv = (k0 * v2[3:th + 3, 0] + k1 * v2[3:th + 3, 1]
          + k2 * v2[4:th + 4, 0] + k3 * v2[4:th + 4, 1]
          + k4 * v2[5:th + 5, 0])

    # Vertical edge corrections (lpyr_dec.py:199-209; H even => even branch)
    # as masked one-row adds. x[0] -> scratch[8], x[1] -> scratch[9].
    first_fix = scratch[8, :] * k1 + scratch[9, :] * k0
    row = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
    yv = jnp.where((row == 0) & (i == 0), yv + first_fix[None, :], yv)

    r_last = He - 1 - r0_last  # static row index within the last tile
    last_fix = scratch[H - base_l - 1, :] * k4  # x[H-1], even-H branch
    yv = jnp.where((row == r_last) & (i == nT - 1), yv + last_fix[None, :],
                   yv)

    # --- horizontal pass in the transposed orientation -------------------
    yvT = yv.T  # (W, th)
    ph = yvT.reshape(Wo, 2, th)
    xe = ph[:, 0, :]
    xo = ph[:, 1, :]
    zrow = jnp.zeros((1, th), jnp.float32)
    xep = jnp.concatenate([zrow, xe, zrow], axis=0)
    xop = jnp.concatenate([zrow, xo], axis=0)
    yhT = (k0 * xep[0:Wo] + k1 * xop[0:Wo] + k2 * xep[1:Wo + 1]
           + k3 * xop[1:Wo + 1] + k4 * xep[2:Wo + 2])

    # Horizontal edge corrections; parity quirk keyed on the ROW count
    # (lpyr_dec.py:206) — H is even here, so the even branch applies.
    c_first = yhT[0] + yvT[0] * k1 + yvT[1] * k0
    c_last = yhT[Wo - 1] + yvT[W - 1] * k4
    col = jax.lax.broadcasted_iota(jnp.int32, (Wo, 1), 0)
    yhT = jnp.where(col == 0, c_first[None, :], yhT)
    yhT = jnp.where(col == Wo - 1, c_last[None, :], yhT)

    out_ref[0] = yhT.T


def reduce_tpu(x, interpret=None):
    """(P, H, W) -> (P, H/2, W/2) Gaussian reduce; requires H % 8 == 0 and
    even W (caller guards via can_reduce_tpu)."""
    P, H, W = x.shape
    assert H % 8 == 0 and W % 2 == 0
    He, Wo = H // 2, W // 2
    th = min(128, max(8, ((H - 16) // 2) // 8 * 8))
    nT = -(-He // th)
    assert nT >= 2, "reduce_tpu requires at least two row tiles"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_reduce_kernel, th=th, H=H, W=W, nT=nT)
    return pl.pallas_call(
        kern,
        grid=(P, nT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, th, Wo), lambda p, i: (p, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, He, Wo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 24, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)


def can_reduce_tpu(shape) -> bool:
    """Whether reduce_tpu supports this (..., H, W) shape."""
    H, W = shape[-2], shape[-1]
    # W % 128: the halo DMA slices full rows, and Mosaic requires the
    # minor (lane) dimension of HBM slices to be tile-aligned.
    if not (H % 8 == 0 and W % 128 == 0 and 256 <= W <= 8192):
        return False
    th = min(128, max(8, ((H - 16) // 2) // 8 * 8))
    if H < 2 * th + 16:
        return False
    return -(-(H // 2) // th) >= 2
