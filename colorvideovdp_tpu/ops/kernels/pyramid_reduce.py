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

Arbitrary sizes (VERDICT r2 item 2 — pad, don't gate): inputs whose H is
not 8-row aligned or whose W is not lane aligned are zero-padded by the
wrapper (zeros beyond the true edges match the reference's zero-padded
conv exactly), the kernel applies the boundary corrections at the REAL
(H, W) edges — including the row-parity quirk that keys BOTH passes' last
-sample correction on H's parity (lpyr_dec.py:206) — and the wrapper
slices the decimated result back to (ceil(H/2), ceil(W/2)). Aligned
shapes take the identical unpadded route as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pyramid import K5


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _tile_rows(H: int) -> int:
    return min(128, max(8, ((H - 16) // 2) // 8 * 8))


def _reduce_kernel(x_hbm, out_ref, scratch, sem, *, th, H, W, Hp, Wp, nT,
                   halo=False, rows_odd=None):
    """One (th, Wop) decimated output tile. H/W are the REAL input sizes
    (boundary corrections anchor to them); Hp/Wp the padded buffer sizes.

    ``halo=True`` (sharded slab mode): the input buffer is a shard's row
    slab with 8 rows of real neighbour context above and below (zeros at
    the global edges) — H is the LOCAL owned row count, vertical edge
    corrections are skipped (the shard_map caller applies them at the
    global edges), and ``rows_odd`` carries the GLOBAL row-count parity
    that keys the horizontal last-column correction (lpyr_dec.py:206)."""
    i = pl.program_id(1)
    p = pl.program_id(0)
    LS = 2 * th + 16  # slab rows DMA'd per interior tile
    He = (H + 1) // 2 if not halo else H // 2
    Wo = (W + 1) // 2
    Wop = Wp // 2
    if rows_odd is None:
        rows_odd = (H % 2) == 1  # static: selects the parity branch
    k0, k1, k2, k3, k4 = (float(K5[t]) for t in range(5))

    # --- halo DMA: scratch[(g - (2*r0 - 8))] := x[g], zeros outside ------
    # (halo mode: buffer row b holds global row b - 8, so the same tap
    # arithmetic reads the slab at base 2*r0 with no zero lead-in.)
    @pl.when(i == 0)
    def _():
        if halo:
            cp = pltpu.make_async_copy(
                x_hbm.at[p, pl.ds(0, LS), :], scratch.at[pl.ds(0, LS), :],
                sem,
            )
        else:
            scratch[0:8, :] = jnp.zeros((8, Wp), jnp.float32)
            cp = pltpu.make_async_copy(
                x_hbm.at[p, pl.ds(0, LS - 8), :],
                scratch.at[pl.ds(8, LS - 8), :],
                sem,
            )
        cp.start()
        cp.wait()

    r0_last = (nT - 1) * th
    base_l = 2 * r0_last - 8 if not halo else 2 * r0_last
    size_l = min(Hp - base_l, LS)  # static, multiple of 8

    @pl.when(i == nT - 1)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[p, pl.ds(base_l, size_l), :],
            scratch.at[pl.ds(0, size_l), :],
            sem,
        )
        cp.start()
        cp.wait()
        if size_l < LS:
            scratch[size_l:LS, :] = jnp.zeros((LS - size_l, Wp), jnp.float32)

    if nT > 2:

        @pl.when(jnp.logical_and(i > 0, i < nT - 1))
        def _():
            base = pl.multiple_of(2 * i * th - (0 if halo else 8), 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[p, pl.ds(base, LS), :],
                scratch.at[pl.ds(0, LS), :],
                sem,
            )
            cp.start()
            cp.wait()

    # --- vertical pass: yv[r] = sum_t K[t] * scratch[2r + t + 6] ---------
    v = scratch[:]
    v2 = v.reshape((LS + 8) // 2, 2, Wp)  # v2[k, q] = scratch[2k + q]
    # scratch row 2r + t + 6 -> v2[r + (t + 6) // 2, (t + 6) % 2]
    yv = (k0 * v2[3:th + 3, 0] + k1 * v2[3:th + 3, 1]
          + k2 * v2[4:th + 4, 0] + k3 * v2[4:th + 4, 1]
          + k4 * v2[5:th + 5, 0])

    # Vertical edge corrections (lpyr_dec.py:199-209) as masked one-row
    # adds. x[0] -> scratch[8] (tile 0); x[g] -> scratch[g - (2*iL*th - 8)]
    # in the tile iL that owns output row He-1. Skipped in halo mode —
    # the shard_map caller applies them at the global edges only.
    if not halo:
        first_fix = scratch[8, :] * k1 + scratch[9, :] * k0
        row = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
        yv = jnp.where((row == 0) & (i == 0), yv + first_fix[None, :], yv)

        iL = (He - 1) // th
        rl = (He - 1) - iL * th  # static row index within tile iL
        off = 2 * iL * th - 8    # scratch offset of that tile (-8 lead @ 0)
        if rows_odd:
            last_fix = (scratch[H - 1 - off, :] * k3
                        + scratch[H - 2 - off, :] * k4)
        else:
            last_fix = scratch[H - 1 - off, :] * k4
        yv = jnp.where((row == rl) & (i == iL), yv + last_fix[None, :], yv)

    # --- horizontal pass in the transposed orientation -------------------
    yvT = yv.T  # (Wp, th)
    ph = yvT.reshape(Wop, 2, th)
    xe = ph[:, 0, :]
    xo = ph[:, 1, :]
    zrow = jnp.zeros((1, th), jnp.float32)
    xep = jnp.concatenate([zrow, xe, zrow], axis=0)
    xop = jnp.concatenate([zrow, xo], axis=0)
    yhT = (k0 * xep[0:Wop] + k1 * xop[0:Wop] + k2 * xep[1:Wop + 1]
           + k3 * xop[1:Wop + 1] + k4 * xep[2:Wop + 2])

    # Horizontal edge corrections; parity quirk keyed on the ROW count
    # (lpyr_dec.py:206 tests shape[-2]) for the last-column branch.
    c_first = yhT[0] + yvT[0] * k1 + yvT[1] * k0
    if rows_odd:
        c_last = yhT[Wo - 1] + yvT[W - 1] * k3 + yvT[W - 2] * k4
    else:
        c_last = yhT[Wo - 1] + yvT[W - 1] * k4
    col = jax.lax.broadcasted_iota(jnp.int32, (Wop, 1), 0)
    yhT = jnp.where(col == 0, c_first[None, :], yhT)
    yhT = jnp.where(col == Wo - 1, c_last[None, :], yhT)

    out_ref[0] = yhT.T


def reduce_tpu(x, interpret=None):
    """(P, H, W) -> (P, ceil(H/2), ceil(W/2)) Gaussian reduce for any shape
    accepted by ``can_reduce_tpu`` (unaligned inputs are zero-padded and the
    result sliced back; aligned inputs run unpadded as before)."""
    P, H, W = x.shape
    He, Wo = (H + 1) // 2, (W + 1) // 2
    th = _tile_rows(H)
    nT = -(-He // th)
    assert nT >= 2, "reduce_tpu requires at least two row tiles"
    # Pad W so that both the slab lane count and the decimated output lane
    # count are tile-aligned; pad H (only when not 8-aligned) so every slab
    # slice keeps an 8-row base/size and the taps past the true bottom edge
    # read zeros.
    Wp = _ceil_to(W, 256)
    Hp = H if H % 8 == 0 else _ceil_to(H + 8, 8)
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_reduce_kernel, th=th, H=H, W=W, Hp=Hp, Wp=Wp,
                             nT=nT)
    out = pl.pallas_call(
        kern,
        grid=(P, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, Wp // 2), lambda p, i: (p, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, th * nT, Wp // 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 24, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    if (th * nT, Wp // 2) != (He, Wo):
        out = out[:, :He, :Wo]
    return out


def reduce_slab_tpu(x, H_loc: int, W: int, rows_odd: bool,
                    interpret=None):
    """Halo'd shard-slab reduce: ``x`` is (P, H_loc + 16, W) — a shard's
    H_loc owned rows with 8 rows of real neighbour context above and below
    (zeros at the global edges, matching the reference's zero-padded conv)
    -> (P, H_loc // 2, ceil(W/2)). Vertical edge corrections are NOT
    applied (the shard_map caller adds them at the global edges via
    axis_index selects); ``rows_odd`` is the GLOBAL row-count parity for
    the horizontal last-column correction."""
    P, Hb, Wx = x.shape
    assert Hb == H_loc + 16 and Wx == W and H_loc % 2 == 0
    He = H_loc // 2
    Wo = (W + 1) // 2
    th = _tile_rows(H_loc)
    nT = -(-He // th)
    assert nT >= 2, "reduce_slab_tpu requires at least two row tiles"
    Wp = _ceil_to(W, 256)
    Hbp = _ceil_to(Hb, 8)
    if (Hbp, Wp) != (Hb, W):
        x = jnp.pad(x, ((0, 0), (0, Hbp - Hb), (0, Wp - W)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_reduce_kernel, th=th, H=H_loc, W=W, Hp=Hbp,
                             Wp=Wp, nT=nT, halo=True,
                             rows_odd=bool(rows_odd))
    out = pl.pallas_call(
        kern,
        grid=(P, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, Wp // 2), lambda p, i: (p, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, th * nT, Wp // 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 24, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    if (th * nT, Wp // 2) != (He, Wo):
        out = out[:, :He, :Wo]
    return out


def can_reduce_slab(H_loc: int, W: int) -> bool:
    """Whether ``reduce_slab_tpu`` supports one shard's (H_loc, W) slab."""
    if H_loc % 2 or not (H_loc >= 48 and 256 <= W <= 8192):
        return False
    th = _tile_rows(H_loc)
    return -(-(H_loc // 2) // th) >= 2


def can_reduce_tpu(shape) -> bool:
    """Whether reduce_tpu supports this (..., H, W) shape. Unaligned widths
    and odd/unaligned heights are padded inside the wrapper; only genuinely
    tiny levels (which are KB-sized and cheap in XLA) are excluded."""
    H, W = shape[-2], shape[-1]
    if not (H >= 48 and 256 <= W <= 8192):
        return False
    th = _tile_rows(H)
    if H < 2 * th + 16:
        return False
    return -(-((H + 1) // 2) // th) >= 2
