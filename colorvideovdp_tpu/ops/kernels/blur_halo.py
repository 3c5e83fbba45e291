"""Pallas TPU kernel: separable Gaussian blur with reflect padding.

The phase-uncertainty dilation (reference: cvvdp_metric.py:963-971,
torchvision GaussianBlur semantics) is a 13-tap separable blur applied to
every masking band. In XLA the pad + 2x13 shifted-slice adds cost ~64 ms
per 4K block (~30x the HBM bound) — the slices defeat fusion into one
pass. This kernel reads each row slab once (manual halo DMA, 8-row-aligned
bases with a zero lead-in, same scheme as pyramid_reduce), runs both
passes and all reflect corrections in VMEM, and writes each output tile
once.

Arbitrary sizes (VERDICT r2 item 2 — pad, don't gate): unaligned H/W are
zero-padded by the caller (zero columns/rows beyond the true edges match
the base conv's zero padding exactly), the reflect corrections anchor to
the REAL (H, W) edges as masked adds, and the result is sliced back.
Aligned shapes take the identical construction as before. Odd kernels with
radius <= 8 (the 8-row DMA alignment is the halo budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def apply_blur_tile(sl, i, nT, taps, th, H, W, Wp=None, v_corrections=True):
    """Both separable blur passes + reflect corrections for one (th, Wp)
    tile. ``sl(start, size)`` reads rows from the 8-row-lead-in halo slab
    (scratch[idx] = x[i*th - 8 + idx]); ``i`` is the row-tile grid index.
    ``H``/``W`` are the REAL image sizes; ``Wp`` the (lane-aligned) buffer
    width, whose columns >= W hold zeros. Shared by the standalone blur
    kernel below and the fused blur+transducer kernel
    (masking_fused._blur_b_kernel).

    ``v_corrections=False`` skips the top/bottom reflect corrections: the
    caller supplies a slab whose first/last rows are real halo context
    (sharded row slabs with exchanged halos) — only rows at distance >= r
    from the slab edges are then exact, which is what the shard keeps."""
    if Wp is None:
        Wp = W
    ks = len(taps)
    r = (ks - 1) // 2

    yv = None
    for t in range(ks):
        term = float(taps[t]) * sl(t + 8 - r, th)
        yv = term if yv is None else yv + term

    row = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
    # Top edge (tile 0): taps reaching x[g + t - r < 0] found zeros; add
    # the reflected k[t] * x[r - g - t].
    for g in range(min(r, th) if v_corrections else 0):
        corr = None
        for t in range(r - g):
            term = float(taps[t]) * sl(r - g - t + 8, 1)[0]
            corr = term if corr is None else corr + term
        if corr is not None:
            yv = jnp.where((row == g) & (i == 0), yv + corr[None, :], yv)
    # Bottom edge: taps past H - 1 reflect to 2(H-1) - src. Each affected
    # global row gr carries its own owning-tile mask (the rows just above
    # the true bottom edge can straddle a tile boundary when H is not a
    # tile multiple).
    for dg in range(r if v_corrections else 0):
        gr = H - r + dg
        if gr < 0:
            continue
        iB = gr // th
        rl = gr - iB * th
        corr = None
        for t in range(ks):
            src = gr + t - r
            if src > H - 1:
                refl = 2 * (H - 1) - src
                term = float(taps[t]) * sl(refl - iB * th + 8, 1)[0]
                corr = term if corr is None else corr + term
        if corr is not None:
            yv = jnp.where((row == rl) & (i == iB), yv + corr[None, :], yv)

    if W == Wp:
        # Aligned fast path: reflect pad via single-column concats (the
        # original exact construction).
        left = [yv[:, c:c + 1] for c in range(r, 0, -1)]
        right = [yv[:, W - 1 - c:W - c] for c in range(1, r + 1)]
        xp = jnp.concatenate(left + [yv] + right, axis=1)
        yh = None
        for t in range(ks):
            term = float(taps[t]) * xp[:, t:t + W]
            yh = term if yh is None else yh + term
        return yh

    # Padded width: base pass over the zero-extended row (columns >= W are
    # zeros, matching zero padding), then masked reflect corrections at the
    # real right edge.
    left = [yv[:, c:c + 1] for c in range(r, 0, -1)]
    # NB: derive the right-side zeros from yv rather than minting a fresh
    # jnp.zeros — a fresh vector carries sublane offset 0 while yv (a sum
    # of halo-slab reads at row offset 8-r) carries a nonzero one, and
    # Mosaic rejects the lane concat with "result/input offset mismatch on
    # non-concat dimension". Only the v_corrections=False (sharded
    # row_off) variant hits this: the edge-correction `where`s otherwise
    # normalise yv's layout. Caught compiling the halo'd route on real
    # hardware (bench.py --shard-smoke); interpret mode cannot see it.
    # Assumes finite inputs (a NaN/Inf in yv's first r columns would leak
    # into this pad, where jnp.zeros was exact) — guaranteed upstream: the
    # kernels see post-ingest fp32 from uint8/uint16 or the debug-checked
    # float path (metrics/cvvdp.py NaN check).
    zr = yv[:, :r] * 0.0
    xp = jnp.concatenate(left + [yv, zr], axis=1)  # width Wp + 2r
    yh = None
    for t in range(ks):
        term = float(taps[t]) * xp[:, t:t + Wp]
        yh = term if yh is None else yh + term
    col = jax.lax.broadcasted_iota(jnp.int32, (yv.shape[0], Wp), 1)
    for j in range(max(0, W - r), W):
        corr = None
        for t in range(ks):
            src = j + t - r
            if src > W - 1:
                refl = 2 * (W - 1) - src
                term = float(taps[t]) * yv[:, refl:refl + 1]
                corr = term if corr is None else corr + term
        if corr is not None:
            yh = jnp.where(col == j, yh + corr, yh)
    return yh


def _blur_kernel(x_hbm, out_ref, scratch, sem, *, taps, th, H, W, Hp, Wp,
                 nT):
    p = pl.program_id(0)
    i = pl.program_id(1)
    LS = th + 16  # slab rows per tile: [r0 - 8, r0 + th + 8)

    # --- halo DMA: scratch[g - (r0 - 8)] := x[g] --------------------------
    @pl.when(i == 0)
    def _():
        scratch[0:8, :] = jnp.zeros((8, Wp), jnp.float32)
        cp = pltpu.make_async_copy(
            x_hbm.at[p, pl.ds(0, th + 8), :], scratch.at[pl.ds(8, th + 8), :],
            sem,
        )
        cp.start()
        cp.wait()

    r0_last = (nT - 1) * th
    base_l = r0_last - 8
    size_l = Hp - base_l  # static multiple of 8 (Hp, th % 8 == 0)

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
            base = pl.multiple_of(i * th - 8, 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[p, pl.ds(base, LS), :], scratch.at[pl.ds(0, LS), :],
                sem,
            )
            cp.start()
            cp.wait()

    out_ref[0] = apply_blur_tile(
        lambda s, n: scratch[pl.ds(s, n), :], i, nT, taps, th, H, W, Wp
    )


def _tiles(Hp, Wp):
    th = 64 if Wp > 2048 else 128
    return min(th, max(8, (Hp // 2) // 8 * 8))


def blur_tpu(x, taps: np.ndarray, interpret=None):
    """(P, H, W) -> (P, H, W) separable reflect-padded blur for any shape
    accepted by ``can_blur_tpu`` (unaligned inputs zero-padded + sliced)."""
    P, H, W = x.shape
    taps = np.asarray(taps, np.float32)
    ks = len(taps)
    assert ks % 2 == 1 and (ks - 1) // 2 <= 8
    Wp = _ceil_to(W, 128)
    Hp = _ceil_to(H, 8)
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)))
    th = _tiles(Hp, Wp)
    nT = -(-Hp // th)
    assert nT >= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_blur_kernel, taps=tuple(float(t) for t in taps),
                             th=th, H=H, W=W, Hp=Hp, Wp=Wp, nT=nT)
    out = pl.pallas_call(
        kern,
        grid=(P, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, Wp), lambda p, i: (p, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 16, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    if (Hp, Wp) != (H, W):
        out = out[:, :H, :W]
    return out


def can_blur_tpu(shape, kernel_size: int) -> bool:
    H, W = shape[-2], shape[-1]
    if kernel_size % 2 != 1 or (kernel_size - 1) // 2 > 8:
        return False
    if not (H >= 16 and 129 <= W <= 8192):
        return False
    Hp, Wp = _ceil_to(H, 8), _ceil_to(W, 128)
    th = _tiles(Hp, Wp)
    if th < (kernel_size - 1) // 2 + 2 or Hp < th + 8:
        return False
    return -(-Hp // th) >= 2
