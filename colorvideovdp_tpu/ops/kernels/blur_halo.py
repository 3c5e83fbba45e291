"""Pallas TPU kernel: separable Gaussian blur with reflect padding.

The phase-uncertainty dilation (reference: cvvdp_metric.py:963-971,
torchvision GaussianBlur semantics) is a 13-tap separable blur applied to
every masking band. In XLA the pad + 2x13 shifted-slice adds cost ~64 ms
per 4K block (~30x the HBM bound) — the slices defeat fusion into one
pass. This kernel reads each row slab once (manual halo DMA, 8-row-aligned
bases with a zero lead-in, same scheme as pyramid_reduce), runs both
passes and all reflect corrections in VMEM, and writes each output tile
once.

Supports odd kernels with radius <= 8 (the 8-row DMA alignment is the halo
budget), H % 8 == 0 and W >= 256; other shapes use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def apply_blur_tile(sl, i, nT, taps, th, H, W):
    """Both separable blur passes + reflect corrections for one (th, W)
    tile. ``sl(start, size)`` reads rows from the 8-row-lead-in halo slab
    (scratch[idx] = x[r0 - 8 + idx]); ``i`` is the row-tile grid index.
    Shared by the standalone blur kernel below and the fused
    blur+transducer kernel (masking_fused._blur_b_kernel)."""
    ks = len(taps)
    r = (ks - 1) // 2
    r0_last = (nT - 1) * th
    base_l = r0_last - 8

    yv = None
    for t in range(ks):
        term = float(taps[t]) * sl(t + 8 - r, th)
        yv = term if yv is None else yv + term

    row = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
    # Top edge (tile 0): taps reaching x[g + t - r < 0] found zeros; add
    # the reflected k[t] * x[r - g - t].
    for g in range(min(r, th)):
        corr = None
        for t in range(r - g):
            term = float(taps[t]) * sl(r - g - t + 8, 1)[0]
            corr = term if corr is None else corr + term
        if corr is not None:
            yv = jnp.where((row == g) & (i == 0), yv + corr[None, :], yv)
    # Bottom edge (last tile): taps past H - 1 reflect to 2(H-1) - src.
    for dg in range(r):
        gr = H - r + dg
        rl = gr - r0_last
        if rl < 0 or rl >= th:
            continue
        corr = None
        for t in range(ks):
            src = gr + t - r
            if src > H - 1:
                refl = 2 * (H - 1) - src
                term = float(taps[t]) * sl(refl - base_l, 1)[0]
                corr = term if corr is None else corr + term
        if corr is not None:
            yv = jnp.where((row == rl) & (i == nT - 1), yv + corr[None, :],
                           yv)

    # Horizontal pass: reflect pad via single-column concats.
    left = [yv[:, c:c + 1] for c in range(r, 0, -1)]
    right = [yv[:, W - 1 - c:W - c] for c in range(1, r + 1)]
    xp = jnp.concatenate(left + [yv] + right, axis=1)
    yh = None
    for t in range(ks):
        term = float(taps[t]) * xp[:, t:t + W]
        yh = term if yh is None else yh + term
    return yh


def _blur_kernel(x_hbm, out_ref, scratch, sem, *, taps, th, H, W, nT):
    p = pl.program_id(0)
    i = pl.program_id(1)
    ks = len(taps)
    r = (ks - 1) // 2
    LS = th + 16  # slab rows per tile: [r0 - 8, r0 + th + 8)

    # --- halo DMA: scratch[g - (r0 - 8)] := x[g] --------------------------
    @pl.when(i == 0)
    def _():
        scratch[0:8, :] = jnp.zeros((8, W), jnp.float32)
        cp = pltpu.make_async_copy(
            x_hbm.at[p, pl.ds(0, th + 8), :], scratch.at[pl.ds(8, th + 8), :],
            sem,
        )
        cp.start()
        cp.wait()

    r0_last = (nT - 1) * th
    base_l = r0_last - 8
    size_l = H - base_l  # static; H % 8 == 0 and th % 8 == 0 => % 8 == 0

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
            base = pl.multiple_of(i * th - 8, 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[p, pl.ds(base, LS), :], scratch.at[pl.ds(0, LS), :],
                sem,
            )
            cp.start()
            cp.wait()

    out_ref[0] = apply_blur_tile(
        lambda s, n: scratch[pl.ds(s, n), :], i, nT, taps, th, H, W
    )


def blur_tpu(x, taps: np.ndarray, interpret=None):
    """(P, H, W) -> (P, H, W) separable reflect-padded blur."""
    P, H, W = x.shape
    taps = np.asarray(taps, np.float32)
    ks = len(taps)
    assert ks % 2 == 1 and (ks - 1) // 2 <= 8 and H % 8 == 0
    th = 64 if W > 2048 else 128
    th = min(th, max(8, (H // 2) // 8 * 8))
    nT = -(-H // th)
    assert nT >= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_blur_kernel, taps=tuple(float(t) for t in taps),
                             th=th, H=H, W=W, nT=nT)
    return pl.pallas_call(
        kern,
        grid=(P, nT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, th, W), lambda p, i: (p, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 16, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)


def can_blur_tpu(shape, kernel_size: int) -> bool:
    H, W = shape[-2], shape[-1]
    if kernel_size % 2 != 1 or (kernel_size - 1) // 2 > 8:
        return False
    # W % 128: Mosaic requires lane-aligned HBM slices for the halo DMA.
    if not (H % 8 == 0 and W % 128 == 0 and 256 <= W <= 8192):
        return False
    th = 64 if W > 2048 else 128
    th = min(th, max(8, (H // 2) // 8 * 8))
    if th < (kernel_size - 1) // 2 + 2 or H < th + 8:
        return False
    return -(-H // th) >= 2
