"""Stacked deep-band Pallas kernel: every narrow pyramid band in ONE launch.

The bands below the fused-route width gate are individually tiny (together
<2% of the pixels at 4K) but the per-band XLA chain — expand residual,
Weber contrast, CSF LUT, phase-uncertainty blur, masking transducer,
spatial pooling — costs ~0.4-0.6 ms/frame EACH at 4K, dominated by per-op
overheads rather than data (measured: a 135x240 band costs 75% of a
270x480 band despite 4x fewer pixels). This kernel pads all such bands to
one common (hp, wp) tile and walks a (band, frame) grid, turning ~5 bands
x ~24 XLA passes into a single Mosaic instance:

- per-band CSF LUT ladder coefficients enter through SMEM (the
  scalar-prefetch style), NOT baked per band — one compile covers every
  band;
- the phase-uncertainty blur becomes two matmuls against per-band blur
  MATRICES built on the host by expressing the exact separable
  reflect-padded blur (ops/blur.py:26-38) as a banded matrix — the blur
  is linear, so this is exact up to fp32 summation order, reflect
  corrections included, and the MXU does the work. Bands small enough
  that ``phase_uncertainty`` statically skips the blur
  (ops/masking.py:142-146) get identity matrices;
- the mutual-masking transducer, soft clamp and spatial pooling run in
  VMEM; only the (band, frame, channel) pooled sums reach HBM.

Reference chain being fused: lpyr_dec.py:358-414 (contrast),
cvvdp_metric.py:887-905 (CSF + masking), 963-971 (phase uncertainty).
Gradients recompute through the plain-jnp chain (custom VJP), like the
other fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def blur_matrix(n: int, taps: np.ndarray) -> np.ndarray:
    """The 1-D reflect-padded blur of ops/blur.py:26-38 as an (n, n)
    matrix: row i holds the tap weights gathered onto source indices
    through the reflect (edge-excluded) padding."""
    r = (len(taps) - 1) // 2
    ref_idx = np.pad(np.arange(n), (r, r), mode="reflect")
    B = np.zeros((n, n), np.float64)
    for i in range(n):
        for t in range(len(taps)):
            B[i, ref_idx[i + t]] += float(taps[t])
    return B.astype(np.float32)


def plan_band_stack(shapes, C, vmem_budget=10 * 1024 * 1024):
    """Pick which deep bands share the stacked kernel.

    ``shapes``: [(h, w)] of the deep-band candidates, any order. The tile
    is the 8x128-aligned pad of the largest included band; bands are
    dropped largest-first while the VMEM estimate (double-buffered gi+E
    blocks and blur matrices + working tiles) exceeds the budget.
    Returns (included_indices, hp, wp) or (None, 0, 0) if fewer than two
    bands fit (a single band is not worth the instance)."""
    order = sorted(range(len(shapes)), key=lambda i: -shapes[i][0] * shapes[i][1])
    included = list(order)
    while len(included) >= 2:
        h_max = max(shapes[i][0] for i in included)
        w_max = max(shapes[i][1] for i in included)
        hp, wp = _ceil_to(max(h_max, 8), 8), _ceil_to(max(w_max, 128), 128)
        tile = hp * wp * 4
        est = (
            2 * 2 * (2 * C) * tile          # gi + E blocks, double-buffered
            + 2 * (hp * hp + wp * wp) * 4   # blur matrices, double-buffered
            + (3 * C + 3) * tile            # diff, mix, transients
        )
        if est <= vmem_budget:
            return sorted(included), hp, wp
        included.remove(order[len(order) - len(included)])
    return None, 0, 0


def _stack_kernel(coef_ref, hw_ref, gi_ref, E_ref, Bh_ref, Bw_ref, out_ref,
                  *, C, nk, x0, scale, gains, ref_only, mul, qs, p, xcm,
                  max_v, blur_scale, pool_beta, n, L, hp, wp):
    b = pl.program_id(0)
    l = pl.program_id(1)

    from .masking_fused import _pospow, _exp10, _LOG2_10

    lb_r = jnp.maximum(E_ref[0, 1, 0], 0.01)
    lb_t = lb_r if ref_only else jnp.maximum(E_ref[0, 0, 0], 0.01)
    logL = jnp.log2(lb_r) * (1.0 / _LOG2_10)

    # CSF LUT in relu-ladder form with per-band coefficients from SMEM
    # (coef[...,0] = value at knot 0; coef[...,k] = slope delta at knot
    # k-1) — same math as masking_fused._lut_eval, but the band constants
    # are operands, so one Mosaic instance serves every band.
    ind = jnp.clip((logL - x0) * scale, 0.0, float(nk - 1))
    acc = [jnp.full((hp, wp), 0.0, jnp.float32) + coef_ref[0, c, 0]
           for c in range(C)]
    for k in range(nk - 1):
        r = jnp.maximum(ind - float(k), 0.0)
        for c in range(C):
            acc[c] = acc[c] + coef_ref[0, c, k + 1] * r

    h_b = hw_ref[0, 0, 0]
    w_b = hw_ref[0, 0, 1]

    mix = [None] * C
    diffs = []
    from ..masking import _pow_static

    for c in range(C):
        S = _exp10(acc[c]) * (float(gains[c]) * float(mul))
        T_p = jnp.minimum((gi_ref[0, 2 * c, 0] - E_ref[0, 2 * c, 0]) / lb_t,
                          1000.0) * S
        R_p = jnp.minimum((gi_ref[0, 2 * c + 1, 0] - E_ref[0, 2 * c + 1, 0])
                          / lb_r, 1000.0) * S
        m_pre = jnp.minimum(jnp.abs(T_p), jnp.abs(R_p))
        diffs.append(jnp.abs(T_p - R_p))
        # Phase-uncertainty blur as two MXU matmuls: rows then columns
        # (Bw is pre-transposed on the host). Identity matrices for bands
        # the blur statically skips.
        t1 = jnp.dot(Bh_ref[0], m_pre, preferred_element_type=jnp.float32)
        m_b = jnp.dot(t1, Bw_ref[0],
                      preferred_element_type=jnp.float32) * float(blur_scale)
        q = float(qs[c])
        mq_c = _pospow(jnp.abs(m_b) + _EPS, q) - _EPS ** q
        for d in range(C):
            term = float(xcm[c, d]) * mq_c
            mix[d] = term if mix[d] is None else mix[d] + term

    @pl.when(jnp.logical_and(b == 0, l == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    valid = (rows < h_b) & (cols < w_b)
    # (C, n*L) accumulator stays VMEM-resident across the grid (constant
    # index map, sub-tile size) — same scheme as the pooled blur kernel
    # (masking_fused._blur_b_kernel).
    ochn = jax.lax.broadcasted_iota(jnp.int32, (C, n * L), 0)
    opos = jax.lax.broadcasted_iota(jnp.int32, (C, n * L), 1)
    pos = b * L + l
    bta = float(pool_beta)
    for d in range(C):
        du = (_pospow(diffs[d] + _EPS, p) - _EPS ** float(p)) \
            / (1.0 + mix[d])
        Dv = max_v * du / (max_v + du)
        sp = _pow_static(Dv + _EPS, bta) - _EPS ** bta
        s_d = jnp.sum(jnp.where(valid, sp, 0.0))
        out_ref[...] += jnp.where((ochn == d) & (opos == pos), s_d, 0.0)


def make_band_stack(luts_stack, x0: float, x1: float, gains, sens_corr,
                    params, ref_only: bool, mul: float, pool_beta: float,
                    shapes, interpret=None):
    """Build the stacked deep-band function.

    ``luts_stack``: (n, C, nk) per-band logS LUT rows; ``shapes``:
    [(h_b, w_b)] of the n bands in band order. Returns
    ``fused(gi_list, E_list) -> list of (B, C, F)`` pooled lp_norm values
    (one per band, matching ops.masking.lp_norm(D, beta, dim=(-2,-1),
    normalize=True)) where gi/E are the raw Gaussian level and expanded
    next level, each (B, 2C, F, h_b, w_b) with T/R interleaved channels.
    """
    from ..blur import gaussian_kernel1d

    luts_stack = np.asarray(luts_stack, np.float32)
    n, C, nk = luts_stack.shape
    scale = float((nk - 1) / (x1 - x0))
    g = tuple(float(gv) * float(sens_corr) for gv in gains)
    qs = np.asarray(params.mask_q, np.float32)[:C]
    xcm = np.power(2.0, np.asarray(params.xcm_weights,
                                   np.float32)).reshape(4, 4)[:C, :C]
    max_v = 10.0 ** float(params.d_max)
    blur_scale = 10.0 ** float(params.mask_c)

    hp = _ceil_to(max(max(h for h, _ in shapes), 8), 8)
    wp = _ceil_to(max(max(w for _, w in shapes), 128), 128)

    # Ladder coefficients (float64 intermediates, like _lut_eval).
    lutf = luts_stack.astype(np.float64)
    slopes = lutf[:, :, 1:] - lutf[:, :, :-1]
    coef = np.concatenate(
        [lutf[:, :, :1], slopes[:, :, :1],
         slopes[:, :, 1:] - slopes[:, :, :-1]], axis=2,
    ).astype(np.float32)  # (n, C, nk): [base, first slope, deltas...]

    taps = gaussian_kernel1d(params.pu_kernel_size, params.pu_dilate)
    Bh = np.zeros((n, hp, hp), np.float32)
    BwT = np.zeros((n, wp, wp), np.float32)
    for i, (h_b, w_b) in enumerate(shapes):
        blurred = (params.pu_dilate != 0 and h_b > params.pu_padsize
                   and w_b > params.pu_padsize)
        if blurred:
            Bh[i, :h_b, :h_b] = blur_matrix(h_b, taps)
            BwT[i, :w_b, :w_b] = blur_matrix(w_b, taps).T
        else:
            Bh[i, :h_b, :h_b] = np.eye(h_b, dtype=np.float32)
            BwT[i, :w_b, :w_b] = np.eye(w_b, dtype=np.float32)
    hw = np.asarray(shapes, np.int32).reshape(n, 1, 2)

    def jnp_impl(gi_list, E_list):
        from .. import masking as mk
        from . import csf_lut as _cl

        outs = []
        for i in range(n):
            gi, E = gi_list[i], E_list[i]
            lb_r = jnp.clip(E[:, 1:2], 0.01, None)
            lb_t = lb_r if ref_only else jnp.clip(E[:, 0:1], 0.01, None)
            T = jnp.clip((gi[:, 0::2] - E[:, 0::2]) / lb_t, None,
                         1000.0) * mul
            R = jnp.clip((gi[:, 1::2] - E[:, 1::2]) / lb_r, None,
                         1000.0) * mul
            S = _cl._jnp_lookup(jnp.log10(lb_r[:, 0]), luts_stack[i],
                                float(x0), float(x1))
            S = jnp.moveaxis(S, 0, 1) * float(sens_corr)
            D = mk.apply_masking_model(T, R, S, params)
            outs.append(mk.lp_norm(D, pool_beta, dim=(-2, -1),
                                   normalize=True, keepdim=False))
        return outs

    def stack_call(gi_list, E_list):
        B, C2, F = gi_list[0].shape[:3]
        L = B * F

        def to4(x, h_b, w_b):
            x4 = jnp.transpose(x, (1, 0, 2, 3, 4)).reshape(C2, L, h_b, w_b)
            return jnp.pad(x4, ((0, 0), (0, 0), (0, hp - h_b),
                                (0, wp - w_b)))

        gi_stack = jnp.stack([to4(gi_list[i], *shapes[i]) for i in range(n)])
        E_stack = jnp.stack([to4(E_list[i], *shapes[i]) for i in range(n)])

        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        kern = functools.partial(
            _stack_kernel, C=C, nk=nk, x0=float(x0), scale=scale, gains=g,
            ref_only=bool(ref_only), mul=float(mul), qs=tuple(qs),
            p=float(params.mask_p), xcm=xcm, max_v=float(max_v),
            blur_scale=float(blur_scale), pool_beta=float(pool_beta),
            n=n, L=L, hp=hp, wp=wp,
        )
        out = pl.pallas_call(
            kern,
            grid=(n, L),
            in_specs=[
                pl.BlockSpec((1, C, nk), lambda b, l: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 2), lambda b, l: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, C2, 1, hp, wp),
                             lambda b, l: (b, 0, l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C2, 1, hp, wp),
                             lambda b, l: (b, 0, l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hp, hp), lambda b, l: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wp, wp), lambda b, l: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, n * L), lambda b, l: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, n * L), jnp.float32),
            interpret=interp,
        )(coef, hw, gi_stack, E_stack, Bh, BwT)

        # lp_norm tail per band: safe_pow(sum / count, 1/beta), exactly as
        # ops.masking.lp_norm with normalize=True.
        from .. import masking as mk

        outs = []
        for i, (h_b, w_b) in enumerate(shapes):
            s = out[:, i * L:(i + 1) * L]            # (C, B*F)
            s = s.reshape(C, B, F).transpose(1, 0, 2) / float(h_b * w_b)
            outs.append(mk._safe_pow_static(s, 1.0 / float(pool_beta)))
        return outs

    @jax.custom_vjp
    def fused(gi_tuple, E_tuple):
        return tuple(stack_call(list(gi_tuple), list(E_tuple)))

    def fused_fwd(gi_tuple, E_tuple):
        return fused(gi_tuple, E_tuple), (gi_tuple, E_tuple)

    def fused_bwd(res, gout):
        gi_tuple, E_tuple = res
        _, vjp = jax.vjp(
            lambda gis, Es: tuple(jnp_impl(list(gis), list(Es))),
            gi_tuple, E_tuple,
        )
        return vjp(tuple(gout))

    fused.defvjp(fused_fwd, fused_bwd)

    def call(gi_list, E_list):
        return list(fused(tuple(gi_list), tuple(E_list)))

    return call
