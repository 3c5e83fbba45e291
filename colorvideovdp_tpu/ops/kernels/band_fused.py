"""Pallas TPU mega-kernel: one pass per pyramid band. OPT-IN — measured
slower than the default route on v5e; see the verdict at the end of this
docstring.

The r2 fused path still materialised three full-band tensors per interior
band: the expanded next Gaussian level E (written by XLA, re-read by
kernel A-raw) and the M_pre/diff pair (written by A-raw, re-read by the
blur+transducer kernel). Per band that is ~52 plane-traversals of HBM
traffic for ~20 of actual input/output (reference chain:
lpyr_dec.py:358-414 + cvvdp_metric.py:660-751).

This kernel folds the whole band pipeline into one pallas_call:

  gausspyr_expand(G_{i+1})      -- in VMEM, polyphase; the lane-dim
                                   interleave runs in the transposed
                                   orientation (W on sublanes) exactly
                                   like pyramid_reduce's decimation,
                                   then stack+reshape merges the phases
  Weber contrast + band gain    -- (G_i - E) / L_bkg, clip 1000
  castleCSF LUT (relu ladder)   -- masking_fused._lut_eval
  mutual masking M = min(|T|,|R|)
  phase-uncertainty blur        -- blur_halo.apply_blur_tile on the VMEM
                                   slab (manual halo DMA of G_i rows)
  transducer + soft clamp       -- masking_fused kernel-B math
  spatial pooling (optional)    -- masked sum of safe_pow(D, beta)

HBM traffic per band drops to: read the G_i slab (halo'd) + the G_{i+1}
slab + write the pooled (C, L) scalars (or D for the heatmap path).

Scheduling notes (measured on v5e): per-plane DMAs are issued
start-all/wait-all so the copies overlap; the column expand batches all
2C quarter-planes through ONE transpose pair per half-group (planes ride
the lane axis of the transposed view — per-plane transposes pad LS2=24
lanes up to 128 and waste 5x); the CSF ladder is evaluated per channel
(re-sharing the relu terms across channels would persist 4 slab planes
of logS in VMEM — the budget is tighter than the VPU).

Shape support: W % 256 == 0 (so the half-width Wn = W/2 stays
lane-aligned and 2*Wn == W), H % 8 == 0, 48 <= H, 512 <= W <= 4096
(VMEM budget at the fixed th=16 row tile). Other shapes keep the r2
two-kernel route. Boundary semantics are bit-compatible with
ops.pyramid._expand_1d (edge-clamped polyphase, verified in
tests/test_fused_kernels.py) up to fp reassociation of the separable
passes (column pass first here; row pass first in XLA).

MEASURED VERDICT (v5e, 4K band 0, 2 frames, C=4): this kernel runs in
19.4 ms vs 12.5 ms for the default XLA-expand + masking_fused two-kernel
route, despite ~2.6x less HBM traffic. The polyphase interleave has no
native Mosaic layout op and lowers to VPU sublane shuffles + transposes
(ablation: row-interleave 6.2 ms, col-interleave 3.0 ms of the 19.6;
batching planes through shared ops changed nothing -> dispatch overhead
is not the cost, the shuffles are). The pipeline is therefore
compute-bound before it is bandwidth-bound here, and the per-band expand
materialisation is the cheaper design on this hardware. Kept opt-in
(``cvvdp.use_band_mega = True``) as the reproducible evidence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pyramid import K5
from .blur_halo import apply_blur_tile
from .masking_fused import _lut_eval, _EPS, _pospow, _exp10, _LOG2_10

TH = 16  # row tile; must be a multiple of 16 (gn slab bases stay 8-aligned)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def can_band_fused(C: int, H: int, W: int, kernel_size: int,
                   min_w: int = 512) -> bool:
    """Whether the mega-kernel supports this band shape + blur kernel.
    ``min_w`` drops to 256 on the interpret-mode test path (no VMEM limit
    there; keeps small test shapes on the kernel route)."""
    if kernel_size % 2 != 1 or (kernel_size - 1) // 2 > 8:
        return False
    if W % 256 != 0 or not (min_w <= W <= 4096):
        return False
    if H % 8 != 0 or H < 48:
        return False
    return -(-H // TH) >= 2


def _dma_slab(hbm, l, s, sem, i, *, step, LSb, Hreal, nT, j0):
    """s[k, r] := plane_k[base(i) + r] for every channel plane k, with
    base(i) = i*step - 8 and zeros standing in for rows outside
    [0, Hreal). All per-plane copies are started before any is waited on
    so they overlap. j0 is the first tile index whose full slab would
    overrun Hreal (static)."""
    nc = s.shape[0]

    def _copy_all(src_start, dst_start, size):
        cps = [
            pltpu.make_async_copy(
                hbm.at[k, l, pl.ds(src_start, size), :],
                s.at[k, pl.ds(dst_start, size), :], sem,
            )
            for k in range(nc)
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    size0 = min(LSb - 8, Hreal)

    @pl.when(i == 0)
    def _():
        s[:, 0:8, :] = jnp.zeros((nc, 8, s.shape[2]), jnp.float32)
        _copy_all(0, 8, size0)
        if 8 + size0 < LSb:
            s[:, 8 + size0:LSb, :] = jnp.zeros(
                (nc, LSb - 8 - size0, s.shape[2]), jnp.float32)

    if j0 > 1:

        @pl.when(jnp.logical_and(i > 0, i < j0))
        def _():
            base = pl.multiple_of(i * step - 8, 8)
            _copy_all(base, 0, LSb)

    for jc in range(max(1, j0), nT):
        base = jc * step - 8
        size = min(LSb, Hreal - base)

        @pl.when(i == jc)
        def _(base=base, size=size):
            _copy_all(base, 0, size)
            if size < LSb:
                s[:, size:LSb, :] = jnp.zeros(
                    (nc, LSb - size, s.shape[2]), jnp.float32)


def _col_expand_group(Xg, *, LS2, Wn):
    """Column-direction polyphase expand of a GROUP of quarter planes.
    ``Xg`` is (G, LS2, Wn); returns (G, LS2, 2*Wn). The whole group rides
    one transpose pair: (G*LS2, Wn) -> (Wn, G*LS2), sublane shifts along
    W, phase merge via stack+reshape, transpose back."""
    G = Xg.shape[0]
    k0, k1, k2, k3, k4 = (2.0 * float(K5[t]) for t in range(5))
    Xc = Xg.reshape(G * LS2, Wn)
    xT = Xc.T  # (Wn, G*LS2)
    z = jnp.zeros((1, G * LS2), jnp.float32)
    xTm1 = jnp.concatenate([z, xT[:Wn - 1]], axis=0)
    xTp1 = jnp.concatenate([xT[1:], z], axis=0)
    evT = k0 * xTm1 + k2 * xT + k4 * xTp1
    odT = k1 * xT + k3 * xTp1
    wrow = jax.lax.broadcasted_iota(jnp.int32, (Wn, 1), 0)
    # xp[0] = xn[0] (clamp) adds k0*xn[0] to ev[0]; xp[n+1] = xn[n-1]
    # adds k4 (ev) / k3 (od, W even — guaranteed by W % 256 == 0) at n-1.
    evT = jnp.where(wrow == 0, evT + k0 * xT, evT)
    evT = jnp.where(wrow == Wn - 1, evT + k4 * xT, evT)
    odT = jnp.where(wrow == Wn - 1, odT + k3 * xT, odT)
    ceT = jnp.stack([evT, odT], axis=1).reshape(2 * Wn, G * LS2)
    return ceT.T.reshape(G, LS2, 2 * Wn)


def _row_expand(CEg, i, *, cnt, LS2, Hn, nT):
    """Row-direction polyphase expand of a GROUP of col-expanded planes.
    ``CEg`` is (G, LS2, W) with CEg[:, r] = colexp(gn)[i*(TH//2) - 8 + r];
    returns the (G, 2*cnt, W) expanded planes at slab rows
    [i*TH - 8, i*TH + TH + 8). Output slab row 2j = ev[j] with global
    source m = i*(TH//2) - 4 + j, CE-relative rel(m) = j + 4. The whole
    group rides one op chain — per-plane ops cost ~2x in Mosaic
    dispatch overhead at 4K (measured: 6.2 -> 3.1 ms/call)."""
    k0, k1, k2, k3, k4 = (2.0 * float(K5[t]) for t in range(5))
    G, _, W = CEg.shape
    ev = k0 * CEg[:, 3:3 + cnt] + k2 * CEg[:, 4:4 + cnt] \
        + k4 * CEg[:, 5:5 + cnt]
    od = k1 * CEg[:, 4:4 + cnt] + k3 * CEg[:, 5:5 + cnt]
    rj = jax.lax.broadcasted_iota(jnp.int32, (1, cnt, 1), 1)
    # Global m == 0 (top clamp, +k0*xn[0]) sits at j = 4 on tile 0 only.
    ev = jnp.where(jnp.logical_and(rj == 4, i == 0),
                   ev + k0 * CEg[:, 8:9], ev)
    # Bottom clamp at m = Hn - 1 (H even): +k4 (ev) / +k3 (od). The owning
    # tiles are a static set; rel(Hn-1) = jL + 4 stays inside the slab.
    for ic in range(nT):
        jL = Hn + 3 - ic * (TH // 2)
        if not (0 <= jL < cnt):
            continue
        rel = jL + 4
        sel = jnp.logical_and(rj == jL, i == ic)
        ev = jnp.where(sel, ev + k4 * CEg[:, rel:rel + 1], ev)
        od = jnp.where(sel, od + k3 * CEg[:, rel:rel + 1], od)
    return jnp.stack([ev, od], axis=2).reshape(G, 2 * cnt, W)


def _band_kernel(gi_hbm, gn_hbm, out_ref, s_gi, s_gn, sem, sem2, *, C, H, W,
                 Hn, Wn, nT, luts, x0, scale_lut, gains, ref_only, mul,
                 taps, scale_blur, qs, p, xcm, max_v, pool_beta):
    l = pl.program_id(0)
    i = pl.program_id(1)
    th = TH
    LS = th + 16
    LS2 = th // 2 + 16
    cnt = th // 2 + 8
    j0_gi = (H - LS + 8) // th + 1
    j0_gn = max(1, (Hn - LS2 + 8) // (th // 2) + 1)

    rows_s = jax.lax.broadcasted_iota(jnp.int32, (LS, 1), 0)
    g_row = rows_s + i * th - 8
    valid_s = jnp.logical_and(g_row >= 0, g_row < H)

    if pool_beta is not None:

        @pl.when(jnp.logical_and(l == 0, i == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    _dma_slab(gn_hbm, l, s_gn, sem, i, step=th // 2, LSb=LS2, Hreal=Hn,
              nT=nT, j0=j0_gn)
    _dma_slab(gi_hbm, l, s_gi, sem2, i, step=th, LSb=LS, Hreal=H, nT=nT,
              j0=j0_gi)

    lb_r = lb_t = logL = None
    Eh = None
    mix = [None] * C
    diffs = [None] * C
    for c in range(C):
        # Expand lazily, one 4-plane half-group per two channels, so the
        # transpose temps and consumed planes die between channels
        # (materialising all 2C at once blows scoped VMEM at 4K).
        if c % 2 == 0:
            g = min(4, 2 * C - 2 * c)
            CEh = _col_expand_group(s_gn[2 * c:2 * c + g], LS2=LS2, Wn=Wn)
            Eh = _row_expand(CEh, i, cnt=cnt, LS2=LS2, Hn=Hn, nT=nT)
        k0_ = 2 * (c % 2)
        Ea = Eh[k0_]
        Eb = Eh[k0_ + 1]
        if c == 0:
            lb_r = jnp.maximum(Eb, 0.01)
            lb_t = lb_r if ref_only else jnp.maximum(Ea, 0.01)
            logL = jnp.log2(lb_r) * (1.0 / _LOG2_10)
        logS_c = _lut_eval(logL, luts[c:c + 1], x0, scale_lut)[0]
        S = _exp10(logS_c) * (float(gains[c]) * float(mul))
        T_p = jnp.minimum((s_gi[2 * c] - Ea) / lb_t, 1000.0) * S
        R_p = jnp.minimum((s_gi[2 * c + 1] - Eb) / lb_r, 1000.0) * S
        m_c = jnp.minimum(jnp.abs(T_p), jnp.abs(R_p))
        # Slab rows outside the real image must read zero for the blur's
        # zero-padding contract (E is nonzero there via the edge clamps).
        m_c = jnp.where(valid_s, m_c, 0.0)
        diffs[c] = jnp.abs(T_p[8:8 + th] - R_p[8:8 + th])
        yh = apply_blur_tile(lambda s, n, _m=m_c: _m[s:s + n, :], i, nT,
                             taps, th, H, W, W)
        m_b = yh * float(scale_blur)
        q = float(qs[c])
        mq_c = _pospow(jnp.abs(m_b) + _EPS, q) - _EPS ** q
        for d in range(C):
            term = float(xcm[c, d]) * mq_c
            mix[d] = term if mix[d] is None else mix[d] + term

    if pool_beta is None:
        for d in range(C):
            du = (_pospow(diffs[d] + _EPS, p) - _EPS ** float(p)) \
                / (1.0 + mix[d])
            out_ref[d, 0] = max_v * du / (max_v + du)
        return

    from ..masking import _pow_static

    b = float(pool_beta)
    L = out_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, W), 0)
    valid = (i * th + rows) < H
    crow = jax.lax.broadcasted_iota(jnp.int32, (C, L), 0)
    clane = jax.lax.broadcasted_iota(jnp.int32, (C, L), 1)
    for d in range(C):
        du = (_pospow(diffs[d] + _EPS, p) - _EPS ** float(p)) \
            / (1.0 + mix[d])
        Dv = max_v * du / (max_v + du)
        sp = _pow_static(Dv + _EPS, b) - _EPS ** b
        s_d = jnp.sum(jnp.where(valid, sp, 0.0))
        out_ref[...] += jnp.where((crow == d) & (clane == l), s_d, 0.0)


def band_fused_tpu(gi, gn, luts: np.ndarray, x0: float, x1: float, gains,
                   ref_only: bool, mul: float, taps, scale_blur: float,
                   qs, p: float, xcm: np.ndarray, max_v: float,
                   pool_beta=None, interpret=None):
    """One-pass band pipeline. gi: (2C, L, H, W) Gaussian level, gn:
    (2C, L, ceil(H/2), ceil(W/2)) next level. Returns (C, L) pooled
    sum(safe_pow(D, beta)) per plane, or (C, L, H, W) D with
    ``pool_beta=None`` (heatmap path)."""
    C2, L, H, W = gi.shape
    C = C2 // 2
    Hn, Wn = gn.shape[-2], gn.shape[-1]
    assert (Hn, Wn) == (-(-H // 2), -(-W // 2)), (gi.shape, gn.shape)
    assert can_band_fused(C, H, W, len(taps), min_w=256)
    th = TH
    nT = -(-H // th)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _band_kernel, C=C, H=H, W=W, Hn=Hn, Wn=Wn, nT=nT,
        luts=np.asarray(luts, np.float32), x0=float(x0),
        scale_lut=float((luts.shape[1] - 1) / (x1 - x0)),
        gains=tuple(float(g) for g in gains), ref_only=bool(ref_only),
        mul=float(mul), taps=tuple(float(t) for t in taps),
        scale_blur=float(scale_blur), qs=tuple(float(q) for q in qs),
        p=float(p), xcm=np.asarray(xcm, np.float32), max_v=float(max_v),
        pool_beta=None if pool_beta is None else float(pool_beta),
    )
    if pool_beta is None:
        out_specs = pl.BlockSpec((C, 1, th, W), lambda l, i: (0, l, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, L, th * nT, W), jnp.float32)
    else:
        out_specs = pl.BlockSpec((C, L), lambda l, i: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, L), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(L, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C2, th + 16, W), jnp.float32),
            pltpu.VMEM((C2, th // 2 + 16, Wn), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # The unrolled per-channel chain at 4K peaks ~30 MB of stack temps
        # (Mosaic does not fold slots across unrolled iterations); v5e has
        # 128 MiB VMEM so the conservative 16 MiB scoped default is the
        # binding constraint, not the hardware.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gi, gn)
    if pool_beta is None and th * nT != H:
        out = out[:, :, :H, :]
    return out


def make_band_fused(luts: np.ndarray, x0: float, x1: float, gains,
                    sens_corr: float, params, ref_only: bool, mul: float,
                    pool_beta=None):
    """Custom-VJP wrapper: fn(gi5, gn5) with gi5 (B, 2C, F, H, W) and gn5
    the next Gaussian level (B, 2C, F, ceil(H/2), ceil(W/2)). Forward runs
    the mega-kernel; backward recomputes through the jnp chain
    (gausspyr_expand + contrast + apply_masking_model), mirroring
    masking_fused.make_fused_mult_mutual_raw."""
    from ..blur import gaussian_kernel1d

    luts = np.asarray(luts, np.float32)
    g = tuple(float(gv) * float(sens_corr) for gv in gains)
    C = luts.shape[0]
    qs = np.asarray(params.mask_q, np.float32)[:C]
    xcm = np.power(2.0, np.asarray(params.xcm_weights,
                                   np.float32)).reshape(4, 4)[:C, :C]
    max_v = 10.0 ** float(params.d_max)
    taps = gaussian_kernel1d(params.pu_kernel_size, params.pu_dilate)
    scale_blur = 10.0 ** float(params.mask_c)

    def jnp_impl(gi, gn):
        from .. import masking as mk
        from ..pyramid import gausspyr_expand
        from . import csf_lut as _cl

        E = gausspyr_expand(gn, gi.shape[-2:])
        lb_r = jnp.clip(E[:, 1:2], 0.01, None)
        lb_t = lb_r if ref_only else jnp.clip(E[:, 0:1], 0.01, None)
        T = jnp.clip((gi[:, 0::2] - E[:, 0::2]) / lb_t, None, 1000.0) * mul
        R = jnp.clip((gi[:, 1::2] - E[:, 1::2]) / lb_r, None, 1000.0) * mul
        S = _cl.csf_lut_lookup(jnp.log10(lb_r[:, 0]), luts, x0, x1)
        S = jnp.moveaxis(S, 0, 1) * float(sens_corr)
        D = mk.apply_masking_model(T, R, S, params)
        if pool_beta is not None:
            return mk.lp_norm(D, pool_beta, dim=(-2, -1), normalize=True,
                              keepdim=False)
        return D

    def fwd_impl(gi, gn):
        from .. import masking as mk

        B, C2, F, H, W = gi.shape
        Hn, Wn = gn.shape[-2], gn.shape[-1]
        gi4 = jnp.transpose(gi, (1, 0, 2, 3, 4)).reshape(C2, B * F, H, W)
        gn4 = jnp.transpose(gn, (1, 0, 2, 3, 4)).reshape(C2, B * F, Hn, Wn)
        out = band_fused_tpu(gi4, gn4, luts, x0, x1, g, ref_only, mul,
                             taps, scale_blur, qs, params.mask_p, xcm,
                             max_v, pool_beta=pool_beta)
        if pool_beta is not None:
            s = out.reshape(C, B, F).transpose(1, 0, 2) / float(H * W)
            return mk._safe_pow_static(s, 1.0 / float(pool_beta))
        return out.reshape(C, B, F, H, W).transpose(1, 0, 2, 3, 4)

    @jax.custom_vjp
    def fused(gi, gn):
        return fwd_impl(gi, gn)

    def fused_fwd(gi, gn):
        return fwd_impl(gi, gn), (gi, gn)

    def fused_bwd(res, gout):
        gi, gn = res
        _, vjp = jax.vjp(jnp_impl, gi, gn)
        return vjp(gout)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused
