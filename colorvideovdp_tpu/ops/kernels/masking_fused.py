"""Fused Pallas kernels for the calibrated masking path (mult-mutual).

The per-band inner loop — CSF sensitivity, contrast coding, mutual masking,
cross-channel mixing, the excitation/inhibition transducer and the soft
clamp — is the metric's memory-bound hot spot. Two kernels bracket the
phase-uncertainty blur (which needs a spatial halo and stays in XLA):

  kernel A: S = 10^lut(logL); T_p = T*S*g; R_p = R*S*g;
            M_pre = min(|T_p|, |R_p|);  diff = |T_p - R_p|
  kernel B: m_c = safe_pow(M_c, q_c); mix = m @ 2^xcm;
            D = soft_clamp( safe_pow(diff, p) / (1 + mix) )

Gradients (the metric's loss mode) route through a custom VJP whose backward
recomputes with the plain-jnp implementation.

Applies only to the calibrated default configuration (mult-mutual masking,
cross-channel mixing on, soft scalar clamp); other models use the generic
jnp path in ops/masking.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._vmem import kernel_compiler_params

_EPS = 1e-5

# Base-2 transcendental forms for the kernels' pow/exp sites. The VPU's
# transcendental unit natively evaluates exp2/log2; lax.pow(x, y) lowers to
# the generic exp(y*log x) plus negative-base/edge-case selects. Every pow
# in these kernels has a strictly positive base (|.| + eps, or 10^logS), so
# the edge handling is dead weight — evaluate in base 2 directly. Error vs
# lax.pow is a few fp32 ulps (oracle tests at 1e-4..1e-6 stay green).
_LOG2_10 = float(np.log2(10.0))


def _pospow(x, e):
    """x ** e for strictly positive traced x, static float e."""
    return jnp.exp2(float(e) * jnp.log2(x))


def _exp10(x):
    """10 ** x for traced x."""
    return jnp.exp2(_LOG2_10 * x)


def _lut_eval(logL, luts, x0, scale):
    """Piecewise-linear LUT on a VMEM tile, in relu-ladder form: with knots
    at integers, g(x) = g(0) + sum_k c_k * relu(x - k) where c_k are the
    slope changes. TPU has no per-lane gather, and the naive per-segment
    where() chain costs ~5 vector ops per (channel, knot); the ladder's
    relu(x - k) is shared across channels, leaving one fma per channel per
    knot (~3x fewer ops). The reassociated sum agrees with segment-wise
    interpolation to a few fp32 ulps."""
    C, n = luts.shape
    lutf = np.asarray(luts, np.float64)
    slopes = lutf[:, 1:] - lutf[:, :-1]           # (C, n-1)
    coef = np.concatenate([slopes[:, :1],
                           slopes[:, 1:] - slopes[:, :-1]], axis=1)
    ind = jnp.clip((logL - x0) * scale, 0.0, float(n - 1))
    acc = [jnp.full_like(ind, float(lutf[c, 0])) for c in range(C)]
    for k in range(n - 1):
        r = jnp.maximum(ind - float(k), 0.0)
        for c in range(C):
            acc[c] = acc[c] + float(coef[c, k]) * r
    return acc


def _kernel_a(T_ref, R_ref, logL_ref, mpre_ref, diff_ref, *, luts, x0, scale,
              gains):
    logS = _lut_eval(logL_ref[0], luts, x0, scale)
    for c in range(luts.shape[0]):
        S = _exp10(logS[c]) * float(gains[c])
        T_p = T_ref[c] * S
        R_p = R_ref[c] * S
        mpre_ref[c] = jnp.minimum(jnp.abs(T_p), jnp.abs(R_p))
        diff_ref[c] = jnp.abs(T_p - R_p)


def _kernel_a_raw(gi_ref, E_ref, mpre_ref, diff_ref, *, luts, x0, scale,
                  gains, ref_only, mul):
    """Kernel A with the Weber contrast coding folded in: inputs are the
    raw Gaussian level (interleaved T/R channels) and the expanded next
    level; the contrast division, clip, band gain, log-luminance and CSF
    happen in VMEM (saves the con/logL materialisations between decompose
    and masking, reference chain: lpyr_dec.py:358-414 +
    cvvdp_metric.py:887-905)."""
    C = luts.shape[0]
    lb_r = jnp.maximum(E_ref[1], 0.01)
    lb_t = lb_r if ref_only else jnp.maximum(E_ref[0], 0.01)
    logS = _lut_eval(jnp.log2(lb_r) * (1.0 / _LOG2_10), luts, x0, scale)
    for c in range(C):
        S = _exp10(logS[c]) * (float(gains[c]) * float(mul))
        T_p = jnp.minimum((gi_ref[2 * c] - E_ref[2 * c]) / lb_t, 1000.0) * S
        R_p = jnp.minimum((gi_ref[2 * c + 1] - E_ref[2 * c + 1]) / lb_r,
                          1000.0) * S
        mpre_ref[c] = jnp.minimum(jnp.abs(T_p), jnp.abs(R_p))
        diff_ref[c] = jnp.abs(T_p - R_p)


def _kernel_b(m_ref, diff_ref, d_ref, *, qs, p, xcm, max_v):
    C = xcm.shape[0]
    mq = []
    for c in range(C):
        q = float(qs[c])
        mq.append(_pospow(jnp.abs(m_ref[c]) + _EPS, q) - _EPS**q)
    for d in range(C):
        mix = None
        for c in range(C):
            term = float(xcm[c, d]) * mq[c]
            mix = term if mix is None else mix + term
        du = (_pospow(diff_ref[d] + _EPS, p) - _EPS ** float(p)) / (1.0 + mix)
        d_ref[d] = max_v * du / (max_v + du)


def _blur_b_kernel(m_hbm, diff_ref, d_ref, scratch, sem, *, taps, scale,
                   qs, p, xcm, max_v, C, th, H, W, Hp, Wp, nT,
                   pool_beta=None, row_off=0, h_valid=None):
    """Fused phase-uncertainty blur + masking transducer: one halo'd read of
    M_pre per tile (manual DMA, same slab scheme as kernels/blur_halo.py),
    both blur passes + reflect corrections, the 10^mask_c scale, safe_pow,
    cross-channel mixing and the soft clamp in VMEM. Removes the blurred-M
    HBM materialisation between kernels A and B. H/W are the REAL image
    sizes; Hp/Wp the (aligned) padded buffer sizes — padded cells hold
    exact zeros (the masking chain maps them to D == 0)."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    LS = th + 16

    @pl.when(i == 0)
    def _():
        for c in range(C):
            scratch[c, 0:8, :] = jnp.zeros((8, Wp), jnp.float32)
            cp = pltpu.make_async_copy(
                m_hbm.at[c, l, pl.ds(0, th + 8), :],
                scratch.at[c, pl.ds(8, th + 8), :], sem,
            )
            cp.start()
            cp.wait()

    r0_last = (nT - 1) * th
    base_l = r0_last - 8
    size_l = Hp - base_l

    @pl.when(i == nT - 1)
    def _():
        for c in range(C):
            cp = pltpu.make_async_copy(
                m_hbm.at[c, l, pl.ds(base_l, size_l), :],
                scratch.at[c, pl.ds(0, size_l), :], sem,
            )
            cp.start()
            cp.wait()
            if size_l < LS:
                scratch[c, size_l:LS, :] = jnp.zeros((LS - size_l, Wp),
                                                     jnp.float32)

    if nT > 2:

        @pl.when(jnp.logical_and(i > 0, i < nT - 1))
        def _():
            for c in range(C):
                base = pl.multiple_of(i * th - 8, 8)
                cp = pltpu.make_async_copy(
                    m_hbm.at[c, l, pl.ds(base, LS), :],
                    scratch.at[c, pl.ds(0, LS), :], sem,
                )
                cp.start()
                cp.wait()

    from .blur_halo import apply_blur_tile

    # Accumulate the cross-channel mix while looping channels: only the C
    # mix accumulators stay live across channels (a per-channel mq list
    # kept C extra full tiles live and blew scoped vmem at 4K).
    mix = [None] * C
    for c in range(C):
        yh = apply_blur_tile(
            lambda s, n, _c=c: scratch[_c, pl.ds(s, n), :], i, nT, taps,
            th, H, W, Wp, v_corrections=row_off == 0,
        )
        m_b = yh * float(scale)
        q = float(qs[c])
        mq_c = _pospow(jnp.abs(m_b) + _EPS, q) - _EPS ** q
        for d in range(C):
            term = float(xcm[c, d]) * mq_c
            mix[d] = term if mix[d] is None else mix[d] + term

    if pool_beta is None:
        for d in range(C):
            du = (_pospow(diff_ref[d, 0] + _EPS, p) - _EPS ** float(p)) \
                / (1.0 + mix[d])
            d_ref[d, 0] = max_v * du / (max_v + du)
        return

    # Fused spatial pooling: accumulate sum(safe_pow(D, beta)) per channel
    # across row tiles — D itself never reaches HBM (heatmap-off path).
    # The (C, L) output is below Pallas's tile granularity, so the whole
    # array stays VMEM-resident (index map constant) and each grid step
    # adds its tile sum through a (row, lane) mask.
    @pl.when(jnp.logical_and(l == 0, i == 0))
    def _():
        d_ref[...] = jnp.zeros_like(d_ref)

    # safe_pow with the same static-exponent multiply chains as
    # ops.masking._pow_static — the transcendental pow path's ~1e-4
    # relative error visibly biases pooling sums at beta=2.
    from ..masking import _pow_static

    b = float(pool_beta)
    L = d_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, Wp), 0)
    gr = i * th + rows
    if row_off or h_valid is not None:
        # Halo'd shard slab: pool only the shard-owned row window (the
        # first/last row_off rows are exchanged neighbour context, owned
        # and pooled by the neighbouring shards).
        hv = h_valid if h_valid is not None else H - 2 * row_off
        valid = (gr >= row_off) & (gr < row_off + hv)
    else:
        valid = gr < H  # mask the padded rows of the last tile
    if W < Wp:
        # Padded columns contribute exactly 0 (diff == 0 there), but mask
        # them anyway so any upstream change cannot silently leak in.
        cols = jax.lax.broadcasted_iota(jnp.int32, (th, Wp), 1)
        valid = valid & (cols < W)
    crow = jax.lax.broadcasted_iota(jnp.int32, (C, L), 0)
    clane = jax.lax.broadcasted_iota(jnp.int32, (C, L), 1)
    for d in range(C):
        du = (_pospow(diff_ref[d, 0] + _EPS, p) - _EPS ** float(p)) \
            / (1.0 + mix[d])
        Dv = max_v * du / (max_v + du)
        sp = _pow_static(Dv + _EPS, b) - _EPS ** b
        s_d = jnp.sum(jnp.where(valid, sp, 0.0))
        d_ref[...] += jnp.where((crow == d) & (clane == l), s_d, 0.0)


def _use_blur_transducer(params, C, H, W, mesh) -> bool:
    """Whether the fused blur+transducer kernel replaces the blur_fn +
    kernel-B pair: single-device traces only (its halo DMA would cross
    shard boundaries), blur actually applicable (phase_uncertainty's
    shape-based skip), and the tile geometry supported."""
    return (
        mesh is None
        and params.pu_dilate != 0
        and H > params.pu_padsize and W > params.pu_padsize
        and can_blur_transducer(C, H, W, params.pu_kernel_size)
    )


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def can_blur_transducer(C, H, W, kernel_size: int) -> bool:
    if kernel_size % 2 != 1 or (kernel_size - 1) // 2 > 8:
        return False
    # Unaligned H/W are zero-padded by fused_blur_transducer's caller
    # (pad, don't gate — VERDICT r2 item 2); only size floors remain.
    if not (H >= 16 and 129 <= W <= 8192):
        return False
    Hp, Wp = _ceil_to(H, 8), _ceil_to(W, 128)
    th = _bt_tile(C, Hp, Wp)
    if th < (kernel_size - 1) // 2 + 2 or Hp < th + 8:
        return False
    return -(-Hp // th) >= 2


def _bt_tile(C, H, W):
    # Empirical scoped-vmem model (measured on v5e at th=24, W=3840:
    # 21.61 MB => ~59 live (th, W) fp32 tile-rows — Mosaic does not free
    # the per-channel tap terms between channels). The model is a point
    # fit and Mosaic's real liveness varies with shape: the real_hw
    # masked variant at W=512, th=120 measured 17.78 MB (~76 planes,
    # BENCH_r04.json — the r4 driver crash). The target stays at 14 MB
    # for headroom, but compiles are protected by the raised per-kernel
    # scoped-vmem limit (kernels/_vmem.py, 64 MB) rather than by this
    # fit being exact.
    # r5: the raised per-kernel scoped-VMEM limit (kernels/_vmem.py, 64 MB)
    # makes taller tiles legal, and they amortise the 2r=12 halo rows the
    # blur recomputes per tile. Measured on v5e at the 4K band-0 pooled
    # instance (tools/bt_tile_bench.py): th 16/24/32/40/48/64 ->
    # 3.34/3.17/3.08/3.01/2.98/3.32 ms/frame — th=48 best, th=64 regresses
    # (VMEM pressure stalls the DMA pipeline). The 44 MB target picks 48 at
    # W=3840; model-vs-measured liveness stays under the 64 MB limit even
    # at the narrow-W +23% overshoot (17.78 vs 14.5 MB at W=512, th=120).
    live_planes = 13 * C + 7
    th = (44 * 1024 * 1024) // (live_planes * W * 4) // 8 * 8
    th = max(8, min(128, th))
    return min(th, max(8, (H // 2) // 8 * 8))


def fused_blur_transducer(m_pre, diff, taps, scale, qs, p: float,
                          xcm: np.ndarray, max_v: float, pool_beta=None,
                          interpret=None, real_hw=None, row_off=0,
                          h_valid=None):
    """(C, L, H, W) M_pre (pre-blur) + diff -> D, with the phase-uncertainty
    blur applied to M in-kernel. With ``pool_beta`` the spatial pooling sum
    is fused too and the result is (C, L) per-plane sum(safe_pow(D, beta))
    — D itself never reaches HBM.

    ``real_hw``: when the caller already padded the tensors (zeros beyond
    the true edges), the real (H, W) the reflect corrections and pooling
    mask anchor to. Otherwise unaligned inputs are padded/sliced here.

    ``row_off``/``h_valid``: halo'd shard mode (pooled path only) — input
    rows are a shard's slab with ``row_off`` rows of real neighbour
    context above and below; vertical reflect corrections are disabled
    and only rows [row_off, row_off + h_valid) feed the pooled sum."""
    C, L, H, W = m_pre.shape
    if real_hw is not None:
        Hr, Wr = real_hw
        Hp, Wp = H, W
        assert Hp % 8 == 0 and Wp % 128 == 0
    else:
        Hr, Wr = H, W
        Hp, Wp = _ceil_to(H, 8), _ceil_to(W, 128)
        if (Hp, Wp) != (H, W):
            pad = ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W))
            m_pre = jnp.pad(m_pre, pad)
            diff = jnp.pad(diff, pad)
    th = _bt_tile(C, Hp, Wp)
    nT = -(-Hp // th)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert row_off == 0 or pool_beta is not None, (
        "halo'd shard mode is pooled-only")
    kern = functools.partial(
        _blur_b_kernel, taps=tuple(float(t) for t in taps),
        scale=float(scale), qs=tuple(float(q) for q in qs), p=float(p),
        xcm=np.asarray(xcm, np.float32), max_v=float(max_v), C=C, th=th,
        H=Hr, W=Wr, Hp=Hp, Wp=Wp, nT=nT,
        pool_beta=None if pool_beta is None else float(pool_beta),
        row_off=int(row_off),
        h_valid=None if h_valid is None else int(h_valid),
    )
    if pool_beta is None:
        out_specs = pl.BlockSpec((C, 1, th, Wp), lambda l, i: (0, l, i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, L, Hp, Wp), jnp.float32)
    else:
        out_specs = pl.BlockSpec((C, L), lambda l, i: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, L), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(L, nT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C, 1, th, Wp), lambda l, i: (0, l, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C, th + 16, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=kernel_compiler_params(),
        interpret=interpret,
    )(m_pre, diff)
    if pool_beta is None and real_hw is None and (Hp, Wp) != (H, W):
        out = out[:, :, :H, :W]
    return out


def _grid_specs(C, L, H, W, n_buffers):
    """Tile (H, W) so that n_buffers double-buffered (C,1,th,tw) fp32 blocks
    stay within ~8 MB of VMEM."""
    budget = 8 * 1024 * 1024 // (2 * n_buffers * (C + 1) * 4)
    tw = W if W <= 1024 else 1024
    th = max(8, min(H, budget // tw) // 8 * 8)
    grid = (L, -(-H // th), -(-W // tw))

    def im4(l, i, j):
        return (0, l, i, j)

    def im3(l, i, j):
        return (l, i, j)

    b4 = lambda: pl.BlockSpec((C, 1, th, tw), im4, memory_space=pltpu.VMEM)  # noqa: E731
    b3 = lambda: pl.BlockSpec((1, th, tw), im3, memory_space=pltpu.VMEM)  # noqa: E731
    return grid, b4, b3


def fused_csf_contrast(T, R, logL, luts: np.ndarray, x0: float, x1: float,
                       gains) -> tuple:
    """Kernel A over (C, L, H, W) tensors; logL is (L, H, W).
    Returns (M_pre, diff)."""
    C, L, H, W = T.shape
    n = luts.shape[1]
    scale = float((n - 1) / (x1 - x0))
    grid, b4, b3 = _grid_specs(C, L, H, W, n_buffers=5)
    kern = functools.partial(_kernel_a, luts=luts, x0=float(x0), scale=scale,
                             gains=tuple(float(g) for g in gains))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[b4(), b4(), b3()],
        out_specs=(b4(), b4()),
        out_shape=(
            jax.ShapeDtypeStruct((C, L, H, W), jnp.float32),
            jax.ShapeDtypeStruct((C, L, H, W), jnp.float32),
        ),
        compiler_params=kernel_compiler_params(),
        interpret=jax.default_backend() != "tpu",
    )(T, R, logL)


def fused_csf_contrast_raw(gi, E, luts: np.ndarray, x0: float, x1: float,
                           gains, ref_only: bool, mul: float) -> tuple:
    """Kernel A-raw over (2C, L, H, W) tensors. Returns (M_pre, diff),
    each (C, L, H, W)."""
    C2, L, H, W = gi.shape
    C = C2 // 2
    n = luts.shape[1]
    scale = float((n - 1) / (x1 - x0))
    # 2C + 2C input planes + 2C output planes, double-buffered, ~8 MB.
    budget = 8 * 1024 * 1024 // (2 * 6 * C * 4)
    tw = W if W <= 1024 else 1024
    th = max(8, min(H, budget // tw) // 8 * 8)
    grid = (L, -(-H // th), -(-W // tw))

    def im4c2(l, i, j):
        return (0, l, i, j)

    b_in = pl.BlockSpec((C2, 1, th, tw), im4c2, memory_space=pltpu.VMEM)
    b_out = pl.BlockSpec((C, 1, th, tw), im4c2, memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_a_raw, luts=luts, x0=float(x0),
                             scale=scale,
                             gains=tuple(float(g) for g in gains),
                             ref_only=bool(ref_only), mul=float(mul))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[b_in, b_in],
        out_specs=(b_out, b_out),
        out_shape=(
            jax.ShapeDtypeStruct((C, L, H, W), jnp.float32),
            jax.ShapeDtypeStruct((C, L, H, W), jnp.float32),
        ),
        compiler_params=kernel_compiler_params(),
        interpret=jax.default_backend() != "tpu",
    )(gi, E)


def fused_masking_transducer(M, diff, qs, p: float, xcm: np.ndarray,
                             max_v: float):
    """Kernel B over (C, L, H, W) tensors. Returns D."""
    C, L, H, W = M.shape
    grid, b4, _ = _grid_specs(C, L, H, W, n_buffers=3)
    kern = functools.partial(
        _kernel_b, qs=tuple(float(q) for q in qs), p=float(p),
        xcm=np.asarray(xcm, np.float32), max_v=float(max_v),
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[b4(), b4()],
        out_specs=b4(),
        out_shape=jax.ShapeDtypeStruct((C, L, H, W), jnp.float32),
        compiler_params=kernel_compiler_params(),
        interpret=jax.default_backend() != "tpu",
    )(M, diff)


def make_fused_mult_mutual_raw(luts: np.ndarray, x0: float, x1: float,
                               gains, sens_corr: float, params, blur_fn,
                               ref_only: bool, mul: float, mesh=None,
                               pool_beta=None):
    """Raw-band variant of ``make_fused_mult_mutual``: takes the Gaussian
    level ``gi`` (B, 2C, F, H, W, T/R interleaved) and the expanded next
    level ``E`` (same shape) and performs the Weber contrast coding
    in-kernel. Returns fn(gi, E) -> D (B, C, F, H, W), or — with
    ``pool_beta`` — the spatially pooled lp_norm (B, C, F), in which case
    D is never materialised on the fast path.

    With ``mesh`` both kernels run per shard via shard_map over the H axis
    (elementwise over rows — no collectives); the blur between them stays
    in XLA where GSPMD inserts the halo exchange. Gradients recompute
    through the jnp chain.
    """
    luts = np.asarray(luts, np.float32)
    g = tuple(float(gv) * float(sens_corr) for gv in gains)
    C = luts.shape[0]
    qs = np.asarray(params.mask_q, np.float32)[:C]
    xcm = np.power(2.0, np.asarray(params.xcm_weights,
                                   np.float32)).reshape(4, 4)[:C, :C]
    max_v = 10.0 ** float(params.d_max)

    def contrast_jnp(gi, E):
        """(B, 2C, F, H, W) -> (T, R, logL) exactly as the decompose +
        get_band chain computes them."""
        lb_r = jnp.clip(E[:, 1:2], 0.01, None)
        lb_t = lb_r if ref_only else jnp.clip(E[:, 0:1], 0.01, None)
        T = jnp.clip((gi[:, 0::2] - E[:, 0::2]) / lb_t, None, 1000.0) * mul
        R = jnp.clip((gi[:, 1::2] - E[:, 1::2]) / lb_r, None, 1000.0) * mul
        return T, R, jnp.log10(lb_r[:, 0])

    def jnp_impl(gi, E):
        from .. import masking as mk
        from . import csf_lut as _cl

        T, R, logL = contrast_jnp(gi, E)
        if mesh is not None:
            S = _cl._jnp_lookup(logL, luts, float(x0), float(x1))
        else:
            S = _cl.csf_lut_lookup(logL, luts, x0, x1)
        S = jnp.moveaxis(S, 0, 1) * float(sens_corr)
        D = mk.apply_masking_model(T, R, S, params)
        if pool_beta is not None:
            return mk.lp_norm(D, pool_beta, dim=(-2, -1), normalize=True,
                              keepdim=False)
        return D

    def a_call(gi4, E4):
        return fused_csf_contrast_raw(gi4, E4, luts, x0, x1, g, ref_only,
                                      mul)

    def b_call(m4, diff):
        return fused_masking_transducer(m4, diff, qs, params.mask_p, xcm,
                                        max_v)

    _sharded_pool_call = None
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        # The kernels see (C, L=B*F, H, W): rows sharded over "space", and
        # the folded batch*frame dim over "batch" (batched image pairs —
        # each device owns B/n_batch pairs' frames; axis size 1 is a no-op).
        bax = "batch" if "batch" in mesh.axis_names else None
        s4 = P(None, bax, "space", None)
        a_call = shard_map(a_call, mesh=mesh, in_specs=(s4, s4),
                           out_specs=(s4, s4), check_vma=False)
        b_call = shard_map(b_call, mesh=mesh, in_specs=(s4, s4),
                           out_specs=s4, check_vma=False)

        n_sp = int(dict(mesh.shape)["space"])

        def _can_shard_bt(H, W):
            """Halo'd fused blur+transducer+pool per shard (SURVEY §5.7's
            design point): each shard's row slab plus 8 exchanged halo rows
            must satisfy the kernel's tile geometry."""
            if pool_beta is None or params.pu_dilate == 0:
                return False
            if not (H > params.pu_padsize and W > params.pu_padsize):
                return False
            if H % n_sp != 0:
                return False
            H_loc = H // n_sp
            return H_loc >= 16 and can_blur_transducer(
                C, H_loc + 16, W, params.pu_kernel_size)

        def _sharded_pool_impl(m4, d4, H, W):
            """(C, L, H, W) sharded -> (C, L) pooled sums: ppermute 8-row
            halos between row shards (exclude-edge reflections built
            locally at the global edges), run the corrections-off fused
            blur+transducer+pool kernel on each slab, psum the partials
            over "space". The blur rides ICI as one neighbour exchange
            instead of a GSPMD halo per conv pass."""
            from ..blur import gaussian_kernel1d

            H_loc = H // n_sp
            r = 8
            taps = gaussian_kernel1d(params.pu_kernel_size,
                                     params.pu_dilate)

            def per_shard(m_loc, d_loc):
                fwd = [(k, k + 1) for k in range(n_sp - 1)]
                bwd = [(k + 1, k) for k in range(n_sp - 1)]
                from_above = jax.lax.ppermute(m_loc[:, :, -r:], "space",
                                              fwd)
                from_below = jax.lax.ppermute(m_loc[:, :, :r], "space",
                                              bwd)
                # Global edges: exclude-edge reflection (x[-s] = x[s]),
                # matching the single-device kernel's corrections.
                idx = jax.lax.axis_index("space")
                refl_top = m_loc[:, :, 1:r + 1][:, :, ::-1]
                refl_bot = m_loc[:, :, -r - 1:-1][:, :, ::-1]
                from_above = jnp.where(idx == 0, refl_top, from_above)
                from_below = jnp.where(idx == n_sp - 1, refl_bot,
                                       from_below)
                m_halo = jnp.concatenate(
                    [from_above, m_loc, from_below], axis=2)
                zr = jnp.zeros_like(d_loc[:, :, :r])
                d_halo = jnp.concatenate([zr, d_loc, zr], axis=2)
                out = fused_blur_transducer(
                    m_halo, d_halo, taps, 10.0 ** params.mask_c, qs,
                    params.mask_p, xcm, max_v, pool_beta=pool_beta,
                    row_off=r, h_valid=H_loc,
                )
                return jax.lax.psum(out, "space")

            return shard_map(per_shard, mesh=mesh, in_specs=(s4, s4),
                             out_specs=P(None, bax),
                             check_vma=False)(m4, d4)

        _sharded_pool_call = (_can_shard_bt, _sharded_pool_impl)

    def fwd_impl(gi, E):
        from .. import masking as mk

        B, C2, F, H, W = gi.shape
        gi4 = jnp.transpose(gi, (1, 0, 2, 3, 4)).reshape(C2, B * F, H, W)
        E4 = jnp.transpose(E, (1, 0, 2, 3, 4)).reshape(C2, B * F, H, W)
        m_pre, diff = a_call(gi4, E4)

        def _pool_tail(sums):
            # lp_norm tail: safe_pow(sum / N, 1/beta), matching
            # ops.masking.lp_norm exactly (shared by both fused-pool
            # routes so normalization edits cannot diverge).
            s = sums.reshape(C, B, F).transpose(1, 0, 2) / float(H * W)
            return mk._safe_pow_static(s, 1.0 / float(pool_beta))

        if _sharded_pool_call is not None and _sharded_pool_call[0](H, W):
            return _pool_tail(_sharded_pool_call[1](m_pre, diff, H, W))
        if _use_blur_transducer(params, C, H, W, mesh):
            from ..blur import gaussian_kernel1d

            taps = gaussian_kernel1d(params.pu_kernel_size,
                                     params.pu_dilate)
            out = fused_blur_transducer(m_pre, diff, taps,
                                        10.0 ** params.mask_c, qs,
                                        params.mask_p, xcm, max_v,
                                        pool_beta=pool_beta)
            if pool_beta is not None:
                return _pool_tail(out)
            D = out
        else:
            m5 = m_pre.reshape(C, B, F, H, W).transpose(1, 0, 2, 3, 4)
            m_blur = blur_fn(m5)
            m4 = jnp.transpose(m_blur,
                               (1, 0, 2, 3, 4)).reshape(C, B * F, H, W)
            D = b_call(m4, diff)
        D = D.reshape(C, B, F, H, W).transpose(1, 0, 2, 3, 4)
        if pool_beta is not None:
            return mk.lp_norm(D, pool_beta, dim=(-2, -1), normalize=True,
                              keepdim=False)
        return D

    @jax.custom_vjp
    def fused(gi, E):
        return fwd_impl(gi, E)

    def fused_fwd(gi, E):
        return fwd_impl(gi, E), (gi, E)

    def fused_bwd(res, gout):
        gi, E = res
        _, vjp = jax.vjp(jnp_impl, gi, E)
        return vjp(gout)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_mult_mutual(luts: np.ndarray, x0: float, x1: float, gains,
                           sens_corr: float, params, blur_fn, mesh=None):
    """Build the fused mult-mutual band function with a recompute-based VJP.

    Returns fn(T, R, logL) -> D where all tensors are (B, C, F, H, W) /
    (B, 1, F, H, W). ``blur_fn`` is the phase-uncertainty blur (with the
    10^mask_c scale) applied between the kernels; ``params`` is the
    MaskingParams for the jnp fallback used in the backward pass.

    When ``mesh`` is given (a jax Mesh with a "space" axis), both Pallas
    kernels are wrapped in ``shard_map`` over the H axis — they are purely
    elementwise over (H, W), so each shard runs the kernel on its own row
    slab with no collectives. The blur between them stays in XLA, where
    GSPMD inserts the row-halo exchange (SURVEY §5.7/§5.8). The caller must
    ensure H is divisible by the "space" axis size.
    """
    luts = np.asarray(luts, np.float32)
    # Fold the sensitivity correction into the per-channel gains.
    g = tuple(float(gv) * float(sens_corr) for gv in gains)
    C = luts.shape[0]
    qs = np.asarray(params.mask_q, np.float32)[:C]
    xcm = np.power(2.0, np.asarray(params.xcm_weights,
                                   np.float32)).reshape(4, 4)[:C, :C]
    max_v = 10.0 ** float(params.d_max)

    def jnp_impl(T, R, logL):
        # Reference-equivalent jnp path (used for the backward pass).
        from .. import masking as mk
        from . import csf_lut as _cl

        if mesh is not None:
            # A sharded backward cannot partition the Pallas LUT kernel;
            # use the GSPMD-safe jnp hat-basis form.
            S = _cl._jnp_lookup(logL[:, 0], luts, float(x0), float(x1))
        else:
            S = _cl.csf_lut_lookup(logL[:, 0], luts, x0, x1)  # (C,B,F,H,W)
        S = jnp.moveaxis(S, 0, 1) * float(sens_corr)
        return mk.apply_masking_model(T, R, S, params)

    def a_call(T4, R4, L3):
        return fused_csf_contrast(T4, R4, L3, luts, x0, x1, g)

    def b_call(m4, diff):
        return fused_masking_transducer(m4, diff, qs, params.mask_p, xcm,
                                        max_v)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        bax = "batch" if "batch" in mesh.axis_names else None
        s4 = P(None, bax, "space", None)
        s3 = P(bax, "space", None)
        a_call = shard_map(a_call, mesh=mesh, in_specs=(s4, s4, s3),
                           out_specs=(s4, s4), check_vma=False)
        b_call = shard_map(b_call, mesh=mesh, in_specs=(s4, s4),
                           out_specs=s4, check_vma=False)

    def fwd_impl(T, R, logL):
        B, Cc, F, H, W = T.shape
        T4 = jnp.transpose(T, (1, 0, 2, 3, 4)).reshape(Cc, B * F, H, W)
        R4 = jnp.transpose(R, (1, 0, 2, 3, 4)).reshape(Cc, B * F, H, W)
        L3 = logL.reshape(B * F, H, W)
        m_pre, diff = a_call(T4, R4, L3)
        if _use_blur_transducer(params, Cc, H, W, mesh):
            from ..blur import gaussian_kernel1d

            taps = gaussian_kernel1d(params.pu_kernel_size,
                                     params.pu_dilate)
            D = fused_blur_transducer(m_pre, diff, taps,
                                      10.0 ** params.mask_c, qs,
                                      params.mask_p, xcm, max_v)
        else:
            m5 = m_pre.reshape(Cc, B, F, H, W).transpose(1, 0, 2, 3, 4)
            m_blur = blur_fn(m5)
            m4 = jnp.transpose(m_blur,
                               (1, 0, 2, 3, 4)).reshape(Cc, B * F, H, W)
            D = b_call(m4, diff)
        return D.reshape(Cc, B, F, H, W).transpose(1, 0, 2, 3, 4)

    @jax.custom_vjp
    def fused(T, R, logL):
        return fwd_impl(T, R, logL)

    def fused_fwd(T, R, logL):
        return fwd_impl(T, R, logL), (T, R, logL)

    def fused_bwd(res, gout):
        T, R, logL = res
        _, vjp = jax.vjp(jnp_impl, T, R, logL)
        return vjp(gout)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused
