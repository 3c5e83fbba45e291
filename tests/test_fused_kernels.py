"""Interpret-mode parity tests for the TPU-only Pallas kernels.

These kernels are gated to the TPU backend in production (`jax.default_backend
() == "tpu"`), so the CPU golden suite never traces them; here they run in
Pallas interpret mode against the XLA reference paths so a semantic
regression fails on CPU before it ever reaches hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import colorvideovdp_tpu as cv
from colorvideovdp_tpu.ops import pyramid as pyr
from colorvideovdp_tpu.ops.kernels.pyramid_reduce import (
    can_reduce_tpu,
    reduce_tpu,
)


@pytest.mark.parametrize("shape", [(3, 256, 512), (2, 272, 384),
                                   (1, 544, 1024), (6, 64, 256),
                                   # pad-don't-gate: odd H / unaligned W
                                   # (the reference's own example content,
                                   # ex_simple_video 1024x683 and
                                   # ex_blur_over_time 1200x800)
                                   (2, 683, 1024), (2, 800, 1200),
                                   (1, 341, 600), (1, 57, 256)])
def test_reduce_kernel_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = rng.rand(*shape).astype(np.float32)
    if not can_reduce_tpu(x.shape):
        pytest.skip(f"shape {shape} not kernel-eligible")
    y_ref = np.asarray(pyr.gausspyr_reduce(jnp.asarray(x)))
    y_k = np.asarray(reduce_tpu(jnp.asarray(x), interpret=True))
    assert y_k.shape == y_ref.shape
    assert np.abs(y_ref - y_k).max() < 1e-6 * max(1.0, np.abs(y_ref).max())


@pytest.mark.parametrize("padding", ["replicate", "symmetric"])
def test_ingest_kernel_video_parity(padding):
    """force_fused routes the video front end through the Pallas ingest
    kernel (interpret mode on CPU); JOD must match the XLA path."""
    rng = np.random.RandomState(3)
    H, W, N, fps = 48, 128, 12, 30
    V_ref = np.repeat((rng.rand(H, W, 3, 1) * 255).astype(np.uint8), N,
                      axis=3)
    noise = rng.randn(*V_ref.shape) * 0.04
    V_test = ((V_ref.astype(np.float32) / 255 + noise).clip(0, 1)
              * 255).astype(np.uint8)

    kw = dict(display_name="standard_4k", quiet=True, temp_padding=padding,
              gpu_mem=1e-9)  # force block_N_frames == 1 => tail mode too
    m0 = cv.cvvdp(**kw)
    Q0, _ = m0.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    m1 = cv.cvvdp(**kw)
    m1.force_fused = True
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    assert abs(float(Q0) - float(Q1)) < 1e-4, (float(Q0), float(Q1))


@pytest.mark.parametrize("shape,ks,sigma", [
    ((3, 128, 256), 13, 3.0),
    ((2, 96, 640), 13, 3.0),
    ((1, 88, 384), 5, 1.2),
])
def test_blur_kernel_matches_xla(shape, ks, sigma):
    from colorvideovdp_tpu.ops import blur as bl
    from colorvideovdp_tpu.ops.kernels.blur_halo import (
        blur_tpu,
        can_blur_tpu,
    )

    rng = np.random.RandomState(7)
    x = rng.rand(*shape).astype(np.float32)
    if not can_blur_tpu(x.shape, ks):
        pytest.skip("not kernel-eligible")
    k = bl.gaussian_kernel1d(ks, sigma)
    y_ref = np.asarray(bl._blur_1d(bl._blur_1d(jnp.asarray(x), k, -2),
                                   k, -1))
    y_k = np.asarray(blur_tpu(jnp.asarray(x), k, interpret=True))
    assert np.abs(y_ref - y_k).max() < 1e-6


def test_odd_resolution_video_force_fused():
    """Kernel gating sanity at awkward sizes: odd W/H must route cleanly
    between Pallas and XLA paths and still match the pure-XLA result."""
    rng = np.random.RandomState(13)
    H, W, N, fps = 45, 151, 6, 24
    V_ref = np.repeat((rng.rand(H, W, 3, 1) * 255).astype(np.uint8), N,
                      axis=3)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1)
              * 255).astype(np.uint8)
    kw = dict(display_name="standard_4k", quiet=True)
    m0 = cv.cvvdp(**kw)
    Q0, _ = m0.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    m1 = cv.cvvdp(**kw)
    m1.force_fused = True
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    assert abs(float(Q0) - float(Q1)) < 1e-4, (float(Q0), float(Q1))


@pytest.mark.parametrize("H,W", [(96, 1200), (91, 683)])
def test_unaligned_width_video_force_fused(H, W):
    """Pad-don't-gate (VERDICT r2 item 2): clip widths off the 128-lane
    grid — 1200 (ex_blur_over_time content width) and 683 (ex_simple_video,
    transposed) — must route through the REAL fused kernel path (interpret
    mode here; the kernels zero-pad internally and correct at the true
    edges) and match the pure-XLA result."""
    from colorvideovdp_tpu.ops.kernels.blur_halo import can_blur_tpu
    from colorvideovdp_tpu.ops.kernels.masking_fused import (
        can_blur_transducer,
    )
    from colorvideovdp_tpu.ops.kernels.pyramid_reduce import can_reduce_tpu

    # The premise of the test: these shapes ARE kernel-eligible now.
    assert can_reduce_tpu((1, H, W))
    assert can_blur_tpu((1, H, W), 13)
    assert can_blur_transducer(4, H, W, 13)

    rng = np.random.RandomState(31)
    N, fps = 5, 24
    V_ref = np.repeat((rng.rand(H, W, 3, 1) * 255).astype(np.uint8), N,
                      axis=3)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1)
              * 255).astype(np.uint8)
    kw = dict(display_name="standard_4k", quiet=True)
    m0 = cv.cvvdp(**kw)
    Q0, _ = m0.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    m1 = cv.cvvdp(**kw)
    m1.force_fused = True
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    assert abs(float(Q0) - float(Q1)) < 1e-4, (float(Q0), float(Q1))


def test_blur_transducer_kernel_matches_chain():
    """Fused blur+transducer vs the separate blur -> kernel-B math."""
    from colorvideovdp_tpu.ops import blur as bl
    from colorvideovdp_tpu.ops.kernels.masking_fused import (
        _EPS,
        can_blur_transducer,
        fused_blur_transducer,
    )

    rng = np.random.RandomState(21)
    C, L, H, W = 4, 2, 96, 512
    ks, sigma = 13, 3.0
    assert can_blur_transducer(C, H, W, ks)
    m_pre = rng.rand(C, L, H, W).astype(np.float32) * 2.0
    diff = rng.rand(C, L, H, W).astype(np.float32) * 3.0
    qs = np.array([0.7, 0.9, 1.1, 0.8], np.float32)
    p, max_v, scale = 2.3, 300.0, 0.16
    xcm = rng.rand(4, 4).astype(np.float32)

    k = bl.gaussian_kernel1d(ks, sigma)
    m_b = np.asarray(bl._blur_1d(bl._blur_1d(jnp.asarray(m_pre), k, -2),
                                 k, -1)) * scale
    mq = [(np.abs(m_b[c]) + _EPS) ** qs[c] - _EPS ** qs[c]
          for c in range(C)]
    D_ref = np.empty_like(diff)
    for d in range(C):
        mix = sum(float(xcm[c, d]) * mq[c] for c in range(C))
        du = ((diff[d] + _EPS) ** p - _EPS ** p) / (1.0 + mix)
        D_ref[d] = max_v * du / (max_v + du)

    D_k = np.asarray(fused_blur_transducer(
        jnp.asarray(m_pre), jnp.asarray(diff), k, scale, qs, p, xcm,
        max_v, interpret=True,
    ))
    assert np.abs(D_ref - D_k).max() < 1e-4


def test_blur_transducer_pooled_matches_lp_norm():
    """pool_beta fuses sum(safe_pow(D, beta)) into the kernel; must equal
    lp_norm of the unpooled D to fp32 reassociation tolerance."""
    from colorvideovdp_tpu.ops import masking as mk
    from colorvideovdp_tpu.ops import blur as bl
    from colorvideovdp_tpu.ops.kernels.masking_fused import (
        fused_blur_transducer,
    )

    rng = np.random.RandomState(22)
    C, L, H, W = 4, 2, 88, 384  # H not divisible by the tile: masks matter
    ks, sigma, beta = 13, 3.0, 2.0
    m_pre = rng.rand(C, L, H, W).astype(np.float32)
    diff = rng.rand(C, L, H, W).astype(np.float32) * 3.0
    qs = np.array([0.7, 0.9, 1.1, 0.8], np.float32)
    p, max_v, scale = 2.3, 300.0, 0.16
    xcm = rng.rand(4, 4).astype(np.float32)
    k = bl.gaussian_kernel1d(ks, sigma)

    D = np.asarray(fused_blur_transducer(
        jnp.asarray(m_pre), jnp.asarray(diff), k, scale, qs, p, xcm, max_v,
        interpret=True))
    want = np.asarray(mk.lp_norm(jnp.asarray(D), beta, dim=(-2, -1),
                                 normalize=True, keepdim=False))
    sums = np.asarray(fused_blur_transducer(
        jnp.asarray(m_pre), jnp.asarray(diff), k, scale, qs, p, xcm, max_v,
        pool_beta=beta, interpret=True))
    got = np.asarray(mk._safe_pow_static(
        jnp.asarray(sums / (H * W)), 1.0 / beta))
    assert np.abs(want - got).max() < 1e-5


def test_halo_slab_blur_pool_matches_full_image():
    """Halo'd shard mode of the fused blur+transducer+pool (row_off/h_valid,
    SURVEY §5.7's design point): slicing the image into row slabs, giving
    each slab 8 rows of real neighbour context (exclude-edge reflections at
    the global edges) and summing the per-slab pooled partials must equal
    the single full-image pooled kernel."""
    from colorvideovdp_tpu.ops import blur as bl
    from colorvideovdp_tpu.ops.kernels.masking_fused import (
        fused_blur_transducer,
    )

    rng = np.random.RandomState(23)
    C, L, H, W = 4, 2, 64, 256
    ks, sigma, beta = 13, 3.0, 2.0
    m_pre = rng.rand(C, L, H, W).astype(np.float32)
    diff = rng.rand(C, L, H, W).astype(np.float32) * 3.0
    qs = np.array([0.7, 0.9, 1.1, 0.8], np.float32)
    p, max_v, scale = 2.3, 300.0, 0.16
    xcm = rng.rand(4, 4).astype(np.float32)
    k = bl.gaussian_kernel1d(ks, sigma)

    want = np.asarray(fused_blur_transducer(
        jnp.asarray(m_pre), jnp.asarray(diff), k, scale, qs, p, xcm,
        max_v, pool_beta=beta, interpret=True))

    n_sp, r = 4, 8
    H_loc = H // n_sp
    total = np.zeros_like(want)
    for s in range(n_sp):
        lo, hi = s * H_loc, (s + 1) * H_loc
        m_loc = m_pre[:, :, lo:hi]
        if s == 0:
            above = m_pre[:, :, 1:r + 1][:, :, ::-1]  # x[-s] = x[s]
        else:
            above = m_pre[:, :, lo - r:lo]
        if s == n_sp - 1:
            below = m_pre[:, :, -r - 1:-1][:, :, ::-1]
        else:
            below = m_pre[:, :, hi:hi + r]
        m_halo = np.concatenate([above, m_loc, below], axis=2)
        zr = np.zeros((C, L, r, W), np.float32)
        d_halo = np.concatenate([zr, diff[:, :, lo:hi], zr], axis=2)
        total += np.asarray(fused_blur_transducer(
            jnp.asarray(m_halo), jnp.asarray(d_halo), k, scale, qs, p,
            xcm, max_v, pool_beta=beta, interpret=True, row_off=r,
            h_valid=H_loc))
    assert np.abs(total - want).max() / max(want.max(), 1.0) < 1e-5


def _band_fused_setup(H, W, L=2, seed=41):
    """Shared fixtures for the band mega-kernel tests: a metric's real
    calibration constants plus a synthetic (2C, L, H, W) Gaussian level and
    its genuine reduce."""
    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    params = m._masking_params()
    rho = 2.0
    lut_rows = np.stack([m.csf.logS_of_logL(rho, om, cc)
                         for om, cc in ((0, 0), (0, 1), (0, 2), (5, 0))])
    x0, x1 = float(m.csf.log_L_bkg[0]), float(m.csf.log_L_bkg[-1])
    rng = np.random.RandomState(seed)
    gi = (rng.rand(8, L, H, W).astype(np.float32) * 80.0 + 1.0)
    gn = np.asarray(pyr.gausspyr_reduce(jnp.asarray(gi)))
    return m, params, lut_rows, x0, x1, gi, gn


def test_band_fused_kernel_matches_chain():
    """Mega-kernel D output vs the jnp chain (expand + contrast + CSF +
    blur + transducer), interpret mode."""
    from colorvideovdp_tpu.ops.kernels.band_fused import (
        can_band_fused,
        make_band_fused,
    )

    H, W, L = 96, 512, 2
    m, params, lut_rows, x0, x1, gi, gn = _band_fused_setup(H, W, L)
    assert can_band_fused(4, H, W, params.pu_kernel_size, min_w=256)
    gains = (1.0, 1.45, 1.0, 1.0)
    sens_corr = 1.0
    mul = 2.0

    fused = make_band_fused(lut_rows, x0, x1, gains, sens_corr, params,
                            False, mul, pool_beta=None)
    gi5 = jnp.asarray(gi).reshape(1, 8, L, H, W)
    gn5 = jnp.asarray(gn).reshape(1, 8, L, *gn.shape[-2:])
    D_k = np.asarray(fused(gi5, gn5))

    # jnp reference: identical math through the public ops
    from colorvideovdp_tpu.ops import masking as mk
    from colorvideovdp_tpu.ops.kernels import csf_lut as _cl

    E = pyr.gausspyr_expand(gn5, (H, W))
    lb_r = jnp.clip(E[:, 1:2], 0.01, None)
    lb_t = jnp.clip(E[:, 0:1], 0.01, None)
    T = jnp.clip((gi5[:, 0::2] - E[:, 0::2]) / lb_t, None, 1000.0) * mul
    R = jnp.clip((gi5[:, 1::2] - E[:, 1::2]) / lb_r, None, 1000.0) * mul
    S = _cl._jnp_lookup(jnp.log10(lb_r[:, 0]), lut_rows, x0, x1)
    S = jnp.moveaxis(S, 0, 1) * sens_corr
    D_ref = np.asarray(mk.apply_masking_model(T, R, S, params))

    assert D_k.shape == D_ref.shape
    denom = max(1.0, np.abs(D_ref).max())
    assert np.abs(D_k - D_ref).max() / denom < 2e-4, \
        np.abs(D_k - D_ref).max()


def test_band_fused_pooled_matches_lp_norm():
    """pool_beta path: pooled lp_norm must match pooling the unpooled D."""
    from colorvideovdp_tpu.ops import masking as mk
    from colorvideovdp_tpu.ops.kernels.band_fused import make_band_fused

    H, W, L = 88, 256, 2  # H off the tile grid: row masks matter
    m, params, lut_rows, x0, x1, gi, gn = _band_fused_setup(H, W, L, seed=43)
    gains = (1.0, 1.45, 1.0, 1.0)
    gi5 = jnp.asarray(gi).reshape(1, 8, L, H, W)
    gn5 = jnp.asarray(gn).reshape(1, 8, L, *gn.shape[-2:])

    f_D = make_band_fused(lut_rows, x0, x1, gains, 1.0, params, False, 2.0,
                          pool_beta=None)
    D = f_D(gi5, gn5)
    want = np.asarray(mk.lp_norm(D, 2.0, dim=(-2, -1), normalize=True,
                                 keepdim=False))
    f_Q = make_band_fused(lut_rows, x0, x1, gains, 1.0, params, False, 2.0,
                          pool_beta=2.0)
    got = np.asarray(f_Q(gi5, gn5))
    assert np.abs(want - got).max() < 1e-5, np.abs(want - got).max()


def test_band_fused_video_force_fused_parity():
    """End-to-end: a W%256==0 clip routed through the opt-in mega-kernel
    (use_band_mega + force_fused, interpret) must match the pure-XLA
    metric."""
    rng = np.random.RandomState(47)
    H, W, N, fps = 96, 512, 5, 24
    V_ref = np.repeat((rng.rand(H, W, 3, 1) * 255).astype(np.uint8), N,
                      axis=3)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1)
              * 255).astype(np.uint8)
    kw = dict(display_name="standard_4k", quiet=True)
    m0 = cv.cvvdp(**kw)
    Q0, _ = m0.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    m1 = cv.cvvdp(**kw)
    m1.force_fused = True
    m1.use_band_mega = True
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)
    assert abs(float(Q0) - float(Q1)) < 1e-4, (float(Q0), float(Q1))


def test_loss_gradient_fused_matches_xla():
    """The fused kernels on the loss path (reduce, blur, raw masking,
    pooling) all carry custom VJPs; loss value and gradient must match the
    pure-XLA path. FORCE_KERNEL also routes the reduce/blur kernels in
    interpret mode — a missing autodiff rule fails here on CPU (the TPU
    training path broke exactly this way once)."""
    import jax

    from colorvideovdp_tpu.ops import pyramid as pyr

    rng = np.random.RandomState(17)
    H, W = 64, 256
    ref = rng.rand(1, 3, 1, H, W).astype(np.float32)
    test = np.clip(ref + rng.randn(*ref.shape).astype(np.float32) * 0.1,
                   0, 1)

    m0 = cv.cvvdp(display_name="standard_4k", quiet=True)
    f0 = m0.get_loss_fn(H, W)
    v0, g0 = jax.value_and_grad(f0)(jnp.asarray(test), jnp.asarray(ref))

    m1 = cv.cvvdp(display_name="standard_4k", quiet=True)
    m1.force_fused = True
    pyr.FORCE_KERNEL = True
    try:
        f1 = m1.get_loss_fn(H, W)
        v1, g1 = jax.value_and_grad(f1)(jnp.asarray(test), jnp.asarray(ref))
    finally:
        pyr.FORCE_KERNEL = False

    assert abs(float(v0) - float(v1)) < 1e-4, (float(v0), float(v1))
    g0, g1 = np.asarray(g0), np.asarray(g1)
    denom = np.abs(g0).max()
    assert denom > 0 and np.abs(g0 - g1).max() / denom < 1e-3


def test_band_stack_kernel_matches_jnp_chain():
    """The stacked deep-band kernel (interpret): per-band SMEM LUT
    coefficients, matrix-form phase-uncertainty blur on the MXU path, and
    in-kernel pooling must match the per-band jnp chain, including a band
    small enough that the blur is statically skipped (identity matrices)."""
    from colorvideovdp_tpu.ops.kernels.band_stack import (
        make_band_stack,
        plan_band_stack,
    )

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    params = m._masking_params()
    C = 4
    shapes = [(34, 60), (17, 30), (9, 15), (5, 8)]  # (5,8): blur skipped
    inc, hp, wp = plan_band_stack(shapes, C)
    assert inc == [0, 1, 2, 3] and hp == 40 and wp == 128

    rho = [1.5, 0.75, 0.38, 0.19]
    luts = np.stack([
        np.stack([m.csf.logS_of_logL(r, m.omega[0 if cc < 3 else 1],
                                     cc if cc < 3 else 0)
                  for cc in range(C)])
        for r in rho
    ])
    x0, x1 = float(m.csf.log_L_bkg[0]), float(m.csf.log_L_bkg[-1])
    gains = np.array([1.0, 1.45, 1.0, 1.0], np.float32)

    rng = np.random.RandomState(2)
    B, F = 1, 3
    gi_list, E_list = [], []
    for h, w in shapes:
        base = 30.0 + 20.0 * rng.rand(B, 2 * C, F, h, w).astype(np.float32)
        gi_list.append(jnp.asarray(base))
        E_list.append(jnp.asarray(
            base + rng.randn(B, 2 * C, F, h, w).astype(np.float32)))

    fused = make_band_stack(luts, x0, x1, gains, 1.23, params, False, 2.0,
                            float(m.beta), shapes, interpret=True)
    out_k = fused(gi_list, E_list)

    # Reference: the exact per-band jnp chain the generic path runs.
    from colorvideovdp_tpu.ops import masking as mk
    from colorvideovdp_tpu.ops.kernels import csf_lut as _cl

    for i, (h, w) in enumerate(shapes):
        gi, E = gi_list[i], E_list[i]
        lb_r = jnp.clip(E[:, 1:2], 0.01, None)
        lb_t = jnp.clip(E[:, 0:1], 0.01, None)
        T = jnp.clip((gi[:, 0::2] - E[:, 0::2]) / lb_t, None, 1000.0) * 2.0
        R = jnp.clip((gi[:, 1::2] - E[:, 1::2]) / lb_r, None, 1000.0) * 2.0
        S = _cl._jnp_lookup(jnp.log10(lb_r[:, 0]), luts[i], x0, x1)
        S = jnp.moveaxis(S, 0, 1) * 1.23
        D = mk.apply_masking_model(T, R, S, params)
        q_ref = np.asarray(mk.lp_norm(D, float(m.beta), dim=(-2, -1),
                                      normalize=True, keepdim=False))
        q_k = np.asarray(out_k[i])
        assert q_k.shape == q_ref.shape
        err = np.abs(q_k - q_ref).max()
        assert err < 5e-5 * max(1.0, np.abs(q_ref).max()), (i, err)


def test_band_stack_video_force_fused_parity():
    """End-to-end: the stacked deep-band route (force_fused, interpret)
    must match the pure-XLA scoring of the same clip."""
    rng = np.random.RandomState(6)
    H, W, N = 64, 192, 8
    V_ref = rng.randint(0, 255, (H, W, 3, N), dtype=np.uint8)
    V_test = np.clip(
        V_ref.astype(np.int16) + (rng.randn(H, W, 3, N) * 10).astype(np.int16),
        0, 255,
    ).astype(np.uint8)

    m1 = cv.cvvdp(display_name="standard_fhd", quiet=True)
    m1.force_fused = True
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=30.0)

    m2 = cv.cvvdp(display_name="standard_fhd", quiet=True)
    Q2, _ = m2.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=30.0)
    assert abs(float(Q1) - float(Q2)) < 2e-4, (float(Q1), float(Q2))
