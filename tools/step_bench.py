"""Time ONLY the steady-state 4K video block step (perf bisection tool).

Prints one JSON line: blk, per-step ms (min-of-N, chained streaming), fps.
Variants are selected via env toggles before launch:
  CVVDP_DONATE_TAILS=1           donate tails into the step (pre-round-3)
  CVVDP_INTERIOR_PAD_INTERLEAVE=1  round-3 interior-pad expand (2x slower)
  CVVDP_NO_BAND_STACK=1          skip the stacked deep-band kernel
  CVVDP_MIN_W=512                per-band fused-route width gate (def. 360)

Usage: python tools/step_bench.py [--quick] [--reps 6] [--scan K] [--blk N]

``--blk N`` overrides the HBM-model block size (peak_gb in the output is
the measured device peak for re-fitting the model, VERDICT r3 weak #4).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    quick = "--quick" in sys.argv
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    scan_K = 0
    if "--scan" in sys.argv:
        scan_K = int(sys.argv[sys.argv.index("--scan") + 1])
    blk_override = 0
    if "--blk" in sys.argv:
        blk_override = int(sys.argv[sys.argv.index("--blk") + 1])

    import jax.numpy as jnp

    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters

    H, W = (720, 1280) if quick else (2160, 3840)
    fps = 30.0

    m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    m.F, _ = get_temporal_filters(fps, m.sigma_tf, m.beta_tf)
    m.filter_len = int(m.F[0].shape[0])
    fl = m.filter_len
    blk = blk_override or min(m.estimate_block_N(H * W, 10 ** 6), 32)
    N = blk

    rng = np.random.RandomState(7)
    base = np.linspace(0.1, 0.7, W, dtype=np.float32)[None, :, None]
    ref = (np.broadcast_to(base, (H, W, 3)) * 255).astype(np.uint8)
    V_ref = np.repeat(ref[:, :, :, None], N, axis=3)
    noise = (rng.randn(H, W, 3, N) * 8).astype(np.int16)
    V_test = np.clip(V_ref.astype(np.int16) + noise, 0, 255).astype(np.uint8)

    vs = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, blk)
    raw_r = vs.get_raw_block("reference", 0, blk)
    m._ensure_pyramids(W, H)

    t0 = time.perf_counter()
    dt = m._put_flat(raw_t)
    dr = m._put_flat(raw_r)
    float(np.asarray(dt.sum()))
    upload_s = time.perf_counter() - t0

    def fresh_tails():
        return [jnp.zeros((1, 3, fl - 1, H, W), jnp.float32) + 50.0
                for _ in range(2)]

    out_line = {
        "H": H, "W": W, "blk": blk, "fl": fl,
        "upload_s": round(upload_s, 1),
        "toggles": {k: os.environ[k] for k in
                    ("CVVDP_DONATE_TAILS", "CVVDP_INTERIOR_PAD_INTERLEAVE",
                     "CVVDP_NO_BAND_STACK", "CVVDP_MIN_W")
                    if k in os.environ},
    }

    if scan_K:
        sfn = m._get_video_scan_step(vs, "DKLd65", raw_t.shape, raw_t.dtype,
                                     scan_K)
        tails = fresh_tails()
        t0 = time.perf_counter()
        out = sfn(tails[0], tails[1], *([dt] * scan_K), *([dr] * scan_K))
        float(np.asarray(out[0]).sum())
        out_line["compile_s"] = round(time.perf_counter() - t0, 1)
        tails = [out[1], out[2]]
        chain = max(2, reps)
        acc = None
        t0 = time.perf_counter()
        for i in range(chain):
            out = sfn(tails[0], tails[1], *([dt] * scan_K), *([dr] * scan_K))
            tails = [out[1], out[2]]
            q = out[0].sum()
            acc = q if acc is None else acc + q
        float(np.asarray(acc))
        dt_s = time.perf_counter() - t0
        out_line["scan_K"] = scan_K
        out_line["ms_per_block"] = round(dt_s / (chain * scan_K) * 1e3, 1)
        out_line["fps"] = round(blk * scan_K * chain / dt_s, 2)
    else:
        step = m._get_video_step(vs, "DKLd65", raw_t.shape, raw_t.dtype,
                                 first=False)
        tails = fresh_tails()
        t0 = time.perf_counter()
        out = step(tails[0], tails[1], dt, dr)
        float(np.asarray(out[0]).sum())
        out_line["compile_s"] = round(time.perf_counter() - t0, 1)
        tails = [out[3], out[4]]

        # Latency: min-of-N synchronous steps.
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = step(tails[0], tails[1], dt, dr)
            float(np.asarray(out[0]).sum())
            tails = [out[3], out[4]]
            times.append(time.perf_counter() - t0)
        out_line["lat_ms_min"] = round(min(times) * 1e3, 1)
        out_line["lat_fps"] = round(blk / min(times), 2)

        # Streaming: chained dispatch, one readback.
        chain = 2 * reps
        acc = None
        t0 = time.perf_counter()
        for i in range(chain):
            out = step(tails[0], tails[1], dt, dr)
            tails = [out[3], out[4]]
            q = out[0].sum()
            acc = q if acc is None else acc + q
        float(np.asarray(acc))
        dt_s = time.perf_counter() - t0
        out_line["stream_ms"] = round(dt_s / chain * 1e3, 1)
        out_line["fps"] = round(blk * chain / dt_s, 2)

    try:
        import jax

        st = jax.devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in st:
            out_line["peak_gb"] = round(st["peak_bytes_in_use"] / 1e9, 2)
        if "bytes_limit" in st:
            out_line["hbm_limit_gb"] = round(st["bytes_limit"] / 1e9, 2)
    except Exception:
        pass

    print(json.dumps(out_line))


if __name__ == "__main__":
    main()
