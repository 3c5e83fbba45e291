"""Cache-cold compile gate: prove every jit program the standard bench
configuration produces actually COMPILES on this toolchain, with the
persistent XLA cache bypassed.

Why this exists: the r4 driver bench crashed on a scoped-VMEM compile OOM
in a Pallas kernel instance (4K's 270x480 band at blk=10) that no test and
no warm-cache bench run had ever compiled fresh — the persistent cache
actively masks compile regressions (VERDICT r4 weak #3). This sweep
AOT-lowers-and-compiles (no execution, no content uploads) the steady-state
video step, the first-block tail-init programs, the scan-grouped step and
the image step at the model-picked block size, against a throwaway cache
dir, so a compile failure surfaces as a recorded gate result instead of a
dead bench.

Usage:
  python tools/compile_sweep.py --res 4k            # one resolution
  python tools/compile_sweep.py --res all --json    # full grid, JSON line
Run by bench.py as a subprocess in its preamble; the JSON result lands in
the bench output under "compile_sweep".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

# The throwaway cache dir must be set BEFORE colorvideovdp_tpu (and hence
# jax.config's cache settings) is imported.
if "COMPILE_SWEEP_CACHE" not in os.environ:
    os.environ["COMPILE_SWEEP_CACHE"] = tempfile.mkdtemp(prefix="xla_cold_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.environ["COMPILE_SWEEP_CACHE"]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = {"720p": (1280, 720), "1080p": (1920, 1080), "4k": (3840, 2160)}


def sweep_one(display: str, W: int, H: int, fps: float = 30.0) -> dict:
    """AOT-compile the full program set for one (display, resolution).
    Returns {"ok": bool, "seconds": float, "programs": [...], "error": ...}.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters

    t0 = time.time()
    programs = []
    m = cv.cvvdp(display_name=display, quiet=True)
    m.F, _ = get_temporal_filters(fps, m.sigma_tf, m.beta_tf)
    m.filter_len = fl = int(m.F[0].shape[0])
    tiny = np.zeros((H, W, 3, 2), np.uint8)
    vs = video_source_array(tiny, tiny, fps, dim_order="HWCF",
                            display_photometry=m.display_photometry)
    m._ensure_pyramids(W, H)
    blk = m.estimate_block_N(H * W, 3600)
    shape = (1, blk, 3, H, W)
    raw_sd = jax.ShapeDtypeStruct(shape, jnp.uint8)
    tail_sd = jax.ShapeDtypeStruct((1, 3, fl - 1, H, W), jnp.float32)
    flat_sd = jax.ShapeDtypeStruct((int(np.prod(shape)),), jnp.uint8)

    def compiled(tag, thunk):
        t = time.time()
        thunk()
        programs.append({"program": tag, "s": round(time.time() - t, 1)})

    try:
        compiled(
            f"video_steady blk={blk}",
            lambda: m._get_video_step(vs, "DKLd65", shape, np.uint8,
                                      first=False)
            .lower(tail_sd, tail_sd, raw_sd, raw_sd).compile())
        compiled(
            "tail_init replicate",
            lambda: m._get_tail_init_fn(vs, "DKLd65", shape, np.uint8,
                                        "replicate").lower(flat_sd).compile())
        if m.temp_padding == "symmetric":
            head_flat = jax.ShapeDtypeStruct(((fl - 1) * 3 * H * W,),
                                             jnp.uint8)
            compiled(
                "tail_init symmetric",
                lambda: m._get_tail_init_fn(
                    vs, "DKLd65", (1, fl - 1, 3, H, W), np.uint8,
                    "symmetric").lower(head_flat).compile())
        # Budget the scan group exactly as predict_video_source does: the
        # staged K uploads are live HBM arguments of the scan program (r5:
        # 4K blk=12 K=4 was a 16.34 GB compile-time OOM on a 15.75 GB v5e).
        K = int(getattr(m, "scan_group", 0) or 0)
        block_nbytes = int(np.prod(shape))  # uint8 raw block
        K = min(K, m.scan_group_limit(H * W, blk, block_nbytes))
        if K >= 2:
            compiled(
                f"video_scan K={K}",
                lambda: m._get_video_scan_step(vs, "DKLd65", shape, np.uint8,
                                               K)
                .lower(tail_sd, tail_sd, *([flat_sd] * (2 * K))).compile())
        img_shape = (1, 1, 3, H, W)
        img_sd = jax.ShapeDtypeStruct(img_shape, jnp.uint8)
        compiled(
            "image",
            lambda: m._get_image_step(vs, "DKLd65", img_shape, np.uint8)
            .lower(img_sd, img_sd).compile())
    except Exception as e:
        return {"display": display, "res": f"{W}x{H}", "blk": blk,
                "ok": False, "seconds": round(time.time() - t0, 1),
                "programs": programs, "error": str(e)[:500]}
    return {"display": display, "res": f"{W}x{H}", "blk": blk, "ok": True,
            "seconds": round(time.time() - t0, 1), "programs": programs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k",
                    help="720p|1080p|4k|all|WxH")
    ap.add_argument("--display", default="standard_hdr_pq")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--json", action="store_true",
                    help="print one JSON line (bench preamble mode)")
    args = ap.parse_args()

    if args.res == "all":
        resolutions = list(RES.values())
    elif args.res in RES:
        resolutions = [RES[args.res]]
    else:
        W, H = (int(v) for v in args.res.split("x"))
        resolutions = [(W, H)]

    results = [sweep_one(args.display, W, H, args.fps)
               for W, H in resolutions]
    ok = all(r["ok"] for r in results)
    out = {"cold_compile_ok": ok, "results": results,
           "cache_dir": os.environ["COMPILE_SWEEP_CACHE"]}
    if args.json:
        print(json.dumps(out))
    else:
        for r in results:
            state = "ok" if r["ok"] else f"FAILED: {r.get('error', '?')}"
            print(f"{r['display']} {r['res']} blk={r['blk']}: {state} "
                  f"({r['seconds']}s)", flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
