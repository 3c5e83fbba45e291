"""AOT cache warmup: precompile the standard (display, resolution, mode)
grid into the persistent XLA compilation cache.

Cold-compiling the fused 4K video step takes ~2 minutes on this toolchain
(VERDICT r1 weak #6); the package enables a persistent cache in
``~/.cache/colorvideovdp_tpu``, so compiles are paid once per shape. This
tool front-loads that cost (run it at install time or in a deployment's
image-bake step) so first-use CLI latency matches the reference's.

Usage:
  python tools/warmup_cache.py            # full grid (~10-20 min cold)
  python tools/warmup_cache.py --quick    # 1080p SDR only
  python tools/warmup_cache.py --res 3840x2160 --display standard_hdr_pq
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = {"720p": (1280, 720), "1080p": (1920, 1080), "4k": (3840, 2160)}


def warm_one(display, W, H, mode, fps=30.0):
    import numpy as np

    import colorvideovdp_tpu as cv

    m = cv.cvvdp(display_name=display, quiet=True)
    t0 = time.time()
    if mode == "image":
        T = np.zeros((H, W, 3), np.uint8)
        m.predict(T, T, dim_order="HWC")
    else:
        N = max(10, m.filter_len if hasattr(m, "filter_len") else 10)
        T = np.zeros((H, W, 3, N), np.uint8)
        m.predict(T, T, dim_order="HWCF", frames_per_second=fps)
    print(f"  {display} {W}x{H} {mode}: {time.time() - t0:.1f}s",
          flush=True)


def seed_one(display, W, H, fps=30.0):
    """AOT-compile the video (first + steady) and image step executables for
    one (display, resolution, fps) without touching the device data path:
    ``jit.lower(ShapeDtypeStruct...).compile()`` writes the persistent-cache
    entries that ``predict`` will later hit, with no content uploads (the
    tunnel in this container is ~25x slower on first contact,
    docs/compile_breakdown.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters

    t0 = time.time()
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

    steady = m._get_video_step(vs, "DKLd65", shape, np.uint8, first=False)
    steady.lower(tail_sd, tail_sd, raw_sd, raw_sd).compile()
    # predict's first block uses the tail-init program + the steady step
    # (the specialised first-block program no longer exists on that path);
    # warm the scanned multi-block program too.
    tinit = m._get_tail_init_fn(vs, "DKLd65", shape, np.uint8, "replicate")
    flat_sd = jax.ShapeDtypeStruct((int(np.prod(shape)),), jnp.uint8)
    tinit.lower(flat_sd).compile()
    if m.temp_padding == "symmetric":
        thead = m._get_tail_init_fn(vs, "DKLd65",
                                    (1, fl - 1, 3, H, W), np.uint8,
                                    "symmetric")
        head_flat = jax.ShapeDtypeStruct(((fl - 1) * 3 * H * W,), jnp.uint8)
        thead.lower(head_flat).compile()
    # Same HBM budget as predict_video_source: oversized scan groups are a
    # compile-time OOM (r5: 4K blk=12 K=4 needed 16.34 GB on a 15.75 GB
    # v5e), so warm only the group size production will actually form.
    K = int(getattr(m, "scan_group", 0) or 0)
    K = min(K, m.scan_group_limit(H * W, blk, int(np.prod(shape))))
    if K >= 2:
        sfn = m._get_video_scan_step(vs, "DKLd65", shape, np.uint8, K)
        sfn.lower(tail_sd, tail_sd, *([flat_sd] * (2 * K))).compile()
    img_shape = (1, 1, 3, H, W)
    img = m._get_image_step(vs, "DKLd65", img_shape, np.uint8)
    img_sd = jax.ShapeDtypeStruct(img_shape, jnp.uint8)
    img.lower(img_sd, img_sd).compile()
    print(f"  {display} {W}x{H} fps={fps} blk={blk}: "
          f"seeded in {time.time() - t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--res", default=None, help="WxH override")
    ap.add_argument("--display", default=None)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--make-seed", action="store_true",
                    help="AOT-compile the standard grid into the bundled "
                         "cache seed dir (colorvideovdp_tpu/xla_cache_seed) "
                         "instead of executing warmup predicts")
    args = ap.parse_args()

    if args.make_seed:
        seed_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "colorvideovdp_tpu", "xla_cache_seed",
        )
        os.makedirs(seed_dir, exist_ok=True)
        os.environ["JAX_COMPILATION_CACHE_DIR"] = seed_dir
        os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
        if args.res:
            W, H = (int(v) for v in args.res.split("x"))
            resolutions = [(W, H)]
        else:
            resolutions = list(RES.values())
        displays = ([args.display] if args.display
                    else ["standard_4k", "standard_hdr_pq"])
        for display in displays:
            for W, H in resolutions:
                seed_one(display, W, H, args.fps)
        print(f"seed written to {seed_dir}")
        return

    if args.res:
        W, H = (int(v) for v in args.res.split("x"))
        resolutions = [(W, H)]
    elif args.quick:
        resolutions = [RES["1080p"]]
    else:
        resolutions = list(RES.values())
    displays = ([args.display] if args.display
                else (["standard_fhd"] if args.quick
                      else ["standard_4k", "standard_hdr_pq"]))

    print("warming persistent XLA cache "
          f"({len(resolutions) * len(displays) * 2} entries)...", flush=True)
    for display in displays:
        for W, H in resolutions:
            for mode in ("image", "video"):
                warm_one(display, W, H, mode, args.fps)
    print("done.")


if __name__ == "__main__":
    main()
