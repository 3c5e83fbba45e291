"""Per-kernel compile-time breakdown of the cvvdp video step.

VERDICT r2 item 1: the 4K cold compile reached 352 s and the mitigation
plan needs to know *where* it goes — XLA graph vs individual Mosaic kernel
instances (per band x per kernel), and trace vs lower vs backend-compile.

Method: patch ``pl.pallas_call`` to record every distinct (kernel fn,
arg shapes) instance invoked while tracing the steady-state video step,
then compile each recorded instance separately with the persistent cache
disabled and report wall seconds per instance. Also times the full fused
step and the pure-XLA (``enable_fused_kernels=False``) step.

Run on the TPU:  python tools/compile_breakdown.py [--res 4k|1080p|720p]

Writes JSON to stdout and (with --out) to a file.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k", choices=["4k", "1080p", "720p"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-xla-only", action="store_true",
                    help="skip the enable_fused_kernels=False full compile")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full fused-step compile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import colorvideovdp_tpu as cv

    # True cold numbers: no persistent cache.
    jax.config.update("jax_compilation_cache_dir", None)

    H, W = {"4k": (2160, 3840), "1080p": (1080, 1920),
            "720p": (720, 1280)}[args.res]
    N, fps = 32, 30.0

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import get_temporal_filters

    rng = np.random.RandomState(7)
    base = np.linspace(0.1, 0.7, W, dtype=np.float32)[None, :, None]
    ref = (np.broadcast_to(base, (H, W, 3)) * 255).astype(np.uint8)
    V_ref = np.repeat(ref[:, :, :, None], N, axis=3)
    V_test = np.clip(
        V_ref.astype(np.int16)
        + (rng.randn(H, W, 3, N) * 8).astype(np.int16), 0, 255
    ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    m.F, _ = get_temporal_filters(fps, m.sigma_tf, m.beta_tf)
    m.filter_len = int(m.F[0].shape[0])
    vs = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                            display_photometry=m.display_photometry)
    blk = min(m.estimate_block_N(H * W, N), N)
    raw_t = vs.get_raw_block("test", 0, blk)
    fl = m.filter_len
    m._ensure_pyramids(W, H)

    # ---- record every pallas instance hit while tracing the step --------
    from jax.experimental import pallas as pl

    records = []  # (label, call, arg ShapeDtypeStructs)
    orig_pallas_call = pl.pallas_call

    def recording_pallas_call(kernel, *cargs, **ckw):
        call = orig_pallas_call(kernel, *cargs, **ckw)
        kfn = kernel
        while hasattr(kfn, "func"):
            kfn = kfn.func
        name = getattr(kfn, "__name__", str(kfn))

        def invoke(*a):
            sds = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in a)
            records.append((name, call, sds))
            return call(*a)

        return invoke

    pl.pallas_call = recording_pallas_call
    try:
        step = m._get_video_step(vs, "DKLd65", raw_t.shape, raw_t.dtype,
                                 first=False)
        tail_sd = jax.ShapeDtypeStruct((1, 3, fl - 1, H, W), jnp.float32)
        raw_sd = jax.ShapeDtypeStruct(raw_t.shape, raw_t.dtype)
        ex_args = (tail_sd, tail_sd, raw_sd, raw_sd)
        t0 = time.perf_counter()
        traced = step.trace(*ex_args)
        t_trace = time.perf_counter() - t0
    finally:
        pl.pallas_call = orig_pallas_call

    # Dedup instances: same kernel name + same shapes = same Mosaic compile.
    seen = {}
    for name, call, sds in records:
        key = (name, tuple((s.shape, str(s.dtype)) for s in sds))
        if key not in seen:
            seen[key] = (name, call, sds)

    out = {
        "res": args.res,
        "blk": int(blk),
        "fl": int(fl),
        "trace_s": round(t_trace, 1),
        "n_pallas_instances": len(seen),
        "kernels": [],
    }

    for (name, call, sds) in seen.values():
        t0 = time.perf_counter()
        try:
            jax.jit(call).lower(*sds).compile()
            dt = time.perf_counter() - t0
            err = None
        except Exception as e:  # keep going; report the failure
            dt = time.perf_counter() - t0
            err = f"{type(e).__name__}: {e}"[:200]
        ent = {
            "kernel": name,
            "in_shapes": [list(s.shape) for s in sds],
            "compile_s": round(dt, 1),
        }
        if err:
            ent["error"] = err
        out["kernels"].append(ent)
        print(f"  {name} {ent['in_shapes'][0]}: {dt:.1f}s"
              + (f" ERROR {err}" if err else ""), file=sys.stderr)

    out["kernels_total_s"] = round(sum(k["compile_s"]
                                       for k in out["kernels"]), 1)

    if not args.skip_full:
        t0 = time.perf_counter()
        lowered = traced.lower()
        out["lower_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        lowered.compile()
        out["full_fused_compile_s"] = round(time.perf_counter() - t0, 1)
        print(f"  full fused step: lower {out['lower_s']}s"
              f" compile {out['full_fused_compile_s']}s", file=sys.stderr)

    if not args.skip_xla_only:
        m2 = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
        m2.enable_fused_kernels = False
        m2.F, m2.filter_len = m.F, m.filter_len
        m2._ensure_pyramids(W, H)
        step2 = m2._get_video_step(vs, "DKLd65", raw_t.shape, raw_t.dtype,
                                   first=False)
        t0 = time.perf_counter()
        step2.lower(tail_sd, tail_sd, raw_sd, raw_sd).compile()
        out["xla_only_compile_s"] = round(time.perf_counter() - t0, 1)
        print(f"  pure-XLA step: {out['xla_only_compile_s']}s",
              file=sys.stderr)

    js = json.dumps(out, indent=1)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js)


if __name__ == "__main__":
    main()
