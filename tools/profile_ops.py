"""Per-HLO-op device profile of the cvvdp steady-state video step.

Runs the real per-block scoring step under ``jax.profiler.trace`` and
aggregates the perfetto trace's device-lane events by op name, attributing
time to pipeline components (ingest/reduce/expand/kernels/copies). This is
the committed version of the methodology behind docs/step_profile.md —
use it to re-measure the expand-interleave cost before deciding on the
phase-plane rewrite (docs/phase_plane_design.md).

Usage: python tools/profile_ops.py [--res 4k|1080p|720p] [--blk N] [--top N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = {"4k": (2160, 3840), "1080p": (1080, 1920), "720p": (720, 1280)}

# Component attribution: first matching pattern wins, top to bottom.
COMPONENTS = [
    ("copy", r"^copy"),
    ("custom-call (pallas)", r"^(fn|custom-call)"),
    ("conv (reduce/expand)", r"conv"),
    ("pad/interleave fusion", r"pad"),
    ("fusion", r"^(fusion|loop_|input_|kLoop|kInput)"),
    ("other", r""),
]


def classify(name: str) -> str:
    for label, pat in COMPONENTS:
        if re.search(pat, name):
            return label
    return "other"


def parse_trace(trace_dir: str):
    """Aggregate device-track slice durations by event name from the
    perfetto trace.json.gz jax.profiler writes."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device lanes: process names like "/device:TPU:0" or "TPU:0"; the CPU
    # backend uses host threads, so fall back to all complete events there.
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n.upper() or "device" in n.lower()}
    per_op = defaultdict(float)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        per_op[ev["name"]] += ev["dur"]  # microseconds
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="4k", choices=sorted(RES))
    ap.add_argument("--blk", type=int, default=0,
                    help="frames per block (0 = metric's own choice)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax

    import colorvideovdp_tpu as cv

    H, W = RES[args.res]
    fps = 30
    rng = np.random.RandomState(0)
    base = (rng.rand(H, W, 3) * 255).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    # --blk only sizes the clip; the metric picks its own block size (the
    # same estimate), so per-step figures assume they agree.
    blk = args.blk or m.estimate_block_N(H * W, 10**9)
    # Build a clip long enough for steady blocks plus the temporal halo.
    N = blk * (args.steps + 1)
    V = np.repeat(base[..., None], N, 3)
    V_t = np.clip(V.astype(np.int16) + rng.randint(-20, 20, V.shape), 0,
                  255).astype(np.uint8)

    # Warm (compile) pass.
    t0 = time.time()
    Q, _ = m.predict(V_t, V, dim_order="HWCF", frames_per_second=fps)
    print(f"warm pass {time.time()-t0:.1f}s jod={float(np.asarray(Q).reshape(-1)[0]):.4f}",
          flush=True)

    trace_dir = tempfile.mkdtemp(prefix="cvvdp_prof_")
    with jax.profiler.trace(trace_dir):
        Q, _ = m.predict(V_t, V, dim_order="HWCF", frames_per_second=fps)
        float(np.asarray(np.asarray(Q)).reshape(-1)[0])
    print(f"trace written to {trace_dir}")

    per_op = parse_trace(trace_dir)
    n_steps = max(1, N // blk)
    total = sum(per_op.values())
    print(f"\ndevice-busy total: {total/1e3:.1f} ms "
          f"({total/1e3/n_steps:.1f} ms/step, {total/1e3/N:.2f} ms/frame, "
          f"{N} frames, blk={blk})")

    by_comp = defaultdict(float)
    for name, us in per_op.items():
        by_comp[classify(name)] += us
    print("\nby component:")
    for comp, us in sorted(by_comp.items(), key=lambda kv: -kv[1]):
        print(f"  {comp:28s} {us/1e3:8.1f} ms  {100*us/total:5.1f}%")

    print(f"\ntop {args.top} ops:")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {us/1e3:8.1f} ms  {100*us/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
