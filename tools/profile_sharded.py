"""Per-HLO-op device profile of the SHARDED image scoring step on a (1,1)
mesh (real chip) — attribution for the sharded-path overhead
(SHARD_SMOKE.json image_sharded_cost_factor, VERDICT r4 item 4).

Usage: python tools/profile_sharded.py [--res 1080p|4k] [--reps 3]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import colorvideovdp_tpu as cv  # noqa: E402  (platform env)
import jax
from jax.sharding import Mesh

from profile_ops import parse_trace, classify  # noqa: E402

RES = {"4k": (2160, 3840), "1080p": (1080, 1920)}


def main():
    res = "1080p"
    if "--res" in sys.argv:
        res = sys.argv[sys.argv.index("--res") + 1]
    reps = 3
    H, W = RES[res]

    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.parallel.sharding import (
        image_pair_sharding,
        shard_scoring_fn,
    )

    rng = np.random.RandomState(3)
    ref = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    tst = np.clip(ref.astype(np.int16)
                  + (rng.randn(H, W, 3) * 12).astype(np.int16),
                  0, 255).astype(np.uint8)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("batch", "space"))
    mi = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    mi._ensure_pyramids(W, H)
    ivs = video_source_array(tst, ref, 0, dim_order="HWC",
                             display_photometry=mi.display_photometry)
    raw_t = ivs.get_raw_block("test", 0, 1)
    raw_r = ivs.get_raw_block("reference", 0, 1)
    i_sh = image_pair_sharding(mesh)
    fn = shard_scoring_fn(mi, ivs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
    dt = jax.device_put(raw_t, i_sh)
    dr = jax.device_put(raw_r, i_sh)

    out = fn(dt, dr)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.perf_counter()
    trace_dir = tempfile.mkdtemp(prefix="cvvdp_shprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = fn(dt, dr)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    wall = time.perf_counter() - t0
    print(f"traced {reps} sharded image steps in {wall:.1f}s wall")

    by_name = parse_trace(trace_dir)
    # Drop whole-program events (jit_*) — they envelope the op events and
    # would double-count.
    by_name = {k: v for k, v in by_name.items() if not k.startswith("jit_")}
    total = sum(by_name.values())
    comp = {}
    for name, dur in by_name.items():
        comp[classify(name)] = comp.get(classify(name), 0.0) + dur
    print(f"\ndevice-busy total: {total / 1e3:.1f} ms "
          f"({total / 1e3 / reps:.2f} ms/step)")
    print("\nby component:")
    for k, v in sorted(comp.items(), key=lambda kv: -kv[1]):
        print(f"  {k:30s} {v / 1e3:8.1f} ms  {100 * v / total:5.1f}%")
    print("\ntop 40 ops:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur / 1e3:10.1f} ms  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
