"""Collective inventory of the sharded image-scoring HLO on an 8-dev mesh.

Counts GSPMD-inserted collectives (all-gather / all-reduce / ppermute /
all-to-all / reduce-scatter) and their operand shapes in the compiled
sharded scoring step, to verify the sharded trace's cross-chip traffic is
conv halos + scalar pooling reductions, not full-tensor remats (the
"involuntary full rematerialization" failure mode the reshard hints in
parallel/sharding.py exist to prevent).

Backend-independent: GSPMD partitioning (and thus the collective set) is
decided before backend lowering, so the CPU-mesh inventory equals the TPU
one. Measured r5 at 512x768 on a (2,4) mesh: 204 collective-permutes
totalling 2.4 MB/step/device (halo rows, <=9 rows each) + one 9 KB
all-gather (final pooling) — no full-tensor collectives.

Usage: python tools/hlo_collective_audit.py
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
import sys, re, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import colorvideovdp_tpu as cv
from colorvideovdp_tpu.io.video_source import video_source_array
from colorvideovdp_tpu.parallel.sharding import (
    make_mesh, image_pair_sharding, shard_scoring_fn)

H, W = 512, 768
mesh = make_mesh(8)  # (2, 4) batch x space
rng = np.random.RandomState(0)
test = rng.randint(0, 255, (2, H, W, 3), dtype=np.uint8)
ref = rng.randint(0, 255, (2, H, W, 3), dtype=np.uint8)

m = cv.cvvdp(display_name="standard_4k", quiet=True)
m._ensure_pyramids(W, H)
vs = video_source_array(test, ref, 0, dim_order="BHWC",
                        display_photometry=m.display_photometry)
raw_t = vs.get_raw_block("test", 0, 1)
raw_r = vs.get_raw_block("reference", 0, 1)
fn = shard_scoring_fn(m, vs, "DKLd65", raw_t.shape, raw_t.dtype, mesh)
sh = image_pair_sharding(mesh)
lowered = fn.lower(jax.device_put(raw_t, sh), jax.device_put(raw_r, sh))
txt = lowered.compile().as_text()

pat = re.compile(
    r"^\s*%?\S+ = (\S+) (all-gather|all-reduce|collective-permute|"
    r"all-to-all|reduce-scatter)", re.M)
counts = collections.Counter()
bytes_by_kind = collections.Counter()


def shape_bytes(s):
    m2 = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m2:
        return 0
    dt, dims = m2.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    sz = {"f32": 4, "bf16": 2, "f16": 2, "u8": 1, "s8": 1,
          "u32": 4, "s32": 4, "pred": 1, "f64": 8}.get(dt, 4)
    return n * sz


for mt in pat.finditer(txt):
    shp, kind = mt.groups()
    counts[kind] += 1
    bytes_by_kind[kind] += shape_bytes(shp)

print("collective counts:", dict(counts))
print("bytes by kind (per step, per device):",
      {k: f"{v/1e6:.3f} MB" for k, v in bytes_by_kind.items()})

# Largest individual collectives
sized = sorted(
    ((shape_bytes(mt.group(1)), mt.group(2), mt.group(1))
     for mt in pat.finditer(txt)), reverse=True)[:12]
for b, kind, shp in sized:
    print(f"  {b/1e6:8.3f} MB  {kind:20s} {shp}")
