"""Profile the metric with jax.profiler: preload a clip, run the metric
under a trace, and print a per-step wall-clock summary. Open the dump with
TensorBoard or Perfetto (reference: examples/test_profiler.py, which uses
torch.profiler).

Run from the repository root:  python examples/test_profiler.py
"""

import os
import time

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
from colorvideovdp_tpu.io.video_source import video_source_array
from colorvideovdp_tpu.io.video_source_file import video_source_file

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/cvvdp_trace")

tst_fname = os.path.join(MEDIA, "aliasing", "ferris-bicubic-bicubic.mp4")
ref_fname = os.path.join(MEDIA, "aliasing", "ferris-ref.mp4")

display_name = "standard_fhd"
frames = int(os.environ.get("FRAMES", 30))

metric = cvvdp.cvvdp(display_name=display_name, heatmap=None)

# preload=True reads every frame into host RAM up front (random access).
vs_file = video_source_file(tst_fname, ref_fname,
                            display_photometry=display_name, frames=frames,
                            preload=True)

print(f"Pre-loading {frames} frames...")
start = time.time()
H, W, N = vs_file.get_video_size()
tst = vs_file.get_raw_block("test", 0, N)
ref = vs_file.get_raw_block("reference", 0, N)
print(f"Loading frames took {time.time() - start:.4f} secs")

# Decoded uint8 frames -> array source (decode now out of the timed path).
vs = video_source_array(
    tst.transpose(0, 2, 1, 3, 4), ref.transpose(0, 2, 1, 3, 4),
    vs_file.get_frames_per_second(), dim_order="BCFHW",
    display_photometry=metric.display_photometry,
)
del vs_file

# Warm-up pass: compile outside the trace so the profile shows steady state.
print("Compiling...")
start = time.time()
Q, _ = metric.predict_video_source(vs)
print(f"First (compiling) pass: {time.time() - start:.4f} secs, "
      f"Q={float(Q):.4f} JOD")

print(f"Tracing to {TRACE_DIR} ...")
with jax.profiler.trace(TRACE_DIR):
    start = time.time()
    Q, stats = metric.predict_video_source(vs)
    elapsed = time.time() - start

print(f"Steady-state pass: {elapsed:.4f} secs "
      f"({N / elapsed:.1f} fps end-to-end), Q={float(Q):.4f} JOD")
print(f"Trace written to {TRACE_DIR} — inspect with TensorBoard "
      "(plugin 'profile') or Perfetto.")
