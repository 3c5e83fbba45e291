"""Predict quality for synthetic noisy videos (static vs dynamic noise).
Run from the repository root:  python examples/ex_simple_video.py

Expected (minted from the reference run on identical seeded inputs):
static noise ~7.62 JOD, dynamic noise ~9.01 JOD (seed-dependent).
"""

import os
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
import ex_utils as utils
from colorvideovdp_tpu.io.video_source_file import load_image_as_array

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")

I_ref = load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
N, fps = 60, 30
V_ref = np.repeat(I_ref[..., np.newaxis], N, axis=3)
N_amplitude = 0.07
V_static_noise = utils.imnoise(V_ref, N_amplitude, static=True)
V_dynamic_noise = utils.imnoise(V_ref, N_amplitude)

metric = cvvdp.cvvdp(display_name="standard_4k", heatmap=None)

start = time.time()
Q_static, _ = metric.predict(V_static_noise, V_ref, dim_order="HWCF",
                             frames_per_second=fps)
print(f"Quality for static noise: {float(Q_static):.3f} JOD "
      f"(took {time.time() - start:.4f} secs)")

start = time.time()
Q_dynamic, _ = metric.predict(V_dynamic_noise, V_ref, dim_order="HWCF",
                              frames_per_second=fps)
print(f"Quality for dynamic noise: {float(Q_dynamic):.3f} JOD "
      f"(took {time.time() - start:.4f} secs)")
