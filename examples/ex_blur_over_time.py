"""Video with time-varying blur, generated as a numpy array
(reference: examples/ex_blur_over_time.py; its docstring golden of 8.829 JOD
is CUDA/ffmpeg-era — the acceptance oracle is the reference executed locally,
see BASELINE.md "Locally minted goldens").

Run from the repository root:  python examples/ex_blur_over_time.py
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

I_ref = load_image_as_array(os.path.join(MEDIA, "tree.jpg"))

N = 60 * 4  # The number of frames
fps = 30
sigma_max = 2

V_ref = np.repeat(I_ref[..., np.newaxis], N, axis=3)
SIGMAs = np.concatenate(
    (np.linspace(0.01, sigma_max, N // 2),
     np.linspace(sigma_max, 0.01, N // 2))
)
V_blur = utils.imgaussblur(V_ref, SIGMAs)

metric = cvvdp.cvvdp(display_name="standard_4k", heatmap=None)

start = time.time()
Q_JOD, stats = metric.predict(V_blur, V_ref, dim_order="HWCF",
                              frames_per_second=fps)
end = time.time()

print(f"Quality for blur-over-time: {float(Q_JOD):.3f} JOD "
      f"(took {end - start:.4f} secs to compute)")
