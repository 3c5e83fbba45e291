"""Predict quality for a pair of test/reference images stored as numpy
arrays. Run from the repository root:  python examples/ex_simple_image.py

Expected (matches the reference implementation run on the same inputs):
Noise - Quality: ~8.95 JOD
Blur  - Quality: ~8.52 JOD
"""

import os

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
import ex_utils as utils
from colorvideovdp_tpu.io.video_source_file import load_image_as_array

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")

I_ref = load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
I_test_noise = utils.imnoise(I_ref, np.sqrt(0.003))
I_test_blur = utils.imgaussblur(I_ref, 2)

metric = cvvdp.cvvdp(display_name="standard_4k", heatmap="threshold")

Q_JOD_noise, stats_noise = metric.predict(I_test_noise, I_ref,
                                          dim_order="HWC")
print(f"Noise - Quality: {float(Q_JOD_noise):.3f} JOD")

Q_JOD_blur, stats_blur = metric.predict(I_test_blur, I_ref, dim_order="HWC")
print(f"Blur - Quality: {float(Q_JOD_blur):.3f} JOD")
