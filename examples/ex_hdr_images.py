"""HDR image pair scored with a custom photometric model (linear EOTF,
4000 cd/m^2 peak). Run from the repository root.

Expected: blur ~8.70 JOD (matches the reference exactly on this input).
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

I_ref = load_image_as_array(os.path.join(MEDIA, "nancy_church.hdr"))

# Scale to absolute units: peak 4000 cd/m^2 "photo" rendering.
L_peak = 4000.0
I_ref = I_ref / I_ref.max() * L_peak

I_test_noise = (I_ref + np.random.randn(*I_ref.shape).astype(np.float32)
                * (0.3 * I_ref)).clip(0, None)
I_test_blur = utils.imgaussblur(I_ref, 2)

pm = cvvdp.vvdp_display_photo_eotf(Y_peak=L_peak, contrast=100000,
                                   source_colorspace="BT.709-linear",
                                   EOTF="linear", E_ambient=0)
gm = cvvdp.vvdp_display_geometry((I_ref.shape[1], I_ref.shape[0]),
                                 diagonal_size_inches=30, distance_m=0.6)
metric = cvvdp.cvvdp(display_photometry=pm, display_geometry=gm)

Q_noise, _ = metric.predict(I_test_noise, I_ref, dim_order="HWC")
print(f"Noise - Quality: {float(Q_noise):.3f} JOD")
Q_blur, _ = metric.predict(I_test_blur, I_ref, dim_order="HWC")
print(f"Blur - Quality: {float(Q_blur):.3f} JOD")
