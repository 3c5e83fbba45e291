"""Luminance-only (single-channel) input with absolute linear values.
Run from the repository root:  python examples/ex_luminance_only.py"""

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
# Greyscale luminance in cd/m^2 (SDR display range)
L_ref = (I_ref.astype(np.float32).mean(axis=2) / 255.0 * 200.0 + 0.5)
L_blur = utils.imgaussblur(np.repeat(L_ref[:, :, None], 3, 2), 2)[:, :, 0]

pm = cvvdp.vvdp_display_photo_eotf(Y_peak=200, contrast=1000,
                                   source_colorspace="luminance",
                                   EOTF="linear")
gm = cvvdp.vvdp_display_geometry((L_ref.shape[1], L_ref.shape[0]),
                                 diagonal_size_inches=30, distance_m=0.6)
metric = cvvdp.cvvdp(display_photometry=pm, display_geometry=gm)

Q, _ = metric.predict(L_blur[:, :, None], L_ref[:, :, None], dim_order="HWC")
print(f"Blur (luminance-only): {float(Q):.3f} JOD")
