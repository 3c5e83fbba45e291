"""Distortion visibility vs display peak luminance: as the simulated display
gets brighter, the noise becomes more visible and quality drops
(reference: examples/ex_display_brightness.py).

Run from the repository root:  python examples/ex_display_brightness.py
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
I_test_noise = utils.imnoise(I_ref, np.sqrt(0.001))

# Measure quality on displays of different brightness
disp_peaks = np.logspace(np.log10(1), np.log10(1000), 5)

# Display parameters
contrast = 1000   # Display contrast 1000:1
EOTF = "2.2"      # Standard gamma-encoding
E_ambient = 100   # Ambient light = 100 lux
k_refl = 0.005    # Reflectivity of the display

metric = cvvdp.cvvdp(display_name="standard_4k", heatmap="threshold")

Q_JOD = []
for Y_peak in disp_peaks:
    disp_photo = cvvdp.vvdp_display_photo_eotf(
        Y_peak=Y_peak, contrast=contrast, EOTF=EOTF, E_ambient=E_ambient,
        k_refl=k_refl)
    metric.set_display_model(display_photometry=disp_photo)

    q, stats = metric.predict(I_test_noise, I_ref, dim_order="HWC")
    Q_JOD.append(float(q))
    print(f"Y_peak={Y_peak:8.1f} cd/m^2  ->  {Q_JOD[-1]:.3f} JOD")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.plot(disp_peaks, Q_JOD, "-o")
    plt.grid(which="major", linestyle="-")
    plt.grid(which="minor", linestyle="--")
    plt.xscale("log")
    plt.xlabel("Display peak luminance [cd/m^2]")
    plt.ylabel("Quality [JOD]")
    plt.savefig("display_brightness.png")
    print("Saved display_brightness.png")
except ImportError:
    pass
