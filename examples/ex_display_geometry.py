"""Quality vs viewing distance: with increasing distance the noise becomes
less visible and quality increases
(reference: examples/ex_display_geometry.py).

Run from the repository root:  python examples/ex_display_geometry.py
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
I_test_noise = utils.imnoise(I_ref, np.sqrt(0.005))

# Measure quality at several viewing distances
distances = np.linspace(0.5, 2, 5)

metric = cvvdp.cvvdp(display_name="standard_4k", heatmap="threshold")

Q_JOD = []
for dist in distances:
    # 4K, 30 inch display, seen at different viewing distances
    disp_geo = cvvdp.vvdp_display_geometry(
        (3840, 2160), diagonal_size_inches=30, distance_m=dist)
    metric.set_display_model(display_geometry=disp_geo)

    q, stats = metric.predict(I_test_noise, I_ref, dim_order="HWC")
    Q_JOD.append(float(q))
    print(f"distance={dist:.2f} m  ->  {Q_JOD[-1]:.3f} JOD")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.plot(distances, Q_JOD, "-o")
    plt.grid(which="major", linestyle="-")
    plt.grid(which="minor", linestyle="--")
    plt.xlabel("Viewing distance [m]")
    plt.ylabel("Quality [JOD]")
    plt.savefig("display_geometry.png")
    print("Saved display_geometry.png")
except ImportError:
    pass
