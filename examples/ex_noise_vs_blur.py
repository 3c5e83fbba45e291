"""Perceptual optimisation of camera exposure: longer exposure reduces noise
but adds hand-shake blur; cvvdp finds the exposure that looks best (PSNR does
not) (reference: examples/ex_noise_vs_blur.py).

All exposure variants are packed into the batch dimension and scored in one
fused device pass.

Run from the repository root:  python examples/ex_noise_vs_blur.py
"""

import math
import os

import numpy as np
from scipy.ndimage import convolve1d

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
from colorvideovdp_tpu.io.video_source_file import load_image_as_array
from colorvideovdp_tpu.metrics.psnr import psnr_rgb

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")


def camera_model(I, t, rng):
    """Hand-shake motion blur (exposure-dependent box kernel) + shot noise."""
    vel = 6  # camera velocity in pixels per second
    k_sz = max(int(math.ceil(t * vel)), 1)
    kernel = np.ones(k_sz, np.float32)
    if k_sz > 1:
        kernel[-1] = (t * vel) % 1.0  # fractional last tap
    kernel /= kernel.sum()
    I_blur = convolve1d(I, kernel, axis=1, mode="nearest")

    a, b = 0.01, 0.001
    n_std = np.sqrt(I_blur * t * a + b)
    return (I_blur * t + rng.standard_normal(I_blur.shape) * n_std) / t


I_de = load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))

# Linear colorspace input (EOTF='linear') on a 200-nit SDR display.
Y_disp_peak = 200
disp_photo = cvvdp.vvdp_display_photo_eotf(
    Y_peak=Y_disp_peak, contrast=1000, EOTF="linear", E_ambient=10)

gamma = 2.2
peak = np.iinfo(I_de.dtype).max if I_de.dtype.kind != "f" else 1.0
I_lin = (I_de.astype(np.float32) / peak) ** gamma

t = np.logspace(-1, 1, 8).astype(np.float32)
rng = np.random.default_rng(0)
I_test = np.stack([camera_model(I_lin, tk, rng) for tk in t], axis=0)
I_ref = np.tile(I_lin[None], (len(t), 1, 1, 1))

metrics = [
    cvvdp.cvvdp(display_name="standard_4k", display_photometry=disp_photo),
    psnr_rgb(display_name="standard_4k", display_photometry=disp_photo),
]

Q = []
for m in metrics:
    # Linear EOTF wants absolute luminance values.
    q, stats = m.predict(I_test * Y_disp_peak, I_ref * Y_disp_peak,
                         dim_order="BHWC")
    Q.append(np.asarray(q).reshape(-1))

for kk in range(len(t)):
    print(f"t={t[kk]:.4f}, quality= {Q[0][kk]:.4f} JOD, "
          f"{Q[1][kk]:.4f} dB (PSNR-RGB)")

best = int(np.argmax(Q[0]))
print(f"Best exposure by ColorVideoVDP: t={t[best]:.4f} s")
