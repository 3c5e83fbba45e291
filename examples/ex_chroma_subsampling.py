"""Chroma vs RGB subsampling (Fig. 20 of the ColorVideoVDP paper): cvvdp
tolerates aggressive chroma subsampling far better than full-RGB
subsampling, unlike (luma) SSIM (reference: examples/ex_chroma_subsampling.py).

Run from the repository root:  python examples/ex_chroma_subsampling.py
"""

import os

import cv2
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
import ex_utils as utils
from colorvideovdp_tpu.io.video_source_file import load_image_as_array
from colorvideovdp_tpu.metrics.ssim import ssim_index

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")


def resize_array(img, dsize):
    return cv2.resize(img, dsize=dsize, interpolation=cv2.INTER_LANCZOS4)


I_ref16 = load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
patch_sz = 256
I_ref = (I_ref16[-patch_sz:, -patch_sz:, :].astype(np.float32)
         / np.iinfo(I_ref16.dtype).max)

metric = cvvdp.cvvdp(display_name="standard_4k")

ss_factors = [1.5, 2, 4, 8, 16]
ss_types = ["RGB-ss", "Chroma-ss YCbCr"]

results = {t: {"cvvdp": [], "ssim-lum": []} for t in ss_types}
images = {t: [] for t in ss_types}

dim = (I_ref.shape[1], I_ref.shape[0])
Y_ref = utils.srgb2ycbcr(I_ref)[:, :, 0]

for ss_type in ss_types:
    for factor in ss_factors:
        dim_ss = (int(dim[0] / factor), int(dim[1] / factor))
        if ss_type == "RGB-ss":
            I_ss = resize_array(I_ref, dsize=dim_ss)
            I_test = resize_array(I_ss, dsize=dim).clip(0.0, 1.0)
        else:  # chroma-only subsampling in YCbCr
            yuv = utils.srgb2ycbcr(I_ref)
            chroma_ss = resize_array(yuv[:, :, 1:3], dsize=dim_ss)
            yuv[:, :, 1:3] = resize_array(chroma_ss, dsize=dim)
            I_test = utils.ycbcr2srgb(yuv).clip(0.0, 1.0)

        jod, _ = metric.predict(I_test, I_ref, dim_order="HWC")
        results[ss_type]["cvvdp"].append(float(jod))

        Y_test = utils.srgb2ycbcr(I_test)[:, :, 0]
        results[ss_type]["ssim-lum"].append(
            float(ssim_index(Y_test[None, None], Y_ref[None, None]))
        )
        images[ss_type].append(I_test)
        print(f"{ss_type} x{factor}: cvvdp {results[ss_type]['cvvdp'][-1]:.3f}"
              f" JOD, luma-SSIM {results[ss_type]['ssim-lum'][-1]:.4f}")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(len(ss_types), 2 + len(ss_factors),
                            layout="constrained", figsize=(18, 6))
    for tt, ss_type in enumerate(ss_types):
        axs[tt][0].plot(ss_factors, results[ss_type]["cvvdp"], "-o")
        axs[tt][0].set_xscale("log")
        axs[tt][0].set_ylabel("Quality [JOD]")
        axs[tt][0].set_ylim(5.5, 10)
        axs[tt][0].grid(True)
        axs[tt][1].plot(ss_factors, results[ss_type]["ssim-lum"], "-o")
        axs[tt][1].set_xscale("log")
        axs[tt][1].set_ylabel("SSIM (luma)")
        axs[tt][1].set_ylim(0.4, 1)
        axs[tt][1].grid(True)
        for kk, factor in enumerate(ss_factors):
            ax = axs[tt][kk + 2]
            ax.imshow(images[ss_type][kk])
            ax.set_xticks([])
            ax.set_yticks([])
            ax.set_title(f"{ss_type} x {factor}")
    plt.savefig("chroma-ss.png", bbox_inches="tight")
    print("Saved chroma-ss.png")
except ImportError:
    pass
