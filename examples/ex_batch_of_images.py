"""Score multiple same-size image pairs in one batched call — the batch
dimension maps onto a single fused device pass
(reference: examples/ex_batch_of_images.py).

Run from the repository root:  python examples/ex_batch_of_images.py
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

I_test_both = np.stack((I_test_noise, I_test_blur), axis=0)
I_ref_both = np.stack((I_ref, I_ref), axis=0)

metric = cvvdp.cvvdp(display_name="standard_4k")

# predict() accepts numpy arrays (uint8/uint16/float32) in any dim order;
# here the dimensions are (Batch, Height, Width, Color).
Q_JOD, stats = metric.predict(I_test_both, I_ref_both, dim_order="BHWC")
Q_JOD = np.asarray(Q_JOD)

print(f"Noise - Quality: {Q_JOD[0]:.3f} JOD")
print(f"Blur - Quality: {Q_JOD[1]:.3f} JOD")
