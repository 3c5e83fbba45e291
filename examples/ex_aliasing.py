"""Score the ferris-wheel aliasing clips (mp4 decode via the native codec
core; OpenCV fallback when it is not built — absolute mp4 JODs are
decoder-conditional, see SURVEY §7).
Run from the repository root:  python examples/ex_aliasing.py"""

import os
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
from colorvideovdp_tpu.io.video_source_file import video_source_file

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")

metric = cvvdp.cvvdp(display_name="sdr_fhd_24", quiet=True)
ref = os.path.join(MEDIA, "aliasing", "ferris-ref.mp4")
for cond in ("bicubic-bicubic", "bicubic-nearest", "nearest-bicubic",
             "nearest-nearest"):
    test = os.path.join(MEDIA, "aliasing", f"ferris-{cond}.mp4")
    vs = video_source_file(test, ref,
                           display_photometry=metric.display_photometry)
    start = time.time()
    Q, _ = metric.predict_video_source(vs)
    print(f"ferris-{cond}: {float(Q):.4f} JOD "
          f"({time.time() - start:.2f}s)")
