"""10-bit HDR (PQ/BT.2020) mp4 round trip: encode a synthetic HDR clip to
HEVC main10 with the native codec core, then score the distorted encode
against the pristine one at full 10-bit precision — the flow the reference
runs through its ffmpeg rgb48le pipe (video_source_file.py:127-149). Run
from the repository root. Requires the native codec (``make -C native``).

Expected: ~8.34 JOD for the crf-37 encode scored against the
near-lossless one.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import tempfile

import numpy as np

import colorvideovdp_tpu as cvvdp
from colorvideovdp_tpu.io import ffcodec
from colorvideovdp_tpu.io.video_source_file import video_source_file
from colorvideovdp_tpu.ops.colorspace import lin2pq

if not ffcodec.available():
    raise SystemExit("native codec core not built: run `make -C native`")

# Synthetic HDR scene: a moving bright gradient, 600 cd/m^2 highlights.
H, W, N, fps = 288, 512, 16, 30
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
frames = []
for f in range(N):
    phase = 2 * np.pi * f / N
    L = 5.0 + 595.0 * (0.5 + 0.5 * np.sin(xx / 37.0 + phase)) \
        * (0.5 + 0.5 * np.cos(yy / 53.0))
    rgb_lin = np.stack([L, L * 0.8, L * 0.6], axis=-1)  # warm tint
    frames.append(rgb_lin)

tmp = tempfile.mkdtemp()


ref_mp4 = _os.path.join(tmp, "hdr_ref.mp4")
tst_mp4 = _os.path.join(tmp, "hdr_tst.mp4")

# Pristine-ish reference (crf 0 ~ visually lossless) vs a starved encode.
for path, crf in ((ref_mp4, 0), (tst_mp4, 37)):
    vw = ffcodec.CodecVideoWriter(path, W, H, fps, bit_depth=10,
                                  codec="libx265", crf=crf, hdr_tags=True)
    luma, cb, cr = ffcodec.rgb_to_ycbcr_coeffs("2020")
    for rgb_lin in frames:
        pq = np.clip(np.asarray(lin2pq(rgb_lin),
                                np.float64), 0, 1)
        Y = pq @ luma
        u = (pq @ cb).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        v = (pq @ cr).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        vw.write_frame_yuv(
            np.clip((Y * 219.0 + 16.0) * 4 + 0.5, 0, 1023).astype("<u2"),
            np.clip((u * 224.0 + 128.0) * 4 + 0.5, 0, 1023).astype("<u2"),
            np.clip((v * 224.0 + 128.0) * 4 + 0.5, 0, 1023).astype("<u2"),
        )
    vw.close()

src = video_source_file(tst_mp4, ref_mp4,
                        display_photometry="standard_hdr_pq")
metric = cvvdp.cvvdp(display_name="standard_hdr_pq")
Q, _ = metric.predict_video_source(src)
print(f"crf-37 10-bit HEVC vs near-lossless: {float(Q):.4f} JOD")
