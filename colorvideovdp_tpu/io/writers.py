"""Video and image writers.

TPU-build equivalents of the ffmpeg-pipe writers (reference:
pycvvdp/video_writer.py). No ffmpeg binary exists here: SDR video goes
through OpenCV's bundled encoder (mp4v); HDR content is written as PQ-encoded
16-bit data reduced to the best container available — 10-bit is not reachable
through cv2, so HDR video falls back to 8-bit PQ mp4 (with a warning) or EXR
frame dumps for the lossless path.
"""

from __future__ import annotations

import logging
import os

import numpy as np


class VideoWriter:
    """Frame-push mp4 writer (reference: video_writer.py:5-99)."""

    def __init__(self, fname, fps=24, hdr_mode=False, codec="h265",
                 verbose=False):
        self.fname = fname
        self.fps = fps
        self.verbose = verbose
        self.hdr_mode = hdr_mode
        self.codec = codec
        self.writer = None
        if hdr_mode:
            logging.warning(
                "No 10-bit HDR encoder is available in this environment; "
                "writing PQ-encoded 8-bit mp4 (use dm-preview-exr for "
                "lossless HDR output)."
            )

    def write_frame_rgb(self, rgb):
        """rgb: (H, W, C) float 0..1 (uint8 accepted for SDR). Display-encoded:
        BT.709+sRGB for SDR, BT.2020+PQ for HDR."""
        import cv2

        H, W = rgb.shape[0], rgb.shape[1]
        if rgb.ndim == 2 or rgb.shape[2] == 1:
            rgb = np.repeat(rgb.reshape(H, W, 1), 3, axis=2)
        if self.writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self.writer = cv2.VideoWriter(
                self.fname, fourcc, self.fps, (W, H)
            )
            if not self.writer.isOpened():
                raise RuntimeError(f"Cannot open video writer for {self.fname}")
        if rgb.dtype == np.uint8:
            frame8 = rgb
        else:
            peak = 1.0
            frame8 = (np.clip(rgb, 0, peak) * 255.0 + 0.5).astype(np.uint8)
        self.writer.write(frame8[:, :, ::-1])  # RGB -> BGR

    def close(self):
        if self.writer is not None:
            self.writer.release()
            self.writer = None

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.close()


class ImageWriter:
    """Single-image writer (reference: video_writer.py:101-126)."""

    def __init__(self, fname, verbose=False):
        self.fname = fname
        self.verbose = verbose

    def write_frame_rgb(self, rgb):
        ext = os.path.splitext(self.fname)[1].lower()
        if ext == ".exr":
            from ..utils import exr

            exr.write(self.fname, np.asarray(rgb, np.float32))
            return
        import imageio.v2 as iio

        iio.imwrite(self.fname, rgb)

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.close()


def np2vid(np_srgb, vidfile, fps, verbose=False):
    """(N, H, W, C) float sRGB frames -> mp4 (reference: run_cvvdp.py:44-66)."""
    N = np_srgb.shape[0]
    vw = VideoWriter(vidfile, fps=fps, verbose=verbose)
    for fid in range(N):
        vw.write_frame_rgb(np_srgb[fid])
    vw.close()


def np2img(np_srgb, imgfile):
    """(1, H, W, C) float sRGB -> image file (reference: run_cvvdp.py:69-78)."""
    import imageio.v2 as iio

    N, H, W, C = np_srgb.shape
    if C == 1:
        np_srgb = np.concatenate([np_srgb] * 3, -1)
    if N > 1:
        raise RuntimeError("Expecting an image, found video")
    iio.imwrite(
        imgfile, (np.clip(np_srgb, 0.0, 1.0)[0] * 255.0).astype(np.uint8)
    )
