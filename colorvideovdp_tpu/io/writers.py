"""Video and image writers.

TPU-build equivalents of the ffmpeg-pipe writers (reference:
pycvvdp/video_writer.py). With the native codec core built
(native/cvvdp_codec.cpp via io/ffcodec.py), SDR writes mpeg4-qscale-3 mp4
and HDR writes 10-bit libx265 main10 with SMPTE-2084/BT.2020 tags — the
reference's exact encode settings (video_writer.py:32-57). Without it, SDR
falls back to OpenCV's bundled encoder (mp4v) and HDR to a YUV4MPEG2
(.y4m, C420p10) stream — the uncompressed interchange format every
ffmpeg/x265 build ingests directly.
"""

from __future__ import annotations

import fractions
import logging
import os

import numpy as np


class Y4MWriter:
    """YUV4MPEG2 writer: 10-bit C420p10 (HDR/PQ route) or 8-bit C420.

    Expects display-encoded RGB in 0..1 (PQ+BT.2020 for HDR). Limited-range
    quantisation and the RGB<->YCbCr matrices are the exact inverses of the
    .yuv reader (io/yuv.py:151-163), so write->read round-trips to within
    one code value.
    """

    def __init__(self, fname, fps=24, bit_depth=10, color_space="2020",
                 verbose=False):
        from .yuv import _YCBCR2RGB

        self.fname = fname
        self.fps = fps
        self.bit_depth = int(bit_depth)
        self.color_space = color_space
        self.verbose = verbose
        self._M = np.linalg.inv(_YCBCR2RGB[color_space]).astype(np.float64)
        self._f = None

    def _open(self, H, W):
        fr = fractions.Fraction(self.fps).limit_denominator(65535)
        ctag = "C420p10 XCOLORRANGE=LIMITED" if self.bit_depth == 10 \
            else "C420jpeg"
        self._f = open(self.fname, "wb")
        self._f.write(
            f"YUV4MPEG2 W{W} H{H} F{fr.numerator}:{fr.denominator} "
            f"Ip A1:1 {ctag}\n".encode()
        )

    def write_frame_rgb(self, rgb):
        rgb = np.asarray(rgb, np.float64)
        H, W = rgb.shape[0], rgb.shape[1]
        if rgb.ndim == 2 or rgb.shape[2] == 1:
            rgb = np.repeat(rgb.reshape(H, W, 1), 3, axis=2)
        if H % 2 or W % 2:  # 4:2:0 needs even dims; crop one row/col
            H, W = H - H % 2, W - W % 2
            rgb = rgb[:H, :W]
        if self._f is None:
            self._open(H, W)
        ycbcr = np.einsum("hwc,dc->hwd", np.clip(rgb, 0.0, 1.0), self._M)
        # 2x2 box average for the chroma planes.
        u = ycbcr[:, :, 1].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        v = ycbcr[:, :, 2].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        d = 2.0 ** (self.bit_depth - 8)
        maxc = 2 ** self.bit_depth - 1
        Yq = np.clip((ycbcr[:, :, 0] * 219.0 + 16.0) * d + 0.5, 0, maxc)
        uq = np.clip((u * 224.0 + 128.0) * d + 0.5, 0, maxc)
        vq = np.clip((v * 224.0 + 128.0) * d + 0.5, 0, maxc)
        dt = "<u2" if self.bit_depth > 8 else np.uint8
        self._f.write(b"FRAME\n")
        self._f.write(Yq.astype(dt).tobytes())
        self._f.write(uq.astype(dt).tobytes())
        self._f.write(vq.astype(dt).tobytes())

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.close()


class NativeMp4Writer:
    """HDR/SDR mp4 writer through the native codec core (io/ffcodec.py).

    HDR: 10-bit libx265 main10 at crf 12 with the BT.2020/PQ stream tags and
    x265 HDR parameter block — the reference's exact encode settings
    (reference: video_writer.py:32-43). SDR: mpeg4 at qscale 3
    (video_writer.py:57) or libx264/libvpx-vp9 on request. The RGB->YCbCr
    matrix, limited-range quantisation and 2x2 chroma average run in numpy
    (host-side debug path; the metric itself never writes video).
    """

    def __init__(self, fname, fps=24, hdr_mode=False, codec="h265",
                 verbose=False):
        self.fname = fname
        self.fps = fps
        self.hdr_mode = hdr_mode
        self.codec = codec
        self._w = None
        from .ffcodec import rgb_to_ycbcr_coeffs

        self._coeffs = rgb_to_ycbcr_coeffs("2020" if hdr_mode else "601")

    def _open(self, H, W):
        from .ffcodec import CodecVideoWriter

        if self.hdr_mode:
            enc = {"h265": "libx265", "vp9": "libvpx-vp9"}.get(self.codec)
            if enc is None:
                raise RuntimeError(f"Unknown codec {self.codec}")
            self._w = CodecVideoWriter(self.fname, W, H, self.fps,
                                       bit_depth=10, codec=enc, crf=12.0,
                                       hdr_tags=True)
        else:
            self._w = CodecVideoWriter(self.fname, W, H, self.fps,
                                       bit_depth=8, codec="mpeg4", crf=3.0)

    def write_frame_rgb(self, rgb):
        rgb = np.asarray(rgb)
        if rgb.dtype == np.uint8:  # before the float cast, or 0..255 clips
            rgb = rgb.astype(np.float64) / 255.0
        else:
            rgb = rgb.astype(np.float64)
        H, W = rgb.shape[0], rgb.shape[1]
        if rgb.ndim == 2 or rgb.shape[2] == 1:
            rgb = np.repeat(rgb.reshape(H, W, 1), 3, axis=2)
        if H % 2 or W % 2:  # 4:2:0 needs even dims; crop one row/col
            H, W = H - H % 2, W - W % 2
            rgb = rgb[:H, :W]
        if self._w is None:
            self._open(H, W)
        rgb = np.clip(rgb, 0.0, 1.0)
        luma, cb, cr = self._coeffs
        Y = rgb @ luma
        u = (rgb @ cb).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        v = (rgb @ cr).reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        bd = self._w.bit_depth
        d = 2.0 ** (bd - 8)
        maxc = 2 ** bd - 1
        dt = "<u2" if bd > 8 else np.uint8
        self._w.write_frame_yuv(
            np.clip((Y * 219.0 + 16.0) * d + 0.5, 0, maxc).astype(dt),
            np.clip((u * 224.0 + 128.0) * d + 0.5, 0, maxc).astype(dt),
            np.clip((v * 224.0 + 128.0) * d + 0.5, 0, maxc).astype(dt),
        )

    def close(self):
        if self._w is not None:
            self._w.close()
            self._w = None

    def __enter__(self):
        return self

    def __exit__(self, type, value, tb):
        self.close()


class VideoWriter:
    """Frame-push video writer (reference: video_writer.py:5-99). With the
    native codec core built, SDR and HDR both go to real mp4 with the
    reference's encoder settings; otherwise SDR falls back to cv2 mp4 and
    ``hdr_mode`` reroutes to a 10-bit .y4m next to the requested name."""

    def __init__(self, fname, fps=24, hdr_mode=False, codec="h265",
                 verbose=False):
        self.fname = fname
        self.fps = fps
        self.verbose = verbose
        self.hdr_mode = hdr_mode
        self.codec = codec
        self.writer = None
        self._y4m = None
        self._native = None
        from . import ffcodec

        is_y4m = fname.lower().endswith(".y4m")
        if ffcodec.enabled() and not is_y4m:
            self._native = NativeMp4Writer(fname, fps=fps, hdr_mode=hdr_mode,
                                           codec=codec, verbose=verbose)
            return
        if hdr_mode or is_y4m:
            y4m_name = fname if is_y4m else \
                os.path.splitext(fname)[0] + ".y4m"
            if y4m_name != fname:
                logging.warning(
                    "No 10-bit HDR mp4 encoder in this environment; writing "
                    f"uncompressed 10-bit PQ {y4m_name} instead (transcode "
                    "with: ffmpeg -i in.y4m -c:v libx265 -pix_fmt yuv420p10 "
                    "-x265-params colorprim=bt2020:transfer=smpte2084 out.mp4)"
                )
            self._y4m = Y4MWriter(y4m_name, fps=fps, bit_depth=10,
                                  color_space="2020", verbose=verbose)

    def write_frame_rgb(self, rgb):
        """rgb: (H, W, C) float 0..1 (uint8 accepted for SDR). Display-encoded:
        BT.709+sRGB for SDR, BT.2020+PQ for HDR."""
        if self._native is not None:
            self._native.write_frame_rgb(rgb)
            return
        if self._y4m is not None:
            rgb = np.asarray(rgb)
            if rgb.dtype == np.uint8:
                rgb = rgb.astype(np.float32) / 255.0
            self._y4m.write_frame_rgb(rgb)
            return
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
        if self._native is not None:
            self._native.close()
        if self._y4m is not None:
            self._y4m.close()
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
