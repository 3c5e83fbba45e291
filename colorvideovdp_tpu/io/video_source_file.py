"""File-backed video/image sources.

TPU-native equivalent of the reference's ffmpeg-pipe sources (reference:
pycvvdp/video_source_file.py). Video decode prefers the native codec core
(native/cvvdp_codec.cpp via io/ffcodec.py — in-process libavcodec, full
8/10/12-bit planar YUV with on-device colour conversion) and falls back to
OpenCV's bundled FFmpeg (`cv2.VideoCapture`, 8-bit RGB ceiling) when the
library is not built. Images use PIL/imageio/cv2 (EXR/Radiance .hdr via
cv2.imread IMREAD_UNCHANGED).

Decoded frames stream into the metric through the raw-block protocol
(`get_raw_block`): the host decodes a block of frames into one contiguous
uint8/uint16 buffer, and all conversion (dtype, EOTF, colour) happens on
device inside the metric's fused per-block jit.
"""

from __future__ import annotations

import glob
import logging
import math
import os
import re

import numpy as np

from ..metrics.base import vq_exception
from .video_source import frame_to_float32, video_source_dm

logger = logging.getLogger(__name__)

IMG_EXTENSIONS = [
    ".png", ".jpg", ".jpeg", ".bmp", ".gif", ".tif", ".tiff", ".exr", ".hdr",
    ".dds", ".webp",
]


def load_image_as_array(imgfile: str) -> np.ndarray:
    """Image file -> numpy array (H, W, C); 16-bit PNG preserved, EXR/HDR as
    float32 linear (reference: video_source_file.py:36-69)."""
    if not os.path.isfile(imgfile):
        msg = f"File '{imgfile}' not found"
        logger.error(msg)
        raise FileNotFoundError(msg)

    ext = os.path.splitext(imgfile)[1].lower()
    if ext in (".exr", ".hdr"):
        import cv2

        img = cv2.imread(imgfile, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise vq_exception(f"Cannot read image '{imgfile}'")
        if img.ndim == 3 and img.shape[2] >= 3:
            img = img[:, :, [2, 1, 0]]  # BGR -> RGB
        img = np.ascontiguousarray(img.astype(np.float32))
    else:
        import imageio.v2 as iio

        img = np.asarray(iio.imread(imgfile))

    if img.ndim == 3 and img.shape[2] > 3:
        logging.warning(
            f"Input image {imgfile} has more than 3 channels (alpha?). "
            "Ignoring the extra channels."
        )
        img = img[:, :, :3]
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    return img


class video_reader:
    """Sequential mp4/mov/... decoder via OpenCV (bundled FFmpeg).

    API mirrors the reference reader (reference: video_source_file.py:72-198):
    metadata probing, optional resize, frame-count limiting, sequential
    get_frame().
    """

    def __init__(self, vidfile, frames=-1, resize_fn=None, resize_height=-1,
                 resize_width=-1, verbose=False):
        import cv2

        self.cap = cv2.VideoCapture(vidfile)
        if not self.cap.isOpened():
            raise vq_exception(f"Cannot open video file '{vidfile}'")
        self.fname = vidfile
        self.fps = self.cap.get(cv2.CAP_PROP_FPS)
        self.src_width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.src_height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        meta_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if meta_frames <= 0:
            # Container without a frame count: count by decoding (the
            # reference's --count-frames fallback).
            meta_frames = self._count_frames(vidfile)

        if frames == -2:  # accurate count requested
            meta_frames = self._count_frames(vidfile)

        self.frames = meta_frames if frames in (-1, -2) else min(frames,
                                                                 meta_frames)
        self.resize_fn = resize_fn
        if resize_fn is not None and resize_width > 0 and resize_height > 0:
            self.width, self.height = resize_width, resize_height
        else:
            self.resize_fn = None
            self.width, self.height = self.src_width, self.src_height
        self.curr_frame = -1

    @staticmethod
    def _count_frames(vidfile):
        import cv2

        cap = cv2.VideoCapture(vidfile)
        n = 0
        while cap.grab():
            n += 1
        cap.release()
        return n

    def get_frame(self):
        """Next frame as RGB uint8 (H, W, 3), or None at EOF."""
        import cv2

        ok, frame = self.cap.read()
        if not ok:
            return None
        self.curr_frame += 1
        if self.resize_fn is not None:
            interp = {
                "bilinear": cv2.INTER_LINEAR,
                "bicubic": cv2.INTER_CUBIC,
                "nearest": cv2.INTER_NEAREST,
                "area": cv2.INTER_AREA,
            }[self.resize_fn]
            frame = cv2.resize(frame, (self.width, self.height),
                               interpolation=interp)
        return np.ascontiguousarray(frame[:, :, ::-1])  # BGR -> RGB

    def seek_to_start(self):
        import cv2

        self.cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
        self.curr_frame = -1

    def unload(self):
        self.cap.release()


class video_source_video_file(video_source_dm):
    """A pair of decoded video files (reference: video_source_file.py:338-475).
    Lazy reader init; frame-count reconciliation; fps-mismatch hard error."""

    def __init__(self, test_fname, reference_fname,
                 display_photometry="sdr_4k_30", config_paths=None,
                 frames=-1, full_screen_resize=None, resize_resolution=None,
                 ffmpeg_cc=False, verbose=False):
        super().__init__(display_photometry=display_photometry,
                         config_paths=config_paths)
        self.test_fname = test_fname
        self.reference_fname = reference_fname
        self.frames = frames
        self.full_screen_resize = full_screen_resize
        self.resize_resolution = resize_resolution
        self.verbose = verbose
        self.reader = {}
        self._initialized = False
        self._block_cache = {}

    def _init_readers(self):
        if self._initialized:
            return
        rr = (None, None) if self.full_screen_resize is None else (
            self.resize_resolution
        )
        self.reader["test"] = video_reader(
            self.test_fname, self.frames,
            resize_fn=self.full_screen_resize,
            resize_width=rr[0] if rr else -1,
            resize_height=rr[1] if rr else -1,
            verbose=self.verbose,
        )
        self.reader["reference"] = video_reader(
            self.reference_fname, self.frames,
            resize_fn=self.full_screen_resize,
            resize_width=rr[0] if rr else -1,
            resize_height=rr[1] if rr else -1,
            verbose=self.verbose,
        )
        t, r = self.reader["test"], self.reader["reference"]
        if t.fps != r.fps:
            raise vq_exception(
                "Test and reference videos have different frame rates. "
                "Use --temp-resample to resample to a common frame rate."
            )
        if (t.width, t.height) != (r.width, r.height):
            raise vq_exception(
                "Test and reference videos have different resolutions"
            )
        if t.frames != r.frames:
            logging.warning(
                f"Test and reference videos have different number of frames "
                f"({t.frames} vs {r.frames}). Comparing "
                f"{min(t.frames, r.frames)} frames."
            )
        self.N_frames = min(t.frames, r.frames)
        if getattr(self.dm_photometry, "EOTF", None) == "PQ":
            # Decode honesty (reference decodes 10/12-bit via rawvideo
            # rgb48le, video_source_file.py:127-149; OpenCV returns uint8).
            # This class is the FALLBACK reader — the native codec route
            # (video_source_codec_file) decodes >8-bit content at full
            # precision and is preferred whenever native/libcvvdp_codec.so
            # is built. Scoring PQ content through an 8-bit decode silently
            # quantizes HDR — always warn.
            logging.warning(
                "PQ display model with mp4 input through the OpenCV "
                "fallback reader: decode is capped at 8 bits/channel; "
                ">8-bit HDR content will be quantized. Build the native "
                "codec core (make -C native) for full-precision mp4 "
                "decode, or use raw .yuv / EXR frame sequences."
            )
        self._initialized = True

    def get_video_size(self):
        self._init_readers()
        t = self.reader["test"]
        return (t.height, t.width, self.N_frames)

    def get_frames_per_second(self):
        self._init_readers()
        return self.reader["test"].fps

    # Raw-block streaming protocol -------------------------------------

    def get_raw_block(self, which, start, count):
        """Decode ``count`` frames starting at ``start`` into one contiguous
        (1, count, 3, H, W) uint8 buffer; sequential access only (like the
        reference's pipe reader)."""
        self._init_readers()
        rd = self.reader[which]
        if start <= rd.curr_frame:
            # Requested an already-returned frame (curr_frame is the index of
            # the LAST frame handed out, so start == curr_frame is a re-read,
            # not the next frame): rewind (reference raises; we recover).
            rd.seek_to_start()
        block = np.empty((1, count, 3, rd.height, rd.width), np.uint8)
        last = None
        for i in range(count):
            idx = start + i
            if idx < self.N_frames:
                while rd.curr_frame < idx - 1:
                    rd.get_frame()  # skip
                frame = rd.get_frame()
                if frame is None:
                    frame = last if last is not None else np.zeros(
                        (rd.height, rd.width, 3), np.uint8
                    )
                last = frame
            else:
                frame = last if last is not None else np.zeros(
                    (rd.height, rd.width, 3), np.uint8
                )
            block[0, i] = frame.transpose(2, 0, 1)
        return block

    def get_raw_frame_list(self, which, indices):
        """Arbitrary (small) frame sets for padding heads, frame-major
        (1, len(indices), 3, H, W) like get_raw_block. Decoded once and
        cached — indices are within the first filter-length frames."""
        frames = [self._get_cached_frame(which, i) for i in indices]
        return np.stack(frames, axis=0)[None]

    def _get_cached_frame(self, which, idx):
        key = (which, idx)
        if key not in self._block_cache:
            # Decode the first max(idx)+1 frames once.
            need = idx + 1
            blk = self.get_raw_block(which, 0, need)
            self.reader[which].seek_to_start()
            for i in range(need):
                self._block_cache[(which, i)] = blk[0, i]
        return self._block_cache[key]

    # Legacy per-frame API (used by auxiliary metrics) -------------------

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame(("test"), frame, colorspace)

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame(("reference"), frame, colorspace)

    def _frame(self, which, frame, colorspace):
        import jax.numpy as jnp

        raw = self.get_raw_block(which, frame, 1)[0, 0]  # (3, H, W)
        raw = frame_to_float32(raw[None, :, None])
        return self.apply_dm_and_color_transform(jnp.asarray(raw), colorspace)


class video_source_image_frames(video_source_dm):
    """Single images or %0Nd-numbered frame sequences (reference:
    video_source_file.py:549-652)."""

    def __init__(self, test_fname, reference_fname,
                 display_photometry="sdr_4k_30", config_paths=None,
                 frames=-1, fps=0, frame_range=None, **kwargs):
        super().__init__(display_photometry=display_photometry,
                         config_paths=config_paths)
        # C-style %0Nd patterns; also accept python-style {:04d}
        self.test_pattern = test_fname
        self.ref_pattern = reference_fname
        self.fps = fps or 0

        if re.search(r"%\d*d", test_fname):
            if not fps:
                raise vq_exception(
                    "When passing frame sequences you must specify --fps"
                )
            self.is_sequence = True
            frame_ids = self._find_frames(test_fname, frame_range)
            if frames > 0:
                frame_ids = frame_ids[:frames]
            self.frame_ids = frame_ids
            self.N_frames = len(frame_ids)
            first = load_image_as_array(test_fname % frame_ids[0])
        else:
            self.is_sequence = False
            self.N_frames = 1
            self.frame_ids = [0]
            first = load_image_as_array(test_fname)
        self.H, self.W = first.shape[0], first.shape[1]
        self.C = first.shape[2]
        self._first = first
        self._cache = {}

    @staticmethod
    def _find_frames(pattern, frame_range):
        if frame_range is not None:
            ids = []
            for i in frame_range:
                if os.path.isfile(pattern % i):
                    ids.append(i)
                else:
                    break
            if not ids:
                raise vq_exception(
                    f"No frames found for pattern '{pattern}' in the given "
                    "range"
                )
            return ids
        # Probe from 0 or 1 upward.
        start = 0 if os.path.isfile(pattern % 0) else 1
        if not os.path.isfile(pattern % start):
            raise vq_exception(f"No frames found for pattern '{pattern}'")
        ids = []
        i = start
        while os.path.isfile(pattern % i):
            ids.append(i)
            i += 1
        return ids

    def get_video_size(self):
        return (self.H, self.W, self.N_frames)

    def get_frames_per_second(self):
        return self.fps

    def _load(self, which, idx):
        key = (which, idx)
        if key not in self._cache:
            pattern = self.test_pattern if which == "test" else self.ref_pattern
            if self.is_sequence:
                img = load_image_as_array(pattern % self.frame_ids[idx])
            else:
                img = load_image_as_array(pattern)
            self._cache[key] = np.ascontiguousarray(img.transpose(2, 0, 1))
            if len(self._cache) > 8:  # bound the cache for long sequences
                oldest = next(iter(self._cache))
                if oldest != key:
                    del self._cache[oldest]
        return self._cache[key]

    def get_raw_block(self, which, start, count):
        frames = []
        for i in range(count):
            idx = min(start + i, self.N_frames - 1)
            frames.append(self._load(which, idx))
        return np.stack(frames, axis=0)[None]  # (1, count, C, H, W)

    def get_raw_frame_list(self, which, indices):
        return np.stack([self._load(which, i) for i in indices], axis=0)[None]

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame("test", frame, colorspace)

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame("reference", frame, colorspace)

    def _frame(self, which, frame, colorspace):
        import jax.numpy as jnp

        raw = self._load(which, frame)
        raw = frame_to_float32(raw[None, :, None])
        return self.apply_dm_and_color_transform(jnp.asarray(raw), colorspace)


class video_source_matlab(video_source_dm):
    """Test/reference from .mat files (reference:
    video_source_file.py:708-749): heuristic variable pick + dim-order
    inference. Additionally descends into MATLAB structs — content saved
    as e.g. ``save('f.mat', 'data')`` where ``data.I_vid`` holds the frames
    (common from the Matlab wrapper workflow) is found by a recursive walk;
    the reference's plain ``sio.loadmat`` call cannot see inside structs."""

    def __init__(self, test_fname, reference_fname,
                 display_photometry="sdr_4k_30", config_paths=None, fps=0,
                 **kwargs):
        super().__init__(display_photometry=display_photometry,
                         config_paths=config_paths)
        self.test, mat_fps = self._load_mat(test_fname)
        self.ref, _ = self._load_mat(reference_fname)
        if self.test.shape != self.ref.shape:
            raise vq_exception(
                "Test and reference .mat content must have the same shape"
            )
        self.N_frames = self.test.shape[1]
        # fps precedence mirrors the reference (video_source_file.py:723-724):
        # explicit argument, then the .mat's own 'fps' variable, then 30.
        self.fps = fps or mat_fps or (30 if self.N_frames > 1 else 0)

    # Reference heuristic (video_source_file.py:711-716): first variable
    # with 2..4 dims and more than 10 pixels is the content.
    @staticmethod
    def _is_content(a):
        return (isinstance(a, np.ndarray) and a.dtype.names is None
                and 1 < a.ndim <= 4 and a.size > 10)

    @classmethod
    def _walk_struct(cls, obj, found):
        """Collect content candidates and 'fps' scalars from nested
        mat_struct objects (depth-first, field order preserved)."""
        for name in obj._fieldnames:
            elem = obj.__dict__[name]
            if name == "fps" and np.ndim(elem) == 0:
                found.setdefault("fps", float(elem))
            elif hasattr(elem, "_fieldnames"):
                cls._walk_struct(elem, found)
            elif cls._is_content(elem):
                found.setdefault("content", elem)

    @classmethod
    def _load_mat(cls, fname):
        from scipy.io import loadmat

        v = loadmat(fname)
        keys = [k for k in v.keys() if not k.startswith("__")]
        a = next((v[k] for k in keys if cls._is_content(v[k])), None)
        fps = (float(np.asarray(v["fps"]).reshape(-1)[0])
               if "fps" in v else 0.0)
        if a is None:
            # Nothing at the top level — re-load with structs as objects
            # and walk them for the content (and an fps field).
            found = {}
            vs = loadmat(fname, struct_as_record=False, squeeze_me=True)
            for k in keys:
                if hasattr(vs[k], "_fieldnames"):
                    cls._walk_struct(vs[k], found)
            if "content" not in found:
                raise vq_exception(
                    f"No image/video variable found in '{fname}'")
            a = np.atleast_2d(found["content"])
            fps = fps or found.get("fps", 0.0)
        # Infer dim order: HW, HWC or HWCF/HWF.
        if a.ndim == 2:
            a = a[:, :, None, None]  # H W C F
        elif a.ndim == 3:
            if a.shape[2] in (1, 3):
                a = a[:, :, :, None]  # H W C (F=1)
            else:
                a = a[:, :, None, :]  # H W (C=1) F
        # (H, W, C, F) -> (B, F, C, H, W)
        a = a.transpose(3, 2, 0, 1)[None]
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        return np.ascontiguousarray(a), fps

    def get_video_size(self):
        return (self.test.shape[3], self.test.shape[4], self.N_frames)

    def get_frames_per_second(self):
        return self.fps

    def get_raw_block(self, which, start, count):
        src = self.test if which == "test" else self.ref
        end = min(start + count, self.N_frames)
        block = src[:, start:end]
        if end - start < count:
            pad = np.repeat(block[:, -1:], count - (end - start), axis=1)
            block = np.concatenate([block, pad], axis=1)
        return block

    def get_raw_frame_list(self, which, indices):
        src = self.test if which == "test" else self.ref
        return np.ascontiguousarray(src[:, list(indices)])

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame("test", frame, colorspace)

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame("reference", frame, colorspace)

    def _frame(self, which, frame, colorspace):
        import jax.numpy as jnp

        raw = self.get_raw_block(which, frame, 1)[:, 0][:, :, None]
        raw = frame_to_float32(raw)
        return self.apply_dm_and_color_transform(jnp.asarray(raw), colorspace)


class format_mismatch_error(Exception):
    """Test/reference streams decode to different planar layouts — the
    shared per-block unpack program cannot serve both."""


class video_source_codec_file(video_source_dm):
    """Pair of video files decoded natively to planar YUV (io/ffcodec.py;
    native/cvvdp_codec.cpp) with all pixel math on the device.

    The TPU-native counterpart of the reference's ffmpeg rawvideo pipe
    (reference: video_source_file.py:122-198): the host hands packed
    native-depth planes to the metric's per-block jit, which does the
    fixed-point scaling (limited or full range), half-pixel bilinear chroma
    upsample and the BT.601/709/2020 YCbCr->RGB matrix selected from the
    stream metadata, at fp32 — full >8-bit support (the decode route the
    OpenCV fallback caps at uint8).
    """

    def __init__(self, test_fname, reference_fname,
                 display_photometry="sdr_4k_30", config_paths=None,
                 frames=-1, full_screen_resize=None, resize_resolution=None,
                 ffmpeg_cc=False, verbose=False, preload=False):
        super().__init__(display_photometry=display_photometry,
                         config_paths=config_paths)
        from . import ffcodec

        self.reader = {
            "test": ffcodec.CodecVideoReader(test_fname, frames),
            "reference": ffcodec.CodecVideoReader(reference_fname, frames),
        }
        t, r = self.reader["test"], self.reader["reference"]
        key_t = (t.bit_depth, t.chroma_ss, t.color_space, t.color_range_full)
        key_r = (r.bit_depth, r.chroma_ss, r.color_space, r.color_range_full)
        if key_t != key_r:
            raise format_mismatch_error(
                f"test {key_t} vs reference {key_r}"
            )
        if t.avg_fps != r.avg_fps:
            raise vq_exception(
                "Test and reference videos have different frame rates. "
                "Use --temp-resample to resample to a common frame rate."
            )
        if (t.width, t.height) != (r.width, r.height):
            raise vq_exception(
                "Test and reference videos have different resolutions"
            )
        if t.frames != r.frames:
            logging.warning(
                f"Test and reference videos have different number of frames "
                f"({t.frames} vs {r.frames}). Comparing "
                f"{min(t.frames, r.frames)} frames."
            )
        self.N_frames = min(t.frames, r.frames)
        self.full_screen_resize = full_screen_resize
        self.resize_resolution = resize_resolution
        self._head_cache = {}
        self._preloaded = {} if preload else None

    def get_video_size(self):
        if self.full_screen_resize is not None:
            return (self.resize_resolution[1], self.resize_resolution[0],
                    self.N_frames)
        t = self.reader["test"]
        return (t.height, t.width, self.N_frames)

    def get_frames_per_second(self):
        return self.reader["test"].avg_fps

    # Raw-block streaming protocol --------------------------------------

    def get_raw_block(self, which, start, count):
        if self._preloaded is not None:
            src = self._preload(which)
            end = min(start + count, self.N_frames)
            block = src[start:end]
            if end - start < count:
                block = np.concatenate(
                    [block, np.repeat(block[-1:], count - (end - start),
                                      axis=0)], axis=0)
            return block[None]
        return self.reader[which].get_packed_frames(start, count)[None]

    def _preload(self, which):
        if which not in self._preloaded:
            self._preloaded[which] = self.reader[which].get_packed_frames(
                0, self.N_frames
            )
        return self._preloaded[which]

    def get_raw_frame_list(self, which, indices):
        """Arbitrary small frame sets (symmetric-padding heads). The indices
        lie within the first filter-length frames: decode them once, cache,
        and rewind so the sequential block reads still start at 0."""
        if self._preloaded is not None:
            src = self._preload(which)
            return np.stack([src[i] for i in indices])[None]
        need = max(indices) + 1
        if (which, need) not in self._head_cache:
            rd = self.reader[which]
            frames = rd.get_packed_frames(0, need)
            rd.seek_to_start()
            self._head_cache[(which, need)] = frames
        frames = self._head_cache[(which, need)]
        return np.stack([frames[i] for i in indices])[None]

    def raw_block_key(self):
        rd = self.reader["test"]
        return ("codec", rd.width, rd.height, rd.bit_depth, rd.chroma_ss,
                rd.color_space, rd.color_range_full, self.full_screen_resize,
                tuple(self.resize_resolution or ()))

    def unpack_raw_block(self, x):
        """In-graph: packed planar (B, F, frame_pixels) -> display-encoded
        RGB (B, 3, F, H, W). Same device-side pipeline as the .yuv source
        (io/yuv.py:234-282) but with the range (limited/full) and the true
        colour matrix taken from the stream metadata — matching what the
        reference's ffmpeg pipe bakes into rgb24/rgb48le."""
        import jax
        import jax.numpy as jnp

        from .ffcodec import ycbcr_to_rgb_matrix

        rd = self.reader["test"]
        B, F = x.shape[0], x.shape[1]
        H, W = rd.y_shape
        uh, uw = rd.uv_shape
        xf = x.astype(jnp.float32)

        Y = xf[..., : rd.y_pixels].reshape(B, F, H, W)
        u = xf[..., rd.y_pixels : rd.y_pixels + rd.uv_pixels].reshape(
            B, F, uh, uw
        )
        v = xf[..., rd.y_pixels + rd.uv_pixels :].reshape(B, F, uh, uw)

        if rd.color_range_full:
            m = float(2 ** rd.bit_depth - 1)
            c = float(2 ** (rd.bit_depth - 1))
            Y = jnp.clip(Y / m, 0.0, 1.0)
            u = jnp.clip((u - c) / m, -0.5, 0.5)
            v = jnp.clip((v - c) / m, -0.5, 0.5)
        else:
            d = 2.0 ** (rd.bit_depth - 8)
            Y = jnp.clip(Y / (d * 219.0) - 16.0 / 219.0, 0.0, 1.0)
            u = jnp.clip(u / (d * 224.0) - 128.0 / 224.0, -0.5, 0.5)
            v = jnp.clip(v / (d * 224.0) - 128.0 / 224.0, -0.5, 0.5)

        if rd.chroma_ss != "444":
            u = jax.image.resize(u, (B, F, H, W), method="linear")
            v = jax.image.resize(v, (B, F, H, W), method="linear")

        M = ycbcr_to_rgb_matrix(rd.color_space)
        yuv = jnp.stack([Y, u, v], axis=2)  # (B, F, 3, H, W)
        rgb = jnp.einsum("bfchw,dc->bfdhw", yuv, jnp.asarray(M),
                         precision="highest")
        rgb = jnp.clip(rgb, 0.0, 1.0)
        rgb = jnp.transpose(rgb, (0, 2, 1, 3, 4))  # (B, 3, F, H, W)

        if self.full_screen_resize is not None:
            rw, rh = self.resize_resolution
            method = {"bilinear": "linear", "bicubic": "cubic",
                      "nearest": "nearest"}.get(self.full_screen_resize)
            if method is None:
                raise RuntimeError(
                    f"Resize method '{self.full_screen_resize}' not "
                    "supported for native-decode sources"
                )
            rgb = jnp.clip(
                jax.image.resize(rgb, (B, 3, F, rh, rw), method=method),
                0.0, 1.0,
            )
        return rgb

    # Legacy per-frame API (used by auxiliary metrics) -------------------

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame("test", frame, colorspace)

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._frame("reference", frame, colorspace)

    def _frame(self, which, frame, colorspace):
        import jax.numpy as jnp

        raw = self.get_raw_block(which, frame, 1)
        rgb = self.unpack_raw_block(jnp.asarray(raw))
        return self.apply_dm_and_color_transform(rgb, colorspace)


class video_source_video_file_preload(video_source_video_file):
    """Reads the whole video into RAM for random access (reference:
    video_source_file.py:672-702)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._preloaded = {}

    def _preload(self, which):
        if which not in self._preloaded:
            self._init_readers()
            self._preloaded[which] = super().get_raw_block(
                which, 0, self.N_frames
            )
        return self._preloaded[which]

    def get_raw_block(self, which, start, count):
        src = self._preload(which)
        end = min(start + count, self.N_frames)
        block = src[:, start:end]
        if end - start < count:
            pad = np.repeat(block[:, -1:], count - (end - start), axis=1)
            block = np.concatenate([block, pad], axis=1)
        return block

    def get_raw_frame_list(self, which, indices):
        src = self._preload(which)
        return np.ascontiguousarray(src[:, list(indices)])


class video_source_temp_resample_file(video_source_dm):
    """Compares videos of different frame rates by resampling both to a
    common rate (reference: video_source_file.py:482-543)."""

    max_fps = 166

    def __init__(self, test_fname, reference_fname,
                 display_photometry="sdr_4k_30", config_paths=None,
                 frames=-1, full_screen_resize=None, resize_resolution=None,
                 ffmpeg_cc=False, verbose=False):
        super().__init__(display_photometry=display_photometry,
                         config_paths=config_paths)
        mk = dict(display_photometry=display_photometry,
                  config_paths=config_paths, frames=frames,
                  full_screen_resize=full_screen_resize,
                  resize_resolution=resize_resolution, verbose=verbose)
        self.vs = {}
        # Each file becomes its own single-video pair (test==ref) so we can
        # reuse the decoding machinery (native planar decode when built,
        # OpenCV otherwise — resampling needs random access, so preload).
        from . import ffcodec

        def _mk_pair(fname):
            if ffcodec.enabled():
                try:
                    return video_source_codec_file(fname, fname,
                                                   preload=True, **mk)
                except vq_exception:
                    raise
                except Exception as e:
                    logging.warning(
                        f"Native decode unavailable for '{fname}' ({e}); "
                        "falling back to the OpenCV reader."
                    )
            return video_source_video_file_preload(fname, fname, **mk)

        self.vs["test"] = _mk_pair(test_fname)
        self.vs["reference"] = _mk_pair(reference_fname)
        # Packed-planar inner sources need their unpack hook surfaced on
        # this wrapper (the metric builds ONE per-block program for both
        # streams). If the two files decode to different planar layouts,
        # drop both to the OpenCV reader so the block format is uniform.
        t, r = self.vs["test"], self.vs["reference"]
        if hasattr(t, "unpack_raw_block") or hasattr(r, "unpack_raw_block"):
            if (hasattr(t, "unpack_raw_block")
                    and hasattr(r, "unpack_raw_block")
                    and t.raw_block_key() == r.raw_block_key()):
                self.unpack_raw_block = t.unpack_raw_block
                self.raw_block_key = t.raw_block_key
            else:
                logging.warning(
                    "Temporal resampling with mixed decode formats; using "
                    "the OpenCV reader (8-bit RGB) for both streams."
                )
                self.vs["test"] = video_source_video_file_preload(
                    test_fname, test_fname, **mk)
                self.vs["reference"] = video_source_video_file_preload(
                    reference_fname, reference_fname, **mk)
        t_fps = self.vs["test"].get_frames_per_second()
        r_fps = self.vs["reference"].get_frames_per_second()
        resample_fps = math.lcm(round(t_fps), round(r_fps))
        while resample_fps > self.max_fps:
            resample_fps /= 2
        self.resample_fps = resample_fps
        self.src_fps = {"test": t_fps, "reference": r_fps}
        t_len = self.vs["test"].get_video_size()[2] / t_fps
        r_len = self.vs["reference"].get_video_size()[2] / r_fps
        self.N_frames = int(min(t_len, r_len) * resample_fps)

    def get_video_size(self):
        h, w, _ = self.vs["test"].get_video_size()
        return (h, w, self.N_frames)

    def get_frames_per_second(self):
        return self.resample_fps

    def _src_index(self, which, frame):
        # Nearest-frame lookup (reference: video_source_file.py:531-543).
        src_fps = self.src_fps[which]
        n = self.vs[which].get_video_size()[2]
        return min(
            int(math.floor((frame + 0.5) * src_fps / self.resample_fps)), n - 1
        )

    def get_raw_block(self, which, start, count):
        idx = [self._src_index(which, min(start + i, self.N_frames - 1))
               for i in range(count)]
        return self.vs[which].get_raw_frame_list(which, idx)

    def get_raw_frame_list(self, which, indices):
        idx = [self._src_index(which, i) for i in indices]
        return self.vs[which].get_raw_frame_list(which, idx)

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        return self.vs["test"]._frame(
            "test", self._src_index("test", frame), colorspace
        )

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        return self.vs["reference"]._frame(
            "reference", self._src_index("reference", frame), colorspace
        )


def video_source_file(test_fname, reference_fname,
                      display_photometry="sdr_4k_30", config_paths=None,
                      frames=-1, full_screen_resize=None,
                      resize_resolution=None, frame_range=None, fps=None,
                      preload=False, ffmpeg_cc=False, verbose=False):
    """Extension-dispatch facade (reference: video_source_file.py:755-820):
    .mat -> matlab source, image extensions -> image/frames source, else
    video files, optionally preloaded."""
    ext = os.path.splitext(test_fname)[1].lower()
    if ext == ".mat":
        return video_source_matlab(
            test_fname, reference_fname,
            display_photometry=display_photometry, config_paths=config_paths,
            fps=fps or 0,
        )
    if ext in IMG_EXTENSIONS or re.search(r"%\d*d", test_fname):
        return video_source_image_frames(
            test_fname, reference_fname,
            display_photometry=display_photometry, config_paths=config_paths,
            frames=frames, fps=fps or 0, frame_range=frame_range,
        )
    if ext == ".yuv":
        from .yuv import video_source_yuv_file

        return video_source_yuv_file(
            test_fname, reference_fname,
            display_photometry=display_photometry, config_paths=config_paths,
            frames=frames,
        )
    kw = dict(
        display_photometry=display_photometry, config_paths=config_paths,
        frames=frames, full_screen_resize=full_screen_resize,
        resize_resolution=resize_resolution, ffmpeg_cc=ffmpeg_cc,
        verbose=verbose,
    )
    from . import ffcodec

    # --ffmpeg-cc asks for the host-side swscale colour conversion
    # (reference: run_cvvdp.py routes to the rgb24/rgb48le pipe instead of
    # its device-converting YUV reader); the cv2 route is that pipe's
    # equivalent here.
    if ffcodec.enabled() and not ffmpeg_cc:
        try:
            return video_source_codec_file(test_fname, reference_fname,
                                           preload=preload, **kw)
        except format_mismatch_error as e:
            logging.warning(
                f"Test/reference decode to different planar formats ({e}); "
                "falling back to the OpenCV reader (8-bit RGB)."
            )
        except vq_exception:
            # User errors (fps/resolution mismatch) are not decode
            # failures — surface them, do not fall back.
            raise
        except Exception as e:
            logging.warning(
                f"Native decode unavailable for this input ({e}); falling "
                "back to the OpenCV reader."
            )
    cls = video_source_video_file_preload if preload else video_source_video_file
    return cls(test_fname, reference_fname, **kw)
