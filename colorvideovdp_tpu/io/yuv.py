"""Raw .yuv video source: numpy memmap on the host, unpack on the TPU.

Metadata is parsed from the file name (e.g. ``seq_1280x720p25_420_8bit_sdr.yuv``)
exactly as the reference does (reference: pycvvdp/video_source_yuv.py:7-62).
The fixed-point to float conversion, chroma upsampling and YCbCr->RGB matrix
all run inside the metric's fused per-block jit via the ``unpack_raw_block``
hook — the host only slices contiguous bytes out of the memmap.
"""

from __future__ import annotations

import logging
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from .video_source import video_source_dm


def decode_video_props(fname: str) -> dict:
    """Parse resolution/fps/bit-depth/chroma/colour-space from the file name
    (reference: video_source_yuv.py:7-62)."""
    vprops = {
        "width": 1920, "height": 1080, "fps": 24, "bit_depth": 8,
        "color_space": "709", "chroma_ss": "420",
    }
    bname = os.path.splitext(os.path.basename(fname))[0]
    res_match = re.compile(r"(\d+)x(\d+)p?(\d+)?")
    for field in bname.split("_"):
        if res_match.match(field):
            nums = re.findall(r"\d+", field)
            if len(nums) < 2 or len(nums) > 3:
                raise ValueError("Cannot decode the resolution")
            vprops["width"] = int(nums[0])
            vprops["height"] = int(nums[1])
            if len(nums) == 3:
                vprops["fps"] = int(nums[2])
        elif field.endswith("fps"):
            vprops["fps"] = float(field[:-3])
        elif field in ("444", "420", "422"):
            vprops["chroma_ss"] = field
        elif field in ("10", "10b", "10bit"):
            vprops["bit_depth"] = 10
        elif field in ("8", "8b", "8bit"):
            vprops["bit_depth"] = 8
        elif field in ("2020", "709"):
            vprops["color_space"] = field
        elif field in ("bt709", "sdr"):
            vprops["color_space"] = "709"
        elif field in ("ct2020", "pq2020", "hdr"):
            vprops["color_space"] = "2020"
    return vprops


def create_yuv_fname(basename: str, vprops: dict) -> str:
    fps = vprops["fps"]
    fps = round(fps, 3) if round(fps) != fps else int(fps)
    return (
        f"{basename}_{vprops['width']}x{vprops['height']}_"
        f"{vprops['bit_depth']}b_{vprops['chroma_ss']}_"
        f"{vprops['color_space']}_{fps}fps.yuv"
    )


class YUVReader:
    """Memmap-backed planar YUV reader (reference: video_source_yuv.py:77-144)."""

    def __init__(self, file_name):
        if not os.path.isfile(file_name):
            raise FileNotFoundError(f"File {file_name} not found")
        self.file_name = file_name
        p = decode_video_props(file_name)
        self.width, self.height = p["width"], p["height"]
        self.avg_fps = p["fps"]
        self.color_space = p["color_space"]
        self.chroma_ss = p["chroma_ss"]
        self.bit_depth = p["bit_depth"]

        self.y_pixels = self.width * self.height
        self.y_shape = (self.height, self.width)
        if self.chroma_ss == "444":
            self.uv_pixels = self.y_pixels
            self.uv_shape = self.y_shape
        elif self.chroma_ss == "420":
            self.uv_pixels = self.y_pixels // 4
            self.uv_shape = (self.height // 2, self.width // 2)
        elif self.chroma_ss == "422":
            self.uv_pixels = self.y_pixels // 2
            self.uv_shape = (self.height, self.width // 2)
        else:
            raise RuntimeError(
                f"Unsupported chroma subsampling {self.chroma_ss}"
            )
        self.frame_pixels = self.y_pixels + 2 * self.uv_pixels
        self.dtype = np.uint16 if self.bit_depth > 8 else np.uint8
        self.frame_bytes = self.frame_pixels * (2 if self.bit_depth > 8 else 1)
        self.frames = int(os.stat(file_name).st_size // self.frame_bytes)
        self.mm = None

    def _map(self):
        if self.mm is None:
            self.mm = np.memmap(self.file_name, self.dtype, mode="r")
        return self.mm

    def get_frame_count(self):
        return self.frames

    def get_frame_yuv(self, frame_index):
        if frame_index < 0 or frame_index >= self.frames:
            raise RuntimeError(
                "The frame index is outside the range of available frames"
            )
        mm = self._map()
        o = frame_index * self.frame_pixels
        Y = mm[o : o + self.y_pixels]
        u = mm[o + self.y_pixels : o + self.y_pixels + self.uv_pixels]
        v = mm[o + self.y_pixels + self.uv_pixels : o + self.frame_pixels]
        return (
            Y.reshape(self.y_shape), u.reshape(self.uv_shape),
            v.reshape(self.uv_shape),
        )

    def get_packed_frames(self, start, count):
        """Contiguous packed planar frames (count, frame_pixels); tail frames
        repeat the last available frame."""
        from ..utils import native

        mm = self._map()
        if native.available():
            # Single GIL-free memcpy gather straight out of the memmap.
            src = np.asarray(mm[: self.frames * self.frame_pixels]).reshape(
                self.frames, self.frame_pixels
            )
            out = native.pack_frame_block(src, start, count)
            if out is not None:
                return out
        end = min(start + count, self.frames)
        o = start * self.frame_pixels
        data = np.asarray(mm[o : end * self.frame_pixels]).reshape(
            end - start, self.frame_pixels
        )
        if end - start < count:
            pad = np.repeat(data[-1:], count - (end - start), axis=0)
            data = np.concatenate([data, pad], axis=0)
        return data


# YCbCr -> RGB matrices exactly as the reference uses them (note: the "709"
# entry uses 1.402/1.772 coefficients — an upstream quirk kept for parity,
# video_source_yuv.py:162-171).
_YCBCR2RGB = {
    "709": np.array(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]],
        np.float32,
    ),
    "2020": np.array(
        [[1.0, 0.0, 1.47460], [1.0, -0.16455, -0.57135], [1.0, 1.88140, 0.0]],
        np.float32,
    ),
}


class video_source_yuv_file(video_source_dm):
    """Pair of raw .yuv files with on-device unpacking (reference:
    video_source_yuv.py:264-353)."""

    def __init__(self, test_fname, reference_fname,
                 display_photometry="standard_4k", config_paths=None,
                 frames=-1, full_screen_resize=None, resize_resolution=None,
                 verbose=False, **kwargs):
        super().__init__(display_photometry=display_photometry,
                         config_paths=config_paths)
        self.test_vidr = YUVReader(test_fname)
        self.reference_vidr = YUVReader(reference_fname)
        self.total_frames = self.test_vidr.frames
        self.frames = (
            self.total_frames if frames == -1
            else min(self.total_frames, frames)
        )
        self.offset = 0
        self.full_screen_resize = full_screen_resize
        self.resize_resolution = resize_resolution
        for vr, name in ((self.test_vidr, test_fname),
                         (self.reference_vidr, reference_fname)):
            logging.debug(
                f"Video '{name}': [{vr.width}x{vr.height}], colorspace: "
                f"{vr.color_space}, EOTF: {self.dm_photometry.EOTF}, "
                f"fps: {vr.avg_fps}, frames: {self.frames}"
            )

    def get_video_size(self):
        if self.full_screen_resize is not None:
            return (self.resize_resolution[1], self.resize_resolution[0],
                    self.frames)
        return (self.test_vidr.height, self.test_vidr.width, self.frames)

    def get_frames_per_second(self):
        return self.test_vidr.avg_fps

    def set_offset(self, offset: int):
        self.offset = offset

    def set_num_frames(self, num_frames: int):
        if self.offset + num_frames > self.total_frames:
            logging.error(
                f"Cannot set num_frames={num_frames} because "
                f"offset={self.offset} and total_frames={self.total_frames}."
            )
            num_frames = self.total_frames - self.offset
        self.frames = num_frames

    # Raw-block streaming protocol --------------------------------------

    def get_raw_block(self, which, start, count):
        rd = self.test_vidr if which == "test" else self.reference_vidr
        return rd.get_packed_frames(self.offset + start, count)[None]

    def get_raw_frame_list(self, which, indices):
        rd = self.test_vidr if which == "test" else self.reference_vidr
        frames = [
            rd.get_packed_frames(self.offset + i, 1)[0] for i in indices
        ]
        return np.stack(frames)[None]

    def raw_block_key(self):
        rd = self.test_vidr
        return ("yuv", rd.width, rd.height, rd.bit_depth, rd.chroma_ss,
                rd.color_space, self.full_screen_resize,
                tuple(self.resize_resolution or ()))

    def unpack_raw_block(self, x):
        """In-graph: packed planar (B, F, frame_pixels) -> display-encoded
        RGB (B, 3, F, H, W). Fixed->float scaling per BT.601-range rules,
        bilinear chroma upsample, YCbCr->RGB (reference:
        video_source_yuv.py:195-223)."""
        rd = self.test_vidr
        B, F = x.shape[0], x.shape[1]
        H, W = rd.y_shape
        uh, uw = rd.uv_shape
        xf = x.astype(jnp.float32)

        Y = xf[..., : rd.y_pixels].reshape(B, F, H, W)
        u = xf[..., rd.y_pixels : rd.y_pixels + rd.uv_pixels].reshape(
            B, F, uh, uw
        )
        v = xf[..., rd.y_pixels + rd.uv_pixels :].reshape(B, F, uh, uw)

        d = 2.0 ** (rd.bit_depth - 8)
        Y = jnp.clip(Y / (d * 219.0) - 16.0 / 219.0, 0.0, 1.0)
        u = jnp.clip(u / (d * 224.0) - 128.0 / 224.0, -0.5, 0.5)
        v = jnp.clip(v / (d * 224.0) - 128.0 / 224.0, -0.5, 0.5)

        if rd.chroma_ss != "444":
            # Half-pixel-centre bilinear upsample == torch interpolate
            # (align_corners=False).
            u = jax.image.resize(u, (B, F, H, W), method="linear")
            v = jax.image.resize(v, (B, F, H, W), method="linear")

        M = _YCBCR2RGB[rd.color_space]
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
                    f"Resize method '{self.full_screen_resize}' not supported "
                    "for YUV sources"
                )
            rgb = jnp.clip(
                jax.image.resize(rgb, (B, 3, F, rh, rw), method=method),
                0.0, 1.0,
            )
        return rgb

    # Legacy per-frame API ----------------------------------------------

    def get_test_frame(self, frame, device=None, colorspace="Y"):
        return self._frame(self.test_vidr, frame, colorspace)

    def get_reference_frame(self, frame, device=None, colorspace="Y"):
        return self._frame(self.reference_vidr, frame, colorspace)

    def _frame(self, rd, frame, colorspace):
        packed = rd.get_packed_frames(self.offset + frame, 1)[None]
        rgb = self.unpack_raw_block(jnp.asarray(packed))
        return self.apply_dm_and_color_transform(rgb, colorspace)
