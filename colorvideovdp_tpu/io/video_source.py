"""Frame sources: the pull-based interface the metrics consume.

TPU-native equivalent of the reference sources (reference:
pycvvdp/video_source.py). Frames are kept on the host as numpy arrays in
their source dtype and only converted to fp32 + display-modelled on device,
per frame, inside a cached jitted transform.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..display import vvdp_display_photometry


def reshuffle_dims(a: np.ndarray, in_dims: str, out_dims: str = "BCFHW") -> np.ndarray:
    """Reorder dimensions by name, adding singleton axes for missing ones
    (reference: video_source.py:120-162)."""
    in_dims = in_dims.upper()
    out_dims = out_dims.upper()
    if len(in_dims) != a.ndim:
        raise RuntimeError(
            "The in_dims string must have as many characters as there are "
            "dimensions in the array"
        )

    inter_dims = "".join(d for d in out_dims if d in in_dims)

    # Drop input axes absent from the output (must be singleton).
    keep = []
    new_in = ""
    for kk, d in enumerate(in_dims):
        if d in inter_dims:
            keep.append(kk)
            new_in += d
        else:
            if a.shape[kk] != 1:
                raise AssertionError(
                    "Only the dimensions of size 1 can be skipped in the output"
                )
    a = a.reshape([a.shape[k] for k in keep])

    perm = [new_in.index(d) for d in inter_dims]
    a = a.transpose(perm)

    out_sh = [1] * len(out_dims)
    for kk, d in enumerate(out_dims):
        if d in inter_dims:
            out_sh[kk] = a.shape[inter_dims.index(d)]
    return a.reshape(out_sh)


def frame_to_float32(frame: np.ndarray) -> np.ndarray:
    """Source dtype ladder -> fp32 in [0,1] (uint8/uint16) or native range
    (float16/float32) (reference: video_source.py:320-342)."""
    if frame.dtype == np.float32:
        return frame
    if frame.dtype == np.float16:
        return frame.astype(np.float32)
    if frame.dtype == np.uint8:
        return frame.astype(np.float32) / 255.0
    if frame.dtype in (np.uint16, np.int16):
        return (frame.view(np.uint16).astype(np.float32)) / (2**16 - 1)
    raise RuntimeError(
        f"Only uint8, uint16 and float32 is currently supported. "
        f"{frame.dtype} encountered."
    )


class video_source:
    """Abstract frame source (reference: video_source.py:17-78)."""

    def get_video_size(self):
        """(height, width, frames)."""
        raise NotImplementedError

    def get_frames_per_second(self) -> float:
        raise NotImplementedError

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        raise NotImplementedError

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        raise NotImplementedError

    def get_frame_count(self):
        return self.get_video_size()[2]

    def get_batch_size(self):
        return 1

    def check_if_valid(self, frame, target_colorspace):
        if getattr(self, "_warning_shown", False):
            return
        if not getattr(self, "_first_frame_checked", False):
            self._first_frame_checked = True
            f = np.asarray(frame[:, 0])
            if np.isnan(f).any():
                self._warning_shown = True
                logging.warning("Image contains one or more NaN values")
                return
            if np.isinf(f).any():
                self._warning_shown = True
                logging.warning("Image contains one or more Inf values")
                return
            if not target_colorspace.startswith("display_encoded") and (
                target_colorspace != "RGB2020pq"
            ):
                f_mean = float(f.mean())
                logging.debug(
                    f"Content mean={f_mean}, max={float(f.max())}, min={float(f.min())}"
                )
                if f_mean <= 1:
                    self._warning_shown = True
                    logging.warning(
                        "The mean color value is less than 1 - the image may not "
                        "be scaled in absolute photometric units!"
                    )


class video_source_dm(video_source):
    """Mixin applying the photometric display model + colour transform
    (reference: video_source.py:204-222). The transform is jitted and cached
    per (colorspace, shape, dtype)."""

    def __init__(self, display_photometry="sdr_4k_30", config_paths=None):
        if isinstance(display_photometry, str):
            self.dm_photometry = vvdp_display_photometry.load(
                display_photometry, config_paths or []
            )
        elif isinstance(display_photometry, vvdp_display_photometry):
            self.dm_photometry = display_photometry
        else:
            raise RuntimeError(
                "display_model must be a string or vvdp_display_photometry subclass"
            )
        self._dm_fns = {}

    def apply_dm_and_color_transform(self, frame, target_colorspace):
        key = target_colorspace
        if key not in self._dm_fns:
            dm = self.dm_photometry

            def _fn(x):
                return dm.source_2_target_colorspace(x, target_colorspace)

            self._dm_fns[key] = jax.jit(_fn)
        I = self._dm_fns[key](frame)
        self.check_if_valid(I, target_colorspace)
        return I


class video_source_array(video_source_dm):
    """In-memory tensors/ndarrays source — the ``predict()`` path
    (reference: video_source.py:234-346). Supports a leading batch axis."""

    def __init__(
        self,
        test_video,
        reference_video,
        fps,
        dim_order="BCFHW",
        display_photometry="sdr_4k_30",
        config_paths=None,
    ):
        super().__init__(
            display_photometry=display_photometry, config_paths=config_paths
        )

        test_video = np.asarray(test_video)
        reference_video = np.asarray(reference_video)

        if test_video.shape != reference_video.shape:
            ind = dim_order.find("B")
            if ind >= 0 and (
                test_video.shape[ind] == 1 or reference_video.shape[ind] == 1
            ):
                pass  # singleton batch broadcast is allowed
            else:
                raise RuntimeError(
                    "Test and reference image/video tensors must be exactly "
                    "the same shape"
                )
        if len(dim_order) != test_video.ndim:
            raise RuntimeError(
                "Input tensor must have exactly as many dimensions as there "
                'are characters in the "dims" parameter'
            )

        test_video = reshuffle_dims(test_video, dim_order, "BCFHW")
        reference_video = reshuffle_dims(reference_video, dim_order, "BCFHW")

        B, C, F, H, W = test_video.shape
        if fps == 0 and F > 1:
            raise RuntimeError(
                "When passing video sequences, you must set 'frames_per_second' "
                "parameter"
            )
        if C not in (1, 3):
            raise RuntimeError("The content must have either 1 or 3 color channels.")

        self.fps = fps
        self.is_video = fps > 0
        self.is_color = C == 3
        self.test_video = test_video
        self.reference_video = reference_video

    def get_frames_per_second(self):
        return self.fps

    def get_video_size(self):
        sh = self.test_video.shape
        return (sh[3], sh[4], sh[2])

    def get_batch_size(self):
        return self.test_video.shape[0]

    def get_test_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._get_frame(self.test_video, frame, colorspace)

    def get_reference_frame(self, frame, device=None, colorspace="DKLd65"):
        return self._get_frame(self.reference_video, frame, colorspace)

    def _get_frame(self, from_array, frame, colorspace):
        raw = frame_to_float32(from_array[:, :, frame : frame + 1])
        return self.apply_dm_and_color_transform(jnp.asarray(raw), colorspace)

    # -- fast path: raw frame blocks, converted on device inside one jit ----
    #
    # Frames are kept frame-major (B, F, C, H, W) so a block of consecutive
    # frames is one contiguous memory chunk: the host-side cost of feeding the
    # device is a zero-copy slice + flat DMA. Dtype conversion, display model
    # and the (B, C, F, H, W) transpose all happen in-graph.

    def _bfchw(self, which: str) -> np.ndarray:
        if not hasattr(self, "_raw_fmajor"):
            self._raw_fmajor = {}
        if which not in self._raw_fmajor:
            src = self.test_video if which == "test" else self.reference_video
            self._raw_fmajor[which] = np.ascontiguousarray(
                np.transpose(src, (0, 2, 1, 3, 4))
            )
        return self._raw_fmajor[which]

    def get_raw_block(self, which: str, start: int, count: int) -> np.ndarray:
        """Raw source-dtype frames (B, count, C, H, W); short tails are padded
        by repeating the last frame (the metric slices padded outputs off)."""
        src = self._bfchw(which)
        end = min(start + count, src.shape[1])
        block = src[:, start:end]
        if end - start < count:
            pad = np.repeat(block[:, -1:], count - (end - start), axis=1)
            block = np.concatenate([block, pad], axis=1)
        return block

    def get_raw_frame_list(self, which: str, indices) -> np.ndarray:
        """Arbitrary raw frames (B, len(indices), C, H, W) — used for the
        symmetric-padding head."""
        src = self._bfchw(which)
        return np.ascontiguousarray(src[:, list(indices)])
