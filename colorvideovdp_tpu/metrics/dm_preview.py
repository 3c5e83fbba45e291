"""Display-model preview "metrics": write the display model's output as EXR
frames or PQ video for visual inspection (reference:
pycvvdp/dm_preview_metric.py)."""

from __future__ import annotations

import numpy as np

from ..io.writers import VideoWriter
from .base import register_metric, vq_metric


def _frame_to_hwc(T):
    a = np.asarray(T)  # (B, C, 1, H, W)
    return a[0, :, 0].transpose(1, 2, 0)


class dm_preview(vq_metric):
    """Writes test/reference frames after the display model: EXR (images or
    --exr variants, linear RGB709) or PQ-encoded video (reference:
    dm_preview_metric.py:25-91)."""

    def __init__(self, output_exr=False, side_by_side=False,
                 display_name="standard_4k", display_photometry=None,
                 device=None, verbose=False, config_paths=None):
        self.output_exr = output_exr
        self.side_by_side = side_by_side
        self.set_display_model(
            display_name=display_name, display_photometry=display_photometry,
            config_paths=config_paths,
        )
        self.verbose = verbose

    def predict_video_source(self, vid_source):
        _, _, N_frames = vid_source.get_video_size()
        assert vid_source.get_batch_size() == 1, (
            "DM-preview does not work with batches"
        )
        write_exr = self.output_exr or N_frames == 1
        base = getattr(self, "base_fname", "dm_preview")

        if write_exr:
            colorspace = "RGB709"
        else:
            colorspace = "RGB2020pq"
            fps = vid_source.get_frames_per_second()
            test_vw = VideoWriter(base + "-test.mp4", hdr_mode=True, fps=fps,
                                  codec="h265", verbose=self.verbose)
            if not self.side_by_side:
                ref_vw = VideoWriter(base + "-reference.mp4", hdr_mode=True,
                                     fps=fps, codec="h265",
                                     verbose=self.verbose)

        for ff in range(N_frames):
            T = _frame_to_hwc(vid_source.get_test_frame(
                ff, colorspace=colorspace
            ))
            R = _frame_to_hwc(vid_source.get_reference_frame(
                ff, colorspace=colorspace
            ))
            if self.side_by_side:
                concat_dim = 1 if T.shape[1] < T.shape[0] else 0
                T = np.concatenate((T, R), axis=concat_dim)
            frame_no = f"-{ff:04d}" if N_frames > 1 else ""
            if write_exr:
                from ..utils import exr

                exr.write(base + frame_no + "-test.exr", T)
                if not self.side_by_side:
                    exr.write(base + frame_no + "-reference.exr", R)
            else:
                test_vw.write_frame_rgb(T)
                if not self.side_by_side:
                    ref_vw.write_frame_rgb(R)

        if not write_exr:
            test_vw.close()
            if not self.side_by_side:
                ref_vw.close()
        return np.float32(-1), None

    def short_name(self):
        return "dm-preview"

    def quality_unit(self):
        return ""


class dm_preview_exr(dm_preview):
    def __init__(self, **kwargs):
        super().__init__(output_exr=True, **kwargs)


class dm_preview_sbs(dm_preview):
    def __init__(self, **kwargs):
        super().__init__(side_by_side=True, **kwargs)


class dm_preview_exr_sbs(dm_preview):
    def __init__(self, **kwargs):
        super().__init__(side_by_side=True, output_exr=True, **kwargs)


register_metric(dm_preview)
register_metric(dm_preview_sbs)
register_metric(dm_preview_exr)
register_metric(dm_preview_exr_sbs)
