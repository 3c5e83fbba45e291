"""PSNR metrics (reference: pycvvdp/psnr_metric.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.colorspace import PU
from .base import register_metric, vq_metric


class psnr_rgb(vq_metric):
    """PSNR on display-encoded RGB; HDR/linear input is PU21-encoded
    (reference: psnr_metric.py:15-57)."""

    def __init__(self, display_name="standard_4k", display_photometry=None,
                 device=None, config_paths=None):
        self.set_display_model(
            display_name=display_name, display_photometry=display_photometry,
            config_paths=config_paths,
        )

    def predict_video_source(self, vid_source):
        _, _, N_frames = vid_source.get_video_size()
        batch_sz = vid_source.get_batch_size()
        mse = jnp.zeros((batch_sz,))
        for ff in range(N_frames):
            T = vid_source.get_test_frame(
                ff, colorspace="display_encoded_100nit"
            )
            R = vid_source.get_reference_frame(
                ff, colorspace="display_encoded_100nit"
            )
            mse = mse + jnp.mean((T - R) ** 2, axis=(1, 2, 3, 4))
        max_I = 1.0
        psnr = 20.0 * jnp.log10(max_I / jnp.sqrt(mse / N_frames))
        return psnr, None

    def short_name(self):
        return "PSNR-RGB"

    def quality_unit(self):
        return "dB"


class pu_psnr_y(vq_metric):
    """PU21-PSNR on luminance (reference: psnr_metric.py:60-112).

    NOTE (parity quirk): like the reference, the MSE is computed on the
    *unencoded* luminance — the PU encoding only sets the peak value
    (psnr_metric.py:93-96)."""

    def __init__(self, display_name="standard_4k", display_photometry=None,
                 color_space="sRGB", device=None, config_paths=None):
        self.set_display_model(
            display_name=display_name, display_photometry=display_photometry,
            config_paths=config_paths,
        )
        self.color_space = color_space
        self.pu = PU()
        self.max_I = float(np.asarray(self.pu.encode(100.0)))
        self.metric_colorspace = "Y"

    def predict_video_source(self, vid_source):
        _, _, N_frames = vid_source.get_video_size()
        batch_sz = vid_source.get_batch_size()
        mse = jnp.zeros((batch_sz,))
        for ff in range(N_frames):
            T = vid_source.get_test_frame(
                ff, colorspace=self.metric_colorspace
            )
            R = vid_source.get_reference_frame(
                ff, colorspace=self.metric_colorspace
            )
            # Reference quirk preserved: encodes are discarded, raw values
            # enter the MSE.
            mse = mse + jnp.mean((T - R) ** 2, axis=(1, 2, 3, 4))
        psnr = 20.0 * jnp.log10(self.max_I / jnp.sqrt(mse / N_frames))
        return psnr, None

    def psnr_fn(self, img1, img2):
        mse = jnp.mean((img1 - img2) ** 2)
        return 20.0 * jnp.log10(self.pu.peak / jnp.sqrt(mse))

    def short_name(self):
        return "PU21-PSNR-Y"

    def quality_unit(self):
        return "dB"


class pu_psnr_rgb2020(pu_psnr_y):
    def __init__(self, display_name="standard_4k", display_photometry=None,
                 color_space="sRGB", device=None, config_paths=None):
        super().__init__(display_name=display_name,
                         display_photometry=display_photometry,
                         color_space=color_space, config_paths=config_paths)
        self.metric_colorspace = "RGB2020"

    def short_name(self):
        return "PU21-PSNR-RGB2020"


register_metric(psnr_rgb)
register_metric(pu_psnr_y)
register_metric(pu_psnr_rgb2020)
