"""ColorVideoVDP-TPU: a TPU-native (JAX/XLA/Pallas) full-reference perceptual
video/image quality metric, feature-compatible with gfxdisp/ColorVideoVDP."""

__version__ = "0.5.6-tpu0"

from .display import (
    vvdp_display_geometry,
    vvdp_display_photo_eotf,
    vvdp_display_photometry,
)
from .io.video_source import video_source, video_source_array, video_source_dm
from .metrics.base import register_metric, vq_exception, vq_metric, vq_metric_dict
from .metrics.cvvdp import cvvdp
from .ops.colorspace import PU

__all__ = [
    "cvvdp",
    "vvdp_display_geometry",
    "vvdp_display_photo_eotf",
    "vvdp_display_photometry",
    "video_source",
    "video_source_array",
    "video_source_dm",
    "vq_metric",
    "vq_metric_dict",
    "vq_exception",
    "register_metric",
    "PU",
]
