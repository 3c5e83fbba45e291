"""ColorVideoVDP-TPU: a TPU-native (JAX/XLA/Pallas) full-reference perceptual
video/image quality metric, feature-compatible with gfxdisp/ColorVideoVDP."""

__version__ = "0.5.6-tpu0"

import os as _os

# Persistent XLA compilation cache: pipeline graphs are large (unrolled
# pyramid + CSF) and cold compiles are expensive; cache them across processes.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache_dir = _os.path.join(
        _os.path.expanduser("~"), ".cache", "colorvideovdp_tpu", "xla"
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

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
