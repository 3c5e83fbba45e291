"""ColorVideoVDP-TPU: a TPU-native (JAX/XLA/Pallas) full-reference perceptual
video/image quality metric, feature-compatible with gfxdisp/ColorVideoVDP."""

__version__ = "0.5.6-tpu0"

import os as _os

# Honor an explicit JAX_PLATFORMS env var. Some environments register a TPU
# PJRT plugin from sitecustomize at interpreter startup and programmatically
# set jax.config.jax_platforms, which silently overrides the env var the
# caller set (e.g. a CPU-only subprocess in the tests). Re-applying the env
# value here restores the documented jax contract: the env var wins. No-op
# when the env var is unset or a backend is already live.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax_p

        if _jax_p.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax_p.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backend already initialised
        pass

# Persistent XLA compilation cache: pipeline graphs are large (unrolled
# pyramid + CSF) and cold compiles are expensive; cache them across processes.
# JAX_COMPILATION_CACHE_DIR overrides the default location (this jaxlib does
# not read that env var itself — verified — so it is applied via jax.config).
_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
    _os.path.expanduser("~"), ".cache", "colorvideovdp_tpu", "xla"
)
if True:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        # Install-time AOT warmup: the package can ship a pre-compiled cache
        # seed (tools/warmup_cache.py --make-seed) covering the standard
        # (display, resolution, fps) grid; entries whose keys do not match
        # this host's jaxlib/backend are simply never hit. Copied once.
        _seed_dir = _os.path.join(_os.path.dirname(__file__),
                                  "xla_cache_seed")
        if _os.path.isdir(_seed_dir):
            import shutil as _shutil

            for _f in _os.listdir(_seed_dir):
                _dst = _os.path.join(_cache_dir, _f)
                if not _os.path.exists(_dst):
                    _shutil.copy2(_os.path.join(_seed_dir, _f), _dst)
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
