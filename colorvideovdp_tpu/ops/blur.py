"""Separable Gaussian blur with reflect padding.

Replicates torchvision ``GaussianBlur`` as used for phase uncertainty and
texture masking (reference: pycvvdp/cvvdp_metric.py:157-159,963-971):
1-D kernel exp(-0.5 (x/sigma)^2) normalised to 1, reflect (edge-excluded)
padding, applied separably over the last two axes.

Each pass operates natively along its axis with shifted slices — no
transposes (layout changes are among the most expensive ops on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size, dtype=np.float32)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def _blur_1d(x, k: np.ndarray, axis: int):
    r = (len(k) - 1) // 2
    nd = x.ndim
    ax = axis % nd
    pad = [(0, 0)] * nd
    pad[ax] = (r, r)
    xp = jnp.pad(x, pad, mode="reflect")
    n = x.shape[ax]
    y = None
    for i in range(len(k)):
        term = float(k[i]) * lax.slice_in_dim(xp, i, i + n, axis=ax)
        y = term if y is None else y + term
    return y


def gaussian_blur(x, kernel_size: int, sigma: float):
    """Blur the last two axes of ``x``."""
    import jax

    k = gaussian_kernel1d(kernel_size, sigma)
    # FORCE_XLA doubles as the "sharded trace in progress" flag: GSPMD
    # cannot partition Pallas custom calls, so sharded traces take the XLA
    # path (the shifted slices shard cleanly with halo exchanges).
    from . import pyramid as _pyr

    if (not _pyr.FORCE_XLA
            and (jax.default_backend() == "tpu" or _pyr.FORCE_KERNEL)):
        from .kernels.blur_halo import can_blur_tpu

        if can_blur_tpu(x.shape, kernel_size):
            lead = x.shape[:-2]
            P = int(np.prod(lead)) if lead else 1
            H, W = x.shape[-2], x.shape[-1]
            y = _blur_tpu_diff(kernel_size, sigma)(x.reshape(P, H, W))
            return y.reshape(x.shape)
    return _blur_1d(_blur_1d(x, k, -2), k, -1)


_TPU_BLUR_CACHE: dict = {}


def _blur_tpu_diff(kernel_size: int, sigma: float):
    """Pallas blur wrapped in a custom VJP: the blur is linear, so the
    backward pass is the transpose of the XLA implementation (which jax
    derives automatically — it also handles the reflect-pad adjoint)."""
    key = (kernel_size, float(sigma))
    if key in _TPU_BLUR_CACHE:
        return _TPU_BLUR_CACHE[key]

    import jax

    from .kernels.blur_halo import blur_tpu

    k = gaussian_kernel1d(kernel_size, sigma)

    def xla_impl(x):
        return _blur_1d(_blur_1d(x, k, -2), k, -1)

    @jax.custom_vjp
    def f(x):
        return blur_tpu(x, k)

    def fwd(x):
        return f(x), x.shape

    def bwd(shape, g):
        import jax.numpy as jnp

        _, vjp = jax.vjp(xla_impl, jnp.zeros(shape, g.dtype))
        return (vjp(g)[0],)

    f.defvjp(fwd, bwd)
    _TPU_BLUR_CACHE[key] = f
    return f
