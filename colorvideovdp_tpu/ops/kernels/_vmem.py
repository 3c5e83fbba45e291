"""Shared Mosaic compiler params for the fused kernels.

Mosaic checks each kernel's scoped-VMEM stack against a conservative
default limit of 16 MB — far below the physical 128 MB VMEM of a v5e
core. The halo'd kernels size their row tiles from empirical live-tile
models (e.g. ``masking_fused._bt_tile``) that target ~14 MB, but the
models are point fits and Mosaic's actual liveness varies with shape
(the r4 driver bench died on exactly this: the masked-variant pooled
blur+transducer instance at 4K's 270x480 band measured 17.78 MB against
the 16 MB default — a ~27% model error at narrow W, BENCH_r04.json).

Raising the per-kernel limit is free: scoped VMEM is stack allocation
inside one custom call; nothing else shares the core while it runs, and
every kernel here stays far below the raised ceiling (worst measured
instance 21.6 MB). The tile models still target ~14 MB so the *common*
case leaves VMEM headroom for Mosaic's own pipeline buffers; the raised
limit turns a model miss from a compile failure into nothing.
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

# 64 MB: > 2.9x the worst instance ever measured, < 1/2 of physical VMEM
# (the remainder covers BlockSpec pipeline buffers + semaphores).
VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def kernel_compiler_params() -> pltpu.CompilerParams:
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
