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
inside one custom call; nothing else shares the core while it runs.
r5 raised the blur+transducer tile target to 44 MB (th=48 at 4K — the
measured-fastest tile, tools/bt_tile_bench.py); the worst-case model
estimate stays under the 64 MB ceiling even with the +23% narrow-W
liveness overshoot, and any remaining model miss is a compile failure
the bench preamble's cold sweep catches and degrades on.
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

# 64 MB: > 2.9x the worst instance ever measured, < 1/2 of physical VMEM
# (the remainder covers BlockSpec pipeline buffers + semaphores).
VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def kernel_compiler_params() -> pltpu.CompilerParams:
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
