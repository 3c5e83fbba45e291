"""Micro-bench: lane (width) interleave cost — XLA stack+reshape vs a
Pallas/Mosaic kernel vs the pure-copy HBM floor.

Decides the round-5 expand-chain attack (docs/phase_plane_design.md step 1):
if Mosaic interleaves two half-width phase tensors near the copy floor, the
polyphase expand can emit phases and the A-raw band kernel can interleave
E in VMEM — deleting the XLA interleave fusions and their relayout copies.

Usage: python tools/interleave_bench.py [--cpu-check] [--reps 5]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CPU = "--cpu-check" in sys.argv
if CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interleave_kernel(ev_ref, od_ref, out_ref):
    ev = ev_ref[0]
    od = od_ref[0]
    th, Wh = ev.shape
    out_ref[0] = jnp.stack([ev, od], axis=-1).reshape(th, 2 * Wh)


def pallas_interleave(ev, od, th=64, interpret=None):
    P, H, Wh = ev.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nT = -(-H // th)
    bh = pl.BlockSpec((1, th, Wh), lambda p, i: (p, i, 0),
                      memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((1, th, 2 * Wh), lambda p, i: (p, i, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _interleave_kernel,
        grid=(P, nT),
        in_specs=[bh, bh],
        out_specs=bo,
        out_shape=jax.ShapeDtypeStruct((P, H, 2 * Wh), jnp.float32),
        interpret=interpret,
    )(ev, od)


def _copy_kernel(a_ref, b_ref, out_ref):
    th = a_ref.shape[1]
    Wh = a_ref.shape[2]
    out_ref[0, :, :Wh] = a_ref[0]
    out_ref[0, :, Wh:] = b_ref[0]


def pallas_concat(ev, od, th=64, interpret=None):
    """Same IO volume, no shuffle: the HBM floor for this op shape."""
    P, H, Wh = ev.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nT = -(-H // th)
    bh = pl.BlockSpec((1, th, Wh), lambda p, i: (p, i, 0),
                      memory_space=pltpu.VMEM)
    bo = pl.BlockSpec((1, th, 2 * Wh), lambda p, i: (p, i, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy_kernel,
        grid=(P, nT),
        in_specs=[bh, bh],
        out_specs=bo,
        out_shape=jax.ShapeDtypeStruct((P, H, 2 * Wh), jnp.float32),
        interpret=interpret,
    )(ev, od)


def xla_interleave(ev, od):
    st = jnp.stack([ev, od], axis=-1)
    return st.reshape(ev.shape[:-1] + (2 * ev.shape[-1],))


def _deint_kernel(x_ref, ev_ref, od_ref):
    x = x_ref[0]
    th, W = x.shape
    v = x.reshape(th, W // 2, 2)
    ev_ref[0] = v[:, :, 0]
    od_ref[0] = v[:, :, 1]


def pallas_deinterleave(x, th=64, interpret=None):
    P, H, W = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nT = -(-H // th)
    bi = pl.BlockSpec((1, th, W), lambda p, i: (p, i, 0),
                      memory_space=pltpu.VMEM)
    bh = pl.BlockSpec((1, th, W // 2), lambda p, i: (p, i, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _deint_kernel,
        grid=(P, nT),
        in_specs=[bi],
        out_specs=(bh, bh),
        out_shape=(jax.ShapeDtypeStruct((P, H, W // 2), jnp.float32),
                   jax.ShapeDtypeStruct((P, H, W // 2), jnp.float32)),
        interpret=interpret,
    )(x)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    outs = out if isinstance(out, tuple) else (out,)
    float(np.asarray(outs[0].sum()))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        outs = out if isinstance(out, tuple) else (out,)
        float(np.asarray(outs[0].sum()))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    # Band-0 E at 4K, blk=6 folded: 8 T/R-interleaved channel-frames.
    # (tiny shapes in --cpu-check: interpret mode on 1 core is minutes/GB)
    P, H, W = (2, 128, 512) if CPU else (8 * 6, 2160, 3840)
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.rand(P, H, W // 2).astype(np.float32))
    od = jnp.asarray(rng.rand(P, H, W // 2).astype(np.float32))

    want = np.stack([np.asarray(ev), np.asarray(od)], axis=-1
                    ).reshape(P, H, W)
    got = np.asarray(pallas_interleave(ev, od, interpret=CPU or None))
    assert np.array_equal(got, want), "pallas interleave wrong"
    x = jnp.asarray(want)
    e2, o2 = pallas_deinterleave(x, interpret=CPU or None)
    assert np.array_equal(np.asarray(e2), np.asarray(ev))
    assert np.array_equal(np.asarray(o2), np.asarray(od))
    print("correctness ok")
    if CPU:
        return

    gb = P * H * W * 4 * 2 / 1e9  # read + write
    fns = [
        ("xla stack+reshape", jax.jit(xla_interleave), (ev, od)),
        ("pallas interleave", jax.jit(functools.partial(pallas_interleave)),
         (ev, od)),
        ("pallas concat (copy floor)",
         jax.jit(functools.partial(pallas_concat)), (ev, od)),
        ("pallas deinterleave", jax.jit(functools.partial(
            pallas_deinterleave)), (x,)),
    ]
    for name, fn, args in fns:
        t = timeit(fn, *args, reps=reps)
        print(f"{name:30s} {t*1e3:8.2f} ms  {gb/t:7.1f} GB/s")


if __name__ == "__main__":
    main()
