"""Tile-height sweep for the pooled fused blur+transducer kernel.

The r5 raised per-kernel scoped-VMEM limit (kernels/_vmem.py, 64 MB) makes
taller tiles legal; _bt_tile still targets 14 MB (th=16 at 4K band 0),
paying (th + 2r)/th = 1.75x halo overhead on the horizontal blur rows.
This sweeps th at the 4K band-0 shape on the real chip, chaining K kernel
calls inside one jit so the axon dispatch RTT (~35 ms) amortises away.

Usage: python tools/bt_tile_bench.py [--ths 16,24,32,40,48,64] [--k 8]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import colorvideovdp_tpu  # noqa: F401  (platform env)
import jax
import jax.numpy as jnp

from colorvideovdp_tpu.ops.kernels import masking_fused as mf


def main():
    ths = [16, 24, 32, 40, 48, 64]
    if "--ths" in sys.argv:
        ths = [int(t) for t in
               sys.argv[sys.argv.index("--ths") + 1].split(",")]
    K = 8
    if "--k" in sys.argv:
        K = int(sys.argv[sys.argv.index("--k") + 1])

    # 4K band-0 pooled instance at blk=10: folded L = blk, C=4.
    C, L, H, W = 4, 10, 2160, 3840
    rng = np.random.RandomState(0)
    m_pre = jnp.asarray(rng.rand(C, L, H, W).astype(np.float32))
    diff = jnp.asarray(rng.rand(C, L, H, W).astype(np.float32))
    taps = np.exp(-0.5 * (np.arange(-6, 7) / 2.0) ** 2)
    taps /= taps.sum()
    qs = (0.7, 0.8, 0.9, 1.0)
    xcm = rng.rand(4, 4).astype(np.float32) * 0.1
    args = dict(taps=taps, scale=1.0, qs=qs, p=2.2, xcm=xcm, max_v=1000.0,
                pool_beta=3.5)

    orig = mf._bt_tile
    ref_out = None
    for th in ths:
        mf._bt_tile = lambda C_, H_, W_, _th=th: min(
            _th, max(8, (H_ // 2) // 8 * 8))

        # m_pre/diff must be jit ARGUMENTS — closing over them embeds
        # 1.3 GB constants in the program and compile time explodes.
        def loop(mp, df):
            def step(c, acc):
                # feed acc back so XLA cannot CSE/elide the chained calls
                out = mf.fused_blur_transducer(
                    mp + acc[0, 0] * 1e-30, df, **args)
                return acc + out

            return jax.lax.fori_loop(0, K, step,
                                     jnp.zeros((C, L), jnp.float32))

        fn = jax.jit(loop)
        try:
            out = fn(m_pre, diff)
            s = float(np.asarray(out.sum()))
        except Exception as e:
            print(f"th={th:3d}  COMPILE/RUN FAIL: {str(e)[:200]}",
                  flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(np.asarray(fn(m_pre, diff).sum()))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / K
        if ref_out is None:
            ref_out = s
        ok = abs(s - ref_out) / max(abs(ref_out), 1e-9) < 1e-5
        print(f"th={th:3d}  {dt * 1e3:7.2f} ms/call  "
              f"({dt / L * 1e3:5.2f} ms/frame)  sum={s:.6g} ok={ok}",
              flush=True)
    mf._bt_tile = orig


if __name__ == "__main__":
    main()
