"""Micro-bench: current polyphase+interleave expand vs one lhs-dilated conv.

The expand's phase interleave (stack+reshape) is the step's largest
non-kernel cost (docs/step_profile.md finding 1): the kLoop fusion writes
an exotic layout and XLA inserts full-tensor relayout copies. A conv with
``lhs_dilation=2`` over the edge-padded quarter image computes the SAME
zero-interleaved-upsample + 5-tap conv directly inside XLA's TPU conv
emitter — no interleave op, no relayout.

Derivation (1-D, xp = 1-sample edge-padded input of length n+2):
  dilated z[2i] = xp[i], z[odd] = 0;  w = valid 5-tap conv of z
  w[2i]   = K0 xp[i] + K2 xp[i+1] + K4 xp[i+2]   (the current even phase)
  w[2i+1] = K1 xp[i+1] + K3 xp[i+2]              (the current odd phase)
so expand(x) = conv(xp, 2*K5, lhs_dilation=2, pad=(0, exp_size-(2n-1))).

Usage: python tools/expand_bench.py [--cpu-check] [--reps 5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cpu_check = "--cpu-check" in sys.argv
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if cpu_check:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import jax
    import jax.numpy as jnp
    from jax import lax

    from colorvideovdp_tpu.ops.pyramid import K5, _conv_1axis, gausspyr_expand

    def expand_1d_dilated(x, axis, exp_size):
        nd = x.ndim
        ax = axis % nd
        n = x.shape[ax]

        def sl(a, s, e):
            return lax.slice_in_dim(a, s, e, axis=ax)

        xp = jnp.concatenate([sl(x, 0, 1), x, sl(x, n - 1, n)], axis=ax)
        pad_hi = exp_size - (2 * n - 1)
        assert pad_hi in (0, 1), (exp_size, n)
        return _conv_1axis(xp, 2.0 * K5, axis, lhs_dilation=2,
                           pad=(0, pad_hi))

    def expand_dilated(x, sz):
        y = expand_1d_dilated(x, -2, sz[0])
        return expand_1d_dilated(y, -1, sz[1])

    if cpu_check:
        rng = np.random.RandomState(0)
        worst = 0.0
        for (h, w) in [(7, 9), (8, 10), (13, 16), (27, 33), (135, 240)]:
            hq, wq = -(-h // 2), -(-w // 2)
            x = rng.rand(3, hq, wq).astype(np.float32)
            a = np.asarray(gausspyr_expand(jnp.asarray(x), (h, w)))
            b = np.asarray(expand_dilated(jnp.asarray(x), (h, w)))
            d = np.abs(a - b).max()
            worst = max(worst, float(d))
            print(f"  {h}x{w}: max|diff| = {d:.3g} "
                  f"{'BIT-EXACT' if d == 0 else ''}")
        print("worst:", worst)
        return

    # Hardware: band-0 expand at 4K, blk=6 folded layout (48 planes).
    P, Hq, Wq = 48, 1080, 1920
    sz = (2160, 3840)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(P, Hq, Wq).astype(np.float32))

    f_cur = jax.jit(lambda v: gausspyr_expand(v, sz))
    f_dil = jax.jit(lambda v: expand_dilated(v, sz))

    out = {}
    for name, f in (("current", f_cur), ("dilated", f_dil)):
        t0 = time.time()
        y = f(x)
        float(np.asarray(y.sum()))
        out[name + "_compile_s"] = round(time.time() - t0, 1)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            y = f(x)
            float(np.asarray(y.sum()))
            ts.append(time.perf_counter() - t0)
        out[name + "_ms"] = round(min(ts) * 1e3, 2)
    # equality on-device too
    d = float(np.asarray(jnp.abs(f_cur(x) - f_dil(x)).max()))
    out["max_abs_diff"] = d
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
