"""Benchmark: full cvvdp pass throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Headline (BASELINE.json): 4K30 HDR video scored faster than real time on a
single chip — vs_baseline is measured fps / 30.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    quick = "--quick" in sys.argv
    import colorvideovdp_tpu as cv

    H, W = (720, 1280) if quick else (2160, 3840)
    N = 16 if quick else 32
    fps = 30.0

    rng = np.random.RandomState(7)
    # Synthetic HDR content: PQ-encoded gradients + noise, uint8 quantised
    # (decode is out of scope — the metric pass itself is the unit).
    base = np.linspace(0.1, 0.7, W, dtype=np.float32)[None, :, None]
    ref = np.broadcast_to(base, (H, W, 3)).copy()
    ref = (ref * 255).astype(np.uint8)
    V_ref = np.repeat(ref[:, :, :, None], N, axis=3)
    noise = (rng.randn(H, W, 3, N) * 8).astype(np.int16)
    V_test = np.clip(V_ref.astype(np.int16) + noise, 0, 255).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)

    t0 = time.time()
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)
    cold = time.time() - t0

    t0 = time.time()
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)
    warm = time.time() - t0

    value = N / warm
    out = {
        "metric": f"{W}x{H} HDR cvvdp frames/sec/chip (warm, end-to-end)",
        "value": round(value, 3),
        "unit": "fps",
        "vs_baseline": round(value / 30.0, 3),
        "jod": round(float(np.asarray(Q).reshape(-1)[0]), 4),
        "cold_s": round(cold, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
