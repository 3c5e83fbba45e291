"""Per-stage device timing of the cvvdp video hot path at a given resolution.

Times each pipeline stage in isolation (own jit, chip-resident inputs,
min-of-N with scalar readback — block_until_ready is unreliable under axon)
so the HBM-traffic budget can be attributed: upload/unpack+DKL, temporal FIR,
pyramid decompose, per-band CSF+masking, pooling, and the full fused step.

Usage: python tools/profile_stages.py [--quick] [--blk N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jtree = [x for x in (out if isinstance(out, (tuple, list)) else [out])
             if hasattr(x, "sum")]
    float(np.asarray(jtree[0].sum()))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jtree = [x for x in (out if isinstance(out, (tuple, list)) else [out])
                 if hasattr(x, "sum")]
        float(np.asarray(jtree[0].sum()))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--blk", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.io.video_source import video_source_array
    from colorvideovdp_tpu.ops.temporal import (apply_temporal_filters,
                                                get_temporal_filters)

    H, W = (720, 1280) if args.quick else (2160, 3840)
    fps = 30.0
    m = cv.cvvdp(display_name="standard_hdr_pq", quiet=True)
    m.F, _ = get_temporal_filters(fps, m.sigma_tf, m.beta_tf)
    m.filter_len = fl = int(m.F[0].shape[0])
    m._ensure_pyramids(W, H)

    blk = args.blk or min(m.estimate_block_N(H * W, 10**9), 32)
    print(f"shape {W}x{H}, block {blk} frames, filter_len {fl}", flush=True)

    rng = np.random.RandomState(7)
    base = np.linspace(0.1, 0.7, W, dtype=np.float32)[None, :, None]
    ref = (np.broadcast_to(base, (H, W, 3)) * 255).astype(np.uint8)
    V_ref = np.repeat(ref[:, :, :, None], blk, axis=3)
    noise = (rng.randn(H, W, 3, blk) * 8).astype(np.int16)
    V_test = np.clip(V_ref.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    vs = video_source_array(V_test, V_ref, fps, dim_order="HWCF",
                            display_photometry=m.display_photometry)
    raw_t = vs.get_raw_block("test", 0, blk)
    raw_r = vs.get_raw_block("reference", 0, blk)
    dm = vs.dm_photometry
    shape = raw_t.shape

    dt = m._put_flat(raw_t)
    dr = m._put_flat(raw_r)

    # Stage 1: unpack + display model + DKL
    s1 = jax.jit(lambda a: m._flat_to_met(dm, a, shape, "DKLd65", vs))
    t = timeit(s1, dt)
    print(f"unpack+DKL (1 src): {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)

    # Sub-stages of the ingest path.
    flat_f32 = jnp.asarray(
        (np.ascontiguousarray(raw_t).reshape(-1).astype(np.float32) / 255.0)
    )
    s1a = jax.jit(lambda a: dm.forward(a.reshape(shape)))
    t = timeit(s1a, flat_f32)
    print(f"  EOTF only (1 src):  {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)
    s1b = jax.jit(lambda a: jnp.transpose(a.reshape(shape), (0, 2, 1, 3, 4))
                  + 0.0)
    t = timeit(s1b, flat_f32)
    print(f"  F<->C transpose:    {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)
    del flat_f32

    T_dkl = s1(dt)
    R_dkl = s1(dr)
    tail = jnp.zeros((1, 3, fl - 1, H, W), jnp.float32) + 50.0
    T_buf = jnp.concatenate([tail, T_dkl], axis=2)
    R_buf = jnp.concatenate([tail, R_dkl], axis=2)
    del T_dkl, R_dkl

    # Stage 2: temporal FIR
    filt = np.stack([f[::-1] for f in m.F])
    s2 = jax.jit(lambda b: apply_temporal_filters(b, filt))
    t = timeit(s2, T_buf)
    print(f"temporal FIR (1 src): {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)

    T4 = s2(T_buf)
    R4 = s2(R_buf)
    del T_buf, R_buf
    B, _, nf, _, _ = T4.shape
    Rfull = jnp.stack([T4, R4], axis=2).reshape(B, 8, nf, H, W)
    Rfull.block_until_ready()
    del T4, R4

    # Stage 3: pyramid decompose (Weber contrast)
    s3 = jax.jit(lambda x: tuple(m.lpyr.decompose(x)[0]))
    t = timeit(s3, Rfull)
    print(f"pyramid decompose:  {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)

    # Stage 4: full process_block (pyramid + CSF + masking + pooling)
    s4 = jax.jit(lambda x: m._process_block(x, temp_ch=2, is_image=False)[0])
    t = timeit(s4, Rfull)
    print(f"process_block:      {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)

    # Stage 3b/3c: band-0 masking sub-stages in isolation
    from colorvideovdp_tpu.ops import masking as mk
    from colorvideovdp_tpu.ops.kernels.csf_lut import csf_lut_lookup

    params = m._masking_params()
    M0 = Rfull[:, 0:4]
    s_blur = jax.jit(lambda x: mk.phase_uncertainty(x, params))
    t = timeit(s_blur, M0)
    print(f"  pu blur (4ch):      {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)
    logL = jnp.log10(jnp.clip(Rfull[:, 1:2], 0.01, None))[:, 0]
    lut_rows = np.stack([m.csf.logS_of_logL(2.0, om, cc)
                         for om, cc in ((0, 0), (0, 1), (0, 2), (5, 0))])
    x0, x1 = float(m.csf.log_L_bkg[0]), float(m.csf.log_L_bkg[-1])
    s_csf = jax.jit(lambda L: csf_lut_lookup(L, lut_rows, x0, x1))
    t = timeit(s_csf, logL)
    print(f"  CSF LUT (4ch):      {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)
    del M0, logL

    # Stage 4b: process_block without fused kernels
    m.enable_fused_kernels = False
    m._block_fns = {}
    s4b = jax.jit(lambda x: m._process_block(x, temp_ch=2, is_image=False)[0])
    t = timeit(s4b, Rfull)
    print(f"process_block(xla): {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)
    m.enable_fused_kernels = True
    m._block_fns = {}

    # Stage 5: full fused video step (steady state)
    step = m._get_video_step(vs, "DKLd65", shape, raw_t.dtype, first=False)
    # Two distinct buffers: both tail args are donated, and donating the
    # same buffer twice is an INVALID_ARGUMENT on the TPU runtime.
    tails = [tail, tail + 0.0]
    out = step(tails[0], tails[1], dt, dr)
    float(np.asarray(out[0]).sum())
    tails = [out[3], out[4]]
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = step(tails[0], tails[1], dt + np.uint8(i % 2), dr)
        float(np.asarray(out[0]).sum())
        tails = [out[3], out[4]]
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"full video step:    {t*1e3:8.2f} ms  -> {blk/t:7.1f} fps",
          flush=True)


if __name__ == "__main__":
    main()
