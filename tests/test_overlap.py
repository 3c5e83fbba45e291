"""Decode/compute overlap: prove the prefetch thread hides mp4 decode
behind the metric's device step (VERDICT r2 item 5; reference structure:
video_source_file.py:149 — ffmpeg decodes in a subprocess while the GPU
computes).

Instrumentation instead of profiler traces (robust on the CPU backend and
in this single-core container): wall-clock windows of every
``get_raw_block`` decode call and every video-step invocation. The
invariant asserted is mechanical overlap — for each steady-state block k,
the prefetch decode of block k+1 runs INSIDE the step-k window (cv2 and
XLA both release the GIL, so the worker thread genuinely runs during
compute)."""

import threading
import time
import types

import numpy as np

import colorvideovdp_tpu as cv
from colorvideovdp_tpu.io.video_source_file import video_source_file

FERRIS = "/root/reference/example_media/aliasing"


def test_prefetch_decode_overlaps_compute():
    decode_log = []  # (which, start_frame, t0, t1, thread_name)
    step_log = []  # (t0, t1)

    vs = video_source_file(
        f"{FERRIS}/ferris-bicubic-bicubic.mp4",
        f"{FERRIS}/ferris-ref.mp4",
        display_photometry="standard_4k",
        frames=32,
        full_screen_resize="bilinear", resize_resolution=(480, 272),
    )
    h, w, N = vs.get_video_size()

    orig_grb = vs.get_raw_block

    def logged_grb(which, start, count):
        t0 = time.perf_counter()
        out = orig_grb(which, start, count)
        decode_log.append((which, start, t0, time.perf_counter(),
                           threading.current_thread().name))
        return out

    vs.get_raw_block = logged_grb

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    # Force several blocks so there is a steady state to measure.
    m.estimate_block_N = lambda pix, n: max(2, N // 4)
    # Per-block dispatch: the scan group batches K blocks into one jit
    # call, which removes the per-block step windows this test measures.
    # The prefetch thread (what is being proven) is identical either way.
    m.scan_group = 0

    orig_gvs = m._get_video_step

    def logged_gvs(self, *a, **kw):
        fn = orig_gvs(*a, **kw)

        def timed(*args):
            import jax

            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            # block_until_ready makes [t0, t1] the genuine compute span
            # (XLA dispatch is async even on CPU). This serialises the
            # main thread, but the decode WORKER thread still runs
            # during the blocked span — which is exactly the overlap
            # being demonstrated.
            step_log.append((t0, time.perf_counter()))
            return out

        return timed

    m._get_video_step = types.MethodType(logged_gvs, m)

    Q, _ = m.predict_video_source(vs)
    assert 0.0 < float(Q) < 10.0

    # Decode calls made from the prefetch worker (not the main thread).
    worker_decodes = [d for d in decode_log if d[4] != "MainThread"]
    assert len(worker_decodes) >= 2, (
        f"prefetch thread never decoded: {decode_log}")
    assert len(step_log) >= 3

    # Steady-state worker decodes must overlap the step windows. The FIRST
    # prefetch is excluded from the aggregate: it launches before step 0
    # is even traced, so it overlaps jit compile + host transfer time
    # rather than a step window (still useful overlap, just not what this
    # asserts).
    steady = worker_decodes[2:]  # skip the (test, reference) first pair
    assert steady, f"no steady-state prefetch decodes: {decode_log}"
    tot = overlapped = 0.0
    for _, _, d0, d1, _ in steady:
        tot += d1 - d0
        overlapped += sum(
            max(0.0, min(d1, s1) - max(d0, s0)) for s0, s1 in step_log)
    frac = overlapped / tot
    assert frac > 0.8, (
        f"only {frac:.0%} of steady-state prefetched decode time "
        f"overlapped compute; decodes={worker_decodes} steps={step_log}")
