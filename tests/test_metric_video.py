"""Video-path parity: minted reference goldens (BASELINE.md) and oracle
cross-checks on small clips."""

import numpy as np
import pytest

import colorvideovdp_tpu as cv


@pytest.fixture(scope="module")
def wavy():
    from PIL import Image

    return np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="full-size video golden is TPU-scale; set RUN_SLOW=1 to run",
)
def test_static_noise_golden(wavy):
    N, fps = 60, 30
    V_ref = np.repeat(wavy[..., np.newaxis], N, axis=3)
    np.random.seed(7)
    h, w, c, _ = V_ref.shape
    noise = np.repeat(np.random.randn(h, w, c, 1) * 0.07, N, axis=-1)
    V_test = ((V_ref.astype(np.float32) / 255 + noise).clip(0, 1) * 255
              ).astype(np.uint8)
    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q, stats = m.predict(V_test, V_ref, dim_order="HWCF",
                         frames_per_second=fps)
    assert abs(float(Q) - 7.620700) < 0.005
    assert stats["Q_per_ch"].shape == (1, 4, 60, 9)


def test_small_video_matches_oracle(reference, wavy):
    """Full video pipeline on a small clip vs the reference run in-process
    (torch CPU): covers temporal filters, sliding window, block streaming."""
    import torch

    crop = wavy[100:164, 200:296]  # 64x96
    N, fps = 12, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(3)
    noise = rng.randn(*V_ref.shape) * 0.05
    V_test = ((V_ref.astype(np.float32) / 255 + noise).clip(0, 1) * 255
              ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)

    ref_m = reference.cvvdp(display_name="standard_4k", quiet=True,
                            device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(V_test, V_ref, dim_order="HWCF",
                                 frames_per_second=fps)
    assert abs(float(Q) - float(Q_ref)) < 2e-3


def test_symmetric_padding_matches_oracle(reference, wavy):
    import torch

    crop = wavy[100:148, 200:280]  # 48x80
    N, fps = 8, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(5)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True,
                 temp_padding="symmetric")
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)

    ref_m = reference.cvvdp(display_name="standard_4k", quiet=True,
                            temp_padding="symmetric",
                            device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(V_test, V_ref, dim_order="HWCF",
                                 frames_per_second=fps)
    assert abs(float(Q) - float(Q_ref)) < 2e-3


def test_temp_resample_matches_oracle(reference, wavy):
    """Feature-space resampling of Q_per_ch to nominal_fps.

    The reference's own temp_resample branch (cvvdp_metric.py:403-409) is
    dead code with a latent layout bug (interp1dim2 resamples the channel
    axis of the post-v0.5.3 (B,C,F,bands) layout and trips interp.py's shape
    assert), so the oracle here is the reference's interp1dim2 +
    do_pooling_and_jods applied to the frame axis explicitly — the intended
    semantics."""
    import torch

    crop = wavy[100:148, 200:280]  # 48x80
    N, fps = 10, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(9)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True,
                 temp_resample=True, nominal_fps=60)
    Q, stats = m.predict(V_test, V_ref, dim_order="HWCF",
                         frames_per_second=fps)
    # 10 frames at 30 fps resampled to 60 fps nominal = 20 feature frames.
    assert stats["N_frames"] == 20
    assert stats["frames_per_second"] == 60

    from pycvvdp.interp import interp1dim2

    ref_m = reference.cvvdp(display_name="standard_4k", quiet=True,
                            device=torch.device("cpu"))
    with torch.no_grad():
        _, stats_ref = ref_m.predict(V_test, V_ref, dim_order="HWCF",
                                     frames_per_second=fps)
        qpc = torch.tensor(stats_ref["Q_per_ch"])  # (B, C, F, bands)
        t_end = N / fps
        t_org = torch.linspace(0.0, t_end, N)
        N_res = int(np.ceil(t_end * 60))
        t_res = torch.linspace(0.0, N_res / 60, N_res)
        qpc_res = interp1dim2(t_org, qpc.permute(0, 2, 1, 3),
                              t_res).permute(0, 2, 1, 3)
        Q_ref = ref_m.do_pooling_and_jods(qpc_res)
    assert abs(float(Q) - float(Q_ref)) < 2e-3


def test_blockwise_equals_whole_clip(wavy):
    """Streaming in small blocks must give the same answer as one big block
    (the temporal halo carry)."""
    crop = wavy[100:148, 200:280]
    N, fps = 10, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(11)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q_whole, _ = m.predict(V_test, V_ref, dim_order="HWCF",
                           frames_per_second=fps)

    m2 = cv.cvvdp(display_name="standard_4k", quiet=True, gpu_mem=1e-9)
    # Tiny memory budget forces block_N_frames == 1.
    Q_blocks, _ = m2.predict(V_test, V_ref, dim_order="HWCF",
                             frames_per_second=fps)
    assert abs(float(Q_whole) - float(Q_blocks)) < 1e-4


def test_estimate_block_N_model():
    """Pin the HBM block-sizing model (VERDICT r1 weak #7): monotone in the
    budget, >= 1 under tiny budgets, never exceeds the clip length."""
    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.filter_len = 9
    pix_4k = 3840 * 2160
    m.gpu_mem = 12.0
    n12 = m.estimate_block_N(pix_4k, 600)
    assert 1 <= n12 <= 600
    m.gpu_mem = 1e-9
    assert m.estimate_block_N(pix_4k, 600) == 1
    m.gpu_mem = 24.0
    assert m.estimate_block_N(pix_4k, 600) >= n12
    m.gpu_mem = 1000.0
    assert m.estimate_block_N(100, 5) == 5
    # Training mode keeps more live state per frame.
    m.gpu_mem = 12.0
    m.training_mode = True
    assert m.estimate_block_N(pix_4k, 600) <= n12
    # r4/r5 hardware fit: a 12 GB budget picks blk=10, a 14 GB budget (the
    # v5e-class fallback) picks blk=12 — the measured-fastest safe point
    # (59.68 fps step latency; blk=14 and 16 OOM on the 15.75 GB v5e —
    # docs/step_profile.md). The >=6e6-pix cap pins 4K picks at 12 even
    # under huge budgets; the 32-frame cap bounds small-resolution picks.
    m.training_mode = False
    assert m.estimate_block_N(pix_4k, 600) == 10
    m.gpu_mem = 14.0
    assert m.estimate_block_N(pix_4k, 600) == 12
    m.gpu_mem = 1000.0
    assert m.estimate_block_N(pix_4k, 600) == 12
    m.gpu_mem = 12.0
    assert m.estimate_block_N(1280 * 720, 600) == 32
    # Model total at the blk=12 pick stays under the measured OOM line.
    a, b, c = 0.6e9, 24, 92
    total = a + pix_4k * 8 * b + 12 * pix_4k * (b + c)
    assert total < 15.75e9
    # Unfused (pure-XLA) route keeps far more HLO temps live: blk=12 at 4K
    # compiled to an 18.42 GB program on a 15.75 GB v5e (r5 bench log), so
    # the model must pick a much smaller block when fused kernels are off.
    m.gpu_mem = 14.0
    m.enable_fused_kernels = False
    blk_unfused = m.estimate_block_N(pix_4k, 600)
    assert blk_unfused <= 8
    total_unfused = a + pix_4k * 8 * b + blk_unfused * pix_4k * (b + 160)
    assert total_unfused < 14.5e9
    m.enable_fused_kernels = True


def test_scan_group_limit_model():
    """Pin the scan-group HBM budget (r5 bench crash): staged scan uploads
    are live arguments of the scan program, and at 4K blk=12 the K=4 group
    hit a compile-time HBM OOM (12.63 GB program + 3.71 GB arguments =
    16.34 GB on a 15.75 GB v5e) while blk=10 K=4 (13.0 GB, r4) executed."""
    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.filter_len = 9
    m.gpu_mem = 14.0
    pix_4k = 3840 * 2160
    blk_bytes = lambda pix, blk: pix * 3 * blk  # packed uint8 HWC
    # blk=12 at 4K: no headroom for staging -> per-block dispatch only.
    assert m.scan_group_limit(pix_4k, 12, blk_bytes(pix_4k, 12)) == 1
    # blk=10 at 4K: grouping allowed (measured-safe on hardware at K=4;
    # the budget is conservative, >=2 is the contract).
    assert m.scan_group_limit(pix_4k, 10, blk_bytes(pix_4k, 10)) >= 2
    # 1080p at blk=32 keeps the full production group.
    pix_1080 = 1920 * 1080
    assert m.scan_group_limit(pix_1080, 32, blk_bytes(pix_1080, 32)) >= 4
    # Tiny budget degrades to no grouping, never raises.
    m.gpu_mem = 1e-9
    assert m.scan_group_limit(pix_4k, 12, blk_bytes(pix_4k, 12)) == 1


def test_time_varying_blur_matches_oracle(reference, wavy):
    """Time-varying distortion (the ex_blur_over_time stimulus class): a
    sigma ramp over frames — exercises the temporal channels with a
    non-stationary test signal, unlike the static/dynamic-noise goldens."""
    import torch
    from scipy.ndimage import gaussian_filter

    crop = wavy[100:148, 200:280].astype(np.float32) / 255.0
    N, fps = 12, 30
    sig = np.concatenate([np.linspace(0.01, 2.0, N // 2),
                          np.linspace(2.0, 0.01, N - N // 2)])
    frames = []
    for s in sig:
        f = np.stack([gaussian_filter(crop[:, :, c], s, mode="nearest",
                                      truncate=2.0) for c in range(3)], -1)
        frames.append(f)
    V_test = (np.stack(frames, -1) * 255).astype(np.uint8)
    V_ref = np.repeat((crop[..., None] * 255).astype(np.uint8), N, axis=3)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)

    ref_m = reference.cvvdp(display_name="standard_4k", quiet=True,
                            device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(V_test, V_ref, dim_order="HWCF",
                                 frames_per_second=fps)
    assert abs(float(Q) - float(Q_ref)) < 2e-3, (float(Q), float(Q_ref))


def test_scan_step_equals_per_block(wavy):
    """The multi-block lax.scan dispatch (_get_video_scan_step) must match
    the per-block dispatch exactly: same per-iteration program, tails as
    the scan carry. Covers group dispatch + the <K leftover flush."""
    crop = wavy[100:164, 200:296]  # 64x96
    N, fps = 12, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(5)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.estimate_block_N = lambda p, n: 2  # 1 first + 5 steady: group(4)+1
    Q_scan, _ = m.predict(V_test, V_ref, dim_order="HWCF",
                          frames_per_second=fps)
    assert any(k[0] == "video_scan" for k in m._block_fns), (
        "scan path did not engage"
    )

    m2 = cv.cvvdp(display_name="standard_4k", quiet=True)
    m2.estimate_block_N = lambda p, n: 2
    m2.scan_group = 0
    Q_blk, _ = m2.predict(V_test, V_ref, dim_order="HWCF",
                          frames_per_second=fps)
    assert not any(k[0] == "video_scan" for k in m2._block_fns)
    assert abs(float(Q_scan) - float(Q_blk)) < 1e-6, (
        float(Q_scan), float(Q_blk)
    )


def test_scan_step_fused_kernels_interpret(wavy):
    """Pallas kernels (ingest + masking, interpret mode) inside the
    lax.scan body: the fused route must survive scan tracing and match the
    XLA per-block result."""
    crop = wavy[100:164, 200:392]  # 64x192 (>=128-wide: kernels engage)
    N, fps = 12, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(6)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    m = cv.cvvdp(display_name="standard_4k", quiet=True)
    m.force_fused = True
    m.estimate_block_N = lambda p, n: 2
    Q_fused, _ = m.predict(V_test, V_ref, dim_order="HWCF",
                           frames_per_second=fps)
    assert any(k[0] == "video_scan" for k in m._block_fns)

    m2 = cv.cvvdp(display_name="standard_4k", quiet=True)
    m2.estimate_block_N = lambda p, n: 2
    m2.scan_group = 0
    Q_xla, _ = m2.predict(V_test, V_ref, dim_order="HWCF",
                          frames_per_second=fps)
    assert abs(float(Q_fused) - float(Q_xla)) < 2e-4, (
        float(Q_fused), float(Q_xla)
    )


def test_padded_partial_block_equals_whole_clip(wavy):
    """The trailing partial block is padded to the full block shape
    (repeat-last-frame, Q trimmed) so every block shares the steady-state
    program; with the tail-init program the first block does too. Both the
    scanned and single-step routes must match the one-block whole-clip
    result exactly (the FIR is causal: padded frames cannot reach back)."""
    crop = wavy[100:164, 200:296]
    rng = np.random.RandomState(13)
    for N, blk, scan in ((10, 4, 4), (3, 4, 0)):
        V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
        V_test = ((V_ref.astype(np.float32) / 255
                   + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
                  ).astype(np.uint8)
        m = cv.cvvdp(display_name="standard_4k", quiet=True)
        m.estimate_block_N = lambda p, n, b=blk: b
        m.scan_group = scan
        Q_blk, _ = m.predict(V_test, V_ref, dim_order="HWCF",
                             frames_per_second=30.0)
        m2 = cv.cvvdp(display_name="standard_4k", quiet=True)
        Q_whole, _ = m2.predict(V_test, V_ref, dim_order="HWCF",
                                frames_per_second=30.0)
        assert abs(float(Q_blk) - float(Q_whole)) < 1e-5, (
            N, blk, scan, float(Q_blk), float(Q_whole)
        )


def test_scan_symmetric_padding_equals_per_block(wavy):
    """Symmetric temporal padding through the scanned dispatch: the
    tail-init program converts the mirror-indexed head frames, then every
    block (incl. block 0) runs the steady program; must equal the
    per-block dispatch exactly."""
    crop = wavy[100:148, 200:280]
    N, fps = 12, 30
    V_ref = np.repeat(crop[..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(17)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    def score(scan):
        m = cv.cvvdp(display_name="standard_4k", quiet=True,
                     temp_padding="symmetric")
        m.estimate_block_N = lambda p, n: 2
        m.scan_group = scan
        Q, _ = m.predict(V_test, V_ref, dim_order="HWCF",
                         frames_per_second=fps)
        return float(Q)

    assert abs(score(4) - score(0)) < 1e-6
