"""Temporal filter construction goldens (BASELINE.md) and application parity."""

import numpy as np

from colorvideovdp_tpu.ops.temporal import apply_temporal_filters, get_temporal_filters

SIGMA_TF = [5.79336, 14.1255, 6.63661, 0.12314]
BETA_TF = [1.3314, 1.1196, 0.947901, 0.1898]


def test_filters_30fps_goldens():
    F, omega = get_temporal_filters(30.0, SIGMA_TF, BETA_TF)
    assert len(F) == 4 and F[0].shape[0] == 9
    np.testing.assert_allclose(omega, [0.0, 5.0])
    # Y-sustained: low-pass, unit DC gain
    assert abs(F[0].sum() - 1.0) < 1e-5
    assert abs(F[0][4] - 0.213727) < 1e-4
    np.testing.assert_allclose(F[0][:3], [0.046771, 0.064189, 0.107367],
                               atol=1e-4)
    np.testing.assert_allclose(F[1][4], 0.514909, atol=1e-4)
    np.testing.assert_allclose(F[1][:3], [0.015257, 0.024257, 0.034000],
                               atol=1e-4)
    np.testing.assert_allclose(F[2][4], 0.403663, atol=1e-4)
    np.testing.assert_allclose(F[2][:3], [0.029911, 0.039636, 0.057371],
                               atol=1e-4)
    # Transient: band-pass, zero DC gain
    assert abs(F[3].sum()) < 1e-5
    np.testing.assert_allclose(F[3][4], 0.661264, atol=1e-4)
    np.testing.assert_allclose(F[3][:3], [-0.101657, -0.110338, -0.150022],
                               atol=1e-4)


def test_apply_matches_direct_correlation():
    F, _ = get_temporal_filters(30.0, SIGMA_TF, BETA_TF)
    fl = F[0].shape[0]
    rng = np.random.RandomState(0)
    buf = rng.rand(1, 3, fl + 3, 8, 8).astype(np.float32)
    filt = np.stack([f[::-1] for f in F])
    out = np.asarray(apply_temporal_filters(buf, filt))
    assert out.shape == (1, 4, 4, 8, 8)
    # Direct reference computation (cvvdp_metric.py:554-560 semantics)
    for cc in range(4):
        sw_ch = 0 if cc == 3 else cc
        for fi in range(4):
            expect = np.einsum(
                "thw,t->hw", buf[0, sw_ch, fi : fi + fl], filt[cc]
            )
            np.testing.assert_allclose(out[0, cc, fi], expect, atol=1e-5)
