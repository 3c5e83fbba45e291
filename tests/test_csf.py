"""castleCSF goldens (BASELINE.md stage-level goldens) + oracle parity."""

import numpy as np
import pytest

from colorvideovdp_tpu.ops.csf import CastleCSF


@pytest.fixture(scope="module")
def csf():
    return CastleCSF("weber_fixed_size")


@pytest.mark.parametrize(
    "rho,omega,logL,cc,expected",
    [
        (2.0, 0, 2.0, 0, 288.107727),
        (2.0, 0, 2.0, 1, 294.149475),
        (2.0, 0, 2.0, 2, 63.754951),
        (2.0, 5, 2.0, 0, 311.582092),
        (16.0, 0, 0.0, 0, 4.033122),
        (0.5, 0, 1.0, 1, 181.329666),
    ],
)
def test_sensitivity_goldens(csf, rho, omega, logL, cc, expected):
    S = float(np.asarray(csf.sensitivity(rho, omega, np.float32(logL), cc)))
    assert abs(S - expected) / expected < 1e-4


def test_sensitivity_multi_channel_matches_single(csf):
    logL = np.linspace(-2.5, 4.5, 64, dtype=np.float32).reshape(1, 1, 1, 8, 8)
    S_multi = np.asarray(
        csf.sensitivity_multi_channel([2.0, 2.0, 2.0, 2.0], [0, 0, 0, 5],
                                      logL, [0, 1, 2, 0])
    )
    for i, (om, cc) in enumerate([(0, 0), (0, 1), (0, 2), (5, 0)]):
        S_single = np.asarray(csf.sensitivity(2.0, om, logL, cc))
        np.testing.assert_allclose(S_multi[i], S_single, rtol=1e-6)


def test_sensitivity_matches_reference(reference, csf):
    import torch

    ref_csf = reference.csf.castleCSF("weber_fixed_size", torch.device("cpu"))
    logL = torch.linspace(-3.0, 5.0, 128)  # includes out-of-range queries
    for rho in (0.5, 2.0, 37.701225, 0.1):
        for om, cc in [(0, 0), (0, 1), (0, 2), (5, 0)]:
            ref = ref_csf.sensitivity(rho, om, logL, cc, None).numpy()
            got = np.asarray(csf.sensitivity(rho, om, logL.numpy(), cc))
            np.testing.assert_allclose(got, ref, rtol=2e-4)
