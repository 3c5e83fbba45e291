"""Display model + colour transform goldens (minted from the reference,
BASELINE.md 'Stage-level goldens')."""

import numpy as np

import colorvideovdp_tpu as cv
from colorvideovdp_tpu.ops import colorspace as cs


def test_srgb_pixel_to_linear_and_dkl():
    # sRGB (0.5, 0.2, 0.8) on standard_4k: Lpeak 200, contrast 1000,
    # E_ambient 250, k_refl 0.005.
    pm = cv.vvdp_display_photometry.load("standard_4k")
    V = np.array([0.5, 0.2, 0.8], np.float32).reshape(1, 3, 1, 1, 1)
    lin = np.asarray(pm.forward(V)).flatten()
    np.testing.assert_allclose(
        lin, [43.36331, 7.212219, 121.24261], rtol=2e-5
    )
    dkl = np.asarray(pm.source_2_target_colorspace(V, "DKLd65")).flatten()
    np.testing.assert_allclose(
        dkl, [26.158955, 0.447117, 89.394264], rtol=1e-4, atol=1e-4
    )
    y = np.asarray(pm.source_2_target_colorspace(V, "Y")).flatten()
    np.testing.assert_allclose(y, [23.130722], rtol=2e-5)


def test_pq_roundtrip():
    L = np.array([0.005, 1.0, 100.0, 4000.0, 10000.0], np.float32)
    V = np.asarray(cs.lin2pq(L))
    back = np.asarray(cs.pq2lin(V))
    np.testing.assert_allclose(back, L, rtol=1e-3)
    assert V.min() >= 0 and V.max() <= 1


def test_srgb_roundtrip():
    p = np.linspace(0, 1, 64, dtype=np.float32)
    back = np.asarray(cs.lin2srgb(cs.srgb2lin(p)))
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_pu21_encode_decode():
    pu = cs.PU()
    Y = np.array([0.005, 1.0, 100.0, 10000.0], np.float32)
    V = np.asarray(pu.encode(Y))
    back = np.asarray(pu.decode(V))
    np.testing.assert_allclose(back, Y, rtol=1e-3)
    # PU(100 nit) is close to its historical calibration (~256)
    assert 200 < float(np.asarray(pu.encode(np.float32(100.0)))) < 300


def test_display_geometry_ppd():
    gm = cv.vvdp_display_geometry.load("standard_4k")
    assert abs(gm.get_ppd() - 75.40244934516305) < 1e-9


def test_info_string():
    m = cv.cvvdp(display_name="standard_4k")
    s = m.get_info_string()
    assert "75.4 [pix/deg]" in s and "Lpeak=200" in s and "standard_4k" in s
