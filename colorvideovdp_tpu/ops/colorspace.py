"""Colour-space primitives: EOTFs, PQ/HLG curves, opponent-colour matrices, PU21.

Pure ``jax.numpy`` functions designed to run inside ``jit`` on TPU. All math is
fp32, matching the reference numerics (reference: pycvvdp/display_model.py:17-108,
pycvvdp/utils.py:177-239).

Frames are laid out BCFHW (batch, colour, frame, height, width) as in the
reference, with the colour axis at ``-4``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# XYZ -> CIE-2006 LMS cone responses, least-squares fit (reference:
# display_model.py:17-20; derivation matlab/derive_LMS_colourspace/).
XYZ_to_LMS2006 = np.array(
    [
        [0.187596268556126, 0.585168649077728, -0.026384263306304],
        [-0.133397430663221, 0.405505777260049, 0.034502127690364],
        [0.000244379021663, -0.000542995890619, 0.019406849066323],
    ],
    dtype=np.float32,
)

# LMS -> Derrington-Krauskopf-Lennie opponent space, D65 white point
# (reference: display_model.py:22-25).
LMS2006_to_DKLd65 = np.array(
    [
        [1.0, 1.0, 0.0],
        [1.0, -2.311130179947035, 0.0],
        [-1.0, -1.0, 50.977571328718781],
    ],
    dtype=np.float32,
)

XYZ_to_RGB2020 = np.array(
    [
        [1.716502508360628, -0.355584689096764, -0.253375213570850],
        [-0.666625609145029, 1.616446566522207, 0.015775479726511],
        [0.017655211703087, -0.042810696059636, 0.942089263920533],
    ],
    dtype=np.float32,
)

XYZ_to_RGB709 = np.array(
    [
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ],
    dtype=np.float32,
)


def srgb2lin(p):
    """sRGB display-encoded values (0..1) to relative linear RGB (reference:
    display_model.py:78-80)."""
    p = jnp.asarray(p, jnp.float32)
    return jnp.where(p > 0.04045, ((p + 0.055) / 1.055) ** 2.4, p / 12.92)


def lin2srgb(L):
    L = jnp.clip(jnp.asarray(L, jnp.float32), 0.0, 1.0)
    return jnp.where(L > 0.0031308, 1.055 * L ** (1.0 / 2.4) - 0.055, 12.92 * L)


# SMPTE ST-2084 (PQ) constants.
_PQ_LMAX = 10000.0
_PQ_N = 0.15930175781250000
_PQ_M = 78.843750000000000
_PQ_C1 = 0.83593750000000000
_PQ_C2 = 18.851562500000000
_PQ_C3 = 18.687500000000000


def lin2pq(L):
    """Absolute linear (0.005..10000 cd/m^2) to PQ-encoded 0..1 (reference:
    display_model.py:44-56)."""
    im_t = (jnp.clip(jnp.asarray(L, jnp.float32), 0.0, _PQ_LMAX) / _PQ_LMAX) ** _PQ_N
    return ((_PQ_C2 * im_t + _PQ_C1) / (1.0 + _PQ_C3 * im_t)) ** _PQ_M


def pq2lin(V):
    """PQ-encoded 0..1 to absolute linear cd/m^2 (reference: display_model.py:58-70)."""
    im_t = jnp.power(jnp.asarray(V, jnp.float32), 1.0 / _PQ_M)
    return _PQ_LMAX * jnp.power(
        jnp.clip(im_t - _PQ_C1, 0.0, None) / (_PQ_C2 - _PQ_C3 * im_t), 1.0 / _PQ_N
    )


def hlg2lin(rgb, gamma: float):
    """Rec.2100 HLG inverse-OETF + OOTF; colour axis at -4 (reference:
    display_model.py:89-108)."""
    a = 0.17883277
    b = 1.0 - 4.0 * a
    c = 0.5 - a * math.log(4.0 * a)
    rgb = jnp.asarray(rgb, jnp.float32)
    rgb_s = jnp.where(
        rgb <= 0.5, jnp.square(rgb) / 3.0, (jnp.exp((rgb - c) / a) + b) / 12.0
    )
    w = jnp.asarray([0.2627, 0.6780, 0.0593], jnp.float32).reshape(3, 1, 1, 1)
    Y_s = jnp.sum(rgb_s * w, axis=-4, keepdims=True)
    return (Y_s ** (gamma - 1.0)) * rgb_s


def apply_color_matrix(img, M):
    """Apply a 3x3 colour matrix to a BCFHW frame along axis -4.

    Implemented as three broadcast dot products (elementwise VPU work — no
    transpose/permute of the pixel data), mirroring the reference trick
    (display_model.py:266-269) which also maps well onto TPU.
    """
    M = jnp.asarray(M, img.dtype)
    rows = [
        jnp.sum(img * M[cc].reshape(3, 1, 1, 1), axis=-4, keepdims=True)
        for cc in range(3)
    ]
    return jnp.concatenate(rows, axis=-4)


def lms2006_to_dkld65(img):
    return apply_color_matrix(img, LMS2006_to_DKLd65)


class PU:
    """PU21 perceptually-uniform encoding for HDR metric adaptation
    (reference: pycvvdp/utils.py:177-239). Works on jnp or np arrays."""

    PARAMS = {
        "banding": [1.070275272, 0.4088273932, 0.153224308, 0.2520326168,
                    1.063512885, 1.14115047, 521.4527484],
        "banding_glare": [0.353487901, 0.3734658629, 8.277049286e-05, 0.9062562627,
                          0.09150303166, 0.9099517204, 596.3148142],
        "peaks": [1.043882782, 0.6459495343, 0.3194584211, 0.374025247,
                  1.114783422, 1.095360363, 384.9217577],
        "peaks_glare": [816.885024, 1479.463946, 0.001253215609, 0.9329636822,
                        0.06746643971, 1.573435413, 419.6006374],
    }

    def __init__(self, L_min=0.005, L_max=10000, type="banding_glare"):
        if type not in self.PARAMS:
            raise ValueError(f"Unknown type: {type}")
        self.L_min = L_min
        self.L_max = L_max
        self.p = self.PARAMS[type]
        p = self.p
        self.peak = p[6] * (
            ((p[0] + p[1] * L_max ** p[3]) / (1 + p[2] * L_max ** p[3])) ** p[4] - p[5]
        )

    def encode(self, Y):
        p = self.p
        Y = jnp.clip(jnp.asarray(Y, jnp.float32), self.L_min, self.L_max)
        Y_p = Y ** p[3]
        return p[6] * (((p[0] + p[1] * Y_p) / (1 + p[2] * Y_p)) ** p[4] - p[5])

    def decode(self, V):
        p = self.p
        V = jnp.asarray(V, jnp.float32)
        V_p = jnp.clip(V / p[6] + p[5], 0.0, None) ** (1.0 / p[4])
        return (jnp.clip(V_p - p[0], 0.0, None) / (p[1] - p[2] * V_p)) ** (1.0 / p[3])
