"""Contrast masking models, pooling norms and the JOD mapping.

Pure jnp functions parameterised by a ``MaskingParams`` container so the whole
per-band computation traces into one fused XLA graph (reference:
pycvvdp/cvvdp_metric.py:610-1008).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from .blur import gaussian_blur

_EPS = 1e-5


def safe_pow(x, p):
    """Differentiable power with an epsilon shift (reference:
    cvvdp_metric.py:77-87)."""
    return (x + _EPS) ** p - _EPS**p


def pow_neg(x, p):
    """Sign-preserving power (reference: cvvdp_metric.py:90-96)."""
    return (
        jnp.maximum(x, _EPS) ** p + jnp.maximum(-x, _EPS) ** p - _EPS**p
    )


def _pow_static(x, p: float):
    """x**p for a compile-time exponent. Small integer exponents become
    multiply chains — the transcendental pow path on TPU has ~1e-4 relative
    error which visibly biases large pooling sums."""
    if p == 1.0:
        return x
    if p == 2.0:
        return x * x
    if p == 3.0:
        return x * x * x
    if p == 4.0:
        x2 = x * x
        return x2 * x2
    if p == 0.5:
        return jnp.sqrt(x)
    if p == 0.25:
        return jnp.sqrt(jnp.sqrt(x))
    return x**p


def _root_static(x, p: float):
    if p == 1.0:
        return x
    if p == 2.0:
        return jnp.sqrt(x)
    if p == 4.0:
        return jnp.sqrt(jnp.sqrt(x))
    return x ** (1.0 / p)


def _safe_pow_static(x, p: float):
    """safe_pow with a compile-time exponent (multiply chains for small ints)."""
    return _pow_static(x + _EPS, p) - _EPS**p


def lp_norm(x, p, dim, normalize=True, keepdim=True):
    """Pooling norm along ``dim`` (reference: cvvdp_metric.py:1032-1050).

    NOTE: the reference's pooling exponents (beta, beta_t, beta_tch, beta_sch)
    are loaded as torch *tensors*, so its lp_norm always takes the
    tensor-exponent branch: safe_pow(sum(safe_pow(x, p))/N, 1/p). The epsilon
    terms shift every pooled value by -eps^(1/p) (~ -0.00316 for p=2); we
    replicate that formula exactly.
    """
    if isinstance(dim, tuple):
        N = 1.0
        for dd in dim:
            N *= x.shape[dd]
    else:
        N = x.shape[dim]
    if not normalize:
        N = 1.0
    p = float(p)
    s = jnp.sum(_safe_pow_static(x, p), axis=dim, keepdims=keepdim) / float(N)
    return _safe_pow_static(s, 1.0 / p)


@dataclass(frozen=True)
class MaskingParams:
    """Static calibration constants consumed by the masking model."""

    masking_model: str
    mask_p: float
    mask_q: tuple  # per-channel exponents (4,)
    mask_c: float
    pu_dilate: float
    xcm_weights: tuple  # 16 cross-channel log-weights
    do_xchannel_masking: bool
    dclamp_type: str
    d_max: float  # may be scalar or per-channel
    ce_g: float | None = None
    k_c: float | None = None

    TEX_BLUR_SIGMA = 8.0

    @property
    def pu_kernel_size(self) -> int:
        return int(self.pu_dilate * 4) + 1

    @property
    def pu_padsize(self) -> int:
        return int(self.pu_dilate * 2)

    @property
    def tex_kernel_size(self) -> int:
        return int(self.TEX_BLUR_SIGMA * 4) + 1

    @property
    def tex_pad_size(self) -> int:
        return int(self.TEX_BLUR_SIGMA * 2)


def mask_pool(C, params: MaskingParams):
    """Cross-channel masking mix: M[:,cc] = sum_c' C[:,c'] * 2^w[c',cc]
    (reference: cvvdp_metric.py:753-764)."""
    num_ch = C.shape[-4]
    xcm = np.power(2.0, np.asarray(params.xcm_weights, np.float32)).reshape(4, 4)
    if params.do_xchannel_masking:
        w = jnp.asarray(xcm[:num_ch, :num_ch], C.dtype)
        return jnp.einsum("bcfhw,cd->bdfhw", C, w, precision="highest")
    w = jnp.asarray(np.diagonal(xcm)[:num_ch], C.dtype).reshape(1, num_ch, 1, 1, 1)
    return C * w


def phase_uncertainty(M, params: MaskingParams):
    """Gaussian dilation of the masking signal (reference:
    cvvdp_metric.py:963-971). The blur is skipped for bands smaller than the
    pad size — a static (shape-based) decision."""
    scale = 10.0**params.mask_c
    if (
        params.pu_dilate != 0
        and M.shape[-2] > params.pu_padsize
        and M.shape[-1] > params.pu_padsize
    ):
        return gaussian_blur(M, params.pu_kernel_size, params.pu_dilate) * scale
    return M * scale


def clamp_diffs(D, params: MaskingParams):
    """Visual-difference clamping (reference: cvvdp_metric.py:945-960)."""
    if params.dclamp_type == "hard":
        return jnp.clip(D, None, 10.0**params.d_max)
    if params.dclamp_type == "soft":
        max_v = 10.0**params.d_max
        return max_v * D / (max_v + D)
    if params.dclamp_type == "none":
        return D
    if params.dclamp_type == "per_channel":
        num_ch = D.shape[0]
        max_v = np.power(10.0, np.asarray(params.d_max)[:num_ch]).reshape(-1, 1, 1, 1)
        max_v = jnp.asarray(max_v, D.dtype)
        return max_v * D / (max_v + D)
    raise RuntimeError(f"Unknown difference clamping type {params.dclamp_type}")


def _cm_transd(C_p, params: MaskingParams):
    num_ch = C_p.shape[0]
    p = params.mask_p
    q = jnp.asarray(params.mask_q, C_p.dtype)[:num_ch].reshape(num_ch, 1, 1, 1)
    M = phase_uncertainty(
        mask_pool(safe_pow(jnp.abs(C_p), q), params), params
    )
    D_max = 10.0**params.d_max
    return D_max * pow_neg(C_p, p) / (0.2 + M)


def apply_masking_model(T, R, S, params: MaskingParams):
    """Per-band distortion map D from test/reference contrast and sensitivity
    (reference: cvvdp_metric.py:817-943). Supports the model families the
    reference ships; the calibrated default is ``mult-mutual``."""
    model = params.masking_model
    num_ch = T.shape[-4]

    if model in (
        "mult-none",
        "add-transducer",
        "mult-transducer",
        "add-mutual",
        "mult-mutual",
        "mult-mutual-old",
        "add-similarity",
        "mult-similarity",
        "mult-transducer-texture",
        "add-transducer-texture",
    ):
        if model.startswith("add"):
            ch_gain = jnp.asarray(
                np.array([1.0, 1.7, 0.237, 1.0], np.float32)[:num_ch].reshape(
                    1, num_ch, 1, 1, 1
                )
            ) * params.ce_g
            C_t = 1.0 / S
            T_p = jnp.sign(T) * jnp.maximum((jnp.abs(T) - C_t) * ch_gain + 1.0, 0.0)
            R_p = jnp.sign(R) * jnp.maximum((jnp.abs(R) - C_t) * ch_gain + 1.0, 0.0)
        elif model.endswith("mutual-old"):
            T_p = T * S
            R_p = R * S
        else:
            ch_gain = jnp.asarray(
                np.array([1.0, 1.45, 1.0, 1.0], np.float32)[:num_ch].reshape(
                    1, num_ch, 1, 1, 1
                )
            )
            T_p = T * S * ch_gain
            R_p = R * S * ch_gain

        if model.endswith("none"):
            return clamp_diffs(jnp.abs(T_p - R_p), params)

        if model.endswith("transducer"):
            return jnp.abs(_cm_transd(T_p, params) - _cm_transd(R_p, params))

        if model.endswith("mutual"):
            M_mm = phase_uncertainty(jnp.minimum(jnp.abs(T_p), jnp.abs(R_p)), params)
            p = params.mask_p
            q = jnp.asarray(params.mask_q, T.dtype)[:num_ch].reshape(num_ch, 1, 1, 1)
            M = mask_pool(safe_pow(jnp.abs(M_mm), q), params)
            D_u = safe_pow(jnp.abs(T_p - R_p), p) / (1.0 + M)
            return clamp_diffs(D_u, params)

        if model.endswith("mutual-old"):
            M_mm = phase_uncertainty(jnp.minimum(jnp.abs(T_p), jnp.abs(R_p)), params)
            p = params.mask_p
            q = jnp.asarray(params.mask_q, T.dtype)[:num_ch].reshape(
                1, num_ch, 1, 1, 1
            )
            M = mask_pool(jnp.abs(M_mm), params)
            D_band = safe_pow(jnp.abs(T_p - R_p), p)
            D_m = D_band / (1.0 + safe_pow(M, q))
            k_c = params.k_c
            return k_c * D_m / (k_c + D_m)

        if model.endswith("transducer-texture"):
            # Local texture statistics on the transduced responses
            # (reference: cvvdp_metric.py:873-895).
            if (T_p.shape[-2] <= params.tex_pad_size
                    or T_p.shape[-1] <= params.tex_pad_size):
                return jnp.abs(_cm_transd(T_p, params)
                               - _cm_transd(R_p, params))
            T_t = _cm_transd(T_p, params)
            R_t = _cm_transd(R_p, params)
            ks, sg = params.tex_kernel_size, params.TEX_BLUR_SIGMA
            mu_T = gaussian_blur(T_t, ks, sg)
            mu_R = gaussian_blur(R_t, ks, sg)
            sigma_T_sq = jnp.clip(
                gaussian_blur(T_t * T_t, ks, sg) - mu_T * mu_T, 0.0, None
            )
            sigma_R_sq = jnp.clip(
                gaussian_blur(R_t * R_t, ks, sg) - mu_R * mu_R, 0.0, None
            )
            return jnp.abs(mu_T - mu_R) + jnp.abs(
                jnp.sqrt(sigma_T_sq) - jnp.sqrt(sigma_R_sq)
            )

        # similarity
        T_p_m = phase_uncertainty(mask_pool(jnp.abs(T_p), params), params)
        R_p_m = phase_uncertainty(mask_pool(jnp.abs(R_p), params), params)
        D_max = 10.0**params.d_max
        eps = D_max - 1.0
        return D_max - D_max * (2.0 * jnp.abs(T_p) * jnp.abs(R_p) + eps) / (
            T_p_m * T_p_m + R_p_m * R_p_m + eps
        )

    if model in ("smooth_clamp_cont", "min_mutual_masking_perc_norm2",
                 "fvvdp_ch_gain"):
        # Legacy fvvdp-style masking family (reference:
        # cvvdp_metric.py:909-939).
        if model == "fvvdp_ch_gain":
            ch_gain = jnp.asarray(
                np.array([1.0, 1.45, 1.0, 1.0], np.float32)[:num_ch].reshape(
                    num_ch, 1, 1, 1
                )
            )
            T = T * S * ch_gain
            R = R * S * ch_gain
        else:
            T = T * S
            R = R * S
        M_pu = phase_uncertainty(jnp.minimum(jnp.abs(T), jnp.abs(R)), params)
        M = mask_pool(M_pu, params) if params.do_xchannel_masking else M_pu
        q = jnp.asarray(params.mask_q, T.dtype)[:num_ch].reshape(
            num_ch, 1, 1, 1
        )
        p = params.mask_p
        G = jnp.abs(T - R)
        if model == "smooth_clamp_cont":
            max_v = 10.0**params.d_max
            Gp = G**p
            D_u = ((max_v * Gp + 1.0) / (max_v + Gp)) / (
                1.0 + safe_pow(M, q)
            )
            # NOTE: the reference compares against the misspelled
            # "soft_clamp_cont" (cvvdp_metric.py:936), so the clamp is
            # applied here too — replicated for parity.
            return clamp_diffs(D_u, params)
        D_u = safe_pow(G, p) / (1.0 + safe_pow(M, q))
        return clamp_diffs(D_u, params)

    raise RuntimeError(f"Unknown masking model {model}")


def met2jod(Q, jod_a: float, jod_exp: float):
    """Distortion -> JOD, linearised below Q=0.1 for stable gradients
    (reference: cvvdp_metric.py:646-658)."""
    Q_t = 0.1
    jod_a_p = jod_a * Q_t ** (jod_exp - 1.0)
    return jnp.where(
        Q <= Q_t,
        10.0 - jod_a_p * Q,
        10.0 - jod_a * jnp.clip(Q, Q_t, None) ** jod_exp,
    )
