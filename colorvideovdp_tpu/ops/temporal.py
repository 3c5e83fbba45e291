"""Temporal channel filters (sustained low-pass x3 + transient band-pass).

Filters are built on the host in frequency space and inverted with a real
IFFT (reference: pycvvdp/cvvdp_metric.py:1057-1092); the taps become static
constants folded into the jitted video pipeline, where the filter is applied
as an einsum over the tap axis (MXU-friendly).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def get_temporal_filters(fps: float, sigma_tf, beta_tf, temp_filter: str = "default"):
    """Return (F, omega_bands): four FIR filters of odd length
    ceil(0.25s * fps) and the temporal band frequencies [0, 5] Hz.

    F[0..2] are the sustained Y/rg/yv low-pass filters, F[3] the transient
    achromatic band-pass centred at 5 Hz.
    """
    sigma_tf = np.asarray(sigma_tf, np.float32)
    beta_tf = np.asarray(beta_tf, np.float32)
    N = int(math.ceil(0.250 * fps / 2) * 2) + 1  # odd tap count
    N_omega = N // 2 + 1
    omega = np.linspace(0.0, fps / 2.0, N_omega, dtype=np.float32)[None, :]

    R = np.empty((4, N_omega), np.float32)
    R[0:3, :] = np.exp(-(omega ** beta_tf[0:3, None]) / sigma_tf[0:3, None])
    omega_bands = np.array([0.0, 5.0], np.float32)
    if temp_filter == "hp_trans":
        R[3:4, :] = 1.0 - R[0:1, :]
    else:
        R[3:4, :] = np.exp(
            -((omega ** beta_tf[3] - omega_bands[1] ** beta_tf[3]) ** 2) / sigma_tf[3]
        )

    F = []
    for kk in range(4):
        if temp_filter == "grad_trans" and kk == 3:
            r = np.zeros((N,), np.float32)
            r[0] = 1.0
            r[2] = -1.0
        else:
            r = np.fft.fftshift(np.real(np.fft.irfft(R[kk, :], n=N))).astype(np.float32)
        F.append(r)
    return F, omega_bands


def apply_temporal_filters(sw_buf, filters_flipped):
    """Apply the four temporal filters to a sliding-window buffer.

    sw_buf: (B, 3, fl + nf - 1, H, W) DKL frames (Y, rg, yv).
    filters_flipped: (4, fl) array, taps already time-reversed so the sum is
    the sliding correlation the reference computes (cvvdp_metric.py:554-560).

    Returns (B, 4, nf, H, W): Y-sust, rg, yv, Y-trans.
    """
    fl = filters_flipped.shape[1]
    nf = sw_buf.shape[2] - fl + 1
    # Channel 3 (transient) re-filters the Y plane, so widen to 4 channels and
    # accumulate one strided slice per tap — XLA fuses this into a single
    # memory-bound pass over the output (no fl-times window materialisation).
    buf4 = jnp.concatenate([sw_buf, sw_buf[:, 0:1]], axis=1)  # (B, 4, T, H, W)
    w = jnp.asarray(filters_flipped, sw_buf.dtype)
    out = None
    for t in range(fl):
        term = buf4[:, :, t : t + nf] * w[:, t][None, :, None, None, None]
        out = term if out is None else out + term
    return out
