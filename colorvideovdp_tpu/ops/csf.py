"""castleCSF contrast sensitivity via log-log LUTs.

TPU-native redesign of the reference CSF (reference: pycvvdp/csf.py): the
spatial-frequency interpolation depends only on *static* per-band frequencies,
so it is folded on the host at setup time into a per-(band, channel) vector
over background luminance. At runtime the sensitivity lookup is a single
uniform-grid interpolation (index arithmetic + a 32-entry gather) evaluated
per pixel inside ``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.config import config_files, json2dict
from .interp import np_batch_interp1d


class CastleCSF:
    """CSF S(rho, omega, L_bkg, channel) from JSON LUTs.

    Channels: 0=achromatic sustained, 1=red-green, 2=yellow-violet (all at
    omega=0) and the achromatic transient channel at omega=5 Hz.
    """

    def __init__(self, csf_version: str, config_paths=None):
        lut_file = config_files.find(f"csf_lut_{csf_version}.json", config_paths or [])
        lut = json2dict(lut_file)
        self.log_L_bkg = np.log10(np.asarray(lut["L_bkg"], np.float32))
        self.log_rho = np.log10(np.asarray(lut["rho"], np.float32))
        self.omega = lut["omega"]  # [0, 5]
        # logS[oo][cc] has shape (len(L_bkg), len(rho)).
        self.logS = [
            [np.asarray(lut[f"o{self.omega[0]}_c{cc + 1}"], np.float32) for cc in range(3)],
            [np.asarray(lut[f"o{self.omega[1]}_c1"], np.float32)],
        ]
        self._rho_cache: dict[str, np.ndarray] = {}

    def logS_of_logL(self, rho: float, omega: float, cc: int) -> np.ndarray:
        """Host-side: fold the (static) rho interpolation, returning the
        log10-sensitivity sampled over the LUT's L_bkg grid (reference:
        csf.py:39-46)."""
        oo = 0 if omega == 0 else 1
        key = f"o{oo}_c{cc}_rho{rho}"
        if key not in self._rho_cache:
            logS = self.logS[oo][cc]
            n = self.log_L_bkg.shape[0]
            q = np.full((n,), np.log10(np.float32(rho)), np.float32)
            self._rho_cache[key] = np_batch_interp1d(q, self.log_rho, logS)
        return self._rho_cache[key]

    def sensitivity_lut(self, rho: float, omega: float, cc: int) -> jnp.ndarray:
        return jnp.asarray(self.logS_of_logL(rho, omega, cc))

    @staticmethod
    def _hat_interp(luts: np.ndarray, ind):
        """Evaluate piecewise-linear LUTs at fractional (clamped) index ``ind``
        via the hat-basis identity  f(ind) = sum_k lut[k] * max(0, 1-|ind-k|).

        Exactly equivalent to the two-point lerp of ``interp1q`` but with NO
        gather: per-pixel gathers from tiny tables pad catastrophically on TPU
        (32x tile expansion -> OOM at video scale), while this form is a chain
        of fused multiply-adds on the VPU — one memory-bound pass.
        """
        n = luts.shape[-1]
        acc = None
        for k in range(n):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(ind - float(k)))
            if luts.ndim == 1:
                term = float(luts[k]) * w
                acc = term if acc is None else acc + term
            else:
                terms = [float(luts[c, k]) * w for c in range(luts.shape[0])]
                if acc is None:
                    acc = terms
                else:
                    acc = [a + t for a, t in zip(acc, terms)]
        return acc

    def _index_of(self, logL_bkg):
        x0 = float(self.log_L_bkg[0])
        x1 = float(self.log_L_bkg[-1])
        n = self.log_L_bkg.shape[0]
        return jnp.clip((logL_bkg - x0) / (x1 - x0) * (n - 1), 0.0, float(n - 1))

    def sensitivity(self, rho: float, omega: float, logL_bkg, cc: int, sigma=None):
        """Per-pixel sensitivity (linear units). ``rho``/``omega``/``cc`` are
        static; ``logL_bkg`` is a traced array (reference: csf.py:28-51)."""
        from .kernels.csf_lut import csf_lut_lookup

        lut = self.logS_of_logL(rho, omega, cc)[None]
        x0, x1 = float(self.log_L_bkg[0]), float(self.log_L_bkg[-1])
        return csf_lut_lookup(jnp.asarray(logL_bkg), lut, x0, x1)[0]

    def sensitivity_multi_channel(self, rho_per_ch, omega_per_ch, logL_bkg, channels):
        """Sensitivities for several channels sharing one ``logL_bkg`` field,
        evaluated by the fused Pallas LUT kernel. Returns a stacked array with
        a new leading channel axis."""
        from .kernels.csf_lut import csf_lut_lookup

        luts = np.stack(
            [
                self.logS_of_logL(rho, om, cc)
                for rho, om, cc in zip(rho_per_ch, omega_per_ch, channels)
            ]
        )  # (n_ch, n_L)
        x0, x1 = float(self.log_L_bkg[0]), float(self.log_L_bkg[-1])
        return csf_lut_lookup(jnp.asarray(logL_bkg), luts, x0, x1)
