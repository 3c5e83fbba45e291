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
from .interp import interp1q_weights, np_batch_interp1d


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

    def sensitivity(self, rho: float, omega: float, logL_bkg, cc: int, sigma=None):
        """Per-pixel sensitivity (linear units). ``rho``/``omega``/``cc`` are
        static; ``logL_bkg`` is a traced array (reference: csf.py:28-51)."""
        lut = self.sensitivity_lut(rho, omega, cc)
        x0, x1 = float(self.log_L_bkg[0]), float(self.log_L_bkg[-1])
        imin, imax, frc = interp1q_weights(x0, x1, lut.shape[0], logL_bkg)
        logS = jnp.take(lut, imin) * (1.0 - frc) + jnp.take(lut, imax) * frc
        return 10.0 ** logS

    def sensitivity_multi_channel(self, rho_per_ch, omega_per_ch, logL_bkg, channels):
        """Fetch sensitivities for several channels sharing one ``logL_bkg``
        field: the interpolation index is computed once and reused — a single
        gather from a (n_ch, 32) table per pixel.

        Returns an array shaped like ``logL_bkg`` broadcast over a new leading
        channel axis at -4's position handled by the caller.
        """
        luts = jnp.stack(
            [
                self.sensitivity_lut(rho, om, cc)
                for rho, om, cc in zip(rho_per_ch, omega_per_ch, channels)
            ]
        )  # (n_ch, n_L)
        x0, x1 = float(self.log_L_bkg[0]), float(self.log_L_bkg[-1])
        imin, imax, frc = interp1q_weights(x0, x1, luts.shape[1], logL_bkg)
        # Gather per channel: take along the L axis.
        lo = jnp.take(luts, imin, axis=1)  # (n_ch, *logL.shape)
        hi = jnp.take(luts, imax, axis=1)
        logS = lo * (1.0 - frc) + hi * frc
        return 10.0 ** logS
