"""Display photometry (EOTF -> absolute cd/m^2) and geometry (pixels-per-degree).

TPU-native reimplementation of the reference display model (reference:
pycvvdp/display_model.py:110-627). Photometric transforms are pure jnp
functions safe to call inside ``jit``; all display parameters are Python
floats bound as compile-time constants.
"""

from __future__ import annotations

import logging
import math

import jax.numpy as jnp
import numpy as np

from .ops import colorspace as cs
from .utils.config import config_files, json2dict


class vvdp_display_photometry:
    """Base class: knows the source colour space and its RGB->XYZ matrix."""

    def __init__(self, source_colorspace="sRGB", config_paths=None):
        config_paths = config_paths or []
        colorspaces_file = config_files.find("color_spaces.json", config_paths)
        colorspaces = json2dict(colorspaces_file)
        if source_colorspace not in colorspaces:
            raise RuntimeError(
                f'Color space: "{source_colorspace}" not found in "{colorspaces_file}"'
            )
        spec = colorspaces[source_colorspace]
        if "RGB2X" in spec:  # 'luminance' has no primaries
            self.rgb2xyz = np.array(
                [spec["RGB2X"], spec["RGB2Y"], spec["RGB2Z"]], dtype=np.float32
            )
        self.EOTF = spec["EOTF"]

    def forward(self, V):
        raise NotImplementedError

    def print(self):
        raise NotImplementedError

    @classmethod
    def list_displays(cls, config_paths=None):
        models_file = config_files.find("display_models.json", config_paths or [])
        logging.info(f"JSON file with display models: {models_file}")
        for display_name in json2dict(models_file):
            cls.load(display_name, config_paths).print()

    @classmethod
    def load(cls, display_name, config_paths=None):
        """Build a photometric model from display_models.json (reference:
        display_model.py:153-201)."""
        config_paths = config_paths or []
        models_file = config_files.find("display_models.json", config_paths)
        models = json2dict(models_file)
        if display_name not in models:
            logging.error(
                f"Display model: '{display_name}' not found in '{models_file}'"
            )
            raise RuntimeError("Display model not found")
        model = models[display_name]

        Y_peak = model["max_luminance"]
        colorspace = model.get("colorspace", "sRGB")
        if "min_luminance" in model:
            contrast = Y_peak / model["min_luminance"]
        else:
            contrast = model.get("contrast", 500)

        obj = vvdp_display_photo_eotf(
            Y_peak,
            contrast=contrast,
            source_colorspace=colorspace,
            E_ambient=model.get("E_ambient", 0),
            k_refl=model.get("k_refl", 0.005),
            exposure=model.get("exposure", 1),
            name=display_name,
            config_paths=config_paths,
        )
        obj.full_name = model["name"]
        obj.short_name = display_name
        return obj

    # -- colour pipeline -------------------------------------------------

    def source_2_target_colorspace(self, I_src, target_colorspace):
        """Source (display-encoded or linear) frame -> metric colour space
        (reference: display_model.py:206-237)."""
        if target_colorspace in (
            "display_encoded_01",
            "display_encoded_dmax",
            "display_encoded_100nit",
        ):
            if self.is_input_display_encoded() and not (
                isinstance(self, vvdp_display_photo_eotf) and self.EOTF == "PQ"
            ):
                return jnp.asarray(I_src, jnp.float32)
            if not hasattr(self, "PU"):
                self.PU = cs.PU()
            if target_colorspace == "display_encoded_01":
                PU_max = self.PU.encode(10000.0)
            elif target_colorspace == "display_encoded_100nit":
                PU_max = self.PU.encode(100.0)
            else:
                PU_max = self.PU.encode(self.get_peak_luminance())
            return self.PU.encode(self.forward(I_src)) / PU_max

        I_lin = self.forward(I_src)
        if I_src.shape[-4] == 3:
            return self.linear_2_target_colorspace(I_lin, target_colorspace)
        # Luminance-only content bypasses the colour transform (reference:
        # display_model.py:231-235).
        return I_lin

    def linear_2_target_colorspace(self, RGB_lin, target_colorspace):
        """Display-native linear RGB -> target space via one fused 3x3 matrix
        (reference: display_model.py:241-276)."""
        rgb2xyz = self.rgb2xyz
        if target_colorspace == "Y":
            w = jnp.asarray(rgb2xyz[1], RGB_lin.dtype).reshape(3, 1, 1, 1)
            return jnp.sum(RGB_lin * w, axis=-4, keepdims=True)

        if target_colorspace == "XYZ":
            rgb2abc = rgb2xyz
        elif target_colorspace == "LMS2006":
            rgb2abc = cs.XYZ_to_LMS2006 @ rgb2xyz
        elif target_colorspace == "DKLd65":
            rgb2abc = cs.LMS2006_to_DKLd65 @ cs.XYZ_to_LMS2006 @ rgb2xyz
        elif target_colorspace == "RGB709":
            rgb2abc = cs.XYZ_to_RGB709 @ rgb2xyz
        elif target_colorspace in ("RGB2020", "RGB2020pq"):
            rgb2abc = cs.XYZ_to_RGB2020 @ rgb2xyz
        elif target_colorspace == "logLMS_DKLd65":
            rgb2abc = cs.XYZ_to_LMS2006 @ rgb2xyz
        else:
            raise RuntimeError(f"Unknown colorspace '{target_colorspace}'")

        ABC = cs.apply_color_matrix(RGB_lin, rgb2abc)
        if target_colorspace == "logLMS_DKLd65":
            ABC = cs.lms2006_to_dkld65(jnp.log10(ABC))
        elif target_colorspace == "RGB2020pq":
            ABC = cs.lin2pq(ABC)
        return ABC


class vvdp_display_photo_eotf(vvdp_display_photometry):
    """GOG-style display model with sRGB / PQ / HLG / linear / gamma EOTFs
    (reference: display_model.py:278-388)."""

    def __init__(
        self,
        Y_peak,
        contrast=1000,
        source_colorspace="sRGB",
        EOTF=None,
        E_ambient=0,
        k_refl=0.005,
        exposure=1,
        name=None,
        config_paths=None,
    ):
        super().__init__(source_colorspace=source_colorspace, config_paths=config_paths)
        if EOTF is not None:
            self.EOTF = EOTF
        self.Y_peak = Y_peak
        self.contrast = contrast
        self.E_ambient = E_ambient
        self.k_refl = k_refl
        self.name = name
        self.exposure = exposure

    def is_input_display_encoded(self):
        return self.EOTF != "linear"

    def __eq__(self, other):
        if not isinstance(other, self.__class__):
            return NotImplemented
        return (
            self.Y_peak == other.Y_peak
            and self.contrast == other.contrast
            and self.EOTF == other.EOTF
            and self.E_ambient == other.E_ambient
            and self.k_refl == other.k_refl
            and self.exposure == other.exposure
        )

    def forward(self, V):
        """Display-encoded (or linear) values -> absolute cd/m^2 emitted
        (reference: display_model.py:333-365). Always clamps for non-linear
        EOTFs; clamping is a no-op for in-range input, so this is equivalent
        to the reference's warn-then-clamp without the data-dependent branch."""
        V = jnp.asarray(V, jnp.float32)
        Y_black, Y_refl = self.get_black_level()

        if self.EOTF == "sRGB":
            V = jnp.clip(V, 0.0, 1.0)
            lin = cs.srgb2lin(V)
            if self.exposure != 1:
                lin = jnp.clip(lin * self.exposure, 0.0, 1.0)
            return (self.Y_peak - Y_black) * lin + Y_black + Y_refl
        if self.EOTF == "PQ":
            V = jnp.clip(V, 0.0, 1.0)
            return (
                jnp.clip(cs.pq2lin(V) * self.exposure, 0.005, self.Y_peak)
                + Y_black
                + Y_refl
            )
        if self.EOTF == "linear":
            return (
                jnp.clip(V * self.exposure, max(0.005, Y_black), self.Y_peak) + Y_refl
            )
        if self.EOTF == "HLG":
            V = jnp.clip(V, 0.0, 1.0)
            gamma = 1.2
            if self.Y_peak > 1000:
                # BBC WHP 369 extended-gamma correction for bright displays.
                gamma = (
                    1.2
                    + 0.42 * math.log10(self.Y_peak / 1000)
                    - 0.07623 * math.log10(self.E_ambient / 5)
                )
            lin = cs.hlg2lin(V, gamma)
            if self.exposure != 1:
                lin = jnp.clip(lin * self.exposure, 0.0, 1.0)
            return (self.Y_peak - Y_black) * lin + Y_black + Y_refl
        if self.EOTF[0].isnumeric():
            V = jnp.clip(V, 0.0, 1.0)
            gamma = float(self.EOTF)
            return (
                (self.Y_peak - Y_black)
                * jnp.clip(jnp.power(V, gamma) * self.exposure, 0.0, 1.0)
                + Y_black
                + Y_refl
            )
        raise RuntimeError(f"Unknown EOTF '{self.EOTF}'")

    def get_peak_luminance(self):
        return self.Y_peak

    def get_black_level(self):
        Y_refl = self.E_ambient / math.pi * self.k_refl
        Y_black = self.Y_peak / self.contrast
        return Y_black, Y_refl

    def print(self):
        Y_black, Y_refl = self.get_black_level()
        logging.info(f"Photometric display model: {self.name}")
        logging.info(f"  Peak luminance: {self.Y_peak} cd/m^2")
        logging.info(f"  EOTF: {self.EOTF}")
        logging.info(f"  Contrast - theoretical: {round(self.contrast)}:1")
        logging.info(
            f"  Contrast - effective: {round(self.Y_peak / (Y_black + Y_refl))}:1"
        )
        logging.info(f"  Ambient light: {self.E_ambient} lux")
        logging.info(f"  Display reflectivity: {self.k_refl * 100}%")


class vvdp_display_geometry:
    """Viewing geometry -> pixels-per-degree (reference: display_model.py:431-626)."""

    def __init__(
        self,
        resolution,
        distance_m=None,
        distance_display_heights=None,
        fov_horizontal=None,
        fov_vertical=None,
        fov_diagonal=None,
        diagonal_size_inches=None,
        ppd=None,
    ):
        self.resolution = resolution
        ar = resolution[0] / resolution[1]

        if ppd is not None:
            self.fixed_ppd = ppd
            return
        self.fixed_ppd = None

        if diagonal_size_inches is not None:
            height_mm = math.sqrt((diagonal_size_inches * 25.4) ** 2 / (1 + ar**2))
            self.display_size_m = (ar * height_mm / 1000, height_mm / 1000)

        if distance_m is not None and distance_display_heights is not None:
            raise RuntimeError(
                "You can pass only one of: 'distance_m', 'distance_display_heights'."
            )
        if distance_m is not None:
            self.distance_m = distance_m
        elif distance_display_heights is not None:
            if not hasattr(self, "display_size_m"):
                raise RuntimeError(
                    "You need to specify display diagonal size 'diagonal_size_inches' "
                    "to specify viewing distance as 'distance_display_heights'"
                )
            self.distance_m = distance_display_heights * self.display_size_m[1]
        elif fov_horizontal is not None or fov_vertical is not None or fov_diagonal is not None:
            self.distance_m = 3  # default viewing distance for HMDs
        else:
            raise RuntimeError(
                "Viewing distance must be specified as 'distance_m' or "
                "'distance_display_heights'."
            )

        n_fov = sum(x is not None for x in (fov_horizontal, fov_vertical, fov_diagonal))
        if n_fov > 1:
            raise RuntimeError(
                "You can pass only one of 'fov_horizontal', 'fov_vertical', "
                "'fov_diagonal'."
            )

        if fov_horizontal is not None:
            width_m = 2 * math.tan(math.radians(fov_horizontal / 2)) * self.distance_m
            self.display_size_m = (width_m, width_m / ar)
        elif fov_vertical is not None:
            height_m = 2 * math.tan(math.radians(fov_vertical / 2)) * self.distance_m
            self.display_size_m = (height_m * ar, height_m)
        elif fov_diagonal is not None:
            # Pythagoras must be applied to distances, not angles.
            distance_px = math.sqrt(resolution[0] ** 2 + resolution[1] ** 2) / (
                2.0 * math.tan(math.radians(fov_diagonal * 0.5))
            )
            height_deg = math.degrees(math.atan(resolution[1] / 2 / distance_px)) * 2
            height_m = 2 * math.tan(math.radians(height_deg / 2)) * self.distance_m
            self.display_size_m = (height_m * ar, height_m)

        self.display_size_deg = (
            2 * math.degrees(math.atan(self.display_size_m[0] / (2 * self.distance_m))),
            2 * math.degrees(math.atan(self.display_size_m[1] / (2 * self.distance_m))),
        )

    def __eq__(self, other):
        if not isinstance(other, self.__class__):
            return NotImplemented
        return (
            self.resolution == other.resolution
            and self.distance_m == other.distance_m
            and self.display_size_m == other.display_size_m
        )

    def get_ppd(self, eccentricity=None):
        if self.fixed_ppd is not None:
            return self.fixed_ppd
        pix_deg = 2 * math.degrees(
            math.atan(
                0.5 * self.display_size_m[0] / self.resolution[0] / self.distance_m
            )
        )
        base_ppd = 1 / pix_deg
        if eccentricity is None:
            return base_ppd
        delta = pix_deg / 2
        tan_delta = math.tan(math.radians(delta))
        ecc = jnp.asarray(eccentricity, jnp.float32)
        tan_a = jnp.tan(jnp.deg2rad(ecc))
        return base_ppd * (jnp.tan(jnp.deg2rad(ecc + delta)) - tan_a) / tan_delta

    def pix2eccentricity(self, resolution_pix, x_pix, y_pix, gaze_pix):
        if self.fixed_ppd is not None:
            return (
                jnp.sqrt((x_pix - gaze_pix[0]) ** 2 + (y_pix - gaze_pix[1]) ** 2)
                / self.fixed_ppd
            )
        shift_to_centre = -np.asarray(resolution_pix) / 2
        x_m = (x_pix + shift_to_centre[0]) * self.display_size_m[0] / self.resolution[0]
        y_m = (y_pix + shift_to_centre[1]) * self.display_size_m[1] / self.resolution[1]
        gaze_m = (
            (np.asarray(gaze_pix) + shift_to_centre)
            * np.asarray(self.display_size_m)
            / np.asarray(self.resolution)
        )
        gaze_deg = np.degrees(np.arctan(gaze_m / self.distance_m))
        return jnp.sqrt(
            (jnp.degrees(jnp.arctan(x_m / self.distance_m)) - gaze_deg[0]) ** 2
            + (jnp.degrees(jnp.arctan(y_m / self.distance_m)) - gaze_deg[1]) ** 2
        )

    def get_resolution_magnification(self, eccentricity):
        if self.fixed_ppd is not None:
            return jnp.ones_like(jnp.asarray(eccentricity, jnp.float32))
        ecc = jnp.minimum(jnp.asarray(eccentricity, jnp.float32), 89.9)
        pix_rad = 2 * math.atan(
            0.5 * self.display_size_m[0] / self.resolution[0] / self.distance_m
        )
        delta = pix_rad / 2
        tan_delta = math.tan(delta)
        tan_a = jnp.tan(jnp.deg2rad(ecc))
        return (jnp.tan(jnp.deg2rad(ecc) + delta) - tan_a) / tan_delta

    def print(self):
        logging.info("Geometric display model:")
        if self.fixed_ppd is not None:
            logging.info(f"  Fixed pixels-per-degree: {self.fixed_ppd}")
        else:
            logging.info(
                f"  Resolution: {self.resolution[0]} x {self.resolution[1]} pixels"
            )
            logging.info(
                "  Display size: {:.1f} x {:.1f} cm".format(
                    self.display_size_m[0] * 100, self.display_size_m[1] * 100
                )
            )
            logging.info(
                "  Display size: {:.2f} x {:.2f} deg".format(*self.display_size_deg)
            )
            logging.info(f"  Viewing distance: {self.distance_m:.3f} m")
            logging.info(f"  Pixels-per-degree (center): {self.get_ppd():.2f}")

    @classmethod
    def load(cls, display_name, config_paths=None):
        config_paths = config_paths or []
        models_file = config_files.find("display_models.json", config_paths)
        models = json2dict(models_file)
        if display_name not in models:
            logging.error(
                f"Display model: '{display_name}' not found in '{models_file}'"
            )
            raise RuntimeError("Display model not found")
        model = models[display_name]
        assert "resolution" in model
        inches_to_meters = 0.0254
        W, H = model["resolution"]

        if "pixels_per_degree" in model:
            return cls((W, H), ppd=model["pixels_per_degree"])

        fov_diagonal = model.get("fov_diagonal")
        if "viewing_distance_meters" in model:
            distance_m = model["viewing_distance_meters"]
        elif "viewing_distance_inches" in model:
            distance_m = model["viewing_distance_inches"] * inches_to_meters
        else:
            distance_m = None
        if "diagonal_size_meters" in model:
            diag_size_inch = model["diagonal_size_meters"] / inches_to_meters
        elif "diagonal_size_inches" in model:
            diag_size_inch = model["diagonal_size_inches"]
        else:
            diag_size_inch = None
        return cls(
            (W, H),
            distance_m=distance_m,
            fov_diagonal=fov_diagonal,
            diagonal_size_inches=diag_size_inch,
        )
