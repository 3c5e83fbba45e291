"""Visualisation: heatmap colour-mapping and distograms.

Host-side (numpy) output path, mirroring the reference behaviour
(reference: pycvvdp/visualize_diff_map.py, pycvvdp/cvvdp_metric.py:1158-1221).
"""

from __future__ import annotations

import math

import numpy as np


def _np_interp1(x, v, x_q):
    """Piecewise-linear LUT with clamped ends (reference: interp.py:81-89)."""
    x = np.asarray(x, np.float32)
    v = np.asarray(v, np.float32)
    q = np.asarray(x_q, np.float32)
    imax = np.searchsorted(x, q, side="right")
    imax = np.minimum(imax, len(x) - 1)
    imin = np.clip(imax - 1, 0, len(x) - 1)
    frc = (q - x[imin]) / (x[imax] - x[imin] + 1e-6)
    frc = np.where(imax == imin, 0.0, frc)
    frc = np.where(frc < 0.0, 0.0, frc)
    return v[imin] * (1.0 - frc) + v[imax] * frc


def _luminance_NCHW(x):
    if x.shape[1] == 3:  # NC*** (quirk: also fires for 3-frame context blocks)
        return (
            x[:, 0:1] * 0.212656 + x[:, 1:2] * 0.715158 + x[:, 2:3] * 0.072186
        )
    return x


def _log_luminance(x):
    y = _luminance_NCHW(x)
    pos = y[y > 0.0]
    clampval = pos.min() if pos.size else 1e-6
    return np.log(np.clip(y, clampval, None))


def vis_tonemap(b, dr):
    """Histogram-equalisation tone mapping of log-luminance (reference:
    visualize_diff_map.py:23-45)."""
    t = 3.0
    b_min, b_max = float(b.min()), float(b.max())
    if b_max - b_min < dr:
        return (b - b_min) / (b_max - b_min + 1e-3) * dr + (1 - dr) / 2

    b_scale = np.linspace(b_min, b_max, 1024, dtype=np.float32)
    b_p, _ = np.histogram(b, bins=1024, range=(b_min, b_max))
    b_p = b_p.astype(np.float32) / b_p.sum()
    dy = b_p ** (1.0 / t) / np.sum(b_p ** (1.0 / t))
    v = np.cumsum(dy) * dr + (1.0 - dr) / 2.0
    return _np_interp1(b_scale, v, b)


def visualize_diff_map(diff_map, context_image=None,
                       colormap_type="supra-threshold"):
    """Colour-mapped distortion visualisation -> sRGB frames (3, F, H, W)
    (reference: visualize_diff_map.py:48-106)."""
    diff_map = np.clip(np.asarray(diff_map, np.float32), 0.0, 1.0)

    if context_image is None:
        tmo_img = np.ones_like(diff_map) * 0.5
    else:
        tmo_img = vis_tonemap(_log_luminance(np.asarray(context_image, np.float32)),
                              0.6)

    if colormap_type == "threshold":
        color_map = np.array(
            [[0.2, 0.2, 1.0], [0.2, 1.0, 1.0], [0.2, 1.0, 0.2],
             [1.0, 1.0, 0.2], [1.0, 0.2, 0.2]], np.float32)
        color_map_in = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32) * 0.1
    elif colormap_type == "supra-threshold":
        color_map = np.array(
            [[0.2, 1.0, 1.0], [1.0, 1.0, 1.0], [1.0, 1.0, 0.2]], np.float32)
        color_map_in = np.array([0.0, 0.5, 1.0], np.float32) * 0.3
    elif colormap_type == "monochromatic":
        color_map = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]], np.float32)
        color_map_in = np.array([0.0, 1.0], np.float32)
    else:
        raise RuntimeError(f"Unknown colormap: {colormap_type}")

    color_map_l = (
        color_map[:, 0:1] * 0.212656
        + color_map[:, 1:2] * 0.715158
        + color_map[:, 2:3] * 0.072186
    )
    color_map_ch = color_map / (np.concatenate([color_map_l] * 3, 1) + 1e-4)

    F, h, w = diff_map.shape[-3], diff_map.shape[-2], diff_map.shape[-1]
    cmap = np.empty((3, F, h, w), np.float16)
    dm = diff_map.reshape(-1, F, h, w)[0] if diff_map.ndim > 3 else diff_map
    for cc in range(3):
        cmap[cc] = _np_interp1(color_map_in, color_map_ch[:, cc], dm).astype(
            np.float16
        )
    tmo = np.asarray(tmo_img, np.float32).reshape(-1, F, h, w)[0]
    return np.clip(cmap * tmo, 0.0, 1.0)


def export_distogram(metric, stats, fname, jod_max=None, base_size=6):
    """Per-channel x per-band x per-frame distortion plot (reference:
    cvvdp_metric.py:1158-1221)."""
    try:
        import matplotlib.pyplot as plt
        from matplotlib import ticker
        from matplotlib.colors import Normalize
    except ImportError as e:
        raise RuntimeError(
            "matplotlib is missing. Please install it before exporting "
            "distograms."
        ) from e

    Q_per_ch = np.asarray(stats["Q_per_ch"], np.float32).copy()
    if Q_per_ch.shape[0] != 1:
        raise RuntimeError("Exporting distograms in batch mode is not supported")
    ch_no = Q_per_ch.shape[1]
    is_image = Q_per_ch.shape[2] == 1

    Q_per_ch[:, :, :, -1] *= metric.baseband_weight[:ch_no].reshape(-1, 1)
    Q_per_ch *= metric.get_ch_weights(ch_no).reshape(1, -1, 1, 1) * ch_no
    dmap = 10.0 - np.asarray(metric.met2jod(Q_per_ch))

    if jod_max is None:
        jod_max = math.ceil(dmap.max())
    dmap /= jod_max

    fps = stats["frames_per_second"]
    frame_no = Q_per_ch.shape[2]
    rho_band = stats["rho_band"]
    band_labels = [f"{val:.2f}" for val in np.flip(rho_band)[::2]]
    band_labels[0] = "BB"

    fig, axs = plt.subplots(nrows=ch_no,
                            figsize=(base_size * frame_no / 60 + 1, base_size))
    ch_labels = ["A-sust", "RG", "YV", "A-trans"]
    cmap = plt.colormaps["plasma"]

    for kk in range(ch_no):
        dmap_ch = np.flip(np.transpose(dmap[0, kk].clip(0.0, 1.0)), axis=0)
        axs[kk].imshow(dmap_ch, cmap=cmap, aspect="auto")
        axs[kk].set_ylabel(ch_labels[kk])
        axs[kk].yaxis.set_major_locator(
            ticker.FixedLocator(range(0, len(band_labels) * 2, 2))
        )
        axs[kk].yaxis.set_minor_locator(ticker.MultipleLocator(1.0))
        axs[kk].set_yticklabels(band_labels)
        if kk == ch_no - 1 and not is_image:
            axs[kk].xaxis.set_major_formatter(
                lambda x, pos: str(int(x / fps * 1000))
            )
            axs[kk].set_xlabel("Time [ms]")
            axs[kk].xaxis.set_minor_locator(ticker.MultipleLocator(1.0))
        else:
            axs[kk].set_xticks([])

    if is_image:
        plt.subplots_adjust(bottom=0.1, right=0.5, top=0.9)
        cax = plt.axes([0.725, 0.1, 0.125, 0.8])
    else:
        plt.subplots_adjust(bottom=0.1, right=0.9, top=0.9)
        cax = plt.axes([0.925, 0.1, 0.025, 0.8])
    plt.colorbar(
        plt.cm.ScalarMappable(norm=Normalize(0, jod_max), cmap=cmap),
        cax=cax, cmap=cmap,
    )
    plt.savefig(fname, bbox_inches="tight")
    plt.close(fig)
