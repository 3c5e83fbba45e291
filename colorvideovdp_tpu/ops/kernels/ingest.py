"""Fused Pallas ingest kernel: raw frame blocks -> DKL -> temporal FIR.

The metric's video front end — dtype ladder, display-model EOTF, RGB->DKL
matrix, the four temporal FIR channels and the test/reference channel
interleave (reference: pycvvdp/video_source.py:78-92, display_model.py:
333-365, cvvdp_metric.py:554-560) — is purely elementwise over (H, W) but,
expressed in XLA, costs five full-size HBM materialisations per block
(float cast, EOTF, C<->F transpose, 3x3 matrix, tap accumulation): measured
~20 ms/frame at 4K, dominated by HBM traffic and relayouts.

This kernel does the whole chain in one pass over row tiles: the uint8/16
sources and the carried DKL tail are read once, every used frame plane is
converted exactly once in VMEM, the sliding FIR accumulates per output
frame, and the interleaved (1, 8, nf, H, W) block plus the next DKL tail
are written straight out. HBM traffic drops to the information-theoretic
floor (raw bytes in, result bytes out).

Scoring is forward-only (the training path uses the jnp pipeline), so no
VJP is defined here; the caller gates on that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PQ_LMAX = 10000.0
_PQ_N = 0.15930175781250000
_PQ_M = 78.843750000000000
_PQ_C1 = 0.83593750000000000
_PQ_C2 = 18.851562500000000
_PQ_C3 = 18.687500000000000


def _display_params(dm):
    """Extract the static photometric constants (display.py:190-238)."""
    import math

    Y_refl = dm.E_ambient / math.pi * dm.k_refl
    Y_black = dm.Y_peak / dm.contrast
    eotf = dm.EOTF
    if eotf not in ("sRGB", "PQ", "linear", "HLG") and eotf[0].isnumeric():
        eotf = "gamma"
    gamma = float(dm.EOTF) if eotf == "gamma" else 0.0
    hlg_gamma = 1.2
    if eotf == "HLG" and dm.Y_peak > 1000:
        hlg_gamma = (1.2 + 0.42 * math.log10(dm.Y_peak / 1000)
                     - 0.07623 * math.log10(dm.E_ambient / 5))
    return dict(
        eotf=eotf,
        Y_peak=float(dm.Y_peak),
        Y_black=float(Y_black),
        Y_refl=float(Y_refl),
        exposure=float(dm.exposure),
        gamma=gamma,
        hlg_gamma=float(hlg_gamma),
    )


def supports(dm, met_colorspace: str, dtype) -> bool:
    """Whether the ingest kernel can replace the XLA front end for this
    (display model, colorspace, source dtype) combination."""
    from ...display import vvdp_display_photo_eotf

    if met_colorspace != "DKLd65":
        return False
    if not isinstance(dm, vvdp_display_photo_eotf):
        return False
    eotf = dm.EOTF
    if eotf not in ("sRGB", "PQ", "linear", "HLG") and not eotf[0].isnumeric():
        return False
    return np.dtype(dtype) in (np.uint8, np.uint16, np.int16)


# Mosaic's scoped-vmem budget is 16 MB; leave headroom for double-buffer
# bookkeeping the estimate can't see.
_VMEM_LIMIT = 13 * 1024 * 1024


def _tile_bytes(src_bytes, blk, fl, th, tw):
    """Estimated scoped-vmem bytes for one (th, tw) tile: double-buffered IO
    blocks + the in-kernel DKL plane cache (fp32)."""
    plane = th * tw
    raw_in = 2 * blk * 3 * plane * src_bytes          # two sources
    head_in = 2 * 3 * (fl - 1) * plane * 4            # tails/heads (<= fp32)
    out = (8 * blk + 2 * 3 * (fl - 1)) * plane * 4    # block + new tails
    dkl_cache = 2 * 3 * (fl - 1 + blk) * plane * 4
    return 2 * (raw_in + head_in + out) + dkl_cache


def pick_tiles(src_dtype, blk, fl, H, W):
    """Largest (th, tw) row tile that fits the vmem budget, or None when even
    the minimum 8-row tile cannot fit (the caller falls back to XLA). VMEM
    cost scales linearly with blk — whole-clip blocks at small resolutions
    are exactly the case that must fall back."""
    src_bytes = np.dtype(src_dtype).itemsize
    tw = W if W <= 1024 else 512  # partial edge blocks are padded/cropped
    th = 256
    while th >= 8:
        if th <= H or th == 8:
            if _tile_bytes(src_bytes, blk, fl, th, tw) <= _VMEM_LIMIT:
                return th, tw
        th //= 2
    return None


def _to_float01(x, src_dtype):
    """Dtype ladder (video_source.frame_to_float32) on a VMEM tile. True
    division, not reciprocal-multiply: the PQ curve amplifies the last-ULP
    difference ~6x into the linear-luminance result."""
    if src_dtype == np.uint8:
        # Mosaic has no direct u8->f32 cast; hop through int32 (lossless).
        return x.astype(jnp.int32).astype(jnp.float32) / 255.0
    if src_dtype == np.uint16:
        return x.astype(jnp.int32).astype(jnp.float32) / 65535.0
    # uint16 payload packed in int16: recover losslessly via int32.
    v = x.astype(jnp.int32)
    v = jnp.where(v < 0, v + 65536, v)
    return v.astype(jnp.float32) / 65535.0


def _eotf_lin(rgb, p):
    """Display-encoded 0..1 -> absolute cd/m^2 per channel; rgb is a list of
    three tiles. Mirrors vvdp_display_photo_eotf.forward exactly."""
    eotf = p["eotf"]
    Y_peak, Y_black, Y_refl = p["Y_peak"], p["Y_black"], p["Y_refl"]
    exposure = p["exposure"]
    out = []
    if eotf == "HLG":
        import math

        a = 0.17883277
        b = 1.0 - 4.0 * a
        c = 0.5 - a * math.log(4.0 * a)
        rgb_s = []
        for V in rgb:
            V = jnp.clip(V, 0.0, 1.0)
            rgb_s.append(jnp.where(V <= 0.5, (V * V) * (1.0 / 3.0),
                                   (jnp.exp((V - c) / a) + b) / 12.0))
        w = (0.2627, 0.6780, 0.0593)
        Y_s = rgb_s[0] * w[0] + rgb_s[1] * w[1] + rgb_s[2] * w[2]
        oo = Y_s ** (p["hlg_gamma"] - 1.0)
        for s in rgb_s:
            lin = oo * s
            if exposure != 1.0:
                lin = jnp.clip(lin * exposure, 0.0, 1.0)
            out.append((Y_peak - Y_black) * lin + Y_black + Y_refl)
        return out
    for V in rgb:
        if eotf == "sRGB":
            V = jnp.clip(V, 0.0, 1.0)
            lin = jnp.where(V > 0.04045, ((V + 0.055) / 1.055) ** 2.4,
                            V * (1.0 / 12.92))
            if exposure != 1.0:
                lin = jnp.clip(lin * exposure, 0.0, 1.0)
            out.append((Y_peak - Y_black) * lin + Y_black + Y_refl)
        elif eotf == "PQ":
            V = jnp.clip(V, 0.0, 1.0)
            im_t = jnp.power(V, 1.0 / _PQ_M)
            L = _PQ_LMAX * jnp.power(
                jnp.clip(im_t - _PQ_C1, 0.0, None) / (_PQ_C2 - _PQ_C3 * im_t),
                1.0 / _PQ_N,
            )
            out.append(jnp.clip(L * exposure, 0.005, Y_peak)
                       + Y_black + Y_refl)
        elif eotf == "linear":
            out.append(jnp.clip(V * exposure, max(0.005, Y_black), Y_peak)
                       + Y_refl)
        else:  # numeric gamma
            V = jnp.clip(V, 0.0, 1.0)
            lin = jnp.clip(jnp.power(V, p["gamma"]) * exposure, 0.0, 1.0)
            out.append((Y_peak - Y_black) * lin + Y_black + Y_refl)
    return out


def _rgb2dkl(dm):
    """Fused RGB->DKLd65 3x3 (display.linear_2_target_colorspace)."""
    from ..colorspace import LMS2006_to_DKLd65, XYZ_to_LMS2006

    return np.asarray(
        LMS2006_to_DKLd65 @ XYZ_to_LMS2006 @ np.asarray(dm.rgb2xyz,
                                                        np.float32),
        np.float32,
    )


def _ingest_kernel(*refs, fl, blk, src_dtype, disp, M, filt,
                   first_mode):
    """One row tile: convert every used frame plane once, FIR, interleave.

    refs layout (inputs then outputs):
      first_mode == "tail":      tail_t, tail_r, raw_t, raw_r
      first_mode == "replicate": raw_t, raw_r
      first_mode == "head":      head_t, head_r, raw_t, raw_r  (head is raw)
    outputs: out (1, 8, blk, th, tw), tail_t_new, tail_r_new (1, 3, fl-1, ...)
    """
    n_in = {"tail": 4, "replicate": 2, "head": 4}[first_mode]
    ins, outs = refs[:n_in], refs[n_in:]
    out_ref, tail_t_out, tail_r_out = outs

    if first_mode == "replicate":
        raws = (ins[0], ins[1])
        tails = None
        heads = None
    elif first_mode == "head":
        heads = (ins[0], ins[1])
        raws = (ins[2], ins[3])
        tails = None
    else:
        tails = (ins[0], ins[1])
        raws = (ins[2], ins[3])
        heads = None

    # Convert a raw frame plane triplet -> DKL triplet, memoised so each
    # (src, frame) is converted exactly once per tile.
    dkl_cache: dict = {}

    def dkl_new(src, f, ref, f_ref):
        key = (src, f)
        if key not in dkl_cache:
            rgb = [_to_float01(ref[0, f_ref, c], src_dtype) for c in range(3)]
            lin = _eotf_lin(rgb, disp)
            dkl_cache[key] = [
                lin[0] * float(M[c, 0]) + lin[1] * float(M[c, 1])
                + lin[2] * float(M[c, 2])
                for c in range(3)
            ]
        return dkl_cache[key]

    def plane(src, c, s):
        """DKL plane for buffer slot s in [0, fl-1+blk): tail/head frames
        first, then the new block."""
        if s >= fl - 1:
            return dkl_new(src, s - (fl - 1), raws[src], s - (fl - 1))[c]
        if first_mode == "tail":
            return tails[src][0, c, s]
        if first_mode == "head":
            return dkl_new(src, -(fl - 1) + s, heads[src], s)[c]
        # replicate: pad with the first new frame
        return dkl_new(src, 0, raws[src], 0)[c]

    # FIR accumulation: out channel 2*c + src, input channel c (c<3) / 0.
    for src in (0, 1):
        for c_out in range(4):
            c_in = 0 if c_out == 3 else c_out
            for fo in range(blk):
                acc = None
                for t in range(fl):
                    term = plane(src, c_in, fo + t) * float(filt[c_out, t])
                    acc = term if acc is None else acc + term
                out_ref[0, 2 * c_out + src, fo] = acc

    # Next DKL tail: the last fl-1 of the fl-1+blk buffer slots.
    for src, tref in ((0, tail_t_out), (1, tail_r_out)):
        for s in range(fl - 1):
            for c in range(3):
                tref[0, c, s] = plane(src, c, blk + s)


def make_ingest_fn(dm, src_dtype, shape, filt, fl, first_mode,
                   interpret=None):
    """Build fn(...) -> (Rfull, tail_t, tail_r) for raw blocks of ``shape``
    (1, blk, 3, H, W).

    first_mode: "tail" (steady state: fn(tail_t, tail_r, raw_t, raw_r)),
    "replicate" (first block, replicate padding: fn(raw_t, raw_r)) or
    "head" (first block, symmetric padding: fn(head_t, head_r, raw_t, raw_r)
    with raw (1, fl-1, 3, H, W) heads).
    """
    _, blk, _, H, W = shape
    disp = _display_params(dm)
    M = _rgb2dkl(dm)
    filt = np.asarray(filt, np.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tiles = pick_tiles(src_dtype, blk, fl, H, W)
    if tiles is None:
        raise ValueError(
            f"ingest kernel does not fit vmem for blk={blk}, fl={fl}, "
            f"W={W} — caller must gate on pick_tiles()"
        )
    th, tw = tiles
    grid = (-(-H // th), -(-W // tw))

    def raw_spec():
        return pl.BlockSpec((1, blk, 3, th, tw), lambda i, j: (0, 0, 0, i, j),
                            memory_space=pltpu.VMEM)

    def head_spec():
        return pl.BlockSpec((1, fl - 1, 3, th, tw),
                            lambda i, j: (0, 0, 0, i, j),
                            memory_space=pltpu.VMEM)

    def tail_spec():
        return pl.BlockSpec((1, 3, fl - 1, th, tw),
                            lambda i, j: (0, 0, 0, i, j),
                            memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec((1, 8, blk, th, tw), lambda i, j: (0, 0, 0, i, j),
                            memory_space=pltpu.VMEM)

    if first_mode == "replicate":
        in_specs = [raw_spec(), raw_spec()]
    elif first_mode == "head":
        in_specs = [head_spec(), head_spec(), raw_spec(), raw_spec()]
    else:
        in_specs = [tail_spec(), tail_spec(), raw_spec(), raw_spec()]

    kern = functools.partial(
        _ingest_kernel, fl=fl, blk=blk,
        src_dtype=np.dtype(src_dtype), disp=disp, M=M, filt=filt,
        first_mode=first_mode,
    )

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec(), tail_spec(), tail_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((1, 8, blk, H, W), jnp.float32),
            jax.ShapeDtypeStruct((1, 3, fl - 1, H, W), jnp.float32),
            jax.ShapeDtypeStruct((1, 3, fl - 1, H, W), jnp.float32),
        ),
        interpret=interpret,
    )

    def fn(*args):
        return call(*args)

    return fn
