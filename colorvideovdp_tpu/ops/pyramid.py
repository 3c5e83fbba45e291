"""Decimated Laplacian / Weber-contrast pyramids for TPU.

Reimplements the reference pyramid (reference: pycvvdp/lpyr_dec.py) as pure
jnp functions with static shapes. Lowering choices are measurement-driven
(see memory/STATUS.md): the stride-2 reduce maps to XLA's conv emitter at
HIGHEST precision (beats manual lane-strided slicing ~5x), while expand and
all boundary corrections are shifted multiply-adds along each native axis
(no transposes; lhs-dilated convs lower poorly).

Parity notes (all verified against the reference):

* ``reduce`` uses symmetric (edge-inclusive) boundary handling implemented in
  the reference as zero-padded conv + explicit first/last row/col corrections
  (lpyr_dec.py:186-211). Crucially, the *horizontal* pass selects its
  last-column correction based on the ROW parity (``x.shape[-2] % 2``,
  lpyr_dec.py:206) — a reference quirk we replicate exactly.
* ``expand`` zero-interleaves with a custom 2-sample border pad
  (lpyr_dec.py:129-145) before a valid conv with the doubled kernel.
* Interior Laplacian bands are stored at half gain and doubled on read
  (``get_band``/``set_band``, lpyr_dec.py:60-74).
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np
from jax import lax

KERNEL_A = 0.4
# [0.25 - a/2, 0.25, a, 0.25, 0.25 - a/2]
K5 = np.array([0.25 - KERNEL_A / 2, 0.25, KERNEL_A, 0.25, 0.25 - KERNEL_A / 2],
              dtype=np.float32)


def ceildiv(a: int, b: int) -> int:
    return -(-a // b)


def pyramid_band_freqs(W: int, H: int, ppd: float, min_freq: float = 0.2):
    """Per-band peak spatial frequencies (cpd) and level count (reference:
    lpyr_dec.py:25-42). Returns (band_freqs, height) where the pyramid has
    ``height`` Laplacian levels plus one baseband => height+1 bands."""
    max_levels = int(np.floor(np.log2(min(H, W)))) - 1
    bands = (
        np.concatenate([[1.0], np.power(2.0, -np.arange(0.0, 14.0)) * 0.3228], 0)
        * ppd
        / 2.0
    )
    invalid = np.nonzero(bands <= min_freq)[0]
    max_band = max_levels if invalid.size == 0 else invalid[0]
    height = int(np.clip(max_band + 1, 0, max_levels))
    band_freqs = (
        np.array([1.0] + [0.3228 * 2.0 ** (-f) for f in range(height)]) * ppd / 2.0
    )
    return band_freqs, height


def _conv_1axis(x, K: np.ndarray, axis: int, stride: int = 1,
                lhs_dilation: int = 1, pad=(2, 2)):
    """5-tap conv along one of the last two axes of a (..., H, W) array via
    ``lax.conv_general_dilated`` (XLA's strided-conv lowering beats manual
    lane-strided slicing on TPU by ~5x). fp32-exact (HIGHEST precision)."""
    lead = x.shape[:-2]
    H, W = x.shape[-2], x.shape[-1]
    img = x.reshape(-1, 1, H, W)
    k = jnp.asarray(K, x.dtype)
    if axis == -2:
        kern = k.reshape(1, 1, K.shape[0], 1)
        strides = (stride, 1)
        padding = [tuple(pad), (0, 0)]
        dil = (lhs_dilation, 1)
    else:
        kern = k.reshape(1, 1, 1, K.shape[0])
        strides = (1, stride)
        padding = [(0, 0), tuple(pad)]
        dil = (1, lhs_dilation)
    y = lax.conv_general_dilated(
        img, kern, strides, padding, lhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    return y.reshape(lead + y.shape[-2:])


def _reduce_1d(x, axis: int, odd_correction: bool):
    """One separable reduce pass along ``axis`` (-1 or -2): stride-2 5-tap
    zero-padded conv plus the reference's explicit boundary corrections
    (reference: lpyr_dec.py:186-211).

    ``odd_correction`` selects which last-sample correction branch is applied —
    the caller passes row-parity for BOTH passes to replicate the reference.
    """
    y = _conv_1axis(x, K5, axis, stride=2)
    ax = axis % x.ndim
    n = x.shape[ax]
    n_out = y.shape[ax]

    def sx(a, s, e):
        return lax.slice_in_dim(a, s, e, axis=ax)

    first = sx(y, 0, 1) + sx(x, 0, 1) * K5[1] + sx(x, 1, 2) * K5[0]
    if odd_correction:
        last = (sx(y, n_out - 1, n_out) + sx(x, n - 1, n) * K5[3]
                + sx(x, n - 2, n - 1) * K5[4])
    else:
        last = sx(y, n_out - 1, n_out) + sx(x, n - 1, n) * K5[4]
    if n_out > 2:
        return jnp.concatenate([first, sx(y, 1, n_out - 1), last], axis=ax)
    return jnp.concatenate([first, last], axis=ax)


# When True (sharded traces), skip the Pallas reduce kernel — GSPMD cannot
# partition custom calls; the XLA path shards with halo exchanges instead,
# unless SHARD_CTX routes eligible levels through the halo'd shard_map'd
# Pallas reduce below.
FORCE_XLA = False
# When True, take the Pallas kernel paths even off-TPU (interpret mode) —
# lets the CPU test suite cover the kernels' custom VJPs.
FORCE_KERNEL = False
# Set by parallel.sharding during sharded traces: (mesh, batch_axis_name,
# force_interpret). When set, eligible reduce levels run the Pallas slab
# kernel per shard inside shard_map — one explicit 8-row ppermute halo
# exchange per level instead of losing the kernel to the GSPMD-can't-
# partition-custom-calls fallback (VERDICT r4 item 4: the sharded path
# measured 1.96x the fused single-chip step).
SHARD_CTX = None


def _xla_reduce(x):
    rows_odd = (x.shape[-2] % 2) == 1
    y = _reduce_1d(x, -2, odd_correction=rows_odd)
    # NOTE: the horizontal pass keys its correction on the ROW count parity —
    # reference quirk (lpyr_dec.py:206 tests shape[-2]).
    return _reduce_1d(y, -1, odd_correction=rows_odd)


def _reduce_tpu_diff():
    """Pallas reduce wrapped in a custom VJP: the reduce is linear, so the
    backward pass is the transpose of the XLA implementation (which jax
    derives automatically). Without this, any gradient through the pyramid
    (the loss API) hits the Pallas call's missing JVP rule on TPU."""
    import jax

    @jax.custom_vjp
    def f(x):
        from .kernels.pyramid_reduce import reduce_tpu

        return reduce_tpu(x)

    def fwd(x):
        return f(x), x.shape

    def bwd(shape, g):
        _, vjp = jax.vjp(_xla_reduce, jnp.zeros(shape, g.dtype))
        return (vjp(g)[0],)

    f.defvjp(fwd, bwd)
    return f


_REDUCE_DIFF = None


def _sharded_reduce(x):
    """Halo'd per-shard Pallas reduce for sharded traces, or None when the
    shape is ineligible (caller falls back to the GSPMD XLA path).

    Each shard ppermutes 8 rows of real context to its neighbours (zeros at
    the global edges — the reference's conv is zero-padded), runs the
    corrections-off slab kernel on its (H_loc + 16)-row buffer, and adds
    the vertical edge corrections (horizontally reduced, since they apply
    BEFORE the horizontal pass of a separable reduce) at the global edges
    only, selected by axis_index."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .kernels.pyramid_reduce import can_reduce_slab, reduce_slab_tpu

    mesh, bax, _force = SHARD_CTX
    n_sp = int(dict(mesh.shape)["space"])
    nd = x.ndim
    H, W = x.shape[-2:]
    if nd < 3 or H % n_sp:
        return None
    H_loc = H // n_sp
    if not can_reduce_slab(H_loc, W):
        return None
    n_b = int(dict(mesh.shape).get("batch", 1)) if bax else 1
    b0 = bax if (bax and x.shape[0] % max(n_b, 1) == 0) else None
    spec = P(*((b0,) + (None,) * (nd - 3) + ("space", None)))
    rows_odd = (H % 2) == 1  # always even here (H = n_sp * even H_loc)
    k0, k1, k3, k4 = (float(K5[t]) for t in (0, 1, 3, 4))

    def _hrow(row):
        # One-row horizontal reduce (the vertical edge fixes apply before
        # the separable horizontal pass; both are linear, so the fix added
        # after must itself be horizontally reduced).
        return _reduce_1d(row[..., None, :], -1,
                          odd_correction=rows_odd)[..., 0, :]

    def per_shard(x_loc):
        lead = x_loc.shape[:-2]
        top8 = lax.slice_in_dim(x_loc, 0, 8, axis=-2)
        bot8 = lax.slice_in_dim(x_loc, H_loc - 8, H_loc, axis=-2)
        idx = lax.axis_index("space")
        if n_sp > 1:
            fwd = [(k, k + 1) for k in range(n_sp - 1)]
            bwd = [(k + 1, k) for k in range(n_sp - 1)]
            above = lax.ppermute(bot8, "space", fwd)
            below = lax.ppermute(top8, "space", bwd)
            above = jnp.where(idx == 0, jnp.zeros_like(above), above)
            below = jnp.where(idx == n_sp - 1, jnp.zeros_like(below),
                              below)
        else:
            above = jnp.zeros_like(top8)
            below = jnp.zeros_like(bot8)
        xh = jnp.concatenate([above, x_loc, below], axis=-2)
        Pn = int(np.prod(lead)) if lead else 1
        y = reduce_slab_tpu(xh.reshape(Pn, H_loc + 16, W), H_loc, W,
                            rows_odd)
        y = y.reshape(lead + y.shape[-2:])
        fix0 = _hrow(x_loc[..., 0, :] * k1 + x_loc[..., 1, :] * k0)
        if rows_odd:
            fixL = _hrow(x_loc[..., -1, :] * k3 + x_loc[..., -2, :] * k4)
        else:
            fixL = _hrow(x_loc[..., -1, :] * k4)
        zero = jnp.zeros_like(fix0)
        y = y.at[..., 0, :].add(jnp.where(idx == 0, fix0, zero))
        y = y.at[..., -1, :].add(jnp.where(idx == n_sp - 1, fixL, zero))
        return y

    f = shard_map(per_shard, mesh=mesh, in_specs=(spec,), out_specs=spec,
                  check_vma=False)

    @jax.custom_vjp
    def g(x):
        return f(x)

    def g_fwd(x):
        return f(x), x.shape

    def g_bwd(shape, gr):
        _, vjp = jax.vjp(_xla_reduce, jnp.zeros(shape, gr.dtype))
        return (vjp(gr)[0],)

    g.defvjp(g_fwd, g_bwd)
    return g(x)


def gausspyr_reduce(x):
    """Gaussian pyramid reduce: stride-2 separable 5-tap filter (reference:
    lpyr_dec.py:186-211)."""
    import jax

    H = x.shape[-2]
    if (not FORCE_XLA
            and (jax.default_backend() == "tpu" or FORCE_KERNEL)):
        from .kernels.pyramid_reduce import can_reduce_tpu

        if can_reduce_tpu(x.shape):
            global _REDUCE_DIFF
            if _REDUCE_DIFF is None:
                _REDUCE_DIFF = _reduce_tpu_diff()
            lead = x.shape[:-2]
            P = int(np.prod(lead)) if lead else 1
            y = _REDUCE_DIFF(x.reshape(P, H, x.shape[-1]))
            return y.reshape(lead + y.shape[-2:])
    if (FORCE_XLA and SHARD_CTX is not None
            and (jax.default_backend() == "tpu" or SHARD_CTX[2])):
        y = _sharded_reduce(x)
        if y is not None:
            return y
    return _xla_reduce(x)


_RIFFLE_M = {}


def _riffle_mxu(ev, od, ax):
    """Lane-axis phase interleave (out[2j]=ev[j], out[2j+1]=od[j]) as two
    0/1-matrix matmuls on the MXU: reshape the lane axis into (n/B, B)
    blocks and compute ``ev_blk @ Me + od_blk @ Mo`` with Me/Mo (B, 2B)
    scatter matrices, then collapse (n/B, 2B) -> 2n (a trivial row-major
    reshape). The riffle is block-local, so any B | n works.

    Bit-exact: at HIGHEST precision f32 operands are decomposed into
    disjoint-mantissa bf16 terms whose products with the exact constants
    1.0/0.0 and whose non-overlapping accumulation reproduce x exactly;
    on CPU/GPU the plain f32 FMA chain (one x*1 plus zeros) is exact too.
    Asserted bit-equal to stack+reshape in tests/test_pyramid.py.

    Rationale was: the stack+reshape interleave lowers to a kLoop fusion
    with an exotic trailing-minor layout plus relayout copies (~2.5
    ms/frame of copy.* + pad/interleave fusions at 4K, tools/profile_ops.py
    r5); the matmul form rides the otherwise-idle MXU and writes a standard
    layout. MEASURED SLOWER in context (v5e 4K step A/B, r5): 52.15 fps
    riffle-on vs 57.87 off — exactness needs HIGHEST precision, whose ~6
    bf16 MXU passes outweigh the relayout copies removed. Kept opt-in
    (CVVDP_MXU_INTERLEAVE=1) for bisection; default off.
    Returns None when no usable block size exists (caller falls back)."""
    n = ev.shape[ax]
    if ax != ev.ndim - 1 or od.shape[ax] != n:
        return None
    B = 0
    for cand in (128, 64, 32):
        if n % cand == 0:
            B = cand
            break
    if B == 0:
        return None
    if B not in _RIFFLE_M:
        Me = np.zeros((B, 2 * B), np.float32)
        Mo = np.zeros((B, 2 * B), np.float32)
        Me[np.arange(B), 2 * np.arange(B)] = 1.0
        Mo[np.arange(B), 2 * np.arange(B) + 1] = 1.0
        _RIFFLE_M[B] = (Me, Mo)
    Me, Mo = _RIFFLE_M[B]
    lead = ev.shape[:-1]
    evb = ev.reshape(lead + (n // B, B))
    odb = od.reshape(lead + (n // B, B))
    out = (jnp.matmul(evb, jnp.asarray(Me, ev.dtype),
                      precision=lax.Precision.HIGHEST)
           + jnp.matmul(odb, jnp.asarray(Mo, ev.dtype),
                        precision=lax.Precision.HIGHEST))
    return out.reshape(lead + (2 * n,))


def _expand_1d(x, axis: int, exp_size: int):
    """Zero-interleaved upsample + 5-tap valid conv, evaluated in polyphase
    form: even outputs y[2i] = 2(K0 xp[i] + K2 xp[i+1] + K4 xp[i+2]), odd
    y[2i+1] = 2(K1 xp[i+1] + K3 xp[i+2]) over the 1-sample edge-padded input
    (exactly the border pattern of lpyr_dec.py:129-145). Bit-exact regrouping
    of the interleaved sum (the dropped terms are exact +0.0 adds) at ~1/3
    the HBM traffic: the 5-tap pass over the double-size interleaved signal
    never materialises."""
    nd = x.ndim
    ax = axis % nd
    n = x.shape[ax]

    def sl(a, s, e):
        return lax.slice_in_dim(a, s, e, axis=ax)

    xp = jnp.concatenate([sl(x, 0, 1), x, sl(x, n - 1, n)], axis=ax)
    n_even = (exp_size + 1) // 2
    n_odd = exp_size // 2
    ev = ((2.0 * float(K5[0])) * sl(xp, 0, n_even)
          + (2.0 * float(K5[2])) * sl(xp, 1, 1 + n_even)
          + (2.0 * float(K5[4])) * sl(xp, 2, 2 + n_even))
    od = ((2.0 * float(K5[1])) * sl(xp, 1, 1 + n_odd)
          + (2.0 * float(K5[3])) * sl(xp, 2, 2 + n_odd))
    # Phase interleave: stack(axis+1)+reshape. On TPU this lowers to a
    # kLoop fusion writing an exotic layout (trailing interleave dim
    # minor) plus relayout copies (~10 ms/step for band 0 at 4K,
    # docs/step_profile.md) — but the round-3 "fix" (lax.pad with INTERIOR
    # padding + add) measured 2x SLOWER in context on hardware
    # (240.8 vs 121.6 ms/step at 4K, tools/step_bench.py, round 4):
    # interior-pad lowers to even worse code than the relayout copies it
    # removed. Keep the measured-faster form; the interior-pad variant
    # stays behind CVVDP_INTERIOR_PAD_INTERLEAVE=1 for re-testing on
    # future compiler versions. Both forms are bit-exact equal.
    if os.environ.get("CVVDP_INTERIOR_PAD_INTERLEAVE") == "1":
        zero = jnp.zeros((), x.dtype)
        cfg_e = [(0, 0, 0)] * x.ndim
        cfg_o = [(0, 0, 0)] * x.ndim
        if n_even > n_odd:  # odd output: ev at 0..2k.., od at 1..2k+1
            cfg_e[ax] = (0, 0, 1)
            cfg_o[ax] = (1, 1, 1)
        else:
            cfg_e[ax] = (0, 1, 1)
            cfg_o[ax] = (1, 0, 1)
        return lax.pad(ev, zero, cfg_e) + lax.pad(od, zero, cfg_o)
    ev_t = (lax.slice_in_dim(ev, 0, n_odd, axis=ax)
            if n_even > n_odd else ev)
    out = None
    if (ax == nd - 1 and n_odd >= 256
            and os.environ.get("CVVDP_MXU_INTERLEAVE", "0") == "1"):
        out = _riffle_mxu(ev_t, od, ax)
    if out is None:
        st = jnp.stack([ev_t, od], axis=ax + 1)
        sh = list(x.shape)
        sh[ax] = 2 * n_odd
        out = st.reshape(sh)
    if n_even > n_odd:
        out = jnp.concatenate(
            [out, lax.slice_in_dim(ev, n_even - 1, n_even, axis=ax)],
            axis=ax)
    return out


def gausspyr_expand(x, sz=None):
    """Gaussian pyramid expand to size ``sz`` = (H, W) (reference:
    lpyr_dec.py:223-239)."""
    if sz is None:
        sz = (x.shape[-2] * 2, x.shape[-1] * 2)
    y = _expand_1d(x, -2, sz[0])
    return _expand_1d(y, -1, sz[1])


class LaplacianPyramid:
    """Static-shape decimated Laplacian pyramid.

    Bands are a Python list of arrays (JAX has no ragged tensors); all level
    shapes are compile-time constants, so the whole decomposition traces into
    one XLA computation.
    """

    # Optional callable(level_array) -> level_array applied after each
    # reduce. Sharded traces install a with_sharding_constraint hook here
    # that replicates levels too small to row-shard — GSPMD otherwise emits
    # "involuntary full rematerialization" resharding KB-sized tensors.
    reshard_hint = None

    def __init__(self, W: int, H: int, ppd: float):
        self.W = W
        self.H = H
        self.ppd = ppd
        self.min_freq = 0.2
        self.band_freqs, self.height = pyramid_band_freqs(W, H, ppd, self.min_freq)
        # Correct per-level shapes (the reference's pyr_shape loop has a
        # latent bug and is unused; we store the real shapes).
        self.pyr_shape = []
        cH, cW = H, W
        for _ in range(self.height + 1):
            self.pyr_shape.append((cH, cW))
            cH, cW = ceildiv(cH, 2), ceildiv(cW, 2)

    def get_freqs(self):
        return self.band_freqs.copy()

    def get_band_count(self) -> int:
        return self.height + 1

    @staticmethod
    def get_band(bands, band):
        mul = 1.0 if band == 0 or band == len(bands) - 1 else 2.0
        return bands[band] * mul

    @staticmethod
    def set_band(bands, band, data):
        mul = 1.0 if band == 0 or band == len(bands) - 1 else 2.0
        bands[band] = data / mul

    def gaussian_pyramid(self, image, levels: int):
        res = [image]
        for _ in range(1, levels):
            nxt = gausspyr_reduce(res[-1])
            if self.reshard_hint is not None:
                nxt = self.reshard_hint(nxt)
            res.append(nxt)
        return res

    def decompose(self, image):
        """Laplacian decomposition: G_i - expand(G_{i+1}), plus baseband."""
        gpyr = self.gaussian_pyramid(image, self.height + 1)
        lpyr = []
        for i in range(len(gpyr) - 1):
            ex = gausspyr_expand(gpyr[i + 1], gpyr[i].shape[-2:])
            lpyr.append(gpyr[i] - ex)
        lpyr.append(gpyr[-1])
        return lpyr, gpyr

    def reconstruct(self, bands):
        img = bands[-1]
        for i in reversed(range(len(bands) - 1)):
            img = gausspyr_expand(img, bands[i].shape[-2:]) + bands[i]
        return img


class WeberContrastPyramid(LaplacianPyramid):
    """Fused pyramid + Weber contrast (reference: lpyr_dec.py:358-414).

    ``decompose`` expects frames with interleaved test/reference channels at
    axis -4 (test even, reference odd) and returns
    ``(contrast_bands, log10_L_bkg_bands)``. The log-luminance bands carry a
    single channel — the *reference* adaptation field, which is the only one
    the metric consumes (reference: cvvdp_metric.py:709 indexes [...,1:2]) —
    so the test-channel log10 is never computed.
    """

    def __init__(self, W, H, ppd, contrast: str = "weber_g1"):
        super().__init__(W, H, ppd)
        self.contrast = contrast

    def decompose(self, image, raw_pairs=False):
        """``raw_pairs=True`` (fused-scoring path): interior levels return
        ``(G_i, G_{i+1})`` tuples with ``None`` log-luminance — the expand,
        Weber contrast coding and CSF then happen inside the fused Pallas
        kernels (ops/kernels/band_fused.py, or masking_fused._kernel_a_raw
        after an explicit XLA expand), skipping the con/logL HBM
        materialisations. Baseband is unchanged."""
        gpyr = self.gaussian_pyramid(image, self.height + 1)
        height = len(gpyr)
        lpyr = []
        L_bkg_pyr = []
        for i in range(height):
            is_baseband = i == height - 1
            if raw_pairs and not is_baseband:
                lpyr.append((gpyr[i], gpyr[i + 1]))
                L_bkg_pyr.append(None)
                continue
            if is_baseband:
                layer = gpyr[i]
                if self.contrast.endswith("ref"):
                    L_bkg = jnp.clip(gpyr[i][..., 1:2, :, :, :], 0.01, None)
                else:
                    # Sustained channels adapt to the image mean — otherwise
                    # the baseband would divide by itself.
                    L_bkg = jnp.mean(
                        jnp.clip(gpyr[i][..., 0:2, :, :, :], 0.01, None),
                        axis=(-1, -2),
                        keepdims=True,
                    )
            else:
                glayer_ex = gausspyr_expand(gpyr[i + 1], gpyr[i].shape[-2:])
                layer = gpyr[i] - glayer_ex
                # Channel order: T-sust-Y, R-sust-Y, T-rg, R-rg, T-yv, R-yv,
                # T-trans-Y, R-trans-Y.
                if self.contrast == "weber_g1_ref":
                    L_bkg = jnp.clip(glayer_ex[..., 1:2, :, :, :], 0.01, None)
                elif self.contrast == "weber_g1":
                    L_bkg = jnp.clip(glayer_ex[..., 0:2, :, :, :], 0.01, None)
                elif self.contrast == "weber_g0_ref":
                    L_bkg = jnp.clip(gpyr[i][..., 1:2, :, :, :], 0.01, None)
                else:
                    raise RuntimeError(f"Contrast {self.contrast} not supported")

            if L_bkg.shape[-4] == 2:
                # Separate adaptation for test (even) and reference (odd)
                # channels.
                n_ch = layer.shape[-4]
                t = jnp.clip(layer[..., 0::2, :, :, :] / L_bkg[..., 0:1, :, :, :],
                             None, 1000.0)
                r = jnp.clip(layer[..., 1::2, :, :, :] / L_bkg[..., 1:2, :, :, :],
                             None, 1000.0)
                contrast = jnp.stack([t, r], axis=-4).reshape(layer.shape)
            else:
                contrast = jnp.clip(layer / L_bkg, None, 1000.0)

            lpyr.append(contrast)
            # Only the reference channel's log-luminance is consumed.
            L_ref = L_bkg[..., 1:2, :, :, :] if L_bkg.shape[-4] == 2 else L_bkg
            L_bkg_pyr.append(jnp.log10(L_ref))
        return lpyr, L_bkg_pyr


class LogContrastPyramid(LaplacianPyramid):
    """Log-luminance contrast variant (reference: lpyr_dec.py:418-458)."""

    def __init__(self, W, H, ppd, contrast: str = "log"):
        super().__init__(W, H, ppd)
        self.contrast = contrast
        lms_d65 = [0.7347, 0.3163, 0.0208]
        self.a = 0.5
        self.b = (
            math.log10(lms_d65[0])
            - math.log10(lms_d65[1])
            + math.log10(lms_d65[0] + lms_d65[1])
        )

    def decompose(self, image):
        gpyr = self.gaussian_pyramid(image, self.height + 1)
        height = len(gpyr)
        lpyr = []
        L_bkg_pyr = []
        for i in range(height):
            if i == height - 1:
                contrast = gpyr[i]
                L_bkg = self.a * (gpyr[i][..., 1:2, :, :, :] - self.b)
            else:
                glayer_ex = gausspyr_expand(gpyr[i + 1], gpyr[i].shape[-2:])
                contrast = gpyr[i] - glayer_ex
                L_bkg = self.a * (glayer_ex[..., 1:2, :, :, :] - self.b)
            lpyr.append(contrast)
            L_bkg_pyr.append(L_bkg)
        return lpyr, L_bkg_pyr
