"""ColorVideoVDP ML heads: feature trunk + learned regressors
(reference: pycvvdp/cvvdp_ml_metric.py).

The trunk reuses the fused cvvdp pipeline but pools per-band patch
statistics (mean/var of S|T|, S|R|, D over ~1-visual-degree tiles) instead
of p-norms; the heads are an MLP (+saliency MLP) or a ViT-style transformer
regressor.

Weights: the reference pulls torch checkpoints from the HuggingFace hub at
runtime. This environment has no network egress, so weights are loaded from
an ``cvvdp_ml.npz`` produced by ``tools/convert_ml_ckpt.py`` (searched via
the standard config path order); ``random_init=True`` runs with random
weights for smoke testing.
"""

from __future__ import annotations

import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.feature_pooling import feature_pooling
from ..utils.config import config_files
from .base import register_metric, vq_exception
from .cvvdp import cvvdp

# ---------------------------------------------------------------------------
# Torch-compatible NN blocks as parameter pytrees


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


def mlp_init(rng, in_ch, hidden, out_list=None):
    """torchvision-MLP-compatible stack: Linear+ReLU per hidden layer, final
    Linear."""
    dims = [in_ch] + hidden
    params = []
    for i in range(len(dims) - 1):
        k1, rng = jax.random.split(rng)
        fan_in = dims[i]
        bound = 1.0 / math.sqrt(fan_in)
        params.append({
            "weight": jax.random.uniform(k1, (dims[i + 1], dims[i]),
                                         minval=-bound, maxval=bound),
            "bias": jnp.zeros((dims[i + 1],)),
        })
    return params


def mlp_apply(params, x):
    for i, p in enumerate(params):
        x = _linear(p, x)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def _layer_norm(p, x, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _mha(p, x, heads):
    """torch nn.MultiheadAttention (batch_first) self-attention, eval mode."""
    B, N, D = x.shape
    qkv = x @ p["in_proj_weight"].T + p["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = D // heads

    def split(a):
        return a.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    att = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", q, k, precision="highest")
        / math.sqrt(dh),
        axis=-1,
    )
    out = jnp.einsum("bhnm,bhmd->bhnd", att, v, precision="highest")
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out @ p["out_proj"]["weight"].T + p["out_proj"]["bias"]


def _encoder_layer(p, x, heads):
    """nn.TransformerEncoderLayer with norm_first=True, GELU."""
    x = x + _mha(p["self_attn"], _layer_norm(p["norm1"], x), heads)
    h = _layer_norm(p["norm2"], x)
    h = _linear(p["linear1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(p["linear2"], h)
    return x + h


def transformer_init(rng, in_channels=24, dim=256, depth=4):
    def lin(rng, din, dout):
        k, rng = jax.random.split(rng)
        bound = 1.0 / math.sqrt(din)
        return {
            "weight": jax.random.uniform(k, (dout, din), minval=-bound,
                                         maxval=bound),
            "bias": jnp.zeros((dout,)),
        }, rng

    params = {}
    params["patch_embed"], rng = lin(rng, in_channels, dim)
    k, rng = jax.random.split(rng)
    params["cls_token"] = jax.random.normal(k, (1, 1, dim))
    layers = []
    for _ in range(depth):
        lp = {}
        k, rng = jax.random.split(rng)
        bound = 1.0 / math.sqrt(dim)
        lp["self_attn"] = {
            "in_proj_weight": jax.random.uniform(
                k, (3 * dim, dim), minval=-bound, maxval=bound
            ),
            "in_proj_bias": jnp.zeros((3 * dim,)),
        }
        lp["self_attn"]["out_proj"], rng = lin(rng, dim, dim)
        lp["linear1"], rng = lin(rng, dim, dim * 4)
        lp["linear2"], rng = lin(rng, dim * 4, dim)
        lp["norm1"] = {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
        lp["norm2"] = {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
        layers.append(lp)
    params["layers"] = layers
    params["reg_norm"] = {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    params["reg_linear"], rng = lin(rng, dim, 1)
    return params


def transformer_apply(params, x, heads=8):
    """x: (B, D_frames, H, W, C) -> (B,) regression (reference:
    cvvdp_ml_metric.py:589-601)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B * D, H * W, C)
    x = x @ params["patch_embed"]["weight"].T + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"],
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    for lp in params["layers"]:
        x = _encoder_layer(lp, x, heads)
    cls_feat = x[:, 0]
    y = _layer_norm(params["reg_norm"], cls_feat)
    y = jax.nn.relu(_linear(params["reg_linear"], y))
    return y.reshape(B, D).mean(axis=1)


# ---------------------------------------------------------------------------
# Checkpoint loading (converted npz)


def _load_npz_weights(config_paths, net_names):
    """Find cvvdp_ml.npz (converted torch checkpoint) and slice per net."""
    npz_file = config_files.find("cvvdp_ml.npz", config_paths)
    data = np.load(npz_file)
    out = {}
    for net in net_names:
        prefix = net + "."
        out[net] = {
            k[len(prefix):]: jnp.asarray(v)
            for k, v in data.items() if k.startswith(prefix)
        }
    return out


def _missing(net, key, flat):
    return vq_exception(
        f"cvvdp_ml checkpoint: net '{net}' is missing key '{key}'. The "
        "converted cvvdp_ml.npz does not match the reference architecture "
        "(reference builds these nets in cvvdp_ml_metric.py:399-644 and "
        "loads them by prefix in cvvdp_ml_metric.py:156-172). Keys present "
        f"under this net: {sorted(flat)[:10]}{'...' if len(flat) > 10 else ''}"
    )


def _check_consumed(net, flat, used):
    extra = sorted(set(flat) - used)
    if extra:
        raise vq_exception(
            f"cvvdp_ml checkpoint: net '{net}' has {len(extra)} unexpected "
            f"key(s) the loader would silently drop: {extra[:10]}"
            f"{'...' if len(extra) > 10 else ''}. This usually means the "
            "checkpoint was trained with a different architecture than the "
            "published one (cvvdp_ml_metric.py:399-644)."
        )


def _check_same_shapes(net, loaded, init):
    """The randomly-initialised params encode the expected architecture;
    a converted checkpoint must match it leaf-for-leaf."""
    def leaves(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(k): tuple(v.shape) for k, v in flat}

    got, want = leaves(loaded), leaves(init)
    bad = [f"{k}: ckpt {got.get(k)} vs expected {want.get(k)}"
           for k in sorted(set(got) | set(want)) if got.get(k) != want.get(k)]
    if bad:
        raise vq_exception(
            f"cvvdp_ml checkpoint: net '{net}' parameter shapes do not match "
            f"the published architecture: {bad[:8]}"
            f"{'...' if len(bad) > 8 else ''}"
        )


def _mlp_from_flat(flat, net="mlp"):
    """Flat torch-style keys ('0.weight', '3.weight', ...) -> layer list.

    Strict: every Linear index must carry exactly weight+bias, and no key
    under the net prefix may go unconsumed (silent-drop protection for the
    real published checkpoints, which cannot be verified here)."""
    used = set()
    idx = set()
    for k in flat:
        parts = k.split(".")
        head = parts[0]
        if (len(parts) < 2 or not head.isdigit()
                or parts[1] not in ("weight", "bias")):
            raise vq_exception(
                f"cvvdp_ml checkpoint: net '{net}' has non-MLP key '{k}' "
                "(expected '<layer_idx>.weight'/'<layer_idx>.bias' from a "
                "torchvision.ops.MLP state_dict, cvvdp_ml_metric.py:412,476)"
            )
        idx.add(int(head))
    out = []
    for i in sorted(idx):
        for part in ("weight", "bias"):
            if f"{i}.{part}" not in flat:
                raise _missing(net, f"{i}.{part}", flat)
            used.add(f"{i}.{part}")
        out.append({"weight": flat[f"{i}.weight"], "bias": flat[f"{i}.bias"]})
    if not out:
        raise _missing(net, "0.weight", flat)
    _check_consumed(net, flat, used)
    return out


def _transformer_from_flat(flat, depth=4, net="transformer_net"):
    used = set()

    def take(key):
        if key not in flat:
            raise _missing(net, key, flat)
        used.add(key)
        return flat[key]

    p = {
        "patch_embed": {"weight": take("patch_embed.1.weight"),
                        "bias": take("patch_embed.1.bias")},
        "cls_token": take("cls_token"),
        "reg_norm": {"weight": take("reg_head.0.weight"),
                     "bias": take("reg_head.0.bias")},
        "reg_linear": {"weight": take("reg_head.1.weight"),
                       "bias": take("reg_head.1.bias")},
        "layers": [],
    }
    for i in range(depth):
        pre = f"transformer.layers.{i}."
        p["layers"].append({
            "self_attn": {
                "in_proj_weight": take(pre + "self_attn.in_proj_weight"),
                "in_proj_bias": take(pre + "self_attn.in_proj_bias"),
                "out_proj": {
                    "weight": take(pre + "self_attn.out_proj.weight"),
                    "bias": take(pre + "self_attn.out_proj.bias"),
                },
            },
            "linear1": {"weight": take(pre + "linear1.weight"),
                        "bias": take(pre + "linear1.bias")},
            "linear2": {"weight": take(pre + "linear2.weight"),
                        "bias": take(pre + "linear2.bias")},
            "norm1": {"weight": take(pre + "norm1.weight"),
                      "bias": take(pre + "norm1.bias")},
            "norm2": {"weight": take(pre + "norm2.weight"),
                      "bias": take(pre + "norm2.bias")},
        })
    _check_consumed(net, flat, used)
    return p


# ---------------------------------------------------------------------------
# Metric classes


class cvvdp_ml_base(cvvdp):
    """Shared trunk: per-band patch statistics instead of pooled norms
    (reference: cvvdp_ml_metric.py:109-392)."""

    def __init__(self, random_init=False, disabled_features=None, **kwargs):
        self.random_init = random_init
        self.disabled_features = disabled_features
        kwargs["config_paths"] = (
            list(kwargs.get("config_paths") or []) + self._extra_config_paths()
        )
        super().__init__(**kwargs)
        if self.do_heatmap:
            raise vq_exception(
                "Currently cvvdp-ml metrics do not produce heatmaps"
            )

    def get_nets_to_load(self):
        raise NotImplementedError

    def _init_nets(self):
        raise NotImplementedError

    def load_config(self, config_paths=None):
        super().load_config(config_paths)
        self._init_nets()
        if not self.random_init:
            try:
                weights = _load_npz_weights(
                    (config_paths or []) + self._extra_config_paths(),
                    self.get_nets_to_load(),
                )
                self._assign_weights(weights)
            except RuntimeError as e:
                raise vq_exception(
                    "ML-head weights not found. The reference downloads "
                    "torch checkpoints from huggingface.co/gfxdisp/cvvdp_ml; "
                    "convert one with tools/convert_ml_ckpt.py and place the "
                    "resulting cvvdp_ml.npz on a config path, or pass "
                    f"random_init=True. ({e})"
                ) from e

    def _extra_config_paths(self):
        return []

    def _assign_weights(self, weights):
        raise NotImplementedError

    # Trunk: identical band loop, but emit patch statistics.
    def _process_block(self, R, temp_ch, is_image):
        all_ch = 2 + temp_ch
        lpyr = self.lpyr
        n_bands = lpyr.get_band_count()
        params = self._masking_params()
        B_bands, L_bkg_pyr = lpyr.decompose(R)
        rho_band = lpyr.get_freqs()
        rho_band[n_bands - 1] = 0.1
        sens_corr = 10.0 ** (self.sensitivity_correction / 20.0)
        feature_size = math.ceil(self.pix_per_deg)

        from ..ops import masking as mk

        features = []
        for bb in range(n_bands):
            is_baseband = bb == n_bands - 1
            B_bb = lpyr.get_band(B_bands, bb)
            T_f = B_bb[:, 0::2]
            R_f = B_bb[:, 1::2]
            logL = L_bkg_pyr[bb]
            rho = float(rho_band[bb])
            luts = [
                (rho, self.omega[0 if cc < 3 else 1], cc if cc < 3 else 0)
                for cc in range(all_ch)
            ]
            S = self.csf.sensitivity_multi_channel(
                [x[0] for x in luts], [x[1] for x in luts], logL,
                [x[2] for x in luts],
            )
            S = jnp.moveaxis(S, 0, 1)[:, :, 0] * sens_corr
            if is_baseband:
                D = jnp.abs(T_f - R_f) * S
            else:
                D = mk.apply_masking_model(T_f, R_f, S, params)
            features.append(
                feature_pooling(jnp.abs(T_f) * S, jnp.abs(R_f) * S, D,
                                feature_size)
            )
        return features, None, None

    def predict_video_source(self, vid_source):
        h, w, N_frames = vid_source.get_video_size()
        self._ensure_pyramids(w, h)
        is_image = N_frames == 1
        if not is_image:
            from ..ops.temporal import get_temporal_filters

            fps = vid_source.get_frames_per_second()
            self.F, _ = get_temporal_filters(
                fps, self.sigma_tf, self.beta_tf, self.temp_filter
            )
            self.filter_len = int(self.F[0].shape[0])
        met_colorspace = "logLMS_DKLd65" if self.contrast == "log" else "DKLd65"
        block_N_frames = (
            1 if is_image else self.estimate_block_N(h * w, N_frames)
        )

        if is_image:
            head_idx = []
        elif self.temp_padding == "replicate":
            head_idx = [0] * (self.filter_len - 1)
        else:
            head_idx = [
                self._get_symmetric_frame_index(fi, N_frames)
                for fi in range(-self.filter_len + 1, 0)
            ]

        feats = None
        tails = [None, None]
        for ff in range(0, N_frames, block_N_frames):
            cur = min(block_N_frames, N_frames - ff)
            if is_image:
                raw_t = vid_source.get_raw_block("test", 0, 1)
                raw_r = vid_source.get_raw_block("reference", 0, 1)
                fn = self._get_image_step(vid_source, met_colorspace,
                                          raw_t.shape, raw_t.dtype)
                f_block, _, _, _ = fn(self._put_flat(raw_t),
                                      self._put_flat(raw_r))
            else:
                raw_t_np = vid_source.get_raw_block("test", ff, block_N_frames)
                raw_r_np = vid_source.get_raw_block("reference", ff,
                                                    block_N_frames)
                fn = self._get_video_step(vid_source, met_colorspace,
                                          raw_t_np.shape, raw_t_np.dtype,
                                          first=(ff == 0))
                raw_t = self._put_flat(raw_t_np)
                raw_r = self._put_flat(raw_r_np)
                if ff == 0:
                    if self.temp_padding == "replicate":
                        out = fn(raw_t, raw_r)
                    else:
                        head_t = self._put_flat(vid_source.get_raw_frame_list(
                            "test", head_idx))
                        head_r = self._put_flat(vid_source.get_raw_frame_list(
                            "reference", head_idx))
                        out = fn(head_t, head_r, raw_t, raw_r)
                else:
                    out = fn(tails[0], tails[1], raw_t, raw_r)
                f_block, _, _, tails[0], tails[1], _ = out
                f_block = [f[:, :cur] for f in f_block]
            if feats is None:
                feats = [[f] for f in f_block]
            else:
                for bb, f in enumerate(f_block):
                    feats[bb].append(f)

        features = [
            b[0] if len(b) == 1 else jnp.concatenate(b, axis=1) for b in feats
        ]
        Q_jod = self.do_pooling_and_jods(features)

        stats = {
            "rho_band": self.lpyr.get_freqs(),
            "frames_per_second": vid_source.get_frames_per_second(),
            "width": w,
            "height": h,
            "N_frames": N_frames,
        }
        return (jnp.squeeze(jnp.asarray(Q_jod)), stats)

    def export_distogram(self, stats, fname, jod_max=None, base_size=6):
        raise vq_exception(
            "Currently cvvdp-ml metrics do not export distograms"
        )


class cvvdp_ml(cvvdp_ml_base):
    """MLP head over (mean_D, std_D) (reference: cvvdp_ml_metric.py:399-460)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def _init_nets(self):
        rng = jax.random.PRNGKey(0)
        self.feature_net = mlp_init(rng, 2 * 4, [24] * 3 + [1])

    def get_nets_to_load(self):
        return ["feature_net"]

    def _assign_weights(self, weights):
        loaded = _mlp_from_flat(weights["feature_net"], net="feature_net")
        _check_same_shapes("feature_net", loaded, self.feature_net)
        self.feature_net = loaded

    def do_pooling_and_jods(self, features):
        no_bands = len(features)
        is_image = features[0].shape[4] == 3
        Q_JOD = 10.0
        for bb, f in enumerate(features):
            if is_image:
                pad = jnp.zeros(f.shape[:4] + (1, f.shape[5]))
                f = jnp.concatenate([f, pad], axis=4)
            if self.disabled_features is not None:
                mask = np.ones((6,), np.float32)
                mask[list(self.disabled_features)] = 0
                f = f * jnp.asarray(mask)
            fD = f[..., 4:]
            fD = fD.at[..., 1].set(jnp.sqrt(jnp.abs(fD[..., 1])))
            x = fD.reshape(fD.shape[:4] + (-1,))
            D_all = mlp_apply(self.feature_net, x)
            if bb == no_bands - 1:
                D_all = D_all * float(self.baseband_weight.reshape(-1)[0])
            if is_image:
                D_all = D_all * self.image_int
            Q_JOD = Q_JOD - D_all.reshape(-1).mean() / no_bands
        return jnp.asarray(Q_JOD)

    def full_name(self):
        return "ColorVideoVDP-ML"

    def short_name(self):
        return "cvvdp-ml"


class cvvdp_ml_saliency(cvvdp_ml):
    """MLP head gated by a saliency (attention) MLP over T/R statistics
    (reference: cvvdp_ml_metric.py:463-550)."""

    def _init_nets(self):
        rng = jax.random.PRNGKey(0)
        self.feature_net = mlp_init(rng, 2 * 4, [24] * 3 + [1])
        self.att_net = mlp_init(jax.random.PRNGKey(1), 4 * 4, [48] * 4 + [1])

    def get_nets_to_load(self):
        return ["feature_net", "att_net"]

    def _assign_weights(self, weights):
        loaded_f = _mlp_from_flat(weights["feature_net"], net="feature_net")
        loaded_a = _mlp_from_flat(weights["att_net"], net="att_net")
        _check_same_shapes("feature_net", loaded_f, self.feature_net)
        _check_same_shapes("att_net", loaded_a, self.att_net)
        self.feature_net = loaded_f
        self.att_net = loaded_a

    def _extra_config_paths(self):
        base = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "vvdp_data", "cvvdp_ml_saliency")
        return [base] if os.path.isdir(base) else []

    def do_pooling_and_jods(self, features):
        no_bands = len(features)
        batch_sz = features[0].shape[0]
        is_image = features[0].shape[4] == 3
        Q_JOD = jnp.ones((batch_sz,)) * 10.0
        for bb, f in enumerate(features):
            f = f.at[..., 1::2].set(jnp.sqrt(jnp.abs(f[..., 1::2])))
            if is_image:
                pad = jnp.zeros(f.shape[:4] + (1, f.shape[5]))
                f = jnp.concatenate([f, pad], axis=4)
            if self.disabled_features is not None:
                mask = np.ones((6,), np.float32)
                mask[list(self.disabled_features)] = 0
                f = f * jnp.asarray(mask)
            f_TR = f[..., 0:4].reshape(f.shape[:4] + (-1,))
            f_D = f[..., 4:].reshape(f.shape[:4] + (-1,))
            Att = jax.nn.relu(mlp_apply(self.att_net, f_TR))
            D_all = jax.nn.relu(mlp_apply(self.feature_net, f_D)) * Att / \
                no_bands
            if bb == no_bands - 1:
                D_all = D_all * float(self.baseband_weight.reshape(-1)[0])
            if is_image:
                D_all = D_all * self.image_int
            Q_JOD = Q_JOD - D_all.reshape(batch_sz, -1).mean(axis=1)
        return Q_JOD

    def full_name(self):
        return "ColorVideoVDP-ML-Saliency"

    def short_name(self):
        return "cvvdp-ml-saliency"


class cvvdp_ml_transformer(cvvdp_ml):
    """ViT-style regression head over all 24 per-tile features
    (reference: cvvdp_ml_metric.py:553-678)."""

    def __init__(self, dim=256, **kwargs):
        self._dim = dim
        super().__init__(**kwargs)

    def _init_nets(self):
        self.transformer_net = transformer_init(
            jax.random.PRNGKey(0), in_channels=24, dim=getattr(self, "_dim",
                                                              256)
        )

    def get_nets_to_load(self):
        return ["transformer_net"]

    def _assign_weights(self, weights):
        loaded = _transformer_from_flat(weights["transformer_net"])
        _check_same_shapes("transformer_net", loaded, self.transformer_net)
        self.transformer_net = loaded

    def _extra_config_paths(self):
        base = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "vvdp_data", "cvvdp_ml_transformer")
        return [base] if os.path.isdir(base) else []

    def do_pooling_and_jods(self, features):
        batch_sz = features[0].shape[0]
        is_image = features[0].shape[4] == 3
        Q_JOD = jnp.ones((batch_sz,)) * 10.0
        for bb, f in enumerate(features):
            f = f.at[..., 1::2].set(jnp.sqrt(jnp.abs(f[..., 1::2])))
            if is_image:
                pad = jnp.zeros(f.shape[:4] + (1, f.shape[5]))
                f = jnp.concatenate([f, pad], axis=4)
            if self.disabled_features is not None:
                mask = np.ones((6,), np.float32)
                mask[list(self.disabled_features)] = 0
                f = f * jnp.asarray(mask)
            f_all = jnp.concatenate([
                f[..., 0:4].reshape(f.shape[:4] + (-1,)),
                f[..., 4:].reshape(f.shape[:4] + (-1,)),
            ], axis=-1)
            delta = transformer_apply(self.transformer_net, f_all) / \
                len(features)
            if bb == len(features) - 1:
                delta = delta * float(self.baseband_weight.reshape(-1)[0])
            if is_image:
                delta = delta * self.image_int
            Q_JOD = Q_JOD - delta
        return Q_JOD

    def full_name(self):
        return "ColorVideoVDP-ML-Transformer"

    def short_name(self):
        return "cvvdp-ml-transformer"


register_metric(cvvdp_ml_saliency)
register_metric(cvvdp_ml_transformer)
