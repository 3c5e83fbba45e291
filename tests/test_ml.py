"""ML metric heads: NN-block parity vs torch, trunk smoke tests."""

import numpy as np
import pytest

import colorvideovdp_tpu  # noqa: F401  (enables x64-free config)
from colorvideovdp_tpu.metrics import ml


def test_mlp_matches_torch():
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    layers = [nn.Linear(8, 24), nn.ReLU(), nn.Dropout(0.2),
              nn.Linear(24, 24), nn.ReLU(), nn.Dropout(0.2),
              nn.Linear(24, 24), nn.ReLU(), nn.Dropout(0.2),
              nn.Linear(24, 1)]
    net = nn.Sequential(*layers).eval()
    flat = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = ml._mlp_from_flat(flat)

    x = np.random.RandomState(0).randn(5, 8).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy()
    got = np.asarray(ml.mlp_apply(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_transformer_matches_torch():
    import torch
    import torch.nn as nn

    dim, heads, depth, C = 32, 4, 2, 24
    torch.manual_seed(1)

    class RT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Sequential(
                nn.Identity(), nn.Linear(C, dim)
            )
            self.cls_token = nn.Parameter(torch.randn(1, 1, dim))
            self.transformer = nn.TransformerEncoder(
                nn.TransformerEncoderLayer(
                    d_model=dim, nhead=heads, dim_feedforward=dim * 4,
                    dropout=0.1, activation="gelu", batch_first=True,
                    norm_first=True,
                ),
                num_layers=depth,
            )
            self.reg_head = nn.Sequential(
                nn.LayerNorm(dim), nn.Linear(dim, 1), nn.ReLU()
            )

        def forward(self, x):
            B, D, H, W, Cc = x.shape
            x = x.reshape(B * D, H * W, Cc)
            x = self.patch_embed(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat((cls, x), dim=1)
            x = self.transformer(x)
            y = self.reg_head(x[:, 0]).squeeze(-1).reshape(B, D)
            return y.mean(dim=1)

    net = RT().eval()
    flat = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = ml._transformer_from_flat(flat, depth=depth)

    x = np.random.RandomState(2).randn(2, 3, 4, 5, C).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x)).numpy()
    got = np.asarray(ml.transformer_apply(params, x, heads=heads))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_feature_pooling_matches_torch():
    import torch

    from colorvideovdp_tpu.ops.feature_pooling import feature_pooling

    rng = np.random.RandomState(0)
    T = rng.rand(1, 3, 2, 37, 53).astype(np.float32)
    R = rng.rand(1, 3, 2, 37, 53).astype(np.float32)
    D = rng.rand(1, 3, 2, 37, 53).astype(np.float32)
    fs = 16

    got = np.asarray(feature_pooling(T, R, D, fs))

    # torch oracle (reference: cvvdp_ml_metric.py:68-103)
    pool = torch.nn.AvgPool2d((fs, fs), ceil_mode=True)

    def ap(x):
        t = torch.tensor(x)
        v = t.reshape((-1,) + t.shape[2:])
        y = pool(v)
        return y.reshape(t.shape[:2] + y.shape[1:])

    perm = [0, 2, 3, 4, 1]
    mean_T = ap(T).permute(perm)
    var_T = ap(T**2).permute(perm) - mean_T**2
    mean_R = ap(R).permute(perm)
    var_R = ap(R**2).permute(perm) - mean_R**2
    mean_D = ap(D).permute(perm)
    var_D = ap(D**2).permute(perm) - mean_D**2
    ref = torch.stack((mean_T, var_T, mean_R, var_R, mean_D, var_D),
                      dim=5).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ml_saliency_random_init_smoke():
    from PIL import Image

    wavy = np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )[:96, :128]
    m = ml.cvvdp_ml_saliency(display_name="standard_4k", quiet=True,
                             random_init=True)
    Q, stats = m.predict(wavy, wavy, dim_order="HWC")
    assert np.isfinite(float(Q))


def test_ml_transformer_random_init_smoke():
    from PIL import Image

    wavy = np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )[:96, :128]
    m = ml.cvvdp_ml_transformer(display_name="standard_4k", quiet=True,
                                random_init=True)
    Q, stats = m.predict(wavy, wavy, dim_order="HWC")
    assert np.isfinite(float(Q))


# ---------------------------------------------------------------------------
# End-to-end goldens with REAL (non-random) weights: a Lightning-style
# state_dict is synthesized locally, loaded into the *reference* ML metric
# (torch-CPU oracle, hub download monkeypatched away), converted with
# tools/convert_ml_ckpt.py, and the full-pipeline JOD must match
# (reference: cvvdp_ml_metric.py:156-172,463-681).


@pytest.fixture(scope="module")
def ml_pair():
    from PIL import Image
    from scipy.ndimage import gaussian_filter

    wavy = np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )
    ref = wavy[100:196, 200:328]
    test = np.zeros_like(wavy)
    for cc in range(3):
        test[:, :, cc] = gaussian_filter(wavy[:, :, cc], 2.0, mode="nearest",
                                         truncate=2.0)
    return test[100:196, 200:328], ref


def _mint_ckpt(tmp_path, nets):
    """Write a Lightning-style cvvdp.ckpt holding the given {name: module}
    nets and convert it to cvvdp_ml.npz in the same dir."""
    import torch

    from convert_ml_ckpt import convert

    sd = {}
    for name, net in nets.items():
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v
    ckpt = str(tmp_path / "cvvdp.ckpt")
    torch.save({"state_dict": sd}, ckpt)
    convert(ckpt, str(tmp_path / "cvvdp_ml.npz"))
    return ckpt


def test_ml_transformer_end_to_end_matches_oracle(reference, ml_pair,
                                                  tmp_path, monkeypatch):
    import torch

    import pycvvdp.cvvdp_ml_metric as refml

    test, ref = ml_pair
    torch.manual_seed(42)
    net = refml.RegressionTransformer(in_channels=24, dim=256)
    ckpt = _mint_ckpt(tmp_path, {"transformer_net": net})
    monkeypatch.setattr(refml, "hf_hub_download", lambda **kw: ckpt)

    ref_m = refml.cvvdp_ml_transformer(
        display_name="standard_4k", quiet=True, device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(test, ref, dim_order="HWC")

    m = ml.cvvdp_ml_transformer(display_name="standard_4k", quiet=True,
                                config_paths=[str(tmp_path)])
    Q, _ = m.predict(test, ref, dim_order="HWC")
    assert abs(float(Q) - float(Q_ref)) < 5e-3, (float(Q), float(Q_ref))


def test_ml_saliency_end_to_end_matches_oracle(reference, ml_pair, tmp_path,
                                               monkeypatch):
    import torch
    from torchvision.ops import MLP

    import pycvvdp.cvvdp_ml_metric as refml

    test, ref = ml_pair
    torch.manual_seed(7)
    feature_net = MLP(in_channels=8, hidden_channels=[24] * 3 + [1],
                      activation_layer=torch.nn.ReLU, dropout=0.2)
    att_net = MLP(in_channels=16, hidden_channels=[48] * 4 + [1],
                  activation_layer=torch.nn.ReLU, dropout=0.2)
    ckpt = _mint_ckpt(tmp_path, {"feature_net": feature_net,
                                 "att_net": att_net})
    monkeypatch.setattr(refml, "hf_hub_download", lambda **kw: ckpt)

    ref_m = refml.cvvdp_ml_saliency(
        display_name="standard_4k", quiet=True, device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(test, ref, dim_order="HWC")

    m = ml.cvvdp_ml_saliency(display_name="standard_4k", quiet=True,
                             config_paths=[str(tmp_path)])
    Q, _ = m.predict(test, ref, dim_order="HWC")
    assert abs(float(Q) - float(Q_ref)) < 5e-3, (float(Q), float(Q_ref))


def test_ml_saliency_video_end_to_end_matches_oracle(reference, ml_pair,
                                                     tmp_path, monkeypatch):
    """Video trunk (4 temporal channels) through the saliency-gated MLP
    head (reference: cvvdp_ml_metric.py:463-550)."""
    import torch
    from torchvision.ops import MLP

    import pycvvdp.cvvdp_ml_metric as refml

    _, ref = ml_pair
    N, fps = 6, 30
    V_ref = np.repeat(ref[:48, :80][..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(11)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    torch.manual_seed(13)
    feature_net = MLP(in_channels=8, hidden_channels=[24] * 3 + [1],
                      activation_layer=torch.nn.ReLU, dropout=0.2)
    att_net = MLP(in_channels=16, hidden_channels=[48] * 4 + [1],
                  activation_layer=torch.nn.ReLU, dropout=0.2)
    ckpt = _mint_ckpt(tmp_path, {"feature_net": feature_net,
                                 "att_net": att_net})
    monkeypatch.setattr(refml, "hf_hub_download", lambda **kw: ckpt)

    ref_m = refml.cvvdp_ml_saliency(
        display_name="standard_4k", quiet=True, device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(V_test, V_ref, dim_order="HWCF",
                                 frames_per_second=fps)

    m = ml.cvvdp_ml_saliency(display_name="standard_4k", quiet=True,
                             config_paths=[str(tmp_path)])
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)
    assert abs(float(Q) - float(Q_ref)) < 5e-3, (float(Q), float(Q_ref))


def test_ml_ckpt_manifest(reference, tmp_path):
    """tools/cvvdp_ml_manifest.json pins the published checkpoint layouts:
    the state_dicts the reference's own net constructors produce must match
    it exactly, the converter must validate a minted npz against it, and
    any key/shape drift must be rejected."""
    import torch
    from torchvision.ops import MLP

    import pycvvdp.cvvdp_ml_metric as refml
    from convert_ml_ckpt import identify_family, load_manifest, validate

    manifest = load_manifest()
    fn = MLP(in_channels=8, hidden_channels=[24] * 3 + [1],
             activation_layer=torch.nn.ReLU, dropout=0.2)
    an = MLP(in_channels=16, hidden_channels=[48] * 4 + [1],
             activation_layer=torch.nn.ReLU, dropout=0.2)
    tr = refml.RegressionTransformer(in_channels=24, dim=256)

    def flat(nets):
        return {f"{n}.{k}": v.detach().numpy()
                for n, net in nets.items()
                for k, v in net.state_dict().items()}

    sal = flat({"feature_net": fn, "att_net": an})
    tfm = flat({"transformer_net": tr})
    assert identify_family(sal.keys(), manifest) == "cvvdp_ml_saliency"
    assert identify_family(tfm.keys(), manifest) == "cvvdp_ml_transformer"
    assert validate(sal) == "cvvdp_ml_saliency"
    assert validate(tfm) == "cvvdp_ml_transformer"

    # Drift is rejected: wrong shape, missing key, extra key.
    bad = dict(sal)
    bad["att_net.0.weight"] = bad["att_net.0.weight"][:, :8]
    with pytest.raises(ValueError, match="shape mismatch"):
        validate(bad)
    bad = dict(sal)
    del bad["feature_net.0.bias"]
    with pytest.raises(ValueError, match="missing key"):
        validate(bad)
    bad = dict(sal)
    bad["feature_net.99.weight"] = np.zeros((1, 1), np.float32)
    with pytest.raises(ValueError, match="unexpected key"):
        validate(bad)

    # The convert entry point validates what it writes.
    ckpt = str(tmp_path / "cvvdp.ckpt")
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sal.items()}},
               ckpt)
    from convert_ml_ckpt import main as conv_main

    conv_main([ckpt, str(tmp_path / "out.npz")])
    conv_main(["--validate", str(tmp_path / "out.npz")])


def test_ml_transformer_video_end_to_end_matches_oracle(reference, ml_pair,
                                                        tmp_path,
                                                        monkeypatch):
    """Video trunk (4 temporal channels) through the transformer head."""
    import torch

    import pycvvdp.cvvdp_ml_metric as refml

    _, ref = ml_pair
    N, fps = 6, 30
    V_ref = np.repeat(ref[:48, :80][..., np.newaxis], N, axis=3)
    rng = np.random.RandomState(5)
    V_test = ((V_ref.astype(np.float32) / 255
               + rng.randn(*V_ref.shape) * 0.05).clip(0, 1) * 255
              ).astype(np.uint8)

    torch.manual_seed(42)
    net = refml.RegressionTransformer(in_channels=24, dim=256)
    ckpt = _mint_ckpt(tmp_path, {"transformer_net": net})
    monkeypatch.setattr(refml, "hf_hub_download", lambda **kw: ckpt)

    ref_m = refml.cvvdp_ml_transformer(
        display_name="standard_4k", quiet=True, device=torch.device("cpu"))
    with torch.no_grad():
        Q_ref, _ = ref_m.predict(V_test, V_ref, dim_order="HWCF",
                                 frames_per_second=fps)

    m = ml.cvvdp_ml_transformer(display_name="standard_4k", quiet=True,
                                config_paths=[str(tmp_path)])
    Q, _ = m.predict(V_test, V_ref, dim_order="HWCF", frames_per_second=fps)
    assert abs(float(Q) - float(Q_ref)) < 5e-3, (float(Q), float(Q_ref))


# ---------------------------------------------------------------------------
# Real-weights-path hardening (VERDICT r3 item 6): the PUBLISHED HF-hub
# checkpoints cannot be downloaded here (no egress), so the converter/loader
# must (a) digest a Lightning state_dict with the exact schema the reference
# constructs — ALL nets' keys flat in one dict, sliced by '<net>.' prefix
# (cvvdp_ml_metric.py:156-172) plus unrelated trunk keys — and (b) fail
# LOUDLY, never silently, on any key-layout or shape mismatch.


def _full_schema_ckpt(tmp_path, reference):
    import torch
    from torchvision.ops import MLP

    import pycvvdp.cvvdp_ml_metric as refml

    torch.manual_seed(3)
    nets = {
        "feature_net": MLP(in_channels=8, hidden_channels=[24] * 3 + [1],
                           activation_layer=torch.nn.ReLU, dropout=0.2),
        "att_net": MLP(in_channels=16, hidden_channels=[48] * 4 + [1],
                       activation_layer=torch.nn.ReLU, dropout=0.2),
        "transformer_net": refml.RegressionTransformer(in_channels=24,
                                                       dim=256),
    }
    sd = {}
    for name, net in nets.items():
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v
    # Lightning modules carry the rest of the training module's state too:
    # unrelated keys the loader must ignore (sliced out by prefix).
    sd["loss_fn.weight"] = torch.ones(3)
    sd["feature_extractor.lpyr.kernel"] = torch.ones(5)
    return sd, nets


def test_ml_full_lightning_schema_loads_every_net(reference, tmp_path):
    """One ckpt holding all three nets + trunk extras -> every metric class
    loads its slice; key coverage and shapes are validated strictly."""
    import torch

    from convert_ml_ckpt import convert

    sd, _ = _full_schema_ckpt(tmp_path, reference)
    ckpt = str(tmp_path / "cvvdp.ckpt")
    torch.save({"state_dict": sd}, ckpt)
    convert(ckpt, str(tmp_path / "cvvdp_ml.npz"))

    for cls, nets in ((ml.cvvdp_ml, ["feature_net"]),
                      (ml.cvvdp_ml_saliency, ["feature_net", "att_net"]),
                      (ml.cvvdp_ml_transformer, ["transformer_net"])):
        m = cls(display_name="standard_4k", quiet=True,
                config_paths=[str(tmp_path)])
        for net in nets:
            assert getattr(m, net) is not None
    # exact expected tensor count landed in the npz (nets + 2 extras)
    data = np.load(str(tmp_path / "cvvdp_ml.npz"))
    n_linear = (4 + 5) * 2          # feature(4 Linear) + att(5 Linear)
    n_tr = 2 + 1 + 4 * 12 + 4       # patch_embed + cls + 4 layers + reg_head
    assert len(data.files) == n_linear + n_tr + 2, sorted(data.files)


def test_ml_loader_fails_loud_on_layout_mismatch(reference, tmp_path):
    """Missing keys, unexpected keys, and wrong shapes must each raise a
    vq_exception naming the problem — not load garbage silently."""
    import torch
    from torchvision.ops import MLP

    from colorvideovdp_tpu.metrics.base import vq_exception
    from convert_ml_ckpt import convert

    sd, _ = _full_schema_ckpt(tmp_path, reference)

    def mint(mutate, name):
        d = dict(sd)
        mutate(d)
        sub = tmp_path / name
        sub.mkdir()
        ckpt = str(sub / "cvvdp.ckpt")
        torch.save({"state_dict": d}, ckpt)
        convert(ckpt, str(sub / "cvvdp_ml.npz"))
        return str(sub)

    # (1) a transformer layer key missing (e.g. depth-3 training run)
    p = mint(lambda d: d.pop("transformer_net.transformer.layers.3.norm1.weight"),
             "missing")
    with pytest.raises(vq_exception, match="layers.3.norm1.weight"):
        ml.cvvdp_ml_transformer(display_name="standard_4k", quiet=True,
                                config_paths=[p])

    # (2a) an extra Linear layer under a net prefix (architecture drift):
    # parsed as a deeper MLP, then rejected by the shape validation
    p = mint(lambda d: d.update(
        {"att_net.15.weight": torch.ones(1, 48),
         "att_net.15.bias": torch.ones(1)}), "extralayer")
    with pytest.raises(vq_exception, match="shapes do not match"):
        ml.cvvdp_ml_saliency(display_name="standard_4k", quiet=True,
                             config_paths=[p])

    # (2b) a non-MLP-shaped key under a net prefix (e.g. a BatchNorm buffer)
    p = mint(lambda d: d.update(
        {"feature_net.bn.running_mean": torch.ones(24)}), "nonmlp")
    with pytest.raises(vq_exception, match="non-MLP key"):
        ml.cvvdp_ml(display_name="standard_4k", quiet=True,
                    config_paths=[p])

    # (3) right keys, wrong width (hidden 32 instead of 24)
    torch.manual_seed(4)
    wrong = MLP(in_channels=8, hidden_channels=[32] * 3 + [1],
                activation_layer=torch.nn.ReLU, dropout=0.2)
    def swap(d):
        for k in [k for k in d if k.startswith("feature_net.")]:
            del d[k]
        for k, v in wrong.state_dict().items():
            d[f"feature_net.{k}"] = v
    p = mint(swap, "badshape")
    with pytest.raises(vq_exception, match="shapes do not match"):
        ml.cvvdp_ml(display_name="standard_4k", quiet=True,
                    config_paths=[p])

    # (4) the net entirely absent from the ckpt
    p = mint(lambda d: [d.pop(k) for k in
                        [k for k in d if k.startswith("att_net.")]],
             "absent")
    with pytest.raises(vq_exception, match="att_net"):
        ml.cvvdp_ml_saliency(display_name="standard_4k", quiet=True,
                             config_paths=[p])
