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
