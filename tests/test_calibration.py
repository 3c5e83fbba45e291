"""End-to-end calibration pipeline: extract features on a tiny synthetic
dataset, re-fit the pooling parameters, write a fitted config (SURVEY §2.7;
reference: calibration/{extract_features,train}.py driven the same way)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r


@pytest.mark.parametrize("n_pairs", [4])
def test_calibration_pipeline_end_to_end(tmp_path, n_pairs):
    from PIL import Image

    rng = np.random.RandomState(0)
    rows = ["test,reference,jod"]
    for i in range(n_pairs):
        ref = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
        sigma = 10 + 30 * i
        tst = np.clip(ref.astype(np.int16)
                      + rng.randn(*ref.shape) * sigma, 0, 255).astype(np.uint8)
        Image.fromarray(ref).save(tmp_path / f"ref{i}.png")
        Image.fromarray(tst).save(tmp_path / f"tst{i}.png")
        rows.append(f"tst{i}.png,ref{i}.png,{9.0 - 1.5 * i:.2f}")
    csv = tmp_path / "quality.csv"
    csv.write_text("\n".join(rows) + "\n")

    _run([os.path.join(REPO, "calibration", "extract_features.py"),
          str(csv), "--display", "standard_fhd", "--path-prefix",
          str(tmp_path), "--train-ratio", "50"], cwd=str(tmp_path))
    feat_dir = tmp_path / "features"
    fmaps = [f for split in ("train", "test")
             for f in os.listdir(feat_dir / split)]
    assert len(fmaps) == n_pairs

    out_dir = tmp_path / "fitted"
    _run([os.path.join(REPO, "calibration", "train.py"), str(csv),
          "--output-dir", str(out_dir),
          "--num-epochs", "3", "--train-ratio", "50", "--batch", "2"],
         cwd=str(tmp_path))
    cfg = out_dir / "cvvdp_parameters.json"
    assert cfg.exists()
    fitted = json.load(open(cfg))
    for key in ("ch_chrom_w", "ch_trans_w", "jod_a", "jod_exp"):
        assert key in fitted and np.isfinite(float(np.asarray(
            fitted[key], dtype=np.float64).reshape(-1)[0]))


def test_refit_loop_matches_reference_trainer(reference):
    """Refit-loop parity (VERDICT r4 item 9): run our optax trainer and the
    reference's torch-Adam trainer (reference: calibration/train.py:60-169 —
    Adam over [ch_chrom_w, ch_trans_w, baseband_weight, jod_a, jod_exp],
    MSE over the batch's stacked do_pooling_and_jods) from identical init on
    identical synthetic features, and require matching loss trajectories and
    final parameters."""
    import importlib.util

    import jax.numpy as jnp
    import optax
    import torch

    import colorvideovdp_tpu as cvtpu

    spec = importlib.util.spec_from_file_location(
        "cal_train", os.path.join(REPO, "calibration", "train.py"))
    cal_train = importlib.util.module_from_spec(spec)
    sys.path.insert(0, os.path.join(REPO, "calibration"))
    try:
        spec.loader.exec_module(cal_train)
    finally:
        sys.path.pop(0)

    # Synthetic per-band features: (1, C=4, F, bands), positive, spanning
    # the scale the real extractor produces.
    rng = np.random.RandomState(11)
    feats, labels = [], []
    for i in range(6):
        F = 1 if i % 3 == 0 else 5
        qpc = (rng.rand(1, 4, F, 7).astype(np.float32) ** 2) * 0.8 + 0.01
        feats.append(qpc)
        labels.append(9.0 - 0.8 * i)

    lr = 1e-3
    n_epochs = 4
    batches = [(0, 1), (2, 3), (4, 5)]

    # --- ours: the exact update rule of calibration/train.py:192-210 ---
    m = cvtpu.cvvdp(quiet=True, temp_padding="replicate")
    params = {
        "ch_chrom_w": jnp.asarray(m.ch_chrom_w),
        "ch_trans_w": jnp.asarray(m.ch_trans_w),
        "baseband_weight": jnp.asarray(m.baseband_weight),
        "jod_a": jnp.asarray(m.jod_a),
        "jod_exp": jnp.asarray(m.jod_exp),
    }
    pool_kwargs = dict(beta_sch=m.beta_sch, beta_tch=m.beta_tch,
                       beta_t=m.beta_t, image_int=m.image_int)

    def loss_one(p, qpc, label):
        jod = cal_train.pooling_and_jods(p, qpc, **pool_kwargs)
        return jnp.mean((jod - label) ** 2)

    import jax

    grad_one = jax.grad(loss_one)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    ours_losses = []
    for _ in range(n_epochs):
        for batch in batches:
            grads = None
            bl = 0.0
            for idx in batch:
                qpc = jnp.asarray(feats[idx])
                g = grad_one(params, qpc, jnp.float32(labels[idx]))
                grads = g if grads is None else jax.tree.map(jnp.add,
                                                             grads, g)
                bl += float(loss_one(params, qpc, jnp.float32(labels[idx])))
            grads = jax.tree.map(lambda x: x / len(batch), grads)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            ours_losses.append(bl / len(batch))

    # --- reference: torch Adam over the metric's own parameter tensors ---
    rm = reference.cvvdp(quiet=True, device=torch.device("cpu"),
                         temp_padding="replicate")
    rparams = [rm.ch_chrom_w, rm.ch_trans_w, rm.baseband_weight,
               rm.jod_a, rm.jod_exp]
    for p in rparams:
        p.requires_grad = True
    ropt = torch.optim.Adam(rparams, lr=lr)
    mse = torch.nn.MSELoss()
    ref_losses = []
    for _ in range(n_epochs):
        for batch in batches:
            ropt.zero_grad()
            jod_hat = torch.stack(
                [rm.do_pooling_and_jods(torch.tensor(feats[idx]))
                 for idx in batch])
            jod = torch.tensor([labels[idx] for idx in batch])
            loss = mse(jod_hat, jod)
            loss.backward()
            ropt.step()
            ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(ours_losses, ref_losses, rtol=2e-3)
    final = {
        "ch_chrom_w": float(np.asarray(params["ch_chrom_w"])),
        "ch_trans_w": float(np.asarray(params["ch_trans_w"])),
        "jod_a": float(np.asarray(params["jod_a"])),
        "jod_exp": float(np.asarray(params["jod_exp"])),
    }
    with torch.no_grad():
        want = {
            "ch_chrom_w": float(rm.ch_chrom_w),
            "ch_trans_w": float(rm.ch_trans_w),
            "jod_a": float(rm.jod_a),
            "jod_exp": float(rm.jod_exp),
        }
        np.testing.assert_allclose(
            np.asarray(params["baseband_weight"]),
            rm.baseband_weight.numpy(), atol=2e-4)
    for k in final:
        assert abs(final[k] - want[k]) < 2e-4, (k, final[k], want[k])
