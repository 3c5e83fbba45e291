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
