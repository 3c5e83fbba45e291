"""End-to-end CLI run in a subprocess (reference contract:
pycvvdp/run_cvvdp.py output formats — JOD line, --result CSV, heatmap file,
distogram file)."""

import csv
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def png_pair(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("cli_media")
    wavy = np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )
    ref = wavy[100:196, 200:328]
    rng = np.random.RandomState(11)
    test = np.clip(
        ref.astype(np.float32) + rng.randn(*ref.shape) * 15, 0, 255
    ).astype(np.uint8)
    tf, rf = str(d / "test.png"), str(d / "ref.png")
    Image.fromarray(test).save(tf)
    Image.fromarray(ref).save(rf)
    return tf, rf


def _run_cli(args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    return subprocess.run(
        [sys.executable, "-m", "colorvideovdp_tpu.cli"] + args,
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO_ROOT,
    )


def test_cli_end_to_end(png_pair, tmp_path):
    tf, rf = png_pair
    out_dir = str(tmp_path / "out")
    res_csv = str(tmp_path / "res.csv")
    r = _run_cli([
        "-t", tf, "-r", rf, "--display", "standard_fhd",
        "--heatmap", "supra-threshold", "--distogram",
        "--result", res_csv, "-o", out_dir, "--features",
    ])
    assert r.returncode == 0, r.stderr[-2000:]

    # JOD line on stdout: "cvvdp=X.XXXX [JOD]"
    m = re.search(r"cvvdp=(\d+\.\d+) \[JOD\]", r.stdout)
    assert m, r.stdout
    jod = float(m.group(1))
    assert 0.0 < jod < 10.0

    # CSV ledger parses and carries the same value.
    with open(res_csv) as fh:
        rows = list(csv.reader(fh))
    assert rows[0][0].strip() == "test"
    assert rows[0][2].strip() == "cvvdp"
    assert float(rows[1][2]) == pytest.approx(jod, abs=5e-5)

    # Heatmap + distogram + features files exist and parse.
    hm = os.path.join(out_dir, "test_heatmap.png")
    assert os.path.exists(hm)
    from PIL import Image

    img = np.asarray(Image.open(hm))
    assert img.shape[:2] == (96, 128)
    assert os.path.exists(os.path.join(out_dir, "test_distogram.png"))
    import json

    with open(os.path.join(out_dir, "test_fmap.json")) as fh:
        fmap = json.load(fh)
    assert any(k.startswith("t0_b") for k in fmap)


def test_cli_quiet_multiple_metrics(png_pair):
    tf, rf = png_pair
    r = _run_cli([
        "-t", tf, "-r", rf, "--display", "standard_fhd", "-q",
        "-m", "cvvdp", "psnr-rgb",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    vals = [float(x) for x in r.stdout.split()]
    assert len(vals) == 2
    assert 0 < vals[0] < 10   # JOD
    assert 10 < vals[1] < 60  # dB


def test_cli_error_on_missing_file(tmp_path):
    r = _run_cli(["-t", str(tmp_path / "nope.png"),
                  "-r", str(tmp_path / "nope2.png"),
                  "--display", "standard_fhd"])
    # vq_exception is caught and logged; no traceback, nonzero handled
    # gracefully (reference: run_cvvdp.py:392-395 logs the error).
    assert "rror" in r.stderr or "rror" in r.stdout
