"""Two-worker exercise of tools/run_cluster.py: k/N clip-list sharding,
--resume skip, CSV shard merge (reference contract:
pycvvdp/benchmark_cluster.sh:26-40 — one task per list shard — and
calibration/extract_features.py:92-96 k/N convention)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO_ROOT, "tools", "run_cluster.py")


@pytest.fixture(scope="module")
def clip_list(tmp_path_factory):
    """Four tiny PNG pairs with distinct distortion levels + the list CSV."""
    from PIL import Image

    d = tmp_path_factory.mktemp("cluster_media")
    wavy = np.asarray(
        Image.open("/root/reference/example_media/wavy_facade.png")
    )
    rng = np.random.RandomState(7)
    rows = []
    for i, sigma in enumerate((5, 10, 20, 40)):
        ref = wavy[60 + 8 * i:124 + 8 * i, 150:246]
        test = np.clip(
            ref.astype(np.float32) + rng.randn(*ref.shape) * sigma, 0, 255
        ).astype(np.uint8)
        tf = str(d / f"test_{i}.png")
        rf = str(d / f"ref_{i}.png")
        Image.fromarray(test).save(tf)
        Image.fromarray(ref).save(rf)
        rows.append((tf, rf))
    lst = str(d / "clips.csv")
    with open(lst, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["test", "reference", "tag"])
        for i, (tf, rf) in enumerate(rows):
            w.writerow([tf, rf, f"clip{i}"])
    return lst, rows


def _run_worker(args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, RUNNER] + args,
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO_ROOT,
    )


def _read(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_cluster_two_workers_resume_and_merge(clip_list, tmp_path):
    lst, pairs = clip_list
    result = str(tmp_path / "scores.csv")
    common = ["--list", lst, "--result", result,
              "--display", "standard_fhd"]

    # Worker 0/2 scores rows 0 and 2.
    r0 = _run_worker(common + ["--worker", "0/2"])
    assert r0.returncode == 0, r0.stderr[-2000:]
    shard0 = result[:-4] + ".shard000of002.csv"
    rows0 = _read(shard0)
    assert [r["tag"] for r in rows0] == ["clip0", "clip2"]
    assert all(0.0 < float(r["Q_JOD"]) < 10.0 for r in rows0)
    # Monotonicity across the shard: clip2 (sigma 20) is worse than clip0
    # (sigma 5) — the workers really scored their own rows.
    assert float(rows0[1]["Q_JOD"]) < float(rows0[0]["Q_JOD"])

    # Simulate an interruption of worker 1: a shard with only its first
    # row, Q mutated to a sentinel. --resume must keep it (no re-score)
    # and append only the missing row.
    shard1 = result[:-4] + ".shard001of002.csv"
    with open(shard1, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows0[0].keys()))
        w.writeheader()
        w.writerow({"test": pairs[1][0], "reference": pairs[1][1],
                    "tag": "clip1", "metric": "cvvdp",
                    "Q_JOD": "7.777777"})
    r1 = _run_worker(common + ["--worker", "1/2", "--resume"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    rows1 = _read(shard1)
    assert [r["tag"] for r in rows1] == ["clip1", "clip3"]
    assert rows1[0]["Q_JOD"] == "7.777777"  # preserved, not re-scored
    assert 0.0 < float(rows1[1]["Q_JOD"]) < 10.0

    # Merge re-joins both shards into the full 4-row ledger.
    rm = _run_worker(["--result", result, "--merge", "--nshards", "2"])
    assert rm.returncode == 0, rm.stderr[-2000:]
    merged = _read(result)
    assert sorted(r["tag"] for r in merged) == [f"clip{i}" for i in range(4)]
    by_tag = {r["tag"]: r for r in merged}
    for src in (rows0, rows1):
        for r in src:
            assert by_tag[r["tag"]]["Q_JOD"] == r["Q_JOD"]

    # Merge with a wrong shard count must fail loudly.
    rbad = _run_worker(["--result", result, "--merge", "--nshards", "3"])
    assert rbad.returncode != 0
