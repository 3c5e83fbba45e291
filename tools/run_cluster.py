"""Clip-list batch runner: the TPU-native replacement for the reference's
cluster benchmark scripts (reference: pycvvdp/benchmark_cluster.sh:1-40,
whose `metric.py --benchmark` entry point is stale upstream).

Design (SURVEY.md §2.9 / §5.8): shard the *clip list* across hosts (DCN)
with k/N row sharding — each worker is one `srun`/k8s task — and shard
pixels across that host's chips (ICI) via the package's GSPMD video path.
Per-clip scoring needs no cross-host communication, so plain row sharding
is bandwidth-optimal; results merge as CSV shards.

Usage:
  python tools/run_cluster.py --list clips.csv --result out.csv \
      [--worker k/N] [--resume] [--metric cvvdp] [--display standard_4k]
  python tools/run_cluster.py --merge out.csv          # join shards

clips.csv columns: test, reference [, display, fps]. Extra columns are
carried through to the output. Rows already present in the shard are
skipped with --resume.

Multi-host: when launched under a JAX distributed environment (e.g.
`JAX_COORDINATOR`/`JAX_NUM_PROCESSES`/`JAX_PROCESS_ID` set), the worker
spec defaults to process_id/num_processes so one launch command fans out
over every host in the slice.
"""

from __future__ import annotations

import argparse
import csv
import glob
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--list", help="CSV of clip pairs to score")
    p.add_argument("--result", required=True, help="output CSV (base name)")
    p.add_argument("--merge", action="store_true",
                   help="merge <result>.shard*.csv into <result> and exit")
    p.add_argument("--metric", default="cvvdp")
    p.add_argument("--display", default="standard_4k",
                   help="default display model (per-row 'display' wins)")
    p.add_argument("--fps", type=float, default=0.0,
                   help="override fps for image sequences")
    p.add_argument("--worker", default=None,
                   help="k/N row sharding (0-based k); defaults to the JAX "
                        "distributed process spec when present")
    p.add_argument("--temp-padding", default="symmetric",
                   choices=["replicate", "symmetric", "valid"],
                   help="temporal padding (the reference CLI's default is "
                        "symmetric; the metric ctor's is replicate)")
    p.add_argument("--resume", action="store_true",
                   help="skip rows already present in this worker's shard")
    p.add_argument("--nshards", type=int, default=None,
                   help="with --merge: expected shard count to verify")
    return p.parse_args(argv)


def _worker_spec(args):
    if args.worker:
        k, n = args.worker.split("/", 1)
        return int(k), int(n)
    if os.environ.get("JAX_PROCESS_ID") and os.environ.get(
            "JAX_NUM_PROCESSES"):
        return (int(os.environ["JAX_PROCESS_ID"]),
                int(os.environ["JAX_NUM_PROCESSES"]))
    return 0, 1


def _shard_name(result, k, n):
    if n == 1:
        return result
    base, ext = os.path.splitext(result)
    return f"{base}.shard{k:03d}of{n:03d}{ext or '.csv'}"


def merge(args):
    base, ext = os.path.splitext(args.result)
    shards = sorted(glob.glob(f"{base}.shard*{ext or '.csv'}"))
    if args.nshards is not None and len(shards) != args.nshards:
        raise SystemExit(
            f"expected {args.nshards} shards, found {len(shards)}")
    rows, header = [], None
    for s in shards:
        with open(s, newline="") as f:
            r = csv.reader(f)
            h = next(r)
            header = header or h
            rows.extend(list(r))
    with open(args.result, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    print(f"merged {len(shards)} shards, {len(rows)} rows -> {args.result}")


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    if args.merge:
        merge(args)
        return
    if not args.list:
        raise SystemExit("--list is required unless --merge")

    k, n = _worker_spec(args)
    out_name = _shard_name(args.result, k, n)

    with open(args.list, newline="") as f:
        reader = csv.DictReader(f)
        all_rows = list(reader)
        in_fields = reader.fieldnames or []
    my_rows = [(i, r) for i, r in enumerate(all_rows) if i % n == k]
    logging.info(f"worker {k}/{n}: {len(my_rows)} of {len(all_rows)} rows")

    done = set()
    if args.resume and os.path.exists(out_name):
        with open(out_name, newline="") as f:
            for r in csv.DictReader(f):
                done.add((r.get("test"), r.get("reference")))

    # Import after arg parsing so --merge works without jax installed.
    from colorvideovdp_tpu.io.video_source_file import video_source_file
    from colorvideovdp_tpu.metrics.base import vq_metric_dict

    out_fields = list(in_fields)
    for extra in ("metric", "Q_JOD"):
        if extra not in out_fields:
            out_fields.append(extra)
    new_file = not (args.resume and os.path.exists(out_name))
    out_f = open(out_name, "w" if new_file else "a", newline="")
    writer = csv.DictWriter(out_f, fieldnames=out_fields,
                            extrasaction="ignore")
    if new_file:
        writer.writeheader()

    met_cls = vq_metric_dict[args.metric]
    metrics = {}  # display -> metric instance (jit caches live per shape)
    for i, row in my_rows:
        key = (row.get("test"), row.get("reference"))
        if key in done:
            continue
        display = row.get("display") or args.display
        if display not in metrics:
            kw_m = dict(display_name=display, quiet=True)
            try:
                metrics[display] = met_cls(temp_padding=args.temp_padding,
                                           **kw_m)
            except TypeError:  # metric without a temp_padding arg
                metrics[display] = met_cls(**kw_m)
        m = metrics[display]
        kw = {}
        fps = float(row.get("fps") or args.fps or 0)
        if fps > 0:
            kw["fps"] = fps
        try:
            vs = video_source_file(row["test"], row["reference"],
                                   display_photometry=display, **kw)
            Q, _ = m.predict_video_source(vs)
            row = dict(row, metric=args.metric, Q_JOD=f"{float(Q):.6f}")
        except Exception as e:  # record the failure, keep the batch alive
            logging.error(f"row {i} ({row.get('test')}): {e}")
            row = dict(row, metric=args.metric, Q_JOD="error")
        writer.writerow(row)
        out_f.flush()
        logging.info(f"[{i}] {row.get('test')} -> {row['Q_JOD']}")
    out_f.close()


if __name__ == "__main__":
    main()
