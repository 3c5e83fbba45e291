"""Re-fit a subset of cvvdp's scalar parameters against subjective JOD labels
(reference: calibration/train.py).

Only the pooling stage runs during training — features are cached — so the
optimisation loop is a small jitted optax program: the trainable parameters
are [ch_chrom_w, ch_trans_w, baseband_weight, jod_a, jod_exp], fitted with
Adam + MSE, validated with RMSE/PLCC/SRCC, and written back to a
cvvdp_parameters.json via ``save_to_config``.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from scipy import stats as sstats  # noqa: E402

import colorvideovdp_tpu as cvtpu  # noqa: E402
from colorvideovdp_tpu.ops import masking as mk  # noqa: E402
from data import VideoDataset  # noqa: E402
from extract_features import read_args_from_file  # noqa: E402


def pooling_and_jods(params, qpc, *, beta_sch, beta_tch, beta_t, image_int):
    """Differentiable pooling -> JOD with traced weights (mirrors
    cvvdp.do_pooling_and_jods, reference: cvvdp_metric.py:610-658)."""
    C = qpc.shape[1]
    no_frames = qpc.shape[2]
    bands = qpc.shape[3]
    ones = jnp.ones(())
    per_ch_w = jnp.stack(
        [ones, params["ch_chrom_w"], params["ch_chrom_w"],
         params["ch_trans_w"]]
    )[:C].reshape(1, C, 1, 1)
    per_sband_w = jnp.ones((1, C, 1, bands))
    per_sband_w = per_sband_w.at[:, :, 0, -1].set(
        params["baseband_weight"][:C]
    )
    Q_sc = mk.lp_norm(qpc * per_ch_w * per_sband_w, beta_sch, dim=3,
                      normalize=False)
    Q_tc = mk.lp_norm(Q_sc, beta_tch, dim=1, normalize=False)
    if no_frames == 1:
        Q = Q_tc * image_int
    else:
        Q = mk.lp_norm(Q_tc, beta_t, dim=2, normalize=True)
    Q = jnp.squeeze(Q)
    return mk.met2jod(Q, params["jod_a"], params["jod_exp"])


def get_args():
    parser = argparse.ArgumentParser(
        "Calibrate cvvdp parameters for a new dataset"
    )
    parser.add_argument("quality_file",
                        help="Path to .csv file containing quality scores.")
    parser.add_argument("-o", "--output-dir", default="new_config")
    parser.add_argument("-s", "--split-column", default="reference")
    parser.add_argument("-r", "--train-ratio", type=int, choices=range(100),
                        default=80)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-f", "--features-suffix", default=None)
    parser.add_argument("-c", "--config-paths", type=str, nargs="+",
                        default=[])
    parser.add_argument("--resample-bands", action="store_true",
                        default=False)
    parser.add_argument("-v", "--verbose", action="store_true", default=False)
    parser.add_argument("-b", "--batch", type=int, default=4)
    parser.add_argument("-lr", "--learning-rate", type=float, default=1e-3)
    parser.add_argument("-e", "--num-epochs", type=int, default=50)
    parser.add_argument("--val-epoch", type=int, default=1)
    parser.add_argument("--save",
                        choices=["latest", "best-rmse", "best-pearson",
                                 "best-spearman"],
                        default="latest")
    parser.add_argument("--log-dir", default=None,
                        help="write tensorboard (or CSV fallback) training "
                        "curves to this directory")
    args = parser.parse_args()
    num_skip = read_args_from_file(args)
    args = parser.parse_args()
    quality_table = pd.read_csv(args.quality_file, skiprows=num_skip)
    level = logging.DEBUG if args.verbose else logging.INFO
    logging.basicConfig(format="[%(levelname)s] %(message)s", level=level)
    return args, quality_table


class TrainLogger:
    """Tensorboard training curves (reference: train.py:96,120-122), with a
    plain-CSV fallback when tensorboard is unavailable."""

    def __init__(self, log_dir):
        self.writer = None
        self.csv = None
        if log_dir is None:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            self.csv = open(os.path.join(log_dir, "training_log.csv"), "w")
            self.csv.write("step,tag,value\n")

    def add_scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        elif self.csv is not None:
            self.csv.write(f"{step},{tag},{value}\n")

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.csv is not None:
            self.csv.close()


def evaluate(params, dataset, pool_kwargs):
    preds, labels = [], []
    for batch in dataset.iter_batches(8):
        for qpc, _rho, q in batch:
            jod = pooling_and_jods(params, jnp.asarray(qpc), **pool_kwargs)
            preds.append(float(np.asarray(jod).reshape(-1)[0]))
            labels.append(float(q))
    preds, labels = np.asarray(preds), np.asarray(labels)
    rmse = float(np.sqrt(np.mean((preds - labels) ** 2)))
    plcc = float(sstats.pearsonr(preds, labels)[0]) if len(preds) > 1 else 0.0
    srcc = float(sstats.spearmanr(preds, labels)[0]) if len(preds) > 1 else 0.0
    return rmse, plcc, srcc


def main():
    args, quality_table = get_args()

    metric = cvtpu.cvvdp(quiet=True, temp_padding="replicate",
                         config_paths=args.config_paths)
    params = {
        "ch_chrom_w": jnp.asarray(metric.ch_chrom_w),
        "ch_trans_w": jnp.asarray(metric.ch_trans_w),
        "baseband_weight": jnp.asarray(metric.baseband_weight),
        "jod_a": jnp.asarray(metric.jod_a),
        "jod_exp": jnp.asarray(metric.jod_exp),
    }
    pool_kwargs = dict(beta_sch=metric.beta_sch, beta_tch=metric.beta_tch,
                       beta_t=metric.beta_t, image_int=metric.image_int)

    assert args.split_column in quality_table.columns, (
        f'Split column "{args.split_column}" not found'
    )
    np.random.seed(args.seed)
    unique_cond = np.random.permutation(
        quality_table[args.split_column].unique()
    )
    train_cond = unique_cond[: (len(unique_cond) * args.train_ratio) // 100]
    train_table = quality_table[
        quality_table[args.split_column].isin(train_cond)
    ]
    test_table = pd.concat([quality_table, train_table]).drop_duplicates(
        keep=False
    )

    ft_path = ("features" if args.features_suffix is None
               else "features_" + args.features_suffix)
    train_ds = VideoDataset(ft_path, train_table, "train",
                            args.resample_bands)
    val_ds = VideoDataset(ft_path, test_table, "test", args.resample_bands)

    opt = optax.adam(args.learning_rate)
    opt_state = opt.init(params)

    def loss_one(p, qpc, label):
        jod = pooling_and_jods(p, qpc, **pool_kwargs)
        return jnp.mean((jod - label) ** 2)

    grad_one = jax.grad(loss_one)

    best = {"rmse": np.inf, "pearson": -np.inf, "spearman": -np.inf}
    best_params = params
    tlog = TrainLogger(args.log_dir)

    for epoch in range(args.num_epochs):
        epoch_loss = 0.0
        n = 0
        for batch in train_ds.iter_batches(args.batch, shuffle=True,
                                           seed=args.seed + epoch):
            # Variable-length clips: accumulate per-sample gradients.
            grads = None
            for qpc, _rho, q in batch:
                g = grad_one(params, jnp.asarray(qpc), jnp.float32(q))
                grads = g if grads is None else jax.tree.map(
                    jnp.add, grads, g
                )
                epoch_loss += float(
                    loss_one(params, jnp.asarray(qpc), jnp.float32(q))
                )
                n += 1
            grads = jax.tree.map(lambda x: x / len(batch), grads)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)

        logging.info(f"epoch {epoch}: train MSE {epoch_loss / max(n, 1):.4f}")
        tlog.add_scalar("Loss/train", epoch_loss / max(n, 1), epoch)

        if (epoch + 1) % args.val_epoch == 0 and len(val_ds) > 0:
            rmse, plcc, srcc = evaluate(params, val_ds, pool_kwargs)
            logging.info(
                f"  val: RMSE {rmse:.4f} PLCC {plcc:.4f} SRCC {srcc:.4f}"
            )
            tlog.add_scalar("RMSE/test", rmse, epoch)
            tlog.add_scalar("PLCC/test", plcc, epoch)
            tlog.add_scalar("SRCC/test", srcc, epoch)
            improved = (
                (args.save == "best-rmse" and rmse < best["rmse"])
                or (args.save == "best-pearson" and plcc > best["pearson"])
                or (args.save == "best-spearman" and srcc > best["spearman"])
            )
            best["rmse"] = min(best["rmse"], rmse)
            best["pearson"] = max(best["pearson"], plcc)
            best["spearman"] = max(best["spearman"], srcc)
            if improved:
                best_params = params

    tlog.close()
    final = params if args.save == "latest" else best_params
    # Push the fitted values back onto the metric and serialise.
    metric.ch_chrom_w = float(np.asarray(final["ch_chrom_w"]))
    metric.ch_trans_w = float(np.asarray(final["ch_trans_w"]))
    metric.baseband_weight = np.asarray(final["baseband_weight"])
    metric.jod_a = float(np.asarray(final["jod_a"]))
    metric.jod_exp = float(np.asarray(final["jod_exp"]))
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "cvvdp_parameters.json")
    metric.save_to_config(
        out, f"Calibrated on {args.quality_file} (TPU build)"
    )
    logging.info(f"Saved calibrated parameters to {out}")


if __name__ == "__main__":
    main()
