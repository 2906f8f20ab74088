#!/usr/bin/env python
"""Quickstart: train + evaluate an MLP emulator end to end.

The framework equivalent of the reference's demo_notebooks/
quickstart_example.ipynb -- but as one runnable script on synthetic data
(swap in real shards with --inputs/--targets).  Flow: data -> norms ->
sharded training -> predictions -> weighted metric tables + figures.
"""

import argparse
import os
import sys

import jax
import numpy as np

# runnable as `python examples/quickstart.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", help="train_input.npy (raw); default synthetic")
    ap.add_argument("--targets", help="train_target.npy (raw)")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out-dir", default="quickstart_out")
    args = ap.parse_args()

    from climsim_tpu.data.pipeline import BatchLoader
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.data.transforms import make_target_transform
    from climsim_tpu.eval.analysis import plot_metric_bars
    from climsim_tpu.eval.scoring import offline_score
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import compute_norms_from_data
    from climsim_tpu.train import recipes
    from climsim_tpu.train.loop import fit
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v1")
    grid = load_default_grid()
    if args.inputs:
        x = np.load(args.inputs)
        y = np.load(args.targets)
    else:
        x, y = synthetic_split(spec, n=32 * 384, grid=grid, seed=0)
    stats = compute_norms_from_data(spec, x, y)

    n_val = 4 * 384
    x_tr, y_tr, x_val, y_val = x[:-n_val], y[:-n_val], x[-n_val:], y[-n_val:]
    steps = x_tr.shape[0] // args.batch
    tr = recipes.mlp_trainer(spec, stats, (x_tr, y_tr),
                             jax.random.PRNGKey(0), steps_per_epoch=steps)
    train_loader = BatchLoader(x_tr, y_tr, args.batch, seed=0)
    val_loader = BatchLoader(x_val, y_val, args.batch, shuffle=False)
    state, hist = fit(tr.train_step, tr.eval_step, tr.state, train_loader,
                      val_loader, args.epochs)

    # score on the held-out block (two free baselines like the notebook:
    # predict-zero and predict-the-train-mean)
    preds = tr.predict(state.params, x_val, 2048)
    tgt_t = make_target_transform(spec, stats)
    y_val_n = np.asarray(tgt_t(y_val))
    y_tr_mean = np.asarray(tgt_t(y_tr)).mean(axis=0, keepdims=True)
    x_val_n = (x_val - stats.inp_sub) / stats.inp_div
    tables, _ = offline_score(
        spec, grid, stats, x_val_n, y_val_n,
        {"mlp": preds,
         "zero": np.zeros_like(y_val_n),
         "train_mean": np.repeat(y_tr_mean, y_val_n.shape[0], 0)})

    os.makedirs(args.out_dir, exist_ok=True)
    for model, table in tables.items():
        print(f"\n=== {model} ===")
        for v, row in table.items():
            print(f"  {v:18s} MAE {row['MAE']:10.4f}  R2 {row['R2']:7.3f}")
    plot_metric_bars(tables, "MAE", os.path.join(args.out_dir, "mae.png"))
    plot_metric_bars(tables, "R2", os.path.join(args.out_dir, "r2.png"))
    print(f"\nfigures in {args.out_dir}/")


if __name__ == "__main__":
    main()
