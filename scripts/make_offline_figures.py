#!/usr/bin/env python
"""Offline evaluation figure set -- the reference's headline figures.

Renders on the synthetic split what evaluation/main_figure_generation.ipynb
renders for the real scoring year (website/evaluating.md tables + the paper
figures): per-variable MAE and R2 grouped bars across the six baselines,
and the pressure-latitude R2 skill maps of the heating (dT/dt) and
moistening (dq/dt) tendencies computed from daily zonal means of the
*unweighted* scoring-space fields, exactly the reference's
plot_r2_analysis pipeline (data_utils.py:1609-1690 operates on
target_scoring/preds_scoring before any dp/area weighting; per-sample dp
weights would not cancel in R2 the way constant per-level scales do).

Machinery validation: skill values on synthetic data are not the published
ones (see docs/SYNTHETIC_RESULTS.md for why each model lands where it
does); the real-data runbook (run_real_baselines.py) feeds this same path
once the dataset is mounted.

Usage:  python scripts/make_offline_figures.py [epochs] [days]
Writes docs/figures/offline_{mae,r2}_bars.png and
offline_r2_map_{t,q}.png, one printed line per artifact.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import jax  # noqa: E402

SAMPLES_PER_DAY = 12  # scoring stride 6 at the 1200 s cadence


def main(epochs: int = 10, days: int = 10):
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.data.transforms import make_target_transform
    from climsim_tpu.eval.analysis import (daily_zonal_r2,
                                           mean_pressure_by_lat,
                                           plot_metric_bars, plot_r2_maps,
                                           reshape_daily)
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import compute_norms_from_data
    from climsim_tpu.varspec import get_varspec
    from run_all_baselines import train_and_score

    t0 = time.time()
    spec = get_varspec("v1")
    grid = load_default_grid()
    n_train = 48 * grid.ncol
    n_score = days * SAMPLES_PER_DAY * grid.ncol
    x, y = synthetic_split(spec, n_train + n_score, grid=grid, seed=0,
                           noise=0.03)
    x_tr, y_tr = x[:n_train], y[:n_train]
    x_sc, y_sc = x[n_train:], y[n_train:]
    stats = compute_norms_from_data(spec, x_tr, y_tr)

    tables, _info, preds, _samples = train_and_score(
        spec, grid, stats, x_tr, y_tr, x_sc, y_sc, epochs=epochs)

    outdir = os.path.join(_REPO, "docs", "figures")
    os.makedirs(outdir, exist_ok=True)

    # headline grouped bars (main_figure_generation.ipynb fig 1/2)
    for metric, fname in (("MAE", "offline_mae_bars.png"),
                          ("R2", "offline_r2_bars.png")):
        path = os.path.join(outdir, fname)
        plot_metric_bars(tables, metric, save_path=path)
        print(f"wrote {os.path.relpath(path, _REPO)}")

    # press-lat R2 maps from unweighted scoring-space daily zonal means
    # (plot_r2_analysis, data_utils.py:1641-1657)
    map_vars = ("ptend_t", "ptend_q0001")
    tgt = np.asarray(make_target_transform(spec, stats)(y_sc), np.float64)
    tz = dict(zip(map_vars, reshape_daily(tgt, grid, spec=spec,
                                          variables=map_vars)))

    r2maps = {v: {} for v in map_vars}
    for name, p in preds.items():
        pz = reshape_daily(p.astype(np.float64), grid, spec=spec,
                           variables=map_vars)
        for v, pd in zip(map_vars, pz):
            r2maps[v][name] = daily_zonal_r2(pd, tz[v])

    ps_sl = spec.input_slices["state_ps"]
    ps_by_col = (x_sc[:, ps_sl].reshape(-1, grid.ncol)
                 .mean(axis=0).astype(np.float64))
    plat = mean_pressure_by_lat(grid, ps_by_col)
    for v, fname in (("ptend_t", "offline_r2_map_t.png"),
                     ("ptend_q0001", "offline_r2_map_q.png")):
        path = os.path.join(outdir, fname)
        plot_r2_maps(r2maps[v], grid, plat, save_path=path)
        print(f"wrote {os.path.relpath(path, _REPO)}")
    print(f"done in {time.time() - t0:.0f}s "
          f"(backend: {jax.default_backend()})")


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 10,
         days=int(sys.argv[2]) if len(sys.argv) > 2 else 10)
