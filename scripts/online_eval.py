#!/usr/bin/env python
"""End-to-end online evaluation: hybrid rollout vs perturbed-IC ensemble.

The framework equivalent of the reference's five online-evaluation
notebooks (online_testing/evaluation/*.ipynb, e.g.
monthly-online-rmse-visualization.ipynb cells 5-7): a coupled ("hybrid")
run is judged against a small ensemble of reference-model runs started
from perturbed initial conditions, whose spread is the irreducible noise
floor.

Without E3SM in the image, the MMF is played by an ORACLE emulator: the
synthetic tendency map itself, rolled out by the same HybridDriver.  The
candidate model is a v5 U-Net trained on (input, oracle-tendency) pairs
and wrapped with the coupling wrapper, so every production piece --
training, wrapping, rollout, diagnostics -- runs exactly as it would with
a real model:

  1. three perturbed-IC oracle rollouts -> reference ensemble + noise floor
  2. train v5 U-Net -> make_wrapper -> hybrid rollout from the same IC
  3. windowed ("monthly") weighted RMSE of T vs the ensemble mean,
     zonal-mean bias, error growth, precipitation statistics
  4. figures + a markdown report under --out

Usage: python scripts/online_eval.py [--steps 216] [--train-steps 400] ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# fixed categorical palette (validated; docs figures keep one hue per
# entity across every plot: hybrid=blue, ensemble=orange, floor=aqua)
C_HYBRID = "#2a78d6"
C_ENSEMBLE = "#eb6834"
C_FLOOR = "#1baf7a"


def make_oracle_wrapper(spec5, spec4, seed: int = 1):
    """The synthetic tendency map as a coupling-contract emulator.

    Reimplements data.synthetic.synthetic_targets as a pure jax function
    with FROZEN standardization (mu/sd from the training inputs), then
    expands the v5 (B, 308) output to the (B, 368) coupling contract by
    repartitioning dqn into (dqc, dqi) at the advanced temperature --
    physics.repartition_clouds, the same rule the real wrapper applies.
    """
    import jax.numpy as jnp

    from climsim_tpu import physics
    from climsim_tpu.online.wrapper import convert_v4_to_v5
    from climsim_tpu.varspec import var_len

    rng = np.random.default_rng(seed)
    d_in, d_out = spec5.input_len, spec5.output_len
    w1 = rng.standard_normal((d_in, 64)) / np.sqrt(d_in)
    w2 = rng.standard_normal((64, d_out)) / np.sqrt(64)

    scale = np.empty(d_out)
    for v, sl in spec5.output_slices.items():
        if v == "ptend_t":
            s = 1e-4
        elif v.startswith("ptend_q"):
            s = 1e-8
        elif v in ("ptend_u", "ptend_v"):
            s = 1e-5
        elif v in ("cam_out_PRECC", "cam_out_PRECSC"):
            s = 1e-8
        else:
            s = 100.0
        scale[sl] = s
    scal_mask = np.zeros(d_out)
    for v in spec5.outputs:
        if var_len(v) == 1:
            scal_mask[spec5.output_slices[v]] = 1.0

    state = {"mu": None, "sd": None}

    def fit_standardizer(x5_raw):
        state["mu"] = np.asarray(x5_raw).mean(0, keepdims=True)
        state["sd"] = np.asarray(x5_raw).std(0, keepdims=True) + 1e-6

    f32 = jnp.float32  # keep the scan carry f32 even under jax_enable_x64
    w1j, w2j = jnp.asarray(w1, f32), jnp.asarray(w2, f32)
    scalej, maskj = jnp.asarray(scale, f32), jnp.asarray(scal_mask, f32)

    def oracle_v5(x5_raw):
        z = (x5_raw.astype(f32) - jnp.asarray(state["mu"], f32)) \
            / jnp.asarray(state["sd"], f32)
        core = jnp.tanh(z @ w1j) @ w2j
        y = core * scalej
        # positive-only surface outputs, like the synthetic generator
        return jnp.where(maskj > 0,
                         jnp.maximum(y + 2.0 * scalej, 0.0), y)

    sl5 = spec5.output_slices
    sl4i = spec4.input_slices

    def wrapper(params, x_v4_raw):
        x5 = convert_v4_to_v5(x_v4_raw)
        y5 = oracle_v5(x5)
        t = x_v4_raw[:, sl4i["state_t"]]
        qc = x_v4_raw[:, sl4i["state_q0002"]]
        qi = x_v4_raw[:, sl4i["state_q0003"]]
        dqc, dqi = physics.repartition_clouds(
            t, qc, qi, y5[:, sl5["ptend_t"]], y5[:, sl5["ptend_qn"]])
        return jnp.concatenate(
            [y5[:, sl5["ptend_t"]], y5[:, sl5["ptend_q0001"]], dqc, dqi,
             y5[:, sl5["ptend_u"]], y5[:, sl5["ptend_v"]]]
            + [y5[:, sl5[v]] for v in spec5.outputs if var_len(v) == 1],
            axis=1).astype(jnp.float32)

    return wrapper, oracle_v5, fit_standardizer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=216,
                    help="rollout steps (1200 s each; 216 = 3 'months' of "
                         "72 in this compressed calendar)")
    ap.add_argument("--window", type=int, default=72,
                    help="steps per 'month' for windowed RMSE")
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--out", default="docs")
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.eval import online_diags as D
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import (compute_exponential_lambda,
                                   compute_norms_from_data)
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.online.driver import HybridDriver, initial_state
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    spec5, spec4 = get_varspec("v5"), get_varspec("v4")
    grid = load_default_grid()
    ncol = grid.ncol

    # ---- 1. oracle "MMF" + training data from it -------------------------
    oracle_wrap, oracle_v5, fit_std = make_oracle_wrapper(spec5, spec4)
    n_train = max(args.train_steps * args.batch // 4, 4 * ncol)
    x = synthetic_inputs(spec5, n_train, grid, seed=0)
    x[:, spec5.input_slices["icol"]] = (
        np.arange(x.shape[0]) % ncol + 1)[:, None]
    fit_std(x)
    y = np.asarray(oracle_v5(jnp.asarray(x)))
    stats = compute_norms_from_data(spec5, x, y)
    stats = dataclasses.replace(stats, lbd_qn=compute_exponential_lambda(
        x[:, spec5.input_slices["state_qn"]]))

    # ---- 2. train the candidate v5 U-Net + wrap --------------------------
    tr = recipes.unet_trainer(
        spec5, stats, (x, y), jax.random.PRNGKey(0),
        steps_per_epoch=max(args.train_steps, 1),
        model_kw=dict(model_channels=args.channels, channel_mult=(1, 2, 2),
                      num_blocks=2, attn_resolutions=(16,),
                      output_prune=True))
    state = tr.state
    for i in range(args.train_steps):
        s = (i * args.batch) % max(x.shape[0] - args.batch, 1)
        state, m = tr.train_step(state, x[s:s + args.batch],
                                 y[s:s + args.batch])
    train_loss = float(m["loss"])
    print(f"trained {args.train_steps} steps, loss {train_loss:.5f}")
    hybrid_wrap = W.make_wrapper(
        lambda p, xn: tr.model.apply(p, xn), stats)

    # ---- 3. rollouts ------------------------------------------------------
    x0 = synthetic_inputs(spec4, ncol, grid, seed=3)
    oracle_driver = HybridDriver(oracle_wrap, grid)
    rng = np.random.default_rng(7)
    states0 = []
    for mi in range(args.members):
        xm = x0.copy()
        if mi > 0:  # perturbed initial conditions (reference: perturbed seeds)
            xm[:, spec4.input_slices["state_t"]] += \
                0.05 * rng.standard_normal((ncol, 60)).astype(np.float32)
        states0.append(initial_state(xm, grid))
    # all members advance in ONE vmapped program (member x column batch)
    # when the stacked trajectories fit HBM; year-scale rollouts fall
    # back to sequential members (each trajectory offloads to host)
    traj_bytes = args.members * args.steps * ncol * 242 * 4
    if traj_bytes < 2e9:
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *states0)
        _, etraj = oracle_driver.rollout_ensemble(None, stacked,
                                                  args.steps)
        members = [{k: np.asarray(v[mi]) for k, v in etraj.items()}
                   for mi in range(args.members)]
        print(f"ensemble rollout done ({args.members} members, "
              "one dispatch)")
    else:
        members = []
        for mi, s0 in enumerate(states0):
            _, traj = oracle_driver.rollout(None, s0, args.steps)
            members.append({k: np.asarray(v) for k, v in traj.items()})
            print(f"ensemble member {mi}: rollout done")

    hybrid_driver = HybridDriver(hybrid_wrap, grid)
    _, htraj = hybrid_driver.rollout(state.params,
                                     initial_state(x0, grid), args.steps)
    htraj = {k: np.asarray(v) for k, v in htraj.items()}
    print("hybrid rollout done")

    # ---- 4. diagnostics ----------------------------------------------------
    ens_t = np.mean([m["t"] for m in members], axis=0)
    floor = D.ensemble_noise_floor([m["t"] for m in members], grid)
    growth = D.error_growth(htraj["t"], ens_t, grid)
    n_win = max(args.steps // args.window, 1)
    win_rmse = [D.weighted_rmse(
        htraj["t"][i * args.window:(i + 1) * args.window],
        ens_t[i * args.window:(i + 1) * args.window], grid)
        for i in range(n_win)]
    lats, zbias = D.zonal_mean_bias(htraj["t"], ens_t, grid)
    p_h = D.precip_stats(htraj["precc"], grid)
    p_r = D.precip_stats(members[0]["precc"], grid)
    drift_h = D.drift(htraj["t"], grid)
    micro = D.microphysics_checks(htraj["qn"], htraj["t"], htraj["precc"])

    # ---- 5. figures --------------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figdir = os.path.join(args.out, "figures")
    os.makedirs(figdir, exist_ok=True)

    def style(ax):
        ax.grid(True, color="#e6e4df", linewidth=0.6, zorder=0)
        ax.set_axisbelow(True)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.arange(args.steps) / 72.0, growth, color=C_HYBRID, lw=2,
            label="hybrid vs ensemble mean")
    for mi in range(1, args.members):
        pg = D.error_growth(members[mi]["t"], members[0]["t"], grid)
        ax.plot(np.arange(args.steps) / 72.0, pg, color=C_ENSEMBLE, lw=1,
                alpha=0.7,
                label="ensemble spread" if mi == 1 else None)
    ax.axhline(floor, color=C_FLOOR, lw=2, ls="--", label="noise floor")
    ax.set_xlabel("simulated months")
    ax.set_ylabel("weighted T RMSE [K]")
    ax.set_title("Error growth: hybrid run vs reference ensemble")
    ax.legend(frameon=False)
    style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, "online_error_growth.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 4))
    lim = np.nanmax(np.abs(zbias)) or 1.0
    pc = ax.pcolormesh(lats, np.arange(60), zbias.T, cmap="RdBu_r",
                       vmin=-lim, vmax=lim)
    ax.invert_yaxis()  # level 0 = top of atmosphere
    ax.set_xlabel("latitude")
    ax.set_ylabel("model level (surface at bottom)")
    ax.set_title("Zonal-mean T bias, hybrid - ensemble mean [K]")
    fig.colorbar(pc, ax=ax, label="bias [K]")
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, "online_zonal_bias.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    xs = np.arange(n_win)
    ax.bar(xs - 0.18, win_rmse, width=0.36, color=C_HYBRID, zorder=3,
           label="hybrid")
    ax.bar(xs + 0.18, [floor] * n_win, width=0.36, color=C_FLOOR, zorder=3,
           label="noise floor")
    ax.set_xticks(xs, [f"m{i + 1}" for i in xs])
    ax.set_ylabel("weighted T RMSE [K]")
    ax.set_title("Monthly online RMSE")
    ax.legend(frameon=False)
    style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, "online_monthly_rmse.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    bins = np.linspace(0.0, max(p_h["p99"], p_r["p99"]) * 1.2 + 1e-9, 40)
    ax.hist(np.ravel(members[0]["precc"]), bins=bins, color=C_ENSEMBLE,
            alpha=0.75, label="reference", zorder=3)
    ax.hist(np.ravel(htraj["precc"]), bins=bins, color=C_HYBRID, alpha=0.75,
            label="hybrid", zorder=3)
    ax.set_yscale("log")
    ax.set_xlabel("PRECC")
    ax.set_ylabel("count (log)")
    ax.set_title("Precipitation distribution")
    ax.legend(frameon=False)
    style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, "online_precip.png"), dpi=120)
    plt.close(fig)

    # ---- 6. report ----------------------------------------------------------
    lines = [
        "# Online evaluation: hybrid rollout vs perturbed-IC ensemble",
        "",
        "The workflow of the reference's online evaluation notebooks "
        "(online_testing/evaluation/*.ipynb) run end to end on this "
        "framework: a trained + wrapped v5 U-Net is coupled through the "
        "rollout driver and judged against a "
        f"{args.members}-member perturbed-IC ensemble of the oracle "
        "emulator (the MMF stand-in; real E3SM output replaces it "
        "unchanged).  Produced by `python scripts/online_eval.py`.",
        "",
        f"- rollout: {args.steps} steps x {ncol} columns "
        f"(1200 s steps; windows of {args.window})",
        f"- U-Net: {args.channels} channels, trained {args.train_steps} "
        f"steps (final loss {train_loss:.4f})",
        "",
        "| metric | hybrid | reference ensemble |",
        "|---|---|---|",
        f"| ensemble noise floor (T RMSE, K) | -- | {floor:.4f} |",
    ]
    for i, r in enumerate(win_rmse):
        lines.append(f"| month {i + 1} T RMSE (K) | {r:.4f} | "
                     f"{floor:.4f} (floor) |")
    lines += [
        f"| T drift (K) | {drift_h:.4f} | "
        f"{D.drift(members[0]['t'], grid):.4f} |",
        f"| precip mean | {p_h['mean']:.3e} | {p_r['mean']:.3e} |",
        f"| precip p99 | {p_h['p99']:.3e} | {p_r['p99']:.3e} |",
        f"| negative-precip fraction | {p_h['frac_negative']:.4f} | "
        f"{p_r['frac_negative']:.4f} |",
        f"| negative-qn fraction | {micro['frac_negative_qn']:.4f} | -- |",
        "",
        "![error growth](figures/online_error_growth.png)",
        "![zonal bias](figures/online_zonal_bias.png)",
        "![monthly rmse](figures/online_monthly_rmse.png)",
        "![precip](figures/online_precip.png)",
        "",
        "Reading: a coupling-grade model keeps the monthly RMSE within a "
        "small factor of the noise floor and the error-growth curve "
        "saturating rather than diverging; the zonal bias map localizes "
        "systematic errors by latitude/level (reference figures: "
        "monthly-online-rmse-visualization.ipynb cells 5-7).",
    ]
    report = os.path.join(args.out, "ONLINE_EVAL.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {report} (+4 figures in {figdir})")
    return {"floor": floor, "win_rmse": win_rmse, "drift": drift_h,
            "report": report}


if __name__ == "__main__":
    main()
