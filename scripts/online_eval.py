#!/usr/bin/env python
"""End-to-end online evaluation: month-scale hybrid rollout vs ensemble.

The framework equivalent of the reference's five online-evaluation
notebooks (online_testing/evaluation/*.ipynb, e.g.
monthly-online-rmse-visualization.ipynb cells 5-7): a coupled ("hybrid")
run is judged against a small ensemble of reference-model runs started
from perturbed initial conditions, whose spread is the irreducible noise
floor.  Default scale is TRUE months: 6480 steps of 1200 s = 90 simulated
days, diagnosed in calendar windows of 2160 steps (30 days).

Without E3SM in the image, the MMF is played by an ORACLE emulator: a
fixed synthetic tendency map rolled out by the same HybridDriver.  The
host model's dynamics -- which in the real coupled system continually
forces columns back toward a bounded climate -- is played by a shared
Newtonian-relaxation + diurnal-cycle forcing (driver.newtonian_relaxation),
identical for every run.  Under it the oracle system is chaotic with a
saturating attractor (perturbed-IC members diverge 0.05 K -> ~13 K and
then plateau), i.e. it has the structure the online test needs.

The candidate is a v5 U-Net trained ON-MANIFOLD: states are sampled from
oracle rollouts (the driver's collect_features path), augmented with
jittered copies whose targets are re-queried from the oracle -- the
standard stabilization for autoregressive emulators (the model learns the
restoring tendency on the tube *around* the attractor it will actually
visit when its own errors perturb the state).

Diagnostics:
  1. monthly-MEAN weighted T RMSE vs the ensemble, against the pairwise
     member floor -- the reference's actual monthly metric (computed on
     h0 monthly-mean output, not instantaneous states).  Time-averaging
     collapses chaotic noise, so this is the bias-sensitive,
     coupling-grade-deciding number.
  2. instantaneous error growth (saturating vs diverging)
  3. zonal-mean bias map, precipitation statistics, drift, microphysics
  4. figures + a markdown report with an explicit PASS/FAIL verdict
     against the stated criterion (monthly-mean RMSE <= 1.5x floor,
     saturating growth).

Usage: python scripts/online_eval.py   (full 90-day run, ~real TPU)
       python scripts/online_eval.py --steps 216 --window 72 ...  (smoke)
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

STEPS_PER_DAY = 72  # 86400 s / 1200 s


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


def segmented_rollout(driver, params, state0, n_steps, seg, keys,
                      collect=False, label=None):
    """Run a long rollout in fixed-size segments, offloading each
    segment's trajectory to host (bounds HBM to seg x B x ~240 floats).
    Returns (final_state, {key: (n_steps, ...) np.float32})."""
    import time as _time

    host = {k: [] for k in keys}
    s = state0
    done = 0
    t0 = _time.time()
    while done < n_steps:
        n = min(seg, n_steps - done)
        s, tr = driver.rollout(params, s, n, collect)
        for k in keys:
            host[k].append(np.asarray(tr[k]))
        done += n
        if label:
            print(f"  {label}: {done}/{n_steps} steps "
                  f"[{_time.time() - t0:.0f}s]", flush=True)
    return s, {k: np.concatenate(v) for k, v in host.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6480,
                    help="rollout steps (1200 s each; 6480 = 90 days = "
                         "3 true months)")
    ap.add_argument("--window", type=int, default=2160,
                    help="steps per month window (2160 = 30 days)")
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--tau-days", type=float, default=2.0,
                    help="host-dynamics Newtonian relaxation e-folding")
    ap.add_argument("--diurnal", type=float, default=1.5,
                    help="diurnal T forcing amplitude, K/day at equator")
    ap.add_argument("--collect-steps", type=int, default=None,
                    help="oracle-rollout steps per collection run for the "
                         "training set (auto from train volume if unset)")
    ap.add_argument("--collect-rollouts", type=int, default=2)
    ap.add_argument("--jitter", default="0.01,0.03",
                    help="comma list of jitter amplitudes (x feature std) "
                         "for off-manifold augmentation; empty disables")
    ap.add_argument("--seg", type=int, default=540,
                    help="rollout segment length (HBM bound)")
    ap.add_argument("--out", default="docs")
    ap.add_argument("--cache", default=None,
                    help="directory for phase artifacts (training set, "
                         "trained params); a rerun resumes from the last "
                         "completed phase instead of redoing tunnel-bound "
                         "work")
    args = ap.parse_args(argv)

    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.eval import online_diags as D
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import (compute_exponential_lambda,
                                   compute_norms_from_data)
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.online.driver import (HybridDriver, initial_state,
                                           newtonian_relaxation)
    from climsim_tpu.online.wrapper import convert_v4_to_v5
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    t_start = time.time()
    spec5, spec4 = get_varspec("v5"), get_varspec("v4")
    grid = load_default_grid()
    ncol = grid.ncol
    sl_icol = spec5.input_slices["icol"]

    # ---- 1. oracle "MMF" + shared host dynamics --------------------------
    oracle_wrap, oracle_v5, fit_std = make_oracle_wrapper(spec5, spec4)
    x_std = synthetic_inputs(spec5, 4 * ncol, grid, seed=0)
    x_std[:, sl_icol] = (np.arange(x_std.shape[0]) % ncol + 1)[:, None]
    fit_std(x_std)  # FROZEN: part of the oracle system's definition

    x0 = synthetic_inputs(spec4, ncol, grid, seed=3)
    s_clim = initial_state(x0, grid)
    forcing = newtonian_relaxation(
        np.asarray(s_clim.t), np.asarray(s_clim.q1), np.asarray(s_clim.u),
        tau_steps=args.tau_days * STEPS_PER_DAY, lat=grid.lat,
        diurnal_amp_k_per_day=args.diurnal)
    oracle_driver = HybridDriver(oracle_wrap, grid, dyn_forcing=forcing)

    # ---- 2. on-manifold training set from oracle rollouts ----------------
    jit_amps = [float(a) for a in args.jitter.split(",") if a.strip()]
    n_copies = 1 + len(jit_amps)
    collect_steps = args.collect_steps or max(4, min(
        2700, args.train_steps * args.batch
        // (ncol * args.collect_rollouts * n_copies)))
    seg = min(args.seg, collect_steps)
    rng = np.random.default_rng(7)

    cache_data = cache_params = None
    if args.cache:
        os.makedirs(args.cache, exist_ok=True)
        tag = (f"c{collect_steps}x{args.collect_rollouts}"
               f"_j{args.jitter.replace(',', '-')}")
        cache_data = os.path.join(args.cache, f"trainset_{tag}.npz")
        cache_params = os.path.join(
            args.cache, f"params_{tag}_ch{args.channels}"
                        f"_t{args.train_steps}_b{args.batch}.pkl")

    if cache_data and os.path.exists(cache_data):
        blob = np.load(cache_data)
        x, y = blob["x"], blob["y"]
        # consume the same host-RNG draws the build path would have, so
        # the later rollout IC perturbations are identical either way
        for _ in range(args.collect_rollouts):
            rng.standard_normal((ncol, 60), dtype=np.float64)
        print(f"training set: {x.shape[0]} samples (cache hit) "
              f"[{time.time() - t_start:.0f}s]")
    else:
        xs5 = []
        for r in range(args.collect_rollouts):
            xr = x0.copy()
            # spread collection ICs wider than the 0.05 K evaluation
            # perturbation: the training set should cover the basin
            xr[:, spec4.input_slices["state_t"]] += \
                rng.standard_normal((ncol, 60)).astype(np.float32) * 0.5
            _, tr = segmented_rollout(oracle_driver, None,
                                      initial_state(xr, grid),
                                      collect_steps, seg, ["x4"],
                                      collect=True,
                                      label=f"collect[{r}]")
            xs5.append(convert_v4_to_v5(
                tr["x4"].reshape(-1, spec4.input_len)).astype(np.float32))
            print(f"collection rollout {r}: {collect_steps} steps "
                  f"({xs5[-1].shape[0]} column samples)")
        x_clean = np.concatenate(xs5)

        # jitter augmentation: re-query the oracle at perturbed states so
        # the model learns correct tendencies on the tube around the
        # attractor
        col_std = (x_clean.std(axis=0, keepdims=True) + 1e-12).astype(
            np.float32)
        parts = [x_clean]
        jrng = np.random.default_rng(17)
        for amp in jit_amps:
            # float32 RNG directly: half the bytes, ~2x faster on host
            noise = jrng.standard_normal(x_clean.shape, dtype=np.float32)
            noise *= np.float32(amp) * col_std
            noise += x_clean
            noise[:, sl_icol] = x_clean[:, sl_icol]  # icol: categorical
            parts.append(noise)
        x = np.concatenate(parts)
        del parts
        print(f"jitter augmentation done [{time.time() - t_start:.0f}s]")

        def oracle_host(xa, bs=65536):
            return np.concatenate([
                np.asarray(oracle_v5(jnp.asarray(xa[i:i + bs])))
                for i in range(0, xa.shape[0], bs)])

        y = oracle_host(x)
        print(f"training set: {x.shape[0]} samples "
              f"({len(jit_amps)} jitter copies) "
              f"[{time.time() - t_start:.0f}s]")
        if cache_data:
            np.savez(cache_data, x=x, y=y)
            print(f"cached training set -> {cache_data}")

    n_norm = min(x.shape[0], 200_000)
    stats = compute_norms_from_data(spec5, x[:n_norm], y[:n_norm])
    stats = dataclasses.replace(stats, lbd_qn=compute_exponential_lambda(
        x[:n_norm, spec5.input_slices["state_qn"]]))

    # ---- 3. train the candidate v5 U-Net + wrap --------------------------
    tr = recipes.unet_trainer(
        spec5, stats, (x[:args.batch], y[:args.batch]), jax.random.PRNGKey(0),
        steps_per_epoch=max(args.train_steps, 1),
        model_kw=dict(model_channels=args.channels, channel_mult=(1, 2, 2),
                      num_blocks=2, attn_resolutions=(16,),
                      output_prune=True))
    state = tr.state
    if cache_params and os.path.exists(cache_params):
        import pickle

        with open(cache_params, "rb") as f:
            blob = pickle.load(f)
        params = jax.tree.map(jnp.asarray, blob["params"])
        state = state.replace(params=params)
        train_loss = blob["loss"]
        print(f"trained params: cache hit ({cache_params}, "
              f"loss {train_loss:.5f})")
    else:
        n_tr = x.shape[0]
        trng = np.random.default_rng(23)
        order = trng.permutation(n_tr)
        pos = 0
        loss_ema = None
        for i in range(args.train_steps):
            if pos + args.batch > n_tr:
                order = trng.permutation(n_tr)
                pos = 0
            idx = order[pos:pos + args.batch]
            pos += args.batch
            state, m = tr.train_step(state, x[idx], y[idx])
            if i % 200 == 0 or i == args.train_steps - 1:
                l = float(m["loss"])
                loss_ema = (l if loss_ema is None
                            else 0.7 * loss_ema + 0.3 * l)
                print(f"step {i}: loss {l:.5f}")
        train_loss = loss_ema if loss_ema is not None else float("nan")
        print(f"trained {args.train_steps} steps, loss(ema) "
              f"{train_loss:.5f} [{time.time() - t_start:.0f}s]")
        if cache_params:
            import pickle

            with open(cache_params, "wb") as f:
                pickle.dump({"params": jax.tree.map(np.asarray,
                                                    state.params),
                             "loss": train_loss}, f)
            print(f"cached params -> {cache_params}")
    hybrid_wrap = W.make_wrapper(
        lambda p, xn: tr.model.apply(p, xn), stats,
        W.WrapperConfig(input_version="v4"))

    # ---- 4. rollouts (same IC + shared host dynamics for all runs) -------
    keys_m = ["t", "precc"]
    keys_h = ["t", "qn", "precc", "water_res"]
    members = []
    for mi in range(args.members):
        xm = x0.copy()
        if mi > 0:  # perturbed initial conditions (reference: perturbed seeds)
            xm[:, spec4.input_slices["state_t"]] += \
                0.05 * rng.standard_normal((ncol, 60)).astype(np.float32)
        _, traj = segmented_rollout(oracle_driver, None,
                                    initial_state(xm, grid), args.steps,
                                    min(args.seg, args.steps), keys_m,
                                    label=f"member[{mi}]")
        members.append(traj)
        print(f"ensemble member {mi}: {args.steps}-step rollout done "
              f"[{time.time() - t_start:.0f}s]")

    hybrid_driver = HybridDriver(hybrid_wrap, grid, dyn_forcing=forcing)
    _, htraj = segmented_rollout(hybrid_driver, state.params,
                                 initial_state(x0, grid), args.steps,
                                 min(args.seg, args.steps), keys_h,
                                 label="hybrid")
    print(f"hybrid rollout done [{time.time() - t_start:.0f}s]")

    # ---- 5. diagnostics ---------------------------------------------------
    member_ts = [m["t"] for m in members]
    ens_t = np.mean(member_ts, axis=0)
    floor_inst = D.ensemble_noise_floor(member_ts, grid)
    n_win = max(args.steps // args.window, 1)
    window = args.steps // n_win if args.steps % args.window else args.window

    # primary: monthly-MEAN RMSE vs per-window pairwise member floor
    mm_rmse = D.window_mean_rmse(htraj["t"], ens_t, grid, window)
    mm_floor = D.ensemble_window_floor(member_ts, grid, window)
    ratios = mm_rmse / np.maximum(mm_floor, 1e-12)

    growth = D.error_growth(htraj["t"], ens_t, grid)
    win_inst = [D.weighted_rmse(
        htraj["t"][i * window:(i + 1) * window],
        ens_t[i * window:(i + 1) * window], grid) for i in range(n_win)]

    # saturation: last quarter of the growth curve flat vs third quarter
    q = max(args.steps // 4, 1)
    g_late, g_mid = growth[-q:].mean(), growth[-2 * q:-q].mean()
    saturating = bool(g_late <= 1.2 * max(g_mid, 1e-12))
    within_floor = bool(np.all(ratios <= 1.5))
    verdict = "PASS" if (saturating and within_floor) else "FAIL"

    lats, zbias = D.zonal_mean_bias(htraj["t"], ens_t, grid)
    p_h = D.precip_stats(htraj["precc"], grid)
    p_r = D.precip_stats(members[0]["precc"], grid)
    drift_h = D.drift(htraj["t"], grid)
    micro = D.microphysics_checks(htraj["qn"], htraj["t"], htraj["precc"])

    days = args.steps / STEPS_PER_DAY
    win_days = window / STEPS_PER_DAY

    # ---- 6. figures --------------------------------------------------------
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

    t_axis = np.arange(args.steps) / STEPS_PER_DAY
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t_axis, growth, color=C_HYBRID, lw=1.5,
            label="hybrid vs ensemble mean")
    for mi in range(1, args.members):
        pg = D.error_growth(members[mi]["t"], members[0]["t"], grid)
        ax.plot(t_axis, pg, color=C_ENSEMBLE, lw=1, alpha=0.7,
                label="ensemble spread" if mi == 1 else None)
    ax.axhline(floor_inst, color=C_FLOOR, lw=2, ls="--",
               label="instantaneous noise floor")
    ax.set_xlabel("simulated days")
    ax.set_ylabel("weighted T RMSE [K]")
    ax.set_title(f"Error growth over {days:.0f} days: "
                 f"{'saturating' if saturating else 'diverging'}")
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
    ax.bar(xs - 0.18, mm_rmse, width=0.36, color=C_HYBRID, zorder=3,
           label="hybrid (monthly-mean RMSE)")
    ax.bar(xs + 0.18, mm_floor, width=0.36, color=C_FLOOR, zorder=3,
           label="member floor (monthly-mean)")
    ax.plot(xs, 1.5 * mm_floor, color=C_ENSEMBLE, lw=1.5, ls=":",
            marker="_", ms=20, label="1.5x floor (criterion)")
    ax.set_xticks(xs, [f"month {i + 1}\n({win_days:.0f} d)" for i in xs])
    ax.set_ylabel("weighted T RMSE of monthly means [K]")
    ax.set_title(f"Monthly online RMSE -- {verdict}")
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

    # ---- 7. report ----------------------------------------------------------
    lines = [
        "# Online evaluation: month-scale hybrid rollout vs ensemble",
        "",
        "The workflow of the reference's online evaluation notebooks "
        "(online_testing/evaluation/*.ipynb) run end to end on this "
        "framework: a trained + wrapped v5 U-Net is coupled through the "
        "rollout driver and judged against a "
        f"{args.members}-member perturbed-IC ensemble of the oracle "
        "emulator (the MMF stand-in; real E3SM output replaces it "
        "unchanged).  All runs share the same prescribed host dynamics "
        f"(Newtonian relaxation, tau = {args.tau_days:g} days, + "
        f"{args.diurnal:g} K/day diurnal cycle), as the real host model "
        "is shared between MMF and hybrid runs.  Produced by "
        "`python scripts/online_eval.py`.",
        "",
        f"- rollout: {args.steps} steps x {ncol} columns at 1200 s = "
        f"**{days:.0f} simulated days**; windows of {window} steps "
        f"= {win_days:.0f} days each",
        f"- U-Net: {args.channels} channels, trained {args.train_steps} "
        f"steps on {x.shape[0]} on-manifold samples "
        f"(oracle-rollout states + {len(jit_amps)} jittered copies; "
        f"final loss {train_loss:.4f})",
        "",
        f"## Verdict: {verdict}",
        "",
        "Criterion (coupling-grade): every monthly-mean RMSE within "
        "1.5x the ensemble floor, and instantaneous error growth "
        "saturating rather than diverging.",
        f"- monthly-mean RMSE / floor ratios: "
        + ", ".join(f"{r:.2f}" for r in ratios)
        + f" (all <= 1.5: {'yes' if within_floor else 'NO'})",
        f"- growth saturation: last-quarter mean {g_late:.3f} K vs "
        f"previous-quarter {g_mid:.3f} K "
        f"({'saturating' if saturating else 'DIVERGING'})",
        "",
        "| metric | hybrid | reference ensemble |",
        "|---|---|---|",
        f"| instantaneous noise floor (T RMSE, K) | -- | {floor_inst:.4f} |",
    ]
    for i in range(n_win):
        lines.append(
            f"| month {i + 1} ({win_days:.0f} d) monthly-mean T RMSE (K) | "
            f"{mm_rmse[i]:.4f} | {mm_floor[i]:.4f} (floor) |")
    for i in range(n_win):
        lines.append(
            f"| month {i + 1} ({win_days:.0f} d) instantaneous T RMSE (K) | "
            f"{win_inst[i]:.4f} | {floor_inst:.4f} (floor) |")
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
        "Reading: the monthly-mean RMSE is the reference's actual online "
        "metric (RMSE of h0 monthly-mean fields vs the MMF ensemble, "
        "monthly-online-rmse-visualization.ipynb cells 5-7).  Because a "
        "chaotic system drives any two runs apart to the attractor spread, "
        "the *instantaneous* RMSE saturates at the (large) noise floor for "
        "good and bad models alike; the *monthly-mean* RMSE averages that "
        "internal variability away and exposes systematic model bias -- a "
        "coupling-grade model keeps it within a small factor of the "
        "same-statistic member floor, with instantaneous error growth "
        "saturating rather than diverging.",
    ]
    report = os.path.join(args.out, "ONLINE_EVAL.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {report} (+4 figures in {figdir}) "
          f"[{time.time() - t_start:.0f}s total]")
    print(f"verdict: {verdict}  ratios "
          + " ".join(f"{r:.2f}" for r in ratios))
    return {"floor": float(np.mean(mm_floor)), "win_rmse": list(mm_rmse),
            "ratios": list(ratios), "drift": drift_h, "verdict": verdict,
            "saturating": saturating, "report": report}


if __name__ == "__main__":
    main()
