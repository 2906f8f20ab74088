#!/usr/bin/env python
"""Online coupling demo: train a v5 model, wrap it, export it, roll it out.

The framework equivalent of the online_testing workflow: train (briefly), a
wrapper with fused physics constraints, StableHLO export, a multi-step
hybrid rollout, and online diagnostics -- all on synthetic data.
"""

import argparse

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12,
                    help="rollout steps (1200 s each)")
    ap.add_argument("--train-steps", type=int, default=20)
    ap.add_argument("--export", help="path to save the StableHLO wrapper")
    args = ap.parse_args()

    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.eval import online_diags as D
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.online.driver import HybridDriver, initial_state
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    spec5 = get_varspec("v5")
    spec4 = get_varspec("v4")
    grid = load_default_grid()

    # 1. (briefly) train a small coupling-grade model on synthetic pairs;
    # norms computed from the data itself (swap in load_asset_norms("v5")
    # when training on the real dataset)
    from climsim_tpu.norms import compute_norms_from_data

    x, y = synthetic_split(spec5, n=4 * 384, grid=grid, seed=0)
    x[:, spec5.input_slices["icol"]] = (
        np.arange(x.shape[0]) % 384 + 1)[:, None]
    # qn_transform=True fits the cloud exponential-transform rate and
    # computes the qn sub/div in transformed space (the wrapper chain)
    stats = compute_norms_from_data(spec5, x, y, qn_transform=True)
    tr = recipes.online_mlp_trainer(spec5, stats, (x, y),
                                    jax.random.PRNGKey(0), hidden=(256,),
                                    steps_per_epoch=args.train_steps)
    state = tr.state
    for i in range(args.train_steps):
        s = (i * 256) % (x.shape[0] - 256)
        state, m = tr.train_step(state, x[s:s + 256], y[s:s + 256])
    print(f"trained {args.train_steps} steps, loss {float(m['loss']):.4f}")

    # 2. wrap: raw v4 state in -> raw (B, 368) tendencies out
    wrap = W.make_wrapper(lambda p, xn: tr.model.apply(p, xn), stats)
    if args.export:
        W.export_aot(wrap, state.params, 384, spec4.input_len, args.export)
        print(f"exported StableHLO wrapper to {args.export}")

    # 3. hybrid rollout: step 384 host columns with emulator tendencies
    x0 = synthetic_split(spec4, n=384, grid=grid, seed=3)[0]
    driver = HybridDriver(wrap, grid)
    final, traj = driver.rollout(state.params, initial_state(x0), args.steps)
    t_traj = np.asarray(traj["t"])
    qn_traj = np.asarray(traj["qn"])
    precc = np.asarray(traj["precc"])
    print(f"rollout: {args.steps} steps x 384 columns, "
          f"T range [{t_traj.min():.1f}, {t_traj.max():.1f}] K")

    # 4. online diagnostics -- for a briefly-trained toy model these
    # *should* report drift/instability; that detection is their job
    # (a coupling-grade model holds T within a few K over a month)
    ref = np.repeat(t_traj[:1], t_traj.shape[0], axis=0)  # persistence ref
    print("T drift vs persistence (weighted RMSE):",
          round(D.weighted_rmse(t_traj, ref, grid), 4))
    print("precip stats:", D.precip_stats(precc, grid))
    print("microphysics:", D.microphysics_checks(qn_traj, t_traj, precc))
    wres = np.asarray(traj["water_res"])
    print(f"water-budget residual |mean| per step: "
          f"{np.abs(wres).mean(axis=1).round(6).tolist()}")
    stable = abs(D.drift(t_traj, grid)) < 10.0
    print(f"stability verdict: {'stable' if stable else 'UNSTABLE'} "
          "(expected UNSTABLE for an undertrained demo model)")


if __name__ == "__main__":
    main()
