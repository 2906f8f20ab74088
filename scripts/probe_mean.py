#!/usr/bin/env python
"""Diagnose the coupled T/Q/U bias under the systematic-physics oracle.

Loads the params/stats cached by a `scripts/online_eval.py --cache ...`
run, rebuilds the identical oracle + wrapper pair, and separates the two
candidate failure modes:

  (a) SUPERVISED mean error: per-level mean of (model - oracle) tendency
      over on-attractor oracle states.  The coupled equilibrium offset is
      ~tau x this error; if it is a sizeable fraction of the oracle's
      mean profile, the model never learned the systematic physics.
  (b) COUPLED feedback: if (a) is small but the hybrid still sits far
      from the ensemble, the bias comes from the closed loop (the model
      is evaluated off-manifold on its own biased states).

Usage: python scripts/probe_mean.py <params.pkl> <stats.npz>
       [--oracle-mean 3] [--spinup-days 30] [--channels 64]
"""

import argparse
import os
import pickle
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from online_eval import (STEPS_PER_DAY, build_balanced_forcing,  # noqa: E402
                         make_oracle_wrapper)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("stats")
    ap.add_argument("--oracle-mean", type=float, default=3.0)
    ap.add_argument("--oracle-scale", type=float, default=0.1)
    ap.add_argument("--oracle-gain", type=float, default=64.0)
    ap.add_argument("--tau-days", type=float, default=2.0)
    ap.add_argument("--diurnal", type=float, default=1.5)
    ap.add_argument("--spinup-days", type=float, default=30.0)
    ap.add_argument("--hybrid-days", type=float, default=30.0)
    ap.add_argument("--channels", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from climsim_tpu import physics
    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import NormStats
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.online.driver import HybridDriver, initial_state
    from climsim_tpu.train import recipes
    from climsim_tpu.utils.cache import enable_compile_cache
    from climsim_tpu.varspec import get_varspec

    enable_compile_cache()
    spec5, spec4 = get_varspec("v5"), get_varspec("v4")
    grid = load_default_grid()
    ncol = grid.ncol
    f32 = jnp.float32

    oracle_wrap, oracle_v5, fit_std, mean_prof = make_oracle_wrapper(
        spec5, spec4, tend_scale=args.oracle_scale, gain=args.oracle_gain,
        mean_gain=args.oracle_mean)
    sl_icol5 = spec5.input_slices["icol"]
    x_std = synthetic_inputs(spec5, 4 * ncol, grid, seed=0)
    x_std[:, sl_icol5] = (np.arange(x_std.shape[0]) % ncol + 1)[:, None]
    fit_std(x_std)

    x0 = synthetic_inputs(spec4, ncol, grid, seed=3)
    s_clim = initial_state(x0, grid)
    tau_sec = args.tau_days * STEPS_PER_DAY * physics.DT_TIMESTEP
    # the identical balanced forcing as the eval -- shared constructor
    forcing = build_balanced_forcing(
        s_clim, mean_prof, args.tau_days, args.diurnal, grid)
    oracle_driver = HybridDriver(oracle_wrap, grid, dyn_forcing=forcing)

    # stats + params from the cached run
    blob = np.load(args.stats)
    stats = NormStats(inp_sub=blob["sub"], inp_div=blob["div"],
                      out_scale=blob["osc"], lbd_qn=blob["lbd"])
    with open(args.params, "rb") as f:
        pb = pickle.load(f)
    params = jax.tree.map(jnp.asarray, pb["params"])

    xb0 = jnp.asarray(synthetic_inputs(spec5, 256, grid, seed=5))
    tr = recipes.unet_trainer(
        spec5, stats, (xb0.astype(f32), oracle_v5(xb0.astype(f32))),
        jax.random.PRNGKey(0), steps_per_epoch=1,
        model_kw=dict(model_channels=args.channels, channel_mult=(1, 2, 2),
                      num_blocks=2, attn_resolutions=(16,),
                      output_prune=True))
    hybrid_wrap = W.make_wrapper(
        lambda p, xn: tr.model.apply(p, xn), stats,
        W.WrapperConfig(input_version="v4"))
    hybrid_driver = HybridDriver(hybrid_wrap, grid, dyn_forcing=forcing)

    # --- spin the TRUE system onto its attractor ------------------------
    seg = 540
    s = initial_state(x0, grid)
    spin = int(round(args.spinup_days * STEPS_PER_DAY / seg))
    for k in range(spin):
        s, _ = oracle_driver.rollout(None, s, seg, start_step=k * seg)
    s_attr = s
    print(f"spun {spin * seg} oracle steps", flush=True)

    # --- (a) supervised mean error on on-attractor states ---------------
    # collect states + compare wrapper outputs on them
    _, traj = oracle_driver.rollout(None, s_attr, seg,
                                    collect_features=True,
                                    start_step=spin * seg)
    x4 = np.asarray(traj["x4"]).reshape(-1, spec4.input_len)
    sel = np.random.default_rng(0).choice(len(x4), 4096, replace=False)
    xb = jnp.asarray(x4[sel], f32)
    y_or = np.asarray(oracle_wrap(None, xb))
    y_md = np.asarray(hybrid_wrap(params, xb))

    names = {"ptend_t": (slice(0, 60), "K/s"),
             "ptend_q0001": (slice(60, 120), "kg/kg/s"),
             "ptend_u": (slice(240, 300), "m/s/s")}
    print("\n(a) supervised mean-tendency error (on-attractor):")
    for v, (sl, unit) in names.items():
        tm = mean_prof.get(v, np.zeros(60))
        err = (y_md[:, sl] - y_or[:, sl]).mean(0)
        i = int(np.abs(tm).argmax())
        print(f"  {v:13s} peak true-mean {tm[i]:+.3e} {unit} @lev {i}; "
              f"model-oracle mean err @lev {i}: {err[i]:+.3e} "
              f"(tau*err = {tau_sec * err[i]:+.3f}); "
              f"max|err| {np.abs(err).max():.3e} "
              f"@lev {int(np.abs(err).argmax())} "
              f"(tau*max = {tau_sec * np.abs(err).max():.3f})")

    # --- (b) coupled equilibrium bias ------------------------------------
    sh = s_attr
    hx = None
    for k in range(int(round(args.hybrid_days * STEPS_PER_DAY / seg))):
        sh, htraj = hybrid_driver.rollout(params, sh, seg,
                                          start_step=(spin + k) * seg)
        hx = htraj
    so = s_attr
    for k in range(int(round(args.hybrid_days * STEPS_PER_DAY / seg))):
        so, otraj = oracle_driver.rollout(None, so, seg,
                                          start_step=(spin + k) * seg)
    th = np.asarray(hx["t"]).mean((0, 1))   # last-seg time+col mean per lev
    to = np.asarray(otraj["t"]).mean((0, 1))
    qh = np.asarray(hx["q1"]).mean((0, 1))
    qo = np.asarray(otraj["q1"]).mean((0, 1))
    uh = np.asarray(hx["u"]).mean((0, 1))
    uo = np.asarray(otraj["u"]).mean((0, 1))
    print(f"\n(b) coupled per-level state bias after "
          f"{args.hybrid_days:g} d (hybrid - oracle run):")
    for nm, h, o in (("T [K]", th, to), ("q1", qh, qo), ("u", uh, uo)):
        d = h - o
        i = int(np.abs(d).argmax())
        print(f"  {nm:6s} max|bias| {np.abs(d).max():.4f} @lev {i} "
              f"(hybrid {h[i]:.5g} vs oracle {o[i]:.5g}); "
              f"rms {np.sqrt((d ** 2).mean()):.4f}")
    # where taper is active vs not
    print("  T bias by region: lev<16 {:.3f}, 16-23 {:.3f}, >=24 {:.3f}"
          .format(*[float(np.abs(th - to)[a:b].mean())
                    for a, b in ((0, 16), (16, 24), (24, 60))]))


if __name__ == "__main__":
    main()
