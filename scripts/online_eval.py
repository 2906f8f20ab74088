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
identical for every run.  The production configuration (--oracle-scale
0.1, --oracle-gain 64, --tau-days 2) is tuned so the system is (a) at
PHYSICAL magnitudes -- monthly ensemble floors ~1.5 K in T, ~0.15 g/kg
in Q, ~0.15 m/s in U, the axis ranges of the reference's online plots --
and (b) genuinely CHAOTIC on its attractor (gain sets the tendency
Jacobian independently of amplitude; without it a small-amplitude
relaxation system is contracting and its "ensemble spread" is just the
shared equilibration transient).  Members and hybrid start from
INDEPENDENT spun-up states (--spinup-days, perturbation applied before
spin-up), as the reference's ensemble members are independent spun-up
E3SM runs.

The candidate is a v5 U-Net trained ON-MANIFOLD: states are sampled from
oracle rollouts (the driver's collect_features path), jitter-augmented
on the fly with labels re-queried from the oracle -- the standard
stabilization for autoregressive emulators.  Optionally followed by
differentiable K-step rollout fine-tuning through the full hybrid loop
(train/rollout_ft.py), a stage the reference structurally cannot run.

DEVICE-RESIDENT BY DESIGN: collection, training-set storage (bf16),
jitter augmentation, oracle labelling, training, fine-tuning, and every
rollout diagnostic are computed on the TPU; only KB-scale reductions
(per-step scalar curves, (ncol, 60) window sums, precipitation series)
ever cross to host.  On a remote-attached chip the host link can be
~2 MB/s for device->host; the earlier host-centric version of this
script moved ~30 GB and took hours in transfers alone.

Diagnostics:
  1. monthly-MEAN weighted RMSE of T, Q AND U vs the ensemble, each
     against its own pairwise member floor -- the reference's actual
     monthly metric covers all three fields
     (monthly-online-rmse-visualization.ipynb cells 5-7 render 'T', 'Q'
     and 'U' panels; computed on h0 monthly-mean output, not
     instantaneous states).  Time-averaging collapses chaotic noise, so
     these are the bias-sensitive, coupling-grade-deciding numbers; PASS
     requires every variable in every window within 1.5x its floor.
  2. instantaneous error growth (saturating vs diverging)
  3. zonal-mean bias map, precipitation statistics, drift, microphysics,
     column water-budget residual
  4. figures + a markdown report with an explicit PASS/FAIL verdict
     against the stated criterion (monthly-mean RMSE <= 1.5x floor,
     saturating growth).

Usage: python scripts/online_eval.py   (full 90-day run on TPU)
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


def build_balanced_forcing(s_clim, mean_prof, tau_days, diurnal, grid):
    """Relaxation + diurnal forcing whose target is shifted by -tau*mean.

    The shift BALANCES the oracle's systematic physics: the TRUE
    (oracle-coupled) system's attractor sits at the climatology ``s_clim``
    while a hybrid lacking the mean physics equilibrates tau*mean away
    from it (see make_oracle_wrapper).  This is the gate's core balancing
    invariant -- the eval (here) and the bias-attribution probe
    (scripts/probe_mean.py) MUST construct the identical forcing, so it
    lives in exactly one place.
    """
    from climsim_tpu import physics
    from climsim_tpu.online.driver import newtonian_relaxation

    tau_sec = tau_days * STEPS_PER_DAY * physics.DT_TIMESTEP
    clim_t = np.asarray(s_clim.t) - tau_sec * mean_prof.get(
        "ptend_t", np.zeros(60))
    clim_q1 = np.asarray(s_clim.q1) - tau_sec * mean_prof.get(
        "ptend_q0001", np.zeros(60))
    clim_u = np.asarray(s_clim.u) - tau_sec * mean_prof.get(
        "ptend_u", np.zeros(60))
    return newtonian_relaxation(
        clim_t, clim_q1, clim_u, tau_steps=tau_days * STEPS_PER_DAY,
        lat=grid.lat, diurnal_amp_k_per_day=diurnal)


def make_oracle_wrapper(spec5, spec4, seed: int = 1,
                        tend_scale: float = 1.0, gain: float = 1.0,
                        mean_gain: float = 0.0):
    """The synthetic tendency map as a coupling-contract emulator.

    Reimplements data.synthetic.synthetic_targets as a pure jax function
    with FROZEN standardization (mu/sd from the training inputs), then
    expands the v5 (B, 308) output to the (B, 368) coupling contract by
    repartitioning dqn into (dqc, dqi) at the advanced temperature --
    physics.repartition_clouds, the same rule the real wrapper applies.

    The oracle consumes the PRODUCTION FEATURE VIEW -- stratospheric qn
    pruned (top 15 levels), RH clipped to its physical [0, 1.2] range --
    frozen as part of the system definition.  The real MMF's tendencies
    do not depend on the features the reference's production transform
    prunes (that is why it prunes them: climsim_datapip.py:136-151), so
    a faithful stand-in must be a function of the same view; an oracle
    reading raw unpruned features is unlearnable-in-principle from the
    production inputs (measured: 1.85 normalized RMSE of irreducible
    label spread from the pruned coordinates alone).

    ``tend_scale`` multiplies every output scale.  The climate's
    equilibrium anomaly amplitude is ~tau x tendency amplitude, so this
    knob (with --tau-days) sets the physical magnitude of the stand-in
    climate: the production default 0.1 (with gain 64, tau = 2 days)
    gives perturbed-IC monthly T floors of O(1 K) -- the magnitude of the
    reference's real online RMSE plots
    (monthly-online-rmse-visualization.ipynb axes) -- instead of the 15 K
    noise-with-a-relaxation-term of scale 1.0.

    ``gain`` steepens the tendency map (inside the tanh) WITHOUT raising
    its amplitude: the state-dependence (Jacobian) of the tendencies
    scales with gain while outputs stay bounded by the scales above.
    Chaos requires the tendency Jacobian to beat the relaxation rate;
    at small tend_scale the gain-1 map is contracting on its attractor
    (measured: 0.05 K IC perturbations DECAY after spin-up -- the system
    had no internal variability, so the ensemble floor was an artifact
    of the shared equilibration transient).  gain > 1 restores sustained
    chaos at physical amplitude -- the regime the real atmosphere is in.

    ``mean_gain`` adds a SYSTEMATIC (state-independent) component to the
    T / q1 / u tendencies, ``mean_gain x scale x`` a smooth vertical
    profile -- the analog of the MMF physics' mean heating / drying /
    drag, which in the real atmosphere is larger than its anomalies and
    is balanced by dynamics.  The caller must shift the host relaxation
    target by ``-tau x mean`` (returned as the 4th value, per-second
    units) so the TRUE system's attractor stays at the climatology while
    a hybrid whose emulator misses the mean physics equilibrates
    ``tau x mean`` away from it.  This is what makes the monthly gate
    DISCRIMINATIVE: without it the stand-in physics is pure mean-zero
    anomaly dynamics, monthly means are pinned by the shared relaxation,
    and even an untrained (random-init) emulator passes (measured:
    ratios 0.90-1.04 at mean_gain 0 -- docs/ONLINE_TUNING.md).  With it,
    omitting the physics costs a bias of several floors (the real MMF's
    behavior: remove convection and the climate drifts).
    """
    import jax.numpy as jnp

    from climsim_tpu import physics
    from climsim_tpu.online.wrapper import convert_v4_to_v5
    from climsim_tpu.varspec import var_len

    rng = np.random.default_rng(seed)
    d_in, d_out = spec5.input_len, spec5.output_len
    w1 = rng.standard_normal((d_in, 64)) / np.sqrt(d_in)
    w2 = rng.standard_normal((64, d_out)) / np.sqrt(64)

    sl_qn = spec5.input_slices["state_qn"]
    sl_rh = spec5.input_slices["state_rh"]

    def view_np(x):
        """Raw-space production view (frozen oracle input contract)."""
        x = np.array(x, np.float32, copy=True)
        x[:, sl_qn.start: sl_qn.start + 15] = 0.0
        x[:, sl_rh] = np.clip(x[:, sl_rh], 0.0, 1.2)
        return x

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
    scale *= tend_scale
    scal_mask = np.zeros(d_out)
    for v in spec5.outputs:
        if var_len(v) == 1:
            scal_mask[spec5.output_slices[v]] = 1.0

    # systematic physics: smooth vertical mean-tendency profiles on the
    # HOST-RELAXED variables only (t, q1, u) -- anything else would drift
    # the unrelaxed state components without bound in the oracle system
    # itself.  Signs: heating + drying aloft (convection), low-level
    # momentum drag; q's mean is NEGATIVE so the shifted relaxation
    # target (clim - tau*mean) stays positive at every level.
    sig = (np.arange(60) + 0.5) / 60.0
    mean_vec = np.zeros(d_out)
    mean_prof = {}  # per-second units, for the caller's target shift
    if mean_gain > 0.0:
        # MMF physics is inactive in the stratosphere -- the reference
        # zeroes the top strato_lev_out=15 output levels outright
        # (online/wrapper.py post_mask; climsim_unet's output prune), so
        # a systematic tendency there would be both unphysical and
        # UNREPRESENTABLE by the production wrapper: measured, leaving it
        # in biases the coupled run 2-4x the floor at every variable even
        # after a converged fit (docs/ONLINE_TUNING.md).  Smoothstep the
        # mean in over levels 15-23.
        lev = np.arange(60)
        taper = 0.5 - 0.5 * np.cos(
            np.pi * np.clip((lev - 15) / 8.0, 0.0, 1.0))
        prof_t = np.sin(np.pi * sig) * taper
        prof_q = -np.sin(np.pi * sig) * taper
        prof_u = -np.sin(np.pi * sig) * sig * taper  # drag peaks low
        for v, p in (("ptend_t", prof_t), ("ptend_q0001", prof_q),
                     ("ptend_u", prof_u)):
            m = mean_gain * scale[spec5.output_slices[v]] * p
            mean_vec[spec5.output_slices[v]] = m
            mean_prof[v] = m

    state = {"mu": None, "sd": None}

    def fit_standardizer(x5_raw):
        v = view_np(x5_raw)
        state["mu"] = v.mean(0, keepdims=True)
        state["sd"] = v.std(0, keepdims=True) + 1e-6

    f32 = jnp.float32  # keep the scan carry f32 even under jax_enable_x64
    w1j, w2j = jnp.asarray(w1, f32), jnp.asarray(w2, f32)
    scalej, maskj = jnp.asarray(scale, f32), jnp.asarray(scal_mask, f32)
    meanj = jnp.asarray(mean_vec, f32)

    def oracle_v5(x5_raw):
        xv = x5_raw.astype(f32)
        xv = xv.at[:, sl_qn.start: sl_qn.start + 15].set(0.0)
        xv = xv.at[:, sl_rh].set(jnp.clip(xv[:, sl_rh], 0.0, 1.2))
        z = (xv - jnp.asarray(state["mu"], f32)) \
            / jnp.asarray(state["sd"], f32)
        core = jnp.tanh(gain * (z @ w1j)) @ w2j
        y = core * scalej + meanj  # anomalies + systematic physics
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

    return wrapper, oracle_v5, fit_standardizer, mean_prof


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
    ap.add_argument("--oracle-scale", type=float, default=0.1,
                    help="multiplier on the oracle's tendency amplitudes; "
                         "with --tau-days sets the stand-in climate's "
                         "anomaly magnitude (default 0.1 with gain 64 and "
                         "tau 2 days -> monthly T floors ~1.5 K, Q "
                         "~0.15 g/kg, U ~0.15 m/s -- the magnitudes of "
                         "the reference's real online RMSE plots)")
    ap.add_argument("--collect-steps", type=int, default=None,
                    help="oracle-rollout steps per collection run for the "
                         "training set (auto from train volume if unset)")
    ap.add_argument("--collect-rollouts", type=int, default=2)
    ap.add_argument("--collect-stride", type=int, default=2,
                    help="keep every k-th collected step (consecutive "
                         "steps are highly correlated; stride trades HBM "
                         "for rollout length)")
    ap.add_argument("--jitter", default="0.01,0.03",
                    help="comma list of jitter amplitudes (x feature std); "
                         "each training row draws uniformly from "
                         "{clean} + amps, labels re-queried from the "
                         "oracle on device; empty disables")
    ap.add_argument("--seg", type=int, default=540,
                    help="rollout segment length (HBM + dispatch bound); "
                         "snapped down to a divisor of the window")
    ap.add_argument("--ft-steps", type=int, default=0,
                    help="differentiable K-step rollout fine-tune updates "
                         "after supervised training (train/rollout_ft.py); "
                         "0 disables")
    ap.add_argument("--ft-k", type=int, default=16,
                    help="rollout horizon K of the fine-tune loss")
    ap.add_argument("--ft-lr", type=float, default=1e-4)
    ap.add_argument("--chunk", type=int, default=200,
                    help="train steps fused per dispatch (lax.scan)")
    ap.add_argument("--oracle-gain", type=float, default=64.0,
                    help="steepness of the oracle tendency map (inside "
                         "the tanh): raises the Jacobian without raising "
                         "amplitude.  > 1 keeps the physically-rescaled "
                         "system chaotic on its attractor (sustained "
                         "internal variability -> a real ensemble floor)")
    ap.add_argument("--oracle-mean", type=float, default=3.0,
                    help="systematic mean-tendency component of the "
                         "oracle physics, in units of the anomaly scale "
                         "(the MMF physics' mean heating/drying/drag, "
                         "balanced by a -tau*mean shift of the host "
                         "relaxation target).  Makes the monthly gate "
                         "discriminative: a model that misses the mean "
                         "physics equilibrates tau*mean (~3 floors) off "
                         "the climate and FAILS; 0 restores the "
                         "anomaly-only system (measured: even an "
                         "untrained model passes there)")
    ap.add_argument("--spinup-days", type=float, default=180.0,
                    help="roll the oracle system this many days from the "
                         "synthetic IC before the evaluation starts and "
                         "use the final state as the shared base IC -- "
                         "the reference's ensemble starts from spun-up "
                         "E3SM states (on-attractor), not from noise; "
                         "without spin-up, month-1 windows mostly measure "
                         "the shared equilibration transient")
    ap.add_argument("--loss", default="huber",
                    choices=("huber", "mse", "mae"),
                    help="supervised training loss.  A "
                         "robust loss fits a median-like conditional "
                         "estimate; when the tendency distribution is "
                         "skewed that biases the TIME-MEAN tendency -- "
                         "invisible under a 15 K floor, decisive under a "
                         "physically-scaled 0.3 K monthly floor")
    ap.add_argument("--scheme", default="regressor",
                    choices=("regressor", "two_stage"),
                    help="two_stage = the reference's production v5 "
                         "configuration: a 3-class per-level cloud "
                         "classifier gates the regressor's qn tendency "
                         "(climsim_unet_classifier.py, thresholds from "
                         "conf/config_single.yaml:63-64).  Class 0 "
                         "silences spurious drizzle, class 1 evaporates "
                         "lingering sub-threshold cloud exactly")
    ap.add_argument("--cls-train-steps", type=int, default=2000,
                    help="classifier supervised steps (two_stage only)")
    ap.add_argument("--cls-channels", type=int, default=0,
                    help="classifier U-Net width; 0 = same as --channels")
    ap.add_argument("--threshold-class1", type=float, default=1e-9,
                    help="qn-after-step evaporation threshold [kg/kg] "
                         "(config_single.yaml:63)")
    ap.add_argument("--threshold-class2", type=float, default=1e-11,
                    help="|dqn| zero-tendency threshold [kg/kg/s / "
                         "(kg/kg)] (config_single.yaml:64)")
    ap.add_argument("--dagger-rounds", type=int, default=0,
                    help="DAgger rounds: after supervised training, roll "
                         "the CURRENT hybrid model, collect the states it "
                         "actually visits, oracle-label them on device, "
                         "and continue training on the mixture")
    ap.add_argument("--dagger-steps", type=int, default=1500,
                    help="continued train steps per DAgger round")
    ap.add_argument("--dagger-collect", type=int, default=1080,
                    help="hybrid rollout steps collected per DAgger round")
    ap.add_argument("--dagger-carry", type=int, default=0,
                    help="1: the hybrid rollout state carries over between "
                         "rounds (rounds tile one long trajectory); 0: "
                         "every round restarts from jittered ICs (A/B'd: "
                         "restarts win -- the eval's month-1 transient "
                         "dominates the criterion and fresh restarts keep "
                         "re-covering it under the current model)")
    ap.add_argument("--polish-steps", type=int, default=0,
                    help="final jitter-FREE train steps on the clean + "
                         "hybrid-visited mixture after the DAgger rounds "
                         "(sharpens on-attractor accuracy once coverage "
                         "is handled)")
    ap.add_argument("--polish-lr", type=float, default=0.0,
                    help="if > 0, the polish phase runs a FRESH Adam at "
                         "this (lower) rate -- an annealed final descent "
                         "into the minimum the high-LR phase orbits")
    ap.add_argument("--bias-correct", type=int, default=0,
                    help="hybrid rollout steps over which to estimate the "
                         "per-column climatological tendency residual "
                         "(oracle minus hybrid, on the states the hybrid "
                         "itself visits) and add it to the wrapper output "
                         "-- the flux-adjustment practice of coupled "
                         "climate modelling; uses only oracle labels on "
                         "self-visited states (the DAgger information "
                         "channel).  0 disables")
    ap.add_argument("--bias-iters", type=int, default=2,
                    help="correction refinement passes (each re-rolls the "
                         "corrected hybrid and updates the residual)")
    ap.add_argument("--bias-gain", type=float, default=0.4,
                    help="under-relaxation gain per pass: the climate's "
                         "sensitivity to a constant tendency forcing is "
                         "~tau x residual, so a full-gain update "
                         "oscillates; gamma < 1 converges the fixed-point "
                         "iteration")
    ap.add_argument("--out", default="docs")
    ap.add_argument("--cache", default=None,
                    help="directory for phase artifacts (norm stats, "
                         "trained/fine-tuned params -- all small); a rerun "
                         "resumes after the last completed phase")
    args = ap.parse_args(argv)
    if args.scheme == "two_stage":
        # fail at parse time, not after hours of collection + training
        if args.ft_steps > 0:
            ap.error("--ft-steps is not supported with --scheme two_stage "
                     "(the fine-tuner would descend through the argmax gate)")
        if args.cls_train_steps <= 0:
            ap.error("--cls-train-steps must be > 0 with --scheme two_stage")

    import itertools
    import pickle
    import time

    import jax
    import jax.numpy as jnp

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.eval import online_diags as D
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import NormStats
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.online.driver import HybridDriver, initial_state
    from climsim_tpu.online.wrapper import convert_v4_to_v5
    from climsim_tpu.train import recipes
    from climsim_tpu.utils.cache import enable_compile_cache
    from climsim_tpu.varspec import get_varspec

    enable_compile_cache()
    t_start = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    f32 = jnp.float32
    spec5, spec4 = get_varspec("v5"), get_varspec("v4")
    grid = load_default_grid()
    ncol = grid.ncol
    sl_icol5 = spec5.input_slices["icol"]

    # window/segment geometry: window divides steps, seg divides window
    n_win = max(args.steps // args.window, 1)
    window = args.steps // n_win if args.steps % args.window else args.window
    steps = n_win * window
    seg = next(d for d in range(min(args.seg, window), 0, -1)
               if window % d == 0)
    segs_per_win = window // seg
    n_segs = steps // seg
    if steps != args.steps or seg != args.seg:
        print(f"geometry snapped: steps {args.steps}->{steps}, "
              f"seg {args.seg}->{seg} ({n_win} windows x {window})")

    # ---- 1. oracle "MMF" + shared host dynamics --------------------------
    oracle_wrap, oracle_v5, fit_std, mean_prof = make_oracle_wrapper(
        spec5, spec4, tend_scale=args.oracle_scale, gain=args.oracle_gain,
        mean_gain=args.oracle_mean)
    x_std = synthetic_inputs(spec5, 4 * ncol, grid, seed=0)
    x_std[:, sl_icol5] = (np.arange(x_std.shape[0]) % ncol + 1)[:, None]
    fit_std(x_std)  # FROZEN: part of the oracle system's definition

    x0 = synthetic_inputs(spec4, ncol, grid, seed=3)
    s_clim = initial_state(x0, grid)
    forcing = build_balanced_forcing(
        s_clim, mean_prof, args.tau_days, args.diurnal, grid)
    oracle_driver = HybridDriver(oracle_wrap, grid, dyn_forcing=forcing)

    # optional on-attractor spin-up: the evaluation (members + hybrid)
    # starts from an oracle-equilibrated state instead of the synthetic
    # IC, exactly as the reference's ensemble starts from spun-up E3SM
    # states; the absolute forcing step keeps counting through the eval
    # so the diurnal phase is seamless
    spin_steps = 0
    if args.spinup_days > 0:
        spin_steps = -(-int(round(args.spinup_days * STEPS_PER_DAY))
                       // seg) * seg
    s_base = initial_state(x0, grid)  # members spin up from here (sec. 5)

    # diagnostic weights on device; MUST match the host-side metric path
    w_np = D._weights(grid, ps=1.0e5)
    w_dev = jnp.asarray(w_np, f32)
    w_sum = float(w_np.sum())

    jit_amps = [float(a) for a in args.jitter.split(",") if a.strip()]
    stride = max(args.collect_stride, 1)
    collect_steps = args.collect_steps or max(seg, min(
        3600, args.train_steps * args.batch * stride
        // (ncol * args.collect_rollouts * (1 + len(jit_amps)))))
    collect_steps = -(-collect_steps // seg) * seg  # round up to segments

    # ---- phase caches (all small: norm vectors + params) -----------------
    cache_stats = cache_params = cache_ft = cache_cls = None
    if args.cache:
        os.makedirs(args.cache, exist_ok=True)
        # o4 = oracle/system revision: o2 fixed the oracle feature view
        # + qn/rh normalization; o3 fixed the segmented-rollout diurnal
        # phase (start_step threading); o4 rescaled the climate to
        # physical magnitudes (oracle-scale 0.1, gain 64, tau 2 days ->
        # O(1 K) floors).  The host-dynamics knobs (tau, diurnal, scale)
        # are part of the key: stats/params trained under one attractor
        # must never be silently reused under different dynamics.
        # host-dynamics knobs are ALWAYS in the key (a defaults change
        # must never alias caches produced under different dynamics)
        host = f"_h{args.tau_days:g}-{args.diurnal:g}"
        osc = f"_os{args.oracle_scale:g}g{args.oracle_gain:g}"
        if args.oracle_mean > 0:
            osc += f"m{args.oracle_mean:g}t"  # t = strato-tapered profiles
        tag = (f"o4c{collect_steps}x{args.collect_rollouts}s{stride}"
               f"_j{args.jitter.replace(',', '-')}{host}{osc}")
        cache_stats = os.path.join(args.cache, f"stats_{tag}.npz")
        # r5 = training-recipe/architecture version; bump when either
        # changes so stale params under the same tag are never reused
        # (r2 cosine + weighted amp sampling; r4 recipe refresh; r5
        # reference-exact GroupNorm grouping -- models/unet.py
        # _num_groups changed for sub-128-channel widths, so r4 params
        # were trained under a different 64-ch architecture)
        dag = (f"_d{args.dagger_rounds}x{args.dagger_steps}"
               f"c{args.dagger_collect}"
               + ("y" if args.dagger_carry else "")
               if args.dagger_rounds else "")
        pol = (f"_p{args.polish_steps}"
               + (f"lr{args.polish_lr:g}" if args.polish_lr > 0 else "")
               if args.polish_steps else "")
        lk = f"_l{args.loss}" if args.loss != "huber" else ""
        cache_params = os.path.join(
            args.cache, f"params_{tag}_ch{args.channels}"
                        f"_t{args.train_steps}_b{args.batch}{dag}{pol}{lk}"
                        f"_r5.pkl")
        if args.ft_steps > 0:
            cache_ft = os.path.join(
                args.cache, f"ftparams_{tag}_ch{args.channels}"
                            f"_t{args.train_steps}_b{args.batch}{dag}{pol}"
                            f"_k{args.ft_k}_s{args.ft_steps}"
                            f"_lr{args.ft_lr:g}.pkl")
    have_stats = cache_stats and os.path.exists(cache_stats)
    have_params = cache_params and os.path.exists(cache_params)
    have_ft = (args.ft_steps == 0) or (cache_ft and os.path.exists(cache_ft))
    if args.cache and args.scheme == "two_stage":
        # the classifier trains on the DAgger-augmented pool ONLY when the
        # regressor phase actually runs (a cache-hit regressor leaves
        # xs_train empty and the classifier sees the clean collection), so
        # the key carries the dag tag only in that case -- otherwise two
        # runs with identical keys would hold different classifiers
        cls_dag = dag if not have_params else ""
        cache_cls = os.path.join(
            args.cache,
            f"clsparams_{tag}_ch{args.cls_channels or args.channels}"
            f"_t{args.cls_train_steps}_b{args.batch}"
            f"_th{args.threshold_class1:g}-{args.threshold_class2:g}"
            f"{cls_dag}_r5.pkl")
    have_cls = (args.scheme != "two_stage") or (
        cache_cls and os.path.exists(cache_cls))
    need_collection = not (have_stats and have_params and have_ft
                           and have_cls)

    # ---- 2. device-resident on-manifold training set ---------------------
    # Oracle rollouts collected ON DEVICE: every stride-th step's raw v4
    # features are converted to v5 and stored bf16 in HBM.  Nothing large
    # ever crosses to host.
    crng = np.random.default_rng(7)
    collect_perturbs = [
        crng.standard_normal((ncol, 60)).astype(np.float32) * 0.5
        for _ in range(args.collect_rollouts)]

    x5_dev = None
    ft_pool_x4 = None
    # stats+params cached but the ft stage not: only the (much smaller)
    # fine-tune IC pool is needed -- collect just rollout 0 and skip the
    # multi-GB bf16 training set entirely
    full_collect = not (have_stats and have_params and have_cls)
    if need_collection:
        to_v5_bf16 = jax.jit(lambda x4: convert_v4_to_v5(
            x4.reshape(-1, spec4.input_len)).astype(jnp.bfloat16))
        parts, pool_parts = [], []
        ft_pool_stride = max(stride, 8)
        for r in range(args.collect_rollouts if full_collect else 1):
            xr = x0.copy()
            # spread collection ICs wider than the 0.05 K evaluation
            # perturbation: the training set should cover the basin
            xr[:, spec4.input_slices["state_t"]] += collect_perturbs[r]
            s = initial_state(xr, grid)
            for k in range(collect_steps // seg):
                s, tr = oracle_driver.rollout(None, s, seg, True,
                                              start_step=k * seg)
                if full_collect:
                    parts.append(to_v5_bf16(tr["x4"][::stride]))
                if r == 0 and args.ft_steps > 0:
                    # keep the (step, ncol) structure: fine-tune ICs must
                    # be whole 384-column grids (the host-dynamics
                    # climatology is per-column)
                    pool_parts.append(tr["x4"][::ft_pool_stride])
                del tr
                print(f"  collect[{r}]: {(k + 1) * seg}/{collect_steps} "
                      f"steps [{time.time() - t_start:.0f}s]", flush=True)
        if parts:
            x5_dev = jnp.concatenate(parts)
            del parts
        if pool_parts:
            ft_pool_x4 = jnp.concatenate(pool_parts)
            del pool_parts
        if x5_dev is not None:
            n_samples = x5_dev.shape[0]
            print(f"training set: {n_samples} device-resident samples "
                  f"(bf16, {n_samples * spec5.input_len * 2 / 1e9:.2f} GB "
                  f"HBM) [{time.time() - t_start:.0f}s]")

    # ---- 3. normalization stats (device reductions) ----------------------
    if have_stats:
        blob = np.load(cache_stats)
        stats = NormStats(inp_sub=blob["sub"], inp_div=blob["div"],
                          out_scale=blob["osc"], lbd_qn=blob["lbd"])
        print(f"norm stats: cache hit ({cache_stats})")
    else:
        n_norm = int(min(x5_dev.shape[0], 196608))
        sl_qn = spec5.input_slices["state_qn"]

        @jax.jit
        def _norm_stats(xb):
            xf = xb.astype(f32)
            y = oracle_v5(xf)
            sub = xf.mean(0)
            div = xf.max(0) - xf.min(0)
            std = y.std(0)
            q = xf[:, sl_qn]
            cloudy = q > 1e-7
            qsum = jnp.where(cloudy, q, 0.0).sum(0)
            qcnt = cloudy.sum(0)
            return sub, div, std, qsum, qcnt

        sub, div, std, qsum, qcnt = (np.array(a) for a in
                                     _norm_stats(x5_dev[:n_norm]))
        # divide only where cloudy samples exist: np.where evaluates the
        # divide on EVERY lane first, so qsum entries that are NaN (all-dry
        # levels never accumulate) raise a spurious RuntimeWarning
        lbd = np.full(qsum.shape, 1e7, dtype=np.float64)
        cloudy_lev = qcnt > 0
        lbd[cloudy_lev] = qcnt[cloudy_lev] / qsum[cloudy_lev]

        # production-consistent normalization (the reference's published
        # norm vectors are computed on the TRANSFORMED inputs):
        # - the qn block is compressed by 1-exp(-lbd qn) BEFORE (x-sub)/div,
        #   so its sub/div must be stats of the compressed variable
        # - state_rh is identity-normalized, making the production
        #   [0, 1.2] clip a physical range guard (computing sub/div from
        #   data would turn that clip into a filter that zeroes every
        #   below-mean RH value -- half the signal)
        @jax.jit
        def _qn_stats(xb, lbd_j):
            qt = 1.0 - jnp.exp(-xb[:, sl_qn].astype(f32) * lbd_j)
            return qt.mean(0), qt.max(0) - qt.min(0)

        sl_rh5 = spec5.input_slices["state_rh"]
        qsub, qdiv = map(np.asarray, _qn_stats(x5_dev[:n_norm],
                                               jnp.asarray(lbd, f32)))
        sub[sl_qn], div[sl_qn] = qsub, np.maximum(qdiv, 1e-6)
        sub[sl_rh5], div[sl_rh5] = 0.0, 1.0
        stats = NormStats(inp_sub=sub.astype(np.float64),
                          inp_div=div.astype(np.float64),
                          out_scale=1.0 / np.maximum(std, 1e-8),
                          lbd_qn=lbd)
        if cache_stats:
            np.savez(cache_stats, sub=stats.inp_sub, div=stats.inp_div,
                     osc=stats.out_scale, lbd=stats.lbd_qn)
        print(f"norm stats computed on device ({n_norm} samples) "
              f"[{time.time() - t_start:.0f}s]")

    # ---- 4. train the candidate v5 U-Net (scan-fused, on-device data) ----
    if x5_dev is not None:
        xb0 = x5_dev[:args.batch].astype(f32)
    else:  # shapes only; params come from cache
        xb0 = jnp.asarray(synthetic_inputs(spec5, args.batch, grid, seed=5))
    yb0 = oracle_v5(xb0)
    tr = recipes.unet_trainer(
        spec5, stats, (xb0, yb0), jax.random.PRNGKey(0),
        steps_per_epoch=max(args.train_steps, 1),
        loss_kind=args.loss,
        # NOTE: near-constant LR on purpose (default cosine horizon >>
        # run length): A/B'd against decaying over the run -- the decayed
        # model scores better supervised loss but measurably WORSE
        # coupled monthly RMSE (high-LR flat-minima regularization helps
        # the out-of-tube restoring behavior the rollout depends on)
        model_kw=dict(model_channels=args.channels, channel_mult=(1, 2, 2),
                      num_blocks=2, attn_resolutions=(16,),
                      output_prune=True))
    state = tr.state
    # wrapper + driver up front: DAgger rounds roll the in-training model
    hybrid_wrap = W.make_wrapper(
        lambda p, xn: tr.model.apply(p, xn), stats,
        W.WrapperConfig(input_version="v4"))
    hybrid_driver = HybridDriver(hybrid_wrap, grid, dyn_forcing=forcing)
    xs_train = None
    if have_params:
        with open(cache_params, "rb") as f:
            blob = pickle.load(f)
        state = state.replace(params=jax.tree.map(jnp.asarray,
                                                  blob["params"]))
        train_loss = blob["loss"]
        n_train_samples = blob.get("n_samples", 0)
        print(f"trained params: cache hit ({cache_params}, "
              f"loss {train_loss:.5f})")
    else:
        n_clean = int(x5_dev.shape[0])
        # DAgger buffer is preallocated (filled with clean duplicates) so
        # the fused train chunk compiles ONCE for the final shape
        segs_dag = max(-(-args.dagger_collect // seg), 1)
        rows_seg = -(-seg // stride) * ncol
        dag_rows = segs_dag * rows_seg
        cap = args.dagger_rounds * dag_rows
        xs_train = (jnp.concatenate([x5_dev, x5_dev[:cap]])
                    if 0 < cap <= n_clean else x5_dev)
        if cap > n_clean:
            raise SystemExit("dagger buffer larger than clean set; lower "
                             "--dagger-rounds/--dagger-collect")
        n_train_samples = int(xs_train.shape[0])
        amps = jnp.asarray([0.0] + jit_amps, f32)
        col_std = x5_dev[:196608].astype(f32).std(0)
        col_std = col_std.at[sl_icol5].set(0.0)  # icol: categorical
        if cap > 0:
            x5_dev = None  # drop the clean-set alias: xs_train owns the
            # data now, and a live extra 3.5 GB reference OOMs the chip
            # once the DAgger buffer and training activations are resident

        chunk_len = max(1, min(args.chunk, args.train_steps))

        def _body(carry, _):
            st, key, xs, asc = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            idx = jax.random.randint(k1, (args.batch,), 0, n_train_samples)
            xb = xs[idx].astype(f32)
            # uniform over {clean} + amps: A/B'd against favoring the
            # clean manifold (p=0.5) -- coverage share decides the
            # coupled equilibrium distance, uniform wins clearly
            a = amps[jax.random.randint(k2, (args.batch,), 0, len(amps))]
            xb = xb + jax.random.normal(k3, xb.shape, f32) \
                * (asc * a)[:, None] * col_std
            yb = oracle_v5(xb)
            st, m = tr.train_step(st, xb, yb)
            return (st, key, xs, asc), m["loss"]

        # the training set is an ARGUMENT, not a closure capture: captured
        # device constants are baked into the executable (4 GB here),
        # bloating compile and the persistent cache.  ascale scales the
        # jitter amplitudes (1 = as given, 0 = jitter-free polish).
        @jax.jit
        def _chunk(st, key, xs, ascale):
            (st, key, xs, _), losses = jax.lax.scan(
                _body, (st, key, xs, ascale), None, length=chunk_len)
            return st, key, losses.mean()

        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        key = jax.random.PRNGKey(23)
        done, train_loss = 0, float("nan")
        while done < args.train_steps:
            state, key, l = _chunk(state, key, xs_train, one)
            done += chunk_len
            train_loss = float(l)
            print(f"step {min(done, args.train_steps)}: "
                  f"loss(chunk mean) {train_loss:.5f} "
                  f"[{time.time() - t_start:.0f}s]", flush=True)
        print(f"trained {done} steps [{time.time() - t_start:.0f}s]")

        # ---- DAgger rounds: train where the hybrid actually goes ------
        # Roll the CURRENT model through the coupled loop, collect the
        # states it visits (exactly the distribution that matters for
        # coupling), oracle-label them on device, continue training on
        # the clean+visited mixture.  The imitation-learning fix for
        # covariate shift -- possible here because collection, labelling
        # and training are all device-resident.
        if args.dagger_rounds > 0:
            # donate the buffer: the update writes in place instead of
            # materializing a second multi-GB copy
            upd = jax.jit(lambda buf, new, o: jax.lax.dynamic_update_slice(
                buf, new, (o, jnp.zeros((), o.dtype))), donate_argnums=(0,))
            drng = np.random.default_rng(47)
            off = n_clean
            s = None  # with --dagger-carry the hybrid rollout state
            # carries over between rounds (rounds tile one long coupled
            # trajectory, covering the late-time distribution); default
            # restarts each round from jittered ICs (A/B'd better: the
            # eval's month-1 transient dominates the criterion)
            abs_step = 0  # absolute forcing step; continues across
            # carried rounds so the diurnal phase has no seam at round
            # boundaries (the o3 segmented-rollout contract)
            for rd in range(args.dagger_rounds):
                if s is None or not args.dagger_carry:
                    xr = x0.copy()
                    xr[:, spec4.input_slices["state_t"]] += \
                        0.1 * drng.standard_normal(
                            (ncol, 60)).astype(np.float32)
                    s = initial_state(xr, grid)
                    abs_step = 0
                newparts = []
                for _k in range(segs_dag):
                    s, trj = hybrid_driver.rollout(state.params, s, seg,
                                                   True,
                                                   start_step=abs_step)
                    abs_step += seg
                    newparts.append(to_v5_bf16(trj["x4"][::stride]))
                    del trj
                xs_train = upd(xs_train, jnp.concatenate(newparts),
                               jnp.int32(off))
                off += dag_rows
                ddone = 0
                while ddone < args.dagger_steps:
                    state, key, l = _chunk(state, key, xs_train, one)
                    ddone += chunk_len
                train_loss = float(l)
                print(f"dagger round {rd}: +{dag_rows} hybrid-visited "
                      f"samples, loss {train_loss:.5f} "
                      f"[{time.time() - t_start:.0f}s]", flush=True)

        # ---- final jitter-free polish on the clean+visited mixture -----
        if args.polish_steps > 0:
            chunk_fn = _chunk
            if args.polish_lr > 0:
                # fresh low-LR Adam over the same model/params: the final
                # annealed descent into the minimum the high-LR phase
                # orbits (the recipe's cosine horizon >> run length, so
                # the main phase is intentionally near-constant-LR)
                tr2 = recipes.unet_trainer(
                    spec5, stats, (xb0, yb0), jax.random.PRNGKey(0),
                    steps_per_epoch=max(args.polish_steps, 1),
                    lr=args.polish_lr, loss_kind=args.loss,
                    model_kw=dict(model_channels=args.channels,
                                  channel_mult=(1, 2, 2), num_blocks=2,
                                  attn_resolutions=(16,),
                                  output_prune=True))
                state = tr2.state.replace(params=state.params)

                def _body2(carry, _):
                    st, key, xs, asc = carry
                    key, k1 = jax.random.split(key)
                    idx = jax.random.randint(k1, (args.batch,), 0,
                                             n_train_samples)
                    xb = xs[idx].astype(f32)
                    yb = oracle_v5(xb)
                    st, m = tr2.train_step(st, xb, yb)
                    return (st, key, xs, asc), m["loss"]

                @jax.jit
                def chunk_fn(st, key, xs, ascale):
                    (st, key, xs, _), losses = jax.lax.scan(
                        _body2, (st, key, xs, ascale), None,
                        length=chunk_len)
                    return st, key, losses.mean()
            pdone = 0
            while pdone < args.polish_steps:
                state, key, l = chunk_fn(state, key, xs_train, zero)
                pdone += chunk_len
            train_loss = float(l)
            print(f"polish: {pdone} jitter-free steps"
                  + (f" @ lr {args.polish_lr:g}" if args.polish_lr > 0
                     else "")
                  + f", loss {train_loss:.5f} "
                    f"[{time.time() - t_start:.0f}s]", flush=True)
        if cache_params:
            with open(cache_params, "wb") as f:
                pickle.dump({"params": jax.tree.map(np.asarray,
                                                    state.params),
                             "loss": train_loss,
                             "n_samples": n_train_samples}, f)
            print(f"cached params -> {cache_params}")
    # ---- 4a2. two-stage classifier (the reference's production config) ---
    # Train the 3-class per-level cloud classifier on the same on-manifold
    # set with oracle labels (thresholds climsim_datapip_classifier_h5.py:
    # 118-122 / config_single.yaml:63-64), then gate the regressor's qn
    # tendency through online/two_stage.py -- the composition the
    # reference trains in train_unet_h5loader_classifier.py but never
    # demonstrates coupled.
    cls_params = None
    cls_acc = None
    if args.scheme == "two_stage":
        cls_tr = recipes.unet_classifier_trainer(
            spec5, stats, (xb0, yb0), jax.random.PRNGKey(5),
            steps_per_epoch=max(args.cls_train_steps, 1),
            model_kw=dict(model_channels=args.cls_channels or args.channels,
                          channel_mult=(1, 2, 2), num_blocks=2,
                          attn_resolutions=(16,),
                          # production config: force class 0 in the top 12
                          # levels so the gate can never emit class-1
                          # evaporation tendencies in the stratosphere
                          # (conf/config_single.yaml:68/71); forced logits
                          # are forward-only, cached params stay valid
                          output_prune=True, strato_lev_out=12),
            threshold_class1=args.threshold_class1,
            threshold_class2=args.threshold_class2)
        if have_cls and cache_cls:
            with open(cache_cls, "rb") as f:
                blob = pickle.load(f)
            cls_params = jax.tree.map(jnp.asarray, blob["params"])
            cls_acc = blob["acc"]
            print(f"classifier params: cache hit ({cache_cls}, "
                  f"acc {cls_acc:.4f})")
        else:
            # clean + DAgger-visited rows when the regressor phase left
            # them alive; the clean collection otherwise (params cached)
            data = xs_train if xs_train is not None else x5_dev
            n_data = int(data.shape[0])
            chunk_len_c = max(1, min(args.chunk, args.cls_train_steps))

            def _cbody(carry, _):
                st, key, xs = carry
                key, k1 = jax.random.split(key)
                idx = jax.random.randint(k1, (args.batch,), 0, n_data)
                xb = xs[idx].astype(f32)
                yb = oracle_v5(xb)
                st, m = cls_tr.train_step(st, xb, yb)
                return (st, key, xs), (m["loss"], m["accuracy"])

            @jax.jit
            def _cchunk(st, key, xs):
                (st, key, xs), (ls, accs) = jax.lax.scan(
                    _cbody, (st, key, xs), None, length=chunk_len_c)
                return st, key, ls.mean(), accs.mean()

            ckey = jax.random.PRNGKey(29)
            cstate, cdone = cls_tr.state, 0
            while cdone < args.cls_train_steps:
                cstate, ckey, l, a = _cchunk(cstate, ckey, data)
                cdone += chunk_len_c
                cls_acc = float(a)
                print(f"classifier step "
                      f"{min(cdone, args.cls_train_steps)}: "
                      f"ce {float(l):.4f} acc {cls_acc:.4f} "
                      f"[{time.time() - t_start:.0f}s]", flush=True)
            cls_params = cstate.params
            # label-distribution diagnostic: a degenerate split would
            # make the gate a silent no-op (or silence every cloud)
            xs_s = data[:args.batch].astype(f32)
            labs = np.asarray(recipes.classifier_labels(
                xs_s, oracle_v5(xs_s), spec5, args.threshold_class1,
                args.threshold_class2))
            frac = [(labs == c).mean() for c in range(3)]
            print(f"classifier: acc {cls_acc:.4f}; label fractions "
                  f"0={frac[0]:.3f} 1={frac[1]:.3f} 2={frac[2]:.3f}")
            if cache_cls:
                with open(cache_cls, "wb") as f:
                    pickle.dump({"params": jax.tree.map(np.asarray,
                                                        cls_params),
                                 "acc": cls_acc}, f)
                print(f"cached classifier params -> {cache_cls}")
    xs_train = None

    # compose the coupled model for everything downstream (tendency
    # correction + evaluation): two_stage rolls with (reg, cls) params
    if args.scheme == "two_stage":
        from climsim_tpu.online.two_stage import make_two_stage_apply

        # (--ft-steps incompatibility is rejected at parse time)
        two = make_two_stage_apply(
            lambda p, xn: tr.model.apply(p, xn),
            lambda p, xn: cls_tr.model.apply(p, xn), stats=stats)
        hybrid_wrap = W.make_wrapper(two, stats,
                                     W.WrapperConfig(input_version="v4"))
        hybrid_driver = HybridDriver(hybrid_wrap, grid,
                                     dyn_forcing=forcing)

    # ---- 4b. optional differentiable K-step rollout fine-tune ------------
    # Gradients of a trajectory loss flow through host dynamics + wrapper
    # constraints + K emulator applications (train/rollout_ft.py) -- the
    # autoregressive-stability stage the reference cannot run (its host
    # model sits behind a TorchScript/Fortran boundary).
    ft_loss_first = ft_loss_last = None
    if args.ft_steps > 0:
        if have_ft and cache_ft and os.path.exists(cache_ft):
            with open(cache_ft, "rb") as f:
                blob = pickle.load(f)
            state = state.replace(
                params=jax.tree.map(jnp.asarray, blob["params"]))
            ft_loss_first, ft_loss_last = blob["loss_first"], blob["loss_last"]
            print(f"fine-tuned params: cache hit ({cache_ft}, "
                  f"loss {ft_loss_first:.4f} -> {ft_loss_last:.4f})")
        else:
            from climsim_tpu.train.rollout_ft import make_finetune_step

            # device-resident IC pool of whole-grid states + per-level
            # stds of the reference trajectory (device reductions only)
            n_pool = int(ft_pool_x4.shape[0])
            flat = initial_state(
                ft_pool_x4.reshape(-1, spec4.input_len), grid)
            pool_state = jax.tree.map(
                lambda a: a.reshape((n_pool, ncol) + a.shape[1:]), flat)
            del flat
            _, ptr = oracle_driver.rollout(
                None, initial_state(ft_pool_x4[0], grid), seg)

            @jax.jit
            def _traj_stds(tr_):
                return {k: tr_[k].reshape(-1, 60).std(0) + 1e-12
                        for k in ("t", "q1", "qn", "u")}

            stds = {k: np.asarray(v) for k, v in _traj_stds(ptr).items()}
            del ptr
            # remat: the K-step backward would otherwise store every
            # step's U-Net activations (OOMs a 16 GB chip at K=16)
            ft_driver = HybridDriver(hybrid_wrap, grid,
                                     dyn_forcing=forcing, remat=True)
            step_fn, opt_init = make_finetune_step(
                ft_driver, oracle_driver, args.ft_k, stds,
                learning_rate=args.ft_lr, total_steps=args.ft_steps)
            gather = jax.jit(lambda st, i: jax.tree.map(
                lambda a: a[i], st))
            # absolute forcing step each pool entry was sampled at
            # (segment-major collection, every ft_pool_stride-th step):
            # the K-step window replays the IC's own solar phase
            fps = max(stride, 8)  # == ft_pool_stride at collection
            per_seg = -(-seg // fps)
            pool_steps = np.array(
                [(i // per_seg) * seg + (i % per_seg) * fps
                 for i in range(n_pool)], np.int32)
            frng = np.random.default_rng(31)
            p, opt_state = state.params, opt_init(state.params)
            for i in range(args.ft_steps):
                idx = int(frng.integers(0, n_pool))
                p, opt_state, l = step_fn(p, opt_state,
                                          gather(pool_state, idx),
                                          int(pool_steps[idx]))
                l = float(l)
                if ft_loss_first is None:
                    ft_loss_first = l
                ft_loss_last = l
                if i % 20 == 0 or i == args.ft_steps - 1:
                    print(f"ft step {i}: rollout loss {l:.4f} "
                          f"[{time.time() - t_start:.0f}s]", flush=True)
            state = state.replace(params=p)
            print(f"fine-tuned {args.ft_steps} steps (K={args.ft_k}): "
                  f"loss {ft_loss_first:.4f} -> {ft_loss_last:.4f}")
            if cache_ft:
                with open(cache_ft, "wb") as f:
                    pickle.dump({"params": jax.tree.map(np.asarray, p),
                                 "loss_first": ft_loss_first,
                                 "loss_last": ft_loss_last}, f)
                print(f"cached fine-tuned params -> {cache_ft}")
            del pool_state

    # the parameter pytree every coupled rollout below consumes: the
    # fine-tune stage (regressor only) has updated state by now
    roll_params = ((state.params, cls_params)
                   if args.scheme == "two_stage" else state.params)

    # ---- 4c. climatological tendency correction (flux adjustment) --------
    # The trained net still carries a small state-dependent tendency
    # residual whose MEAN the host relaxation cannot remove; it
    # equilibrates as a shifted climate -- exactly what the monthly-mean
    # metric measures.  Standard coupled-modelling practice is a
    # climatological (flux-adjustment) correction: estimate the mean
    # oracle-minus-hybrid tendency over the states the hybrid itself
    # visits and add it to the wrapper output.  Information-wise this is
    # the DAgger channel again (oracle labels on self-visited states);
    # no ensemble/evaluation data is used.  Correction is restricted to
    # the 360 level-tendency outputs (surface scalars keep their
    # positivity semantics).
    corr = None
    if args.bias_correct > 0:
        # the correction is fitted to the POST-fine-tune params, so every
        # fine-tune knob is part of the key (same invariant as cache_ft:
        # a correction estimated for one set of params must never be
        # silently reused for another)
        ft_tag = (f"_ftk{args.ft_k}s{args.ft_steps}lr{args.ft_lr:g}"
                  if args.ft_steps > 0 else "")
        # the scheme is part of the key too: a correction fitted to the
        # plain regressor's residuals must not be reused for the
        # classifier-gated composition (different rollout params) -- and
        # for two_stage every classifier knob joins the key, since the
        # correction is fitted to rollouts of the (reg, cls) composition
        sch_tag = "" if args.scheme == "regressor" else (
            f"_{args.scheme}"
            f"ch{args.cls_channels or args.channels}"
            f"t{args.cls_train_steps}"
            f"th{args.threshold_class1:g}-{args.threshold_class2:g}")
        cache_bc = (cache_params.replace(
            ".pkl", f"{ft_tag}{sch_tag}_bc{args.bias_correct}"
                    f"i{args.bias_iters}g{args.bias_gain:g}.npz")
            if cache_params else None)
        bc_mask = np.zeros((1, 368), np.float32)
        bc_mask[:, :360] = 1.0  # ptend_{t,q0001,qc,qi,u,v} x 60 levels
        bc_mask_j = jnp.asarray(bc_mask)

        def corrected_wrap(c):
            if c is None:
                return hybrid_wrap
            cj = jnp.asarray(c, f32)

            cfull = cj * bc_mask_j  # (ncol, 368)

            def w(p, x4_raw):
                # batches are whole grids (or stacks of whole grids, in
                # step-major order): broadcast the per-column correction
                y = hybrid_wrap(p, x4_raw)
                return (y.reshape(-1, ncol, y.shape[-1])
                        + cfull[None]).reshape(y.shape)
            return w

        if cache_bc and os.path.exists(cache_bc):
            corr = np.load(cache_bc)["corr"]
            print(f"tendency correction: cache hit ({cache_bc})")
        else:
            bc_segs = max(-(-args.bias_correct // seg), 1)
            brng = np.random.default_rng(53)

            # ONE driver + ONE jitted residual program for ALL passes:
            # the correction rides in as a TRACED leaf alongside params
            # (zeros on pass 0 -- exact no-op), so each refinement pass
            # reuses the compiled rollout instead of re-jitting the full
            # U-Net program with a new baked constant (O(bias_iters)
            # from-scratch compiles at flagship scale otherwise).
            def traced_wrap(pc, x4_raw):
                p, c = pc
                y = hybrid_wrap(p, x4_raw)
                return (y.reshape(-1, ncol, y.shape[-1])
                        + (c * bc_mask_j)[None]).reshape(y.shape)

            drv = HybridDriver(traced_wrap, grid, dyn_forcing=forcing)
            # chunk the segment through the net (the whole segment at
            # once -- 207k rows -- OOMs next to the rollout buffers)
            bc_chunk = next(d for d in range(min(54, seg), 0, -1)
                            if seg % d == 0)

            @jax.jit
            def _res_sum(pc, x4s):
                # mean-residual numerator over one segment, (ncol, 368)
                def one(x4t):
                    x4f = x4t.reshape(-1, spec4.input_len)
                    r = oracle_wrap(None, x4f) - traced_wrap(pc, x4f)
                    return r.reshape(x4t.shape[0], ncol, -1).sum(0)

                xs = x4s.reshape(-1, bc_chunk, ncol, spec4.input_len)
                return jax.lax.map(one, xs).sum(0)

            corr_j = jnp.zeros((ncol, 368), f32)
            for it in range(max(args.bias_iters, 1)):
                pc = (roll_params, corr_j)
                xr = x0.copy()
                xr[:, spec4.input_slices["state_t"]] += \
                    0.1 * brng.standard_normal((ncol, 60)).astype(np.float32)
                s = initial_state(xr, grid)
                acc = jnp.zeros((ncol, 368), f32)
                for _k in range(bc_segs):
                    s, trj = drv.rollout(pc, s, seg, True,
                                         start_step=_k * seg)
                    acc = acc + _res_sum(pc, trj["x4"])
                    del trj
                res = np.asarray(acc) / (bc_segs * seg)
                corr_j = corr_j + jnp.asarray(args.bias_gain * res, f32)
                print(f"tendency correction pass {it}: mean |residual| "
                      f"{np.abs(res[:, :60]).mean():.3e} K/s (T block) "
                      f"[{time.time() - t_start:.0f}s]", flush=True)
            corr = np.asarray(corr_j)
            if cache_bc:
                np.savez(cache_bc, corr=corr)
        hybrid_driver = HybridDriver(corrected_wrap(corr), grid,
                                     dyn_forcing=forcing)

    # free the training set before the rollout phase
    x5_dev = None
    ft_pool_x4 = None

    # ---- 5. ensemble rollout, segment-major, reduced on device -----------
    # All members advance together through each segment (vmapped
    # rollout_ensemble); per-segment device reductions produce the
    # pairwise error curves, window sums, drift series and precipitation;
    # the per-segment ensemble-mean trajectory stays in HBM for the
    # hybrid comparison.
    import dataclasses

    M = args.members
    pairs = list(itertools.combinations(range(M), 2))
    mrng = np.random.default_rng(1234)
    member_states = []
    for mi in range(M):
        # perturbed initial conditions (reference: perturbed seeds).
        # With --spinup-days the perturbation is applied BEFORE the
        # spin-up, so members arrive at the evaluation as INDEPENDENT
        # on-attractor weather states (the reference's ensemble members
        # are independent spun-up E3SM runs) and the floor measures
        # saturated internal variability, not a shared transient.
        if mi > 0:
            dt_pert = jnp.asarray(
                0.05 * mrng.standard_normal((ncol, 60)).astype(np.float32))
            member_states.append(
                dataclasses.replace(s_base, t=s_base.t + dt_pert))
        else:
            member_states.append(s_base)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *member_states)
    for k in range(spin_steps // seg if spin_steps else 0):
        stacked, _ = oracle_driver.rollout_ensemble(None, stacked, seg,
                                                    start_step=k * seg)
    if spin_steps:
        print(f"member spin-up: {spin_steps} steps x {M} members "
              f"[{time.time() - t_start:.0f}s]", flush=True)
        # the hybrid replays member 0's weather: same restart state
        s_base = jax.tree.map(lambda a: a[0], stacked)

    # the coupling gate covers T, Q and U (the reference's monthly
    # notebook renders all three panels); instantaneous growth/zonal-bias
    # diagnostics stay on T, so only T's full ensemble-mean trajectory is
    # kept in HBM -- Q/U need only per-segment time sums (KB-scale)
    GATE_VARS = ("t", "q1", "u")

    @jax.jit
    def _member_stats(trj):
        ts = trj["t"]  # (M, n, B, L)
        ens = ts.mean(0)
        e2 = (jnp.stack([((ts[i] - ts[j]) ** 2 * w_dev).sum((1, 2)) / w_sum
                         for i, j in pairs]) if pairs
              else jnp.zeros((0, ts.shape[1])))      # (P, n)
        wmean = (ts * w_dev).sum((2, 3)) / w_sum     # (M, n)
        seg_sum = jnp.stack([trj[v].sum(1)
                             for v in GATE_VARS])    # (V, M, B, L)
        return ens, e2, wmean, seg_sum, trj["precc"][0]

    ens_segs = []          # device (n, B, L) per segment (T)
    m_e2, m_wmean, m_seg_sums, m_precc0 = [], [], [], []
    for k in range(n_segs):
        stacked, traj = oracle_driver.rollout_ensemble(
            None, stacked, seg, start_step=spin_steps + k * seg)
        ens, e2, wmean, seg_sum, precc0 = _member_stats(traj)
        del traj
        ens_segs.append(ens)
        m_e2.append(np.asarray(e2))
        m_wmean.append(np.asarray(wmean))
        m_seg_sums.append(np.asarray(seg_sum))
        m_precc0.append(np.asarray(precc0))
        print(f"  members: {(k + 1) * seg}/{steps} steps "
              f"[{time.time() - t_start:.0f}s]", flush=True)
    m_e2 = np.concatenate(m_e2, axis=1)          # (P, steps)
    m_wmean = np.concatenate(m_wmean, axis=1)    # (M, steps)
    m_seg_sums = np.stack(m_seg_sums)            # (n_segs, V, M, B, L)
    precc_r = np.concatenate(m_precc0)           # (steps, B)

    # ---- 6. hybrid rollout vs the stored ensemble mean -------------------
    @jax.jit
    def _hybrid_stats(trj, ens_seg):
        ht, qn, t, wres = trj["t"], trj["qn"], trj["t"], trj["water_res"]
        e2 = ((ht - ens_seg) ** 2 * w_dev).sum((1, 2)) / w_sum
        wmean = (ht * w_dev).sum((1, 2)) / w_sum
        seg_sum = jnp.stack([trj[v].sum(0) for v in GATE_VARS])  # (V, B, L)
        diff_sum = (ht - ens_seg).sum(0)
        cloudy = qn > 1e-7
        return (e2, wmean, seg_sum, diff_sum,
                (qn < 0).mean(), cloudy.mean(), qn.max(),
                (cloudy & (t < 233.16)).mean(),
                jnp.abs(wres).mean(), jnp.abs(wres).max())

    hs = s_base
    h_e2, h_wmean, h_seg_sums, h_diff_sums, h_precc = [], [], [], [], []
    h_scalars = []
    for k in range(n_segs):
        hs, traj = hybrid_driver.rollout(roll_params, hs, seg,
                                         start_step=spin_steps + k * seg)
        out = _hybrid_stats(traj, ens_segs[k])
        h_precc.append(np.asarray(traj["precc"]))
        del traj
        (e2, wmean, seg_sum, diff_sum, qneg, cloudy, qnmax, cold,
         wres_mean, wres_max) = out
        h_e2.append(np.asarray(e2))
        h_wmean.append(np.asarray(wmean))
        h_seg_sums.append(np.asarray(seg_sum))
        h_diff_sums.append(np.asarray(diff_sum))
        h_scalars.append([float(qneg), float(cloudy), float(qnmax),
                          float(cold), float(wres_mean), float(wres_max)])
        print(f"  hybrid: {(k + 1) * seg}/{steps} steps "
              f"[{time.time() - t_start:.0f}s]", flush=True)
    h_e2 = np.concatenate(h_e2)                  # (steps,)
    h_wmean = np.concatenate(h_wmean)
    h_seg_sums = np.stack(h_seg_sums)            # (n_segs, V, B, L)
    h_diff_sums = np.stack(h_diff_sums)
    precc_h = np.concatenate(h_precc)
    h_scalars = np.array(h_scalars)
    del ens_segs
    print(f"rollouts done [{time.time() - t_start:.0f}s]")

    # ---- 7. diagnostics (host assembly of device reductions, f64) --------
    # instantaneous noise floor: mean over pairs of sqrt(mean_t e2)
    floor_inst = float(np.mean([np.sqrt(m_e2[p].mean()) for p in
                                range(len(pairs))])) if pairs else 0.0
    growth = np.sqrt(h_e2)

    # monthly-MEAN fields from segment sums (f64 accumulation; the
    # helper is unit-tested equal to trajectory window means), per gate
    # variable: axis order (n_win, V, [M,] B, L), V = (t, q1, u)
    n_v = len(GATE_VARS)
    h_win = D.window_means_from_segment_sums(
        h_seg_sums, segs_per_win, window)        # (n_win, V, B, L)
    m_win = D.window_means_from_segment_sums(
        m_seg_sums, segs_per_win, window)        # (n_win, V, M, B, L)
    mm_rmse, mm_floor, ratios_all = D.gate_window_stats(h_win, m_win,
                                                        grid)  # (V, n_win)
    ratios = ratios_all[0]  # T (headline)
    win_inst = [float(np.sqrt(h_e2[i * window:(i + 1) * window].mean()))
                for i in range(n_win)]

    # saturation: last quarter of the growth curve flat vs third quarter
    q = max(steps // 4, 1)
    g_late, g_mid = growth[-q:].mean(), growth[-2 * q:-q].mean()
    saturating = bool(g_late <= 1.2 * max(g_mid, 1e-12))
    # the gate covers every variable in every window (the reference's
    # T/Q/U monthly panels): a model may track T while drifting in
    # moisture or momentum -- all three must hold
    within_floor = bool(np.all(ratios_all <= 1.5))
    verdict = "PASS" if (saturating and within_floor) else "FAIL"

    # zonal-mean T bias from the accumulated difference sums
    mean_diff = h_diff_sums.astype(np.float64).sum(0) / steps   # (B, L)
    lats, zbias = D.zonal_mean_bias(mean_diff[None], 0.0 * mean_diff[None],
                                    grid)
    p_h = D.precip_stats(precc_h, grid)
    p_r = D.precip_stats(precc_r, grid)

    def drift_from_wmean(wm):  # exact D.drift from the per-step series
        qq = max(len(wm) // 4, 1)
        return float(wm[-qq:].mean(dtype=np.float64)
                     - wm[:qq].mean(dtype=np.float64))

    drift_h = drift_from_wmean(h_wmean)
    drift_r = drift_from_wmean(m_wmean[0])
    micro = {
        "frac_negative_qn": float(h_scalars[:, 0].mean()),
        "frac_cloudy": float(h_scalars[:, 1].mean()),
        "qn_max": float(h_scalars[:, 2].max()),
        "frac_cold_cloud": float(h_scalars[:, 3].mean()),
        "water_res_meanabs": float(h_scalars[:, 4].mean()),
        "water_res_maxabs": float(h_scalars[:, 5].max()),
    }

    days = steps / STEPS_PER_DAY
    win_days = window / STEPS_PER_DAY

    # ---- 8. figures --------------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figdir = os.path.join(args.out, "figures")
    os.makedirs(figdir, exist_ok=True)
    # scheme-suffixed figure names so a two_stage run never clobbers the
    # committed regressor artifacts in the same --out tree
    fig_sfx = "" if args.scheme == "regressor" else f"_{args.scheme}"

    def style(ax):
        ax.grid(True, color="#e6e4df", linewidth=0.6, zorder=0)
        ax.set_axisbelow(True)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)

    t_axis = np.arange(steps) / STEPS_PER_DAY
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t_axis, growth, color=C_HYBRID, lw=1.5,
            label="hybrid vs ensemble mean")
    first = True
    for pi, (a, b) in enumerate(pairs):
        if a != 0:
            continue
        ax.plot(t_axis, np.sqrt(m_e2[pi]), color=C_ENSEMBLE, lw=1,
                alpha=0.7, label="ensemble spread" if first else None)
        first = False
    ax.axhline(floor_inst, color=C_FLOOR, lw=2, ls="--",
               label="instantaneous noise floor")
    ax.set_xlabel("simulated days")
    ax.set_ylabel("weighted T RMSE [K]")
    ax.set_title(f"Error growth over {days:.0f} days: "
                 f"{'saturating' if saturating else 'diverging'}")
    ax.legend(frameon=False)
    style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, f"online_error_growth{fig_sfx}.png"), dpi=120)
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
    fig.savefig(os.path.join(figdir, f"online_zonal_bias{fig_sfx}.png"), dpi=120)
    plt.close(fig)

    # three panels, one per gate variable -- the layout of the
    # reference's monthly-online-rmse-visualization.ipynb (T, Q, U)
    VAR_LABEL = {"t": ("T", "K"), "q1": ("Q", "kg/kg"), "u": ("U", "m/s")}
    fig, axes = plt.subplots(1, n_v, figsize=(5.5 * n_v, 4))
    xs = np.arange(n_win)
    for v, ax in enumerate(np.atleast_1d(axes)):
        name, unit = VAR_LABEL[GATE_VARS[v]]
        ax.bar(xs - 0.18, mm_rmse[v], width=0.36, color=C_HYBRID,
               zorder=3, label="hybrid (monthly-mean RMSE)")
        ax.bar(xs + 0.18, mm_floor[v], width=0.36, color=C_FLOOR,
               zorder=3, label="member floor (monthly-mean)")
        ax.plot(xs, 1.5 * mm_floor[v], color=C_ENSEMBLE, lw=1.5, ls=":",
                marker="_", ms=14, label="1.5x floor (criterion)")
        step_x = max(n_win // 6, 1)
        ax.set_xticks(xs[::step_x],
                      [f"m{i + 1}" for i in xs[::step_x]])
        ax.set_ylabel(f"weighted {name} RMSE of monthly means [{unit}]")
        ax.set_title(name)
        if v == 0:
            ax.legend(frameon=False, fontsize=8)
        style(ax)
    fig.suptitle(f"Monthly online RMSE (T/Q/U gate) -- {verdict}")
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, f"online_monthly_rmse{fig_sfx}.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    bins = np.linspace(0.0, max(p_h["p99"], p_r["p99"]) * 1.2 + 1e-9, 40)
    ax.hist(np.ravel(precc_r), bins=bins, color=C_ENSEMBLE,
            alpha=0.75, label="reference", zorder=3)
    ax.hist(np.ravel(precc_h), bins=bins, color=C_HYBRID, alpha=0.75,
            label="hybrid", zorder=3)
    ax.set_yscale("log")
    ax.set_xlabel("PRECC")
    ax.set_ylabel("count (log)")
    ax.set_title("Precipitation distribution")
    ax.legend(frameon=False)
    style(ax)
    fig.tight_layout()
    fig.savefig(os.path.join(figdir, f"online_precip{fig_sfx}.png"), dpi=120)
    plt.close(fig)

    # ---- 9. report ----------------------------------------------------------
    lines = [
        f"# Online evaluation: {days:.0f}-day hybrid rollout vs ensemble",
        "",
        "The workflow of the reference's online evaluation notebooks "
        "(online_testing/evaluation/*.ipynb) run end to end on this "
        "framework: a trained + wrapped v5 U-Net is coupled through the "
        "rollout driver and judged against a "
        f"{M}-member perturbed-IC ensemble of the oracle "
        "emulator (the MMF stand-in; real E3SM output replaces it "
        "unchanged).  All runs share the same prescribed host dynamics "
        f"(Newtonian relaxation, tau = {args.tau_days:g} days, + "
        f"{args.diurnal:g} K/day diurnal cycle"
        + (f", target shifted -tau x mean to balance the oracle's "
           f"systematic physics, mean_gain {args.oracle_mean:g}"
           if args.oracle_mean > 0 else "")
        + "), as the real host model "
        "is shared between MMF and hybrid runs.  Produced by "
        "`python scripts/online_eval.py`.",
        "",
        f"- rollout: {steps} steps x {ncol} columns at 1200 s = "
        f"**{days:.0f} simulated days**; windows of {window} steps "
        f"= {win_days:.0f} days each"
        + (f"; evaluation starts after a {spin_steps / STEPS_PER_DAY:.0f}"
           f"-day on-attractor oracle spin-up (the reference's members "
           f"start from spun-up E3SM states)" if spin_steps else ""),
        f"- U-Net: {args.channels} channels, trained {args.train_steps} "
        f"steps on {n_train_samples} device-resident on-manifold samples "
        f"(oracle-rollout states, stride {stride}; per-row jitter from "
        f"{{clean, {args.jitter}}} x feature std with labels re-queried "
        f"from the oracle on device; final loss {train_loss:.4f})",
    ] + ([
        f"- scheme: **two-stage** (the reference's production v5 "
        f"configuration, climsim_unet_classifier.py): a "
        f"{args.cls_channels or args.channels}-channel 3-class per-level "
        f"cloud classifier (trained {args.cls_train_steps} steps, final "
        f"accuracy {cls_acc:.4f}; thresholds "
        f"{args.threshold_class1:g}/{args.threshold_class2:g} per "
        f"config_single.yaml:63-64) gates the regressor's qn tendency: "
        f"class 0 emits zero, class 1 evaporates the column's cloud "
        f"exactly, class 2 passes the regression through "
        f"(online/two_stage.py)"
    ] if args.scheme == "two_stage" else []) + ([
        f"- DAgger: {args.dagger_rounds} rounds x {args.dagger_collect} "
        f"hybrid-rollout steps collected + {args.dagger_steps} continued "
        f"train steps each (the model trains on the states its own "
        f"coupled run visits)"
    ] if args.dagger_rounds > 0 else []) + ([
        f"- polish: {args.polish_steps} final jitter-free train steps on "
        f"the clean + hybrid-visited mixture"
        + (f" (fresh Adam @ lr {args.polish_lr:g})"
           if args.polish_lr > 0 else "")
    ] if args.polish_steps > 0 else []) + ([
        f"- climatological tendency correction (flux adjustment): "
        f"per-column mean oracle-minus-hybrid tendency residual over "
        f"{args.bias_correct} hybrid-visited steps, {args.bias_iters} "
        f"refinement passes, added to the wrapper's level-tendency "
        f"outputs -- standard coupled-modelling practice; uses only "
        f"oracle labels on self-visited states (the DAgger channel), "
        f"never ensemble/evaluation data"
    ] if args.bias_correct > 0 else []) + ([
        f"- rollout fine-tune: {args.ft_steps} updates on a differentiable "
        f"K={args.ft_k}-step trajectory loss through the full hybrid loop "
        f"(train/rollout_ft.py); loss {ft_loss_first:.4f} -> "
        f"{ft_loss_last:.4f}"
    ] if args.ft_steps > 0 else []) + [
        "",
        f"## Verdict: {verdict}",
        "",
        "Criterion (coupling-grade): every monthly-mean RMSE of T, Q AND "
        "U within 1.5x its own ensemble floor (the reference's monthly "
        "notebook renders all three panels, "
        "monthly-online-rmse-visualization.ipynb cells 5-7), and "
        "instantaneous error growth saturating rather than diverging.",
    ] + [
        f"- monthly-mean {VAR_LABEL[GATE_VARS[v]][0]} RMSE / floor "
        f"ratios: " + ", ".join(f"{r:.2f}" for r in ratios_all[v])
        + (f" (all <= 1.5: "
           f"{'yes' if bool(np.all(ratios_all[v] <= 1.5)) else 'NO'})")
        for v in range(n_v)
    ] + [
        f"- growth saturation: last-quarter mean {g_late:.3f} K vs "
        f"previous-quarter {g_mid:.3f} K "
        f"({'saturating' if saturating else 'DIVERGING'})",
        "",
        "| metric | hybrid | reference ensemble |",
        "|---|---|---|",
        f"| instantaneous noise floor (T RMSE, K) | -- | {floor_inst:.4f} |",
    ]
    for v in range(n_v):
        name, unit = VAR_LABEL[GATE_VARS[v]]
        for i in range(n_win):
            lines.append(
                f"| month {i + 1} ({win_days:.0f} d) monthly-mean {name} "
                f"RMSE ({unit}) | {mm_rmse[v, i]:.4g} | "
                f"{mm_floor[v, i]:.4g} (floor) |")
    for i in range(n_win):
        lines.append(
            f"| month {i + 1} ({win_days:.0f} d) instantaneous T RMSE (K) | "
            f"{win_inst[i]:.4f} | {floor_inst:.4f} (floor) |")
    lines += [
        f"| T drift (K) | {drift_h:.4f} | {drift_r:.4f} |",
        f"| precip mean | {p_h['mean']:.3e} | {p_r['mean']:.3e} |",
        f"| precip p99 | {p_h['p99']:.3e} | {p_r['p99']:.3e} |",
        f"| negative-precip fraction | {p_h['frac_negative']:.4f} | "
        f"{p_r['frac_negative']:.4f} |",
        f"| negative-qn fraction | {micro['frac_negative_qn']:.4f} | -- |",
        f"| column water residual, mean abs | "
        f"{micro['water_res_meanabs']:.3e} | -- |",
        "",
        f"![error growth](figures/online_error_growth{fig_sfx}.png)",
        f"![zonal bias](figures/online_zonal_bias{fig_sfx}.png)",
        f"![monthly rmse](figures/online_monthly_rmse{fig_sfx}.png)",
        f"![precip](figures/online_precip{fig_sfx}.png)",
        "",
        "Reading: the monthly-mean RMSE of T, Q and U is the reference's "
        "actual online metric (RMSE of h0 monthly-mean fields vs the MMF "
        "ensemble, monthly-online-rmse-visualization.ipynb cells 5-7 -- "
        "one panel per variable).  Because a "
        "chaotic system drives any two runs apart to the attractor spread, "
        "the *instantaneous* RMSE saturates at the (large) noise floor for "
        "good and bad models alike; the *monthly-mean* RMSE averages that "
        "internal variability away and exposes systematic model bias -- a "
        "coupling-grade model keeps it within a small factor of the "
        "same-statistic member floor, with instantaneous error growth "
        "saturating rather than diverging.  For reference geometry: an "
        f"unbiased model statistically indistinguishable from a member "
        f"scores ratio sqrt((1 + 1/M) / 2) = "
        f"{np.sqrt((1 + 1 / M) / 2):.2f} at M = {M} (its monthly mean "
        "carries one member's internal variability, the ensemble mean "
        "1/M of it) -- ratios near that value mean member-grade "
        "tracking, not sub-physical error.",
        "",
        "All trajectory statistics are reduced on device (only per-step "
        "scalar curves, per-window (ncol, 60) sums and the precipitation "
        "series reach the host) -- the evaluation runs at full month "
        "scale even over a slow host link.",
    ]
    report = os.path.join(
        args.out, "ONLINE_EVAL.md" if args.scheme == "regressor"
        else f"ONLINE_EVAL_{args.scheme}.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {report} (+4 figures in {figdir}) "
          f"[{time.time() - t_start:.0f}s total]")
    for v in range(n_v):
        print(f"verdict: {verdict}  {VAR_LABEL[GATE_VARS[v]][0]} ratios "
              + " ".join(f"{r:.2f}" for r in ratios_all[v]))
    return {"floor": float(np.mean(mm_floor[0])),
            "win_rmse": list(mm_rmse[0]),
            "ratios": list(ratios),
            "ratios_by_var": {GATE_VARS[v]: list(ratios_all[v])
                              for v in range(n_v)},
            "floors_by_var": {GATE_VARS[v]: list(mm_floor[v])
                              for v in range(n_v)},
            "drift": drift_h, "verdict": verdict,
            "scheme": args.scheme, "cls_acc": cls_acc,
            "micro": micro, "precip": {"hybrid": p_h, "ref": p_r},
            "saturating": saturating, "report": report}


if __name__ == "__main__":
    main()
