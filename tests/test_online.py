"""Online coupling layer: wrapper parity, conservation, rollout, export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import load_asset_norms
from climsim_tpu.online import wrapper as W
from climsim_tpu.varspec import get_varspec

SPEC4 = get_varspec("v4")
SPEC5 = get_varspec("v5")
GRID = load_default_grid()
STATS5 = load_asset_norms("v5")


def raw_v4_batch(n=8, seed=0):
    from climsim_tpu.data.synthetic import synthetic_inputs

    return synthetic_inputs(SPEC4, n, GRID, seed)


def test_v4_to_v5_conversion_golden():
    """jax conversion vs an independent numpy re-derivation."""
    x = raw_v4_batch(4).astype(np.float64)
    got = np.asarray(W.convert_v4_to_v5(jnp.asarray(x)))

    want = np.zeros((4, 1405))
    want[:, 0:120] = x[:, 0:120]
    want[:, 120:180] = x[:, 120:180] + x[:, 180:240]
    want[:, 180:240] = np.clip((x[:, 0:60] - 253.16) / 20.0, 0, 1)
    want[:, 240:840] = x[:, 240:840]
    want[:, 840:900] = x[:, 840:900] + x[:, 900:960]
    want[:, 900:1080] = x[:, 960:1140]
    want[:, 1080:1140] = x[:, 1140:1200] + x[:, 1200:1260]
    want[:, 1140:1405] = x[:, 1260:1525]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)


@pytest.fixture(scope="module")
def tiny_model():
    """A tiny v5 OnlineMLP with randomized output head (nonzero preds)."""
    from climsim_tpu.models import OnlineMLP

    model = OnlineMLP(spec=SPEC5, hidden=(32,))
    x0 = jnp.zeros((2, SPEC5.input_len))
    params = model.init(jax.random.PRNGKey(0), x0)

    def apply(p, x):
        return model.apply(p, x)

    return apply, params


def test_wrapper_contract_and_conservation(tiny_model):
    apply, params = tiny_model
    wrap = W.make_wrapper(apply, STATS5, W.WrapperConfig(input_version="v4"))
    x = jnp.asarray(raw_v4_batch(8))
    out = np.asarray(jax.jit(wrap)(params, x))
    assert out.shape == (8, 368)
    assert np.isfinite(out).all()

    # cloud repartition conserves total water tendency: dqc + dqi must equal
    # the (unscaled, pruned) qn tendency the model emitted
    spec5 = SPEC5
    from climsim_tpu.data import transforms as T

    tcfg = T.TransformConfig(qn_transform=True, qinput_prune=True,
                             strato_lev=15, input_clip=True,
                             input_clip_rhonly=True)
    in_t = T.make_input_transform(spec5, STATS5, tcfg)
    x5 = W.convert_v4_to_v5(x)
    y = np.asarray(apply(params, in_t(x5)))
    mask = np.ones(spec5.output_len, np.float32)
    for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
        s = spec5.output_slices[v].start
        mask[s:s + 15] = 0.0
    y = y * mask / STATS5.out_scale
    dqn = y[:, spec5.output_slices["ptend_qn"]]
    np.testing.assert_allclose(out[:, 120:180] + out[:, 180:240], dqn,
                               rtol=1e-4, atol=1e-12)
    # dT passthrough
    np.testing.assert_allclose(out[:, 0:60],
                               y[:, spec5.output_slices["ptend_t"]],
                               rtol=1e-5, atol=1e-12)


def test_wrapper_repartition_physics(tiny_model):
    """With a zero-tendency model, the wrapper still re-partitions existing
    cloud water by temperature: warm columns melt all their ice
    (dqi = -qi/dt, dqc = +qi/dt), exactly as apply_temperature_rules does."""
    apply, params = tiny_model
    zero_params = jax.tree.map(jnp.zeros_like, params)
    wrap = W.make_wrapper(apply, STATS5)
    x = raw_v4_batch(4)
    x[:, 0:60] = 300.0          # warm everywhere
    x[:, 120:180] = 1e-5        # some liquid
    x[:, 180:240] = 2e-5        # some ice to melt
    out = np.asarray(wrap(zero_params, jnp.asarray(x)))
    np.testing.assert_allclose(out[:, 180:240], -x[:, 180:240] / 1200.0,
                               rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(out[:, 120:180], x[:, 180:240] / 1200.0,
                               rtol=1e-5, atol=1e-12)
    # everything else zero
    np.testing.assert_allclose(out[:, 0:120], 0.0, atol=1e-12)


def test_aot_export_roundtrip(tiny_model, tmp_path):
    apply, params = tiny_model
    wrap = W.make_wrapper(apply, STATS5)
    x = jnp.asarray(raw_v4_batch(4))
    want = np.asarray(wrap(params, x))
    path = str(tmp_path / "wrapper.stablehlo")
    W.export_aot(wrap, params, 4, SPEC4.input_len, path)
    fn = W.load_aot(path)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_hybrid_rollout(tiny_model):
    from climsim_tpu.online.driver import HybridDriver, initial_state

    apply, params = tiny_model
    wrap = W.make_wrapper(apply, STATS5)
    driver = HybridDriver(wrap, GRID)
    x0 = raw_v4_batch(16, seed=3)
    # anchor ps to something physical (first scalar of the tail)
    state0 = initial_state(x0)
    final, traj = driver.rollout(params, state0, 5)
    assert traj["t"].shape == (5, 16, 60)
    assert np.isfinite(np.asarray(traj["t"])).all()
    assert np.isfinite(np.asarray(traj["qn"])).all()
    # non-negative moisture enforced by the driver
    assert float(jnp.min(traj["q1"])) >= 0.0
    # prvphy memory updated: tm_prvphy of final == prvphy after step n-1
    assert np.isfinite(np.asarray(final.prvphy)).all()
    # water-budget residual diagnostic: finite and bounded over the rollout
    # (water_conservation.ipynb check; a random tiny model won't conserve,
    # but the magnitude must stay stable -- no secular blow-up)
    wres = np.asarray(traj["water_res"])
    assert wres.shape == (5, 16)
    assert np.isfinite(wres).all()
    step_mag = np.abs(wres).mean(axis=1)
    assert step_mag[-1] < 50 * (step_mag[0] + 1e-12)


def test_rollout_ensemble_matches_member_loop(tiny_model):
    """vmapped ensemble rollout == per-member sequential rollouts."""
    import jax

    from climsim_tpu.online.driver import HybridDriver, initial_state

    apply, params = tiny_model
    wrap = W.make_wrapper(apply, STATS5)
    driver = HybridDriver(wrap, GRID)
    states = [initial_state(raw_v4_batch(8, seed=s)) for s in (3, 4)]
    loop = [driver.rollout(params, s, 3)[1] for s in states]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *states)
    _, etraj = driver.rollout_ensemble(params, stacked, 3)
    for k in loop[0]:
        got = np.asarray(etraj[k])
        assert got.shape[0] == 2
        for mi in range(2):
            np.testing.assert_allclose(got[mi], np.asarray(loop[mi][k]),
                                       rtol=1e-5, atol=1e-6)


def test_rollout_uses_hybrid_sigma_pressure(tiny_model):
    """The driver's RH assembly must use the grid's hyam/hybm mid-level
    pressure, not a fabricated sigma law (data_utils.py:1049-1052)."""
    from climsim_tpu.online.driver import HybridDriver, initial_state
    from climsim_tpu import physics

    apply, params = tiny_model
    wrap = W.make_wrapper(apply, STATS5)
    driver = HybridDriver(wrap, GRID)
    x0 = raw_v4_batch(4, seed=5)
    s = initial_state(x0, GRID)
    ps = np.asarray(s.scalars[:, 0])
    want = physics.midlevel_pressure(
        jnp.asarray(ps), jnp.asarray(GRID.hyam), jnp.asarray(GRID.hybm))
    np.testing.assert_allclose(np.asarray(driver._pmid(s.scalars[:, 0])),
                               np.asarray(want), rtol=1e-6)
    # and q1 recovered from RH round-trips through the same pressure
    sl = SPEC4.input_slices
    t = x0[:, sl["state_t"]]
    rh_in = x0[:, sl["state_rh"]]
    rh_back = np.asarray(physics.relative_humidity(
        jnp.asarray(t), s.q1, want))
    np.testing.assert_allclose(rh_back, rh_in, rtol=1e-4)


def test_online_eval_flow(tmp_path):
    """The composed end-to-end online evaluation (train -> wrap -> hybrid
    rollout vs perturbed-IC oracle ensemble -> report + figures), tiny."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "online_eval", os.path.join(root, "scripts", "online_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(["--steps", "4", "--window", "2", "--train-steps", "4",
                    "--batch", "64", "--channels", "8",
                    "--spinup-days", "0",  # production default 180 d is
                    # a chip-scale cost; the tiny CPU flow skips it
                    # exercise every optional training phase of the real
                    # recipe: DAgger, jitter-free polish (fresh low-LR
                    # Adam), and the tendency-correction path
                    "--dagger-rounds", "1", "--dagger-steps", "2",
                    "--dagger-collect", "2", "--polish-steps", "2",
                    "--polish-lr", "1e-4", "--bias-correct", "2",
                    "--bias-iters", "1",
                    "--out", str(tmp_path)])
    assert np.isfinite(out["floor"]) and out["floor"] > 0
    assert len(out["win_rmse"]) == 2
    assert all(np.isfinite(r) for r in out["win_rmse"])
    assert os.path.exists(out["report"])
    for f in ("online_error_growth.png", "online_zonal_bias.png",
              "online_monthly_rmse.png", "online_precip.png"):
        assert os.path.exists(str(tmp_path / "figures" / f)), f


def test_online_eval_two_stage_flow(tmp_path):
    """--scheme two_stage: classifier trained on oracle labels, composed
    through online/two_stage.py, rolled through the same gate; report and
    figures are scheme-suffixed so they never clobber the regressor
    artifacts."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "online_eval_ts", os.path.join(root, "scripts", "online_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(["--steps", "4", "--window", "2", "--train-steps", "2",
                    "--batch", "32", "--channels", "8", "--spinup-days",
                    "0", "--scheme", "two_stage", "--cls-train-steps", "2",
                    "--out", str(tmp_path)])
    assert out["scheme"] == "two_stage"
    assert np.isfinite(out["cls_acc"]) and 0.0 <= out["cls_acc"] <= 1.0
    assert out["report"].endswith("ONLINE_EVAL_two_stage.md")
    assert os.path.exists(out["report"])
    assert np.isfinite(out["micro"]["frac_negative_qn"])
    assert os.path.exists(str(
        tmp_path / "figures" / "online_monthly_rmse_two_stage.png"))
    txt = open(out["report"]).read()
    assert "two-stage" in txt and "classifier" in txt


def test_oracle_systematic_mean_contract():
    """The discriminative-gate oracle (scripts/online_eval.py
    make_oracle_wrapper, mean_gain > 0) must (a) leave the pruned top-15
    output levels mean-free (the production wrapper can't represent a
    tendency there -- online/wrapper.py post-mask, matching the
    reference ClimsimUnet v5 output prune), (b) shift the expected
    tendency of T/q1/u by exactly the returned per-second profiles, and
    (c) keep q's systematic drying non-positive so the shifted
    relaxation target clim - tau*mean stays positive."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec_l = importlib.util.spec_from_file_location(
        "online_eval_mod", os.path.join(root, "scripts", "online_eval.py"))
    mod = importlib.util.module_from_spec(spec_l)
    spec_l.loader.exec_module(mod)

    from climsim_tpu.data.synthetic import synthetic_inputs

    spec5, spec4 = get_varspec("v5"), get_varspec("v4")
    grid = load_default_grid()

    out = {}
    for g in (0.0, 3.0):
        wrap, oracle_v5, fit_std, prof = mod.make_oracle_wrapper(
            spec5, spec4, tend_scale=0.1, gain=64.0, mean_gain=g)
        x = synthetic_inputs(spec5, 4 * grid.ncol, grid, seed=0)
        x[:, spec5.input_slices["icol"]] = (
            np.arange(x.shape[0]) % grid.ncol + 1)[:, None]
        fit_std(x)
        out[g] = np.asarray(oracle_v5(jnp.asarray(x))), prof
    y0, prof0 = out[0.0]
    y3, prof3 = out[3.0]

    assert prof0 == {}  # mean_gain 0 is the anomaly-only system
    assert set(prof3) == {"ptend_t", "ptend_q0001", "ptend_u"}
    for v, p in prof3.items():
        sl = spec5.output_slices[v]
        # (a) zero through the pruned stratosphere, nonzero below
        np.testing.assert_array_equal(p[:15], 0.0)
        assert np.abs(p[24:]).max() > 0
        # (b) the oracle's output shifts by exactly the profile
        # (identical anomaly term at both gains: same seed/weights/stats)
        np.testing.assert_allclose(
            y3[:, sl] - y0[:, sl], np.broadcast_to(p, y0[:, sl].shape),
            atol=1e-7)
    # (c) drying: shifted q target clim - tau*mean >= clim everywhere
    assert (prof3["ptend_q0001"] <= 0).all()


def test_online_diagnostics():
    from climsim_tpu.eval import online_diags as D

    rng = np.random.default_rng(0)
    t_steps, b, l = 8, GRID.ncol, 60
    ref = rng.normal(size=(t_steps, b, l))
    traj = ref + 0.1 * rng.normal(size=ref.shape)
    r = D.weighted_rmse(traj, ref, GRID)
    assert 0.05 < r < 0.2
    lats, bias = D.zonal_mean_bias(traj, ref, GRID)
    assert bias.shape == (len(lats), l)
    growth = D.error_growth(traj, ref, GRID)
    assert growth.shape == (t_steps,)
    stats = D.precip_stats(np.abs(rng.normal(size=(t_steps, b))), GRID)
    assert stats["mean"] > 0
    d = D.drift(traj, GRID)
    assert np.isfinite(d)


def test_online_diagnostics_golden_values():
    """Hand-computable cases for the diagnostics not covered above."""
    from climsim_tpu.eval import online_diags as D

    t_steps, b, l = 4, GRID.ncol, 60
    # uniform error c: every weighted RMSE must equal |c| exactly
    ref = np.zeros((t_steps, b, l))
    traj = ref + 0.37
    assert abs(D.weighted_rmse(traj, ref, GRID) - 0.37) < 1e-12
    np.testing.assert_allclose(D.error_growth(traj, ref, GRID), 0.37,
                               atol=1e-12)

    # two members offset by a constant: pairwise floor == that constant
    m0 = np.zeros((t_steps, b, l))
    m1 = m0 + 0.21
    assert abs(D.ensemble_noise_floor([m0, m1], GRID) - 0.21) < 1e-12
    assert D.ensemble_noise_floor([m0], GRID) == 0.0

    # microphysics fractions on a constructed field
    qn = np.zeros((t_steps, b, l))
    qn[0] = 1e-6          # cloudy quarter
    qn[1] = -1e-9         # negative quarter
    t_field = np.full((t_steps, b, l), 280.0)
    t_field[0, :, :30] = 200.0  # half of the cloudy quarter is cold
    out = D.microphysics_checks(qn, t_field,
                                precc=np.array([[-1.0, 1.0, 1.0, 1.0]]))
    assert abs(out["frac_negative_qn"] - 0.25) < 1e-12
    assert abs(out["frac_cloudy"] - 0.25) < 1e-12
    assert abs(out["frac_cold_cloud"] - 0.125) < 1e-12
    assert abs(out["frac_negative_precc"] - 0.25) < 1e-12
    assert out["qn_max"] == 1e-6


def test_v2rh_rollout_and_retrain_best(tmp_path):
    """v2_rh online rollout path + HPO step-2 retrain flow."""
    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.models import OnlineMLP
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online.driver import V2RHDriver, initial_state
    from climsim_tpu.train.hpo import DirectoryOracle, retrain_best
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v2_rh")
    stats = load_asset_norms("v2_rh")
    m = OnlineMLP(spec=spec, hidden=(16,))
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, spec.input_len)))
    wrap = W.make_v2rh_wrapper(lambda pp, x: m.apply(pp, x), stats, spec)
    drv = V2RHDriver(wrap, GRID)
    x0 = synthetic_inputs(SPEC4, 8, GRID, 0)
    _final, traj = drv.rollout(p, initial_state(x0), 3)
    assert np.isfinite(np.asarray(traj["t"])).all()
    assert np.asarray(traj["t"]).shape == (3, 8, 60)

    oracle = DirectoryOracle(str(tmp_path / "o"))
    oracle.publish([{"lr": 0.1}, {"lr": 0.01}])
    oracle.report(0, 1.0)
    oracle.report(1, 0.5)
    hp, res = retrain_best(oracle, lambda hp: ("trained", hp["lr"]))
    assert hp["lr"] == 0.01 and res[1] == 0.01


def test_window_mean_rmse_and_floor():
    """Monthly-MEAN RMSE: time-averaging kills zero-mean noise (the metric
    exposes bias, unlike instantaneous RMSE which floors at the noise
    level), and the member floor matches the hand-computed pairwise
    value."""
    from climsim_tpu.eval import online_diags as D
    from climsim_tpu.grid import synthetic_grid

    grid = synthetic_grid(ncol=16)
    rng = np.random.default_rng(0)
    T, B, L = 240, grid.ncol, 60
    ref = 250.0 + rng.standard_normal((T, B, L))

    # traj A: same signal + zero-mean noise -> window-mean RMSE ~ noise/sqrt(W)
    noise = rng.standard_normal((T, B, L))
    mm_noise = D.window_mean_rmse(ref + noise, ref, grid, window=120)
    inst_noise = D.weighted_rmse(ref + noise, ref, grid)
    assert mm_noise.shape == (2,)
    assert np.all(mm_noise < 0.25 * inst_noise)  # averaged down ~1/sqrt(120)

    # traj B: pure bias of 0.5 K -> window-mean RMSE == 0.5 exactly
    mm_bias = D.window_mean_rmse(ref + 0.5, ref, grid, window=120)
    np.testing.assert_allclose(mm_bias, 0.5, rtol=1e-6)

    # floor: mean pairwise window-mean RMSE, hand-checked for 3 members
    members = [ref + rng.standard_normal((T, B, L)) for _ in range(3)]
    floor = D.ensemble_window_floor(members, grid, window=120)
    hand = np.mean([D.window_mean_rmse(members[i], members[j], grid, 120)
                    for i, j in ((0, 1), (0, 2), (1, 2))], axis=0)
    np.testing.assert_allclose(floor, hand, rtol=0)


def test_newtonian_relaxation_forcing():
    """The host-dynamics factory: relaxes toward climatology at the right
    rate, diurnal term modulates by cos(lat) and sin(step), carry dtype
    preserved."""
    import jax.numpy as jnp

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.online.driver import (initial_state,
                                           newtonian_relaxation)
    from climsim_tpu.varspec import get_varspec

    grid = load_default_grid()
    spec4 = get_varspec("v4")
    x0 = synthetic_inputs(spec4, grid.ncol, grid, seed=0)
    s = initial_state(x0, grid)
    clim_t = np.asarray(s.t) + 2.0  # offset so the forcing is nonzero
    dt = 1200.0
    tau = 144.0

    f = newtonian_relaxation(clim_t, np.asarray(s.q1), np.asarray(s.u),
                             tau_steps=tau, dt=dt)
    out = f(s, 0)
    assert out.shape == (grid.ncol, 3, 60)
    assert out.dtype == s.dyn.dtype
    # T forcing = (clim - t)/ (tau*dt) = 2/(144*1200)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               2.0 / (tau * dt), rtol=1e-4)
    # q1/u relax toward their own climatology -> zero here
    np.testing.assert_allclose(np.asarray(out[:, 1]), 0.0, atol=1e-12)

    # diurnal: at step = steps_per_day/4, sin = 1 -> amp*cos(lat)/86400
    fd = newtonian_relaxation(clim_t, np.asarray(s.q1), np.asarray(s.u),
                              tau_steps=tau, dt=dt, lat=grid.lat,
                              diurnal_amp_k_per_day=3.0, steps_per_day=72)
    base = np.asarray(f(s, 18)[:, 0])
    with_d = np.asarray(fd(s, 18)[:, 0])
    extra = with_d - base
    expect = np.broadcast_to(
        (3.0 / 86400.0) * np.cos(np.deg2rad(grid.lat))[:, None], (384, 60))
    np.testing.assert_allclose(extra, expect, rtol=1e-3, atol=1e-10)


def test_segmented_rollout_matches_full(tiny_model):
    """Segmented rollouts with start_step threading equal one full
    rollout EXACTLY, including under step-dependent (diurnal) forcing --
    the month-scale eval advances in segments, and a segment restarting
    the step index at 0 would jump the solar phase at every boundary."""
    from climsim_tpu.online.driver import (HybridDriver, initial_state,
                                           newtonian_relaxation)

    apply, params = tiny_model
    wrap = W.make_wrapper(apply, STATS5)
    x0 = raw_v4_batch(16, seed=3)
    s0 = initial_state(x0, GRID)
    forcing = newtonian_relaxation(
        np.asarray(s0.t), np.asarray(s0.q1), np.asarray(s0.u),
        tau_steps=20.0, lat=GRID.lat[:16], diurnal_amp_k_per_day=5.0,
        steps_per_day=8)  # short day so phase errors show within 12 steps
    driver = HybridDriver(wrap, GRID, dyn_forcing=forcing)

    _, full = driver.rollout(params, s0, 12)
    s, seg_t = s0, []
    for k in range(3):
        s, tr = driver.rollout(params, s, 4, start_step=k * 4)
        seg_t.append(np.asarray(tr["t"]))
    np.testing.assert_array_equal(np.concatenate(seg_t),
                                  np.asarray(full["t"]))

    # and WITHOUT the offset the phase genuinely diverges (guards the
    # forcing's step dependence itself)
    s, bad = s0, []
    for _ in range(3):
        s, tr = driver.rollout(params, s, 4)
        bad.append(np.asarray(tr["t"]))
    assert np.abs(np.concatenate(bad) - np.asarray(full["t"])).max() > 1e-6


def test_window_means_from_segment_sums():
    """The device-reduction formulation (per-segment time sums -> window
    means) equals trajectory window means exactly, so the production
    monthly metric and the tested window_mean_rmse formulation agree."""
    from climsim_tpu.eval import online_diags as D
    from climsim_tpu.grid import synthetic_grid

    grid = synthetic_grid(ncol=12)
    rng = np.random.default_rng(5)
    n_segs, seg, b, l = 6, 20, grid.ncol, 60
    segs_per_win, window = 3, 60
    traj = 250.0 + rng.standard_normal((n_segs * seg, b, l))
    ref = 250.0 + rng.standard_normal((n_segs * seg, b, l))

    seg_sums = traj.reshape(n_segs, seg, b, l).sum(axis=1)
    win = D.window_means_from_segment_sums(seg_sums, segs_per_win, window)
    direct = traj.reshape(2, window, b, l).mean(axis=1)
    np.testing.assert_allclose(win, direct, rtol=1e-12)

    # RMSE over those window means == window_mean_rmse on trajectories
    ref_sums = ref.reshape(n_segs, seg, b, l).sum(axis=1)
    rwin = D.window_means_from_segment_sums(ref_sums, segs_per_win, window)
    got = [D.weighted_rmse(win[i][None], rwin[i][None], grid)
           for i in range(2)]
    want = D.window_mean_rmse(traj, ref, grid, window)
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # member axis passes through: (n_segs, M, B, L)
    m = np.stack([seg_sums, ref_sums], axis=1)
    mw = D.window_means_from_segment_sums(m, segs_per_win, window)
    np.testing.assert_allclose(mw[:, 0], win, rtol=0)
    np.testing.assert_allclose(mw[:, 1], rwin, rtol=0)


def test_gate_window_stats_requires_all_variables():
    """The T/Q/U coupling gate: a hybrid that tracks T but drifts in Q
    must fail.  Constructed fields with known constant offsets make every
    weighted RMSE exact (uniform error c -> RMSE == |c|)."""
    from climsim_tpu.eval import online_diags as D

    n_win, n_v, n_m, b, l = 2, 3, 3, GRID.ncol, 60
    rng = np.random.default_rng(5)
    base = rng.normal(size=(n_win, n_v, b, l))
    # members: +/- 0.1 around base per variable -> pairwise floor 0.2, 0.2
    m_win = np.stack([base + off for off in (-0.1, 0.1, -0.1)], axis=2)
    # hybrid: exact ensemble mean in T and U, 1.0 off in Q
    ens = m_win.mean(axis=2)
    h_win = ens.copy()
    h_win[:, 1] += 1.0
    mm_rmse, mm_floor, ratios = D.gate_window_stats(h_win, m_win, GRID)
    assert mm_rmse.shape == (n_v, n_win)
    # floors: mean pairwise |offset difference| = mean(0.2, 0, 0.2)
    np.testing.assert_allclose(mm_floor, 0.2 * 2 / 3, atol=1e-9)
    np.testing.assert_allclose(mm_rmse[0], 0.0, atol=1e-9)
    np.testing.assert_allclose(mm_rmse[1], 1.0, atol=1e-9)
    np.testing.assert_allclose(mm_rmse[2], 0.0, atol=1e-9)
    assert np.all(ratios[0] <= 1.5) and np.all(ratios[2] <= 1.5)
    assert np.all(ratios[1] > 1.5)      # Q drift alone must fail the gate
    assert not bool(np.all(ratios <= 1.5))
