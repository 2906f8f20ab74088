"""Dataset statistics engine + water/energy conservation oracles.

The conservation check replicates the spec of
demo_notebooks/water_conservation.ipynb: column-integrated water tendency
equals evaporation minus precipitation.
"""

import jax.numpy as jnp
import numpy as np

from climsim_tpu import physics
from climsim_tpu.data.statistics import (HistogramAccumulator, RunningStats,
                                         compute_statistics)
from climsim_tpu.grid import load_default_grid
from climsim_tpu.varspec import get_varspec

GRID = load_default_grid()


def test_running_stats_matches_numpy(rng):
    data = rng.normal(size=(10_000, 7)) * 3 + 1
    rs = RunningStats(7)
    for s in range(0, 10_000, 999):  # uneven chunks
        rs.update(data[s:s + 999])
    np.testing.assert_allclose(rs.mean, data.mean(0), rtol=1e-10)
    np.testing.assert_allclose(rs.std, data.std(0, ddof=1), rtol=1e-10)
    np.testing.assert_allclose(rs.minv, data.min(0))
    np.testing.assert_allclose(rs.maxv, data.max(0))
    assert rs.count == 10_000


def test_histograms(rng):
    data = rng.normal(size=(5000, 3))
    h = HistogramAccumulator(3, bins=20)
    h.update(data[:2500])
    h.update(data[2500:])
    assert h.counts.shape == (3, 20)
    assert (h.counts.sum(axis=1) == 5000).all()
    e = h.edges(0)
    assert len(e) == 21


def test_compute_statistics_by_variable(rng):
    spec = get_varspec("v1")
    y = rng.normal(size=(3 * 384, spec.output_len))
    stats = compute_statistics(y, spec, "outputs", bins=10)
    assert stats["ptend_t"]["mean"].shape == (60,)
    assert stats["cam_out_NETSW"]["mean"].shape == (1,)
    np.testing.assert_allclose(stats["ptend_t"]["mean"],
                               y[:, :60].mean(0), rtol=1e-10)
    assert stats["ptend_t"]["histogram"].shape == (60, 10)


def test_water_conservation_residual_oracle(rng):
    """Construct tendencies that exactly balance E - P; residual must
    vanish, and unbalanced tendencies must not."""
    n = 32
    ps = rng.uniform(9e4, 1.03e5, n)
    dp = np.asarray(physics.pressure_thickness(
        jnp.asarray(ps), jnp.asarray(GRID.hyai), jnp.asarray(GRID.hybi)))
    dq_v = rng.normal(size=(n, 60)) * 1e-8
    dq_c = rng.normal(size=(n, 60)) * 1e-9
    dq_i = rng.normal(size=(n, 60)) * 1e-9
    col = ((dq_v + dq_c + dq_i) * dp).sum(-1) / physics.GRAV
    lhflx = rng.uniform(0, 200, n)
    evap = lhflx / physics.LV
    precc = (evap - col) / physics.RHO_H2O  # solve for balancing precip

    res = physics.column_water_residual(
        (jnp.asarray(dq_v), jnp.asarray(dq_c), jnp.asarray(dq_i)),
        jnp.asarray(ps), jnp.asarray(GRID.hyai), jnp.asarray(GRID.hybi),
        jnp.asarray(precc), jnp.zeros(n), jnp.asarray(lhflx))
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-12)

    res_bad = physics.column_water_residual(
        (jnp.asarray(dq_v * 2), jnp.asarray(dq_c), jnp.asarray(dq_i)),
        jnp.asarray(ps), jnp.asarray(GRID.hyai), jnp.asarray(GRID.hybi),
        jnp.asarray(precc), jnp.zeros(n), jnp.asarray(lhflx))
    assert np.abs(np.asarray(res_bad)).max() > 0


def test_wrapper_rollout_water_budget():
    """The wrapper's cloud repartitioning must keep total water unchanged
    through a rollout step: q1+qc+qi tendencies sum equals q1+qn sum."""
    import jax

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.models import OnlineMLP
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online import wrapper as W

    spec4 = get_varspec("v4")
    spec5 = get_varspec("v5")
    stats5 = load_asset_norms("v5")
    model = OnlineMLP(spec=spec5, hidden=(32,))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, spec5.input_len)))
    wrap = W.make_wrapper(lambda p, x: model.apply(p, x), stats5)
    x = synthetic_inputs(spec4, 8, GRID, seed=0)
    out = np.asarray(wrap(params, jnp.asarray(x)))
    # dqc + dqi == dqn as emitted (water closed under repartitioning);
    # cross-check via two independent paths through the wrapper outputs
    dqn_via_clouds = out[:, 120:180] + out[:, 180:240]
    # reconstruct dqn directly: qn_new - qn_before over dt
    qn_before = x[:, 120:180] + x[:, 180:240]
    t_new = x[:, 0:60] + out[:, 0:60] * 1200.0
    qc_new = x[:, 120:180] + out[:, 120:180] * 1200.0
    qi_new = x[:, 180:240] + out[:, 180:240] * 1200.0
    np.testing.assert_allclose(
        (qc_new + qi_new - qn_before) / 1200.0, dqn_via_clouds,
        rtol=1e-4, atol=1e-12)
    # and the liquid fraction of the new state matches the T ramp
    liq = np.asarray(physics.liquid_fraction(jnp.asarray(t_new)))
    denom = np.maximum(qc_new + qi_new, 1e-20)
    frac = qc_new / denom
    mask = (qc_new + qi_new) > 1e-12
    np.testing.assert_allclose(frac[mask], liq[mask], atol=1e-3)


def test_high_res_scale_weighting():
    """The metric engine handles the high-res 21,600-column grid shape
    (website/dataset.md:10-12) without per-column Python work."""
    from climsim_tpu.eval.weighting import weight_outputs
    from climsim_tpu.grid import synthetic_grid

    grid_hr = synthetic_grid(ncol=21_600, seed=1)
    spec = get_varspec("v1")
    rng = np.random.default_rng(0)
    t = 2
    out = rng.normal(size=(t * grid_hr.ncol, spec.output_len)
                     ).astype(np.float32)
    dp = np.abs(rng.normal(size=(t * grid_hr.ncol, 60))) + 1.0
    w = weight_outputs(out, spec, grid_hr, dp, stats=None)
    assert w["ptend_t"].shape == (t, 21_600, 60)
    assert np.isfinite(w["ptend_t"]).all()


def test_ensemble_noise_floor():
    from climsim_tpu.eval.online_diags import (ensemble_noise_floor,
                                               weighted_rmse)

    rng = np.random.default_rng(0)
    base = rng.normal(size=(6, GRID.ncol, 60))
    members = [base + 0.1 * rng.normal(size=base.shape) for _ in range(3)]
    floor = ensemble_noise_floor(members, GRID)
    # pairwise RMSE of iid 0.1-noise members ~ 0.1*sqrt(2)
    assert 0.1 < floor < 0.2
    # a 'model' with matching noise level sits at the floor
    model = base + 0.1 * rng.normal(size=base.shape)
    r = weighted_rmse(model, members[0], GRID)
    assert abs(r - floor) < 0.05
