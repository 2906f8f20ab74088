"""Physics golden tests: jax implementations vs independent f64 numpy."""

import jax.numpy as jnp
import numpy as np

from climsim_tpu import physics


def test_eliq_against_polyval(rng):
    t = rng.uniform(180, 320, size=(1000,))
    # independent evaluation with numpy polyval, reference coefficients
    a = [-0.976195544e-15, -0.952447341e-13, 0.640689451e-10, 0.206739458e-7,
         0.302950461e-5, 0.264847430e-3, 0.142986287e-1, 0.443987641,
         6.11239921]
    want = 100 * np.polyval(a, np.maximum(-80, t - 273.16))
    got = np.asarray(physics.eliq(jnp.asarray(t, dtype=jnp.float64)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eice_piecewise_branches(rng):
    # cover all three branches: warm (>273.15), mid, cold (<185)
    t = np.concatenate([
        rng.uniform(274, 320, 100),
        rng.uniform(186, 273, 100),
        rng.uniform(100, 184, 100),
    ])
    got = np.asarray(physics.eice(jnp.asarray(t)))
    want = physics.eice_np(t)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    # warm branch equals eliq
    np.testing.assert_allclose(
        np.asarray(physics.eice(jnp.asarray(t[:100]))),
        np.asarray(physics.eliq(jnp.asarray(t[:100]))), rtol=1e-6)


def test_liquid_fraction_ramp():
    t = jnp.array([200.0, 253.16, 263.16, 273.16, 300.0])
    frac = np.asarray(physics.liquid_fraction(t))
    np.testing.assert_allclose(frac, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)


def test_relative_humidity_matches_numpy(rng):
    t = rng.uniform(200, 310, (32, 60))
    q = rng.uniform(1e-7, 2e-2, (32, 60))
    pmid = rng.uniform(1e3, 1e5, (32, 60))
    got = np.asarray(physics.relative_humidity(
        jnp.asarray(t), jnp.asarray(q), jnp.asarray(pmid)))
    want = physics.relative_humidity_np(t, q, pmid)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_pressure_grid(grid384, rng):
    ps = rng.uniform(6e4, 1.05e5, (8,))
    dp = np.asarray(physics.pressure_thickness(
        jnp.asarray(ps), jnp.asarray(grid384.hyai), jnp.asarray(grid384.hybi)))
    assert dp.shape == (8, 60)
    assert (dp > 0).all()
    # sum(dp) = p_surf_interface - p_top_interface
    p = physics.interface_pressure(
        jnp.asarray(ps), jnp.asarray(grid384.hyai), jnp.asarray(grid384.hybi))
    p = np.asarray(p)
    np.testing.assert_allclose(dp.sum(-1), p[:, -1] - p[:, 0], rtol=1e-6)
    # terrain-following bottom: p at the surface ~= ps
    np.testing.assert_allclose(p[:, -1], ps, rtol=1e-6)


def test_repartition_conserves_qn(rng):
    n = 64
    t = rng.uniform(210, 300, (n, 60)).astype(np.float32)
    qc = rng.uniform(0, 1e-4, (n, 60)).astype(np.float32)
    qi = rng.uniform(0, 1e-4, (n, 60)).astype(np.float32)
    dt = rng.normal(0, 1e-4, (n, 60)).astype(np.float32)
    dqn = rng.normal(0, 1e-9, (n, 60)).astype(np.float32)
    dqc, dqi = physics.repartition_clouds(t, qc, qi, jnp.asarray(dt),
                                          jnp.asarray(dqn))
    # dqc + dqi must reconstruct dqn exactly (water conservation)
    np.testing.assert_allclose(np.asarray(dqc + dqi), dqn, atol=1e-10)
    # fully-warm columns put everything in liquid
    t_warm = np.full((4, 60), 300.0, np.float32)
    dqc2, dqi2 = physics.repartition_clouds(
        t_warm, qc[:4], qi[:4], jnp.zeros((4, 60)), jnp.asarray(dqn[:4]))
    qi_new = qi[:4] + np.asarray(dqi2) * 1200.0
    np.testing.assert_allclose(qi_new, 0.0, atol=1e-9)


def test_energy_residual_zero_for_truth(grid384, rng):
    ps = rng.uniform(9e4, 1.03e5, (16,))
    dt = rng.normal(size=(16, 60))
    dq = rng.normal(size=(16, 60))
    res = physics.column_energy_residual(
        jnp.asarray(dt), jnp.asarray(dq), jnp.asarray(ps),
        jnp.asarray(grid384.hyai), jnp.asarray(grid384.hybi),
        dt_true=jnp.asarray(dt), dq_true=jnp.asarray(dq))
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-4)
