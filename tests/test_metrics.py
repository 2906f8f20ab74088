"""Metric-engine golden tests: dual-implementation equivalence.

Replicates the reference's strongest correctness oracle (tests/
unit_tests.ipynb compares two independent metric implementations): here the
vectorized engine is checked against naive loop/brute-force versions.
"""

import numpy as np

from climsim_tpu.eval import metrics
from climsim_tpu.eval.weighting import (pressure_thickness_from_inputs,
                                        weight_outputs)
from climsim_tpu.norms import identity_norms, load_asset_norms
from climsim_tpu.varspec import get_varspec


def test_basic_metrics_against_naive(rng):
    t, g, l = 5, 7, 3
    pred = rng.normal(size=(t, g, l))
    targ = rng.normal(size=(t, g, l))

    def naive(fn):
        vals = np.zeros((g, l))
        for gi in range(g):
            for li in range(l):
                vals[gi, li] = fn(pred[:, gi, li], targ[:, gi, li])
        return vals.mean(axis=0)

    np.testing.assert_allclose(
        metrics.mae(pred, targ), naive(lambda p, y: np.abs(p - y).mean()))
    np.testing.assert_allclose(
        metrics.rmse(pred, targ),
        naive(lambda p, y: np.sqrt(((p - y) ** 2).mean())))
    np.testing.assert_allclose(
        metrics.r2(pred, targ),
        naive(lambda p, y: 1 - ((p - y) ** 2).sum()
              / ((y - y.mean()) ** 2).sum()))
    np.testing.assert_allclose(
        metrics.bias(pred, targ), naive(lambda p, y: p.mean() - y.mean()))


def test_crps_against_bruteforce(rng):
    """ECDF identity vs direct E|X-y| - 0.5 E|X-X'| estimator."""
    t, g, s = 4, 6, 16
    samples = rng.normal(size=(t, g, s))
    target = rng.normal(size=(t, g))

    got = metrics.crps(samples, target, avg_grid=False)

    # brute force with the unbiased pairwise term: sum_{i<j}|xi-xj|/(S(S-1))
    want = np.zeros((t, g))
    for ti in range(t):
        for gi in range(g):
            x = samples[ti, gi]
            term1 = np.abs(x - target[ti, gi]).mean()
            term2 = np.abs(x[:, None] - x[None, :]).sum() / (s * (s - 1))
            want[ti, gi] = term1 - 0.5 * term2
    np.testing.assert_allclose(got, want.mean(axis=0), rtol=1e-10)


def test_crps_perfect_deterministic():
    # all samples equal the target -> CRPS 0
    target = np.ones((3, 4))
    samples = np.ones((3, 4, 8))
    np.testing.assert_allclose(metrics.crps(samples, target), 0.0)


def test_weighting_against_naive(grid384, rng):
    """Vectorized weighting vs a per-variable loop implementation (v1)."""
    spec = get_varspec("v1")
    stats = load_asset_norms("v1")
    t = 3
    n = t * grid384.ncol
    inputs = rng.normal(size=(n, spec.input_len))
    output = rng.normal(size=(n, spec.output_len))

    dp = pressure_thickness_from_inputs(inputs, spec, grid384, stats)
    got = weight_outputs(output, spec, grid384, dp, stats)

    # naive reference computation
    area = grid384.area / grid384.area.mean()
    from climsim_tpu.physics import CP, GRAV, LV, RHO_H2O

    unscaled = output / stats.out_scale[None, :]
    dp3 = dp.reshape(t, grid384.ncol, 60)
    ptend_t = unscaled[:, :60].reshape(t, -1, 60) * dp3 / GRAV \
        * area[None, :, None] * CP
    np.testing.assert_allclose(got["ptend_t"], ptend_t, rtol=1e-12)
    ptend_q = unscaled[:, 60:120].reshape(t, -1, 60) * dp3 / GRAV \
        * area[None, :, None] * LV
    np.testing.assert_allclose(got["ptend_q0001"], ptend_q, rtol=1e-12)
    precc = unscaled[:, 123].reshape(t, -1) * area[None, :] * LV * RHO_H2O
    np.testing.assert_allclose(got["cam_out_PRECC"], precc, rtol=1e-12)
    netsw = unscaled[:, 120].reshape(t, -1) * area[None, :]
    np.testing.assert_allclose(got["cam_out_NETSW"], netsw, rtol=1e-12)


def test_weighting_wind_conversion(grid384, rng):
    """v2 u/v blocks use the wind-speed tendency as the unit factor."""
    spec = get_varspec("v2")
    t = 2
    n = t * grid384.ncol
    output = rng.normal(size=(n, spec.output_len))
    dp = np.abs(rng.normal(size=(n, 60))) + 1.0
    got = weight_outputs(output, spec, grid384, dp, stats=None)

    from climsim_tpu.physics import GRAV

    area = grid384.area / grid384.area.mean()
    du = output[:, 240:300].reshape(t, -1, 60)
    dv = output[:, 300:360].reshape(t, -1, 60)
    wind = np.sqrt(du**2 + dv**2)
    dp3 = dp.reshape(t, -1, 60)
    want_u = du * dp3 / GRAV * area[None, :, None] * wind
    np.testing.assert_allclose(got["ptend_u"], want_u, rtol=1e-12)


def test_metrics_table_shapes(grid384, rng):
    spec = get_varspec("v1")
    stats = identity_norms(spec)
    t = 2
    n = t * grid384.ncol
    inputs = rng.normal(size=(n, spec.input_len))
    inputs[:, spec.ps_index] = rng.uniform(9e4, 1.03e5, n)
    target = rng.normal(size=(n, spec.output_len))
    pred = target + 0.1 * rng.normal(size=target.shape)

    dp = pressure_thickness_from_inputs(inputs, spec, grid384, None)
    tw = weight_outputs(target, spec, grid384, dp, stats)
    pw = weight_outputs(pred, spec, grid384, dp, stats)
    table = metrics.metrics_table(pw, tw)
    assert set(table) == set(spec.outputs)
    for row in table.values():
        assert set(row) == {"MAE", "RMSE", "R2", "bias"}
    per_idx = metrics.metrics_per_index(pw, tw, spec)
    assert per_idx["MAE"].shape == (spec.output_len,)


def test_streaming_scorer_matches_in_memory(grid384, rng):
    """Chunked streaming accumulation == the one-shot scorer, exactly."""
    from climsim_tpu.eval.scoring import offline_score
    from climsim_tpu.eval.streaming import StreamingScorer

    spec = get_varspec("v1")
    stats = load_asset_norms("v1")
    t = 6
    n = t * grid384.ncol
    inputs = rng.normal(size=(n, spec.input_len))
    target = rng.normal(size=(n, spec.output_len))
    pred = target + 0.3 * rng.normal(size=target.shape)

    want, _ = offline_score(spec, grid384, stats, inputs, target,
                            {"m": pred})

    sc = StreamingScorer(spec, grid384, stats)
    chunk = 2 * grid384.ncol
    for s in range(0, n, chunk):
        sc.update(inputs[s:s + chunk], target[s:s + chunk],
                  {"m": pred[s:s + chunk]})
    got = sc.tables()
    for v in spec.outputs:
        for m in ("MAE", "RMSE", "R2", "bias"):
            np.testing.assert_allclose(got["m"][v][m], want["m"][v][m],
                                       rtol=1e-10, err_msg=f"{v}/{m}")


def test_streaming_crps_matches_in_memory(grid384, rng):
    from climsim_tpu.eval.scoring import offline_score
    from climsim_tpu.eval.streaming import StreamingScorer

    spec = get_varspec("v1")
    stats = load_asset_norms("v1")
    t, s_n = 4, 6
    n = t * grid384.ncol
    inputs = rng.normal(size=(n, spec.input_len))
    target = rng.normal(size=(n, spec.output_len))
    pred = target + 0.3 * rng.normal(size=target.shape)
    samples = pred[..., None] + 0.2 * rng.normal(
        size=(n, spec.output_len, s_n))

    want, _ = offline_score(spec, grid384, stats, inputs, target,
                            {"m": pred}, {"m": samples})
    sc = StreamingScorer(spec, grid384, stats)
    chunk = 2 * grid384.ncol
    for s in range(0, n, chunk):
        sc.update(inputs[s:s + chunk], target[s:s + chunk],
                  {"m": pred[s:s + chunk]}, {"m": samples[s:s + chunk]})
    got = sc.tables()
    for v in spec.outputs:
        np.testing.assert_allclose(got["m"][v]["CRPS"],
                                   want["m"][v]["CRPS"], rtol=1e-10, err_msg=v)
