"""RPN ensemble training, U-Net recipes, classifier, CRPS scoring flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.data.pipeline import BatchLoader, BootstrapLoader
from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.varspec import get_varspec

GRID = load_default_grid()


@pytest.fixture(scope="module")
def v1data():
    spec = get_varspec("v1")
    x, y = synthetic_split(spec, n=4 * 384, grid=GRID, seed=0)
    return spec, x, y, compute_norms_from_data(spec, x, y)


@pytest.fixture(scope="module")
def v5data():
    spec = get_varspec("v5")
    x, y = synthetic_split(spec, n=2 * 384, grid=GRID, seed=1)
    x[:, spec.input_slices["icol"]] = np.tile(
        np.arange(1, 385), 2)[:, None]
    # the v5 recipes request the qn transform (v5_online_config); computed
    # norms must fit the lambda too or make_input_transform fails loud
    return spec, x, y, compute_norms_from_data(spec, x, y, qn_transform=True)


def test_mlp_v2_utls_trainer_learns():
    """MLP v2 (UTLS): 557 raw -> 425 normalized-subset inputs -> 368 out,
    end to end (hpo_baseline_v2.py:58-60,154-177)."""
    from climsim_tpu.data.transforms import utls_feature_indices
    from climsim_tpu.train import recipes

    spec = get_varspec("v2")
    x, y = synthetic_split(spec, n=2 * 384, grid=GRID, seed=2)
    stats = compute_norms_from_data(spec, x, y)
    assert utls_feature_indices(spec).shape == (425,)

    tr = recipes.mlp_v2_trainer(spec, stats, (x, y), jax.random.PRNGKey(0),
                                hidden=(64, 64), steps_per_epoch=8)
    # the model consumed the 425-wide subset at init
    kernel0 = jax.tree_util.tree_leaves(
        tr.state.params)[0]
    widths = {l.shape[0] for l in jax.tree_util.tree_leaves(tr.state.params)
              if getattr(l, "ndim", 0) == 2}
    assert 425 in widths and spec.input_len not in widths

    state = tr.state
    first = last = None
    for i in range(24):
        s = (i * 128) % (x.shape[0] - 128)
        state, m = tr.train_step(state, x[s:s + 128], y[s:s + 128])
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert np.isfinite(last) and last < first
    preds = np.asarray(tr.predict(state.params, x[:64]))
    assert preds.shape == (64, spec.output_len)


def test_rpn_training_and_posterior(v1data):
    from climsim_tpu.train.rpn_recipe import rpn_trainer

    spec, x, y, stats = v1data
    tr = rpn_trainer(spec, stats, x, jax.random.PRNGKey(0),
                     ensemble_size=4, hidden=(32, 32))
    loader = BootstrapLoader(x, y, batch_size=64, ensemble_size=4,
                             steps_per_epoch=8, seed=0)
    params, opt_state = tr.params, tr.opt_state
    first = last = None
    for xb, yb in loader:
        params, opt_state, losses = tr.train_step(
            params, opt_state, tr.prior, jnp.asarray(xb), jnp.asarray(yb))
        if first is None:
            first = float(losses.mean())
        last = float(losses.mean())
    assert last < first
    post = np.asarray(tr.posterior(params, tr.prior, jnp.asarray(x[:16])))
    assert post.shape == (16, spec.output_len, 4)
    # members disagree (randomized priors) -> nonzero spread
    assert float(post.std(axis=-1).mean()) > 0


def test_unet_trainer_v5(v5data):
    from climsim_tpu.train import recipes

    spec, x, y, stats = v5data
    tr = recipes.unet_trainer(
        spec, stats, (x, y), jax.random.PRNGKey(0), steps_per_epoch=4,
        model_kw=dict(model_channels=8, channel_mult=(1,), num_blocks=1,
                      attn_resolutions=(32,)))
    xb, yb = x[:32], y[:32]
    state, m = tr.train_step(tr.state, xb, yb)
    state, m2 = tr.train_step(state, xb, yb)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) <= float(m["loss"]) * 1.5
    preds = tr.predict(state.params, x[:64])
    assert preds.shape == (64, spec.output_len)


def test_unet_trainer_energy_loss(v5data):
    from climsim_tpu.train import recipes

    spec, x, y, stats = v5data
    tr = recipes.unet_trainer(
        spec, stats, (x, y), jax.random.PRNGKey(0), steps_per_epoch=4,
        energy_weight=1e-12, grid=GRID,
        model_kw=dict(model_channels=8, channel_mult=(1,), num_blocks=1,
                      attn_resolutions=()))
    state, m = tr.train_step(tr.state, x[:16], y[:16])
    assert "energy_loss" in m
    assert np.isfinite(float(m["energy_loss"]))


def test_unet_classifier_recipe(v5data):
    from climsim_tpu.train import recipes

    spec, x, y, stats = v5data
    tr = recipes.unet_classifier_trainer(
        spec, stats, (x, y), jax.random.PRNGKey(0),
        model_kw=dict(model_channels=8, channel_mult=(1,), num_blocks=1,
                      attn_resolutions=()))
    state, m = tr.train_step(tr.state, x[:32], y[:32])
    assert 0.0 <= float(m["accuracy"]) <= 1.0
    probs = np.asarray(tr.predict(state.params, x[:8]))
    assert probs.shape == (8, 60, 3)  # 3-class per-level scheme
    assert (probs >= 0).all() and (probs <= 1).all()
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)

    # label construction matches the reference's thresholds
    from climsim_tpu.train.recipes import classifier_labels

    labels = np.asarray(classifier_labels(x[:32], y[:32], spec))
    assert labels.shape == (32, 60)
    assert set(np.unique(labels)) <= {0, 1, 2}


def test_crps_scoring_flow(v1data):
    """Stochastic model -> samples -> weighted CRPS table end to end,
    exercising the sampled weighting the reference left unimplemented."""
    from climsim_tpu.eval.scoring import offline_score
    from climsim_tpu.train import recipes

    spec, x, y, stats = v1data
    tr = recipes.hsr_trainer(spec, stats, (x, y), jax.random.PRNGKey(0),
                             hidden=32, layers=1)
    loader = BatchLoader(x, y, 256, seed=0)
    state = tr.state
    for xb, yb in loader:
        state, _ = tr.train_step(state, xb, yb)

    from climsim_tpu.data.transforms import make_target_transform

    preds = tr.predict(state.params, x)
    samples = np.asarray(tr.sample(state.params, x, jax.random.PRNGKey(1),
                                   num_samples=8))
    tgt = np.asarray(make_target_transform(spec, stats)(y))
    tables, per_idx = offline_score(
        spec, GRID, stats,
        (x - stats.inp_sub) / stats.inp_div, tgt,
        {"hsr": preds}, {"hsr": samples})
    row = tables["hsr"]["ptend_t"]
    assert {"MAE", "RMSE", "R2", "bias", "CRPS"} <= set(row)
    assert np.isfinite(row["CRPS"]) and row["CRPS"] > 0
    # CRPS <= MAE identity for any sample set (Jensen)
    assert row["CRPS"] <= row["MAE"] * 1.2
    assert per_idx["hsr"]["MAE"].shape == (spec.output_len,)


def test_tables_to_dataframe(v1data):
    from climsim_tpu.eval.scoring import offline_score, tables_to_dataframe

    spec, x, y, stats = v1data
    from climsim_tpu.data.transforms import make_target_transform

    tgt = np.asarray(make_target_transform(spec, stats)(y))
    preds = tgt + 0.1 * np.random.default_rng(0).normal(size=tgt.shape)
    tables, _ = offline_score(spec, GRID, stats,
                              (x - stats.inp_sub) / stats.inp_div,
                              tgt, {"m": preds.astype(np.float32)})
    df = tables_to_dataframe(tables)
    assert df.loc[("m", "ptend_t"), "R2"] > 0.5


def test_water_loss_penalty(v5data):
    from climsim_tpu.train import recipes

    spec, x, y, stats = v5data
    tr = recipes.unet_trainer(
        spec, stats, (x, y), jax.random.PRNGKey(0), steps_per_epoch=4,
        energy_weight=1e-12, water_weight=1e-6, grid=GRID,
        model_kw=dict(model_channels=8, channel_mult=(1,), num_blocks=1,
                      attn_resolutions=()))
    state, m = tr.train_step(tr.state, x[:16], y[:16])
    assert "water_loss" in m and "energy_loss" in m
    assert np.isfinite(float(m["water_loss"]))

    # the penalty is exactly zero when pred == target
    from climsim_tpu.train import losses as L
    import jax.numpy as jnp

    yy = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, spec.output_len)).astype(np.float32))
    ps = jnp.asarray(np.random.default_rng(1).uniform(9e4, 1e5, 8))
    lh = jnp.asarray(np.random.default_rng(2).uniform(0, 200, 8))
    w = L.water_loss(yy, yy, ps, lh, jnp.asarray(GRID.hyai),
                     jnp.asarray(GRID.hybi),
                     jnp.asarray(stats.out_scale.astype(np.float32)), spec)
    assert float(w) == 0.0
