"""Multi-seed vmapped training (train/multiseed.py).

Oracle: replica k of the vmapped step must match an independent
single-trainer run with the same seed exactly -- vmap only batches the
work, it must not change any replica's trajectory.
"""

import jax
import numpy as np
import pytest

from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.parallel.mesh import ShardingRules, make_mesh
from climsim_tpu.train import recipes
from climsim_tpu.train.multiseed import multiseed, seed_spread
from climsim_tpu.varspec import get_varspec

SPEC = get_varspec("v1")
GRID = load_default_grid()


@pytest.fixture(scope="module")
def data():
    x, y = synthetic_split(SPEC, n=1024, grid=GRID, seed=0, noise=0.02)
    stats = compute_norms_from_data(SPEC, x, y)
    return x, y, stats


def test_multiseed_matches_single_runs(data):
    x, y, stats = data
    seeds = [3, 17, 42]
    ms = multiseed(recipes.mlp_trainer, SPEC, stats, (x, y), seeds,
                   hidden=(64,), steps_per_epoch=4)
    state = ms.state
    for s in range(3):
        xb, yb = x[s * 256:(s + 1) * 256], y[s * 256:(s + 1) * 256]
        state, metrics = ms.train_step(state, xb, yb)
    assert metrics["loss"].shape == (3,)

    # replica 1 == independent run with seed 17 on the same batches
    tr = recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(17),
                             hidden=(64,), steps_per_epoch=4)
    st = tr.state
    for s in range(3):
        xb, yb = x[s * 256:(s + 1) * 256], y[s * 256:(s + 1) * 256]
        st, m = tr.train_step(st, xb, yb)
    np.testing.assert_allclose(float(metrics["loss"][1]),
                               float(m["loss"]), rtol=1e-6)
    got = ms.unstack_params(state.params)[1]
    for a, b in zip(jax.tree.leaves(jax.device_get(got)),
                    jax.tree.leaves(jax.device_get(st.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    # replicas genuinely differ from each other
    p0, p2 = (ms.unstack_params(state.params)[i] for i in (0, 2))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p2))]
    assert max(diffs) > 1e-4

    # stacked predictions and spread diagnostics
    preds = np.asarray(ms.predict(state.params, x[:64]))
    assert preds.shape == (3, 64, SPEC.output_len)
    sp = seed_spread(preds)
    assert sp["mean_spread"].shape == (SPEC.output_len,)
    assert np.all(sp["mean_spread"] >= 0)


def test_multiseed_lr_sweep(data):
    """Per-seed lr_scale: scale 0 freezes that replica only -- a vmapped
    LR sweep through the plateau mechanism."""
    x, y, stats = data
    ms = multiseed(recipes.mlp_trainer, SPEC, stats, (x, y), [1, 1],
                   lr_scales=[1.0, 0.0], hidden=(64,), steps_per_epoch=4)
    before = jax.device_get(ms.state.params)
    state, _ = ms.train_step(ms.state, x[:256], y[:256])
    after = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        assert np.abs(np.asarray(a[0]) - np.asarray(b[0])).max() > 0
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_multiseed_stochastic_and_sharded(data):
    x, y, stats = data
    # cVAE replicas with sampling over the seed axis
    ms = multiseed(recipes.cvae_trainer, SPEC, stats, (x, y), [0, 1],
                   hidden=32, layers=1, latent=4)
    state, m = ms.train_step(ms.state, x[:256], y[:256])
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    s = ms.sample(state.params, x[:8], jax.random.PRNGKey(0), 4)
    assert np.asarray(s).shape == (2, 8, SPEC.output_len, 4)

    # seed axis sharded over the mesh model axis
    mesh = make_mesh(num_data=2, num_model=4,
                     devices=jax.devices("cpu")[:8])
    rules = ShardingRules(mesh)
    ms2 = multiseed(recipes.mlp_trainer, SPEC, stats, (x, y),
                    [0, 1, 2, 3], rules=rules, hidden=(32,),
                    steps_per_epoch=2)
    st, m2 = ms2.train_step(ms2.state, *rules.shard_batch(x[:256], y[:256]))
    assert m2["loss"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(m2["loss"])))


def test_run_experiment_multiseed(tmp_path):
    """Runner-level multi-seed flow: config with train.seeds trains K
    replicas and checkpoints the stacked params."""
    from climsim_tpu.config import PRESETS
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["mlp_v1"].override(
        "train.epochs=2", "data.num_synthetic=1024",
        "data.batch_size=256", 'model_kw={"hidden": [32]}',
        "train.seeds=[0, 7]", f'train.checkpoint_dir="{tmp_path}/ck"')
    out = run_experiment(cfg, verbose=False)
    assert out["trainer"].num_seeds == 2
    assert len(out["history"].rows) == 2
    leaves = jax.tree.leaves(jax.device_get(out["state"].params))
    assert all(l.shape[0] == 2 for l in leaves)
    assert out["trainer"].trainers[0] is not out["trainer"].trainers[1]


def test_run_experiment_single_seed_list_honored(tmp_path):
    """train.seeds=[7] (one element) must still take the multi-seed path
    so the seed and lr_scales are honored, not silently ignored."""
    from climsim_tpu.config import PRESETS
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["mlp_v1"].override(
        "train.epochs=1", "data.num_synthetic=512",
        "data.batch_size=128", 'model_kw={"hidden": [32]}',
        "train.seeds=[7]", "train.lr_scales=[0.5]")
    out = run_experiment(cfg, verbose=False)
    assert out["trainer"].num_seeds == 1
    assert float(out["state"].lr_scale[0]) == 0.5


def test_run_experiment_multiseed_hsr_staged():
    """HSR multi-seed runs must honor the staged MSE->NLL switch
    (stage2_step after epochs//3), matching the single-seed path."""
    from climsim_tpu.config import PRESETS
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["hsr_v1"].override(
        "train.epochs=3", "data.num_synthetic=512",
        "data.batch_size=128", 'model_kw={"hidden": 32, "layers": 1}',
        "train.seeds=[0, 1]")
    out = run_experiment(cfg, verbose=False)
    assert len(out["history"].rows) == 3
    assert np.isfinite(out["history"].rows[-1]["train_loss"])
