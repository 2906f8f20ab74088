"""Checkpoint subsystem: orbax async/sharded saves and ELASTIC resume --
a run checkpointed on an 8-device mesh restores onto a smaller mesh (or a
single device) and keeps training.  The reference's Modulus checkpoints
are synchronous and mesh-oblivious; resharding restores are new here.
"""

import jax
import numpy as np
import pytest

from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.parallel.mesh import ShardingRules, make_mesh
from climsim_tpu.train import recipes
from climsim_tpu.train.checkpoints import OrbaxCheckpointer
from climsim_tpu.varspec import get_varspec

SPEC = get_varspec("v1")
GRID = load_default_grid()


@pytest.fixture(scope="module")
def data():
    x, y = synthetic_split(SPEC, n=512, grid=GRID, seed=0, noise=0.02)
    stats = compute_norms_from_data(SPEC, x, y)
    return x, y, stats


def test_orbax_async_save_restore(tmp_path, data):
    x, y, stats = data
    tr = recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(0),
                             hidden=(32,), steps_per_epoch=2)
    state, _ = tr.train_step(tr.state, x[:256], y[:256])
    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(1, jax.device_get(state.params))
    state, _ = tr.train_step(state, x[256:], y[256:])
    ck.save(2, jax.device_get(state.params))
    ck.wait()
    assert ck.steps() == [1, 2]

    got = ck.restore(jax.device_get(state.params))  # latest = step 2
    for a, b in zip(jax.tree.leaves(got),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and an older step by number
    old = ck.restore(jax.device_get(state.params), step=1)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(old), jax.tree.leaves(got))]
    assert max(diffs) > 0


def test_elastic_resume_smaller_mesh(tmp_path, data):
    """Train on an 8-device mesh -> checkpoint -> restore onto a 2-device
    mesh and a single device; parameters identical, training continues."""
    x, y, stats = data
    mesh8 = make_mesh(num_data=8, devices=jax.devices("cpu")[:8])
    rules8 = ShardingRules(mesh8)
    tr8 = recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(1),
                              hidden=(32,), rules=rules8,
                              steps_per_epoch=2)
    st8, _ = tr8.train_step(tr8.state, *rules8.shard_batch(x[:256], y[:256]))
    ck = OrbaxCheckpointer(str(tmp_path / "elastic"), async_save=False)
    saved = {"params": jax.device_get(st8.params),
             "opt_state": jax.device_get(st8.opt_state)}
    ck.save(1, saved)

    # resume on 2 devices
    mesh2 = make_mesh(num_data=2, devices=jax.devices("cpu")[:2])
    rules2 = ShardingRules(mesh2)
    tr2 = recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(99),
                              hidden=(32,), rules=rules2,
                              steps_per_epoch=2)
    restored = ck.restore(saved, sharding=rules2.replicated)
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(jax.device_get(st8.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    st2 = tr2.state.replace(params=restored["params"],
                            opt_state=restored["opt_state"])
    st2, m2 = tr2.train_step(st2, *rules2.shard_batch(x[:256], y[:256]))
    assert np.isfinite(float(m2["loss"]))

    # resume on a single device: the 1-device step from the restored
    # params must match the 8-device continuation exactly
    tr1 = recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(5),
                              hidden=(32,), steps_per_epoch=2)
    restored1 = ck.restore(saved)
    st1 = tr1.state.replace(params=restored1["params"],
                            opt_state=restored1["opt_state"],
                            rng=jax.device_get(st8.rng),
                            step=jax.device_get(st8.step))
    st1b, m1 = tr1.train_step(st1, x[:256], y[:256])
    st8b, m8 = tr8.train_step(
        st8, *rules8.shard_batch(x[:256], y[:256]))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(st1b.params)),
                    jax.tree.leaves(jax.device_get(st8b.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_orbax_steps_skips_tmp_dirs(tmp_path, data):
    """A crashed/in-flight atomic save leaves step_N.orbax-checkpoint-tmp-*
    dirs; restore-latest must skip them instead of crashing."""
    import os

    x, y, stats = data
    tr = recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(0),
                             hidden=(32,), steps_per_epoch=2)
    ck = OrbaxCheckpointer(str(tmp_path / "o"), async_save=False)
    ck.save(3, jax.device_get(tr.state.params))
    os.makedirs(tmp_path / "o" / "step_9.orbax-checkpoint-tmp-12345")
    assert ck.steps() == [3]
    got = ck.restore(jax.device_get(tr.state.params))
    assert got is not None
