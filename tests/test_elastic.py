"""In-flight elastic training (train/elastic.py).

Oracles:
  * a run that loses half its devices mid-epoch matches an uninterrupted
    run (same total epochs) within float reduction-order tolerance --
    completed epochs are never re-run, the interrupted epoch replays
    bit-identically from its boundary snapshot;
  * loader ``set_epoch`` replay is exact;
  * a checkpointer-backed run killed between calls resumes from the last
    committed epoch (process-restart recovery).

The reference has no analog (SURVEY.md section 5.3: checkpoint-restart
only).
"""

import jax
import numpy as np
import pytest

from climsim_tpu.data.pipeline import BatchLoader, DeviceResidentLoader
from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.train import recipes
from climsim_tpu.train.elastic import (DeviceFailure, elastic_fit,
                                       probe_devices, usable_data_size)
from climsim_tpu.varspec import get_varspec

SPEC = get_varspec("v1")
GRID = load_default_grid()


@pytest.fixture(scope="module")
def data():
    x, y = synthetic_split(SPEC, n=512, grid=GRID, seed=0, noise=0.02)
    stats = compute_norms_from_data(SPEC, x, y)
    return x, y, stats


def _factories(data, batch=128):
    x, y, stats = data

    def trainer_factory(rules):
        return recipes.mlp_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(0),
                                   rules=rules, hidden=(32,),
                                   steps_per_epoch=x.shape[0] // batch)

    def loader_factory(rules):
        return (BatchLoader(x, y, batch, rules=rules, seed=0), None)

    return trainer_factory, loader_factory


def test_probe_and_mesh_sizing():
    assert len(probe_devices()) == len(jax.devices())
    assert usable_data_size(8, 1, 128) == 8
    assert usable_data_size(5, 1, 128) == 4   # 128 % 5 != 0 -> shrink to 4
    assert usable_data_size(7, 2, 96) == 3    # model axis preserved
    with pytest.raises(ValueError):
        usable_data_size(0, 1, 128)


def test_set_epoch_replays_exactly(data):
    x, y, _ = data
    loader = BatchLoader(x, y, 128, seed=7)
    epochs = [[np.asarray(xb[:, 0]).copy() for xb, _ in loader]
              for _ in range(2)]
    loader.set_epoch(1)
    replay = [np.asarray(xb[:, 0]).copy() for xb, _ in loader]
    for a, b in zip(epochs[1], replay):
        np.testing.assert_array_equal(a, b)
    # device-resident variant
    dl = DeviceResidentLoader(x[:256], y[:256], 64, seed=3)
    e0 = [np.asarray(xb[:, 0]).copy() for xb, _ in dl]
    list(dl)  # consume epoch 1
    dl.set_epoch(0)
    r0 = [np.asarray(xb[:, 0]).copy() for xb, _ in dl]
    for a, b in zip(e0, r0):
        np.testing.assert_array_equal(a, b)


def test_elastic_survives_midrun_device_loss(data):
    tf, lf = _factories(data)
    # uninterrupted oracle
    state_clean, rep_clean = elastic_fit(tf, lf, epochs=3)
    assert rep_clean.failures == 0
    assert rep_clean.mesh_history == [(8, 1)]

    # lose 3 devices in the middle of epoch 1
    lost = jax.devices()[5:]
    fired = []

    def injector(epoch, step):
        if epoch == 1 and step == 1 and not fired:
            fired.append(1)
            raise DeviceFailure("simulated chip loss", lost=lost)

    state, rep = elastic_fit(tf, lf, epochs=3, fault_injector=injector)
    assert rep.failures == 1
    assert rep.epochs_completed == 3
    # 5 survivors, batch 128 -> data axis shrinks to 4
    assert rep.mesh_history == [(8, 1), (4, 1)]
    assert len(rep.recovery_seconds) == 1

    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(state_clean.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert int(state.step) == int(state_clean.step)


def test_elastic_with_device_resident_fused_runner(data):
    """The production combination: DeviceResidentLoader + fused epoch
    runner under elastic_fit; failure mid-run == clean run."""
    x, y, stats = data

    def tf(rules):
        return recipes.mlp_trainer(SPEC, stats, (x, y),
                                   jax.random.PRNGKey(0), rules=rules,
                                   hidden=(32,), steps_per_epoch=4)

    def lf(rules):
        return (DeviceResidentLoader(x, y, 128, rules=rules, seed=0),
                None)

    clean, rep_c = elastic_fit(tf, lf, epochs=3)
    assert rep_c.failures == 0

    lost = jax.devices()[5:]
    fired = []

    def injector(epoch, step):
        if epoch == 1 and not fired:
            fired.append(1)
            raise DeviceFailure(lost=lost)

    state, rep = elastic_fit(tf, lf, epochs=3, fault_injector=injector)
    assert rep.failures == 1 and rep.epochs_completed == 3
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(clean.params))):
        # 8-dev vs 4-dev mesh psum ordering through adam -> tiny drift
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_elastic_preserves_model_axis(data):
    """num_model=2 meshes rebuild as (k, 2) after failures."""
    tf, lf = _factories(data)
    lost = jax.devices()[6:]
    fired = []

    def injector(epoch, step):
        if epoch == 0 and step == 0 and not fired:
            fired.append(1)
            raise DeviceFailure(lost=lost)

    state, rep = elastic_fit(tf, lf, epochs=1, num_model=2,
                             fault_injector=injector)
    # 8 devices -> (4, 2); 6 survivors -> data axis 2 (128 % 3 != 0)
    assert rep.mesh_history == [(4, 2), (2, 2)]
    assert rep.epochs_completed == 1
    assert np.isfinite(rep.epoch_losses[-1])


def test_elastic_scales_back_up_when_devices_return(data):
    """reprobe_every: a degraded run re-expands onto returned devices
    (simulated: injected loss shrinks to 4, the reprobe of the original
    set finds all 8 healthy again) and still matches the clean run."""
    tf, lf = _factories(data)
    state_clean, _ = elastic_fit(tf, lf, epochs=4)

    lost = jax.devices()[4:]
    fired = []

    def injector(epoch, step):
        if epoch == 0 and step == 0 and not fired:
            fired.append(1)
            raise DeviceFailure(lost=lost)

    state, rep = elastic_fit(tf, lf, epochs=4, fault_injector=injector,
                             reprobe_every=2)
    assert rep.failures == 1
    assert rep.expansions == 1
    # shrink to 4, epochs 0-1 degraded, reprobe at epoch 2 -> back to 8
    assert rep.mesh_history == [(8, 1), (4, 1), (8, 1)]
    assert rep.epochs_completed == 4
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(state_clean.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_elastic_gives_up_after_max_failures(data):
    tf, lf = _factories(data)

    def always_fail(epoch, step):
        raise DeviceFailure("flapping")

    with pytest.raises(DeviceFailure):
        elastic_fit(tf, lf, epochs=2, fault_injector=always_fail,
                    max_failures=2)


def test_run_experiment_elastic_cli():
    from climsim_tpu.config import PRESETS
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["mlp_v1"].override(
        "train.epochs=2", "data.num_synthetic=1024",
        "data.batch_size=256", "data.norms=compute",
        "model_kw.hidden=[32]", "train.elastic=true")
    out = run_experiment(cfg, verbose=False)
    assert out["report"].epochs_completed == 2
    assert out["report"].failures == 0
    assert np.isfinite(out["history"].rows[-1]["train_loss"])


def test_elastic_resumes_from_checkpointer(tmp_path, data):
    from climsim_tpu.train.checkpoints import OrbaxCheckpointer

    tf, lf = _factories(data)
    ck = OrbaxCheckpointer(str(tmp_path / "ck"), async_save=False)
    elastic_fit(tf, lf, epochs=2, checkpointer=ck)
    assert ck.steps() == [1, 2]

    # "process restart": fresh call, same checkpointer dir, more epochs
    ck2 = OrbaxCheckpointer(str(tmp_path / "ck"), async_save=False)
    state, rep = elastic_fit(tf, lf, epochs=4, checkpointer=ck2)
    assert rep.epochs_completed == 4
    assert len(rep.epoch_losses) == 2  # only epochs 2,3 ran here

    # oracle: uninterrupted 4-epoch run
    state_clean, _ = elastic_fit(tf, lf, epochs=4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(state_clean.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_elastic_rpn_member_axis_resharding(data):
    """RPN ensemble under elastic_rpn_fit: losing model-axis devices
    mid-epoch redistributes the member axis over the survivors (8
    members on 8 devices -> 8 on 4) and the recovered trajectory matches
    the uninterrupted run (VERDICT r2 weak #7)."""
    from climsim_tpu.data.pipeline import BootstrapLoader
    from climsim_tpu.train.elastic import elastic_rpn_fit, usable_model_size
    from climsim_tpu.train.rpn_recipe import rpn_trainer

    assert usable_model_size(8, 8) == 8
    assert usable_model_size(5, 8) == 4   # largest divisor of 8 that fits
    assert usable_model_size(3, 8) == 2
    with pytest.raises(ValueError):
        usable_model_size(0, 8)

    x, y, stats = data
    E = 8

    def rpn_factory(rules):
        return rpn_trainer(SPEC, stats, x, jax.random.PRNGKey(0),
                           ensemble_size=E, hidden=(16,),
                           ens_sharding=rules.ensemble)

    def loader_factory(rules):
        return BootstrapLoader(x, y, 32, E, rules=rules, seed=0,
                               steps_per_epoch=2)

    (p_clean, _, prior_clean), rep_c = elastic_rpn_fit(
        rpn_factory, loader_factory, epochs=3, ensemble_size=E)
    assert rep_c.failures == 0
    assert rep_c.mesh_history == [(1, 8)]

    lost = jax.devices()[5:]  # lose 3 of the 8 model-axis devices
    fired = []

    def injector(epoch, step):
        if epoch == 1 and step == 1 and not fired:
            fired.append(1)
            raise DeviceFailure("simulated chip loss", lost=lost)

    (p, _, prior), rep = elastic_rpn_fit(
        rpn_factory, loader_factory, epochs=3, ensemble_size=E,
        fault_injector=injector)
    assert rep.failures == 1
    assert rep.epochs_completed == 3
    assert rep.mesh_history == [(1, 8), (1, 4)]

    # the frozen prior must survive resharding bit-exactly
    for a, b in zip(jax.tree.leaves(jax.device_get(prior)),
                    jax.tree.leaves(jax.device_get(prior_clean))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(jax.device_get(p)),
                    jax.tree.leaves(jax.device_get(p_clean))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_elastic_rpn_uses_leftover_devices_for_data(data):
    """With fewer members than healthy devices, elastic_rpn_fit now
    carves the leftover devices into a data axis ((2, 4) for 4 members
    on 8 chips) instead of idling them, and per-member batches shard
    their batch dim over it; losing devices collapses back to (1, 4)
    and the trajectory still matches the uninterrupted run."""
    from climsim_tpu.data.pipeline import BootstrapLoader
    from climsim_tpu.train.elastic import elastic_rpn_fit
    from climsim_tpu.train.rpn_recipe import rpn_trainer

    x, y, stats = data
    E = 4

    def rpn_factory(rules):
        return rpn_trainer(SPEC, stats, x, jax.random.PRNGKey(0),
                           ensemble_size=E, hidden=(16,),
                           ens_sharding=rules.ensemble)

    def loader_factory(rules):
        return BootstrapLoader(x, y, 32, E, rules=rules, seed=0,
                               steps_per_epoch=2)

    (p_clean, _, _), rep_c = elastic_rpn_fit(
        rpn_factory, loader_factory, epochs=2, ensemble_size=E)
    assert rep_c.mesh_history == [(2, 4)]

    lost = jax.devices()[5:]
    fired = []

    def injector(epoch, step):
        if epoch == 1 and step == 0 and not fired:
            fired.append(1)
            raise DeviceFailure(lost=lost)

    (p, _, _), rep = elastic_rpn_fit(
        rpn_factory, loader_factory, epochs=2, ensemble_size=E,
        fault_injector=injector)
    assert rep.mesh_history == [(2, 4), (1, 4)]
    for a, b in zip(jax.tree.leaves(jax.device_get(p)),
                    jax.tree.leaves(jax.device_get(p_clean))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_elastic_multiseed_seed_axis(data):
    """Multi-seed vmapped training through plain elastic_fit: the stacked
    seed axis (sharded over the model axis) resnaps onto the rebuilt mesh
    because _restore now follows the fresh state's own shardings."""
    from climsim_tpu.train.multiseed import multiseed

    x, y, stats = data

    def tf(rules):
        return multiseed(recipes.mlp_trainer, SPEC, stats, (x, y),
                         seeds=[0, 1], rules=rules, hidden=(16,),
                         steps_per_epoch=4)

    def lf(rules):
        return (BatchLoader(x, y, 128, rules=rules, seed=0), None)

    clean, rep_c = elastic_fit(tf, lf, epochs=2, num_model=2)
    assert rep_c.failures == 0 and rep_c.mesh_history == [(4, 2)]

    lost = jax.devices()[6:]
    fired = []

    def injector(epoch, step):
        if epoch == 1 and step == 0 and not fired:
            fired.append(1)
            raise DeviceFailure(lost=lost)

    state, rep = elastic_fit(tf, lf, epochs=2, num_model=2,
                             fault_injector=injector)
    assert rep.failures == 1 and rep.epochs_completed == 2
    assert rep.mesh_history == [(4, 2), (2, 2)]
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(clean.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
