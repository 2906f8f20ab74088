"""End-to-end slice: synthetic raw data -> sharded training -> metrics.

The 'ONE model running' milestone of SURVEY.md section 7 plus the
multi-device correctness checks the reference never had: training on an
8-virtual-device mesh must match single-device training bit-for-bit-ish.
"""

import jax
import numpy as np
import pytest

from climsim_tpu.data.pipeline import BatchLoader
from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.parallel.mesh import ShardingRules, make_mesh
from climsim_tpu.train import recipes
from climsim_tpu.train.loop import evaluate, fit, run_epoch
from climsim_tpu.varspec import get_varspec

SPEC = get_varspec("v1")
GRID = load_default_grid()


@pytest.fixture(scope="module")
def data():
    x, y = synthetic_split(SPEC, n=16 * 384, grid=GRID, seed=0, noise=0.02)
    stats = compute_norms_from_data(SPEC, x, y)
    return x, y, stats


def test_mlp_end_to_end_learns(data):
    x, y, stats = data
    rng = jax.random.PRNGKey(0)
    tr = recipes.mlp_trainer(SPEC, stats, (x, y), rng,
                             hidden=(256, 256), steps_per_epoch=12)
    loader = BatchLoader(x, y, batch_size=512, seed=0)
    state = tr.state
    state, loss0, _ = run_epoch(tr.train_step, state, loader)
    for _ in range(11):
        state, loss, _ = run_epoch(tr.train_step, state, loader)
    assert loss < loss0 * 0.7, (loss0, loss)

    # predictions through the metrics engine: R2 must beat the zero-pred
    from climsim_tpu.data.transforms import make_target_transform
    from climsim_tpu.eval.metrics import metrics_table
    from climsim_tpu.eval.weighting import (
        pressure_thickness_from_inputs, weight_outputs)

    preds = tr.predict(state.params, x, 2048)
    tgt = np.asarray(make_target_transform(SPEC, stats)(y))
    dp = pressure_thickness_from_inputs(
        (x - stats.inp_sub) / stats.inp_div, SPEC, GRID, stats)
    pw = weight_outputs(preds.astype(np.float64), SPEC, GRID, dp, stats)
    tw = weight_outputs(tgt.astype(np.float64), SPEC, GRID, dp, stats)
    table = metrics_table(pw, tw)
    # deterministic synthetic targets are learnable: mean R2 over variables
    r2s = [row["R2"] for row in table.values()]
    assert np.mean(r2s) > 0.2, table


def test_multi_device_matches_single(data):
    """Same init, same batches: 8-device data-parallel step == local step."""
    x, y, stats = data
    rng = jax.random.PRNGKey(7)
    mesh = make_mesh(num_data=8, devices=jax.devices("cpu")[:8])
    rules = ShardingRules(mesh)

    tr_sharded = recipes.ed_trainer(SPEC, stats, (x, y), rng, rules=rules,
                                    steps_per_epoch=10)
    tr_local = recipes.ed_trainer(SPEC, stats, (x, y), rng, rules=None,
                                  steps_per_epoch=10)

    xb, yb = x[:256], y[:256]
    s_sh, m_sh = tr_sharded.train_step(
        tr_sharded.state, *rules.shard_batch(xb, yb))
    s_lo, m_lo = tr_local.train_step(tr_local.state, xb, yb)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_lo["loss"]),
                               rtol=1e-5)
    p_sh = jax.tree.leaves(jax.device_get(s_sh.params))
    p_lo = jax.tree.leaves(jax.device_get(s_lo.params))
    for a, b in zip(p_sh, p_lo):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fit_loop_with_checkpointing(tmp_path, data):
    x, y, stats = data
    rng = jax.random.PRNGKey(1)
    tr = recipes.ed_trainer(SPEC, stats, (x, y), rng, steps_per_epoch=6)
    train_loader = BatchLoader(x[:768], y[:768], 128, seed=1)
    val_loader = BatchLoader(x[768:], y[768:], 128, shuffle=False)

    from climsim_tpu.train.checkpoints import TopKCheckpointer
    from climsim_tpu.train.loop import EarlyStopping, PlateauController

    ckpt = TopKCheckpointer(str(tmp_path / "ck"), k=2)
    state, hist = fit(tr.train_step, tr.eval_step, tr.state, train_loader,
                      val_loader, epochs=3, ckpt=ckpt,
                      plateau=PlateauController(patience=1),
                      early=EarlyStopping(patience=5), verbose=False)
    assert len(hist.rows) == 3
    assert ckpt.best() is not None
    restored = ckpt.load_best(jax.device_get(state.params))
    assert restored is not None
    # history csv round-trip
    hist.save_csv(str(tmp_path / "hist.csv"))
    assert (tmp_path / "hist.csv").exists()


def test_hsr_staged_training(data):
    x, y, stats = data
    tr = recipes.hsr_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(2),
                             hidden=64, layers=1)
    loader = BatchLoader(x, y, 256, seed=2)
    state = tr.state
    state, l1, _ = run_epoch(tr.train_step, state, loader)      # MSE stage
    state, l2, _ = run_epoch(tr.stage2_step, state, loader)     # NLL stage
    assert np.isfinite(l1) and np.isfinite(l2)
    s = tr.sample(state.params, x[:8], jax.random.PRNGKey(3), 4)
    assert s.shape == (8, SPEC.output_len, 4)


def test_cvae_trains(data):
    x, y, stats = data
    tr = recipes.cvae_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(3),
                              hidden=64, layers=1, latent=4)
    loader = BatchLoader(x, y, 256, seed=3)
    state, loss, _ = run_epoch(tr.train_step, state := tr.state, loader)
    assert np.isfinite(loss)
    val = evaluate(tr.eval_step, state.params, loader)
    assert np.isfinite(val)


def test_bootstrap_loader_shapes(data):
    x, y, _ = data
    from climsim_tpu.data.pipeline import BootstrapLoader

    bl = BootstrapLoader(x, y, batch_size=32, ensemble_size=4,
                         steps_per_epoch=3)
    batches = list(bl)
    assert len(batches) == 3
    xb, yb = batches[0]
    assert xb.shape == (4, 32, SPEC.input_len)
    assert yb.shape == (4, 32, SPEC.output_len)
    # members draw different bootstrap rows
    assert not np.array_equal(xb[0], xb[1])


def test_device_resident_loader(data):
    from climsim_tpu.data.pipeline import DeviceResidentLoader

    x, y, stats = data
    ld = DeviceResidentLoader(x[:1024], y[:1024], 256, seed=0)
    seen = []
    for xb, yb in ld:
        assert xb.shape == (256, SPEC.input_len)
        seen.append(np.asarray(xb))
    assert len(seen) == 4
    allx = np.concatenate(seen)
    # full coverage of the epoch (match rows via feature-0 values)
    np.testing.assert_allclose(np.sort(allx[:, 0]), np.sort(x[:1024, 0]),
                               rtol=1e-6)
    # second epoch differs (reshuffled)
    first_again = next(iter(ld))[0]
    assert not np.array_equal(np.asarray(first_again), seen[0])


def test_device_resident_loader_sharded(data):
    x, y, stats = data
    from climsim_tpu.data.pipeline import DeviceResidentLoader

    mesh = make_mesh(num_data=8, devices=jax.devices("cpu")[:8])
    rules = ShardingRules(mesh)
    ld = DeviceResidentLoader(x[:1024], y[:1024], 512, rules=rules, seed=1)
    tr = recipes.ed_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(0),
                            rules=rules, steps_per_epoch=2)
    state = tr.state
    for xb, yb in ld:
        state, m = tr.train_step(state, xb, yb)
    assert np.isfinite(float(m["loss"]))


def test_training_determinism(data):
    """Same seed -> bit-identical training trajectory (the framework's
    'race detector': any nondeterministic reduction or stateful hazard in
    the step/pipeline would break this)."""
    x, y, stats = data

    def run():
        tr = recipes.ed_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(5),
                                steps_per_epoch=4)
        loader = BatchLoader(x[:512], y[:512], 128, seed=5)
        state = tr.state
        for xb, yb in loader:
            state, m = tr.train_step(state, xb, yb)
        return jax.device_get(state.params), float(m["loss"])

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_resume_from_last_checkpoint(tmp_path, data):
    """Warm-restart path (restart_path semantics): save last, rebuild the
    trainer, load, continue -- loss continues from the saved point."""
    from climsim_tpu.train.checkpoints import (TopKCheckpointer,
                                               load_pytree)

    x, y, stats = data
    tr = recipes.ed_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(6),
                            steps_per_epoch=4)
    loader = BatchLoader(x[:512], y[:512], 128, seed=6)
    state = tr.state
    state, loss0, _ = run_epoch(tr.train_step, state, loader)
    ck = TopKCheckpointer(str(tmp_path / "ck"))
    ck.save_last(int(state.step), jax.device_get(state.params))

    # fresh process simulation: new trainer, restore params
    tr2 = recipes.ed_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(99),
                             steps_per_epoch=4)
    restored = load_pytree(str(tmp_path / "ck" / "last.msgpack"),
                           jax.device_get(tr2.state.params))
    state2 = tr2.state.replace(params=jax.device_put(restored))
    state2, loss1, _ = run_epoch(tr2.train_step, state2, loader)
    # resumed training continues improving from the checkpointed params
    assert loss1 < loss0


def test_cli_warm_restart(tmp_path):
    """train.restart_path through the CLI: weights load from a prior
    run's checkpoint dir before training (the reference's cfg.restart_path,
    train_unet_h5loader.py:177-189).  With lr=0 the restarted run's final
    params must equal the checkpointed weights exactly."""
    from climsim_tpu.run import main as run_main
    from climsim_tpu.train.checkpoints import load_pytree

    ckpt_dir = str(tmp_path / "ck")
    # mlp_v2rh honors train.lr (the NeurIPS mlp/ed/cnn recipes pin their
    # published schedules instead), so lr=0 freezes the weights exactly
    common = ["--preset", "mlp_v2rh", "--quiet", "data.num_synthetic=512",
              "data.batch_size=128", 'model_kw={"hidden":[16]}']
    run_main(common + ["train.epochs=1", f"train.checkpoint_dir={ckpt_dir}"])
    assert (tmp_path / "ck" / "last.msgpack").exists()

    out = run_main(common + ["train.epochs=1", "train.lr=0.0",
                             f"train.restart_path={ckpt_dir}"])
    want = load_pytree(str(tmp_path / "ck" / "last.msgpack"),
                       jax.device_get(out["state"].params))
    for a, b in zip(jax.tree.leaves(out["state"].params),
                    jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the run_manifest.json written next to the checkpoints reproduces
    # the run through --config (reproducibility round-trip)
    out2 = run_main(["--config", str(tmp_path / "ck" / "run_manifest.json"),
                     "--quiet", "train.epochs=1", "train.checkpoint_dir="])
    assert np.isfinite(out2["history"].rows[-1]["train_loss"])


def test_lr_scale_controls_update_magnitude(data):
    """Plateau lr_scale must actually change the step size under Adam
    (scaling gradients would be a no-op: Adam is gradient-scale
    invariant); lr_scale=0 freezes parameters exactly."""
    import jax.numpy as jnp

    x, y, stats = data
    tr = recipes.ed_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(8),
                            steps_per_epoch=4)
    xb, yb = x[:128], y[:128]

    base = jax.device_get(tr.state)

    def delta(scale):
        st = jax.tree.map(jnp.array, base)  # fresh buffers (step donates)
        st = st.replace(lr_scale=jnp.asarray(scale, jnp.float32),
                        rng=jax.random.PRNGKey(8))
        st2, _ = tr.train_step(st, xb, yb)
        return np.concatenate([
            (np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(jax.device_get(st2.params)),
                            jax.tree.leaves(base.params))])

    d_full = delta(1.0)
    d_half = delta(0.5)
    d_zero = delta(0.0)
    np.testing.assert_allclose(d_half, 0.5 * d_full, rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(d_zero, 0.0)


def test_fused_epoch_runner_matches_python_loop(data):
    """DeviceResidentLoader.make_epoch_runner (whole epochs in one
    lax.scan dispatch) must reproduce the per-step Python loop exactly:
    same key-split order, same permutations, same gathers, same steps."""
    from climsim_tpu.data.pipeline import DeviceResidentLoader

    x, y, stats = data
    x, y = x[:1024], y[:1024]
    rng = jax.random.PRNGKey(11)

    def make():
        return recipes.mlp_trainer(SPEC, stats, (x, y), rng,
                                   hidden=(64,), steps_per_epoch=4)

    tr_a = make()
    loader_a = DeviceResidentLoader(x, y, 256, seed=5)
    state_a = tr_a.state
    for _ in range(2):
        for xb, yb in loader_a:
            state_a, m_a = tr_a.train_step(state_a, xb, yb)

    tr_b = make()
    loader_b = DeviceResidentLoader(x, y, 256, seed=5)
    run = loader_b.make_epoch_runner(tr_b.train_step)
    state_b, metrics = run(tr_b.state, 2)

    assert jax.tree.leaves(metrics)[0].shape == (2,)  # per-epoch means
    pa = jax.tree.leaves(jax.device_get(state_a.params))
    pb = jax.tree.leaves(jax.device_get(state_b.params))
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    assert int(state_b.step) == 8


def test_block_shuffle_loader(data):
    """block_shuffle mode: every epoch is still an exact permutation of
    the split; fused runner == per-step loop; composition differs
    between epochs."""
    from climsim_tpu.data.pipeline import DeviceResidentLoader

    x, y, stats = data
    x, y = np.asarray(x[:1024]).copy(), np.asarray(y[:1024]).copy()
    x[:, 0] = np.arange(1024)  # row ids for permutation accounting

    loader = DeviceResidentLoader(x, y, 256, seed=5, block_shuffle=64)
    epochs = []
    for _ in range(2):
        rows = np.concatenate(
            [np.asarray(xb[:, 0]) for xb, _ in loader])
        epochs.append(rows)
    for rows in epochs:
        np.testing.assert_array_equal(np.sort(rows), np.arange(1024))
    assert (epochs[0] != epochs[1]).any()  # reshuffled between epochs
    # a 64-row block stays together: the first batch is 4 whole blocks
    first = epochs[0][:256].reshape(4, 64)
    base = np.asarray(loader.x[:, 0]).reshape(16, 64)  # host-preshuffled
    for blockrow in first:
        assert any(np.array_equal(blockrow, b) for b in base)

    # fused runner == per-step loop in block mode
    rng = jax.random.PRNGKey(11)

    def make():
        return recipes.mlp_trainer(SPEC, stats, (x, y), rng,
                                   hidden=(64,), steps_per_epoch=4)

    tr_a = make()
    la = DeviceResidentLoader(x, y, 256, seed=5, block_shuffle=64)
    state_a = tr_a.state
    for _ in range(2):
        for xb, yb in la:
            state_a, _ = tr_a.train_step(state_a, xb, yb)
    tr_b = make()
    lb = DeviceResidentLoader(x, y, 256, seed=5, block_shuffle=64)
    state_b, _ = lb.make_epoch_runner(tr_b.train_step)(tr_b.state, 2)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_a.params)),
                    jax.tree.leaves(jax.device_get(state_b.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    assert int(state_b.step) == 8


def test_fused_epoch_runner_sharded(data):
    """The fused runner under an 8-device mesh: executes, steps advance,
    loss matches the unsharded runner."""
    from climsim_tpu.data.pipeline import DeviceResidentLoader

    x, y, stats = data
    x, y = x[:1024], y[:1024]
    rng = jax.random.PRNGKey(12)
    mesh = make_mesh(num_data=8, devices=jax.devices("cpu")[:8])
    rules = ShardingRules(mesh)

    tr_s = recipes.mlp_trainer(SPEC, stats, (x, y), rng, hidden=(64,),
                               rules=rules, steps_per_epoch=4)
    loader_s = DeviceResidentLoader(x, y, 256, rules=rules, seed=9)
    run_s = loader_s.make_epoch_runner(tr_s.train_step)
    st_s, ms = run_s(tr_s.state, 1)

    tr_l = recipes.mlp_trainer(SPEC, stats, (x, y), rng, hidden=(64,),
                               steps_per_epoch=4)
    loader_l = DeviceResidentLoader(x, y, 256, seed=9)
    run_l = loader_l.make_epoch_runner(tr_l.train_step)
    st_l, ml = run_l(tr_l.state, 1)

    assert int(st_s.step) == 4
    np.testing.assert_allclose(float(ms["loss"][0]), float(ml["loss"][0]),
                               rtol=1e-5)


def test_fit_uses_fused_runner(data):
    """fit() over a DeviceResidentLoader takes the fused path and matches
    fit(fused=False) on the same seeds."""
    from climsim_tpu.data.pipeline import DeviceResidentLoader

    x, y, stats = data
    x, y = x[:1024], y[:1024]
    rng = jax.random.PRNGKey(13)

    def once(fused):
        tr = recipes.ed_trainer(SPEC, stats, (x, y), rng, steps_per_epoch=4)
        loader = DeviceResidentLoader(x, y, 256, seed=3)
        val = DeviceResidentLoader(x[:256], y[:256], 256, shuffle=False)
        state, hist = fit(tr.train_step, tr.eval_step, tr.state, loader,
                          val, epochs=2, verbose=False, fused=fused)
        return [r["train_loss"] for r in hist.rows], \
            [r["val_loss"] for r in hist.rows]

    tl_f, vl_f = once(True)
    tl_p, vl_p = once(False)
    np.testing.assert_allclose(tl_f, tl_p, rtol=1e-5)
    np.testing.assert_allclose(vl_f, vl_p, rtol=1e-5)


def test_chunked_loader_matches_batch_loader(data):
    """ChunkedLoader + make_chunk_runner (K steps per dispatch, for
    beyond-HBM streaming) must reproduce the per-step BatchLoader run:
    same permutation, same batch order, same final params."""
    from climsim_tpu.data.pipeline import ChunkedLoader

    x, y, stats = data
    x, y = x[:2048], y[:2048]
    rng = jax.random.PRNGKey(21)

    def make():
        return recipes.mlp_trainer(SPEC, stats, (x, y), rng,
                                   hidden=(64,), steps_per_epoch=8)

    tr_a = make()
    bl = BatchLoader(x, y, 256, seed=6)
    st_a = tr_a.state
    n_a = 0
    for xb, yb in bl:
        st_a, m_a = tr_a.train_step(st_a, xb, yb)
        n_a += 1

    tr_b = make()
    cl = ChunkedLoader(x, y, 256, steps_per_chunk=4, seed=6)
    run = cl.make_chunk_runner(tr_b.train_step)
    st_b = tr_b.state
    n_b = 0
    for xc, yc in cl:
        assert xc.shape[:2] == (4, 256)
        st_b, m_b = run(st_b, xc, yc)
        n_b += 4
    assert n_a == n_b == cl.steps_per_epoch

    pa = jax.tree.leaves(jax.device_get(st_a.params))
    pb = jax.tree.leaves(jax.device_get(st_b.params))
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_chunked_loader_sharded_batch_axis(data):
    """Sharded superbatches partition the BATCH axis (1) over the data
    mesh, not the step axis: the sharded chunked run equals the
    unsharded one."""
    from climsim_tpu.data.pipeline import ChunkedLoader

    x, y, stats = data
    x, y = x[:2048], y[:2048]
    rng = jax.random.PRNGKey(22)
    mesh = make_mesh(num_data=8, devices=jax.devices("cpu")[:8])
    rules = ShardingRules(mesh)

    def run_with(rules_):
        tr = recipes.mlp_trainer(SPEC, stats, (x, y), rng, hidden=(64,),
                                 rules=rules_, steps_per_epoch=8)
        cl = ChunkedLoader(x, y, 256, steps_per_chunk=4, rules=rules_,
                           seed=6)
        run = cl.make_chunk_runner(tr.train_step)
        st = tr.state
        for xc, yc in cl:
            if rules_ is not None:
                assert xc.sharding.spec == (None, "data"), xc.sharding
            st, m = run(st, xc, yc)
        return float(jax.device_get(m["loss"]).mean()), st

    l_sh, st_sh = run_with(rules)
    l_lo, st_lo = run_with(None)
    np.testing.assert_allclose(l_sh, l_lo, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(st_sh.params)),
                    jax.tree.leaves(jax.device_get(st_lo.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fit_with_chunked_loader(data):
    """fit() must route ChunkedLoader superbatches through the chunk
    runner (feeding (K,B,D) to a per-batch step would be wrong), and
    match fit() over a plain BatchLoader on the same seed."""
    from climsim_tpu.data.pipeline import ChunkedLoader

    x, y, stats = data
    x, y = x[:2048], y[:2048]
    rng = jax.random.PRNGKey(23)

    def once(loader_cls, **kw):
        tr = recipes.ed_trainer(SPEC, stats, (x, y), rng,
                                steps_per_epoch=8)
        tl = loader_cls(x[:1536], y[:1536], 256, seed=4, **kw)
        vl = loader_cls(x[1536:], y[1536:], 256, shuffle=False, **kw)
        state, hist = fit(tr.train_step, tr.eval_step, tr.state, tl, vl,
                          epochs=2, verbose=False)
        return hist

    h_ch = once(ChunkedLoader, steps_per_chunk=2)
    h_bl = once(BatchLoader)
    for rc, rb in zip(h_ch.rows, h_bl.rows):
        np.testing.assert_allclose(rc["train_loss"], rb["train_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(rc["val_loss"], rb["val_loss"],
                                   rtol=1e-5)


def test_topk_directory_is_relocatable(tmp_path, data):
    """topk.json records checkpoint basenames: a checkpoint directory
    copied to another machine/path (the deployment workflow) must still
    serve load_best, including legacy files that recorded full paths."""
    import json
    import shutil

    from climsim_tpu.train.checkpoints import TopKCheckpointer

    x, y, stats = data
    tr = recipes.ed_trainer(SPEC, stats, (x[:64], y[:64]),
                            jax.random.PRNGKey(5), steps_per_epoch=1)
    tpl = jax.device_get(tr.state.params)
    src = tmp_path / "ck"
    ckpt = TopKCheckpointer(str(src), k=2)
    ckpt.maybe_save(0.5, 1, tpl)
    ckpt.maybe_save(0.3, 2, tpl)
    dst = tmp_path / "moved" / "ck"
    shutil.copytree(src, dst)
    shutil.rmtree(src)
    moved = TopKCheckpointer(str(dst), k=2)
    assert moved.best()[1] == 2
    assert moved.load_best(tpl) is not None
    # legacy format: entries hold absolute paths from the old machine
    with open(dst / "topk.json", "w") as f:
        json.dump([[0.3, 2, "/gone/machine/ck/ckpt_step2.msgpack"]], f)
    legacy = TopKCheckpointer(str(dst), k=2)
    assert legacy.load_best(tpl) is not None
    # eviction under the legacy entry must also resolve locally
    legacy.k = 1
    assert legacy.maybe_save(0.1, 3, tpl)
    assert not (dst / "ckpt_step2.msgpack").exists()
