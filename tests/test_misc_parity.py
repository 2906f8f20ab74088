"""UTLS subsetting, lambda generation, h5 multi-shard dataset, timed
checkpoints, metrics CLI, IO helpers."""

import os

import numpy as np

from climsim_tpu.varspec import get_varspec


def test_utls_subset_v2():
    from climsim_tpu.data.transforms import (make_subset_transform,
                                             utls_feature_indices)

    spec = get_varspec("v2")
    idx = utls_feature_indices(spec)
    # v2 MLP baseline dimensionality: 557 - 3*60 + 3*16 = 425
    # (hpo_baseline_v2.py:58-60,169-177)
    assert len(idx) == 425
    import jax.numpy as jnp

    x = np.arange(2 * spec.input_len, dtype=np.float32).reshape(2, -1)
    sub = np.asarray(make_subset_transform(idx)(jnp.asarray(x)))
    # ozone levels 5..20 kept
    sl = spec.input_slices["pbuf_ozone"]
    want = x[:, sl.start + 5: sl.start + 21]
    got_start = spec.input_slices["pbuf_ozone"].start
    # position of ozone block inside the subset layout
    pos = sum(min(16, 60) if v in ("pbuf_ozone",)
              else (spec.input_slices[v].stop - spec.input_slices[v].start)
              for v in spec.inputs[:spec.inputs.index("pbuf_ozone")])
    np.testing.assert_array_equal(sub[:, pos:pos + 16], want)


def test_compute_exponential_lambda():
    from climsim_tpu.norms import compute_exponential_lambda

    rng = np.random.default_rng(0)
    q = np.zeros((1000, 4))
    q[:, 0] = rng.exponential(1e-5, 1000)         # cloudy level
    q[:500, 1] = rng.exponential(1e-4, 500)       # half cloudy
    # level 2: all below threshold; level 3: all zero
    q[:, 2] = 1e-9
    lbd = compute_exponential_lambda(q)
    assert abs(lbd[0] - 1.0 / q[:, 0][q[:, 0] > 1e-7].mean()) < 1e-6 * lbd[0]
    assert lbd[2] == 1e7 and lbd[3] == 1e7
    # transform of the mean cloudy value ~ 1 - 1/e
    x = 1 - np.exp(-q[:, 0].mean() * lbd[0])
    assert 0.3 < x < 0.9


def test_computed_norms_include_cloud_lambdas():
    """norms=compute with qn_transform must yield a chain-complete
    NormStats: lambda fitted per cloud input, and that slice's sub/div
    computed in TRANSFORMED space (the chain applies 1-exp(-lbd*q) BEFORE
    normalizing, climsim_datapip.py:80-102)."""
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import compute_norms_from_data
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v5")
    x, y = synthetic_split(spec, 512, load_default_grid(), seed=0)
    stats = compute_norms_from_data(spec, x, y, qn_transform=True)
    assert stats.lbd_qn is not None and stats.lbd_qn.shape == (60,)
    sl = spec.input_slices["state_qn"]
    qt = 1.0 - np.exp(-x[:, sl].astype(np.float64) * stats.lbd_qn)
    np.testing.assert_allclose(stats.inp_sub[sl], qt.mean(axis=0), rtol=1e-12)
    # default (no transform) keeps raw-space stats and no lambda
    raw = compute_norms_from_data(spec, x, y)
    assert raw.lbd_qn is None
    np.testing.assert_allclose(raw.inp_sub[sl],
                               x[:, sl].mean(axis=0, dtype=np.float64),
                               rtol=1e-12)


def test_requested_transform_without_lambda_fails_loud():
    """make_input_transform must raise, not silently skip, when the config
    requests the cloud transform but the stats carry no lambda -- a
    deployed wrapper silently missing its training preprocessing is the
    failure mode the coupling parity suite exists to prevent."""
    import pytest

    from climsim_tpu.data import transforms as T
    from climsim_tpu.norms import compute_norms_from_data
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v5")
    x, y = synthetic_split(spec, 64, load_default_grid(), seed=0)
    stats = compute_norms_from_data(spec, x, y)  # no lambda fitted
    with pytest.raises(ValueError, match="state_qn"):
        T.make_input_transform(spec, stats,
                               T.TransformConfig(qn_transform=True))


def test_h5_multishard_dataset(tmp_path):
    import h5py

    from climsim_tpu.data.h5dataset import H5ShardDataset

    rng = np.random.default_rng(0)
    xs, ys = [], []
    for i, n in enumerate([30, 50, 20]):
        d = tmp_path / f"chunk{i}"
        d.mkdir()
        x = rng.normal(size=(n, 10)).astype(np.float32)
        y = rng.normal(size=(n, 4)).astype(np.float32)
        with h5py.File(d / "train_input.h5", "w") as f:
            f.create_dataset("data", data=x)
        with h5py.File(d / "train_target.h5", "w") as f:
            f.create_dataset("data", data=y)
        xs.append(x)
        ys.append(y)
    allx = np.concatenate(xs)
    ally = np.concatenate(ys)

    ds = H5ShardDataset(str(tmp_path))
    assert len(ds) == 100
    # cumulative addressing across shard boundaries
    assert ds.locate(0) == (0, 0)
    assert ds.locate(30) == (1, 0)
    assert ds.locate(79) == (1, 49)
    assert ds.locate(99) == (2, 19)
    x0, y0 = ds[35]
    np.testing.assert_array_equal(x0, xs[1][5])
    gx, gy = ds.gather([5, 95, 31, 0])
    np.testing.assert_array_equal(gx, allx[[5, 95, 31, 0]])
    np.testing.assert_array_equal(gy, ally[[5, 95, 31, 0]])
    batches = list(ds.batches(32, seed=1))
    assert len(batches) == 3
    assert batches[0][0].shape == (32, 10)


def test_timed_checkpointer(tmp_path):
    from climsim_tpu.train.checkpoints import TimedCheckpointer, load_pytree

    tree = {"w": np.arange(4.0)}
    tc = TimedCheckpointer(str(tmp_path / "timed.msgpack"),
                           interval_seconds=1e6)
    assert tc.maybe_save(tree) is True       # first call always saves
    assert tc.maybe_save(tree) is False      # within interval
    restored = load_pytree(str(tmp_path / "timed.msgpack"),
                           {"w": np.zeros(4)})
    np.testing.assert_array_equal(restored["w"], tree["w"])


def test_save_pytree_atomic(tmp_path):
    """Atomic overwrite: the rename leaves no tmp file, and an aborted
    write (simulated by pre-placing a stale tmp) never corrupts the
    existing checkpoint."""
    import os

    from climsim_tpu.train.checkpoints import load_pytree, save_pytree

    path = str(tmp_path / "ck.msgpack")
    save_pytree(path, {"w": np.arange(4.0)})
    with open(path + ".tmp", "wb") as f:
        f.write(b"garbage from a crashed writer")
    save_pytree(path, {"w": np.arange(4.0) * 2})
    assert not os.path.exists(path + ".tmp")
    restored = load_pytree(path, {"w": np.zeros(4)})
    np.testing.assert_array_equal(restored["w"], np.arange(4.0) * 2)


def test_fit_drives_timed_checkpointer(tmp_path):
    import jax

    from climsim_tpu.data.pipeline import BatchLoader
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import compute_norms_from_data
    from climsim_tpu.train import recipes
    from climsim_tpu.train.checkpoints import TimedCheckpointer
    from climsim_tpu.train.loop import fit
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v1")
    x, y = synthetic_split(spec, n=256, grid=load_default_grid(), seed=0)
    stats = compute_norms_from_data(spec, x, y)
    tr = recipes.mlp_trainer(spec, stats, (x, y), jax.random.PRNGKey(0),
                             hidden=(16,), steps_per_epoch=2)
    path = str(tmp_path / "timed.msgpack")
    tc = TimedCheckpointer(path, interval_seconds=0.0)  # save every epoch
    fit(tr.train_step, tr.eval_step, tr.state,
        BatchLoader(x, y, 128, seed=0), None, epochs=2,
        verbose=False, timed_ckpt=tc)
    import os

    assert os.path.exists(path)


def test_metrics_cli(tmp_path):
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.eval.cli import main
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import compute_norms_from_data

    spec = get_varspec("v1")
    grid = load_default_grid()
    x, y = synthetic_split(spec, 2 * 384, grid, seed=0)
    stats = compute_norms_from_data(spec, x, y)
    stats.save_npz(str(tmp_path / "norms.npz"))
    xn = ((x - stats.inp_sub) / stats.inp_div).astype(np.float32)
    yn = (y * stats.out_scale).astype(np.float32)
    pred = yn + 0.1 * np.random.default_rng(1).normal(
        size=yn.shape).astype(np.float32)
    np.save(tmp_path / "in.npy", xn)
    np.save(tmp_path / "tg.npy", yn)
    np.save(tmp_path / "pr.npy", pred)
    main(["--inputs", str(tmp_path / "in.npy"),
          "--targets", str(tmp_path / "tg.npy"),
          "--varspec", "v1", "--norms", str(tmp_path / "norms.npz"),
          "--pred", f"m=%s" % (tmp_path / "pr.npy"),
          "--out-dir", str(tmp_path / "out")])
    by_var = (tmp_path / "out" / "m_by_variable.csv").read_text()
    assert "ptend_t" in by_var
    by_idx = (tmp_path / "out" / "m_by_index.csv").read_text()
    assert by_idx.count("\n") == spec.output_len + 1


def test_io_helpers(tmp_path):
    import h5py

    from climsim_tpu.utils.io import load_h5_file, load_npy_file

    a = np.arange(6.0).reshape(2, 3)
    np.save(tmp_path / "a.npy", a)
    np.testing.assert_array_equal(load_npy_file(str(tmp_path / "a.npy")), a)
    with h5py.File(tmp_path / "a.h5", "w") as f:
        f.create_dataset("pred", data=a)
    np.testing.assert_array_equal(load_h5_file(str(tmp_path / "a.h5")), a)
