"""Ingest (nc -> shards) and HPO subsystem tests."""

import os

import numpy as np
import pytest

from climsim_tpu.data import ingest
from climsim_tpu.grid import synthetic_grid
from climsim_tpu.varspec import get_varspec

from synthnc import LEV, NCOL, make_tree


@pytest.fixture(scope="module")
def ncdir(tmp_path_factory):
    """A tiny 6-timestep mli/mlo tree with plausible physics."""
    root = tmp_path_factory.mktemp("ncdata") / "0001-02"
    grid = synthetic_grid(ncol=NCOL)
    return make_tree(root, grid, nsteps=6, seed=0)


def test_filelist_stride(ncdir):
    fl = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=2)
    assert len(fl) == 3
    assert all(".mli." in f for f in fl)


def test_canonical_split_patterns():
    # name-level check: the train pattern accepts years 1-7 + 0008-01 only
    import fnmatch

    rx, stride = ingest.CANONICAL_SPLITS["train"]
    assert stride == 7
    ok = ["E3SM-MMF.mli.0003-06-11-36000.nc", "E3SM-MMF.mli.0008-01-01-00000.nc"]
    bad = ["E3SM-MMF.mli.0008-02-01-00000.nc", "E3SM-MMF.mli.0009-01-01-00000.nc"]
    for f in ok:
        assert any(fnmatch.fnmatch(f, r) for r in rx), f
    for f in bad:
        assert not any(fnmatch.fnmatch(f, r) for r in rx), f


def test_build_split_v1(ncdir, tmp_path):
    spec = get_varspec("v1")
    fl = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=1)
    out = ingest.build_split(fl, spec, str(tmp_path), "train")
    x = np.load(out["input"])
    y = np.load(out["target"])
    assert x.shape == (6 * NCOL, 124)
    assert y.shape == (6 * NCOL, 128)
    assert np.isfinite(x).all() and np.isfinite(y).all()

    # golden: ptend_t of file 0 == (mlo.state_t - mli.state_t)/1200
    from climsim_tpu.utils.ncread import read_netcdf

    mli = read_netcdf(fl[0])
    mlo = read_netcdf(fl[0].replace(".mli.", ".mlo."))
    want = ((mlo["state_t"] - mli["state_t"]) / 1200.0).T  # (ncol, lev)
    np.testing.assert_allclose(y[:NCOL, :60], want, rtol=1e-5)


def test_small_public_helpers(ncdir, tiny_grid):
    """Direct coverage for small public API: canonical_filelist,
    index_to_latlontime, pad_to_multiple, qn_exponential_transform."""
    import jax.numpy as jnp

    from climsim_tpu import physics
    from climsim_tpu.parallel.mesh import pad_to_multiple

    # canonical_filelist: train regex matches the 000[1-7] fixture years
    fl = ingest.canonical_filelist(ncdir, "train")
    assert all(".mli." in f for f in fl)

    # index -> (lat, lon, date) mapping covers ncol rows per file
    files = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=1)
    m = ingest.index_to_latlontime(files[:2], tiny_grid)
    assert len(m) == 2 * tiny_grid.ncol
    (latlon, date) = m[0]
    assert len(latlon) == 2 and date  # ((lat, lon), 'YYYY-MM-...')

    # pad_to_multiple: pads batch dim, reports true count
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    p, n = pad_to_multiple(x, 4)
    assert p.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(p[5:], np.repeat(x[-1:], 3, axis=0))
    same, n2 = pad_to_multiple(x[:4], 4)
    assert same.shape == (4, 2) and n2 == 4

    # qn transform matches its closed form
    qn = jnp.asarray([0.0, 1e-4, 1e-3])
    got = np.asarray(physics.qn_exponential_transform(qn, 1000.0))
    np.testing.assert_allclose(got, 1.0 - np.exp(-np.asarray(qn) * 1e3),
                               rtol=1e-6)


def test_build_split_parallel_matches_serial(ncdir, tmp_path):
    """workers>0 (process pool) produces byte-identical shards."""
    spec = get_varspec("v1")
    fl = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=1)
    a = ingest.build_split(fl, spec, str(tmp_path / "s"), "train")
    b = ingest.build_split(fl, spec, str(tmp_path / "p"), "train",
                           workers=2)
    np.testing.assert_array_equal(np.load(a["input"]), np.load(b["input"]))
    np.testing.assert_array_equal(np.load(a["target"]),
                                  np.load(b["target"]))


def test_build_split_v5_window(ncdir, tmp_path):
    spec = get_varspec("v5")
    fl = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=1)
    out = ingest.build_split(fl, spec, str(tmp_path), "train", window=True)
    x = np.load(out["input"])
    assert x.shape == (4 * NCOL, 1405)  # first two files consumed by window

    # golden: state_t_dyn of sample block 0 (file idx 2) ==
    # (mli[2].state_t - mlo[1].state_t)/1200
    from climsim_tpu.utils.ncread import read_netcdf

    mli2 = read_netcdf(fl[2])
    mlo1 = read_netcdf(fl[1].replace(".mli.", ".mlo."))
    want = ((mli2["state_t"] - mlo1["state_t"]) / 1200.0).T
    sl = spec.input_slices["state_t_dyn"]
    np.testing.assert_allclose(x[:NCOL, sl], want, rtol=1e-4)
    # icol runs 1..ncol
    np.testing.assert_allclose(
        x[:NCOL, spec.input_slices["icol"].start], np.arange(1, NCOL + 1))


def test_hpo_random_search(tmp_path):
    from climsim_tpu.train import hpo

    def trial(hp):
        return (hp["x"] - 0.3) ** 2 + (hp["y"] - 0.7) ** 2

    def sampler(rng):
        return {"x": float(rng.random()), "y": float(rng.random())}

    idx, best = hpo.random_search(trial, sampler, 50, str(tmp_path / "o"))
    assert best["score"] < 0.1


def test_hpo_oracle_multiworker(tmp_path):
    from climsim_tpu.train.hpo import DirectoryOracle, run_worker

    oracle = DirectoryOracle(str(tmp_path / "o2"))
    oracle.publish([{"v": i} for i in range(20)])
    done1 = run_worker(oracle, lambda hp: float(hp["v"]), max_trials=7)
    done2 = run_worker(oracle, lambda hp: float(hp["v"]))
    assert done1 == 7
    assert done1 + done2 == 20
    idx, best = oracle.best()
    assert idx == 0 and best["score"] == 0.0
    # resumability: a fresh worker finds nothing left
    assert run_worker(oracle, lambda hp: 0.0) == 0


def test_hpo_stale_claim_takeover(tmp_path):
    """A claim with no result (crashed worker) is retried once its marker
    goes stale; the retry budget bounds re-runs (KerasTuner
    max_retries_per_trial=1 semantics, hpo_baseline_v1.py:232-235)."""
    import os
    import time

    from climsim_tpu.train import hpo

    oracle = hpo.DirectoryOracle(str(tmp_path))
    oracle.publish([{"lr": i} for i in range(3)])
    # simulate a worker that claimed trial 1 then died
    assert oracle.claim(1)
    old = time.time() - 3600
    os.utime(str(tmp_path / "claim_1"), (old, old))

    # without stale handling the orphan is never picked up
    ran = []
    hpo.run_worker(oracle, lambda hp: ran.append(hp["lr"]) or 0.0)
    assert sorted(ran) == [0, 2]

    # with a stale timeout the orphan is taken over exactly once
    ran2 = []
    n = hpo.run_worker(oracle, lambda hp: ran2.append(hp["lr"]) or 0.0,
                       stale_timeout=1.0)
    assert ran2 == [1] and n == 1
    assert len(oracle.results()) == 3

    # budget: a second stale generation is NOT retried (max_retries=1)
    oracle2 = hpo.DirectoryOracle(str(tmp_path / "b"))
    oracle2.publish([{"lr": 0}])
    assert oracle2.claim(0)
    for f in ("claim_0",):
        os.utime(str(tmp_path / "b" / f), (old, old))
    assert oracle2.claim(0, stale_timeout=1.0)  # first takeover
    os.utime(str(tmp_path / "b" / "claim_0.retry1"), (old, old))
    assert not oracle2.claim(0, stale_timeout=1.0)  # budget exhausted
    assert oracle2.claim(0, stale_timeout=1.0, max_retries=2)  # raised budget


def test_hpo_hyperband():
    from climsim_tpu.train import hpo

    calls = []

    def trial(hp, resource):
        calls.append(resource)
        # more resource -> better estimate of the true quality
        return (hp["x"] - 0.5) ** 2 + 1.0 / resource

    best_hp, best_score = hpo.hyperband(
        trial, lambda rng: {"x": float(rng.random())},
        directory="", max_resource=9, eta=3, seed=0)
    assert abs(best_hp["x"] - 0.5) < 0.25
    assert max(calls) == 9


def test_mlp_trial_sampler():
    from climsim_tpu.train import hpo

    rng = np.random.default_rng(0)
    space = hpo.mlp_search_space()
    hp = hpo.sample_mlp_trial(space, rng)
    assert 2 <= len(hp["hidden"]) <= 12
    assert all(128 <= u <= 1024 and u % 128 == 0 for u in hp["hidden"])
    assert hp["activation"] in ("relu", "elu", "leakyrelu")


def test_build_split_window_stride_uses_adjacent_neighbors(ncdir, tmp_path):
    """With emit_stride, windowed features must still come from the two
    *adjacent* timesteps, not strided neighbors (the reference expands
    over consecutive files, then strides)."""
    spec = get_varspec("v5")
    fl = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=1)
    out = ingest.build_split(fl, spec, str(tmp_path), "train", window=True,
                             emit_stride=3)
    x = np.load(out["input"])
    # emitted files: indices 2 and 5 -> 2 timesteps x NCOL samples
    assert x.shape[0] == 2 * NCOL

    from climsim_tpu.utils.ncread import read_netcdf

    # second emitted block is file 5 with neighbors 4 and 3
    mli5 = read_netcdf(fl[5])
    mlo4 = read_netcdf(fl[4].replace(".mli.", ".mlo."))
    want = ((mli5["state_t"] - mlo4["state_t"]) / 1200.0).T
    sl = spec.input_slices["state_t_dyn"]
    np.testing.assert_allclose(x[NCOL:, sl], want, rtol=1e-4)


def test_build_split_h5_aggregation(ncdir, tmp_path):
    """save_h5=True writes the h5 shard layout H5ShardDataset consumes
    (the reference's h5 aggregation flow,
    create_dataset_example_v2rh.ipynb cells 4-13): h5 contents must equal
    the npy shards bit-for-bit."""
    import h5py

    from climsim_tpu.data.h5dataset import H5ShardDataset

    spec = get_varspec("v1")
    fl = ingest.build_filelist(ncdir, ["E3SM-MMF.mli.*.nc"], stride=2)
    out = ingest.build_split(fl, spec, str(tmp_path / "chunk0"), "train",
                             save_npy=True, save_h5=True)
    x_npy = np.load(out["input"])
    y_npy = np.load(out["target"])
    with h5py.File(out["input_h5"]) as f:
        np.testing.assert_array_equal(f["data"][:], x_npy)
    with h5py.File(out["target_h5"]) as f:
        np.testing.assert_array_equal(f["data"][:], y_npy)

    ds = H5ShardDataset(str(tmp_path))
    assert len(ds) == x_npy.shape[0]
    xi, yi = ds[3]
    np.testing.assert_array_equal(xi, x_npy[3])
    np.testing.assert_array_equal(yi, y_npy[3])


def test_real_baselines_fallback_split_disjoint(tmp_path):
    """run_real_baselines' capsule fallback split (parity first, then
    canonical stride) yields disjoint train/scoring file lists that
    together respect the strides -- a stride-then-parity order would
    leak every lcm-index file into both splits."""
    import importlib.util
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_real_baselines",
        os.path.join(root, "scripts", "run_real_baselines.py"))
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["run_real_baselines"] = spec.loader.exec_module(mod) or mod

    # 200 capsule-style files (one month, single year-month prefix)
    d = tmp_path / "nc"
    d.mkdir()
    for i in range(200):
        (d / f"E3SM-MMF.mli.0001-02-{i:05d}.nc").touch()

    train = mod.fallback_filelist(str(d), "train")
    score = mod.fallback_filelist(str(d), "scoring")
    assert train and score
    assert not set(train) & set(score), "train/scoring files overlap"
    # strides honored on the disjoint halves
    assert len(train) == len(range(0, 200, 2)[:: ingest.CANONICAL_SPLITS["train"][1]])
    assert len(score) == len(range(1, 200, 2)[:: ingest.CANONICAL_SPLITS["scoring"][1]])
