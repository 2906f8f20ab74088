"""Golden-parity tests: execute the REFERENCE data_utils as the oracle.

The reference implementation (/root/reference/climsim_utils/data_utils.py)
runs unmodified under the tests/refshim mini-xarray, on the same synthetic
nc tree and the reference's own real normalization nc files, and every
stage of this repo's pipeline is asserted equal to its output:

  ingest (raw + normalized)  vs data_utils.save_as_npy        :791-944
  RH derivation (v2_rh)      vs get_xrdata eliq/eice          :619-676
  pressure grid / dp         vs set_pressure_grid             :1037-1086
  output weighting           vs output_weighting              :1112-1362
  MAE/RMSE/R2/bias tables    vs create_metrics_df             :1432-1607
  CRPS                       vs calc_CRPS                     :1499-1524

This is the dual-implementation oracle pattern the reference itself uses
(tests/unit_tests.ipynb, testing_data_utils_with_backends.py) -- but
against the reference itself rather than a second hand-derivation.
"""

import os

import numpy as np
import pytest

from refshim import load_data_utils, load_expansion_module
from refshim import xrmini as xr
from synthnc import NCOL, make_tree

from climsim_tpu.data import ingest
from climsim_tpu.data.transforms import (channelize_input,
    channelize_target, dechannelize_output, make_input_transform,
    make_target_transform)
from climsim_tpu.eval import metrics as own_metrics
from climsim_tpu.eval.weighting import pressure_thickness_from_inputs, \
    weight_outputs
from climsim_tpu.grid import synthetic_grid
from climsim_tpu.norms import NormStats, load_asset_norms
from climsim_tpu.varspec import get_varspec

from refshim import REFERENCE_ROOT

REF_NORMS = os.path.join(REFERENCE_ROOT, "preprocessing/normalizations")

refmod = load_data_utils()
pytestmark = pytest.mark.skipif(
    refmod is None, reason="reference tree not available")


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def grid():
    return synthetic_grid(ncol=NCOL)


@pytest.fixture(scope="module")
def ncdir(tmp_path_factory, grid):
    root = tmp_path_factory.mktemp("goldnc") / "0001-02"
    return make_tree(root, grid, nsteps=6, seed=0)


def grid_dataset(grid):
    """Shim Dataset equivalent of grid_info/ClimSim_low-res_grid-info.nc."""
    ds = xr.Dataset()
    ds["lev"] = xr.DataArray(np.arange(60.0), ("lev",))
    ds["ncol"] = xr.DataArray(np.arange(grid.ncol, dtype=float), ("ncol",))
    ds["lat"] = xr.DataArray(grid.lat, ("ncol",))
    ds["lon"] = xr.DataArray(grid.lon, ("ncol",))
    ds["area"] = xr.DataArray(grid.area, ("ncol",))
    ds["hyai"] = xr.DataArray(grid.hyai, ("ilev",))
    ds["hybi"] = xr.DataArray(grid.hybi, ("ilev",))
    ds["hyam"] = xr.DataArray(grid.hyam, ("lev",))
    ds["hybm"] = xr.DataArray(grid.hybm, ("lev",))
    ds["P0"] = xr.DataArray(np.float64(grid.p0), ())
    return ds


@pytest.fixture(scope="module")
def norm_datasets():
    mean = xr.open_dataset(f"{REF_NORMS}/inputs/input_mean.nc")
    maxx = xr.open_dataset(f"{REF_NORMS}/inputs/input_max.nc")
    minn = xr.open_dataset(f"{REF_NORMS}/inputs/input_min.nc")
    scale = xr.open_dataset(f"{REF_NORMS}/outputs/output_scale.nc")
    return mean, maxx, minn, scale


def make_ref(grid, norm_datasets, normalize):
    mean, maxx, minn, scale = norm_datasets
    return refmod.data_utils(
        grid_info=grid_dataset(grid), input_mean=mean, input_max=maxx,
        input_min=minn, output_scale=scale, ml_backend="pytorch",
        normalize=normalize)


def ref_split_arrays(du, ncdir, version, tmp, normalize_tag):
    """Run the reference save_as_npy flow, return (filelist, x, y)."""
    getattr(du, f"set_to_{version}_vars")()
    du.data_path = ncdir + "/"
    du.set_regexps("train", ["E3SM-MMF.mli.*.nc"])
    du.set_stride_sample("train", 1)
    du.set_filelist("train")  # note: default end_idx=-1 drops the last file
    out = os.path.join(tmp, f"ref_{version}_{normalize_tag}")
    du.save_as_npy("train", save_path=out)
    x = np.load(os.path.join(out, "train_input.npy"))
    y = np.load(os.path.join(out, "train_target.npy"))
    return list(du.train_filelist), x, y


# --------------------------------------------------------------------------
# shim sanity: the oracle harness itself reads files correctly
# --------------------------------------------------------------------------

def test_ncread_real_netcdf4_file():
    """The repo's own reader handles a REAL netCDF-4 (HDF5) file from the
    reference tree -- the format the production norm/grid files use."""
    import h5py

    from climsim_tpu.utils.ncread import read_netcdf

    path = f"{REF_NORMS}/inputs/input_mean.nc"
    nc = read_netcdf(path)
    with h5py.File(path, "r") as f:
        for name in ("state_t", "state_q0001", "state_ps", "cam_in_LWUP"):
            np.testing.assert_array_equal(nc[name], f[name][()])
    assert nc.variables["state_t"].shape == (60,)
    assert nc.variables["state_ps"].shape == ()


def test_shim_reads_classic_and_hdf5(ncdir):
    files = sorted(os.listdir(os.path.join(ncdir, "0001-02")))
    ds = xr.open_dataset(os.path.join(ncdir, "0001-02", files[0]))
    assert ds["state_t"].dims == ("lev", "ncol")
    assert ds["state_t"].shape == (60, NCOL)
    assert ds["state_ps"].dims == ("ncol",)

    mean = xr.open_dataset(f"{REF_NORMS}/inputs/input_mean.nc")
    assert mean["state_t"].dims == ("lev",)
    assert mean["state_ps"].dims == ()
    # dim-name broadcasting: (lev,ncol) - (lev,) must align on lev
    d = ds["state_t"] - mean["state_t"]
    want = ds["state_t"].values - mean["state_t"].values[:, None]
    np.testing.assert_array_equal(d.values, want)


# --------------------------------------------------------------------------
# ingest parity
# --------------------------------------------------------------------------

@pytest.mark.parametrize("version", ["v1", "v2_rh", "v2"])
def test_ingest_parity_raw(ncdir, grid, norm_datasets, tmp_path, version):
    """Raw (normalize=False) shards: ours == reference, incl. RH derivation."""
    du = make_ref(grid, norm_datasets, normalize=False)
    filelist, ref_x, ref_y = ref_split_arrays(
        du, ncdir, version, str(tmp_path), "raw")
    assert len(filelist) == 5  # end_idx=-1 drops the final file

    spec = get_varspec(version)
    out = ingest.build_split(filelist, spec, str(tmp_path / "own"), "train",
                             grid=grid)
    own_x = np.load(out["input"])
    own_y = np.load(out["target"])
    assert ref_x.shape == own_x.shape == (5 * NCOL, spec.input_len)
    assert ref_y.shape == own_y.shape == (5 * NCOL, spec.output_len)
    np.testing.assert_allclose(own_x, ref_x, rtol=1e-6, atol=0)
    np.testing.assert_allclose(own_y, ref_y, rtol=1e-6, atol=1e-30)


@pytest.mark.parametrize("version", ["v4", "v5"])
def test_ingest_parity_expanded_window(tmp_path, norm_datasets, version):
    """v4/v5 expanded-feature ingest: the REFERENCE expansion script
    (climsim_adding_input.py, run unmodified under the shim) writes
    mlexpand files consumed by the reference data_utils; our in-memory
    3-file-window expansion must produce identical shards.  384 columns
    because the script hardcodes icol = arange(1, 385)."""
    grid384 = synthetic_grid(ncol=384)
    ncdir = make_tree(tmp_path / "tree" / "0001-02", grid384, nsteps=5,
                      seed=4, ncol=384)
    import glob as globmod

    files = sorted(globmod.glob(os.path.join(ncdir, "*", "E3SM-MMF.mli.*")))
    assert len(files) == 5

    # --- reference expansion (i >= 2 has a full window) -------------------
    expand = load_expansion_module()
    lat = xr.DataArray(grid384.lat, ("ncol",))
    lon = xr.DataArray(grid384.lon, ("ncol",))
    for i in range(2, len(files)):
        expand.process_one_file((i, files, lat, lon, "mli", "mlo",
                                 "mlexpand"))

    # --- reference ingest over the mlexpand files --------------------------
    mean, maxx, minn, scale = norm_datasets
    du = refmod.data_utils(
        grid_info=grid_dataset(grid384), input_mean=mean, input_max=maxx,
        input_min=minn, output_scale=scale, ml_backend="pytorch",
        normalize=False, input_abbrev="mlexpand")
    getattr(du, f"set_to_{version}_vars")()
    du.data_path = ncdir + "/"
    du.set_regexps("train", ["E3SM-MMF.mlexpand.*.nc"])
    du.set_stride_sample("train", 1)
    du.set_filelist("train")  # drops the last expanded file (end_idx=-1)
    assert len(du.train_filelist) == 2
    out = os.path.join(str(tmp_path), f"ref_{version}")
    du.save_as_npy("train", save_path=out)
    ref_x = np.load(os.path.join(out, "train_input.npy"))
    ref_y = np.load(os.path.join(out, "train_target.npy"))

    # --- our in-memory window expansion over the ORIGINAL mli files --------
    spec = get_varspec(version)
    own = ingest.build_split(files[:4], spec, str(tmp_path / "own"),
                             "train", grid=grid384, window=True)
    own_x = np.load(own["input"])
    own_y = np.load(own["target"])
    assert ref_x.shape == own_x.shape == (2 * 384, spec.input_len)
    assert ref_y.shape == own_y.shape == (2 * 384, spec.output_len)
    np.testing.assert_allclose(own_x, ref_x, rtol=1e-6, atol=1e-30)
    np.testing.assert_allclose(own_y, ref_y, rtol=1e-6, atol=1e-30)


def test_ingest_parity_normalized(ncdir, grid, norm_datasets, tmp_path):
    """Normalized (v1) shards: reference normalize=True vs our in-jit
    transform on raw shards AND our build_split(stats=...) path."""
    du = make_ref(grid, norm_datasets, normalize=True)
    filelist, ref_x, ref_y = ref_split_arrays(
        du, ncdir, "v1", str(tmp_path), "norm")

    spec = get_varspec("v1")
    mean, maxx, minn, scale = norm_datasets
    stats = NormStats.from_var_datasets(
        spec,
        {k: v.values for k, v in mean.data_vars.items()},
        {k: v.values for k, v in maxx.data_vars.items()},
        {k: v.values for k, v in minn.data_vars.items()},
        {k: v.values for k, v in scale.data_vars.items()})

    # the committed npz assets must equal the reference norm files
    asset = load_asset_norms("v1")
    np.testing.assert_allclose(asset.inp_sub, stats.inp_sub, rtol=1e-12)
    np.testing.assert_allclose(asset.inp_div, stats.inp_div, rtol=1e-12)
    np.testing.assert_allclose(asset.out_scale, stats.out_scale, rtol=1e-12)

    # leg 1: shard-time normalization (f64, like the reference)
    out = ingest.build_split(filelist, spec, str(tmp_path / "own"), "train",
                             grid=grid, stats=stats)
    np.testing.assert_allclose(np.load(out["input"]), ref_x,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.load(out["target"]), ref_y,
                               rtol=1e-6, atol=1e-30)

    # leg 2: the in-jit f32 transform on raw shards
    raw = ingest.build_split(filelist, spec, str(tmp_path / "raw"), "train",
                             grid=grid)
    in_t = make_input_transform(spec, stats)
    tgt_t = make_target_transform(spec, stats)
    np.testing.assert_allclose(np.asarray(in_t(np.load(raw["input"]))),
                               ref_x, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt_t(np.load(raw["target"]))),
                               ref_y, rtol=2e-4, atol=1e-6)


# --------------------------------------------------------------------------
# pressure grid / weighting / metrics parity
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scored_v1(ncdir, grid, norm_datasets, tmp_path_factory):
    """Reference du with normalized v1 train split loaded + preds."""
    tmp = str(tmp_path_factory.mktemp("score"))
    du = make_ref(grid, norm_datasets, normalize=True)
    filelist, x, y = ref_split_arrays(du, ncdir, "v1", tmp, "norm")
    du.input_train = x
    du.target_train = y
    rng = np.random.default_rng(7)
    preds = (y + 0.1 * rng.standard_normal(y.shape)).astype(np.float32)
    du.model_names = ["m"]
    du.preds_train = {"m": preds}
    return du, x, y, preds


def test_pressure_grid_parity(scored_v1, grid, norm_datasets):
    du, x, y, preds = scored_v1
    du.set_pressure_grid("train")
    spec = get_varspec("v1")
    mean, maxx, minn, scale = norm_datasets
    stats = NormStats.from_var_datasets(
        spec, {k: v.values for k, v in mean.data_vars.items()},
        {k: v.values for k, v in maxx.data_vars.items()},
        {k: v.values for k, v in minn.data_vars.items()},
        {k: v.values for k, v in scale.data_vars.items()})
    dp = pressure_thickness_from_inputs(
        x.astype(np.float64), spec, grid, stats)
    t = x.shape[0] // NCOL
    np.testing.assert_allclose(dp.reshape(t, NCOL, 60), du.dp_train,
                               rtol=1e-6)


def test_weighting_and_metrics_parity(scored_v1, grid, norm_datasets):
    du, x, y, preds = scored_v1
    du.set_pressure_grid("train")
    du.reweight_target("train")
    du.reweight_preds("train")
    du.metrics_names = ["MAE", "RMSE", "R2", "bias"]
    du.create_metrics_df("train")

    spec = get_varspec("v1")
    mean, maxx, minn, scale = norm_datasets
    stats = NormStats.from_var_datasets(
        spec, {k: v.values for k, v in mean.data_vars.items()},
        {k: v.values for k, v in maxx.data_vars.items()},
        {k: v.values for k, v in minn.data_vars.items()},
        {k: v.values for k, v in scale.data_vars.items()})
    dp = pressure_thickness_from_inputs(
        x.astype(np.float64), spec, grid, stats)
    tw = weight_outputs(y.astype(np.float64), spec, grid, dp, stats)
    pw = weight_outputs(preds.astype(np.float64), spec, grid, dp, stats)

    for v in spec.outputs:
        np.testing.assert_allclose(
            tw[v], du.target_weighted_train[v], rtol=1e-6,
            err_msg=f"target weighting mismatch for {v}")
        np.testing.assert_allclose(
            pw[v], du.preds_weighted_train["m"][v], rtol=1e-6,
            err_msg=f"pred weighting mismatch for {v}")

    ref_df = du.metrics_var_train["m"]
    own = own_metrics.metrics_table(
        pw, tw, ("MAE", "RMSE", "R2", "bias"))
    for v in spec.outputs:
        for m in ("MAE", "RMSE", "R2", "bias"):
            np.testing.assert_allclose(
                own[v][m], float(ref_df.loc[v, m]), rtol=1e-6,
                err_msg=f"{m}({v})")


# the two ignores are ORACLE-side arithmetic: the reference's own
# save_as_npy float32 cast overflows on v2's large-magnitude derived
# features, and its weighting divides by the zero rows of out_scale --
# both reproduce identically in real xarray; values are asserted below
@pytest.mark.filterwarnings("ignore:overflow encountered in cast")
@pytest.mark.filterwarnings("ignore:divide by zero encountered in divide")
def test_weighting_parity_v2_full_vars(ncdir, grid, norm_datasets, tmp_path):
    """full_vars path: wind-speed energy conversion for ptend_u/v."""
    du = make_ref(grid, norm_datasets, normalize=True)
    filelist, x, y = ref_split_arrays(du, ncdir, "v2", str(tmp_path), "norm")
    du.input_train = x
    du.target_train = y
    du.set_pressure_grid("train")
    du.reweight_target("train")

    spec = get_varspec("v2")
    mean, maxx, minn, scale = norm_datasets
    stats = NormStats.from_var_datasets(
        spec, {k: v.values for k, v in mean.data_vars.items()},
        {k: v.values for k, v in maxx.data_vars.items()},
        {k: v.values for k, v in minn.data_vars.items()},
        {k: v.values for k, v in scale.data_vars.items()})
    dp = pressure_thickness_from_inputs(
        x.astype(np.float64), spec, grid, stats)
    tw = weight_outputs(y.astype(np.float64), spec, grid, dp, stats)
    for v in spec.outputs:
        np.testing.assert_allclose(
            tw[v], du.target_weighted_train[v], rtol=1e-6, atol=1e-25,
            err_msg=f"v2 weighting mismatch for {v}")


def test_reshape_daily_parity(scored_v1, grid):
    """Daily zonal means: ours vs the reference's reshape_daily
    (data_utils.py:1609-1629), including its lat-group ordering."""
    from climsim_tpu.eval.analysis import reshape_daily

    du, x, y, preds = scored_v1
    t = y.shape[0] // NCOL
    spd = max(t, 1)  # tiny split: one "day" spanning all samples
    # reference hardcodes 12 samples/day; feed it a multiple-of-12 block
    n12 = (t // 12) * 12
    if n12 == 0:
        # replicate the tiny split to reach 12 timesteps
        reps = -(-12 // t)
        y_big = np.tile(y.reshape(t, NCOL, -1), (reps, 1, 1))[:12]
        y_big = y_big.reshape(12 * NCOL, -1)
    else:
        y_big = y[: n12 * NCOL]
    ref_t, ref_q = du.reshape_daily(y_big)
    own_t, own_q = reshape_daily(np.asarray(y_big), grid,
                                 samples_per_day=12)
    # DELIBERATE DELTA: the reference sorts lat groups by FIRST COLUMN
    # INDEX (data_utils.py:139 indices_list.sort(key=lambda x: x[0])),
    # which does not match the ascending-lat labels its own plot applies;
    # we use ascending latitude.  The math must agree up to that row
    # permutation.
    lats = np.unique(grid.lat)
    groups = [np.nonzero(grid.lat == la)[0] for la in lats]
    ref_order = np.argsort([g[0] for g in groups])  # ref row for each lat
    np.testing.assert_allclose(own_t, ref_t[np.argsort(ref_order)],
                               rtol=1e-6)
    np.testing.assert_allclose(own_q, ref_q[np.argsort(ref_order)],
                               rtol=1e-6)


def test_crps_parity(scored_v1, grid):
    du, x, y, preds = scored_v1
    rng = np.random.default_rng(3)
    t = y.shape[0] // NCOL
    # profile-shaped samples (T, ncol, lev, S) and scalar (T, ncol, S)
    prof_t = y[:, :60].reshape(t, NCOL, 60)
    prof_s = prof_t[..., None] + 0.3 * rng.standard_normal(
        (t, NCOL, 60, 8))
    ref = du.calc_CRPS(prof_s, prof_t)
    own = own_metrics.crps(prof_s, prof_t)
    np.testing.assert_allclose(own, ref, rtol=1e-9)

    sc_t = y[:, 120].reshape(t, NCOL)
    sc_s = sc_t[..., None] + 0.3 * rng.standard_normal((t, NCOL, 8))
    np.testing.assert_allclose(own_metrics.crps(sc_s, sc_t),
                               du.calc_CRPS(sc_s, sc_t), rtol=1e-9)


def test_cnn_reshape_adapters_parity():
    """channelize_input / channelize_target / dechannelize_output vs the
    reference's reshape_{input,target}_for_cnn / reshape_target_from_cnn
    (data_utils.py:1692-1760) on v1 arrays."""
    spec = get_varspec("v1")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(17, spec.input_len)).astype(np.float32)
    y = rng.normal(size=(17, spec.output_len)).astype(np.float32)

    ref_x = refmod.data_utils.reshape_input_for_cnn(x)
    own_x = np.asarray(channelize_input(x, spec))
    np.testing.assert_array_equal(own_x, ref_x)

    ref_y = refmod.data_utils.reshape_target_for_cnn(y)
    own_y = np.asarray(channelize_target(y, spec))
    np.testing.assert_array_equal(own_y, ref_y)

    y_ch = rng.normal(size=(17, 60, 10)).astype(np.float32)
    ref_back = refmod.data_utils.reshape_target_from_cnn(y_ch)
    own_back = np.asarray(dechannelize_output(y_ch, spec))
    np.testing.assert_allclose(own_back, ref_back, rtol=1e-6, atol=1e-7)
