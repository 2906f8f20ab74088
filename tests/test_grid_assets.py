"""Grid + normalization asset integrity."""

import numpy as np

from climsim_tpu.grid import load_default_grid, synthetic_grid
from climsim_tpu.norms import load_asset_norms
from climsim_tpu.varspec import get_varspec


def test_default_grid_shapes():
    g = load_default_grid()
    assert g.ncol == 384
    assert g.num_levels == 60
    assert g.hyai.shape == (61,)
    assert g.hybi.shape == (61,)
    assert g.p0 == 1.0e5
    # area weights normalized to mean 1
    np.testing.assert_allclose(g.area_wgt.mean(), 1.0, rtol=1e-12)
    # hybrid coords: monotone interface pressure at standard surface pressure
    p = g.p0 * g.hyai + g.hybi * 1.0e5
    assert (np.diff(p) > 0).all()


def test_synthetic_grid_valid():
    g = synthetic_grid(ncol=32)
    p = g.p0 * g.hyai + g.hybi * 1.0e5
    assert (np.diff(p) > 0).all()
    np.testing.assert_allclose(p[-1], 1.0e5, rtol=1e-6)
    assert (g.area > 0).all()


def test_norm_assets_all_versions():
    for ver in ("v1", "v2", "v2_rh", "v4", "v5"):
        spec = get_varspec(ver)
        st = load_asset_norms(ver)
        assert st.inp_sub.shape == (spec.input_len,)
        assert st.inp_div.shape == (spec.input_len,)
        assert st.out_scale.shape == (spec.output_len,)
        assert np.isfinite(st.inp_sub).all()
        assert np.isfinite(st.inp_div).all()
        assert (st.inp_div != 0).all()
        assert np.isfinite(st.out_scale).all()
    v5 = load_asset_norms("v5")
    assert v5.lbd_qn is not None and v5.lbd_qn.shape == (60,)


def test_norms_txt_roundtrip(tmp_path):
    st = load_asset_norms("v1")
    st.save_txt(str(tmp_path))
    sub = np.loadtxt(tmp_path / "inp_sub.txt", delimiter=",")
    div = np.loadtxt(tmp_path / "inp_div.txt", delimiter=",")
    osc = np.loadtxt(tmp_path / "out_scale.txt", delimiter=",")
    np.testing.assert_allclose(sub, st.inp_sub, rtol=1e-5)
    np.testing.assert_allclose(div, st.inp_div, rtol=1e-5)
    np.testing.assert_allclose(osc, st.out_scale, rtol=1e-5)


def test_ncread_classic_roundtrip(tmp_path):
    """Verify the pure-numpy CDF parser against scipy's writer (CDF-1)."""
    from scipy.io import netcdf_file

    path = str(tmp_path / "t.nc")
    f = netcdf_file(path, "w")
    f.createDimension("t", None)
    f.createDimension("x", 5)
    v = f.createVariable("v", "f8", ("x",))
    v[:] = np.arange(5.0)
    r = f.createVariable("r", "f4", ("t", "x"))
    r[0] = np.arange(5.0) * 2
    r[1] = np.arange(5.0) * 3
    f.flush()
    f.close()

    from climsim_tpu.utils.ncread import read_netcdf

    nc = read_netcdf(path)
    np.testing.assert_allclose(nc["v"], np.arange(5.0))
    assert nc["r"].shape == (2, 5)
    np.testing.assert_allclose(nc["r"][1], np.arange(5.0) * 3)
