"""Real-dataset capsule: ingest -> train -> score on one real month.

Gated on CLIMSIM_REAL_DATA pointing at a directory of raw E3SM-MMF
mli/mlo netCDF files (any subset with matching pairs, e.g. one month of
the 744 GB low-res set from HuggingFace).  The moment real data is
mounted, this capsule + `scripts/run_real_baselines.py` are the only
two steps between the repo and BASELINE.md's published tables
(website/evaluating.md:15-70).

Run:  CLIMSIM_REAL_DATA=/data/E3SM-MMF python -m pytest tests/test_real_data.py -v
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    "CLIMSIM_REAL_DATA" not in os.environ,
    reason="set CLIMSIM_REAL_DATA=<dir of E3SM-MMF.mli/mlo .nc files>")


@pytest.fixture(scope="module")
def real_shards(tmp_path_factory):
    """Ingest up to one month of real pairs into raw shards."""
    from climsim_tpu.data import ingest
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.varspec import get_varspec

    data_dir = os.environ["CLIMSIM_REAL_DATA"]
    spec = get_varspec("v1")
    grid = load_default_grid()
    files = ingest.build_filelist(data_dir, ["E3SM-MMF.mli.*.nc"],
                                  stride=1)
    assert files, f"no E3SM-MMF.mli files under {data_dir}"
    # one month of 20-min steps = 2160 pairs; stride to ~60 emitted
    files = files[:2160]
    stride = max(len(files) // 60, 1)
    train_files = files[0::2][::stride]
    score_files = files[1::2][::stride]

    out = tmp_path_factory.mktemp("real_shards")
    ingest.build_split(train_files, spec, str(out), "train", grid=grid)
    ingest.build_split(score_files, spec, str(out), "scoring", grid=grid)
    x_tr = np.load(out / "train_input.npy")
    y_tr = np.load(out / "train_target.npy")
    x_sc = np.load(out / "scoring_input.npy")
    y_sc = np.load(out / "scoring_target.npy")
    return spec, grid, x_tr, y_tr, x_sc, y_sc


def test_real_ingest_shapes_and_sanity(real_shards):
    spec, grid, x_tr, y_tr, x_sc, y_sc = real_shards
    assert x_tr.shape[1] == spec.input_len
    assert y_tr.shape[1] == spec.output_len
    assert x_tr.shape[0] % grid.ncol == 0
    assert np.isfinite(x_tr).all() and np.isfinite(y_tr).all()
    # physical ranges: T in K, ps in Pa
    t = x_tr[:, spec.input_slices["state_t"]]
    assert 150 < t.mean() < 320
    ps = x_tr[:, spec.input_slices["state_ps"].start]
    assert 4e4 < ps.mean() < 1.1e5


def test_real_month_train_and_score(real_shards):
    """MLP trains on one real month and the weighted metric engine
    produces sane BASELINE-format numbers."""
    import jax

    from climsim_tpu.data.transforms import make_target_transform
    from climsim_tpu.eval.scoring import offline_score
    from climsim_tpu.norms import compute_norms_from_data
    from climsim_tpu.train import recipes

    spec, grid, x_tr, y_tr, x_sc, y_sc = real_shards
    stats = compute_norms_from_data(spec, x_tr, y_tr)
    tr = recipes.mlp_trainer(spec, stats, (x_tr, y_tr),
                             jax.random.PRNGKey(0), hidden=(256, 256),
                             steps_per_epoch=64)
    state = tr.state
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(256):
        idx = rng.integers(0, x_tr.shape[0], 512)
        state, m = tr.train_step(state, x_tr[idx], y_tr[idx])
        losses.append(float(jax.device_get(m["loss"])))
    assert losses[-1] < losses[0], "loss did not decrease on real data"

    preds = {"MLP": tr.predict(state.params, x_sc, 4096)}
    tgt = np.asarray(make_target_transform(spec, stats)(y_sc))
    x_sc_n = (x_sc - stats.inp_sub) / stats.inp_div
    tables, _ = offline_score(spec, grid, stats, x_sc_n, tgt, preds)
    t = tables["MLP"]
    for v in ("ptend_t", "cam_out_NETSW", "cam_out_PRECC"):
        assert np.isfinite(t[v]["MAE"]) and t[v]["MAE"] > 0
        assert np.isfinite(t[v]["R2"])
    # NETSW is strongly input-determined on the real dataset (net
    # shortwave ~ f(SOLIN, albedo)); even one undertrained month must
    # beat the mean predictor.  CLIMSIM_REAL_DATA_SYNTHETIC=1 relaxes
    # this single skill assert so the capsule's MECHANICS can be
    # validated against a synthetic stand-in tree (whose targets are a
    # random map with no such structure).
    if os.environ.get("CLIMSIM_REAL_DATA_SYNTHETIC") != "1":
        assert t["cam_out_NETSW"]["R2"] > 0.0
