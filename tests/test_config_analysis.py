"""Config system, experiment runner, analysis/figures, Kaggle export."""

import numpy as np

from climsim_tpu.config import PRESETS, ExperimentConfig
from climsim_tpu.grid import load_default_grid
from climsim_tpu.varspec import get_varspec

GRID = load_default_grid()


def test_config_roundtrip_and_override():
    cfg = PRESETS["mlp_v1"]
    j = cfg.to_json()
    import json

    cfg2 = ExperimentConfig.from_dict(json.loads(j))
    assert cfg2.model == "mlp"
    cfg3 = cfg2.override("train.epochs=3", "data.batch_size=256",
                         "model_kw.hidden=[128,128]")
    assert cfg3.train.epochs == 3
    assert cfg3.data.batch_size == 256
    assert cfg3.model_kw["hidden"] == [128, 128]
    # original untouched
    assert cfg2.train.epochs == 18


def test_presets_cover_reference_models():
    names = set(PRESETS)
    assert {"mlp_v1", "cnn_v1", "ed_v1", "hsr_v1", "rpn_v1", "cvae_v1",
            "mlp_v2rh", "unet_v4", "unet_v5",
            "unet_v5_classifier"} <= names


def test_run_experiment_small():
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["ed_v1"].override(
        "train.epochs=2", "data.num_synthetic=1536",
        "data.batch_size=256", "data.norms=compute",
        "train.num_data_shards=1")
    out = run_experiment(cfg, verbose=False)
    assert len(out["history"].rows) == 2
    assert np.isfinite(out["history"].rows[-1]["val_loss"])


def test_run_experiment_with_plateau_and_ckpt(tmp_path):
    """Regression: plateau/early-stop/checkpointing on the generic path
    (a function-local import once shadowed PlateauController here)."""
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["mlp_v1"].override(
        "train.epochs=2", "data.num_synthetic=1024",
        "data.batch_size=256", "data.norms=compute",
        "model_kw.hidden=[32]", "train.num_data_shards=1",
        "train.plateau_patience=2", "train.early_stop_patience=4",
        "train.timed_interval=0.001",
        f"train.checkpoint_dir={tmp_path}")
    out = run_experiment(cfg, verbose=False)
    assert len(out["history"].rows) == 2
    import json
    import os

    assert os.path.exists(tmp_path / "last.msgpack")
    assert os.path.exists(tmp_path / "timed.msgpack")
    with open(tmp_path / "run_manifest.json") as f:
        man = json.load(f)
    assert man["config"]["model"] == "mlp"
    assert man["jax"] and man["backend"]


def test_run_experiment_sharded():
    import jax

    from climsim_tpu.run import run_experiment

    cfg = PRESETS["mlp_v1"].override(
        "train.epochs=1", "data.num_synthetic=1536",
        "data.batch_size=512", "data.norms=compute",
        "model_kw.hidden=[64,64]",
        f"train.num_data_shards={min(8, len(jax.devices('cpu')))}")
    out = run_experiment(cfg, verbose=False)
    assert np.isfinite(out["history"].rows[0]["train_loss"])


def test_reshape_daily_and_r2_map(tmp_path):
    from climsim_tpu.eval import analysis as A

    rng = np.random.default_rng(0)
    days, spd = 3, 12
    n = days * spd * GRID.ncol
    target = rng.normal(size=(n, 128))
    pred = target + 0.3 * rng.normal(size=(n, 128))
    td_t, td_q = A.reshape_daily(target, GRID, spd)
    pd_t, pd_q = A.reshape_daily(pred, GRID, spd)
    nlat = len(GRID.unique_lats)
    assert td_t.shape == (nlat, days, 60)
    r2 = A.daily_zonal_r2(pd_t, td_t)
    assert r2.shape == (nlat, 60)
    assert np.nanmax(r2) <= 1.0

    plat = A.mean_pressure_by_lat(GRID)
    assert plat.shape == (nlat, 60)
    fig = A.plot_r2_maps({"m1": r2}, GRID, plat,
                         str(tmp_path / "r2.png"))
    assert (tmp_path / "r2.png").exists()


def test_plot_metric_bars(tmp_path):
    from climsim_tpu.eval.analysis import plot_metric_bars

    tables = {"a": {"ptend_t": {"MAE": 2.5}, "NETSW": {"MAE": 13.0}},
              "b": {"ptend_t": {"MAE": 2.7}, "NETSW": {"MAE": 19.0}}}
    plot_metric_bars(tables, "MAE", str(tmp_path / "bars.png"))
    assert (tmp_path / "bars.png").exists()


def test_kaggle_export():
    from climsim_tpu.data import kaggle

    spec = get_varspec("v2")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, spec.input_len)).astype(np.float32)
    y = rng.normal(size=(20, spec.output_len)).astype(np.float32)
    df = kaggle.make_train_frame(x, y)
    assert df.shape == (20, 557 + 368 - 1)  # SNOWHICE dropped
    assert "cam_in_SNOWHICE" not in df.columns
    assert df.index.name == "sample_id"
    assert "state_t_0" in df.columns and "ptend_v_59" in df.columns

    names, w = kaggle.output_weights(y)
    assert len(names) == 368
    # ablated stratosphere tendencies zeroed; ptend_t untouched
    assert w[names.index("ptend_q0001_0")] == 0.0
    assert w[names.index("ptend_q0001_12")] > 0.0
    assert w[names.index("ptend_t_0")] > 0.0
    sub = kaggle.make_submission_frame([f"test_{i}" for i in range(5)], y)
    assert sub.shape == (5, 368)


def test_profiling_utils():
    import jax
    import jax.numpy as jnp

    from climsim_tpu.utils.profiling import (MetricsLogger, cost_analysis,
                                             time_fn)

    f = jax.jit(lambda x: jnp.dot(x, x.T).sum())
    x = jnp.ones((64, 64))
    t = time_fn(f, x, iters=5)
    assert t > 0
    ca = cost_analysis(f, x)
    assert ca.get("flops", 0) > 0

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ml = MetricsLogger(d, "t")
        ml.log(0, loss=1.0)
        ml.log(1, loss=0.5, lr=1e-3)
        p = ml.to_csv()
        import os

        assert os.path.exists(p)


def test_every_preset_runs_tiny():
    """All presets exercise their full recipe path through the runner
    (catches config<->recipe keyword mismatches)."""
    from climsim_tpu.run import run_experiment

    # keyword-mismatch coverage only: smallest graphs that still thread
    # every preset through its recipe.  val_fraction=0 skips the eval-step
    # compile per preset (the fit/eval path is covered by
    # test_run_experiment_small); this box has ONE cpu core, so wall time
    # here is XLA compile time, and shapes are chosen to minimize it.
    common = ["train.epochs=1", "data.num_synthetic=384",
              "data.batch_size=128", "data.norms=compute",
              "train.num_data_shards=1", "data.loader=host",
              "data.val_fraction=0"]
    tiny_unet = ["model_kw.model_channels=8", "model_kw.channel_mult=[1]",
                 "model_kw.num_blocks=1", "model_kw.attn_resolutions=[]"]
    shrink = {
        "mlp_v1": ["model_kw.hidden=[32]"],
        "mlp_v2": ["model_kw.hidden=[32]"],
        "cnn_v1": ["model_kw.depth=1", "model_kw.channels=16"],
        "ed_v1": ["model_kw.intermediate=32", "model_kw.latent=3"],
        "hsr_v1": ["model_kw.hidden=32", "model_kw.layers=1"],
        "rpn_v1": ["model_kw.ensemble_size=2",
                   "model_kw.hidden=[16,16]"],
        "cvae_v1": ["model_kw.hidden=32", "model_kw.layers=1",
                    "model_kw.latent=3"],
        "mlp_v2rh": ["model_kw.hidden=[32]"],
        "unet_v4": tiny_unet,
        "unet_v5": tiny_unet,
        "unet_v5_classifier": tiny_unet,
    }
    for name, cfg0 in PRESETS.items():
        cfg = cfg0.override(*(common + shrink.get(name, [])))
        out = run_experiment(cfg, verbose=False)
        assert out is not None, name


def test_run_experiment_does_not_mutate_caller_config():
    """Regression: run_experiment clamps data.batch_size in place; the
    clamp must hit a private copy, not the shared PRESETS entry (a
    leaked clamp silently changed every later run in the process)."""
    from climsim_tpu.run import run_experiment

    cfg = PRESETS["ed_v1"].override(
        "train.epochs=1", "data.num_synthetic=256",
        "data.batch_size=10000", "data.norms=identity",
        "train.num_data_shards=1")
    before = cfg.data.batch_size
    run_experiment(cfg, verbose=False)
    assert cfg.data.batch_size == before == 10000


def test_restart_path_rejected_on_unsupported_branches():
    """train.restart_path only works on the single-model fit() path;
    rpn/multi-seed/elastic must fail loud, not train from scratch."""
    import pytest

    from climsim_tpu.run import run_experiment

    base = ["train.epochs=1", "data.num_synthetic=256",
            "data.batch_size=64", "data.norms=identity",
            "train.num_data_shards=1", "train.restart_path=/nonexistent"]
    for extra in (["train.seeds=[0,1]"], ["train.elastic=true"]):
        cfg = PRESETS["ed_v1"].override(*(base + extra))
        with pytest.raises(ValueError, match="restart_path"):
            run_experiment(cfg, verbose=False)
    cfg = PRESETS["rpn_v1"].override(*base)
    with pytest.raises(ValueError, match="restart_path"):
        run_experiment(cfg, verbose=False)


def test_identity_norms_lambda_symmetry():
    """identity_norms must supply placeholder exp-transform rates for
    EVERY cloud layout (v5's qn AND v4/v2's qc/qi), or the fail-loud
    transform rejects identity stats asymmetrically."""
    from climsim_tpu.norms import identity_norms

    s5 = identity_norms(get_varspec("v5"))
    assert s5.lbd_qn is not None and s5.lbd_qc is None
    for v in ("v4", "v2_rh"):
        st = identity_norms(get_varspec(v))
        assert st.lbd_qc is not None and st.lbd_qi is not None, v
        assert st.lbd_qn is None
