"""E3SM deployment bundle packaging (scripts/package_e3sm.py).

The bundle is the framework's deployable unit: fixed-shape StableHLO AOT
wrapper artifacts + the comma-separated normalization txt files the
coupling contract specifies (the reference ships TorchScript .pt +
inp_sub/inp_div/out_scale txt, v5_nn_wrapper.ipynb `save_wrapper` /
data_utils.py:973-987).  These tests package real (tiny) models end to
end and assert the reloaded artifacts match the live wrapper exactly.
"""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from climsim_tpu.config import PRESETS  # noqa: E402
from climsim_tpu.models import build_model  # noqa: E402
from climsim_tpu.norms import load_asset_norms  # noqa: E402
from climsim_tpu.train.checkpoints import save_pytree  # noqa: E402
from climsim_tpu.varspec import get_varspec  # noqa: E402

from scripts.package_e3sm import build_bundle  # noqa: E402

TINY_UNET = ("model_kw.model_channels=8", "model_kw.channel_mult=[1]",
             "model_kw.num_blocks=1", "model_kw.attn_resolutions=[]")


def _trained_ckpt(tmp_path, preset, overrides, seed, name):
    """A checkpoint whose values differ from the packager's fresh init."""
    cfg = PRESETS[preset].override(*overrides) if overrides else PRESETS[preset]
    spec = get_varspec(cfg.data.varspec)
    model = build_model(cfg.model, spec, **cfg.model_kw)
    params = model.init(jax.random.PRNGKey(seed),
                        np.zeros((1, spec.input_len), np.float32))
    path = str(tmp_path / name)
    save_pytree(path, params)
    return path, params


def test_regressor_bundle_roundtrip(tmp_path):
    overrides = ("model_kw.hidden=[32,32]",)
    ckpt, params = _trained_ckpt(tmp_path, "mlp_v2rh", overrides, 7, "reg.msgpack")
    out = str(tmp_path / "bundle")
    meta = build_bundle("mlp_v2rh", ckpt, out, [4], verify=True,
                        overrides=overrides)

    # metadata describes the v2_rh coupling contract
    assert meta["input_version"] == "v2_rh"
    assert meta["n_features"] == 557 and meta["n_outputs"] == 368
    assert meta["untrained"] is False
    on_disk = json.load(open(os.path.join(out, "metadata.json")))
    assert on_disk["artifacts"] == meta["artifacts"]

    # norm txts are the comma-separated contract vectors, value-exact
    stats = load_asset_norms("v2_rh")
    for fname, vec in (("inp_sub.txt", stats.inp_sub),
                       ("inp_div.txt", stats.inp_div),
                       ("out_scale.txt", stats.out_scale)):
        got = np.loadtxt(os.path.join(out, fname), delimiter=",")
        np.testing.assert_allclose(got, vec, rtol=1e-5)

    # the AOT artifact embeds the CHECKPOINT weights, not a fresh init:
    # its output must match the live wrapper built on the loaded params
    from climsim_tpu.online.wrapper import load_aot, make_v2rh_wrapper

    spec = get_varspec("v2_rh")
    cfg = PRESETS["mlp_v2rh"].override(*overrides)
    model = build_model(cfg.model, spec, **cfg.model_kw)
    wrap = make_v2rh_wrapper(model.apply, stats, spec)
    x = np.random.default_rng(0).normal(
        size=(4, spec.input_len)).astype(np.float32)
    got = np.asarray(load_aot(os.path.join(out, "wrapper_b4.stablehlo"))(x))
    want = np.asarray(jax.jit(wrap)(params, x))
    np.testing.assert_array_equal(got, want)


def test_two_stage_v5_bundle(tmp_path):
    reg_ckpt, _ = _trained_ckpt(tmp_path, "unet_v5", TINY_UNET, 1, "reg.msgpack")
    cls_ckpt, _ = _trained_ckpt(tmp_path, "unet_v5_classifier", TINY_UNET, 2,
                                "cls.msgpack")
    out = str(tmp_path / "bundle5")
    meta = build_bundle("unet_v5", reg_ckpt, out, [4], cls_ckpt=cls_ckpt,
                        verify=True, overrides=TINY_UNET,
                        cls_overrides=TINY_UNET)
    # v5 models couple through the raw-v4 host contract, two-stage scheme
    assert meta["input_version"] == "v4" and meta["n_features"] == 1525
    assert meta["scheme"] == "two_stage"
    # v5 bundles must ship the qn lambda vector the host-side checks use
    lbd = np.loadtxt(os.path.join(out, "lbd_qn.txt"), delimiter=",")
    np.testing.assert_allclose(lbd, load_asset_norms("v5").lbd_qn, rtol=1e-5)
    assert os.path.getsize(os.path.join(out, "wrapper_b4.stablehlo")) > 0


def test_train_to_bundle_chain(tmp_path):
    """The REAL artifact chain: run.py training writes a top-K checkpoint
    dir; the packager loads its BEST entry and ships a bundle that
    matches the live wrapper on the trained weights."""
    from climsim_tpu.run import main as run_main

    ckpt_dir = str(tmp_path / "ckpts")
    run_main(["--preset", "mlp_v2rh", "--quiet", "train.epochs=2",
              "data.num_synthetic=512", "data.batch_size=128",
              'model_kw={"hidden":[16,16]}',
              f"train.checkpoint_dir={ckpt_dir}"])
    assert os.path.exists(os.path.join(ckpt_dir, "topk.json"))

    out = str(tmp_path / "bundle")
    meta = build_bundle("mlp_v2rh", ckpt_dir, out, [4], verify=True,
                        overrides=('model_kw.hidden=[16,16]',))
    assert meta["untrained"] is False
    # trained weights, not a fresh init: outputs must differ from the
    # packager's seed-0 template model
    from climsim_tpu.online.wrapper import load_aot

    fresh = build_bundle("mlp_v2rh", None, str(tmp_path / "fresh"), [4],
                         overrides=('model_kw.hidden=[16,16]',))
    assert fresh["untrained"] is True
    x = np.random.default_rng(3).normal(size=(4, 557)).astype(np.float32)
    y_t = np.asarray(load_aot(os.path.join(out, "wrapper_b4.stablehlo"))(x))
    y_f = np.asarray(load_aot(os.path.join(
        str(tmp_path / "fresh"), "wrapper_b4.stablehlo"))(x))
    assert np.abs(y_t - y_f).max() > 0


def test_serve_bundle_resolution(tmp_path):
    """serve.py --bundle picks the requested bucket, or falls back to the
    smallest exported one."""
    from scripts.serve import resolve_bundle

    out = str(tmp_path / "b")
    os.makedirs(out)
    meta = {"n_features": 557,
            "artifacts": {"wrapper_b4.stablehlo": {"batch": 4},
                          "wrapper_b16.stablehlo": {"batch": 16}}}
    with open(os.path.join(out, "metadata.json"), "w") as f:
        json.dump(meta, f)
    path, feats, bucket = resolve_bundle(out, 16)
    assert path.endswith("wrapper_b16.stablehlo") and (feats, bucket) == (557, 16)
    path, _, bucket = resolve_bundle(out, 999)   # not exported -> smallest
    assert path.endswith("wrapper_b4.stablehlo") and bucket == 4
