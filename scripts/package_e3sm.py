#!/usr/bin/env python
"""Package a trained coupling model into a deployable E3SM artifact bundle.

One command from a checkpoint to the directory a host-model integration
consumes -- the TPU-native analog of the reference's deployment flow,
which saves a TorchScript wrapper plus comma-separated normalization txt
files for the E3SM-MMF bridge (v5_nn_wrapper.ipynb `save_wrapper`;
inp_sub/inp_div/out_scale txt export per data_utils.py:973-987):

    python scripts/package_e3sm.py --preset unet_v5 --ckpt ckpt.msgpack \
        --buckets 384,1536 --out deploy/unet_v5 --verify

writes to --out:
    wrapper_b{B}.stablehlo   fixed-shape AOT artifact per batch bucket
                             (weights embedded; runs without model source)
    inp_sub.txt inp_div.txt out_scale.txt [lbd_qn.txt]
                             the coupling-contract normalization vectors
    metadata.json            contract description + sha256 per artifact

Serve any bucket with the TCP sidecar:
    python scripts/serve.py --aot deploy/unet_v5/wrapper_b384.stablehlo \
        --features <metadata.n_features> --batch 384

Schemes: the plain regressor wrapper by default; --cls-ckpt adds the
reference's production two-stage classifier gating
(climsim_unet_classifier.py + conf/config_single.yaml:63-64) in front of
the qn tendency before export, so the bundle ships the exact composition
the online gate PASSed (docs/ONLINE_EVAL_two_stage.md).
"""

import argparse
import dataclasses
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _load_params(ckpt: str, template):
    """Checkpoint -> param pytree.

    Accepts every format the training loop writes: a save_pytree msgpack
    file, a TopKCheckpointer directory (picks the BEST entry from
    topk.json), or an orbax checkpoint directory (latest step)."""
    import jax
    import jax.numpy as jnp

    from climsim_tpu.train.checkpoints import (OrbaxCheckpointer,
                                               TopKCheckpointer, load_pytree)

    if os.path.isdir(ckpt):
        if os.path.exists(os.path.join(ckpt, "topk.json")):
            topk = TopKCheckpointer(ckpt)
            tree = topk.load_best(template)
            if tree is None:
                raise SystemExit(f"{ckpt}/topk.json lists no checkpoints")
            metric, step, _ = topk.best()
            print(f"loaded top-K best: step {step} (metric {metric:g})")
        else:
            tree = OrbaxCheckpointer(ckpt, async_save=False).restore(template)
    else:
        tree = load_pytree(ckpt, template)
    # from_bytes restores numpy leaves; promote to device arrays so traced
    # fancy-indexing (the U-Net location embedding) works under jax.export
    return jax.tree.map(jnp.asarray, tree)


def build_bundle(preset: str, ckpt: str | None, out: str, buckets,
                 cls_ckpt: str | None = None, verify: bool = False,
                 seed: int = 0, overrides: tuple = (),
                 cls_overrides: tuple = ()):
    import jax
    import numpy as np

    from climsim_tpu.config import PRESETS
    from climsim_tpu.models import build_model
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.varspec import get_varspec

    cfg = PRESETS[preset]
    if overrides:
        cfg = cfg.override(*overrides)
    spec = get_varspec(cfg.data.varspec)
    stats = load_asset_norms(cfg.data.varspec)
    model = build_model(cfg.model, spec, **cfg.model_kw)
    x0 = np.zeros((1, spec.input_len), np.float32)
    template = model.init(jax.random.PRNGKey(seed), x0)
    params = _load_params(ckpt, template) if ckpt else template
    untrained = ckpt is None

    # the host's input contract per model family (online_testing/README.md
    # 3.1: E3SM links v5 models through the raw-v4 feature vector)
    if cfg.data.varspec == "v5":
        in_spec = get_varspec("v4")
        if cls_ckpt is not None:
            from climsim_tpu.online.two_stage import make_two_stage_apply

            cls_cfg = PRESETS["unet_v5_classifier"]
            if cls_overrides:
                cls_cfg = cls_cfg.override(*cls_overrides)
            cls_model = build_model(cls_cfg.model, spec, **cls_cfg.model_kw)
            cls_template = cls_model.init(jax.random.PRNGKey(seed + 1), x0)
            cls_params = _load_params(cls_ckpt, cls_template)
            apply = make_two_stage_apply(model.apply, cls_model.apply,
                                         stats=stats)
            params = (params, cls_params)
        else:
            apply = model.apply
        wrap = W.make_wrapper(apply, stats, W.WrapperConfig())
    elif cfg.data.varspec == "v4":
        # serve with the SAME input chain the preset trains with (a wrapper
        # whose preprocessing differs from training is a silent contract
        # violation -- make_input_transform also fails loud on missing
        # lambdas rather than skipping a requested transform)
        in_spec = spec
        wrap = W.make_v4_wrapper(model.apply, stats, spec, tcfg=cfg.transform)
    elif cfg.data.varspec == "v2_rh":
        in_spec = spec
        wrap = W.make_v2rh_wrapper(model.apply, stats, spec,
                                   tcfg=cfg.transform)
    else:
        raise SystemExit(f"preset {preset!r} (varspec {cfg.data.varspec}) "
                         "has no online coupling contract")
    if cls_ckpt is not None and cfg.data.varspec != "v5":
        raise SystemExit("--cls-ckpt is only meaningful for v5 presets")

    os.makedirs(out, exist_ok=True)
    stats.save_txt(out)
    if stats.lbd_qn is not None:
        np.savetxt(os.path.join(out, "lbd_qn.txt"),
                   np.asarray(stats.lbd_qn).reshape(1, -1),
                   fmt="%.6e", delimiter=",")

    artifacts = {}
    for b in buckets:
        path = os.path.join(out, f"wrapper_b{b}.stablehlo")
        t0 = time.perf_counter()
        W.export_aot(wrap, params, batch=b, n_features=in_spec.input_len,
                     path=path)
        export_s = time.perf_counter() - t0
        print(f"exported b={b} in {export_s:.1f}s", flush=True)
        artifacts[os.path.basename(path)] = {
            "batch": b, "sha256": _sha256(path),
            "bytes": os.path.getsize(path),
            "export_s": round(export_s, 1)}

    meta = {
        "preset": preset,
        "model": cfg.model,
        "varspec": cfg.data.varspec,
        "input_version": in_spec.name,
        "n_features": in_spec.input_len,
        "n_outputs": 368,
        "scheme": "two_stage" if cls_ckpt else "regressor",
        # jax.export artifacts are platform-bound: serve on this backend
        "platform": jax.default_backend(),
        "transform": (
            "v5_nn_wrapper chain (qn-lambda, prune, clip, repartition)"
            if cfg.data.varspec == "v5"
            else dataclasses.asdict(cfg.transform)),
        "untrained": untrained,
        "param_count": int(sum(
            np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))),
        "norm_files": ["inp_sub.txt", "inp_div.txt", "out_scale.txt"]
        + (["lbd_qn.txt"] if stats.lbd_qn is not None else []),
        "artifacts": artifacts,
        "serve": (f"python scripts/serve.py --aot {{bundle}}/wrapper_b"
                  f"{buckets[0]}.stablehlo --features {in_spec.input_len} "
                  f"--batch {buckets[0]}"),
    }
    with open(os.path.join(out, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)

    if verify:
        from climsim_tpu.data.synthetic import synthetic_inputs
        from climsim_tpu.grid import load_default_grid

        grid = load_default_grid()
        ref_fn = jax.jit(wrap)
        for b in buckets:
            x = synthetic_inputs(in_spec, b, grid, seed=seed)
            if "icol" in in_spec.input_slices:
                x[:, in_spec.input_slices["icol"]] = (
                    np.arange(b) % 384 + 1)[:, None]
            x = np.asarray(x, np.float32)
            got = np.asarray(W.load_aot(
                os.path.join(out, f"wrapper_b{b}.stablehlo"))(x))
            want = np.asarray(ref_fn(params, x))
            err = float(np.max(np.abs(got - want)))
            assert got.shape == (b, 368), got.shape
            assert err <= 1e-5 * max(1.0, float(np.max(np.abs(want)))), err
            print(f"verify b={b}: AOT == wrapper (max abs diff {err:.2e})")
    return meta


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--preset", required=True,
                    help="config preset (unet_v5, unet_v4, mlp_v2rh, ...)")
    ap.add_argument("--ckpt", help="save_pytree msgpack, top-K checkpoint "
                    "dir (best entry picked), or orbax dir; omitted = "
                    "fresh init (wire testing only)")
    ap.add_argument("--cls-ckpt",
                    help="classifier checkpoint -> package the two-stage "
                    "composition (v5 presets only)")
    ap.add_argument("--buckets", default="384",
                    help="comma-separated batch bucket sizes to export")
    ap.add_argument("--out", required=True, help="bundle output directory")
    ap.add_argument("--verify", action="store_true",
                    help="reload each artifact and assert it matches the "
                    "live wrapper on synthetic columns")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="K.EY=V", help="dotted config override on the "
                    "preset (e.g. model_kw.model_channels=32); repeatable")
    ap.add_argument("--cls-set", dest="cls_overrides", action="append",
                    default=[], metavar="K.EY=V",
                    help="same, applied to the classifier preset")
    args = ap.parse_args()

    buckets = [int(b) for b in args.buckets.split(",") if b]
    if not buckets or any(b <= 0 for b in buckets):
        ap.error("--buckets must be positive integers")
    meta = build_bundle(args.preset, args.ckpt, args.out, buckets,
                        cls_ckpt=args.cls_ckpt, verify=args.verify,
                        seed=args.seed, overrides=tuple(args.overrides),
                        cls_overrides=tuple(args.cls_overrides))
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
