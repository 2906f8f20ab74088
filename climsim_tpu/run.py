"""Experiment runner: config -> data -> trainer -> fit -> offline score.

CLI:  python -m climsim_tpu.run --preset mlp_v1 [k.ey=value ...]
      python -m climsim_tpu.run --config exp.json
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from .config import PRESETS, ExperimentConfig
from .data.pipeline import BatchLoader, BootstrapLoader
from .data.synthetic import synthetic_split
from .grid import load_default_grid
from .norms import (compute_norms_from_data, identity_norms,
                    load_asset_norms)
from .parallel.mesh import ShardingRules, distributed_init_if_needed, make_mesh
from .train import recipes
from .train.checkpoints import TopKCheckpointer
from .train.loop import EarlyStopping, History, PlateauController, fit
from .varspec import get_varspec


def load_data(cfg: ExperimentConfig, grid):
    spec = get_varspec(cfg.data.varspec)
    if cfg.data.source == "synthetic":
        x, y = synthetic_split(spec, cfg.data.num_synthetic, grid,
                               cfg.data.seed)
        if "icol" in spec.inputs:
            x[:, spec.input_slices["icol"]] = (
                np.arange(x.shape[0]) % grid.ncol + 1)[:, None]
    else:
        x = np.load(cfg.data.input_path, mmap_mode="r")
        y = np.load(cfg.data.target_path, mmap_mode="r")
    if cfg.data.norms == "asset":
        stats = load_asset_norms(cfg.data.varspec)
    elif cfg.data.norms == "compute":
        stats = compute_norms_from_data(spec, np.asarray(x), np.asarray(y),
                                        qn_transform=cfg.transform.qn_transform)
    else:
        stats = identity_norms(spec)
    return spec, x, y, stats


def build_trainer(cfg: ExperimentConfig, spec, stats, sample, rng, rules,
                  steps_per_epoch, grid, verbose=True):
    common = dict(rules=rules, steps_per_epoch=steps_per_epoch,
                  cfg=cfg.transform)
    t = cfg.train
    if verbose and cfg.model in ("mlp", "mlp_v2", "ed", "cnn") \
            and t.lr != 1e-3:
        # these recipes pin the papers' published LR schedules (cyclic
        # triangular for the MLPs, Adam 1e-4 with /5-every-7-epochs for
        # ED, the CNN's fixed Adam) -- train.lr does not apply to them
        print(f"note: {cfg.model!r} uses its published reference LR "
              f"schedule; train.lr={t.lr:g} is ignored")
    if cfg.model == "mlp":
        return recipes.mlp_trainer(spec, stats, sample, rng,
                                   **cfg.model_kw, **common)
    if cfg.model == "mlp_v2":
        return recipes.mlp_v2_trainer(spec, stats, sample, rng,
                                      **cfg.model_kw, **common)
    if cfg.model == "ed":
        return recipes.ed_trainer(spec, stats, sample, rng, **common)
    if cfg.model == "cnn":
        return recipes.cnn_trainer(spec, stats, sample, rng,
                                   loss_kind=t.loss, **cfg.model_kw,
                                   **common)
    if cfg.model == "hsr":
        return recipes.hsr_trainer(spec, stats, sample, rng, lr=t.lr,
                                   **cfg.model_kw, **common)
    if cfg.model == "cvae":
        return recipes.cvae_trainer(spec, stats, sample, rng, lr=t.lr,
                                    **cfg.model_kw, **common)
    if cfg.model == "mlp_online":
        return recipes.online_mlp_trainer(
            spec, stats, sample, rng, loss_kind=t.loss,
            block_weights=t.block_weights or None,
            energy_weight=t.energy_weight, grid=grid, lr=t.lr,
            **cfg.model_kw, **common)
    if cfg.model == "unet":
        return recipes.unet_trainer(
            spec, stats, sample, rng, model_kw=cfg.model_kw,
            loss_kind=t.loss, block_weights=t.block_weights or None,
            energy_weight=t.energy_weight, grid=grid, lr=t.lr,
            schedule_name=t.schedule, total_epochs=t.epochs, **common)
    if cfg.model == "unet_classifier":
        return recipes.unet_classifier_trainer(
            spec, stats, sample, rng, model_kw=cfg.model_kw, lr=t.lr,
            **common)
    raise ValueError(f"unknown model {cfg.model!r} "
                     "(rpn uses climsim_tpu.train.rpn_recipe directly)")


def write_manifest(cfg: ExperimentConfig, directory: str) -> None:
    """Reproducibility manifest next to the checkpoints: full config,
    library versions, backend/device kind, git SHA if available."""
    import json
    import subprocess
    import time

    import flax
    import optax

    info = {
        "config": json.loads(cfg.to_json()),
        "time": time.strftime("%Y-%m-%d %H:%M:%S %Z"),
        "jax": jax.__version__,
        "flax": flax.__version__,
        "optax": optax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    try:
        info["git_sha"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=5).stdout.strip() or None
    except Exception:
        info["git_sha"] = None
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "run_manifest.json"), "w") as f:
        json.dump(info, f, indent=2)


def run_experiment(cfg: ExperimentConfig, verbose: bool = True):
    # deep-copy first: this function mutates cfg (batch clamp below), and
    # callers commonly pass shared PRESETS entries -- without the copy a
    # clamped batch_size would leak into every later run in the process
    cfg = cfg.override()
    if cfg.train.restart_path and (
            cfg.model == "rpn" or cfg.train.seeds or cfg.train.elastic):
        raise ValueError(
            "train.restart_path is only supported on the single-model "
            "fit() path; the rpn/multi-seed/elastic branches would "
            "silently train from scratch")
    distributed_init_if_needed()
    grid = load_default_grid()
    spec, x, y, stats = load_data(cfg, grid)
    if cfg.train.checkpoint_dir:
        write_manifest(cfg, cfg.train.checkpoint_dir)

    n_dev = cfg.train.num_data_shards or len(jax.devices())
    rules = None
    if n_dev > 1:
        rules = ShardingRules(make_mesh(num_data=n_dev,
                                        devices=jax.devices()[:n_dev]))

    n = x.shape[0]
    if cfg.data.val_fraction > 0:
        # hold out at least one full eval batch when the data allows it,
        # but never more than half the rows (a preset batch_size larger
        # than a small demo dataset used to swallow the whole train split,
        # yielding zero training batches)
        n_val = min(max(int(n * cfg.data.val_fraction), 1,
                        cfg.data.batch_size), n // 2)
    else:
        n_val = 0
    if cfg.data.batch_size > n - n_val:
        clamped = max((n - n_val) // n_dev * n_dev, n_dev)
        if verbose:
            print(f"batch_size {cfg.data.batch_size} exceeds the "
                  f"{n - n_val}-row train split; clamping to {clamped}")
        cfg.data.batch_size = clamped
    x_tr, y_tr = x[: n - n_val], y[: n - n_val]
    x_val, y_val = x[n - n_val:], y[n - n_val:]

    steps = max(x_tr.shape[0] // cfg.data.batch_size, 1)
    rng = jax.random.PRNGKey(cfg.seed)

    if cfg.model == "rpn":
        # full-featured RPN loop: per-epoch ensemble-mean validation loss,
        # History, top-K checkpointing (params+prior), early stop --
        # the same control flow every other model gets from fit()
        from .train.rpn_recipe import rpn_trainer

        tr = rpn_trainer(spec, stats, x_tr, rng, cfg=cfg.transform,
                         **cfg.model_kw)
        loader = BootstrapLoader(
            np.asarray(x_tr), np.asarray(y_tr), cfg.data.batch_size,
            cfg.model_kw.get("ensemble_size", 32), steps_per_epoch=steps,
            seed=cfg.data.seed)
        ckpt = (TopKCheckpointer(cfg.train.checkpoint_dir, cfg.train.top_k)
                if cfg.train.checkpoint_dir else None)
        early = (EarlyStopping(cfg.train.early_stop_patience)
                 if cfg.train.early_stop_patience else None)
        history = History()
        params, opt_state = tr.params, tr.opt_state
        import time as _time
        for epoch in range(cfg.train.epochs):
            losses, n_seen = [], 0
            t0 = _time.perf_counter()
            for xb, yb in loader:
                params, opt_state, l = tr.train_step(
                    params, opt_state, tr.prior, xb, yb)
                losses.append(l)
                # data rows per step (xb is (E, B, D); counting E*B would
                # inflate the rate 32x vs every other path's accounting)
                n_seen += xb.shape[1]
            train_loss = float(np.mean(
                [np.mean(np.asarray(l)) for l in losses]))
            sps = n_seen / max(_time.perf_counter() - t0, 1e-9)
            val_loss = np.nan
            if n_val:
                vls = []
                for s in range(0, x_val.shape[0], cfg.data.batch_size):
                    vb = slice(s, s + cfg.data.batch_size)
                    vls.append(np.mean(np.asarray(tr.eval_losses(
                        params, tr.prior, np.asarray(x_val[vb]),
                        np.asarray(y_val[vb])))))
                val_loss = float(np.mean(vls))
            history.log(epoch=epoch, train_loss=train_loss,
                        val_loss=val_loss, samples_per_sec=sps)
            if ckpt is not None and np.isfinite(val_loss):
                tree = {"params": params, "prior": tr.prior}
                ckpt.maybe_save(val_loss, epoch, tree)
                ckpt.save_last(epoch, tree)
            if verbose:
                print(f"epoch {epoch}: train {train_loss:.5f} "
                      f"val {val_loss:.5f} ({sps:,.0f} samples/s)")
            if early is not None and np.isfinite(val_loss) and \
                    early.should_stop(val_loss):
                break
        return dict(trainer=tr, params=params, stats=stats, spec=spec,
                    history=history, grid=grid)

    if cfg.train.seeds:
        # multi-seed vmapped run: K replicas advance in one jitted step
        # (train/multiseed.py).  Mirrors fit()'s control flow: per-seed
        # val losses, HSR staged-loss switch, plateau LR on the mean val
        # loss (composed with per-seed lr_scales), early stop, stacked
        # checkpoints.  A single-element seeds list still takes this
        # path, so train.seeds/lr_scales are always honored.
        import jax.numpy as jnp

        from .train.multiseed import multiseed

        sample = (np.asarray(x_tr[:4]), np.asarray(y_tr[:4]))
        base_scales = np.asarray(
            list(cfg.train.lr_scales) or [1.0] * len(cfg.train.seeds),
            np.float32)
        ms = multiseed(
            # inner trainers unsharded: multiseed lays out the STACKED
            # state (seed axis over mesh model, replicated over data)
            lambda sp, st, sa, r: build_trainer(cfg, sp, st, sa, r,
                                                None, steps, grid,
                                                verbose=verbose),
            spec, stats, sample, list(cfg.train.seeds),
            rules=rules, lr_scales=base_scales.tolist())
        loader = BatchLoader(x_tr, y_tr, cfg.data.batch_size, rules,
                             seed=cfg.data.seed)
        ckpt = (TopKCheckpointer(cfg.train.checkpoint_dir, cfg.train.top_k)
                if cfg.train.checkpoint_dir else None)
        plateau = (PlateauController(cfg.train.plateau_patience)
                   if cfg.train.plateau_patience else None)
        early = (EarlyStopping(cfg.train.early_stop_patience)
                 if cfg.train.early_stop_patience else None)
        stage1 = (cfg.train.epochs // 3
                  if cfg.model == "hsr" and cfg.train.epochs >= 3 else None)
        history = History()
        state = ms.state
        for epoch in range(cfg.train.epochs):
            step_fn = (ms.stage2_step
                       if stage1 is not None and epoch >= stage1
                       else ms.train_step)
            tls = []
            for xb, yb in loader:
                state, m = step_fn(state, xb, yb)
                tls.append(np.asarray(jax.device_get(m["loss"])))
            if not tls:
                raise ValueError(
                    "no training batches: fewer train rows "
                    f"({x_tr.shape[0]}) than batch_size "
                    f"({cfg.data.batch_size})")
            train_losses = np.mean(tls, axis=0)
            val_losses = np.full(ms.num_seeds, np.nan)
            if n_val:
                vls = []
                for s in range(0, x_val.shape[0] - cfg.data.batch_size + 1,
                               cfg.data.batch_size):
                    vb = slice(s, s + cfg.data.batch_size)
                    xv, yv = np.asarray(x_val[vb]), np.asarray(y_val[vb])
                    if rules is not None:
                        xv, yv = rules.shard_batch(xv, yv)
                    vls.append(np.asarray(jax.device_get(ms.eval_step(
                        state.params, xv, yv)["loss"])))
                val_losses = np.mean(vls, axis=0)
            mean_val = float(np.nanmean(val_losses))
            if plateau is not None and np.isfinite(mean_val):
                scale = plateau.update(mean_val)
                state = state.replace(
                    lr_scale=jnp.asarray(base_scales * scale))
            history.log(epoch=epoch,
                        train_loss=float(train_losses.mean()),
                        val_loss=mean_val)
            if ckpt is not None and np.all(np.isfinite(val_losses)):
                ckpt.maybe_save(float(val_losses.mean()), epoch,
                                state.params)
                ckpt.save_last(epoch, state.params)
            if verbose:
                per = ", ".join(f"{s}:{v:.5f}" for s, v in
                                zip(cfg.train.seeds, val_losses))
                print(f"epoch {epoch}: train {train_losses.mean():.5f} "
                      f"val per-seed [{per}]")
            if early is not None and np.isfinite(mean_val) and \
                    early.should_stop(mean_val):
                break
        return dict(trainer=ms, state=state, history=history, stats=stats,
                    spec=spec, grid=grid)

    if cfg.train.elastic:
        # in-flight elastic run: device loss mid-training rebuilds the
        # mesh from survivors and resumes from the epoch-boundary
        # snapshot (train/elastic.py).  Ensemble paths have elastic
        # support at the library level -- elastic_rpn_fit reshards the
        # RPN member axis, and multiseed trainers run through plain
        # elastic_fit (test_elastic.py) -- but this CLI branch wires
        # only the single-model recipes; HSR's staged MSE->NLL loss
        # needs a stage switch inside the epoch loop and stays on the
        # fit() path.
        from .train.elastic import elastic_fit

        if cfg.model == "hsr":
            raise ValueError("train.elastic does not support HSR's "
                             "staged loss; use the fit() path")
        sample = (np.asarray(x_tr[:4]), np.asarray(y_tr[:4]))

        def trainer_factory(r):
            return build_trainer(cfg, spec, stats, sample, rng, r, steps,
                                 grid, verbose=verbose)

        def loader_factory(r):
            tl = BatchLoader(x_tr, y_tr, cfg.data.batch_size, r,
                             seed=cfg.data.seed)
            vl = (BatchLoader(x_val, y_val, cfg.data.batch_size, r,
                              shuffle=False) if n_val else None)
            return tl, vl

        checkpointer = None
        if cfg.train.checkpoint_dir:
            from .train.checkpoints import OrbaxCheckpointer

            checkpointer = OrbaxCheckpointer(
                os.path.join(cfg.train.checkpoint_dir, "elastic"))
        state, report = elastic_fit(
            trainer_factory, loader_factory, cfg.train.epochs,
            num_model=1, checkpointer=checkpointer, verbose=verbose)
        history = History()
        # epoch_losses covers only epochs run in THIS process (a
        # checkpointer resume starts later) -- number rows accordingly
        start = report.epochs_completed - len(report.epoch_losses)
        for i, (tl, vl) in enumerate(zip(report.epoch_losses,
                                         report.val_losses)):
            history.log(epoch=start + i, train_loss=tl, val_loss=vl)
        return dict(trainer=None, state=state, history=history,
                    stats=stats, spec=spec, grid=grid, report=report)

    tr = build_trainer(cfg, spec, stats, (np.asarray(x_tr[:4]),
                                          np.asarray(y_tr[:4])), rng,
                       rules, steps, grid, verbose=verbose)

    if cfg.train.restart_path:
        # weights-only warm restart, optimizer state fresh (the
        # reference's restart_path, train_unet_h5loader.py:177-189)
        import jax.numpy as jnp

        from .train.checkpoints import load_pytree

        p = cfg.train.restart_path
        if os.path.isdir(p):
            last = os.path.join(p, "last.msgpack")
            if os.path.exists(last):
                loaded = load_pytree(last, tr.state.params)
            else:
                loaded = TopKCheckpointer(p).load_best(tr.state.params)
                if loaded is None:
                    raise ValueError(f"no checkpoints in {p}")
        else:
            loaded = load_pytree(p, tr.state.params)
        tr.state = tr.state.replace(
            params=jax.tree.map(jnp.asarray, loaded))
        if verbose:
            print(f"warm restart: loaded weights from {p}")

    # loader selection: HBM residency is the fast path when the split fits
    # (~60% of one chip's HBM leaves room for activations); fall back to
    # the prefetching host loader otherwise
    use_device = cfg.data.loader == "device" or (
        cfg.data.loader == "auto"
        and jax.default_backend() == "tpu"
        and (x_tr.nbytes + y_tr.nbytes) < 9e9)
    if use_device:
        from .data.pipeline import DeviceResidentLoader

        train_loader = DeviceResidentLoader(
            np.asarray(x_tr), np.asarray(y_tr), cfg.data.batch_size,
            rules, seed=cfg.data.seed,
            block_shuffle=cfg.data.block_shuffle or None)
        val_loader = (DeviceResidentLoader(
            np.asarray(x_val), np.asarray(y_val), cfg.data.batch_size,
            rules, shuffle=False) if n_val else None)
    else:
        train_loader = BatchLoader(x_tr, y_tr, cfg.data.batch_size, rules,
                                   seed=cfg.data.seed)
        val_loader = (BatchLoader(x_val, y_val, cfg.data.batch_size, rules,
                                  shuffle=False) if n_val else None)
    ckpt = (TopKCheckpointer(cfg.train.checkpoint_dir, cfg.train.top_k)
            if cfg.train.checkpoint_dir else None)
    timed = None
    if cfg.train.timed_interval > 0:
        if not cfg.train.checkpoint_dir:
            raise ValueError(
                "train.timed_interval needs train.checkpoint_dir -- "
                "periodic saves have nowhere to go")
        from .train.checkpoints import TimedCheckpointer

        timed = TimedCheckpointer(
            os.path.join(cfg.train.checkpoint_dir, "timed.msgpack"),
            cfg.train.timed_interval)
    plateau = (PlateauController(cfg.train.plateau_patience)
               if cfg.train.plateau_patience else None)
    early = (EarlyStopping(cfg.train.early_stop_patience)
             if cfg.train.early_stop_patience else None)
    if cfg.model == "hsr" and cfg.train.epochs >= 3:
        # staged loss: MSE for the first third, NLL after (hsr.py:128-134)
        stage1 = cfg.train.epochs // 3
        state, history = fit(tr.train_step, tr.eval_step, tr.state,
                             train_loader, val_loader, stage1,
                             ckpt=ckpt, plateau=plateau, early=early,
                             verbose=verbose, timed_ckpt=timed)
        state, history2 = fit(tr.stage2_step, tr.eval_step, state,
                              train_loader, val_loader,
                              cfg.train.epochs - stage1, ckpt=ckpt,
                              plateau=plateau, early=early,
                              verbose=verbose, timed_ckpt=timed)
        history.rows.extend(history2.rows)
    else:
        state, history = fit(tr.train_step, tr.eval_step, tr.state,
                             train_loader, val_loader, cfg.train.epochs,
                             ckpt=ckpt, plateau=plateau, early=early,
                             verbose=verbose, timed_ckpt=timed)
    return dict(trainer=tr, state=state, history=history, stats=stats,
                spec=spec, grid=grid)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS))
    ap.add_argument("--config", help="path to ExperimentConfig json")
    ap.add_argument("overrides", nargs="*", help="dotted key=value")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)
    if args.config:
        import json

        with open(args.config) as f:
            d = json.load(f)
        # accept both a bare ExperimentConfig json and the
        # run_manifest.json written next to every checkpointed run --
        # `--config ckpts/run_manifest.json` reproduces that run
        cfg = ExperimentConfig.from_dict(d.get("config", d))
    elif args.preset:
        cfg = PRESETS[args.preset]
    else:
        ap.error("need --preset or --config")
    if args.overrides:
        cfg = cfg.override(*args.overrides)
    return run_experiment(cfg, verbose=not args.quiet)


if __name__ == "__main__":
    main()
