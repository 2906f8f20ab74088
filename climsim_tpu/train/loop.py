"""Epoch-driven training loop.

Host-side orchestration around the jitted step: epoch iteration, validation,
all-reduced val loss (free under pjit -- metrics come back replicated),
plateau LR control, top-K checkpointing, CSV-style history logging.
Replaces train_unet_h5loader.py:355-508 and the Keras callback stack.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import numpy as np

from .checkpoints import TopKCheckpointer
from .step import TrainState


@dataclass
class PlateauController:
    """ReduceLROnPlateau: scale lr_scale by `factor` after `patience` epochs
    without val improvement (torch scheduler family used by online configs)."""

    patience: int = 3
    factor: float = 0.5
    min_scale: float = 1e-3
    best: float = np.inf
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, val_loss: float) -> float:
        if val_loss < self.best - 1e-12:
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


@dataclass
class EarlyStopping:
    """Keras-style early stopping (step2_retrain.py:258-261, patience 8)."""

    patience: int = 8
    best: float = np.inf
    bad_epochs: int = 0

    def should_stop(self, val_loss: float) -> bool:
        if val_loss < self.best - 1e-12:
            self.best = val_loss
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience


@dataclass
class History:
    rows: list = field(default_factory=list)

    def log(self, **kw):
        self.rows.append(kw)

    def save_csv(self, path: str):
        if not self.rows:
            return
        keys = list(self.rows[0])
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for r in self.rows:
                f.write(",".join(str(r.get(k, "")) for k in keys) + "\n")


def run_epoch(train_step, state: TrainState, loader, log_every: int = 0,
              callback=None):
    """One epoch; returns (state, mean_loss, samples_per_sec)."""
    losses = []
    n_samples = 0
    t0 = time.perf_counter()
    for i, (xb, yb) in enumerate(loader):
        state, metrics = train_step(state, xb, yb)
        losses.append(metrics["loss"])
        n_samples += xb.shape[0]
        if log_every and (i + 1) % log_every == 0 and callback:
            callback(i, float(jax.device_get(metrics["loss"])))
    if losses:
        # host transfer of the last loss forces the full chain
        # (block_until_ready can return early on remote-attached TPUs)
        float(jax.device_get(losses[-1]))
    dt = time.perf_counter() - t0
    mean_loss = float(np.mean([float(jax.device_get(x)) for x in losses]))
    return state, mean_loss, n_samples / max(dt, 1e-9)


def evaluate(eval_step, params, loader):
    chunked = hasattr(loader, "steps_per_chunk")
    losses, weights = [], []
    for xb, yb in loader:
        if chunked:  # (K, B, D) superbatch -> flat (K*B, D) eval batch
            xb = xb.reshape(-1, xb.shape[-1])
            yb = yb.reshape(-1, yb.shape[-1])
        m = eval_step(params, xb, yb)
        losses.append(float(jax.device_get(m["loss"])))
        weights.append(xb.shape[0])
    return float(np.average(losses, weights=weights)) if losses else np.nan


def fit(train_step, eval_step, state: TrainState, train_loader, val_loader,
        epochs: int, ckpt: TopKCheckpointer | None = None,
        plateau: PlateauController | None = None,
        early: EarlyStopping | None = None, verbose: bool = True,
        history: History | None = None, fused: bool = True,
        timed_ckpt=None):
    """Generic fit covering the reference trainers' control flow.

    When the train loader supports it (DeviceResidentLoader), each epoch
    runs as ONE fused lax.scan dispatch (permutation + gather + step;
    bit-identical to the per-step loop) -- per-epoch host work
    (validation, plateau LR, checkpointing, early stop) is unchanged.
    Pass fused=False to force the per-step path.
    """
    history = history if history is not None else History()
    runner = (train_loader.make_epoch_runner(train_step)
              if fused and hasattr(train_loader, "make_epoch_runner")
              else None)
    # ChunkedLoader yields (K, B, D) superbatches -- they MUST go through
    # the chunk runner, never the per-batch step (fused or not)
    chunk_run = (train_loader.make_chunk_runner(train_step)
                 if hasattr(train_loader, "make_chunk_runner") else None)
    for epoch in range(epochs):
        if chunk_run is not None:
            t0 = time.perf_counter()
            losses, n = [], 0
            for xc, yc in train_loader:
                state, m = chunk_run(state, xc, yc)
                losses.append(m["loss"])
                n += xc.shape[0] * xc.shape[1]
            train_loss = float(np.mean(
                [float(jax.device_get(l)) for l in losses]))
            sps = n / max(time.perf_counter() - t0, 1e-9)
        elif runner is not None:
            t0 = time.perf_counter()
            state, m = runner(state, 1)
            train_loss = float(jax.device_get(m["loss"][0]))
            n = train_loader.steps_per_epoch * train_loader.batch_size
            sps = n / max(time.perf_counter() - t0, 1e-9)
        else:
            state, train_loss, sps = run_epoch(train_step, state,
                                               train_loader)
        val_loss = (evaluate(eval_step, state.params, val_loader)
                    if val_loader is not None else np.nan)
        if plateau is not None and np.isfinite(val_loss):
            scale = plateau.update(val_loss)
            state = state.replace(
                lr_scale=jax.numpy.asarray(scale, jax.numpy.float32))
        if ckpt is not None and np.isfinite(val_loss):
            ckpt.maybe_save(val_loss, int(state.step), state.params)
            ckpt.save_last(int(state.step), state.params)
        if timed_ckpt is not None:
            # wall-clock periodic save (reference: every 1200 s during
            # training, hsr.py:120-121); epoch boundaries are the
            # checkable granularity here
            timed_ckpt.maybe_save(state.params)
        history.log(epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                    samples_per_sec=sps)
        if verbose:
            print(f"epoch {epoch}: train {train_loss:.5f} "
                  f"val {val_loss:.5f} ({sps:,.0f} samples/s)")
        if early is not None and np.isfinite(val_loss) and \
                early.should_stop(val_loss):
            break
    return state, history
