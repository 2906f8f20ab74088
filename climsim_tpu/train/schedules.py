"""Learning-rate schedules (optax schedule functions).

Covers every schedule family the reference uses:
  * cyclical triangular with halving amplitude (tfa CyclicalLearningRate,
    scale_fn 1/2^(cycle-1): hpo_baseline_v1.py:106-113)
  * step decay (/5 every 7 epochs: ED ClimSIM_ED_1_3_train.py:96-121)
  * cosine + warmup wrappers (torch_warmup_lr.py:11-90, config scheduler
    trees in conf/config_single.yaml)
  * reduce-on-plateau lives in the training loop (host-side controller) via
    an injectable LR multiplier.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclic_triangular2(init_lr: float, max_lr: float, step_size: int):
    """Triangular cyclic LR whose amplitude halves every cycle."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + step / (2.0 * step_size))
        x = jnp.abs(step / step_size - 2.0 * cycle + 1.0)
        scale = 1.0 / (2.0 ** (cycle - 1.0))
        return init_lr + (max_lr - init_lr) * jnp.maximum(0.0, 1.0 - x) * scale

    return schedule


def step_decay(init_lr: float, steps_per_drop: int, factor: float = 0.2):
    def schedule(step):
        k = jnp.floor(jnp.asarray(step, jnp.float32) / steps_per_drop)
        return init_lr * (factor ** k)

    return schedule


def warmup_then(base_schedule, warmup_steps: int, init_fraction: float = 0.0,
                mode: str = "linear"):
    """Wrap any schedule with a linear/cosine/constant warmup prefix."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        target = base_schedule(jnp.maximum(step - warmup_steps, 0))
        if mode == "linear":
            frac = init_fraction + (1 - init_fraction) * (
                step / jnp.maximum(warmup_steps, 1))
        elif mode == "cos":
            frac = init_fraction + (1 - init_fraction) * 0.5 * (
                1 - jnp.cos(jnp.pi * step / jnp.maximum(warmup_steps, 1)))
        else:  # constant
            frac = jnp.asarray(init_fraction, jnp.float32)
        return jnp.where(step < warmup_steps, target * frac, target)

    return schedule


def cosine(init_lr: float, decay_steps: int, alpha: float = 0.0):
    return optax.cosine_decay_schedule(init_lr, decay_steps, alpha)


def constant(lr: float):
    return optax.constant_schedule(lr)


def exponential(init_lr: float, decay_steps: int, decay_rate: float):
    """RPN's exponential decay (rpn_model_v1_data.py:87)."""
    return optax.exponential_decay(init_lr, decay_steps, decay_rate)


def build(name: str, steps_per_epoch: int, **kw):
    """Config-driven factory used by train.loop."""
    if name == "cyclic":
        return cyclic_triangular2(
            kw.get("init_lr", 2.5e-4), kw.get("max_lr", 2.5e-3),
            kw.get("step_size", 2 * steps_per_epoch))
    if name == "step":
        return step_decay(kw.get("init_lr", 1e-4),
                          kw.get("epochs_per_drop", 7) * steps_per_epoch,
                          kw.get("factor", 0.2))
    if name == "cosine":
        return cosine(kw.get("init_lr", 1e-3),
                      kw.get("decay_epochs", 30) * steps_per_epoch,
                      kw.get("alpha", 0.0))
    if name == "exponential":
        return exponential(kw.get("init_lr", 5e-4),
                           kw.get("decay_steps", 1000),
                           kw.get("decay_rate", 0.99))
    if name == "constant":
        return constant(kw.get("init_lr", 1e-3))
    raise ValueError(f"unknown schedule {name!r}")
