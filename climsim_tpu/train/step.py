"""Jitted, mesh-sharded train/eval steps.

The TPU replacement for the reference's DDP + CUDA-graph capture path
(train_unet_h5loader.py:194-206,330-346): one ``jax.jit`` with explicit
shardings -- batch over the mesh ``data`` axis, parameters replicated --
compiles the forward, backward, gradient all-reduce (XLA emits a psum over
ICI) and optimizer update into a single fused executable.  Buffer donation
keeps params/opt-state in place (the in-graph equivalent of CUDA graphs'
fixed memory pools).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import ShardingRules


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    lr_scale: jnp.ndarray  # host-controlled multiplier (plateau scheduler)


def create_train_state(params, optimizer, rng, rules: ShardingRules | None):
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        lr_scale=jnp.ones((), jnp.float32),
    )
    if rules is not None:
        state = jax.device_put(state, rules.replicated)
    return state


def make_train_step(loss_fn: Callable, optimizer,
                    rules: ShardingRules | None = None):
    """loss_fn(params, rng, xb, yb) -> (scalar loss, aux dict).

    Returns step(state, xb, yb) -> (state, metrics).
    """

    def _step(state: TrainState, xb, yb):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, sub, xb, yb)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        # plateau LR control scales the *updates*: scaling gradients would
        # be a no-op under Adam (its update is invariant to gradient scale)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1, rng=rng)
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    if rules is None:
        return jax.jit(_step, donate_argnums=(0,))
    return jax.jit(
        _step,
        donate_argnums=(0,),
        in_shardings=(rules.replicated, rules.batch, rules.batch),
        out_shardings=(rules.replicated, rules.replicated),
    )


def make_eval_step(loss_fn: Callable, rules: ShardingRules | None = None):
    def _eval(params, xb, yb):
        loss, aux = loss_fn(params, None, xb, yb)
        return {"loss": loss, **aux}

    if rules is None:
        return jax.jit(_eval)
    return jax.jit(
        _eval,
        in_shardings=(rules.replicated, rules.batch, rules.batch),
        out_shardings=rules.replicated,
    )


def make_predict_fn(apply_fn: Callable, rules: ShardingRules | None = None,
                    batch_size: int | None = None):
    """Batched full-split inference returning host numpy."""
    if rules is None:
        jitted = jax.jit(apply_fn)
    else:
        jitted = jax.jit(apply_fn,
                         in_shardings=(rules.replicated, rules.batch),
                         out_shardings=rules.batch)

    def predict(params, inputs, bs: int | None = batch_size):
        import numpy as np

        bs = bs or inputs.shape[0]
        outs = []
        for s in range(0, inputs.shape[0], bs):
            xb = inputs[s:s + bs]
            pad = 0
            if xb.shape[0] < bs and rules is not None:
                pad = bs - xb.shape[0]
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)], axis=0)
            y = np.asarray(jitted(params, xb))
            outs.append(y[:y.shape[0] - pad] if pad else y)
        return np.concatenate(outs, axis=0)

    return predict


@dataclass
class CompiledStepInfo:
    """FLOP/memory accounting via XLA cost analysis -- the TPU equivalent of
    the reference's fvcore FlopCountAnalysis (HSR/training/hpo.py:30-35)."""

    flops_per_step: float
    bytes_accessed: float

    @classmethod
    def from_lowered(cls, jitted_fn, *args) -> "CompiledStepInfo":
        compiled = jitted_fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return cls(flops_per_step=float(ca.get("flops", 0.0)),
                   bytes_accessed=float(ca.get("bytes accessed", 0.0)))
