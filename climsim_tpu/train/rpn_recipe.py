"""RPN ensemble training: the whole ensemble as one vmapped program.

Reference pattern: rpn_model_v1_data.py:114-144 -- vmapped Adam step over 32
members, each member on its own bootstrap batch; exponential-decay LR 5e-4 /
0.99 per 1000 steps; frozen randomized priors added at the output.

TPU composition: vmap supplies the member program; the stacked parameter
pytree is sharded over the mesh (data x model axes flattened) so members
spread across chips while batches stay local -- ensemble parallelism with
zero inter-member communication.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..data import transforms as T
from ..models.rpn import RPNEnsemble
from ..norms import NormStats
from ..varspec import VarSpec
from . import schedules


@dataclass
class RPNTrainer:
    ensemble: RPNEnsemble
    params: Any
    prior: Any
    opt_state: Any
    train_step: Callable
    posterior: Callable   # (params, prior, x_raw) -> (B, O, E) samples
    input_transform: Callable
    eval_losses: Callable | None = None  # (params, prior, xb, yb) -> (E,)


def rpn_trainer(spec: VarSpec, stats: NormStats, sample_x, rng,
                ensemble_size: int = 32,
                hidden=(768, 640, 512, 640, 640),
                init_lr: float = 5e-4, decay_steps: int = 1000,
                decay_rate: float = 0.99,
                cfg: T.TransformConfig | None = None,
                ens_sharding=None) -> RPNTrainer:
    in_t = T.make_input_transform(spec, stats, cfg)
    tgt_t = T.make_target_transform(spec, stats, cfg)

    ens = RPNEnsemble(spec, ensemble_size, hidden)
    params, prior = ens.init(rng, in_t(jnp.asarray(sample_x[:2])))
    sched = schedules.exponential(init_lr, decay_steps, decay_rate)
    opt = optax.adam(sched)
    opt_state = jax.vmap(opt.init)(params)

    if ens_sharding is not None:
        params = jax.device_put(params, ens_sharding)
        prior = jax.device_put(prior, ens_sharding)
        opt_state = jax.device_put(opt_state, ens_sharding)

    def member_loss(p_m, prior_m, xb, yb):
        pred = ens.member_forward(p_m, prior_m, in_t(xb))
        return jnp.mean((tgt_t(yb) - pred) ** 2)

    def member_step(p_m, o_m, prior_m, xb, yb):
        loss, g = jax.value_and_grad(member_loss)(p_m, prior_m, xb, yb)
        updates, o_m = opt.update(g, o_m, p_m)
        return optax.apply_updates(p_m, updates), o_m, loss

    @jax.jit
    def train_step(params, opt_state, prior, xb, yb):
        """xb/yb: (E, B, D) member-specific bootstrap batches."""
        params, opt_state, losses = jax.vmap(member_step)(
            params, opt_state, prior, xb, yb)
        return params, opt_state, losses

    @jax.jit
    def posterior(params, prior, x_raw):
        return ens.posterior(params, prior, in_t(x_raw))

    @jax.jit
    def eval_losses(params, prior, xb, yb):
        """Per-member loss on one SHARED validation batch (B, D)."""
        return jax.vmap(member_loss, in_axes=(0, 0, None, None))(
            params, prior, xb, yb)

    return RPNTrainer(ensemble=ens, params=params, prior=prior,
                      opt_state=opt_state, train_step=train_step,
                      posterior=posterior, input_transform=in_t,
                      eval_losses=eval_losses)
