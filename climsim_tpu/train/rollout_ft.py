"""Differentiable multi-step rollout fine-tuning for coupled emulators.

The standard stabilization for autoregressive emulators: after supervised
1-step training, fine-tune on a K-step rollout loss so the model learns to
damp (rather than amplify) its own feedback errors.  The reference cannot
do this -- its host model is an external Fortran/C++ E3SM build coupled
through TorchScript (online_testing/README.md section 5), so gradients
stop at the coupling boundary.  Here the whole hybrid loop is one JAX
program (`online.driver.HybridDriver.rollout`, a `lax.scan`), so the
rollout loss differentiates through host dynamics, feature assembly,
wrapper constraints, and K emulator applications end to end, and XLA
compiles the K-step forward+backward into a single TPU executable.

Loss: per-variable level-normalized MSE between the hybrid and reference
trajectories (t, q1, qn, u) over the K steps, from a batch of on-attractor
initial states.  Matches the online criterion it optimizes for
(online_testing/evaluation/monthly-online-rmse-visualization.ipynb:
weighted state RMSE vs the reference run).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

_FT_KEYS = ("t", "q1", "qn", "u")


def trajectory_stds(traj: dict) -> dict:
    """Per-level std of each fine-tune variable over a reference
    trajectory dict ((steps, cols, 60) arrays) -- the loss normalizer."""
    return {k: np.asarray(traj[k]).reshape(-1, traj[k].shape[-1])
            .std(axis=0).astype(np.float32) + 1e-12 for k in _FT_KEYS}


def make_rollout_loss(hybrid_driver, reference_driver, k_steps: int,
                      stds: dict, reference_params=None) -> Callable:
    """Build loss_fn(params, state0) -> scalar.

    ``state0`` is a ColumnState batch of initial conditions; both drivers
    roll it forward ``k_steps`` and the level-normalized trajectory MSE is
    averaged over the fine-tune variables.  The reference branch does not
    depend on ``params``, so its gradient contribution is exactly zero --
    no stop_gradient needed.
    """
    w = {k: jnp.asarray(1.0 / stds[k]) for k in _FT_KEYS}

    def loss_fn(params, state0, start_step=0):
        """``start_step`` (traced) is the absolute forcing step the IC was
        sampled at: with a diurnal host forcing the K-step window must
        replay the solar phase the state actually lives at, or the
        fine-tune only ever optimizes the phase-0 slice of the dynamics."""
        _, h = hybrid_driver.rollout(params, state0, k_steps,
                                     start_step=start_step)
        _, r = reference_driver.rollout(reference_params, state0, k_steps,
                                        start_step=start_step)
        terms = [(((h[k] - r[k]) * w[k]) ** 2).mean() for k in _FT_KEYS]
        return sum(terms) / len(terms)

    return loss_fn


def make_finetune_step(hybrid_driver, reference_driver, k_steps: int,
                       stds: dict, learning_rate=1e-4, total_steps=300,
                       clip: float = 1.0, reference_params=None):
    """Returns (step_fn, opt_state_init).

    step_fn(params, opt_state, state0) -> (params, opt_state, loss) is a
    single jitted fine-tune update: K-step differentiable rollout loss,
    global-norm clip, AdamW on a cosine-annealed schedule.
    """
    loss_fn = make_rollout_loss(hybrid_driver, reference_driver, k_steps,
                                stds, reference_params)
    sched = optax.cosine_decay_schedule(learning_rate, max(total_steps, 1))
    opt = optax.chain(optax.clip_by_global_norm(clip), optax.adamw(sched))

    @jax.jit
    def step_fn(params, opt_state, state0, start_step=0):
        loss, grads = jax.value_and_grad(loss_fn)(params, state0,
                                                  start_step)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step_fn, opt.init
