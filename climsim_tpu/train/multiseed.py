"""Multi-seed vmapped training: K independent replicas of one baseline
trained in a single jitted step.

The TPU-native replacement for launching K SLURM jobs with different
seeds (the reference trains seed ensembles as separate processes; its
only in-process ensemble is the RPN vmap pattern,
/root/reference/baseline_models/RPN/training/rpn_model_v1_data.py:84-94).
Here ANY recipe's trainer replicates over a leading seed axis:

  * states are stacked pytrees (params, opt_state, rng, lr_scale all
    get a leading K axis),
  * one ``jax.vmap`` of the recipe's own train step advances every
    replica at once -- XLA batches the K small matmuls into bigger ones,
  * with ShardingRules the seed axis shards over the mesh ``model``
    axis, so replicas spread across chips (vmap composed with pjit),
  * per-seed ``lr_scale`` turns the same machinery into a vmapped
    learning-rate sweep (HPO trials that share an architecture train in
    ONE step -- the TPU answer to the KerasTuner worker pool for the
    dense LR/seed axes of the reference's sweeps).

Used for BASELINE configs[3]: multi-seed stochastic baselines (cVAE /
HSR / MLP), seed-spread + CRPS evaluation over the seed axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .step import TrainState


def _stack_states(states: Sequence[TrainState]) -> TrainState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@dataclass
class MultiSeedTrainer:
    """K seed replicas of one recipe trainer, advanced by vmapped steps.

    train_step/eval_step take the STACKED state and ONE shared batch
    (in_axes=(0, None, None)); predict returns (K, N, D_out).
    """

    trainers: list           # the K underlying Trainer objects
    state: TrainState        # stacked
    train_step: Callable
    eval_step: Callable
    predict: Callable
    sample: Callable | None = None

    @property
    def num_seeds(self) -> int:
        return len(self.trainers)

    def unstack_params(self, params=None):
        """Per-seed parameter pytrees (host-side convenience)."""
        params = self.state.params if params is None else params
        k = jax.tree.leaves(params)[0].shape[0]
        return [jax.tree.map(lambda a, i=i: a[i], params) for i in range(k)]


def multiseed(recipe_fn: Callable, spec, stats, sample_batch,
              seeds: Sequence[int], rules=None,
              lr_scales: Sequence[float] | None = None,
              **recipe_kw) -> MultiSeedTrainer:
    """Build K replicas of ``recipe_fn(spec, stats, sample_batch, rng, ...)``
    and fuse their training into one vmapped step.

    recipe_fn: any constructor from train.recipes (mlp_trainer,
    cvae_trainer, ...).  seeds: one PRNG seed per replica.  lr_scales:
    optional per-replica learning-rate multipliers (rides the
    TrainState.lr_scale plateau mechanism) -- a vmapped LR sweep.
    rules: optional ShardingRules; the seed axis then shards over the
    mesh ``model`` axis (params NOT replicated per chip -- each chip
    holds its own replicas, the data axis still shards batches).
    """
    if lr_scales is not None:
        assert len(lr_scales) == len(seeds), (len(lr_scales), len(seeds))
    trainers = [recipe_fn(spec, stats, sample_batch, jax.random.PRNGKey(s),
                          **recipe_kw) for s in seeds]
    state = _stack_states([t.state for t in trainers])
    if lr_scales is not None:
        state = state.replace(
            lr_scale=jnp.asarray(lr_scales, jnp.float32))
    if rules is not None:
        state = jax.device_put(state, rules.ensemble)

    t0 = trainers[0]
    assert t0.apply is not None, "recipe must expose the pure apply"
    train_v = jax.vmap(t0.train_step, in_axes=(0, None, None))
    eval_v = jax.vmap(t0.eval_step, in_axes=(0, None, None))
    pred_v = jax.vmap(t0.apply, in_axes=(0, None))
    if rules is None:
        train_step = jax.jit(train_v, donate_argnums=(0,))
        eval_step = jax.jit(eval_v)
        predict = jax.jit(pred_v)
    else:
        train_step = jax.jit(
            train_v, donate_argnums=(0,),
            in_shardings=(rules.ensemble, rules.batch, rules.batch),
            out_shardings=(rules.ensemble, rules.ensemble))
        eval_step = jax.jit(
            eval_v,
            in_shardings=(rules.ensemble, rules.batch, rules.batch),
            out_shardings=rules.ensemble)
        predict = jax.jit(
            pred_v,
            in_shardings=(rules.ensemble, rules.batch),
            out_shardings=rules.ensemble)

    sample = None
    if t0.sample is not None:
        samp_v = jax.vmap(t0.sample, in_axes=(0, None, 0, None))

        def sample(params, x, rng, n):
            rngs = jax.random.split(rng, len(seeds))
            return samp_v(params, x, rngs, n)

    ms = MultiSeedTrainer(trainers=trainers, state=state,
                          train_step=train_step, eval_step=eval_step,
                          predict=predict, sample=sample)
    if hasattr(t0, "stage2_step"):  # HSR staged MSE->NLL
        ms.stage2_step = jax.jit(
            jax.vmap(t0.stage2_step, in_axes=(0, None, None)),
            donate_argnums=(0,))
    return ms


def seed_spread(preds_k: np.ndarray):
    """Per-output seed spread diagnostics: (K, N, D) -> dict of (D,)
    arrays.  ``std`` is the across-seed std of predictions averaged over
    samples -- the seed-robustness measure the reference reports by
    training separate jobs."""
    preds_k = np.asarray(preds_k)
    mean = preds_k.mean(axis=0)
    std = preds_k.std(axis=0)
    return {
        "mean_spread": std.mean(axis=0),
        "max_spread": std.max(axis=0),
        "ensemble_mean": mean,
    }
