"""Randomized-prior-network ensemble baseline.

Reference: baseline_models/RPN/training/rpn_model_v1_data.py:42-163 --
each member is (trainable MLP + frozen randomly-initialized prior MLP),
summed at the output; layers [in, 768, 640, 512, 640, 640, out] with
leaky-relu(0.15); the whole 32-member ensemble trains as one vmapped Adam
program, each member on its own bootstrap batches.

TPU design: the member axis composes with the mesh -- vmap for the member
program and a ``model``-axis sharding on the stacked parameter pytree, so
members spread over chips while each member's matmuls stay MXU-shaped.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..varspec import VarSpec
from .common import Dense, MLPTrunk, out_dtype


class RPNNet(nn.Module):
    spec: VarSpec
    hidden: Sequence[int] = (768, 640, 512, 640, 640)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = MLPTrunk(self.hidden, "leakyrelu",
                     compute_dtype=self.compute_dtype)(x, deterministic)
        return Dense(self.spec.output_len, self.compute_dtype,
                     name="out")(h).astype(
                         out_dtype(self.compute_dtype))


class RPNEnsemble:
    """Functional ensemble wrapper: stacked-params pytrees + vmapped apply."""

    def __init__(self, spec: VarSpec, ensemble_size: int = 32,
                 hidden: Sequence[int] = (768, 640, 512, 640, 640),
                 compute_dtype=jnp.bfloat16):
        self.net = RPNNet(spec, tuple(hidden), compute_dtype)
        self.ensemble_size = ensemble_size
        self.spec = spec

    def init(self, rng, sample_x):
        """Returns (params, prior_params), each stacked over a leading
        member axis (rpn_model_v1_data.py:84-94)."""
        k1, k2 = jax.random.split(rng)
        keys1 = jax.random.split(k1, self.ensemble_size)
        keys2 = jax.random.split(k2, self.ensemble_size)
        init_one = lambda k: self.net.init(k, sample_x)
        params = jax.vmap(init_one)(keys1)
        prior = jax.vmap(init_one)(keys2)
        return params, prior

    def member_forward(self, params_m, prior_m, x):
        """One member's prediction: trainable + frozen prior
        (rpn_model_v1_data.py:101-103)."""
        return (self.net.apply(params_m, x)
                + self.net.apply(prior_m, x))

    def forward(self, params, prior, x):
        """All members on member-specific batches: x (E, B, D) -> (E, B, O)."""
        return jax.vmap(self.member_forward)(params, prior, x)

    def posterior(self, params, prior, x):
        """All members on a shared batch: x (B, D) -> samples (B, O, E)."""
        preds = jax.vmap(self.member_forward, in_axes=(0, 0, None))(
            params, prior, x)  # (E, B, O)
        return jnp.moveaxis(preds, 0, -1)
