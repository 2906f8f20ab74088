"""Heteroskedastic regression baseline: MLE estimates of per-output mean and
log-precision via two regularized MLPs.

Reference: baseline_models/HSR/training/hsr.py:14-81 -- each MLP is
layers x [dense -> LayerNorm -> dropout -> relu] + final dense; sampling is
mu + eps * prec^-0.5.  Training stages the loss: MSE on the mean for the
first third of epochs, then the Gaussian NLL  prec*(y-mu)^2 - log(prec)
(hsr.py:128-134); implemented in train.losses.hsr_loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..varspec import VarSpec
from .common import Dense, MLPTrunk, out_dtype


class HSR(nn.Module):
    spec: VarSpec
    hidden: int = 1024
    layers: int = 4
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kw = dict(hidden=(self.hidden,) * self.layers, activation="relu",
                  layernorm=True, dropout=self.dropout,
                  compute_dtype=self.compute_dtype)
        hm = MLPTrunk(**kw, name="mean_trunk")(x, deterministic)
        mean = Dense(self.spec.output_len, self.compute_dtype,
                     name="mean_out")(hm).astype(
                         out_dtype(self.compute_dtype))
        hp = MLPTrunk(**kw, name="logprec_trunk")(x, deterministic)
        logprec = Dense(self.spec.output_len, self.compute_dtype,
                        name="logprec_out")(hp).astype(
                            out_dtype(self.compute_dtype))
        return mean, logprec

    def sample(self, variables, x, rng, num_samples: int = 1):
        """Draw stochastic predictions: (B, D_out, S)."""
        mean, logprec = self.apply(variables, x, deterministic=True)
        sigma = jnp.exp(-0.5 * logprec)
        eps = jax.random.normal(rng, mean.shape + (num_samples,),
                                dtype=mean.dtype)
        return mean[..., None] + sigma[..., None] * eps
