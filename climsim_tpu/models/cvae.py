"""Conditional VAE baseline.

Reference: baseline_models/cVAE/training/cvae.py --
  encoder [y, x] -> hidden stack -> (mu, log-std), z = mu + sigma*eps
  decoder [z, x] -> hidden stack -> (mean, std=exp(dense))
  loss = mean(0.5*(y-mean)^2/std + log(std)) + beta * KL  (cvae.py:193)
  KL = mean(sigma^2 + mu^2 - log(sigma) - 1/2)            (cvae.py:47)
Sampling draws z from the standard-normal prior and adds output noise
(cvae.py:127-151).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..varspec import VarSpec
from .common import Dense, MLPTrunk, out_dtype


class CVAE(nn.Module):
    spec: VarSpec
    latent: int = 8
    hidden: int = 512
    layers: int = 2
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        kw = dict(hidden=(self.hidden,) * self.layers, activation="relu",
                  layernorm=True, dropout=self.dropout,
                  compute_dtype=self.compute_dtype)
        self.enc_trunk = MLPTrunk(**kw, name="enc_trunk")
        self.enc_mean = Dense(self.latent, self.compute_dtype)
        self.enc_logstd = Dense(self.latent, self.compute_dtype)
        self.dec_trunk = MLPTrunk(**kw, name="dec_trunk")
        self.dec_mean = Dense(self.spec.output_len, self.compute_dtype)
        self.dec_logstd = Dense(self.spec.output_len, self.compute_dtype)

    def encode(self, y, x):
        h = self.enc_trunk(jnp.concatenate([y, x], axis=-1))
        dt = out_dtype(self.compute_dtype)
        return self.enc_mean(h).astype(dt), self.enc_logstd(h).astype(dt)

    def decode(self, z, x):
        h = self.dec_trunk(jnp.concatenate([z, x], axis=-1))
        dt = out_dtype(self.compute_dtype)
        return (self.dec_mean(h).astype(dt),
                jnp.exp(self.dec_logstd(h).astype(dt)))

    def __call__(self, y, x, rng=None, deterministic: bool = True):
        """Training pass: returns (y_mean, y_std, kl)."""
        mu, logstd = self.encode(y, x)
        sigma = jnp.exp(logstd)
        if rng is None:
            z = mu
        else:
            z = mu + sigma * jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        kl = jnp.mean(sigma**2 + mu**2 - logstd - 0.5)
        y_mean, y_std = self.decode(z, x)
        return y_mean, y_std, kl

    def sample(self, variables, x, rng, num_samples: int = 1,
               random: bool = True):
        """Prior-conditional samples: (B, D_out, S)."""
        def one(r):
            rz, ry = jax.random.split(r)
            z = (jax.random.normal(rz, (x.shape[0], self.latent))
                 if random else jnp.zeros((x.shape[0], self.latent)))
            mean, std = self.apply(variables, z, x, method=CVAE.decode)
            if random:
                return mean + std * jax.random.normal(ry, mean.shape)
            return mean
        rngs = jax.random.split(rng, num_samples)
        return jnp.stack([one(r) for r in rngs], axis=-1)
