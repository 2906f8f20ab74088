"""Deterministic encoder-decoder MLP baseline (bottleneck autoencoder-style).

Reference: baseline_models/ED/training/ClimSIM_ED_1_3_train.py:55-90 --
encoder 463-463-231-115-57-28-latent(relu), decoder mirror, final dense with
ELU; trained with Adam + MSE, step LR schedule (/5 every 7 epochs).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..varspec import VarSpec
from .common import Dense, MLPTrunk, out_dtype


class EncoderDecoder(nn.Module):
    spec: VarSpec
    intermediate: int = 463
    latent: int = 5
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        m = self.intermediate
        enc_widths = (m, m, m // 2, m // 4, m // 8, m // 16, self.latent)
        dec_widths = (m // 16, m // 8, m // 4, m // 2, m, m)
        z = MLPTrunk(enc_widths, "relu",
                     compute_dtype=self.compute_dtype, name="encoder")(
                         x, deterministic)
        h = MLPTrunk(dec_widths, "relu",
                     compute_dtype=self.compute_dtype, name="decoder")(
                         z, deterministic)
        return nn.elu(Dense(self.spec.output_len, self.compute_dtype,
                            name="out")(h)).astype(
                                out_dtype(self.compute_dtype))
