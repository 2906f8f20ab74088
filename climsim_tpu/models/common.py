"""Shared model building blocks (flax.linen).

TPU notes: all dense/conv compute runs in bfloat16 with float32 params and
float32 accumulation (``preferred_element_type``) -- the MXU-native policy
replacing the reference's AMP autocast (train_unet_h5loader.py metadata
``amp_gpu``).  Set ``compute_dtype=jnp.float32`` for exact-parity tests.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def out_dtype(compute_dtype) -> jnp.dtype:
    """Model-output / accumulation dtype for a given compute dtype: f32 for
    the production bf16/f32 policies, f64 when a parity test runs the model
    at compute_dtype=float64 (a hard f32 cast would silently truncate)."""
    return jnp.result_type(jnp.float32, compute_dtype)


def leaky_relu15(x):
    """LeakyReLU with the 0.15 slope used by MLP/RPN baselines."""
    return jnp.where(x > 0, x, 0.15 * x)


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "tanh": jnp.tanh,
    "leakyrelu": leaky_relu15,
}


class Dense(nn.Module):
    """Dense layer with a mixed-precision MXU policy."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        y = jax.lax.dot_general(
            x.astype(self.compute_dtype), k.astype(self.compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=out_dtype(self.compute_dtype))
        # activations stay in compute_dtype: trunk layers are HBM-bandwidth
        # bound at large batch, and bf16 activations cut that traffic in
        # half (measured ~1.6x step speedup on v5e for the MLP baseline)
        return (y + b).astype(self.compute_dtype)


class MLPTrunk(nn.Module):
    """Stack of Dense+activation (+ optional LayerNorm / dropout).

    LayerNorm/dropout ordering follows the HSR/cVAE blocks:
    relu(dropout(LN(dense(x)))) (baseline_models/HSR/training/hsr.py:22-33).
    """

    hidden: Sequence[int]
    activation: str = "relu"
    layernorm: bool = False
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = ACTIVATIONS[self.activation]
        for h in self.hidden:
            x = Dense(h, self.compute_dtype)(x)
            if self.layernorm:
                # epsilon matches torch.nn.LayerNorm's 1e-5 (the HSR/cVAE
                # reference blocks) so ported weights are forward-exact
                x = nn.LayerNorm(epsilon=1e-5,
                                 dtype=out_dtype(self.compute_dtype))(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = act(x)
        return x


class LinReluHead(nn.Module):
    """The ClimSim output head: linear block for level-resolved tendencies
    concatenated with a ReLU block for the 8 positive surface scalars
    (hpo_baseline_v1.py:124-128)."""

    lin_features: int
    relu_features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        lin = Dense(self.lin_features, self.compute_dtype,
                    name="out_linear")(x)
        rel = nn.relu(Dense(self.relu_features, self.compute_dtype,
                            name="out_relu")(x))
        return jnp.concatenate([lin, rel], axis=-1).astype(
            out_dtype(self.compute_dtype))


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
