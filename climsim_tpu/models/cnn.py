"""ResNet-style 1D CNN over the 60-level vertical column.

Reference: baseline_models/CNN/training/hpo_train.py:124-236 -- 12 residual
blocks of two same-padded k=3 Conv1D layers (406 channels, relu, dropout
0.175) with a 1x1-conv projected residual, then a 1x1 conv head (ELU) and
the linear(2-ch)/relu(8-ch) per-level output split.  Input (B, 60, C_in)
channelized view, output (B, 60, C_out).

TPU notes: NWC layout 1D convs lower to MXU matmuls; channels (406) are
near 3*128 so the contraction dims tile well.  Dropout is static-shape.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..varspec import VarSpec
from .common import ACTIVATIONS, out_dtype


class Conv1d(nn.Module):
    features: int
    kernel: int = 3
    compute_dtype: jnp.dtype = jnp.bfloat16
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel,), padding="SAME",
                    dtype=self.compute_dtype, param_dtype=jnp.float32,
                    bias_init=nn.initializers.constant(
                        self.bias_init_value))(x)
        return y.astype(out_dtype(self.compute_dtype))


class ResBlock(nn.Module):
    features: int
    kernel: int = 3
    dropout: float = 0.175
    activation: str = "relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = ACTIVATIONS[self.activation]
        h = Conv1d(self.features, self.kernel, self.compute_dtype)(x)
        h = act(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv1d(self.features, self.kernel, self.compute_dtype)(h)
        h = act(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        res = Conv1d(self.features, 1, self.compute_dtype)(x)
        return h + res


class ClimSimCNN(nn.Module):
    """Input/output are channelized views (see data.transforms.channelize)."""

    spec: VarSpec
    depth: int = 12
    channels: int = 406
    kernel: int = 3
    dropout: float = 0.175
    activation: str = "relu"
    # "softplus" (default, deliberate delta -- see head comment below) or
    # "relu" (reference-exact, hpo_train.py:197; used by the weight-port
    # parity test in tests/test_model_parity.py)
    scalar_head: str = "softplus"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_ch, deterministic: bool = True):
        # x_ch: (B, 60, C_in)
        h = x_ch
        for _ in range(self.depth):
            h = ResBlock(self.channels, self.kernel, self.dropout,
                         self.activation, self.compute_dtype)(
                             h, deterministic)
        n_prof = len(self.spec.output_profile_vars)
        n_scal = len(self.spec.output_scalar_vars)
        h = nn.elu(Conv1d(n_prof + n_scal, 1, self.compute_dtype)(h))
        lin = Conv1d(n_prof, 1, self.compute_dtype)(h)
        # Positivity head: the reference uses relu (hpo_train.py:211), but a
        # relu output unit whose pre-activation goes negative on every
        # sample receives zero gradient forever.  Empirically 1-2 of the 8
        # scalar channels died this way per init seed (R2 ~ -15 on exactly
        # the unlucky channels, SOLSD/SOLLD in the 40-epoch synthetic run),
        # and a positive bias init alone did not prevent mid-training death.
        # softplus is the smooth positive surrogate (relu is its beta->inf
        # limit): same output range, never zero-gradient.  Deliberate,
        # documented deviation from the reference head.
        if self.scalar_head == "relu":
            rel = nn.relu(Conv1d(n_scal, 1, self.compute_dtype)(h))
        else:
            rel = nn.softplus(Conv1d(n_scal, 1, self.compute_dtype,
                                     bias_init_value=0.5)(h))
        return jnp.concatenate([lin, rel], axis=-1)  # (B, 60, C_out)
