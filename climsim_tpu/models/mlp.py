"""MLP emulators.

* ``ClimSimMLP`` -- the NeurIPS'23 offline MLP baseline family: a dense
  trunk, a pre-head dense+activation, and the linear/relu split output head
  (reference: baseline_models/MLP/training/HPO/baseline_v1/
  hpo_baseline_v1.py:64-137).  The best-trial retrained architecture used
  hidden widths like [768, 640, 512, 640, 640].
* ``OnlineMLP`` -- the coupling-grade plain MLP (MLP_v2rh): dense stack with
  in-graph ReLU on the trailing scalar outputs and optional stratosphere
  output pruning (online_testing/baseline_models/MLP_v2rh/training/
  mlp.py:24-68).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..varspec import VarSpec, var_len
from .common import (ACTIVATIONS, Dense, LinReluHead, MLPTrunk,
                     out_dtype)


def _head_split(spec: VarSpec) -> tuple[int, int]:
    """(#linear, #relu) features: level-resolved blocks are linear, surface
    scalars are non-negative -> relu.  Requires profile-before-scalar output
    layout, true for every ClimSim varspec."""
    lin = sum(var_len(v) for v in spec.output_profile_vars)
    rel = sum(var_len(v) for v in spec.output_scalar_vars)
    return lin, rel


class ClimSimMLP(nn.Module):
    spec: VarSpec
    hidden: Sequence[int] = (768, 640, 512, 640, 640)
    activation: str = "relu"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        lin, rel = _head_split(self.spec)
        act = ACTIVATIONS[self.activation]
        h = MLPTrunk(self.hidden, self.activation,
                     compute_dtype=self.compute_dtype)(x, deterministic)
        # pre-head dense at full output width + activation
        # (hpo_baseline_v1.py:115-122)
        h = act(Dense(lin + rel, self.compute_dtype, name="prehead")(h))
        return LinReluHead(lin, rel, self.compute_dtype)(h)


class OnlineMLP(nn.Module):
    """Plain MLP with relu-clamped surface scalars and optional output
    stratosphere pruning fused into the graph."""

    spec: VarSpec
    hidden: Sequence[int] = (1024, 1024, 1024, 1024)
    activation: str = "relu"
    output_prune: bool = False
    strato_lev_out: int = 12
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        lin, rel = _head_split(self.spec)
        h = MLPTrunk(self.hidden, self.activation,
                     compute_dtype=self.compute_dtype)(x, deterministic)
        y = Dense(lin + rel, self.compute_dtype, name="out")(h)
        y = jnp.concatenate([y[:, :lin], nn.relu(y[:, lin:])],
                            axis=-1).astype(out_dtype(self.compute_dtype))
        if self.output_prune:
            import numpy as np

            mask = np.ones(self.spec.output_len, np.float32)
            for v in self.spec.output_profile_vars:
                if v == "ptend_t":
                    continue
                s = self.spec.output_slices[v].start
                mask[s:s + self.strato_lev_out] = 0.0
            y = y * jnp.asarray(mask)
        return y
