"""Two-stage v5 scheme: cloud classifier gating the regression tendencies.

The reference trains a classifier U-Net predicting per-level cloud
occurrence alongside the regression U-Net (climsim_unet_classifier.py,
train_unet_h5loader_classifier*.py) and gates the qn tendency with it at
coupling time (thresholds ``threshold_class1/2`` in conf/config_single.yaml):
levels the classifier calls cloud-free emit exactly zero condensate
tendency, removing spurious drizzle the regressor would otherwise leak.

Here the composition is one fused function: both networks run on the same
normalized input, the gate is applied to the normalized qn block before the
wrapper's unscale/repartition postprocess, so the whole two-stage scheme
exports as a single StableHLO artifact via online.wrapper.make_wrapper.
"""

from __future__ import annotations

from typing import Callable

import jax.nn
import jax.numpy as jnp

from ..varspec import get_varspec


def make_two_stage_apply(regressor_apply: Callable,
                         classifier_apply: Callable,
                         threshold: float = 0.5) -> Callable:
    """Compose fn((reg_params, cls_params), x_norm) -> gated (B, 308).

    regressor_apply(params, x) -> (B, 308); classifier_apply(params, x) ->
    (B, 60) logits.  Gate: qn tendency zeroed where sigmoid(logit) < thr.
    """
    spec5 = get_varspec("v5")
    sl_qn = spec5.output_slices["ptend_qn"]

    def apply(params, x_norm):
        reg_params, cls_params = params
        y = regressor_apply(reg_params, x_norm)
        prob = jax.nn.sigmoid(classifier_apply(cls_params, x_norm))
        gated = jnp.where(prob >= threshold, y[:, sl_qn], 0.0)
        return y.at[:, sl_qn].set(gated)

    return apply
