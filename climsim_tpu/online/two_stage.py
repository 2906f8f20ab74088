"""Two-stage v5 scheme: 3-class cloud classifier gating the qn tendency.

The reference trains a classifier U-Net predicting a per-level 3-class
condensate regime alongside the regression U-Net
(climsim_unet_classifier.py, train_unet_h5loader_classifier.py:306-311;
label thresholds threshold_class1/2 = 1e-9/1e-11,
conf/config_single.yaml:63-64, climsim_datapip_classifier_h5.py:118-122):

  class 0: the qn tendency is zero          -> emit exactly 0
  class 1: the cloud fully evaporates       -> emit dqn = -qn/1200
           (drives qn to exactly zero over the coupling step)
  class 2: regular condensate evolution     -> emit the regressor's dqn

This removes both spurious drizzle (class 0) and lingering sub-threshold
cloud (class 1) that the regressor would otherwise leak into the host
model.

Here the composition is one fused function: both networks run on the same
normalized input, the gate is applied to the normalized qn block before
the wrapper's unscale/repartition postprocess, so the whole two-stage
scheme exports as a single StableHLO artifact via
online.wrapper.make_wrapper.  The class-1 evaporation tendency needs the
raw qn, which is recovered in-graph by inverting the exponential transform
and normalization (stats required).
"""

from __future__ import annotations

from typing import Callable

import jax.nn
import jax.numpy as jnp

from ..varspec import get_varspec


def make_two_stage_apply(regressor_apply: Callable,
                         classifier_apply: Callable,
                         stats=None, dt: float = 1200.0) -> Callable:
    """Compose fn((reg_params, cls_params), x_norm) -> gated (B, 308).

    regressor_apply(params, x) -> (B, 308); classifier_apply(params, x) ->
    (B, 60, 3) class logits.  With ``stats`` (NormStats carrying lbd_qn and
    the v5 input normalization), class 1 emits the exact-evaporation
    tendency; without stats, class 1 falls back to zero (class-0
    behavior) -- fine for tests, wrong for coupling.
    """
    spec5 = get_varspec("v5")
    sl_out = spec5.output_slices["ptend_qn"]
    sl_in = spec5.input_slices["state_qn"]

    if stats is not None:
        qn_sub = jnp.asarray(stats.inp_sub[sl_in], jnp.float32)
        qn_div = jnp.asarray(stats.inp_div[sl_in], jnp.float32)
        lbd = jnp.asarray(stats.lbd_qn, jnp.float32)
        out_scale_qn = jnp.asarray(stats.out_scale[sl_out], jnp.float32)

    def apply(params, x_norm):
        reg_params, cls_params = params
        y = regressor_apply(reg_params, x_norm)
        logits = classifier_apply(cls_params, x_norm)
        cls = jnp.argmax(logits, axis=-1)  # (B, 60) in {0, 1, 2}
        dqn = y[:, sl_out]
        if stats is not None:
            # invert normalize + exponential transform: qn_raw =
            # -ln(1 - (x*div + sub)) / lbd  (pruned levels read 0 -> 0)
            xq = x_norm[:, sl_in] * qn_div + qn_sub
            qn_raw = -jnp.log(jnp.clip(1.0 - xq, 1e-12, 1.0)) / \
                jnp.maximum(lbd, 1e-12)
            evap = (-qn_raw / dt) * out_scale_qn  # normalized tendency
        else:
            evap = jnp.zeros_like(dqn)
        gated = jnp.where(cls == 2, dqn,
                          jnp.where(cls == 1, evap, 0.0))
        return y.at[:, sl_out].set(gated)

    return apply
