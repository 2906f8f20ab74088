"""Training losses.

Mirrors the reference's loss zoo (with citations), as pure jax functions:
  * mse/mae/huber with optional per-variable block weights
    (train_unet_h5loader.py:237-268)
  * channel-adjusted CNN losses (hpo_train.py:114-122)
  * column-energy consistency penalty (Unet_v5/training/loss_energy.py)
  * staged heteroskedastic NLL (hsr.py:128-134)
  * beta-weighted cVAE ELBO (cvae.py:187-199)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..physics import CP, LV, P0
from ..varspec import VarSpec, var_len


def block_weight_vector(spec: VarSpec, weights: dict[str, float]):
    """Expand {var or group: weight} into a per-feature vector.

    Groups: '2d' covers all surface scalars (the reference's wd_2d,
    train_unet_h5loader.py:243-252)."""
    w = np.ones(spec.output_len, dtype=np.float32)
    for v in spec.outputs:
        key = "2d" if var_len(v) == 1 else v
        if key in weights:
            w[spec.output_slices[v]] = weights[key]
        if v in weights:
            w[spec.output_slices[v]] = weights[v]
    return jnp.asarray(w)


def mse(pred, target, weight=None):
    e = (pred - target) ** 2
    return jnp.mean(e * weight if weight is not None else e)


def mae(pred, target, weight=None):
    e = jnp.abs(pred - target)
    return jnp.mean(e * weight if weight is not None else e)


def huber(pred, target, weight=None, delta: float = 1.0):
    err = pred - target
    a = jnp.abs(err)
    e = jnp.where(a <= delta, 0.5 * err**2, delta * (a - 0.5 * delta))
    return jnp.mean(e * weight if weight is not None else e)


def channel_adjusted(pred_ch, target_ch, spec: VarSpec, kind: str = "mae"):
    """CNN loss on the (B, 60, C) view: profile channels weighted by their
    share of the flat output, scalar channels by theirs
    (hpo_train.py:114-122: mean(err[...,:P])*(P*60/D) + mean(err[...,P:])*(S/D))."""
    n_prof = len(spec.output_profile_vars)
    d = spec.output_len
    err = (jnp.abs(pred_ch - target_ch) if kind == "mae"
           else (pred_ch - target_ch) ** 2)
    w_prof = n_prof * 60 / d
    w_scal = (d - n_prof * 60) / d
    return (jnp.mean(err[:, :, :n_prof]) * w_prof
            + jnp.mean(err[:, :, n_prof:]) * w_scal)


def energy_loss(pred, target, ps, hyai, hybi, out_scale, spec: VarSpec):
    """Squared mismatch of column-integrated moist static energy tendency
    between prediction and truth, computed in raw units by unscaling the
    dT/dq blocks (loss_energy.py:41-60)."""
    sl_t = spec.output_slices["ptend_t"]
    sl_q = spec.output_slices["ptend_q0001"]
    dt_p = pred[:, sl_t] / out_scale[sl_t]
    dt_t = target[:, sl_t] / out_scale[sl_t]
    dq_p = pred[:, sl_q] / out_scale[sl_q]
    dq_t = target[:, sl_q] / out_scale[sl_q]
    p_int = P0 * hyai[None, :] + hybi[None, :] * ps[:, None]
    dp = p_int[:, 1:] - p_int[:, :-1]
    e_p = CP * jnp.sum(dt_p * dp, axis=1) + LV * jnp.sum(dq_p * dp, axis=1)
    e_t = CP * jnp.sum(dt_t * dp, axis=1) + LV * jnp.sum(dq_t * dp, axis=1)
    return jnp.mean((e_p - e_t) ** 2)


def hsr_loss(mean, logprec, target, mse_stage: bool):
    """Stage 1 (first third of training): plain MSE on the mean.
    Stage 2: Gaussian NLL  prec*(y-mu)^2 - log(prec)  (hsr.py:128-134)."""
    if mse_stage:
        return jnp.mean((target - mean) ** 2)
    prec = jnp.exp(logprec)
    return jnp.mean(prec * (target - mean) ** 2 - logprec)


def cvae_loss(y_mean, y_std, kl, target, beta: float = 0.01):
    """Reference ELBO variant (cvae.py:193): note the reference divides the
    squared error by std (not std^2); semantics preserved deliberately."""
    recon = jnp.mean(0.5 * (target - y_mean) ** 2 / y_std + jnp.log(y_std))
    return recon + beta * kl


LOSS_FNS = {"mse": mse, "mae": mae, "huber": huber}


def water_loss(pred, target, ps, lhflx, hyai, hybi, out_scale,
               spec: VarSpec):
    """Column water-budget consistency penalty (companion to energy_loss;
    spec: demo_notebooks/water_conservation.ipynb -- column-integrated
    moisture tendency should equal evaporation minus precipitation).

    Penalizes the squared mismatch between prediction and truth of
      sum_species \\int dq dp / g  +  PRECC * rho_h2o  (E cancels: same
    LHFLX drives both), in kg/m^2/s.
    """
    from ..physics import GRAV, RHO_H2O

    q_vars = [v for v in ("ptend_q0001", "ptend_q0002", "ptend_q0003",
                          "ptend_qn") if v in spec.output_slices]
    p_int = P0 * hyai[None, :] + hybi[None, :] * ps[:, None]
    dp = p_int[:, 1:] - p_int[:, :-1]

    def column_water(y):
        col = 0.0
        for v in q_vars:
            sl = spec.output_slices[v]
            col = col + jnp.sum((y[:, sl] / out_scale[sl]) * dp, axis=1)
        sl_p = spec.output_slices["cam_out_PRECC"]
        precc = y[:, sl_p.start] / out_scale[sl_p.start]
        return col / GRAV + precc * RHO_H2O

    return jnp.mean((column_water(pred) - column_water(target)) ** 2)
