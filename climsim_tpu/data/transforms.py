"""Jitted input/output feature transforms.

The reference performs these per-sample on CPU dataloader workers
(climsim_datapip.py / climsim_datapip_h5.py / the v5 wrapper preprocessing);
here they are batched, jit-compiled array ops that run on-device and fuse
with the first layer of the model -- the TPU-native replacement for torch
DataLoader worker processes.

Semantics mirrored (with citations):
  * qn exponential transform       climsim_datapip.py:102
  * (x - sub) / div, nan/inf -> 0  climsim_datapip.py:103-106
  * y * out_scale                  climsim_datapip.py:108
  * decouple_cloud                 climsim_datapip.py:109-112
  * aggressive_pruning             climsim_datapip.py:114-135
  * qinput_prune / tinput prune    climsim_datapip.py:136-143
  * input_clip (rh / dyn / phy)    climsim_datapip.py:145-151
  * output_prune                   climsim_datapip.py:154-158
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..norms import NormStats
from ..varspec import NUM_LEVELS, VarSpec, var_len

# variable groups used by pruning/clipping rules
_DYN_VARS = ("state_t_dyn", "state_q0_dyn", "state_u_dyn",
             "tm_state_t_dyn", "tm_state_q0_dyn", "tm_state_u_dyn")
_PHY_VARS = ("state_t_prvphy", "state_q0001_prvphy", "state_q0002_prvphy",
             "state_q0003_prvphy", "state_qn_prvphy", "state_u_prvphy",
             "tm_state_t_prvphy", "tm_state_q0001_prvphy",
             "tm_state_q0002_prvphy", "tm_state_q0003_prvphy",
             "tm_state_qn_prvphy", "tm_state_u_prvphy")
_Q_LIKE = ("state_rh", "state_qn", "state_q0001_prvphy", "state_qn_prvphy",
           "tm_state_q0001_prvphy", "tm_state_qn_prvphy",
           "state_q0002_prvphy", "state_q0003_prvphy",
           "tm_state_q0002_prvphy", "tm_state_q0003_prvphy")


@dataclass(frozen=True)
class TransformConfig:
    """Static switches; part of the jit cache key."""

    qn_transform: bool = False        # cloud exponential transform
    qinput_prune: bool = False
    output_prune: bool = False
    strato_lev: int = 15
    strato_lev_out: int = 12
    strato_lev_qinput: int = -1       # <0 -> use strato_lev
    strato_lev_tinput: int = 0
    decouple_cloud: bool = False
    aggressive_pruning: bool = False
    input_clip: bool = False
    input_clip_rhonly: bool = False
    # which level-resolved outputs get their stratosphere zeroed
    output_prune_vars: tuple[str, ...] = (
        "ptend_q0001", "ptend_qn", "ptend_q0002", "ptend_q0003",
        "ptend_u", "ptend_v")


def v5_online_config() -> TransformConfig:
    """The switches the shipped v5 online model was trained with
    (Unet_v5/training/conf/config_single.yaml + v5_nn_wrapper.ipynb)."""
    return TransformConfig(
        qn_transform=True, qinput_prune=True, output_prune=True,
        strato_lev=15, strato_lev_out=15, input_clip=True,
        input_clip_rhonly=True,
        output_prune_vars=("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"),
    )


def _zero_mask(spec: VarSpec, cfg: TransformConfig) -> np.ndarray:
    """Precompute a static 0/1 mask implementing all input pruning rules."""
    mask = np.ones(spec.input_len, dtype=np.float32)
    sl = spec.input_slices
    s_q = cfg.strato_lev_qinput if cfg.strato_lev_qinput >= 0 else cfg.strato_lev

    def zero(name, n):
        if name in sl and n > 0:
            mask[sl[name].start: sl[name].start + n] = 0.0

    if cfg.decouple_cloud:
        for v in ("state_qn", "state_qn_prvphy", "tm_state_qn_prvphy"):
            zero(v, NUM_LEVELS)
    if cfg.aggressive_pruning:
        # every state/dyn/prvphy profile except temperature and
        # liq_partition loses its stratosphere; q-like blocks use the
        # (deeper) q prune depth.  Trace gases are deliberately NOT pruned
        # -- their signal lives in the stratosphere
        # (climsim_datapip.py:114-135 stops at tm_state_u_prvphy).
        for v in spec.input_profile_vars:
            if v in ("state_t", "liq_partition", "pbuf_ozone", "pbuf_CH4",
                     "pbuf_N2O"):
                continue
            zero(v, s_q if v in _Q_LIKE else cfg.strato_lev)
        if "cam_in_SNOWHICE" in sl:
            mask[sl["cam_in_SNOWHICE"]] = 0.0
    elif cfg.qinput_prune:
        zero("state_qn", cfg.strato_lev)        # v5 datapip:139
        # v4/v2 family prunes the separate cloud species instead
        # (Unet_v4/training/climsim_datapip.py:121-123)
        zero("state_q0002", cfg.strato_lev)
        zero("state_q0003", cfg.strato_lev)
        zero("state_q0001", 0)  # water vapour is never input-pruned
    if cfg.strato_lev_tinput > 0:
        zero("state_t", cfg.strato_lev_tinput)
    return mask


def _clip_bounds(spec: VarSpec, cfg: TransformConfig):
    """Static per-feature clip bounds (lo, hi) as numpy vectors."""
    # f64 so the bounds stay exact when the transform runs widened for
    # oracle parity (1.2 rounds to the same float32 either way)
    lo = np.full(spec.input_len, -np.inf, dtype=np.float64)
    hi = np.full(spec.input_len, np.inf, dtype=np.float64)
    sl = spec.input_slices
    if "state_rh" in sl:
        lo[sl["state_rh"]], hi[sl["state_rh"]] = 0.0, 1.2
    if not cfg.input_clip_rhonly:
        for v in _DYN_VARS:
            if v in sl:
                lo[sl[v]], hi[sl[v]] = -0.5, 0.5
        for v in _PHY_VARS:
            if v in sl:
                lo[sl[v]], hi[sl[v]] = -3.0, 3.0
    return lo, hi


def make_input_transform(spec: VarSpec, stats: NormStats,
                         cfg: TransformConfig | None = None,
                         dtype=jnp.float32):
    """Build a jit-friendly fn raw (B, D_in) -> normalized (B, D_in).

    All branching resolves at trace time; the returned callable is pure
    elementwise math (multiply/add/clip) that XLA fuses into one pass.
    ``qn_transform`` covers BOTH cloud layouts: the combined-qn rate on v5
    specs (climsim_datapip.py:102) and the separate qc/qi rates on
    v4/v2-family specs (Unet_v4/training/climsim_datapip.py:80-81),
    whichever the spec/stats provide.  ``dtype`` widens the whole pipeline
    (f64 for oracle-parity tests); production stays float32.
    """
    cfg = cfg or TransformConfig()
    sub = jnp.asarray(stats.inp_sub, dtype=dtype)
    div_inv = jnp.asarray(1.0 / stats.inp_div, dtype=dtype)
    mask = jnp.asarray(_zero_mask(spec, cfg), dtype=dtype)
    lo_np, hi_np = _clip_bounds(spec, cfg)
    do_clip = cfg.input_clip and (np.isfinite(lo_np).any()
                                  or np.isfinite(hi_np).any())
    lo, hi = jnp.asarray(lo_np, dtype=dtype), jnp.asarray(hi_np, dtype=dtype)

    cloud_rates = []                 # [(slice, (60,) lambda), ...]
    if cfg.qn_transform:
        for name, rate in (("state_qn", stats.lbd_qn),
                           ("state_q0002", stats.lbd_qc),
                           ("state_q0003", stats.lbd_qi)):
            sl = spec.input_slices.get(name)
            if sl is None:
                continue
            if rate is None:
                # fail loud: silently skipping the transform would deploy
                # preprocessing the model was never trained on (the exact
                # failure mode the coupling parity tests exist to prevent)
                raise ValueError(
                    f"qn_transform requested but stats carry no lambda for "
                    f"{name!r} (spec {spec.name!r}); supply NormStats with "
                    "the trained lbd vector or turn the transform off")
            cloud_rates.append((sl, jnp.asarray(rate, dtype=dtype)))

    def transform(x):
        x = jnp.asarray(x, dtype=dtype)
        for sl, lbd in cloud_rates:
            x = x.at[:, sl].set(1.0 - jnp.exp(-x[:, sl] * lbd))
        x = (x - sub) * div_inv
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        x = x * mask
        if do_clip:
            x = jnp.clip(x, lo, hi)
        return x

    return transform


def make_target_transform(spec: VarSpec, stats: NormStats,
                          cfg: TransformConfig | None = None):
    """raw targets (B, D_out) -> normalized training targets."""
    cfg = cfg or TransformConfig()
    scale = jnp.asarray(stats.out_scale, dtype=jnp.float32)
    mask = np.ones(spec.output_len, dtype=np.float32)
    if cfg.output_prune:
        for v in cfg.output_prune_vars:
            if v in spec.output_slices:
                s = spec.output_slices[v].start
                mask[s: s + cfg.strato_lev_out] = 0.0
    maskj = jnp.asarray(mask)

    def transform(y):
        y = y.astype(jnp.float32) * scale
        y = jnp.where(jnp.isfinite(y), y, 0.0)
        return y * maskj

    return transform


# --- channelized (profile-as-channel) views for CNN / U-Net ---------------
def channelize_input(x, spec: VarSpec):
    """(B, D_in) -> (B, 60, C) with scalars broadcast over levels.

    Generalizes data_utils.reshape_input_for_cnn (data_utils.py:1692-1712)
    to every varspec: profile vars in registry order, then scalars.
    """
    parts = []
    for v in spec.inputs:
        sl = spec.input_slices[v]
        if var_len(v) == NUM_LEVELS:
            parts.append(x[:, sl])
        else:
            parts.append(jnp.broadcast_to(
                x[:, sl], (x.shape[0], NUM_LEVELS)))
    return jnp.stack(parts, axis=-1)


def dechannelize_output(y_ch, spec: VarSpec):
    """(B, 60, C_out) -> (B, D_out): profile channels flatten, scalar
    channels level-mean (data_utils.reshape_target_from_cnn :1740-1757)."""
    parts = []
    c = 0
    for v in spec.outputs:
        if var_len(v) == NUM_LEVELS:
            parts.append(y_ch[:, :, c])
        else:
            parts.append(jnp.mean(y_ch[:, :, c], axis=1, keepdims=True))
        c += 1
    return jnp.concatenate(parts, axis=1)


def channelize_target(y, spec: VarSpec):
    """(B, D_out) -> (B, 60, C_out), scalars broadcast (for CNN training
    targets; data_utils.reshape_target_for_cnn :1714-1738)."""
    parts = []
    for v in spec.outputs:
        sl = spec.output_slices[v]
        if var_len(v) == NUM_LEVELS:
            parts.append(y[:, sl])
        else:
            parts.append(jnp.broadcast_to(y[:, sl], (y.shape[0], NUM_LEVELS)))
    return jnp.stack(parts, axis=-1)


# --- feature subsetting (MLP_v2 UTLS variant) ------------------------------
def utls_feature_indices(spec: VarSpec, utls_vars=("pbuf_ozone", "pbuf_CH4",
                                                   "pbuf_N2O"),
                         lo: int = 5, hi: int = 21) -> np.ndarray:
    """Indices keeping only UTLS levels [lo, hi) of the trace-gas profiles.

    The MLP_v2 baseline truncates ozone/CH4/N2O to levels 5-21 where their
    variance is non-negligible (hpo_baseline_v2.py:169-177); v2: 557 -> 425.
    """
    keep = []
    for v in spec.inputs:
        sl = spec.input_slices[v]
        if v in utls_vars:
            keep.extend(range(sl.start + lo, sl.start + hi))
        else:
            keep.extend(range(sl.start, sl.stop))
    return np.asarray(keep, dtype=np.int64)


def make_subset_transform(indices: np.ndarray):
    idx = jnp.asarray(indices)

    def transform(x):
        out = x[:, idx]
        # the barrier stops XLA:CPU from fusing this gather into a following
        # bf16 matmul's backward pass, which hits an unimplemented DotThunk
        # ("BF16 x BF16 = F32") in the current CPU thunk runtime; on TPU it
        # only pins a tiny copy, which XLA schedules for free
        return jax.lax.optimization_barrier(out)

    return transform
