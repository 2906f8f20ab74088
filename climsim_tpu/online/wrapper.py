"""Coupling wrapper: raw E3SM state in -> raw tendencies out.

The reference wraps its trained torch model in an nn.Module with all pre/
post-processing inside the graph and TorchScript-exports it for the E3SM
host (online_testing/model_postprocessing/v5_nn_wrapper.ipynb, coupling
contract in online_testing/README.md section 3.1: forward (B, n_raw) ->
(B, 368) ordered ptend_t, ptend_q0001, ptend_q0002, ptend_q0003, ptend_u,
ptend_v, cam_out_*).

Here the wrapper is a pure jax function closure -- jittable, AOT-exportable
(jax.export) and shardable.  Physics fused in-graph:
  pre:  v4 (1525) -> v5 (1405) feature conversion, qn exponential transform,
        (x-sub)/div, nan/inf -> 0, qn stratosphere prune, RH clip
  post: stratosphere output zeroing, un-scaling, cloud repartitioning via
        the liquid-fraction ramp at the *advanced* temperature
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import physics
from ..data import transforms as T
from ..norms import NormStats
from ..varspec import VarSpec, get_varspec


def convert_v4_to_v5(x):
    """v4 (B, 1525) raw features -> v5 (B, 1405).

    Index map from v5_nn_wrapper.ipynb `preprocessing` (qn = qc + qi,
    liq_partition from the T ramp, prvphy/tm blocks re-packed):
      [0:120)    t, rh                  <- v4 [0:120)
      [120:180)  qn                     <- v4 q2 + q3
      [180:240)  liq_partition          <- ramp(v4 t)
      [240:840)  u..q1_prvphy (10 prof) <- v4 [240:840)
      [840:900)  qn_prvphy              <- v4 q2_prv + q3_prv
      [900:1080) u_prv, tm_t_prv, tm_q1_prv <- v4 [960:1140)
      [1080:1140) tm_qn_prv             <- v4 tm_q2_prv + tm_q3_prv
      [1140:1405) tail                  <- v4 [1260:1525)
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return xp.concatenate([
        x[:, 0:120],
        x[:, 120:180] + x[:, 180:240],
        physics.liquid_fraction(x[:, 0:60]) if xp is jnp
        else np.clip((x[:, 0:60] - 253.16) / 20.0, 0.0, 1.0),
        x[:, 240:840],
        x[:, 840:900] + x[:, 900:960],
        x[:, 960:1140],
        x[:, 1140:1200] + x[:, 1200:1260],
        x[:, 1260:1525],
    ], axis=1)


# v2 368-wide output layout offsets (coupling contract)
_OUT368 = get_varspec("v2").output_slices


@dataclass
class WrapperConfig:
    input_version: str = "v4"       # what the host sends: 'v4' | 'v5' | 'v2_rh'
    strato_lev_out: int = 15        # postprocess zeroing depth
    qn_prune_lev: int = 15          # qn input prune depth
    dt_seconds: float = physics.DT_TIMESTEP
    dtype: object = jnp.float32     # f64 for oracle-parity testing


def make_wrapper(model_apply: Callable, stats: NormStats,
                 cfg: WrapperConfig | None = None) -> Callable:
    """Build fn(params, x_raw) -> (B, 368) raw tendencies.

    model_apply(params, x_norm) must return the v5 (B, 308) normalized
    output (or (B, 368) for v2_rh-family models, passed through unscaled
    with no cloud repartition).
    """
    cfg = cfg or WrapperConfig()
    spec5 = get_varspec("v5")
    tcfg = T.TransformConfig(
        qn_transform=True, qinput_prune=True, strato_lev=cfg.qn_prune_lev,
        input_clip=True, input_clip_rhonly=True)
    in_t = T.make_input_transform(spec5, stats, tcfg, dtype=cfg.dtype)
    out_scale_inv = jnp.asarray(1.0 / stats.out_scale, cfg.dtype)
    s = cfg.strato_lev_out
    sl5 = spec5.output_slices

    post_mask = np.ones(spec5.output_len, np.float64)
    for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
        post_mask[sl5[v].start: sl5[v].start + s] = 0.0
    post_mask_j = jnp.asarray(post_mask, cfg.dtype)

    def wrapper(params, x_raw):
        x_raw = x_raw.astype(cfg.dtype)
        if cfg.input_version == "v4":
            t_before = x_raw[:, 0:60]
            qc_before = x_raw[:, 120:180]
            qi_before = x_raw[:, 180:240]
            x5 = convert_v4_to_v5(x_raw)
        else:  # host already sends v5 features; clouds arrive combined
            t_before = x_raw[:, 0:60]
            qn = x_raw[:, spec5.input_slices["state_qn"]]
            liq = x_raw[:, spec5.input_slices["liq_partition"]]
            qc_before, qi_before = liq * qn, (1 - liq) * qn
            x5 = x_raw

        y = model_apply(params, in_t(x5))           # (B, 308) normalized
        y = y * post_mask_j * out_scale_inv          # zero strat + unscale

        dqc, dqi = physics.repartition_clouds(
            t_before, qc_before, qi_before,
            y[:, sl5["ptend_t"]], y[:, sl5["ptend_qn"]], cfg.dt_seconds)

        out = jnp.concatenate([
            y[:, sl5["ptend_t"]],
            y[:, sl5["ptend_q0001"]],
            dqc,
            dqi,
            y[:, sl5["ptend_u"].start:],   # u, v, 8 scalars
        ], axis=1)
        return out

    return wrapper


# Output-zeroing depths the reference's v4/v2 coupling wrappers hardcode
# for the 368-wide layout (v4_nn_wrapper.ipynb / v2_nn_wrapper.ipynb
# postprocessing: x[:,60:75], x[:,120:148], x[:,180:195], x[:,240:255],
# x[:,300:315] -- note liquid cloud is zeroed 28 deep, matching the
# strato_lev_qc=28 those models train with).
V4_OUT_ZERO = {"ptend_q0001": 15, "ptend_q0002": 28, "ptend_q0003": 15,
               "ptend_u": 15, "ptend_v": 15}


def _out_zero_mask(spec: VarSpec, depths: dict | None, dtype):
    mask = np.ones(spec.output_len, np.float64)
    for v, n in (depths or {}).items():
        s = spec.output_slices[v].start
        mask[s: s + n] = 0.0
    return jnp.asarray(mask, dtype)


def make_v4_wrapper(model_apply: Callable, stats: NormStats,
                    spec: VarSpec | None = None,
                    tcfg: T.TransformConfig | None = None,
                    out_zero: dict | None = None,
                    dtype=jnp.float32) -> Callable:
    """v4-family coupling wrapper: the host sends the RAW v4 (B, 1525)
    feature vector, the model consumes it natively (no v5 conversion) and
    the host receives the RAW 368-wide tendencies with no cloud
    repartition (v4_nn_wrapper.ipynb NewModel: qc/qi exponential
    transform -> normalize -> nan/inf->0 -> cloud-input prune -> RH clip
    -> model -> stratosphere zeroing -> un-scale)."""
    spec = spec or get_varspec("v4")
    tcfg = tcfg or T.TransformConfig(
        qn_transform=True, qinput_prune=True, strato_lev=15,
        input_clip=True, input_clip_rhonly=True)
    in_t = T.make_input_transform(spec, stats, tcfg, dtype=dtype)
    zero = _out_zero_mask(spec, V4_OUT_ZERO if out_zero is None else out_zero,
                          dtype)
    out_scale_inv = jnp.asarray(1.0 / stats.out_scale, dtype)

    def wrapper(params, x_raw):
        y = model_apply(params, in_t(x_raw.astype(dtype)))
        return y * zero * out_scale_inv

    return wrapper


def make_v2rh_wrapper(model_apply: Callable, stats: NormStats,
                      spec: VarSpec | None = None,
                      tcfg: T.TransformConfig | None = None,
                      out_zero: dict | None = None,
                      dtype=jnp.float32) -> Callable:
    """Wrapper for v2_rh-family online models (MLP_v2rh): normalize in,
    un-scale out; output already in the 368 contract layout
    (v2_nn_wrapper.ipynb is the same flow without cloud repartitioning).

    The defaults keep the repo's online models' contract (clip-only: they
    train without the qc/qi exponential transform).  The reference's
    published v2 wrapper behavior is ``tcfg`` as in make_v4_wrapper plus
    ``out_zero=V4_OUT_ZERO`` -- parity-proven against the notebook's own
    NewModel in tests/test_wrapper_parity.py."""
    spec = spec or get_varspec("v2_rh")
    tcfg = tcfg or T.TransformConfig(input_clip=True, input_clip_rhonly=True)
    in_t = T.make_input_transform(spec, stats, tcfg, dtype=dtype)
    zero = _out_zero_mask(spec, out_zero, dtype)
    out_scale_inv = jnp.asarray(1.0 / stats.out_scale, dtype)

    def wrapper(params, x_raw):
        y = model_apply(params, in_t(x_raw.astype(dtype)))
        return y * zero * out_scale_inv

    return wrapper


def export_aot(wrapper: Callable, params, batch: int, n_features: int,
               path: str | None = None):
    """Serialize the wrapper to a portable StableHLO artifact (jax.export).

    The TPU-native analog of TorchScript .pt export (v5_nn_wrapper
    `save_wrapper`): the artifact embeds the weights and runs from C++ or
    Python without the model source.
    """
    from jax import export as jexport

    fn = jax.jit(lambda x: wrapper(params, x))
    exported = jexport.export(fn)(
        jax.ShapeDtypeStruct((batch, n_features), jnp.float32))
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_aot(path_or_blob):
    from jax import export as jexport

    blob = path_or_blob
    if isinstance(path_or_blob, str):
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return exported.call


def make_fast_mlp_wrapper(model, params, stats: NormStats,
                          spec: VarSpec | None = None,
                          weights_dtype=jnp.bfloat16) -> Callable:
    """Latency-optimized v2_rh wrapper using the Pallas fused-MLP kernel:
    the whole network runs in one kernel launch with weights resident in
    VMEM (scripts/bench_kernels.py: ~1.4x faster than the XLA path at the
    coupling batch size of 384 columns).  Weights are captured at build
    time; returns fn(x_raw) -> (B, 368)."""
    from ..ops.kernels import fused_mlp_forward, mlp_params_to_matrices

    from ..ops.kernels import fused_mlp_forward_int8, quantize_weights_int8

    spec = spec or get_varspec("v2_rh")
    in_t = T.make_input_transform(spec, stats, T.TransformConfig(
        input_clip=True, input_clip_rhonly=True))
    ws, bs = mlp_params_to_matrices(params)
    n_relu = len(spec.output_scalar_vars)
    out_scale_inv = jnp.asarray(1.0 / stats.out_scale, jnp.float32)

    if weights_dtype == "int8":
        # weight-only int8: another ~1.4x latency win at the 384-column
        # coupling batch (weight fetch dominates at small batch)
        qs, scales = quantize_weights_int8(ws)

        def wrapper(x_raw):
            y = fused_mlp_forward_int8(
                in_t(x_raw.astype(jnp.float32)), qs, scales, bs,
                relu_tail=n_relu)
            return y * out_scale_inv

        return wrapper

    ws = [w.astype(weights_dtype) for w in ws]

    def wrapper(x_raw):
        y = fused_mlp_forward(in_t(x_raw.astype(jnp.float32)), ws, bs,
                              relu_tail=n_relu)
        return y * out_scale_inv

    return wrapper
