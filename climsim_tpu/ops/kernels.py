"""Pallas TPU kernels for the framework's hot elementwise chains.

Three kernels, each replacing a chain of HBM-bandwidth-bound ops with a
single VMEM pass (XLA fuses much of this already; these kernels guarantee
the fusion, keep per-feature constant vectors resident in VMEM across batch
tiles, and give explicit control of tile shapes):

  * fused_input_transform -- the v5 online preprocessing chain
    (qn exp-transform -> normalize -> nan/inf cleanup -> prune mask -> clip),
    reference semantics climsim_datapip.py:101-151
  * fused_constraint_head -- the wrapper postprocess: unscale + stratosphere
    zeroing + temperature-ramp cloud repartitioning emitting the 368-wide
    coupling contract (v5_nn_wrapper.ipynb forward/postprocessing)
  * fused_mlp -- whole-network MLP forward with every weight resident in
    VMEM, one kernel launch per batch tile: the low-latency path for online
    coupling inference where the host calls with a few hundred columns

All kernels run in interpret mode off-TPU so the same code path is tested
on CPU CI (tests/conftest.py forces the CPU backend).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_features(a, multiple=LANE, value=0.0):
    d = a.shape[-1]
    pad = (-d) % multiple
    if pad == 0:
        return a, d
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, widths, constant_values=value), d


# --------------------------------------------------------------------------
# fused input transform
# --------------------------------------------------------------------------
def _transform_kernel(x_ref, sub_ref, divinv_ref, mask_ref, lo_ref, hi_ref,
                      lbd_ref, isqn_ref, out_ref):
    x = x_ref[:]
    # qn exponential transform on flagged features
    qn = 1.0 - jnp.exp(-x * lbd_ref[:])
    x = jnp.where(isqn_ref[:] > 0.5, qn, x)
    x = (x - sub_ref[:]) * divinv_ref[:]
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    x = x * mask_ref[:]
    x = jnp.clip(x, lo_ref[:], hi_ref[:])
    out_ref[:] = x


def make_fused_input_transform(spec, stats, cfg=None, tile_b: int = 512):
    """Pallas-fused equivalent of data.transforms.make_input_transform."""
    from ..data.transforms import TransformConfig, _clip_bounds, _zero_mask

    cfg = cfg or TransformConfig()
    d = spec.input_len
    sub = np.asarray(stats.inp_sub, np.float32)
    divinv = (1.0 / np.asarray(stats.inp_div, np.float32))
    mask = _zero_mask(spec, cfg)
    lo, hi = _clip_bounds(spec, cfg)
    if not cfg.input_clip:
        lo = np.full(d, -np.inf, np.float32)
        hi = np.full(d, np.inf, np.float32)
    lbd = np.zeros(d, np.float32)
    isqn = np.zeros(d, np.float32)
    qn_sl = spec.input_slices.get("state_qn")
    if cfg.qn_transform and qn_sl is not None and stats.lbd_qn is not None:
        lbd[qn_sl] = stats.lbd_qn
        isqn[qn_sl] = 1.0

    # pad the constant vectors once; lo/hi pad with +/-inf (clip no-op)
    def padv(v, value=0.0):
        return np.pad(v.astype(np.float32), (0, (-d) % LANE),
                      constant_values=value)[None, :]

    consts = (padv(sub), padv(divinv), padv(mask), padv(lo, -np.inf),
              padv(hi, np.inf), padv(lbd), padv(isqn))
    dp = d + ((-d) % LANE)

    def transform(x):
        x = x.astype(jnp.float32)
        b = x.shape[0]
        xp, _ = _pad_features(x)
        tb = min(tile_b, b)
        grid = (pl.cdiv(b, tb),)
        const_spec = pl.BlockSpec((1, dp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _transform_kernel,
            out_shape=jax.ShapeDtypeStruct((b, dp), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec((tb, dp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [const_spec] * 7,
            out_specs=pl.BlockSpec((tb, dp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(xp, *[jnp.asarray(c) for c in consts])
        return out[:, :d]

    return transform


# --------------------------------------------------------------------------
# fused constraint head (wrapper postprocess + cloud repartition)
# --------------------------------------------------------------------------
def _constraint_kernel(y_ref, t_ref, qc_ref, qi_ref, scaleinv_ref, mask_ref,
                       out_ref, *, dt):
    """y (B, 308p) normalized v5 output -> out (B, 368p) raw contract.

    Level blocks are at fixed offsets (v5: t 0:60, q1 60:120, qn 120:180,
    u 180:240, v 240:300, scalars 300:308; out v2-layout 368).
    """
    y = y_ref[:] * mask_ref[:] * scaleinv_ref[:]
    dt_t = y[:, 0:64]          # padded level blocks: 60 data + 4 pad
    dqn = y[:, 128:192]
    t_new = t_ref[:] + dt_t * dt
    qn_new = qc_ref[:] + qi_ref[:] + dqn * dt
    liq = jnp.clip((t_new - 253.16) / 20.0, 0.0, 1.0)
    dqc = (liq * qn_new - qc_ref[:]) / dt
    dqi = ((1.0 - liq) * qn_new - qi_ref[:]) / dt
    out_ref[:, 0:64] = y[:, 0:64]
    out_ref[:, 64:128] = y[:, 64:128]
    out_ref[:, 128:192] = dqc
    out_ref[:, 192:256] = dqi
    out_ref[:, 256:320] = y[:, 192:256]
    out_ref[:, 320:384] = y[:, 256:320]
    out_ref[:, 384:448] = y[:, 320:384]


def make_fused_constraint_head(stats, strato_lev_out: int = 15,
                               dt: float = 1200.0, tile_b: int = 256):
    """Fused v5 head: (y_norm (B,308), t/qc/qi (B,60)) -> (B,368) raw.

    Layout strategy: each 60-level block is padded to 64 lanes so every
    block starts lane-aligned; scalars ride in their own 64-wide block.
    One kernel -> one HBM read/write per operand instead of ~10 slices.
    """
    from ..varspec import get_varspec

    spec5 = get_varspec("v5")
    sl = spec5.output_slices
    mask = np.ones(308, np.float32)
    for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
        mask[sl[v].start: sl[v].start + strato_lev_out] = 0.0
    scaleinv = (1.0 / np.asarray(stats.out_scale, np.float32))

    def pad_blocks(a, block_starts, width=60, out_width=64, total=None):
        """Repack (B, 308) -> (B, n*64) with each block lane-aligned."""
        blocks = [a[:, s:s + width] for s in block_starts]
        blocks = [jnp.pad(b, ((0, 0), (0, out_width - b.shape[1])))
                  for b in blocks]
        return jnp.concatenate(blocks, axis=1)

    starts5 = [0, 60, 120, 180, 240, 300]  # 5 profiles + scalar block
    maskv = np.concatenate([
        np.pad(mask[s:s + 60] if s < 300 else mask[300:308],
               (0, 64 - (60 if s < 300 else 8))) for s in starts5])[None, :]
    scalev = np.concatenate([
        np.pad(scaleinv[s:s + 60] if s < 300 else scaleinv[300:308],
               (0, 64 - (60 if s < 300 else 8))) for s in starts5])[None, :]

    def head(y_norm, t_before, qc_before, qi_before):
        b = y_norm.shape[0]
        yb = pad_blocks(y_norm.astype(jnp.float32), starts5[:5])
        yb = jnp.concatenate(
            [yb, jnp.pad(y_norm[:, 300:308].astype(jnp.float32),
                         ((0, 0), (0, 56)))], axis=1)  # (B, 384)
        pad60 = lambda a: jnp.pad(a.astype(jnp.float32), ((0, 0), (0, 4)))
        tb = min(tile_b, b)
        grid = (pl.cdiv(b, tb),)
        row = lambda w: pl.BlockSpec((tb, w), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        const = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_constraint_kernel, dt=dt),
            out_shape=jax.ShapeDtypeStruct((b, 448), jnp.float32),
            grid=grid,
            in_specs=[row(384), row(64), row(64), row(64),
                      const(384), const(384)],
            out_specs=row(448),
            interpret=_interpret(),
        )(yb, pad60(t_before), pad60(qc_before), pad60(qi_before),
          jnp.asarray(scalev), jnp.asarray(maskv))
        # unpack 7 aligned blocks back to the 368 contract layout
        blocks = [out[:, i * 64:(i * 64 + (60 if i < 6 else 8))]
                  for i in range(7)]
        return jnp.concatenate(blocks, axis=1)

    return head


# --------------------------------------------------------------------------
# fused MLP forward (weights resident in VMEM)
# --------------------------------------------------------------------------
def _mlp_kernel(*refs, n_layers, relu_tail, d_out):
    x_ref = refs[0]
    out_ref = refs[-1]
    wb = refs[1:-1]
    h = x_ref[:]
    for i in range(n_layers):
        w, b = wb[2 * i], wb[2 * i + 1]
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    if relu_tail > 0:
        # relu the last relu_tail *logical* features (pad lanes beyond d_out
        # are sliced away by the caller)
        lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        h = jnp.where(lane >= d_out - relu_tail, jnp.maximum(h, 0.0), h)
    out_ref[:] = h


def fused_mlp_forward(x, weights, biases, relu_tail: int = 0,
                      tile_b: int = 256):
    """Run a relu-MLP in one kernel launch; weights stay in VMEM across
    batch tiles.  weights: list of (d_in, d_out) f32/bf16; relu_tail: apply
    relu to the last `relu_tail` output features (the ClimSim scalar head).

    VMEM budget: sum of padded weight bytes + 2 activations * tile_b; the
    caller is responsible for keeping total under ~16 MB (use bf16 weights
    for the 4x1024 online MLP: ~8 MB).
    """
    n = len(weights)
    x = x.astype(jnp.float32)
    b = x.shape[0]
    xp, d_in = _pad_features(x)
    wps, bps = [], []
    for w, bias in zip(weights, biases):
        wp = jnp.pad(w, ((0, (-w.shape[0]) % LANE), (0, (-w.shape[1]) % LANE)))
        bp = jnp.pad(bias, (0, (-bias.shape[0]) % LANE))[None, :]
        wps.append(wp)
        bps.append(bp.astype(jnp.float32))
    d_out = weights[-1].shape[1]
    d_out_p = d_out + ((-d_out) % LANE)

    tb = min(tile_b, b)
    grid = (pl.cdiv(b, tb),)
    in_specs = [pl.BlockSpec((tb, xp.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = [xp]
    for wp, bp in zip(wps, bps):
        in_specs.append(pl.BlockSpec(wp.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(bp.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.extend([wp, bp])

    out = pl.pallas_call(
        partial(_mlp_kernel, n_layers=n, relu_tail=relu_tail, d_out=d_out),
        out_shape=jax.ShapeDtypeStruct((b, d_out_p), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, d_out_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*operands)
    return out[:, :d_out]


def mlp_params_to_matrices(params):
    """Extract ordered (weights, biases) from an OnlineMLP/MLPTrunk param
    tree (flax dict): Dense kernels in declaration order."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ks, bs = {}, {}
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        key = "/".join(names[:-1])
        if names[-1] == "kernel":
            ks[key] = leaf
        elif names[-1] == "bias":
            bs[key] = leaf
    keys = sorted(ks)  # Dense_0, Dense_1, ... declaration order
    return [ks[k] for k in keys], [bs[k] for k in keys]


# --------------------------------------------------------------------------
# int8 weight-only quantization for the fused MLP
# --------------------------------------------------------------------------
def quantize_weights_int8(weights):
    """Per-output-channel symmetric int8 quantization.

    Returns (q_weights int8 list, scales f32 list); dequantized weight =
    q * scale[None, :].  Halves the VMEM footprint vs bf16 (the 4x1024
    online MLP drops to ~4 MB), at ~1e-3 relative weight error.
    """
    qs, scales = [], []
    for w in weights:
        w = np.asarray(w, np.float32)
        s = np.abs(w).max(axis=0) / 127.0
        s = np.where(s == 0, 1.0, s)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        qs.append(q)
        scales.append(s.astype(np.float32))
    return qs, scales


def _mlp_q8_kernel(*refs, n_layers, relu_tail, d_out):
    x_ref = refs[0]
    out_ref = refs[-1]
    wbs = refs[1:-1]  # (w_q, scale, bias) triples
    h = x_ref[:]
    for i in range(n_layers):
        wq, sc, b = wbs[3 * i], wbs[3 * i + 1], wbs[3 * i + 2]
        w = wq[:].astype(jnp.bfloat16)
        y = jnp.dot(h.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        h = y * sc[:] + b[:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    if relu_tail > 0:
        lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        h = jnp.where(lane >= d_out - relu_tail, jnp.maximum(h, 0.0), h)
    out_ref[:] = h


def fused_mlp_forward_int8(x, q_weights, scales, biases,
                           relu_tail: int = 0, tile_b: int = 256):
    """fused_mlp_forward with int8 weights dequantized in VMEM.

    Per-channel scales fold into the bias-add; the matmul runs bf16 on the
    MXU after an in-register dequant.
    """
    n = len(q_weights)
    x = x.astype(jnp.float32)
    b = x.shape[0]
    xp, _ = _pad_features(x)
    operands = [xp]
    in_specs = [pl.BlockSpec((min(tile_b, b), xp.shape[1]),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for wq, sc, bias in zip(q_weights, scales, biases):
        wp = jnp.pad(jnp.asarray(wq),
                     ((0, (-wq.shape[0]) % LANE), (0, (-wq.shape[1]) % LANE)))
        scp = jnp.pad(jnp.asarray(sc, jnp.float32),
                      (0, (-sc.shape[0]) % LANE))[None, :]
        bp = jnp.pad(jnp.asarray(bias, jnp.float32),
                     (0, (-bias.shape[0]) % LANE))[None, :]
        for arr in (wp, scp, bp):
            in_specs.append(pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(arr)
    d_out = q_weights[-1].shape[1]
    d_out_p = d_out + ((-d_out) % LANE)
    tb = min(tile_b, b)
    out = pl.pallas_call(
        partial(_mlp_q8_kernel, n_layers=n, relu_tail=relu_tail,
                d_out=d_out),
        out_shape=jax.ShapeDtypeStruct((b, d_out_p), jnp.float32),
        grid=(pl.cdiv(b, tb),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, d_out_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*operands)
    return out[:, :d_out]
