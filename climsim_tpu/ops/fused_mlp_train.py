"""Fused MLP training: custom-VJP Pallas kernels with zero activation HBM
traffic.

The XLA autodiff path materializes every layer's activations to HBM in the
forward pass and reads them back in the backward pass -- for a bandwidth-
bound MLP that traffic rivals the matmul time.  These kernels instead:

  * forward: the whole relu-MLP in one kernel launch, weights resident in
    VMEM (ops/kernels.fused_mlp_forward) -- nothing saved but the input;
  * backward: one kernel that RE-COMPUTES the forward activations tile by
    tile in VMEM (FLOPs are cheaper than HBM round-trips), backpropagates
    through the chain, and accumulates dW/db across batch tiles directly
    into VMEM-resident f32 accumulators (TPU grids execute sequentially,
    so revisiting the same output block accumulates race-free).

Scope: plain relu trunks + linear head (OnlineMLP / RPN member shape).
VMEM budget: weights (bf16) + dW (f32) + 2 tile activations must fit in
~16 MB; the v1 MLP [768,640,512,640,640] fits with tile_b<=128.

Pattern reference: the custom-VJP section of the Pallas TPU guide.

Measured verdict (docs/PERFORMANCE.md): gradient-correct but slower than
XLA autodiff on v5e for this workload -- the VMEM dW budget caps batch
tiles at <=128 rows, under-utilizing the MXU, and the recompute adds ~33%
FLOPs.  Use the XLA path for training; ops/kernels.fused_mlp_forward for
low-latency inference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import LANE, _interpret, _pad_features


def _pad2(w):
    return jnp.pad(w, ((0, (-w.shape[0]) % LANE), (0, (-w.shape[1]) % LANE)))


def _pad1(b):
    return jnp.pad(b, (0, (-b.shape[0]) % LANE))[None, :]


def _fwd_kernel(*refs, n_layers):
    x_ref = refs[0]
    out_ref = refs[-1]
    wb = refs[1:-1]
    h = x_ref[:]
    for i in range(n_layers):
        w, b = wb[2 * i], wb[2 * i + 1]
        h = jnp.dot(h, w[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b[:]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


def _bwd_kernel(*refs, n_layers):
    """Inputs: x tile, dy tile, then (w, b) pairs.  Outputs: (dw, db) pairs
    accumulated over the batch-tile grid."""
    x_ref, dy_ref = refs[0], refs[1]
    wb = refs[2: 2 + 2 * n_layers]
    outs = refs[2 + 2 * n_layers:]

    # recompute forward, keeping activations in registers/VMEM
    acts = [x_ref[:]]  # h_{-1} = x
    h = x_ref[:]
    for i in range(n_layers):
        w, b = wb[2 * i], wb[2 * i + 1]
        z = jnp.dot(h, w[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b[:]
        h = jnp.maximum(z, 0.0) if i < n_layers - 1 else z
        acts.append(h)

    first = pl.program_id(0) == 0
    dh = dy_ref[:]
    for i in range(n_layers - 1, -1, -1):
        w = wb[2 * i]
        dw_ref, db_ref = outs[2 * i], outs[2 * i + 1]
        # dW_i = h_{i-1}^T @ dh ; db_i = sum(dh)
        dw = jax.lax.dot_general(
            acts[i].astype(jnp.bfloat16), dh.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        db = jnp.sum(dh, axis=0, keepdims=True)

        @pl.when(first)
        def _():
            dw_ref[:] = dw
            db_ref[:] = db

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[:] = dw_ref[:] + dw
            db_ref[:] = db_ref[:] + db

        if i > 0:
            # dh_{i-1} = (dh @ W_i^T) * relu'(z_{i-1});  relu'(z) = h > 0
            dh = jax.lax.dot_general(
                dh.astype(jnp.bfloat16), w[:].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            dh = jnp.where(acts[i] > 0.0, dh, 0.0)


def make_fused_mlp_train(widths, tile_b: int = 128):
    """Build fn(x, weights, biases) -> (B, d_out) with a custom VJP whose
    backward runs entirely in VMEM (dW/db only; no dx -- the MLP input is
    data, not activations of earlier layers).

    widths: (d_in, h1, ..., d_out) layer widths (static).
    """
    n = len(widths) - 1
    padded = [w + ((-w) % LANE) for w in widths]

    def _fwd_impl(x, ws, bs):
        b = x.shape[0]
        xp, _ = _pad_features(x.astype(jnp.float32))
        tb = min(tile_b, b)
        operands = [xp]
        in_specs = [pl.BlockSpec((tb, padded[0]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w, bias in zip(ws, bs):
            wp, bp = _pad2(w), _pad1(bias.astype(jnp.float32))
            operands += [wp, bp]
            in_specs += [pl.BlockSpec(wp.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec(bp.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)]
        out = pl.pallas_call(
            partial(_fwd_kernel, n_layers=n),
            out_shape=jax.ShapeDtypeStruct((b, padded[-1]), jnp.float32),
            grid=(pl.cdiv(b, tb),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tb, padded[-1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(*operands)
        return out[:, : widths[-1]]

    @jax.custom_vjp
    def apply(x, ws, bs):
        return _fwd_impl(x, ws, bs)

    def fwd(x, ws, bs):
        return _fwd_impl(x, ws, bs), (x, ws, bs)

    def bwd(res, dy):
        x, ws, bs = res
        b = x.shape[0]
        xp, _ = _pad_features(x.astype(jnp.float32))
        dyp, _ = _pad_features(dy.astype(jnp.float32))
        tb = min(tile_b, b)
        operands = [xp, dyp]
        in_specs = [pl.BlockSpec((tb, padded[0]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tb, padded[-1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        out_shapes, out_specs = [], []
        for li, (w, bias) in enumerate(zip(ws, bs)):
            wp, bp = _pad2(w), _pad1(bias.astype(jnp.float32))
            operands += [wp, bp]
            in_specs += [pl.BlockSpec(wp.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec(bp.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)]
            out_shapes += [jax.ShapeDtypeStruct(wp.shape, jnp.float32),
                           jax.ShapeDtypeStruct(bp.shape, jnp.float32)]
            out_specs += [pl.BlockSpec(wp.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(bp.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)]
        outs = pl.pallas_call(
            partial(_bwd_kernel, n_layers=n),
            out_shape=tuple(out_shapes),
            grid=(pl.cdiv(b, tb),),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=_interpret(),
        )(*operands)
        dws, dbs = [], []
        for li in range(n):
            dws.append(outs[2 * li][: widths[li], : widths[li + 1]])
            dbs.append(outs[2 * li + 1][0, : widths[li + 1]])
        # no gradient w.r.t. the input batch (data)
        return (jnp.zeros_like(x), dws, dbs)

    apply.defvjp(fwd, bwd)
    return apply


def vmem_estimate_bytes(widths, tile_b: int = 128) -> int:
    """Rough backward-kernel VMEM footprint for budgeting."""
    padded = [w + ((-w) % LANE) for w in widths]
    weights = sum(padded[i] * padded[i + 1] for i in range(len(widths) - 1))
    acts = sum(padded) * tile_b
    return int(weights * (4 + 4) + acts * 4 * 2)
