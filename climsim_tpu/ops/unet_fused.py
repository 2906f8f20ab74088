"""Pallas fused GroupNorm -> silu -> conv3 for the U-Net hot block.

The U-Net v5 step sits at ~23% MXU with XLA reporting logical-byte
bandwidth near roofline (docs/PERFORMANCE.md); whether a hand-fused block
beats XLA's fusion decisions was an open question (VERDICT r2 weak #4).
This kernel answers it with data: the entire EDM half-block

    GroupNorm(f32 stats) -> silu -> Conv1d(k=3, bf16 MXU, f32 accum)

runs as ONE Pallas kernel -- activations make a single HBM round trip
where the XLA chain may make several (GN stats pass, normalize+silu,
conv).  scripts/bench_unet_fused.py A/Bs it against the identical XLA
chain at flagship shapes; the verdict (win or measured-negative) lives
in docs/PERFORMANCE.md.

Design notes (TPU):
  * grid over batch tiles; each cell holds a (Bt, L=64, C) activation
    block in VMEM (L x C = 64 x {128, 256} -- lane/sublane aligned).
  * GroupNorm stats via MXU-friendly contractions: group sums by
    (Bt*L, C) @ group-mask (C, G) matmuls instead of lane-crossing
    reshapes; broadcast back with the transposed mask.
  * conv3 = three shifted (Bt*L, C) @ (C, Cout) matmuls in bf16 with
    f32 accumulation; the level axis is per-sample, so shifts pad
    within each sample (jnp.pad on the level axis of the 3D view).
  * weights (3, C, Cout) stay VMEM-resident across the whole grid.

Reference block: Unet_v5/training/layers.py:239-339 (UNetBlock body);
this repo's XLA version: models/unet.py:134-150.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (TPU lowering)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _group_mask(c: int, groups: int) -> np.ndarray:
    """(C, G) one-hot group membership / group size."""
    m = np.zeros((c, groups), np.float32)
    per = c // groups
    for g in range(groups):
        m[g * per:(g + 1) * per, g] = 1.0
    return m


def _kernel(x_ref, gamma_ref, beta_ref, w_ref, b_ref, mask_ref, o_ref,
            *, eps: float, compute_dtype):
    x = x_ref[:]                      # (Bt, L, C) f32
    bt, l, c = x.shape
    g = mask_ref.shape[1]
    n = l * (c // g)                  # elements per (sample, group)

    x2d = x.reshape(bt * l, c)
    mask = mask_ref[:]                # (C, G) one-hot group membership
    # per-(sample, group) stats via MXU contractions: (Bt*L, C) @ (C, G),
    # then fold the level axis.  Two-pass (center, THEN square): the
    # E[x^2]-mean^2 form cancels catastrophically when |mean| >> std;
    # x lives in VMEM, so the second pass costs one more matmul, not a
    # second HBM read
    s1 = (x2d @ mask).reshape(bt, l, g).sum(axis=1)          # (Bt, G)
    mean = s1 / n
    mean_c = mean @ mask.T            # (Bt, C)
    xc = x - mean_c[:, None, :]
    xc2d = xc.reshape(bt * l, c)
    s2 = ((xc2d * xc2d) @ mask).reshape(bt, l, g).sum(axis=1)  # (Bt, G)
    var = jnp.maximum(s2 / n, 0.0)
    inv = jax.lax.rsqrt(var + eps)                            # (Bt, G)
    # broadcast group stats back to channels: (Bt, G) @ (G, C)
    inv_c = inv @ mask.T
    xn = xc * inv_c[:, None, :]
    xn = xn * gamma_ref[:][None, None, :] + beta_ref[:][None, None, :]
    xn = xn * jax.nn.sigmoid(xn)      # silu
    xn = xn.astype(compute_dtype)

    # conv3, SAME padding on the per-sample level axis
    w = w_ref[:]                      # (3, C, Cout) compute_dtype
    cout = w.shape[-1]
    xp = jnp.pad(xn, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((bt * l, cout), jnp.float32)
    for k in range(3):
        xs = xp[:, k:k + l, :].reshape(bt * l, c)
        acc = acc + jax.lax.dot_general(
            xs, w[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + b_ref[:][None, :]
    o_ref[:] = acc.reshape(bt, l, cout)


@partial(jax.jit, static_argnames=("groups", "eps", "batch_tile",
                                   "compute_dtype"))
def fused_gn_silu_conv3(x, gamma, beta, w, b, *, groups: int = 32,
                        eps: float = 1e-6, batch_tile: int = 16,
                        compute_dtype=jnp.bfloat16):
    """x (B, L, C) f32, gamma/beta (C,), w (3, C, Cout), b (Cout,) ->
    (B, L, Cout) f32.  Equals conv1d(silu(groupnorm(x))) (models/unet.py
    norm0+silu+conv0) to bf16-accumulation tolerance."""
    bsz, l, c = x.shape
    cout = w.shape[-1]
    assert bsz % batch_tile == 0, (bsz, batch_tile)
    mask = jnp.asarray(_group_mask(c, groups))
    grid = (bsz // batch_tile,)
    return pl.pallas_call(
        partial(_kernel, eps=eps, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((bsz, l, cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((3, c, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((batch_tile, l, cout),
                               lambda i: (i, 0, 0)),
        interpret=_interpret(),
    )(x, gamma, beta, w.astype(compute_dtype), b, mask)


def xla_gn_silu_conv3(x, gamma, beta, w, b, *, groups: int = 32,
                      eps: float = 1e-6, compute_dtype=jnp.bfloat16,
                      f32_accum: bool = True):
    """The identical math as plain XLA ops (the models/unet.py path:
    f32 GroupNorm -> silu -> bf16 SAME conv, f32 out).

    ``f32_accum=True`` accumulates the conv in f32
    (preferred_element_type); ``False`` uses the production flax-Conv1d
    casting (bf16 conv OUTPUT cast back to f32) — the conv transpose rule
    requires matching dtypes, so only the False variant is differentiable
    with bf16 operands (make_trainable_fused_block's backward)."""
    mean = x.reshape(x.shape[0], x.shape[1], groups, -1).mean(
        axis=(1, 3), keepdims=True)
    var = ((x.reshape(x.shape[0], x.shape[1], groups, -1)
            - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((x.reshape(x.shape[0], x.shape[1], groups, -1) - mean)
          * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    xn = xn * gamma[None, None, :] + beta[None, None, :]
    xn = jax.nn.silu(xn).astype(compute_dtype)
    if f32_accum:
        y = jax.lax.conv_general_dilated(
            xn, w.astype(compute_dtype), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
    else:
        y = jax.lax.conv_general_dilated(
            xn, w.astype(compute_dtype), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC")).astype(jnp.float32)
    return y + b[None, None, :]


def make_trainable_fused_block(groups: int, eps: float = 1e-6,
                               batch_tile: int = 16,
                               compute_dtype=jnp.bfloat16):
    """custom-VJP wrapper so the fused kernel can sit inside a TRAINING
    step (VERDICT r4 #4: integrate the isolation-positive block into the
    train step and measure, rather than arguing from the isolated win).

    Forward runs the Pallas kernel; backward recomputes the identical XLA
    chain (xla_gn_silu_conv3) under jax.vjp at the saved inputs -- exact
    gradients of the same math, at the cost of one extra XLA forward per
    block per backward pass.  That recompute is the honest price of the
    pallas_call boundary: the kernel's VMEM intermediates (GN stats,
    normalized activations) are gone by backward time.

    Returns f(x, gamma, beta, w, b) -> (B, L, Cout) f32.
    """

    def _xla(x, gamma, beta, w, b):
        # production (flax Conv1d) casting -> differentiable with bf16
        # operands; gradients through this chain are exactly the
        # production XLA path's gradients
        return xla_gn_silu_conv3(x, gamma, beta, w, b, groups=groups,
                                 eps=eps, compute_dtype=compute_dtype,
                                 f32_accum=False)

    @jax.custom_vjp
    def f(x, gamma, beta, w, b):
        return fused_gn_silu_conv3(x, gamma, beta, w, b, groups=groups,
                                   eps=eps, batch_tile=batch_tile,
                                   compute_dtype=compute_dtype)

    def fwd(x, gamma, beta, w, b):
        return f(x, gamma, beta, w, b), (x, gamma, beta, w, b)

    def bwd(res, g):
        _, vjp = jax.vjp(_xla, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
