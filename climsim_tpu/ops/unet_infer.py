"""Fused-inference engine for ClimSimUNet -- a MEASURED NEGATIVE, kept.

Replays the exact flax forward (models/unet.py:229-307) from the
canonical parameter tree, running every eligible GroupNorm -> silu ->
conv3 half-block through the Pallas fused kernel (ops/unet_fused.py).
Eligible = the norm0 chain of non-resample blocks and the norm1 chain of
every block (inference is deterministic, so dropout is a no-op);
resample blocks, attention, and the (non-lane-aligned) output head stay
on XLA.

Verdict (docs/PERFORMANCE.md, measured on v5e): the kernel beats the
identical *isolated* XLA chain 1.5-3x at every block shape in the
flagship net, but the full fused forward is 0.55-0.71x -- SLOWER -- than
plain flax apply.  In context XLA fuses each chain into its surrounding
producers/consumers (conv epilogues, skip adds, concats, bf16
intermediates), so the chain's real incremental cost is far below the
isolated chain, and every pallas_call boundary forces its operands to
materialize in HBM as f32.  The flax path stays the production serving
path; this module and its equality tests are the experiment record.

Training integration was not attempted for the same reason the MLP
custom-VJP measured negative (ops/fused_mlp_train.py): a
recompute-backward re-runs a full forward, costing more than the fused
forward saves.

Reference: the TorchScript serving export this replaces is
online_testing/model_postprocessing/v5_nn_wrapper.ipynb (the wrapped
model's forward); the module topology is climsim_unet.py:229-411.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import ClimSimUNet, _down, _num_groups, _up
from ..varspec import NUM_LEVELS
from .unet_fused import fused_gn_silu_conv3


def _pick_batch_tile(b: int) -> int:
    for bt in (32, 16, 8, 4, 2, 1):
        if b % bt == 0:
            return bt
    return 1


def _gn(x, p, groups: int, eps: float = 1e-6):
    """f32 GroupNorm, the nn.GroupNorm(norm_dtype=f32) path."""
    b, l, c = x.shape
    xg = x.reshape(b, l, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return xn * p["scale"][None, None, :] + p["bias"][None, None, :]


def _conv(x, p, compute_dtype=jnp.bfloat16):
    """Conv1d: bf16 compute, f32 out (models/unet.py:50-68)."""
    w = p["Conv_0"]["kernel"]
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype), (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    return y + p["Conv_0"]["bias"][None, None, :].astype(jnp.float32)


def _fused_half(x, pn, pc, bt: int, compute_dtype=jnp.bfloat16):
    """GroupNorm -> silu -> conv3 as ONE Pallas kernel."""
    return fused_gn_silu_conv3(
        x, pn["scale"], pn["bias"], pc["Conv_0"]["kernel"],
        pc["Conv_0"]["bias"], groups=_num_groups(x.shape[-1]),
        batch_tile=bt, compute_dtype=compute_dtype)


def _attention(x, p, compute_dtype=jnp.bfloat16):
    b, l, c = x.shape
    heads = max(c // 64, 1)
    d = c // heads
    h = _gn(x, p["norm"], _num_groups(c))
    qkv = _conv(h, p["qkv"], compute_dtype).reshape(b, l, 3, heads, d)
    q = qkv[:, :, 0].astype(compute_dtype)
    k = qkv[:, :, 1].astype(compute_dtype)
    v = qkv[:, :, 2].astype(compute_dtype)
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores / np.sqrt(d), axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", w.astype(compute_dtype), v,
                     preferred_element_type=jnp.float32).reshape(b, l, c)
    out = _conv(out, p["proj"], compute_dtype)
    return (x + out) / np.sqrt(2.0)


def _block(x, p, out_channels: int, *, up=False, down=False,
           attention=False, bt: int, fused=True,
           compute_dtype=jnp.bfloat16):
    cin = x.shape[-1]
    if (down or up) or not fused:
        h = jax.nn.silu(_gn(x, p["norm0"], _num_groups(cin)))
        if down:
            h, x = _down(h), _down(x)
        elif up:
            h, x = _up(h), _up(x)
        h = _conv(h, p["conv0"], compute_dtype)
    else:
        h = _fused_half(x, p["norm0"], p["conv0"], bt, compute_dtype)
    if fused:
        h = _fused_half(h, p["norm1"], p["conv1"], bt, compute_dtype)
    else:
        h = _conv(jax.nn.silu(
            _gn(h, p["norm1"], _num_groups(out_channels))), p["conv1"],
            compute_dtype)
    if cin != out_channels:
        x = _conv(x, p["skip"], compute_dtype)
    y = (h + x) / np.sqrt(2.0)
    if attention:
        y = _attention(y, p["Attention_0"], compute_dtype)
    return y


def _assemble(model: ClimSimUNet, params, x):
    """models/unet.py:_assemble, reading emb_loc from the param tree."""
    spec = model.spec
    n_prof = len(spec.input_profile_vars)
    has_icol = "icol" in spec.inputs
    prof = x[:, : n_prof * NUM_LEVELS].reshape(
        -1, n_prof, NUM_LEVELS).transpose(0, 2, 1)
    scal = x[:, n_prof * NUM_LEVELS:]
    if has_icol:
        icol = scal[:, -1]
        scal = scal[:, :-1]
    if not model.prev_2d and has_icol:
        mask = np.ones(scal.shape[-1], np.float32)
        mask[-7:-2] = 0.0
        scal = scal * jnp.asarray(mask)
    parts = [prof,
             jnp.broadcast_to(scal[:, None, :],
                              (x.shape[0], NUM_LEVELS, scal.shape[-1]))]
    if has_icol:
        emb = params["emb_loc"]
        idx = (icol if model.loc_embedding
               else jnp.zeros_like(icol)).astype(jnp.int32)
        loc = emb[jnp.clip(idx, 0, 384)]
        parts.append(jnp.broadcast_to(
            loc[:, None, :], (x.shape[0], NUM_LEVELS, emb.shape[-1])))
    h = jnp.concatenate(parts, axis=-1)
    pad = model.seq_resolution - NUM_LEVELS
    return jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))


def unet_apply_fused(model: ClimSimUNet, params, x, *, fused: bool = True):
    """Inference forward from the canonical param tree.

    ``params`` is the tree ``model.init(...)["params"]`` (a dict with
    'emb_loc', 'enc64_conv', ...); a ``{"params": ...}`` wrapper is
    unwrapped.  Equals ``model.apply({"params": params}, x)`` to bf16
    accumulation tolerance (tests/test_unet_infer.py).
    """
    if "params" in params and "emb_loc" not in params:
        params = params["params"]
    assert model.norm_dtype == jnp.float32, (
        "the engine replays the f32-GroupNorm (exact-parity) path")
    spec = model.spec
    mc = model.model_channels
    bt = _pick_batch_tile(x.shape[0])
    cd = model.compute_dtype
    h = _assemble(model, params, x)

    skips = []
    for level, mult in enumerate(model.channel_mult):
        res = model.seq_resolution >> level
        if level == 0:
            h = _conv(h, params[f"enc{res}_conv"], model.compute_dtype)
        else:
            h = _block(h, params[f"enc{res}_down"], h.shape[-1],
                       down=True, bt=bt, fused=fused, compute_dtype=cd)
        skips.append(h)
        for idx in range(model.num_blocks):
            h = _block(h, params[f"enc{res}_block{idx}"], mc * mult,
                       attention=res in model.attn_resolutions,
                       bt=bt, fused=fused, compute_dtype=cd)
            skips.append(h)

    if model.skip_conv:
        # IdentityConv (models/unet.py) computes at its f32 input dtype
        # (flax dtype=None promotion), independent of compute_dtype
        skips = [_conv(s, params[f"skipconv{i}"], jnp.float32)
                 for i, s in enumerate(skips)]

    for level, mult in reversed(list(enumerate(model.channel_mult))):
        res = model.seq_resolution >> level
        if level == len(model.channel_mult) - 1:
            h = _block(h, params[f"dec{res}_in0"], h.shape[-1],
                       attention=True, bt=bt, fused=fused, compute_dtype=cd)
            h = _block(h, params[f"dec{res}_in1"], h.shape[-1],
                       bt=bt, fused=fused, compute_dtype=cd)
        else:
            h = _block(h, params[f"dec{res}_up"], h.shape[-1],
                       up=True, bt=bt, fused=fused, compute_dtype=cd)
        for idx in range(model.num_blocks + 1):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            attn = (idx == model.num_blocks
                    and res in model.attn_resolutions)
            h = _block(h, params[f"dec{res}_block{idx}"], mc * mult,
                       attention=attn, bt=bt, fused=fused, compute_dtype=cd)

    n_prof_out = (model.num_classes if model.classifier
                  else len(spec.output_profile_vars))
    n_scal_out = 0 if model.classifier else len(spec.output_scalar_vars)
    h = _gn(h, params["out_norm"], _num_groups(h.shape[-1]))
    h = _conv(jax.nn.silu(h), params["out_conv"], model.compute_dtype)
    pad = model.seq_resolution - NUM_LEVELS
    h = h[:, pad:, :]

    if model.classifier:
        return h

    y_prof = h[:, :, :n_prof_out].transpose(0, 2, 1).reshape(
        -1, n_prof_out * NUM_LEVELS)
    y_scal = jax.nn.relu(h[:, :, n_prof_out:]).mean(axis=1)
    y = jnp.concatenate([y_prof, y_scal], axis=-1)

    if model.output_prune:
        mask = np.ones(spec.output_len, np.float32)
        for v in spec.output_profile_vars:
            if v == "ptend_t":
                continue
            s = spec.output_slices[v].start
            mask[s:s + model.strato_lev_out] = 0.0
        y = y * jnp.asarray(mask)
    return y
