"""1D U-Net over the vertical column -- the coupling-grade online model.

Re-architected (not translated) from the reference's Modulus/EDM-style
ClimsimUnet (online_testing/baseline_models/Unet_v5/training/
climsim_unet.py:35-411 and layers.py):

  * input assembly: level-resolved vars as channels, scalars broadcast over
    levels, learned 8-dim column-location embedding from a (385, 8) table
    (one-hot matmul in the reference, a gather here -- same function),
    optional zeroing of the previous-step 2D scalars (prev_2d=False zeroes
    features [-8:-3], climsim_unet.py:285-287)
  * 60 levels left-padded to seq_resolution=64; channel_mult [1,2,2,2],
    num_blocks residual blocks per level, attention at chosen resolutions
    (attn_resolutions), EDM-style blocks: GN -> silu -> conv3 -> GN -> silu
    -> dropout -> conv3(zero-init) + 1x1 skip, all scaled by 1/sqrt(2)
  * identity-initialized 1x1 skip convs between encoder and decoder
    (trainable iff skip_conv; the reference freezes them at identity
    otherwise, which equals omitting them -- climsim_unet.py:209-219)
  * output head: GN -> silu -> zero-init conv3; profile channels flatten to
    (B, P*60) from the unpadded 60 levels, scalar channels relu + level-mean
    (climsim_unet.py:377-393)
  * classifier variant: per-level cloud/no-cloud logits for the v5
    two-stage scheme (climsim_unet_classifier.py)

TPU design notes: NWC layout (length=lane-friendly 64, channels contract on
the MXU), bf16 compute / f32 params+accum, static shapes everywhere; the
whole forward is one XLA fusion chain -- no CUDA-graph capture needed.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..varspec import NUM_LEVELS, VarSpec
from .common import out_dtype


def _scaled_xavier(scale: float):
    base = nn.initializers.xavier_uniform()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class Conv1d(nn.Module):
    features: int
    kernel: int = 3
    zero_init: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # "zero" init is xavier scaled by 1e-5, NOT exact zeros, matching
        # the reference (climsim_unet.py:123 init_weight=1e-5).  Exact
        # zeros would make the relu'd scalar head permanently dead:
        # relu'(0) = 0, so the out_conv weights would never receive
        # gradient for the scalar channels.
        init = (_scaled_xavier(1e-5) if self.zero_init
                else nn.initializers.xavier_uniform())
        y = nn.Conv(self.features, (self.kernel,), padding="SAME",
                    kernel_init=init, dtype=self.compute_dtype,
                    param_dtype=jnp.float32)(x)
        return y.astype(out_dtype(self.compute_dtype))


def _num_groups(c: int, cap: int = 32) -> int:
    """Reference-exact GroupNorm group count: min(cap, c // 4), i.e. at
    least 4 channels per group (layers.py:271-276 GroupNorm
    min_channels_per_group=4).  At the flagship widths (multiples of 128)
    this equals the old largest-divisor-of-c rule, but below 128 channels
    the two diverge (c=64: 16 groups, not 32; c=16: 4, not 16) -- caught
    by the weight-port gradient-parity test at small widths
    (test_model_parity.py::test_unet_gradient_parity).  If the reference
    formula's count does not divide c (widths the reference never builds,
    where torch GroupNorm would raise), fall back to the largest divisor
    below it so the layer stays constructible."""
    g = min(cap, max(c // 4, 1))
    while c % g:
        g -= 1
    return g


def _down(x):
    """Box-filter downsample by 2 on the level axis (resample_filter [1,1])."""
    return 0.5 * (x[:, 0::2, :] + x[:, 1::2, :])


def _up(x):
    """Nearest-neighbor upsample by 2 on the level axis."""
    return jnp.repeat(x, 2, axis=1)


class Attention(nn.Module):
    """Single-axis self-attention over the (<=64-token) level axis.

    Mirrors AttentionOp (layers.py:291-339): qkv from a 1x1 conv, scores
    scaled by 1/sqrt(d).  ``num_heads=0`` (default) uses per-head dim 64
    (a TPU-friendly multi-head layout); the reference passes num_heads=1
    everywhere (climsim_unet.py:127), selectable for exact parity.
    """

    channels: int
    channels_per_head: int = 64
    num_heads: int = 0  # 0 = auto (C // channels_per_head); ref parity: 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        heads = (self.num_heads if self.num_heads > 0
                 else max(c // self.channels_per_head, 1))
        d = c // heads
        h = nn.GroupNorm(num_groups=_num_groups(c), epsilon=1e-6,
                         dtype=self.norm_dtype, name="norm")(x)
        qkv = Conv1d(3 * c, 1, compute_dtype=self.compute_dtype,
                     name="qkv")(h)
        qkv = qkv.reshape(b, l, 3, heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.astype(self.compute_dtype)
        k = k.astype(self.compute_dtype)
        v = v.astype(self.compute_dtype)
        acc = out_dtype(self.compute_dtype)
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=acc)
        w = nn.softmax(scores / np.sqrt(d), axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", w.astype(self.compute_dtype), v,
                         preferred_element_type=acc)
        out = out.reshape(b, l, c)
        out = Conv1d(c, 1, zero_init=True,
                     compute_dtype=self.compute_dtype, name="proj")(out)
        return (x + out) / np.sqrt(2.0)


class _GNParams(nn.Module):
    """Parameter shell: declares GroupNorm's scale/bias (same names,
    shapes, inits as nn.GroupNorm) and returns their values, so a fused
    kernel can consume them while checkpoints stay interchangeable with
    the unfused module tree."""

    channels: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.channels,), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.channels,), jnp.float32))


class _RawConvParams(nn.Module):
    features: int
    cin: int
    kernel: int
    zero_init: bool

    @nn.compact
    def __call__(self):
        init = (_scaled_xavier(1e-5) if self.zero_init
                else nn.initializers.xavier_uniform())
        k = self.param("kernel", init,
                       (self.kernel, self.cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class _ConvParams(nn.Module):
    """Parameter shell matching Conv1d (which nests its nn.Conv as child
    "Conv_0"): kernel (K, Cin, Cout), bias (Cout,), same initializers."""

    features: int
    cin: int
    kernel: int = 3
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        return _RawConvParams(self.features, self.cin, self.kernel,
                              self.zero_init, name="Conv_0")()


class UNetBlock(nn.Module):
    """EDM-style residual block.

    Two deliberate deltas from the reference (layers.py:617-634), each
    behind a flag whose non-default value reproduces the reference bit
    pattern (verified by tests/test_model_parity.py weight-port tests):

    * ``norm1_act=True`` applies silu between norm1 and conv1 (the standard
      EDM block).  The reference *omits* this activation -- it was deleted
      together with the commented-out embedding code (layers.py:621-627),
      leaving GN -> dropout -> conv with no nonlinearity.
    * ``resample_proj=False`` omits the 1x1 skip conv when channel counts
      match on up/down blocks.  The reference passes resample_proj=True
      (climsim_unet.py:132) so its up/down blocks always carry an extra
      trainable 1x1 conv in the skip path.
    """

    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    dropout: float = 0.10
    norm1_act: bool = True     # ref parity: False (no silu after norm1)
    resample_proj: bool = False  # ref parity: True (1x1 skip conv on up/down)
    attn_heads: int = 0          # ref parity: 1
    # route eligible GN->silu->conv3 chains through the fused Pallas
    # kernel with a custom VJP (ops/unet_fused.py) -- perf experiment
    # flag, parameter tree identical to the XLA path (checkpoints
    # interchange); measured verdict in docs/PERFORMANCE.md
    fused_gn_conv: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    def _fused(self, x, cout, conv_name, norm_name, zero_init):
        """GN->silu->conv3 through the Pallas kernel; params declared via
        shell modules so names/shapes/inits match the XLA path exactly."""
        from ..ops.unet_fused import make_trainable_fused_block

        cin = x.shape[-1]
        scale, bias = _GNParams(cin, name=norm_name)()
        k, b = _ConvParams(cout, cin, zero_init=zero_init, name=conv_name)()
        fn = make_trainable_fused_block(_num_groups(cin),
                                        compute_dtype=self.compute_dtype)
        return fn(x.astype(jnp.float32), scale, bias, k, b)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cin = x.shape[-1]
        # the kernel fuses GN->silu->conv; resampling between silu and
        # conv breaks chain 0, dropout between silu and conv breaks
        # chain 1, and the batch must tile by 16
        fusable = self.fused_gn_conv and x.shape[0] % 16 == 0
        if fusable and not (self.up or self.down):
            h = self._fused(x, self.out_channels, "conv0", "norm0",
                            zero_init=False)
        else:
            h = nn.GroupNorm(num_groups=_num_groups(cin), epsilon=1e-6,
                             dtype=self.norm_dtype, name="norm0")(x)
            h = nn.silu(h)
            if self.down:
                h, x = _down(h), _down(x)
            elif self.up:
                h, x = _up(h), _up(x)
            h = Conv1d(self.out_channels, 3,
                       compute_dtype=self.compute_dtype, name="conv0")(h)
        if fusable and self.norm1_act and self.dropout == 0:
            h = self._fused(h, self.out_channels, "conv1", "norm1",
                            zero_init=True)
        else:
            h = nn.GroupNorm(num_groups=_num_groups(self.out_channels),
                             epsilon=1e-6,
                             dtype=self.norm_dtype, name="norm1")(h)
            if self.norm1_act:
                h = nn.silu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = Conv1d(self.out_channels, 3, zero_init=True,
                       compute_dtype=self.compute_dtype, name="conv1")(h)
        if (cin != self.out_channels
                or (self.resample_proj and (self.up or self.down))):
            x = Conv1d(self.out_channels, 1,
                       compute_dtype=self.compute_dtype, name="skip")(x)
        y = (h + x) / np.sqrt(2.0)
        if self.attention:
            y = Attention(self.out_channels, num_heads=self.attn_heads,
                          compute_dtype=self.compute_dtype,
                          norm_dtype=self.norm_dtype)(y)
        return y


class IdentityConv(nn.Module):
    """1x1 conv initialized to identity (the reference's skip_conv_layer,
    climsim_unet.py:211-218)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        def ident(key, shape, dtype):
            w = jnp.zeros(shape, dtype)
            return w.at[0].set(jnp.eye(self.channels, dtype=dtype))
        return nn.Conv(self.channels, (1,), kernel_init=ident,
                       param_dtype=jnp.float32)(x)


class ClimSimUNet(nn.Module):
    spec: VarSpec
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    num_blocks: int = 4
    attn_resolutions: Sequence[int] = (8,)
    dropout: float = 0.0
    seq_resolution: int = 64
    loc_embedding: bool = True
    skip_conv: bool = False
    prev_2d: bool = False
    output_prune: bool = False
    strato_lev_out: int = 15
    classifier: bool = False
    num_classes: int = 3  # classifier head: 3-class per-level scheme
    # Reference-exact switches (see UNetBlock docstring); the defaults are
    # the improved TPU design, the parity values reproduce the reference
    # network bit-for-bit (tests/test_model_parity.py ports its weights).
    norm1_act: bool = True
    resample_proj: bool = False
    attn_heads: int = 0
    # perf-experiment flag: fused Pallas GN->silu->conv3 inside the train
    # step (UNetBlock.fused_gn_conv); implies f32 norm stats
    fused_gn_conv: bool = False
    # recompute block activations in backward instead of saving them
    # (jax.checkpoint per block) -- a bandwidth-for-FLOPs trade measured
    # in docs/PERFORMANCE.md
    remat_blocks: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    # f32 norms are the exact-parity default; bf16 halves the dominant
    # HBM traffic of the (bandwidth-bound) step -- see docs/PERFORMANCE.md
    norm_dtype: jnp.dtype = jnp.float32

    def _assemble(self, x):
        """(B, D_in) flat -> (B, 64, C) channelized with loc embedding."""
        spec = self.spec
        n_prof = len(spec.input_profile_vars)
        n_scal = len(spec.input_scalar_vars)
        has_icol = "icol" in spec.inputs
        prof = x[:, : n_prof * NUM_LEVELS].reshape(
            -1, n_prof, NUM_LEVELS).transpose(0, 2, 1)  # (B, 60, P)
        scal = x[:, n_prof * NUM_LEVELS:]
        if has_icol:
            icol = scal[:, -1]
            scal = scal[:, :-1]
        if not self.prev_2d and has_icol:
            # zero the previous-step 2D scalars tm_SOLIN..tm_COSZRS, which sit
            # at [-8:-3] of the flat input (climsim_unet.py:285-287)
            mask = np.ones(scal.shape[-1], np.float32)
            mask[-7:-2] = 0.0
            scal = scal * jnp.asarray(mask)
        parts = [prof,
                 jnp.broadcast_to(scal[:, None, :],
                                  (x.shape[0], NUM_LEVELS, scal.shape[-1]))]
        if has_icol:
            emb = self.param("emb_loc", nn.initializers.normal(1.0),
                             (385, 8), jnp.float32)
            idx = (icol if self.loc_embedding
                   else jnp.zeros_like(icol)).astype(jnp.int32)
            loc = emb[jnp.clip(idx, 0, 384)]  # (B, 8)
            parts.append(jnp.broadcast_to(
                loc[:, None, :], (x.shape[0], NUM_LEVELS, 8)))
        h = jnp.concatenate(parts, axis=-1)
        pad = self.seq_resolution - NUM_LEVELS
        return jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        spec = self.spec
        mc = self.model_channels
        h = self._assemble(x)

        kw = dict(dropout=self.dropout, norm1_act=self.norm1_act,
                  resample_proj=self.resample_proj, attn_heads=self.attn_heads,
                  fused_gn_conv=self.fused_gn_conv,
                  compute_dtype=self.compute_dtype,
                  norm_dtype=self.norm_dtype)
        # remat: recompute each block's activations in the backward pass
        # instead of saving them -- trades FLOPs for the saved-residual
        # HBM traffic that dominates this bandwidth-bound step
        # (docs/PERFORMANCE.md measures the trade at flagship scale)
        Block = (nn.remat(UNetBlock, static_argnums=(2,))
                 if self.remat_blocks else UNetBlock)
        # --- encoder ------------------------------------------------------
        skips = []
        cout = None
        for level, mult in enumerate(self.channel_mult):
            res = self.seq_resolution >> level
            if level == 0:
                h = Conv1d(mc, 3, compute_dtype=self.compute_dtype,
                           name=f"enc{res}_conv")(h)
            else:
                h = Block(h.shape[-1], down=True, **kw,
                              name=f"enc{res}_down")(h, deterministic)
            skips.append(h)
            for idx in range(self.num_blocks):
                cout = mc * mult
                h = Block(cout, attention=res in self.attn_resolutions,
                              **kw, name=f"enc{res}_block{idx}")(
                                  h, deterministic)
                skips.append(h)

        if self.skip_conv:
            skips = [IdentityConv(s.shape[-1], name=f"skipconv{i}")(s)
                     for i, s in enumerate(skips)]

        # --- decoder ------------------------------------------------------
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.seq_resolution >> level
            if level == len(self.channel_mult) - 1:
                h = Block(h.shape[-1], attention=True, **kw,
                              name=f"dec{res}_in0")(h, deterministic)
                h = Block(h.shape[-1], **kw,
                              name=f"dec{res}_in1")(h, deterministic)
            else:
                h = Block(h.shape[-1], up=True, **kw,
                              name=f"dec{res}_up")(h, deterministic)
            for idx in range(self.num_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                attn = (idx == self.num_blocks
                        and res in self.attn_resolutions)
                h = Block(mc * mult, attention=attn, **kw,
                              name=f"dec{res}_block{idx}")(h, deterministic)

        # --- output head --------------------------------------------------
        n_prof_out = (self.num_classes if self.classifier
                      else len(spec.output_profile_vars))
        n_scal_out = 0 if self.classifier else len(spec.output_scalar_vars)
        h = nn.GroupNorm(num_groups=_num_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=self.norm_dtype, name="out_norm")(h)
        h = Conv1d(n_prof_out + n_scal_out, 3, zero_init=True,
                   compute_dtype=self.compute_dtype,
                   name="out_conv")(nn.silu(h))
        pad = self.seq_resolution - NUM_LEVELS
        h = h[:, pad:, :]  # (B, 60, C_out)

        if self.classifier:
            # (B, 60, K) per-level class logits; the reference's 3-class
            # scheme (climsim_datapip_classifier_h5.py:121-122): 0 = zero
            # tendency, 1 = cloud fully evaporates, 2 = regular regression
            if self.output_prune:
                # force class 0 in the top strato_lev_out levels with a
                # saturating logit (climsim_unet_classifier.py:396-403:
                # logit0=1e2, logits1/2=0) -- guarantees the two-stage
                # gate emits exactly zero condensate tendency in the
                # stratosphere regardless of what the network computes
                strat = (jnp.arange(NUM_LEVELS)
                         < self.strato_lev_out)[None, :, None]
                forced = jnp.asarray(
                    [1e2] + [0.0] * (self.num_classes - 1), h.dtype)
                h = jnp.where(strat, forced, h)
            return h

        y_prof = h[:, :, :n_prof_out].transpose(0, 2, 1).reshape(
            -1, n_prof_out * NUM_LEVELS)
        y_scal = nn.relu(h[:, :, n_prof_out:]).mean(axis=1)
        y = jnp.concatenate([y_prof, y_scal], axis=-1)

        if self.output_prune:
            mask = np.ones(spec.output_len, np.float32)
            for v in spec.output_profile_vars:
                if v == "ptend_t":
                    continue
                s = spec.output_slices[v].start
                mask[s:s + self.strato_lev_out] = 0.0
            y = y * jnp.asarray(mask)
        return y
