"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; the same kernels compile for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.data import transforms as T
from climsim_tpu.norms import load_asset_norms
from climsim_tpu.ops import kernels as K
from climsim_tpu.varspec import get_varspec

SPEC5 = get_varspec("v5")
STATS5 = load_asset_norms("v5")


def test_fused_input_transform_matches_jnp():
    cfg = T.v5_online_config()
    ref = T.make_input_transform(SPEC5, STATS5, cfg)
    fused = K.make_fused_input_transform(SPEC5, STATS5, cfg, tile_b=32)
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(size=(48, SPEC5.input_len))).astype(np.float32) * 1e-3
    x[0, 3] = np.nan
    x[1, 9] = np.inf
    want = np.asarray(ref(jnp.asarray(x)))
    got = np.asarray(fused(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_fused_input_transform_v1():
    spec = get_varspec("v1")
    stats = load_asset_norms("v1")
    ref = T.make_input_transform(spec, stats)
    fused = K.make_fused_input_transform(spec, stats, tile_b=16)
    x = np.random.default_rng(1).normal(
        size=(20, spec.input_len)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fused(jnp.asarray(x))),
                               np.asarray(ref(jnp.asarray(x))),
                               rtol=1e-5, atol=1e-7)


def test_fused_constraint_head_matches_wrapper_math():
    from climsim_tpu import physics

    head = K.make_fused_constraint_head(STATS5, strato_lev_out=15,
                                        tile_b=16)
    rng = np.random.default_rng(2)
    b = 24
    y = rng.normal(size=(b, 308)).astype(np.float32)
    t = (260 + 30 * rng.random((b, 60))).astype(np.float32)
    qc = np.abs(rng.normal(size=(b, 60))).astype(np.float32) * 1e-5
    qi = np.abs(rng.normal(size=(b, 60))).astype(np.float32) * 1e-5

    got = np.asarray(head(jnp.asarray(y), jnp.asarray(t), jnp.asarray(qc),
                          jnp.asarray(qi)))

    # reference math (jnp path, mirrors online.wrapper)
    sl = SPEC5.output_slices
    mask = np.ones(308, np.float32)
    for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
        mask[sl[v].start: sl[v].start + 15] = 0.0
    yu = y * mask / STATS5.out_scale.astype(np.float32)
    dqc, dqi = physics.repartition_clouds(
        t, qc, qi, jnp.asarray(yu[:, 0:60]), jnp.asarray(yu[:, 120:180]))
    want = np.concatenate([
        yu[:, 0:60], yu[:, 60:120], np.asarray(dqc), np.asarray(dqi),
        yu[:, 180:240], yu[:, 240:300], yu[:, 300:308]], axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-9)
    assert got.shape == (b, 368)


def test_fused_mlp_matches_model():
    from climsim_tpu.models import OnlineMLP

    spec = get_varspec("v2_rh")
    model = OnlineMLP(spec=spec, hidden=(96, 64), compute_dtype=jnp.float32)
    x = np.random.default_rng(3).normal(
        size=(32, spec.input_len)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(params, jnp.asarray(x)))

    ws, bs = K.mlp_params_to_matrices(params)
    assert len(ws) == 3
    n_relu = len(spec.output_scalar_vars)
    got = np.asarray(K.fused_mlp_forward(jnp.asarray(x), ws, bs,
                                         relu_tail=n_relu, tile_b=16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("b", [1, 7, 256])
def test_fused_mlp_odd_batches(b):
    ws = [np.random.default_rng(0).normal(size=(10, 20)).astype(np.float32),
          np.random.default_rng(1).normal(size=(20, 5)).astype(np.float32)]
    bs = [np.zeros(20, np.float32), np.zeros(5, np.float32)]
    x = np.random.default_rng(2).normal(size=(b, 10)).astype(np.float32)
    got = np.asarray(K.fused_mlp_forward(jnp.asarray(x), ws, bs, tile_b=64))
    want = np.maximum(x @ ws[0], 0) @ ws[1]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fast_mlp_wrapper_matches_reference_wrapper():
    from climsim_tpu.models import OnlineMLP
    from climsim_tpu.online import wrapper as W

    spec = get_varspec("v2_rh")
    stats = load_asset_norms("v2_rh")
    model = OnlineMLP(spec=spec, hidden=(64, 64),
                      compute_dtype=jnp.float32)
    x = np.random.default_rng(5).normal(
        size=(16, spec.input_len)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    slow = W.make_v2rh_wrapper(
        lambda p, xn: model.apply(p, xn), stats, spec)
    fast = W.make_fast_mlp_wrapper(model, params, stats, spec,
                                   weights_dtype=jnp.float32)
    want = np.asarray(slow(params, jnp.asarray(x)))
    got = np.asarray(fast(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_int8_fused_mlp_accuracy():
    """Weight-only int8 kernel stays within quantization error of f32."""
    rng = np.random.default_rng(0)
    ws = [rng.normal(size=(124, 256)).astype(np.float32) * 0.1,
          rng.normal(size=(256, 128)).astype(np.float32) * 0.1]
    bs = [rng.normal(size=(256,)).astype(np.float32) * 0.01,
          rng.normal(size=(128,)).astype(np.float32) * 0.01]
    x = rng.normal(size=(32, 124)).astype(np.float32)

    want = np.maximum(x @ ws[0] + bs[0], 0) @ ws[1] + bs[1]
    qs, scales = K.quantize_weights_int8(ws)
    # quantization error bound: scales are per-channel max/127
    got = np.asarray(K.fused_mlp_forward_int8(
        jnp.asarray(x), qs, scales, bs, tile_b=16))
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 0.02, err.mean()
    # and the dequantized weights themselves are close
    wdq = qs[0].astype(np.float32) * scales[0][None, :]
    assert np.abs(wdq - ws[0]).max() <= (np.abs(ws[0]).max() / 127) + 1e-6


def test_fused_gn_silu_conv3_matches_xla_chain():
    """The fused U-Net half-block kernel equals the XLA chain (and the
    flax block math) to bf16-accumulation tolerance."""
    import jax.numpy as jnp

    from climsim_tpu.ops.unet_fused import (fused_gn_silu_conv3,
                                            xla_gn_silu_conv3)

    rng = np.random.default_rng(3)
    # offset=1e3 exercises the |mean| >> std regime where a one-pass
    # E[x^2]-mean^2 variance cancels catastrophically (the kernel is
    # two-pass for exactly this reason)
    for (c, cout, groups), offset in (((128, 128, 32), 0.0),
                                      ((256, 128, 32), 0.0),
                                      ((64, 64, 16), 0.0),
                                      ((128, 128, 32), 1e3)):
        b, l = 16, 64
        x = jnp.asarray(rng.standard_normal((b, l, c)) + offset,
                        jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(c), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, c, cout)) / np.sqrt(3 * c),
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        ya = np.asarray(xla_gn_silu_conv3(x, gamma, beta, w, bias,
                                          groups=groups))
        yb = np.asarray(fused_gn_silu_conv3(x, gamma, beta, w, bias,
                                            groups=groups, batch_tile=8))
        np.testing.assert_allclose(ya, yb, rtol=0,
                                   atol=2e-2 * np.abs(ya).max())

    # and against the real flax UNet block half (norm0 -> silu -> conv0)
    import flax.linen as nn

    class Half(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6,
                             dtype=jnp.float32)(x)
            h = nn.silu(h)
            return nn.Conv(128, (3,), padding="SAME",
                           dtype=jnp.bfloat16,
                           param_dtype=jnp.float32)(h)

    x = jnp.asarray(rng.standard_normal((8, 64, 128)), jnp.float32)
    m = Half()
    params = m.init(jax.random.PRNGKey(0), x)
    ya = np.asarray(m.apply(params, x), np.float32)
    p = params["params"]
    yb = np.asarray(fused_gn_silu_conv3(
        x, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
        p["Conv_0"]["kernel"], p["Conv_0"]["bias"], batch_tile=8))
    np.testing.assert_allclose(ya, yb, rtol=0, atol=2e-2 * np.abs(ya).max())
