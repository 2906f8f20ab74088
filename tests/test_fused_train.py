"""Custom-VJP fused MLP training kernels vs jax.grad reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.ops.fused_mlp_train import (make_fused_mlp_train,
                                             vmem_estimate_bytes)

WIDTHS = (124, 192, 160, 128)


@pytest.fixture(scope="module")
def net():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(size=(WIDTHS[i], WIDTHS[i + 1])
                                 ).astype(np.float32) * 0.05)
          for i in range(len(WIDTHS) - 1)]
    bs = [jnp.asarray(rng.normal(size=(WIDTHS[i + 1],)
                                 ).astype(np.float32) * 0.01)
          for i in range(len(WIDTHS) - 1)]
    x = jnp.asarray(rng.normal(size=(96, WIDTHS[0])).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(96, WIDTHS[-1])).astype(np.float32))
    return ws, bs, x, y


def ref_apply(x, ws, bs):
    h = x
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = (h.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)
             ).astype(jnp.float32) + b
        if i < len(ws) - 1:
            h = jnp.maximum(h, 0.0)
    return h


def test_forward_matches(net):
    ws, bs, x, _ = net
    fused = make_fused_mlp_train(WIDTHS, tile_b=32)
    got = np.asarray(fused(x, ws, bs))
    want = np.asarray(ref_apply(x, ws, bs))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_gradients_match_autodiff(net):
    ws, bs, x, y = net
    fused = make_fused_mlp_train(WIDTHS, tile_b=32)

    def loss_fused(ws_, bs_):
        return jnp.mean((fused(x, ws_, bs_) - y) ** 2)

    def loss_ref(ws_, bs_):
        return jnp.mean((ref_apply(x, ws_, bs_) - y) ** 2)

    gw_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(ws, bs)
    gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(ws, bs)

    def rel_l2(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    # bf16 matmuls make per-element comparison of near-zero grads noisy;
    # the layer-wise relative L2 error is the meaningful metric
    for a, b in zip(gw_f + gb_f, gw_r + gb_r):
        assert rel_l2(a, b) < 0.08, rel_l2(a, b)
        cos = float(np.dot(np.asarray(a).ravel(), np.asarray(b).ravel())
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.995


def test_multi_tile_accumulation(net):
    """dW accumulated over several batch tiles == one-tile result."""
    ws, bs, x, y = net
    f_small = make_fused_mlp_train(WIDTHS, tile_b=16)   # 6 tiles
    f_big = make_fused_mlp_train(WIDTHS, tile_b=96)     # 1 tile

    def g(fused):
        return jax.grad(
            lambda ws_: jnp.mean((fused(x, ws_, bs) - y) ** 2))(ws)

    for a, b in zip(g(f_small), g(f_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-4)


def test_training_converges(net):
    """End-to-end: adam on the fused kernel drives the loss down."""
    import optax

    ws, bs, x, y = net
    fused = make_fused_mlp_train(WIDTHS, tile_b=32)
    opt = optax.adam(1e-3)
    params = (list(ws), list(bs))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        ws_, bs_ = params
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((fused(x, p[0], p[1]) - y) ** 2))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, l0 = step(params, opt_state)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < float(l0) * 0.9


def test_vmem_estimate():
    # the v1 MLP fits the backward budget at tile 64 (tile 128 exceeds it)
    est64 = vmem_estimate_bytes((124, 768, 640, 512, 640, 640, 128), 64)
    assert est64 < 16 * 1024 * 1024
    est128 = vmem_estimate_bytes((124, 768, 640, 512, 640, 640, 128), 128)
    assert est128 > 16 * 1024 * 1024  # documents the tile ceiling


# ---------------------------------------------------------------------------
# fused GN->silu->conv3 inside the U-Net TRAINING step (fused_gn_conv flag)
# ---------------------------------------------------------------------------

def test_unet_fused_gn_conv_flag():
    """ClimSimUNet(fused_gn_conv=True): identical parameter tree to the
    XLA path (checkpoints interchange), forward equal to bf16-accumulation
    tolerance, and the custom-VJP backward (XLA-chain recompute) yields
    gradients close to the all-XLA autodiff."""
    from climsim_tpu.models.unet import ClimSimUNet
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v5")
    kw = dict(spec=spec, model_channels=16, channel_mult=(1, 2),
              num_blocks=1, attn_resolutions=(), seq_resolution=64,
              dropout=0.0)
    ref = ClimSimUNet(**kw)
    fus = ClimSimUNet(fused_gn_conv=True, **kw)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, spec.input_len)).astype(np.float32)
    x[:, -1] = rng.integers(1, 385, 16)
    params = ref.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    p2 = fus.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(p2)[0]):
        assert ka == kb and a.shape == b.shape

    y_ref = np.asarray(ref.apply({"params": params}, jnp.asarray(x)))
    y_fus = np.asarray(fus.apply({"params": params}, jnp.asarray(x)))
    scale = np.abs(y_ref).max() + 1e-6
    assert np.abs(y_fus - y_ref).max() / scale < 5e-2  # bf16 accum noise

    tgt = jnp.asarray(rng.standard_normal((16, spec.output_len)),
                      jnp.float32)

    def loss(model):
        def f(p):
            y = model.apply({"params": p}, jnp.asarray(x))
            return jnp.mean((y - tgt) ** 2)
        return f

    g_ref = jax.grad(loss(ref))(params)
    g_fus = jax.grad(loss(fus))(params)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(g_fus)[0])
    for path, gr in flat_r:
        gf = flat_f[path]
        denom = np.linalg.norm(np.asarray(gr)) + 1e-8
        rel = np.linalg.norm(np.asarray(gf) - np.asarray(gr)) / denom
        assert rel < 0.15, (path, rel)  # bf16 fwd vs f32-chain bwd noise
