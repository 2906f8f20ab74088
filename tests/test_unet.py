"""U-Net architecture tests (shapes, variants, sharded training)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.models.unet import ClimSimUNet
from climsim_tpu.varspec import get_varspec

SPEC5 = get_varspec("v5")


def small_unet(**kw):
    # attention off by default: this box compiles on one CPU core, and the
    # attn blocks dominate compile time; test_forward_shape keeps one
    # attn-enabled variant for coverage
    defaults = dict(spec=SPEC5, model_channels=16, channel_mult=(1, 2),
                    num_blocks=1, attn_resolutions=(), dropout=0.0)
    defaults.update(kw)
    return ClimSimUNet(**defaults)


@pytest.fixture(scope="module")
def x5():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, SPEC5.input_len)).astype(np.float32)
    # icol must be a valid 1..384 index
    x[:, SPEC5.input_slices["icol"]] = rng.integers(1, 385, (4, 1))
    return jnp.asarray(x)


def test_forward_shape(x5):
    m = small_unet(attn_resolutions=(32,))  # the one attn-enabled build
    # jit init+apply: one (persistently cached) compile instead of
    # hundreds of eager per-op compiles on this 1-core box
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x5)
    y = jax.jit(m.apply)(params, x5)
    assert y.shape == (4, SPEC5.output_len)
    # surface scalars relu'd
    assert (np.asarray(y[:, 300:]) >= 0).all()


def test_out_conv_init_small_but_not_zero(x5):
    """Regression: the output head init must be xavier*1e-5 (reference
    climsim_unet.py:123), NOT exact zeros -- exact zeros leave the relu'd
    scalar head with zero gradient forever (relu'(0)=0), producing
    permanently-zero surface outputs (caught by the online eval flow)."""
    m = small_unet()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x5)
    k = params["params"]["out_conv"]["Conv_0"]["kernel"]
    assert float(jnp.abs(k).max()) > 0.0
    assert float(jnp.abs(k).max()) < 1e-3  # still effectively "zero init"


def test_output_prune(x5):
    m = small_unet(output_prune=True, strato_lev_out=15)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x5)
    y = np.asarray(jax.jit(m.apply)(params, x5))
    for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
        s = SPEC5.output_slices[v].start
        np.testing.assert_array_equal(y[:, s:s + 15], 0.0)


def test_classifier_variant(x5):
    m = small_unet(classifier=True)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x5)
    logits = jax.jit(m.apply)(params, x5)
    assert logits.shape == (4, 60, 3)  # 3-class per-level scheme


def test_loc_embedding_distinguishes_columns(x5):
    """With loc_embedding on, two identical states at different columns give
    different outputs; with it off they match."""
    x = np.asarray(x5).copy()
    x[1] = x[0]
    x[1, SPEC5.input_slices["icol"].start] = 200.0
    x[0, SPEC5.input_slices["icol"].start] = 10.0
    xj = jnp.asarray(x)

    def randomize_head(params):
        # the output conv is zero-init (EDM convention), which would make
        # every output identically zero at init; randomize it so outputs
        # reflect the features
        p = jax.device_get(params)
        k = p["params"]["out_conv"]["Conv_0"]["kernel"]
        p["params"]["out_conv"]["Conv_0"]["kernel"] = (
            np.random.default_rng(5).normal(size=k.shape).astype(k.dtype))
        return p

    m_on = small_unet(loc_embedding=True)
    p_on = randomize_head(jax.jit(m_on.init)(jax.random.PRNGKey(1), xj))
    y_on = np.asarray(jax.jit(m_on.apply)(p_on, xj))
    assert np.abs(y_on[0] - y_on[1]).max() > 0

    m_off = small_unet(loc_embedding=False)
    p_off = randomize_head(jax.jit(m_off.init)(jax.random.PRNGKey(1), xj))
    y_off = np.asarray(jax.jit(m_off.apply)(p_off, xj))
    np.testing.assert_allclose(y_off[0], y_off[1], atol=1e-6)


def test_v4_and_v2rh_specs_supported():
    for ver in ("v4", "v2_rh"):
        spec = get_varspec(ver)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, spec.input_len)).astype(np.float32)
        if "icol" in spec.inputs:
            x[:, spec.input_slices["icol"]] = 7
        m = ClimSimUNet(spec=spec, model_channels=8, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=())
        params = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(x))
        y = jax.jit(m.apply)(params, jnp.asarray(x))
        assert y.shape == (2, spec.output_len)


def test_unet_grad_step_runs(x5):
    """One optimization step decreases a toy loss (trains end to end)."""
    import optax

    # smallest trainable config: the full-size step compile is covered by
    # test_recipes_full::test_unet_trainer_v5 through the recipe path
    m = small_unet(model_channels=8, channel_mult=(1,))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x5)
    target = jnp.ones((4, SPEC5.output_len))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((m.apply(p, x5) - target) ** 2)

    # one jitted fwd+bwd+update (persistently cached) instead of eager
    # per-op compilation of the whole backward pass
    @jax.jit
    def step(params, opt_state):
        l0, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l0

    params, opt_state, l0 = step(params, opt_state)
    l1 = jax.jit(loss_fn)(params)
    assert float(l1) < float(l0)
