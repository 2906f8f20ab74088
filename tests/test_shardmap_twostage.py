"""shard_map+psum step equivalence and two-stage classifier gating."""

import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.parallel.mesh import ShardingRules, make_mesh
from climsim_tpu.varspec import get_varspec

GRID = load_default_grid()


def test_shardmap_step_matches_autopartitioned():
    """Explicit psum step == jit auto-partitioned step, param for param."""
    import optax

    from climsim_tpu.data import transforms as T
    from climsim_tpu.models import EncoderDecoder
    from climsim_tpu.train.step import create_train_state, make_train_step
    from climsim_tpu.train.step_shardmap import make_shardmap_train_step

    spec = get_varspec("v1")
    x, y = synthetic_split(spec, n=512, grid=GRID, seed=0)
    stats = compute_norms_from_data(spec, x, y)
    in_t = T.make_input_transform(spec, stats)
    tgt_t = T.make_target_transform(spec, stats)
    model = EncoderDecoder(spec=spec, intermediate=64, latent=4,
                           compute_dtype=jnp.float32)

    def loss_fn(params, rng, xb, yb):
        pred = model.apply(params, in_t(xb))
        return jnp.mean((pred - tgt_t(yb)) ** 2), {}

    mesh = make_mesh(num_data=8, devices=jax.devices("cpu")[:8])
    rules = ShardingRules(mesh)
    params = rules.params(model.init(jax.random.PRNGKey(0), in_t(x[:2])))
    opt = optax.adam(1e-3)
    rng = jax.random.PRNGKey(1)

    # independent copies: the steps donate their state buffers
    params2 = rules.params(jax.tree.map(np.array,
                                        jax.device_get(params)))
    s_auto = create_train_state(params, opt, jax.random.PRNGKey(1), rules)
    s_sm = create_train_state(params2, opt, jax.random.PRNGKey(1), rules)
    step_auto = make_train_step(loss_fn, opt, rules)
    step_sm = make_shardmap_train_step(loss_fn, opt, rules)

    xb, yb = rules.shard_batch(x, y)
    for _ in range(3):
        s_auto, m_auto = step_auto(s_auto, xb, yb)
        s_sm, m_sm = step_sm(s_sm, xb, yb)
    np.testing.assert_allclose(float(m_auto["loss"]), float(m_sm["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_auto.params)),
                    jax.tree.leaves(jax.device_get(s_sm.params))):
        # reduction orders differ (XLA global reduce vs per-shard
        # mean + psum).  On coordinates whose gradient is ~0, the noise
        # decides the SIGN and adam applies a full +/-lr step either
        # way, so the honest per-coordinate bound is absolute:
        # steps * lr * 2 slack.  The loss equality above is the tight
        # functional check.
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=6e-3)


def test_two_stage_gating():
    """3-class gate (climsim_datapip_classifier_h5.py:118-122): class 0 ->
    zero tendency, class 1 -> exact evaporation, class 2 -> regressor."""
    import dataclasses

    from climsim_tpu.norms import identity_norms
    from climsim_tpu.online.two_stage import make_two_stage_apply

    spec5 = get_varspec("v5")
    sl_qn = spec5.output_slices["ptend_qn"]
    sl_qn_in = spec5.input_slices["state_qn"]
    rng = np.random.default_rng(0)
    y_full = rng.normal(size=(4, spec5.output_len)).astype(np.float32)
    logits = rng.normal(size=(4, 60, 3)).astype(np.float32) * 3
    stats = dataclasses.replace(identity_norms(spec5),
                                lbd_qn=np.full(60, 1e4))

    # x_norm qn block = exp-transformed raw qn under identity norms
    qn_raw = np.abs(rng.normal(size=(4, 60))).astype(np.float32) * 1e-4
    x = np.zeros((4, spec5.input_len), np.float32)
    x[:, sl_qn_in] = 1.0 - np.exp(-qn_raw * 1e4)

    reg = lambda p, xx: jnp.asarray(y_full)
    cls = lambda p, xx: jnp.asarray(logits)
    apply = make_two_stage_apply(reg, cls, stats=stats)
    out = np.asarray(apply((None, None), jnp.asarray(x)))

    classes = logits.argmax(axis=-1)
    evap = -qn_raw / 1200.0
    want_qn = np.where(classes == 2, y_full[:, sl_qn],
                       np.where(classes == 1, evap, 0.0))
    np.testing.assert_allclose(out[:, sl_qn], want_qn, rtol=2e-3,
                               atol=1e-12)
    # class-1 levels drive qn to exactly zero over one coupling step
    qn_next = qn_raw + out[:, sl_qn] * 1200.0
    np.testing.assert_allclose(qn_next[classes == 1], 0.0, atol=1e-8)
    # everything outside the qn block untouched
    mask = np.ones(spec5.output_len, bool)
    mask[sl_qn] = False
    np.testing.assert_allclose(out[:, mask], y_full[:, mask], rtol=1e-6)


def test_two_stage_through_wrapper():
    """Composed two-stage apply runs through the coupling wrapper."""
    from climsim_tpu.models import OnlineMLP
    from climsim_tpu.models.unet import ClimSimUNet
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.online.two_stage import make_two_stage_apply

    spec5 = get_varspec("v5")
    spec4 = get_varspec("v4")
    stats = load_asset_norms("v5")
    reg_model = OnlineMLP(spec=spec5, hidden=(16,))
    cls_model = ClimSimUNet(spec=spec5, model_channels=8,
                            channel_mult=(1,), num_blocks=1,
                            attn_resolutions=(), classifier=True)
    x0 = jnp.zeros((2, spec5.input_len))
    reg_p = reg_model.init(jax.random.PRNGKey(0), x0)
    cls_p = cls_model.init(jax.random.PRNGKey(1), x0)

    two = make_two_stage_apply(
        lambda p, x: reg_model.apply(p, x),
        lambda p, x: cls_model.apply(p, x))
    wrap = W.make_wrapper(two, stats)
    from climsim_tpu.data.synthetic import synthetic_inputs

    x = jnp.asarray(synthetic_inputs(spec4, 4, GRID, seed=0))
    out = np.asarray(wrap((reg_p, cls_p), x))
    assert out.shape == (4, 368)
    assert np.isfinite(out).all()
