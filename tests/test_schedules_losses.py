"""Direct unit tests for LR schedules and loss helpers."""

import jax.numpy as jnp
import numpy as np

from climsim_tpu.train import losses, schedules
from climsim_tpu.varspec import get_varspec


def test_cyclic_triangular2_shape():
    """Triangular wave peaking mid-cycle, amplitude halving each cycle
    (tfa CyclicalLearningRate semantics, hpo_baseline_v1.py:106-113)."""
    s = schedules.cyclic_triangular2(1e-4, 1e-3, step_size=100)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(200)), 1e-4, rtol=1e-6)
    # second cycle peak has half the amplitude
    np.testing.assert_allclose(float(s(300)), 1e-4 + (1e-3 - 1e-4) / 2,
                               rtol=1e-6)


def test_step_decay():
    s = schedules.step_decay(1e-4, steps_per_drop=70, factor=0.2)
    np.testing.assert_allclose(float(s(0)), 1e-4)
    np.testing.assert_allclose(float(s(69)), 1e-4)
    np.testing.assert_allclose(float(s(70)), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(140)), 4e-6, rtol=1e-6)


def test_warmup_then():
    base = schedules.constant(1e-3)
    s = schedules.warmup_then(base, warmup_steps=10, mode="linear")
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 5e-4)
    np.testing.assert_allclose(float(s(10)), 1e-3)
    np.testing.assert_allclose(float(s(100)), 1e-3)


def test_block_weight_vector():
    spec = get_varspec("v2")
    w = np.asarray(losses.block_weight_vector(
        spec, {"ptend_t": 2.0, "2d": 0.5}))
    assert w.shape == (368,)
    np.testing.assert_allclose(w[:60], 2.0)       # ptend_t block
    np.testing.assert_allclose(w[60:360], 1.0)    # other profiles default
    np.testing.assert_allclose(w[360:], 0.5)      # all surface scalars


def test_weighted_losses_scale_linearly():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(8, 368)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(8, 368)).astype(np.float32))
    w = jnp.ones(368)
    base = float(losses.mse(p, t))
    np.testing.assert_allclose(float(losses.mse(p, t, w)), base, rtol=1e-6)
    np.testing.assert_allclose(float(losses.mse(p, t, 2 * w)), 2 * base,
                               rtol=1e-6)
    # huber == mse/2 for |err| << delta
    small_p = t + 1e-3
    np.testing.assert_allclose(
        float(losses.huber(small_p, t, delta=1.0)),
        float(losses.mse(small_p, t)) / 2, rtol=1e-4)
    # huber -> mae - delta/2 asymptotically for |err| >> delta
    big_p = t + 100.0
    np.testing.assert_allclose(
        float(losses.huber(big_p, t, delta=1.0)),
        float(losses.mae(big_p, t)) - 0.5, rtol=1e-4)


def test_channel_adjusted_weights():
    """Profile/scalar shares match the reference formula
    (hpo_train.py:114-122): mean(err_prof)*(P*60/D) + mean(err_scal)*(S/D)."""
    spec = get_varspec("v1")
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(4, 60, 10)).astype(np.float32))
    t = jnp.zeros((4, 60, 10))
    got = float(losses.channel_adjusted(p, t, spec, "mae"))
    ae = np.abs(np.asarray(p))
    want = ae[:, :, :2].mean() * (120 / 128) + ae[:, :, 2:].mean() * (8 / 128)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hsr_loss_stages():
    rng = np.random.default_rng(2)
    mean = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    logprec = jnp.zeros((8, 16))
    # stage 1: pure mse
    np.testing.assert_allclose(
        float(losses.hsr_loss(mean, logprec, target, True)),
        float(jnp.mean((target - mean) ** 2)), rtol=1e-6)
    # stage 2 with prec=1: mse - 0 (logprec 0)
    np.testing.assert_allclose(
        float(losses.hsr_loss(mean, logprec, target, False)),
        float(jnp.mean((target - mean) ** 2)), rtol=1e-6)
    # higher precision penalizes errors more
    l_hi = float(losses.hsr_loss(mean, logprec + 1.0, target, False))
    assert l_hi > float(losses.hsr_loss(mean, logprec, target, False)) - 1.0
