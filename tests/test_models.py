"""Model zoo shape/structure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.data import transforms as T
from climsim_tpu.models import (CVAE, ClimSimCNN, ClimSimMLP,
                                EncoderDecoder, HSR, OnlineMLP, RPNEnsemble)
from climsim_tpu.varspec import get_varspec

SPEC = get_varspec("v1")
RNG = jax.random.PRNGKey(0)
X = jnp.asarray(np.random.default_rng(0).normal(size=(4, SPEC.input_len)),
                dtype=jnp.float32)


def test_mlp_shapes_and_head():
    m = ClimSimMLP(spec=SPEC, hidden=(64, 32))
    params = m.init(RNG, X)
    y = m.apply(params, X)
    assert y.shape == (4, SPEC.output_len)
    # surface scalar block non-negative (relu head)
    assert (np.asarray(y[:, 120:]) >= 0).all()


def test_online_mlp_prune():
    spec5 = get_varspec("v5")
    x = jnp.zeros((2, spec5.input_len))
    m = OnlineMLP(spec=spec5, hidden=(32,), output_prune=True,
                  strato_lev_out=15)
    params = m.init(RNG, x)
    y = np.asarray(m.apply(params, x))
    assert y.shape == (2, spec5.output_len)
    # pruned stratosphere of q1/qn/u/v is exactly zero
    for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
        s = spec5.output_slices[v].start
        np.testing.assert_array_equal(y[:, s:s + 15], 0.0)
    # ptend_t untouched by pruning mask shape
    assert y[:, :60].shape == (2, 60)


def test_ed_shapes():
    m = EncoderDecoder(spec=SPEC)
    params = m.init(RNG, X)
    assert m.apply(params, X).shape == (4, SPEC.output_len)


def test_cnn_channelized_roundtrip():
    m = ClimSimCNN(spec=SPEC, depth=2, channels=32)
    x_ch = T.channelize_input(X, SPEC)
    assert x_ch.shape == (4, 60, 6)  # v1: 2 profiles + 4 scalars
    params = m.init(RNG, x_ch)
    y_ch = m.apply(params, x_ch)
    assert y_ch.shape == (4, 60, 10)
    y = T.dechannelize_output(y_ch, SPEC)
    assert y.shape == (4, SPEC.output_len)
    # scalar channels relu'd
    assert (np.asarray(y_ch[:, :, 2:]) >= 0).all()


def test_cnn_scalar_head_no_dead_channels():
    """Regression: the relu scalar head could initialize/train into dead
    channels (zero gradient forever -> R2 ~ -15 on the unlucky scalars);
    the softplus head must keep every scalar channel responsive."""
    import jax

    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes

    stats = load_asset_norms("v1")
    x, y = synthetic_split(SPEC, 1024, load_default_grid(), seed=0)
    tr = recipes.cnn_trainer(SPEC, stats, (x, y), jax.random.PRNGKey(2),
                             depth=2, channels=32, steps_per_epoch=20)
    state = tr.state
    for i in range(60):
        b = slice((i * 256) % 768, (i * 256) % 768 + 256)
        state, _ = tr.train_step(state, x[b], y[b])
    pred = np.asarray(tr.predict(state.params, x[:256]))
    for v in SPEC.output_scalar_vars:
        col = pred[:, SPEC.output_slices[v].start]
        assert col.std() > 1e-3, f"dead scalar channel {v}"


def test_channelize_matches_reference_layout():
    """channelize == data_utils.reshape_input_for_cnn semantics for v1."""
    x = np.asarray(X)
    got = np.asarray(T.channelize_input(X, SPEC))
    want = np.stack([
        x[:, 0:60], x[:, 60:120],
        np.repeat(x[:, 120][:, None], 60, 1),
        np.repeat(x[:, 121][:, None], 60, 1),
        np.repeat(x[:, 122][:, None], 60, 1),
        np.repeat(x[:, 123][:, None], 60, 1)], axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hsr_outputs_and_sampling():
    m = HSR(spec=SPEC, hidden=32, layers=2)
    params = m.init(RNG, X)
    mean, logprec = m.apply(params, X)
    assert mean.shape == logprec.shape == (4, SPEC.output_len)
    s = m.sample(params, X, jax.random.PRNGKey(1), num_samples=5)
    assert s.shape == (4, SPEC.output_len, 5)
    # near-infinite precision -> samples collapse to the mean
    big = jax.tree.map(lambda p: p, params)
    s2 = np.asarray(s)
    assert np.isfinite(s2).all()


def test_cvae_loss_parts():
    m = CVAE(spec=SPEC, latent=4, hidden=32, layers=1)
    y = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, SPEC.output_len)), dtype=jnp.float32)
    params = m.init(RNG, y, X, rng=jax.random.PRNGKey(0))
    y_mean, y_std, kl = m.apply(params, y, X, rng=jax.random.PRNGKey(2))
    assert y_mean.shape == (4, SPEC.output_len)
    assert (np.asarray(y_std) > 0).all()
    assert np.isfinite(float(kl))
    s = m.sample(params, X, jax.random.PRNGKey(3), num_samples=3)
    assert s.shape == (4, SPEC.output_len, 3)


def test_rpn_ensemble():
    ens = RPNEnsemble(SPEC, ensemble_size=4, hidden=(32, 16))
    params, prior = ens.init(RNG, np.asarray(X)[:1])
    # stacked leading member axis
    leaf = jax.tree.leaves(params)[0]
    assert leaf.shape[0] == 4
    xb = jnp.broadcast_to(X, (4,) + X.shape)  # (E, B, D)
    out = ens.forward(params, prior, xb)
    assert out.shape == (4, 4, SPEC.output_len)
    post = ens.posterior(params, prior, X)
    assert post.shape == (4, SPEC.output_len, 4)
    # prior contributes: zeroing trainable params still gives nonzero output
    zeroed = jax.tree.map(jnp.zeros_like, params)
    out0 = ens.posterior(zeroed, prior, X)
    assert float(jnp.abs(out0).max()) > 0


@pytest.mark.parametrize("ver", ["v1", "v5"])
def test_input_transform_semantics(ver):
    from climsim_tpu.norms import load_asset_norms

    spec = get_varspec(ver)
    stats = load_asset_norms(ver)
    cfg = (T.v5_online_config() if ver == "v5" else T.TransformConfig())
    f = T.make_input_transform(spec, stats, cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, spec.input_len)).astype(np.float32)
    x[0, 5] = np.nan
    x[1, 7] = np.inf
    out = np.asarray(f(jnp.asarray(x)))
    assert np.isfinite(out).all()
    assert out[0, 5] == 0.0 and out[1, 7] == 0.0
    if ver == "v5":
        # qn stratosphere pruned, rh clipped
        sl = spec.input_slices
        np.testing.assert_array_equal(
            out[:, sl["state_qn"].start:sl["state_qn"].start + 15], 0.0)
        rh = out[:, sl["state_rh"]]
        assert rh.min() >= 0.0 and rh.max() <= 1.2


def test_input_transform_matches_manual_v5():
    """Independent numpy reimplementation of the v5 online preprocessing
    (climsim_datapip.py:101-151) vs the jitted transform."""
    from climsim_tpu.norms import load_asset_norms

    spec = get_varspec("v5")
    stats = load_asset_norms("v5")
    cfg = T.v5_online_config()
    f = jax.jit(T.make_input_transform(spec, stats, cfg))
    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(size=(4, spec.input_len))).astype(np.float32) * 1e-4

    manual = x.astype(np.float64).copy()
    manual[:, 120:180] = 1 - np.exp(-manual[:, 120:180] * stats.lbd_qn)
    manual = (manual - stats.inp_sub) / stats.inp_div
    manual[~np.isfinite(manual)] = 0
    manual[:, 120:135] = 0
    manual[:, 60:120] = np.clip(manual[:, 60:120], 0, 1.2)

    got = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(got, manual, rtol=2e-4, atol=1e-6)


def test_aggressive_pruning_exact_indices():
    """The aggressive-pruning mask must match climsim_datapip.py:114-135
    index for index on the v5 layout (incl. NOT pruning trace gases)."""
    from climsim_tpu.norms import load_asset_norms

    spec = get_varspec("v5")
    stats = load_asset_norms("v5")
    cfg = T.TransformConfig(aggressive_pruning=True, strato_lev=15,
                            strato_lev_qinput=20)
    f = T.make_input_transform(spec, stats, cfg)
    x = np.ones((2, spec.input_len), np.float32)
    out = np.asarray(f(jnp.asarray(x)))
    zeroed = np.nonzero(out[0] == 0.0)[0]

    want = set()
    s, sq = 15, 20
    for start, depth in [(60, sq), (120, sq), (240, s), (300, s),
                         (360, s), (420, s), (480, s), (540, s), (600, s),
                         (660, s), (720, s), (780, sq), (840, sq),
                         (900, s), (960, s), (1020, sq), (1080, sq),
                         (1140, s)]:
        want |= set(range(start, start + depth))
    want.add(spec.input_slices["cam_in_SNOWHICE"].start)  # 1395
    # normalization can introduce incidental zeros where x==mean; check
    # that every wanted index is zeroed and no *masked* gas level is
    got = set(zeroed)
    assert want <= got
    gas = set(range(1200, 1380))
    # allow incidental zeros only where (1 - mean)/div == 0
    incidental = {i for i in got & gas
                  if abs(1.0 - stats.inp_sub[i]) < 1e-12}
    assert (got & gas) == incidental
