"""Golden model-zoo parity: execute the REFERENCE's own model code as the
numerical oracle.

The reference's torch models (ClimsimUnet v4/v5, MLP_v2rh, HSR, cVAE,
loss_energy) and Keras builders (MLP trial model, ED, CNN) are instantiated
on CPU from their own sources via tests/torchshim (mini-modulus/nvtx/
keras_tuner/tfa shims -- no reference code copied), their randomly
initialized weights are ported through climsim_tpu.utils.migrate, and the
forwards are compared in float64.

This turns "re-designed, same math" into proof: any silent delta in
GroupNorm grouping, attention scaling, resampling, padding or head
conventions fails these tests at 1e-10.  The deliberate architecture deltas
(UNetBlock norm1 silu, multi-head attention, resample_proj skip convs, CNN
softplus head, OnlineMLP 5-block prune) sit behind flags whose
reference-parity values are exercised here; PARITY.md documents them.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import torchshim as ts

pytestmark = pytest.mark.skipif(
    not ts.reference_available(),
    reason="reference tree /root/reference not available")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from climsim_tpu.models.cnn import ClimSimCNN
from climsim_tpu.models.cvae import CVAE
from climsim_tpu.models.ed import EncoderDecoder
from climsim_tpu.models.hsr import HSR
from climsim_tpu.models.mlp import ClimSimMLP, OnlineMLP
from climsim_tpu.models.unet import ClimSimUNet
from climsim_tpu.utils import migrate
from climsim_tpu.varspec import get_varspec

F64 = dict(compute_dtype=jnp.float64)


def _np_state(model) -> dict:
    return {k: v.detach().cpu().numpy().astype(np.float64)
            for k, v in model.state_dict().items()}


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        out = set()
        for k, v in tree.items():
            out |= _tree_paths(v, f"{prefix}/{k}")
        return out
    return {f"{prefix}:{np.shape(tree)}"}


def _check_port(template, ported):
    """Ported tree must cover the init template exactly (same paths+shapes)."""
    t, p = _tree_paths(template), _tree_paths(ported)
    assert t == p, (f"missing={sorted(t - p)[:6]} "
                    f"extra={sorted(p - t)[:6]}")


def _f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), tree)


# ---------------------------------------------------------------------------
# OnlineMLP vs MLP_v2rh/training/mlp.py
# ---------------------------------------------------------------------------

class TestOnlineMLP:
    def _pair(self, layers=3, hidden=64):
        mod = ts.load_mlp_v2rh()
        spec = get_varspec("v2_rh")
        ref = mod.MLP(in_dims=spec.input_len, out_dims=spec.output_len,
                      hidden_dims=hidden, layers=layers,
                      output_prune=False).double().eval()
        mine = OnlineMLP(spec=spec, hidden=(hidden,) * layers,
                         output_prune=False, **F64)
        params = _f64(migrate.port_online_mlp(_np_state(ref), layers))
        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, spec.input_len))
        tmpl = mine.init(jax.random.key(0), jnp.asarray(x))["params"]
        _check_port(tmpl, params)
        return ref, mine, params, x

    def test_forward_parity(self):
        ref, mine, params, x = self._pair()
        with torch.no_grad():
            y_ref = ref(torch.tensor(x)).numpy()
        y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-9, atol=1e-10)

    def test_gradient_parity(self):
        """d(sum(y^2))/dx through relu head + trunk must match torch
        autograd -- a full backward-chain check."""
        ref, mine, params, x = self._pair()
        xt = torch.tensor(x, requires_grad=True)
        ref(xt).pow(2).sum().backward()
        g_ref = xt.grad.numpy()
        g = np.asarray(jax.grad(
            lambda xx: jnp.sum(mine.apply({"params": params}, xx) ** 2))(
                jnp.asarray(x)))
        np.testing.assert_allclose(g, g_ref, rtol=1e-8, atol=1e-9)

    def test_param_gradient_parity(self):
        ref, mine, params, x = self._pair()
        y0 = torch.zeros((8, get_varspec("v2_rh").output_len),
                         dtype=torch.float64)
        loss = (ref(torch.tensor(x)) - y0).pow(2).mean()
        loss.backward()
        g_ref_w = ref.final_linear.weight.grad.numpy()

        def loss_fn(p):
            y = mine.apply({"params": p}, jnp.asarray(x))
            return jnp.mean(y ** 2)

        g = jax.grad(loss_fn)(params)
        np.testing.assert_allclose(np.asarray(g["out"]["kernel"]).T,
                                   g_ref_w, rtol=1e-8, atol=1e-12)

    def test_output_prune_delta_documented(self):
        """Deliberate delta: the reference zeroes 4 hardcoded blocks
        (mlp.py:58-62 -- q1,q2,q3,u for the 368-wide layout, leaving
        ptend_v unpruned), while OnlineMLP prunes every non-T profile
        block, consistent with the reference's own Unet_v4
        (climsim_unet.py v4:391-395 prunes 5 blocks).  This test pins the
        relationship: outputs agree everywhere EXCEPT ptend_v[0:12]."""
        mod = ts.load_mlp_v2rh()
        spec = get_varspec("v2_rh")
        layers, hidden, s = 2, 32, 12
        ref = mod.MLP(in_dims=spec.input_len, out_dims=spec.output_len,
                      hidden_dims=hidden, layers=layers, output_prune=True,
                      strato_lev_out=s).double().eval()
        mine = OnlineMLP(spec=spec, hidden=(hidden,) * layers,
                         output_prune=True, strato_lev_out=s, **F64)
        params = _f64(migrate.port_online_mlp(_np_state(ref), layers))
        x = np.random.default_rng(1).standard_normal((4, spec.input_len))
        with torch.no_grad():
            y_ref = ref(torch.tensor(x)).numpy()
        y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
        sl_v = spec.output_slices["ptend_v"]
        assert (y[:, sl_v.start:sl_v.start + s] == 0).all()
        assert (np.abs(y_ref[:, sl_v.start:sl_v.start + s]) > 0).any()
        mask = np.ones(spec.output_len, bool)
        mask[sl_v.start:sl_v.start + s] = False
        np.testing.assert_allclose(y[:, mask], y_ref[:, mask],
                                   rtol=1e-9, atol=1e-10)


# ---------------------------------------------------------------------------
# HSR vs baseline_models/HSR/training/hsr.py
# ---------------------------------------------------------------------------

def test_hsr_forward_and_sampling_parity():
    mod = ts.load_hsr()
    layers, hidden = 3, 96
    ref = mod.HeteroskedasticRegression(
        in_dims=124, out_dims=128, hidden_dims=hidden,
        layers=layers).double().eval()
    spec = get_varspec("v1")
    mine = HSR(spec=spec, hidden=hidden, layers=layers, **F64)
    params = _f64(migrate.port_hsr(_np_state(ref), layers))
    x = np.random.default_rng(2).standard_normal((8, 124))
    tmpl = mine.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_port(tmpl, params)
    with torch.no_grad():
        mu_ref, lp_ref = ref(torch.tensor(x))
        # deterministic "sampling" returns (mu, sigma) (hsr.py:79-81)
        _, sigma_ref = ref.sample(torch.tensor(x), random=False)
    mu, lp = mine.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy(),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lp), lp_ref.numpy(),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.exp(-0.5 * np.asarray(lp)),
                               sigma_ref.numpy(), rtol=1e-9, atol=1e-12)


def test_hsr_staged_loss_parity():
    """Both stages of the reference training loss (hsr.py:128-134) equal
    train.losses.hsr_loss on identical (mu, logprec, y)."""
    from climsim_tpu.train.losses import hsr_loss
    rng = np.random.default_rng(3)
    mu = rng.standard_normal((16, 128))
    lp = rng.standard_normal((16, 128)) * 0.3
    y = rng.standard_normal((16, 128))
    t_mu, t_lp, t_y = map(torch.tensor, (mu, lp, y))
    stage1_ref = ((t_y - t_mu) ** 2).mean().item()
    prec = torch.exp(t_lp)
    stage2_ref = (prec * (t_y - t_mu) ** 2 - t_lp).mean().item()
    np.testing.assert_allclose(
        float(hsr_loss(jnp.asarray(mu), jnp.asarray(lp), jnp.asarray(y),
                       mse_stage=True)), stage1_ref, rtol=1e-12)
    np.testing.assert_allclose(
        float(hsr_loss(jnp.asarray(mu), jnp.asarray(lp), jnp.asarray(y),
                       mse_stage=False)), stage2_ref, rtol=1e-12)


# ---------------------------------------------------------------------------
# cVAE vs baseline_models/cVAE/training/cvae.py
# ---------------------------------------------------------------------------

def test_cvae_parity():
    mod = ts.load_cvae()
    layers, hidden, latent = 2, 96, 5
    spec = get_varspec("v1")
    ref = mod.ConditionalVAE(
        beta=0.01, data_dims=124, label_dims=128, latent_dims=latent,
        hidden_dims=hidden, layers=layers).double().eval()
    mine = CVAE(spec=spec, latent=latent, hidden=hidden, layers=layers,
                **F64)
    params = _f64(migrate.port_cvae(_np_state(ref), layers))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 124))
    y = rng.standard_normal((8, 128))
    tmpl = mine.init(jax.random.key(0), jnp.asarray(y), jnp.asarray(x),
                     )["params"]
    _check_port(tmpl, params)

    # encoder: posterior mean path (return_latent=True short-circuits the
    # stochastic branch, cvae.py:42-43)
    with torch.no_grad():
        mu_ref = ref.encoder(torch.tensor(y), torch.tensor(x),
                             return_latent=True).numpy()
    mu, logstd = mine.apply({"params": params}, jnp.asarray(y),
                            jnp.asarray(x), method=CVAE.encode)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-9,
                               atol=1e-10)

    # decoder on a shared z (prior-mean sampling path, cvae.py:140-151)
    with torch.no_grad():
        mean_ref, std_ref = ref.sample(torch.tensor(x), random=False)
    mean, std = mine.apply({"params": params},
                           jnp.zeros((8, latent), jnp.float64),
                           jnp.asarray(x), method=CVAE.decode)
    np.testing.assert_allclose(np.asarray(mean), mean_ref.numpy(),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(std), std_ref.numpy(),
                               rtol=1e-9, atol=1e-10)

    # full training-loss parity on the deterministic z=mu path: drive the
    # reference encoder with a zeroed logstd so sigma == 1 exactly, then
    # compare the beta-ELBO formula (cvae.py:47,193) to cvae_loss
    from climsim_tpu.train.losses import cvae_loss
    with torch.no_grad():
        ref.encoder.linear_logstd.weight.zero_()
        ref.encoder.linear_logstd.bias.zero_()
    params = _f64(migrate.port_cvae(_np_state(ref), layers))
    with torch.no_grad():
        z_ref = ref.encoder(torch.tensor(y), torch.tensor(x),
                            return_latent=True)
        kl_ref = ((1.0 ** 2 + z_ref ** 2 - np.log(1.0) - 0.5).mean()
                  .item())  # sigma == 1
        ym_ref, ys_ref = ref.decoder(z_ref, torch.tensor(x))
        loss_ref = ((0.5 * (torch.tensor(y) - ym_ref) ** 2 / ys_ref
                     + torch.log(ys_ref)).mean().item() + 0.01 * kl_ref)
    ym, ys, kl = mine.apply({"params": params}, jnp.asarray(y),
                            jnp.asarray(x), rng=None)
    loss = float(cvae_loss(ym, ys, kl, jnp.asarray(y), beta=0.01))
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-9)


# ---------------------------------------------------------------------------
# energy loss vs Unet_v5/training/loss_energy.py
# ---------------------------------------------------------------------------

def test_energy_loss_parity():
    from climsim_tpu.train.losses import energy_loss
    mod = ts.load_loss_energy()
    spec = get_varspec("v2")
    rng = np.random.default_rng(5)
    b = 16
    pred = rng.standard_normal((b, spec.output_len))
    truth = rng.standard_normal((b, spec.output_len))
    ps = rng.uniform(6e4, 1.03e5, b)
    # plausible monotone hybrid coefficients
    hyai = np.linspace(0.0, 0.4, 61) ** 1.3
    hybi = np.linspace(0.0, 1.0, 61) ** 2
    out_scale = rng.uniform(0.5, 2.0, spec.output_len)
    ref = mod.loss_energy(torch.tensor(pred, dtype=torch.float64),
                          torch.tensor(truth, dtype=torch.float64),
                          torch.tensor(ps, dtype=torch.float64),
                          torch.tensor(hyai, dtype=torch.float64),
                          torch.tensor(hybi, dtype=torch.float64),
                          torch.tensor(out_scale, dtype=torch.float64))
    mine = energy_loss(jnp.asarray(pred), jnp.asarray(truth),
                       jnp.asarray(ps), jnp.asarray(hyai),
                       jnp.asarray(hybi), jnp.asarray(out_scale), spec)
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-10)


# ---------------------------------------------------------------------------
# ClimSimUNet vs Unet_v{4,5}/training/climsim_unet.py + layers.py
# ---------------------------------------------------------------------------

REF_PARITY_UNET = dict(dropout=0.0, norm1_act=False, resample_proj=True,
                       attn_heads=1, compute_dtype=jnp.float64,
                       norm_dtype=jnp.float64)


from contextlib import contextmanager


@contextmanager
def _promote_matmul():
    """The reference forward hard-casts the one-hot location matrix to
    float32 before matmul with emb_loc (climsim_unet.py:301-303), which
    breaks under .double().  A one-hot cast is lossless, so promoting the
    lhs to the rhs dtype at the (single) matmul call site preserves exact
    f64 semantics."""
    orig = torch.matmul
    torch.matmul = lambda a, b: orig(a.to(b.dtype), b)
    try:
        yield
    finally:
        torch.matmul = orig


def _unet_pair(version: str, **overrides):
    mod = ts.load_climsim_unet(version)
    spec = get_varspec("v5" if version == "v5" else "v4")
    n_prof = len(spec.input_profile_vars)
    n_scal = len(spec.input_scalar_vars)
    n_pout = len(spec.output_profile_vars)
    n_sout = len(spec.output_scalar_vars)
    kw = dict(seq_resolution=64, model_channels=128,
              channel_mult=[1, 2, 2, 2], num_blocks=2,
              attn_resolutions=[8], dropout=0.0, loc_embedding=True,
              skip_conv=False, prev_2d=False, output_prune=True)
    kw.update(overrides)
    strato_kw = ({"strato_lev_out": 15} if version == "v5"
                 else {"strato_lev": 15})
    torch.manual_seed(7)
    ref = mod.ClimsimUnet(
        num_vars_profile=n_prof, num_vars_scalar=n_scal,
        num_vars_profile_out=n_pout, num_vars_scalar_out=n_sout,
        **strato_kw, **kw).double().eval()
    mine = ClimSimUNet(
        spec=spec, model_channels=kw["model_channels"],
        channel_mult=tuple(kw["channel_mult"]), num_blocks=kw["num_blocks"],
        attn_resolutions=tuple(kw["attn_resolutions"]),
        seq_resolution=kw["seq_resolution"],
        loc_embedding=kw["loc_embedding"], skip_conv=kw["skip_conv"],
        prev_2d=kw["prev_2d"], output_prune=kw["output_prune"],
        strato_lev_out=15, **REF_PARITY_UNET)
    params = _f64(migrate.port_climsim_unet(
        _np_state(ref), channel_mult=tuple(kw["channel_mult"]),
        num_blocks=kw["num_blocks"], seq_resolution=kw["seq_resolution"],
        skip_conv=kw["skip_conv"]))
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, spec.input_len))
    x[:, -1] = [17.0, 212.0]  # icol in 1..384
    return ref, mine, params, x, spec


@pytest.mark.slow
@pytest.mark.parametrize("version", ["v5", "v4"])
def test_unet_forward_parity(version):
    """Full-architecture weight-port forward equality, f64: encoder /
    decoder / attention / resampling / location embedding / prev_2d zeroing
    / output head / stratosphere pruning all bit-compatible.  Also pins the
    v4-vs-v5 prune-extent difference (v4 zeroes 5 blocks incl. ptend_v,
    climsim_unet.py v4:391-395) which ClimSimUNet reproduces semantically
    for both."""
    ref, mine, params, x, spec = _unet_pair(version)
    tmpl = mine.init(jax.random.key(0), jnp.asarray(x[:1]))["params"]
    _check_port(tmpl, params)
    with torch.no_grad(), _promote_matmul():
        y_ref = ref(torch.tensor(x)).numpy()
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    assert y.shape == y_ref.shape == (2, spec.output_len)
    if version == "v5":
        np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)
    else:
        # v4 reference prunes ptend_v too -- identical semantics to ours
        np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)
        sl_v = spec.output_slices["ptend_v"]
        assert (y_ref[:, sl_v.start:sl_v.start + 15] == 0).all()


@pytest.mark.slow
def test_unet_skip_conv_parity():
    """skip_conv=True checkpoints port every skip conv -- including ones
    still at their identity init (the reference initializes trainable skip
    convs to identity, climsim_unet.py:211-218), which an identity-keyed
    drop would silently omit from the target's expected skipconv{i} set."""
    ref, mine, params, x, spec = _unet_pair("v5", skip_conv=True)
    n_skips = sum(1 for k in params if k.startswith("skipconv"))
    assert n_skips > 0
    tmpl = mine.init(jax.random.key(0), jnp.asarray(x[:1]))["params"]
    _check_port(tmpl, params)
    with torch.no_grad(), _promote_matmul():
        y_ref = ref(torch.tensor(x)).numpy()
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)
    # and the skip_conv=False port refuses a checkpoint it cannot hold
    state = _np_state(ref)
    key = next(k for k in state if k.startswith("skip_conv_layer")
               and k.endswith(".weight"))
    state[key] = state[key] + 0.5
    with pytest.raises(ValueError, match="skip_conv=True"):
        migrate.port_climsim_unet(state, channel_mult=(1, 2, 2, 2),
                                  num_blocks=2, skip_conv=False)


@pytest.mark.slow
def test_unet_gradient_parity():
    """Training-path equality: d(MSE)/d(params) of the reference
    ClimsimUnet equals ClimSimUNet's jax.grad under the same weight port.
    The port functions are pure layout remaps (transposes + the qkv
    channel permutation), so they apply verbatim to GRADIENT pytrees --
    porting torch's named_parameters().grad must reproduce the flax grad
    tree leaf-for-leaf.  skip_conv=True so every parameter (incl. the
    skip convs) is trainable on both sides."""
    ref, mine, params, x, spec = _unet_pair(
        "v5", skip_conv=True, model_channels=16, num_blocks=1)
    rng = np.random.default_rng(13)
    tgt = rng.standard_normal((2, spec.output_len))

    xt = torch.tensor(x)
    with _promote_matmul():
        loss_ref = ((ref(xt) - torch.tensor(tgt)) ** 2).mean()
    loss_ref.backward()
    grad_state = {k: p.grad.detach().numpy()
                  for k, p in ref.named_parameters()}
    ported_grads = _f64(migrate.port_climsim_unet(
        grad_state, channel_mult=(1, 2, 2, 2), num_blocks=1,
        skip_conv=True))

    def loss_fn(p):
        y = mine.apply({"params": p}, jnp.asarray(x))
        return jnp.mean((y - jnp.asarray(tgt)) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(loss_ref.detach()),
                               rtol=1e-9, atol=1e-12)
    _check_port(grads, ported_grads)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(ported_grads)
    flat = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
    # keyed compare (tree defs may order dict keys differently)
    ref_map = dict(flat_ref)
    for path, g in flat.items():
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref_map[path]),
            rtol=1e-6, atol=1e-10, err_msg=str(path))


@pytest.mark.slow
def test_unet_loc_embedding_off_parity():
    """loc_embedding=False routes every column through embedding row 0
    (climsim_unet.py:295-303); both implementations must agree."""
    ref, mine, params, x, spec = _unet_pair(
        "v5", loc_embedding=False, output_prune=False)
    with torch.no_grad(), _promote_matmul():
        y_ref = ref(torch.tensor(x)).numpy()
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)


# ---------------------------------------------------------------------------
# Keras builders: MLP trial model, ED, CNN
# ---------------------------------------------------------------------------

@pytest.fixture
def keras_f64():
    import keras
    old = keras.backend.floatx()
    keras.backend.set_floatx("float64")
    yield keras
    keras.backend.set_floatx(old)


def _dense_weights(model):
    out = []
    for layer in model.layers:
        w = layer.get_weights()
        if len(w) == 2 and w[0].ndim == 2:
            out.append((np.asarray(w[0], np.float64),
                        np.asarray(w[1], np.float64)))
    return out


def test_keras_mlp_parity(keras_f64):
    """The reference MyHyperModel.build (hpo_baseline_v1.py:64-137) at its
    default hp (2 layers x 128, relu) vs ClimSimMLP with ported weights."""
    mod = ts.load_keras_mlp_module()
    hm = mod.MyHyperModel(n_samples=3072 * 10, tds=None, tds_val=None)
    ref = hm.build(ts.FixedHp())
    dw = _dense_weights(ref)
    assert len(dw) == 2 + 1 + 2  # trunk x2, prehead, linear/relu heads
    spec = get_varspec("v1")
    mine = ClimSimMLP(spec=spec, hidden=(128, 128), activation="relu",
                      **F64)
    params = _f64(migrate.port_keras_mlp(dw))
    x = np.random.default_rng(8).standard_normal((8, 124))
    tmpl = mine.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_port(tmpl, params)
    y_ref = np.asarray(ref(x))
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-9, atol=1e-11)


def test_keras_ed_parity(keras_f64):
    """The literal reference ED construction lines
    (ClimSIM_ED_1_3_train.py:56-88) vs EncoderDecoder."""
    ref = ts.build_keras_ed()
    enc = [l for l in ref.layers if l.name == "encoder"][0]
    dec = [l for l in ref.layers if l.name == "decoder"][0]
    ew = _dense_weights(enc)
    dw = _dense_weights(dec)
    assert len(ew) == 7 and len(dw) == 7
    spec = get_varspec("v1")
    mine = EncoderDecoder(spec=spec, intermediate=463, latent=5, **F64)
    params = _f64(migrate.port_keras_ed(ew, dw))
    x = np.random.default_rng(9).standard_normal((8, 124))
    tmpl = mine.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_port(tmpl, params)
    y_ref = np.asarray(ref(x), np.float64)
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    # the cached ED model may have been built at f32 if another test built
    # it first; compare at the weaker of the two precisions (check the RAW
    # layer dtypes -- _dense_weights pre-casts its copies to f64)
    tol = dict(rtol=1e-9, atol=1e-11)
    if any(w.dtype == np.float32 for layer in enc.layers
           for w in layer.get_weights()):  # pragma: no cover
        tol = dict(rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y, y_ref, **tol)


def test_keras_cnn_parity(keras_f64):
    """The reference CNNHyperModel.build (hpo_train.py:124-236) vs
    ClimSimCNN(scalar_head='relu') with ported weights."""
    mod = ts.load_keras_cnn_module()
    ref = mod.CNNHyperModel().build()
    convs = []
    for layer in ref.layers:
        w = layer.get_weights()
        if len(w) == 2:
            convs.append((np.asarray(w[0], np.float64),
                          np.asarray(w[1], np.float64)))
    assert len(convs) == 3 * 12 + 3
    spec = get_varspec("v1")
    mine = ClimSimCNN(spec=spec, depth=12, channels=406, dropout=0.0,
                      scalar_head="relu", **F64)
    params = _f64(migrate.port_keras_cnn(convs, depth=12))
    x = np.random.default_rng(10).standard_normal((4, 60, 6))
    tmpl = mine.init(jax.random.key(0), jnp.asarray(x))["params"]
    _check_port(tmpl, params)
    y_ref = np.asarray(ref(x), np.float64)
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-8, atol=1e-10)


def test_keras_cnn_adjusted_losses_parity(keras_f64):
    """mse_adjusted / mae_adjusted (hpo_train.py:114-121) vs
    train.losses.channel_adjusted on the channelized view."""
    import tensorflow as tf

    from climsim_tpu.train.losses import channel_adjusted
    mod = ts.load_keras_cnn_module()
    # Keras-2 -> Keras-3 rename only: the script's `K` (keras.backend) lost
    # abs/square/mean in Keras 3; keras.ops provides the same functions
    mod.K = keras_f64.ops
    spec = get_varspec("v1")
    rng = np.random.default_rng(11)
    yt = rng.standard_normal((8, 60, 10))
    yp = rng.standard_normal((8, 60, 10))
    ref_mae = float(mod.mae_adjusted(tf.constant(yt), tf.constant(yp)))
    ref_mse = float(mod.mse_adjusted(tf.constant(yt), tf.constant(yp)))
    mine_mae = float(channel_adjusted(jnp.asarray(yp), jnp.asarray(yt),
                                      spec, kind="mae"))
    mine_mse = float(channel_adjusted(jnp.asarray(yp), jnp.asarray(yt),
                                      spec, kind="mse"))
    np.testing.assert_allclose(mine_mae, ref_mae, rtol=1e-12)
    np.testing.assert_allclose(mine_mse, ref_mse, rtol=1e-12)


# ---------------------------------------------------------------------------
# Classifier U-Net vs Unet_v5/training/climsim_unet_classifier.py
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("output_prune", [False, True])
def test_unet_classifier_forward_parity(output_prune):
    """Weight-port forward equality f64 for the two-stage gating network
    (ClimsimUnet_class, climsim_unet_classifier.py:35-408): same
    encoder/decoder as the regressor, 3-channel head reshaped to per-level
    class logits (B, 60, 3), and -- with output_prune (the production
    config, conf/config_single.yaml:68/71) -- class 0 forced with a
    saturating logit in the top strato_lev_out levels
    (climsim_unet_classifier.py:396-403)."""
    mod = ts.load_climsim_unet_classifier()
    if mod is None:
        pytest.skip("reference classifier sources unavailable")
    spec = get_varspec("v5")
    n_prof = len(spec.input_profile_vars)
    n_scal = len(spec.input_scalar_vars)
    kw = dict(seq_resolution=64, model_channels=16,
              channel_mult=[1, 2, 2, 2], num_blocks=1,
              attn_resolutions=[8], dropout=0.0, loc_embedding=True,
              skip_conv=False, prev_2d=False)
    torch.manual_seed(13)
    ref = mod.ClimsimUnet_class(
        num_vars_profile=n_prof, num_vars_scalar=n_scal,
        num_vars_profile_out=1, num_vars_scalar_out=0,
        output_prune=output_prune, strato_lev_out=12,
        **kw).double().eval()
    mine = ClimSimUNet(
        spec=spec, classifier=True, num_classes=3,
        model_channels=kw["model_channels"],
        channel_mult=tuple(kw["channel_mult"]),
        num_blocks=kw["num_blocks"],
        attn_resolutions=tuple(kw["attn_resolutions"]),
        seq_resolution=kw["seq_resolution"],
        loc_embedding=kw["loc_embedding"], skip_conv=kw["skip_conv"],
        prev_2d=kw["prev_2d"], output_prune=output_prune,
        strato_lev_out=12, **REF_PARITY_UNET)
    params = _f64(migrate.port_climsim_unet(
        _np_state(ref), channel_mult=tuple(kw["channel_mult"]),
        num_blocks=kw["num_blocks"], seq_resolution=kw["seq_resolution"],
        skip_conv=kw["skip_conv"]))
    tmpl = mine.init(jax.random.key(0), jnp.zeros((1, spec.input_len)))[
        "params"]
    _check_port(tmpl, params)
    rng = np.random.default_rng(23)
    x = rng.standard_normal((2, spec.input_len))
    x[:, -1] = [17.0, 212.0]  # icol in 1..384
    with torch.no_grad(), _promote_matmul():
        y_ref = ref(torch.tensor(x)).numpy()
    y = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    assert y.shape == y_ref.shape == (2, 60, 3)
    np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)
    if output_prune:
        assert (y[:, :12, 0] == 1e2).all() and (y[:, :12, 1:] == 0).all()
    else:
        assert not (y[:, :12, 0] == 1e2).all()
