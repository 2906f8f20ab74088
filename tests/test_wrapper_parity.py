"""Coupling-wrapper golden parity against the reference's OWN wrapper code.

The (B, 368) array the wrapper emits is the exact contract E3SM consumes
(online_testing/README.md section 3.1).  These tests execute the reference's
runnable `class NewModel` -- extracted from the v5/v4/v2_nn_wrapper.ipynb
notebooks (torchshim.load_nn_wrapper) and instantiated around the
weight-ported reference models -- and assert raw-features-in ->
raw-tendencies-out equality at f64 against the jax wrappers in
climsim_tpu/online/wrapper.py, with identical sub/div/out_scale/lambda
vectors on both sides.  Covers in one assertion per layout:
  pre:  v4->v5 feature conversion (v5 only), cloud exponential transform,
        (x - sub)/div, nan/inf -> 0, cloud-input stratosphere prune, RH clip
  post: stratosphere output zeroing, un-scaling
  v5:   apply_temperature_rules cloud repartitioning at the advanced T

Divisions: the reference divides by div/out_scale, the jax path multiplies
by the reciprocal; the shared vectors here are exact powers of two so both
are bit-identical and tolerances measure the real pipeline, not reciprocal
rounding.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torchshim as ts  # noqa: E402
from test_model_parity import _f64, _np_state, _promote_matmul, _unet_pair  # noqa: E402

from climsim_tpu.norms import NormStats  # noqa: E402
from climsim_tpu.online import wrapper as W  # noqa: E402
from climsim_tpu.data import transforms as T  # noqa: E402
from climsim_tpu.utils import migrate  # noqa: E402
from climsim_tpu.varspec import get_varspec  # noqa: E402

pytestmark = pytest.mark.skipif(not ts.reference_available(),
                                reason="reference tree not present")


# ---------------------------------------------------------------------------
# shared fixtures: stats vectors + raw inputs
# ---------------------------------------------------------------------------

def _pow2(rng, n):
    return 2.0 ** rng.integers(-2, 3, n).astype(np.float64)


def _shared_stats(spec, rng, icol_tail=False, **lbd):
    """Random but reference-shaped norm vectors; div/out_scale are powers
    of two (see module docstring)."""
    sub = rng.normal(0.0, 0.05, spec.input_len)
    div = _pow2(rng, spec.input_len)
    osc = _pow2(rng, spec.output_len)
    if icol_tail:
        # the U-Nets one-hot the LAST normalized feature as the location
        # index (climsim_unet.py:292-299); identity-normalize it so the
        # shared raw icol stays integral in 0..384 on both sides
        sub[-1], div[-1] = 0.0, 1.0
    return NormStats(inp_sub=sub, inp_div=div, out_scale=osc, **lbd)


def _raw_v4(n, rng, icol=True):
    """Physical-magnitude raw v4 (B, 1525) batch: t spans the liquid-ice
    ramp, rh exercises the clip, clouds are wet enough to repartition, and
    two lanes carry nan/inf to exercise the masking."""
    x = rng.standard_normal((n, 1525)) * 0.1
    x[:, 0:60] = rng.uniform(200.0, 310.0, (n, 60))     # t across the ramp
    x[:, 60:120] = rng.uniform(0.0, 1.4, (n, 60))       # rh (clip active)
    x[:, 120:180] = rng.uniform(0.0, 2e-4, (n, 60))     # qc
    x[:, 180:240] = rng.uniform(0.0, 2e-4, (n, 60))     # qi
    if icol:
        x[:, -1] = rng.integers(1, 385, n)
    x[0, 400] = np.nan                                   # state_t_dyn lane
    x[1, 460] = np.inf                                   # state_q0_dyn lane
    return x


class _f64_torch:
    """torch default-dtype f64 scope: NewModel's forward allocates
    torch.zeros(...) without a dtype (follows the default), and its
    __init__ hard-casts the stat vectors to float32 -- the caller
    re-assigns those after construction."""

    def __enter__(self):
        self._prev = torch.get_default_dtype()
        torch.set_default_dtype(torch.float64)

    def __exit__(self, *a):
        torch.set_default_dtype(self._prev)


def _widen_stats(nm, **vecs):
    for k, v in vecs.items():
        setattr(nm, k, torch.tensor(np.asarray(v), dtype=torch.float64))


# ---------------------------------------------------------------------------
# v5: NewModel(ClimsimUnet v5) vs make_wrapper  (the flagship contract)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def v5_setup():
    NewModel = ts.load_nn_wrapper("v5")
    if NewModel is None:
        pytest.skip("v5_nn_wrapper.ipynb NewModel cell not found in the "
                    "reference tree")
    ref, mine, params, _x, spec = _unet_pair("v5", model_channels=16,
                                             num_blocks=1)
    rng = np.random.default_rng(42)
    stats = _shared_stats(spec, rng, icol_tail=True,
                          lbd_qn=rng.uniform(0.5, 2.0, 60))
    with _f64_torch():
        nm = NewModel(ref, stats.inp_sub, stats.inp_div, stats.out_scale,
                      stats.lbd_qn).eval()
    _widen_stats(nm, input_sub=stats.inp_sub, input_div=stats.inp_div,
                 out_scale=stats.out_scale, lbd_qn=stats.lbd_qn)
    wrap = W.make_wrapper(
        lambda p, xx: mine.apply({"params": p}, xx), stats,
        W.WrapperConfig(input_version="v4", dtype=jnp.float64))
    x_raw = _raw_v4(8, rng)
    return nm, wrap, params, x_raw, spec


@pytest.mark.slow
def test_v5_wrapper_end_to_end_parity(v5_setup):
    """raw v4 (B, 1525) -> (B, 368) equality through the reference's OWN
    NewModel (v5_nn_wrapper.ipynb cell 5): conversion, lambda-transform,
    normalize, prune, clip, forward, zero, unscale, repartition."""
    nm, wrap, params, x_raw, _spec = v5_setup
    with torch.no_grad(), _f64_torch(), _promote_matmul():
        y_ref = nm(torch.tensor(x_raw, dtype=torch.float64)).numpy()
    y = np.asarray(wrap(params, jnp.asarray(x_raw)))
    assert y.shape == y_ref.shape == (8, 368)
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)


@pytest.mark.slow
def test_v5_preprocessing_stage_parity(v5_setup):
    """Stage-level localization: NewModel.preprocessing (v4->1405
    conversion + lambda + normalize + mask + prune + clip) against
    convert_v4_to_v5 + make_input_transform alone."""
    nm, _wrap, _params, x_raw, spec = v5_setup
    with torch.no_grad(), _f64_torch():
        got_ref = nm.preprocessing(
            torch.tensor(x_raw, dtype=torch.float64)).numpy()
    stats = NormStats(inp_sub=np.asarray(nm.input_sub),
                      inp_div=np.asarray(nm.input_div),
                      out_scale=np.asarray(nm.out_scale),
                      lbd_qn=np.asarray(nm.lbd_qn))
    in_t = T.make_input_transform(
        spec, stats, T.TransformConfig(qn_transform=True, qinput_prune=True,
                                       strato_lev=15, input_clip=True,
                                       input_clip_rhonly=True),
        dtype=jnp.float64)
    got = np.asarray(in_t(W.convert_v4_to_v5(jnp.asarray(x_raw))))
    np.testing.assert_allclose(got, got_ref, rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# v4: NewModel(ClimsimUnet v4) vs make_v4_wrapper  (native 1525 -> 368)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_v4_wrapper_end_to_end_parity():
    """The second E3SM-linked layout (v4_nn_wrapper.ipynb): separate qc/qi
    exponential transforms, both cloud inputs pruned, 368-wide output
    zeroed 5 blocks deep with liquid cloud at 28 levels -- no conversion,
    no repartition."""
    NewModel = ts.load_nn_wrapper("v4")
    if NewModel is None:
        pytest.skip("v4_nn_wrapper.ipynb NewModel cell not found in the "
                    "reference tree")
    ref, mine, params, _x, spec = _unet_pair("v4", model_channels=16,
                                             num_blocks=1)
    rng = np.random.default_rng(43)
    stats = _shared_stats(spec, rng, icol_tail=True,
                          lbd_qc=rng.uniform(0.5, 2.0, 60),
                          lbd_qi=rng.uniform(0.5, 2.0, 60))
    with _f64_torch():
        nm = NewModel(ref, stats.inp_sub, stats.inp_div, stats.out_scale,
                      stats.lbd_qc, stats.lbd_qi).eval()
    _widen_stats(nm, input_sub=stats.inp_sub, input_div=stats.inp_div,
                 out_scale=stats.out_scale, lbd_qc=stats.lbd_qc,
                 lbd_qi=stats.lbd_qi)
    wrap = W.make_v4_wrapper(lambda p, xx: mine.apply({"params": p}, xx),
                             stats, spec, dtype=jnp.float64)
    x_raw = _raw_v4(8, rng)
    with torch.no_grad(), _f64_torch(), _promote_matmul():
        y_ref = nm(torch.tensor(x_raw, dtype=torch.float64)).numpy()
    y = np.asarray(wrap(params, jnp.asarray(x_raw)))
    assert y.shape == y_ref.shape == (8, 368)
    np.testing.assert_allclose(y, y_ref, rtol=1e-7, atol=1e-10)
    # the 28-deep liquid-cloud zeroing is real on both sides
    assert (y[:, 120:148] == 0).all() and (y_ref[:, 120:148] == 0).all()


# ---------------------------------------------------------------------------
# v2: NewModel(MLP_v2rh) vs make_v2rh_wrapper  (the third linked layout)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_v2_wrapper_end_to_end_parity():
    """v2_nn_wrapper.ipynb around the reference MLP: identical transform
    chain to v4 on the 557-wide v2_rh layout.  The jax side passes the
    notebook-exact tcfg/out_zero explicitly (the repo default stays
    clip-only for models trained without the cloud transform)."""
    NewModel = ts.load_nn_wrapper("v2")
    if NewModel is None:
        pytest.skip("v2_nn_wrapper.ipynb NewModel cell not found in the "
                    "reference tree")
    mod = ts.load_mlp_v2rh()
    from climsim_tpu.models import OnlineMLP

    spec = get_varspec("v2_rh")
    layers, hidden = 2, 32
    torch.manual_seed(11)
    ref = mod.MLP(in_dims=spec.input_len, out_dims=spec.output_len,
                  hidden_dims=hidden, layers=layers,
                  output_prune=False).double().eval()
    mine = OnlineMLP(spec=spec, hidden=(hidden,) * layers,
                     output_prune=False, compute_dtype=jnp.float64)
    params = _f64(migrate.port_online_mlp(_np_state(ref), layers))

    rng = np.random.default_rng(44)
    stats = _shared_stats(spec, rng,
                          lbd_qc=rng.uniform(0.5, 2.0, 60),
                          lbd_qi=rng.uniform(0.5, 2.0, 60))
    with _f64_torch():
        nm = NewModel(ref, stats.inp_sub, stats.inp_div, stats.out_scale,
                      stats.lbd_qc, stats.lbd_qi).eval()
    _widen_stats(nm, input_sub=stats.inp_sub, input_div=stats.inp_div,
                 out_scale=stats.out_scale, lbd_qc=stats.lbd_qc,
                 lbd_qi=stats.lbd_qi)
    wrap = W.make_v2rh_wrapper(
        lambda p, xx: mine.apply({"params": p}, xx), stats, spec,
        tcfg=T.TransformConfig(qn_transform=True, qinput_prune=True,
                               strato_lev=15, input_clip=True,
                               input_clip_rhonly=True),
        out_zero=W.V4_OUT_ZERO, dtype=jnp.float64)

    x_raw = _raw_v4(8, rng, icol=False)[:, :spec.input_len].copy()
    with torch.no_grad(), _f64_torch():
        y_ref = nm(torch.tensor(x_raw, dtype=torch.float64)).numpy()
    y = np.asarray(wrap(params, jnp.asarray(x_raw)))
    assert y.shape == y_ref.shape == (8, 368)
    np.testing.assert_allclose(y, y_ref, rtol=1e-8, atol=1e-11)
