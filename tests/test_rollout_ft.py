"""Differentiable K-step rollout fine-tuning (train/rollout_ft.py).

The capability the reference structurally lacks (its host model is an
external Fortran E3SM build behind a TorchScript boundary,
online_testing/README.md section 5): gradients of a trajectory loss
through host dynamics + wrapper + K emulator applications.
"""

import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.data.synthetic import synthetic_inputs
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import load_asset_norms
from climsim_tpu.online import wrapper as W
from climsim_tpu.online.driver import HybridDriver, initial_state
from climsim_tpu.train.rollout_ft import (make_finetune_step,
                                          make_rollout_loss,
                                          trajectory_stds)
from climsim_tpu.varspec import get_varspec

SPEC4 = get_varspec("v4")
SPEC5 = get_varspec("v5")
GRID = load_default_grid()
STATS5 = load_asset_norms("v5")


def _setup(n=6, hidden=(24,)):
    from climsim_tpu.models import OnlineMLP

    model = OnlineMLP(spec=SPEC5, hidden=hidden)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, SPEC5.input_len)))
    wrap = W.make_wrapper(model.apply, STATS5,
                          W.WrapperConfig(input_version="v4"))
    hybrid = HybridDriver(wrap, GRID)

    # reference system: an independently-seeded model of the same family
    ref_params = model.init(jax.random.PRNGKey(7),
                            jnp.zeros((2, SPEC5.input_len)))
    reference = HybridDriver(wrap, GRID)

    x0 = synthetic_inputs(SPEC4, n, GRID, seed=3).astype(np.float32)
    s0 = initial_state(x0, GRID)
    return hybrid, reference, params, ref_params, s0


def test_trajectory_stds_shapes():
    hybrid, reference, params, ref_params, s0 = _setup()
    _, traj = reference.rollout(ref_params, s0, 5)
    stds = trajectory_stds({k: np.asarray(v) for k, v in traj.items()
                            if k in ("t", "q1", "qn", "u")})
    for k in ("t", "q1", "qn", "u"):
        assert stds[k].shape == (60,)
        assert np.all(stds[k] > 0)


def test_rollout_loss_zero_when_identical():
    """Hybrid == reference (same params) -> exactly zero loss."""
    hybrid, reference, params, _, s0 = _setup()
    stds = {k: np.ones(60, np.float32) for k in ("t", "q1", "qn", "u")}
    loss_fn = make_rollout_loss(hybrid, reference, 3, stds,
                                reference_params=params)
    assert float(loss_fn(params, s0)) == 0.0


def test_finetune_reduces_rollout_loss():
    """A few updates on the K-step loss must reduce it (gradients flow
    through the scan rollout), and must not touch the reference branch."""
    hybrid, reference, params, ref_params, s0 = _setup()
    _, traj = reference.rollout(ref_params, s0, 6)
    stds = trajectory_stds({k: np.asarray(v) for k, v in traj.items()
                            if k in ("t", "q1", "qn", "u")})
    loss_fn = make_rollout_loss(hybrid, reference, 4, stds,
                                reference_params=ref_params)
    step_fn, opt_init = make_finetune_step(
        hybrid, reference, 4, stds, learning_rate=3e-3, total_steps=8,
        reference_params=ref_params)
    l0 = float(loss_fn(params, s0))
    assert l0 > 0.0
    opt_state = opt_init(params)
    p = params
    for _ in range(8):
        p, opt_state, _ = step_fn(p, opt_state, s0)
    l1 = float(loss_fn(p, s0))
    assert l1 < 0.8 * l0, (l0, l1)


def test_finetune_gradient_nonzero_through_wrapper_constraints():
    """The wrapper applies clips/prune/repartition; the path must still
    carry gradient to every parameter leaf."""
    hybrid, reference, params, ref_params, s0 = _setup()
    stds = {k: np.ones(60, np.float32) for k in ("t", "q1", "qn", "u")}
    loss_fn = make_rollout_loss(hybrid, reference, 2, stds,
                                reference_params=ref_params)
    grads = jax.grad(loss_fn)(params, s0)
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) >= len(norms) - 1  # bias-only leaf slack
