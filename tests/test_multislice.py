"""Multi-slice (DCN) mesh layout: data axis spans slices, model axis
stays intra-slice (parallel/mesh.py:make_multislice_mesh).
"""

import jax
import numpy as np

from climsim_tpu.data.synthetic import synthetic_split
from climsim_tpu.grid import load_default_grid
from climsim_tpu.norms import compute_norms_from_data
from climsim_tpu.parallel.mesh import (ShardingRules, make_mesh,
                                       make_multislice_mesh)
from climsim_tpu.train import recipes
from climsim_tpu.varspec import get_varspec

SPEC = get_varspec("v1")
GRID = load_default_grid()


def test_multislice_layout_and_fallback():
    devs = jax.devices("cpu")[:8]
    # 2 slices x 4 chips, model axis 2 inside each slice
    mesh = make_multislice_mesh(num_model=2, devices=devs,
                                slice_indices=[0, 0, 0, 0, 1, 1, 1, 1])
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    # data rows 0-1 entirely in slice 0, rows 2-3 in slice 1: batch data
    # never crosses DCN, only gradient reductions do
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    slice0 = {d.id for d in devs[:4]}
    assert set(ids[:2].ravel()) <= slice0
    assert set(ids[2:].ravel()).isdisjoint(slice0)
    # each model-axis pair lives in one slice
    for row in ids:
        assert (set(row) <= slice0) or set(row).isdisjoint(slice0)

    # single-slice fallback == make_mesh
    m1 = make_multislice_mesh(num_model=2, devices=devs)
    m2 = make_mesh(num_model=2, devices=devs)
    assert m1.devices.shape == m2.devices.shape

    # uneven slices rejected
    try:
        make_multislice_mesh(devices=devs,
                             slice_indices=[0, 0, 0, 1, 1, 1, 1, 1])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_multislice_training_step_matches_flat_mesh():
    """A train step on the slice-aware mesh computes the same result as
    on the flat mesh (layout changes placement, not math)."""
    x, y = synthetic_split(SPEC, n=512, grid=GRID, seed=0, noise=0.02)
    stats = compute_norms_from_data(SPEC, x, y)
    devs = jax.devices("cpu")[:8]

    def step_on(mesh):
        rules = ShardingRules(mesh)
        tr = recipes.mlp_trainer(SPEC, stats, (x, y),
                                 jax.random.PRNGKey(3), hidden=(32,),
                                 rules=rules, steps_per_epoch=2)
        st, m = tr.train_step(tr.state, *rules.shard_batch(x[:256], y[:256]))
        return float(m["loss"]), jax.device_get(st.params)

    l_ms, p_ms = step_on(make_multislice_mesh(
        num_model=1, devices=devs, slice_indices=[0, 0, 0, 0, 1, 1, 1, 1]))
    l_flat, p_flat = step_on(make_mesh(num_data=8, devices=devs))
    np.testing.assert_allclose(l_ms, l_flat, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ms), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
