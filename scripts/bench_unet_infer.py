#!/usr/bin/env python
"""A/B the fused U-Net inference engine against flax apply on TPU.

Flagship serving shapes: B=384 (one low-res E3SM chunk), 4096, and
21,600 (a FULL high-res physics step in one call -- ne120 has 21,600
columns, website/dataset.md).  Measures (a) the bare model forward and
(b) the full coupling wrapper (v4 conversion + normalize + model +
unscale + cloud repartition).  Results go to docs/PERFORMANCE.md.

Run on TPU: python scripts/bench_unet_infer.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[:1]))


def timeit(fn, *args, iters=30):
    _sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import dataclasses

    from climsim_tpu.data.synthetic import synthetic_inputs, synthetic_targets
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.models.unet import ClimSimUNet
    from climsim_tpu.norms import (compute_exponential_lambda,
                                   compute_norms_from_data)
    from climsim_tpu.online import wrapper as W
    from climsim_tpu.ops.unet_infer import unet_apply_fused
    from climsim_tpu.varspec import get_varspec

    print(f"backend: {jax.default_backend()}")
    spec = get_varspec("v5")
    grid = load_default_grid()
    model = ClimSimUNet(spec=spec, model_channels=128,
                        channel_mult=(1, 2, 2, 2), num_blocks=4,
                        attn_resolutions=(8,), dropout=0.0,
                        output_prune=True, strato_lev_out=15)
    x0 = jnp.asarray(synthetic_inputs(spec, 2, grid, seed=0))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    flax_fn = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))
    fused_fn = jax.jit(partial(unet_apply_fused, model))

    # wrapped (the actual coupling surface): v4 raw in -> 368 raw out
    xs = synthetic_inputs(spec, 2, grid, seed=1)
    stats = compute_norms_from_data(spec, xs, synthetic_targets(spec, xs, 2))
    stats = dataclasses.replace(stats, lbd_qn=compute_exponential_lambda(
        xs[:, spec.input_slices["state_qn"]]))
    wrap_flax = jax.jit(W.make_wrapper(
        lambda p, x: model.apply({"params": p}, x, deterministic=True),
        stats))
    wrap_fused = jax.jit(W.make_wrapper(partial(unet_apply_fused, model),
                                        stats))
    n_v4 = get_varspec("v4").input_len

    print("\n| B | flax fwd (ms) | fused fwd (ms) | speedup | "
          "flax wrapped (ms) | fused wrapped (ms) | speedup |")
    print("|---|---|---|---|---|---|---|")
    for b in (384, 4096, 21600):
        rng = np.random.default_rng(0)
        x = jnp.asarray(synthetic_inputs(spec, b, grid, seed=3))
        xr = jnp.asarray(
            np.abs(rng.standard_normal((b, n_v4))).astype(np.float32))
        ya = np.asarray(flax_fn(params, x))
        yb = np.asarray(fused_fn(params, x))
        err = np.max(np.abs(ya - yb)) / (np.abs(ya).max() + 1e-9)
        iters = 30 if b <= 4096 else 10
        tf = timeit(flax_fn, params, x, iters=iters)
        tp = timeit(fused_fn, params, x, iters=iters)
        wf = timeit(wrap_flax, params, xr, iters=iters)
        wp = timeit(wrap_fused, params, xr, iters=iters)
        print(f"| {b} | {tf*1e3:.1f} | {tp*1e3:.1f} | {tf/tp:.2f}x "
              f"| {wf*1e3:.1f} | {wp*1e3:.1f} | {wf/wp:.2f}x |"
              f"  relerr {err:.1e}")


if __name__ == "__main__":
    main()
