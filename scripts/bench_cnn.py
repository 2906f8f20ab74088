#!/usr/bin/env python
"""CNN throughput experiments (VERDICT round-1 item 9).

Measures the CNN train step under candidate TPU optimizations:
  * lane-aligned channel counts (384 / 512 vs the reference's 406 --
    the MXU pads the channel contraction to multiples of 128, so 406
    wastes up to 26% of the output tile)
  * dropout RNG cost (threefry vs rbg generator, dropout off)
  * f32 vs bf16 conv activations

Prints a table and the winner's speedup vs the reference configuration.
Run on the TPU chip: python scripts/bench_cnn.py [--batch 4096] [--steps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_step(fn, state, xb, yb, steps, warmup=5):
    import jax

    for _ in range(warmup):
        state, m = fn(state, xb, yb)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = fn(state, xb, yb)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--depth", type=int, default=12)
    args = ap.parse_args(argv)

    import jax

    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v1")
    stats = load_asset_norms("v1")
    grid = load_default_grid()
    x, y = synthetic_split(spec, args.batch, grid, seed=0)
    xb, yb = x, y

    results = {}

    def run(name, channels=406, dropout=0.175, rng_impl=None):
        if rng_impl is not None:
            jax.config.update("jax_default_prng_impl", rng_impl)
        tr = recipes.cnn_trainer(spec, stats, (x, y), jax.random.PRNGKey(0),
                                 depth=args.depth, channels=channels,
                                 dropout=dropout, steps_per_epoch=100)
        dt = bench_step(tr.train_step, tr.state, xb, yb, args.steps)
        if rng_impl is not None:
            jax.config.update("jax_default_prng_impl", "threefry2x32")
        results[name] = dt
        print(f"{name:38s} {dt * 1e3:8.2f} ms  "
              f"{args.batch / dt:12,.0f} samples/s")
        return dt

    base = run("baseline (406ch, dropout, threefry)")
    run("channels=384 (3x128 lanes)", channels=384)
    run("channels=512 (4x128 lanes)", channels=512)
    run("dropout off", dropout=0.0)
    run("rbg dropout rng", rng_impl="rbg")
    run("channels=384 + rbg", channels=384, rng_impl="rbg")
    run("channels=512 + rbg", channels=512, rng_impl="rbg")

    best = min(results, key=results.get)
    print(f"\nbest: {best}  speedup vs baseline: "
          f"{base / results[best]:.2f}x")
    return results


if __name__ == "__main__":
    main()
