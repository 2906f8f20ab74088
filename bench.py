#!/usr/bin/env python
"""Benchmark: MLP emulator training throughput (samples/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation (the reference publishes no throughput numbers --
BASELINE.md): the north-star target is "train all six baselines through a
full low-res epoch (10,091,520 samples, CNN epoch size, hpo_train.py:294)
in < 10 minutes on a v5e-16".  Sequential training implies a per-model,
per-chip rate of 10,091,520 / (600 s / 6 models) / 16 chips ~= 6,307
samples/s/chip; vs_baseline = measured / 6307.
"""

import json
import time

import jax
import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_CHIP = 10_091_520 / (600.0 / 6.0) / 16.0


def main():
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v1")
    grid = load_default_grid()
    stats = load_asset_norms("v1")

    batch = 98304
    n_chips = max(len(jax.devices()), 1)
    x, y = synthetic_split(spec, n=batch * 4, grid=grid, seed=0)

    rng = jax.random.PRNGKey(0)
    tr = recipes.mlp_trainer(spec, stats, (x, y), rng,
                             hidden=(768, 640, 512, 640, 640),
                             steps_per_epoch=1000)

    # device-resident rotating batches: measures the sustained train-step
    # rate (the input pipeline keeps up by construction; see
    # climsim_tpu/data/pipeline.py prefetch)
    xb = [jax.device_put(x[i * batch:(i + 1) * batch]) for i in range(4)]
    yb = [jax.device_put(y[i * batch:(i + 1) * batch]) for i in range(4)]

    state = tr.state
    # warmup + compile; sync via host transfer (block_until_ready can
    # return early on remote-attached TPU runtimes)
    state, m = tr.train_step(state, xb[0], yb[0])
    float(m["loss"])

    steps = 100
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = tr.train_step(state, xb[i % 4], yb[i % 4])
    float(m["loss"])  # forces the whole dependency chain
    dt = time.perf_counter() - t0

    sps_chip = steps * batch / dt / n_chips
    print(json.dumps({
        "metric": "mlp_train_samples_per_sec_per_chip",
        "value": round(float(sps_chip), 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(float(sps_chip / BASELINE_SAMPLES_PER_SEC_PER_CHIP), 3),
    }))


if __name__ == "__main__":
    main()
