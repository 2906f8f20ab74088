#!/usr/bin/env python
"""Measure the beyond-HBM streaming path (ChunkedLoader) on TPU.

The high-res dataset (41.2 TB, 5.7B samples) cannot live in HBM, so
training streams superbatches while the device runs K fused steps per
dispatch (data/pipeline.py:ChunkedLoader).  The number that matters is
OVERLAP: steady-state wall time per superbatch should approach
max(H2D transfer, K*step compute), not their sum.  We measure all three
legs separately:

  compute  -- K steps on a device-resident superbatch (no transfer)
  transfer -- device_put of superbatches alone (no compute)
  overlap  -- the real ChunkedLoader loop with prefetch

and report efficiency = max(compute, transfer) / overlap (1.0 = perfect).
Absolute transfer rates here are bounded by the dev tunnel (~30 MB/s);
production hosts feed over PCIe at GB/s, flipping the bound to compute
-- the efficiency number is what transfers.

Run on TPU: python scripts/bench_chunked.py [batch] [steps_per_chunk]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from climsim_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    from climsim_tpu.data.pipeline import ChunkedLoader
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"backend: {jax.default_backend()}  batch={batch} K={k}")

    spec = get_varspec("v1")
    grid = load_default_grid()
    stats = load_asset_norms("v1")
    n = batch * k * 4  # 4 superbatches per epoch
    x, y = synthetic_split(spec, n=n, grid=grid, seed=0)
    sb_bytes = (x.nbytes + y.nbytes) // 4

    tr = recipes.mlp_trainer(spec, stats, (x, y), jax.random.PRNGKey(0),
                             hidden=(768, 640, 512, 640, 640),
                             steps_per_epoch=1000)
    loader = ChunkedLoader(x, y, batch, steps_per_chunk=k, seed=0)
    run = loader.make_chunk_runner(tr.train_step)

    # --- compute leg: K steps on a RESIDENT superbatch ------------------
    xc = jax.device_put(x[: batch * k].reshape(k, batch, -1))
    yc = jax.device_put(y[: batch * k].reshape(k, batch, -1))
    state, m = run(tr.state, xc, yc)          # compile + warm
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        state, m = run(state, xc, yc)
        float(jax.device_get(m["loss"]))
    t_compute = (time.perf_counter() - t0) / reps

    # --- transfer leg: H2D of superbatches alone, PIPELINED -------------
    # put all reps back-to-back and sync once at the end; a per-put sync
    # would leave the link idle between chunks and understate capacity
    # (the loader's producer thread keeps puts in flight the same way)
    host_x = np.asarray(x[: batch * k].reshape(k, batch, -1))
    host_y = np.asarray(y[: batch * k].reshape(k, batch, -1))
    t0 = time.perf_counter()
    bufs = []
    for _ in range(reps):
        bufs.append((jax.device_put(host_x), jax.device_put(host_y)))
    for xb, yb in bufs:
        float(jax.device_get(xb[0, 0, 0]))
        float(jax.device_get(yb[-1, -1, 0]))
    t_transfer = (time.perf_counter() - t0) / reps
    del bufs

    # --- overlapped: the real streaming loop ----------------------------
    # one warm epoch, then timed epochs; the loader's background thread
    # prefetches the next superbatch while the device trains on this one
    for xb, yb in loader:
        state, m = run(state, xb, yb)
    float(jax.device_get(m["loss"]))
    n_chunks = loader.plan.steps
    t0 = time.perf_counter()
    for _ in range(reps):
        for xb, yb in loader:
            state, m = run(state, xb, yb)
        float(jax.device_get(m["loss"]))
    t_overlap = (time.perf_counter() - t0) / (reps * n_chunks)

    bound = max(t_compute, t_transfer)
    eff = bound / t_overlap
    rate = batch * k / t_overlap
    print(f"superbatch: {sb_bytes/1e6:.1f} MB ({k}x{batch} rows)")
    print(f"compute  : {t_compute*1e3:8.1f} ms/superbatch "
          f"({batch*k/t_compute/1e6:.2f}M samples/s)")
    print(f"transfer : {t_transfer*1e3:8.1f} ms/superbatch "
          f"({sb_bytes/t_transfer/1e6:.0f} MB/s)")
    print(f"overlap  : {t_overlap*1e3:8.1f} ms/superbatch "
          f"({rate/1e6:.2f}M samples/s)")
    print(f"bound    : {bound*1e3:8.1f} ms ({'transfer' if t_transfer > t_compute else 'compute'}-bound)")
    print(f"overlap efficiency: {eff:.2f} (1.0 = wall == max leg)")


if __name__ == "__main__":
    main()
