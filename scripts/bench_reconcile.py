#!/usr/bin/env python
"""Reconcile the MLP throughput story to one defensible number.

Round-4 left three mutually unreconciled MLP rates:
  * bench.py            : 13.6M samples/s/chip (196,608-row pool, one
                          40-epoch dispatch per timing, best of 6)
  * docs/PERFORMANCE.md : 13.3M step-only / 12.7M bench.py quote
  * docs/BENCH_EPOCHS.md: 4.44M for the TRUE 10,091,520-sample epoch
                          (524,288-row pool, 20 chunked dispatches,
                          single timing)

This harness times the SAME epoch volume (>= 10,091,520 samples, batch
32768, the production fused-epoch path) across the full factor matrix
  pool rows      in {196608, 524288}   (pool-size / gather-locality effect)
  dispatch shape in {1 call of K epochs, K calls of 1 epoch}
                                       (tunnel / per-dispatch overhead)
  timing         single-shot AND best-of-6 on the same config
                                       (run-to-run jitter policy effect)
and prints one JSON line per cell plus a decomposition summary.

Usage: python scripts/bench_reconcile.py [--jsonl out.jsonl]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climsim_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

EPOCH = 10_091_520
BATCH = 32768
HIDDEN = (768, 640, 512, 640, 640)


def _sync(a):
    import jax

    float(jax.device_get(a.reshape(-1)[0]))


def bench_cell(pool_rows, n_dispatches, repeats, results, jsonl):
    import jax

    from climsim_tpu.data.pipeline import DeviceResidentLoader
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v1")
    grid = load_default_grid()
    stats = load_asset_norms("v1")
    x, y = synthetic_split(spec, pool_rows, grid=grid, seed=0)
    tr = recipes.mlp_trainer(spec, stats, (x[:BATCH], y[:BATCH]),
                             jax.random.PRNGKey(0), hidden=HIDDEN)
    loader = DeviceResidentLoader(x, y, BATCH, seed=0, block_shuffle=128)
    _sync(loader.x)
    _sync(loader.y)

    spe = loader.steps_per_epoch
    k = -(-EPOCH // (spe * BATCH))          # epochs to cover >= EPOCH rows
    c = -(-k // n_dispatches)               # epochs per dispatch
    k = c * n_dispatches
    rows = k * spe * BATCH
    run = loader.make_epoch_runner(tr.train_step)
    run.precompile(tr.state, c)

    walls = []
    state = tr.state
    for _ in range(repeats):
        t0 = time.perf_counter()
        m = None
        for _ in range(n_dispatches):
            state, m = run(state, c)
        float(jax.device_get(m["loss"][-1]))
        walls.append(time.perf_counter() - t0)

    for label, wall in (("single", walls[0]), ("best", min(walls))):
        row = dict(pool=pool_rows, dispatches=n_dispatches,
                   epochs_per_dispatch=c, rows=rows, timing=label,
                   wall_s=round(wall, 3),
                   samples_per_s=round(rows / wall, 1),
                   s_per_true_epoch=round(wall * EPOCH / rows, 3))
        print(json.dumps(row), flush=True)
        results.append(row)
        if jsonl:
            with open(jsonl, "a") as f:
                f.write(json.dumps(row) + "\n")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args(argv)

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    results = []
    for pool in (196_608, 524_288):
        for n_disp in (1, None):  # None -> one dispatch per epoch
            spe = pool // BATCH
            k = -(-EPOCH // (spe * BATCH))
            bench_cell(pool, 1 if n_disp == 1 else k, args.repeats,
                       results, args.jsonl)

    # decomposition: dispatch overhead = (K calls) - (1 call) at same pool;
    # pool effect = (524k, 1 call) - (196k, 1 call), both in s/true-epoch
    by = {(r["pool"], r["dispatches"] > 1, r["timing"]):
          r["s_per_true_epoch"] for r in results}
    try:
        summary = dict(
            metric="mlp_epoch_reconciliation",
            dispatch_overhead_s_196k=round(
                by[(196_608, True, "best")] - by[(196_608, False, "best")], 3),
            dispatch_overhead_s_524k=round(
                by[(524_288, True, "best")] - by[(524_288, False, "best")], 3),
            pool_effect_s_1disp=round(
                by[(524_288, False, "best")] - by[(196_608, False, "best")], 3),
            jitter_s_worstcase=round(
                max(by[(p, d, "single")] - by[(p, d, "best")]
                    for p in (196_608, 524_288) for d in (False, True)), 3),
        )
        print(json.dumps(summary), flush=True)
        if args.jsonl:
            with open(args.jsonl, "a") as f:
                f.write(json.dumps(summary) + "\n")
    except KeyError:
        pass
    return results


if __name__ == "__main__":
    main()
