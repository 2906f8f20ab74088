#!/usr/bin/env python
"""A/B the fused GN->silu->conv3 Pallas block INSIDE the U-Net training
step (ClimSimUNet fused_gn_conv flag) at the flagship bench shape.

VERDICT r4 #4: the isolated chain wins 1.5-3x but the all-kernel forward
loses; the untested middle ground is the single positive block inside the
otherwise-XLA training step, gradients via the custom VJP
(ops/unet_fused.py make_trainable_fused_block).  This measures that:
same pool, same batch, same fused-epoch runner, flag off vs on.

Usage: python scripts/bench_unet_fused_train.py [--epochs 16 --repeats 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climsim_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

BATCH = 4096
POOL = 32768
MODEL_KW = dict(model_channels=128, channel_mult=(1, 2, 2, 2),
                num_blocks=4, attn_resolutions=(8,),
                output_prune=True, strato_lev_out=15)


def bench_arm(arm_name, kw_over, epochs, repeats):
    import jax

    from climsim_tpu.data.pipeline import DeviceResidentLoader
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train import recipes
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v5")
    grid = load_default_grid()
    stats = load_asset_norms("v5")
    x, y = synthetic_split(spec, POOL, grid=grid, seed=0)
    import numpy as np

    x[:, spec.input_slices["icol"]] = (
        np.arange(x.shape[0]) % 384 + 1)[:, None]
    tr = recipes.unet_trainer(
        spec, stats, (x[:BATCH], y[:BATCH]), jax.random.PRNGKey(0),
        model_kw=dict(MODEL_KW, **kw_over))
    loader = DeviceResidentLoader(x, y, BATCH, seed=0, block_shuffle=128)
    float(jax.device_get(loader.x[0, 0]))
    float(jax.device_get(loader.y[-1, 0]))
    run = loader.make_epoch_runner(tr.train_step)
    run.precompile(tr.state, epochs)

    walls, state = [], tr.state
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, m = run(state, epochs)
        loss = float(jax.device_get(m["loss"][-1]))
        walls.append(time.perf_counter() - t0)
    rows = epochs * loader.steps_per_epoch * BATCH
    row = dict(arm=arm_name, rows=rows,
               wall_best=round(min(walls), 3),
               wall_all=[round(w, 3) for w in walls],
               samples_per_s=round(rows / min(walls), 1),
               s_per_true_epoch=round(min(walls) * 10_091_520 / rows, 2),
               loss=round(loss, 5))
    print(json.dumps(row), flush=True)
    return row


ARMS = {
    "xla": {},
    "fused": dict(fused_gn_conv=True),
    "remat": dict(remat_blocks=True),
    "bf16norm": dict(norm_dtype="bfloat16"),
    "remat+bf16norm": dict(remat_blocks=True, norm_dtype="bfloat16"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--arms", default="xla,fused")
    args = ap.parse_args(argv)
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    rows = {}
    for arm in [a.strip() for a in args.arms.split(",") if a.strip()]:
        kw = dict(ARMS[arm])
        if kw.get("norm_dtype") == "bfloat16":
            kw["norm_dtype"] = jnp.bfloat16
        rows[arm] = bench_arm(arm, kw, args.epochs, args.repeats)
    if "xla" in rows:
        base = rows["xla"]["wall_best"]
        print(json.dumps(dict(
            metric="unet_train_arm_speedups",
            speedups={a: round(base / r["wall_best"], 3)
                      for a, r in rows.items()})), flush=True)


if __name__ == "__main__":
    main()
