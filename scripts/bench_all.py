#!/usr/bin/env python
"""MEASURED full-epoch wall-clocks for every baseline + the flagship.

One TRUE 10,091,520-sample epoch per model (the low-res dataset size:
384 columns x 26,280 timesteps -- BASELINE.md's north-star volume)
executed through the real production training path on the attached chip
and timed as one run, replacing the small-run extrapolations that used
to live in docs/PERFORMANCE.md ("MLP < 1 s, U-Net ~8 min" arithmetic).

Method
------
* The split is device-resident (the production low-res input path,
  data/pipeline.py DeviceResidentLoader); a resident pool of R rows is
  trained over ceil(EPOCH / (spe*batch)) fused epochs so that at least
  10,091,520 samples flow through the real train step (on-device
  reshuffle + gather + step, whole epochs per dispatch).
* The executable is AOT-precompiled (run.precompile) so the timed call
  contains zero compilation.
* Row repetition is forced by the dev tunnel (~30 MB/s H2D makes a
  10 GB unique upload an I/O artifact); wall-clock is identical to a
  unique-data epoch -- every step gathers fresh rows from HBM and runs
  the same program.  The pool is large enough (>= 0.2 GB) that nothing
  fits in on-chip caches.
* MFU = XLA-counted train-step FLOPs x steps / wall / 197 TFLOP/s (the
  v5e bf16 peak per chip).

Writes docs/BENCH_EPOCHS.md and prints one JSON line per model.

Usage: python scripts/bench_all.py [--models MLP,CNN,...] [--epoch N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# 384 cols x 26,280 steps (the full low-res training volume); overridable
# only for CPU smoke tests of the harness itself
EPOCH = int(os.environ.get("BENCH_EPOCH_ROWS", 10_091_520))
PEAK_BF16 = 197e12          # TPU v5e per-chip bf16 peak FLOP/s
NORTH_STAR_S = 600.0 / 6 / 16  # <10 min for all 6 on v5e-16 -> s/model/chip


def _sync(tree):
    """Host-transfer sync (block_until_ready can return early on the
    remote-attached runtime -- same convention as bench.py)."""
    import jax

    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def bench_generic(name, make_trainer, spec_name, batch, pool_rows,
                  results, chunk_epochs=None):
    import jax

    from climsim_tpu.data.pipeline import DeviceResidentLoader
    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.utils.profiling import cost_analysis
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec(spec_name)
    grid = load_default_grid()
    stats = load_asset_norms(spec_name)
    x, y = synthetic_split(spec, pool_rows, grid=grid, seed=0)
    rng = jax.random.PRNGKey(0)
    tr = make_trainer(spec, stats, (x[:batch], y[:batch]), rng)

    loader = DeviceResidentLoader(x, y, batch, seed=0, block_shuffle=128)
    _sync(loader.x)  # finish the one-time upload before anything timed
    _sync(loader.y)

    spe = loader.steps_per_epoch
    k = -(-EPOCH // (spe * batch))          # epochs to cover >= EPOCH rows
    run = loader.make_epoch_runner(tr.train_step)

    # step-level FLOPs from the compiled executable (the fused epoch adds
    # only the shuffle gather, excluded here -> MFU is a lower bound on
    # accounting, upper on honesty: flops are the train step's own)
    ca = cost_analysis(tr.train_step, tr.state, x[:batch], y[:batch])
    step_flops = ca.get("flops", 0.0)

    # One multi-minute dispatch trips the dev tunnel's per-RPC watchdog
    # ("TPU worker process crashed", observed on the ~9-min CNN epoch run).
    # Slow models run ceil(k/c) dispatches of c fused epochs instead; the
    # calls enqueue asynchronously (one sync at the end), so the chunking
    # costs host-side key stacking only, not a per-chunk round-trip.
    c = min(chunk_epochs or k, k)
    n_chunks = -(-k // c)
    k = n_chunks * c                        # overshoot; report() normalizes

    run.precompile(tr.state, c)             # timed calls have zero compile

    def one_pass(state):
        t0 = time.perf_counter()
        m = None
        for _ in range(n_chunks):
            state, m = run(state, c)
        loss = float(jax.device_get(m["loss"][-1]))  # host sync
        return state, loss, time.perf_counter() - t0

    # The FIRST execution of a freshly-compiled executable on the
    # tunnel-attached chip pays a large one-time cost (0.5-10 s observed,
    # scripts/bench_reconcile.py) that a single timing conflates with
    # device rate -- round 4's 2.27 s MLP "epoch" was really ~0.8 s warm.
    # Fast models re-run until warm and report the best pass; slow models
    # (>30 s) amortize the artifact below measurement noise already.
    state, loss, wall = one_pass(tr.state)
    passes = 1
    while wall > 0 and wall < 30.0 and passes < 6:
        state, loss, w2 = one_pass(state)
        wall = min(wall, w2)
        passes += 1

    rows = k * spe * batch
    row = report(name, wall, rows, step_flops * k * spe, loss,
                 f"batch {batch}, pool {pool_rows} rows, {k} fused epochs"
                 + (f" in {n_chunks} dispatches" if n_chunks > 1 else "")
                 + (f", best of {passes} warm passes" if passes > 1 else ""))
    results.append(row)


def bench_rpn(results, ensemble=32, batch=3072, pool_rows=262144,
              mode="auto"):
    """RPN: one epoch = every member sees >= EPOCH bootstrap rows (the
    reference trains each of the 32 members on a full bootstrap resample
    of the split -- rpn_model_v1_data.py).  Bootstrap indices are drawn
    on device inside a fused scan."""
    import jax
    import jax.numpy as jnp

    from climsim_tpu.data.synthetic import synthetic_split
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.train.rpn_recipe import rpn_trainer
    from climsim_tpu.utils.profiling import cost_analysis
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v1")
    grid = load_default_grid()
    stats = load_asset_norms("v1")
    x, y = synthetic_split(spec, pool_rows, grid=grid, seed=0)
    tr = rpn_trainer(spec, stats, x[:2], jax.random.PRNGKey(0),
                     ensemble_size=ensemble)
    xd, yd = jax.device_put(x), jax.device_put(y)
    _sync(xd)
    _sync(yd)
    n = pool_rows
    steps = -(-EPOCH // batch)
    # chunked dispatches for the same tunnel-watchdog reason as
    # bench_generic; the key rides the carry so chunks continue the
    # same bootstrap stream
    chunk = 1280
    n_chunks = -(-steps // chunk)
    steps = n_chunks * chunk                # overshoot; report() normalizes

    # the pool rides as jit ARGUMENTS, never closure captures: a captured
    # device array is embedded in the lowered HLO as a constant, and the
    # dev tunnel's remote-compile endpoint rejects/drops the hundreds-of-
    # MB request (HTTP 413 / broken pipe) -- same convention as
    # DeviceResidentLoader.make_epoch_runner
    def body(carry, _, xs, ys):
        params, opt_state, key = carry
        key, k1 = jax.random.split(key)
        idx = jax.random.randint(k1, (ensemble, batch), 0, n)
        params, opt_state, losses = tr.train_step(
            params, opt_state, tr.prior, xs[idx], ys[idx])
        return (params, opt_state, key), losses.mean()

    @jax.jit
    def run(params, opt_state, key, xs, ys):
        (params, opt_state, key), ls = jax.lax.scan(
            lambda c, _: body(c, _, xs, ys),
            (params, opt_state, key), None, length=chunk)
        return params, opt_state, key, ls[-1]

    idx0 = jnp.zeros((ensemble, batch), jnp.int32)
    ca = cost_analysis(tr.train_step, tr.params, tr.opt_state, tr.prior,
                       xd[idx0], yd[idx0])
    step_flops = ca.get("flops", 0.0)

    @jax.jit
    def step1(params, opt_state, key, xs, ys):
        (params, opt_state, key), loss = body((params, opt_state, key),
                                              None, xs, ys)
        return params, opt_state, key, loss

    key = jax.random.PRNGKey(7)
    try:
        if mode == "step":
            raise jax.errors.JaxRuntimeError("rpn mode=step requested")
        run.lower(tr.params, tr.opt_state, key, xd, yd).compile()
        fused = True
    except jax.errors.JaxRuntimeError as e:
        # the bare train_step compiles remotely (cost_analysis above just
        # did), but the scan-wrapped program's compile exceeds the dev
        # tunnel's RPC window (broken pipe ~7 min in, observed 3x); fall
        # back to per-step async dispatch of the jitted body -- honest,
        # modestly dispatch-bound at ~ms step times
        print(f"  [RPN scan compile failed ({str(e).splitlines()[-1]}); "
              "falling back to per-step dispatch]", flush=True)
        step1.lower(tr.params, tr.opt_state, key, xd, yd).compile()
        fused = False
        steps = -(-EPOCH // batch)          # no chunk overshoot needed

    t0 = time.perf_counter()
    params, opt_state, last = tr.params, tr.opt_state, None
    if fused:
        for _ in range(n_chunks):
            params, opt_state, key, last = run(params, opt_state, key,
                                               xd, yd)
    else:
        for _ in range(steps):
            params, opt_state, key, last = step1(params, opt_state, key,
                                                 xd, yd)
    loss = float(jax.device_get(last))
    wall = time.perf_counter() - t0
    row = report(f"RPN x{ensemble}", wall, steps * batch,
                 step_flops * steps, loss,
                 f"batch {batch}/member, {ensemble} members, "
                 "on-device bootstrap, "
                 + (f"{n_chunks} dispatches" if fused
                    else "per-step dispatch"))
    results.append(row)


def report(name, wall, rows, flops, loss, note):
    # every bench here is an unsharded single-chip program, so MFU is
    # against ONE chip's peak regardless of how many devices are attached
    s_epoch = wall * EPOCH / rows   # rows >= EPOCH; normalize the (< one
    # batch / partial-epoch) overshoot back to exactly the epoch volume
    tflops = flops / wall / 1e12
    mfu = flops / wall / PEAK_BF16
    row = dict(model=name, s_per_epoch=round(s_epoch, 2),
               wall_s=round(wall, 2), rows=int(rows),
               samples_per_s=round(rows / wall, 1),
               tflops=round(tflops, 2), mfu=round(mfu, 4),
               vs_north_star=round(NORTH_STAR_S * 16 / s_epoch, 1),
               loss=round(loss, 5), note=note)
    print(json.dumps(row), flush=True)
    if _JSONL:  # stream rows so a chip-tunnel drop loses no measurements
        with open(_JSONL, "a") as f:
            f.write(json.dumps(row) + "\n")
    return row


_JSONL = None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="MLP,ED,HSR,cVAE,RPN,CNN,UNet",
                    help="comma list; order = run order")
    ap.add_argument("--out", default=os.path.join(_REPO, "docs",
                                                  "BENCH_EPOCHS.md"))
    ap.add_argument("--jsonl", default="/tmp/bench_epochs.jsonl",
                    help="append each measured row here as it lands")
    ap.add_argument("--prior", default=None,
                    help="seed results from a prior run's --jsonl file "
                         "(dedup by model name, new rows win)")
    ap.add_argument("--rpn-mode", default="auto",
                    choices=["auto", "step"],
                    help="'step' skips the fused-scan compile attempt "
                         "(it exceeds the dev tunnel's RPC window) and "
                         "benches RPN with per-step dispatch directly")
    ap.add_argument("--rpn-batch", type=int, default=3072,
                    help="bootstrap batch per member (the reference's "
                         "own size, rpn_model_v1_data.py:23; measured "
                         "1.26x faster than 1024 at 41% MFU)")
    args = ap.parse_args(argv)

    global _JSONL
    _JSONL = args.jsonl

    import jax

    from climsim_tpu.train import recipes
    from climsim_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)
    t_all = time.time()
    results = []
    want = [m.strip() for m in args.models.split(",") if m.strip()]

    cfg = {
        # (trainer factory, spec, batch, resident pool rows, chunk epochs);
        # batches are the measured-best production sizes
        # (docs/PERFORMANCE.md sweeps).  chunk = fused epochs per dispatch
        # sized so one dispatch stays ~15-40 s (None = whole run in one);
        # multi-minute single dispatches crash the dev tunnel's worker.
        "MLP": (lambda s, st, sb, r: recipes.mlp_trainer(
            s, st, sb, r, hidden=(768, 640, 512, 640, 640),
            steps_per_epoch=1000), "v1", 32768, 524288, None),
        "ED": (lambda s, st, sb, r: recipes.ed_trainer(
            s, st, sb, r, steps_per_epoch=1000), "v1", 32768, 524288, None),
        "HSR": (lambda s, st, sb, r: recipes.hsr_trainer(
            s, st, sb, r), "v1", 16384, 524288, None),
        "cVAE": (lambda s, st, sb, r: recipes.cvae_trainer(
            s, st, sb, r), "v1", 16384, 524288, None),
        "CNN": (lambda s, st, sb, r: recipes.cnn_trainer(
            s, st, sb, r, steps_per_epoch=1000), "v1", 4096, 262144, 2),
        "UNet": (lambda s, st, sb, r: recipes.unet_trainer(
            s, st, sb, r, steps_per_epoch=1000,
            model_kw=dict(model_channels=128, channel_mult=(1, 2, 2, 2),
                          num_blocks=4, attn_resolutions=(8,),
                          output_prune=True, strato_lev_out=15)),
            "v5", 4096, 32768, 16),
    }
    for name in want:
        t0 = time.time()
        # The dev chip is attached over a tunnel whose remote-compile
        # endpoint drops long-lived connections (broken pipe mid-compile,
        # observed on the ~7-min RPN compile).  The drop is transient --
        # retry the whole model bench (the compile cache makes retries
        # cheaper) and on persistent failure move on so the remaining
        # models still get measured; streamed --jsonl rows survive.
        for attempt in range(3):
            try:
                if name == "RPN":
                    bench_rpn(results, batch=args.rpn_batch,
                              mode=args.rpn_mode)
                else:
                    fac, spec_name, batch, pool, chunk = cfg[name]
                    bench_generic(
                        name if name != "UNet" else "U-Net v5 (128ch)",
                        fac, spec_name, batch, pool, results,
                        chunk_epochs=chunk)
                break
            except jax.errors.JaxRuntimeError as e:
                print(f"  [{name}: attempt {attempt + 1} failed: "
                      f"{str(e).splitlines()[-1]}]", flush=True)
                time.sleep(20)
        else:
            print(f"  [{name}: giving up after 3 attempts]", flush=True)
        print(f"  [{name}: {time.time() - t0:.0f}s incl. data+compile, "
              f"{time.time() - t_all:.0f}s total]", flush=True)

    if args.prior:
        fresh = {r["model"] for r in results}
        # the prior file may itself hold several rows per model (report()
        # appends across resumed runs) -- keep only the newest of each
        prior = {}
        for ln in open(args.prior):
            if ln.strip():
                r = json.loads(ln)
                prior[r["model"]] = r
        results = [r for m, r in prior.items() if m not in fresh] + results
        order = {m: i for i, m in enumerate(
            ["MLP", "ED", "HSR", "cVAE", "RPN x32", "CNN",
             "U-Net v5 (128ch)"])}
        results.sort(key=lambda r: order.get(r["model"], 99))

    lines = [
        "# Measured full-epoch wall-clocks (one chip)",
        "",
        "One true 10,091,520-sample epoch per model (the low-res "
        "dataset volume) through the production device-resident fused "
        "training path, timed as AOT-precompiled dispatches on the "
        "attached TPU v5e chip -- measurements, not projections.  "
        "`vs north star` = the BASELINE.md target (all six baselines "
        "< 10 min on v5e-16 => 100 s per model) divided by the measured "
        "s/epoch, demanding the 16-chip budget of ONE chip -- no "
        "multi-chip credit is taken, so > 1 here means the target is met "
        "with a 16x margin before data-parallel scaling even starts.  "
        "Produced by `python scripts/bench_all.py`.",
        "",
        "| model | s / epoch | samples/s | TFLOP/s | MFU (bf16 peak) | "
        "vs north star | note |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['model']} | {r['s_per_epoch']:.2f} | "
            f"{r['samples_per_s']:,.0f} | {r['tflops']:.2f} | "
            f"{100 * r['mfu']:.1f}% | {r['vs_north_star']:.1f}x | "
            f"{r['note']} |")
    six = ["MLP", "ED", "HSR", "cVAE", "RPN x32", "CNN"]
    have = {r["model"]: r["s_per_epoch"] for r in results}
    if all(m in have for m in six):
        total = sum(have[m] for m in six)
        lines += [
            "",
            f"**Six-baseline total on ONE chip: {total:.0f} s** -- the "
            "north star budgets 600 s for all six on a v5e-16; "
            + (f"measured at {total:.0f} s on a single chip, the target "
               f"is met with zero multi-chip scaling ({600 / total:.1f}x "
               "margin before the data axis even shards)."
               if total < 600 else
               f"a single chip measures {total:.0f} s, so meeting it "
               f"needs only {total / 600:.1f} chips of data-parallel "
               "scaling on the 16-chip mesh."),
        ]
    lines += [
        "",
        "MFU counts the train step's XLA-reported FLOPs only (the "
        "on-device epoch reshuffle adds bandwidth, not FLOPs); "
        "low-arithmetic-intensity MLP-family models are HBM-bandwidth "
        "bound, so their MFU is expected to sit far below peak while "
        "throughput is at the roofline (docs/PERFORMANCE.md).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} [{time.time() - t_all:.0f}s]")


if __name__ == "__main__":
    main()
