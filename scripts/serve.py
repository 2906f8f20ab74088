#!/usr/bin/env python
"""Serve a coupling artifact over the TCP bridge (online/server.py).

Two modes:
  --aot model.stablehlo --features N [--batch B]
      serve an exported StableHLO artifact (fixed batch B = its export
      batch; requests are padded/split to it)
  --demo {v5|v2rh}
      build a fresh (untrained) wrapped model and serve it -- for wire/
      latency testing of the bridge itself

Example:
  python scripts/serve.py --demo v2rh --port 9999
  # host side: send <III magic,rows,features> + f32 payload; read reply
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_bundle(bundle_dir: str, batch: int):
    """Pick the artifact for `batch` from a package_e3sm.py bundle.

    Returns (aot_path, n_features, bucket).  Falls back to the smallest
    bucket when `batch` is not one of the bundle's exported buckets."""
    with open(os.path.join(bundle_dir, "metadata.json")) as f:
        meta = json.load(f)
    buckets = sorted(a["batch"] for a in meta["artifacts"].values())
    want = batch if batch in buckets else buckets[0]
    if batch not in buckets:
        print(f"bundle has buckets {buckets}; serving b={want}")
    name = next(n for n, a in meta["artifacts"].items()
                if a["batch"] == want)
    return os.path.join(bundle_dir, name), meta["n_features"], want


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle",
                    help="package_e3sm.py output dir; reads metadata.json "
                    "and serves the artifact for --batch (default: the "
                    "bundle's smallest bucket)")
    ap.add_argument("--aot", help="StableHLO artifact from export_aot")
    ap.add_argument("--features", type=int,
                    help="input width (required with --aot)")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--max-batch", type=int, default=6144)
    ap.add_argument("--demo", choices=["v5", "v2rh"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9876)
    args = ap.parse_args()

    from climsim_tpu.online.server import CouplingServer

    if args.bundle:
        args.aot, args.features, args.batch = resolve_bundle(
            args.bundle, args.batch)

    if args.aot:
        from climsim_tpu.online.wrapper import load_aot

        if not args.features:
            ap.error("--features is required with --aot")
        fn = load_aot(args.aot)
        # AOT artifacts are fixed-shape: one bucket at the export batch
        srv = CouplingServer(fn, None, n_features=args.features,
                             base_chunk=args.batch, max_batch=args.batch,
                             host=args.host, port=args.port)
    else:
        import jax
        import numpy as np

        from climsim_tpu.models import build_model
        from climsim_tpu.norms import load_asset_norms
        from climsim_tpu.online.wrapper import (WrapperConfig, make_wrapper,
                                                make_v2rh_wrapper)
        from climsim_tpu.varspec import get_varspec

        if args.demo == "v2rh":
            spec = get_varspec("v2_rh")
            stats = load_asset_norms("v2_rh")
            model = build_model("mlp_online", spec, hidden=(384, 384))
            params = model.init(jax.random.PRNGKey(0),
                                np.zeros((1, spec.input_len), np.float32))
            wrap = make_v2rh_wrapper(model.apply, stats, spec)
            n_feat = spec.input_len
        else:
            spec = get_varspec("v5")
            stats = load_asset_norms("v5")
            model = build_model("unet", spec, model_channels=32)
            params = model.init(jax.random.PRNGKey(0),
                                np.zeros((1, spec.input_len), np.float32))
            wrap = make_wrapper(model.apply, stats,
                                WrapperConfig(input_version="v4"))
            n_feat = get_varspec("v4").input_len
        srv = CouplingServer(wrap, params, n_features=n_feat,
                             base_chunk=args.batch,
                             max_batch=args.max_batch,
                             host=args.host, port=args.port)

    import signal
    import threading

    stop = threading.Event()
    # Event.wait wakes immediately on set() from the handler (a bare
    # time.sleep would resume for its full remainder per PEP 475,
    # delaying shutdown past an orchestrator's kill grace period)
    signal.signal(signal.SIGTERM, lambda signum, frame: stop.set())
    srv.start()
    print(f"serving on {args.host}:{srv.port} "
          f"(features={srv.n_features}, buckets={srv.buckets})")
    try:
        while not stop.wait(10.0):
            s = srv.stats.summary()
            if s["requests"]:
                print(f"reqs={s['requests']} rows={s['rows']} "
                      f"rows/batch={s['rows_per_batch']:.0f} "
                      f"p50={s['latency_ms_p50']:.1f}ms "
                      f"p99={s['latency_ms_p99']:.1f}ms")
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()  # drain worker threads before runtime teardown


if __name__ == "__main__":
    main()
