#!/usr/bin/env python
"""Measure coupling-sidecar overhead vs direct in-process calls.

Four numbers at the E3SM chunk size (B=384 columns, v2_rh MLP):
  1. direct jitted wrapper call latency (the in-process floor),
  2. the same through the PACKAGED StableHLO AOT artifact (the deployable
     unit scripts/package_e3sm.py ships -- should match the jit floor),
  3. served single-client round-trip (adds wire + queue + pad),
  4. served 4-client concurrent throughput (micro-batch coalescing).

Run: python scripts/bench_server.py   (TPU or CPU)
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.models import build_model
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online.server import CouplingClient, CouplingServer
    from climsim_tpu.online.wrapper import make_v2rh_wrapper
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v2_rh")
    stats = load_asset_norms("v2_rh")
    grid = load_default_grid()
    model = build_model("mlp_online", spec, hidden=(1024, 1024, 1024, 1024))
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, spec.input_len), np.float32))
    wrap = make_v2rh_wrapper(model.apply, stats, spec)
    x = np.asarray(synthetic_inputs(spec, 384, grid, seed=0), np.float32)

    # 1. direct floor
    fn = jax.jit(lambda a: wrap(params, a))
    np.asarray(fn(x))  # compile
    t = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        t.append(time.perf_counter() - t0)
    direct_ms = float(np.median(t) * 1e3)
    print(f"direct B=384: {direct_ms:.2f} ms")

    # 1b. the deployable AOT artifact (weights embedded, no model source)
    from climsim_tpu.online.wrapper import export_aot, load_aot

    aot_fn = load_aot(export_aot(wrap, params, 384, spec.input_len))
    np.asarray(aot_fn(x))  # warm
    t = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(aot_fn(x))
        t.append(time.perf_counter() - t0)
    aot_ms = float(np.median(t) * 1e3)
    print(f"AOT artifact B=384: {aot_ms:.2f} ms "
          f"({aot_ms - direct_ms:+.2f} ms vs jit)")

    srv = CouplingServer(wrap, params, n_features=spec.input_len,
                         base_chunk=384, max_batch=6144).start()

    # 2. served single client
    cl = CouplingClient("127.0.0.1", srv.port)
    cl.step(x)  # warm path
    t = []
    for _ in range(30):
        t0 = time.perf_counter()
        cl.step(x)
        t.append(time.perf_counter() - t0)
    served_ms = float(np.median(t) * 1e3)
    print(f"served B=384 single client: {served_ms:.2f} ms "
          f"(+{served_ms - direct_ms:.2f} ms bridge overhead)")

    # 3. concurrent clients -> coalescing throughput
    n_clients, reps = 4, 25
    b0 = srv.stats.batches
    done = []

    def worker(seed):
        c = CouplingClient("127.0.0.1", srv.port)
        xi = np.asarray(
            synthetic_inputs(spec, 384, grid, seed=seed), np.float32)
        for _ in range(reps):
            c.step(xi)
        c.close()
        done.append(1)

    t0 = time.perf_counter()
    th = [threading.Thread(target=worker, args=(s,))
          for s in range(n_clients)]
    for h in th:
        h.start()
    for h in th:
        h.join()
    dt = time.perf_counter() - t0
    rows = n_clients * reps * 384
    nb = srv.stats.batches - b0
    print(f"served {n_clients} concurrent clients: "
          f"{rows / dt:,.0f} cols/s, {rows / max(nb, 1):,.0f} rows/batch "
          f"({nb} device calls for {n_clients * reps} requests)")
    s = srv.stats.summary()
    print(f"server p50 {s['latency_ms_p50']:.2f} ms  "
          f"p99 {s['latency_ms_p99']:.2f} ms  "
          f"pad {100 * s['pad_fraction']:.1f}%")
    cl.close()
    srv.stop()


if __name__ == "__main__":
    main()
