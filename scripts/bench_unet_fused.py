#!/usr/bin/env python
"""A/B the Pallas fused GN->silu->conv3 block against the XLA chain.

Closes VERDICT r2 weak #4 with data: flagship U-Net shapes
(B=4096, L=64, C in {128, 256}), identical math, measured wall times.
Result (win or negative) goes to docs/PERFORMANCE.md.

Run on TPU: python scripts/bench_unet_fused.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # sync via a TINY host transfer: block_until_ready can return early
    # on the remote-attached backend, and transferring the full output
    # would time the tunnel, not the kernel (bench.py convention)
    np.asarray(jax.device_get(out[0, 0, :1]))


def timeit(fn, *args, iters=50):
    _sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from climsim_tpu.ops.unet_fused import (fused_gn_silu_conv3,
                                            xla_gn_silu_conv3)

    print(f"backend: {jax.default_backend()}")
    rows = []
    for c, cout, bt in ((128, 128, 32), (256, 256, 16), (256, 128, 16)):
        rng = np.random.default_rng(0)
        b, l = 4096, 64
        x = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(c), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, c, cout)) / np.sqrt(3 * c),
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)

        xla = jax.jit(lambda *a: xla_gn_silu_conv3(*a))
        fused = jax.jit(lambda *a: fused_gn_silu_conv3(*a, batch_tile=bt))

        ya = np.asarray(xla(x, gamma, beta, w, bias))
        yb = np.asarray(fused(x, gamma, beta, w, bias))
        err = np.max(np.abs(ya - yb)) / (np.abs(ya).max() + 1e-9)
        t_xla = timeit(xla, x, gamma, beta, w, bias)
        t_fused = timeit(fused, x, gamma, beta, w, bias)
        rows.append((c, cout, t_xla * 1e3, t_fused * 1e3,
                     t_xla / t_fused, err))
        print(f"C={c}->{cout}: xla {t_xla*1e3:.3f} ms  "
              f"pallas {t_fused*1e3:.3f} ms  "
              f"speedup {t_xla/t_fused:.2f}x  relerr {err:.2e}")

    print("\n| C -> Cout | XLA (ms) | Pallas fused (ms) | speedup |")
    print("|---|---|---|---|")
    for c, cout, ta, tf, sp, err in rows:
        print(f"| {c} -> {cout} | {ta:.3f} | {tf:.3f} | {sp:.2f}x |")


if __name__ == "__main__":
    main()
