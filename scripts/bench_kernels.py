#!/usr/bin/env python
"""Pallas kernels vs XLA-jitted equivalents on the attached TPU.

Usage: python scripts/bench_kernels.py [batch ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    from climsim_tpu.data import transforms as T
    from climsim_tpu.models import OnlineMLP
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.ops import kernels as K
    from climsim_tpu.varspec import get_varspec

    batches = [int(b) for b in sys.argv[1:]] or [384, 4096, 32768]
    spec5 = get_varspec("v5")
    stats5 = load_asset_norms("v5")
    cfg = T.v5_online_config()

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    # --- input transform -------------------------------------------------
    ref = jax.jit(T.make_input_transform(spec5, stats5, cfg))
    fused = jax.jit(K.make_fused_input_transform(spec5, stats5, cfg))
    for b in batches:
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(b, spec5.input_len)).astype(np.float32))
        t_ref = timeit(ref, x)
        t_fused = timeit(fused, x)
        gbs = b * spec5.input_len * 4 * 2 / (t_fused * 1e-6) / 1e9
        print(f"input_transform b={b:6d}: xla {t_ref:8.1f}us  "
              f"pallas {t_fused:8.1f}us  ({gbs:.0f} GB/s eff)")

    # --- constraint head --------------------------------------------------
    head = jax.jit(K.make_fused_constraint_head(stats5))
    from climsim_tpu import physics

    def head_ref(y, t, qc, qi):
        sl = spec5.output_slices
        mask = np.ones(308, np.float32)
        for v in ("ptend_q0001", "ptend_qn", "ptend_u", "ptend_v"):
            mask[sl[v].start: sl[v].start + 15] = 0.0
        yu = y * jnp.asarray(mask) / jnp.asarray(
            stats5.out_scale.astype(np.float32))
        dqc, dqi = physics.repartition_clouds(
            t, qc, qi, yu[:, 0:60], yu[:, 120:180])
        return jnp.concatenate([yu[:, 0:60], yu[:, 60:120], dqc, dqi,
                                yu[:, 180:308]], axis=1)

    head_ref_j = jax.jit(head_ref)
    for b in batches:
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(b, 308)).astype(np.float32))
        t = jnp.asarray((270 + 20 * rng.random((b, 60))).astype(np.float32))
        qc = jnp.asarray(np.abs(rng.normal(size=(b, 60))).astype(np.float32))
        qi = jnp.asarray(np.abs(rng.normal(size=(b, 60))).astype(np.float32))
        t_r = timeit(head_ref_j, y, t, qc, qi)
        t_f = timeit(head, y, t, qc, qi)
        print(f"constraint_head b={b:6d}: xla {t_r:8.1f}us  "
              f"pallas {t_f:8.1f}us")

    # --- fused MLP (online inference latency) -----------------------------
    spec = get_varspec("v2_rh")
    model = OnlineMLP(spec=spec, hidden=(1024, 1024, 1024, 1024))
    x0 = jnp.zeros((2, spec.input_len))
    params = model.init(jax.random.PRNGKey(0), x0)
    ws, bs = K.mlp_params_to_matrices(params)
    apply_j = jax.jit(model.apply)
    n_relu = len(spec.output_scalar_vars)
    fused_mlp = jax.jit(lambda x: K.fused_mlp_forward(
        x, ws, bs, relu_tail=n_relu, tile_b=256))
    ws_bf = [w.astype(jnp.bfloat16) for w in ws]
    fused_mlp_bf = jax.jit(lambda x: K.fused_mlp_forward(
        x, ws_bf, bs, relu_tail=n_relu, tile_b=256))
    for b in batches:
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(b, spec.input_len)).astype(np.float32))
        t_x = timeit(apply_j, params, x)
        try:
            t_p = f"{timeit(fused_mlp, x):8.1f}us"
        except Exception:
            t_p = "VMEM-OOM"  # f32 weights of the 4x1024 net exceed 16 MB
        t_pb = timeit(fused_mlp_bf, x)
        print(f"online_mlp b={b:6d}: xla(bf16) {t_x:8.1f}us  "
              f"pallas(f32) {t_p}  pallas(bf16) {t_pb:8.1f}us")


if __name__ == "__main__":
    main()
