"""Coupling TCP bridge (online/server.py).

Oracles: served outputs == direct wrapper application (bit-exact, same
jit); deterministic micro-batch coalescing (paused dispatcher); bucket
padding never leaks into replies; the real v2_rh wrapper serves through
the bridge unchanged.
"""

import threading

import jax
import numpy as np
import pytest

from climsim_tpu.online.server import (CouplingClient, CouplingServer,
                                       MAGIC)


def _echo_wrapper(x):
    return x[:, :8] * 2.0 + 1.0


@pytest.fixture()
def echo_server():
    srv = CouplingServer(_echo_wrapper, None, n_features=16,
                         base_chunk=64, max_batch=256, warmup=True)
    srv.start()
    yield srv
    srv.stop()


def test_roundtrip_matches_direct(echo_server):
    cl = CouplingClient("127.0.0.1", echo_server.port)
    x = np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32)
    y = cl.step(x)
    np.testing.assert_array_equal(y, np.asarray(jax.jit(_echo_wrapper)(x)))
    cl.close()
    assert echo_server.stats.requests == 1


def test_bucket_padding_never_leaks(echo_server):
    cl = CouplingClient("127.0.0.1", echo_server.port)
    x = np.random.default_rng(1).normal(size=(50, 16)).astype(np.float32)
    y = cl.step(x)  # 50 rows -> bucket 64, 14 padded rows dropped
    assert y.shape == (50, 8)
    np.testing.assert_allclose(y, x[:, :8] * 2.0 + 1.0, rtol=1e-6)
    cl.close()
    assert echo_server.stats.padded_rows >= 14


def test_concurrent_requests_coalesce(echo_server):
    import time

    echo_server.dispatch_paused.set()
    time.sleep(0.2)  # let the dispatcher's in-flight q.get time out
    rng = np.random.default_rng(2)
    xs = [rng.normal(size=(64, 16)).astype(np.float32) for _ in range(3)]
    outs = [None] * 3

    def call(i):
        cl = CouplingClient("127.0.0.1", echo_server.port)
        outs[i] = cl.step(xs[i])
        cl.close()

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    before = echo_server.stats.batches
    for t in threads:
        t.start()
    # wait until all three requests are queued, then release the dispatcher
    for _ in range(500):
        if echo_server._q.qsize() == 3:
            break
        time.sleep(0.01)
    assert echo_server._q.qsize() == 3
    echo_server.dispatch_paused.clear()
    for t in threads:
        t.join(timeout=30)
    for i in range(3):
        np.testing.assert_allclose(outs[i], xs[i][:, :8] * 2.0 + 1.0,
                                   rtol=1e-6)
    # 3 requests x 64 rows coalesced into ONE 192-row (bucket 256) batch
    assert echo_server.stats.batches == before + 1


def test_coalescing_never_exceeds_max_batch(echo_server):
    """Regression: a drained group must stay within max_batch (=256, the
    largest precompiled bucket); the overflowing request heads the next
    group instead."""
    import time

    echo_server.dispatch_paused.set()
    time.sleep(0.2)
    rng = np.random.default_rng(3)
    xs = [rng.normal(size=(100, 16)).astype(np.float32) for _ in range(3)]
    outs = [None] * 3

    def call(i):
        cl = CouplingClient("127.0.0.1", echo_server.port)
        outs[i] = cl.step(xs[i])
        cl.close()

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    before = echo_server.stats.batches
    for t in threads:
        t.start()
    for _ in range(500):
        if echo_server._q.qsize() == 3:
            break
        time.sleep(0.01)
    echo_server.dispatch_paused.clear()
    for t in threads:
        t.join(timeout=30)
    for i in range(3):
        np.testing.assert_allclose(outs[i], xs[i][:, :8] * 2.0 + 1.0,
                                   rtol=1e-6)
    # 300 rows > max_batch 256 -> two device calls (200 + 100), never one
    assert echo_server.stats.batches == before + 2
    assert echo_server.stats.padded_rows >= 0


def test_real_v2rh_wrapper_served():
    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.models import build_model
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online.wrapper import make_v2rh_wrapper
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v2_rh")
    stats = load_asset_norms("v2_rh")
    grid = load_default_grid()
    model = build_model("mlp_online", spec, hidden=(32,))
    x = np.asarray(synthetic_inputs(spec, 64, grid, seed=0), np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, spec.input_len), np.float32))
    wrap = make_v2rh_wrapper(model.apply, stats, spec)

    srv = CouplingServer(wrap, params, n_features=spec.input_len,
                         base_chunk=64, max_batch=128, warmup=False)
    srv.start()
    try:
        cl = CouplingClient("127.0.0.1", srv.port)
        y = cl.step(x)
        cl.close()
        direct = np.asarray(jax.jit(lambda a: wrap(params, a))(x))
        np.testing.assert_allclose(y, direct, rtol=1e-5, atol=1e-6)
        assert y.shape == (64, spec.output_len)
    finally:
        srv.stop()


def test_mesh_sharded_serving():
    """rules= shards coalesced batches over the mesh data axis; outputs
    match the unsharded path and bucket sizes stay divisible."""
    from climsim_tpu.parallel.mesh import ShardingRules, make_mesh

    rules = ShardingRules(make_mesh())
    n_dev = rules.mesh.shape["data"]
    srv = CouplingServer(_echo_wrapper, None, n_features=16,
                         base_chunk=50, max_batch=200, warmup=True,
                         rules=rules)
    assert all(b % n_dev == 0 for b in srv.buckets)
    srv.start()
    try:
        cl = CouplingClient("127.0.0.1", srv.port)
        x = np.random.default_rng(4).normal(size=(50, 16)).astype(np.float32)
        y = cl.step(x)
        np.testing.assert_allclose(y, x[:, :8] * 2.0 + 1.0, rtol=1e-6)
        cl.close()
    finally:
        srv.stop()


def test_wire_format_stable():
    # the header the Fortran side must write: <III magic, rows, features
    import struct

    hdr = struct.pack("<III", MAGIC, 384, 1405)
    assert len(hdr) == 12
    assert struct.unpack("<I", hdr[:4])[0] == 0x434C4D54


def test_c_client_roundtrip(tmp_path):
    """The compiled C host client (runtime/climclient.c) speaks the wire
    protocol end to end against a live server running the REAL v2_rh
    wrapper: same frames a Fortran/C host model would write, no Python on
    the client side (reference call path: libtorch linked into E3SM,
    online_testing/README.md section 5)."""
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = os.path.join(root, "runtime", "climclient")
    if not os.path.exists(exe):
        pytest.skip("runtime/climclient not built (no C toolchain)")

    from climsim_tpu.data.synthetic import synthetic_inputs
    from climsim_tpu.grid import load_default_grid
    from climsim_tpu.models import build_model
    from climsim_tpu.norms import load_asset_norms
    from climsim_tpu.online.wrapper import make_v2rh_wrapper
    from climsim_tpu.varspec import get_varspec

    spec = get_varspec("v2_rh")
    stats = load_asset_norms("v2_rh")
    grid = load_default_grid()
    model = build_model("mlp_online", spec, hidden=(32,))
    x = np.asarray(synthetic_inputs(spec, grid.ncol, grid, seed=0),
                   np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, spec.input_len), np.float32))
    wrap = make_v2rh_wrapper(model.apply, stats, spec)

    srv = CouplingServer(wrap, params, n_features=spec.input_len,
                         base_chunk=grid.ncol, max_batch=2 * grid.ncol,
                         warmup=True)
    srv.start()
    try:
        fin = tmp_path / "in.f32"
        fout = tmp_path / "out.f32"
        fin.write_bytes(np.ascontiguousarray(x, "<f4").tobytes())
        # 20 physics steps over one persistent connection, like a host
        res = subprocess.run(
            [exe, "127.0.0.1", str(srv.port), str(fin), str(x.shape[0]),
             str(x.shape[1]), str(fout), "20"],
            capture_output=True, text=True, timeout=120)
        assert res.returncode == 0, res.stderr
        assert "latency ms" in res.stdout
        y = np.frombuffer(fout.read_bytes(), "<f4").reshape(
            x.shape[0], spec.output_len)
        direct = np.asarray(jax.jit(lambda a: wrap(params, a))(x))
        np.testing.assert_allclose(y, direct, rtol=1e-5, atol=1e-6)
        print("C client:", res.stdout.strip())
    finally:
        srv.stop()
