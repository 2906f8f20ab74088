"""Profiling & observability utilities.

TPU-native replacements for the reference's NVTX/Nsight + fvcore stack
(SURVEY.md section 5.1):
  * ``trace`` -- jax.profiler context writing a TensorBoard-loadable trace
  * ``time_fn`` -- block_until_ready wall-clock harness
  * ``cost_analysis`` -- XLA-reported FLOPs/bytes for any jitted function
  * ``MetricsLogger`` -- JSONL + CSV run logging (wandb/mlflow-shaped API
    without the services)
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _force(out):
    """Synchronize by pulling one leaf to host: block_until_ready can
    return early on remote-attached TPU runtimes (tunnel transports)."""
    leaf = jax.tree.leaves(out)[0]
    np_leaf = jax.device_get(leaf)
    return np_leaf


def time_fn(fn, *args, iters: int = 50, warmup: int = 2):
    """Median wall time per call (seconds) with compile excluded."""
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def cost_analysis(jitted_fn, *args) -> dict:
    """FLOPs / bytes accessed / peak memory from the compiled executable
    (the XLA analog of fvcore FlopCountAnalysis, HSR/training/hpo.py:30)."""
    compiled = jitted_fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    out = {k: float(v) for k, v in dict(ca).items()
           if isinstance(v, (int, float))}
    try:
        out["peak_memory_bytes"] = float(
            compiled.memory_analysis().temp_size_in_bytes)
    except Exception:
        pass
    return out


@dataclass
class MetricsLogger:
    """Append-only JSONL metrics stream + end-of-run CSV table."""

    directory: str
    name: str = "run"
    _rows: list = field(default_factory=list)

    def __post_init__(self):
        os.makedirs(self.directory, exist_ok=True)
        self._path = os.path.join(self.directory, f"{self.name}.jsonl")

    def log(self, step: int, **metrics):
        row = {"step": step, "time": time.time(), **metrics}
        self._rows.append(row)
        with open(self._path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def to_csv(self, path: str | None = None):
        path = path or os.path.join(self.directory, f"{self.name}.csv")
        if not self._rows:
            return path
        keys = sorted({k for r in self._rows for k in r})
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for r in self._rows:
                f.write(",".join(str(r.get(k, "")) for k in keys) + "\n")
        return path
