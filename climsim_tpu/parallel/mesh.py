"""Device mesh construction and collective helpers.

The reference's distribution layer is torch DDP over NCCL
(train_unet_h5loader.py:34-35,194-206).  The TPU-native replacement is a
``jax.sharding.Mesh`` + sharding specs: XLA compiles the gradient psum onto
ICI within a slice (and DCN across slices) -- no transport code of our own.

Axis conventions:
  * ``data``   -- batch (columns) sharding; the axis that actually scales
                  for this workload (SURVEY.md section 5.7)
  * ``model``  -- reserved for tensor-parallel sharding of wide layers and
                  the RPN ensemble-member axis
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init_if_needed() -> None:
    """Initialize multi-host JAX when launched under a cluster scheduler.

    Replaces torch.distributed/NCCL init (DistributedManager.initialize in
    the reference).  Safe to call unconditionally: no-ops in single-process
    runs without coordinator env vars.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default: all devices on the data axis -- the pure-DP layout every
    reference model uses.  ``num_model > 1`` carves an inner model axis
    (kept innermost so model collectives ride the fastest ICI links).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data is None:
        num_data = n // num_model
    if num_data * num_model != n:
        raise ValueError(
            f"mesh {num_data}x{num_model} != {n} devices")
    return Mesh(devices.reshape(num_data, num_model),
                axis_names=(DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(num_model: int = 1, devices=None,
                         slice_indices=None) -> Mesh:
    """(data, model) mesh across MULTIPLE TPU slices, laid out so the
    traffic matches the interconnect hierarchy:

      * the ``data`` axis spans slices -- its only collective is the
        gradient psum, whose ring all-reduce tolerates the slower DCN
        links between slices;
      * the ``model`` axis (ensemble members / seed replicas, which may
        exchange activations) stays INSIDE a slice, riding ICI.

    Devices are grouped by their ``slice_index`` attribute (present on
    real multi-slice TPU platforms); ``slice_indices`` overrides the
    grouping explicitly (manual topologies, or testing on CPU devices
    that carry no slice_index).  Each slice must contribute the same
    device count, and ``num_model`` must divide the per-slice count.  On
    single-slice or CPU platforms (no slice_index) this degrades to
    make_mesh.  The device matrix is ordered slice-major on the data
    axis, so rows [i*per_slice_data : (i+1)*per_slice_data) of a batch
    land wholly inside slice i -- only gradient reductions cross DCN,
    never batch data.
    """
    devices = list(devices if devices is not None else jax.devices())
    if slice_indices is not None:
        assert len(slice_indices) == len(devices)
    slices: dict[int, list] = {}
    for i, d in enumerate(devices):
        k = (slice_indices[i] if slice_indices is not None
             else getattr(d, "slice_index", 0))
        slices.setdefault(k, []).append(d)
    if len(slices) == 1:
        return make_mesh(num_model=num_model, devices=devices)
    per = {k: len(v) for k, v in slices.items()}
    if len(set(per.values())) != 1:
        raise ValueError(f"uneven slices: {per}")
    n_slice = len(slices)
    per_slice = next(iter(per.values()))
    if per_slice % num_model:
        raise ValueError(
            f"num_model={num_model} must divide per-slice count {per_slice}")
    rows = []
    for k in sorted(slices):
        # within a slice: data-major rows of the (data, model) sub-grid
        rows.append(np.asarray(slices[k]).reshape(-1, num_model))
    grid = np.concatenate(rows, axis=0)  # (n_slice*per_slice_data, model)
    assert grid.shape == (n_slice * per_slice // num_model, num_model)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


@dataclass(frozen=True)
class ShardingRules:
    """Canonical shardings for the training step."""

    mesh: Mesh

    @property
    def batch(self) -> NamedSharding:
        """Activations: batch dim over data axis, features replicated."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def ensemble(self) -> NamedSharding:
        """Leading ensemble-member dim over the model axis (RPN)."""
        return NamedSharding(self.mesh, P(MODEL_AXIS))

    @property
    def ensemble_batch(self) -> NamedSharding:
        """(E, B, ...) member bootstrap batches: members over the model
        axis AND each member's batch over the data axis, so meshes with
        more devices than members still data-parallelize within members
        (GSPMD inserts the per-member gradient psum)."""
        return NamedSharding(self.mesh, P(MODEL_AXIS, DATA_AXIS))

    def params(self, tree):
        """Replicate a parameter pytree across the mesh."""
        return jax.device_put(tree, self.replicated)

    def shard_batch(self, *arrays):
        """GLOBAL batches -> sharded device arrays (single-process path)."""
        out = tuple(jax.device_put(a, self.batch) for a in arrays)
        return out[0] if len(out) == 1 else out

    def shard_batch_local(self, *arrays):
        """Per-process LOCAL rows -> global sharded arrays.

        The multi-host input path: each process passes only the rows it
        contributes (its slice of the global batch) and JAX assembles the
        global array without any cross-host data movement -- the
        DistributedSampler + DDP input contract
        (train_unet_h5loader.py:132-140) done the JAX way
        (jax.make_array_from_process_local_data).  Also valid (and a
        no-op assembly) in single-process runs.
        """
        out = tuple(
            jax.make_array_from_process_local_data(self.batch, np.asarray(a))
            for a in arrays)
        return out[0] if len(out) == 1 else out


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad the batch dim up to a multiple (for even sharding); returns
    (padded, real_count)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n
