"""Host -> device input pipeline.

Replaces the reference's tf.data python generator / torch DataLoader worker
pool (data_utils.py:791-882, train_unet_h5loader.py:132-140) with a design
matched to TPU training:

  * the whole split lives in host RAM as float32 (low-res v1 train split is
    ~5 GB; the loader also accepts memory-mapped .npy for bigger sets),
  * batch indices are drawn on the host (epoch permutation or bootstrap),
  * raw batches are gathered with a cheap numpy take and pushed to device
    asynchronously, sharded over the mesh data axis,
  * a background thread keeps ``prefetch`` batches in flight so the device
    never waits on the host,
  * normalization/pruning/clipping happen *inside the jitted step* (see
    data.transforms), so the host does no per-element math at all.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import jax
import numpy as np

from ..parallel.mesh import ShardingRules


@dataclass
class EpochPlan:
    num_samples: int
    batch_size: int
    drop_remainder: bool = True

    @property
    def steps(self) -> int:
        if self.drop_remainder:
            return self.num_samples // self.batch_size
        return -(-self.num_samples // self.batch_size)


class BatchLoader:
    """Shuffled mini-batch stream over in-memory (or mmapped) arrays.

    iter yields (x_dev, y_dev) as global jax.Arrays sharded over the mesh
    data axis.  Double-buffered via a daemon thread + bounded queue.
    """

    def __init__(self, inputs: np.ndarray, targets: np.ndarray,
                 batch_size: int, rules: ShardingRules | None = None,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2,
                 drop_remainder: bool = True,
                 process_index: int | None = None,
                 process_count: int | None = None):
        """batch_size is always the GLOBAL batch size.

        Multi-host: every process constructs the loader with the same seed
        (identical epoch permutations -- the DistributedSampler contract,
        train_unet_h5loader.py:132-140) and gathers only its
        1/process_count slice of each global batch; the global array is
        assembled with jax.make_array_from_process_local_data, so no batch
        data ever crosses hosts.  inputs/targets may be mmapped .npy --
        only the local rows are touched.
        """
        assert inputs.shape[0] == targets.shape[0]
        self.inputs = inputs
        self.targets = targets
        self.batch_size = batch_size
        self.rules = rules
        self.shuffle = shuffle
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.plan = EpochPlan(inputs.shape[0], batch_size, drop_remainder)
        self.pidx = (jax.process_index() if process_index is None
                     else process_index)
        self.pcount = (jax.process_count() if process_count is None
                       else process_count)
        if self.pcount > 1:
            assert rules is not None, \
                "multi-process loading needs ShardingRules"
            assert batch_size % self.pcount == 0, \
                (batch_size, self.pcount)
            # a remainder batch is not divisible by pcount, so
            # local_indices would silently drop rows of it
            assert drop_remainder, \
                "multi-process loading requires drop_remainder=True"

    def set_epoch(self, epoch: int) -> None:
        """Reset shuffle state to the start of ``epoch``.

        Iterating advances the permutation RNG, so a loader re-created (or
        reused) after a mid-epoch failure would otherwise replay the wrong
        permutation.  Mirrors DistributedSampler.set_epoch
        (train_unet_h5loader.py:356-357); used by train.elastic to resume
        a run on a rebuilt mesh with bit-identical batch order.
        """
        self.rng = np.random.default_rng(self._seed)
        for _ in range(epoch):
            self.rng.permutation(self.inputs.shape[0])

    def local_indices(self, global_batch_idx: np.ndarray) -> np.ndarray:
        """The rows of a global batch this process contributes: contiguous
        slice pidx of pcount (matches the data-axis device order of
        make_mesh, where consecutive devices belong to consecutive
        processes)."""
        per = len(global_batch_idx) // self.pcount
        return global_batch_idx[self.pidx * per:(self.pidx + 1) * per]

    @property
    def steps_per_epoch(self) -> int:
        return self.plan.steps

    def _index_stream(self):
        n = self.inputs.shape[0]
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for s in range(self.plan.steps):
            yield order[s * self.batch_size:(s + 1) * self.batch_size]

    def _produce(self, q: queue.Queue):
        try:
            for idx in self._index_stream():
                if self.pcount > 1:
                    loc = self.local_indices(idx)
                    xb, yb = self.rules.shard_batch_local(
                        self.inputs[loc], self.targets[loc])
                else:
                    xb = self.inputs[idx]
                    yb = self.targets[idx]
                    if self.rules is not None:
                        xb, yb = self.rules.shard_batch(xb, yb)
                q.put((xb, yb))
        finally:
            q.put(None)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


class ChunkedLoader(BatchLoader):
    """Streaming loader that yields SUPERBATCHES of ``steps_per_chunk``
    batches, shaped (K, B, D), for multi-step fused dispatch.

    The beyond-HBM analog of DeviceResidentLoader.make_epoch_runner: when
    the split cannot live on device (the 41 TB high-res dataset), the
    host still streams, but the device executes K train steps per
    dispatch via ``make_chunk_runner`` -- one host round-trip per K
    steps, with the NEXT superbatch prefetched by the background thread
    while the current one trains.  Epoch permutation and batch order are
    identical to BatchLoader with the same seed (K*B rows per draw,
    consumed K steps at a time).
    """

    def __init__(self, inputs, targets, batch_size: int,
                 steps_per_chunk: int = 8, rules=None, shuffle=True,
                 seed: int = 0, prefetch: int = 2):
        super().__init__(inputs, targets, batch_size * steps_per_chunk,
                         rules, shuffle, seed, prefetch)
        assert self.pcount == 1, \
            "ChunkedLoader is single-process; use BatchLoader(process_*) " \
            "for the multi-host input path"
        self.micro_batch = batch_size
        self.steps_per_chunk = steps_per_chunk
        # superbatches are (K, B, D): the BATCH axis (1) shards over the
        # mesh data axis, the step axis (0) stays whole so each scan
        # iteration owns a fully data-sharded micro-batch
        self._chunk_sharding = None
        if rules is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._chunk_sharding = NamedSharding(
                rules.mesh, PartitionSpec(None, "data"))

    @property
    def steps_per_epoch(self) -> int:
        return self.plan.steps * self.steps_per_chunk

    def _produce(self, q: queue.Queue):
        k, b = self.steps_per_chunk, self.micro_batch
        try:
            for idx in self._index_stream():
                xb = self.inputs[idx].reshape(k, b, -1)
                yb = self.targets[idx].reshape(k, b, -1)
                xb = jax.device_put(xb, self._chunk_sharding)
                yb = jax.device_put(yb, self._chunk_sharding)
                q.put((xb, yb))
        finally:
            q.put(None)

    def make_chunk_runner(self, train_step):
        """run(state, xc, yc) executing the K steps of one superbatch in
        a single lax.scan dispatch; metrics are per-chunk means."""
        import jax.numpy as jnp
        from jax import lax

        def run(state, xc, yc):
            def body(st, xy):
                return train_step(st, xy[0], xy[1])

            state, ms = lax.scan(body, state, (xc, yc))
            return state, jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)

        return jax.jit(run, donate_argnums=(0,))


class BootstrapLoader(BatchLoader):
    """Per-member bootstrap batches for ensemble training (RPN pattern,
    rpn_model_v1_data.py:134-144): each draw yields (E, B, D) stacks where
    every ensemble member samples its own bootstrap subset."""

    def __init__(self, inputs, targets, batch_size, ensemble_size,
                 subset_fraction: float = 0.8, rules=None, seed: int = 0,
                 steps_per_epoch: int = 100, prefetch: int = 2):
        super().__init__(inputs, targets, batch_size, rules, True, seed,
                         prefetch)
        n = inputs.shape[0]
        m = int(subset_fraction * n)
        self.member_subsets = np.stack([
            self.rng.choice(n, m, replace=False)
            for _ in range(ensemble_size)])
        self._steps = steps_per_epoch
        self.ensemble_size = ensemble_size

    @property
    def steps_per_epoch(self) -> int:
        return self._steps

    def set_epoch(self, epoch: int) -> None:
        """Reset to the start of ``epoch``, replaying the member-subset
        draws init consumed so the stream is bit-identical."""
        self.rng = np.random.default_rng(self._seed)
        n = self.inputs.shape[0]
        m = self.member_subsets.shape[1]
        for _ in range(self.ensemble_size):
            self.rng.choice(n, m, replace=False)
        for _ in range(epoch * self._steps):
            self.rng.choice(m, self.batch_size, replace=False)

    def _index_stream(self):
        m = self.member_subsets.shape[1]
        for _ in range(self._steps):
            cols = self.rng.choice(m, self.batch_size, replace=False)
            yield self.member_subsets[:, cols]  # (E, B)

    def _produce(self, q):
        try:
            for idx in self._index_stream():
                xb = self.inputs[idx]   # (E, B, D_in)
                yb = self.targets[idx]
                if self.rules is not None:
                    sh = self.rules.ensemble
                    nd = dict(self.rules.mesh.shape).get("data", 1)
                    if nd > 1 and xb.shape[1] % nd == 0:
                        sh = self.rules.ensemble_batch
                    xb = jax.device_put(xb, sh)
                    yb = jax.device_put(yb, sh)
                q.put((xb, yb))
        finally:
            q.put(None)


class DeviceResidentLoader:
    """Whole-split-in-HBM loader: upload once, shuffle and gather on device.

    The production path for the low-res dataset (the v1 train split is
    ~5 GB fp32 -- it fits in one chip's HBM, and a fortiori sharded over a
    mesh).  Per epoch a permutation is drawn *on device* (jax.random, no
    host->device index upload) and each batch is one device gather
    producing a fresh dense array -- measured: plain slices of resident
    arrays are ~3x slower inside jit than materialized batches, so the
    gather-per-batch layout wins.  Steady-state training does zero
    host->device transfers (SURVEY.md section 7 'input pipeline beats
    compute' mitigation).
    """

    def __init__(self, inputs, targets, batch_size: int, rules=None,
                 shuffle: bool = True, seed: int = 0,
                 block_shuffle: int | None = None):
        """block_shuffle=B trades exact row shuffling for BLOCK shuffling:
        rows are fully permuted ONCE on the host at upload, then each
        epoch permutes fixed B-row blocks on device.  The per-epoch sort
        shrinks n/B-fold and the permutation gather becomes contiguous
        B-row copies -- measured +38% epoch throughput at B=128 on v5e
        (docs/PERFORMANCE.md).  Statistical cost: the same B random rows
        always co-occur in a batch (block composition is fixed); with
        B=128 blocks in 32k batches each batch still mixes 256
        independent random blocks.  Epoch row sets remain exact
        permutations of the split (tested)."""
        import jax.numpy as jnp

        self._jax = jax
        sharding = rules.batch if rules is not None else None
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
            else jax.device_put
        self.block = block_shuffle if shuffle else None
        if self.block:
            n0 = inputs.shape[0]
            if n0 % self.block:
                raise ValueError(
                    f"split size {n0} not divisible by block_shuffle "
                    f"{self.block}")
            # one-time host row shuffle: blocks become RANDOM row subsets,
            # so fixed block composition carries no data-order structure
            host_perm = np.random.default_rng(seed).permutation(n0)
            inputs = np.asarray(inputs)[host_perm]
            targets = np.asarray(targets)[host_perm]
        self.x = put(np.ascontiguousarray(inputs))
        self.y = put(np.ascontiguousarray(targets))
        self.n = inputs.shape[0]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._sharding = sharding
        n, b = self.n, batch_size

        def perm(key):
            return jax.random.permutation(key, n)

        def gather(x, y, idx, s):
            sl = jax.lax.dynamic_slice_in_dim(idx, s * b, b)
            return jnp.take(x, sl, axis=0), jnp.take(y, sl, axis=0)

        # s is a traced scalar (not static) so all steps share one
        # executable
        if sharding is not None:
            self._perm = jax.jit(perm, out_shardings=sharding)
            self._gather = jax.jit(
                gather,
                in_shardings=(sharding, sharding, sharding, None),
                out_shardings=(sharding, sharding))
        else:
            self._perm = jax.jit(perm)
            self._gather = jax.jit(gather)
        self._arange = put(np.arange(n))
        if self.block:
            blk = self.block
            nb = n // blk

            def take_blocks(x, y, key):
                p = jax.random.permutation(key, nb)
                xp = jnp.take(x.reshape(nb, blk, x.shape[-1]), p,
                              axis=0).reshape(n, x.shape[-1])
                yp = jnp.take(y.reshape(nb, blk, y.shape[-1]), p,
                              axis=0).reshape(n, y.shape[-1])
                return xp, yp

            def slice_batch(xp, yp, s):
                return (jax.lax.dynamic_slice_in_dim(xp, s * b, b),
                        jax.lax.dynamic_slice_in_dim(yp, s * b, b))

            if sharding is not None:
                self._take_blocks = jax.jit(
                    take_blocks,
                    in_shardings=(sharding, sharding, None),
                    out_shardings=(sharding, sharding))
                self._slice_batch = jax.jit(
                    slice_batch,
                    in_shardings=(sharding, sharding, None),
                    out_shardings=(sharding, sharding))
            else:
                self._take_blocks = jax.jit(take_blocks)
                self._slice_batch = jax.jit(slice_batch)

    @property
    def steps_per_epoch(self) -> int:
        return self.n // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Reset the on-device permutation key to the start of ``epoch``
        (one split per consumed epoch when shuffling; see BatchLoader)."""
        self._key = self._jax.random.PRNGKey(self._seed)
        if self.shuffle:
            for _ in range(epoch):
                self._key, _ = self._jax.random.split(self._key)

    def __iter__(self):
        if self.block:
            self._key, sub = self._jax.random.split(self._key)
            xp, yp = self._take_blocks(self.x, self.y, sub)
            for s in range(self.steps_per_epoch):
                yield self._slice_batch(xp, yp, s)
            return
        if self.shuffle:
            self._key, sub = self._jax.random.split(self._key)
            idx = self._perm(sub)
        else:
            idx = self._arange
        for s in range(self.steps_per_epoch):
            yield self._gather(self.x, self.y, idx, s)

    def make_epoch_runner(self, train_step):
        """Fuse whole epochs into ONE device dispatch.

        Returns ``run(state, num_epochs) -> (state, metrics)`` where the
        permutation draw, per-step batch gather and train step for every
        step of every epoch execute inside a single jitted
        ``lax.scan(lax.scan(...))`` -- no per-step host round-trips.  On a
        remote-attached TPU each dispatch crosses the network tunnel, so
        the per-step Python loop pays ~epoch_steps round-trips per epoch;
        this path pays one per *call*.  Replaces the per-step dispatch the
        reference amortizes with CUDA-graph capture
        (train_unet_h5loader.py:330-346) -- here the whole epoch is the
        captured graph.

        Key-split order matches ``__iter__`` exactly, so
        ``run(state, E)`` computes bit-identical results to E passes of
        the Python ``for xb, yb in loader`` loop with the same starting
        key (tested in test_train_end2end.py).

        ``metrics`` holds each epoch's mean over steps (stacked, shape
        (num_epochs,)).
        """
        import jax.numpy as jnp
        from jax import lax

        jax = self._jax
        n, b, steps = self.n, self.batch_size, self.steps_per_epoch
        shuffle = self.shuffle

        def one_epoch(state, key, x, y):
            # Pre-permute the whole split once, then slice batches
            # contiguously: total gather traffic is identical to per-step
            # gathers (the per-step gathers sum to exactly one permutation
            # pass), but each step's batch becomes a contiguous
            # dynamic-slice XLA fuses into the first matmul -- measured
            # ~1.1x over per-step gathers at every batch size
            # (docs/PERFORMANCE.md).  Costs one extra split-sized copy of
            # HBM for the epoch.
            if self.block:
                # block permutation: n/B-element sort + contiguous B-row
                # gathers -- the bandwidth-friendly shuffle (see __init__)
                blk = self.block
                nb = n // blk
                p = jax.random.permutation(key, nb)
                xp = jnp.take(x.reshape(nb, blk, x.shape[-1]), p,
                              axis=0).reshape(n, x.shape[-1])
                yp = jnp.take(y.reshape(nb, blk, y.shape[-1]), p,
                              axis=0).reshape(n, y.shape[-1])
            elif shuffle:
                idx = jax.random.permutation(key, n)
                xp = jnp.take(x, idx, axis=0)
                yp = jnp.take(y, idx, axis=0)
            else:
                xp, yp = x, y
            if self._sharding is not None:
                xp = lax.with_sharding_constraint(xp, self._sharding)
                yp = lax.with_sharding_constraint(yp, self._sharding)

            def body(st, s):
                xb = lax.dynamic_slice_in_dim(xp, s * b, b)
                yb = lax.dynamic_slice_in_dim(yp, s * b, b)
                if self._sharding is not None:
                    xb = lax.with_sharding_constraint(xb, self._sharding)
                    yb = lax.with_sharding_constraint(yb, self._sharding)
                return train_step(st, xb, yb)

            state, ms = lax.scan(body, state, jnp.arange(steps))
            return state, jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)

        def run_epochs(state, keys, x, y):
            return lax.scan(
                lambda st, k: one_epoch(st, k, x, y), state, keys)

        jitted = jax.jit(run_epochs, donate_argnums=(0,))

        def run(state, num_epochs: int):
            keys = []
            for _ in range(num_epochs):
                if shuffle:
                    self._key, sub = jax.random.split(self._key)
                else:  # matches __iter__: no key consumed when not shuffling
                    sub = self._key
                keys.append(sub)
            return jitted(state, jnp.stack(keys), self.x, self.y)

        def precompile(state, num_epochs: int):
            """AOT-compile the num_epochs executable without running it
            (no keys consumed, no training).  The compilation lands in
            the jit cache, so the next ``run(state, num_epochs)``
            dispatches immediately -- lets benchmarks time a single
            full-scale call with compile excluded (scripts/bench_all.py)."""
            keys = jnp.stack([self._key] * num_epochs)
            jitted.lower(state, keys, self.x, self.y).compile()

        run.precompile = precompile
        return run
