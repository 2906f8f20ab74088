"""Checkpointing: top-K retention keyed by validation metric + resume.

Replaces the reference's Modulus .mdlus top-K dance (train_unet_h5loader.py:
296-307,473-500) and the Keras best/last ModelCheckpoint pair
(step2_retrain.py:253-263) with one small manager over flax-serialized
pytrees (msgpack).  Works for any params/opt-state pytree, sharded arrays
included (they are gathered to host on save).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import jax
import numpy as np
from flax import serialization


def save_pytree(path: str, tree) -> None:
    """Atomic save: write-to-tmp + rename, so a crash mid-write never
    destroys the previous good checkpoint (the timed crash-recovery file
    in particular must survive the very event it exists for)."""
    tree = jax.tree.map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)


def load_pytree(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


@dataclass
class TopKCheckpointer:
    directory: str
    k: int = 5
    mode: str = "min"  # min for losses, max for R2
    _entries: list = field(default_factory=list)  # [(metric, step, path)]

    def __post_init__(self):
        os.makedirs(self.directory, exist_ok=True)
        meta = os.path.join(self.directory, "topk.json")
        if os.path.exists(meta):
            with open(meta) as f:
                self._entries = [tuple(e) for e in json.load(f)]

    def _better(self, a, b):
        return a < b if self.mode == "min" else a > b

    def _resolve(self, path: str) -> str:
        # topk.json may have been written on another machine or the
        # directory copied/moved (the deployment workflow) -- recorded
        # paths are only trusted for their basename
        return os.path.join(self.directory, os.path.basename(path))

    def maybe_save(self, metric: float, step: int, tree) -> bool:
        """Insert if within top-K; deletes the evicted worst (reference
        behavior: train_unet_h5loader.py:473-500)."""
        metric = float(metric)
        if len(self._entries) >= self.k:
            worst = max(self._entries, key=lambda e: e[0]) if \
                self.mode == "min" else min(self._entries, key=lambda e: e[0])
            if not self._better(metric, worst[0]):
                return False
            self._entries.remove(worst)
            wp = self._resolve(worst[2])
            if os.path.exists(wp):
                os.remove(wp)
        name = f"ckpt_step{step}.msgpack"
        save_pytree(os.path.join(self.directory, name), tree)
        # record the basename only: the directory must stay relocatable
        self._entries.append((metric, step, name))
        self._flush()
        return True

    def save_last(self, step: int, tree) -> str:
        """Always-updated resume checkpoint (warm restart path,
        train_unet_h5loader.py:177-189)."""
        path = os.path.join(self.directory, "last.msgpack")
        save_pytree(path, tree)
        with open(os.path.join(self.directory, "last.json"), "w") as f:
            json.dump({"step": step}, f)
        return path

    def best(self):
        if not self._entries:
            return None
        key = (min if self.mode == "min" else max)
        return key(self._entries, key=lambda e: e[0])

    def load_best(self, template):
        b = self.best()
        return None if b is None else load_pytree(self._resolve(b[2]),
                                                  template)

    def _flush(self):
        with open(os.path.join(self.directory, "topk.json"), "w") as f:
            json.dump(self._entries, f)


@dataclass
class TimedCheckpointer:
    """Wall-clock periodic checkpointing (the reference saves every 1200 s
    during torch training: hsr.py:120-121, tools.py:26-49).  Call
    ``maybe_save`` from the training loop; it writes at most once per
    interval."""

    path: str
    interval_seconds: float = 1200.0
    _last: float | None = None

    def maybe_save(self, tree) -> bool:
        import time as _time

        now = _time.monotonic()
        if self._last is not None and \
                now - self._last < self.interval_seconds:
            return False
        save_pytree(self.path, tree)
        self._last = now
        return True


class OrbaxCheckpointer:
    """Async, sharded checkpointing via orbax -- the production path for
    params too large (or too sharded) for the host-gathering msgpack
    manager above.  Saves run in a background thread (training continues
    during the write); restore takes an abstract target built from ANY
    mesh, so a run checkpointed on an 8-chip mesh resumes on 2 chips or
    1 (elastic recovery -- neither the reference nor its Modulus stack
    supports resharding restores; tested in tests/test_checkpoints.py).

    Reference analog: the .mdlus save/from_checkpoint pair
    (train_unet_h5loader.py:296-307,513) -- which is synchronous and
    single-device.
    """

    def __init__(self, directory: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if async_save
                       else ocp.Checkpointer(ocp.StandardCheckpointHandler()))

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def save(self, step: int, tree) -> None:
        self._ckptr.save(self._path(step),
                         args=self._ocp.args.StandardSave(tree))

    def wait(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def steps(self) -> list[int]:
        """Committed checkpoint steps.  Skips non-integer entries --
        orbax's atomic-save temp dirs ('step_N.orbax-checkpoint-tmp-*')
        from an in-flight or crashed save must not break
        restore-latest."""
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("step_"):
                suffix = d.split("_", 1)[1]
                if suffix.isdigit():
                    out.append(int(suffix))
        return sorted(out)

    def restore(self, template, step: int | None = None, sharding=None):
        """Restore ``step`` (default: latest).  ``template`` supplies the
        pytree structure/shapes/dtypes; ``sharding`` (a jax Sharding or a
        pytree of them) lays the restored arrays out on the CURRENT mesh,
        which may differ from the saving run's."""
        self.wait()
        if step is None:
            ss = self.steps()
            if not ss:
                return None
            step = ss[-1]

        def abstract(leaf, shard):
            x = jax.api_util.shaped_abstractify(leaf)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shard)

        if sharding is None or not isinstance(sharding, (list, dict, tuple)):
            target = jax.tree.map(lambda l: abstract(l, sharding), template)
        else:
            target = jax.tree.map(abstract, template, sharding)
        return self._ckptr.restore(
            self._path(step), args=self._ocp.args.StandardRestore(target))
