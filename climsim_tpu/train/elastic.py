"""In-flight elastic training: survive device loss mid-run, no restart.

The reference has NO failure detection or elastic recovery -- its story is
checkpoint + manual warm restart (SURVEY.md section 5.3; restart_path at
train_unet_h5loader.py:177-189).  ``elastic_fit`` adds the TPU-native
in-flight story on top of that baseline:

  * **detection** -- a failed chip surfaces as a runtime error on the next
    dispatch or host transfer of the jitted step; ``elastic_fit`` catches
    it (plus an optional injected :class:`DeviceFailure` for testing),
  * **triage** -- :func:`probe_devices` health-checks every device with a
    tiny independent transfer+compute and keeps the survivors,
  * **recovery** -- a new (smaller) mesh is built from the survivors, the
    trainer is re-instantiated through its factory (recompiling the step
    for the new sharding), and the last epoch-boundary snapshot of the
    full TrainState (params, opt state, step counter, RNG, LR scale) is
    resharded onto the new mesh.  The interrupted epoch replays from its
    start with bit-identical batch order (loaders expose ``set_epoch``,
    the DistributedSampler.set_epoch analog).

Semantics: exactly-once at epoch granularity -- completed epochs are never
re-run; a partially-trained epoch is discarded and replayed.  Because the
sharded step is numerically mesh-size-invariant (psum of identical shard
partial sums; test_train_end2end.py::test_multi_device_matches_single),
the recovered trajectory matches an uninterrupted run up to float
reduction order.

This degrades to the checkpoint-restart path when the process itself dies:
pass a ``checkpointer`` (train.checkpoints.OrbaxCheckpointer) and each
snapshot is also persisted; a fresh process calls ``elastic_fit`` with the
same checkpointer and resumes from the last committed epoch on whatever
devices exist.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import numpy as np

from ..parallel.mesh import ShardingRules, make_mesh


class DeviceFailure(RuntimeError):
    """Raised (or injected) when devices are lost mid-run.

    ``lost``: devices to treat as dead.  Real chip loss raises backend
    errors instead (XlaRuntimeError etc.) -- those are caught too, and the
    dead set is discovered by probing.
    """

    def __init__(self, message: str = "device failure", lost=()):
        super().__init__(message)
        self.lost = tuple(lost)


def probe_devices(candidates=None, timeout: float = 30.0) -> list:
    """Health-check devices one by one; return the survivors.

    Each probe is independent (per-device put + tiny reduce + host get),
    so one dead chip cannot poison the others' checks.  Real failures
    often HANG rather than raise, so all probes launch CONCURRENTLY in
    daemon threads against one shared deadline: a hung probe marks its
    device dead after ``timeout`` seconds total (not per device), and
    healthy probes that complete before the deadline are kept even if a
    dead chip is wedging a shared runtime lock for the rest.  Caveat: if
    the backend serializes every transfer behind that lock, survivors
    may still time out -- the caller then sees an empty list and raises
    rather than recovering; a process restart (checkpointer path) is the
    fallback at that point.
    """
    import threading

    devs = list(jax.devices() if candidates is None else candidates)
    ok = [False] * len(devs)

    def _probe(i, dev):
        try:
            x = jax.device_put(np.arange(8, dtype=np.float32), dev)
            if float(np.asarray(jax.device_get(x)).sum()) == 28.0:
                ok[i] = True
        except Exception:
            pass

    threads = [threading.Thread(target=_probe, args=(i, d), daemon=True)
               for i, d in enumerate(devs)]
    deadline = time.monotonic() + timeout
    for t in threads:
        t.start()
    for t in threads:
        t.join(max(deadline - time.monotonic(), 0.0))
    return [d for i, d in enumerate(devs) if ok[i]]


def usable_data_size(n_devices: int, num_model: int,
                     global_batch: int) -> int:
    """Largest data-axis size that (a) fits the healthy device count and
    (b) evenly shards the global batch."""
    for k in range(n_devices // num_model, 0, -1):
        if global_batch % k == 0:
            return k
    raise ValueError(
        f"no usable mesh: {n_devices} devices, num_model={num_model}, "
        f"batch {global_batch}")


@dataclass
class ElasticReport:
    """What happened during an elastic run (for logs/tests)."""

    epochs_completed: int = 0
    failures: int = 0
    mesh_history: list = field(default_factory=list)  # [(num_data, num_model)]
    epoch_losses: list = field(default_factory=list)
    val_losses: list = field(default_factory=list)  # aligned w/ epoch_losses
    recovery_seconds: list = field(default_factory=list)
    expansions: int = 0  # scale-UP rebuilds after devices return


def _snapshot(state):
    """Full host copy of the TrainState (device -> numpy)."""
    return jax.tree.map(np.asarray, state)


def _restore(snapshot, fresh_state, rules: ShardingRules):
    """Lay a host snapshot out on the (new) mesh, preserving dtypes, weak
    types AND shardings of the freshly-initialized state: each leaf is
    placed exactly where the rebuilt trainer laid its own copy (so
    member/seed axes sharded over the model axis reshard correctly, not
    just replicated)."""
    tree = jax.tree.map(
        lambda s, f: np.asarray(
            s, dtype=getattr(f, "dtype", None) or np.asarray(f).dtype),
        snapshot, fresh_state)
    shardings = jax.tree.map(
        lambda f: getattr(f, "sharding", rules.replicated), fresh_state)
    return jax.device_put(tree, shardings)


def elastic_fit(trainer_factory: Callable[[ShardingRules], object],
                loader_factory: Callable[[ShardingRules], tuple],
                epochs: int,
                *,
                devices=None,
                num_model: int = 1,
                global_batch: int | None = None,
                fused: bool = True,
                max_failures: int = 3,
                reprobe_every: int = 0,
                checkpointer=None,
                fault_injector: Callable[[int, int], None] | None = None,
                verbose: bool = False):
    """Run ``epochs`` of training, surviving device loss in flight.

    Parameters
    ----------
    trainer_factory : rules -> Trainer
        Rebuilds the recipe for a given mesh (any train.recipes
        constructor partially applied works).  Called once per mesh
        (initial + after every recovery).
    loader_factory : rules -> (train_loader, val_loader | None)
        Rebuilds loaders on the new mesh.  Loaders must expose
        ``set_epoch`` for bit-identical replay (all data.pipeline loaders
        do).
    epochs : int
        Total epochs to complete (across failures).
    devices : initial device list (default: all of jax.devices()).
    num_model : mesh model-axis size to preserve across rebuilds.
    global_batch : the loaders' global batch size; if omitted it is
        peeked once from ``loader_factory(None)`` (all data.pipeline
        loaders tolerate rules=None) -- pass it explicitly when your
        factory needs real rules.
    max_failures : give up (re-raise) after this many recoveries.
    checkpointer : optional OrbaxCheckpointer; snapshots are ALSO
        persisted per epoch, and the run resumes from the last committed
        epoch if one exists (process-restart recovery).
    fault_injector : optional (epoch, step) -> None hook called before
        every train step; raise :class:`DeviceFailure` from it to
        simulate chip loss (tests).
    reprobe_every : if > 0 and the run is degraded (using fewer devices
        than it started with), re-probe the ORIGINAL device set every N
        completed epochs and scale back UP when enough devices return
        (repaired chips rejoin without a restart).

    Returns ``(state, report)`` -- the final TrainState (on the last mesh)
    and an :class:`ElasticReport`.
    """
    from .loop import evaluate

    devices = list(jax.devices() if devices is None else devices)
    initial_devices = list(devices)
    report = ElasticReport()
    snapshot = None
    epoch = 0

    if global_batch is None:
        # peek the global batch ONCE from an unsharded loader (all
        # data.pipeline loaders tolerate rules=None); pass global_batch
        # explicitly if your loader_factory requires real rules
        global_batch = loader_factory(None)[0].batch_size

    def build(probe=None):
        if probe is None:
            probe = probe_devices(devices)
        if not probe:
            raise RuntimeError("no healthy devices remain")
        # build on ALL survivors first, then shrink the data axis until
        # the global batch shards evenly
        n_data = usable_data_size(len(probe), num_model, global_batch)
        mesh = make_mesh(n_data, num_model,
                         devices=probe[:n_data * num_model])
        rules = ShardingRules(mesh)
        tr = trainer_factory(rules)
        train_loader, val_loader = loader_factory(rules)
        runner = (train_loader.make_epoch_runner(tr.train_step)
                  if fused and hasattr(train_loader, "make_epoch_runner")
                  else None)
        report.mesh_history.append((n_data, num_model))
        return probe, rules, tr, train_loader, val_loader, runner

    if checkpointer is not None:
        checkpointer.wait()
        done = checkpointer.steps()
        if done:
            epoch = done[-1]

    devices, rules, tr, train_loader, val_loader, runner = build()
    state = tr.state
    if checkpointer is not None and epoch > 0:
        restored = checkpointer.restore(_snapshot(state),
                                        step=epoch,
                                        sharding=rules.replicated)
        state = _restore(restored, tr.state, rules)
        report.epochs_completed = epoch
    snapshot = _snapshot(state)

    while epoch < epochs:
        new_snapshot = None
        try:
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            if runner is not None:
                # production path: the whole epoch is one fused dispatch
                # (device loss surfaces on the result transfer below)
                if fault_injector is not None:
                    fault_injector(epoch, 0)
                state, m = runner(state, 1)
                train_loss = float(jax.device_get(m["loss"][0]))
            else:
                losses = []
                for i, (xb, yb) in enumerate(train_loader):
                    if fault_injector is not None:
                        fault_injector(epoch, i)
                    state, metrics = tr.train_step(state, xb, yb)
                    losses.append(metrics["loss"])
                # host transfer forces the whole epoch; REAL device
                # failures surface here as backend runtime errors
                # (np.mean also handles per-seed loss VECTORS from
                # multiseed trainers)
                train_loss = float(np.mean(
                    [np.mean(np.asarray(jax.device_get(l)))
                     for l in losses]))
            # snapshot BEFORE validation: if a chip dies during
            # evaluate, the completed training is preserved (recovery
            # commits the epoch with val=nan instead of replaying it);
            # both transfers stay inside the try so failures recover
            new_snapshot = _snapshot(state)
            val_loss = (evaluate(tr.eval_step, state.params, val_loader)
                        if val_loader is not None else np.nan)
        except Exception as e:  # noqa: BLE001 -- triage below
            injected = isinstance(e, DeviceFailure)
            if not injected and not _is_device_error(e):
                raise
            report.failures += 1
            if report.failures > max_failures:
                raise
            t0 = time.perf_counter()
            if injected and e.lost:
                devices = [d for d in devices if d not in e.lost]
            if verbose:
                print(f"elastic: failure #{report.failures} in epoch "
                      f"{epoch}; rebuilding mesh")
            (devices, rules, tr, train_loader, val_loader,
             runner) = build()
            if new_snapshot is not None:
                # training finished; only validation was interrupted --
                # commit the epoch (val recorded as nan) and move on
                snapshot = new_snapshot
                epoch += 1
                report.epochs_completed = epoch
                report.epoch_losses.append(train_loss)
                report.val_losses.append(float("nan"))
                if checkpointer is not None:
                    checkpointer.save(epoch, snapshot)
            state = _restore(snapshot, tr.state, rules)
            report.recovery_seconds.append(time.perf_counter() - t0)
            continue  # replay (or resume after) the interrupted epoch

        epoch += 1
        report.epochs_completed = epoch
        report.epoch_losses.append(train_loss)
        report.val_losses.append(float(val_loss))
        snapshot = new_snapshot
        if checkpointer is not None:
            checkpointer.save(epoch, snapshot)
        if verbose:
            print(f"elastic epoch {epoch - 1}: train {train_loss:.5f} "
                  f"val {val_loss:.5f} "
                  f"(mesh {report.mesh_history[-1]})")

        if reprobe_every and epoch % reprobe_every == 0 and epoch < epochs:
            in_use = int(rules.mesh.devices.size)
            if in_use < len(initial_devices):
                # short timeout: still-dead chips hang their probes, and
                # this pause repeats every reprobe; a failed or
                # too-small probe just keeps the run degraded
                healthy = probe_devices(initial_devices, timeout=5.0)
                if len(healthy) >= num_model:
                    best = usable_data_size(
                        len(healthy), num_model, global_batch) * num_model
                    if best > in_use:
                        try:
                            (devices, rules, tr, train_loader, val_loader,
                             runner) = build(probe=healthy)
                            state = _restore(snapshot, tr.state, rules)
                        except Exception as e:  # noqa: BLE001
                            # a chip that answered the probe but died
                            # during the rebuild must NOT kill a healthy
                            # degraded run: rebuild on the old survivors
                            if not isinstance(e, DeviceFailure) and \
                                    not _is_device_error(e):
                                raise
                            if verbose:
                                print("elastic: expansion failed "
                                      f"({type(e).__name__}); staying "
                                      "degraded")
                            (devices, rules, tr, train_loader, val_loader,
                             runner) = build()
                            state = _restore(snapshot, tr.state, rules)
                        else:
                            report.expansions += 1
                            if verbose:
                                print("elastic: devices returned; expanded "
                                      f"to mesh {report.mesh_history[-1]}")

    return state, report


def usable_model_size(n_devices: int, ensemble_size: int) -> int:
    """Largest model-axis size that fits the healthy device count and
    evenly shards the member axis (RPN/seed ensembles)."""
    for m in range(min(n_devices, ensemble_size), 0, -1):
        if ensemble_size % m == 0:
            return m
    raise ValueError(f"no usable model axis: {n_devices} devices for "
                     f"{ensemble_size} members")


def elastic_rpn_fit(rpn_factory: Callable[[ShardingRules], object],
                    loader_factory: Callable[[ShardingRules], object],
                    epochs: int,
                    ensemble_size: int,
                    *,
                    devices=None,
                    max_failures: int = 3,
                    fault_injector: Callable[[int, int], None] | None = None,
                    verbose: bool = False):
    """Elastic training for the RPN ensemble (member-axis resharding).

    The RPN trainer's member axis shards over the mesh ``model`` axis
    (rpn_recipe.py: ens_sharding=rules.ensemble).  On device loss the
    mesh is rebuilt with the largest model-axis size that still divides
    ``ensemble_size`` -- members REDISTRIBUTE over the survivors (e.g. 32
    members on 8 devices -> 4/device becomes 32 on 4 -> 8/device), and
    the epoch-boundary snapshot of (params, opt_state, prior) is
    resharded onto the new layout.  Same exactly-once-at-epoch semantics
    as :func:`elastic_fit`.

    rpn_factory : rules -> RPNTrainer (pass rules.ensemble as
        ens_sharding).  Must be deterministic given the same rng so the
        frozen prior is reproducible; the prior is ALSO restored from the
        snapshot, so a non-deterministic factory only wastes init work.
    loader_factory : rules -> BootstrapLoader (must expose set_epoch).
    """
    report = ElasticReport()
    devices = list(jax.devices() if devices is None else devices)
    epoch = 0

    def build():
        probe = probe_devices(devices)
        if not probe:
            raise RuntimeError("no healthy devices remain")
        m = usable_model_size(len(probe), ensemble_size)
        d = len(probe) // m  # leftover healthy devices become data-parallel
        mesh = make_mesh(num_data=d, num_model=m, devices=probe[:d * m])
        rules = ShardingRules(mesh)
        tr = rpn_factory(rules)
        loader = loader_factory(rules)
        report.mesh_history.append((d, m))
        return probe, rules, tr, loader

    devices, rules, tr, loader = build()
    params, opt_state, prior = tr.params, tr.opt_state, tr.prior
    snapshot = _snapshot((params, opt_state, prior))

    while epoch < epochs:
        try:
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
            losses = []
            for i, (xb, yb) in enumerate(loader):
                if fault_injector is not None:
                    fault_injector(epoch, i)
                params, opt_state, step_losses = tr.train_step(
                    params, opt_state, prior, xb, yb)
                losses.append(step_losses)
            # member-mean loss; the transfer forces the epoch so real
            # device failures surface here
            train_loss = float(np.mean(
                [np.asarray(jax.device_get(l)) for l in losses]))
        except Exception as e:  # noqa: BLE001 -- triage below
            injected = isinstance(e, DeviceFailure)
            if not injected and not _is_device_error(e):
                raise
            report.failures += 1
            if report.failures > max_failures:
                raise
            t0 = time.perf_counter()
            if injected and e.lost:
                devices = [d for d in devices if d not in e.lost]
            if verbose:
                print(f"elastic-rpn: failure #{report.failures} in epoch "
                      f"{epoch}; rebuilding mesh")
            devices, rules, tr, loader = build()
            fresh = (tr.params, tr.opt_state, tr.prior)
            params, opt_state, prior = _restore(snapshot, fresh, rules)
            report.recovery_seconds.append(time.perf_counter() - t0)
            continue  # replay the interrupted epoch

        epoch += 1
        report.epochs_completed = epoch
        report.epoch_losses.append(train_loss)
        snapshot = _snapshot((params, opt_state, prior))
        if verbose:
            print(f"elastic-rpn epoch {epoch - 1}: train {train_loss:.5f} "
                  f"(mesh {report.mesh_history[-1]})")

    return (params, opt_state, prior), report


def _is_device_error(e: Exception) -> bool:
    """Backend errors that plausibly mean a device died (vs a bug)."""
    name = type(e).__name__
    if name in ("XlaRuntimeError", "JaxRuntimeError", "InternalError"):
        return True
    msg = str(e).lower()
    return any(s in msg for s in (
        "device", "dma", "interconnect", "slice health", "halted"))
