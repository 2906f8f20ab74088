"""ctypes bindings for the native C++ shard loader (runtime/climload.cpp).

The loader memory-maps float32 .npy shards, gathers shuffled batches with a
thread pool and keeps a prefetch ring of ready batches -- the in-process
replacement for torch DataLoader worker processes.  Falls back to the pure
numpy BatchLoader when the shared library hasn't been built
(``make -C runtime``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libclimload.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise FileNotFoundError(
            f"{_LIB_PATH} not built; run `make -C runtime`")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.climload_open.restype = ctypes.c_void_p
    lib.climload_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.climload_dims.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_int64)] * 3
    lib.climload_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.climload_start_epoch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.climload_next.restype = ctypes.c_int
    lib.climload_next.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_float)]
    lib.climload_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return os.path.exists(_LIB_PATH)


class NativeLoader:
    """Epoch iterator over .npy shard pairs using the C++ engine."""

    def __init__(self, input_path: str, target_path: str, batch_size: int,
                 threads: int = 4, ring: int = 4, shuffle: bool = True,
                 seed: int = 0, rules=None):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.climload_open(input_path.encode(),
                                    target_path.encode())
        if not self._h:
            raise OSError(f"climload_open failed for {input_path} "
                          f"(float32 C-order 2-D .npy required)")
        n = ctypes.c_int64()
        dx = ctypes.c_int64()
        dy = ctypes.c_int64()
        lib.climload_dims(self._h, ctypes.byref(n), ctypes.byref(dx),
                          ctypes.byref(dy))
        self.num_samples = n.value
        self.dx, self.dy = dx.value, dy.value
        self.batch_size = batch_size
        self.threads = threads
        self.ring = ring
        self.shuffle = shuffle
        self.seed = seed
        self.rules = rules
        self._epoch = 0

    @property
    def steps_per_epoch(self) -> int:
        return self.num_samples // self.batch_size

    def gather(self, indices: np.ndarray):
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        x = np.empty((len(idx), self.dx), np.float32)
        y = np.empty((len(idx), self.dy), np.float32)
        self._lib.climload_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return x, y

    def __iter__(self):
        lib = self._lib
        lib.climload_start_epoch(self._h, self.seed + self._epoch,
                                 self.batch_size, self.threads, self.ring,
                                 1 if self.shuffle else 0)
        self._epoch += 1
        b = self.batch_size
        while True:
            x = np.empty((b, self.dx), np.float32)
            y = np.empty((b, self.dy), np.float32)
            n = lib.climload_next(
                self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n == 0:
                return
            if self.rules is not None:
                x, y = self.rules.shard_batch(x, y)
            yield x, y

    def close(self):
        if getattr(self, "_h", None):
            self._lib.climload_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_loader(input_path: str, target_path: str, batch_size: int,
                rules=None, shuffle: bool = True, seed: int = 0,
                prefer_native: bool = True, **kw):
    """NativeLoader when the .so is built, numpy BatchLoader otherwise."""
    if prefer_native and available():
        return NativeLoader(input_path, target_path, batch_size,
                            shuffle=shuffle, seed=seed, rules=rules, **kw)
    from .pipeline import BatchLoader

    x = np.load(input_path, mmap_mode="r")
    y = np.load(target_path, mmap_mode="r")
    return BatchLoader(x, y, batch_size, rules, shuffle, seed)
