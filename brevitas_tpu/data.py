"""Input pipeline: native (C++) prefetching data loader + numpy fallback.

The reference feeds its trainers with torch ``DataLoader`` worker processes
(``src/brevitas_examples/bnn_pynq/trainer.py:126-160``). Here the equivalent
is a C++ thread pool (``csrc/data_loader.cc``) that gathers shuffled batches
into a ring of reusable host buffers while the TPU runs the current step —
host gather overlaps device compute, the standard double-buffering recipe.

Usage::

    loader = make_loader(x, y, batch_size=1024, seed=0)
    for xb, yb in loader:          # infinite, reshuffled each epoch
        if loader.epoch >= 10: break
        loss = train_step(model, opt, jnp.asarray(xb), jnp.asarray(yb))

Returned arrays are views into a reused buffer: valid until the next
``__next__`` call that cycles the ring (``num_buffers`` deep), which is safe
with an immediate ``jnp.asarray``/``device_put`` (both copy on transfer).
``make_loader`` builds the native loader when a toolchain is available and
falls back to a numpy implementation with identical semantics otherwise
(``BREVITAS_TPU_NATIVE_LOADER=0`` forces the fallback).
"""

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["make_loader", "NativeDataLoader", "NumpyDataLoader"]

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    import subprocess

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
    src = os.path.join(here, "data_loader.cc")
    out = os.path.join(here, "libbrevitas_tpu_loader.so")
    if not os.path.exists(out) or \
            os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", src, "-o", out], check=True)
    lib = ctypes.CDLL(out)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p]
    lib.dl_buffer_x.restype = ctypes.POINTER(ctypes.c_float)
    lib.dl_buffer_x.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dl_buffer_y.restype = ctypes.POINTER(ctypes.c_int32)
    lib.dl_buffer_y.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dl_epoch.restype = ctypes.c_int64
    lib.dl_epoch.argtypes = [ctypes.c_void_p]
    lib.dl_batches_per_epoch.restype = ctypes.c_int64
    lib.dl_batches_per_epoch.argtypes = [ctypes.c_void_p]
    lib.dl_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NativeDataLoader:
    """C++ thread-pool prefetch loader over in-memory arrays."""

    def __init__(self, x: np.ndarray, y: Optional[np.ndarray],
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 num_threads: int = 2, num_buffers: int = 3,
                 mean: float = 0.0, std: float = 1.0):
        lib = _load_lib()
        x = np.ascontiguousarray(x)
        is_u8 = x.dtype == np.uint8
        if not is_u8:
            x = x.astype(np.float32, copy=False)
            if mean != 0.0 or std != 1.0:
                raise ValueError("mean/std normalization applies to uint8 "
                                 "inputs (fused into the gather)")
        self._x = x  # keep alive: the loader borrows these pointers
        self._y = (np.ascontiguousarray(y, dtype=np.int32)
                   if y is not None else None)
        self.sample_shape = x.shape[1:]
        self.batch_size = int(batch_size)
        row = int(np.prod(self.sample_shape))
        self._lib = lib
        self._h = lib.dl_create(
            x.ctypes.data_as(ctypes.c_void_p), int(is_u8),
            (self._y.ctypes.data_as(ctypes.c_void_p)
             if self._y is not None else None),
            x.shape[0], row, self.batch_size, int(shuffle), seed,
            num_threads, num_buffers, mean, std)
        self._row = row
        self._current = -1
        self.batches_per_epoch = int(lib.dl_batches_per_epoch(self._h))
        self.epoch = 0

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        return self

    def __next__(self):
        if self._current >= 0:
            self._lib.dl_release(self._h, self._current)
        b = self._lib.dl_next(self._h)
        self._current = b
        self.epoch = int(self._lib.dl_epoch(self._h))
        xb = np.ctypeslib.as_array(
            self._lib.dl_buffer_x(self._h, b),
            shape=(self.batch_size, *self.sample_shape))
        yb = None
        if self._y is not None:
            yb = np.ctypeslib.as_array(self._lib.dl_buffer_y(self._h, b),
                                       shape=(self.batch_size,))
        return xb, yb

    def close(self):
        if self._h is not None:
            if self._current >= 0:
                self._lib.dl_release(self._h, self._current)
                self._current = -1
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NumpyDataLoader:
    """Same contract in pure numpy (fallback / reference semantics)."""

    def __init__(self, x, y, batch_size, shuffle=True, seed=0,
                 mean: float = 0.0, std: float = 1.0, **_ignored):
        self._u8 = x.dtype == np.uint8
        self._x = np.ascontiguousarray(x)
        self._y = (np.ascontiguousarray(y, dtype=np.int32)
                   if y is not None else None)
        self.batch_size = int(batch_size)
        self.batches_per_epoch = max(len(x) // batch_size, 1)
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._mean, self._std = mean, std
        self._perm = self._new_perm()
        self._cursor = 0
        self.epoch = 0

    def _new_perm(self):
        n = len(self._x)
        return self._rng.permutation(n) if self._shuffle else np.arange(n)

    def __iter__(self):
        return self

    def __next__(self):
        if self._cursor >= self.batches_per_epoch:
            self._cursor = 0
            self.epoch += 1
            self._perm = self._new_perm()
        i = self._cursor * self.batch_size
        idx = self._perm[i: i + self.batch_size]
        if len(idx) < self.batch_size:  # tiny datasets: wrap
            idx = self._perm[np.arange(i, i + self.batch_size) % len(self._x)]
        self._cursor += 1
        xb = self._x[idx]
        if self._u8:
            xb = (xb.astype(np.float32) / 255.0 - self._mean) / self._std
        yb = self._y[idx] if self._y is not None else None
        return xb, yb

    def close(self):
        pass


def make_loader(x, y, batch_size, **kw):
    """Native loader when buildable, numpy fallback otherwise."""
    if os.environ.get("BREVITAS_TPU_NATIVE_LOADER", "1") != "0":
        try:
            return NativeDataLoader(x, y, batch_size, **kw)
        except Exception:
            pass
    return NumpyDataLoader(x, y, batch_size, **kw)
