"""ctypes binding + loader for the native sample store (samplestore.cpp).

`SampleStore` replaces DDStore's DistDataset (reference dist/distdataset.py:
63-196): drain the sample pipeline once, then serve shuffled epochs of
contiguous batches assembled by multi-threaded C++ gathers.
`StoreDataLoader` replaces DDStoreDataLoader (:38-57) — same epoch-iterator
role, minus the RDMA window brackets (host-local memory needs none).

Enable in training with ORBIT2_USE_SAMPLESTORE=1 (the reference's flag is
ORBIT_USE_DDSTORE, itermodule.py:235).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "samplestore.cpp")


def build_library(force: bool = False) -> str:
    """Compile samplestore.cpp to a cached .so (first use only)."""
    cache = os.environ.get(
        "ORBIT2_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "orbit2_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libsamplestore.so")
    if force or not os.path.exists(so_path) or (
        os.path.getmtime(so_path) < os.path.getmtime(_SRC)
    ):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", so_path, _SRC, "-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True)
    return so_path


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.o2_store_create.restype = ctypes.c_void_p
        lib.o2_store_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t,
                                        ctypes.c_uint]
        lib.o2_store_destroy.argtypes = [ctypes.c_void_p]
        lib.o2_store_add.restype = ctypes.c_int64
        lib.o2_store_add.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
        lib.o2_store_size.restype = ctypes.c_int64
        lib.o2_store_size.argtypes = [ctypes.c_void_p]
        lib.o2_store_gather.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_size_t, ctypes.c_void_p,
                                        ctypes.c_void_p]
        lib.o2_store_epoch_perm.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                            ctypes.c_void_p]
        _lib = lib
    return _lib


class SampleStore:
    def __init__(self, x_shape: Tuple[int, ...], y_shape: Tuple[int, ...],
                 n_threads: int = 0):
        self._lib = _load()
        self.x_shape = tuple(x_shape)
        self.y_shape = tuple(y_shape)
        self._x_bytes = int(np.prod(x_shape)) * 4
        self._y_bytes = int(np.prod(y_shape)) * 4
        self._h = self._lib.o2_store_create(self._x_bytes, self._y_bytes,
                                            n_threads)
        self._in_vars = None
        self._out_vars = None

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.o2_store_destroy(h)
            self._h = None

    def __len__(self):
        return int(self._lib.o2_store_size(self._h))

    def add(self, x: np.ndarray, y: np.ndarray) -> int:
        x = np.ascontiguousarray(x, dtype=np.float32)
        y = np.ascontiguousarray(y, dtype=np.float32)
        assert x.shape == self.x_shape and y.shape == self.y_shape
        return int(self._lib.o2_store_add(
            self._h, x.ctypes.data_as(ctypes.c_void_p),
            y.ctypes.data_as(ctypes.c_void_p)))

    def fill_from(self, sample_iter) -> int:
        """Drain an IndividualDataIter-style pipeline (dicts of variables)
        once into the store — the epoch-0 materialization the reference does
        in DistDataset (:129-149)."""
        n = 0
        for sample in sample_iter:
            x_dict, y_dict = sample[0], sample[1]
            if self._in_vars is None:
                self._in_vars = list(x_dict.keys())
                self._out_vars = list(y_dict.keys())
            x = np.stack([np.asarray(x_dict[k]) for k in self._in_vars])
            y = np.stack([np.asarray(y_dict[k]) for k in self._out_vars])
            self.add(x, y)
            n += 1
        return n

    def gather(self, indices: np.ndarray,
               x_out: Optional[np.ndarray] = None,
               y_out: Optional[np.ndarray] = None):
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(indices)
        if x_out is None:
            x_out = np.empty((n,) + self.x_shape, dtype=np.float32)
        if y_out is None:
            y_out = np.empty((n,) + self.y_shape, dtype=np.float32)
        self._lib.o2_store_gather(
            self._h, indices.ctypes.data_as(ctypes.c_void_p), n,
            x_out.ctypes.data_as(ctypes.c_void_p),
            y_out.ctypes.data_as(ctypes.c_void_p))
        return x_out, y_out

    def epoch_perm(self, seed: int) -> np.ndarray:
        perm = np.empty(len(self), dtype=np.int64)
        self._lib.o2_store_epoch_perm(self._h, seed,
                                      perm.ctypes.data_as(ctypes.c_void_p))
        return perm


class StoreDataLoader:
    """Shuffled batch iterator over a filled SampleStore with double-buffered
    gather (the next batch is assembled by C++ threads while the current one
    is on device)."""

    def __init__(self, store: SampleStore, batch_size: int, seed: int = 0,
                 drop_last: bool = True):
        self.store = store
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        # double buffers reused across batches
        self._bufs = [
            (np.empty((batch_size,) + store.x_shape, np.float32),
             np.empty((batch_size,) + store.y_shape, np.float32))
            for _ in range(2)
        ]

    def __len__(self):
        n = len(self.store)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[tuple]:
        import threading

        perm = self.store.epoch_perm(self.seed + self.epoch)
        self.epoch += 1
        n_batches = len(self)
        in_vars, out_vars = self.store._in_vars, self.store._out_vars

        def assemble(b, slot):
            idx = perm[b * self.batch_size : (b + 1) * self.batch_size]
            x_out, y_out = self._bufs[slot]
            if len(idx) < self.batch_size:
                x_out, y_out = None, None  # ragged tail: fresh alloc
                return self.store.gather(idx)
            return self.store.gather(idx, x_out, y_out)

        # NOTE: the two buffers are reused every other batch — consumers must
        # copy (jnp.asarray does) before two more iterations elapse.
        pending = None
        if n_batches > 0:
            pending = assemble(0, 0)
        for b in range(n_batches):
            nxt = [None]  # [result] or [exception from the assemble thread]
            t = None
            if b + 1 < n_batches:
                slot = (b + 1) % 2

                def _bg(b=b, slot=slot):
                    try:
                        nxt[0] = assemble(b + 1, slot)
                    except BaseException as e:  # re-raised in the consumer
                        nxt[0] = e

                t = threading.Thread(target=_bg)
                t.start()
            x, y = pending
            yield x, y, in_vars, out_vars
            if t is not None:
                t.join()
                if isinstance(nxt[0], BaseException):
                    raise nxt[0]
                pending = nxt[0]
