"""ctypes bindings for the C++ host-ingest kernels.

The reference's adjacency construction is an O(N * max_degree) Python loop
(/root/reference/graphsage/minibatch.py:227-245) — the startup hot spot on
large graphs. We provide C++ implementations (native/graph_builder.cpp)
compiled to a shared library, loaded lazily via ctypes; every caller has a
NumPy fallback, so the framework works without the native build.

Build: ``make -C native`` (or it is attempted automatically once).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraph_builder.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pad_adjacency.restype = None
        lib.pad_adjacency.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # flat neighbor pool
            ctypes.POINTER(ctypes.c_int64),  # offsets [n+1]
            ctypes.c_int64,                  # n
            ctypes.c_int32,                  # max_degree
            ctypes.c_uint64,                 # seed
            ctypes.POINTER(ctypes.c_int32),  # out adj [(n+1)*max_degree]
        ]
        lib.random_walks.restype = ctypes.c_int64
        lib.random_walks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # flat neighbor pool
            ctypes.POINTER(ctypes.c_int64),  # offsets [n+1]
            ctypes.c_int64,                  # n
            ctypes.POINTER(ctypes.c_int32),  # start nodes
            ctypes.c_int64,                  # num start nodes
            ctypes.c_int32,                  # num_walks
            ctypes.c_int32,                  # walk_len
            ctypes.c_uint64,                 # seed
            ctypes.POINTER(ctypes.c_int32),  # out pairs [cap*2]
            ctypes.c_int64,                  # capacity (pairs)
        ]
        _LIB = lib
        return _LIB


def _flatten(neighbors: list) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(neighbors) + 1, dtype=np.int64)
    for i, nb in enumerate(neighbors):
        offsets[i + 1] = offsets[i] + len(nb)
    if offsets[-1] == 0:
        pool = np.zeros(0, dtype=np.int32)
    else:
        pool = np.concatenate([np.asarray(nb, dtype=np.int32) for nb in neighbors])
    return pool, offsets


def native_pad_adjacency(
    neighbors: list, n: int, max_degree: int, seed: int
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pool, offsets = _flatten(neighbors)
    out = np.empty(((n + 1) * max_degree,), dtype=np.int32)
    pool_c = np.ascontiguousarray(pool)
    lib.pad_adjacency(
        pool_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        ctypes.c_int32(max_degree),
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out.reshape(n + 1, max_degree)


def native_random_walks(
    neighbors: list,
    nodes: np.ndarray,
    num_walks: int,
    walk_len: int,
    seed: int,
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pool, offsets = _flatten(neighbors)
    cap = int(len(nodes)) * num_walks * walk_len
    out = np.empty((cap * 2,), dtype=np.int32)
    nodes_c = np.ascontiguousarray(nodes, dtype=np.int32)
    pool_c = np.ascontiguousarray(pool)
    count = lib.random_walks(
        pool_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(neighbors)),
        nodes_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(nodes_c)),
        ctypes.c_int32(num_walks),
        ctypes.c_int32(walk_len),
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(cap),
    )
    return out[: count * 2].reshape(-1, 2).copy()


def native_available() -> bool:
    return _load() is not None
