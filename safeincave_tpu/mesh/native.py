"""ctypes bindings for the native C++ mesh-preprocessing library.

Compiles ``native/mesh_preprocess.cpp`` on first use (cached under
``~/.cache/safeincave_tpu``); every entry point has a pure-numpy fallback so
the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_REPO_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "mesh_preprocess.cpp")
_lib = None
_lib_tried = False


def _build_and_load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.abspath(_REPO_SRC)
    if not os.path.isfile(src):
        return None
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "safeincave_tpu")
        os.makedirs(cache, exist_ok=True)
        so_path = os.path.join(cache, f"libsicpre-{digest}.so")
        if not os.path.isfile(so_path):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.morton_order.argtypes = [f64p, ctypes.c_int64, i64p]
        lib.rcb_partition.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32,
                                      i32p, i64p]
        lib.node_first_touch.argtypes = [i32p, ctypes.c_int64,
                                         ctypes.c_int64, i64p]
        lib.tet_adjacency.argtypes = [i32p, ctypes.c_int64, i64p]
        _lib = lib
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        print(f"[safeincave_tpu] native preprocess unavailable ({exc}); "
              "using numpy fallbacks", file=sys.stderr)
        _lib = None
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
def morton_order(centroids: np.ndarray) -> np.ndarray:
    """Z-order locality permutation of elements (new_pos -> old_index)."""
    centroids = np.ascontiguousarray(centroids, dtype=np.float64)
    n = centroids.shape[0]
    lib = _build_and_load()
    if lib is not None:
        out = np.empty(n, dtype=np.int64)
        lib.morton_order(_ptr(centroids, ctypes.c_double), n,
                         _ptr(out, ctypes.c_int64))
        return out
    # numpy fallback: interleave 21-bit quantized coordinates
    lo = centroids.min(axis=0)
    span = centroids.max(axis=0) - lo
    ext = np.where(span > 0, span, 1.0)
    q = ((centroids - lo) / ext * 2097151.0).astype(np.uint64)

    def expand(v):
        v &= np.uint64(0x1fffff)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1f00000000ffff)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1f0000ff0000ff)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100f00f00f00f00f)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10c30c30c30c30c3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    code = (expand(q[:, 0]) | (expand(q[:, 1]) << np.uint64(1))
            | (expand(q[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable").astype(np.int64)


def rcb_partition(centroids: np.ndarray, nparts: int):
    """Recursive coordinate bisection -> (part_id per elem, ordering)."""
    centroids = np.ascontiguousarray(centroids, dtype=np.float64)
    n = centroids.shape[0]
    lib = _build_and_load()
    if lib is not None:
        parts = np.empty(n, dtype=np.int32)
        order = np.empty(n, dtype=np.int64)
        lib.rcb_partition(_ptr(centroids, ctypes.c_double), n, nparts,
                          _ptr(parts, ctypes.c_int32),
                          _ptr(order, ctypes.c_int64))
        return parts, order
    # numpy fallback
    parts = np.zeros(n, dtype=np.int32)

    def recurse(ids, k, base):
        if k <= 1:
            parts[ids] = base
            return
        c = centroids[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        kl = k // 2
        split = len(ids) * kl // k
        order_ax = np.argsort(c[:, axis], kind="stable")
        ids_sorted = ids[order_ax]
        recurse(ids_sorted[:split], kl, base)
        recurse(ids_sorted[split:], k - kl, base + kl)

    recurse(np.arange(n), nparts, 0)
    order = np.argsort(parts, kind="stable").astype(np.int64)
    return parts, order


def node_first_touch(conn: np.ndarray, n_nodes: int) -> np.ndarray:
    """perm[old_node] = new_node, ordered by first appearance in conn."""
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    lib = _build_and_load()
    if lib is not None:
        perm = np.empty(n_nodes, dtype=np.int64)
        lib.node_first_touch(_ptr(conn, ctypes.c_int32), conn.shape[0],
                             n_nodes, _ptr(perm, ctypes.c_int64))
        return perm
    flat = conn.reshape(-1)
    first = np.full(n_nodes, -1, dtype=np.int64)
    seen_order = []
    for v in flat:
        if first[v] < 0:
            first[v] = len(seen_order)
            seen_order.append(v)
    untouched = np.where(first < 0)[0]
    first[untouched] = np.arange(len(seen_order),
                                 len(seen_order) + len(untouched))
    return first


def tet_adjacency(conn: np.ndarray) -> np.ndarray:
    """(E, 4) neighbor element per face, -1 on boundary faces."""
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    n = conn.shape[0]
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((n, 4), dtype=np.int64)
        lib.tet_adjacency(_ptr(conn, ctypes.c_int32), n,
                          _ptr(out, ctypes.c_int64))
        return out
    # numpy fallback via sorted face triples
    faces = conn[:, [[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]]]
    fs = np.sort(faces.reshape(-1, 3), axis=1).astype(np.int64)
    key = (fs[:, 0] << 42) | (fs[:, 1] << 21) | fs[:, 2]
    order = np.argsort(key, kind="stable")
    out = np.full((n, 4), -1, dtype=np.int64)
    ks = key[order]
    same = ks[:-1] == ks[1:]
    owner = order // 4
    face = order % 4
    for i in np.where(same)[0]:
        a, b = order[i], order[i + 1]
        out[owner[i], face[i]] = owner[i + 1]
        out[owner[i + 1], face[i + 1]] = owner[i]
    return out
