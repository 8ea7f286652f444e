"""ctypes bindings for the native setup kernels (remhos_tables.cpp).

The shared library is compiled with g++ on first import (cached beside the
source; rebuilt when the source is newer). Everything degrades gracefully:
if no compiler is available, callers fall back to the numpy reference
implementations in dofmaps.py/mesh.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "remhos_tables.cpp")
_SO = os.path.join(_DIR, "libremhos_tables.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        _lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    _lib.build_neighbor_table.restype = ctypes.c_int
    _lib.build_cg_index.restype = ctypes.c_int
    _lib.parse_mfem_mesh.restype = ctypes.c_int
    _lib.get_inline_spec.restype = ctypes.c_int
    _lib.get_mesh_arrays.restype = ctypes.c_int
    return _lib


def is_available() -> bool:
    return _load() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def build_neighbor_table(shape, periodic) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    dim = len(shape)
    E = int(np.prod(shape))
    out = np.empty((E, 2 * dim), dtype=np.int32)
    sh = np.asarray(shape, dtype=np.int64)
    per = np.asarray(periodic, dtype=np.uint8)
    rc = lib.build_neighbor_table(dim, _ptr(sh, ctypes.c_int64),
                                  _ptr(per, ctypes.c_uint8),
                                  _ptr(out, ctypes.c_int32))
    return out if rc == 0 else None


def build_cg_index(shape, periodic, q) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    dim = len(shape)
    E = int(np.prod(shape))
    nd = (q + 1) ** dim
    out = np.empty((E, nd), dtype=np.int32)
    sh = np.asarray(shape, dtype=np.int64)
    per = np.asarray(periodic, dtype=np.uint8)
    rc = lib.build_cg_index(dim, _ptr(sh, ctypes.c_int64),
                            _ptr(per, ctypes.c_uint8), q,
                            _ptr(out, ctypes.c_int32))
    return out if rc == 0 else None


def load_mfem_mesh(path: str):
    """Parse an MFEM .mesh file. Returns a dict:
    inline meshes  -> {kind: 'inline', dim, n: (..), s: (..)}
    v1.0 meshes    -> {kind: 'v10', dim, elem_verts[E,vpe],
                       verts[nv,dim] or l2_nodes[E,(o+1)^dim,dim]}"""
    lib = _load()
    if lib is None:
        return None
    dims = np.zeros(8, dtype=np.int64)
    rc = lib.parse_mfem_mesh(path.encode(), _ptr(dims, ctypes.c_int64))
    if rc != 0:
        raise IOError(f"parse_mfem_mesh({path}) failed: rc={rc}")
    dim, n_elems, n_verts, vpe, has_l2, l2_order, is_inline, n_l2 = (
        int(x) for x in dims)
    if is_inline:
        n = np.zeros(3, dtype=np.int64)
        s = np.zeros(3, dtype=np.float64)
        lib.get_inline_spec(_ptr(n, ctypes.c_int64), _ptr(s, ctypes.c_double))
        return {"kind": "inline", "dim": dim,
                "n": tuple(int(v) for v in n[:dim]),
                "s": tuple(float(v) for v in s[:dim])}
    ev = np.zeros((n_elems, vpe), dtype=np.int64)
    vs = np.zeros((max(n_verts, 1), dim), dtype=np.float64)
    l2 = np.zeros(max(n_l2, 1), dtype=np.float64)
    lib.get_mesh_arrays(_ptr(ev, ctypes.c_int64), _ptr(vs, ctypes.c_double),
                        _ptr(l2, ctypes.c_double))
    out = {"kind": "v10", "dim": dim, "elem_verts": ev}
    if has_l2:
        ndn = (l2_order + 1) ** dim
        out["l2_nodes"] = l2[:n_elems * ndn * dim].reshape(n_elems, ndn, dim)
        out["l2_order"] = l2_order
    else:
        out["verts"] = vs
    return out
