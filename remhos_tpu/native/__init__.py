"""Native (C++) setup kernels: table builders and MFEM mesh parsing.

Compiled on first use into a shared library next to the source (g++,
plain C ABI, bound with ctypes — no pybind11). See tables.py.
"""

from .tables import (build_cg_index, build_neighbor_table, is_available,
                     load_mfem_mesh)

__all__ = ["build_neighbor_table", "build_cg_index", "load_mfem_mesh",
           "is_available"]
