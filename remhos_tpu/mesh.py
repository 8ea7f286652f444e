"""Structured quad/hex meshes as dense arrays.

TPU-native replacement for the used subset of MFEM's Mesh/ParMesh
(reference usage: remhos.cpp:442-531). Instead of an unstructured element
graph, the mesh is a Cartesian grid of `shape` elements per axis with
optional periodicity; everything downstream is index arithmetic:

- node coordinates are stored **per element**, `x[E, nm, dim]` with
  nm = (mesh_order+1)^dim Gauss-Lobatto nodes in lexicographic order.
  This matches MFEM's L2 (periodic) / H1 (non-periodic) mesh-node spaces
  (remhos.cpp:515-527) — per-element storage is the discontinuous superset
  and is exactly what the geometry kernels consume.
- element face neighbors are `nbr_elem[E, nfaces]` (-1 at physical
  boundaries), from grid index arithmetic with periodic wrap.

Uniform refinement (remhos.cpp:449) is just `shape * 2`.

The built-in mesh registry reproduces the *geometry* of the reference's
structured mesh files (data/inline-quad.mesh etc.); unstructured/NURBS
meshes are out of scope for the structured-hex core (see SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .basis import gauss_lobatto


# Face numbering follows MFEM's local face order so that reference citations
# line up (quad edges: bottom,right,top,left; hex faces: bottom(z-),front(y-),
# right(x+),back(y+),left(x-),top(z+); segment: left,right).
# Each face is (axis, side) with side 0 = low end, 1 = high end.
FACES_1D = ((0, 0), (0, 1))
FACES_2D = ((1, 0), (0, 1), (1, 1), (0, 0))
FACES_3D = ((2, 0), (1, 0), (0, 1), (1, 1), (0, 0), (2, 1))


def faces_for_dim(dim: int):
    return {1: FACES_1D, 2: FACES_2D, 3: FACES_3D}[dim]


@dataclasses.dataclass(frozen=True)
class StructuredMesh:
    """Immutable structured mesh description + per-element node coords.

    `breaks` holds the exact per-axis element boundaries. The reference's
    mesh files store truncated decimals (e.g. periodic-cube.mesh interior
    vertices are six-digit -0.333333), and golden parity requires
    reproducing those exact values — so breaks, not (lo, hi, shape), are
    the source of truth for geometry.
    """

    dim: int
    shape: tuple[int, ...]          # elements per axis
    lo: tuple[float, ...]           # domain bounds
    hi: tuple[float, ...]
    periodic: tuple[bool, ...]
    mesh_order: int                 # geometry order (MFEM mesh_order, default 2)
    x: np.ndarray                   # [E, nm, dim] node coords (GLL tensor nodes)
    nbr_elem: np.ndarray            # [E, nfaces] neighbor element ids, -1 = bdr
    breaks: tuple = None            # per-axis element boundary coordinates

    structured = True

    @property
    def num_elements(self) -> int:
        return int(np.prod(self.shape))

    @property
    def nfaces(self) -> int:
        return 2 * self.dim

    @property
    def nodes_per_elem(self) -> int:
        return (self.mesh_order + 1) ** self.dim

    @property
    def bb_min(self) -> np.ndarray:
        return np.asarray(self.lo)

    @property
    def bb_max(self) -> np.ndarray:
        return np.asarray(self.hi)

    def refine(self, levels: int = 1) -> "StructuredMesh":
        """Uniform refinement = midpoint insertion per axis (matches MFEM
        Mesh::UniformRefinement of a tensor mesh)."""
        m = self
        for _ in range(levels):
            new_breaks = tuple(_refine_breaks(b) for b in m.breaks)
            m = make_mesh_from_breaks(m.dim, new_breaks, m.periodic,
                                      m.mesh_order)
        return m

    def element_sizes(self) -> np.ndarray:
        """[E] per-element size (prod of widths)^(1/dim) — MFEM
        GetElementSize type 0 for a tensor grid."""
        widths = [np.diff(b) for b in self.breaks]
        grids = np.meshgrid(*widths, indexing="ij")
        vol = np.ones_like(grids[0])
        for g in grids:
            vol = vol * g
        return (vol.ravel(order="F")) ** (1.0 / self.dim)

    def element_centers(self) -> np.ndarray:
        """[E, dim] element centers."""
        cs = [0.5 * (b[:-1] + b[1:]) for b in self.breaks]
        grids = np.meshgrid(*cs, indexing="ij")
        return np.stack([g.ravel(order="F") for g in grids], axis=-1)


def _refine_breaks(b: np.ndarray) -> np.ndarray:
    mids = 0.5 * (b[:-1] + b[1:])
    out = np.empty(2 * len(b) - 1)
    out[0::2] = b
    out[1::2] = mids
    return out


def _element_multi_index(shape: tuple[int, ...]) -> np.ndarray:
    """[E, dim] multi-indices, x fastest (element id = i + nx*j + nx*ny*k)."""
    dim = len(shape)
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    return np.stack([g.ravel(order="F") for g in grids], axis=-1)


def make_mesh_from_breaks(
    dim: int,
    breaks: tuple,
    periodic: tuple[bool, ...],
    mesh_order: int = 2,
) -> StructuredMesh:
    breaks = tuple(np.asarray(b, dtype=np.float64) for b in breaks)
    shape = tuple(len(b) - 1 for b in breaks)
    lo = tuple(float(b[0]) for b in breaks)
    hi = tuple(float(b[-1]) for b in breaks)
    periodic = tuple(bool(b) for b in periodic)
    E = int(np.prod(shape))
    nm1 = mesh_order + 1
    gll = gauss_lobatto(nm1)  # [nm1] on [0,1]

    eidx = _element_multi_index(shape)  # [E, dim]

    # reference tensor nodes, x fastest
    grids = np.meshgrid(*([gll] * dim), indexing="ij")
    ref = np.stack([g.ravel(order="F") for g in grids], axis=-1)  # [nm, dim]

    # x[e, n, d] = breaks[d][i_e] + ref[n, d] * width
    x = np.empty((E, len(ref), dim))
    for d in range(dim):
        b = breaks[d]
        los = b[eidx[:, d]]
        ws = b[eidx[:, d] + 1] - los
        x[:, :, d] = los[:, None] + ref[None, :, d] * ws[:, None]

    # neighbor table
    strides = np.cumprod((1,) + shape[:-1])  # [dim]
    faces = faces_for_dim(dim)
    nbr = np.empty((E, len(faces)), dtype=np.int32)
    for f, (axis, side) in enumerate(faces):
        step = 1 if side == 1 else -1
        tgt = eidx[:, axis] + step
        if periodic[axis]:
            tgt_wrapped = np.mod(tgt, shape[axis])
            valid = np.ones(E, dtype=bool)
        else:
            tgt_wrapped = np.clip(tgt, 0, shape[axis] - 1)
            valid = (tgt >= 0) & (tgt < shape[axis])
        nbr_id = (eidx @ strides) + (tgt_wrapped - eidx[:, axis]) * strides[axis]
        nbr[:, f] = np.where(valid, nbr_id, -1)

    return StructuredMesh(dim, shape, lo, hi, periodic, mesh_order,
                          x.astype(np.float64), nbr, breaks)


def make_cartesian_mesh(
    dim: int,
    shape: tuple[int, ...],
    lo: tuple[float, ...],
    hi: tuple[float, ...],
    periodic: tuple[bool, ...],
    mesh_order: int = 2,
) -> StructuredMesh:
    breaks = tuple(np.linspace(lo[d], hi[d], shape[d] + 1) for d in range(dim))
    return make_mesh_from_breaks(dim, breaks, periodic, mesh_order)


# ---------------------------------------------------------------------------
# Registry of the reference's structured meshes (geometry equivalents).
# Citations are the mesh files under /root/reference/data/.
# ---------------------------------------------------------------------------

# The per-axis breakpoints reproduce the EXACT coordinates stored in the
# reference mesh files (truncated decimals and all) — required to match the
# reference goldens at full precision.
_T9 = 0.333333333      # periodic-square.mesh interior vertex (9 digits)
_T6 = 0.333333         # periodic-cube.mesh interior vertex (6 digits)
_REGISTRY = {
    # data/inline-quad.mesh: 4x4 quads on [0,1]^2, non-periodic
    "inline-quad": dict(dim=2, breaks=([0, 0.25, 0.5, 0.75, 1],) * 2,
                        periodic=(False, False)),
    # data/periodic-square.mesh: 3x3 quads on [-1,1]^2, fully periodic
    "periodic-square": dict(dim=2, breaks=([-1, -_T9, _T9, 1],) * 2,
                            periodic=(True, True)),
    # data/periodic-cube.mesh: 3x3x3 hexes on [-1,1]^3, fully periodic
    "periodic-cube": dict(dim=3, breaks=([-1, -_T6, _T6, 1],) * 3,
                          periodic=(True, True, True)),
    # data/cube01_hex.mesh: 2x2x2 hexes on [0,1]^3, non-periodic
    "cube01_hex": dict(dim=3, breaks=([0, 0.5, 1],) * 3,
                       periodic=(False, False, False)),
    # data/periodic-segment.mesh: 4 segments on [0,1], periodic
    "periodic-segment": dict(dim=1, breaks=([0, 0.25, 0.5, 0.75, 1],),
                             periodic=(True,)),
}


def load_mesh(name: str, rs_levels: int = 0, mesh_order: int = 2):
    """Named mesh + serial refinements (mirrors remhos.cpp:448-449).
    Unknown names fall through to the general MFEM .mesh loader (2D quads)
    — searched as a path, then under $REMHOS_REF_DATA."""
    key = name
    for suffix in (".mesh",):
        if key.endswith(suffix):
            key = key[: -len(suffix)]
    key = key.split("/")[-1]
    if key not in _REGISTRY:
        import os

        from .umesh import load_general_mesh
        candidates = [name]
        data_dir = os.environ.get("REMHOS_REF_DATA",
                                  "/root/reference/data")
        candidates.append(os.path.join(data_dir, key + ".mesh"))
        for c in candidates:
            if os.path.exists(c):
                return load_general_mesh(c, rs_levels, mesh_order)
        raise ValueError(
            f"unknown/unsupported mesh '{name}' (structured meshes: "
            f"{sorted(_REGISTRY)}; general quad/hex/NURBS/curved-H1 "
            f".mesh files by path or $REMHOS_REF_DATA name)")
    spec = _REGISTRY[key]
    m = make_mesh_from_breaks(spec["dim"], spec["breaks"], spec["periodic"],
                              mesh_order)
    return m.refine(rs_levels)


def default_mesh(dim: int, n_shards: int, elem_per_shard: int,
                 mesh_order: int = 2) -> StructuredMesh:
    """Weak-scaling mesh factory: exactly n_shards*elem_per_shard elements.

    Reference contract: PartitionMPI builds a Cartesian mesh with
    `elem_per_mpi` elements per rank (remhos.cpp:453, verified :467-472).
    We build the flattest box whose last axis is divisible by n_shards.
    """
    total = n_shards * elem_per_shard
    # factor `total` into `dim` near-equal axes with last axis % n_shards == 0
    per = round(total ** (1.0 / dim))
    axes = [max(1, per)] * (dim - 1)
    rem = total
    for a in axes:
        while rem % a != 0:
            a -= 1
        rem //= a
    # recompute cleanly
    axes = []
    rem = total
    for d in range(dim - 1):
        a = max(1, round(rem ** (1.0 / (dim - d))))
        while rem % a != 0:
            a -= 1
        axes.append(a)
        rem //= a
    axes.append(rem)
    assert int(np.prod(axes)) == total
    return make_cartesian_mesh(dim, tuple(axes), (0.0,) * dim, (1.0,) * dim,
                               (False,) * dim, mesh_order)
