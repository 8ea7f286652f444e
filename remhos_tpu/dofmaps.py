"""Static dof-topology tables (the DofInfo equivalent).

TPU-native replacement for the reference's DofInfo
(remhos_tools.cpp:356-734): instead of per-element loops over MFEM face
objects and orientation tables, everything is precomputed numpy index
arrays consumed by vectorized gathers/scatters:

- ``bdr_dofs[nfaces, fd]``    — element-local dof ids on each local face,
  lexicographic in the face-tangential axes (ExtractBdrDofs equivalent,
  remhos_tools.cpp:1356-1431).
- ``nbr_face[...]``           — for each (element, face, face-dof), the
  (neighbor element, neighbor local dof) pair (FillNeighborDofs equivalent,
  remhos_tools.cpp:525-676). In a structured mesh all elements share one
  orientation, so the 3D orientation caseology collapses to "same
  tangential index, opposite face".
- ``cg_idx[E, nd]``           — global Gauss-Lobatto CG node id of each DG
  dof, for overlap bounds (ComputeOverlapBounds scatter/gather,
  remhos_tools.cpp:432-495).
- ``sub2ind[numSubcells, 2^dim]`` — subcell corner dofs
  (FillSubcell2CellDof, remhos_tools.cpp:678-734).

All tables are plain numpy, built once at setup.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .mesh import StructuredMesh, faces_for_dim


def _lex_multi_index(n1: int, dim: int) -> np.ndarray:
    """[(n1)^dim, dim] multi-indices, x fastest."""
    grids = np.meshgrid(*[np.arange(n1)] * dim, indexing="ij")
    return np.stack([g.ravel(order="F") for g in grids], axis=-1)


def face_dof_table(p: int, dim: int) -> np.ndarray:
    """bdr_dofs[nfaces, (p+1)^(dim-1)]: local dofs on each face, lex order."""
    n1 = p + 1
    midx = _lex_multi_index(n1, dim)  # [nd, dim]
    strides = n1 ** np.arange(dim)
    faces = faces_for_dim(dim)
    fd = n1 ** (dim - 1)
    out = np.empty((len(faces), fd), dtype=np.int32)
    for f, (axis, side) in enumerate(faces):
        val = 0 if side == 0 else p
        mask = midx[:, axis] == val
        sel = np.where(mask)[0]
        # order lexicographically in remaining axes (x fastest among them)
        rem_axes = [a for a in range(dim) if a != axis]
        key = np.zeros(len(sel), dtype=np.int64)
        mult = 1
        for a in rem_axes:
            key += midx[sel, a] * mult
            mult *= n1
        out[f] = sel[np.argsort(key, kind="stable")]
    return out


def opposite_face(dim: int) -> np.ndarray:
    """opp[f] = local face index of the same-axis opposite side."""
    faces = faces_for_dim(dim)
    opp = np.empty(len(faces), dtype=np.int32)
    for f, (axis, side) in enumerate(faces):
        for g, (axis2, side2) in enumerate(faces):
            if axis2 == axis and side2 == 1 - side:
                opp[f] = g
    return opp


@dataclasses.dataclass(frozen=True)
class DofMaps:
    p: int
    dim: int
    nd: int                      # dofs per element
    fd: int                      # dofs per face
    nfaces: int
    bdr_dofs: np.ndarray         # [nfaces, fd] local dof ids on each face
    nbr_elem: np.ndarray         # [E, nfaces] neighbor elements, -1 = boundary
    nbr_dof_local: np.ndarray    # [nfaces, fd] local dof id in the NEIGHBOR
    cg_idx: np.ndarray           # [E, nd] global CG (GLL) node ids (p>=1)
    n_cg: int                    # number of global CG nodes
    sub2ind: np.ndarray          # [numSubcells, 2^dim]


def build_dofmaps(mesh: StructuredMesh, p: int) -> DofMaps:
    dim = mesh.dim
    n1 = p + 1
    nd = n1 ** dim
    bdr = face_dof_table(p, dim)
    opp = opposite_face(dim)
    # matching dof on the neighbor: same tangential lex position on the
    # opposite face (identical element orientations in a structured grid).
    nbr_dof_local = bdr[opp]

    # --- CG (Gauss-Lobatto H1) node ids for overlap bounds, order max(p,1) ---
    q = max(p, 1)
    nq1 = q + 1
    midx = _lex_multi_index(nq1, dim)  # [ndb, dim]
    shape = mesh.shape
    # global CG grid size per axis
    gshape = tuple((q * s) if per else (q * s + 1)
                   for s, per in zip(shape, mesh.periodic))
    gstrides = np.cumprod((1,) + gshape[:-1])
    # element multi-indices
    E = mesh.num_elements
    eidx = np.stack(np.unravel_index(np.arange(E), shape, order="F"), axis=-1)
    # gnode[e, j, d] = (q*eidx[e,d] + midx[j,d]) mod gshape[d] (if periodic)
    g = q * eidx[:, None, :] + midx[None, :, :]
    for d in range(dim):
        if mesh.periodic[d]:
            g[:, :, d] %= gshape[d]
    cg_idx = (g * gstrides).sum(-1).astype(np.int32)  # [E, ndb]
    n_cg = int(np.prod(gshape))

    # --- subcell corner map (p^dim subcells, 2^dim corners each) ---
    if p >= 1:
        sidx = _lex_multi_index(p, dim)    # [p^dim, dim] subcell origins
        corner = _lex_multi_index(2, dim)  # [2^dim, dim]
        strides = n1 ** np.arange(dim)
        sub2ind = ((sidx[:, None, :] + corner[None, :, :]) * strides).sum(-1)
        sub2ind = sub2ind.astype(np.int32)
    else:
        sub2ind = np.zeros((1, 1), dtype=np.int32)

    return DofMaps(p, dim, nd, n1 ** (dim - 1), mesh.nfaces, bdr,
                   mesh.nbr_elem, nbr_dof_local, cg_idx, n_cg, sub2ind)
