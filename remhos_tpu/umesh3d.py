"""General (unstructured) 3D hex meshes with orientation-aware topology.

The 3D analog of umesh.py: arbitrary conforming hex meshes where elements
may meet with any of the 8 relative face orientations. The reference
handles this with explicit orientation caseology (GetLocalFaceDofIndex3D,
remhos_tools.cpp:1078-1329); here the face-dof correspondence is derived
directly from the matched vertex quads — for two elements sharing a face,
the affine map between their tangential index frames is reconstructed
from where the four corner vertices land, and applied to all (p+1)^2 face
dofs. The same construction gives oriented edge/face numbering for the
global Gauss-Lobatto CG (bounds) space.

MFEM hex vertex order (v0..v7: bottom quad ccw, then top quad aligned)
maps to lex corners as [v0, v1, v3, v2, v4, v5, v7, v6].
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .basis import gauss_lobatto
from .dofmaps import DofMaps, face_dof_table, _lex_multi_index
from .mesh import FACES_3D

# face corner grids in LEX corner numbering (c = ix + 2*iy + 4*iz):
# T[j][i] with (i, j) the tangential axes in increasing mesh-axis order.
_FACE_CORNERS = {
    (2, 0): [[0, 1], [2, 3]],   # z- : (x, y)
    (2, 1): [[4, 5], [6, 7]],
    (1, 0): [[0, 1], [4, 5]],   # y- : (x, z)
    (1, 1): [[2, 3], [6, 7]],
    (0, 0): [[0, 2], [4, 6]],   # x- : (y, z)
    (0, 1): [[1, 3], [5, 7]],
}

# hex edges as lex-corner pairs (12)
_HEX_EDGES = [(0, 1), (2, 3), (4, 5), (6, 7),     # x-direction
              (0, 2), (1, 3), (4, 6), (5, 7),     # y-direction
              (0, 4), (1, 5), (2, 6), (3, 7)]     # z-direction


@dataclasses.dataclass(frozen=True)
class GeneralMesh3D:
    dim: int
    mesh_order: int
    x: np.ndarray            # [E, nm, 3]
    corners: np.ndarray      # [E, 8] vertex ids, lex order
    corner_pos: np.ndarray   # [E, 8, 3]
    nbr_elem: np.ndarray     # [E, 6]
    nbr_face: np.ndarray     # [E, 6]
    nbr_map: np.ndarray      # [E, 6, 6] affine tangential map
                             # (a_i, b_ii, b_ij, a_j, b_ji, b_jj)
    lo: tuple
    hi: tuple

    structured = False
    periodic = (False, False, False)

    @property
    def num_elements(self):
        return self.x.shape[0]

    nfaces = 6

    @property
    def bb_min(self):
        return np.asarray(self.lo)

    @property
    def bb_max(self):
        return np.asarray(self.hi)

    def element_sizes(self):
        c = self.corner_pos
        # trilinear Jacobian at the center
        def d(axis_bit):
            hi = [k for k in range(8) if (k >> axis_bit) & 1]
            lo = [k for k in range(8) if not (k >> axis_bit) & 1]
            return 0.25 * (c[:, hi].sum(1) - c[:, lo].sum(1))
        J = np.stack([d(0), d(1), d(2)], axis=-1)      # [E, 3(coord), 3(ref)]
        det = np.linalg.det(J)
        return np.abs(det) ** (1.0 / 3.0)

    def element_centers(self):
        return self.corner_pos.mean(axis=1)

    def refine(self, levels: int = 1):
        m = self
        for _ in range(levels):
            m = _refine_hex(m)
        return m


def _face_transform(A, B):
    """Affine map (i,j)->(i2,j2) over {0,1}^2 with A[j][i] == B[j2][i2].
    Returns (a_i, b_ii, b_ij, a_j, b_ji, b_jj): i2 = a_i + b_ii*i + b_ij*j."""
    A = np.asarray(A)
    B = np.asarray(B)
    pos = {int(B[j][i]): (i, j) for j in range(2) for i in range(2)}
    i0, j0 = pos[int(A[0][0])]
    i_di, j_di = pos[int(A[0][1])]      # step along my i
    i_dj, j_dj = pos[int(A[1][0])]      # step along my j
    return (i0, i_di - i0, i_dj - i0, j0, j_di - j0, j_dj - j0)


def from_arrays_3d(corners, corner_pos, mesh_order=2, x_nodes=None):
    corners = np.asarray(corners, np.int64)
    corner_pos = np.asarray(corner_pos, np.float64)
    E = corners.shape[0]
    faces = FACES_3D
    nbr_elem = np.full((E, 6), -1, np.int32)
    nbr_face = np.full((E, 6), -1, np.int32)
    nbr_map = np.zeros((E, 6, 6), np.int32)
    fmap = {}
    fc = [_FACE_CORNERS[f] for f in faces]
    for e in range(E):
        for f in range(6):
            quad = [[int(corners[e, fc[f][j][i]]) for i in range(2)]
                    for j in range(2)]
            key = frozenset(quad[0] + quad[1])
            if key in fmap:
                e2, f2, quad2 = fmap.pop(key)
                nbr_elem[e, f] = e2
                nbr_face[e, f] = f2
                nbr_elem[e2, f2] = e
                nbr_face[e2, f2] = f
                nbr_map[e, f] = _face_transform(quad, quad2)
                nbr_map[e2, f2] = _face_transform(quad2, quad)
            else:
                fmap[key] = (e, f, quad)
    # geometry: trilinear corner interpolation at GLL tensor points
    if x_nodes is not None:
        x = np.asarray(x_nodes, np.float64)
    else:
        gll = gauss_lobatto(mesh_order + 1)
        g = np.meshgrid(gll, gll, gll, indexing="ij")
        xi = [gg.ravel(order="F") for gg in g]
        w = np.ones((len(xi[0]), 8))
        for c in range(8):
            for a in range(3):
                t = xi[a]
                w[:, c] *= t if (c >> a) & 1 else (1.0 - t)
        x = np.einsum("nc,ecd->end", w, corner_pos)
    lo = tuple(x.reshape(-1, 3).min(axis=0))
    hi = tuple(x.reshape(-1, 3).max(axis=0))
    return GeneralMesh3D(3, mesh_order, x, corners, corner_pos,
                         nbr_elem, nbr_face, nbr_map, lo, hi)


def _refine_hex(m: GeneralMesh3D):
    E = m.num_elements
    corners = m.corners
    pos = m.corner_pos
    next_vid = int(corners.max()) + 1
    table = {}

    def node_id(vids):
        nonlocal next_vid
        key = tuple(sorted(int(v) for v in vids))
        if key not in table:
            table[key] = next_vid
            next_vid += 1
        return table[key]

    new_c, new_p = [], []
    sub = _lex_multi_index(2, 3)        # 8 children, lex
    for e in range(E):
        c = corners[e]
        p = pos[e]

        def vid(ix, iy, iz):
            """id of the refined-grid node at half-integer coords (0,1,2):
            corner coords -> parent vertex; otherwise a shared id keyed by
            the set of touching parent corners (edge mid / face / center)."""
            axes = []
            for v, a in ((ix, 0), (iy, 1), (iz, 2)):
                axes.append([v // 2] if v in (0, 2) else [0, 1])
            ids = []
            for bx in axes[0]:
                for by in axes[1]:
                    for bz in axes[2]:
                        ids.append(int(c[bx + 2 * by + 4 * bz]))
            if len(ids) == 1:
                return ids[0]
            return node_id(ids)

        def ppos(ix, iy, iz):
            axes = []
            for v in (ix, iy, iz):
                axes.append([v // 2] if v in (0, 2) else [0, 1])
            acc = np.zeros(3)
            n = 0
            for bx in axes[0]:
                for by in axes[1]:
                    for bz in axes[2]:
                        acc += p[bx + 2 * by + 4 * bz]
                        n += 1
            return acc / n

        for s in sub:                   # child at offset s (x fastest)
            kc, kp = [], []
            for corner in _lex_multi_index(2, 3):
                q = s + corner          # half-grid coords in 0..2
                kc.append(vid(*q))
                kp.append(ppos(*q))
            new_c.append(kc)
            new_p.append(kp)
    return from_arrays_3d(np.asarray(new_c), np.asarray(new_p), m.mesh_order)


def build_general_dofmaps_3d(mesh: GeneralMesh3D, p: int) -> DofMaps:
    n1 = p + 1
    nd = n1 ** 3
    fd = n1 * n1
    bdr = face_dof_table(p, 3)          # [6, fd]
    E = mesh.num_elements
    faces = FACES_3D
    fc = [_FACE_CORNERS[f] for f in faces]

    # ---- neighbor dof table with orientation maps ----
    tidx = _lex_multi_index(n1, 2)      # face dof (i, j), i fastest
    nbr_dof = np.zeros((E, 6, fd), np.int32)
    for e in range(E):
        for f in range(6):
            f2 = mesh.nbr_face[e, f]
            if f2 < 0:
                nbr_dof[e, f] = bdr[f]
                continue
            a_i, b_ii, b_ij, a_j, b_ji, b_jj = mesh.nbr_map[e, f]
            i2 = a_i * p + b_ii * tidx[:, 0] + b_ij * tidx[:, 1]
            j2 = a_j * p + b_ji * tidx[:, 0] + b_jj * tidx[:, 1]
            nbr_dof[e, f] = bdr[f2][i2 + n1 * j2]

    # ---- global CG (GLL, order q = max(p,1)) node numbering ----
    q = max(p, 1)
    nq1 = q + 1
    midx = _lex_multi_index(nq1, 3)
    ndb = nq1 ** 3
    cg_idx = np.zeros((E, ndb), np.int32)
    vert_node, edge_node, face_node = {}, {}, {}
    counter = 0

    def vnode(v):
        nonlocal counter
        if v not in vert_node:
            vert_node[v] = counter
            counter += 1
        return vert_node[v]

    def enode(va, vb, k):
        nonlocal counter
        key = (min(va, vb), max(va, vb))
        if key not in edge_node:
            edge_node[key] = counter
            counter += q - 1
        kk = k if va < vb else (q - 2 - k)
        return edge_node[key] + kk

    def fnode(quad, i, j):
        """quad[j][i] vertex ids of the face; (i,j) interior coords 1..q-1.
        Canonical frame: anchor = min vertex; s-axis toward its smaller
        face-neighbor."""
        nonlocal counter
        ids = [quad[0][0], quad[0][1], quad[1][0], quad[1][1]]
        key = tuple(sorted(ids))
        if key not in face_node:
            face_node[key] = counter
            counter += (q - 1) * (q - 1)
        base = face_node[key]
        pos = {int(quad[jj][ii]): (ii, jj) for jj in range(2)
               for ii in range(2)}
        amin = min(ids)
        ia, ja = pos[amin]
        # face-neighbors of the anchor (adjacent corners)
        nb1 = quad[ja][1 - ia]          # step along i
        nb2 = quad[1 - ja][ia]          # step along j
        # canonical s toward the smaller neighbor
        if nb1 < nb2:
            s_vec, t_vec = (1 - 2 * ia, 0), (0, 1 - 2 * ja)
        else:
            s_vec, t_vec = (0, 1 - 2 * ja), (1 - 2 * ia, 0)
        # coords relative to the anchor (in units of q)
        di, dj = i - ia * q, j - ja * q
        s = s_vec[0] * di + s_vec[1] * dj
        t = t_vec[0] * di + t_vec[1] * dj
        return base + (s - 1) + (q - 1) * (t - 1)

    corner_of = {}
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                corner_of[(cx * q, cy * q, cz * q)] = cx + 2 * cy + 4 * cz
    for e in range(E):
        c = mesh.corners[e]
        for jn in range(ndb):
            i0, i1, i2 = (int(v) for v in midx[jn])
            on = [i0 in (0, q), i1 in (0, q), i2 in (0, q)]
            if all(on):
                cg_idx[e, jn] = vnode(int(c[corner_of[(i0, i1, i2)]]))
            elif sum(on) == 2:
                # on an edge: the free axis
                free = on.index(False)
                coords = [i0, i1, i2]
                k = coords[free] - 1
                lo = [coords[a] // q if a != free else 0 for a in range(3)]
                hi = [coords[a] // q if a != free else 1 for a in range(3)]
                va = int(c[lo[0] + 2 * lo[1] + 4 * lo[2]])
                vb = int(c[hi[0] + 2 * hi[1] + 4 * hi[2]])
                cg_idx[e, jn] = enode(va, vb, k)
            elif sum(on) == 1:
                # on a face: the fixed axis
                fixed = on.index(True)
                coords = [i0, i1, i2]
                side = coords[fixed] // q
                quad = [[int(c[v]) for v in row]
                        for row in _FACE_CORNERS[(fixed, side)]]
                tang = [a for a in range(3) if a != fixed]
                cg_idx[e, jn] = fnode(quad, coords[tang[0]], coords[tang[1]])
            else:
                cg_idx[e, jn] = counter
                counter += 1

    sidx = _lex_multi_index(p, 3) if p >= 1 else np.zeros((1, 3), int)
    cornr = _lex_multi_index(2, 3)
    strides = n1 ** np.arange(3)
    sub2ind = (((sidx[:, None, :] + cornr[None, :, :]) * strides)
               .sum(-1).astype(np.int32))
    return DofMaps(p, 3, nd, fd, 6, bdr, mesh.nbr_elem, nbr_dof,
                   cg_idx, counter, sub2ind)
