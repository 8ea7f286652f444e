"""General (unstructured) quad/hex meshes with gather-based face topology.

Extends the structured core to arbitrary conforming quad meshes (and
same-orientation hex meshes) — the reference's periodic-hexagon.mesh and
unstr.mesh scenarios (remhos.cpp:448). All compute kernels are already
general in the per-element node coordinates ``x[E, nm, dim]``; this module
only builds the *topology* tables:

- neighbor element/face pairs by matching face vertex sets,
- per-(element, face) neighbor dof maps with tangential orientation
  (the 2D reversed-traversal rule of FillNeighborDofs,
  remhos_tools.cpp:590-625),
- global Gauss-Lobatto CG node ids for the overlap bounds
  (vertex / oriented-edge / interior classification),
- uniform refinement (topology via shared edge-midpoint ids, geometry via
  per-element corner interpolation so periodic wrap is handled).

MFEM quad vertex order (v0,v1,v2,v3) is counterclockwise; the tensor
(lexicographic) corner order used everywhere here is [v0, v1, v3, v2].
Sharded execution of these general meshes lives in parallel/gsharded.py
(Morton-blocked elements, all-gathered face traces, ghost padding for
non-divisible shard counts).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .basis import gauss_lobatto

# faces as ordered corner pairs in the direction of increasing tangential
# coordinate, in LEX corner numbering (c0=(0,0), c1=(1,0), c2=(0,1), c3=(1,1))
_QUAD_FACES_LEX = ((0, 1), (1, 3), (2, 3), (0, 2))  # y-,x+,y+,x- (mesh.FACES_2D)


@dataclasses.dataclass(frozen=True)
class GeneralMesh:
    dim: int
    mesh_order: int
    x: np.ndarray            # [E, nm, dim] geometry nodes (GLL tensor)
    corners: np.ndarray      # [E, 2^dim] vertex ids, LEX corner order
    corner_pos: np.ndarray   # [E, 2^dim, dim] corner positions (per elem)
    nbr_elem: np.ndarray     # [E, nf]
    nbr_face: np.ndarray     # [E, nf] neighbor's local face (-1 = boundary)
    nbr_flip: np.ndarray     # [E, nf] tangential order flipped? (2D bool)
    lo: tuple
    hi: tuple

    structured = False
    periodic = (False, False)   # unused; boundary handling is per-face

    @property
    def num_elements(self) -> int:
        return self.x.shape[0]

    @property
    def nfaces(self) -> int:
        return 2 * self.dim

    @property
    def bb_min(self):
        return np.asarray(self.lo)

    @property
    def bb_max(self):
        return np.asarray(self.hi)

    def element_sizes(self) -> np.ndarray:
        """sqrt of |detJ| of the (curved) geometry at the ref center
        (GetElementSize type 0)."""
        from .basis import lagrange_grads, lagrange_vals, tensor_mixed_grads
        gll = gauss_lobatto(self.mesh_order + 1)
        c = np.array([0.5])
        Bv = lagrange_vals(gll, c)
        Gv = lagrange_grads(gll, c)
        G = tensor_mixed_grads([Bv, Bv], [Gv, Gv])[0]      # [nm, 2]
        J = np.einsum("end,nb->edb", self.x, G)
        det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        return np.sqrt(np.abs(det))

    def element_centers(self) -> np.ndarray:
        """Geometry map at the reference center (curved-aware)."""
        from .basis import lagrange_vals, tensor_mixed
        gll = gauss_lobatto(self.mesh_order + 1)
        B = tensor_mixed([lagrange_vals(gll, np.array([0.5]))] * 2)  # [1, nm]
        return np.einsum("end,n->ed", self.x, B[0])

    def refine(self, levels: int = 1) -> "GeneralMesh":
        m = self
        for _ in range(levels):
            m = _refine_quad(m)
        return m


def from_arrays(corners, corner_pos, mesh_order=2,
                x_nodes=None) -> GeneralMesh:
    """Build a GeneralMesh from lex-ordered corner ids + positions (2D).
    x_nodes overrides the geometry nodes (curved/NURBS elements)."""
    E = corners.shape[0]
    # face -> (ordered corner pair)
    nbr_elem = np.full((E, 4), -1, np.int32)
    nbr_face = np.full((E, 4), -1, np.int32)
    nbr_flip = np.zeros((E, 4), bool)
    face_map = {}
    for e in range(E):
        for f, (a, b) in enumerate(_QUAD_FACES_LEX):
            va, vb = int(corners[e, a]), int(corners[e, b])
            key = (min(va, vb), max(va, vb))
            if key in face_map:
                e2, f2, (va2, vb2) = face_map.pop(key)
                nbr_elem[e, f] = e2
                nbr_face[e, f] = f2
                nbr_elem[e2, f2] = e
                nbr_face[e2, f2] = f
                flip = (va, vb) == (va2, vb2)  # same direction => flip=False?
                # matching tangential coordinates: if the two elements
                # traverse the shared edge in OPPOSITE directions, dof j
                # matches neighbor dof (fd-1-j); in the SAME direction, j->j.
                same_dir = (va == va2 and vb == vb2)
                nbr_flip[e, f] = not same_dir
                nbr_flip[e2, f2] = not same_dir
            else:
                face_map[key] = (e, f, (va, vb))
    if x_nodes is not None:
        x = np.asarray(x_nodes, np.float64)
    else:
        # geometry nodes: bilinear corner interpolation at GLL tensor points
        gll = gauss_lobatto(mesh_order + 1)
        xi, eta = np.meshgrid(gll, gll, indexing="ij")
        xi = xi.ravel(order="F")
        eta = eta.ravel(order="F")
        w = np.stack([(1 - xi) * (1 - eta), xi * (1 - eta),
                      (1 - xi) * eta, xi * eta], axis=-1)  # [nm, 4] lex
        x = np.einsum("nc,ecd->end", w, corner_pos)
    # bounding box MFEM-style: sample the geometry on the GeometryRefiner
    # ref-lattice (GetBoundingBox(max(order,1)), remhos.cpp:457). We use a
    # dense lattice that includes the nodes; for polynomial geometry the
    # extrema at this resolution match MFEM's ref=3 lattice to rounding in
    # all cases used (interior extrema of Q2 maps lie at nodes/corners).
    from .basis import lagrange_vals as _lv, tensor_mixed as _tm
    _gll = gauss_lobatto(mesh_order + 1)
    _lat = np.linspace(0.0, 1.0, 4)
    _B = _tm([_lv(_gll, _lat)] * 2)
    _pts = np.einsum("qn,end->eqd", _B, x)
    lo = tuple(_pts.reshape(-1, 2).min(axis=0))
    hi = tuple(_pts.reshape(-1, 2).max(axis=0))
    return GeneralMesh(2, mesh_order, x, corners.astype(np.int64),
                       corner_pos, nbr_elem, nbr_face, nbr_flip, lo, hi)


def _refine_quad(m: GeneralMesh) -> GeneralMesh:
    """Uniform refinement: topology via shared edge-midpoint ids; geometry
    by evaluating each parent's (possibly curved) Q-k map at the child
    node positions — exact for polynomial geometry, and equal to corner
    interpolation for straight elements. Periodic-safe (per-element)."""
    from .basis import lagrange_vals, tensor_mixed
    E = m.num_elements
    corners = m.corners
    pos = m.corner_pos
    # child-node evaluation tables through the parent geometry
    mo = m.mesh_order
    gll = gauss_lobatto(mo + 1)
    child_tabs = []
    for sy in (0, 1):
        for sx in (0, 1):
            tx = lagrange_vals(gll, sx / 2 + gll / 2)
            ty = lagrange_vals(gll, sy / 2 + gll / 2)
            child_tabs.append(tensor_mixed([tx, ty]))   # [nm, nm]

    next_vid = int(corners.max()) + 1
    edge_mid = {}

    def mid_id(va, vb):
        nonlocal next_vid
        key = (min(va, vb), max(va, vb))
        if key not in edge_mid:
            edge_mid[key] = next_vid
            next_vid += 1
        return edge_mid[key]

    new_corners = []
    new_pos = []
    new_x = []
    # lex corners c0..c3; children in the 2x2 lex layout
    for e in range(E):
        c = [int(v) for v in corners[e]]
        m01 = mid_id(c[0], c[1])
        m23 = mid_id(c[2], c[3])
        m02 = mid_id(c[0], c[2])
        m13 = mid_id(c[1], c[3])
        ctr = next_vid
        next_vid += 1
        kids = [
            [c[0], m01, m02, ctr],
            [m01, c[1], ctr, m13],
            [m02, ctr, c[2], m23],
            [ctr, m13, m23, c[3]],
        ]
        # child order must match child_tabs (sx fastest)
        for kidx, kc in enumerate(kids):
            new_corners.append(kc)
            kx = child_tabs[kidx] @ m.x[e]              # [nm, dim]
            new_x.append(kx)
            n1 = m.mesh_order + 1
            new_pos.append([kx[0], kx[n1 - 1], kx[n1 * (n1 - 1)],
                            kx[n1 * n1 - 1]])
    return from_arrays(np.asarray(new_corners, np.int64),
                       np.asarray(new_pos, np.float64), m.mesh_order,
                       x_nodes=np.asarray(new_x))


def load_h1_nodes_mesh(path: str, order: int, rs_levels: int = 0
                       ) -> GeneralMesh:
    """2D quad mesh with an H1 nodes grid function of a given order
    (star-q2 'Quadratic', star-q3 'Cubic').

    MFEM H1 dof layout (fespace.cpp GetElementDofs): vertices, then
    first-seen edges with order-1 dofs each stored along the edge's
    canonical (min->max vertex id) direction, then (order-1)^2 interior
    dofs per element, lex (x fastest) in the element frame. Node
    positions are Gauss-Lobatto (H1_FECollection default basis), which
    matches from_arrays' x_nodes convention."""
    import re
    txt = re.sub(r"#[^\n]*", " ", open(path).read())
    tok = txt.split()
    i = tok.index("elements") + 1
    ne = int(tok[i]); i += 1
    elems = []
    for _ in range(ne):
        i += 2
        elems.append([int(tok[i + k]) for k in range(4)])
        i += 4
    i = tok.index("vertices", i) + 1
    nv = int(tok[i]); i += 1
    # edge enumeration: first-seen, MFEM local edge order
    edge_id = {}
    for ev in elems:
        for (a, b) in ((ev[0], ev[1]), (ev[1], ev[2]), (ev[2], ev[3]),
                       (ev[3], ev[0])):
            key = (min(a, b), max(a, b))
            if key not in edge_id:
                edge_id[key] = len(edge_id)
    nedge = len(edge_id)
    i = tok.index("Ordering:", i) + 1
    ordering = int(tok[i]); i += 1
    ned = order - 1                    # dofs per edge
    nid = ned * ned                    # interior dofs per element
    ndof = nv + ned * nedge + nid * ne
    vals = np.array([float(t) for t in tok[i:i + 2 * ndof]])
    if ordering == 0:
        nodes = np.stack([vals[:ndof], vals[ndof:]], axis=1)
    else:
        nodes = vals.reshape(ndof, 2)

    n1 = order + 1
    x = np.zeros((ne, n1 * n1, 2))
    corners = np.zeros((ne, 4), np.int64)

    def lat(ix, iy):                   # lex lattice index, x fastest
        return iy * n1 + ix

    for e, ev in enumerate(elems):
        ids = np.zeros(n1 * n1, np.int64)
        # corners: MFEM ccw (v0,v1,v2,v3) -> lattice corners
        ids[lat(0, 0)] = ev[0]
        ids[lat(n1 - 1, 0)] = ev[1]
        ids[lat(n1 - 1, n1 - 1)] = ev[2]
        ids[lat(0, n1 - 1)] = ev[3]

        def edge_dofs(a, b):
            """edge dof ids walking a->b (stored min->max in the file)."""
            eid = edge_id[(min(a, b), max(a, b))]
            d = nv + ned * eid + np.arange(ned)
            return d if a < b else d[::-1]

        # local edges at lattice positions (walk in local direction)
        for k, d in enumerate(edge_dofs(ev[0], ev[1])):
            ids[lat(1 + k, 0)] = d                       # bottom, +x
        for k, d in enumerate(edge_dofs(ev[1], ev[2])):
            ids[lat(n1 - 1, 1 + k)] = d                  # right, +y
        for k, d in enumerate(edge_dofs(ev[2], ev[3])):
            ids[lat(n1 - 2 - k, n1 - 1)] = d             # top, -x
        for k, d in enumerate(edge_dofs(ev[3], ev[0])):
            ids[lat(0, n1 - 2 - k)] = d                  # left, -y
        # interior: lex, x fastest
        base = nv + ned * nedge + nid * e
        for jy in range(ned):
            for jx in range(ned):
                ids[lat(1 + jx, 1 + jy)] = base + jy * ned + jx
        x[e] = nodes[ids]
        corners[e] = [ev[0], ev[1], ev[3], ev[2]]
    cp = x[:, [0, n1 - 1, n1 * (n1 - 1), n1 * n1 - 1]]
    m = from_arrays(corners, cp, order, x_nodes=x)
    return m.refine(rs_levels)


def load_h1_quadratic_mesh(path: str, rs_levels: int = 0) -> GeneralMesh:
    return load_h1_nodes_mesh(path, 2, rs_levels)


def load_general_mesh(path: str, rs_levels: int = 0,
                      mesh_order: int = 2) -> GeneralMesh:
    """Load an MFEM .mesh file (2D quads) through the native parser."""
    with open(path) as fh:
        header = fh.readline()
        dim_line = fh.read(400)
    body = open(path).read()
    if "FiniteElementCollection: Quadratic" in body:
        return load_h1_nodes_mesh(path, 2, rs_levels)
    if "FiniteElementCollection: Cubic" in body:
        return load_h1_nodes_mesh(path, 3, rs_levels)
    if "NURBS" in header:
        if "dimension\n3" in dim_line.replace(" ", ""):
            from .nurbs import load_nurbs_mesh_3d
            return load_nurbs_mesh_3d(path, rs_levels, mesh_order)
        from .nurbs import load_nurbs_mesh
        return load_nurbs_mesh(path, rs_levels, mesh_order)
    from .native import load_mfem_mesh

    parsed = load_mfem_mesh(path)
    if parsed is None:
        raise RuntimeError("native mesh parser unavailable")
    if parsed["dim"] == 3:
        from .umesh3d import from_arrays_3d
        ev = parsed["elem_verts"]               # MFEM hex (v0..v7)
        corners = ev[:, [0, 1, 3, 2, 4, 5, 7, 6]]   # -> lex corner order
        if "l2_nodes" in parsed:
            k = parsed["l2_order"]
            xn = np.asarray(parsed["l2_nodes"], np.float64)
            n1 = k + 1
            c2 = [0, n1 - 1, n1 * (n1 - 1), n1 * n1 - 1]
            cids = c2 + [c + n1 * n1 * (n1 - 1) for c in c2]
            corner_pos = xn[:, cids]
            return from_arrays_3d(corners, corner_pos,
                                  k if k > 1 else mesh_order,
                                  x_nodes=xn if k > 1 else None
                                  ).refine(rs_levels)
        corner_pos = parsed["verts"][corners]
        return from_arrays_3d(corners, corner_pos,
                              mesh_order).refine(rs_levels)
    ev = parsed["elem_verts"]                   # MFEM ccw (v0,v1,v2,v3)
    corners = ev[:, [0, 1, 3, 2]]               # -> lex corner order
    if "l2_nodes" in parsed:
        # per-element GLL-lattice nodes (periodic / curved L2-nodes mesh)
        k = parsed["l2_order"]
        xn = np.asarray(parsed["l2_nodes"], np.float64)
        n1 = k + 1
        cids = [0, n1 - 1, n1 * (n1 - 1), n1 * n1 - 1]
        corner_pos = xn[:, cids]
        m = from_arrays(np.asarray(corners, np.int64), corner_pos,
                        k if k > 1 else mesh_order,
                        x_nodes=xn if k > 1 else None)
        return m.refine(rs_levels)
    corner_pos = parsed["verts"][corners]
    m = from_arrays(np.asarray(corners, np.int64),
                    np.asarray(corner_pos, np.float64), mesh_order)
    return m.refine(rs_levels)


def build_general_dofmaps(mesh: GeneralMesh, p: int):
    """DofMaps for a general 2D quad mesh: per-(e,f) neighbor dof tables
    and global GLL CG node ids (vertex / oriented edge / interior)."""
    from .dofmaps import DofMaps, face_dof_table, _lex_multi_index

    dim = 2
    n1 = p + 1
    nd = n1 * n1
    fd = n1
    bdr = face_dof_table(p, dim)                # [4, fd]

    E = mesh.num_elements
    # neighbor dof table [E, nf, fd]
    nbr_dof = np.zeros((E, 4, fd), np.int32)
    for e in range(E):
        for f in range(4):
            f2 = mesh.nbr_face[e, f]
            if f2 < 0:
                nbr_dof[e, f] = bdr[f]          # unused (boundary)
                continue
            row = bdr[f2]
            if mesh.nbr_flip[e, f]:
                row = row[::-1]
            nbr_dof[e, f] = row

    # CG (GLL) global ids
    q = max(p, 1)
    nq1 = q + 1
    midx = _lex_multi_index(nq1, dim)           # [ndb, 2]
    ndb = nq1 * nq1
    cg_idx = np.zeros((E, ndb), np.int32)
    vert_node = {}
    edge_node = {}
    counter = 0

    def vid_node(v):
        nonlocal counter
        if v not in vert_node:
            vert_node[v] = counter
            counter += 1
        return vert_node[v]

    def eid_node(va, vb, k):
        """k-th interior GLL node along the edge, canonical min->max dir."""
        nonlocal counter
        key = (min(va, vb), max(va, vb))
        if key not in edge_node:
            edge_node[key] = counter
            counter += q - 1
        base = edge_node[key]
        kk = k if va < vb else (q - 2 - k)      # canonical orientation
        return base + kk

    corner_of = {(0, 0): 0, (q, 0): 1, (0, q): 2, (q, q): 3}
    for e in range(E):
        c = mesh.corners[e]
        for j in range(ndb):
            i0, i1 = int(midx[j, 0]), int(midx[j, 1])
            onx = i0 in (0, q)
            ony = i1 in (0, q)
            if onx and ony:
                cg_idx[e, j] = vid_node(int(c[corner_of[(i0, i1)]]))
            elif ony:   # on a y-edge (bottom i1=0 / top i1=q), interior in x
                a, b = _QUAD_FACES_LEX[0 if i1 == 0 else 2]
                cg_idx[e, j] = eid_node(int(c[a]), int(c[b]), i0 - 1)
            elif onx:   # on an x-edge
                a, b = _QUAD_FACES_LEX[3 if i0 == 0 else 1]
                cg_idx[e, j] = eid_node(int(c[a]), int(c[b]), i1 - 1)
            else:
                cg_idx[e, j] = counter
                counter += 1

    sub_idx = _lex_multi_index(p, dim) if p >= 1 else np.zeros((1, 2), int)
    corner = _lex_multi_index(2, dim)
    strides = n1 ** np.arange(dim)
    sub2ind = (((sub_idx[:, None, :] + corner[None, :, :]) * strides)
               .sum(-1).astype(np.int32))

    return DofMaps(p, dim, nd, fd, 4, bdr, mesh.nbr_elem, nbr_dof,
                   cg_idx, counter, sub2ind)
