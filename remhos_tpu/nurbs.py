"""NURBS meshes as per-element rational Bézier patches (2D).

The reference loads MFEM NURBS meshes (disc-nurbs.mesh), uniformly refines
them by knot insertion, and then SetCurvature(2) replaces the NURBS
geometry with its Q2 Gauss-Lobatto nodal interpolation (remhos.cpp:
448-449, 513). The net geometric content is therefore: evaluate the
(refined) NURBS map at each element's Q2 GLL points.

The meshes in use are single-knot-span patches — i.e. rational BERNSTEIN
(Bézier) patches — so refinement-by-knot-insertion produces element
geometry identical to de Casteljau subdivision of the homogeneous control
nets (Bézier extraction), which is what this module does:

- parse "MFEM NURBS mesh v1.0" (2D, Bézier knot vectors),
- assemble per-element homogeneous control nets from the MFEM NURBS dof
  numbering (vertices, then edge dofs by edge id, then patch interiors),
- refine: 2x2 de Casteljau split per level, with shared-edge vertex-id
  bookkeeping for the topology,
- evaluate at GLL tensor points -> GeneralMesh (umesh.py topology).

3D NURBS (ball-nurbs, quartic patches) works the same way through the 3D
unstructured orientation tables (umesh3d.py); the ball-nurbs PA golden
rows match the reference bit-for-bit at print precision.
"""

from __future__ import annotations

import re

import numpy as np

from .basis import bernstein_vals, gauss_lobatto
from .umesh import GeneralMesh, from_arrays


def _tokens(path):
    txt = open(path).read()
    txt = re.sub(r"#[^\n]*", " ", txt)
    return txt.split()


def parse_nurbs_mesh(path: str):
    """Parse the 2D MFEM NURBS format into (elems, edges, nv, weights, cps,
    order). Only single-span (Bézier) knot vectors are supported."""
    tok = _tokens(path)
    i = 0

    def seek(word):
        nonlocal i
        while tok[i] != word:
            i += 1
        i += 1

    seek("dimension")
    dim = int(tok[i]); i += 1
    assert dim == 2, "NURBS: 2D only (round 1)"
    seek("elements")
    ne = int(tok[i]); i += 1
    elems = []
    for _ in range(ne):
        i += 1                      # attribute
        geom = int(tok[i]); i += 1
        assert geom == 3
        elems.append([int(tok[i + k]) for k in range(4)])
        i += 4
    seek("boundary")
    nb = int(tok[i]); i += 1
    for _ in range(nb):
        i += 1
        geom = int(tok[i]); i += 1
        i += 2 if geom == 1 else 4
    seek("edges")
    nedge = int(tok[i]); i += 1
    edges = []
    for _ in range(nedge):
        kv = int(tok[i]); v0 = int(tok[i + 1]); v1 = int(tok[i + 2])
        i += 3
        edges.append((kv, v0, v1))
    seek("vertices")
    nv = int(tok[i]); i += 1
    seek("knotvectors")
    nkv = int(tok[i]); i += 1
    orders = []
    for _ in range(nkv):
        p = int(tok[i]); ncp = int(tok[i + 1]); i += 2
        nknots = ncp + p + 1
        knots = [float(tok[i + k]) for k in range(nknots)]
        i += nknots
        assert ncp == p + 1 and set(knots) == {0.0, 1.0}, \
            "only single-span (Bézier) knot vectors supported"
        orders.append(p)
    p = orders[0]
    assert all(o == p for o in orders)
    n_edge_dofs = p - 1
    n_int = (p - 1) * (p - 1)
    ndof = nv + nedge * n_edge_dofs + ne * n_int
    seek("weights")
    weights = np.array([float(tok[i + k]) for k in range(ndof)])
    i += ndof
    seek("Ordering:")
    i += 1                          # ordering value
    cps = np.array([float(t) for t in tok[i:i + ndof * dim]],
                   dtype=np.float64).reshape(ndof, dim)
    return elems, edges, nv, weights, cps, p


def control_nets(path: str):
    """Per-element homogeneous control nets H[E, n, n, 3] (wx, wy, w) in
    (xi, eta) index order, plus lex corner vertex ids [E, 4]."""
    elems, edges, nv, w, cps, p = parse_nurbs_mesh(path)
    n = p + 1
    edge_dof = {}
    for idx, (_, v0, v1) in enumerate(edges):
        a, b = (v0, v1) if v0 < v1 else (v1, v0)
        edge_dof[(a, b)] = (nv + idx * (p - 1), +1)
        edge_dof[(b, a)] = (nv + idx * (p - 1) + p - 2, -1)
    E = len(elems)
    H = np.zeros((E, n, n, 3))
    corners_lex = np.zeros((E, 4), np.int64)
    hom = np.concatenate([cps * w[:, None], w[:, None]], axis=1)  # [ndof, 3]
    int_base = nv + len(edges) * (p - 1)
    for e, (v0, v1, v2, v3) in enumerate(elems):
        # net[i, j]: i along xi (v0->v1), j along eta (v0->v3)
        net_ids = np.zeros((n, n), np.int64)
        net_ids[0, 0], net_ids[-1, 0] = v0, v1
        net_ids[-1, -1], net_ids[0, -1] = v2, v3
        for (a, b), sl in (((v0, v1), (slice(1, n - 1), 0)),
                           ((v3, v2), (slice(1, n - 1), n - 1)),
                           ((v0, v3), (0, slice(1, n - 1))),
                           ((v1, v2), (n - 1, slice(1, n - 1)))):
            base, step = edge_dof[(a, b)]
            net_ids[sl] = base + step * np.arange(p - 1)
        ii, jj = np.meshgrid(range(p - 1), range(p - 1), indexing="ij")
        net_ids[1:n - 1, 1:n - 1] = (int_base + e * (p - 1) * (p - 1)
                                     + (jj * (p - 1) + ii))
        H[e] = hom[net_ids]
        corners_lex[e] = [v0, v1, v3, v2]
    return H, corners_lex


def _decasteljau_split(H, axis):
    """Split quadratic (or any p) Bézier nets in half along `axis`.
    H[..., n, 3] control points along that axis -> (left, right)."""
    n = H.shape[axis]
    # move axis to -2
    Hm = np.moveaxis(H, axis, -2)
    pts = [Hm]
    while pts[-1].shape[-2] > 1:
        P = pts[-1]
        pts.append(0.5 * (P[..., :-1, :] + P[..., 1:, :]))
    left = np.concatenate([p[..., :1, :] for p in pts], axis=-2)
    right = np.concatenate([p[..., -1:, :] for p in reversed(pts)], axis=-2)
    return np.moveaxis(left, -2, axis), np.moveaxis(right, -2, axis)


def load_nurbs_mesh(path: str, rs_levels: int = 0,
                    mesh_order: int = 2) -> GeneralMesh:
    H, corners = control_nets(path)

    for _ in range(rs_levels):
        E = H.shape[0]
        # refine topology ids exactly like umesh._refine_quad
        next_vid = int(corners.max()) + 1
        edge_mid = {}

        def mid_id(va, vb):
            nonlocal next_vid
            key = (min(va, vb), max(va, vb))
            if key not in edge_mid:
                edge_mid[key] = next_vid
                next_vid += 1
            return edge_mid[key]

        new_H = []
        new_corners = []
        for e in range(E):
            c = [int(v) for v in corners[e]]
            m01 = mid_id(c[0], c[1])
            m23 = mid_id(c[2], c[3])
            m02 = mid_id(c[0], c[2])
            m13 = mid_id(c[1], c[3])
            ctr = next_vid
            next_vid += 1
            lo_x, hi_x = _decasteljau_split(H[e], axis=0)
            quads = []
            for part in (lo_x, hi_x):
                lo_y, hi_y = _decasteljau_split(part, axis=1)
                quads.append((lo_y, hi_y))
            # children in 2x2 lex layout (x fastest)
            kids = [
                (quads[0][0], [c[0], m01, m02, ctr]),
                (quads[1][0], [m01, c[1], ctr, m13]),
                (quads[0][1], [m02, ctr, c[2], m23]),
                (quads[1][1], [ctr, m13, m23, c[3]]),
            ]
            for kh, kc in kids:
                new_H.append(kh)
                new_corners.append(kc)
        H = np.stack(new_H)
        corners = np.asarray(new_corners, np.int64)

    # evaluate at GLL tensor points
    n = H.shape[1]
    gll = gauss_lobatto(mesh_order + 1)
    B = bernstein_vals(n - 1, gll)                   # [m+1, n]
    hx = np.einsum("ai,bj,eijc->eabc", B, B, H)      # [E, m1, m1, 3] (xi,eta)
    x = hx[..., :2] / hx[..., 2:3]
    # lex node order: x fastest = xi fastest
    m1 = mesh_order + 1
    x = x.transpose(0, 2, 1, 3).reshape(H.shape[0], m1 * m1, 2, order="C")
    # corner positions for topology/centers
    corner_pos = np.stack([x[:, 0], x[:, m1 - 1], x[:, m1 * (m1 - 1)],
                           x[:, m1 * m1 - 1]], axis=1)
    return from_arrays(corners, corner_pos, mesh_order, x_nodes=x)


# ---------------------------------------------------------------------------
# 3D (hex) NURBS: ball-nurbs-style quartic Bézier patches
# ---------------------------------------------------------------------------

# MFEM hex local faces (vertex sequences with outward-ccw orientation,
# mfem geom.cpp); faces are enumerated on first encounter in this order.
_MFEM_HEX_FACES = [(3, 2, 1, 0), (0, 1, 5, 4), (1, 2, 6, 5),
                   (2, 3, 7, 6), (3, 0, 4, 7), (4, 5, 6, 7)]


def parse_nurbs_mesh_3d(path: str):
    tok = _tokens(path)
    i = 0

    def seek(word):
        nonlocal i
        while tok[i] != word:
            i += 1
        i += 1

    seek("dimension")
    dim = int(tok[i]); i += 1
    assert dim == 3
    seek("elements")
    ne = int(tok[i]); i += 1
    elems = []
    for _ in range(ne):
        i += 2                       # attribute, geom(=5)
        elems.append([int(tok[i + k]) for k in range(8)])
        i += 8
    seek("boundary")
    nb = int(tok[i]); i += 1
    for _ in range(nb):
        i += 2                       # attribute, geom(=3)
        i += 4
    seek("edges")
    nedge = int(tok[i]); i += 1
    edges = []
    for _ in range(nedge):
        edges.append((int(tok[i + 1]), int(tok[i + 2])))
        i += 3
    seek("vertices")
    nv = int(tok[i]); i += 1
    seek("knotvectors")
    nkv = int(tok[i]); i += 1
    p = None
    for _ in range(nkv):
        pp = int(tok[i]); ncp = int(tok[i + 1]); i += 2
        nkn = ncp + pp + 1
        knots = [float(tok[i + k]) for k in range(nkn)]
        i += nkn
        assert ncp == pp + 1 and set(knots) == {0.0, 1.0}
        assert p is None or p == pp
        p = pp

    # face discovery in MFEM's order: elements in order, local faces 0..5;
    # the FIRST encounter stores the face's vertex frame (dof directions
    # s: q0->q1, t: q0->q3)
    face_id = {}
    face_frame = []
    for e in range(ne):
        ev = elems[e]
        for lf in _MFEM_HEX_FACES:
            quad = tuple(ev[k] for k in lf)
            key = frozenset(quad)
            if key not in face_id:
                face_id[key] = len(face_frame)
                face_frame.append(quad)
    nface = len(face_frame)

    npe = p - 1
    ndof = nv + nedge * npe + nface * npe * npe + ne * npe ** 3
    seek("weights")
    weights = np.array([float(tok[i + k]) for k in range(ndof)])
    i += ndof
    assert tok[i] == "FiniteElementSpace", \
        f"NURBS dof count mismatch (got token {tok[i]!r})"
    seek("Ordering:")
    i += 1
    cps = np.array([float(t) for t in tok[i:i + ndof * 3]],
                   dtype=np.float64).reshape(ndof, 3)
    return elems, edges, nv, face_id, face_frame, weights, cps, p


def control_nets_3d(path: str, face_layout: str = "s-fast"):
    """H[E, n, n, n, 4] homogeneous nets (wx, wy, wz, w), index (xi,eta,zeta);
    corners_lex[E, 8]. face_layout: fast index of the stored face dofs
    ("s-fast": along q0->q1; "t-fast": along q0->q3)."""
    (elems, edges, nv, face_id, face_frame, w, cps,
     p) = parse_nurbs_mesh_3d(path)
    n = p + 1
    npe = p - 1
    # NURBS edge dofs are stored from the SMALLER to the LARGER vertex id,
    # regardless of the edges-section listing order (determined empirically
    # against the exact-sphere boundary of ball-nurbs)
    edge_dof = {}
    for idx, (v0, v1) in enumerate(edges):
        a, b = (v0, v1) if v0 < v1 else (v1, v0)
        edge_dof[(a, b)] = (nv + idx * npe, +1)
        edge_dof[(b, a)] = (nv + idx * npe + npe - 1, -1)
    face_base = nv + len(edges) * npe
    int_base = face_base + len(face_frame) * npe * npe

    E = len(elems)
    H = np.zeros((E, n, n, n, 4))
    corners_lex = np.zeros((E, 8), np.int64)
    hom = np.concatenate([cps * w[:, None], w[:, None]], axis=1)

    # lex corner bit -> MFEM hex vertex index
    mfem_of_lex = [0, 1, 3, 2, 4, 5, 7, 6]
    # hex edges in lex terms: (corner_a, corner_b, axis)
    lex_edges = [(0, 1, 0), (2, 3, 0), (4, 5, 0), (6, 7, 0),
                 (0, 2, 1), (1, 3, 1), (4, 6, 1), (5, 7, 1),
                 (0, 4, 2), (1, 5, 2), (2, 6, 2), (3, 7, 2)]
    from .umesh3d import _FACE_CORNERS
    for e, ev in enumerate(elems):
        cl = [ev[k] for k in mfem_of_lex]        # lex corner vertex ids
        corners_lex[e] = cl
        ids = np.zeros((n, n, n), np.int64)
        bits = _lex3_bits = [(k & 1, (k >> 1) & 1, (k >> 2) & 1)
                             for k in range(8)]
        for k, (bx, by, bz) in enumerate(bits):
            ids[bx * p, by * p, bz * p] = cl[k]
        interior = slice(1, n - 1)
        for (ca, cb, axis) in lex_edges:
            base, step = edge_dof[(cl[ca], cl[cb])]
            vals = base + step * np.arange(npe)
            sl = [bits[ca][0] * p, bits[ca][1] * p, bits[ca][2] * p]
            sl[axis] = interior
            ids[tuple(sl)] = vals
        for (axis, side), T in _FACE_CORNERS.items():
            # my face frame: quad[j][i] vertex ids (tangential axes t1<t2)
            quad = [[cl[T[j][i]] for i in range(2)] for j in range(2)]
            fid = face_id[frozenset(quad[0] + quad[1])]
            frame = face_frame[fid]                  # (q0, q1, q2, q3)
            # stored frame: s along q0->q1, t along q0->q3; express my
            # (i, j) interior coords in the stored frame
            fq = {int(v): k for k, v in enumerate(frame)}
            # positions of stored corners in MY frame
            pos = {int(quad[j][i]): (i, j) for j in range(2)
                   for i in range(2)}
            i0, j0 = pos[frame[0]]
            is_, js_ = pos[frame[1]]                 # s step
            it_, jt_ = pos[frame[3]]                 # t step
            ii, jj = np.meshgrid(np.arange(1, p), np.arange(1, p),
                                 indexing="ij")      # my (i, j), i fastest
            di, dj = ii - i0 * p, jj - j0 * p
            s = (is_ - i0) * di + (js_ - j0) * dj
            t = (it_ - i0) * di + (jt_ - j0) * dj
            if face_layout == "s-fast":
                vals = face_base + fid * npe * npe + (s - 1) + npe * (t - 1)
            else:
                vals = face_base + fid * npe * npe + (t - 1) + npe * (s - 1)
            sl = [None, None, None]
            tang = [a for a in range(3) if a != axis]
            sl[axis] = side * p
            grid = np.zeros((npe, npe), np.int64)
            grid[:, :] = vals
            full = [None, None, None]
            full[axis] = np.full((npe, npe), side * p)
            full[tang[0]] = ii
            full[tang[1]] = jj
            ids[full[0], full[1], full[2]] = grid
        iii, jjj, kkk = np.meshgrid(np.arange(1, p), np.arange(1, p),
                                    np.arange(1, p), indexing="ij")
        ids[interior, interior, interior] = (
            int_base + e * npe ** 3
            + (iii - 1) + npe * (jjj - 1) + npe * npe * (kkk - 1))
        H[e] = hom[ids]
    return H, corners_lex


def load_nurbs_mesh_3d(path: str, rs_levels: int = 0, mesh_order: int = 2):
    from .umesh3d import from_arrays_3d, _lex_multi_index

    H, corners = control_nets_3d(path)
    for _ in range(rs_levels):
        E = H.shape[0]
        next_vid = int(corners.max()) + 1
        table = {}

        def node_id(vids):
            nonlocal next_vid
            key = tuple(sorted(int(v) for v in vids))
            if key not in table:
                table[key] = next_vid
                next_vid += 1
            return table[key]

        new_H, new_c = [], []
        sub = _lex_multi_index(2, 3)
        for e in range(E):
            c = corners[e]

            def vid(q):
                axes = [[v // 2] if v in (0, 2) else [0, 1] for v in q]
                ids = [int(c[bx + 2 * by + 4 * bz])
                       for bx in axes[0] for by in axes[1] for bz in axes[2]]
                return ids[0] if len(ids) == 1 else node_id(ids)

            lo0, hi0 = _decasteljau_split(H[e], axis=0)
            parts = {}
            for sx, px in ((0, lo0), (1, hi0)):
                lo1, hi1 = _decasteljau_split(px, axis=1)
                for sy, py in ((0, lo1), (1, hi1)):
                    lo2, hi2 = _decasteljau_split(py, axis=2)
                    parts[(sx, sy, 0)] = lo2
                    parts[(sx, sy, 1)] = hi2
            for s in sub:
                kc = [vid(tuple(s + corner))
                      for corner in _lex_multi_index(2, 3)]
                new_H.append(parts[tuple(s)])
                new_c.append(kc)
        H = np.stack(new_H)
        corners = np.asarray(new_c, np.int64)

    n = H.shape[1]
    gll = gauss_lobatto(mesh_order + 1)
    B = bernstein_vals(n - 1, gll)
    hx = np.einsum("ai,bj,ck,eijkd->eabcd", B, B, B, H)
    x = hx[..., :3] / hx[..., 3:4]
    m1 = mesh_order + 1
    # lex node order (xi fastest): transpose (a,b,c) -> (c,b,a) then reshape
    x = x.transpose(0, 3, 2, 1, 4).reshape(H.shape[0], m1 ** 3, 3)
    corner_ids = [0, m1 - 1, m1 * (m1 - 1), m1 * m1 - 1]
    corner_ids = ([ci for ci in corner_ids]
                  + [ci + m1 * m1 * (m1 - 1) for ci in corner_ids])
    corner_pos = x[:, corner_ids]
    return from_arrays_3d(corners, corner_pos, mesh_order, x_nodes=x)
