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

3D NURBS (ball-nurbs, quartic patches) needs the 3D unstructured
orientation tables and is planned for the next round.
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
        edge_dof[(v0, v1)] = (nv + idx * (p - 1), +1)
        edge_dof[(v1, v0)] = (nv + idx * (p - 1) + p - 2, -1)
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
