"""MFEM-format output and GLVis streaming.

The reference writes `meshHO_final.mesh` / `sltn_final.gf` via
Mesh::PrintAsOne + GridFunction::SaveAsOne (remhos.cpp:1365-1380) and
streams fields to a live GLVis server (VisualizeField,
remhos_tools.cpp:1489-1537).  This module produces the same artifacts:

- meshes are serialized as "MFEM mesh v1.0" with a per-element L2
  (Gauss-Lobatto lattice) nodes GridFunction — always valid, including
  periodic, curved, and mid-remap moved meshes, and exactly the layout
  our native parser reads back (native/remhos_tables.cpp:241-273);
- solutions as Bernstein (Positive, BasisType 2) L2 GridFunctions in
  MFEM's element-major lex dof order;
- glvis_stream() speaks the GLVis socket protocol
  ("solution\\n<mesh><gf>") to a running server, failing quietly when
  none is listening (matching the reference's warn-and-continue).
"""

from __future__ import annotations

import socket

import numpy as np


def _structured_corner_ids(mesh):
    """[E, 2^dim] lattice vertex ids (periodic axes wrap), lex corners."""
    shape = mesh.shape
    dim = mesh.dim
    nv_ax = [shape[a] + (0 if mesh.periodic[a] else 1) for a in range(dim)]
    idx = [np.arange(shape[a]) for a in range(dim)]
    grids = np.meshgrid(*idx, indexing="ij")     # [ax][x,y,z] element coords
    E = mesh.num_elements
    out = np.zeros((E, 2 ** dim), np.int64)
    # flat element order: x fastest
    eflat = np.zeros_like(grids[0])
    mul = 1
    for a in range(dim):
        eflat = eflat + grids[a] * mul
        mul *= shape[a]
    for c in range(2 ** dim):
        vid = np.zeros_like(grids[0])
        mul = 1
        for a in range(dim):
            bit = (c >> a) & 1
            coord = (grids[a] + bit) % nv_ax[a] if mesh.periodic[a] \
                else grids[a] + bit
            vid = vid + coord * mul
            mul *= nv_ax[a]
        out[eflat.reshape(-1), c] = vid.reshape(-1)
    return out, int(np.prod(nv_ax))


def _corner_table(mesh):
    if getattr(mesh, "structured", True):
        return _structured_corner_ids(mesh)
    corners = np.asarray(mesh.corners, np.int64)
    return corners, int(corners.max()) + 1


_GEOM = {1: 1, 2: 3, 3: 5}           # MFEM geometry ids: SEGMENT, SQUARE, CUBE
_MFEM_VERT = {1: [0, 1],             # segment endpoints
              2: [0, 1, 3, 2],       # lex corner -> MFEM ccw quad
              3: [0, 1, 3, 2, 4, 5, 7, 6]}   # lex -> MFEM hex


def mfem_mesh_text(mesh, x_nodes) -> str:
    """Serialize the mesh (geometry = x_nodes [E, nm, dim], per-element GLL
    lattice) as MFEM mesh v1.0 with L2 nodes."""
    dim = mesh.dim
    corners, nv = _corner_table(mesh)
    x = np.asarray(x_nodes, np.float64).reshape(mesh.num_elements, -1, dim)
    k = round(x.shape[1] ** (1.0 / dim)) - 1
    lines = ["MFEM mesh v1.0", "", "dimension", str(dim), "", "elements",
             str(mesh.num_elements)]
    vorder = _MFEM_VERT[dim]
    for ev in corners:
        lines.append("1 %d " % _GEOM[dim]
                     + " ".join(str(int(ev[j])) for j in vorder))
    lines += ["", "boundary", "0", "", "vertices", str(nv), "", "nodes",
              "FiniteElementSpace",
              f"FiniteElementCollection: L2_T1_{dim}D_P{k}",
              f"VDim: {dim}", "Ordering: 1", ""]
    for e in range(x.shape[0]):
        for i in range(x.shape[1]):
            lines.append(" ".join("%.16g" % v for v in x[e, i]))
    return "\n".join(lines) + "\n"


def gridfunction_text(u, p: int, dim: int) -> str:
    """Serialize a Bernstein DG field [E, nd] as an MFEM GridFunction
    (L2_T2 = BasisType::Positive; element-major lex dofs)."""
    u = np.asarray(u, np.float64)
    lines = ["FiniteElementSpace",
             f"FiniteElementCollection: L2_T2_{dim}D_P{p}",
             "VDim: 1", "Ordering: 0", ""]
    lines += ["%.16g" % v for v in u.reshape(-1)]
    return "\n".join(lines) + "\n"


def save_final(mesh, x_nodes, u, p: int, mesh_path="meshHO_final.mesh",
               sltn_path="sltn_final.gf"):
    """The reference's -save artifacts (remhos.cpp:1365-1380)."""
    with open(mesh_path, "w") as fh:
        fh.write(mfem_mesh_text(mesh, x_nodes))
    with open(sltn_path, "w") as fh:
        fh.write(gridfunction_text(u, p, mesh.dim))


def visit_save(prefix, mesh, x_nodes, u, p: int, t: float, cycle: int,
               field_name="solution"):
    """VisItDataCollection-format snapshot (remhos.cpp:1036-1043, 1324-1328):

    - ``<prefix>_<cycle:06d>.mfem_root`` — JSON root file
    - ``<prefix>_<cycle:06d>/mesh.000000`` — MFEM mesh (current node positions)
    - ``<prefix>_<cycle:06d>/<field>.000000`` — MFEM GridFunction

    the single-domain layout VisIt's MFEM reader (and GLVis) load directly.
    """
    import json
    import os

    dirname = f"{prefix}_{cycle:06d}"
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, "mesh.000000"), "w") as fh:
        fh.write(mfem_mesh_text(mesh, x_nodes))
    with open(os.path.join(dirname, f"{field_name}.000000"), "w") as fh:
        fh.write(gridfunction_text(u, p, mesh.dim))
    base = os.path.basename(dirname)
    root = {"dsets": {"main": {
        "cycle": int(cycle), "time": float(t), "time_step": 0.0,
        "domains": 1,
        "mesh": {"path": f"{base}/mesh.%06d",
                 "tags": {"comments": "", "format": "MFEM mesh v1.0",
                          "size": "1", "spatial_dim": str(mesh.dim),
                          "topo_dim": str(mesh.dim), "max_lods": "32"}},
        "fields": {field_name: {"path": f"{base}/{field_name}.%06d",
                                "tags": {"assoc": "nodes", "comps": "1",
                                         "lod": str(max(p, 1))}}}}}}
    with open(dirname + ".mfem_root", "w") as fh:
        json.dump(root, fh, indent=3)


def glvis_stream(mesh, x_nodes, u, p: int, host="localhost", port=19916,
                 title="u", keys=None, timeout=0.5, geometry=None) -> bool:
    """Send one solution frame to a GLVis server; True on success.

    geometry: optional (Wx, Wy, Ww, Wh) window placement — the reference's
    three-window product layout (remhos.cpp:1058-1069, VisualizeField
    remhos_tools.cpp:1507-1515).
    No server listening is not an error (the reference warns once and
    disables visualization, remhos_tools.cpp:1520-1534)."""
    payload = ("solution\n" + mfem_mesh_text(mesh, x_nodes)
               + gridfunction_text(u, p, mesh.dim))
    if keys:
        payload += f"keys {keys}\n"
    payload += f"window_title '{title}'\n"
    if geometry is not None:
        payload += "window_geometry %d %d %d %d\n" % tuple(geometry)
    try:
        with socket.create_connection((host, port), timeout=timeout) as s:
            s.sendall(payload.encode())
        return True
    except OSError:
        return False


def stream_fields(cfg, mesh, x_now, u, us=None):
    """Stream the reference's window set (remhos.cpp:1045-1070 initial,
    1307-1321 in-loop): "Solution u" at (0,0), and for product runs
    "Solution s" (ComputeRatio'd us/u) and "Solution u_s" side by side."""
    Ww = Wh = 400
    glvis_stream(mesh, x_now, u, cfg.order, host=cfg.vis_host,
                 port=cfg.vis_port, title="Solution u",
                 geometry=(0, 0, Ww, Wh))
    if us is not None:
        from . import sync as syncm
        s, _, _ = syncm.compute_ratio(us, u)
        glvis_stream(mesh, x_now, s, cfg.order, host=cfg.vis_host,
                     port=cfg.vis_port, title="Solution s",
                     geometry=(Ww, 0, Ww, Wh))
        glvis_stream(mesh, x_now, us, cfg.order, host=cfg.vis_host,
                     port=cfg.vis_port, title="Solution u_s",
                     geometry=(2 * Ww, 0, Ww, Wh))
