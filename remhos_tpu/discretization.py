"""Discretization bundle: all static tables the jitted compute path needs.

This is the TPU-native stand-in for the reference's
ParFiniteElementSpace + DofInfo + integration-rule setup
(remhos.cpp:586-782). A `Discretization` is built once per run from a
StructuredMesh and polynomial order; its (small) numpy tables are closed
over by the jitted step functions and become XLA constants.

Integration rules mirror MFEM's defaults so results are comparable:
- volume (MassIntegrator == ConvectionIntegrator order):
  2*p + mesh_order*dim - 1   [MFEM bilininteg.cpp GetRule + eltrans OrderW]
- face (DGTraceIntegrator / lom.irF, remhos.cpp:776-782):
  mesh_order*dim - 1 + 2*p   (same order, on the (dim-1)-face geometry)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import basis as B
from .dofmaps import DofMaps, build_dofmaps
from .mesh import StructuredMesh, faces_for_dim


@dataclasses.dataclass(frozen=True)
class Discretization:
    mesh: StructuredMesh
    p: int
    dofmaps: DofMaps

    # --- volume quadrature ---
    w_q: np.ndarray        # [Q] tensor quad weights
    Bu: np.ndarray         # [Q, nd]      solution (Bernstein) values
    Gu: np.ndarray         # [Q, nd, dim] solution ref-gradients
    Bm: np.ndarray         # [Q, nm]      mesh (GLL) values
    Gm: np.ndarray         # [Q, nm, dim] mesh ref-gradients

    # --- face quadrature (shared tangential rule for all faces) ---
    w_fq: np.ndarray       # [Qf] tangential weights
    Bface: np.ndarray      # [Qf, fd] face-trace of solution basis (per-face dofs)
    Bmf: np.ndarray        # [nf, Qf, nm] mesh basis at face quad points
    Gmf: np.ndarray        # [nf, Qf, nm, dim]
    n_ref: np.ndarray      # [nf, dim] outward reference normals

    # --- nodes ---
    ref_nodes_u: np.ndarray   # [nd, dim] solution (closed-uniform) ref nodes
    Bm_at_unodes: np.ndarray  # [nd, nm]  mesh basis at solution nodes
    Bm_at_glnodes: np.ndarray # [nd, nm]  mesh basis at Gauss-Legendre nodes
    T_gl_to_unif: np.ndarray  # [nd, nd]  GL-nodal interpolant -> uniform pts
    Bgl: np.ndarray           # [Q, nd]   GL nodal tensor basis at volume quad
    A_gl2b: np.ndarray        # [nd, nd]  GL-nodal -> Bernstein coefficients
    # solution basis at mesh nodes is not needed; mesh basis at GLL bounds
    # nodes equals identity when mesh_order == p (not assumed).

    @property
    def dim(self) -> int:
        return self.mesh.dim

    @property
    def nd(self) -> int:
        return self.dofmaps.nd

    @property
    def fd(self) -> int:
        return self.dofmaps.fd

    @property
    def num_elements(self) -> int:
        return self.mesh.num_elements


def build_discretization(mesh, p: int) -> Discretization:
    dim, mo = mesh.dim, mesh.mesh_order
    if getattr(mesh, "structured", True):
        dofmaps = build_dofmaps(mesh, p)
    elif dim == 2:
        from .umesh import build_general_dofmaps
        dofmaps = build_general_dofmaps(mesh, p)
    else:
        from .umesh3d import build_general_dofmaps_3d
        dofmaps = build_general_dofmaps_3d(mesh, p)

    # ---- volume rule ----
    vol_order = 2 * p + mo * dim - 1
    n1v = B.min_gauss_points(vol_order)
    q1, w1 = B.gauss_legendre(n1v)

    Bu1, Gu1 = B.bernstein_vals(p, q1), B.bernstein_grads(p, q1)
    gll_m = B.gauss_lobatto(mo + 1)
    Bm1, Gm1 = B.lagrange_vals(gll_m, q1), B.lagrange_grads(gll_m, q1)

    Bu = B.tensor_mixed([Bu1] * dim)
    Gu = B.tensor_mixed_grads([Bu1] * dim, [Gu1] * dim)
    Bm = B.tensor_mixed([Bm1] * dim)
    Gm = B.tensor_mixed_grads([Bm1] * dim, [Gm1] * dim)
    w_q = B.tensor_mixed([w1[:, None]] * dim)[:, 0]

    # ---- face rule ----
    face_order = mo * dim - 1 + 2 * p
    n1f = B.min_gauss_points(face_order)
    qf1, wf1 = B.gauss_legendre(n1f)
    if dim == 1:
        w_fq = np.ones(1)
        Bface = np.ones((1, 1))
    else:
        Bface = B.tensor_mixed([B.bernstein_vals(p, qf1)] * (dim - 1))
        w_fq = B.tensor_mixed([wf1[:, None]] * (dim - 1))[:, 0]

    faces = faces_for_dim(dim)
    nf = len(faces)
    Bmf_list, Gmf_list, nrefs = [], [], []
    Bmt, Gmt = B.lagrange_vals(gll_m, qf1), B.lagrange_grads(gll_m, qf1)
    for (axis, side) in faces:
        end = np.array([0.0 if side == 0 else 1.0])
        Bme, Gme = B.lagrange_vals(gll_m, end), B.lagrange_grads(gll_m, end)
        vals = [(Bme if a == axis else Bmt) for a in range(dim)]
        grads = [(Gme if a == axis else Gmt) for a in range(dim)]
        Bmf_list.append(B.tensor_mixed(vals))
        Gmf_list.append(B.tensor_mixed_grads(vals, grads))
        n = np.zeros(dim)
        n[axis] = -1.0 if side == 0 else 1.0
        nrefs.append(n)
    Bmf = np.stack(Bmf_list)            # [nf, Qf, nm]
    Gmf = np.stack(Gmf_list)            # [nf, Qf, nm, dim]
    n_ref = np.stack(nrefs)             # [nf, dim]

    # ---- nodes ----
    ref_nodes_u = B.tensor_nodes(p, "uniform", dim)   # Bernstein ctrl points
    unodes_1d = np.linspace(0.0, 1.0, p + 1)
    Bm_at_unodes = B.tensor_mixed([B.lagrange_vals(gll_m, unodes_1d)] * dim)
    # Gauss-Legendre nodal L2 interpolation -> evaluated at uniform nodes
    # (the two-step inflow projection for problem 7, remhos.cpp:628-635)
    gl_nodes = B.gauss_legendre(p + 1)[0]
    Bm_at_glnodes = B.tensor_mixed([B.lagrange_vals(gll_m, gl_nodes)] * dim)
    T_gl_to_unif = B.tensor_mixed([B.lagrange_vals(gl_nodes, unodes_1d)] * dim)
    # GL nodal basis at the volume rule + GL->Bernstein basis change, for
    # the PA DGMassInverse path (remhos_ho.cpp:79)
    Bgl = B.tensor_mixed([B.lagrange_vals(gl_nodes, q1)] * dim)
    A1 = np.linalg.solve(B.bernstein_vals(p, unodes_1d),
                         B.lagrange_vals(gl_nodes, unodes_1d))
    A_gl2b = B.tensor_mixed([A1] * dim)

    return Discretization(
        mesh=mesh, p=p, dofmaps=dofmaps,
        w_q=w_q, Bu=Bu, Gu=Gu, Bm=Bm, Gm=Gm,
        w_fq=w_fq, Bface=Bface, Bmf=Bmf, Gmf=Gmf, n_ref=n_ref,
        ref_nodes_u=ref_nodes_u, Bm_at_unodes=Bm_at_unodes,
        Bm_at_glnodes=Bm_at_glnodes, T_gl_to_unif=T_gl_to_unif,
        Bgl=Bgl, A_gl2b=A_gl2b,
    )
