"""Smoothness indicator (sharpening of bounds in smooth regions).

TPU-native version of SmoothnessIndicator (remhos_tools.cpp:24-354):
project u onto the Q1 CG space living on the subcell (Bernstein control
point) grid, apply an approximate Laplacian (two-term Neumann-series mass
inversions), take 3^dim-stencil min/max of the result, and map to [0,1]
via the `-si 1/2` formulas.

On the structured fine grid the sparse CG matrices become per-subcell
dense tensor blocks (Q1 mass/stiffness with per-element subcell sizes)
applied with gather -> batched matmul -> scatter-add, and the sparsity
min/max is a separable roll stencil. All matrices are built once from the
initial mesh — the reference does the same ("TODO assemble SI matrices
every RK stage for remap", remhos_tools.cpp:34).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import basis as B
from .structured import _shift
from .subcell import boundary_node_mask


def _q1_1d_mass(h):
    return h * np.array([[1 / 3, 1 / 6], [1 / 6, 1 / 3]])


def _q1_1d_stiff(h):
    return (1 / h) * np.array([[1.0, -1.0], [-1.0, 1.0]])


class SmoothnessIndicator:
    """Static SI tables + jit-safe compute functions."""

    def __init__(self, si_type: int, disc, bb_min, bb_max):
        assert si_type in (1, 2), "Bad smoothness indicator id!"
        self.type = si_type
        self.param = 5.0 if si_type == 1 else 3.0
        self.disc = disc
        dm = disc.dofmaps
        dim, p = disc.dim, max(disc.p, 1)
        mesh = disc.mesh
        nsub = p ** dim          # subcells per element
        ncorner = 2 ** dim

        # fine-grid node ids of each subcell's corners: [E, nsub, 2^dim]
        self.cg_idx = np.asarray(dm.cg_idx)               # [E, nd]
        self.sub2ind = np.asarray(dm.sub2ind)             # [nsub, 2^dim]
        self.n_cg = dm.n_cg
        self.corner_cg = self.cg_idx[:, self.sub2ind]     # [E, nsub, 2^dim]

        # per-element subcell sizes (uniform within an element)
        widths = [np.diff(b) / p for b in mesh.breaks]    # per-axis, per-elem
        E = mesh.num_elements
        eidx = np.stack(np.unravel_index(np.arange(E), mesh.shape, order="F"),
                        axis=-1)
        hs = np.stack([widths[d][eidx[:, d]] for d in range(dim)], -1)  # [E,d]

        # per-element Q1 mass / neg-laplacian subcell blocks [E, 2^d, 2^d]
        Msub = np.ones((E, 1, 1))
        Lsub = np.zeros((E, 1, 1))
        for d in range(dim):
            m1 = np.stack([_q1_1d_mass(h) for h in hs[:, d]])   # [E,2,2]
            k1 = np.stack([_q1_1d_stiff(h) for h in hs[:, d]])
            # lex tensor (axis d slower than previous): kron(new, old)
            Msub_new = np.einsum("eab,eij->eaibj", m1, Msub).reshape(
                E, 2 * Msub.shape[1], 2 * Msub.shape[2])
            Lsub = (np.einsum("eab,eij->eaibj", k1, Msub).reshape(
                E, 2 * Msub.shape[1], 2 * Msub.shape[2])
                + np.einsum("eab,eij->eaibj", m1, Lsub).reshape(
                    E, 2 * Msub.shape[1], 2 * Msub.shape[2]))
            Msub = Msub_new
        self.Msub = jnp.asarray(Msub)                 # Q1 mass block
        self.Lsub_stiff = Lsub                        # Q1 stiffness block (np)

        # DiffusionIntegrator(-1) => -stiffness; plus DG boundary term
        # +<(d_n psi_j), psi_i> on domain-boundary subcell faces
        Lop = -np.repeat(Lsub[:, None, :, :], nsub, axis=1)
        Lop = Lop + self._boundary_face_blocks(mesh, hs, eidx, p, dim)
        self.Lop = jnp.asarray(Lop)

        # lumped CG mass
        self.lumped = self._assemble_lumped()

        # ShapeEval: Bernstein values at the closed-uniform nodes [nd, nd]
        un = np.linspace(0, 1, disc.p + 1)
        self.ShapeEval = jnp.asarray(
            B.tensor_mixed([B.bernstein_vals(disc.p, un)] * dim))

        # DG2CG with -1 at domain-boundary nodes (remhos_tools.cpp:98-108)
        bmask = boundary_node_mask(mesh, disc.ref_nodes_u)
        self.dg2cg_valid = jnp.asarray(~bmask)        # [E, nd]
        self.periodic = mesh.periodic
        # fine grid shape (nodes per axis), x fastest in cg ids
        q = p
        self.gshape = tuple((q * s) if per else (q * s + 1)
                            for s, per in zip(mesh.shape, mesh.periodic))

    # ------------------------------------------------------------------

    def _boundary_face_blocks(self, mesh, hs, eidx, p, dim):
        """DGDiffusionIntegrator(-1, 0, 0) boundary contribution as subcell
        blocks [E, nsub, 2^d, 2^d]: +int_face psi_i (d_n psi_j)."""
        E = mesh.num_elements
        nsub = p ** dim
        nc = 2 ** dim
        out = np.zeros((E, nsub, nc, nc))
        # subcell multi-index within the element
        sidx = np.stack(np.unravel_index(np.arange(nsub), (p,) * dim,
                                         order="F"), -1)  # [nsub, dim]
        bits = np.stack([(np.arange(nc) >> d) & 1 for d in range(dim)], -1)
        for d in range(dim):
            if mesh.periodic[d]:
                continue
            for side in (0, 1):
                el_on = (eidx[:, d] == (0 if side == 0 else mesh.shape[d] - 1))
                sc_on = (sidx[:, d] == (0 if side == 0 else p - 1))
                if not el_on.any():
                    continue
                # 1D factors along d: value v at the endpoint, grad g, with
                # outward normal derivative sign
                v = np.array([1.0, 0.0]) if side == 0 else np.array([0., 1.])
                for e in np.where(el_on)[0]:
                    g = np.array([-1.0, 1.0]) / hs[e, d]
                    dn = -g if side == 0 else g
                    # tangential Q1 mass product
                    blk = np.ones((nc, nc))
                    for a in range(dim):
                        if a == d:
                            f = np.outer(v, dn)   # psi_i(face) * d_n psi_j
                        else:
                            f = _q1_1d_mass(hs[e, a])
                        blk = blk * f[np.ix_(bits[:, a], bits[:, a])]
                    for m in np.where(sc_on)[0]:
                        out[e, m] += blk
        return out

    def _assemble_lumped(self):
        """Row sums of the CG Q1 mass, assembled on the fine grid."""
        rows = np.asarray(self.Msub).sum(axis=2)          # [E, 2^dim]
        nsub = self.sub2ind.shape[0]
        E = rows.shape[0]
        lumped = np.zeros(self.n_cg)
        flat_idx = self.corner_cg.reshape(-1)
        vals = np.repeat(rows[:, None, :], nsub, axis=1).reshape(-1)
        np.add.at(lumped, flat_idx, vals)
        return jnp.asarray(lumped)

    # ------------------------------------------------------------------
    # jit-safe actions on fine-grid vectors
    # ------------------------------------------------------------------

    def _apply_blocks(self, blocks, y):
        """Scatter-add of per-subcell dense blocks applied to fine vector."""
        corner_cg = jnp.asarray(self.corner_cg)
        vals = y[corner_cg]                               # [E, nsub, 2^d]
        out_loc = jnp.einsum("eij,esj->esi", blocks, vals) \
            if blocks.ndim == 3 else jnp.einsum("esij,esj->esi", blocks, vals)
        return jnp.zeros_like(y).at[corner_cg.reshape(-1)].add(
            out_loc.reshape(-1))

    def _neumann_project(self, rhs):
        """Two-term Neumann-series inversion of the CG mass
        (remhos_tools.cpp:269-293): y1 = rhs/l; y2 = y1 + (rhs - M y1)/l,
        with the reference's residual-based early stop folded in."""
        tol = 1.0e-10
        y = jnp.zeros_like(rhs)
        for _ in range(2):
            z = self._apply_blocks(self.Msub, y) - rhs
            resid = jnp.sqrt((z * z).sum())
            y = jnp.where(resid <= tol, y, y - z / self.lumped)
        return y

    def compute(self, u):
        """si values on the fine CG grid: [n_cg]."""
        # u at uniform nodes, as Q1 subcell data
        u_eval = u @ self.ShapeEval.T                     # [E, nd] values
        # MassMixed * u_eval: Q1 mass of the interpolated subcell function
        corner_cg = jnp.asarray(self.corner_cg)
        sub2ind = jnp.asarray(self.sub2ind)
        vals = u_eval[:, sub2ind]                         # [E, nsub, 2^d]
        loc = jnp.einsum("eij,esj->esi", self.Msub, vals)
        rhs = jnp.zeros((self.n_cg,), u.dtype).at[corner_cg.reshape(-1)].add(
            loc.reshape(-1))
        g = self._neumann_project(rhs)
        rhs2 = self._apply_blocks(self.Lop, g)
        g = self._neumann_project(rhs2)

        gmin, gmax = self._stencil_minmax(g)
        if self.type == 1:
            eps = 1.0e-50
            return 1.0 - ((jnp.abs(gmin - gmax) + eps)
                          / (jnp.abs(gmin) + jnp.abs(gmax) + eps)
                          ) ** self.param
        eps = 1.0e-15
        return jnp.minimum(1.0, self.param * jnp.maximum(0.0, gmin * gmax)
                           / (jnp.maximum(gmin * gmin, gmax * gmax) + eps))

    def _stencil_minmax(self, g):
        """min/max over the CG mass sparsity = 3^dim fine-node neighborhood
        (ComputeFromSparsity, remhos_tools.cpp:325-354)."""
        dim = len(self.gshape)
        G = g.reshape(tuple(reversed(self.gshape)))
        gmin = G
        gmax = G
        for d in range(dim):
            gdim = dim - 1 - d
            per = self.periodic[d]
            lo_min = _shift(gmin, gdim, 0, per, fill=float("inf"))
            hi_min = _shift(gmin, gdim, 1, per, fill=float("inf"))
            lo_max = _shift(gmax, gdim, 0, per, fill=-float("inf"))
            hi_max = _shift(gmax, gdim, 1, per, fill=-float("inf"))
            gmin = jnp.minimum(gmin, jnp.minimum(lo_min, hi_min))
            gmax = jnp.maximum(gmax, jnp.maximum(lo_max, hi_max))
        return gmin.reshape(-1), gmax.reshape(-1)

    def dof_values(self, si_fine):
        """si at DG dofs, 1.0 at domain-boundary dofs (DG2CG<0 convention,
        remhos_tools.cpp:187)."""
        vals = si_fine[jnp.asarray(self.cg_idx)]
        return jnp.where(self.dg2cg_valid, vals, 1.0)

    def update_bounds(self, u_new_HO, u_min, u_max, si_dof):
        """UpdateBounds (remhos_tools.cpp:183-190), vectorized."""
        t = si_dof
        u_min = jnp.maximum(0.0, t * u_new_HO + (1.0 - t) * u_min)
        u_max = jnp.minimum(1.0, t * u_new_HO + (1.0 - t) * u_max)
        return u_min, u_max
