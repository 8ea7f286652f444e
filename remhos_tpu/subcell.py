"""Subcell machinery for the Bernstein subcell residual-distribution schemes.

The reference builds a p-times-refined "subcell mesh" (ParMesh::MakeRefined
with closed-uniform points, remhos.cpp:797-832) whose Q1 cells connect the
Bernstein control points, and integrates one-row convection matrices per
subcell with a midpoint rule (Assembly::ComputeSubcellWeights +
MixedConvectionIntegrator, remhos_tools.cpp:860-874, 1033-1076):

    w[e, m, j] = sign * (adj(J_c) v_c) . grad(psi_j)(center)

with psi the Q1 basis on subcell m, J_c its Jacobian at the center, and
v_c the velocity there. On a tensor grid the subcell corners are exactly
the element's closed-uniform (Bernstein control point) nodes, so all of
this is batched index arithmetic over sub2ind — no submesh object.

Remap mode: the subcell mesh moves with its OWN nodal velocity — the raw
velocity function at the subcell nodes, zeroed at domain-boundary nodes
(remhos.cpp:838-852), NOT the integrated pseudo-velocity v_gf; positions
are x_sub = x0_sub + t * v_sub (remhos.cpp:1605).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import problems as prob


def q1_center_grads(dim: int) -> np.ndarray:
    """grad(psi_j) at the reference center, corners in lex order: [2^dim, dim].
    Component d = (+-1) * (1/2)^(dim-1)."""
    idx = np.arange(2 ** dim)
    bits = np.stack([(idx >> d) & 1 for d in range(dim)], axis=-1)  # [2^d,dim]
    g = np.empty((2 ** dim, dim))
    for d in range(dim):
        sgn = np.where(bits[:, d] == 1, 1.0, -1.0)
        g[:, d] = sgn * 0.5 ** (dim - 1)
    return g


def boundary_node_mask(mesh, ref_nodes_u) -> np.ndarray:
    """[E, nd] True where the (uniform) node lies on the physical boundary
    (the reference zeroes the subcell velocity there, remhos.cpp:841-852)."""
    if not getattr(mesh, "structured", True):
        # general mesh: a node is on the boundary iff it lies on a face
        # with no neighbor
        from .dofmaps import face_dof_table
        E = mesh.num_elements
        nd = ref_nodes_u.shape[0]
        p = int(round(nd ** (1.0 / mesh.dim))) - 1
        bdr = face_dof_table(p, mesh.dim)
        mask = np.zeros((E, nd), dtype=bool)
        for f in range(mesh.nfaces):
            on_bdr = mesh.nbr_elem[:, f] < 0
            mask[np.ix_(on_bdr, bdr[f])] = True
        return mask
    dim = mesh.dim
    E = mesh.num_elements
    nd = ref_nodes_u.shape[0]
    eidx = np.stack(np.unravel_index(np.arange(E), mesh.shape, order="F"),
                    axis=-1)
    mask = np.zeros((E, nd), dtype=bool)
    for d in range(dim):
        if mesh.periodic[d]:
            continue
        on_lo = (eidx[:, d] == 0)[:, None] & (ref_nodes_u[None, :, d] == 0.0)
        on_hi = (eidx[:, d] == mesh.shape[d] - 1)[:, None] & \
                (ref_nodes_u[None, :, d] == 1.0)
        mask |= on_lo | on_hi
    return mask


def subcell_node_setup(adv):
    """(x0_sub[E,nd,dim], v_sub[E,nd,dim] or None) for the Advection op."""
    disc = adv.disc
    # everything downstream (sub_w -> RD-subcell du -> the state) must
    # stay in the operator's working precision: the f64 reference tables
    # / problem functions would otherwise silently promote the f32 state
    dtype = adv.x0_nodes.dtype
    Bm_at_u = jnp.asarray(disc.Bm_at_unodes, dtype)
    x0_sub = jnp.einsum("end,mn->emd", adv.x0_nodes, Bm_at_u)
    v_sub = None
    if adv.cfg.exec_mode == 1:
        v = prob.velocity_function(adv.cfg.problem, x0_sub, adv.bb_min,
                                   adv.bb_max).astype(dtype)
        # sharded operators pre-compute the mask in GLOBAL context (a
        # shard's interface to its neighbor is NOT a physical boundary);
        # see ShardedAdvection._shard_boundary_mask / gsharded
        mask = getattr(adv, "_sub_bmask", None)
        if mask is None:
            mask = jnp.asarray(boundary_node_mask(disc.mesh,
                                                  disc.ref_nodes_u))
        v_sub = jnp.where(mask[:, :, None], 0.0, v)
    return x0_sub, v_sub


def subcell_weights(adv, t):
    """SubcellWeights[E, numSubcells, 2^dim] at stage time t."""
    disc = adv.disc
    dim = disc.dim
    cfg = adv.cfg
    sub2ind = jnp.asarray(disc.dofmaps.sub2ind)          # [ns, 2^dim]
    x0_sub, v_sub = adv._subcell_nodes
    if cfg.exec_mode == 1:
        xs = x0_sub + t * v_sub
        v_nodes = v_sub
        sign = 1.0
    else:
        xs = x0_sub
        v_nodes = None
        sign = -1.0

    corners = xs[:, sub2ind]                              # [E, ns, 2^d, dim]
    Gc = jnp.asarray(q1_center_grads(dim), xs.dtype)      # [2^d, dim]
    J_c = jnp.einsum("esjd,jb->esdb", corners, Gc)        # [E, ns, dim, dim]
    from .geometry import det_adj
    _, adj = det_adj(J_c)

    if cfg.exec_mode == 1:
        # Q1 velocity at the center = corner average
        v_c = v_nodes[:, sub2ind].mean(axis=2)            # [E, ns, dim]
    else:
        center = corners.mean(axis=2)                     # bilinear at center
        v_c = prob.velocity_function(cfg.problem, center, adv.bb_min,
                                     adv.bb_max).astype(xs.dtype)
    av = jnp.einsum("esd,esbd->esb", v_c, adj)            # adjJ v (row form)
    return sign * jnp.einsum("esb,jb->esj", av, Gc)
