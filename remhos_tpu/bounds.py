"""Per-dof admissible bounds (the DofInfo bounds machinery).

TPU-native version of remhos_tools.cpp:381-523:
- element min/max over dof values (Bernstein coefficients bound the field)
- overlap-stencil bounds: scatter element extrema to the shared
  Gauss-Lobatto CG nodes, global min/max at shared nodes, gather back
  (ComputeOverlapBounds, remhos_tools.cpp:432-495) — here a deterministic
  jnp scatter-min/max over precomputed cg node ids,
- sparsity-stencil bounds: face-neighbor element extrema
  (ComputeMatrixSparsityBounds, remhos_tools.cpp:381-430).

`active_el` / `active_dof` masks support product-field remap, where empty
elements must not affect bounds (remhos.cpp:1889-1892).
"""

from __future__ import annotations

import jax.numpy as jnp

INF = float("inf")


def elements_min_max(u, active_el=None, active_dof=None):
    """(el_min[E], el_max[E]) over dofs (remhos_tools.cpp:497-523)."""
    lo, hi = u, u
    if active_dof is not None:
        lo = jnp.where(active_dof, u, INF)
        hi = jnp.where(active_dof, u, -INF)
    el_min, el_max = lo.min(axis=1), hi.max(axis=1)
    if active_el is not None:
        el_min = jnp.where(active_el, el_min, INF)
        el_max = jnp.where(active_el, el_max, -INF)
    return el_min, el_max


def overlap_cg_minmax(el_min, el_max, cg_idx, n_cg, active_el=None):
    """Scatter element extrema onto the shared CG (GLL) node grid.

    Returns (x_min[n_cg], x_max[n_cg]). Deterministic scatter-min/max."""
    E, nd = cg_idx.shape
    src_min = jnp.broadcast_to(el_min[:, None], (E, nd))
    src_max = jnp.broadcast_to(el_max[:, None], (E, nd))
    if active_el is not None:
        src_min = jnp.where(active_el[:, None], src_min, INF)
        src_max = jnp.where(active_el[:, None], src_max, -INF)
    flat = cg_idx.reshape(-1)
    x_min = jnp.full((n_cg,), INF, el_min.dtype).at[flat].min(src_min.reshape(-1))
    x_max = jnp.full((n_cg,), -INF, el_max.dtype).at[flat].max(src_max.reshape(-1))
    return x_min, x_max


def overlap_bounds(el_min, el_max, cg_idx, n_cg, active_el=None):
    """(dof_min[E,nd], dof_max[E,nd]) via the overlapping-elements stencil.

    cg_idx[E,nd]: global CG (GLL) node id of each DG dof. Inactive elements
    don't contribute but still read back bounds (new-element activation
    mechanism, remhos_tools.cpp:475-487).
    """
    x_min, x_max = overlap_cg_minmax(el_min, el_max, cg_idx, n_cg, active_el)
    return x_min[cg_idx], x_max[cg_idx]


def sparsity_bounds(el_min, el_max, nbr_elem, nd):
    """(dof_min[E,nd], dof_max[E,nd]) via face-neighbor elements only."""
    safe = jnp.maximum(nbr_elem, 0)
    valid = nbr_elem >= 0
    nmin = jnp.where(valid, el_min[safe], INF)      # [E, nf]
    nmax = jnp.where(valid, el_max[safe], -INF)
    lo = jnp.minimum(el_min, nmin.min(axis=1))
    hi = jnp.maximum(el_max, nmax.max(axis=1))
    return (jnp.broadcast_to(lo[:, None], (el_min.shape[0], nd)),
            jnp.broadcast_to(hi[:, None], (el_max.shape[0], nd)))


def compute_bounds(el_min, el_max, dofmaps, bounds_type: int, active_el=None):
    """Dispatch matching DofInfo::ComputeBounds (remhos_tools.hpp:168-188)."""
    if bounds_type == 0:
        return overlap_bounds(el_min, el_max, jnp.asarray(dofmaps.cg_idx),
                              dofmaps.n_cg, active_el=active_el)
    return sparsity_bounds(el_min, el_max, jnp.asarray(dofmaps.nbr_elem),
                           dofmaps.nd)
