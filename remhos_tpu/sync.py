"""Product-field synchronization utilities (us = u*s, multi-material remap).

TPU-native versions of remhos_sync.cpp: boolean activity indicators, the
ratio s = us/u with inactive-dof fill, and empty-dof zeroing. All masked
vector ops over [E, nd].
"""

from __future__ import annotations

import jax.numpy as jnp

EMPTY_ZONE_TOL = 1e-12  # remhos_sync.hpp:20


def bool_indicators(u):
    """(active_el[E], active_dofs[E,nd]) (remhos_sync.cpp:24-47)."""
    active_dofs = u > EMPTY_ZONE_TOL
    active_el = active_dofs.any(axis=1)
    return active_el, active_dofs


def compute_ratio(us, u):
    """s = us/u on active dofs; element-average ratio elsewhere; 0 in empty
    elements (remhos_sync.cpp:50-94). Returns (s, active_el, active_dofs)."""
    active_el, active_dofs = bool_indicators(u)
    safe_u = jnp.where(active_dofs, u, 1.0)
    ratio = us / safe_u
    n = active_dofs.sum(axis=1)
    s_avg = jnp.where(active_dofs, ratio, 0.0).sum(axis=1) / jnp.maximum(n, 1)
    s = jnp.where(active_dofs, ratio, s_avg[:, None])
    s = jnp.where(active_el[:, None], s, 0.0)
    return s, active_el, active_dofs


def zero_out_empty_dofs(active_el, active_dofs, u):
    """Zero u at inactive dofs of inactive elements (remhos_sync.cpp:96-114)."""
    keep = active_el[:, None] | active_dofs
    return jnp.where(keep, u, 0.0)


def min_max_s(us, u):
    """Global (min s, max s) over active dofs (remhos_sync.cpp:116-140)."""
    s, _, active_dofs = compute_ratio(us, u)
    smin = jnp.where(active_dofs, s, jnp.inf).min()
    smax = jnp.where(active_dofs, s, -jnp.inf).max()
    return smin, smax
