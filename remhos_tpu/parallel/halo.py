"""One-element-deep halo exchange along the sharded mesh axis.

The TPU-native replacement for ParFiniteElementSpace::ExchangeFaceNbrData
(reference usage sites: remhos_lo.cpp:55-58, remhos.cpp:1812-1813, ...).

Elements are block-partitioned along the structured mesh's LAST axis, so
each shard's boundary slabs are contiguous element ranges:
  bottom slab = elements [0 : nslab], top slab = [E_loc - nslab : E_loc].
Cross-shard DG coupling needs exactly these slabs; they ride the ICI ring
via jax.lax.ppermute. Non-periodic meshes mask the wrap-around edges.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def ring_perms(n: int):
    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to next (receives prev)
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to prev (receives next)
    return fwd, bwd


def exchange_slabs(top, bot, axis_name: str, n_shards: int):
    """(from_prev, from_next): each device receives the previous device's
    `top` and the next device's `bot` (ring order along the sharded axis)."""
    fwd, bwd = ring_perms(n_shards)
    from_prev = lax.ppermute(top, axis_name, fwd)
    from_next = lax.ppermute(bot, axis_name, bwd)
    return from_prev, from_next


def edge_masks(axis_name: str, n_shards: int, periodic: bool):
    """(has_prev, has_next) booleans for this shard."""
    idx = lax.axis_index(axis_name)
    if periodic:
        t = jnp.bool_(True)
        return t, t
    return idx > 0, idx < n_shards - 1
