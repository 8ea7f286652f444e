"""Structured-grid fast paths: roll-based halos, separable bounds.

On a structured element grid (e = ix + nx*iy + nx*ny*iz), face-neighbor
access and the overlap-bounds stencil are *shifts*, not gathers. TPU
executes rolls/slices at memory-bandwidth speed while dynamic gathers and
scatters serialize — these replace assembly.gather_nbr_face and
bounds.overlap_bounds on the hot path (bitwise-identical results; the
generic index-table versions remain as the reference implementation and
for tests).

Grid layout: u[E, nd] reshapes to [n_last, ..., n_first, nd] (C order),
so mesh axis a is grid dim (dim-1-a).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import faces_for_dim

INF = float("inf")


def _grid_dim(dim, axis):
    return dim - 1 - axis


def _edge_index(arr_ndim, gdim, side):
    idx = [slice(None)] * arr_ndim
    idx[gdim] = slice(-1, None) if side == 1 else slice(0, 1)
    return tuple(idx)


def _shift(arr, gdim, side, periodic, fill=None, edge_slab=None):
    """Neighbor values along one grid axis: element i reads i+1 (side 1) or
    i-1 (side 0). Non-periodic/overridden edges read `fill` or `edge_slab`."""
    shift = -1 if side == 1 else 1
    out = jnp.roll(arr, shift, axis=gdim)
    if periodic and edge_slab is None:
        return out
    idx = _edge_index(arr.ndim, gdim, side)
    if edge_slab is not None:
        return out.at[idx].set(edge_slab.reshape(out[idx].shape))
    return out.at[idx].set(fill)


def _edge_mask(E, shape, axis, side):
    """Boolean [E]: element lies on the (axis, side) physical edge."""
    dim = len(shape)
    grid_shape = tuple(reversed(shape))
    m = np.zeros(grid_shape, dtype=bool)
    idx = [slice(None)] * dim
    idx[_grid_dim(dim, axis)] = -1 if side == 1 else 0
    m[tuple(idx)] = True
    return jnp.asarray(m.reshape(E))


_FACE_GATHER_CACHE = {}


def _face_gather_matrix(nbr_np, nd):
    """One-hot [nd, nf*fd] extracting every face's neighbor-side dofs in
    ONE matmul (exact: each output sums a single 1.0*v product). The
    per-face strided dof takes relayout [E, fd] slices six times on TPU
    (~4x slower than this dot, measured)."""
    key = (nbr_np.tobytes(), nd)
    G = _FACE_GATHER_CACHE.get(key)
    if G is None:
        nf, fd = nbr_np.shape
        G = np.zeros((nd, nf * fd))
        for f in range(nf):
            G[nbr_np[f], np.arange(f * fd, (f + 1) * fd)] = 1.0
        _FACE_GATHER_CACHE[key] = G
    return G


def face_rolls(face_vals, shape, periodic, bdr_value=None, halo=None):
    """Roll per-face value blocks to their neighbor elements.

    face_vals: list of nf arrays [*grid, fd] (face-major own-side values,
    e.g. slices of a one-hot face gather). Returns list of nf [E, fd]
    neighbor-value arrays with 0-filled (or bdr_value / halo-slab)
    physical edges."""
    dim = len(shape)
    E = int(np.prod(shape))
    faces = faces_for_dim(dim)
    outs = []
    for f, (axis, side) in enumerate(faces):
        gdim = _grid_dim(dim, axis)
        vals = face_vals[f]                                 # [*grid, fd]
        if halo is not None and f in halo:
            # caller pre-masks the slab (cross-shard value or physical
            # edge); slab shape = the grid edge slice (any sharded axis)
            nb = _shift(vals, gdim, side, False, edge_slab=halo[f])
            nb = nb.reshape(E, -1)
        else:
            nb = _shift(vals, gdim, side, periodic[axis], fill=0.0)
            nb = nb.reshape(E, -1)
            if not periodic[axis] and bdr_value is not None:
                edge = _edge_mask(E, shape, axis, side)
                nb = jnp.where(edge[:, None], bdr_value[:, f], nb)
        outs.append(nb)
    return outs


def _halo_patch_flat(slab, shape, axis, side):
    """Flatten a halo edge slab (grid shape with the (axis, side) grid
    dim collapsed to 1, trailing feature dims kept) into a full flat
    [E, feat] array that is zero away from that edge: a zero-pad along
    the grid dim + the free grid->flat reshape — no scatter."""
    dim = len(shape)
    gdim = _grid_dim(dim, axis)
    n = shape[axis]
    pad = [(0, 0)] * slab.ndim
    pad[gdim] = (0, n - 1) if side == 0 else (n - 1, 0)
    full = jnp.pad(slab, pad)
    E = int(np.prod(shape))
    return full.reshape(E, -1)


def _flat_face_rolls(uf, shape, periodic, fd, bdr_value=None, halo=None):
    """Neighbor face blocks via ELEMENT-AXIS rolls of the flat one-hot
    face trace uf[E, nf*fd]: a major-axis jnp.roll lowers to two free
    slices, so all six face gathers fuse into one pass over uf (grid-dim
    rolls of fd-wide blocks relayout on TPU — 8x slower at E=110k,
    measured). Rows whose flat shift crossed the axis boundary are
    patched: 0/bdr_value on physical edges, the complementary wrap roll
    on periodic axes, or — in sharded halo mode — the ppermute'd
    neighbor slab (halo[f], already edge-masked by the caller), padded
    to a flat edge patch with _halo_patch_flat. Bit-identical to the
    grid-reshape path."""
    dim = len(shape)
    E = uf.shape[0]
    faces = faces_for_dim(dim)
    strides = [1]
    for a in range(1, dim):
        strides.append(strides[-1] * shape[a - 1])
    outs = []
    for f, (axis, side) in enumerate(faces):
        dirn = 1 if side == 1 else -1
        blk = slice(f * fd, (f + 1) * fd)
        r1 = jnp.roll(uf, -dirn * strides[axis], axis=0)[:, blk]
        edge = _edge_mask(E, shape, axis, side)
        if halo is not None and f in halo:
            patch = _halo_patch_flat(halo[f], shape, axis, side)
            nb = jnp.where(edge[:, None], patch, r1)
        elif periodic[axis]:
            wrap = -dirn * (shape[axis] - 1) * strides[axis]
            r2 = jnp.roll(uf, -wrap, axis=0)[:, blk]
            nb = jnp.where(edge[:, None], r2, r1)
        elif bdr_value is not None:
            nb = jnp.where(edge[:, None], bdr_value[:, f], r1)
        else:
            nb = jnp.where(edge[:, None], 0.0, r1)
        outs.append(nb)
    return outs


def gather_nbr_structured(u, shape, periodic, nbr_dof_local,
                          bdr_value=None, halo=None):
    """u_nbr_face[E, nf, fd] via one one-hot matmul + flat element-axis
    rolls (ExchangeFaceNbrData equivalent).

    halo: optional dict {face_index: slab} overriding the edge along the
    sharded mesh axes; slabs are grid-edge-shaped (the ppermute payload)
    and already caller-masked. Halo mode uses the same flat element-axis
    rolls as the unsharded path (the grid-reshape rolls it used through
    round 4 measured as the bulk of the 12-17% n=1 shard_map overhead);
    the slab enters as a zero-padded flat edge patch (_halo_patch_flat).
    """
    dim = len(shape)
    E, nd = u.shape
    grid_shape = tuple(reversed(shape))
    try:
        nbr_np = np.asarray(nbr_dof_local)   # traced under shard_map ->
    except jax.errors.TracerArrayConversionError:
        nbr_np = None                        # keep the gather path
    faces = faces_for_dim(dim)
    nf = len(faces)
    if nbr_np is not None:
        fd = nbr_np.shape[1]
        G = jnp.asarray(_face_gather_matrix(nbr_np, nd), u.dtype)
        # f64 (golden tiers): HIGHEST — exact for a one-hot matrix
        # (single product per output; DEFAULT would round through bf16).
        # f32 production: HIGH (3-pass bf16x3) — u_hi+u_lo covers ~17 of
        # f32's 24 mantissa bits, so the gathered face trace rounds at
        # ~1e-5, the SAME scale as the kernel's bf16x3 RHS dots that
        # consume it, for half the MXU passes. Measured on the chip:
        # FOM 1948 -> 1974 with the conservation closure injection
        # (1.74e-6, in budget) and the f32-vs-f64 cross check (2.73e-6)
        # UNCHANGED — the rounding is invisible below the existing
        # bf16x3 noise floor (docs/PERF.md round-5 notes).
        # REMHOS_GATHER_PREC=exact restores HIGHEST in f32.
        import os
        prec = jax.lax.Precision.HIGHEST
        if u.dtype == jnp.float32 and \
                os.environ.get("REMHOS_GATHER_PREC", "high") != "exact":
            prec = jax.lax.Precision.HIGH
        uf = jnp.dot(u, G, precision=prec)
        return jnp.stack(
            _flat_face_rolls(uf, shape, periodic, fd,
                             bdr_value=bdr_value, halo=halo), axis=1)
    ug = u.reshape(grid_shape + (nd,))
    face_vals = [ug[..., nbr_dof_local[f]] for f in range(nf)]
    outs = face_rolls(face_vals, shape, periodic, bdr_value=bdr_value,
                      halo=halo)
    return jnp.stack(outs, axis=1)


def overlap_stencil_flat(el_min, el_max, shape, periodic,
                         axis_exchanges=None):
    """Element-class overlap-bounds stencil ([E, 3^dim] min, max) via flat
    ELEMENT-AXIS rolls: equals overlap_bounds_structured(..., p=2)
    bit-for-bit (tested) with no grid reshape / class-axis transpose.
    Every shift of the partially reduced work arrays is a major-axis roll
    (two free slices) plus an edge-row select — the same pattern measured
    8x faster than grid-dim rolls for the face gather (_flat_face_rolls);
    the trace attribution showed the grid-roll stencil at 60.9 us/stage,
    the largest single glue bucket (docs/PERF.md round-4 notes).

    axis_exchanges: {mesh_axis: (exchange_fn, (has_prev, has_next))} —
    the sharded mode's cross-shard slab exchange of the PARTIALLY
    REDUCED work arrays per axis pass (same contract as
    overlap_bounds_structured); only the slab extraction touches a grid
    view, the rolls/mins stay flat."""
    dim = len(shape)
    E = int(np.prod(shape))
    grid_shape = tuple(reversed(shape))
    strides = [1]
    for a in range(1, dim):
        strides.append(strides[-1] * shape[a - 1])
    Wmin, Wmax = el_min[:, None], el_max[:, None]
    for axis in range(dim):
        s, n = strides[axis], shape[axis]
        exch = (axis_exchanges or {}).get(axis)
        slabs = {}
        if exch is not None:
            exchange_fn, (has_prev, has_next) = exch
            gdim = _grid_dim(dim, axis)
            for name, W, worst in (("min", Wmin, INF), ("max", Wmax, -INF)):
                Wg = W.reshape(grid_shape + (W.shape[1],))
                bot = Wg[_edge_index(Wg.ndim, gdim, 0)]
                top = Wg[_edge_index(Wg.ndim, gdim, 1)]
                fp, fn_ = exchange_fn(bot, top)
                slabs[name] = (jnp.where(has_prev, fp, worst),
                               jnp.where(has_next, fn_, worst))
        segs_min, segs_max = [Wmin], [Wmax]
        for side in (0, 1):
            dirn = 1 if side == 1 else -1
            nmin = jnp.roll(Wmin, -dirn * s, axis=0)
            nmax = jnp.roll(Wmax, -dirn * s, axis=0)
            edge = _edge_mask(E, shape, axis, side)
            if slabs:
                pmin = _halo_patch_flat(slabs["min"][side], shape, axis,
                                        side)
                pmax = _halo_patch_flat(slabs["max"][side], shape, axis,
                                        side)
                nmin = jnp.where(edge[:, None], pmin, nmin)
                nmax = jnp.where(edge[:, None], pmax, nmax)
            elif periodic[axis]:
                wrap = dirn * (n - 1) * s
                nmin = jnp.where(edge[:, None],
                                 jnp.roll(Wmin, wrap, axis=0), nmin)
                nmax = jnp.where(edge[:, None],
                                 jnp.roll(Wmax, wrap, axis=0), nmax)
            else:
                nmin = jnp.where(edge[:, None], INF, nmin)
                nmax = jnp.where(edge[:, None], -INF, nmax)
            nmin = jnp.minimum(Wmin, nmin)
            nmax = jnp.maximum(Wmax, nmax)
            if side == 0:
                segs_min.insert(0, nmin)
                segs_max.insert(0, nmax)
            else:
                segs_min.append(nmin)
                segs_max.append(nmax)
        # class axis grows 1 -> 3 -> 9 -> 27 with the NEW class slowest,
        # so the final column index is cz*9 + cy*3 + cx (x fastest) —
        # identical to the grid path's reversed-perm reshape
        Wmin = jnp.concatenate(segs_min, axis=1)
        Wmax = jnp.concatenate(segs_max, axis=1)
    return Wmin, Wmax


def overlap_stencil_cols(el_min, el_max, shape, periodic):
    """overlap_stencil_flat computed on SEPARATE 1-D [E] columns, stacked
    to [E, 3^dim] only at the end. Rationale: the [E, c] partial arrays
    of the flat variant keep c (1 -> 3 -> 9) on the LANE axis, so every
    elementwise min/select processes E x 128 padded lanes at <= 7% lane
    utilization; 1-D columns carry no lane padding and the single final
    stack is the only wide relayout. Bit-identical to the flat variant
    (same values, min/max only)."""
    dim = len(shape)
    E = int(np.prod(shape))
    strides = [1]
    for a in range(1, dim):
        strides.append(strides[-1] * shape[a - 1])
    cols_min, cols_max = [el_min], [el_max]
    for axis in range(dim):
        s, n = strides[axis], shape[axis]
        new_min, new_max = [], []
        edge0 = _edge_mask(E, shape, axis, 0)
        edge1 = _edge_mask(E, shape, axis, 1)
        for side, edge in ((0, edge0), (1, edge1)):
            dirn = 1 if side == 1 else -1
            sm, sx = [], []
            for Wm, Wx in zip(cols_min, cols_max):
                nm = jnp.roll(Wm, -dirn * s)
                nx = jnp.roll(Wx, -dirn * s)
                if periodic[axis]:
                    wrap = dirn * (n - 1) * s
                    nm = jnp.where(edge, jnp.roll(Wm, wrap), nm)
                    nx = jnp.where(edge, jnp.roll(Wx, wrap), nx)
                else:
                    nm = jnp.where(edge, INF, nm)
                    nx = jnp.where(edge, -INF, nx)
                sm.append(jnp.minimum(Wm, nm))
                sx.append(jnp.maximum(Wx, nx))
            if side == 0:
                new_min, new_max = sm, sx
            else:
                new_min = new_min + cols_min + sm
                new_max = new_max + cols_max + sx
        cols_min, cols_max = new_min, new_max
    return (jnp.stack(cols_min, axis=1), jnp.stack(cols_max, axis=1))


def overlap_stencil_T(el_min, el_max, shape, periodic):
    """overlap_stencil_flat in CLASS-MAJOR [3^dim, E] layout: E rides the
    lane axis at full utilization; the neighbor shifts become lane-dim
    rolls. Returns ([3^dim, E] min, max) — the TRANSPOSE of the flat
    variant's outputs (same values; the mega kernel's expansion dot
    contracts dim 0 either way)."""
    dim = len(shape)
    E = int(np.prod(shape))
    strides = [1]
    for a in range(1, dim):
        strides.append(strides[-1] * shape[a - 1])
    Wmin, Wmax = el_min[None, :], el_max[None, :]
    for axis in range(dim):
        s, n = strides[axis], shape[axis]
        edge0 = _edge_mask(E, shape, axis, 0)[None, :]
        edge1 = _edge_mask(E, shape, axis, 1)[None, :]
        segs_min, segs_max = [Wmin], [Wmax]
        for side, edge in ((0, edge0), (1, edge1)):
            dirn = 1 if side == 1 else -1
            nmin = jnp.roll(Wmin, -dirn * s, axis=1)
            nmax = jnp.roll(Wmax, -dirn * s, axis=1)
            if periodic[axis]:
                wrap = dirn * (n - 1) * s
                nmin = jnp.where(edge, jnp.roll(Wmin, wrap, axis=1), nmin)
                nmax = jnp.where(edge, jnp.roll(Wmax, wrap, axis=1), nmax)
            else:
                nmin = jnp.where(edge, INF, nmin)
                nmax = jnp.where(edge, -INF, nmax)
            nmin = jnp.minimum(Wmin, nmin)
            nmax = jnp.maximum(Wmax, nmax)
            if side == 0:
                segs_min.insert(0, nmin)
                segs_max.insert(0, nmax)
            else:
                segs_min.append(nmin)
                segs_max.append(nmax)
        Wmin = jnp.concatenate(segs_min, axis=0)
        Wmax = jnp.concatenate(segs_max, axis=0)
    return Wmin, Wmax


def overlap_bounds_structured(el_min, el_max, shape, periodic, p,
                              active_el=None, last_axis_exchange=None,
                              last_axis_edges=None, axis_exchanges=None):
    """Separable overlap bounds: per axis, a GLL endpoint dof also sees the
    adjacent element's extremum; interior dofs see only their own element.
    Equals the CG scatter-min/max of ComputeOverlapBounds
    (remhos_tools.cpp:432-495) on a structured grid, with no scatters.

    last_axis_exchange(bot, top) -> (from_prev, from_next): cross-shard
    slab exchange of the partially reduced work arrays (sharded mode);
    last_axis_edges = (has_prev, has_next) booleans.

    axis_exchanges: optional {mesh_axis: (exchange_fn, (has_prev, has_next))}
    generalizing the halo to several sharded axes (2D/3D device meshes) —
    the per-axis passes exchange the partially reduced slabs, which also
    carries the diagonal (corner) contributions across shard corners.
    """
    dim = len(shape)
    grid_shape = tuple(reversed(shape))
    if active_el is not None:
        el_min = jnp.where(active_el, el_min, INF)
        el_max = jnp.where(active_el, el_max, -INF)
    Wmin = el_min.reshape(grid_shape)
    Wmax = el_max.reshape(grid_shape)
    n1 = p + 1

    if axis_exchanges is None:
        axis_exchanges = {}
        if last_axis_exchange is not None:
            axis_exchanges[dim - 1] = (last_axis_exchange, last_axis_edges)

    for axis in range(dim):
        gdim = _grid_dim(dim, axis)
        slabs = {}
        if axis in axis_exchanges:
            exchange_fn, (has_prev, has_next) = axis_exchanges[axis]
            for name, W, worst in (("min", Wmin, INF), ("max", Wmax, -INF)):
                bot = W[_edge_index(W.ndim, gdim, 0)]
                top = W[_edge_index(W.ndim, gdim, 1)]
                from_prev, from_next = exchange_fn(bot, top)
                slabs[name] = (jnp.where(has_prev, from_prev, worst),
                               jnp.where(has_next, from_next, worst))
        if slabs:
            lo_min = _shift(Wmin, gdim, 0, False, edge_slab=slabs["min"][0])
            hi_min = _shift(Wmin, gdim, 1, False, edge_slab=slabs["min"][1])
            lo_max = _shift(Wmax, gdim, 0, False, edge_slab=slabs["max"][0])
            hi_max = _shift(Wmax, gdim, 1, False, edge_slab=slabs["max"][1])
        else:
            lo_min = _shift(Wmin, gdim, 0, periodic[axis], fill=INF)
            hi_min = _shift(Wmin, gdim, 1, periodic[axis], fill=INF)
            lo_max = _shift(Wmax, gdim, 0, periodic[axis], fill=-INF)
            hi_max = _shift(Wmax, gdim, 1, periodic[axis], fill=-INF)
        # new trailing dof axis of size p+1: k=0 sees low nbr, k=p high nbr
        mins = [jnp.minimum(Wmin, lo_min)] + [Wmin] * (n1 - 2) + \
               [jnp.minimum(Wmin, hi_min)]
        maxs = [jnp.maximum(Wmax, lo_max)] + [Wmax] * (n1 - 2) + \
               [jnp.maximum(Wmax, hi_max)]
        Wmin = jnp.stack(mins, axis=-1)
        Wmax = jnp.stack(maxs, axis=-1)

    # dof axes were appended x,y,z; lex dof order (x fastest) needs the
    # LAST reshape axis to be x -> reverse the dof axes
    E = int(np.prod(shape))
    perm = tuple(range(dim)) + tuple(range(2 * dim - 1, dim - 1, -1))
    Wmin = jnp.transpose(Wmin, perm).reshape(E, n1 ** dim)
    Wmax = jnp.transpose(Wmax, perm).reshape(E, n1 ** dim)
    return Wmin, Wmax
