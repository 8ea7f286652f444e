"""Element-sharded advection operator: shard_map + ppermute halos.

Elements are block-decomposed over the LAST k mesh axes onto a k-D device
mesh (the structured-grid analog of the reference's METIS domain
decomposition, remhos.cpp:459-463; k=1 or 2 today, same pattern extends).
Inside shard_map each shard is itself a structured mesh whose sharded axes
are locally non-periodic; the cross-shard face layers are patched from
halo slabs exchanged with jax.lax.ppermute per device axis:

- face-neighbor field values          (ExchangeFaceNbrData equivalent)
- partially-reduced bound slabs       (GroupCommunicator min/max equivalent;
  exchanging after each separable pass carries the diagonal/corner
  contributions without explicit corner messages)
- global scalars via psum/pmin        (MPI_Allreduce equivalent)

For k >= 2 the flat element order is permuted to shard-block-major so each
device owns a contiguous range (see block_permutation); sums/maxima are
permutation-invariant, so the driver only unpermutes for file output.

Sharded and unsharded runs produce identical results to round-off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import steppers
from .. import structured as strm
from ..discretization import build_discretization
from ..mesh import StructuredMesh, faces_for_dim, make_mesh_from_breaks
from ..operator import Advection, SolverConfig
from . import halo


def order_devices_for_dcn(devices=None):
    """Sort devices slice-major (slice_index outermost, then id).

    On a multi-slice TPU deployment the OUTER axis of the device mesh then
    crosses the DCN while all inner axes stay on ICI; combined with
    shard_axes_spec (which puts the LAST mesh axis outermost), the
    largest-block, lowest-frequency halo ring rides DCN and the
    fine-grained rings ride ICI — the multi-slice scaling pattern of
    SURVEY §2c(d).  Single-slice (and CPU) devices have no slice_index and
    the order reduces to id order."""
    if devices is None:
        devices = jax.devices()

    def key(d):
        return (getattr(d, "slice_index", 0) or 0, d.id)

    return sorted(devices, key=key)


def shard_axes_spec(dim: int, shard_grid):
    """[(mesh_axis, device_axis_name, n)] for the last k mesh axes; device
    axes ordered outermost (last mesh axis) first."""
    k = len(shard_grid)
    spec = []
    for i, n in enumerate(shard_grid):
        mesh_axis = dim - k + i
        spec.append((mesh_axis, f"sh{mesh_axis}", int(n)))
    return list(reversed(spec))     # outer (last mesh axis) first


def local_mesh_of(mesh: StructuredMesh, shard_grid) -> StructuredMesh:
    dim = mesh.dim
    k = len(shard_grid)
    lbreaks = []
    lper = []
    for a in range(dim):
        if a < dim - k:
            lbreaks.append(mesh.breaks[a])
            lper.append(mesh.periodic[a])
        else:
            n = shard_grid[a - (dim - k)]
            cnt = mesh.shape[a]
            assert cnt % n == 0, (
                f"mesh axis {a} ({cnt}) not divisible by {n} shards")
            lbreaks.append(mesh.breaks[a][: cnt // n + 1])
            lper.append(False)      # cross faces go through halos
    return make_mesh_from_breaks(dim, tuple(lbreaks), tuple(lper),
                                 mesh.mesh_order)


def block_permutation(shape, shard_grid):
    """perm[new_flat] = old_flat element index, shard-block-major (outer
    device axis = last mesh axis). Identity for k == 1."""
    dim = len(shape)
    k = len(shard_grid)
    if k == 1:
        return np.arange(int(np.prod(shape)))
    E = int(np.prod(shape))
    old = np.arange(E).reshape(tuple(reversed(shape)))   # [z, y, x]
    blocks = []
    # device-major order: outer = last mesh axis blocks, then next, ...
    loc = [shape[dim - k + i] // shard_grid[i] for i in range(k)]
    if k != 2:
        raise NotImplementedError("shard grids of rank 1 or 2")
    sy, sz = shard_grid            # shard_grid aligned to axes (y, z)
    ny_loc, nz_loc = loc
    for bz in range(sz):
        for by in range(sy):
            blk = old[bz * nz_loc:(bz + 1) * nz_loc,
                      by * ny_loc:(by + 1) * ny_loc]
            blocks.append(blk.reshape(-1))
    return np.concatenate(blocks)


class ShardedAdvection(Advection):
    """Advection over one shard, halo-aware along all sharded axes."""

    def __init__(self, disc, cfg: SolverConfig, x0_nodes, v_nodes, inflow,
                 axes_spec, periodic_global, bb_min, bb_max, dtype=None):
        self.bb_min = bb_min                # GLOBAL box, pre-set so init-time
        self.bb_max = bb_max                # velocity evals use it
        if cfg.lo == 4 or cfg.mono == 2:
            # subcell velocity must be zeroed at PHYSICAL boundaries only
            # (remhos.cpp:841-852); the local mesh's sharded axes read as
            # non-periodic edges, so build the mask in global context
            self._sub_bmask = self._shard_boundary_mask(
                disc, axes_spec, periodic_global)
        super().__init__(disc, cfg, x0_nodes, v_nodes, inflow, dtype=dtype)
        self.axes_spec = axes_spec          # [(mesh_axis, name, n)], outer 1st
        self.periodic_global = periodic_global
        dim = disc.dim
        faces = faces_for_dim(dim)
        self._face_of = {(a, s): f for f, (a, s) in enumerate(faces)}
        self._names = tuple(name for _, name, _ in axes_spec)
        self.gather_nbr = self._gather_nbr_halo

    @staticmethod
    def _shard_boundary_mask(disc, axes_spec, periodic_global):
        """[E_loc, nd] True at uniform nodes on the GLOBAL physical
        boundary: local-edge criteria on non-sharded axes, local edge AND
        shard-at-global-edge (edge_masks) on sharded axes."""
        import numpy as np
        mesh = disc.mesh
        dim = mesh.dim
        ref = np.asarray(disc.ref_nodes_u)        # [nd, dim]
        E = mesh.num_elements
        eidx = np.stack(np.unravel_index(np.arange(E), mesh.shape,
                                         order="F"), axis=-1)
        sharded = {a: (name, n) for a, name, n in axes_spec}
        mask = jnp.zeros((E, ref.shape[0]), bool)
        for d in range(dim):
            per = (periodic_global[d] if d in sharded else mesh.periodic[d])
            if per:
                continue
            at_lo = jnp.asarray((eidx[:, d] == 0)[:, None]
                                & (ref[None, :, d] == 0.0))
            at_hi = jnp.asarray((eidx[:, d] == mesh.shape[d] - 1)[:, None]
                                & (ref[None, :, d] == 1.0))
            if d in sharded:
                name, n = sharded[d]
                has_prev, has_next = halo.edge_masks(name, n, False)
                mask = mask | (at_lo & ~has_prev) | (at_hi & ~has_next)
            else:
                mask = mask | at_lo | at_hi
        return mask

    # -- per-axis slab exchange -------------------------------------------
    def _exchange(self, name, n, bot, top):
        """each shard receives (prev's top, next's bot) along device axis."""
        return halo.exchange_slabs(top, bot, name, n)

    def _edges(self, name, n, periodic):
        return halo.edge_masks(name, n, periodic)

    # -- halo face gather (ExchangeFaceNbrData equivalent) -----------------
    def _gather_nbr_halo(self, u, bdr_value=None):
        mesh = self.disc.mesh
        dim = mesh.dim
        grid_shape = tuple(reversed(mesh.shape))
        ug = u.reshape(grid_shape + (u.shape[1],))
        halos = {}
        for mesh_axis, name, n in self.axes_spec:
            gdim = dim - 1 - mesh_axis
            f_lo = self._face_of[(mesh_axis, 0)]
            f_hi = self._face_of[(mesh_axis, 1)]
            ein_lo = strm._edge_index(ug.ndim, gdim, 0)
            ein_hi = strm._edge_index(ug.ndim, gdim, 1)
            send_dn = ug[..., self.bdr_dofs[f_lo]][ein_lo]
            send_up = ug[..., self.bdr_dofs[f_hi]][ein_hi]
            from_prev, from_next = self._exchange(name, n, send_dn, send_up)
            has_prev, has_next = self._edges(
                name, n, self.periodic_global[mesh_axis])
            if bdr_value is not None:
                bv = bdr_value.reshape(grid_shape + bdr_value.shape[1:])
                edge_lo = bv[..., f_lo, :][ein_lo]
                edge_hi = bv[..., f_hi, :][ein_hi]
            else:
                edge_lo = jnp.zeros_like(send_dn)
                edge_hi = jnp.zeros_like(send_up)
            halos[f_lo] = jnp.where(has_prev, from_prev, edge_lo)
            halos[f_hi] = jnp.where(has_next, from_next, edge_hi)
        # numpy dof table (not the traced jnp copy) so the slice fast
        # path stays available inside shard_map
        return strm.gather_nbr_structured(
            u, mesh.shape, mesh.periodic, self.disc.dofmaps.nbr_dof_local,
            bdr_value=bdr_value, halo=halos)

    # -- bounds with halo extrema (GroupCommunicator equivalent) -----------
    def compute_bounds(self, el_min, el_max, active_el=None):
        mesh = self.disc.mesh
        if self.cfg.bounds_type == 1:
            return self._sparsity_bounds_halo(el_min, el_max, active_el)

        return strm.overlap_bounds_structured(
            el_min, el_max, mesh.shape, mesh.periodic, self.disc.p,
            active_el=active_el, axis_exchanges=self._bounds_exchanges())

    def _bounds_exchanges(self):
        axis_exchanges = {}
        for mesh_axis, name, n in self.axes_spec:
            def make_fn(name=name, n=n):
                return lambda bot, top: self._exchange(name, n, bot, top)
            axis_exchanges[mesh_axis] = (
                make_fn(),
                self._edges(name, n, self.periodic_global[mesh_axis]))
        return axis_exchanges

    def compute_bounds_stencil(self, el_min, el_max):
        """Element-class stencil with the same cross-shard slab exchanges
        as compute_bounds (3 classes per axis; see the base class). Flat
        element-axis rolls, like the unsharded stencil — the grid-roll
        variant it used through round 4 was most of the n=1 shard_map
        overhead (12-17%, docs/PERF.md round-5 notes)."""
        mesh = self.disc.mesh
        if self.cfg.bounds_type != 0:
            return None
        return strm.overlap_stencil_flat(
            el_min, el_max, mesh.shape, mesh.periodic,
            axis_exchanges=self._bounds_exchanges())

    def _sparsity_bounds_halo(self, el_min, el_max, active_el):
        from .. import bounds as bnd
        mesh = self.disc.mesh
        dim = mesh.dim
        dm = self.disc.dofmaps
        mmin = el_min if active_el is None else jnp.where(active_el, el_min,
                                                          bnd.INF)
        mmax = el_max if active_el is None else jnp.where(active_el, el_max,
                                                          -bnd.INF)
        lo, hi = bnd.sparsity_bounds(el_min, el_max,
                                     jnp.asarray(dm.nbr_elem), dm.nd)
        grid_shape = tuple(reversed(mesh.shape))
        lo_g = lo.reshape(grid_shape + (dm.nd,))
        hi_g = hi.reshape(grid_shape + (dm.nd,))
        mmin_g = mmin.reshape(grid_shape)
        mmax_g = mmax.reshape(grid_shape)
        for mesh_axis, name, n in self.axes_spec:
            gdim = dim - 1 - mesh_axis
            per = self.periodic_global[mesh_axis]
            has_prev, has_next = self._edges(name, n, per)
            ein_lo = strm._edge_index(mmin_g.ndim, gdim, 0)
            ein_hi = strm._edge_index(mmin_g.ndim, gdim, 1)
            for W_g, slabs, worst, upd in (
                    (mmin_g, None, bnd.INF, "min"),
                    (mmax_g, None, -bnd.INF, "max")):
                fp, fn = self._exchange(name, n, W_g[ein_lo], W_g[ein_hi])
                fp = jnp.where(has_prev, fp, worst)
                fn = jnp.where(has_next, fn, worst)
                tgt = lo_g if upd == "min" else hi_g
                op = jnp.minimum if upd == "min" else jnp.maximum
                tgt = tgt.at[ein_lo].set(op(tgt[ein_lo], fp[..., None]))
                tgt = tgt.at[ein_hi].set(op(tgt[ein_hi], fn[..., None]))
                if upd == "min":
                    lo_g = tgt
                else:
                    hi_g = tgt
        E = el_min.shape[0]
        return lo_g.reshape(E, dm.nd), hi_g.reshape(E, dm.nd)

    # -- global scalar reductions ------------------------------------------
    def all_min(self, x):
        return lax.pmin(x, self._names)

    def all_sum_fn(self):
        return lambda x: lax.psum(x, self._names)


def make_sharded_step(mesh: StructuredMesh, scfg: SolverConfig, order: int,
                      shard_grid, ode_solver: int, devices=None,
                      dcn: bool = False, dtype=None, loop: int = None):
    """Build (device_mesh, jitted step, perm) for element-sharded execution.

    shard_grid: int (1D, last mesh axis) or tuple over the last k mesh axes.
    step(S, t, dt, x0, v, inflow) -> (S_new, dt_ratio), all element arrays
    in shard-block-major order (see block_permutation).
    dcn: order devices slice-major so the outer device axis crosses the
    DCN on multi-slice deployments (no-op on a single slice).
    loop: when set, the returned step runs `loop` RK steps in ONE
    lax.scan INSIDE shard_map (single device dispatch, compensated
    combine — the bench's production loop shape); the returned aux is a
    dummy. Per-run setup (the fused path's polynomial geometry tables)
    is computed once per dispatch, outside the scan.
    """
    if isinstance(shard_grid, int):
        shard_grid = (shard_grid,)
    if scfg.mono != 0 or scfg.smth_ind:
        raise NotImplementedError(
            "monolithic/smoothness-indicator solvers run single-shard "
            "(serial in the reference too, remhos_mono.cpp:285)")
    if dcn:
        # keep exactly prod(shard_grid) devices after slice-major ordering —
        # the Mesh reshape below requires the exact count
        devices = order_devices_for_dcn(devices)[:int(np.prod(shard_grid))]
    dim = mesh.dim
    k = len(shard_grid)
    divisible = (getattr(mesh, "structured", True) and k <= dim and all(
        mesh.shape[dim - k + i] % shard_grid[i] == 0 for i in range(k)))
    if not getattr(mesh, "structured", True) or not divisible:
        # general-table path: also the fallback for shard counts that do
        # not divide the structured axes (np=3-style odd counts; ghost
        # padding in gsharded handles E % n != 0)
        from .gsharded import make_general_sharded_step
        return make_general_sharded_step(mesh, scfg, order,
                                         int(np.prod(shard_grid)),
                                         ode_solver, devices=devices,
                                         dtype=dtype)
    lmesh = local_mesh_of(mesh, shard_grid)
    disc_loc = build_discretization(lmesh, order)
    axes_spec = shard_axes_spec(dim, shard_grid)
    bb_min, bb_max = mesh.bb_min, mesh.bb_max
    periodic_global = mesh.periodic

    n_dev = int(np.prod(shard_grid))
    if devices is None:
        devices = jax.devices()[:n_dev]
    dev_shape = tuple(n for _, _, n in axes_spec)
    names = tuple(name for _, name, _ in axes_spec)
    dev_mesh = Mesh(np.asarray(devices).reshape(dev_shape), names)

    def step_local(S, t, dt, x0, v, inflow):
        adv = ShardedAdvection(disc_loc, scfg, x0, v, inflow, axes_spec,
                               periodic_global, bb_min, bb_max, dtype=dtype)
        if loop is not None:
            stepper = steppers.make_rk_step(adv.stage_function(),
                                            ode_solver, compensated=True)

            def body(carry, _):
                Sc, Cc, tc = carry
                S2, C2, _ = stepper(Sc, Cc, tc, dt)
                return (S2, C2, tc + dt), ()

            (S_new, _, _), _ = lax.scan(
                body, (S, jnp.zeros_like(S), t), None, length=loop)
            dummy = jnp.full((2,), jnp.inf, S.dtype)
            return S_new, dummy
        if ode_solver <= 10:
            stepper = steppers.make_rk_step(adv.stage_function(), ode_solver)
        else:
            stepper = steppers.make_idp_step(adv.mult_unlimited,
                                             adv.limit_mult, ode_solver,
                                             compute_mask=adv.compute_mask,
                                             use_masks=scfg.use_masks,
                                             geometry=adv.geometry)
        S_new, ratio = stepper(S, t, dt)
        return S_new, lax.pmin(ratio, names)

    # check_vma=False: pallas_call (the fused/mega stage kernels) cannot
    # annotate varying-mesh-axes on its outputs, which the checker
    # requires; every output here is explicitly placed by out_specs
    sharded = jax.shard_map(
        step_local, mesh=dev_mesh,
        in_specs=(P(None, names), P(), P(), P(names), P(names), P(names)),
        out_specs=(P(None, names), P()), check_vma=False)
    perm = block_permutation(mesh.shape, shard_grid)
    return dev_mesh, jax.jit(sharded), perm


def shard_arrays(dev_mesh, names, S, x0, v, inflow, perm=None, n_real=None):
    """Permute to shard-block-major order and place with block sharding.

    When len(perm) > n_real the tail rows are GHOST padding (gsharded):
    fields, velocity and inflow are zeroed there (geometry keeps the
    copied element's valid coordinates)."""
    if perm is not None and not np.array_equal(perm, np.arange(len(perm))):
        pj = jnp.asarray(perm)
        S = S[:, pj]
        x0 = x0[pj]
        v = v[pj]
        inflow = inflow[pj]
        if n_real is not None and len(perm) > n_real:
            live = jnp.arange(len(perm)) < n_real
            S = S * live[None, :, None]
            v = v * live[:, None, None]
            inflow = inflow * live[:, None]
    sh_S = NamedSharding(dev_mesh, P(None, names))
    sh_E = NamedSharding(dev_mesh, P(names))
    return (jax.device_put(S, sh_S), jax.device_put(x0, sh_E),
            jax.device_put(v, sh_E), jax.device_put(inflow, sh_E))
