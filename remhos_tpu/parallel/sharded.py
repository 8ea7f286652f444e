"""Element-sharded advection operator: shard_map + ppermute halos.

Each device owns a contiguous block of elements along the mesh's LAST axis
(the structured-grid analog of the reference's METIS domain decomposition,
remhos.cpp:459-463). Inside shard_map, the shard is itself a structured
mesh whose last axis is non-periodic; the two cross-shard face layers are
patched from halo slabs exchanged with jax.lax.ppermute:

- face-neighbor field values          (ExchangeFaceNbrData equivalent)
- element extrema for bounds stencils (GroupCommunicator min/max equivalent,
  remhos_tools.cpp:437-466)
- global scalars via psum/pmin        (MPI_Allreduce equivalent)

Sharded and unsharded runs produce identical results to round-off: the
halo patching reproduces the exact single-chip gather, and all scatters
are deterministic min/max/add.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import assembly as asm
from .. import bounds as bnd
from .. import structured as strm
from .. import steppers
from ..discretization import build_discretization
from ..mesh import StructuredMesh, faces_for_dim, make_cartesian_mesh
from ..operator import Advection, SolverConfig
from . import halo


def _last_axis_faces(dim: int):
    faces = faces_for_dim(dim)
    lo = faces.index((dim - 1, 0))
    hi = faces.index((dim - 1, 1))
    return lo, hi


def local_mesh_of(mesh: StructuredMesh, n_shards: int) -> StructuredMesh:
    """Static description of one shard's block (geometry coords unused at
    runtime — the real node positions arrive as sharded runtime arrays)."""
    assert mesh.shape[-1] % n_shards == 0, (
        f"last mesh axis {mesh.shape[-1]} not divisible by {n_shards} shards")
    lshape = mesh.shape[:-1] + (mesh.shape[-1] // n_shards,)
    lper = mesh.periodic[:-1] + (False,)   # cross faces go through halos
    return make_cartesian_mesh(mesh.dim, lshape, mesh.lo, mesh.hi, lper,
                               mesh.mesh_order)


class ShardedAdvection(Advection):
    """Advection over one shard, with halo-aware face gather and bounds."""

    def __init__(self, disc, cfg: SolverConfig, x0_nodes, v_nodes, inflow,
                 axis_name: str, n_shards: int, periodic_last: bool,
                 bb_min, bb_max):
        super().__init__(disc, cfg, x0_nodes, v_nodes, inflow)
        self.axis_name = axis_name
        self.n_shards = n_shards
        self.periodic_last = periodic_last
        self.bb_min = bb_min            # global box (local mesh's box is wrong)
        self.bb_max = bb_max
        dim = disc.dim
        self.face_lo, self.face_hi = _last_axis_faces(dim)
        self.nslab = int(np.prod(disc.mesh.shape[:-1]))
        # CG plane size for overlap bounds (nodes with last-axis index 0/max
        # are the first/last (q+1)^(dim-1)-sized contiguous stride groups)
        q = max(disc.p, 1)
        gshape = tuple((q * s) if per else (q * s + 1)
                       for s, per in zip(disc.mesh.shape, disc.mesh.periodic))
        self.n_cg_plane = int(np.prod(gshape[:-1]))
        self.gather_nbr = self._gather_nbr_halo

    # -- halo face gather (ExchangeFaceNbrData equivalent) ----------------
    def _gather_nbr_halo(self, u, bdr_value=None):
        ns = self.nslab
        f_lo, f_hi = self.face_lo, self.face_hi
        # what the NEXT shard needs at its low face == my top face-dof values
        send_up = u[-ns:][:, self.bdr_dofs[f_hi]]          # [ns, fd]
        send_dn = u[:ns][:, self.bdr_dofs[f_lo]]
        from_prev, from_next = halo.exchange_slabs(send_up, send_dn,
                                                   self.axis_name,
                                                   self.n_shards)
        has_prev, has_next = halo.edge_masks(self.axis_name, self.n_shards,
                                             self.periodic_last)
        # physical-edge fallback: inflow values or zero
        if bdr_value is not None:
            edge_lo = bdr_value[:ns, f_lo]
            edge_hi = bdr_value[-ns:, f_hi]
        else:
            edge_lo = jnp.zeros_like(send_dn)
            edge_hi = jnp.zeros_like(send_up)
        slab_lo = jnp.where(has_prev, from_prev, edge_lo)
        slab_hi = jnp.where(has_next, from_next, edge_hi)
        mesh = self.disc.mesh
        return strm.gather_nbr_structured(
            u, mesh.shape, mesh.periodic, self.nbr_dof_local,
            bdr_value=bdr_value, halo={f_lo: slab_lo, f_hi: slab_hi})

    # -- bounds with halo extrema (GroupCommunicator equivalent) ----------
    def compute_bounds(self, el_min, el_max, active_el=None):
        ns = self.nslab
        mmin = el_min if active_el is None else jnp.where(active_el, el_min,
                                                          bnd.INF)
        mmax = el_max if active_el is None else jnp.where(active_el, el_max,
                                                          -bnd.INF)
        pmin_prev, pmin_next = halo.exchange_slabs(mmin[-ns:], mmin[:ns],
                                                   self.axis_name,
                                                   self.n_shards)
        pmax_prev, pmax_next = halo.exchange_slabs(mmax[-ns:], mmax[:ns],
                                                   self.axis_name,
                                                   self.n_shards)
        has_prev, has_next = halo.edge_masks(self.axis_name, self.n_shards,
                                             self.periodic_last)
        pmin_prev = jnp.where(has_prev, pmin_prev, bnd.INF)
        pmin_next = jnp.where(has_next, pmin_next, bnd.INF)
        pmax_prev = jnp.where(has_prev, pmax_prev, -bnd.INF)
        pmax_next = jnp.where(has_next, pmax_next, -bnd.INF)

        dm = self.disc.dofmaps
        if self.cfg.bounds_type == 1:
            lo, hi = bnd.sparsity_bounds(el_min, el_max,
                                         jnp.asarray(dm.nbr_elem), dm.nd)
            lo = lo.at[:ns].min(pmin_prev[:, None])
            lo = lo.at[-ns:].min(pmin_next[:, None])
            hi = hi.at[:ns].max(pmax_prev[:, None])
            hi = hi.at[-ns:].max(pmax_next[:, None])
            return lo, hi

        mesh = self.disc.mesh

        def exchange(bot, top):
            return halo.exchange_slabs(top, bot, self.axis_name,
                                       self.n_shards)

        return strm.overlap_bounds_structured(
            el_min, el_max, mesh.shape, mesh.periodic, self.disc.p,
            active_el=active_el, last_axis_exchange=exchange,
            last_axis_edges=(has_prev, has_next))

    # -- global scalar reductions -----------------------------------------
    def all_min(self, x):
        return lax.pmin(x, self.axis_name)

    def all_sum_fn(self):
        return lambda x: lax.psum(x, self.axis_name)


def make_sharded_step(mesh: StructuredMesh, scfg: SolverConfig, order: int,
                      n_shards: int, ode_solver: int,
                      axis_name: str = "shard", devices=None):
    """Build (device_mesh, jitted step) for element-sharded execution.

    step(S, t, dt, x0, v, inflow) -> (S_new, dt_ratio); S[nf, E, nd] and the
    geometry arrays are sharded along E over `axis_name`.
    """
    lmesh = local_mesh_of(mesh, n_shards)
    disc_loc = build_discretization(lmesh, order)
    periodic_last = mesh.periodic[-1]
    bb_min, bb_max = mesh.bb_min, mesh.bb_max

    if devices is None:
        devices = jax.devices()[:n_shards]
    dev_mesh = Mesh(np.asarray(devices), (axis_name,))

    def step_local(S, t, dt, x0, v, inflow):
        adv = ShardedAdvection(disc_loc, scfg, x0, v, inflow, axis_name,
                               n_shards, periodic_last, bb_min, bb_max)
        if ode_solver <= 10:
            stepper = steppers.make_rk_step(adv.stage_function(), ode_solver)
        else:
            stepper = steppers.make_idp_step(adv.mult_unlimited,
                                             adv.limit_mult, ode_solver)
        S_new, ratio = stepper(S, t, dt)
        return S_new, lax.pmin(ratio, axis_name)

    sharded = jax.shard_map(
        step_local, mesh=dev_mesh,
        in_specs=(P(None, axis_name), P(), P(), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=(P(None, axis_name), P()))
    return dev_mesh, jax.jit(sharded)


def shard_arrays(dev_mesh, axis_name, S, x0, v, inflow):
    """Place the state and geometry arrays with the element-block sharding."""
    sh_S = NamedSharding(dev_mesh, P(None, axis_name))
    sh_E = NamedSharding(dev_mesh, P(axis_name))
    return (jax.device_put(S, sh_S), jax.device_put(x0, sh_E),
            jax.device_put(v, sh_E), jax.device_put(inflow, sh_E))
