"""Element-sharded advection for GENERAL (unstructured / curved / NURBS)
meshes: the table-driven analog of the structured halo path.

The reference partitions unstructured meshes with METIS and exchanges
one-element-deep face neighbors (remhos.cpp:459-463,
ParFiniteElementSpace::ExchangeFaceNbrData).  The TPU-native equivalent
keeps every cross-element reference as a GLOBAL element index and makes
the three cross-shard data flows explicit collectives inside shard_map:

- face-neighbor values: each shard extracts its own face TRACES
  [E_loc, nf, fd] (fd << nd) and `lax.all_gather`s them along the shard
  axis; neighbor values are then a gather
  traces[nbr_elem, nbr_face, nbr_facedof] with per-shard table slices
  (passed as sharded shard_map inputs, so the SPMD program is identical
  on every device).
- overlap (GLL-stencil) bounds: each shard scatter-min/maxes its own
  element extrema onto the GLOBAL CG node grid and the partial grids are
  combined with `lax.pmin/pmax` — the GroupCommunicator::Reduce
  equivalent.
- sparsity bounds and global scalars: all_gathered element extrema /
  psum.

Elements are Morton-ordered so each shard owns a spatially compact
contiguous block (the locality role of METIS); the permutation is
returned to the driver exactly like the structured block permutation.

Sharded and unsharded runs agree to round-off (see
tests/test_sharded_general.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .. import bounds as bnd
from .. import steppers
from ..discretization import build_discretization
from ..operator import Advection


def morton_permutation(centers: np.ndarray) -> np.ndarray:
    """perm[new] = old element id, ordered by the Morton code of the
    (quantized) element centers — spatially compact contiguous blocks."""
    c = np.asarray(centers, np.float64)
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-300)
    q = np.minimum(((c - lo) / span * 1023.0).astype(np.uint64), 1023)
    code = np.zeros(c.shape[0], np.uint64)
    for bit in range(10):
        for a in range(c.shape[1]):
            code |= ((q[:, a] >> np.uint64(bit)) & np.uint64(1)) << np.uint64(
                bit * c.shape[1] + a)
    return np.argsort(code, kind="stable")


def build_facedof_table(dofmaps, nbr_face: np.ndarray) -> np.ndarray:
    """nbr_facedof[e, f, k]: position of nbr_dof_local[e, f, k] within the
    neighbor's face-dof list bdr_dofs[nbr_face[e, f]] (0 at boundaries)."""
    bdr = np.asarray(dofmaps.bdr_dofs)          # [nf, fd]
    nf, fd = bdr.shape
    inv = np.zeros((nf, dofmaps.nd), np.int32)
    for f in range(nf):
        inv[f, bdr[f]] = np.arange(fd, dtype=np.int32)
    nd_loc = np.asarray(dofmaps.nbr_dof_local)  # [E, nf, fd]
    safe_f = np.maximum(np.asarray(nbr_face), 0)
    return inv[safe_f[:, :, None], nd_loc]


class GeneralShardedAdvection(Advection):
    """One shard of a general mesh; cross-shard access via all_gather of
    face traces + table gathers."""

    def __init__(self, disc, cfg, x0, v, inflow, nbr_elem, nbr_face,
                 nbr_facedof, cg_idx, n_cg, axis_name, bb_min, bb_max,
                 dtype=None, sub_bmask=None):
        self.bb_min = bb_min    # GLOBAL box, pre-set so init-time velocity
        self.bb_max = bb_max    # evals use it (gsharded disc keeps the
        #                         global mesh, but be explicit like sharded)
        if sub_bmask is not None:
            # per-shard slice of the global subcell boundary-velocity mask
            self._sub_bmask = sub_bmask
        super().__init__(disc, cfg, x0, v, inflow, dtype=dtype)
        self._name = axis_name
        self._nbr_elem = nbr_elem          # [E_loc, nf] GLOBAL ids (-1 bdr)
        self._nbr_face = jnp.maximum(nbr_face, 0)
        self._nbr_facedof = nbr_facedof    # [E_loc, nf, fd]
        self._cg_idx = cg_idx              # [E_loc, nd] GLOBAL CG ids
        self._n_cg = n_cg
        self.gather_nbr = self._gather_nbr_gathered

    def _gather_nbr_gathered(self, u, bdr_value=None):
        tr = u[:, self.bdr_dofs]                            # [E_loc, nf, fd]
        trg = lax.all_gather(tr, self._name, axis=0, tiled=True)
        safe = jnp.maximum(self._nbr_elem, 0)
        vals = trg[safe[:, :, None], self._nbr_face[:, :, None],
                   self._nbr_facedof]
        mask = (self._nbr_elem >= 0)[:, :, None]
        if bdr_value is None:
            return jnp.where(mask, vals, 0.0)
        return jnp.where(mask, vals, bdr_value)

    def compute_bounds(self, el_min, el_max, active_el=None):
        if self.cfg.bounds_type == 0:
            x_min, x_max = bnd.overlap_cg_minmax(
                el_min, el_max, self._cg_idx, self._n_cg, active_el)
            x_min = lax.pmin(x_min, self._name)
            x_max = lax.pmax(x_max, self._name)
            return x_min[self._cg_idx], x_max[self._cg_idx]
        # sparsity stencil: face-neighbor element extrema
        mmin = el_min if active_el is None else jnp.where(active_el, el_min,
                                                          bnd.INF)
        mmax = el_max if active_el is None else jnp.where(active_el, el_max,
                                                          -bnd.INF)
        gmin = lax.all_gather(mmin, self._name, axis=0, tiled=True)
        gmax = lax.all_gather(mmax, self._name, axis=0, tiled=True)
        safe = jnp.maximum(self._nbr_elem, 0)
        valid = self._nbr_elem >= 0
        nmin = jnp.where(valid, gmin[safe], bnd.INF).min(axis=1)
        nmax = jnp.where(valid, gmax[safe], -bnd.INF).max(axis=1)
        nd = self.disc.dofmaps.nd
        lo = jnp.minimum(el_min, nmin)
        hi = jnp.maximum(el_max, nmax)
        E = el_min.shape[0]
        return (jnp.broadcast_to(lo[:, None], (E, nd)),
                jnp.broadcast_to(hi[:, None], (E, nd)))

    def all_min(self, x):
        return lax.pmin(x, self._name)

    def all_sum_fn(self):
        return lambda x: lax.psum(x, self._name)


def structured_nbr_face(mesh) -> np.ndarray:
    """nbr_face for a structured mesh: the neighbor across face (axis, s)
    always sees us through its opposite face (axis, 1-s)."""
    from ..mesh import faces_for_dim
    faces = faces_for_dim(mesh.dim)
    opp = np.array([faces.index((a, 1 - s)) for a, s in faces], np.int32)
    return np.broadcast_to(opp, (mesh.num_elements, len(faces))).copy()


def make_general_sharded_step(mesh, scfg, order: int, n_shards: int,
                              ode_solver: int, devices=None, dtype=None):
    """(device_mesh, jitted step, perm) for a general mesh sharded into
    n_shards Morton-contiguous element blocks.  Same contract as
    parallel.sharded.make_sharded_step.

    Non-divisible element counts are handled by appending GHOST elements
    (the reference deliberately regression-tests odd rank counts, np=3,
    CMakeLists.txt:79-81): ghosts copy element 0's geometry (valid detJ),
    carry zero fields/velocity/inflow, have no neighbors, and scatter
    their bounds to a dedicated spare CG node — so they contribute exactly
    nothing to any reduction. len(perm) > E signals padding to the driver,
    which zeroes the ghost field rows (shard_arrays n_real) and unpermutes
    with perm[:E]."""
    if scfg.mono != 0 or scfg.smth_ind:
        raise NotImplementedError(
            "sharded general meshes support ho 1-3, lo 1-5, fct, "
            "bounds 0/1 (mono/smoothness-indicator paths are serial in "
            "the reference too, remhos_mono.cpp:285)")
    E = mesh.num_elements
    E_pad = ((E + n_shards - 1) // n_shards) * n_shards
    pad = E_pad - E

    disc = build_discretization(mesh, order)
    dm = disc.dofmaps
    perm = morton_permutation(mesh.element_centers())
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(E)

    # permute rows AND remap stored global element ids
    nbr_elem = np.asarray(dm.nbr_elem)[perm]
    nbr_elem = np.where(nbr_elem >= 0, inv_perm[np.maximum(nbr_elem, 0)], -1)
    nbr_face_full = getattr(mesh, "nbr_face", None)
    if nbr_face_full is None:
        nbr_face_full = structured_nbr_face(mesh)
    nbr_face = np.asarray(nbr_face_full)[perm]
    nbr_facedof = build_facedof_table(dm, np.asarray(nbr_face_full))[perm]
    cg_idx = np.asarray(dm.cg_idx)[perm]
    n_cg = dm.n_cg
    sub_bmask = None
    if scfg.lo == 4:
        # subcell boundary-velocity mask in GLOBAL context, sharded like
        # the other per-element tables (ghosts: True -> zero velocity)
        from .. import subcell as subm
        sub_bmask = np.asarray(
            subm.boundary_node_mask(mesh, disc.ref_nodes_u))[perm]
    if pad:
        nf = nbr_elem.shape[1]
        nbr_elem = np.vstack([nbr_elem, np.full((pad, nf), -1, np.int32)])
        nbr_face = np.vstack([nbr_face, np.zeros((pad, nf), np.int32)])
        nbr_facedof = np.vstack(
            [nbr_facedof, np.zeros((pad,) + nbr_facedof.shape[1:], np.int32)])
        cg_idx = np.vstack(
            [cg_idx, np.full((pad, cg_idx.shape[1]), n_cg, np.int32)])
        n_cg += 1                      # spare node absorbs ghost bounds
        if sub_bmask is not None:
            sub_bmask = np.vstack(
                [sub_bmask, np.ones((pad, sub_bmask.shape[1]), bool)])
        perm = np.concatenate([perm, np.zeros(pad, perm.dtype)])

    # per-shard Advection needs only shared tables from dofmaps; blank the
    # full-size per-element tables so nothing stale can be used silently
    dm_shared = dataclasses.replace(
        dm, nbr_elem=np.zeros((1, dm.nfaces), np.int32),
        nbr_dof_local=np.zeros((1, dm.nfaces, dm.fd), np.int32),
        cg_idx=np.zeros((1, dm.nd), np.int32))
    disc_shared = dataclasses.replace(disc, dofmaps=dm_shared)

    name = "shg"
    if devices is None:
        devices = jax.devices()[:n_shards]
    dev_mesh = Mesh(np.asarray(devices).reshape(n_shards), (name,))
    bb_min, bb_max = mesh.bb_min, mesh.bb_max

    def step_local(S, t, dt, x0, v, inflow, ne_l, nf_l, nfd_l, cg_l, bm_l):
        adv = GeneralShardedAdvection(
            disc_shared, scfg, x0, v, inflow, ne_l, nf_l, nfd_l, cg_l,
            n_cg, name, bb_min, bb_max, dtype=dtype,
            sub_bmask=bm_l if scfg.lo == 4 else None)
        if ode_solver <= 10:
            stepper = steppers.make_rk_step(adv.stage_function(), ode_solver)
        else:
            stepper = steppers.make_idp_step(adv.mult_unlimited,
                                             adv.limit_mult, ode_solver,
                                             compute_mask=adv.compute_mask,
                                             use_masks=scfg.use_masks,
                                             geometry=adv.geometry)
        S_new, ratio = stepper(S, t, dt)
        return S_new, lax.pmin(ratio, name)

    sharded = jax.shard_map(
        step_local, mesh=dev_mesh,
        in_specs=(P(None, name), P(), P(), P(name), P(name), P(name),
                  P(name), P(name), P(name), P(name), P(name)),
        out_specs=(P(None, name), P()), check_vma=False)

    ne_j = jnp.asarray(nbr_elem)
    nf_j = jnp.asarray(nbr_face)
    nfd_j = jnp.asarray(nbr_facedof)
    cg_j = jnp.asarray(cg_idx)
    bm_j = (jnp.asarray(sub_bmask) if sub_bmask is not None
            else jnp.zeros((len(perm), dm.nd), bool))

    def step(S, t, dt, x0, v, inflow):
        return sharded(S, t, dt, x0, v, inflow, ne_j, nf_j, nfd_j, cg_j,
                       bm_j)

    return dev_mesh, jax.jit(step), perm
