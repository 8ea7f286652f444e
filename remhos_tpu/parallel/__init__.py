"""Distributed execution: element-sharded SPMD over a TPU mesh.

Replaces the reference's MPI domain decomposition (ParMesh + METIS +
ExchangeFaceNbrData + GroupCommunicator, SURVEY.md §2c) with
jax.sharding + shard_map: elements are block-partitioned along the
mesh's last axis over the device mesh; DG face coupling needs only a
one-element-deep halo, exchanged with jax.lax.ppermute over ICI; global
scalars use psum/pmin/pmax.
"""
