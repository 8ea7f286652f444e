"""remhos_tpu: a TPU-native high-order DG advection/remap framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
CEED/Remhos miniapp: monotonic, conservative transport and remap of
high-order DG fields via the HO/LO/FCT triad, monolithic limiters, and
product-field synchronization — redesigned as batched tensor programs over
``[E, nd]`` arrays, sharded over TPU meshes with collective-permute halo
exchange instead of MPI.
"""

__version__ = "0.1.0"


def enable_f64():
    """Enable float64 (required to reproduce the reference goldens)."""
    import jax

    jax.config.update("jax_enable_x64", True)
