"""The driver-contract entry points must compile and run."""

import sys

import jax
import pytest


sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == args[0].shape


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
