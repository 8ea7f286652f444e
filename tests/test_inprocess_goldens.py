"""The reference's in-process regression goldens (remhos_tests.cpp:38-107):
final masses recorded to 16 digits for 5-step auto-dt remap runs, asserted
at 10*eps relative tolerance in the reference. We assert at 1e-12 (FA runs
match at ~1e-15; PA runs go through the iterative GL mass inverse).

All eight structured/curved rows are covered (star-q2 via the curved
H1-quadratic general-mesh loader).
"""

import pytest

from remhos_tpu.config import RunConfig
from remhos_tpu.driver import run

CASES = [
    ("t0", dict(mesh="inline-quad", problem=14, rs_levels=1, order=2),
     0.09711395400387984, 1e-12),
    ("t3", dict(mesh="cube01_hex", problem=10, rs_levels=1, order=2),
     0.11972857593296446, 1e-12),
    ("t4-pa", dict(mesh="inline-quad", problem=14, rs_levels=1, order=2,
                   pa=True),
     0.09711395400387984, 1e-11),
]

SLOW_CASES = [
    ("t8-star-q2",
     dict(mesh="/root/reference/data/star-q2.mesh", problem=14, rs_levels=1,
          order=3, pa=True),
     0.8069675186775516, 1e-11),
    ("t1", dict(mesh="inline-quad", problem=14, rs_levels=4, order=3),
     0.0930984399257905, 1e-12),
    ("t2", dict(mesh="inline-quad", problem=14, rs_levels=4, order=4),
     0.09237630484178257, 1e-12),
    ("t5-pa", dict(mesh="inline-quad", problem=14, rs_levels=4, order=2,
                   pa=True),
     0.09185717760402806, 1e-11),
    ("t7-pa3d", dict(mesh="cube01_hex", problem=10, rs_levels=3, order=3,
                     pa=True, max_tsteps=1),
     0.11601536511552431, 1e-11),
]


@pytest.mark.parametrize("name,kw,golden,tol", CASES)
def test_inprocess_golden(name, kw, golden, tol):
    kw = dict(kw)
    ms = kw.pop("max_tsteps", 5)
    r = run(RunConfig(dt=-1.0, t_final=0.5, ho=3, lo=5, fct=2,
                      max_tsteps=ms, verbose=False, **kw))
    assert abs(r.final_mass_u - golden) / abs(golden) < tol, \
        f"{name}: {r.final_mass_u!r} vs {golden!r}"


@pytest.mark.slow
@pytest.mark.parametrize("name,kw,golden,tol", SLOW_CASES)
def test_inprocess_golden_slow(name, kw, golden, tol):
    import os
    kw = dict(kw)
    if kw["mesh"].endswith(".mesh") and not os.path.exists(kw["mesh"]):
        pytest.skip("reference mesh data not available")
    ms = kw.pop("max_tsteps", 5)
    r = run(RunConfig(dt=-1.0, t_final=0.5, ho=3, lo=5, fct=2,
                      max_tsteps=ms, verbose=False, **kw))
    assert abs(r.final_mass_u - golden) / abs(golden) < tol, \
        f"{name}: {r.final_mass_u!r} vs {golden!r}"
