"""The driver's gates, run VERBATIM as tests.

Round-2 lesson: the multichip dryrun (``__graft_entry__.dryrun_multichip``)
went red while ``tests/test_sharded.py`` stayed green, because the test
matrix never ran the dryrun's exact configuration (viscous wing, one RK
step first, CFL 5, float32, SA turb_res_scale). These tests import the
graft entry module and execute its exact code paths so the driver can never
go red without a test going red first.

Reference analogue: ADflow's regression suite runs the same configurations
the docs advertise (`/root/reference/tests/reg_tests/test_solve.py`).
"""

import numpy as np
import pytest

import __graft_entry__ as ge


@pytest.mark.slow
def test_dryrun_multichip_verbatim():
    """The exact driver gate: 8-way sharded RK + ANK + adjoint matvec."""
    ge.dryrun_multichip(8)  # raises AssertionError on non-finite stats


def test_dryrun_multichip_2way():
    """Cheap smoke of the same code path on 2 devices: catches config
    regressions (scaling, physics guards) in minutes rather than the full
    8-way compile."""
    ge.dryrun_multichip(2)


def test_entry_compiles_and_is_finite():
    import jax

    fn, args = ge.entry()
    r = jax.jit(fn)(*args)
    r.block_until_ready()
    assert np.all(np.isfinite(np.asarray(r)))
