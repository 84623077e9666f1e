"""Per-iteration timing parity: all three solvers report the reference's
per-subproblem timing keys {formulate, discretize, solve, total, overhead}
when timing_detail is set (scp.jl:990-995; ptr.jl:220)."""

import pytest

from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.solvers import gusto, ptr, scvx

KEYS = {"formulate", "discretize", "solve", "total", "overhead"}


def _check(history):
    assert history, "no iterations recorded"
    t = history[0].timing
    assert set(t) == KEYS, t
    assert t["total"] > 0
    assert t["solve"] > 0
    assert t["formulate"] > 0


@pytest.fixture(scope="module")
def pbm():
    return double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                        s=30.0))


def test_ptr_timing_detail(pbm):
    sol = ptr.solve(pbm, ptr.PTRParameters(N=15, Nsub=5, iter_max=3,
                                           wvc=1e3, wtr=5e-3,
                                           timing_detail=True))
    _check(sol.history)


def test_scvx_timing_detail(pbm):
    sol = scvx.solve(pbm, scvx.SCvxParameters(N=15, Nsub=5, iter_max=3,
                                              timing_detail=True))
    _check(sol.history)


def test_gusto_timing_detail(pbm):
    sol = gusto.solve(pbm, gusto.GuSTOParameters(N=15, Nsub=5, iter_max=3,
                                                 timing_detail=True))
    _check(sol.history)
