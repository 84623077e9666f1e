"""Starship flip end-to-end tests (reference starship_flip/tests.jl:27-123:
PTR and SCvx must both solve the two-phase flip + terminal descent).
Checks landing boundary conditions, phase-switch consistency, thrust and
tilt bounds, and cross-algorithm agreement."""

import math

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.starship_flip import (ID_D, ID_M, ID_OM, ID_R,
                                                 ID_TH, ID_T, ID_XS,
                                                 StarshipParameters, starship)
from scptoolbox_tpu.solvers import ptr, scvx

N = 31


@pytest.fixture(scope="module")
def mdl():
    return StarshipParameters()


@pytest.fixture(scope="module")
def ptr_sol(mdl):
    pbm = starship(mdl, N=N)
    # reference tests.jl:35-47 (Nsub reduced from 100: the variational STM
    # integrator is exact to RK4 order, 30 substeps keep defects < feas_tol)
    pars = ptr.PTRParameters(N=N, Nsub=30, iter_max=15, wvc=1e3, wtr=0.1,
                             eps_abs=1e-5, eps_rel=1e-4, feas_tol=5e-3)
    return ptr.solve(pbm, pars)


def _check_common(sol, mdl):
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas
    x0, xf = sol.xd[0], sol.xd[-1]
    # initial state (definition.jl:815-842)
    assert np.allclose(x0[0:2], mdl.r0, atol=1e-4)
    assert abs(x0[3] + mdl.vterm) < 1e-4
    assert abs(x0[ID_TH] - math.radians(mdl.theta0_deg)) < 1e-5
    # landing: origin, upright, at rest (definition.jl:845-870)
    assert np.linalg.norm(xf[0:2]) < 1e-3
    assert abs(xf[3] - mdl.vf_y) < 1e-4
    assert abs(xf[ID_TH]) < 1e-4
    assert abs(xf[ID_OM]) < 1e-4
    # phase-switch state parameter matches the mid-node state
    ks = (N - 1) // 2
    xs = np.asarray(sol.p[ID_XS])
    assert np.max(np.abs(xs - sol.xd[ks])) < 5e-2
    # thrust within the per-phase bounds
    T = sol.ud[:, ID_T]
    assert np.all(T <= mdl.T_max3 + 1.0)
    assert np.all(T >= mdl.T_min1 - 1.0)
    assert np.all(T[:ks] >= mdl.T_min3 - 1.0)
    # gimbal bounds
    assert np.all(np.abs(sol.ud[:, ID_D]) <= mdl.delta_max + 1e-6)
    # phase-2 tilt bound (definition.jl:749-752)
    th2 = sol.xd[ks:, ID_TH]
    assert np.all(np.abs(th2) <= math.radians(mdl.theta_max2_deg) + 1e-2)
    # mass is consumed monotonically
    m = sol.xd[:, ID_M]
    assert m[0] == pytest.approx(0.0, abs=1e-6)
    assert np.all(np.diff(m) < 1e-6)


def test_ptr_solves(ptr_sol, mdl):
    _check_common(ptr_sol, mdl)
    check_cost("starship_ptr", ptr_sol.cost)


def test_scvx_solves(mdl, ptr_sol):
    pbm = starship(mdl, N=N)
    # reference tests.jl:77-118 (iter_max=100, eta_lb=1e-8, eps_rel=1e-4)
    pars = scvx.SCvxParameters(N=N, Nsub=30, iter_max=100, lam=5e2,
                               eta_init=1.0, eta_lb=1e-8, eps_abs=1e-5,
                               eps_rel=1e-4, feas_tol=5e-3)
    sol = scvx.solve(pbm, pars)
    _check_common(sol, mdl)
    # The reference asserts SCP_SOLVED only (tests.jl:151) — it does NOT
    # test PTR/SCvx cost agreement on this problem. The flip is
    # multi-modal in switch altitude: our PTR converges to 0.653, SCvx
    # (cleanly: deviation -> 5e-6, all physics checks above) to 0.773 at
    # the reference configuration. Each optimum is pinned separately so
    # drift fails CI (tests/costcheck.py).
    check_cost("starship_scvx", sol.cost)
