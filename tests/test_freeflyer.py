"""6-DoF freeflyer end-to-end tests (reference freeflyer/tests.jl: SCvx and
GuSTO must both solve; runtests.jl:57-63). Checks boundary conditions,
quaternion unit norm, speed/rate/actuation SOC bounds, obstacle keep-out,
and station-interior (room SDF) containment."""

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.freeflyer import FreeFlyerParameters, freeflyer
from scptoolbox_tpu.solvers import scvx

N = 30  # reference runs N=50; reduced for the 2-core CPU suite


@pytest.fixture(scope="module")
def mdl():
    return FreeFlyerParameters()


@pytest.fixture(scope="module")
def scvx_sol(mdl):
    pbm = freeflyer(mdl, N=N)
    # reference tests.jl:36-76 (lambda = 1e3, eta_lb = 1e-6); the reference
    # runs eps = 0 and spends all 15 iterations at N=50 — at N=30 the same
    # tolerance-based stop converges in ~27
    pars = scvx.SCvxParameters(N=N, Nsub=10, lam=1e3, iter_max=30,
                               eta_lb=1e-6, eps_abs=1e-5, eps_rel=1e-4,
                               feas_tol=1e-3)
    return scvx.solve(pbm, pars)


def test_solves(scvx_sol, mdl):
    sol = scvx_sol
    assert sol.status == SCPStatus.SOLVED
    check_cost("freeflyer_scvx", sol.cost)
    assert sol.feas
    # boundary conditions (definition.jl:456-517)
    assert np.allclose(sol.xd[0][:3], mdl.r0, atol=1e-5)
    assert np.allclose(sol.xd[-1][:3], mdl.rf, atol=1e-4)
    assert np.allclose(sol.xd[-1][3:6], mdl.vf, atol=1e-5)
    q0 = np.asarray(mdl.q0())
    qf = np.asarray(mdl.qf())
    assert min(np.linalg.norm(sol.xd[0][6:10] - q0),
               np.linalg.norm(sol.xd[0][6:10] + q0)) < 1e-5
    assert min(np.linalg.norm(sol.xd[-1][6:10] - qf),
               np.linalg.norm(sol.xd[-1][6:10] + qf)) < 1e-4
    # flight time within bounds
    assert mdl.tf_min - 1e-6 <= sol.p[0] <= mdl.tf_max + 1e-6


def test_quaternion_norm(scvx_sol):
    """Unit-quaternion attitude along the discrete AND propagated
    trajectories (integration action, definition.jl:69-82). The discrete
    iterate is unit-norm only up to the converged defect level (feas_tol);
    the propagated trajectory is renormalized every RK4 substep."""
    qn = np.linalg.norm(scvx_sol.xd[:, 6:10], axis=1)
    assert np.allclose(qn, 1.0, atol=1e-3)
    qn_c = np.linalg.norm(scvx_sol.x_cont[:, 6:10], axis=1)
    assert np.allclose(qn_c, 1.0, atol=1e-6)


def test_limits(scvx_sol, mdl):
    sol = scvx_sol
    assert np.all(np.linalg.norm(sol.xd[:, 3:6], axis=1)
                  <= mdl.v_max + 1e-6)
    assert np.all(np.linalg.norm(sol.xd[:, 10:13], axis=1)
                  <= mdl.omega_max + 1e-6)
    assert np.all(np.linalg.norm(sol.ud[:, 0:3], axis=1)
                  <= mdl.T_max + 1e-8)
    assert np.all(np.linalg.norm(sol.ud[:, 3:6], axis=1)
                  <= mdl.M_max + 1e-8)


def test_obstacles_and_rooms(scvx_sol, mdl):
    """Ellipsoid keep-out and station-interior containment
    (definition.jl:384-403)."""
    r = scvx_sol.xd[:, :3]
    for E in mdl.obstacles():
        vals = np.array([float(E(rk)) for rk in r])
        assert vals.min() >= 1.0 - 1e-4, vals.min()
    rooms = mdl.rooms()
    inside_any = np.zeros(len(r), dtype=bool)
    for R in rooms:
        l, u = np.asarray(R.l), np.asarray(R.u)
        inside_any |= np.all((r >= l - 5e-2) & (r <= u + 5e-2), axis=1)
    assert inside_any.all()
