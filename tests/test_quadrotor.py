"""Quadrotor obstacle-avoidance end-to-end tests (reference
quadrotor/tests.jl: SCvx and GuSTO must both solve; runtests.jl:50-56).
Cross-checks: both algorithms agree on the converged cost, obstacles are
respected, boundary conditions hold, and the continuous-time replay stays
dynamically consistent."""

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.quadrotor import QuadrotorParameters, quadrotor
from scptoolbox_tpu.solvers import gusto, scvx


@pytest.fixture(scope="module")
def mdl():
    return QuadrotorParameters()


@pytest.fixture(scope="module")
def scvx_sol(mdl):
    pbm = quadrotor(mdl)
    pars = scvx.SCvxParameters(N=30, Nsub=15, lam=30.0, iter_max=15)
    return scvx.solve(pbm, pars)


@pytest.fixture(scope="module")
def gusto_sol(mdl):
    pbm = quadrotor(mdl)
    pars = gusto.GuSTOParameters(N=30, Nsub=15, iter_max=15)
    return gusto.solve(pbm, pars)


def _check_common(sol, mdl, obstacle_tol):
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas
    # boundary conditions
    assert np.allclose(sol.xd[0], np.concatenate([mdl.r0, np.zeros(3)]),
                       atol=1e-5)
    assert np.allclose(sol.xd[-1], np.concatenate([mdl.rf, np.zeros(3)]),
                       atol=1e-4)
    # obstacles respected (GuSTO: soft, small violation allowed)
    for E in mdl.obstacles():
        vals = np.array([float(E(r)) for r in sol.xd[:, :3]])
        assert vals.min() >= 1.0 - obstacle_tol, vals.min()
    # duration bounds
    assert mdl.tf_min - 1e-6 <= sol.p[0] <= mdl.tf_max + 1e-6
    # input constraints: sigma >= ||a||, bounds
    a = sol.ud[:, :3]
    sig = sol.ud[:, 3]
    assert np.all(sig >= np.linalg.norm(a, axis=1) - 1e-5)
    assert np.all(sig >= mdl.u_min - 1e-6)
    assert np.all(sig <= mdl.u_max + 1e-6)


def test_scvx_solves(scvx_sol, mdl):
    _check_common(scvx_sol, mdl, obstacle_tol=1e-5)
    check_cost("quadrotor_scvx", scvx_sol.cost)


def test_gusto_softplus_matches_quad(gusto_sol, mdl):
    """pen="softplus": the log-sum-exp EXP-cone penalty path
    (soft_penalty, reference gusto.jl:996-1031) converges to the quad-mode
    optimum within 1% (the smoothing bias shrinks with the sharpness
    `hom`)."""
    pbm = quadrotor(mdl)
    pars = gusto.GuSTOParameters(N=30, Nsub=15, iter_max=20, pen="softplus",
                                 hom=500.0, lam_init=1e3)
    sol = gusto.solve(pbm, pars)
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas
    assert sol.cost == pytest.approx(gusto_sol.cost, rel=1e-2)


def test_gusto_solves(gusto_sol, mdl):
    _check_common(gusto_sol, mdl, obstacle_tol=5e-3)
    check_cost("quadrotor_gusto", gusto_sol.cost)


def test_scvx_gusto_agree(scvx_sol, gusto_sol):
    """Two independent algorithms must find the same optimum (the
    reference's cross-algorithm coverage, runtests.jl:50-56)."""
    assert scvx_sol.cost == pytest.approx(gusto_sol.cost, rel=1e-2)
    assert np.max(np.abs(scvx_sol.xd - gusto_sol.xd)) < 0.1


def test_continuous_replay(scvx_sol):
    """Propagated continuous trajectory ends near the target (dynamic
    feasibility of the converged solution)."""
    rf_err = np.linalg.norm(scvx_sol.x_cont[-1][:3] - scvx_sol.xd[-1][:3])
    assert rf_err < 0.05
