"""End-to-end PTR tests on the double integrator (the minimum slice:
reference test strategy solves full problems and asserts SCP_SOLVED,
test/runtests.jl:31-79; here we additionally cross-check the convex variant
against the controllability-Gramian minimum-energy optimum, in the spirit of
the reference's Pontryagin cross-check, double_integrator/definition.jl:137)."""

import numpy as np
import pytest

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.solvers import ptr


def min_energy_oracle(T, g, s, n_quad=20001):
    """Minimum-energy transfer for xdot = A x + B u, A = [[0,1],[0,-g]]:
    u*(t) = B' e^{A'(T-t)} G^{-1} d,  J* = d' G^{-1} d, via fine quadrature."""
    from scipy.linalg import expm

    A = np.array([[0.0, 1.0], [0.0, -g]])
    B = np.array([[0.0], [1.0]])
    ts = np.linspace(0.0, T, n_quad)
    Phis = np.stack([expm(A * (T - t)) for t in ts])  # e^{A(T-t)}
    integrand = Phis @ B @ B.T @ Phis.transpose(0, 2, 1)
    G = np.trapezoid(integrand, ts, axis=0)
    d = np.array([s, 0.0])  # x0 = 0, xf = (s, 0)
    lam = np.linalg.solve(G, d)
    J_star = d @ lam

    def u_star(t):
        return (B.T @ expm(A.T * (T - t)) @ lam)[0]

    return J_star, u_star


@pytest.fixture(scope="module")
def convex_solution():
    mdl = DoubleIntegratorParameters(drag=False)
    pbm = double_integrator(mdl)
    pars = ptr.PTRParameters(N=31, Nsub=15, wvc=1e3, wtr=5e-3,
                             eps_rel=1e-5, eps_abs=1e-6)
    sol = ptr.solve(pbm, pars)
    return mdl, pars, sol


def test_convex_converges(convex_solution):
    _, pars, sol = convex_solution
    assert sol.status == SCPStatus.SOLVED
    assert sol.status_str == "SCP_SOLVED"
    assert sol.feas
    assert sol.history[-1].defect_norm <= pars.feas_tol


def test_convex_matches_gramian_oracle(convex_solution):
    mdl, _, sol = convex_solution
    J_star, u_star = min_energy_oracle(mdl.T, mdl.g, mdl.s)
    assert sol.cost == pytest.approx(J_star, rel=2e-2)
    # control trajectory matches the analytic minimum-energy control
    ts = sol.t_grid * mdl.T
    u_ref = np.array([u_star(t) for t in ts])
    err = np.max(np.abs(sol.ud[:, 0] - u_ref)) / np.max(np.abs(u_ref))
    assert err < 5e-2


def test_convex_boundary_conditions(convex_solution):
    mdl, _, sol = convex_solution
    assert np.allclose(sol.xd[0], [0.0, 0.0], atol=1e-5)
    assert np.allclose(sol.xd[-1], [mdl.s, 0.0], atol=1e-4)
    assert np.all(np.abs(sol.ud) <= mdl.u_max + 1e-6)
    # continuous-time replay reaches the target (dynamic feasibility)
    assert np.allclose(sol.x_cont[-1], [mdl.s, 0.0], atol=0.3)


def test_nonconvex_drag_converges():
    mdl = DoubleIntegratorParameters(drag=True, g=0.01, s=30.0)
    pbm = double_integrator(mdl)
    pars = ptr.PTRParameters(N=31, Nsub=15, wvc=1e3, wtr=5e-3)
    sol = ptr.solve(pbm, pars)
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas
    assert np.allclose(sol.xd[-1], [mdl.s, 0.0], atol=1e-3)
    assert np.allclose(sol.x_cont[-1], [mdl.s, 0.0], atol=0.3)
    # virtual controls vanish at convergence
    assert sol.history[-1].vd_norm < 1e-5


@pytest.mark.parametrize("q_tr", [1.0, 2.0, 4.0, float("inf")])
def test_trust_region_norms(q_tr):
    """All four trust-region norms (ptr.jl q_tr in {1,2,4,inf}) solve."""
    mdl = DoubleIntegratorParameters(drag=False)
    pbm = double_integrator(mdl)
    pars = ptr.PTRParameters(N=21, Nsub=10, wvc=1e3, wtr=5e-3, q_tr=q_tr,
                             iter_max=20)
    sol = ptr.solve(pbm, pars)
    assert sol.status == SCPStatus.SOLVED, f"q_tr={q_tr}"
    J_star, _ = min_energy_oracle(mdl.T, mdl.g, mdl.s)
    assert sol.cost == pytest.approx(J_star, rel=5e-2)


def test_timing_detail():
    """Per-iteration timing split with the reference's keys
    {formulate, discretize, solve, total, overhead} (scp.jl:990-995)."""
    from scptoolbox_tpu.models.double_integrator import double_integrator
    from scptoolbox_tpu.solvers import ptr as ptr_mod

    pbm = double_integrator()
    pars = ptr_mod.PTRParameters(N=12, Nsub=6, iter_max=3,
                                 timing_detail=True)
    sol = ptr_mod.solve(pbm, pars)
    for rec in sol.history:
        for key in ("formulate", "discretize", "solve", "total", "overhead"):
            assert key in rec.timing
        assert rec.timing["total"] > 0
        assert (rec.timing["formulate"] + rec.timing["solve"]
                + rec.timing["discretize"]) <= rec.timing["total"] + 1e-9
