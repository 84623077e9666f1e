"""GuSTO structured running cost u'S u + ell'u + g (reference
problem.jl:365-418 :gusto branch; gusto.jl:570-707 linearize-if-nonconvex):
synthesis semantics, parity with a plain scalar running cost, and
end-to-end convergence of the nonconvex-term path to the optimum of its
hand-convexified equivalent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.parser.problem import (GuSTORunningCost,
                                           make_gusto_running_cost)
from scptoolbox_tpu.solvers import gusto


def test_gusto_cost_synthesis_semantics():
    """Value exact everywhere; nonconvex terms have zero AD Hessian and
    exact gradient (the reference's first-order expansions, uSu1/ull1/g1,
    gusto.jl:583-672); convex terms keep their curvature."""
    nx, nu, npp = 2, 2, 1
    S0 = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])

    spec = GuSTORunningCost(
        S=lambda t, k, p: S0 * (1.0 + p[0]), S_cvx=False,
        ell=lambda t, k, x, p: jnp.asarray([x[0] ** 2, x[1]]), ell_cvx=False,
        g=lambda t, k, x, p: x[0] ** 2 + 3.0 * x[1], g_cvx=True)
    run = make_gusto_running_cost(spec, nx, nu)

    x = jnp.asarray([1.2, -0.7])
    u = jnp.asarray([0.4, 0.9])
    p = jnp.asarray([0.3])

    # exact value: u'S(p)u + ell(x)'u + g(x)
    want = (u @ (S0 * 1.3) @ u
            + jnp.asarray([x[0] ** 2, x[1]]) @ u + x[0] ** 2 + 3.0 * x[1])
    got = run(0.0, 0, x, u, p)
    assert float(got) == pytest.approx(float(want), rel=1e-12)

    d0 = jnp.concatenate([x, u, p])

    def scalar(d):
        return run(0.0, 0, d[:nx], d[nx:nx + nu], d[nx + nu:])

    # gradient exact vs the unwrapped cost
    def exact(d):
        xx, uu, pp = d[:nx], d[nx:nx + nu], d[nx + nu:]
        return (uu @ (S0 * (1.0 + pp[0])) @ uu
                + jnp.asarray([xx[0] ** 2, xx[1]]) @ uu
                + xx[0] ** 2 + 3.0 * xx[1])

    np.testing.assert_allclose(np.asarray(jax.grad(scalar)(d0)),
                               np.asarray(jax.grad(exact)(d0)),
                               rtol=1e-10)
    # Hessian: only the convex g term's curvature (2 wrt x0) survives
    H = np.asarray(jax.hessian(scalar)(d0))
    H_want = np.zeros((5, 5))
    H_want[0, 0] = 2.0
    np.testing.assert_allclose(H, H_want, atol=1e-10)

    # flipping S to convex restores its curvature in u
    spec_c = GuSTORunningCost(S=lambda t, k, p: S0, S_cvx=True)
    run_c = make_gusto_running_cost(spec_c, nx, nu)

    def scalar_c(d):
        return run_c(0.0, 0, d[:nx], d[nx:nx + nu], d[nx + nu:])

    H_c = np.asarray(jax.hessian(scalar_c)(d0))
    np.testing.assert_allclose(H_c[nx:nx + nu, nx:nx + nu],
                               2.0 * np.asarray(S0), atol=1e-10)


def _solve_gusto(pbm, **kw):
    pars = gusto.GuSTOParameters(N=15, Nsub=8, iter_max=20,
                                 eta_init=5.0, **kw)
    return gusto.GuSTO(pbm, pars).solve()


def test_gusto_structured_cost_parity():
    """gusto_cost S-form == plain running_cost on the double integrator:
    identical problem, identical converged solution."""
    import dataclasses

    mdl = DoubleIntegratorParameters()
    plain = double_integrator(mdl)
    structured = dataclasses.replace(
        plain, running_cost=None,
        gusto_cost=GuSTORunningCost(
            S=lambda t, k, p: mdl.T * jnp.eye(1), S_cvx=True))
    sol_a = _solve_gusto(plain)
    sol_b = _solve_gusto(structured)
    assert sol_a.status == SCPStatus.SOLVED, sol_a.status
    assert sol_b.status == SCPStatus.SOLVED, sol_b.status
    assert float(sol_b.cost) == pytest.approx(float(sol_a.cost), rel=1e-6)
    np.testing.assert_allclose(np.asarray(sol_b.ud), np.asarray(sol_a.ud),
                               atol=1e-5)


def test_gusto_structured_nonconvex_converges():
    """A g term flagged NONCONVEX (forced through the linearize-at-
    reference path) converges to the same optimum as the identical term
    flagged convex — the hand-convexified equivalent (the term is secretly
    convex, so the convex flag gives the exact answer)."""
    import dataclasses

    mdl = DoubleIntegratorParameters()
    base = double_integrator(mdl)

    def g_track(t, k, x, p):
        # quadratic tracking of the straight-line position profile
        return 0.02 * (x[0] - mdl.s * t) ** 2

    mk = lambda cvx: dataclasses.replace(
        base, running_cost=None,
        gusto_cost=GuSTORunningCost(
            S=lambda t, k, p: mdl.T * jnp.eye(1), S_cvx=True,
            g=g_track, g_cvx=cvx))
    sol_cvx = _solve_gusto(mk(True))
    sol_lin = _solve_gusto(mk(False), eps_rel=1e-5)
    assert sol_cvx.status == SCPStatus.SOLVED, sol_cvx.status
    assert sol_lin.status == SCPStatus.SOLVED, sol_lin.status
    assert float(sol_lin.cost) == pytest.approx(float(sol_cvx.cost),
                                                rel=1e-2)
