"""Independent parity anchors: physical/analytic assertions that a drifted
cost pin could not satisfy by luck (VERDICT r4 ask; complements the
Pontryagin double-integrator cross-check in test_lcvx.py and the LCvx
losslessness certificates in test_rocket_landing.py).

  * SCP fixed point: re-solving one subproblem AT a converged solution
    must return (numerically) the same trajectory with inactive virtual
    controls — the discrete first-order optimality condition of the SCP
    scheme itself (reference stopping theory, scp.jl:909-931).
  * Obstacle tangency: the optimal quadrotor path GRAZES a keep-out
    ellipsoid (the unconstrained straight line is infeasible, so the
    constraint is active at the optimum; reference quadrotor
    parameters.jl:115-117).
  * Cost/propagation consistency: the reported cost equals the trapz
    running-cost integral of the discrete trajectory AND (within
    discretization error) of the RK4-propagated continuous replay —
    drift-proof bookkeeping between solver internals and physics.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.models.quadrotor import QuadrotorParameters, quadrotor
from scptoolbox_tpu.solvers import ptr, scvx


@pytest.fixture(scope="module")
def quad_sol():
    mdl = QuadrotorParameters()
    pbm = quadrotor(mdl)
    pars = scvx.SCvxParameters(N=30, Nsub=15, lam=30.0, iter_max=15)
    return mdl, pbm, scvx.solve(pbm, pars)


def test_quadrotor_obstacle_tangency(quad_sol):
    """At least one obstacle constraint is ACTIVE at the optimum (the
    straight line r0 -> rf crosses the keep-out set, so any optimal path
    must graze a boundary; a detoured-but-feasible wrong answer would
    leave all obstacles inactive)."""
    mdl, _, sol = quad_sol
    assert sol.status == SCPStatus.SOLVED
    min_margin = np.inf
    for E in mdl.obstacles():
        vals = np.array([float(E(r)) for r in sol.xd[:, :3]])
        min_margin = min(min_margin, vals.min() - 1.0)
    # active within solver tolerance, never violated beyond it
    assert abs(min_margin) < 5e-3, min_margin


def test_quadrotor_cost_consistency(quad_sol):
    """sol.cost == trapz(running cost at the discrete solution); and the
    continuous-time RK4 replay (x_cont with FOH-interpolated u) yields the
    same integral within discretization error."""
    mdl, pbm, sol = quad_sol
    N = len(sol.t_grid)
    run = lambda t, k, x, u: float(pbm.running_cost(t, k, x, u, sol.p))
    vals = np.array([run(sol.t_grid[k], k, sol.xd[k], sol.ud[k])
                     for k in range(N)])
    J_disc = np.trapezoid(vals, sol.t_grid)
    assert sol.cost == pytest.approx(J_disc, rel=1e-6)

    # continuous replay: FOH-interpolate u onto the fine grid
    tc = sol.t_cont
    u_c = np.stack([np.interp(tc, sol.t_grid, sol.ud[:, i])
                    for i in range(sol.ud.shape[1])], axis=1)
    vals_c = np.array([run(tc[i], 0, sol.x_cont[i], u_c[i])
                       for i in range(len(tc))])
    J_cont = np.trapezoid(vals_c, tc)
    assert J_cont == pytest.approx(J_disc, rel=2e-2)


def test_scp_fixed_point():
    """A converged PTR solution is a fixed point of the SCP map: one more
    subproblem solved AROUND it moves the iterate by less than the stopping
    tolerance and carries negligible virtual control (first-order
    optimality of the SCP scheme — a wrong 'converged' trajectory would
    move)."""
    pbm = double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                       s=30.0))
    pars = ptr.PTRParameters(N=25, Nsub=12, iter_max=20, wvc=1e3, wtr=5e-3,
                             eps_rel=1e-5, eps_abs=1e-7)
    S = ptr.PTR(pbm, pars)
    sol = S.solve()
    assert sol.status == SCPStatus.SOLVED and sol.feas

    x = jnp.asarray(sol.xd, S.dtype)
    u = jnp.asarray(sol.ud, S.dtype)
    p = jnp.asarray(sol.p, S.dtype)
    dltv = S._discretize(x, u, p)
    out = S._step(x, u, p, dltv, jnp.asarray(np.inf, S.dtype), S.consts)
    # the next iterate stays put (the solve stops on the relative-cost
    # criterion, so the residual motion sits at the sub-1e-4 level; a
    # non-converged trajectory moves by O(1e-1..1) in these scaled units)
    assert float(out["deviation"]) < 1e-4
    # virtual controls inactive at the fixed point
    assert float(out["vd_norm"]) < 1e-6
    assert float(out["vs_norm"]) < 1e-6
    # and the augmented cost equals the original cost up to the small
    # trust-region penalty: no hidden constraint violation is being paid
    assert float(out["J_aug"]) == pytest.approx(float(out["J_orig"]),
                                                abs=1e-3)
