"""Lossless-convexification double integrator (reference
test/examples/double_integrator/: definition.jl:38-115 `solve_lcvx`,
:137-294 `solve_mp` Pontryagin shooting cross-check, parameters.jl:48-85).

The nonconvex input annulus 1 <= |u| <= 2 (thrust fighting a constant
gravity-like term g) is relaxed via the LCvx slack sigma: |u| <= sigma,
1 <= sigma <= 2, minimizing sum(sigma^2) dt — lossless, so the relaxed
optimum satisfies |u| = sigma. Built directly on the ConicProgram modeling
layer (no SCP loop), with exact FOH discretization from matrix-exponential
integrals (utils.linsys.c2d_foh).

`solve_mp` reproduces the reference's analytic cross-check: the Pontryagin
adjoint for this problem is linear, p(t) = c (t - ts); the optimal input is a
piecewise map of p; (c, ts) are found by iterative grid search shooting to
the terminal condition.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops.ipm import IPMStatus
from scptoolbox_tpu.parser.problem import l1, nonpos, zero
from scptoolbox_tpu.parser.program import ConicProgram
from scptoolbox_tpu.utils.linsys import c2d_foh, c2d_zoh


@dataclasses.dataclass(frozen=True)
class LCvxDoubleIntegratorParameters:
    """Model parameters (reference double_integrator/parameters.jl:48-85):
    choice 1 -> g=0.1, s=47; choice 2 -> g=0.6, s=30."""

    choice: int = 1
    T: float = 10.0
    N: int = 50

    @property
    def g(self) -> float:
        return 0.1 if self.choice == 1 else 0.6

    @property
    def s(self) -> float:
        return 47.0 if self.choice == 1 else 30.0


class LCvxSolution(NamedTuple):
    t: np.ndarray     # (N,)
    x: np.ndarray     # (N, 2)
    u: np.ndarray     # (N,)
    sigma: np.ndarray
    cost: float
    status: int


def build_program(mdl: LCvxDoubleIntegratorParameters) -> ConicProgram:
    """Assemble the LCvx conic program (reference definition.jl:38-103)."""
    N, T, g, s = mdl.N, mdl.T, mdl.g, mdl.s
    dt = T / (N - 1)
    A = jnp.asarray([[0.0, 1.0], [0.0, 0.0]])
    B = jnp.asarray([[0.0], [1.0]])
    Ad, Bm, Bp = c2d_foh(A, B, dt)
    # constant forcing [0, -g]: exact ZOH integral of the drift term
    _, wd = c2d_zoh(A, jnp.asarray([[0.0], [-g]]), dt)
    wd = wd[:, 0]

    prg = ConicProgram()
    x = prg.variable("x", N, 2)
    u = prg.variable("u", N)
    sig = prg.variable("sigma", N)

    prg.add_constraint("ic", lambda x: [zero(x[0])], (x,))
    prg.add_constraint(
        "tc", lambda x: [zero(x[-1] - jnp.asarray([s, 0.0]))], (x,))
    prg.add_constraint(
        "dyn",
        lambda x, u: [zero(
            (x[1:] - x[:-1] @ Ad.T - u[:-1, None] * Bm[None, :, 0]
             - u[1:, None] * Bp[None, :, 0] - wd[None, :]).reshape(-1))],
        (x, u))
    # sigma in [1, 2]; |u| <= sigma (LCvx relaxation, definition.jl:69-84)
    prg.add_constraint(
        "sigma_bounds",
        lambda sig: [nonpos(jnp.concatenate([sig - 2.0, 1.0 - sig]))],
        (sig,))
    prg.add_constraint(
        "lcvx",
        lambda u, sig: [nonpos(jnp.concatenate([u - sig, -u - sig]))],
        (u, sig))
    # min sum(sigma^2) dt (definition.jl:100-103; quadratic epigraph
    # replaces the reference's GEOM-cone sigma^2 variable)
    prg.add_cost(lambda sig: jnp.sum(sig ** 2) * dt, (sig,))
    prg.scale(x, jnp.asarray([max(s, 1.0), 10.0]), jnp.asarray([0.0, 0.0]))
    prg.build()
    return prg


def solve_lcvx(mdl: LCvxDoubleIntegratorParameters = LCvxDoubleIntegratorParameters()) -> LCvxSolution:
    """Solve the LCvx relaxation (reference definition.jl:38-115)."""
    prg = build_program(mdl)
    sol = prg.solve()
    t = np.linspace(0.0, mdl.T, mdl.N)
    return LCvxSolution(
        t=t, x=np.asarray(sol.values["x"]), u=np.asarray(sol.values["u"]),
        sigma=np.asarray(sol.values["sigma"]), cost=float(sol.obj),
        status=int(sol.status))


# ---------------------------------------------------------------------------
# Pontryagin maximum-principle analytic solution (shooting + grid search)
# ---------------------------------------------------------------------------


def mp_input(p: float) -> float:
    """Optimal input from the adjoint (reference definition.jl:313-330):
    u* minimizes sigma^2 subject to 1<=|u|<=2 given the switching function."""
    if p > 4:
        return 2.0
    if p >= 2:
        return p / 2
    if p >= 0:
        return 1.0
    if p >= -2:
        return -1.0
    if p >= -4:
        return p / 2
    return -2.0


def _mp_sim(T, g, s, c, ts, n_sub=100):
    """Shoot with adjoint p(t) = c (t - ts) (reference definition.jl:346-385)."""
    t_crit = [ts + a / c for a in (4.0, 2.0, 0.0, -2.0, -4.0)]
    t_crit = [tc for tc in t_crit if 0.0 <= tc <= T]
    knots = [0.0] + sorted(t_crit) + [T]
    ts_all, xs_all = [], []
    x = np.zeros(2)
    for lo, hi in zip(knots[:-1], knots[1:]):
        grid = np.linspace(lo, hi, n_sub)
        # u(p) is discontinuous only at p = 0 (u: -1 -> +1); evaluating at a
        # segment knot can land on the wrong side of the jump, degrading RK4
        # to O(h). Freeze the band from the segment midpoint.
        p_mid = c * ((lo + hi) / 2 - ts)
        for t0, t1 in zip(grid[:-1], grid[1:]):
            h = t1 - t0

            def fdot(t, xx):
                p = c * (t - ts)
                u = mp_input(p if p * p_mid > 0 or p_mid == 0
                             else np.copysign(1e-12, p_mid))
                return np.array([xx[1], u - g])

            k1 = fdot(t0, x)
            k2 = fdot(t0 + h / 2, x + h / 2 * k1)
            k3 = fdot(t0 + h / 2, x + h / 2 * k2)
            k4 = fdot(t1, x + h * k3)
            x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            ts_all.append(t1)
            xs_all.append(x.copy())
    err = float(np.linalg.norm(x - np.array([s, 0.0])))
    return err, np.asarray(ts_all), np.asarray(xs_all)


def solve_mp(mdl: LCvxDoubleIntegratorParameters = LCvxDoubleIntegratorParameters(),
             tol_err: float = 1e-2, max_iter: int = 10, n_grid: int = 25):
    """Analytic optimum via iterative grid search over the adjoint
    parameters (c, ts) (reference definition.jl:137-217)."""
    T, g, s = mdl.T, mdl.g, mdl.s
    if mdl.choice == 1:
        c_rng, ts_rng = (-3.0, -1.0), (4.5, 5.5)
    else:
        c_rng, ts_rng = (-1.5, -0.5), (6.5, 7.5)

    for _ in range(max_iter):
        cg = np.linspace(*c_rng, n_grid)
        tg = np.linspace(*ts_rng, n_grid)
        err = np.full((n_grid, n_grid), np.nan)
        for i, ci in enumerate(cg):
            for j, tj in enumerate(tg):
                err[i, j], _, _ = _mp_sim(T, g, s, ci, tj, n_sub=20)
        inner = err[1:-1, 1:-1]
        i, j = np.unravel_index(np.argmin(inner), inner.shape)
        i += 1
        j += 1
        if inner.min() <= tol_err:
            c, ts = cg[i], tg[j]
            err_f, t_mp, x_mp = _mp_sim(T, g, s, c, ts, n_sub=100)
            u_mp = np.array([mp_input(c * (t - ts)) for t in t_mp])
            return dict(c=c, ts=ts, err=err_f, t=t_mp, x=x_mp, u=u_mp)
        c_rng = (cg[max(i - 1, 0)], cg[min(i + 1, n_grid - 1)])
        ts_rng = (tg[max(j - 1, 0)], tg[min(j + 1, n_grid - 1)])
    raise RuntimeError("MP shooting failed to converge")
