"""Starship landing flip maneuver (reference test/examples/starship_flip/:
parameters.jl:29-213, definition.jl:29-873, tests.jl:27-123).

Planar rigid-body rocket: state (r, v, theta, omega, m, delta_d) in R^8
(m is the consumed-mass delta starting at 0; delta_d is the delayed gimbal
angle for the rate constraint), input (T, delta, delta_dot) in R^3,
parameters p = [t1, t2, xs] in R^10 with per-phase time dilations and the
phase-switch state xs. Two phases on the normalized grid: the aerodynamic
flip (three engines) for tau <= tau_s and terminal descent (one engine,
tilt-bounded) after, coupled through the nonconvex phase-switch constraint
x_k == xs at the switch node. The cost maximizes the switch altitude and
minimizes fuel.

The guess generator reproduces the reference's strategy
(definition.jl:97-445): propagate a gimbal bang-bang flip to the vertical-
velocity crossing, then solve inner convex double-integrator feasibility
problems over a terminal-descent flight-time ladder. TPU-native: the inner
problem is ONE compiled ConicProgram with t2 as a traced parameter (the
reference rebuilds a JuMP model per probe); phase masks are jnp.where
weights on the traced node time, never Python branches.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops.ipm import IPMStatus
from scptoolbox_tpu.parser.problem import (BoundingBox, TrajectoryProblem,
                                           l1, nonpos, soc, zero)
from scptoolbox_tpu.parser.program import ConicProgram

# state / input / parameter slots (reference parameters.jl:111-122)
ID_R = slice(0, 2)
ID_V = slice(2, 4)
ID_TH = 4
ID_OM = 5
ID_M = 6
ID_DD = 7
ID_T = 0
ID_D = 1
ID_DDOT = 2
ID_T1 = 0
ID_T2 = 1
ID_XS = slice(2, 10)


@dataclasses.dataclass(frozen=True)
class StarshipParameters:
    """Vehicle + environment + trajectory data
    (reference parameters.jl:100-212)."""

    g0: float = 9.81
    rs_fus: float = 4.5      # [m] fuselage radius
    ls_fus: float = 50.0     # [m] fuselage height
    m: float = 120e3         # [kg]
    vterm: float = 85.0      # [m/s] freefall terminal velocity
    Isp: float = 330.0       # [s]
    T_min1: float = 880e3    # [N] one-engine min thrust
    T_max1: float = 2210e3   # [N] one-engine max thrust
    delta_max_deg: float = 10.0
    rate_delay: float = 0.05
    r0: tuple = (100.0, 600.0)
    theta0_deg: float = 90.0
    thetas_deg: float = -10.0  # phase-switch tilt guess
    vs_y: float = -10.0        # [m/s] phase-switch vertical velocity
    vf_y: float = -0.1         # [m/s] terminal vertical velocity
    tf_min: float = 0.0
    tf_max: float = 40.0
    gamma_gs_deg: float = 27.0
    theta_max2_deg: float = 15.0
    tau_s: float = 0.5         # normalized phase-switch time
    hs0: float = 100.0         # [m] initial switch-altitude guess

    @property
    def lcg(self):
        return 0.4 * self.ls_fus

    @property
    def lcp(self):
        return 0.45 * self.ls_fus

    @property
    def J(self):
        return self.m / 12.0 * (6.0 * self.rs_fus ** 2 + self.ls_fus ** 2)

    @property
    def CD(self):
        # drag 0.5 rho cd A, with a 1.2 fudge (parameters.jl:133-136)
        return 1.2 * self.m * self.g0 / self.vterm ** 2

    @property
    def alpha_e(self):
        return -1.0 / (self.Isp * self.g0)

    @property
    def T_min3(self):
        return 3.0 * self.T_min1

    @property
    def T_max3(self):
        return 3.0 * self.T_max1

    @property
    def delta_max(self):
        return math.radians(self.delta_max_deg)

    @property
    def ddot_max(self):
        return 2.0 * self.delta_max


def _dynamics_terms(mdl: StarshipParameters, x, u, *, no_aero_torques=False):
    """Shared force/torque computation (reference `dynamics`,
    definition.jl:498-550)."""
    v = x[ID_V]
    th = x[ID_TH]
    T, d = u[ID_T], u[ID_D]
    ei = jnp.stack([jnp.cos(th), jnp.sin(th)])
    ej = jnp.stack([-jnp.sin(th), jnp.cos(th)])
    Tv = T * (-jnp.sin(d) * ei + jnp.cos(d) * ej)
    MT = -mdl.lcg * T * jnp.sin(d)
    # smooth-at-zero speed for AD (the reference guards the Jacobian at
    # ||v|| ~ 0 by hand, definition.jl:763-764)
    vn = jnp.sqrt(jnp.dot(v, v) + 1e-12)
    D = -mdl.CD * vn * v
    MD = jnp.where(no_aero_torques, 0.0,
                   -(mdl.lcp - mdl.lcg) * jnp.dot(D, ei))
    return Tv, D, MT, MD


def starship(mdl: StarshipParameters = StarshipParameters(),
             N: int = 31) -> TrajectoryProblem:
    """Build the TrajectoryProblem (reference definition.jl:29-873). N enters
    through the phase-switch node mask (definition.jl:707-721)."""
    tau_s = mdl.tau_s
    g_vec = jnp.asarray([0.0, -mdl.g0])
    th_max2 = math.radians(mdl.theta_max2_deg)
    cos_gs = math.cos(math.radians(mdl.gamma_gs_deg))
    dt_node = 1.0 / (N - 1)
    tol = 1e-3

    def tdil(t, p):
        # per-phase time dilation (definition.jl:521)
        return jnp.where(t <= tau_s, p[ID_T1] / tau_s,
                         p[ID_T2] / (1.0 - tau_s))

    def f(t, x, u, p):
        # definition.jl:498-550
        Tv, D, MT, MD = _dynamics_terms(mdl, x, u)
        dv = (Tv + D) / mdl.m + g_vec
        return tdil(t, p) * jnp.concatenate([
            x[ID_V], dv, x[ID_OM][None], ((MT + MD) / mdl.J)[None],
            (mdl.alpha_e * u[ID_T])[None],
            ((u[ID_D] - x[ID_DD]) / mdl.rate_delay)[None]])

    # guess computed eagerly: the terminal cost normalizes by the switch
    # altitude found during guess generation (reference mutates traj.hs,
    # definition.jl:195, read by the cost closure :464)
    xg, ug, pg, hs = _initial_guess(mdl, N)

    def terminal_cost(x, p):
        # definition.jl:454-478: maximize switch altitude, minimize fuel
        alt = p[ID_XS][1]
        dm = 0.0 - x[ID_M]
        return 0.3 * (-alt / hs) + dm / 10e3

    def X(t, k, x, p):
        # definition.jl:642-670: no climbing; total-time box
        tf = p[ID_T1] + p[ID_T2]
        return [nonpos(jnp.stack(
            [x[ID_V][1], tf - mdl.tf_max, mdl.tf_min - tf]))]

    def U(t, k, u, p):
        # definition.jl:673-699: phase-dependent thrust bounds, gimbal L1
        flip = t <= tau_s
        T_max = jnp.where(flip, mdl.T_max3, mdl.T_max1)
        T_min = jnp.where(flip, mdl.T_min3, mdl.T_min1)
        return [
            nonpos(jnp.stack([u[ID_T] - T_max, T_min - u[ID_T]])),
            l1(jnp.stack([mdl.delta_max, u[ID_D]])),
        ]

    def s(t, k, x, u, p):
        # definition.jl:704-810: gimbal rate (delayed-state approximation),
        # glide slope, phase-switch state equality, phase-2 tilt bounds —
        # node masks as multiplicative weights on the traced time
        r = x[ID_R]
        d, dd, ddot = u[ID_D], x[ID_DD], u[ID_DDOT]
        is_switch = jnp.where(
            (t >= tau_s - dt_node + tol) & (t <= tau_s + tol), 1.0, 0.0)
        is_phase2 = jnp.maximum(is_switch, jnp.where(t > tau_s, 1.0, 0.0))
        rn = jnp.sqrt(jnp.dot(r, r) + 1e-12)
        base = jnp.stack([
            (d - dd) - ddot * mdl.rate_delay,
            ddot * mdl.rate_delay - (d - dd),
            ddot - mdl.ddot_max,
            -mdl.ddot_max - ddot,
            rn * cos_gs - r[1],
        ])
        switch_rows = is_switch * jnp.concatenate([p[ID_XS] - x,
                                                   x - p[ID_XS]])
        tilt_rows = is_phase2 * jnp.stack([x[ID_TH] - th_max2,
                                           -th_max2 - x[ID_TH]])
        return jnp.concatenate([base, switch_rows, tilt_rows])

    def gic(x, p):
        # definition.jl:815-842: r, v, theta, omega, m fixed (delta_d free)
        rhs = jnp.asarray([*mdl.r0, 0.0, -mdl.vterm,
                           math.radians(mdl.theta0_deg), 0.0, 0.0])
        return x[:7] - rhs

    def gtc(x, p):
        # definition.jl:845-870: land at origin, vf, upright, at rest
        rhs = jnp.asarray([0.0, 0.0, 0.0, mdl.vf_y, 0.0, 0.0])
        return x[:6] - rhs

    def guess(N_):
        assert N_ == N
        return xg, ug, pg

    # scaling advice (definition.jl:50-79)
    d10 = math.radians(10.0)
    x_lo = np.asarray([-100.0, 0.0, -10.0, -mdl.vterm,
                       0.0, -d10, -1e3, -mdl.delta_max])
    x_hi = np.asarray([100.0, mdl.r0[1], 10.0, 0.0,
                       math.radians(mdl.theta0_deg), d10, 0.0,
                       mdl.delta_max])
    # note the reference advises the mass state as (m-1e3, m) around the
    # vehicle mass, but the state is the consumed-mass delta (starts at 0,
    # decreases); the delta range keeps the same width
    u_lo = np.asarray([mdl.T_min1, -mdl.delta_max, -mdl.ddot_max])
    u_hi = np.asarray([mdl.T_max3, mdl.delta_max, mdl.ddot_max])
    p_lo = np.concatenate([[0.0, 0.0], x_lo])
    p_hi = np.concatenate([[mdl.tf_max, mdl.tf_max], x_hi])

    return TrajectoryProblem(
        nx=8, nu=3, np=10, f=f, guess=guess,
        terminal_cost=terminal_cost, X=X, U=U, s=s, gic=gic, gtc=gtc,
        xrg=BoundingBox(lo=jnp.asarray(x_lo), hi=jnp.asarray(x_hi)),
        urg=BoundingBox(lo=jnp.asarray(u_lo), hi=jnp.asarray(u_hi)),
        prg=BoundingBox(lo=jnp.asarray(p_lo), hi=jnp.asarray(p_hi)),
    )


# --------------------------------------------------------------------------
# Initial guess (reference starship_initial_guess, definition.jl:97-445)
# --------------------------------------------------------------------------


def _flip_control(mdl: StarshipParameters, t, flip_ts):
    """Bang-bang gimbal at min 3-engine thrust (definition.jl:122-141)."""
    if t <= flip_ts:
        d = mdl.delta_max
    elif t <= 2 * flip_ts:
        d = -mdl.delta_max
    else:
        d = 0.0
    return np.asarray([mdl.T_min3, d, 0.0])


def _flip_field(mdl: StarshipParameters, x, u):
    """Flip-phase dynamics in absolute time, no aero torques
    (definition.jl:143-154). Pure numpy: host-side guess propagation."""
    v = x[2:4]
    th, d = x[ID_TH], u[ID_D]
    T = u[ID_T]
    ei = np.asarray([math.cos(th), math.sin(th)])
    ej = np.asarray([-math.sin(th), math.cos(th)])
    Tv = T * (-math.sin(d) * ei + math.cos(d) * ej)
    D = -mdl.CD * np.linalg.norm(v) * v
    MT = -mdl.lcg * T * math.sin(d)
    dv = (Tv + D) / mdl.m + np.asarray([0.0, -mdl.g0])
    return np.concatenate([
        v, dv, [x[ID_OM], MT / mdl.J, mdl.alpha_e * T,
                (d - x[ID_DD]) / mdl.rate_delay]])


def _descent_program(mdl: StarshipParameters, N2: int, dtau: float,
                     tau_frac: float) -> ConicProgram:
    """Terminal-descent feasibility program: planar double integrator under
    one-engine thrust bounds/tilt (definition.jl:291-393), with the flight
    time t2 and switch state as TRACED parameters of one compiled program."""
    A_lti = np.zeros((4, 4))
    A_lti[0:2, 2:4] = np.eye(2)
    B_lti = np.zeros((4, 2))
    B_lti[2:4, :] = np.eye(2) / mdl.m
    r_lti = np.asarray([0.0, 0.0, 0.0, -mdl.g0])
    # constant-forcing column rides along the input matrix
    Baug = jnp.asarray(np.concatenate([B_lti, r_lti[:, None]], axis=1))
    A_c = jnp.asarray(A_lti)
    cos_t2 = math.cos(math.radians(mdl.theta_max2_deg))

    from scptoolbox_tpu.utils.linsys import c2d_foh

    prg = ConicProgram()
    x = prg.variable("x", N2, 4)
    u = prg.variable("u", N2, 2)
    t2 = prg.parameter("t2", 20.0)
    rs = prg.parameter("rs", jnp.zeros(2))
    vs = prg.parameter("vs", jnp.zeros(2))

    def dyn(x, u, t2):
        dil = t2 / tau_frac
        Ad, Bm, Bp = c2d_foh(A_c * dil, Baug * dil, dtau)
        Uc = jnp.concatenate([u, jnp.ones((N2, 1))], axis=1)
        res = x[1:] - x[:-1] @ Ad.T - Uc[:-1] @ Bm.T - Uc[1:] @ Bp.T
        return [zero(res.reshape(-1))]

    prg.add_constraint("dyn", dyn, (x, u, t2))

    def inputs(u):
        cons = [nonpos(mdl.T_min1 - u[:, 1])]
        for k in range(N2):
            cons.append(soc(jnp.concatenate([jnp.asarray([mdl.T_max1]),
                                             u[k]])))
            cons.append(soc(jnp.concatenate([(u[k, 1] / cos_t2)[None],
                                             u[k]])))
        return cons

    prg.add_constraint("inputs", inputs, (u,))

    def states(x):
        return [nonpos(-x[:, 1])]

    prg.add_constraint("states", states, (x,))

    def bcs(x, rs, vs):
        vf = jnp.asarray([0.0, mdl.vf_y])
        return [zero(jnp.concatenate(
            [x[0, 0:2] - rs, x[0, 2:4] - vs, x[-1, 0:2], x[-1, 2:4] - vf]))]

    prg.add_constraint("bcs", bcs, (x, rs, vs))

    # pure feasibility (the reference adds no cost, definition.jl:293-386);
    # a tiny thrust regularization keeps the IPM centered
    prg.add_cost(lambda u: 1e-8 * jnp.sum(u[:, 1]) / mdl.T_max1, (u,))

    prg.scale(x, jnp.asarray([abs(mdl.r0[0]) + 1.0, mdl.r0[1],
                              mdl.vterm, mdl.vterm]), jnp.zeros(4))
    Tmax_x = mdl.T_max1 * math.sin(th2 := math.radians(mdl.theta_max2_deg))
    prg.scale(u, jnp.asarray([2 * Tmax_x, mdl.T_max1 - mdl.T_min1]),
              jnp.asarray([-Tmax_x, mdl.T_min1]))
    prg.build()
    return prg


def _initial_guess(mdl: StarshipParameters, N: int):
    """Bang-bang flip propagation + inner convex terminal descent
    (definition.jl:97-445). Returns (x (N,8), u (N,3), p (10,), hs)."""
    tau_grid = np.linspace(0.0, 1.0, N)
    id_p1 = np.where(tau_grid <= mdl.tau_s)[0]
    id_p2 = np.arange(id_p1[-1], N)
    x_guess = np.zeros((N, 8))
    u_guess = np.zeros((N, 3))

    # ---- phase 1: propagate the bang-bang flip (definition.jl:122-187)
    flip_ac = mdl.lcg / mdl.J * mdl.T_min3 * math.sin(mdl.delta_max)
    th0 = math.radians(mdl.theta0_deg)
    ths = math.radians(mdl.thetas_deg)
    flip_ts = math.sqrt((th0 - ths) / flip_ac)
    tf = 2.0 * flip_ts + 10.0
    ts = np.linspace(0.0, tf, 5000)
    x10 = np.zeros(8)
    x10[0:2] = mdl.r0
    x10[3] = -mdl.vterm
    x10[ID_TH] = th0
    x10[ID_DD] = mdl.delta_max
    X1 = np.zeros((len(ts), 8))
    X1[0] = x10
    for i in range(len(ts) - 1):
        h = ts[i + 1] - ts[i]
        xk = X1[i]
        fdot = lambda t, xx: _flip_field(mdl, xx, _flip_control(mdl, t,
                                                                flip_ts))
        k1 = fdot(ts[i], xk)
        k2 = fdot(ts[i] + h / 2, xk + h / 2 * k1)
        k3 = fdot(ts[i] + h / 2, xk + h / 2 * k2)
        k4 = fdot(ts[i + 1], xk + h * k3)
        X1[i + 1] = xk + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    crossing = np.where(X1[:, 3] >= mdl.vs_y)[0]
    if len(crossing) == 0:
        raise ValueError("no terminal-velocity crossing in flip guess")
    k0 = crossing[0]
    t1 = ts[k0]
    ts1, X1 = ts[:k0 + 1], X1[:k0 + 1]

    def sample1(t):
        return np.array([np.interp(t, ts1, X1[:, i]) for i in range(8)])

    for j in id_p1:
        t_abs = tau_grid[j] / mdl.tau_s * t1
        x_guess[j] = sample1(t_abs)
        u_guess[j] = _flip_control(mdl, t_abs, flip_ts)

    # ---- phase 2: inner convex feasibility ladder (definition.jl:189-413)
    xs = sample1(tau_grid[id_p1[-1]] / mdl.tau_s * t1)
    hs = float(xs[1])
    tau2 = tau_grid[id_p2] - tau_grid[id_p2[0]]
    N2 = len(tau2)
    dtau = tau2[1] - tau2[0]
    prg = _descent_program(mdl, N2, dtau, 1.0 - mdl.tau_s)
    t2, x2, T2 = None, None, None
    for t2_try in np.arange(10.0, 41.0, 1.0):
        sol = prg.solve(t2=t2_try, rs=jnp.asarray(xs[0:2]),
                        vs=jnp.asarray(xs[2:4]))
        if int(sol.status) in (int(IPMStatus.OPTIMAL),
                               int(IPMStatus.ALMOST_OPTIMAL)):
            t2 = float(t2_try)
            x2 = np.asarray(sol.values["x"])
            T2 = np.asarray(sol.values["u"])
            break
    if t2 is None:
        raise ValueError("no feasible terminal-descent flight time")

    # populate phase 2 (definition.jl:415-434)
    x_guess[id_p2, 0:2] = x2[:, 0:2]
    x_guess[id_p2, 2:4] = x2[:, 2:4]
    dil2 = t2 / (1.0 - mdl.tau_s)
    m20 = x_guess[id_p2[0], ID_M]
    th2 = -np.arctan2(T2[:, 0], T2[:, 1])
    x_guess[id_p2, ID_TH] = th2
    u_guess[id_p2, ID_T] = np.linalg.norm(T2, axis=1)
    u_guess[id_p2, ID_D] = 0.0
    u_guess[id_p2, ID_DDOT] = 0.0
    x_guess[id_p2, ID_DD] = 0.0
    for k in range(1, N2):
        j = id_p2[k]
        dth = x_guess[j, ID_TH] - x_guess[j - 1, ID_TH]
        dt_abs = (tau2[k] - tau2[k - 1]) * dil2
        x_guess[j - 1, ID_OM] = dth / dt_abs
        x_guess[j, ID_M] = m20 + np.trapz(
            mdl.alpha_e * u_guess[id_p2[:k + 1], ID_T], tau2[:k + 1] * dil2)
    x_guess[id_p2[-1], ID_OM] = 0.0

    p_guess = np.concatenate([[t1, t2], xs])
    return (jnp.asarray(x_guess), jnp.asarray(u_guess),
            jnp.asarray(p_guess), hs)
