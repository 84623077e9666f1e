"""6-DoF free-flyer inside the ISS (reference test/examples/freeflyer/:
parameters.jl:27-192, definition.jl:27-517).

State (r, v, q, omega) in R^13 with a scalar-last unit quaternion attitude,
input (T, M) in R^6 (thrust + torque), parameter vector
p = [tdil, delta] where delta in R^{N*n_iss} are per-node per-room
signed-distance slack variables. The vehicle flies between rest states
through the union of six station rooms (smooth SDF union via logsumexp
over the per-room LINF distances, definition.jl:393-401) while avoiding
three ellipsoidal obstacles. Quaternion renormalization runs as an RK4
integration action (definition.jl:69-82).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.parser.problem import (BoundingBox, TrajectoryProblem,
                                           linf, nonpos, soc)
from scptoolbox_tpu.utils import quaternion as quat
from scptoolbox_tpu.utils.geometry import Ellipsoid, Hyperrectangle
from scptoolbox_tpu.utils.smooth import logsumexp


@dataclasses.dataclass(frozen=True)
class FreeFlyerParameters:
    """Vehicle + environment + trajectory data
    (reference freeflyer/parameters.jl:107-192)."""

    v_max: float = 0.4
    omega_max: float = float(np.deg2rad(1.0))
    T_max: float = 20e-3
    M_max: float = 1e-4
    m: float = 7.2
    J_diag: Tuple[float, ...] = (0.1083, 0.1083, 0.1083)
    r0: Tuple[float, ...] = (6.5, -0.2, 5.0)
    v0: Tuple[float, ...] = (0.035, 0.035, 0.0)
    q0_angle_deg: float = -40.0
    q0_axis: Tuple[float, ...] = (0.0, 1.0, 1.0)
    omega0: Tuple[float, ...] = (0.0, 0.0, 0.0)
    rf: Tuple[float, ...] = (11.3, 6.0, 4.5)
    vf: Tuple[float, ...] = (0.0, 0.0, 0.0)
    qf_angle_deg: float = 0.0
    qf_axis: Tuple[float, ...] = (0.0, 0.0, 1.0)
    omegaf: Tuple[float, ...] = (0.0, 0.0, 0.0)
    tf_min: float = 60.0
    tf_max: float = 200.0
    gamma: float = 0.0
    hom: float = 50.0      # SDF logsumexp sharpness (parameters.jl:171)
    eps_sdf: float = 1e-4  # room-SDF tightening weight (parameters.jl:172)

    def obstacles(self):
        """Three spherical keep-out zones (parameters.jl:110-116)."""
        shape = jnp.eye(3) / 0.3
        return [
            Ellipsoid(shape, jnp.asarray([8.5, -0.15, 5.0])),
            Ellipsoid(shape, jnp.asarray([11.2, 1.84, 5.0])),
            Ellipsoid(shape, jnp.asarray([11.3, 3.8, 4.8])),
        ]

    def rooms(self):
        """Six ISS flight-corridor rooms (parameters.jl:117-124)."""
        z = 4.75
        return [
            Hyperrectangle.from_extrusion([6.0, 0.0, z], 1.0, 1.0, 1.5,
                                          pitch=90.0),
            Hyperrectangle.from_extrusion([7.5, 0.0, z], 2.0, 2.0, 4.0,
                                          pitch=90.0),
            Hyperrectangle.from_extrusion([11.5, 0.0, z], 1.25, 1.25, 0.5,
                                          pitch=90.0),
            Hyperrectangle.from_extrusion([10.75, -1.0, z], 1.5, 1.5, 1.5,
                                          yaw=-90.0, pitch=90.0),
            Hyperrectangle.from_extrusion([10.75, 1.0, z], 1.5, 1.5, 1.5,
                                          yaw=90.0, pitch=90.0),
            Hyperrectangle.from_extrusion([10.75, 2.5, z], 2.5, 2.5, 4.5,
                                          yaw=90.0, pitch=90.0),
        ]

    def q0(self):
        return quat.from_angleaxis(jnp.deg2rad(self.q0_angle_deg),
                                   jnp.asarray(self.q0_axis))

    def qf(self):
        return quat.from_angleaxis(jnp.deg2rad(self.qf_angle_deg),
                                   jnp.asarray(self.qf_axis))


def freeflyer(mdl: FreeFlyerParameters = FreeFlyerParameters(),
              N: int = 50) -> TrajectoryProblem:
    """Build the TrajectoryProblem (reference definition.jl:27-517).

    The per-node per-room SDF slacks live in the parameter vector:
    p = [tdil, delta.ravel()] with delta of shape (N, n_iss)
    (parameters.jl:135 `id_δ`); N is therefore part of the problem."""
    rooms = mdl.rooms()
    obs = mdl.obstacles()
    n_iss = len(rooms)
    npp = 1 + N * n_iss
    J = jnp.diag(jnp.asarray(mdl.J_diag))
    Jinv = jnp.diag(1.0 / jnp.asarray(mdl.J_diag))
    room_c = jnp.stack([R.center for R in rooms])  # (n_iss, 3)
    room_s = jnp.stack([R.s for R in rooms])       # (n_iss, 3)
    r0, v0 = jnp.asarray(mdl.r0), jnp.asarray(mdl.v0)
    rf, vf = jnp.asarray(mdl.rf), jnp.asarray(mdl.vf)
    q0, qf = mdl.q0(), mdl.qf()
    om0, omf = jnp.asarray(mdl.omega0), jnp.asarray(mdl.omegaf)

    def delta_at(p, k):
        """Per-node room slacks delta[k] (n_iss,) out of the parameter
        vector; k may be a traced node index."""
        d = p[1:].reshape(N, n_iss)
        return d[k]

    def f(t, x, u, p):
        # definition.jl:229-244: time-dilated translational + rotational
        # rigid-body dynamics, dq/dt = 0.5 q (x) [omega; 0]
        v, q, om = x[3:6], x[6:10], x[10:13]
        T, M = u[:3], u[3:6]
        dq = 0.5 * quat.mul(q, quat.from_parts(om, 0.0))
        dom = Jinv @ (M - jnp.cross(om, J @ om))
        return p[0] * jnp.concatenate([v, T / mdl.m, dq, dom])

    def terminal_cost(x, p):
        # definition.jl:172-184: flight-time tradeoff + SDF tightening
        return (mdl.gamma * (p[0] / mdl.tf_max) ** 2
                + mdl.eps_sdf * jnp.sum(-p[1:]))

    def running_cost(t, k, x, u, p):
        # definition.jl:187-219 (SCvx quadratic; GuSTO's S-matrix is the
        # same quadratic form)
        T, M = u[:3], u[3:6]
        return (1.0 - mdl.gamma) * (jnp.dot(T, T) / mdl.T_max ** 2
                                    + jnp.dot(M, M) / mdl.M_max ** 2)

    def X(t, k, x, p):
        # definition.jl:286-348: speed/rate SOCs, duration box, and the
        # per-room LINF SDF lower bounds 1 - delta_ik >= ||(r-c_i)/s_i||_inf
        r, v, om = x[:3], x[3:6], x[10:13]
        dk = delta_at(p, k)
        cons = [
            soc(jnp.concatenate([jnp.asarray([mdl.v_max]), v])),
            soc(jnp.concatenate([jnp.asarray([mdl.omega_max]), om])),
            nonpos(jnp.stack([p[0] - mdl.tf_max, mdl.tf_min - p[0]])),
        ]
        for i in range(n_iss):
            cons.append(linf(jnp.concatenate(
                [(1.0 - dk[i])[None], (r - room_c[i]) / room_s[i]])))
        return cons

    def U(t, k, u, p):
        # definition.jl:351-376: thrust and torque SOC bounds
        return [
            soc(jnp.concatenate([jnp.asarray([mdl.T_max]), u[:3]])),
            soc(jnp.concatenate([jnp.asarray([mdl.M_max]), u[3:6]])),
        ]

    def s(t, k, x, u, p):
        # definition.jl:384-403: ellipsoid obstacles + smooth room-union SDF
        r = x[:3]
        obs_rows = jnp.stack([1.0 - E(r) for E in obs])
        d = logsumexp(delta_at(p, k), kappa=mdl.hom)
        return jnp.concatenate([obs_rows, (-d)[None]])

    def gic(x, p):
        return x - jnp.concatenate([r0, v0, q0, om0])

    def gtc(x, p):
        return x - jnp.concatenate([rf, vf, qf, omf])

    def actions(x):
        # quaternion renormalization after each RK4 step
        # (definition.jl:69-82, reference problem.jl:296-305)
        return x.at[6:10].set(quat.normalize(x[6:10]))

    def guess(N_):
        # definition.jl:84-167: L-shaped axis-aligned position path, SLERP
        # attitude, constant angular velocity, zero input, SDF slack guess
        assert N_ == N
        tf = 0.5 * (mdl.tf_min + mdl.tf_max)
        r0_, rf_ = np.asarray(mdl.r0), np.asarray(mdl.rf)
        speed = np.abs(rf_ - r0_).sum() / tf
        leg_t = np.abs(rf_ - r0_) / speed
        cumul = np.cumsum(leg_t)
        x = np.zeros((N, 13))
        times = np.linspace(0.0, tf, N)
        for k, tk in enumerate(times):
            i = int(np.searchsorted(cumul, min(tk, cumul[-1] - 1e-12)))
            t0 = cumul[i - 1] if i > 0 else 0.0
            ra = r0_.copy()
            ra[:i] = rf_[:i]
            rb = ra.copy()
            rb[i] = rf_[i]
            lam = np.clip((tk - t0) / max(cumul[i] - t0, 1e-12), 0.0, 1.0)
            x[k, :3] = (1 - lam) * ra + lam * rb
            d = rb - ra
            x[k, 3:6] = speed * d / max(np.linalg.norm(d), 1e-12)
        mix = jnp.linspace(0.0, 1.0, N)
        x_q = np.asarray(
            jnp.stack([quat.slerp(q0, qf, m) for m in mix]))
        x[:, 6:10] = x_q
        rotvec = np.asarray(quat.log(quat.mul(qf, quat.conj(q0))))
        x[:, 10:13] = rotvec / tf
        u = np.zeros((N, 6))
        # room SDF guess: delta[k,i] = 1 - ||(r_k - c_i)/s_i||_inf
        # (definition.jl:149-156)
        rc = np.asarray(room_c)[None]
        rs = np.asarray(room_s)[None]
        dist = np.abs(x[:, None, :3] - rc) / rs
        delta = 1.0 - dist.max(axis=-1)
        p = np.concatenate([[tf], delta.ravel()])
        return jnp.asarray(x), jnp.asarray(u), jnp.asarray(p)

    # scaling advice exactly as the reference gives it (definition.jl:52-67):
    # position extent, flight time, delta in [-100, 1]. Velocity, attitude,
    # rates and inputs are left UNADVISED (NaN) so the LP auto-scaling bounds
    # them from the X/U sets (v in +-v_max, omega in +-omega_max, T/M from
    # the SOC bounds; the unconstrained quaternion keeps the [0,1] default) —
    # reference scp.jl:376-517.
    min_pos = np.minimum(mdl.r0, mdl.rf)
    max_pos = np.maximum(mdl.r0, mdl.rf)
    x_lo = np.concatenate([min_pos, np.full(10, np.nan)])
    x_hi = np.concatenate([max_pos, np.full(10, np.nan)])
    p_lo = np.concatenate([[mdl.tf_min], -100.0 * np.ones(N * n_iss)])
    p_hi = np.concatenate([[mdl.tf_max], np.ones(N * n_iss)])

    return TrajectoryProblem(
        nx=13, nu=6, np=npp, f=f, guess=guess,
        terminal_cost=terminal_cost, running_cost=running_cost,
        X=X, U=U, s=s, gic=gic, gtc=gtc,
        integration_actions=actions,
        xrg=BoundingBox(lo=jnp.asarray(x_lo), hi=jnp.asarray(x_hi)),
        prg=BoundingBox(lo=jnp.asarray(p_lo), hi=jnp.asarray(p_hi)),
    )
