"""Linearization + discretization engine: variational STM integration.

The TPU-native replacement for the reference's hot loop
(src/solvers/discretization.jl:160-217 `discretize!` with `derivs_foh`
:235-286 / `derivs_impulse` :304-340 and `set_update_matrices` :354-406):
for every trajectory interval, integrate the variational equations of the
state-transition matrix around the reference trajectory and extract the
discrete LTV update

    x_{k+1} = A_k x_k + Bm_k u_k + Bp_k u_{k+1} + F_k p + r_k + E_k v_k

(FOH; IMPULSE has Bp = 0 and the input enters as a state jump at t_k).

Design differences from the reference (TPU-first, not a port):
  * the per-interval loop `for k = 1:N-1` becomes `vmap` over intervals —
    they are independent given the reference trajectory — and the Nsub
    RK4 substeps are a `lax.scan`, so one jitted XLA program covers the
    whole grid and batches across SCP scenarios with an outer vmap;
  * the reference inverts Phi at every RK4 stage (`Phi \\ I(nx)`,
    discretization.jl:267). We instead propagate the adjoint STM
    Psi = Phi^{-1} by its own ODE dPsi/dt = -Psi A(t): matmuls only,
    MXU-friendly, no LU in the inner loop;
  * A(t), B(t), F(t) come from `jax.jacfwd` of the user dynamics — the
    reference requires hand-derived Jacobians (problem.jl:432-497);
    analytic Jacobians can still be supplied to override AD;
  * r_k is recovered from the exactness identity
    r_k = xprop - A_k x_ref_k - Bm u_k - Bp u_{k+1} - F_k p
    (the linearized flow evaluated at the reference equals the nonlinear
    propagation), saving one ODE block.
"""

from __future__ import annotations

import enum
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from scptoolbox_tpu.utils.integrate import rk4_step


class DiscretizationType(enum.Enum):
    """FOH: piecewise-linear input; IMPULSE: input as state jumps at nodes
    (reference src/parser/problem.jl:52)."""

    FOH = "foh"
    IMPULSE = "impulse"


class DLTV(NamedTuple):
    """Discrete linear time-varying update (reference discretization.jl:28-84).

    Shapes: A (N-1,nx,nx), Bm/Bp (N-1,nx,nu), F (N-1,nx,np), r (N-1,nx),
    E (N-1,nx,nv), defects (N-1,nx), xprop (N-1,nx).
    """

    A: jnp.ndarray
    Bm: jnp.ndarray
    Bp: jnp.ndarray
    F: jnp.ndarray
    r: jnp.ndarray
    E: jnp.ndarray
    defects: jnp.ndarray
    xprop: jnp.ndarray


def _jacobians(f: Callable, jac: Optional[Callable]):
    """Return (t,x,u,p) -> (A,B,F). AD by default; user override allowed."""
    if jac is not None:
        return jac

    def ad_jac(t, x, u, p):
        return jax.jacfwd(f, argnums=(1, 2, 3))(t, x, u, p)

    return ad_jac


class _VarState(NamedTuple):
    x: jnp.ndarray        # (nx,)
    Phi: jnp.ndarray      # (nx, nx)
    Psi: jnp.ndarray      # (nx, nx) = Phi^{-1}
    Bm: jnp.ndarray       # (nx, nu)
    Bp: jnp.ndarray       # (nx, nu)
    F: jnp.ndarray        # (nx, np)
    intPsi: jnp.ndarray   # (nx, nx) — for E_k = A_k @ intPsi @ E


@functools.partial(
    jax.jit,
    static_argnames=("f", "nsub", "method", "jac", "impulse", "actions"),
)
def discretize(
    f: Callable,
    x_ref: jnp.ndarray,
    u_ref: jnp.ndarray,
    p_ref: jnp.ndarray,
    t_grid: jnp.ndarray,
    E: jnp.ndarray,
    *,
    nsub: int = 15,
    method: DiscretizationType = DiscretizationType.FOH,
    jac: Optional[Callable] = None,
    impulse: Optional[Callable] = None,
    actions: Optional[Callable] = None,
    consts=None,
) -> DLTV:
    """Linearize/discretize dx/dt = f(t, x, u, p) about a reference.

    Args:
      f: continuous dynamics `f(t, x, u, p) -> (nx,)`. For IMPULSE problems
         this is the coasting field (evaluated with u = 0).
      x_ref: (N, nx) reference states at the nodes.
      u_ref: (N, nu) reference inputs at the nodes.
      p_ref: (np,) reference parameters.
      t_grid: (N,) node times (typically normalized to [0, 1] with time
         dilation in p, as the reference does, scp.jl:149).
      E: (nx, nv) virtual-control injection matrix (reference scp.jl:149
         uses I_nx).
      nsub: RK4 substeps per interval (reference `Nsub`).
      method: FOH or IMPULSE.
      jac: optional analytic `(t,x,u,p) -> (A, B, F)`; default jacfwd of f.
      impulse: IMPULSE only — state jump `impulse(t, x, u, p) -> (nx,)`
         applied at each node (the full nonlinear jump; its u/x/p Jacobians
         come from AD, a superset of reference derivs_impulse :304-340).
      actions: optional post-RK4-step fixup on the state part only (e.g.
         quaternion renormalization, reference helper.jl:488-497).

    Returns a DLTV. defects[k] = x_ref[k+1] - xprop[k]; feasibility is
    decided by the caller under its scaling (reference discretization.jl:205).
    """
    from scptoolbox_tpu.parser.problem import bind_consts

    f = bind_consts(f, consts)
    jac = bind_consts(jac, consts)
    impulse = bind_consts(impulse, consts)
    actions = bind_consts(actions, consts)
    x_ref = jnp.asarray(x_ref)
    u_ref = jnp.asarray(u_ref)
    p_ref = jnp.asarray(p_ref)
    t_grid = jnp.asarray(t_grid)
    nx = x_ref.shape[1]
    nu = u_ref.shape[1]
    np_ = p_ref.shape[0]
    dt_k = t_grid[1:] - t_grid[:-1]
    jac_fn = _jacobians(f, jac)
    is_impulse = method == DiscretizationType.IMPULSE

    def interval(x_k, u_k, u_kp1, t_k, dt):
        """Integrate the variational system across one interval.

        The STM Phi is always propagated from the identity (the pure flow
        map). For IMPULSE the jump enters through its INPUT Jacobian only:
        A_k = PhiF, Bm_k = PhiF Ju, F_k = PhiF (Jp + intPsiF) — matching
        the reference (set_update_matrices, discretization.jl:385-391:
        A_k = Phi, B_k = Phi B(t_k)), which deliberately OMITS the jump's
        state Jacobian. Including it (the 'more accurate' AD superset)
        exposes first-order exploits of the jump's state dependence to the
        subproblem — e.g. the rendezvous_3d thrust rotation R(q) u scales
        with ||q||^2, so the linearized model rewards inflating the
        quaternion off the unit sphere, which diverges under re-linearization
        (r2 root-cause of the rendezvous_3d runaway).
        """
        if is_impulse:
            jump = impulse(t_k, x_k, u_k, p_ref)
            Ju, Jp = jax.jacfwd(impulse, argnums=(2, 3))(
                t_k, x_k, u_k, p_ref
            )
            x_start = x_k + jump
            u_of = lambda tau: jnp.zeros_like(u_k)  # coasting
        else:
            x_start = x_k
            u_of = lambda tau: u_k + (u_kp1 - u_k) * (tau / dt)

        def rhs(tau, s: _VarState):
            t = t_k + tau
            u = u_of(tau)
            xdot = f(t, s.x, u, p_ref)
            A_t, B_t, F_t = jac_fn(t, s.x, u, p_ref)
            if is_impulse:
                sig_m = sig_p = 0.0  # input only acts through the jump
            else:
                sig_m = 1.0 - tau / dt  # FOH interpolation weights
                sig_p = tau / dt
            PsiB = s.Psi @ B_t
            return _VarState(
                x=xdot,
                Phi=A_t @ s.Phi,
                Psi=-s.Psi @ A_t,
                Bm=sig_m * PsiB,
                Bp=sig_p * PsiB,
                F=s.Psi @ F_t,
                intPsi=s.Psi,
            )

        eye = jnp.eye(nx, dtype=x_k.dtype)
        s0 = _VarState(
            x=x_start,
            Phi=eye,
            Psi=eye,
            Bm=jnp.zeros((nx, nu), x_k.dtype),
            Bp=jnp.zeros((nx, nu), x_k.dtype),
            F=jnp.zeros((nx, np_), x_k.dtype),
            intPsi=jnp.zeros((nx, nx), x_k.dtype),
        )

        dsub = dt / nsub

        def body(s, i):
            s_new = rk4_step(rhs, s, i * dsub, dsub)
            if actions is not None:
                s_new = s_new._replace(x=actions(s_new.x))
            return s_new, None

        s_end, _ = jax.lax.scan(body, s0, jnp.arange(nsub))

        PhiF = s_end.Phi  # pure flow STM over the interval
        if is_impulse:
            A_k = PhiF
            Bm_k = PhiF @ Ju
            Bp_k = jnp.zeros((nx, nu), x_k.dtype)
            F_k = PhiF @ (Jp + s_end.F)
        else:
            A_k = PhiF
            Bm_k = PhiF @ s_end.Bm
            Bp_k = PhiF @ s_end.Bp
            F_k = PhiF @ s_end.F
        E_k = PhiF @ s_end.intPsi @ E
        xprop = s_end.x
        # exactness of the linearized flow at the reference defines r_k
        r_k = xprop - A_k @ x_k - Bm_k @ u_k - Bp_k @ u_kp1 - F_k @ p_ref
        return A_k, Bm_k, Bp_k, F_k, r_k, E_k, xprop

    A, Bm, Bp, F, r, E_out, xprop = jax.vmap(interval)(
        x_ref[:-1], u_ref[:-1], u_ref[1:], t_grid[:-1], dt_k
    )
    defects = x_ref[1:] - xprop
    return DLTV(A=A, Bm=Bm, Bp=Bp, F=F, r=r, E=E_out, defects=defects,
                xprop=xprop)


@functools.partial(
    jax.jit,
    static_argnames=("f", "nsub", "method", "impulse", "actions"),
)
def propagate(
    f: Callable,
    x0: jnp.ndarray,
    u_ref: jnp.ndarray,
    p_ref: jnp.ndarray,
    t_grid: jnp.ndarray,
    *,
    nsub: int = 30,
    method: DiscretizationType = DiscretizationType.FOH,
    impulse: Optional[Callable] = None,
    actions: Optional[Callable] = None,
    consts=None,
):
    """Continuous-time closed-loop replay of a converged solution
    (reference discretization.jl:515-562 `propagate`).

    Integrates the nonlinear dynamics from x0 under linearly interpolated
    inputs (FOH) or per-interval coasting after impulses (IMPULSE). Returns
    (ts, xs): a (N-1)*nsub+1 fine grid and states on it.
    """
    from scptoolbox_tpu.parser.problem import bind_consts

    f = bind_consts(f, consts)
    impulse = bind_consts(impulse, consts)
    actions = bind_consts(actions, consts)
    u_ref = jnp.asarray(u_ref)
    t_grid = jnp.asarray(t_grid)
    N = t_grid.shape[0]

    def one_interval(x_k, inp):
        t_k, dt, u_k, u_kp1 = inp
        if method == DiscretizationType.IMPULSE:
            x_start = x_k + impulse(t_k, x_k, u_k, p_ref)
            u_of = lambda tau: jnp.zeros_like(u_k)
        else:
            x_start = x_k
            u_of = lambda tau: u_k + (u_kp1 - u_k) * (tau / dt)

        def rhs(tau, x):
            return f(t_k + tau, x, u_of(tau), p_ref)

        dsub = dt / nsub

        def body(x, i):
            x_new = rk4_step(rhs, x, i * dsub, dsub)
            if actions is not None:
                x_new = actions(x_new)
            return x_new, x_new

        x_end, xs = jax.lax.scan(body, x_start, jnp.arange(nsub))
        return x_end, xs

    dt_k = t_grid[1:] - t_grid[:-1]
    _, xs = jax.lax.scan(
        one_interval, jnp.asarray(x0),
        (t_grid[:-1], dt_k, u_ref[:-1], u_ref[1:]),
    )
    xs = jnp.concatenate([jnp.asarray(x0)[None], xs.reshape(-1, xs.shape[-1])], 0)
    # fine time grid
    taus = jnp.arange(1, nsub + 1) / nsub
    ts = (t_grid[:-1, None] + dt_k[:, None] * taus[None, :]).reshape(-1)
    ts = jnp.concatenate([t_grid[:1], ts])
    return ts, xs
