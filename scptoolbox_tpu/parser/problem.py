"""Trajectory problem definition: the TPU-native modeling layer.

Replaces BOTH reference layers L2 (the JuMP-macro conic parser,
src/parser/{program,block,cone,constraint,cost}.jl, ~3k LoC of
metaprogramming) and L3 (src/parser/problem.jl `TrajectoryProblem` +
`problem_set_*!` setters): a problem is a dataclass of *pure JAX functions*.

Key design shifts (not a port):
  * constraints are functions returning cone-tagged residual blocks
    (`ConeCon`); there is no symbolic expression graph. Affine/conic
    structure is extracted by `jax.jacfwd` at the reference point — exact
    for the affine-in-decision-variables functions the contract requires
    (the same contract JuMP's affine expressions impose on the reference).
  * Jacobians of dynamics, nonconvex path constraints, and boundary
    conditions come from AD by default; the reference requires them
    hand-derived (problem.jl:432-497, :562-589, :603-626).
  * costs must be affine or convex-quadratic in (x, u, p); the quadratic
    part is extracted by AD Hessians and enforced through SOC epigraphs
    (JuMP does the same bridging for ECOS).
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import inspect
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops.discretize import DiscretizationType


def wants_consts(fn: Optional[Callable]) -> bool:
    """True when a problem callback declares a trailing `consts` parameter
    (the opt-in for receiving TrajectoryProblem.consts as a traced input)."""
    if fn is None:
        return False
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    return "consts" in sig.parameters


def bind_consts(fn: Optional[Callable], consts) -> Optional[Callable]:
    """Bind the traced `consts` pytree into a callback that asks for it
    (keyword `consts`); callbacks that don't declare it are returned as-is.

    This is the TPU-native replacement for the reference's mutable
    `pbm.mdl` model object that user closures read at call time (e.g. the
    homotopy sharpness `traj.kappa1` mutated between solves,
    oscillator/tests.jl:64-72, rendezvous_3d definition.jl:96-148): here
    such values are a pytree passed as a TRACED argument through the jitted
    SCP step, so updating them re-runs the same compiled program.
    """
    if fn is None or not wants_consts(fn):
        return fn
    return functools.partial(fn, consts=consts)


class ConeKind(enum.Enum):
    """Cone tags for constraint residual blocks (reference cone.jl:48
    `SupportedCone`; L1/LINF/GEOM are lowered at build time, EXP posts
    native 3-dim exponential-cone rows solved by the IPM's nonsymmetric
    path, reference cone.jl:103-171 ExponentialCone)."""

    ZERO = "zero"      # v = 0
    NONPOS = "nonpos"  # v <= 0 elementwise
    SOC = "soc"        # v[0] >= ||v[1:]||_2
    L1 = "l1"          # v[0] >= ||v[1:]||_1   (lowered: aux slacks)
    LINF = "linf"      # v[0] >= max|v[1:]|    (lowered: linear rows)
    GEOM = "geom"      # geomean(v[1:]) >= v[0] (lowered to SOC, 2-term)
    EXP = "exp"        # (x, y, z): y > 0, y e^{x/y} <= z (native)


class ConeCon(NamedTuple):
    """A residual vector tagged with its cone: `v in K`."""

    kind: ConeKind
    v: jnp.ndarray


def zero(v) -> ConeCon:
    return ConeCon(ConeKind.ZERO, jnp.atleast_1d(v))


def nonpos(v) -> ConeCon:
    return ConeCon(ConeKind.NONPOS, jnp.atleast_1d(v))


def soc(v) -> ConeCon:
    return ConeCon(ConeKind.SOC, jnp.atleast_1d(v))


def l1(v) -> ConeCon:
    return ConeCon(ConeKind.L1, jnp.atleast_1d(v))


def linf(v) -> ConeCon:
    return ConeCon(ConeKind.LINF, jnp.atleast_1d(v))


def geom(v) -> ConeCon:
    return ConeCon(ConeKind.GEOM, jnp.atleast_1d(v))


def exp_cone(v) -> ConeCon:
    """v = (x, y, z) in K_exp = cl{y > 0, y e^{x/y} <= z} (reference
    @add_constraint EXP, cone.jl:48/:103-171)."""
    v = jnp.atleast_1d(v)
    return ConeCon(ConeKind.EXP, v)


class BoundingBox(NamedTuple):
    """Per-dimension (min, max) scaling advice
    (reference problem.jl:263-283 `problem_advise_scale!`)."""

    lo: jnp.ndarray
    hi: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GuSTORunningCost:
    """GuSTO's structured running cost (reference problem.jl:365-418
    `problem_set_running_cost!` :gusto branch):

        Gamma(t, k, x, u, p) = u' S(t, k, p) u + ell(t, k, x, p)' u
                               + g(t, k, x, p).

    Each term carries a convexity flag (the reference infers convexity from
    which hand-written Jacobians are absent, problem.jl:407-415; here the
    Jacobians come from AD so the flags are explicit):

      * `*_cvx=True`: the term is kept exact in the convex subproblem. For
        exactness of the traced quadratic extraction this requires the term
        to be affine/convex-quadratic in the decision variables: S constant
        in p (PSD), ell constant in (x, p), g affine/convex-quadratic —
        the same DCP discipline JuMP enforces on the reference's symbolic
        expressions.
      * `*_cvx=False`: the term is LINEARIZED about the reference
        trajectory in the convex subproblem (reference gusto.jl:570-707:
        uSu1 / ull1 / g1 first-order expansions), while the TRUE cost
        evaluation (J_aug, the accept/reject ratio) uses the exact value
        (gusto.jl :nonconvex branch).

    Callables may be None (term absent). Signatures:
        S(t, k, p[, consts]) -> (nu, nu);  ell(t, k, x, p[, consts]) ->
        (nu,);  g(t, k, x, p[, consts]) -> scalar.
    Consumed by solvers.gusto.GuSTO via `make_gusto_running_cost`."""

    S: Optional[Callable] = None
    ell: Optional[Callable] = None
    g: Optional[Callable] = None
    S_cvx: bool = True
    ell_cvx: bool = True
    g_cvx: bool = True


def _taylor1(scalar_fn: Callable) -> Callable:
    """First-order wrapper: value and gradient of `scalar_fn(d)` are exact
    at EVERY point, but the AD Hessian is identically zero. Composing the
    convex subproblem's quadratic extraction (which expands about the
    reference trajectory) with this wrapper therefore posts exactly the
    reference's linearize-if-nonconvex running cost (gusto.jl:570-707):
    value + gradient at the reference, no curvature."""

    def wrapped(d):
        d0 = jax.lax.stop_gradient(d)
        v0, grad0 = jax.value_and_grad(scalar_fn)(d0)
        return v0 + jnp.dot(grad0, d - d0)

    return wrapped


def make_gusto_running_cost(spec: GuSTORunningCost, nx: int,
                            nu: int) -> Callable:
    """Synthesize a `running_cost(t, k, x, u, p[, consts])` from the
    structured GuSTO triple. The returned function's VALUE is the exact
    Gamma everywhere (so J_aug / the rho ratio use the true cost,
    gusto.jl:925-951), while terms flagged nonconvex are wrapped so their
    AD Hessian vanishes — the subproblem template's quadratic expansion
    about the reference then reproduces the reference's convexification
    term by term."""

    def running_cost(t, k, x, u, p, consts=None):
        def term_value(d):
            xx = d[:nx]
            uu = d[nx:nx + nu]
            pp = d[nx + nu:]
            kw = {} if consts is None else {"consts": consts}
            parts = []
            if spec.S is not None:
                Sv = spec.S(t, k, pp, **kw) if wants_consts(spec.S) \
                    else spec.S(t, k, pp)
                parts.append(("S", uu @ Sv @ uu))
            if spec.ell is not None:
                lv = spec.ell(t, k, xx, pp, **kw) if wants_consts(spec.ell) \
                    else spec.ell(t, k, xx, pp)
                parts.append(("ell", lv @ uu))
            if spec.g is not None:
                gv = spec.g(t, k, xx, pp, **kw) if wants_consts(spec.g) \
                    else spec.g(t, k, xx, pp)
                parts.append(("g", gv))
            return parts

        d = jnp.concatenate([x, u, p])
        flags = {"S": spec.S_cvx, "ell": spec.ell_cvx, "g": spec.g_cvx}
        total = jnp.zeros((), d.dtype)
        for name, cvx in flags.items():
            def one(dd, name=name):
                for nm, v in term_value(dd):
                    if nm == name:
                        return v
                return jnp.zeros((), dd.dtype)

            if (name == "S" and spec.S is None) or \
               (name == "ell" and spec.ell is None) or \
               (name == "g" and spec.g is None):
                continue
            total = total + (one(d) if cvx else _taylor1(one)(d))
        return total

    return running_cost


@dataclasses.dataclass
class TrajectoryProblem:
    """Definition of a nonconvex trajectory optimization problem
    (capability parity with reference src/parser/problem.jl:64-121).

    All callables are pure jnp functions; `k` arguments are traced node
    indices (use masks/weights, never Python branches, for per-node logic).

    Required:
      nx, nu, np: state/input/parameter dimensions.
      f: dynamics `f(t, x, u, p) -> (nx,)` (IMPULSE: the coasting field).
      guess: `(N) -> (x (N,nx), u (N,nu), p (np,))` initial trajectory.

    Optional (None = absent):
      jac: analytic `(t,x,u,p) -> (A,B,F)` overriding AD.
      impulse: `(t,x,u,p) -> (nx,)` state jump (IMPULSE discretization).
      terminal_cost: `phi(xf, p) -> scalar`, affine/convex-quadratic.
      running_cost: `Gamma(t, k, x, u, p) -> scalar`, affine/convex-quadratic
        (SCvx/PTR form, reference problem.jl:365-418).
      X: convex state set `(t, k, x, p) -> [ConeCon, ...]` — affine residuals.
      U: convex input set `(t, k, u, p) -> [ConeCon, ...]` — affine residuals.
      s: nonconvex path constraints `(t, k, x, u, p) -> (ns,)`, enforced
        s <= 0 by linearization + slack (reference problem.jl:562-589); its
        C, D, G Jacobians come from AD.
      gic/gtc: boundary conditions `g(x, p) -> vector` = 0 (linearized with
        AD; reference problem.jl:603-626 requires H, K by hand).
      integration_actions: post-RK4-step state fixup `x -> x` (e.g.
        quaternion renormalization, reference problem.jl:296-305).
      xrg/urg/prg: BoundingBox scaling advice; when absent, scaling derives
        from the guess trajectory's ranges (the reference instead solves
        min/max LPs per variable, scp.jl:376-517 — available separately).
      callback: host-side per-iteration hook `(iteration_state) -> bool`;
        returning True suppresses stopping (reference problem.jl:322-354).
      consts: pytree of problem constants. Any callback that declares a
        trailing `consts` parameter receives it as a TRACED input, so
        host-side updates (homotopy ladders, parameter sweeps) re-run the
        compiled step without re-tracing (replaces the reference's mutable
        `pbm.mdl` read by user closures).
    """

    nx: int
    nu: int
    np: int
    f: Callable
    guess: Callable
    consts: Any = None
    jac: Optional[Callable] = None
    impulse: Optional[Callable] = None
    terminal_cost: Optional[Callable] = None
    running_cost: Optional[Callable] = None
    X: Optional[Callable] = None
    U: Optional[Callable] = None
    s: Optional[Callable] = None
    gic: Optional[Callable] = None
    gtc: Optional[Callable] = None
    integration_actions: Optional[Callable] = None
    xrg: Optional[BoundingBox] = None
    urg: Optional[BoundingBox] = None
    prg: Optional[BoundingBox] = None
    callback: Optional[Callable] = None
    # GuSTO structured running cost u'S u + ell'u + g with per-term
    # convexity flags (reference problem.jl:365-418 :gusto branch);
    # consumed by solvers.gusto.GuSTO, which synthesizes `running_cost`
    # from it when `running_cost` is absent
    gusto_cost: Optional["GuSTORunningCost"] = None
    # force hard enforcement of the convex state set X even under GuSTO
    # (reference problem.jl `force_hard`; GuSTO otherwise relaxes X with
    # indicator variables and soft penalties, problem.jl:686-807)
    force_hard: bool = False
    # user-extensible progress-table columns (reference
    # problem_add_table_column!, problem.jl:649-659): list of
    # (key, heading, format, fn) where fn(rec: IterationRecord) -> value;
    # the solvers append them to their verbose tables, so callbacks can
    # surface custom per-iteration data (e.g. the rendezvous homotopy
    # rung, reference rendezvous_3d definition.jl:141-148)
    table_columns: list = dataclasses.field(default_factory=list)

    def add_table_column(self, key: str, heading: str, fmt: str,
                         fn: Callable) -> None:
        """Append a custom progress-table column
        (problem_add_table_column!, problem.jl:649-659)."""
        self.table_columns.append((key, heading, fmt, fn))

    def dims(self) -> Tuple[int, int, int]:
        return self.nx, self.nu, self.np


# --------------------------------------------------------------------------
# Affine extraction: turn cone-tagged residual functions into subproblem rows
# --------------------------------------------------------------------------


class AffineBlocks(NamedTuple):
    """Affine form of a list of ConeCons wrt stacked args:
    v_i(args) = J_i @ concat(args) + v0_i, tagged with kinds/dims (static)."""

    kinds: Tuple[ConeKind, ...]
    dims: Tuple[int, ...]
    J: jnp.ndarray   # (sum dims, total arg dim)
    v0: jnp.ndarray  # (sum dims,)


def constraint_structure(fn: Callable, *example_args) -> Tuple[Tuple[ConeKind, ...], Tuple[int, ...]]:
    """Evaluate once with example arguments to learn the static structure
    (number of blocks, their kinds and dimensions)."""
    cons = fn(*example_args)
    kinds = tuple(c.kind for c in cons)
    dims = tuple(int(c.v.shape[0]) for c in cons)
    return kinds, dims


def affine_blocks(fn: Callable, args: Sequence[jnp.ndarray],
                  static_args: Sequence = ()) -> AffineBlocks:
    """Extract (J, v0) of the stacked residuals of `fn(*static_args, *args)`
    with respect to concat(args), evaluated at `args`.

    EXACT when the residuals are affine in args (the convex-constraint
    contract); for nonconvex path constraints this is the linearization
    the SCP algorithms require anyway.
    """
    sizes = [int(a.shape[0]) for a in args]
    splits = np.cumsum(sizes)[:-1]

    def stacked(vec):
        parts = jnp.split(vec, splits)
        cons = fn(*static_args, *parts)
        return jnp.concatenate([c.v for c in cons]) if cons else jnp.zeros(0)

    at = jnp.concatenate(args) if args else jnp.zeros(0)
    v_ref = stacked(at)
    J = jax.jacfwd(stacked)(at)
    v0 = v_ref - J @ at
    cons = fn(*static_args, *args)
    kinds = tuple(c.kind for c in cons)
    dims = tuple(int(c.v.shape[0]) for c in cons)
    return AffineBlocks(kinds=kinds, dims=dims, J=J, v0=v0)


class QuadraticForm(NamedTuple):
    """Second-order expansion of a scalar cost at a reference point:
    J(d) = 0.5 (d-d0)'H(d-d0) + g'(d-d0) + c. Exact for quadratic costs."""

    H: jnp.ndarray
    g: jnp.ndarray
    c: jnp.ndarray
    d0: jnp.ndarray


def quadratic_form(fn: Callable, args: Sequence[jnp.ndarray],
                   static_args: Sequence = ()) -> QuadraticForm:
    """Extract the quadratic form of `fn(*static_args, *args)` wrt
    concat(args) by AD (value, gradient, Hessian at the reference)."""
    sizes = [int(a.shape[0]) for a in args]
    splits = np.cumsum(sizes)[:-1]

    def scalar(vec):
        parts = jnp.split(vec, splits)
        return fn(*static_args, *parts)

    d0 = jnp.concatenate(args)
    c = scalar(d0)
    g = jax.grad(scalar)(d0)
    H = jax.hessian(scalar)(d0)
    return QuadraticForm(H=H, g=g, c=c, d0=d0)
