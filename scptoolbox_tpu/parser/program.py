"""Direct conic-program modeling layer: the TPU-native `ConicProgram`.

Replaces the reference's JuMP-macro modeling object (src/parser/program.jl:
34-102 `ConicProgram`, :125-194 `@new_variable/@new_parameter`, :217-243
`constraint!`, :262-290 `add_cost!`, :419-424 `solve!`) with a traced-function
design: no symbolic expressions — constraints are pure jnp functions returning
cone-tagged residual blocks (`ConeCon`), costs are affine/convex-quadratic
scalars, and affine/quadratic structure is extracted exactly by `jax.jacfwd` /
`jax.hessian`. The whole program lowers to ONE dense (A, b, c) conic problem
solved by the native batched IPM (ops/ipm.py) — and `solve` is jittable with
the declared parameters as traced inputs, so e.g. a golden-section sweep over
flight time re-solves without re-tracing (reference re-builds the JuMP model
per solve, rocket_landing/tests.jl:33).

Used directly by the LCvx examples (the reference's double_integrator /
rocket_landing definitions use the parser layer without the SCP stack,
README.md:48) and internally for guess projection and LP-based auto-scaling.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.config import default_dtype
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.parser.problem import ConeCon, ConeKind
from scptoolbox_tpu.solvers.subproblem import Assembler, RowPlan, VarLayout
from scptoolbox_tpu.solvers.template import BlockPoster, post_quadratic_epigraphs


def _interleave(order: Tuple[str, ...], vvals, pvals):
    """Reconstruct a user fn's positional args from the 'v'/'p' order
    tokens recorded at declaration."""
    vi = iter(vvals)
    pi = iter(pvals)
    return [next(vi) if tok == "v" else next(pi) for tok in order]


class Var(NamedTuple):
    """Handle to a named decision-variable block (reference ArgumentBlock,
    src/parser/block.jl:45-148 — minus the symbolic machinery)."""

    name: str
    shape: Tuple[int, ...]


class Par(NamedTuple):
    """Handle to a named numeric parameter block (reference @new_parameter,
    program.jl:634-676; parameters are traced `solve` inputs here)."""

    name: str
    shape: Tuple[int, ...]


class ProgramSolution(NamedTuple):
    values: Dict[str, jnp.ndarray]   # variable name -> solution block
    obj: jnp.ndarray                 # optimal objective (incl. constants)
    status: jnp.ndarray              # ipm.IPMStatus code
    duals: Dict[str, jnp.ndarray]    # constraint name -> dual block (rows z)
    x: jnp.ndarray                   # raw stacked decision vector
    z: jnp.ndarray                   # raw dual vector
    iters: jnp.ndarray


class _Constraint(NamedTuple):
    name: str
    fn: Callable
    var_args: Tuple[Var, ...]
    par_args: Tuple[Par, ...]
    order: Tuple[str, ...]           # "v"/"p" token per original arg
    kinds: Tuple[ConeKind, ...]
    dims: Tuple[int, ...]
    posters: Tuple[BlockPoster, ...]


class _Cost(NamedTuple):
    fn: Callable
    var_args: Tuple[Var, ...]
    par_args: Tuple[Par, ...]
    order: Tuple[str, ...]


class ConicProgram:
    """min Σ costs  s.t. cone constraints, over named variable blocks.

    Usage:
        prg = ConicProgram()
        x = prg.variable("x", N, 2)
        tf = prg.parameter("tf", 1.0)
        prg.add_constraint("dyn", lambda x, tf: [zero(...)], (x, tf))
        prg.add_cost(lambda x: jnp.sum(x**2), (x,))
        prg.build()
        sol = prg.solve(tf=2.0)

    Constraint fns receive the block VALUES (vars first, then pars, in the
    declared arg order) and return a list of ConeCon; they must be affine in
    the variables (cone residual contract; exact jacfwd extraction) but may
    be arbitrary traced functions of the parameters. Costs must be
    affine/convex-quadratic in the variables.
    """

    def __init__(self, dtype=None):
        self.dtype = dtype or default_dtype()
        self.layout = VarLayout()
        self.plan = RowPlan()
        self._vars: Dict[str, Var] = {}
        self._pars: Dict[str, Tuple[Par, jnp.ndarray]] = {}
        self._cons: List[_Constraint] = []
        self._costs: List[_Cost] = []
        self._scales: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._built = False
        self._n_epi = 0
        self._cost_linear: List[bool] = []

    # ---------------- declaration ----------------

    def variable(self, name: str, *shape: int) -> Var:
        assert not self._built
        v = Var(name, tuple(int(s) for s in shape))
        self.layout.add(name, *shape)
        self._vars[name] = v
        return v

    def parameter(self, name: str, example) -> Par:
        assert not self._built
        val = jnp.asarray(example, self.dtype)
        p = Par(name, tuple(val.shape))
        self._pars[name] = (p, val)
        return p

    def scale(self, var: Var, S, c) -> None:
        """Diagonal affine scaling advice x = S .* x_hat .+ c (reference
        @scale, block.jl:445-487): the IPM solves in the hatted variables."""
        S = jnp.broadcast_to(jnp.asarray(S, self.dtype),
                             var.shape).reshape(-1)
        c = jnp.broadcast_to(jnp.asarray(c, self.dtype),
                             var.shape).reshape(-1)
        self._scales[var.name] = (S, c)

    def _split_args(self, args):
        var_args = tuple(a for a in args if isinstance(a, Var))
        par_args = tuple(a for a in args if isinstance(a, Par))
        assert len(var_args) + len(par_args) == len(args)
        return var_args, par_args

    def _example_values(self, var_args, par_args):
        vvals = [jnp.zeros(v.shape, self.dtype) for v in var_args]
        pvals = [self._pars[p.name][1] for p in par_args]
        return vvals, pvals

    def add_constraint(self, name: str, fn: Callable, args: Sequence) -> None:
        """Declare cone constraints (reference @add_constraint,
        program.jl:734-763). `fn(*values)` -> list[ConeCon]; values follow
        the order of `args` (Var and Par handles, mixed freely)."""
        assert not self._built
        var_args, par_args = self._split_args(args)
        order = tuple("v" if isinstance(a, Var) else "p" for a in args)
        vvals, pvals = self._example_values(var_args, par_args)
        cons = fn(*_interleave(order, vvals, pvals))
        kinds = tuple(c.kind for c in cons)
        dims = tuple(int(np.prod(c.v.shape)) for c in cons)
        posters = tuple(
            BlockPoster(f"{name}{i}", k, d, 1, self.layout, self.plan)
            for i, (k, d) in enumerate(zip(kinds, dims))
        )
        self._cons.append(_Constraint(name, fn, var_args, par_args, order,
                                      kinds, dims, posters))

    def add_cost(self, fn: Callable, args: Sequence) -> None:
        """Declare an affine/convex-quadratic cost term (reference
        @add_cost, program.jl:778-788)."""
        assert not self._built
        var_args, par_args = self._split_args(args)
        order = tuple("v" if isinstance(a, Var) else "p" for a in args)
        self._costs.append(_Cost(fn, var_args, par_args, order))
        # probe the Hessian at default parameter values: structurally-linear
        # costs go straight into the objective vector (a zero-Hessian SOC
        # epigraph is a degenerate cone on which the IPM stalls)
        nd = sum(int(np.prod(v.shape)) for v in var_args)
        vvals, pvals = self._example_values(var_args, par_args)

        def scalar_probe(vec):
            sizes = [int(np.prod(v.shape)) for v in var_args]
            parts = jnp.split(vec, list(np.cumsum(sizes)[:-1]))
            shaped = [p.reshape(v.shape) for p, v in zip(parts, var_args)]
            return fn(*_interleave(order, shaped, pvals))

        H = jax.hessian(scalar_probe)(jnp.zeros(nd, self.dtype))
        linear = bool(np.max(np.abs(np.asarray(H))) == 0.0)
        self._cost_linear.append(linear)
        if not linear:
            self.layout.add(f"_t_cost{self._n_epi}")
            self.plan.soc(f"_cost_epi{self._n_epi}", 1, nd + 2)
        self._n_epi += 1

    # ---------------- build + solve ----------------

    def build(self) -> None:
        assert not self._built
        self.spec = self.plan.freeze()
        self.n = self.layout.n
        self.m = self.plan.m
        S = jnp.ones(self.n, self.dtype)
        c = jnp.zeros(self.n, self.dtype)
        for name, (Sv, cv) in self._scales.items():
            S = S.at[self.layout.sl(name)].set(Sv)
            c = c.at[self.layout.sl(name)].set(cv)
        self._S_full, self._c_full = S, c
        self._built = True

    def _assemble(self, pvals: Dict[str, jnp.ndarray]):
        asm = Assembler(self.m, self.n, self.dtype)
        for con in self._cons:
            # stack all var args into one vector for exact affine extraction
            sizes = [int(np.prod(v.shape)) for v in con.var_args]
            splits = list(np.cumsum(sizes)[:-1])
            cols = np.concatenate(
                [self.layout.idx(v.name).reshape(-1) for v in con.var_args])
            pv = [pvals[p.name] for p in con.par_args]

            def stacked(vec, con=con, splits=splits, pv=pv):
                parts = jnp.split(vec, splits)
                shaped = [p.reshape(v.shape)
                          for p, v in zip(parts, con.var_args)]
                cons_out = con.fn(*_interleave(con.order, shaped, pv))
                return jnp.concatenate(
                    [cc.v.reshape(-1) for cc in cons_out])

            at0 = jnp.zeros(int(sum(sizes)), self.dtype)
            v0 = stacked(at0)
            J = jax.jacfwd(stacked)(at0)
            off = 0
            for po in con.posters:
                po.post(asm, self.plan, self.layout, cols[None, :],
                        J[None, off:off + po.dim, :],
                        v0[None, off:off + po.dim])
                off += po.dim

        for i, cost in enumerate(self._costs):
            sizes = [int(np.prod(v.shape)) for v in cost.var_args]
            splits = list(np.cumsum(sizes)[:-1])
            cols = np.concatenate(
                [self.layout.idx(v.name).reshape(-1) for v in cost.var_args])
            pv = [pvals[p.name] for p in cost.par_args]

            def scalar(vec, cost=cost, splits=splits, pv=pv):
                parts = jnp.split(vec, splits)
                shaped = [p.reshape(v.shape)
                          for p, v in zip(parts, cost.var_args)]
                return cost.fn(*_interleave(cost.order, shaped, pv))

            d0 = jnp.zeros(int(sum(sizes)), self.dtype)
            c0 = scalar(d0)
            g = jax.grad(scalar)(d0)
            if self._cost_linear[i]:
                # structurally-linear term: straight into the objective
                asm.add_c(cols, g)
                asm.add_const(c0)
            else:
                H = jax.hessian(scalar)(d0)
                post_quadratic_epigraphs(
                    asm, self.plan.rows(f"_cost_epi{i}"), cols[None, :],
                    self.layout.idx(f"_t_cost{i}").reshape(1),
                    H[None], g[None], c0[None], d0[None])
                asm.add_c(self.layout.idx(f"_t_cost{i}").reshape(1),
                          jnp.ones(1, self.dtype))

        return asm.finish(self._S_full, self._c_full)

    # NOTE: never jit with `self` as a static argument — ConicProgram hashes
    # by id, and after garbage collection a NEW instance can alias a dead
    # one's id, silently reusing a stale trace with the old program's
    # constants baked in. A per-instance jitted closure avoids this.
    @property
    def _solve_jit(self):
        fn = self.__dict__.get("_solve_jit_fn")
        if fn is None:
            fn = jax.jit(self._solve_impl,
                         static_argnames=("tol", "max_iter"))
            self.__dict__["_solve_jit_fn"] = fn
        return fn

    def _solve_impl(self, pvals, tol, max_iter):
        A, b, c, const = self._assemble(pvals)
        sol = ipm.solve(A, b, c, self.spec, tol=tol, max_iter=max_iter)
        d = self._S_full * sol.x + self._c_full
        values = {name: d[self.layout.sl(name)].reshape(v.shape)
                  for name, v in self._vars.items()}
        duals = {}
        for con in self._cons:
            for i, po in enumerate(con.posters):
                nm = f"{con.name}{i}"
                if po.kind in (ConeKind.ZERO, ConeKind.NONPOS):
                    duals[nm] = sol.z[self.plan.rows(nm)]
                elif po.kind in (ConeKind.SOC, ConeKind.GEOM, ConeKind.EXP):
                    duals[nm] = sol.z[self.plan.rows(nm)].reshape(-1)
        return ProgramSolution(values=values, obj=sol.obj + const,
                               status=sol.status, duals=duals, x=d,
                               z=sol.z, iters=sol.iters)

    # ---------------- introspection / pretty printing ----------------
    # (reference regex-searchable accessors program.jl:334-403 and the
    # show methods of printing.jl:33-99)

    def constraints(self, pattern: str = ".*"):
        """Constraint groups whose name matches the regex (reference
        `constraints(prg, "name")`, program.jl:334-403). Returns
        [(name, kinds, dims)]."""
        import re

        rx = re.compile(pattern)
        return [(c.name, tuple(k.name for k in c.kinds), c.dims)
                for c in self._cons if rx.search(c.name)]

    def variables(self, pattern: str = ".*"):
        """Variable blocks matching the regex: [(name, shape)]."""
        import re

        rx = re.compile(pattern)
        return [(name, v.shape) for name, v in self._vars.items()
                if rx.search(name)]

    def parameters(self, pattern: str = ".*"):
        """Parameter blocks matching the regex: [(name, shape)]."""
        import re

        rx = re.compile(pattern)
        return [(name, p.shape) for name, (p, _) in self._pars.items()
                if rx.search(name)]

    def describe(self) -> str:
        """Human-readable program summary (the reference's show methods,
        printing.jl:33-99, without the symbolic expression rendering its
        JuMP layer carries)."""
        lines = [f"ConicProgram ({'built' if self._built else 'unbuilt'}): "
                 f"{self.layout.n} variables"
                 + (f", {self.plan.m} rows" if self._built else "")]
        if self._vars:
            lines.append("  variables:")
            for name, v in self._vars.items():
                shp = "scalar" if not v.shape else str(v.shape)
                lines.append(f"    {name}: {shp}")
        if self._pars:
            lines.append("  parameters:")
            for name, (p, val) in self._pars.items():
                shp = "scalar" if not p.shape else str(p.shape)
                lines.append(f"    {name}: {shp}")
        if self._cons:
            lines.append("  constraints:")
            for c in self._cons:
                blocks = ", ".join(
                    f"{k.name}({d})" for k, d in zip(c.kinds, c.dims))
                lines.append(f"    {c.name}: {blocks}")
        if self._costs:
            lines.append(f"  costs: {len(self._costs)} term(s)"
                         + ("" if all(self._cost_linear)
                            else " (quadratic epigraphs lowered)"))
        return "\n".join(lines)

    def __repr__(self) -> str:
        return self.describe()

    def solve(self, tol: float = 1e-8, max_iter: int = 60,
              backend: str = "jax", **params) -> ProgramSolution:
        """Solve with the given parameter values (jittable; re-solving with
        new parameter values does not re-trace).

        backend="native" dispatches the assembled problem to the host C++
        IPM (scptoolbox_tpu/native.py) — useful for micro-solves where a
        device round trip dominates (golden-search probes, scaling LPs);
        requires a working g++ toolchain, falls back to the JAX path
        otherwise."""
        assert self._built, "call build() first"
        pvals = {name: jnp.asarray(params.get(name, default), self.dtype)
                 for name, (_, default) in self._pars.items()}
        if backend == "native":
            from scptoolbox_tpu import native

            if native.available():
                return self._solve_native(pvals, tol, max_iter)
        return self._solve_jit(pvals, tol, max_iter)

    def _solve_native(self, pvals, tol, max_iter) -> ProgramSolution:
        from scptoolbox_tpu import native

        A, b, c, const = self._assemble(pvals)
        nsol = native.solve(np.asarray(A), np.asarray(b), np.asarray(c),
                            self.spec, tol=tol, max_iter=max_iter)
        d = (np.asarray(self._S_full) * nsol.x + np.asarray(self._c_full))
        values = {name: jnp.asarray(d[self.layout.sl(name)].reshape(v.shape),
                                    self.dtype)
                  for name, v in self._vars.items()}
        duals = {}
        for con in self._cons:
            for i, po in enumerate(con.posters):
                nm = f"{con.name}{i}"
                if po.kind in (ConeKind.ZERO, ConeKind.NONPOS):
                    duals[nm] = jnp.asarray(nsol.z[self.plan.rows(nm)],
                                            self.dtype)
                elif po.kind in (ConeKind.SOC, ConeKind.GEOM, ConeKind.EXP):
                    duals[nm] = jnp.asarray(
                        nsol.z[self.plan.rows(nm)].reshape(-1), self.dtype)
        return ProgramSolution(
            values=values, obj=jnp.asarray(nsol.obj, self.dtype) + const,
            status=jnp.asarray(int(nsol.status), jnp.int32), duals=duals,
            x=jnp.asarray(d, self.dtype), z=jnp.asarray(nsol.z, self.dtype),
            iters=jnp.asarray(nsol.iters, jnp.int32))
