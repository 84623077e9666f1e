"""SCP subproblem template: the static structure + traced assembly shared by
the PTR / SCvx / GuSTO outer loops.

This is the TPU-native replacement for the reference's per-iteration JuMP
model construction (reference src/solvers/scp.jl:552-895 `compute_original_
cost!`, `add_dynamics!`, `add_convex_state_constraints!`,
`add_convex_input_constraints!`, `add_nonconvex_constraints!`, `add_bcs!`;
invoked from each algorithm's `Subproblem` constructor, e.g. ptr.jl:470).
Instead of rebuilding a symbolic model every iteration, the STRUCTURE
(variable blocks, constraint row counts, cone spec) is probed ONCE from the
user's problem functions, and a single traced `assemble` emits the dense
(A, b, c) conic program each iteration from the current reference trajectory
and its DLTV linearization — fully jittable, vmappable across scenario
batches.

Conventions:
  * Decision variables live in PHYSICAL units during assembly; the diagonal
    scaling x = Sx x_hat + cx (reference scaling.jl:38, scp.jl:376) is
    applied once at the end by `Assembler.finish`, so the IPM solves in the
    well-conditioned hatted variables.
  * User convex-set functions X(t,k,x,p) / U(t,k,u,p) must return residuals
    AFFINE in their decision arguments with a STRUCTURE (cone kinds/dims)
    independent of the node index k — per-node variation goes through the
    traced values (t, k), masks, or weights, exactly the fixed-shape
    discipline jit requires.
  * Nonconvex path constraints s(t,k,x,u,p) and boundary conditions
    gic/gtc(x,p) are linearized about the reference with `jax.jacfwd`
    (the reference requires hand-coded C, D, G, H, K Jacobians,
    problem.jl:562-589, :603-626).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops.cones import ConeSpec
from scptoolbox_tpu.parser.problem import (ConeKind, TrajectoryProblem,
                                           bind_consts)
from scptoolbox_tpu.solvers.scaling import Scaling
from scptoolbox_tpu.solvers.subproblem import Assembler, RowPlan, VarLayout


def _perturb_consts(consts, rng: np.random.Generator):
    """A consts pytree with every float leaf pushed strictly away from zero
    (used to probe structure at consts values other than the construction
    ones — runtime consts are traced inputs and may change, e.g. homotopy
    ladders)."""

    def pert(leaf):
        a = jnp.asarray(leaf)
        if not jnp.issubdtype(a.dtype, jnp.floating):
            return leaf
        off = 0.37 + 0.23 * np.abs(rng.standard_normal(a.shape))
        return a * (1.0 + 0.1 * off) + jnp.asarray(off, a.dtype)

    return jax.tree_util.tree_map(pert, consts)


def trapezoid_weights(t_grid: np.ndarray) -> np.ndarray:
    """Trapezoid quadrature weights over the node grid (reference trapz,
    src/utils/helper.jl:560-574): trapz(v, t) == w @ v."""
    t = np.asarray(t_grid)
    dt = np.diff(t)
    w = np.zeros(t.shape[0])
    w[:-1] += dt / 2
    w[1:] += dt / 2
    return w


# ---------------------------------------------------------------------------
# Batched cone-block posting (with lowering of L1 / LINF / GEOM)
# ---------------------------------------------------------------------------


class BlockPoster:
    """Plans rows (and any auxiliary variables) for `count` copies of one
    affine cone block `v in K`, v of dimension `dim`, then posts the traced
    coefficients at assembly time.

    Lowerings (performed here, as JuMP/MOI bridges do for ECOS — reference
    cone.jl:103-171 maps L1/LINF to MOI Norm{One,Infinity}Cone which ECOS
    receives bridged to linear+SOC):
      L1    v[0] >= ||v[1:]||_1   -> aux w: +-v[1:] <= w, sum(w) <= v[0]
      LINF  v[0] >= max|v[1:]|    -> +-v[1:] <= v[0]
      GEOM  (t, x1, x2) with sqrt(x1 x2) >= t (3-dim only)
                                  -> SOC [x1+x2, 2t, x1-x2]
    """

    def __init__(self, name: str, kind: ConeKind, dim: int, count: int,
                 layout: VarLayout, plan: RowPlan):
        self.name = name
        self.kind = kind
        self.dim = int(dim)
        self.count = int(count)
        if kind == ConeKind.ZERO:
            plan.zero(name, count * dim)
        elif kind == ConeKind.NONPOS:
            plan.nonneg(name, count * dim)
        elif kind == ConeKind.SOC:
            plan.soc(name, count, dim)
        elif kind == ConeKind.L1:
            layout.add(name + "_aux", count, dim - 1)
            plan.nonneg(name + "_lo", count * (dim - 1))
            plan.nonneg(name + "_hi", count * (dim - 1))
            plan.nonneg(name + "_sum", count)
        elif kind == ConeKind.LINF:
            plan.nonneg(name + "_lo", count * (dim - 1))
            plan.nonneg(name + "_hi", count * (dim - 1))
        elif kind == ConeKind.GEOM:
            # general n-dim geometric-mean cone (t, x_1..x_n), n = dim-1
            # (reference cone.jl:103-171 via MOI GeometricMeanCone):
            # lowered to a balanced binary tree of sqrt nodes
            # w >= sqrt(u v) <=> SOC [u+v, 2w, u-v], leaves padded with t
            # itself (geomean(x, t..t) >= t <=> geomean(x) >= t), root
            # node pinned to t — (m-1) SOC(3) blocks and (m-2) aux
            # variables per copy, m = next power of two >= n
            n_leaf = dim - 1
            assert n_leaf >= 1
            if n_leaf == 1:
                # t <= x_1: a single nonneg row
                plan.nonneg(name, count)
                self._geom_tree = None
            else:
                m_leaf = 1 << (n_leaf - 1).bit_length()
                level = ([("res", i + 1) for i in range(n_leaf)]
                         + [("res", 0)] * (m_leaf - n_leaf))
                aux = 0
                pairs = []
                while len(level) > 2:
                    nxt = []
                    for a, b2 in zip(level[0::2], level[1::2]):
                        w = ("aux", aux)
                        aux += 1
                        pairs.append((a, b2, w))
                        nxt.append(w)
                    level = nxt
                pairs.append((level[0], level[1], ("res", 0)))
                self._geom_tree = pairs
                self._geom_naux = aux
                if aux:
                    layout.add(name + "_aux", count, aux)
                plan.soc(name, count * len(pairs), 3)
        elif kind == ConeKind.EXP:
            # native 3-dim exponential cone rows (nonsymmetric IPM path,
            # reference cone.jl:103-171 ExponentialCone)
            assert dim == 3, f"EXP cone blocks are 3-dim, got {dim}"
            plan.exp(name, count)
        else:
            raise NotImplementedError(f"cone kind {kind}")

    def post(self, asm: Assembler, plan: RowPlan, layout: VarLayout,
             cols: np.ndarray, J, v0) -> None:
        """Post the block. cols (count, nc) static column indices;
        J (count, dim, nc), v0 (count, dim) traced values of the affine
        residual v = J d[cols] + v0 per copy."""
        name, count, dim = self.name, self.count, self.dim
        kind = self.kind
        J = jnp.asarray(J)
        v0 = jnp.asarray(v0)
        if kind in (ConeKind.ZERO, ConeKind.NONPOS):
            rows = plan.rows(name).reshape(count, dim)
            asm.add_A(rows, cols, J)
            asm.add_b(rows, -v0)
        elif kind == ConeKind.SOC:
            asm.res_soc(plan.rows(name), cols, J, v0)
        elif kind == ConeKind.EXP:
            asm.res_exp(plan.rows(name), cols, J, v0)
        elif kind == ConeKind.L1:
            aux = layout.idx(name + "_aux")  # (count, dim-1)
            d1 = dim - 1
            eye = jnp.broadcast_to(jnp.eye(d1, dtype=J.dtype), (count, d1, d1))
            lo = plan.rows(name + "_lo").reshape(count, d1)
            asm.add_A(lo, cols, J[:, 1:, :])
            asm.add_A(lo, aux, -eye)
            asm.add_b(lo, -v0[:, 1:])
            hi = plan.rows(name + "_hi").reshape(count, d1)
            asm.add_A(hi, cols, -J[:, 1:, :])
            asm.add_A(hi, aux, -eye)
            asm.add_b(hi, v0[:, 1:])
            sm = plan.rows(name + "_sum").reshape(count, 1)
            asm.add_A(sm, cols, -J[:, 0:1, :])
            asm.add_A(sm, aux, jnp.ones((count, 1, d1), J.dtype))
            asm.add_b(sm, v0[:, 0:1])
        elif kind == ConeKind.LINF:
            d1 = dim - 1
            lo = plan.rows(name + "_lo").reshape(count, d1)
            asm.add_A(lo, cols, J[:, 1:, :] - J[:, 0:1, :])
            asm.add_b(lo, -(v0[:, 1:] - v0[:, 0:1]))
            hi = plan.rows(name + "_hi").reshape(count, d1)
            asm.add_A(hi, cols, -J[:, 1:, :] - J[:, 0:1, :])
            asm.add_b(hi, v0[:, 1:] + v0[:, 0:1])
        elif kind == ConeKind.GEOM:
            if self._geom_tree is None:
                # n = 1: t <= x_1 is a single nonneg row x_1 - t >= 0
                rows = plan.rows(name).reshape(count, 1)
                asm.add_A(rows, cols, J[:, 0:1, :] - J[:, 1:2, :])
                asm.add_b(rows, v0[:, 1] - v0[:, 0])
                return
            # binary sqrt tree: node (a, b, w) posts
            # [val(a)+val(b), 2 val(w), val(a)-val(b)] in SOC(3)
            naux = self._geom_naux
            nc = cols.shape[1]
            aux_cols = (np.asarray(layout.idx(name + "_aux"))
                        .reshape(count, naux) if naux else
                        np.zeros((count, 0), int))
            all_cols = np.concatenate([np.asarray(cols), aux_cols], axis=1)
            dtj = J.dtype
            Jx = jnp.concatenate(
                [J, jnp.zeros((count, dim, naux), dtj)], axis=2)

            def val(entry):
                """(J_row (count, nc+naux), v0_row (count,)) of a node."""
                tag, i = entry
                if tag == "res":
                    return Jx[:, i, :], v0[:, i]
                row = jnp.zeros((count, nc + naux), dtj)
                row = row.at[:, nc + i].set(1.0)
                return row, jnp.zeros((count,), dtj)

            n_pairs = len(self._geom_tree)
            rows = plan.rows(name).reshape(count, n_pairs, 3)
            Jrows = []
            v0rows = []
            for (a, b2, w) in self._geom_tree:
                Ja, va = val(a)
                Jb, vb = val(b2)
                Jw, vw = val(w)
                Jrows.append(jnp.stack([Ja + Jb, 2.0 * Jw, Ja - Jb], axis=1))
                v0rows.append(jnp.stack([va + vb, 2.0 * vw, va - vb],
                                        axis=1))
            Jt = jnp.stack(Jrows, axis=1).reshape(count * n_pairs, 3, -1)
            v0t = jnp.stack(v0rows, axis=1).reshape(count * n_pairs, 3)
            colt = np.broadcast_to(all_cols[:, None, :],
                                   (count, n_pairs, all_cols.shape[1])
                                   ).reshape(count * n_pairs, -1)
            asm.res_soc(rows.reshape(count * n_pairs, 3), colt, Jt, v0t)


def post_quadratic_epigraphs(
    asm: Assembler, rows: np.ndarray, d_cols: np.ndarray, t_cols: np.ndarray,
    H, g, c0, d0,
) -> None:
    """Batched epigraph  t_i >= 0.5 (d-d0)'H(d-d0) + g'(d-d0) + c0  as SOC
    blocks of dim dv+2 (the bridging JuMP/MOI performs for quadratic costs
    over ECOS; reference QuadraticCost src/parser/cost.jl:68-107).

    rows (count, dv+2) SOC reservation; d_cols (count, dv); t_cols (count,);
    H (count, dv, dv) psd; g (count, dv); c0 (count,); d0 (count, dv).
    Degenerate H = 0 reduces exactly to the affine epigraph t >= g'd + ...
    """
    count, dv = np.asarray(d_cols).shape
    H = jnp.asarray(H)
    dt = H.dtype

    w, V = jnp.linalg.eigh(H)
    Lt = jnp.sqrt(jnp.clip(w, 0.0, None))[..., :, None] * jnp.swapaxes(V, -1, -2)
    lin_g = g - jnp.einsum("kij,kj->ki", H, d0)          # (count, dv)
    lin_c = (c0 + 0.5 * jnp.einsum("ki,kij,kj->k", d0, H, d0)
             - jnp.einsum("ki,ki->k", g, d0))            # (count,)

    # v = [tau + 1/2, tau - 1/2, L'd],  tau = t - lin_g'd - lin_c
    J = jnp.zeros((count, dv + 2, dv + 1), dt)
    J = J.at[:, 0, :dv].set(-lin_g)
    J = J.at[:, 0, dv].set(1.0)
    J = J.at[:, 1, :dv].set(-lin_g)
    J = J.at[:, 1, dv].set(1.0)
    J = J.at[:, 2:, :dv].set(Lt)
    v0 = jnp.concatenate(
        [jnp.stack([-lin_c + 0.5, -lin_c - 0.5], axis=1),
         jnp.zeros((count, dv), dt)], axis=1,
    )
    cols = np.concatenate(
        [np.asarray(d_cols), np.asarray(t_cols).reshape(count, 1)], axis=1
    )
    asm.res_soc(rows, cols, J, v0)


# ---------------------------------------------------------------------------
# Structure probing
# ---------------------------------------------------------------------------


def _cone_structure(cons) -> Tuple[Tuple[ConeKind, ...], Tuple[int, ...]]:
    return (tuple(c.kind for c in cons),
            tuple(int(np.prod(c.v.shape)) for c in cons))


def _stack_residuals(fn, *args):
    cons = fn(*args)
    return jnp.concatenate([c.v.reshape(-1) for c in cons])


class CoreStructure(NamedTuple):
    """Static structure probed once from the user problem functions."""

    X_kinds: Tuple[ConeKind, ...]
    X_dims: Tuple[int, ...]
    U_kinds: Tuple[ConeKind, ...]
    U_dims: Tuple[int, ...]
    ns: int
    n_ic: int
    n_tc: int
    has_term: bool
    has_run: bool


class SCPTemplate:
    """Static subproblem structure + traced core assembly for one
    TrajectoryProblem at grid size N.

    Algorithm modules (PTR/SCvx/GuSTO) construct this, then append their own
    variables/rows (trust regions, penalties) before `freeze()`; at assembly
    time they call `assemble_core` and add their own cost terms.
    """

    def __init__(self, pbm: TrajectoryProblem, N: int, t_grid: np.ndarray,
                 *, relax_dynamics: bool = True, relax_bcs: bool = True,
                 soft_X: bool = False, vs_nonneg: bool = True,
                 dtype=jnp.float64):
        self.pbm = pbm
        self.soft_X = bool(soft_X) and pbm.X is not None
        # vs_nonneg=False drops the vs >= 0 rows so vs tracks the RAW
        # linearized s value (GuSTO's softplus penalty needs softplus(s_lin),
        # not softplus(max(0, s_lin)); softplus is increasing so the
        # one-sided bound vs >= s_lin is tight at the optimum)
        self.vs_nonneg = bool(vs_nonneg)
        self.N = int(N)
        self.t_np = np.asarray(t_grid, dtype=np.float64)
        self.w_trapz = trapezoid_weights(self.t_np)
        self.relax_dynamics = relax_dynamics
        self.relax_bcs = relax_bcs
        self.dtype = dtype
        nx, nu, npp = pbm.nx, pbm.nu, pbm.np
        self.nv = nx  # virtual-control dim: E = I_nx (reference scp.jl:149)

        # ---- probe static structure at the guess ----
        xg, ug, pg = bind_consts(pbm.guess, pbm.consts)(N)
        xg = jnp.asarray(xg, dtype)
        ug = jnp.asarray(ug, dtype)
        pg = jnp.asarray(pg, dtype)
        t0 = jnp.asarray(self.t_np[0], dtype)
        k0 = jnp.asarray(0)
        c0_ = pbm.consts
        X0, U0, s0 = (bind_consts(pbm.X, c0_), bind_consts(pbm.U, c0_),
                      bind_consts(pbm.s, c0_))
        gic0, gtc0 = bind_consts(pbm.gic, c0_), bind_consts(pbm.gtc, c0_)
        Xk, Xd = _cone_structure(X0(t0, k0, xg[0], pg)) if pbm.X else ((), ())
        Uk, Ud = _cone_structure(U0(t0, k0, ug[0], pg)) if pbm.U else ((), ())
        ns = int(s0(t0, k0, xg[0], ug[0], pg).shape[0]) if pbm.s else 0
        n_ic = int(gic0(xg[0], pg).shape[0]) if pbm.gic else 0
        n_tc = int(gtc0(xg[-1], pg).shape[0]) if pbm.gtc else 0
        self.struct = CoreStructure(
            X_kinds=Xk, X_dims=Xd, U_kinds=Uk, U_dims=Ud, ns=ns,
            n_ic=n_ic, n_tc=n_tc,
            has_term=pbm.terminal_cost is not None,
            has_run=pbm.running_cost is not None,
        )

        # ---- variable layout + row plan (static) ----
        lay = VarLayout()
        plan = RowPlan()
        lay.add("x", N, nx)
        lay.add("u", N, nu)
        if npp > 0:
            lay.add("p", npp)
        plan.zero("dyn", (N - 1) * nx)
        if relax_dynamics:
            # free virtual control vd plus the |E_k vd_k| epigraph w_vd used
            # by the L1 penalty (reference ptr.jl:815-830 posts
            # L1(P_k, E_k vd_k, vs_k); at the optimum P is tight so
            # sum(w_vd) + sum(vs) reproduces it exactly)
            lay.add("vd", N - 1, self.nv)
            lay.add("wvd", N - 1, nx)
            plan.nonneg("wvd_lo", (N - 1) * nx)
            plan.nonneg("wvd_hi", (N - 1) * nx)
        if n_ic:
            plan.zero("ic", n_ic)
            if relax_bcs:
                lay.add("vic_pos", n_ic)
                lay.add("vic_neg", n_ic)
                plan.nonneg("vic_pos_nn", n_ic)
                plan.nonneg("vic_neg_nn", n_ic)
        if n_tc:
            plan.zero("tc", n_tc)
            if relax_bcs:
                lay.add("vtc_pos", n_tc)
                lay.add("vtc_neg", n_tc)
                plan.nonneg("vtc_pos_nn", n_tc)
                plan.nonneg("vtc_neg_nn", n_tc)
        if ns:
            lay.add("vs", N, ns)
            plan.nonneg("ncvx", N * ns)
            if self.vs_nonneg:
                plan.nonneg("vs_nn", N * ns)
        if not self.soft_X:
            self._X_posters = [
                BlockPoster(f"X{i}", k, d, N, lay, plan)
                for i, (k, d) in enumerate(zip(Xk, Xd))
            ]
        else:
            # GuSTO soft state set: per-cone indicator variables q with
            # q <= 0 iff the residual is in the cone (reference
            # indicator!/define_conic_constraint!, cone.jl:269-320,
            # problem.jl:686-807): ZERO/NONPOS get a vector q (z - q <= 0,
            # plus -z - q <= 0 for ZERO); norm cones a scalar q shifting
            # the epigraph head ((t + q, x) in K).
            self._X_posters = []
            self.n_qX = 0  # indicator slots per node
            for i, (k, d) in enumerate(zip(Xk, Xd)):
                if k == ConeKind.NONPOS:
                    lay.add(f"qX{i}", N, d)
                    posters = (BlockPoster(f"X{i}", ConeKind.NONPOS, d, N,
                                           lay, plan),)
                    self.n_qX += d
                elif k == ConeKind.ZERO:
                    lay.add(f"qX{i}", N, d)
                    posters = (BlockPoster(f"X{i}a", ConeKind.NONPOS, d, N,
                                           lay, plan),
                               BlockPoster(f"X{i}b", ConeKind.NONPOS, d, N,
                                           lay, plan))
                    self.n_qX += d
                elif k in (ConeKind.SOC, ConeKind.L1, ConeKind.LINF):
                    lay.add(f"qX{i}", N)
                    posters = (BlockPoster(f"X{i}", k, d, N, lay, plan),)
                    self.n_qX += 1
                elif k == ConeKind.EXP:
                    # (x, y, w + q) in K_exp (reference cone.jl:313-314)
                    lay.add(f"qX{i}", N)
                    posters = (BlockPoster(f"X{i}", k, d, N, lay, plan),)
                    self.n_qX += 1
                else:
                    raise NotImplementedError(
                        f"soft state-set relaxation for cone {k}")
                self._X_posters.append(posters)
        self._U_posters = [
            BlockPoster(f"U{i}", k, d, N, lay, plan)
            for i, (k, d) in enumerate(zip(Uk, Ud))
        ]
        # structurally-linear costs (zero Hessian) are lowered straight into
        # the objective vector: a quadratic SOC epigraph with H = 0 is a
        # degenerate cone on which complementarity stalls (and wastes rows).
        # For genuinely quadratic costs the epigraph SOC is SLICED to the
        # static support of (g, H): a running cost touching only u posts an
        # (nu+2)-dim cone per node, not (nx+nu+np+2) — for problems with
        # large parameter vectors (freeflyer: np = 1 + 6N slack variables)
        # this removes the dominant share of all constraint rows.
        self.run_linear = False
        self.term_linear = False
        rng = np.random.default_rng(0)
        t0j = jnp.asarray(self.t_np, self.dtype)
        # support is probed with PERTURBED consts too: solvers pass runtime
        # consts into assembly (homotopy callbacks mutate them), so a cost
        # weight that is 0 at construction and nonzero later must not leave
        # its coordinates out of run/term_support (the sliced epigraph would
        # silently drop that cost dependence)
        consts_variants = [c0_, _perturb_consts(c0_, rng)]
        if self.struct.has_run:
            nd_run = nx + nu + npp
            sup = np.zeros(nd_run, bool)
            h_any = False
            d_base = np.concatenate(
                [np.asarray(xg), np.asarray(ug)]
                + ([np.broadcast_to(np.asarray(pg), (N, npp))]
                   if npp > 0 else []), axis=1)
            for cv in consts_variants:
                run0 = bind_consts(pbm.running_cost, cv)

                def _gh_run(t, k, d0, run0=run0):
                    def scl(vec):
                        xx = vec[:nx]
                        uu = vec[nx:nx + nu]
                        pp = vec[nx + nu:] if npp > 0 else pg
                        return run0(t, k, xx, uu, pp)

                    return jax.grad(scl)(d0), jax.hessian(scl)(d0)

                for trial in range(3):  # + perturbed references
                    pert = (0.0 if trial == 0
                            else 0.3 * rng.standard_normal(d_base.shape))
                    gs, Hs = jax.vmap(_gh_run)(
                        t0j, jnp.arange(N),
                        jnp.asarray(d_base + pert, self.dtype))
                    gs = np.asarray(gs)
                    Hs = np.asarray(Hs)
                    h_any = h_any or np.max(np.abs(Hs)) != 0.0
                    sup |= np.any(gs != 0.0, axis=0)
                    sup |= np.any(Hs != 0.0, axis=(0, 1))
                    sup |= np.any(Hs != 0.0, axis=(0, 2))
            self.run_linear = not h_any
            self.run_support = np.flatnonzero(sup)
        if self.struct.has_term:
            nd_term = nx + npp
            sup = np.zeros(nd_term, bool)
            h_any = False
            d_base = np.concatenate(
                [np.asarray(xg[-1])] + ([np.asarray(pg)] if npp > 0 else []))
            for cv in consts_variants:
                term0 = bind_consts(pbm.terminal_cost, cv)

                def _gh_term(d0, term0=term0):
                    def scl(vec):
                        xx = vec[:nx]
                        pp = vec[nx:] if npp > 0 else pg
                        return term0(xx, pp)

                    return jax.grad(scl)(d0), jax.hessian(scl)(d0)

                for trial in range(3):
                    pert = (0.0 if trial == 0
                            else 0.3 * rng.standard_normal(nd_term))
                    gt, Ht = _gh_term(jnp.asarray(d_base + pert, self.dtype))
                    gt = np.asarray(gt)
                    Ht = np.asarray(Ht)
                    h_any = h_any or np.max(np.abs(Ht)) != 0.0
                    sup |= gt != 0.0
                    sup |= np.any(Ht != 0.0, axis=0)
                    sup |= np.any(Ht != 0.0, axis=1)
            self.term_linear = not h_any
            self.term_support = np.flatnonzero(sup)

        if self.struct.has_run and not self.run_linear:
            lay.add("t_run", N)
            plan.soc("run_epi", N, len(self.run_support) + 2)
        if self.struct.has_term and not self.term_linear:
            lay.add("t_term")
            plan.soc("term_epi", 1, len(self.term_support) + 2)
        self.layout = lay
        self.plan = plan

    # -- post-construction static info -------------------------------------

    def freeze(self) -> ConeSpec:
        """Freeze the row plan (after the algorithm added its rows)."""
        self.spec = self.plan.freeze()
        self.m = self.plan.m
        self.n = self.layout.n
        return self.spec

    def scaling_vectors(self, sc: Scaling):
        """Full-decision diagonal scaling (S_full, c_full) for
        Assembler.finish: physical d = S_full * d_hat + c_full."""
        S = jnp.ones(self.n, self.dtype)
        c = jnp.zeros(self.n, self.dtype)
        lay = self.layout
        N = self.N
        S = S.at[lay.sl("x")].set(jnp.tile(sc.Sx, N))
        c = c.at[lay.sl("x")].set(jnp.tile(sc.cx, N))
        S = S.at[lay.sl("u")].set(jnp.tile(sc.Su, N))
        c = c.at[lay.sl("u")].set(jnp.tile(sc.cu, N))
        if self.pbm.np > 0:
            S = S.at[lay.sl("p")].set(sc.Sp)
            c = c.at[lay.sl("p")].set(sc.cp)
        return S, c

    def extract(self, d: jnp.ndarray):
        """Pull (x, u, p) out of a physical decision vector."""
        lay = self.layout
        x = d[lay.sl("x")].reshape(self.N, self.pbm.nx)
        u = d[lay.sl("u")].reshape(self.N, self.pbm.nu)
        p = (d[lay.sl("p")] if self.pbm.np > 0
             else jnp.zeros(0, d.dtype))
        return x, u, p

    # -- traced assembly -----------------------------------------------------

    def assemble_core(self, asm: Assembler, ref_x, ref_u, ref_p, dltv,
                      consts=None) -> None:
        """Emit dynamics, convex X/U, linearized nonconvex s, BC rows, slack
        nonnegativity, and the original-cost epigraph rows. Traced; all
        structure static. `consts` is the traced problem-constants pytree
        bound into callbacks that declare it."""
        pbm, lay, plan = self.pbm, self.layout, self.plan
        if consts is None:
            consts = pbm.consts
        X_fn = bind_consts(pbm.X, consts)
        U_fn = bind_consts(pbm.U, consts)
        s_fn = bind_consts(pbm.s, consts)
        gic_fn = bind_consts(pbm.gic, consts)
        gtc_fn = bind_consts(pbm.gtc, consts)
        run_fn = bind_consts(pbm.running_cost, consts)
        term_fn = bind_consts(pbm.terminal_cost, consts)
        N, nx, nu, npp = self.N, pbm.nx, pbm.nu, pbm.np
        dt = self.dtype
        ts = jnp.asarray(self.t_np, dt)
        ks = jnp.arange(N)
        x_idx = lay.idx("x")      # (N, nx)
        u_idx = lay.idx("u")      # (N, nu)
        p_idx = lay.idx("p").reshape(-1) if npp > 0 else np.zeros(0, np.int64)

        # ---- dynamics: x_{k+1} = A x_k + Bm u_k + Bp u_{k+1} + F p + r + E vd
        rows = plan.rows("dyn").reshape(N - 1, nx)
        eyeb = jnp.broadcast_to(jnp.eye(nx, dtype=dt), (N - 1, nx, nx))
        asm.add_A(rows, x_idx[1:], eyeb)
        asm.add_A(rows, x_idx[:-1], -dltv.A)
        asm.add_A(rows, u_idx[:-1], -dltv.Bm)
        asm.add_A(rows, u_idx[1:], -dltv.Bp)
        if npp > 0:
            asm.add_A(rows, np.broadcast_to(p_idx, (N - 1, npp)), -dltv.F)
        if self.relax_dynamics:
            asm.add_A(rows, lay.idx("vd"), -dltv.E)
            # |E_k vd_k| epigraph: +-(E vd) - wvd <= 0
            wvd_idx = lay.idx("wvd")
            eyeb_w = jnp.broadcast_to(-jnp.eye(nx, dtype=dt), (N - 1, nx, nx))
            lo = plan.rows("wvd_lo").reshape(N - 1, nx)
            asm.add_A(lo, lay.idx("vd"), dltv.E)
            asm.add_A(lo, wvd_idx, eyeb_w)
            hi = plan.rows("wvd_hi").reshape(N - 1, nx)
            asm.add_A(hi, lay.idx("vd"), -dltv.E)
            asm.add_A(hi, wvd_idx, eyeb_w)
        asm.add_b(rows, dltv.r)

        # ---- convex state/input sets ----
        def affine_sets(fn, z_ref, z_idx):
            nz = z_ref.shape[1]

            def stacked(t, k, z, p):
                return _stack_residuals(fn, t, k, z, p)

            def per_node(t, k, z):
                val = stacked(t, k, z, ref_p)
                Jz, Jp = jax.jacfwd(stacked, argnums=(2, 3))(t, k, z, ref_p)
                return val, Jz, Jp

            vals, Jz, Jp = jax.vmap(per_node)(ts, ks, z_ref)
            J = (jnp.concatenate([Jz, Jp], axis=2) if npp > 0 else Jz)
            cat = jnp.concatenate([z_ref, jnp.broadcast_to(ref_p, (N, npp))],
                                  axis=1) if npp > 0 else z_ref
            v0 = vals - jnp.einsum("kij,kj->ki", J, cat)
            cols = np.concatenate(
                [z_idx, np.broadcast_to(p_idx, (N, npp))], axis=1
            ) if npp > 0 else z_idx
            return cols, J, v0

        def post_sets(fn, posters, z_ref, z_idx):
            if not posters:
                return
            cols, J, v0 = affine_sets(fn, z_ref, z_idx)
            off = 0
            for po in posters:
                po.post(asm, plan, lay, cols,
                        J[:, off:off + po.dim, :], v0[:, off:off + po.dim])
                off += po.dim

        def post_sets_soft(fn, z_ref, z_idx):
            """Soft state-set posting with indicator variables (reference
            define_conic_constraint! soft branch, problem.jl:706-807)."""
            cols, J, v0 = affine_sets(fn, z_ref, z_idx)
            nc = cols.shape[1]
            off = 0
            for i, (kind, d) in enumerate(
                    zip(self.struct.X_kinds, self.struct.X_dims)):
                q_idx = lay.idx(f"qX{i}").reshape(N, -1)  # (N, d) or (N, 1)
                cols_q = np.concatenate([cols, q_idx], axis=1)
                Ji = J[:, off:off + d, :]
                v0i = v0[:, off:off + d]
                if kind == ConeKind.NONPOS:
                    eye = jnp.broadcast_to(-jnp.eye(d, dtype=dt), (N, d, d))
                    self._X_posters[i][0].post(
                        asm, plan, lay, cols_q,
                        jnp.concatenate([Ji, eye], axis=2), v0i)
                elif kind == ConeKind.ZERO:
                    eye = jnp.broadcast_to(-jnp.eye(d, dtype=dt), (N, d, d))
                    pa, pb = self._X_posters[i]
                    pa.post(asm, plan, lay, cols_q,
                            jnp.concatenate([Ji, eye], axis=2), v0i)
                    pb.post(asm, plan, lay, cols_q,
                            jnp.concatenate([-Ji, eye], axis=2), -v0i)
                elif kind == ConeKind.EXP:
                    # (x, y, w + q) in K_exp (reference cone.jl:313-314)
                    e2 = jnp.zeros((N, d, 1), dt).at[:, 2, 0].set(1.0)
                    self._X_posters[i][0].post(
                        asm, plan, lay, cols_q,
                        jnp.concatenate([Ji, e2], axis=2), v0i)
                else:  # SOC / L1 / LINF: (t + q, x) in K
                    e0 = jnp.zeros((N, d, 1), dt).at[:, 0, 0].set(1.0)
                    self._X_posters[i][0].post(
                        asm, plan, lay, cols_q,
                        jnp.concatenate([Ji, e0], axis=2), v0i)
                off += d

        if pbm.X:
            if self.soft_X:
                post_sets_soft(X_fn, ref_x, x_idx)
            else:
                post_sets(X_fn, self._X_posters, ref_x, x_idx)
        if pbm.U:
            post_sets(U_fn, self._U_posters, ref_u, u_idx)

        # ---- nonconvex path constraints: s_lin <= vs, vs >= 0 ----
        if self.struct.ns:
            ns = self.struct.ns

            def per_node(t, k, x, u):
                val = s_fn(t, k, x, u, ref_p)
                C, D, G = jax.jacfwd(s_fn, argnums=(2, 3, 4))(
                    t, k, x, u, ref_p)
                return val, C, D, G

            sval, C, D, G = jax.vmap(per_node)(ts, ks, ref_x, ref_u)
            rows = plan.rows("ncvx").reshape(N, ns)
            asm.add_A(rows, x_idx, C)
            asm.add_A(rows, u_idx, D)
            if npp > 0:
                asm.add_A(rows, np.broadcast_to(p_idx, (N, npp)), G)
            vs_idx = lay.idx("vs")
            asm.add_A(rows, vs_idx,
                      jnp.broadcast_to(-jnp.eye(ns, dtype=dt), (N, ns, ns)))
            v0 = (sval - jnp.einsum("kij,kj->ki", C, ref_x)
                  - jnp.einsum("kij,kj->ki", D, ref_u))
            if npp > 0:
                v0 = v0 - G @ ref_p
            asm.add_b(rows, -v0)
            if self.vs_nonneg:
                r = plan.rows("vs_nn")
                asm.add_A(r, vs_idx.reshape(-1),
                          -jnp.eye(N * ns, dtype=dt))

        # ---- boundary conditions (linearized, optionally relaxed) ----
        def post_bc(g_fn, x_node, x_cols, name, vname):
            n_g = self.struct.n_ic if name == "ic" else self.struct.n_tc
            g_ref = g_fn(x_node, ref_p)
            Hj, Kj = jax.jacfwd(g_fn, argnums=(0, 1))(x_node, ref_p)
            rows = plan.rows(name)
            asm.add_A(rows, x_cols, Hj)
            if npp > 0:
                asm.add_A(rows, p_idx, Kj)
            v0 = g_ref - Hj @ x_node
            if npp > 0:
                v0 = v0 - Kj @ ref_p
            if self.relax_bcs:
                eye = jnp.eye(n_g, dtype=dt)
                asm.add_A(rows, lay.idx(vname + "_pos").reshape(-1), eye)
                asm.add_A(rows, lay.idx(vname + "_neg").reshape(-1), -eye)
                for sfx in ("_pos", "_neg"):
                    r = plan.rows(vname + sfx + "_nn")
                    asm.add_A(r, lay.idx(vname + sfx).reshape(-1),
                              -jnp.eye(n_g, dtype=dt))
            asm.add_b(rows, -v0)

        if self.struct.n_ic:
            post_bc(gic_fn, ref_x[0], x_idx[0], "ic", "vic")
        if self.struct.n_tc:
            post_bc(gtc_fn, ref_x[-1], x_idx[-1], "tc", "vtc")

        # ---- original cost epigraphs (J_orig enters c via t_run/t_term) ----
        if self.struct.has_run:
            w = jnp.asarray(self.w_trapz, dt)
            d_cols = np.concatenate(
                [x_idx, u_idx, np.broadcast_to(p_idx, (N, npp))], axis=1
            ) if npp > 0 else np.concatenate([x_idx, u_idx], axis=1)
            if self.run_linear:
                def qf(t, k, x, u):
                    def scalar(vec):
                        xx, uu = vec[:nx], vec[nx:nx + nu]
                        pp = vec[nx + nu:] if npp > 0 else ref_p
                        return run_fn(t, k, xx, uu, pp)

                    d0 = jnp.concatenate(
                        [x, u] + ([ref_p] if npp > 0 else []))
                    return scalar(d0), jax.grad(scalar)(d0), d0

                c0, g, d0 = jax.vmap(qf)(ts, ks, ref_x, ref_u)
                # structurally-linear running cost: straight into c (no cone)
                asm.add_c(d_cols, w[:, None] * g)
                asm.add_const(jnp.dot(
                    w, c0 - jnp.einsum("ki,ki->k", g, d0)))
            else:
                # quadratic: epigraph SOC over the STATIC SUPPORT of (g, H)
                # only — off-support coordinates have identically zero
                # derivatives, so fixing them at the reference is exact
                sup = self.run_support
                ns_ = len(sup)

                def qf(t, k, x, u):
                    d_full = jnp.concatenate(
                        [x, u] + ([ref_p] if npp > 0 else []))

                    def scalar_s(vec_s):
                        d = d_full.at[sup].set(vec_s)
                        xx, uu = d[:nx], d[nx:nx + nu]
                        pp = d[nx + nu:] if npp > 0 else ref_p
                        return run_fn(t, k, xx, uu, pp)

                    d0s = d_full[sup]
                    return (scalar_s(d0s), jax.grad(scalar_s)(d0s),
                            jax.hessian(scalar_s)(d0s), d0s)

                c0, g, H, d0 = jax.vmap(qf)(ts, ks, ref_x, ref_u)
                post_quadratic_epigraphs(
                    asm, plan.rows("run_epi"), d_cols[:, sup],
                    lay.idx("t_run").reshape(-1), H, g, c0, d0)
                asm.add_c(lay.idx("t_run"), w)
        if self.struct.has_term:
            d_cols = (np.concatenate([x_idx[-1], p_idx])
                      if npp > 0 else x_idx[-1])
            d_full = jnp.concatenate(
                [ref_x[-1]] + ([ref_p] if npp > 0 else []))
            if self.term_linear:
                def scalar(vec):
                    xx = vec[:nx]
                    pp = vec[nx:] if npp > 0 else ref_p
                    return term_fn(xx, pp)

                c0 = scalar(d_full)
                g = jax.grad(scalar)(d_full)
                asm.add_c(d_cols, g)
                asm.add_const(c0 - jnp.dot(g, d_full))
            else:
                sup = self.term_support

                def scalar_s(vec_s):
                    d = d_full.at[sup].set(vec_s)
                    xx = d[:nx]
                    pp = d[nx:] if npp > 0 else ref_p
                    return term_fn(xx, pp)

                d0 = d_full[sup]
                c0 = scalar_s(d0)
                g = jax.grad(scalar_s)(d0)
                H = jax.hessian(scalar_s)(d0)
                post_quadratic_epigraphs(
                    asm, plan.rows("term_epi"), d_cols[sup][None, :],
                    lay.idx("t_term").reshape(1), H[None], g[None], c0[None],
                    d0[None])
                asm.add_c(lay.idx("t_term").reshape(1), jnp.ones(1, dt))

    # -- numerical soft-set indicators (cone.jl:275-292 numerical mode) -----

    def X_indicators(self, x, p, consts=None):
        """Numerical indicator values of the soft state set at the nodes:
        (N, n_qX), one slot per indicator variable; q <= 0 iff the residual
        lies in its cone (reference indicator! numerical branch)."""
        assert self.soft_X
        pbm = self.pbm
        if consts is None:
            consts = pbm.consts
        X_fn = bind_consts(pbm.X, consts)
        dt = self.dtype
        ts = jnp.asarray(self.t_np, dt)
        ks = jnp.arange(self.N)

        def per_node(t, k, xx):
            cons = X_fn(t, k, xx, p)
            parts = []
            for c in cons:
                v = c.v.reshape(-1)
                if c.kind == ConeKind.NONPOS:
                    parts.append(v)
                elif c.kind == ConeKind.ZERO:
                    parts.append(jnp.abs(v))
                elif c.kind == ConeKind.SOC:
                    parts.append((jnp.linalg.norm(v[1:]) - v[0])[None])
                elif c.kind == ConeKind.L1:
                    parts.append((jnp.sum(jnp.abs(v[1:])) - v[0])[None])
                elif c.kind == ConeKind.LINF:
                    parts.append((jnp.max(jnp.abs(v[1:])) - v[0])[None])
                elif c.kind == ConeKind.EXP:
                    # q = y e^{x/y} - w (reference indicator! numerical,
                    # cone.jl:292); safe-guarded for y <= 0
                    xw, yw, ww = v[0], v[1], v[2]
                    ysafe = jnp.where(yw > 0, yw, 1.0)
                    val = jnp.where(yw > 0, yw * jnp.exp(xw / ysafe) - ww,
                                    jnp.maximum(-ww, -yw))
                    parts.append(val[None])
                else:
                    raise NotImplementedError(c.kind)
            return jnp.concatenate(parts)

        return jax.vmap(per_node)(ts, ks, x)

    # -- numerical original cost (for stopping metrics / reporting) ---------

    def original_cost(self, x, u, p, consts=None):
        """J_orig = phi(xf, p) + trapz(Gamma) numerically (reference
        scp.jl:617-643 `compute_original_cost`)."""
        pbm = self.pbm
        if consts is None:
            consts = pbm.consts
        run_fn = bind_consts(pbm.running_cost, consts)
        term_fn = bind_consts(pbm.terminal_cost, consts)
        dt = self.dtype
        J = jnp.zeros((), dt)
        if self.struct.has_term:
            J = J + term_fn(x[-1], p)
        if self.struct.has_run:
            ts = jnp.asarray(self.t_np, dt)
            vals = jax.vmap(
                lambda t, k, xx, uu: run_fn(t, k, xx, uu, p)
            )(ts, jnp.arange(self.N), x, u)
            J = J + jnp.asarray(self.w_trapz, dt) @ vals
        return J
