"""GuSTO: guaranteed sequential trajectory optimization with soft state
penalties, exact dynamics, and a soft-penalty-weight ladder (reference
src/solvers/gusto.jl).

TPU-native structure mirrors PTR/SCvx: ONE traced step with the scalar
trust-region radius eta AND soft penalty weight lambda as TRACED inputs, so
the grow/shrink/ladder host logic never re-traces.

Algorithmic parity (gusto.jl):
  * dynamics and boundary conditions EXACT — no virtual control
    (`add_dynamics!(relaxed=false)`, gusto.jl:452-454);
  * nonconvex path constraints s soft-penalized: with pen=:quad the penalty
    is lambda * max(0, s_lin)^2, realized as slack vs >= max(0, s_lin)
    with quadratic cost (soft_penalty, gusto.jl:970-995) — the template's
    (s_lin <= vs, vs >= 0) rows plus a single sqrt(trapz-weight)-scaled
    quadratic epigraph reproduce it exactly;
  * soft one-sided trust region: ||dx_hat_k||_q + ||dp_hat||_q <= eta + tr_k
    with tr_k quad-penalized (trust_region_cost, gusto.jl:1060-1190; q=4
    squares via SOC+GEOM);
  * convex state sets X are soft-enforced through per-cone indicator
    variables by default (define_conic_constraint!, problem.jl:686-807),
    with `force_hard` switching them to hard rows — see the soft-X
    indicator setup in the constructor below;
  * rho = (|J_aug - L_aug| + dyn_error) / (|L_aug| + dynamics_nrml) with
    dyn_error = trapz ||f_nl - f_lin|| at the solution (gusto.jl:1245-1293);
  * update rule gusto.jl:1310-1427: trust-region violation -> reject + grow
    lambda by gamma_fail; rho < rho_0 grow eta; rho < rho_1 hold; else
    shrink + reject; lambda resets to lambda_init when constraints feasible;
    kappa = mu^(1 + iter - iter_mu) forced trust-region decay
    (gusto.jl:264);
  * stop when iter > 1 and ((feas and (dJ_rel <= eps_rel or deviation <=
    eps_abs)) or lambda > lambda_max) (gusto.jl:1203-1230).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.config import SCPStatus, default_dtype
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.ops.discretize import DiscretizationType, discretize, propagate
from scptoolbox_tpu.parser.problem import (ConeKind, TrajectoryProblem,
                                           bind_consts)
from scptoolbox_tpu.solvers.projection import project_convex
from scptoolbox_tpu.solvers.structure import ipm_kkt_kwargs
from scptoolbox_tpu.solvers.autoscale import solver_scaling
from scptoolbox_tpu.solvers.solution import IterationRecord, SCPSolution
from scptoolbox_tpu.solvers.subproblem import Assembler
from scptoolbox_tpu.solvers.template import (BlockPoster, SCPTemplate,
                                             _perturb_consts)
from scptoolbox_tpu.utils.table import Column, Table


@dataclasses.dataclass(frozen=True)
class GuSTOParameters:
    """GuSTO algorithm parameters (reference gusto.jl:58-85; defaults from
    the quadrotor test configuration, quadrotor/tests.jl:89-115)."""

    N: int = 30
    Nsub: int = 15
    iter_max: int = 15
    disc_method: DiscretizationType = DiscretizationType.FOH
    lam_init: float = 1e4
    lam_max: float = 1e9
    rho_0: float = 0.1
    rho_1: float = 0.9
    beta_sh: float = 2.0
    beta_gr: float = 2.0
    gamma_fail: float = 5.0
    eta_init: float = 10.0
    eta_lb: float = 1e-3
    eta_ub: float = 10.0
    mu: float = 0.8
    iter_mu: int = 6
    eps_abs: float = 1e-5
    eps_rel: float = 1e-4
    feas_tol: float = 1e-3
    pen: str = "quad"          # "quad" | "softplus" (EXP-cone LSE epigraph)
    structured_kkt: object = None  # None=auto, True/False force (block_kkt)
    kkt_method: object = None   # None=default Schur; "lu" = full augmented
                                # LU (f32-robust: no normal-equations squaring)
    timing_detail: bool = False  # per-phase timing dict (scp.jl:990-995)
    hom: float = 100.0
    q_tr: float = math.inf
    q_exit: float = math.inf
    ipm_tol: float = 1e-8
    ipm_max_iter: int = 60
    ipm_tol_almost: float = 1e-5  # ALMOST_OPTIMAL gate (f32: loosen)
    project_guess: bool = True
    tr_buffer: float = 1e-3
    c_buffer: float = 1e-3


_Q2KIND = {1.0: ConeKind.L1, 2.0: ConeKind.SOC, 4.0: ConeKind.SOC,
           math.inf: ConeKind.LINF}


def _pnorm(v, q):
    if q == math.inf:
        return jnp.max(jnp.abs(v), axis=-1)
    if q == 4.0:
        return jnp.sum(v * v, axis=-1)  # squared 2-norm (gusto w=2 branch)
    return jnp.sum(jnp.abs(v) ** q, axis=-1) ** (1.0 / q)


class GuSTO:
    """GuSTO solver bound to one TrajectoryProblem (reference `GuSTO.create`
    + `GuSTO.solve`, gusto.jl:425-502)."""

    def __init__(self, pbm: TrajectoryProblem, pars: GuSTOParameters,
                 dtype=None):
        assert pars.pen in ("quad", "softplus"), pars.pen
        if pbm.gusto_cost is not None and pbm.running_cost is None:
            # synthesize the scalar running cost from GuSTO's structured
            # triple u'S u + ell'u + g (reference problem.jl:365-418); the
            # *_cvx=False terms come back with their AD Hessian suppressed
            # so the template's quadratic expansion about the reference
            # reproduces the reference's linearize-if-nonconvex
            # convexification (gusto.jl:570-707) — see
            # parser.problem.make_gusto_running_cost
            from scptoolbox_tpu.parser.problem import make_gusto_running_cost
            pbm = dataclasses.replace(
                pbm, running_cost=make_gusto_running_cost(
                    pbm.gusto_cost, pbm.nx, pbm.nu))
        self.pbm = pbm
        self.pars = pars
        self.dtype = dtype or default_dtype()
        N = pars.N
        nx, npp = pbm.nx, pbm.np
        quad = pars.pen == "quad"
        self.t_np = np.linspace(0.0, 1.0, N)
        # state set X is relaxed with indicator variables unless force_hard
        # (reference define_conic_constraint!, problem.jl:686-807); the
        # input set U stays hard (problem.jl:534-542). For pen="softplus"
        # the vs slacks track the RAW linearized s (no vs >= 0), since
        # softplus penalizes the value itself (soft_penalty,
        # gusto.jl:996-1031), where quad penalizes max(0, .)^2.
        tmpl = SCPTemplate(pbm, N, self.t_np, relax_dynamics=False,
                           relax_bcs=False, soft_X=not pbm.force_hard,
                           vs_nonneg=quad, dtype=self.dtype)
        lay, plan = tmpl.layout, tmpl.plan
        self.n_qX = tmpl.n_qX if tmpl.soft_X else 0
        if self.n_qX:
            # v_qX >= qX (and >= 0 for quad): slacks feeding the penalty
            lay.add("v_qX", N, self.n_qX)
            if quad:
                plan.nonneg("v_qX_nn", N * self.n_qX)
            plan.nonneg("v_qX_ge", N * self.n_qX)

        q = pars.q_tr
        kind = _Q2KIND[float(q)]
        lay.add("dx_lq", N)
        self._tr_x = BlockPoster("tr_x", kind, 1 + nx, N, lay, plan)
        if npp > 0:
            lay.add("dp_lq")
            self._tr_p = BlockPoster("tr_p", kind, 1 + npp, 1, lay, plan)
        lay.add("tr", N)        # one-sided trust-region slack
        lay.add("v_tr", N)      # v_tr >= tr (and >= 0 for quad)
        if quad:
            plan.nonneg("v_tr_nn", N)
        plan.nonneg("v_tr_ge", N)
        self._nsum = 1 + (1 if npp > 0 else 0)
        if q == 4.0:
            lay.add("w_tr", N)
            plan.soc("tr_w", N, 1 + self._nsum)
            plan.soc("tr_geom", N, 3)
        else:
            plan.nonneg("tr_bound", N)
        n_pen = (N + (N * tmpl.struct.ns if tmpl.struct.ns else 0)
                 + N * self.n_qX)
        self._n_pen = n_pen
        if quad:
            # single quadratic epigraph for the lambda-weighted penalties
            lay.add("t_pen")
            plan.soc("pen_epi", 1, n_pen + 2)
        else:
            # softplus: per-scalar log-sum-exp epigraph via two EXP cones
            # (reference soft_penalty :softplus branch, gusto.jl:996-1031):
            #   e^{-w} <= u,  e^{hom f - w} <= v,  u + v <= 1
            #   => w >= log(1 + e^{hom f});  penalty = lam * w / hom
            lay.add("sp_w", n_pen)
            lay.add("sp_u", n_pen)
            lay.add("sp_v", n_pen)
            plan.exp("sp_e1", n_pen)
            plan.exp("sp_e2", n_pen)
            plan.nonneg("sp_uv", n_pen)
        self.spec = tmpl.freeze()
        self.tmpl = tmpl

        self.consts = pbm.consts
        xg, ug, pg = bind_consts(pbm.guess, pbm.consts)(N)
        self._guess = (jnp.asarray(xg, self.dtype),
                       jnp.asarray(ug, self.dtype),
                       jnp.asarray(pg, self.dtype))
        self.scaling = solver_scaling(pbm, *self._guess, t_grid=self.t_np, dtype=self.dtype)
        self._S_full, self._c_full = tmpl.scaling_vectors(self.scaling)
        self._E = jnp.eye(nx, dtype=self.dtype)

        from scptoolbox_tpu.solvers.structure import (resolve_kkt,
                                                      random_dltv)

        _asm_probe = jax.jit(
            lambda rx, ru, rp, dltv, eta, lam, consts: self._assemble(
                rx, ru, rp, dltv, eta, lam, consts)[0])

        def _probe(seed):
            rng = np.random.default_rng(seed)
            r = lambda *sh: jnp.asarray(rng.standard_normal(sh), self.dtype)
            dltv = random_dltv(rng, N, nx, pbm.nu, npp, self.dtype)
            consts = (_perturb_consts(pbm.consts, rng) if seed >= 2
                      else pbm.consts)
            return _asm_probe(
                r(N, nx), r(N, pbm.nu), r(npp), dltv,
                jnp.asarray(1.0 + abs(rng.standard_normal()), self.dtype),
                jnp.asarray(1.0 + abs(rng.standard_normal()), self.dtype),
                consts)

        # effective KKT method: explicit request or measured auto policy
        # (structure.resolve_kkt — staged CR on large f32 templates)
        self._kkt_method, self._kkt_builder = resolve_kkt(
            tmpl, _probe, pars.kkt_method, pars.structured_kkt)

        self._step = jax.jit(self._step_impl, static_argnames=())

    # ------------------------------------------------------------------

    def _discretize(self, x, u, p, consts=None):
        return discretize(
            self.pbm.f, x, u, p, jnp.asarray(self.t_np, self.dtype), self._E,
            nsub=self.pars.Nsub, method=self.pars.disc_method,
            jac=self.pbm.jac, impulse=self.pbm.impulse,
            actions=self.pbm.integration_actions,
            consts=self.consts if consts is None else consts)

    def _post_trust_region(self, asm, ref_x, ref_p, eta):
        """Soft one-sided trust region (gusto.jl:1060-1190)."""
        tmpl, pars = self.tmpl, self.pars
        lay, plan = tmpl.layout, tmpl.plan
        N, nx, npp = pars.N, self.pbm.nx, self.pbm.np
        dt = self.dtype
        sc = self.scaling

        def post_eps(poster, z_idx, lq_idx, iS, z_ref, count, nz):
            cols = np.concatenate(
                [np.asarray(z_idx).reshape(count, nz),
                 np.asarray(lq_idx).reshape(count, 1)], axis=1)
            J = jnp.zeros((count, 1 + nz, nz + 1), dt)
            J = J.at[:, 0, nz].set(1.0)
            J = J.at[:, 1:, :nz].set(
                jnp.broadcast_to(jnp.diag(iS), (count, nz, nz)))
            v0 = jnp.concatenate(
                [jnp.zeros((count, 1), dt), -z_ref * iS[None, :]], axis=1)
            poster.post(asm, plan, lay, cols, J, v0)

        post_eps(self._tr_x, lay.idx("x"), lay.idx("dx_lq"),
                 1.0 / sc.Sx, ref_x, N, nx)
        if npp > 0:
            post_eps(self._tr_p, lay.idx("p")[None, :],
                     lay.idx("dp_lq").reshape(1, 1), 1.0 / sc.Sp,
                     ref_p[None, :], 1, npp)

        lq_cols = [np.asarray(lay.idx("dx_lq")).reshape(N, 1)]
        if npp > 0:
            lq_cols.append(
                np.broadcast_to(np.asarray(lay.idx("dp_lq")).reshape(1, 1),
                                (N, 1)))
        nsum = len(lq_cols)
        tr_cols = np.asarray(lay.idx("tr")).reshape(N, 1)
        if pars.q_tr == 4.0:
            w_cols = np.asarray(lay.idx("w_tr")).reshape(N, 1)
            cw = np.concatenate(lq_cols + [w_cols], axis=1)
            J = jnp.zeros((N, nsum + 1, nsum + 1), dt)
            J = J.at[:, 0, nsum].set(1.0)
            for i in range(nsum):
                J = J.at[:, 1 + i, i].set(1.0)
            asm.res_soc(plan.rows("tr_w"), cw, J,
                        jnp.zeros((N, nsum + 1), dt))
            # GEOM(w, eta + tr, 1): (eta+tr) >= w^2 ->
            # SOC [eta+tr+1, 2w, eta+tr-1]
            rows = plan.rows("tr_geom")
            cg = np.concatenate([w_cols, tr_cols], axis=1)
            Jg = jnp.zeros((N, 3, 2), dt)
            Jg = Jg.at[:, 0, 1].set(1.0)
            Jg = Jg.at[:, 1, 0].set(2.0)
            Jg = Jg.at[:, 2, 1].set(1.0)
            v0g = jnp.broadcast_to(
                jnp.stack([eta + 1.0, jnp.zeros_like(eta), eta - 1.0]),
                (N, 3)).astype(dt)
            asm.res_soc(rows, cg, Jg, v0g)
        else:
            rows = plan.rows("tr_bound").reshape(N, 1)
            cols = np.concatenate(lq_cols + [tr_cols], axis=1)
            J = jnp.concatenate(
                [jnp.ones((N, 1, nsum), dt), -jnp.ones((N, 1, 1), dt)],
                axis=2)
            asm.add_A(rows, cols, J)
            asm.add_b(rows, jnp.full((N, 1), eta, dt))

        # v_tr >= tr (plus v_tr >= 0 for the quad penalty)
        vtr = np.asarray(lay.idx("v_tr")).reshape(N, 1)
        if self.pars.pen == "quad":
            r = plan.rows("v_tr_nn").reshape(N, 1)
            asm.add_A(r, vtr, -jnp.ones((N, 1, 1), dt))
        r = plan.rows("v_tr_ge").reshape(N, 1)
        asm.add_A(r, np.concatenate([tr_cols, vtr], axis=1),
                  jnp.broadcast_to(jnp.asarray([1.0, -1.0], dt), (N, 1, 2)))

    def _assemble(self, ref_x, ref_u, ref_p, dltv, eta, lam, consts):
        tmpl, pars = self.tmpl, self.pars
        lay, plan = tmpl.layout, tmpl.plan
        N = pars.N
        ns = tmpl.struct.ns
        dt = self.dtype
        asm = Assembler(tmpl.m, tmpl.n, dt)
        tmpl.assemble_core(asm, ref_x, ref_u, ref_p, dltv, consts)
        self._post_trust_region(asm, ref_x, ref_p, eta)

        # penalized scalars: v_tr (N), vs (N*ns), v_qX (N*n_qX) with the
        # trapz weight of their node
        w = jnp.asarray(tmpl.w_trapz, dt)
        pen_cols = [np.asarray(lay.idx("v_tr")).reshape(N)]
        pen_w = [w]
        if ns:
            pen_cols.append(np.asarray(lay.idx("vs")).reshape(N * ns))
            pen_w.append(jnp.repeat(w, ns))
        if self.n_qX:
            # v_qX >= qX (+ >= 0 for quad): soft state-set indicators
            nq = self.n_qX
            vq = lay.idx("v_qX").reshape(N * nq)
            qx_cols = np.concatenate(
                [np.asarray(lay.idx(f"qX{i}")).reshape(N, -1)
                 for i in range(len(tmpl.struct.X_kinds))], axis=1
            ).reshape(N * nq)
            if pars.pen == "quad":
                r = plan.rows("v_qX_nn")
                asm.add_A(r, vq, -jnp.eye(N * nq, dtype=dt))
            r = plan.rows("v_qX_ge").reshape(N * nq, 1)
            asm.add_A(r, np.stack([qx_cols, vq], axis=1),
                      jnp.broadcast_to(jnp.asarray([1.0, -1.0], dt),
                                       (N * nq, 1, 2)))
            pen_cols.append(vq)
            pen_w.append(jnp.repeat(w, nq))
        cols = np.concatenate(pen_cols)
        wts = jnp.concatenate(pen_w)
        n_pen = cols.shape[0]
        if pars.pen == "quad":
            # single quadratic epigraph: t_pen >= sum_i w_i f_i^2
            # SOC [t+1/2, t-1/2, diag(sqrt(w)) f]
            rows = plan.rows("pen_epi")
            t_col = np.asarray(lay.idx("t_pen")).reshape(1)
            cw = np.concatenate([cols, t_col])[None, :]
            J = jnp.zeros((1, n_pen + 2, n_pen + 1), dt)
            J = J.at[0, 0, n_pen].set(1.0)
            J = J.at[0, 1, n_pen].set(1.0)
            J = J.at[0, 2:, :n_pen].set(jnp.diag(jnp.sqrt(wts)))
            v0 = jnp.concatenate(
                [jnp.asarray([0.5, -0.5], dt), jnp.zeros(n_pen, dt)])[None, :]
            asm.res_soc(rows, cw, J, v0)
            asm.add_c(t_col, jnp.asarray([lam], dt))
        else:
            # softplus LSE epigraph per scalar (gusto.jl:996-1031):
            # EXP(-w, 1, u); EXP(hom f - w, 1, v); u + v <= 1;
            # cost lam * sum_i w_i sp_w_i / hom
            hom = pars.hom
            wc = np.asarray(lay.idx("sp_w")).reshape(n_pen)
            uc = np.asarray(lay.idx("sp_u")).reshape(n_pen)
            vc = np.asarray(lay.idx("sp_v")).reshape(n_pen)
            ones = jnp.ones((n_pen,), dt)
            # EXP1 residual (-w, 1, u): cols [w, u]
            J1 = jnp.zeros((n_pen, 3, 2), dt)
            J1 = J1.at[:, 0, 0].set(-1.0)
            J1 = J1.at[:, 2, 1].set(1.0)
            v01 = jnp.stack([jnp.zeros(n_pen, dt), ones,
                             jnp.zeros(n_pen, dt)], axis=1)
            asm.res_exp(plan.rows("sp_e1"), np.stack([wc, uc], axis=1),
                        J1, v01)
            # EXP2 residual (hom f - w, 1, v): cols [f, w, v]
            J2 = jnp.zeros((n_pen, 3, 3), dt)
            J2 = J2.at[:, 0, 0].set(hom)
            J2 = J2.at[:, 0, 1].set(-1.0)
            J2 = J2.at[:, 2, 2].set(1.0)
            asm.res_exp(plan.rows("sp_e2"),
                        np.stack([cols, wc, vc], axis=1), J2, v01)
            # u + v - 1 <= 0
            Juv = jnp.broadcast_to(jnp.asarray([1.0, 1.0], dt),
                                   (n_pen, 1, 2))
            asm.res_nonpos(plan.rows("sp_uv").reshape(n_pen, 1),
                           np.stack([uc, vc], axis=1), Juv, -ones[:, None])
            asm.add_c(wc, lam * wts / hom)

        return asm.finish(self._S_full, self._c_full)

    def _h_pen(self, f, lam):
        """The numerical soft penalty h (soft_penalty, gusto.jl:970-1031):
        quad lam*max(0,f)^2; softplus lam*log(1+e^{hom f})/hom."""
        if self.pars.pen == "quad":
            return lam * jnp.maximum(f, 0.0) ** 2
        return lam * jnp.logaddexp(0.0, self.pars.hom * f) / self.pars.hom

    def _nonlinear_state_penalty(self, x, u, p, lam, consts=None):
        """state_penalty_cost(:nonconvex) (gusto.jl:845-865)."""
        if consts is None:
            consts = self.consts
        tmpl = self.tmpl
        dt = self.dtype
        N = self.pars.N
        w = jnp.asarray(tmpl.w_trapz, dt)
        pen = jnp.zeros((), dt)
        if tmpl.struct.ns:
            ts = jnp.asarray(self.t_np, dt)
            ks = jnp.arange(N)
            sval = jax.vmap(lambda t, k, xx, uu: bind_consts(self.pbm.s, consts)(t, k, xx, uu, p)
                            )(ts, ks, x, u)
            pen = pen + w @ jnp.sum(self._h_pen(sval, lam), axis=1)
        if self.n_qX:
            qx = tmpl.X_indicators(x, p, consts)     # (N, n_qX)
            pen = pen + w @ jnp.sum(self._h_pen(qx, lam), axis=1)
        return pen

    def _dyn_error(self, ref_x, ref_u, ref_p, x, u, p):
        """Dynamics linearization error at the solution (gusto.jl:1268-1284)."""
        dt = self.dtype
        ts = jnp.asarray(self.t_np, dt)
        ks = jnp.arange(self.pars.N)

        def per_node(t, k, xb, ub, xk, uk):
            f_ref = self.pbm.f(t, xb, ub, ref_p)
            A, B, F = jax.jacfwd(self.pbm.f, argnums=(1, 2, 3))(
                t, xb, ub, ref_p)
            f_lin = (f_ref + A @ (xk - xb) + B @ (uk - ub)
                     + (F @ (p - ref_p) if self.pbm.np > 0 else 0.0))
            f_nl = self.pbm.f(t, xk, uk, p)
            return jnp.linalg.norm(f_nl - f_lin), jnp.linalg.norm(f_lin)

        df, dxdt = jax.vmap(per_node)(ts, ks, ref_x, ref_u, x, u)
        w = jnp.asarray(self.tmpl.w_trapz, dt)
        return w @ df, w @ dxdt

    def _step_impl(self, ref_x, ref_u, ref_p, dltv, eta, lam, consts=None,
                   active=None):
        """One full GuSTO iteration on device (eta, lam traced; `active`
        gates the IPM for converged scenarios in batched solves)."""
        pars = self.pars
        if consts is None:
            consts = self.consts
        A, b, c, const = self._assemble(ref_x, ref_u, ref_p, dltv, eta, lam, consts)
        sol = ipm.solve(A, b, c, self.spec, tol=pars.ipm_tol,
                        max_iter=pars.ipm_max_iter,
                        tol_almost=self.pars.ipm_tol_almost,
                        enabled=active,
                        **ipm_kkt_kwargs(self._kkt_method,
                                         self._kkt_builder))
        return self._post_solve(sol, const, ref_x, ref_u, ref_p, eta, lam,
                                consts)

    def _post_solve(self, sol, const, ref_x, ref_u, ref_p, eta, lam, consts):
        """Extract + re-discretize + rho ingredients (the part of the step
        after the subproblem solve)."""
        pars, tmpl = self.pars, self.tmpl
        sc = self.scaling
        d = self._S_full * sol.x + self._c_full
        x, u, p = tmpl.extract(d)
        L = tmpl.original_cost(x, u, p, consts)
        L_aug = sol.obj + const
        # J_tr: the convex trust-region penalty value at the solution
        lay = tmpl.layout
        v_tr = d[lay.sl("v_tr")]
        w = jnp.asarray(tmpl.w_trapz, self.dtype)
        J_tr = w @ self._h_pen(v_tr, lam)
        J_aug = (L + self._nonlinear_state_penalty(x, u, p, lam, consts)
                 + J_tr)

        dltv_new = self._discretize(x, u, p, consts)
        defect_norm = jnp.max(jnp.abs(dltv_new.defects / sc.Sx[None, :]))
        feas = defect_norm <= pars.feas_tol

        q = pars.q_exit
        dx = jnp.max(_pnorm((x - ref_x) / sc.Sx[None, :], q))
        dp = (_pnorm((p - ref_p) / sc.Sp, q) if self.pbm.np > 0
              else jnp.zeros((), self.dtype))
        deviation = dx + dp

        # rho ingredients (gusto.jl:1245-1293)
        dyn_err, dyn_nrml = self._dyn_error(ref_x, ref_u, ref_p, x, u, p)
        cost_error = jnp.abs(J_aug - L_aug)
        rho = (cost_error + dyn_err) / (jnp.abs(L_aug) + dyn_nrml)

        # trust-region LHS at the solution (for trust_viol, gusto.jl:1358)
        qq = pars.q_tr
        dxs = _pnorm((x - ref_x) / sc.Sx[None, :], qq)
        dps = (_pnorm((p - ref_p) / sc.Sp, qq) if self.pbm.np > 0
               else jnp.zeros((), self.dtype))
        tr_lhs_max = jnp.max(dxs + dps) - eta

        # constraint satisfaction (for the lambda ladder, gusto.jl:1365-1395)
        viol = jnp.zeros((), self.dtype)
        if tmpl.struct.ns:
            ts = jnp.asarray(self.t_np, self.dtype)
            ks = jnp.arange(pars.N)
            sval = jax.vmap(lambda t, k, xx, uu: bind_consts(self.pbm.s, consts)(t, k, xx, uu, p)
                            )(ts, ks, x, u)
            viol = jnp.max(sval)
        if self.n_qX:
            viol = jnp.maximum(
                viol, jnp.max(tmpl.X_indicators(x, p, consts)))

        return dict(
            x=x, u=u, p=p, dltv=dltv_new, L=L, L_aug=L_aug, J_aug=J_aug,
            feas=feas, deviation=deviation, defect_norm=defect_norm,
            rho=rho, tr_lhs_max=tr_lhs_max, viol=viol,
            dyn_err=dyn_err, dyn_nrml=dyn_nrml,
            ipm_status=sol.status, ipm_iters=sol.iters)

    def _step_timed(self, ref_x, ref_u, ref_p, dltv, eta, lam, consts):
        """Split-phase step with the reference's per-iteration timing keys
        {formulate, discretize, solve, total, overhead} (scp.jl:990-995)."""
        fns = self.__dict__.get("_timed_fns")
        if fns is None:
            fns = (jax.jit(lambda *a: self._assemble(*a)),
                   jax.jit(lambda A, b, c: ipm.solve(
                       A, b, c, self.spec, tol=self.pars.ipm_tol,
                       max_iter=self.pars.ipm_max_iter,
                       tol_almost=self.pars.ipm_tol_almost,
                       **ipm_kkt_kwargs(self._kkt_method,
                                        self._kkt_builder))),
                   jax.jit(self._post_solve))
            self.__dict__["_timed_fns"] = fns
        f_asm, f_sol, f_post = fns
        t0 = time.perf_counter()
        A, b, c, const = jax.block_until_ready(
            f_asm(ref_x, ref_u, ref_p, dltv, eta, lam, consts))
        t1 = time.perf_counter()
        sol = jax.block_until_ready(f_sol(A, b, c))
        t2 = time.perf_counter()
        out = jax.block_until_ready(
            f_post(sol, const, ref_x, ref_u, ref_p, eta, lam, consts))
        t3 = time.perf_counter()
        timing = {"formulate": t1 - t0, "solve": t2 - t1,
                  "discretize": t3 - t2, "total": t3 - t0,
                  "overhead": 0.0}
        return out, timing

    # per-instance jit: a static `self` hashes by id and a GC-reused id
    # can alias a dead instance's trace (stale baked-in constants)
    @property
    def _ref_J_aug(self):
        fn = self.__dict__.get("_ref_J_aug_fn")
        if fn is None:
            fn = jax.jit(self._ref_J_aug_impl)
            self.__dict__["_ref_J_aug_fn"] = fn
        return fn

    def _ref_J_aug_impl(self, x, u, p, lam, consts):
        dltv = self._discretize(x, u, p, consts)
        return (self.tmpl.original_cost(x, u, p, consts)
                + self._nonlinear_state_penalty(x, u, p, lam, consts)), dltv

    # ------------------------------------------------------------------

    def solve(self, warm: Optional[SCPSolution] = None,
              verbose: bool = False) -> SCPSolution:
        """Run the GuSTO loop (reference gusto.jl:425-502)."""
        pars = self.pars
        user_cols = list(self.pbm.table_columns or ())
        table = Table([
            Column("iter", "iter", "{:4d}"),
            Column("L", "J", "{:11.4e}"),
            Column("J_aug", "J_aug", "{:11.4e}"),
            Column("defect", "defect", "{:9.2e}"),
            Column("rho", "rho", "{:8.2e}"),
            Column("eta", "eta", "{:8.1e}"),
            Column("lam", "lambda", "{:8.1e}"),
            Column("upd", "upd", "{:>4s}"),
            Column("ipm", "ipm", "{:4d}"),
        ] + [Column(key, heading, fmt)
             for key, heading, fmt, _ in user_cols]) if verbose else None

        if warm is not None:
            ref = (jnp.asarray(warm.xd, self.dtype),
                   jnp.asarray(warm.ud, self.dtype),
                   jnp.asarray(warm.p, self.dtype))
        else:
            ref = self._guess
            if pars.project_guess:
                ref = project_convex(self.pbm, self.scaling, *ref,
                                     t_grid=self.t_np, dtype=self.dtype)
        lam = pars.lam_init
        eta = pars.eta_init
        J_ref, dltv = self._ref_J_aug(*ref, jnp.asarray(lam, self.dtype),
                                      self.consts)
        J_ref = float(J_ref)

        history = []
        status = SCPStatus.FAILED
        out = None
        best = None
        n_iter = 0
        for it in range(pars.iter_max):
            t0 = time.perf_counter()
            kappa = (1.0 if (it + 1) < pars.iter_mu
                     else pars.mu ** (1 + (it + 1) - pars.iter_mu))
            if pars.timing_detail:
                out, timing = self._step_timed(
                    *ref, dltv, jnp.asarray(eta, self.dtype),
                    jnp.asarray(lam, self.dtype), self.consts)
            else:
                out = self._step(*ref, dltv, jnp.asarray(eta, self.dtype),
                                 jnp.asarray(lam, self.dtype), self.consts)
                timing = None
            n_iter = it + 1
            feas = bool(out["feas"])
            deviation = float(out["deviation"])
            J_sol = float(out["J_aug"])
            rho = float(out["rho"])
            trust_viol = float(out["tr_lhs_max"]) > pars.tr_buffer
            constr_ok = float(out["viol"]) <= pars.c_buffer
            dJ_rel = abs(J_ref - J_sol) / abs(J_ref) if J_ref != 0 else 0.0

            # update rule (gusto.jl:1310-1427)
            upd = ""
            if trust_viol:
                accept = False
                eta_next = eta
                lam_next = pars.gamma_fail * lam
                upd = "lG"
            elif rho < pars.rho_0:
                accept = True
                eta_next = min(pars.eta_ub, pars.beta_gr * eta)
                lam_next = pars.lam_init if constr_ok else pars.gamma_fail * lam
                upd = "G" + ("" if constr_ok else " lG")
            elif rho < pars.rho_1:
                accept = True
                eta_next = eta
                lam_next = pars.lam_init if constr_ok else pars.gamma_fail * lam
                upd = "" if constr_ok else "lG"
            else:
                accept = False
                eta_next = max(pars.eta_lb, eta / pars.beta_sh)
                lam_next = lam
                upd = "S"
            eta_next *= kappa

            rec = IterationRecord(
                iteration=n_iter,
                x=np.asarray(out["x"]), u=np.asarray(out["u"]),
                p=np.asarray(out["p"]),
                J_aug=J_sol, J_orig=float(out["L"]), feas=feas,
                deviation=deviation, improv_rel=dJ_rel,
                ipm_status=int(out["ipm_status"]),
                ipm_iters=int(out["ipm_iters"]),
                defect_norm=float(out["defect_norm"]),
                vd_norm=0.0, vs_norm=0.0,
                timing=(dict(timing,
                             overhead=(time.perf_counter() - t0
                                       - timing["total"]))
                        if timing else
                        {"total": time.perf_counter() - t0}),
                extras={"rho": rho, "eta": eta, "lam": lam,
                        "reject": not accept})
            history.append(rec)

            infeasible = lam > pars.lam_max
            stop = (it > 0 and ((feas and (dJ_rel <= pars.eps_rel
                                           or deviation <= pars.eps_abs))
                                or infeasible))
            if self.pbm.callback is not None:
                if self.pbm.callback(rec):
                    stop = False
            if table:  # after the callback so user columns see its outputs
                table.print_row(dict(
                    iter=n_iter, L=rec.J_orig, J_aug=J_sol,
                    defect=rec.defect_norm, rho=rho, eta=eta, lam=lam,
                    upd=upd + ("" if accept else "!"),
                    ipm=rec.ipm_iters,
                    **{key: fn(rec) for key, _, _, fn in user_cols}))
            if accept:
                ref = (out["x"], out["u"], out["p"])
                dltv = out["dltv"]
                J_ref = J_sol
                best = out
            eta, lam = eta_next, lam_next
            if stop:
                status = (SCPStatus.SOLVED if not infeasible
                          else SCPStatus.FAILED)
                break

        final = best if best is not None else out
        # Reference status semantics (scp.jl:196-245): iter_max exhaustion
        # with a cleanly-solved final subproblem is still SCP_SOLVED (the
        # reference's freeflyer/quadrotor GuSTO tests run with eps = 0).
        # Gate on the ipm_status of the iterate actually RETURNED (`final`,
        # the best accepted one), not the last solved subproblem.
        if status != SCPStatus.SOLVED and final is not None and not (
                lam > pars.lam_max):
            if int(final["ipm_status"]) in (int(ipm.IPMStatus.OPTIMAL),
                                            int(ipm.IPMStatus.ALMOST_OPTIMAL)):
                status = SCPStatus.SOLVED
        xd = np.asarray(final["x"])
        ud = np.asarray(final["u"])
        p = np.asarray(final["p"])
        ts, xs = propagate(
            self.pbm.f, final["x"][0], final["u"], final["p"],
            jnp.asarray(self.t_np, self.dtype),
            nsub=2 * pars.Nsub, method=pars.disc_method,
            impulse=self.pbm.impulse, actions=self.pbm.integration_actions,
            consts=self.consts)
        return SCPSolution(
            status=status, algorithm="gusto", iterations=n_iter,
            xd=xd, ud=ud, p=p, cost=float(final["L"]),
            t_grid=self.t_np.copy(), feas=bool(final["feas"]),
            history=history, t_cont=np.asarray(ts), x_cont=np.asarray(xs))


    # ------------------------------------------------------------------

    def solve_batched(self, bx, bu, bp, n_iters: int):
        """Batched GuSTO: accept/reject state (eta, lam, J_ref, reference)
        is per-scenario traced state inside a `lax.scan` of the vmapped
        step; the host update rule of `solve` (gusto.jl:1310-1427) becomes
        branch-free `jnp.where` bands, including the lambda ladder and the
        kappa forced decay. Converged scenarios stop consuming IPM
        iterations and freeze."""
        fn = self.__dict__.get("_solve_batched_fn")
        if fn is None:
            fn = jax.jit(self._solve_batched_impl,
                         static_argnames=("n_iters",))
            self.__dict__["_solve_batched_fn"] = fn
        return fn(bx, bu, bp, self.consts, n_iters=n_iters)

    def _solve_batched_impl(self, bx, bu, bp, consts, n_iters):
        B = bx.shape[0]
        pars = self.pars
        dt = self.dtype
        lam0 = jnp.full(B, pars.lam_init, dt)

        bJ, bdltv = jax.vmap(
            lambda x, u, p, l: self._ref_J_aug_impl(x, u, p, l, consts)
        )(bx, bu, bp, lam0)
        eta0 = jnp.full(B, pars.eta_init, dt)
        done0 = jnp.zeros(B, bool)
        stat0 = jnp.full(B, int(SCPStatus.FAILED), jnp.int32)
        itr0 = jnp.zeros(B, jnp.int32)
        ipmst0 = jnp.full(B, int(ipm.IPMStatus.MAX_ITER), jnp.int32)

        def body(carry, it):
            (x, u, p, dltv, J_ref, eta, lam, done, status, iters,
             ipmst) = carry
            kappa = jnp.where(
                (it + 1) < pars.iter_mu, 1.0,
                pars.mu ** (1.0 + (it + 1.0) - pars.iter_mu)).astype(dt)
            out = jax.vmap(
                lambda xx, uu, pp, dd, ee, ll, act: self._step_impl(
                    xx, uu, pp, dd, ee, ll, consts, active=act)
            )(x, u, p, dltv, eta, lam, ~done)
            finite = jnp.isfinite(out["J_aug"]) & jnp.isfinite(out["L"])
            rho = out["rho"]
            trust_viol = out["tr_lhs_max"] > pars.tr_buffer
            constr_ok = out["viol"] <= pars.c_buffer
            dJ_rel = jnp.where(
                J_ref != 0, jnp.abs(J_ref - out["J_aug"])
                / jnp.abs(jnp.where(J_ref != 0, J_ref, 1.0)), 0.0)
            # update rule (gusto.jl:1310-1427), branch-free
            accept = ~trust_viol & (rho < pars.rho_1)
            grow_eta = ~trust_viol & (rho < pars.rho_0)
            shrink_eta = ~trust_viol & (rho >= pars.rho_1)
            eta_next = jnp.where(
                grow_eta, jnp.minimum(pars.eta_ub, pars.beta_gr * eta),
                jnp.where(shrink_eta,
                          jnp.maximum(pars.eta_lb, eta / pars.beta_sh),
                          eta)) * kappa
            lam_next = jnp.where(
                trust_viol, pars.gamma_fail * lam,
                jnp.where(accept & constr_ok, pars.lam_init,
                          jnp.where(accept, pars.gamma_fail * lam, lam)))
            infeasible = lam > pars.lam_max    # the lam used THIS step
            stop = ((it > 0)
                    & ((out["feas"] & ((dJ_rel <= pars.eps_rel)
                                       | (out["deviation"]
                                          <= pars.eps_abs)))
                       | infeasible))
            newly_done = ~done & (stop | ~finite)
            adv = ~done & accept & finite
            sel = lambda a, b: jnp.where(
                adv.reshape((B,) + (1,) * (a.ndim - 1)), a, b)
            x_n = sel(out["x"], x)
            u_n = sel(out["u"], u)
            p_n = sel(out["p"], p)
            dltv_n = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    adv.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
                out["dltv"], dltv)
            J_n = jnp.where(adv, out["J_aug"], J_ref)
            status_n = jnp.where(
                newly_done,
                jnp.where(stop & finite & ~infeasible,
                          int(SCPStatus.SOLVED),
                          int(SCPStatus.FAILED)).astype(jnp.int32),
                status)
            ipmst_n = jnp.where(adv, out["ipm_status"], ipmst)
            iters_n = jnp.where(~done, it + 1, iters).astype(jnp.int32)
            eta_n = jnp.where(done, eta, eta_next)
            lam_n = jnp.where(done, lam, lam_next)
            trace = dict(feas=out["feas"], deviation=out["deviation"],
                         rho=rho, eta=eta, lam=lam, J_aug=out["J_aug"],
                         accept=accept, active=~done)
            return ((x_n, u_n, p_n, dltv_n, J_n, eta_n, lam_n,
                     done | newly_done, status_n, iters_n, ipmst_n), trace)

        (x, u, p, dltv, J, eta, lam, done, status, iters, ipmst), traces = (
            jax.lax.scan(
                body,
                (bx, bu, bp, bdltv, bJ, eta0, lam0, done0, stat0, itr0,
                 ipmst0),
                jnp.arange(n_iters)))
        ipm_ok = ((ipmst == int(ipm.IPMStatus.OPTIMAL))
                  | (ipmst == int(ipm.IPMStatus.ALMOST_OPTIMAL)))
        status = jnp.where(~done & ipm_ok & (lam <= pars.lam_max),
                           jnp.asarray(int(SCPStatus.SOLVED), jnp.int32),
                           status)
        defect = jnp.max(
            jnp.abs(dltv.defects / self.scaling.Sx[None, None, :]),
            axis=(1, 2))
        return dict(x=x, u=u, p=p, J_aug=J, feas=defect <= pars.feas_tol,
                    defect_norm=defect, status=status, iters=iters,
                    traces=traces)


def solve(pbm: TrajectoryProblem, pars: GuSTOParameters,
          warm: Optional[SCPSolution] = None,
          verbose: bool = False) -> SCPSolution:
    """Convenience one-shot GuSTO solve (reference `GuSTO.solve`,
    gusto.jl:425)."""
    return GuSTO(pbm, pars).solve(warm=warm, verbose=verbose)
