"""SCvx: successive convexification with hard trust regions and a
reject/accept ratio test (reference src/solvers/scvx.jl).

TPU-native structure mirrors PTR (solvers/ptr.py): ONE traced step —
assemble dense conic data from the reference trajectory and its DLTV
linearization -> batched IPM -> extract -> re-discretize + nonlinear
augmented cost — jitted once, with the scalar trust-region radius eta as a
TRACED input so the accept/reject/shrink/grow host logic never re-traces.

Algorithmic parity (scvx.jl):
  * hard trust region per node: ||dx_hat_k||_q + ||du_hat_k||_q +
    ||dp_hat||_q <= eta via epigraph variables dx_lq/du_lq/dp_lq
    (add_trust_region!, scvx.jl:578-678; q=4 squares the 2-norm via
    SOC + GEOM);
  * penalty L_pen = lambda (trapz(P) + sum(Pf)), P_k >= ||E vd_k||_1 +
    ||vs_k||_1, Pf >= (||vic||_1, ||vtc||_1) (compute_linear_cost_penalty!,
    scvx.jl:804-901) — lowered to weighted slack sums with identical optimum;
  * nonlinear augmented cost J_aug = J_orig + lambda(trapz(P_nl) + BC
    violations), P_nl_k = ||defect_k||_1 + ||max(s_k,0)||_1
    (actual_cost_penalty!, scvx.jl:924-972);
  * ratio rho = (J_aug(ref) - J_aug(sol)) / (J_aug(ref) - L(sol)); reject
    and shrink if rho < rho_0, shrink/hold/grow eta by beta factors in the
    rho_1/rho_2 bands (update_rule, scvx.jl:1000-1045);
  * stop when iter > 1 and feasible and (pre_improv_rel <= eps_rel or
    deviation <= eps_abs) (check_stopping_criterion!, scvx.jl:711-734);
  * initial guess projected onto the convex constraints
    (generate_initial_guess -> correct_convex!, scvx.jl:560-568,
    scp.jl:275-361).
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

from scptoolbox_tpu.config import SCPError, SCPStatus, default_dtype
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
class SCvxParameters:
    """SCvx algorithm parameters (reference scvx.jl:60-81; defaults from the
    quadrotor test configuration, quadrotor/tests.jl:33-51)."""

    N: int = 30
    Nsub: int = 15
    iter_max: int = 15
    disc_method: DiscretizationType = DiscretizationType.FOH
    lam: float = 30.0           # virtual control weight lambda
    rho_0: float = 0.0          # reject below this ratio
    rho_1: float = 0.1          # shrink below this ratio
    rho_2: float = 0.7          # grow above this ratio
    beta_sh: float = 2.0        # shrink factor
    beta_gr: float = 2.0        # growth factor
    eta_init: float = 1.0
    eta_lb: float = 1e-3
    eta_ub: float = 10.0
    eps_abs: float = 1e-5
    eps_rel: float = 1e-4
    feas_tol: float = 1e-3
    q_tr: float = math.inf
    q_exit: float = math.inf
    ipm_tol: float = 1e-8
    ipm_max_iter: int = 60
    ipm_tol_almost: float = 1e-5  # ALMOST_OPTIMAL gate (f32: loosen)
    project_guess: bool = True
    structured_kkt: object = None  # None=auto, True/False force (block_kkt)
    kkt_method: object = None   # None=default Schur; "lu" = full augmented
                                # LU (f32-robust); "staged_qr"/"staged_lu" =
                                # stage-structured augmented sweeps (aug_kkt)
    timing_detail: bool = False  # per-phase timing dict (scp.jl:990-995)


_Q2KIND = {1.0: ConeKind.L1, 2.0: ConeKind.SOC, 4.0: ConeKind.SOC,
           math.inf: ConeKind.LINF}


def _pnorm(v, q):
    if q == math.inf:
        return jnp.max(jnp.abs(v), axis=-1)
    return jnp.sum(jnp.abs(v) ** q, axis=-1) ** (1.0 / q)


class SCvx:
    """SCvx solver bound to one TrajectoryProblem (reference `SCvx.create` +
    `SCvx.solve`, scvx.jl:157, :460-546)."""

    def __init__(self, pbm: TrajectoryProblem, pars: SCvxParameters,
                 dtype=None):
        self.pbm = pbm
        self.pars = pars
        self.dtype = dtype or default_dtype()
        N = pars.N
        nx, nu, npp = pbm.nx, pbm.nu, pbm.np
        self.t_np = np.linspace(0.0, 1.0, N)
        tmpl = SCPTemplate(pbm, N, self.t_np, relax_dynamics=True,
                           relax_bcs=True, dtype=self.dtype)
        lay, plan = tmpl.layout, tmpl.plan

        # trust-region epigraph variables + per-node norm cones
        q = pars.q_tr
        kind = _Q2KIND[float(q)]
        lay.add("dx_lq", N)
        lay.add("du_lq", N)
        self._tr_x = BlockPoster("tr_x", kind, 1 + nx, N, lay, plan)
        self._tr_u = BlockPoster("tr_u", kind, 1 + nu, N, lay, plan)
        if npp > 0:
            lay.add("dp_lq")
            self._tr_p = BlockPoster("tr_p", kind, 1 + npp, 1, lay, plan)
        self._nsum = 2 + (1 if npp > 0 else 0)
        if q == 4.0:
            lay.add("w_tr", N)
            plan.soc("tr_w", N, 1 + self._nsum)
            # GEOM(w, eta, 1): eta >= w^2 — lowered to SOC at post time
            plan.soc("tr_geom", N, 3)
        else:
            plan.nonneg("tr_bound", N)
        self.spec = tmpl.freeze()
        self.tmpl = tmpl

        self.consts = pbm.consts
        xg, ug, pg = bind_consts(pbm.guess, pbm.consts)(N)
        self._guess = (jnp.asarray(xg, self.dtype),
                       jnp.asarray(ug, self.dtype),
                       jnp.asarray(pg, self.dtype))
        self.scaling = solver_scaling(pbm, *self._guess, t_grid=self.t_np, dtype=self.dtype)
        self._S_full, self._c_full = tmpl.scaling_vectors(self.scaling)
        self._E = jnp.eye(nx, dtype=self.dtype)  # scp.jl:149

        from scptoolbox_tpu.solvers.structure import (resolve_kkt,
                                                      random_dltv)

        _asm_probe = jax.jit(
            lambda rx, ru, rp, dltv, eta, consts: self._assemble(
                rx, ru, rp, dltv, eta, consts)[0])

        def _probe(seed):
            rng = np.random.default_rng(seed)
            r = lambda *sh: jnp.asarray(rng.standard_normal(sh), self.dtype)
            dltv = random_dltv(rng, N, nx, nu, npp, self.dtype)
            consts = (_perturb_consts(pbm.consts, rng) if seed >= 2
                      else pbm.consts)
            return _asm_probe(
                r(N, nx), r(N, nu), r(npp), dltv,
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

    def _post_trust_region(self, asm, ref_x, ref_u, ref_p, eta):
        """Hard trust region (reference add_trust_region!, scvx.jl:578-678)."""
        tmpl, pars = self.tmpl, self.pars
        lay, plan = tmpl.layout, tmpl.plan
        N, nx, nu, npp = pars.N, self.pbm.nx, self.pbm.nu, self.pbm.np
        dt = self.dtype
        sc = self.scaling

        def post_eps(poster, z_idx, lq_idx, iS, z_ref, count, nz):
            # cone(lq, iS (z - z_ref)): J rows [lq | iS dz]
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
        post_eps(self._tr_u, lay.idx("u"), lay.idx("du_lq"),
                 1.0 / sc.Su, ref_u, N, nu)
        if npp > 0:
            post_eps(self._tr_p, lay.idx("p")[None, :],
                     lay.idx("dp_lq").reshape(1, 1), 1.0 / sc.Sp,
                     ref_p[None, :], 1, npp)

        lq_cols = [np.asarray(lay.idx("dx_lq")).reshape(N, 1),
                   np.asarray(lay.idx("du_lq")).reshape(N, 1)]
        if npp > 0:
            lq_cols.append(
                np.broadcast_to(np.asarray(lay.idx("dp_lq")).reshape(1, 1),
                                (N, 1)))
        nsum = len(lq_cols)
        cols = np.concatenate(lq_cols, axis=1)
        if pars.q_tr == 4.0:
            # w >= ||(dx_lq, du_lq, dp_lq)||_2 ; eta >= w^2
            w_cols = np.asarray(lay.idx("w_tr")).reshape(N, 1)
            cw = np.concatenate([cols, w_cols], axis=1)
            J = jnp.zeros((N, nsum + 1, nsum + 1), dt)
            J = J.at[:, 0, nsum].set(1.0)
            for i in range(nsum):
                J = J.at[:, 1 + i, i].set(1.0)
            asm.res_soc(self.tmpl.plan.rows("tr_w"), cw,
                        J, jnp.zeros((N, nsum + 1), dt))
            # GEOM(w, eta, 1) -> SOC [w+... ] lowering: eta*1 >= w^2:
            # SOC [eta+1, 2w, eta-1]
            rows = self.tmpl.plan.rows("tr_geom")
            Jg = jnp.zeros((N, 3, 1), dt)
            Jg = Jg.at[:, 1, 0].set(2.0)
            v0g = jnp.broadcast_to(
                jnp.asarray([eta + 1.0, 0.0, eta - 1.0], dt), (N, 3))
            asm.res_soc(rows, w_cols, Jg, v0g)
        else:
            rows = plan.rows("tr_bound").reshape(N, 1)
            J = jnp.ones((N, 1, nsum), dt)
            asm.add_A(rows, cols, J)
            asm.add_b(rows, jnp.full((N, 1), eta, dt))

    def _assemble(self, ref_x, ref_u, ref_p, dltv, eta, consts):
        tmpl, pars = self.tmpl, self.pars
        lay = tmpl.layout
        N = pars.N
        dt = self.dtype
        asm = Assembler(tmpl.m, tmpl.n, dt)
        tmpl.assemble_core(asm, ref_x, ref_u, ref_p, dltv, consts)
        self._post_trust_region(asm, ref_x, ref_u, ref_p, eta)

        # lambda-weighted virtual-control penalty (scvx.jl:804-901 lowered)
        w = jnp.asarray(tmpl.w_trapz, dt)
        lam = pars.lam
        asm.add_c(lay.idx("wvd"),
                  jnp.broadcast_to((lam * w[:-1])[:, None],
                                   (N - 1, self.pbm.nx)))
        if tmpl.struct.ns:
            asm.add_c(lay.idx("vs"),
                      jnp.broadcast_to((lam * w)[:, None],
                                       (N, tmpl.struct.ns)))
        for nm in ("vic", "vtc"):
            if lay.has(nm + "_pos"):
                for sfx in ("_pos", "_neg"):
                    idx = lay.idx(nm + sfx)
                    asm.add_c(idx, jnp.full(idx.shape, lam, dt))

        return asm.finish(self._S_full, self._c_full)

    def _nonlinear_penalty(self, x, u, p, defects, consts=None):
        """actual_cost_penalty! (scvx.jl:924-972): lambda-weighted true
        defect + constraint violation penalty."""
        if consts is None:
            consts = self.consts
        pars, tmpl = self.pars, self.tmpl
        dt = self.dtype
        N = pars.N
        lam = pars.lam
        w = jnp.asarray(tmpl.w_trapz, dt)
        P = jnp.zeros(N, dt)
        P = P.at[:-1].set(jnp.sum(jnp.abs(defects), axis=1))
        if tmpl.struct.ns:
            ts = jnp.asarray(self.t_np, dt)
            ks = jnp.arange(N)
            sval = jax.vmap(lambda t, k, xx, uu: bind_consts(self.pbm.s, consts)(t, k, xx, uu, p)
                            )(ts, ks, x, u)
            P = P + jnp.sum(jnp.maximum(sval, 0.0), axis=1)
        pen = lam * (w @ P)
        if tmpl.struct.n_ic:
            pen = pen + lam * jnp.sum(jnp.abs(
                bind_consts(self.pbm.gic, consts)(x[0], p)))
        if tmpl.struct.n_tc:
            pen = pen + lam * jnp.sum(jnp.abs(
                bind_consts(self.pbm.gtc, consts)(x[-1], p)))
        return pen

    def _step_impl(self, ref_x, ref_u, ref_p, dltv, eta, consts=None,
                   active=None):
        """One full SCvx iteration on device (eta traced; `active` gates
        the IPM for converged scenarios in batched solves)."""
        pars = self.pars
        if consts is None:
            consts = self.consts
        A, b, c, const = self._assemble(ref_x, ref_u, ref_p, dltv, eta, consts)
        sol = ipm.solve(A, b, c, self.spec, tol=pars.ipm_tol,
                        tol_almost=pars.ipm_tol_almost,
                        max_iter=pars.ipm_max_iter, enabled=active,
                        **ipm_kkt_kwargs(self._kkt_method,
                                         self._kkt_builder))
        return self._post_solve(sol, const, ref_x, ref_u, ref_p, consts)

    def _post_solve(self, sol, const, ref_x, ref_u, ref_p, consts):
        """Extract + re-discretize + nonlinear augmented cost (the part of
        the step after the subproblem solve)."""
        pars, tmpl = self.pars, self.tmpl
        sc = self.scaling
        d = self._S_full * sol.x + self._c_full
        x, u, p = tmpl.extract(d)
        L_sol = tmpl.original_cost(x, u, p, consts)      # linear cost (no penalty)
        L_aug = sol.obj + const                  # with subproblem penalty

        dltv_new = self._discretize(x, u, p, consts)
        defect_norm = jnp.max(jnp.abs(dltv_new.defects / sc.Sx[None, :]))
        feas = defect_norm <= pars.feas_tol
        J_aug = (tmpl.original_cost(x, u, p, consts)
                 + self._nonlinear_penalty(x, u, p, dltv_new.defects, consts))

        q = pars.q_exit
        dx = jnp.max(_pnorm((x - ref_x) / sc.Sx[None, :], q))
        dp = (_pnorm((p - ref_p) / sc.Sp, q) if self.pbm.np > 0
              else jnp.zeros((), self.dtype))
        deviation = dx + dp

        lay = tmpl.layout
        vd_norm = jnp.max(jnp.abs(d[lay.sl("wvd")]))
        vs_norm = (jnp.max(jnp.abs(d[lay.sl("vs")])) if tmpl.struct.ns
                   else jnp.zeros((), self.dtype))
        return dict(
            x=x, u=u, p=p, dltv=dltv_new, L=L_sol, L_aug=L_aug, J_aug=J_aug,
            feas=feas, deviation=deviation, defect_norm=defect_norm,
            vd_norm=vd_norm, vs_norm=vs_norm, ipm_status=sol.status,
            ipm_iters=sol.iters)

    def _step_timed(self, ref_x, ref_u, ref_p, dltv, eta, consts):
        """Split-phase step with the reference's per-iteration timing keys
        {formulate, discretize, solve, total, overhead} (scp.jl:990-995)."""
        fns = self.__dict__.get("_timed_fns")
        if fns is None:
            fns = (jax.jit(lambda *a: self._assemble(*a)),
                   jax.jit(lambda A, b, c: ipm.solve(
                       A, b, c, self.spec, tol=self.pars.ipm_tol,
                       tol_almost=self.pars.ipm_tol_almost,
                       max_iter=self.pars.ipm_max_iter,
                       **ipm_kkt_kwargs(self._kkt_method,
                                        self._kkt_builder))),
                   jax.jit(self._post_solve))
            self.__dict__["_timed_fns"] = fns
        f_asm, f_sol, f_post = fns
        t0 = time.perf_counter()
        A, b, c, const = jax.block_until_ready(
            f_asm(ref_x, ref_u, ref_p, dltv, eta, consts))
        t1 = time.perf_counter()
        sol = jax.block_until_ready(f_sol(A, b, c))
        t2 = time.perf_counter()
        out = jax.block_until_ready(
            f_post(sol, const, ref_x, ref_u, ref_p, consts))
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

    def _ref_J_aug_impl(self, x, u, p, consts):
        """Nonlinear augmented cost of a reference trajectory."""
        dltv = self._discretize(x, u, p, consts)
        return (self.tmpl.original_cost(x, u, p, consts)
                + self._nonlinear_penalty(x, u, p, dltv.defects, consts)), dltv

    # ------------------------------------------------------------------

    def solve(self, warm: Optional[SCPSolution] = None,
              verbose: bool = False) -> SCPSolution:
        """Run the SCvx loop (reference scvx.jl:460-546)."""
        pars = self.pars
        user_cols = list(self.pbm.table_columns or ())
        table = Table([
            Column("iter", "iter", "{:4d}"),
            Column("L", "J", "{:11.4e}"),
            Column("J_aug", "J_aug", "{:11.4e}"),
            Column("defect", "defect", "{:9.2e}"),
            Column("rho", "rho", "{:8.2f}"),
            Column("eta", "eta", "{:8.1e}"),
            Column("tr", "tr", "{:>3s}"),
            Column("dev", "deviation", "{:9.2e}"),
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
        J_ref, dltv = self._ref_J_aug(*ref, self.consts)
        J_ref = float(J_ref)
        eta = pars.eta_init

        history = []
        status = SCPStatus.FAILED
        out = None
        best = None
        n_iter = 0
        for it in range(pars.iter_max):
            t0 = time.perf_counter()
            if pars.timing_detail:
                out, timing = self._step_timed(
                    *ref, dltv, jnp.asarray(eta, self.dtype), self.consts)
            else:
                out = self._step(*ref, dltv, jnp.asarray(eta, self.dtype),
                                 self.consts)
                timing = None
            n_iter = it + 1
            feas = bool(out["feas"])
            deviation = float(out["deviation"])
            L_sol = float(out["L"])
            J_sol = float(out["J_aug"])
            pre_improv = J_ref - L_sol
            act_improv = J_ref - J_sol
            rho = act_improv / pre_improv if pre_improv != 0 else np.inf
            pre_improv_rel = pre_improv / abs(J_ref) if J_ref != 0 else 0.0

            # update rule (scvx.jl:1000-1045)
            if rho < pars.rho_0:
                eta_next, accept, tr = max(pars.eta_lb, eta / pars.beta_sh), False, "S"
            elif rho < pars.rho_1:
                eta_next, accept, tr = max(pars.eta_lb, eta / pars.beta_sh), True, "S"
            elif rho < pars.rho_2:
                eta_next, accept, tr = eta, True, ""
            else:
                eta_next, accept, tr = min(pars.eta_ub, pars.beta_gr * eta), True, "G"

            rec = IterationRecord(
                iteration=n_iter,
                x=np.asarray(out["x"]), u=np.asarray(out["u"]),
                p=np.asarray(out["p"]),
                J_aug=J_sol, J_orig=L_sol, feas=feas,
                deviation=deviation, improv_rel=pre_improv_rel,
                ipm_status=int(out["ipm_status"]),
                ipm_iters=int(out["ipm_iters"]),
                defect_norm=float(out["defect_norm"]),
                vd_norm=float(out["vd_norm"]), vs_norm=float(out["vs_norm"]),
                timing=(dict(timing,
                             overhead=(time.perf_counter() - t0
                                       - timing["total"]))
                        if timing else
                        {"total": time.perf_counter() - t0}),
                extras={"rho": rho, "eta": eta, "reject": not accept,
                        "tr_update": tr})
            history.append(rec)

            stop = (it > 0 and feas
                    and (pre_improv_rel <= pars.eps_rel
                         or deviation <= pars.eps_abs))
            if self.pbm.callback is not None:
                if self.pbm.callback(rec):
                    stop = False
            if table:  # after the callback so user columns see its outputs
                table.print_row(dict(iter=n_iter, L=L_sol, J_aug=J_sol,
                                     defect=rec.defect_norm, rho=rho,
                                     eta=eta, tr=tr + ("" if accept else "!"),
                                     dev=deviation,
                                     ipm=rec.ipm_iters,
                                     **{key: fn(rec)
                                        for key, _, _, fn in user_cols}))
            if accept:
                ref = (out["x"], out["u"], out["p"])
                dltv = out["dltv"]
                J_ref = J_sol
                best = out
            eta = eta_next
            if stop:
                status = SCPStatus.SOLVED
                break

        # Reference status semantics (scp.jl:196-245): SCP_SOLVED as long as
        # the final subproblem solved cleanly, even at iter_max (the
        # reference's freeflyer SCvx test runs with eps = 0, spending all 15
        # iterations by design, freeflyer/tests.jl:48-49).
        if status != SCPStatus.SOLVED and out is not None:
            if int(out["ipm_status"]) in (int(ipm.IPMStatus.OPTIMAL),
                                          int(ipm.IPMStatus.ALMOST_OPTIMAL)):
                status = SCPStatus.SOLVED

        final = best if best is not None else out
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
            status=status, algorithm="scvx", iterations=n_iter,
            xd=xd, ud=ud, p=p, cost=float(final["L"]),
            t_grid=self.t_np.copy(), feas=bool(final["feas"]),
            history=history, t_cont=np.asarray(ts), x_cont=np.asarray(xs))


    # ------------------------------------------------------------------

    def solve_batched(self, bx, bu, bp, n_iters: int):
        """Batched SCvx: the accept/reject state (eta, J_ref, reference
        trajectory) is per-scenario traced state inside a `lax.scan` of the
        vmapped step — the host update rule of `solve` (scvx.jl:1000-1045)
        becomes branch-free `jnp.where` bands. Converged scenarios stop
        consuming IPM iterations (ipm.solve enabled=False) and freeze.

        Returns per-scenario final (x, u, p), J_aug, feasibility, `status`
        (SCPStatus codes), `iters`, and per-iteration traces."""
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

        def ref0(x, u, p):
            J, dltv = self._ref_J_aug_impl(x, u, p, consts)
            return J, dltv

        bJ, bdltv = jax.vmap(ref0)(bx, bu, bp)
        eta0 = jnp.full(B, pars.eta_init, dt)
        done0 = jnp.zeros(B, bool)
        stat0 = jnp.full(B, int(SCPStatus.FAILED), jnp.int32)
        itr0 = jnp.zeros(B, jnp.int32)
        ipmst0 = jnp.full(B, int(ipm.IPMStatus.MAX_ITER), jnp.int32)

        def body(carry, it):
            x, u, p, dltv, J_ref, eta, done, status, iters, ipmst = carry
            out = jax.vmap(
                lambda xx, uu, pp, dd, ee, act: self._step_impl(
                    xx, uu, pp, dd, ee, consts, active=act)
            )(x, u, p, dltv, eta, ~done)
            finite = jnp.isfinite(out["J_aug"]) & jnp.isfinite(out["L"])
            pre_improv = J_ref - out["L"]
            act_improv = J_ref - out["J_aug"]
            rho = jnp.where(pre_improv != 0, act_improv
                            / jnp.where(pre_improv != 0, pre_improv, 1.0),
                            jnp.inf)
            pre_improv_rel = jnp.where(
                J_ref != 0, pre_improv / jnp.abs(
                    jnp.where(J_ref != 0, J_ref, 1.0)), 0.0)
            # update rule bands (scvx.jl:1000-1045)
            accept = rho >= pars.rho_0
            eta_next = jnp.where(
                rho < pars.rho_1,
                jnp.maximum(pars.eta_lb, eta / pars.beta_sh),
                jnp.where(rho < pars.rho_2, eta,
                          jnp.minimum(pars.eta_ub, pars.beta_gr * eta)))
            stop = ((it > 0) & out["feas"]
                    & ((pre_improv_rel <= pars.eps_rel)
                       | (out["deviation"] <= pars.eps_abs)))
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
                jnp.where(stop & finite, int(SCPStatus.SOLVED),
                          int(SCPStatus.FAILED)).astype(jnp.int32),
                status)
            ipmst_n = jnp.where(adv, out["ipm_status"], ipmst)
            iters_n = jnp.where(~done, it + 1, iters).astype(jnp.int32)
            eta_n = jnp.where(done, eta, eta_next)
            trace = dict(feas=out["feas"], deviation=out["deviation"],
                         rho=rho, eta=eta, J_aug=out["J_aug"],
                         accept=accept, active=~done)
            return ((x_n, u_n, p_n, dltv_n, J_n, eta_n, done | newly_done,
                     status_n, iters_n, ipmst_n), trace)

        (x, u, p, dltv, J, eta, done, status, iters, ipmst), traces = (
            jax.lax.scan(
                body,
                (bx, bu, bp, bdltv, bJ, eta0, done0, stat0, itr0, ipmst0),
                jnp.arange(n_iters)))
        ipm_ok = ((ipmst == int(ipm.IPMStatus.OPTIMAL))
                  | (ipmst == int(ipm.IPMStatus.ALMOST_OPTIMAL)))
        status = jnp.where(~done & ipm_ok,
                           jnp.asarray(int(SCPStatus.SOLVED), jnp.int32),
                           status)
        defect = jnp.max(
            jnp.abs(dltv.defects / self.scaling.Sx[None, None, :]),
            axis=(1, 2))
        return dict(x=x, u=u, p=p, J_aug=J, feas=defect <= pars.feas_tol,
                    defect_norm=defect, status=status, iters=iters,
                    traces=traces)


def solve(pbm: TrajectoryProblem, pars: SCvxParameters,
          warm: Optional[SCPSolution] = None,
          verbose: bool = False) -> SCPSolution:
    """Convenience one-shot SCvx solve (reference `SCvx.solve`, scvx.jl:460)."""
    return SCvx(pbm, pars).solve(warm=warm, verbose=verbose)
