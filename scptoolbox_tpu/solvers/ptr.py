"""PTR: penalized trust region SCP algorithm (reference src/solvers/ptr.jl).

The TPU-native redesign: the reference rebuilds a JuMP model and re-posts
every constraint macro each iteration (ptr.jl:470); here ONE traced step
function — discretize(ref) -> assemble dense conic data -> batched IPM ->
extract -> discretize(new) for the feasibility check — is jitted, so the
outer loop only moves scalars to the host for stopping/printing, and the
whole step vmaps across scenario batches (the "batched SCP solves" bench).

Algorithmic parity (ptr.jl):
  * per-node trust-region radii eta_x, eta_u and scalar eta_p are DECISION
    variables bounded below by the q-norm of the scaled deviation
    (add_trust_region!, ptr.jl:565-743; q in {1, 2, 4, inf}, where q=4
    bounds the SQUARED 2-norm via SOC+GEOM squaring);
  * cost  J_orig + wtr (trapz(eta_x) + trapz(eta_u) + eta_p)
                 + wvc (trapz(P) + sum(Pf)),
    P_k >= ||E_k vd_k||_1 + ||vs_k||_1, Pf = (||vic||_1, ||vtc||_1)
    (compute_*_penalty!, ptr.jl:753-895) — represented here in lowered form
    (abs-epigraph wvd rows, nonneg vs, +-split vic/vtc) with identical
    optimum;
  * update rule: always accept, reference <- solution (ptr.jl:509);
  * stop when iter > 1 and feasible and (|improv_rel| <= eps_rel or
    deviation <= eps_abs) (check_stopping_criterion!, ptr.jl:908-932),
    deviation per scp.jl:909-931.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.config import SCPStatus, default_dtype
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.ops.discretize import (DiscretizationType, discretize,
                                           propagate)
from scptoolbox_tpu.parser.problem import (ConeKind, TrajectoryProblem,
                                           bind_consts)
from scptoolbox_tpu.solvers.autoscale import solver_scaling
from scptoolbox_tpu.solvers.solution import IterationRecord, SCPSolution
from scptoolbox_tpu.solvers.subproblem import Assembler
from scptoolbox_tpu.solvers.template import (SCPTemplate, BlockPoster,
                                             _perturb_consts)
from scptoolbox_tpu.utils.table import Column, Table


@dataclasses.dataclass(frozen=True)
class PTRParameters:
    """PTR algorithm parameters (reference ptr.jl:57-71)."""

    N: int = 30                 # temporal grid nodes
    Nsub: int = 15              # RK4 substeps per interval
    iter_max: int = 30
    disc_method: DiscretizationType = DiscretizationType.FOH
    wvc: float = 1e2            # virtual control weight
    wtr: float = 1e-2           # trust region weight
    eps_abs: float = 1e-5       # absolute deviation tolerance
    eps_rel: float = 1e-3       # relative cost-improvement tolerance
    feas_tol: float = 5e-3      # dynamic feasibility (defect) tolerance
    q_tr: float = math.inf      # trust region norm: 1, 2, 4 (= squared 2), inf
    q_exit: float = math.inf    # exit-criterion deviation norm
    ipm_tol: float = 1e-8
    ipm_max_iter: int = 60
    ipm_tol_almost: float = 1e-5  # ALMOST_OPTIMAL gate (f32: loosen)
    structured_kkt: object = None  # None=auto, True/False force (block_kkt)
    kkt_method: object = None   # None=default Schur; "lu" = full augmented
                                # LU (f32-robust: no normal-equations
                                # squaring); "staged_lu" = the stage-
                                # structured augmented sweep (ops/aug_kkt:
                                # f32-robust AND O(N s^3), batchable)
    timing_detail: bool = False  # per-phase timing dict (scp.jl:990-995)


_Q2KIND = {1.0: ConeKind.L1, 2.0: ConeKind.SOC, math.inf: ConeKind.LINF}


class _TrustRegion:
    """Plans and posts the per-node trust-region rows
    eta >= ||iS (z - z_ref)||_q (reference add_trust_region!,
    ptr.jl:565-743)."""

    def __init__(self, name: str, nz: int, count: int, q: float, tmpl):
        self.name, self.nz, self.count, self.q = name, nz, count, q
        if q == 4.0:
            tmpl.plan.soc(name + "_tr", count, nz + 2)
        else:
            self.poster = BlockPoster(
                name + "_tr", _Q2KIND[float(q)], 1 + nz, count,
                tmpl.layout, tmpl.plan)

    def post(self, asm, tmpl, z_idx, eta_idx, iS, z_ref):
        """z_idx (count, nz) static; eta_idx (count,); iS (nz,) traced;
        z_ref (count, nz) traced."""
        count, nz = self.count, self.nz
        dt = tmpl.dtype
        cols = np.concatenate(
            [np.asarray(z_idx).reshape(count, nz),
             np.asarray(eta_idx).reshape(count, 1)], axis=1)
        diS = jnp.broadcast_to(jnp.diag(iS), (count, nz, nz))
        if self.q == 4.0:
            # eta >= ||delta||_2^2 : SOC [eta+1, 2 delta, eta-1]
            J = jnp.zeros((count, nz + 2, nz + 1), dt)
            J = J.at[:, 0, nz].set(1.0)
            J = J.at[:, 1:nz + 1, :nz].set(2.0 * diS)
            J = J.at[:, nz + 1, nz].set(1.0)
            v0 = jnp.concatenate(
                [jnp.ones((count, 1), dt), -2.0 * z_ref * iS[None, :],
                 -jnp.ones((count, 1), dt)], axis=1)
            asm.res_soc(tmpl.plan.rows(self.name + "_tr"), cols, J, v0)
        else:
            J = jnp.zeros((count, 1 + nz, nz + 1), dt)
            J = J.at[:, 0, nz].set(1.0)
            J = J.at[:, 1:, :nz].set(diS)
            v0 = jnp.concatenate(
                [jnp.zeros((count, 1), dt), -z_ref * iS[None, :]], axis=1)
            self.poster.post(asm, tmpl.plan, tmpl.layout, cols, J, v0)


def _pnorm(v, q):
    if q == math.inf:
        return jnp.max(jnp.abs(v), axis=-1)
    return jnp.sum(jnp.abs(v) ** q, axis=-1) ** (1.0 / q)


class PTR:
    """PTR solver instance bound to one TrajectoryProblem (reference
    `PTR.create` + `PTR.solve`, ptr.jl:148, :448-532)."""

    def __init__(self, pbm: TrajectoryProblem, pars: PTRParameters,
                 dtype=None):
        self.pbm = pbm
        self.pars = pars
        self.dtype = dtype or default_dtype()
        N = pars.N
        self.t_np = np.linspace(0.0, 1.0, N)
        tmpl = SCPTemplate(pbm, N, self.t_np, relax_dynamics=True,
                           relax_bcs=True, dtype=self.dtype)
        lay = tmpl.layout
        lay.add("eta_x", N)
        lay.add("eta_u", N)
        if pbm.np > 0:
            lay.add("eta_p")
        self._tr_x = _TrustRegion("x", pbm.nx, N, pars.q_tr, tmpl)
        self._tr_u = _TrustRegion("u", pbm.nu, N, pars.q_tr, tmpl)
        if pbm.np > 0:
            self._tr_p = _TrustRegion("p", pbm.np, 1, pars.q_tr, tmpl)
        self.spec = tmpl.freeze()
        self.tmpl = tmpl

        # problem constants: mutable on the host (e.g. homotopy ladders),
        # traced through the jitted step so updates never re-trace
        self.consts = pbm.consts

        # scaling fixed per problem instance (from advice / guess)
        xg, ug, pg = bind_consts(pbm.guess, pbm.consts)(N)
        self._guess = (jnp.asarray(xg, self.dtype), jnp.asarray(ug, self.dtype),
                       jnp.asarray(pg, self.dtype))
        self.scaling = solver_scaling(pbm, *self._guess, t_grid=self.t_np, dtype=self.dtype)
        self._S_full, self._c_full = tmpl.scaling_vectors(self.scaling)
        self._E = jnp.eye(pbm.nx, dtype=self.dtype)  # scp.jl:149

        # stage-structured KKT (block-tridiagonal + arrow, ops/block_kkt)
        from scptoolbox_tpu.solvers.structure import (resolve_kkt,
                                                      random_dltv)

        _asm_probe = jax.jit(
            lambda rx, ru, rp, dltv, consts: self._assemble(
                rx, ru, rp, dltv, consts)[0])

        def _probe(seed):
            rng = np.random.default_rng(seed)
            r = lambda *sh: jnp.asarray(rng.standard_normal(sh), self.dtype)
            dltv = random_dltv(rng, N, pbm.nx, pbm.nu, pbm.np, self.dtype)
            # seed 2 perturbs the consts: footprints must also cover
            # assemblies at runtime consts values (homotopy ladders)
            consts = (_perturb_consts(pbm.consts, rng) if seed >= 2
                      else pbm.consts)
            return _asm_probe(r(N, pbm.nx), r(N, pbm.nu), r(pbm.np), dltv,
                              consts)

        # effective KKT method: explicit request or measured auto policy
        # (structure.resolve_kkt — staged CR on large f32 templates)
        self._kkt_method, self._kkt_builder = resolve_kkt(
            tmpl, _probe, pars.kkt_method, pars.structured_kkt)

        self._step = jax.jit(lambda rx, ru, rp, dltv, J, consts: self._step_impl(rx, ru, rp, dltv, J, consts))

    # ------------------------------------------------------------------

    def _discretize(self, x, u, p, consts=None):
        return discretize(
            self.pbm.f, x, u, p, jnp.asarray(self.t_np, self.dtype), self._E,
            nsub=self.pars.Nsub, method=self.pars.disc_method,
            jac=self.pbm.jac, impulse=self.pbm.impulse,
            actions=self.pbm.integration_actions,
            consts=self.consts if consts is None else consts)

    def _assemble(self, ref_x, ref_u, ref_p, dltv, consts):
        tmpl, pars = self.tmpl, self.pars
        lay, plan = tmpl.layout, tmpl.plan
        N = pars.N
        dt = self.dtype
        asm = Assembler(tmpl.m, tmpl.n, dt)
        tmpl.assemble_core(asm, ref_x, ref_u, ref_p, dltv, consts)

        sc = self.scaling
        self._tr_x.post(asm, tmpl, lay.idx("x"), lay.idx("eta_x"),
                        1.0 / sc.Sx, ref_x)
        self._tr_u.post(asm, tmpl, lay.idx("u"), lay.idx("eta_u"),
                        1.0 / sc.Su, ref_u)
        if self.pbm.np > 0:
            self._tr_p.post(asm, tmpl, lay.idx("p")[None, :],
                            lay.idx("eta_p").reshape(1), 1.0 / sc.Sp,
                            ref_p[None, :])

        # trust-region penalty (ptr.jl:753-789)
        w = jnp.asarray(tmpl.w_trapz, dt)
        asm.add_c(lay.idx("eta_x"), pars.wtr * w)
        asm.add_c(lay.idx("eta_u"), pars.wtr * w)
        if self.pbm.np > 0:
            asm.add_c(lay.idx("eta_p").reshape(1),
                      jnp.asarray([pars.wtr], dt))

        # virtual-control penalty (ptr.jl:799-895): wvc trapz-weighted
        asm.add_c(lay.idx("wvd"),
                  jnp.broadcast_to((pars.wvc * w[:-1])[:, None],
                                   (N - 1, self.pbm.nx)))
        if tmpl.struct.ns:
            asm.add_c(lay.idx("vs"),
                      jnp.broadcast_to((pars.wvc * w)[:, None],
                                       (N, tmpl.struct.ns)))
        for nm in ("vic", "vtc"):
            if lay.has(nm + "_pos"):
                for sfx in ("_pos", "_neg"):
                    idx = lay.idx(nm + sfx)
                    asm.add_c(idx, jnp.full(idx.shape, pars.wvc, dt))

        return asm.finish(self._S_full, self._c_full)

    def _solve_sub(self, A, b, c, active=None):
        from scptoolbox_tpu.solvers.structure import ipm_kkt_kwargs
        return ipm.solve(A, b, c, self.spec, tol=self.pars.ipm_tol,
                         tol_almost=self.pars.ipm_tol_almost,
                         max_iter=self.pars.ipm_max_iter, enabled=active,
                         **ipm_kkt_kwargs(self._kkt_method,
                                          self._kkt_builder))

    def _postprocess(self, sol, const, ref_x, ref_u, ref_p, J_aug_ref,
                     consts):
        """Extract the solution, re-discretize around it, compute the
        stopping metrics (the part of the step after the subproblem solve)."""
        pars, tmpl = self.pars, self.tmpl
        sc = self.scaling
        d = self._S_full * sol.x + self._c_full
        x, u, p = tmpl.extract(d)
        if self.pbm.integration_actions is not None:
            # project the iterate through the problem's integration action
            # (e.g. quaternion renormalization): the convex subproblem has
            # flat directions off the state manifold (||q|| is unobservable
            # in the linear model) and the IPM's central path wanders along
            # them — re-linearizing at an off-manifold reference diverges
            # (the rendezvous_3d quaternion runaway). The reference's
            # SpecialIntegrationActions (helper.jl:488-497) applies the
            # same fixup inside every RK4 step; holding the SCP iterates
            # to the manifold is its outer-loop counterpart.
            act = bind_consts(self.pbm.integration_actions, consts)
            x = jax.vmap(act)(x)
        J_aug = sol.obj + const
        J_orig = tmpl.original_cost(x, u, p, consts)

        dltv_new = self._discretize(x, u, p, consts)
        defect_norm = jnp.max(jnp.abs(dltv_new.defects / sc.Sx[None, :]))
        feas = defect_norm <= pars.feas_tol

        # deviation in scaled variables (scp.jl:909-931)
        q = pars.q_exit
        dx = jnp.max(_pnorm((x - ref_x) / sc.Sx[None, :], q))
        dp = (_pnorm((p - ref_p) / sc.Sp, q) if self.pbm.np > 0
              else jnp.zeros((), self.dtype))
        deviation = dx + dp
        improv_rel = (J_aug_ref - J_aug) / jnp.abs(J_aug_ref)

        lay = tmpl.layout
        vd_norm = jnp.max(jnp.abs(d[lay.sl("wvd")]))
        vs_norm = (jnp.max(jnp.abs(d[lay.sl("vs")])) if tmpl.struct.ns
                   else jnp.zeros((), self.dtype))
        eta_x = d[lay.sl("eta_x")]
        return dict(
            x=x, u=u, p=p, dltv=dltv_new, J_aug=J_aug, J_orig=J_orig,
            feas=feas, deviation=deviation, improv_rel=improv_rel,
            defect_norm=defect_norm, vd_norm=vd_norm, vs_norm=vs_norm,
            eta_max=jnp.max(eta_x), ipm_status=sol.status,
            ipm_iters=sol.iters, pres=sol.pres, dres=sol.dres)

    def _step_impl(self, ref_x, ref_u, ref_p, dltv, J_aug_ref, consts=None,
                   active=None):
        """One full PTR iteration on device (fused path). `active` (traced
        bool) short-circuits the IPM for converged scenarios in batched
        solves."""
        if consts is None:
            consts = self.consts
        A, b, c, const = self._assemble(ref_x, ref_u, ref_p, dltv, consts)
        sol = self._solve_sub(A, b, c, active=active)
        return self._postprocess(sol, const, ref_x, ref_u, ref_p, J_aug_ref,
                                 consts)

    def _step_timed(self, ref_x, ref_u, ref_p, dltv, J_aug_ref, consts):
        """Split-phase step with the reference's per-iteration timing keys
        {formulate, discretize, solve, total, overhead} (scp.jl:990-995;
        ptr.jl:220). Two extra device round trips vs the fused step — used
        when PTRParameters.timing_detail is set."""
        fns = self.__dict__.get("_timed_fns")
        if fns is None:
            fns = (jax.jit(lambda *a: self._assemble(*a)),
                   jax.jit(self._solve_sub),
                   jax.jit(self._postprocess))
            self.__dict__["_timed_fns"] = fns
        f_asm, f_sol, f_post = fns
        t0 = time.perf_counter()
        A, b, c, const = jax.block_until_ready(
            f_asm(ref_x, ref_u, ref_p, dltv, consts))
        t1 = time.perf_counter()
        sol = jax.block_until_ready(f_sol(A, b, c))
        t2 = time.perf_counter()
        out = jax.block_until_ready(
            f_post(sol, const, ref_x, ref_u, ref_p, J_aug_ref, consts))
        t3 = time.perf_counter()
        timing = {"formulate": t1 - t0, "solve": t2 - t1,
                  "discretize": t3 - t2, "total": t3 - t0,
                  "overhead": 0.0}
        return out, timing

    # ------------------------------------------------------------------

    def solve(self, warm: Optional[SCPSolution] = None,
              verbose: bool = False) -> SCPSolution:
        """Run the PTR loop (reference ptr.jl:448-532). Host-side loop over a
        fully jitted step so callbacks/printing stay possible; the jitted
        no-callback batched path is `solve_batched`."""
        pars = self.pars
        user_cols = list(self.pbm.table_columns or ())
        table = Table([
            Column("iter", "iter", "{:4d}"),
            Column("J_orig", "J", "{:12.4e}"),
            Column("J_aug", "J_aug", "{:12.4e}"),
            Column("dJ_rel", "dJ %", "{:9.2e}"),
            Column("defect", "defect", "{:9.2e}"),
            Column("vd", "vd", "{:8.1e}"),
            Column("vs", "vs", "{:8.1e}"),
            Column("dev", "deviation", "{:9.2e}"),
            Column("eta", "eta", "{:8.1e}"),
            Column("ipm", "ipm", "{:4d}"),
        ] + [Column(key, heading, fmt)
             for key, heading, fmt, _ in user_cols]) if verbose else None

        if warm is not None:
            ref = (jnp.asarray(warm.xd, self.dtype),
                   jnp.asarray(warm.ud, self.dtype),
                   jnp.asarray(warm.p, self.dtype))
        else:
            ref = self._guess
        dltv = self._discretize(*ref)
        J_aug_ref = jnp.asarray(jnp.inf, self.dtype)

        history = []
        status = SCPStatus.FAILED
        out = None
        last_good = None
        diverged = False
        n_iter = 0
        # iteration budget extendable by the user callback (the reference's
        # homotopy callback grows pars.iter_max mid-solve so each homotopy
        # stage gets a fresh budget, rendezvous_3d definition.jl:117-127)
        self.extra_iters = 0
        it = -1
        while it + 1 < pars.iter_max + self.extra_iters:
            it += 1
            t0 = time.perf_counter()
            if pars.timing_detail:
                out, timing = self._step_timed(*ref, dltv, J_aug_ref,
                                               self.consts)
            else:
                out = self._step(*ref, dltv, J_aug_ref, self.consts)
                timing = None
            J_aug = float(out["J_aug"])
            feas = bool(out["feas"])
            deviation = float(out["deviation"])
            improv_rel = float(out["improv_rel"])
            n_iter = it + 1
            # emergency exit (reference unsafe_solution + the break in
            # ptr.jl:486-491): a numerically-dead subproblem (NaN cost) must
            # not be accepted as the next reference — stop and keep the last
            # finite iterate
            if not np.isfinite(J_aug):
                out = last_good
                diverged = True
                break
            last_good = out
            rec = IterationRecord(
                iteration=n_iter,
                x=np.asarray(out["x"]), u=np.asarray(out["u"]),
                p=np.asarray(out["p"]),
                J_aug=J_aug, J_orig=float(out["J_orig"]), feas=feas,
                deviation=deviation, improv_rel=improv_rel,
                ipm_status=int(out["ipm_status"]),
                ipm_iters=int(out["ipm_iters"]),
                defect_norm=float(out["defect_norm"]),
                vd_norm=float(out["vd_norm"]), vs_norm=float(out["vs_norm"]),
                timing=(dict(timing,
                             overhead=(time.perf_counter() - t0
                                       - timing["total"]))
                        if timing else
                        {"total": time.perf_counter() - t0}))
            history.append(rec)

            stop = (it > 0 and feas
                    and (abs(improv_rel) <= pars.eps_rel
                         or deviation <= pars.eps_abs))
            if self.pbm.callback is not None:
                if self.pbm.callback(rec):  # veto stopping (problem.jl:322)
                    stop = False
            # print AFTER the callback so user columns see its outputs
            # (reference order: callback ptr.jl:498, print_info :943)
            if table:
                table.print_row(dict(
                    iter=n_iter, J_orig=rec.J_orig, J_aug=J_aug,
                    dJ_rel=improv_rel, defect=rec.defect_norm,
                    vd=rec.vd_norm, vs=rec.vs_norm, dev=deviation,
                    eta=float(out["eta_max"]), ipm=rec.ipm_iters,
                    **{key: fn(rec) for key, _, _, fn in user_cols}))
            if stop:
                status = SCPStatus.SOLVED
                break
            ref = (out["x"], out["u"], out["p"])
            dltv = out["dltv"]
            J_aug_ref = out["J_aug"]

        if out is None:
            from scptoolbox_tpu.config import SCPError

            raise SCPError(SCPStatus.FAILED,
                           "PTR: first subproblem numerically dead")
        # Reference status semantics (scp.jl:196-245 + unsafe_solution
        # scp.jl:965-980): the solve is SCP_SOLVED as long as the FINAL
        # subproblem solved cleanly — exhausting iter_max is not a failure
        # (the reference's freeflyer/quadrotor tests run with eps = 0,
        # deliberately spending the whole budget). A run that ended on the
        # NaN emergency exit is FAILED (reference unsafe_solution path,
        # ptr.jl:486-491) even though the returned last-good iterate's own
        # subproblem was optimal.
        if status != SCPStatus.SOLVED and not diverged and out is not None:
            if int(out["ipm_status"]) in (int(ipm.IPMStatus.OPTIMAL),
                                          int(ipm.IPMStatus.ALMOST_OPTIMAL)):
                status = SCPStatus.SOLVED

        xd = np.asarray(out["x"])
        ud = np.asarray(out["u"])
        p = np.asarray(out["p"])
        ts, xs = propagate(
            self.pbm.f, out["x"][0], out["u"], out["p"],
            jnp.asarray(self.t_np, self.dtype),
            nsub=2 * pars.Nsub, method=pars.disc_method,
            impulse=self.pbm.impulse, actions=self.pbm.integration_actions,
            consts=self.consts)
        return SCPSolution(
            status=status, algorithm="ptr", iterations=n_iter,
            xd=xd, ud=ud, p=p, cost=float(out["J_orig"]),
            t_grid=self.t_np.copy(), feas=bool(out["feas"]),
            history=history, t_cont=np.asarray(ts), x_cont=np.asarray(xs))


    # ------------------------------------------------------------------

    def solve_batched(self, bx, bu, bp, n_iters: int):
        """Batched PTR with per-scenario early stop, solving a whole
        scenario batch through the vmapped step (the "batched SCP solves"
        north star; the reference's trials loop, quadrotor
        tests.jl:160-202, re-solves serially). Iteration dispatch is
        hybrid — one fused device-resident scan for small subproblems, a
        host loop over one jitted body for large ones (see
        _solve_batched_impl for the measured rationale).

        bx (B,N,nx), bu (B,N,nu), bp (B,np). Each scenario applies the
        serial stopping criterion (ptr.jl:908-932); converged/diverged
        scenarios freeze their state and their IPM exits immediately
        (ipm.solve enabled=False), so the batched inner while_loop trip
        count follows the max over ACTIVE scenarios. Returns the final
        outputs per scenario plus per-scenario `status` (SCPStatus codes),
        `iters`, and per-iteration traces."""
        return self._solve_batched_impl(bx, bu, bp, self.consts, n_iters)

    def _solve_batched_impl(self, bx, bu, bp, consts, n_iters):
        B = bx.shape[0]
        pars = self.pars
        body = self.__dict__.get("_solve_batched_body")
        if body is None:
            def _body(carry, it, consts):
                x, u, p, dltv, J, done, status, iters, ipmst = carry
                B = x.shape[0]   # from the traced carry, not the closure
                out = jax.vmap(
                    lambda xx, uu, pp, dd, JJ, act: self._step_impl(
                        xx, uu, pp, dd, JJ, consts, active=act)
                )(x, u, p, dltv, J, ~done)
                finite = jnp.isfinite(out["J_aug"])
                # serial stopping criterion per scenario (ptr.jl:908-932)
                stop = ((it > 0) & out["feas"]
                        & ((jnp.abs(out["improv_rel"]) <= pars.eps_rel)
                           | (out["deviation"] <= pars.eps_abs)))
                newly_done = ~done & (stop | ~finite)
                adv = ~done & finite      # scenarios that accept this step
                sel = lambda a, b: jnp.where(
                    adv.reshape((B,) + (1,) * (a.ndim - 1)), a, b)
                x_n = sel(out["x"], x)
                u_n = sel(out["u"], u)
                p_n = sel(out["p"], p)
                dltv_n = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        adv.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
                    out["dltv"], dltv)
                J_n = jnp.where(adv, out["J_aug"], J)
                status_n = jnp.where(
                    newly_done,
                    jnp.where(stop & finite, int(SCPStatus.SOLVED),
                              int(SCPStatus.FAILED)).astype(jnp.int32),
                    status)
                ipmst_n = jnp.where(adv, out["ipm_status"], ipmst)
                iters_n = jnp.where(~done, it + 1, iters).astype(jnp.int32)
                trace = dict(feas=out["feas"], deviation=out["deviation"],
                             improv_rel=out["improv_rel"],
                             J_aug=out["J_aug"], active=~done)
                done_n = done | newly_done
                return ((x_n, u_n, p_n, dltv_n, J_n, done_n,
                         status_n, iters_n, ipmst_n), trace,
                        jnp.all(done_n))

            body = (_body, jax.jit(_body))
            self.__dict__["_solve_batched_body"] = body

        body_raw, body_jit = body

        def _init_carry(bx, bu, bp, consts):
            Bc = bx.shape[0]   # from the traced args, not the closure
            bdltv = jax.vmap(
                lambda xx, uu, pp: self._discretize(xx, uu, pp, consts)
            )(bx, bu, bp)
            return (bx, bu, bp, bdltv,
                    jnp.full((Bc,), jnp.inf, self.dtype),
                    jnp.zeros(Bc, bool),
                    jnp.full(Bc, int(SCPStatus.FAILED), jnp.int32),
                    jnp.zeros(Bc, jnp.int32),
                    jnp.full(Bc, int(ipm.IPMStatus.MAX_ITER), jnp.int32))

        if self.tmpl.m * self.tmpl.n <= 1_000_000:
            # small subproblems: ONE device-resident program containing
            # the initial discretize AND the iteration scan, with the raw
            # (un-nested-jit) body — each host dispatch over the axon
            # tunnel costs ~0.3 s, a standalone discretize dispatch ~2 s,
            # and a nested jitted body compiles as a separate call; any
            # of the three split forms halves the DI bench (measured
            # 51 -> ~28 solves/s)
            scan_fn = self.__dict__.get("_solve_batched_scan")
            if scan_fn is None:
                def _scan(bx, bu, bp, consts, n_iters):
                    carry = _init_carry(bx, bu, bp, consts)

                    def sbody(c, it):
                        c2, trace, _ = body_raw(c, it, consts)
                        return c2, trace

                    return jax.lax.scan(sbody, carry,
                                        jnp.arange(n_iters))

                scan_fn = jax.jit(_scan, static_argnames=("n_iters",))
                self.__dict__["_solve_batched_scan"] = scan_fn
            carry, traces = scan_fn(bx, bu, bp, consts, n_iters)
            x, u, p, dltv, J, done, status, iters, ipmst = carry
        else:
            # large subproblems (starship-class): the scan-of-steps XLA
            # program is big enough to kill the TPU compile (UNAVAILABLE
            # device error — measured round 4: every sub-op and the
            # single vmapped step run fine; only the scan dies). Host
            # loop with SPARSE early-stop checks: steps dispatch
            # asynchronously and the PREVIOUS step's all-done scalar is
            # fetched every `check_every` steps (each host read costs a
            # tunnel round trip). Converged scenarios are frozen by the
            # masking, so speculative steps are no-ops for them.
            check_every = 4
            init_fn = self.__dict__.get("_solve_batched_init")
            if init_fn is None:
                init_fn = jax.jit(_init_carry)
                self.__dict__["_solve_batched_init"] = init_fn
            carry = init_fn(bx, bu, bp, consts)
            trace_list = []
            prev = None                   # (carry, all_done) of step i-1
            for it in range(n_iters):
                new_carry, trace, all_done = body_jit(
                    carry, jnp.asarray(it, jnp.int32), consts)
                trace_list.append(trace)
                if (prev is not None and it % check_every == 0
                        and bool(prev[1])):
                    carry = prev[0]       # all done BEFORE this step
                    trace_list.pop()
                    break
                prev = (new_carry, all_done)
                carry = new_carry
            x, u, p, dltv, J, done, status, iters, ipmst = carry
            if trace_list:
                traces = jax.tree_util.tree_map(
                    lambda *ts: jnp.stack(ts), *trace_list)
            else:
                # n_iters=0: zero-length traces, agreeing with the scan
                # branch's empty-scan output
                tshape = jax.eval_shape(
                    lambda c: body_raw(c, jnp.asarray(0, jnp.int32),
                                       consts)[1], carry)
                traces = jax.tree_util.tree_map(
                    lambda sd: jnp.zeros((0,) + sd.shape, sd.dtype), tshape)
        # iter_max exhaustion with a clean final subproblem is SOLVED
        # (serial semantics, scp.jl:196-245)
        ipm_ok = ((ipmst == int(ipm.IPMStatus.OPTIMAL))
                  | (ipmst == int(ipm.IPMStatus.ALMOST_OPTIMAL)))
        status = jnp.where(~done & ipm_ok,
                           jnp.asarray(int(SCPStatus.SOLVED), jnp.int32),
                           status)
        defect = jnp.max(
            jnp.abs(dltv.defects / self.scaling.Sx[None, None, :]),
            axis=(1, 2))
        return dict(x=x, u=u, p=p, J_aug=J, feas=defect <= self.pars.feas_tol,
                    defect_norm=defect, status=status, iters=iters,
                    traces=traces)


def solve(pbm: TrajectoryProblem, pars: PTRParameters,
          warm: Optional[SCPSolution] = None,
          verbose: bool = False) -> SCPSolution:
    """Convenience one-shot PTR solve (reference `PTR.solve`, ptr.jl:448)."""
    return PTR(pbm, pars).solve(warm=warm, verbose=verbose)
