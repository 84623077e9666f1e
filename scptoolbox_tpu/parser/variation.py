"""Post-solve KKT variational sensitivity (reference src/parser/variation.jl
:48-517 `variation`): given a solved ConicProgram, build a NEW conic program
in the perturbation variables (dx, dz) whose constraints are the linearized
KKT conditions of the original problem around its primal-dual solution:

    primal feasibility   s* + ds  in K,     ds = db - dA x* - A dx
    dual feasibility     z* + dz  in K*
    compl. slackness     <s*, dz> + <ds, z*> = 0   (per cone block; nonneg
                         rows elementwise, SOC blocks scalar — the
                         reference's form, variation.jl:400-422)
    stationarity         A' dz + d(A' z* + c) = 0

Solving it for a given parameter perturbation d(theta) yields the
directional solution sensitivity dx (and dual sensitivity dz), correctly
respecting active-set/cone-boundary structure — unlike a plain linear
solve of the smooth KKT system.

TPU-native redesign (NOT a port): the reference assembles Dxf/Dpf/Dpxf
Jacobian dictionaries per block by hand through the macro layer
(variation.jl:48-128). Here the ENTIRE lowered problem data (A, b, c) is a
traced function of the parameter dict, so every sensitivity is one
`jax.jvp` through the assembly — and the variational program is itself a
ConicProgram whose traced parameter is d(theta), re-solvable for any
perturbation direction without re-tracing.

The self-duality of the lowered cone set (zero x nonneg x SOC: K* = free x
nonneg x SOC) makes the dual-feasibility rows structurally identical to
the primal ones.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.parser.problem import l1, nonpos, soc, zero
from scptoolbox_tpu.parser.program import ConicProgram, ProgramSolution


class VariationResult(NamedTuple):
    """Directional sensitivities for one parameter perturbation."""

    dvalues: Dict[str, jnp.ndarray]  # variable name -> d(solution block)
    dx: jnp.ndarray                  # raw stacked physical d(decision)
    dz: jnp.ndarray                  # dual perturbation (lowered rows)
    status: jnp.ndarray


class Variation:
    """The variational (KKT perturbation) program of a solved ConicProgram.

    Usage:
        sol = prg.solve(**pvals)
        var = Variation(prg, sol, pvals)
        dres = var.solve(dtheta={"tf": 1.0})   # d(solution)/d(tf) direction
    """

    def __init__(self, prg: ConicProgram, sol: ProgramSolution,
                 pvals: Optional[Dict] = None, *, relax: bool = False,
                 reg: float = 1e-8, mode: str = "derivative",
                 perturbations: Optional[Dict] = None):
        """mode="derivative" (default): the smooth KKT tangent system
        (equalities only) — exact directional derivatives under strict
        complementarity. mode="finite": the reference's conic perturbation
        program (variation.jl:363-422), which additionally imposes cone
        feasibility of the perturbed primal/dual point — conservative for
        curved (SOC) boundaries but valid for finite perturbations.

        perturbations: optional {variable name: parser.perturbation.
        Perturbation} per-element spec (reference perturbation.jl:22-111,
        consumed at variation.jl:186-226): FIXED pins that element's
        physical delta to 0, ABSOLUTE bounds |delta| by `amount`, RELATIVE
        by `amount * |nominal|`; FREE leaves it unconstrained."""
        assert prg._built, "solve the program before building its variation"
        assert mode in ("derivative", "finite")
        self.prg = prg
        self.relax = relax
        self.mode = mode
        dtype = prg.dtype
        pv = {name: jnp.asarray(pvals.get(name, default), dtype)
              if pvals else default
              for name, (_, default) in prg._pars.items()}
        self._pv = pv

        # lowered data at the solution point (scaled decision space)
        A, b, c, _ = prg._assemble(pv)
        spec = prg.spec
        n, m = A.shape[1], A.shape[0]
        xhat = (sol.x - prg._c_full) / prg._S_full  # scaled primal
        s_star = b - A @ xhat
        z_star = sol.z
        self._A = A
        self._xhat = jnp.asarray(xhat)
        self._zstar = jnp.asarray(z_star)
        nz, nl = spec.nz, spec.nl
        soc_dims = spec.socs

        kkt = ConicProgram(dtype=dtype)
        dx = kkt.variable("dx", n)
        dz = kkt.variable("dz", m)
        n_soc = len(soc_dims)
        # complementary-slackness rows: elementwise on nonneg rows, full
        # Jordan product d(s o z) = 0 on SOC blocks (the scalar form the
        # reference uses, variation.jl:400-422, underdetermines the
        # boundary-boundary SOC tangent space)
        n_cs = nl + sum(soc_dims)
        mu = kkt.variable("mu", n_cs) if relax and n_cs else None
        dth = {name: kkt.parameter(f"d_{name}", jnp.zeros_like(val))
               for name, val in pv.items()}
        dth_list = tuple(dth.values())
        order = tuple(dth.keys())

        def dsdb(*dvals):
            """d(b - A x*) under the parameter perturbation: one jvp
            through the traced assembly (x* held fixed)."""
            dd = dict(zip(order, dvals))

            def r_of(p):
                Ap, bp, _, _ = prg._assemble(p)
                return bp - Ap @ self._xhat

            _, tang = jax.jvp(r_of, (pv,), ({k: dd[k] for k in pv},))
            return tang

        def dstat(*dvals):
            """d(A' z* + c) under the parameter perturbation."""
            dd = dict(zip(order, dvals))

            def g_of(p):
                Ap, _, cp, _ = prg._assemble(p)
                return Ap.T @ self._zstar + cp

            _, tang = jax.jvp(g_of, (pv,), ({k: dd[k] for k in pv},))
            return tang

        # ---- primal feasibility ----
        # derivative mode: only the equality rows constrain the tangent
        # (cone rows are handled by complementary slackness; imposing
        # s* + ds in K would spuriously cut the tangent of a curved
        # boundary). finite mode: the reference's full conic feasibility.
        def primal_feas(dxv, *dvals):
            ds = dsdb(*dvals) - A @ dxv
            v = s_star + ds
            cons = []
            if nz > 0:
                cons.append(zero(v[:nz]))
            if mode == "finite":
                if nl > 0:
                    cons.append(nonpos(-v[nz:nz + nl]))
                off = nz + nl
                for d in soc_dims:
                    cons.append(soc(v[off:off + d]))
                    off += d
            return cons or [zero(jnp.zeros(1, dtype))]

        if nz > 0 or mode == "finite":
            kkt.add_constraint("primal_feas", primal_feas, (dx, *dth_list))

        # ---- dual feasibility: z* + dz in K* (free x nonneg x SOC) ----
        def dual_feas(dzv):
            w = z_star + dzv
            cons = []
            if nl > 0:
                cons.append(nonpos(-w[nz:nz + nl]))
            off = nz + nl
            for d in soc_dims:
                cons.append(soc(w[off:off + d]))
                off += d
            return cons or [zero(jnp.zeros(1, dtype))]

        if mode == "finite" and (nl > 0 or soc_dims):
            kkt.add_constraint("dual_feas", dual_feas, (dz,))

        # ---- complementary slackness (variation.jl:400-422) ----
        if n_cs:
            def compl_slack(dxv, dzv, *rest):
                if relax:
                    muv, dvals = rest[0], rest[1:]
                else:
                    muv, dvals = jnp.zeros(n_cs, dtype), rest
                ds = dsdb(*dvals) - A @ dxv
                rows = []
                if nl > 0:
                    ln = slice(nz, nz + nl)
                    rows.append(s_star[ln] * dzv[ln] + ds[ln] * z_star[ln]
                                - muv[:nl])

                def jordan(u, v):
                    # SOC Jordan product: (u o v) = [<u,v>, u0 v1 + v0 u1]
                    return jnp.concatenate(
                        [jnp.dot(u, v)[None], u[0] * v[1:] + v[0] * u[1:]])

                off = nz + nl
                moff = nl
                for d in soc_dims:
                    blk = slice(off, off + d)
                    rows.append(jordan(s_star[blk], dzv[blk])
                                + jordan(ds[blk], z_star[blk])
                                - muv[moff:moff + d])
                    off += d
                    moff += d
                return [zero(jnp.concatenate(rows))]

            args = ((dx, dz, mu, *dth_list) if relax
                    else (dx, dz, *dth_list))
            kkt.add_constraint("compl_slack", compl_slack, args)

        # ---- stationarity: A' dz + d(A'z* + c) = 0 ----
        def stationarity(dzv, *dvals):
            return [zero(A.T @ dzv + dstat(*dvals))]

        kkt.add_constraint("stat", stationarity, (dz, *dth_list))

        # ---- per-element perturbation bounds (perturbation.jl semantics,
        # variation.jl:186-226, 484-494), in PHYSICAL units: the kkt dx is
        # scaled, so bounds divide by the block's diagonal scale ----
        if perturbations:
            from scptoolbox_tpu.parser.perturbation import PerturbationKind

            for vname, pert in perturbations.items():
                sl_v = prg.layout.sl(vname)
                S_blk = np.asarray(prg._S_full[sl_v])
                x_nom = np.asarray(sol.x[sl_v])
                kinds = pert.kind.reshape(-1)
                amounts = np.asarray(pert.amount, float).reshape(-1)
                assert kinds.size == S_blk.size, (
                    f"perturbation for {vname!r} has {kinds.size} elements, "
                    f"block has {S_blk.size}")
                fixed = np.asarray(
                    [k == PerturbationKind.FIXED for k in kinds])
                bnd = amounts.copy()
                rel = np.asarray(
                    [k == PerturbationKind.RELATIVE for k in kinds])
                bnd[rel] = amounts[rel] * np.abs(x_nom[rel])
                bounded = np.asarray(
                    [k in (PerturbationKind.ABSOLUTE,
                           PerturbationKind.RELATIVE) for k in kinds])
                idx0 = sl_v.start
                fix_idx = np.flatnonzero(fixed) + idx0
                bnd_idx = np.flatnonzero(bounded) + idx0
                bnd_amt = bnd[bounded]
                S_all = np.asarray(prg._S_full)

                if fix_idx.size:
                    def pin(dxv, fix_idx=fix_idx):
                        return [zero(dxv[fix_idx])]

                    kkt.add_constraint(f"pert_fix_{vname}", pin, (dx,))
                if bnd_idx.size:
                    def box(dxv, bnd_idx=bnd_idx, bnd_amt=bnd_amt,
                            S=S_all):
                        # |S_i dx_i| <= amount_i  (physical delta bound)
                        d_phys = S[bnd_idx] * dxv[bnd_idx]
                        return [nonpos(jnp.concatenate(
                            [d_phys - bnd_amt, -d_phys - bnd_amt]))]

                    kkt.add_constraint(f"pert_bnd_{vname}", box, (dx,))

        # objective: least-norm perturbation selection (the variational
        # system may be degenerate); with relax, an L1 penalty on the
        # complementary-slackness violation mu (variation.jl:496-514)
        if relax and n_cs:
            t_mu = kkt.variable("t_mu")
            kkt.add_constraint(
                "mu_l1", lambda muv, tv: [l1(jnp.concatenate(
                    [tv.reshape(1), muv]))], (mu, t_mu))
            kkt.add_cost(lambda tv: 1e3 * jnp.sum(tv), (t_mu,))
        kkt.add_cost(
            lambda dxv, dzv: 0.5 * reg * (jnp.dot(dxv, dxv)
                                          + jnp.dot(dzv, dzv)),
            (dx, dz))
        kkt.build()
        self.kkt = kkt
        self._n = n

    def solve(self, dtheta: Optional[Dict] = None, *, tol: float = 1e-8,
              max_iter: int = 60) -> VariationResult:
        """Solve the variational program for one perturbation direction;
        returns physical per-variable solution sensitivities."""
        dtheta = dtheta or {}
        params = {f"d_{k}": jnp.asarray(v, self.prg.dtype)
                  for k, v in dtheta.items()}
        out = self.kkt.solve(tol=tol, max_iter=max_iter, **params)
        dxhat = out.values["dx"]
        d_phys = self.prg._S_full * dxhat  # affine offset cancels in deltas
        dvalues = {name: d_phys[self.prg.layout.sl(name)].reshape(v.shape)
                   for name, v in self.prg._vars.items()}
        return VariationResult(dvalues=dvalues, dx=d_phys,
                               dz=out.values["dz"], status=out.status)


def variation(prg: ConicProgram, sol: ProgramSolution,
              pvals: Optional[Dict] = None, **kw) -> Variation:
    """Build the KKT variational program (reference `variation(prg)`,
    variation.jl:257-352)."""
    return Variation(prg, sol, pvals, **kw)
