"""Stage-structured AUGMENTED KKT factorization: block-tridiagonal + arrow
LDL-style sweep over the full quasidefinite system

    [ eps*I      A'          ] [dx]   [rhs_x]
    [ A       -(W^2 + eps*I) ] [dz] = [rhs_z],

the f32-robust companion to ops/block_kkt.py's normal-equations sweep.

Why a second structured factorization exists (measured on TPU v5e, round 3):
the reduced Schur/normal-equations paths square the NT-scaling conditioning
(H = A_C' W^-2 A_C), and in f32 they stall near ~1e-4 relative KKT merit on
starship-sized subproblems — the SCP loop then diverges. The full augmented
(quasidefinite) system avoids the squaring and converges the f32 Starship
flip, but its dense LU is O((n+m)^3) per IPM iteration and XLA's vmapped
f32 LU of the ~4.8k-row system kernel-faults on TPU. This module keeps the
augmented system's f32 robustness while exploiting the multiple-shooting
stage structure (SURVEY.md §5 "long-context" row; the north-star
"trajectory blocks" centerpiece):

Under the stage permutation with super-blocks t_k = [x_k ; r_k] (stage-k
decision columns and stage-k constraint rows), the augmented matrix is
block-tridiagonal with a dense arrow border (global columns p/BC-slack +
global rows):

    T_k = [ eps*I   B_k' ]      O_k = [ 0    0 ]     V_k = [ 0    0 ]
          [ B_k   -W2_k  ],           [ C_k  0 ],          [ Gg_k 0 ],

where B_k = A[r_k, x_k], C_k = A[r_k, x_{k+1}] (rows are assigned to their
LOWEST stage, so coupling only reaches forward), Gg_k = A[r_k, g_cols],
and W2_k is the dense NT-scaling block restricted to the stage's cone rows
(cone units never straddle stages). One forward block sweep with a small
dense LU per stage factors the whole system in O(N s^3 + N s^2 nb + nb^3),
s = ns + rmax, instead of O((n+m)^3) — ~1600x fewer flops for the Starship
flip — and the per-stage LUs are small enough to vmap across a scenario
batch. Quasidefiniteness (Vanderbei) guarantees the sweep's Schur
complements stay quasidefinite, so the static regularization keeps every
stage factor well-defined without pivoting across stages; iterative
refinement against the unregularized operator (same policy as ipm._LUKKT)
restores full accuracy.

The reference has no analog: ECOS factors a sparse permuted LDL of the
whole KKT each iteration (reference src/parser/program.jl:419-424 hands the
problem to the ECOS C library).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops import cones as cn
from scptoolbox_tpu.ops.cones import ConeSpec


class AugStageStructure:
    """Static stage permutation + row classification over ALL rows (zero
    AND cone rows) of one subproblem template. Hashes by identity (one jit
    trace per solver instance)."""

    def __init__(self, layout, N: int, spec: ConeSpec,
                 A_probe: np.ndarray, global_blocks=()):
        self.N = int(N)
        n = layout.n
        self.n = n
        Am = np.asarray(A_probe) != 0.0      # (m, n) sparsity
        m = Am.shape[0]
        self.m = m

        # ---- column stages: blocks with leading dim N / N-1 are per-node
        col_stage = np.full(n, -1, np.int64)
        for name, (off, shape) in layout._blocks.items():
            if (shape and shape[0] in (N, N - 1)
                    and name not in global_blocks):
                d = int(np.prod(shape[1:])) if len(shape) > 1 else 1
                for k in range(shape[0]):
                    col_stage[off + k * d: off + (k + 1) * d] = k
        stage_cols = [np.flatnonzero(col_stage == k) for k in range(N)]
        g_cols = np.flatnonzero(col_stage < 0)
        self.ns = max(len(s) for s in stage_cols)
        self.ng = len(g_cols)
        self.g_cols = g_cols
        scols = np.full((N, self.ns), n, np.int64)   # phantom col n
        for k, s in enumerate(stage_cols):
            scols[k, : len(s)] = s
        self.scols = scols
        self.scols_next = np.concatenate(
            [scols[1:], np.full((1, self.ns), n, np.int64)], axis=0)
        self.col_pad = (scols == n)

        # ---- row units: zero rows and nonneg rows singly, SOC and EXP
        # blocks whole (cone units never straddle stages)
        units = [np.asarray([i]) for i in range(spec.nz + spec.nl)]
        off = spec.nz + spec.nl
        for d in spec.socs:
            units.append(np.arange(off, off + d))
            off += d
        for _ in range(spec.nexp):
            units.append(np.arange(off, off + 3))
            off += 3
        assert off == m, (off, m)

        stage_rows = [[] for _ in range(N)]
        global_rows = []
        for u in units:
            cols = np.flatnonzero(Am[u].any(axis=0))
            stages = np.unique(col_stage[cols])
            stages = stages[stages >= 0]
            if len(stages) == 0:
                global_rows.extend(u.tolist())
            elif len(stages) == 1:
                stage_rows[int(stages[0])].extend(u.tolist())
            elif len(stages) == 2 and stages[1] == stages[0] + 1:
                stage_rows[int(stages[0])].extend(u.tolist())
            else:
                raise ValueError(
                    f"row unit spans non-adjacent stages {stages}; "
                    "dense KKT required")
        self.rmax = max(max((len(r) for r in stage_rows), default=0), 1)
        rows_pad = np.full((N, self.rmax), m, np.int64)  # phantom row m
        for k, r in enumerate(stage_rows):
            rows_pad[k, : len(r)] = r
        self.rows_pad = rows_pad
        self.row_pad = (rows_pad == m)
        self.global_rows = np.asarray(global_rows, np.int64)
        self.mg = len(global_rows)

        # ---- W^2 metadata: W^2[i,j] = u_i u_j [same cone block] + d_i δij
        # block ids: zero rows -1 (no W^2), nonneg rows unique, SOC shared
        blk = np.full(m + 1, -2, np.int64)   # phantom -2
        blk[: spec.nz] = -1
        nid = 0
        for i in range(spec.nz, spec.nz + spec.nl):
            blk[i] = nid
            nid += 1
        off = spec.nz + spec.nl
        for d in spec.socs:
            blk[off: off + d] = nid
            nid += 1
            off += d
        self.blk_stage = blk[rows_pad]                      # (N, rmax)
        self.blk_global = blk[self.global_rows]             # (mg,)


def _flat_w2_vectors(spec: ConeSpec, W, m: int, dtype, cone_mask):
    """Flat (u, d) with W^2 = u u' (within cone blocks) + diag(d); zero on
    zero-cone rows. W=None (init solve) gives W^2 = diag(cone_mask).

    Exp blocks have dense 3x3 W^2 (BFGS scaling) not representable as
    rank-1 + diag: only the NT-SCALED sweeps (scale_rows=True, where the
    whole cone block collapses to -I and this is called with W=None)
    support exp cones — StagedQR/StagedCR do, raw StagedLU does not."""
    if W is None:
        return jnp.zeros(m, dtype), jnp.asarray(cone_mask, dtype)
    assert spec.nexp == 0, (
        "exp cones require the NT-scaled sweep (StagedQR/StagedCR)")
    u = jnp.zeros(m, dtype)
    d = jnp.zeros(m, dtype)
    if spec.nl > 0:
        d = d.at[spec.lin_slice].set(W.w_l ** 2)
    groups = spec.soc_indices()
    for (eta, wbar), dim in zip(W.socs, W.soc_dims):
        idx = groups[dim]                                   # (k, dim)
        eta2 = eta ** 2                                     # (k, 1)
        u = u.at[idx].set(jnp.sqrt(2.0 * eta2) * wbar)
        J = jnp.concatenate([jnp.ones(1, dtype), -jnp.ones(dim - 1, dtype)])
        d = d.at[idx].set(-eta2 * J[None, :])
    return u, d


class StagedLU:
    """Drop-in KKT backend for ops.ipm.solve (same factor/solve contract as
    ipm._LUKKT: rhs layout [rhs_x (n); rhs_z (m)]), factoring the augmented
    system by the stage sweep described in the module docstring."""

    refine_rounds = 2  # same policy as _LUKKT (refine vs unregularized K0)

    # Pose the system in NT-scaled dual variables dz~ = W dz (conelp's
    # form): the cone block becomes exactly -I, removing the W^2 spread
    # (~1e8 in f32 late in the IPM) from the stage pivots entirely. The
    # scaled rows A~ = W^-1 A_C are formed once per factorization.
    scale_rows = False

    def __init__(self, spec: ConeSpec, A, reg_eps, cone_mask,
                 structure: AugStageStructure):
        self.spec, self.A, self.reg_eps = spec, A, reg_eps
        self.cone_mask = cone_mask
        self.st = structure
        self.n, self.m = A.shape[1], A.shape[0]
        assert self.n == structure.n and self.m == structure.m

    # -- shared block assembly --------------------------------------------

    def _effective_system(self, W):
        """(A_eff, W_eff): the system actually factored. In NT-scaled
        mode the cone rows are pre-scaled by W^-1 (A~ = W^-1 A, zero rows
        pass through cn.scale) and the cone block collapses to -I, i.e.
        the W=None form of the same algebra — so refinement, residuals,
        and the sweep all run in the scaled metric, which weights the
        nearly-active coordinates correctly (euclidean-norm refinement of
        the raw system leaves ~10%% relative errors in s_i ~ mu rows and
        the IPM step length collapses; measured f32 starship)."""
        if self.scale_rows and W is not None:
            A_eff = jax.vmap(
                lambda v: cn.scale(self.spec, W, v, inverse=True),
                in_axes=1, out_axes=1)(self.A)
            return A_eff, None
        return self.A, W

    def _build_blocks(self, A, W):
        """Gather the stage super-blocks (T, O, V) and the border block
        D_g of the augmented system under the stage permutation."""
        dt = self.A.dtype
        u, d = _flat_w2_vectors(self.spec, W, self.m, dt, self.cone_mask)
        reg_x = jnp.full(self.n, self.reg_eps, dt)
        reg_z = jnp.full(self.m, self.reg_eps, dt)
        return self._build_blocks_core(A, u, d, reg_x, reg_z)

    def _build_blocks_core(self, A, u, d, reg_x_vec, reg_z_vec):
        """Core block assembly from the flat (u, d) W^2 representation and
        per-index diagonal regularization vectors (reg_x_vec (n,) for the
        x-x block, reg_z_vec (m,) added to the cone block) — the vector
        form lets StagedCR apply a symmetric Jacobi equilibration."""
        st = self.st
        dt = self.A.dtype
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        s = ns + rmax
        nb = ng + mg
        Ap = jnp.pad(A, ((0, 1), (0, 1)))                   # phantom row/col

        rows = jnp.asarray(st.rows_pad)
        B = Ap[rows[:, :, None], jnp.asarray(st.scols)[:, None, :]]
        C = Ap[rows[:, :, None], jnp.asarray(st.scols_next)[:, None, :]]
        if ng:
            Gg = Ap[rows[:, :, None],
                    jnp.asarray(st.g_cols)[None, None, :]]  # (N, rmax, ng)
        else:
            Gg = jnp.zeros((N, rmax, 0), dt)

        # per-stage dense W^2 blocks from the flat (u, d) representation
        up = jnp.pad(u, (0, 1))
        dp = jnp.pad(d, (0, 1))
        ur = up[rows]                                       # (N, rmax)
        dr = dp[rows]
        bid = jnp.asarray(st.blk_stage)
        same = ((bid[:, :, None] == bid[:, None, :])
                & (bid[:, :, None] >= 0))
        W2blk = (ur[:, :, None] * ur[:, None, :] * same
                 + jax.vmap(jnp.diag)(dr))

        # diagonal stage super-blocks T_k (s, s)
        reg_x = jnp.where(jnp.asarray(st.col_pad),
                          jnp.ones((), dt),
                          jnp.pad(reg_x_vec, (0, 1))[jnp.asarray(st.scols)])
        reg_z = jnp.where(jnp.asarray(st.row_pad),
                          jnp.ones((), dt),
                          jnp.pad(reg_z_vec, (0, 1))[rows])
        T = jnp.zeros((N, s, s), dt)
        T = T.at[:, :ns, :ns].set(jax.vmap(jnp.diag)(
            jnp.asarray(reg_x, dt)))
        T = T.at[:, :ns, ns:].set(jnp.swapaxes(B, 1, 2))
        T = T.at[:, ns:, :ns].set(B)
        T = T.at[:, ns:, ns:].set(-(W2blk + jax.vmap(jnp.diag)(
            jnp.asarray(reg_z, dt))))

        # off-diagonal super-blocks O_k (stage k rows -> stage k+1 cols):
        # only the (r_k, x_{k+1}) = C_k corner is nonzero
        O = jnp.zeros((N, s, s), dt)
        O = O.at[:, ns:, :ns].set(C)

        # arrow border columns V_k (s, nb): (r_k, g_cols) = Gg_k
        V = jnp.zeros((N, s, nb), dt)
        if ng:
            V = V.at[:, ns:, :ng].set(Gg)

        # border block D_g (nb, nb): [[eps*I, Ag'], [Ag, -(W2_g + eps*I)]]
        if nb:
            D_g = jnp.zeros((nb, nb), dt)
            D_g = D_g.at[jnp.arange(ng), jnp.arange(ng)].set(
                reg_x_vec[jnp.asarray(st.g_cols)] if ng
                else jnp.zeros(0, dt))
            if mg:
                grows = jnp.asarray(st.global_rows)
                Ag = (A[grows[:, None], jnp.asarray(st.g_cols)[None, :]]
                      if ng else jnp.zeros((mg, 0), dt))
                ug = u[grows]
                dg = d[grows]
                bg = jnp.asarray(st.blk_global)
                same_g = (bg[:, None] == bg[None, :]) & (bg[:, None] >= 0)
                W2g = ug[:, None] * ug[None, :] * same_g + jnp.diag(dg)
                if ng:
                    D_g = D_g.at[:ng, ng:].set(Ag.T)
                    D_g = D_g.at[ng:, :ng].set(Ag)
                D_g = D_g.at[ng:, ng:].set(
                    -(W2g + jnp.diag(reg_z_vec[grows])))
        else:
            D_g = jnp.zeros((0, 0), dt)
        return T, O, V, D_g

    def _gather_rhs(self, rhs):
        """Permute a flat [rhs_x (n); rhs_z (m)] (optionally multi-column)
        into per-stage (N, s, K) + border (nb, K) blocks."""
        st = self.st
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        nb = ng + mg
        n = self.n
        vec = rhs.ndim == 1
        Rm = rhs[:, None] if vec else rhs
        K = Rm.shape[1]
        dt = Rm.dtype
        rx = jnp.pad(Rm[:n], ((0, 1), (0, 0)))              # phantom
        rz = jnp.pad(Rm[n:], ((0, 1), (0, 0)))
        t = jnp.concatenate(
            [rx[jnp.asarray(st.scols)], rz[jnp.asarray(st.rows_pad)]],
            axis=1)                                         # (N, s, K)
        if nb:
            t_g = jnp.concatenate(
                [Rm[:n][jnp.asarray(st.g_cols)] if ng
                 else jnp.zeros((0, K), dt),
                 Rm[n:][jnp.asarray(st.global_rows)] if mg
                 else jnp.zeros((0, K), dt)], axis=0)       # (nb, K)
        else:
            t_g = jnp.zeros((0, K), dt)
        return t, t_g, vec

    def _scatter_sol(self, x, x_g, vec):
        """Inverse of _gather_rhs: stage blocks (N, s, K) + border (nb, K)
        back to the flat [dx (n); dz (m)] layout."""
        st = self.st
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        n, m = self.n, self.m
        K = x.shape[-1]
        dt = x.dtype
        out_x = jnp.zeros((n + 1, K), dt)
        out_x = out_x.at[jnp.asarray(st.scols).reshape(-1)].set(
            x[:, :ns].reshape(N * ns, K))
        out_z = jnp.zeros((m + 1, K), dt)
        out_z = out_z.at[jnp.asarray(st.rows_pad).reshape(-1)].set(
            x[:, ns:].reshape(N * rmax, K))
        if ng:
            out_x = out_x.at[jnp.asarray(st.g_cols)].set(x_g[:ng])
        if mg:
            out_z = out_z.at[jnp.asarray(st.global_rows)].set(x_g[ng:])
        sol = jnp.concatenate([out_x[:n], out_z[:m]], axis=0)
        return sol[:, 0] if vec else sol

    # -- factorization ----------------------------------------------------

    def factor(self, W):
        st = self.st
        dt = self.A.dtype
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        s = ns + rmax
        nb = ng + mg
        A_eff, W_eff = self._effective_system(W)
        T, O, V, D_g = self._build_blocks(A_eff, W_eff)

        # ---- forward block sweep (lax.scan over stages) ----
        def step(carry, blk):
            M_k, Vp_k, Sg = carry
            T_next, O_k, V_next = blk
            lu_k = jax.scipy.linalg.lu_factor(M_k)
            EF = jax.scipy.linalg.lu_solve(
                lu_k, jnp.concatenate([O_k, Vp_k], axis=1))
            E_k = EF[:, :s]                                 # M_k^-1 O_k
            F_k = EF[:, s:]                                 # M_k^-1 Vp_k
            M_next = T_next - O_k.T @ E_k
            Vp_next = V_next - O_k.T @ F_k if nb else V_next
            Sg_next = Sg + Vp_k.T @ F_k if nb else Sg
            return (M_next, Vp_next, Sg_next), (lu_k, E_k, F_k)

        T_feed = jnp.concatenate([T[1:], jnp.eye(s, dtype=dt)[None]], 0)
        V_feed = jnp.concatenate([V[1:], jnp.zeros((1, s, nb), dt)], 0)
        (_, _, Sg), (lus, E, F) = jax.lax.scan(
            step, (T[0], V[0], jnp.zeros((nb, nb), dt)),
            (T_feed, O, V_feed))
        lu_g = (jax.scipy.linalg.lu_factor(D_g - Sg) if nb
                else (jnp.zeros((0, 0), dt), jnp.zeros(0, jnp.int32)))
        return (lus, E, F, lu_g, O, A_eff, W_eff, W)

    # -- solves -----------------------------------------------------------

    def _pre_rhs(self, W, rhs):
        """Into the NT-scaled metric: rhs_z -> W^-1 rhs_z on cone rows."""
        if not self.scale_rows or W is None:
            return rhs
        n = self.n
        app = lambda v: cn.scale(self.spec, W, v, inverse=True)
        if rhs.ndim == 1:
            return jnp.concatenate([rhs[:n], app(rhs[n:])])
        sc = jax.vmap(app, in_axes=1, out_axes=1)(rhs[n:])
        return jnp.concatenate([rhs[:n], sc], axis=0)

    # dz = W^-1 dz~ on the way out: same transform as _pre_rhs
    _post_sol = _pre_rhs

    def _solve_once(self, fac, rhs):
        """One factored solve in the (possibly NT-scaled) system's own
        variables — no metric transforms here; `solve` handles them."""
        st = self.st
        lus, E, F, lu_g, O, A_eff, W_eff, W = fac
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        s = ns + rmax
        nb = ng + mg
        t, t_g, vec = self._gather_rhs(rhs)
        K = t.shape[-1]
        dt = t.dtype

        # forward: u_k = t_k - O_{k-1}' y_{k-1};  y_k = M_k^-1 u_k;
        # border accumulator  acc += F_k' u_k  (= Vp_k' y_k, M symmetric)
        def fwd(carry, blk):
            y_prev, acc = carry
            t_k, lu_k, O_prev, F_k = blk
            u_k = t_k - O_prev.T @ y_prev
            y_k = jax.scipy.linalg.lu_solve(lu_k, u_k)
            acc = acc + F_k.T @ u_k if nb else acc
            return (y_k, acc), y_k

        O_prev = jnp.concatenate([jnp.zeros((1, s, s), dt), O[:-1]], 0)
        (_, acc), y = jax.lax.scan(
            fwd, (jnp.zeros((s, K), dt), jnp.zeros((nb, K), dt)),
            (t, lus, O_prev, F))
        x_g = (jax.scipy.linalg.lu_solve(lu_g, t_g - acc) if nb
               else t_g)

        # backward: x_k = y_k - E_k x_{k+1} - F_k x_g
        def bwd(x_next, blk):
            y_k, E_k, F_k = blk
            x_k = y_k - E_k @ x_next
            if nb:
                x_k = x_k - F_k @ x_g
            return x_k, x_k

        _, x = jax.lax.scan(
            bwd, jnp.zeros((s, K), dt), (y, E, F), reverse=True)
        return self._scatter_sol(x, x_g, vec)

    # -- guarded refinement (shared by the LU and QR sweeps) ----------------

    def solve(self, fac, rhs):
        A_eff, W_eff, W = fac[-3], fac[-2], fac[-1]
        n = self.n
        mask = (self.cone_mask if rhs.ndim == 1 else self.cone_mask[:, None])
        # refinement runs in the SAME metric the factorization uses: for
        # the NT-scaled system the cone block is -I, so the unregularized
        # operator is the W=None form of A_eff — and the guard norm then
        # weights nearly-active coordinates correctly
        rhs = self._pre_rhs(W, rhs)

        def w2z(z):
            if W_eff is None:
                return z * mask
            app = lambda v: cn.scale(
                self.spec, W_eff, cn.scale(self.spec, W_eff, v)
            ) * self.cone_mask
            return app(z) if z.ndim == 1 else jax.vmap(
                app, in_axes=1, out_axes=1)(z)

        def residual(sol):
            return rhs - jnp.concatenate(
                [A_eff.T @ sol[n:], A_eff @ sol[:n] - w2z(sol[n:])],
                axis=0)

        def rnorm(r):
            # per-column norms so each RHS column keeps its own best
            return (jnp.linalg.norm(r) if r.ndim == 1
                    else jnp.linalg.norm(r, axis=0))

        # GUARDED refinement: a stage sweep's contraction factor can exceed
        # one along worst-case modes at extreme late-IPM scalings, where
        # unguarded rounds amplify instead of refining — keep the
        # best-residual iterate so refinement is monotone by construction.
        best = self._solve_once(fac, rhs)
        best_res = residual(best)
        best_nrm = rnorm(best_res)
        for _ in range(self.refine_rounds):
            cand = best + self._solve_once(fac, best_res)
            cand_res = residual(cand)
            cand_nrm = rnorm(cand_res)
            better = cand_nrm < best_nrm
            pick = (better if best.ndim == 1 else better[None, :])
            best = jnp.where(pick, cand, best)
            best_res = jnp.where(pick, cand_res, best_res)
            best_nrm = jnp.minimum(cand_nrm, best_nrm)
        return self._post_sol(W, best)


class StagedQR(StagedLU):
    """Square-root variant of the stage sweep: a block-banded QR of the
    stage-interior part Kb plus a dense Schur complement for the arrow
    border. Same O(N s^3) complexity class (~7x the LU sweep's constant),
    but backward-stable in the band: orthogonal transforms never amplify,
    so the factor quality in f32 matches globally-pivoted dense LU — this
    is the square-root Kalman/Riccati trick applied to the whole KKT.
    (Measured motivation: the LU sweep's Schur-chain subtractions lose ~5
    digits at IPM-realistic scalings and the f32 starship SCP stalls; see
    StagedLU docstring and tests.)

    Band QR recurrence (pending (P, C1) carried across stages; R gains a
    second super-diagonal S2 of fill-in):

        [P_k ]         [R_k  S1_k S2_k]           [C1_k   ]   [S1_k  ]
        [O_k'] = Q_k * [ 0    ...     ],  Q_k' *  [T_{k+1}] = [P_{k+1}], ...

    Border handled by Schur: Y = Kb^-1 V (via the band factor), S = D_g -
    V' Y,  x_g = S^-1 (t_g - V' Kb^-1 t),  x_b = Kb^-1 t - Y x_g."""

    # measured on the f32 starship subproblem: 5 guarded rounds reach
    # dres 4e-8 (beating dense LU's 2e-7); 2 rounds stall at ~3e-6
    refine_rounds = 5

    # measured: the NT-scaled system lets the f32 starship subproblem IPM
    # reach OPTIMAL (gap 2.9e-6) where the unscaled QR sweep stalls at
    # 2.7e-4 and dense LU at 7.8e-6; the scaled LU sweep is WORSE than the
    # unscaled one (the Schur-chain subtractions dominate there), so only
    # the QR variant defaults to scaled variables.
    scale_rows = True

    def factor(self, W):
        st = self.st
        dt = self.A.dtype
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        s = ns + rmax
        nb = ng + mg
        A_eff, W_eff = self._effective_system(W)
        T, O, V, D_g = self._build_blocks(A_eff, W_eff)

        def qstep(carry, blk):
            P, C1 = carry
            O_k, T_next, O_next = blk
            Mstack = jnp.concatenate([P, O_k.T], axis=0)      # (2s, s)
            Qk, Rfull = jnp.linalg.qr(Mstack, mode="complete")
            R_k = Rfull[:s]
            U1 = Qk.T @ jnp.concatenate([C1, T_next], axis=0)
            S1_k, P_next = U1[:s], U1[s:]
            U2 = Qk.T @ jnp.concatenate(
                [jnp.zeros((s, s), dt), O_next], axis=0)
            S2_k, C1_next = U2[:s], U2[s:]
            return (P_next, C1_next), (Qk, R_k, S1_k, S2_k)

        T_feed = jnp.concatenate([T[1:], jnp.eye(s, dtype=dt)[None]], 0)
        O_next_feed = jnp.concatenate([O[1:], jnp.zeros((1, s, s), dt)], 0)
        _, (Q, R, S1, S2) = jax.lax.scan(
            qstep, (T[0], O[0]), (O, T_feed, O_next_feed))
        band = (Q, R, S1, S2)

        if nb:
            Y = self._band_solve(band, V)                   # (N, s, nb)
            S = D_g - jnp.einsum("ksb,ksc->bc", V, Y)
            lu_S = jax.scipy.linalg.lu_factor(S)
        else:
            Y = jnp.zeros((N, s, 0), dt)
            lu_S = (jnp.zeros((0, 0), dt), jnp.zeros(0, jnp.int32))
        return (band, Y, lu_S, V, A_eff, W_eff, W)

    def _band_solve(self, band, t):
        """Solve Kb x = t for stage-blocked t (N, s, K) via the band QR."""
        Q, R, S1, S2 = band
        N, s, K = t.shape
        dt = t.dtype

        def fwd(rho, blk):
            t_next, Qk = blk
            U = Qk.T @ jnp.concatenate([rho, t_next], axis=0)
            return U[s:], U[:s]                              # rho_next, g_k

        t_feed = jnp.concatenate([t[1:], jnp.zeros((1, s, K), dt)], 0)
        _, g = jax.lax.scan(fwd, t[0], (t_feed, Q))

        def bwd(carry, blk):
            x1, x2 = carry
            g_k, R_k, S1_k, S2_k = blk
            rhs_k = g_k - S1_k @ x1 - S2_k @ x2
            x_k = jax.scipy.linalg.solve_triangular(R_k, rhs_k, lower=False)
            return (x_k, x1), x_k

        _, x = jax.lax.scan(
            bwd, (jnp.zeros((s, K), dt), jnp.zeros((s, K), dt)),
            (g, R, S1, S2), reverse=True)
        return x

    def _solve_once(self, fac, rhs):
        band, Y, lu_S, V, A_eff, W_eff, W = fac
        st = self.st
        nb = st.ng + st.mg
        t, t_g, vec = self._gather_rhs(rhs)
        yb = self._band_solve(band, t)
        if nb:
            x_g = jax.scipy.linalg.lu_solve(
                lu_S, t_g - jnp.einsum("ksb,ksK->bK", V, yb))
            x = yb - jnp.einsum("ksb,bK->ksK", Y, x_g)
        else:
            x_g = t_g
            x = yb
        return self._scatter_sol(x, x_g, vec)


class StagedCR(StagedLU):
    """Parallel-in-time (cyclic reduction) variant of the stage sweep.

    StagedLU/StagedQR factor and solve with `lax.scan`s over the N stages:
    O(N) *sequential* small-block steps, which on TPU makes the whole
    batched Starship workload latency-bound (measured round 4: 0.053
    solves/s at B=8 -> 0.056 at B=32 — zero batch scaling, BASELINE.md).
    Cyclic reduction is the odd/even (2-way nested-dissection) block
    elimination of the same symmetric block-tridiagonal system

        K[k,k] = T_k,  K[k,k+1] = O_k,  K[k+1,k] = O_k',

    halving the stage count per level: eliminating every odd stage j via
    x_j = T_j^-1 (t_j - O_{j-1}' x_{j-1} - O_j x_{j+1}) yields, on the
    even stages i = 2a,

        D'_a = D_2a - O_{2a-1}' D_{2a-1}^-1 O_{2a-1} - O_2a D_{2a+1}^-1 O_2a',
        O'_a = -O_2a D_{2a+1}^-1 O_{2a+1},
        t'_a = t_2a - O_{2a-1}' D_{2a-1}^-1 t_{2a-1} - O_2a D_{2a+1}^-1 t_{2a+1},

    so factor and solve run in ceil(log2 N) *levels*, each level one
    batched LU / batched matmul over the M/2 odd blocks (and the scenario
    batch under vmap) — O(log N) sequential phases of MXU-shaped work
    instead of O(N) scan steps. Same total flop class as the sweep (~2x
    the constant). Because the odd/even permutation is symmetric, every
    reduced D' is a Schur complement of the (regularized) quasidefinite
    system, hence quasidefinite and the per-block LUs stay well-defined
    without cross-stage pivoting. The arrow border is handled by the same
    dense Schur complement as StagedQR.

    f32 accuracy (measured on the starship subproblems): unlike the
    sequentially-pivoted sweeps, block CR has genuine element growth —
    the reduced diagonals reach ~1e7 magnitude and condition 1e12 at the
    deep levels under late-IPM NT scalings, so the factor has a few BAD
    directions along which Richardson refinement does not contract (the
    IPM stalled at ~1e-3 dual residual with any number of guarded
    refinement rounds). Two devices recover certification:
      1. a symmetric Jacobi (Ruiz) equilibration of the augmented system
         per factorization (`jacobi_rounds`), bounding the level growth;
      2. the CR factor is used as a RIGHT PRECONDITIONER inside FGMRES(k)
         rather than a direct solve (`gmres_iters`): a Krylov method
         handles a preconditioner with a handful of bad directions as a
         handful of outlier Ritz values — measured f32: the starship
         subproblem IPM reaches OPTIMAL at gap 2e-9 with k=6 where plain
         refinement never passed 1e-3.

    The reference has no analog (ECOS refactors a sparse LDL of the whole
    KKT per IPM iteration, reference src/parser/program.jl:419-424); this
    is the TPU-native answer to SURVEY.md §5's "long-context"/time-axis
    row."""

    # NT-scaled dual variables (cone block = -I), as StagedQR: removes the
    # W^2 spread from the stage pivots (measured necessary for f32).
    scale_rows = True

    # FGMRES(k) around the CR-factored solve; the plain factored solve is
    # kept as a guard fallback (best residual wins per RHS column)
    gmres_iters = 8

    # symmetric Ruiz/Jacobi equilibration rounds of the augmented system
    # K = [[eps I, A'],[A, -W2]] before the reduction: block CR (unlike
    # the sequentially-pivoted sweep) amplifies through its level
    # recursion U' = -U D^-1 U when the system is badly row/column scaled,
    # and the NT row scaling W^-1 A undoes the one-time Ruiz pass ipm.solve
    # applied to the raw A. K~ = S K S keeps symmetry, quasidefiniteness
    # and the (u, d) + diagonal-reg block form; the outer guarded
    # refinement still runs against the UNscaled operator, so the scaling
    # is purely an internal conditioning device.
    jacobi_rounds = 3

    def _jacobi(self, A_eff, u, d):
        """(s_x, s_z): per-column/row scalings equalizing the inf-norms of
        K~ = S K S, computed implicitly (no K formed)."""
        dt = A_eff.dtype
        absA = jnp.abs(A_eff)
        w2diag = jnp.abs(d) + u * u       # inf-norm proxy of the W^2 rows
        s_x = jnp.ones(self.n, dt)
        s_z = jnp.ones(self.m, dt)
        for _ in range(self.jacobi_rounds):
            rnx = jnp.maximum(self.reg_eps * s_x * s_x,
                              jnp.max(absA * s_z[:, None], axis=0) * s_x)
            rnz = jnp.maximum(w2diag * s_z * s_z,
                              jnp.max(absA * s_x[None, :], axis=1) * s_z)
            s_x = s_x / jnp.sqrt(jnp.where(rnx > 0, rnx, 1.0))
            s_z = s_z / jnp.sqrt(jnp.where(rnz > 0, rnz, 1.0))
        return s_x, s_z

    # -- pluggable small-block LU engine ---------------------------------
    # StagedCRPL swaps these four for the batch-in-lanes Pallas kernels
    # (XLA's batched LU is batch-serial on TPU — see ops/pallas_kernels).

    def _blk_lu(self, D):
        return jax.vmap(jax.scipy.linalg.lu_factor)(D)

    def _blk_solve(self, fac, R):
        return jax.vmap(jax.scipy.linalg.lu_solve)(fac, R)

    def _one_lu(self, M):
        return jax.scipy.linalg.lu_factor(M)

    def _one_solve(self, fac, R):
        return jax.scipy.linalg.lu_solve(fac, R)

    def _empty_one_lu(self, dt):
        return (jnp.zeros((0, 0), dt), jnp.zeros(0, jnp.int32))

    def factor(self, W):
        st = self.st
        dt = self.A.dtype
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        s = ns + rmax
        nb = ng + mg
        A_eff, W_eff = self._effective_system(W)
        u, d = _flat_w2_vectors(self.spec, W_eff, self.m, dt,
                                self.cone_mask)
        s_x, s_z = self._jacobi(A_eff, u, d)
        A_b = s_z[:, None] * A_eff * s_x[None, :]
        T, O, V, D_g = self._build_blocks_core(
            A_b, u * s_z, d * s_z * s_z,
            self.reg_eps * s_x * s_x, self.reg_eps * s_z * s_z)
        s_full = jnp.concatenate([s_x, s_z])

        # pad the stage count to a power of two with decoupled identity
        # blocks (O already ends in a structural zero at stage N-1).
        # The coupling O_k = [[0, 0], [C_k, 0]] keeps its (rmax, ns)
        # corner form through EVERY reduction level (the reduced coupling
        # is O_e D^-1 O_o, which lands back in the corner), so the level
        # recursion carries only C_k and the per-level solves see
        # K = rmax + ns = s right-hand-side columns instead of 2s — this
        # halves the dominant big-K substitution streams (measured, the
        # factor-phase P/Q solves dominate the Pallas-engine factor).
        Npad = 1 << max(N - 1, 0).bit_length() if N > 1 else 1
        self._Npad = Npad
        C = O[:, ns:, :ns]                                   # (N, rmax, ns)
        if Npad > N:
            D = jnp.concatenate(
                [T, jnp.broadcast_to(jnp.eye(s, dtype=dt),
                                     (Npad - N, s, s))], axis=0)
            C = jnp.concatenate(
                [C, jnp.zeros((Npad - N, rmax, ns), dt)], 0)
        else:
            D = T

        levels = []
        M = Npad
        while M > 1:
            D_odd = D[1::2]                                  # (M/2, s, s)
            C_e = C[0::2]                                    # C_{2a}
            C_o = C[1::2]                                    # C_{2a+1}
            lu = self._blk_lu(D_odd)
            # thin RHS: [ [[C_e'],[0]] | [[0],[C_o]] ]  (s, rmax + ns)
            nblk = D_odd.shape[0]
            rhs = jnp.zeros((nblk, s, s), dt)
            rhs = rhs.at[:, :ns, :rmax].set(jnp.swapaxes(C_e, 1, 2))
            rhs = rhs.at[:, ns:, rmax:].set(C_o)
            PQ = self._blk_solve(lu, rhs)
            Pc = PQ[:, :, :rmax]             # D_odd^-1 [[C_e'],[0]]
            Qc = PQ[:, :, rmax:]             # D_odd^-1 [[0],[C_o]]
            # O_o' Q lands in the x-x corner, O_e P in the z-z corner
            Sxx = jnp.einsum("aki,akj->aij", C_o, Qc[:, ns:, :])
            left = jnp.concatenate(
                [jnp.zeros((1, ns, ns), dt), Sxx[:-1]], axis=0)
            D_new = D[0::2]
            D_new = D_new.at[:, :ns, :ns].add(-left)
            D_new = D_new.at[:, ns:, ns:].add(-(C_e @ Pc[:, :ns, :]))
            D = D_new
            C = -(C_e @ Qc[:, :ns, :])
            levels.append((lu, Pc, Qc, C_e, C_o))
            M //= 2
        lu_root = self._one_lu(D[0])

        if nb:
            # V is nonzero only in its first ng columns ([:, ns:, :ng] =
            # Gg): solve the arrow with the thin RHS and pad afterwards
            Vt = V[:, :, :ng]
            Vtp = (jnp.concatenate(
                [Vt, jnp.zeros((Npad - N, s, ng), dt)], axis=0)
                if Npad > N else Vt)
            Yt = self._cr_solve(levels, lu_root, Vtp)[:N]    # (N, s, ng)
            S = D_g.at[:ng, :ng].add(
                -jnp.einsum("ksb,ksc->bc", Vt, Yt))
            lu_S = self._one_lu(S)
        else:
            Yt = jnp.zeros((N, s, 0), dt)
            Vt = jnp.zeros((N, s, 0), dt)
            lu_S = self._empty_one_lu(dt)
        return (tuple(levels), lu_root, Yt, lu_S, s_full, Vt,
                A_eff, W_eff, W)

    def _cr_solve(self, levels, lu_root, t):
        """Solve the block-tridiagonal interior Kb x = t for stage-blocked
        t (Npad, s, K) through the stored reduction levels (corner-form
        couplings: O = [[0,0],[C,0]], so every product is thin)."""
        s = t.shape[1]
        ns = self.st.ns
        dt = t.dtype
        ys = []
        for (lu, Pc, Qc, C_e, C_o) in levels:
            y = self._blk_solve(lu, t[1::2])
            zx = jnp.einsum("aki,akK->aiK", C_o, y[:, ns:])  # O_o' y
            left = jnp.concatenate(
                [jnp.zeros((1,) + zx.shape[1:], dt), zx[:-1]], axis=0)
            t_new = t[0::2]
            t_new = t_new.at[:, :ns].add(-left)
            t_new = t_new.at[:, ns:].add(-(C_e @ y[:, :ns]))  # O_e y
            t = t_new
            ys.append(y)
        x = self._one_solve(lu_root, t[0])[None]             # (1, s, K)
        for (lu, Pc, Qc, C_e, C_o), y in zip(reversed(levels),
                                             reversed(ys)):
            x_next = jnp.concatenate(
                [x[1:], jnp.zeros((1,) + x.shape[1:], dt)], axis=0)
            # P = [0 | Pc], Q = [Qc | 0] in column blocks
            x_odd = (y - Pc @ x[:, ns:] - Qc @ x_next[:, :ns])
            M2 = x.shape[0]
            x = jnp.stack([x, x_odd], axis=1).reshape(
                2 * M2, s, x.shape[-1])
        return x

    def _solve_once(self, fac, rhs):
        levels, lu_root, Yt, lu_S, s_full, Vt, A_eff, W_eff, W = fac
        st = self.st
        N = st.N
        nb = st.ng + st.mg
        # K x = r  <=>  (S K S)(S^-1 x) = S r: scale in, solve K~, scale out
        rhs = (rhs * s_full if rhs.ndim == 1
               else rhs * s_full[:, None])
        t, t_g, vec = self._gather_rhs(rhs)
        dt = t.dtype
        Npad = self._Npad
        tp = (jnp.concatenate(
            [t, jnp.zeros((Npad - N,) + t.shape[1:], dt)], axis=0)
            if Npad > N else t)
        yb = self._cr_solve(levels, lu_root, tp)[:N]
        if nb:
            ng = st.ng
            x_g = self._one_solve(
                lu_S, t_g.at[:ng].add(
                    -jnp.einsum("ksb,ksK->bK", Vt, yb)))
            x = yb - jnp.einsum("ksb,bK->ksK", Yt, x_g[:ng])
        else:
            x_g = t_g
            x = yb
        sol = self._scatter_sol(x, x_g, vec)
        return (sol * s_full if sol.ndim == 1
                else sol * s_full[:, None])

    def solve(self, fac, rhs):
        """FGMRES(gmres_iters) on the unregularized NT-scaled operator,
        right-preconditioned by the CR factor, with a plain factored solve
        as guard (per-column best residual wins). Replaces the base
        class's Richardson refinement — see the class docstring for the
        measured f32 rationale."""
        A_eff, W_eff, W = fac[-3], fac[-2], fac[-1]
        n = self.n
        rhs = self._pre_rhs(W, rhs)

        def w2z1(z):
            if W_eff is None:
                return z * self.cone_mask
            return cn.scale(self.spec, W_eff,
                            cn.scale(self.spec, W_eff, z)) * self.cone_mask

        def matvec(v):
            return jnp.concatenate(
                [A_eff.T @ v[n:], A_eff @ v[:n] - w2z1(v[n:])], axis=0)

        k = self.gmres_iters

        def fgmres_single(b):
            dt = b.dtype
            beta = jnp.linalg.norm(b)
            bsafe = jnp.where(beta > 0, beta, 1.0)
            V = [b / bsafe]
            Z = []
            H = jnp.zeros((k + 1, k), dt)
            for j in range(k):
                z = self._solve_once(fac, V[j])
                Z.append(z)
                w = matvec(z)
                for i in range(j + 1):       # modified Gram-Schmidt
                    hij = jnp.dot(V[i], w)
                    w = w - hij * V[i]
                    H = H.at[i, j].set(hij)
                hn = jnp.linalg.norm(w)
                H = H.at[j + 1, j].set(hn)
                V.append(w / jnp.where(hn > 0, hn, 1.0))
            # small (k+1, k) least squares via reduced QR
            Qh, Rh = jnp.linalg.qr(H)
            e1 = jnp.zeros(k + 1, dt).at[0].set(beta)
            y = jax.scipy.linalg.solve_triangular(
                Rh, Qh.T @ e1, lower=False)
            return sum(y[j] * Z[j] for j in range(k))

        vec = rhs.ndim == 1
        sol = (fgmres_single(rhs) if vec
               else jax.vmap(fgmres_single, in_axes=1, out_axes=1)(rhs))
        plain = self._solve_once(fac, rhs)

        def residual(s_):
            return rhs - (matvec(s_) if vec
                          else jax.vmap(matvec, in_axes=1, out_axes=1)(s_))

        rn = lambda r: (jnp.linalg.norm(r) if vec
                        else jnp.linalg.norm(r, axis=0))
        pick_g = rn(residual(sol)) < rn(residual(plain))
        best = jnp.where(pick_g if vec else pick_g[None, :], sol, plain)
        return self._post_sol(W, best)


class StagedCRPL(StagedCR):
    """StagedCR with the small-block LU engine on the batch-in-lanes
    Pallas kernels (ops/pallas_kernels.lu_factor_lanes/lu_solve_lanes) —
    the TPU throughput variant.

    Identical algebra and numerical contract to StagedCR (unpivoted
    equilibrated quasidefinite blocks, factored triangular substitution,
    FGMRES wrapper with plain-solve guard); only the batched LU engine
    changes. Measured rationale (TPU v5e, round 5): XLA's batched
    lu_factor/lu_solve are batch-serial on this stack (16 -> 63 ms for
    (128 -> 512, 158, 158) f32), which made the whole batched Starship
    KKT latency-bound; the lanes kernels put the (scenario x stage-block)
    batch in the 128-wide lane dimension so the sequential depth is s,
    flat in the batch. Note the one numerical difference from StagedCR:
    the per-block LU is UNPIVOTED (like StagedLU's sweep) — covered by
    the Jacobi equilibration, the FGMRES wrap, and the guard."""

    def _blk_lu(self, D):
        from scptoolbox_tpu.ops.pallas_kernels import lu_factor_lanes
        return lu_factor_lanes(D)

    def _blk_solve(self, fac, R):
        from scptoolbox_tpu.ops.pallas_kernels import lu_solve_lanes
        return lu_solve_lanes(fac, R)

    def _one_lu(self, M):
        return self._blk_lu(M[None])

    def _one_solve(self, fac, R):
        return self._blk_solve(fac, R[None])[0]

    def _empty_one_lu(self, dt):
        return jnp.zeros((1, 0, 0), dt)


class StagedCRQD(StagedCR):
    """Cyclic reduction with quasidefinite 2-Cholesky block algebra and
    EXPLICIT block inverses — an experiment in making every CR phase a
    batched matmul.

    STATUS (measured, round 5): preconditioner-grade only — do NOT use as
    the default TPU path. An explicit inverse of a kappa~1e8 block in f32
    carries forward error ~eps*kappa, so the preconditioned operator sees
    eps*kappa^2 — unbounded at the staged KKT's late-IPM conditioning; the
    pc_floor caps kappa at the price of an O(1) spectral bias on the
    floored rows, and measured on the f32 starship the IPM stalls at
    ~1e-3 gap late-SCP (first subproblem: CR reaches 3.6e-6, CRQD 1.6e-3).
    Factored triangular solves (backward-stable, error eps*kappa) are the
    only form that certifies at this conditioning — see StagedCR. Kept for
    the block algebra and as the measured record of why.

    StagedCR factors the odd diagonal blocks with `vmap(lu_factor)`;
    XLA's batched LU on TPU is a sequential column loop with per-column
    pivot gathers, and it dominated the batched starship IPM iteration
    (measured: time grew ~linearly in the scenario batch B, ~0.3% MXU
    utilization). This variant exploits the invariant block structure of
    the reduction: in the NT-scaled system every level's blocks keep the
    symmetric quasidefinite form

        D = [[X, B'], [B, -Z]],   U = [[0, 0], [C, 0]],

    with X (ns x ns) and Z (rmax x rmax) SPD — the level updates hit only
    X (x-x corner, via the left neighbor), Z (z-z corner, via the right
    neighbor) and C, while B never changes. Each block inverse is then
    two batched CHOLESKYs (Z and the SPD Schur S = X + B'Z^-1 B) plus
    matmuls — the decompositions XLA lowers in blocked (MXU-shaped) form
    — and the inverse actions are materialized as explicit (s x s) block
    inverses so every CR solve phase is one batched matmul per level.

    Explicit inverses and the normal-equations-like S lose f32 digits on
    ill-scaled blocks, so this backend is tuned as a PRECONDITIONER for
    the FGMRES wrapper (which both CR variants already use): the zero-row
    diagonal (regularization-only, ~1e-7 after Jacobi scaling) is floored
    at `pc_floor` so S stays f32-Cholesky-factorable, trading
    preconditioner exactness for conditioning — FGMRES absorbs the
    difference as a few extra Krylov iterations."""

    # preconditioner floor on the z-z diagonal: zero rows carry only the
    # static regularization (~1e-10/1e-7 after Jacobi scaling), and at
    # small floors the Schur assembly S = X + Bt' Bt (Bt ~ 1/sqrt(floor))
    # loses X below the f32 rounding of the 1/floor-scale term, leaving S
    # numerically singular exactly where X was the regularizer (measured:
    # FGMRES stalls near 1e0 at floor<=1e-5). A LARGE floor is fine: it
    # biases the preconditioner on the zero rows only, and the FGMRES
    # wrapper converges through the bias (measured f32 starship sweep:
    # floor 3e-2 + 16 Krylov iters reaches ~1e-6 relative residual,
    # matching the exact-LU StagedCR; 1e-4 stalls at 2e-1).
    pc_floor_f32 = 3e-2
    pc_floor_f64 = 3e-2

    # the floored preconditioner needs a deeper Krylov space than the
    # exact-LU CR factor (measured: 8 iters -> 5e-3, 16 -> ~1e-6)
    gmres_iters = 16

    @staticmethod
    def _chol_inv_robust(M):
        """Batched inverse Cholesky factor of a near-SPD M: returns Li
        with M^-1 = Li' Li (exact up to the ridge bias below), via
        diagonally-normalized Cholesky + a NaN-proof ridge ladder.

        The reduced blocks here carry ~1/pc_floor diagonal spread
        (zero-row elimination) plus, at the deeper reduction levels,
        small indefinite rounding noise inherited from the levels below --
        a plain f32 Cholesky NaNs on them (measured, starship level>=1).
        Jacobi normalization M^ = D^-1/2 M D^-1/2 removes the diagonal
        spread (near-optimal among diagonal scalings for SPD matrices);
        the ladder then factors M^ + r I at the smallest
        r in {10*sqrt(eps), 1e-3, 3e-1} whose Cholesky stays finite per
        batch element. The ridge biases the PRECONDITIONER only -- the
        FGMRES wrapper absorbs the bias as extra Krylov progress."""
        dt = M.dtype
        n = M.shape[-1]
        ar = jnp.arange(n)
        dg = M[..., ar, ar]
        sc = jnp.where(dg > 0, 1.0 / jnp.sqrt(jnp.abs(dg) + 1e-30), 1.0)
        Mh = M * sc[..., :, None] * sc[..., None, :]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=dt),
                               M.shape[:-2] + (n, n))

        def chol_ok(r):
            L = jnp.linalg.cholesky(Mh + r * eye)
            ok = jnp.all(jnp.isfinite(L), axis=(-1, -2))
            return L, ok

        base = jnp.asarray(10.0 * np.sqrt(np.finfo(
            np.float32 if dt == jnp.float32 else np.float64).eps), dt)
        L0, ok0 = chol_ok(base)
        L1, ok1 = chol_ok(jnp.asarray(1e-3, dt))
        L2, _ = chol_ok(jnp.asarray(3e-1, dt))  # diag-dominant: finite
        L2 = jnp.where(jnp.isfinite(L2), L2, eye)  # absolute backstop
        L = jnp.where(ok0[..., None, None], L0,
                      jnp.where(ok1[..., None, None], L1, L2))
        Lh_inv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        # M = (D^1/2 Lh)(D^1/2 Lh)'  =>  Lm^-1 = Lh^-1 D^-1/2
        return Lh_inv * sc[..., None, :]

    def _qd_inverse(self, X, B, Z):
        """Explicit inverse of [[X, B'],[B, -Z]] (batched), in a
        cancellation-resistant orthogonal-projector form. With
        Lz Lz' = Z, Ls Ls' = S = X + B' Z^-1 B, Bt = Lz^-1 B,
        U1 = Bt Ls^-T:

          (D^-1)_xx = S^-1 = Ls^-T Ls^-1,
          (D^-1)_xz = S^-1 B' Z^-1 = Ls^-T U1' Lz^-1,
          (D^-1)_zz = Lz^-T (U1 U1' - I) Lz^-1.

        U1's rows have norm <= 1 (U1 U1' = I - Ls^-1 X Ls^-T), so the
        subtraction U1 U1' - I happens at O(1) scale and its absolute
        rounding error is O(eps), amplified only ONCE by the Lz^-1
        sandwich; the naive form Z^-1 B S^-1 B' Z^-1 - Z^-1 differences
        two O(1/pc_floor)-scale terms and squares that amplification --
        measured f32 starship: FGMRES stalls at 2e-1 relative residual
        under the naive form vs certifying under this one (see
        test_aug_kkt)."""
        Lzi = self._chol_inv_robust(Z)                       # Lz^-1
        Bt = Lzi @ B
        S = X + jnp.swapaxes(Bt, -1, -2) @ Bt
        Lsi = self._chol_inv_robust(S)                       # Ls^-1
        LsiT = jnp.swapaxes(Lsi, -1, -2)
        Sinv = LsiT @ Lsi
        U1 = Bt @ LsiT
        ixz = LsiT @ (jnp.swapaxes(U1, -1, -2) @ Lzi)
        izx = jnp.swapaxes(ixz, -1, -2)
        eye_z = jnp.eye(Z.shape[-1], dtype=Z.dtype)
        izz = (jnp.swapaxes(Lzi, -1, -2)
               @ ((U1 @ jnp.swapaxes(U1, -1, -2)) - eye_z) @ Lzi)
        Minv = jnp.concatenate(
            [jnp.concatenate([Sinv, ixz], axis=-1),
             jnp.concatenate([izx, izz], axis=-1)], axis=-2)
        return Minv

    def factor(self, W):
        st = self.st
        dt = self.A.dtype
        N, ns, rmax, ng, mg = st.N, st.ns, st.rmax, st.ng, st.mg
        s = ns + rmax
        nb = ng + mg
        A_eff, W_eff = self._effective_system(W)
        assert W_eff is None, "StagedCRQD requires the NT-scaled system"
        u, d = _flat_w2_vectors(self.spec, None, self.m, dt,
                                self.cone_mask)
        s_x, s_z = self._jacobi(A_eff, u, d)
        A_b = s_z[:, None] * A_eff * s_x[None, :]
        T, O, V, D_g = self._build_blocks_core(
            A_b, u * s_z, d * s_z * s_z,
            self.reg_eps * s_x * s_x, self.reg_eps * s_z * s_z)
        s_full = jnp.concatenate([s_x, s_z])

        # canonical quasidefinite pieces + preconditioner floor
        floor = jnp.asarray(
            self.pc_floor_f64 if dt == jnp.float64 else self.pc_floor_f32,
            dt)
        X = T[:, :ns, :ns]
        Bb = T[:, ns:, :ns]
        Z = -T[:, ns:, ns:]
        ar = jnp.arange(rmax)
        Z = Z.at[:, ar, ar].set(jnp.maximum(Z[:, ar, ar], floor))
        Cc = O[:, ns:, :ns]

        Npad = 1 << max(N - 1, 0).bit_length() if N > 1 else 1
        self._Npad = Npad
        if Npad > N:
            pad = Npad - N
            X = jnp.concatenate(
                [X, jnp.broadcast_to(jnp.eye(ns, dtype=dt),
                                     (pad, ns, ns))], 0)
            Z = jnp.concatenate(
                [Z, jnp.broadcast_to(jnp.eye(rmax, dtype=dt),
                                     (pad, rmax, rmax))], 0)
            Bb = jnp.concatenate([Bb, jnp.zeros((pad, rmax, ns), dt)], 0)
            Cc = jnp.concatenate([Cc, jnp.zeros((pad, rmax, ns), dt)], 0)

        levels = []
        M = Npad
        while M > 1:
            X_o, Z_o, B_o = X[1::2], Z[1::2], Bb[1::2]
            C_o = Cc[1::2]
            C_e = Cc[0::2]
            Minv = self._qd_inverse(X_o, B_o, Z_o)
            # (D^-1) applied to the structured couplings:
            #   Q = D^-1 [0; C_o] -> (a_Q, b_Q);  P = D^-1 [C_e'; 0]
            a_Q = Minv[:, :ns, ns:] @ C_o
            b_Q = Minv[:, ns:, ns:] @ C_o
            a_P = Minv[:, :ns, :ns] @ jnp.swapaxes(C_e, 1, 2)
            b_P = Minv[:, ns:, :ns] @ jnp.swapaxes(C_e, 1, 2)
            levels.append((Minv, a_Q, b_Q, a_P, b_P, C_e, C_o))
            term = jnp.einsum("aki,akj->aij", C_o, b_Q)
            left = jnp.concatenate(
                [jnp.zeros((1, ns, ns), dt), term[:-1]], axis=0)
            X = X[0::2] - left
            Z = Z[0::2] + C_e @ a_P
            Cc = -C_e @ a_Q
            Bb = Bb[0::2]
            M //= 2
        root_inv = self._qd_inverse(X[0], Bb[0], Z[0])

        if nb:
            # thin arrow (V nonzero only in its first ng columns), same
            # as StagedCR: the shared _solve_once expects (Yt, Vt)
            Vt = V[:, :, :ng]
            Vtp = (jnp.concatenate(
                [Vt, jnp.zeros((Npad - N, s, ng), dt)], axis=0)
                if Npad > N else Vt)
            Yt = self._cr_solve(levels, root_inv, Vtp)[:N]
            S = D_g.at[:ng, :ng].add(
                -jnp.einsum("ksb,ksc->bc", Vt, Yt))
            lu_S = jax.scipy.linalg.lu_factor(S)
        else:
            Yt = jnp.zeros((N, s, 0), dt)
            Vt = jnp.zeros((N, s, 0), dt)
            lu_S = (jnp.zeros((0, 0), dt), jnp.zeros(0, jnp.int32))
        return (tuple(levels), root_inv, Yt, lu_S, s_full, Vt,
                A_eff, W_eff, W)

    def _cr_solve(self, levels, root_inv, t):
        ns = self.st.ns
        dt = t.dtype
        ys = []
        for (Minv, a_Q, b_Q, a_P, b_P, C_e, C_o) in levels:
            y = Minv @ t[1::2]
            lx = jnp.einsum("aki,akK->aiK", C_o, y[:, ns:])
            rz = C_e @ y[:, :ns]
            lx = jnp.concatenate(
                [jnp.zeros((1,) + lx.shape[1:], dt), lx[:-1]], axis=0)
            t = t[0::2]
            t = t.at[:, :ns].add(-lx)
            t = t.at[:, ns:].add(-rz)
            ys.append(y)
        x = (root_inv @ t[0])[None]
        for (Minv, a_Q, b_Q, a_P, b_P, C_e, C_o), y in zip(
                reversed(levels), reversed(ys)):
            x_next = jnp.concatenate(
                [x[1:], jnp.zeros((1,) + x.shape[1:], dt)], axis=0)
            xe_z = x[:, ns:]
            xn_x = x_next[:, :ns]
            x_odd = y - jnp.concatenate(
                [a_P @ xe_z + a_Q @ xn_x,
                 b_P @ xe_z + b_Q @ xn_x], axis=1)
            M2 = x.shape[0]
            x = jnp.stack([x, x_odd], axis=1).reshape(
                2 * M2, x.shape[1], x.shape[-1])
        return x


def make_staged_crqd_builder(structure: AugStageStructure,
                             gmres_iters: Optional[int] = None):
    """Adapter for ops.ipm.solve(kkt_builder=...): cyclic reduction with
    quasidefinite 2-Cholesky blocks (the TPU throughput variant)."""

    def build(spec, A, reg_eps, cone_mask):
        kkt = StagedCRQD(spec, A, reg_eps, cone_mask, structure)
        if gmres_iters is not None:
            kkt.gmres_iters = gmres_iters
        return kkt

    return build


def probe_aug_structure(layout, N: int, spec: ConeSpec, assemble_fn,
                        global_blocks=()) -> Optional[AugStageStructure]:
    """Build the AugStageStructure from a probe assembly (union of three
    random-input sparsity probes, same protocol as block_kkt). Returns None
    when the row structure does not fit the stage pattern. Specs with exp
    cones are supported by the NT-scaled sweeps (StagedQR/StagedCR)."""
    probe = np.asarray(assemble_fn(0)) != 0.0
    for seed in (1, 2):
        probe |= np.asarray(assemble_fn(seed)) != 0.0
    try:
        return AugStageStructure(layout, N, spec, probe.astype(np.float64),
                                 global_blocks=global_blocks)
    except ValueError:
        return None


def make_staged_lu_builder(structure: AugStageStructure):
    """Adapter for ops.ipm.solve(kkt_builder=...)."""

    def build(spec, A, reg_eps, cone_mask):
        return StagedLU(spec, A, reg_eps, cone_mask, structure)

    return build


def make_staged_qr_builder(structure: AugStageStructure):
    """Adapter for ops.ipm.solve(kkt_builder=...): the square-root (band
    QR) sweep — the f32-robust default for TPU."""

    def build(spec, A, reg_eps, cone_mask):
        return StagedQR(spec, A, reg_eps, cone_mask, structure)

    return build


def make_staged_crpl_builder(structure: AugStageStructure,
                             gmres_iters: Optional[int] = None):
    """Adapter for ops.ipm.solve(kkt_builder=...): cyclic reduction with
    the batch-in-lanes Pallas LU engine (the TPU throughput variant)."""

    def build(spec, A, reg_eps, cone_mask):
        kkt = StagedCRPL(spec, A, reg_eps, cone_mask, structure)
        if gmres_iters is not None:
            kkt.gmres_iters = gmres_iters
        return kkt

    return build


def make_staged_cr_builder(structure: AugStageStructure,
                           gmres_iters: Optional[int] = None):
    """Adapter for ops.ipm.solve(kkt_builder=...): the cyclic-reduction
    (parallel-in-time) factorization — O(log N) sequential phases,
    FGMRES-wrapped for f32 certification."""

    def build(spec, A, reg_eps, cone_mask):
        kkt = StagedCR(spec, A, reg_eps, cone_mask, structure)
        if gmres_iters is not None:
            kkt.gmres_iters = gmres_iters
        return kkt

    return build
