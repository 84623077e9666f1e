"""Stage-structured KKT factorization: the block-tridiagonal + arrow solver
that exploits the multiple-shooting structure of SCP subproblems along the
time axis (SURVEY.md §5 "long-context" row, §7 step 3 stage 2; the
north-star's "trajectory blocks" centerpiece).

The reduced (normal-equations) KKT of ops/ipm.py factors

    H = A_C' W^-2 A_C + reg,

which is dense O(m n^2) to form and O(n^3) to factor per IPM iteration.
For SCP subproblems the decision vector is per-node blocks (x_k, u_k,
virtual controls, slacks, per-node trust radii ...) plus a small global
block (parameters p, BC relaxations, scalar radii), and every cone row
touches only one node, two adjacent nodes (dynamics-adjacent rows), and/or
the global block. Under the stage permutation H is therefore

    [ D_0  U_0                 V_0 ]
    [ U_0' D_1  U_1            V_1 ]
    [      ...  ...            ... ]
    [           U'   D_{N-1}   V_  ]
    [ V_0' V_1' ...             Wg ]

block-tridiagonal with a dense arrow border, and one block-Cholesky sweep
(a `lax.scan` over stages — the Riccati-style recursion) factors it in
O(N ns^3 + N ns^2 ng + ng^3) instead of O((N ns + ng)^3). Forming the
blocks costs O(m ns^2) by gathering the per-stage rows of W^-1 A_C instead
of the dense O(m n^2) product.

The structure is detected ONCE per solver instance from the variable layout
(blocks with leading dimension N or N-1 are per-stage) and a probe assembly
with random inputs (row -> stage footprints); the reference's analog of
this structure is the per-stage DLTV update of discretization.jl:28-84.

Equality (zero-cone) rows are handled by the same second-level Schur
complement as `_SchurKKT`: S = A_E H^-1 A_E' with the structured solve
supplying H^-1 A_E'.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops import cones as cn
from scptoolbox_tpu.ops.cones import ConeSpec


class StageStructure:
    """Static stage permutation + row classification for one subproblem
    template. Hashes by identity (one jit trace per solver instance, same
    policy as the per-instance jitted closures elsewhere)."""

    def __init__(self, layout, N: int, spec: ConeSpec,
                 A_probe: np.ndarray, global_blocks=()):
        self.N = int(N)
        n = layout.n
        self.n = n
        nz = spec.nz
        AC = np.asarray(A_probe)[nz:] != 0.0  # (m_C, n) sparsity
        m_C = AC.shape[0]
        self.m_C = m_C

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
        # padded per-stage columns; phantom index n selects a zero column
        scols = np.full((N, self.ns), n, np.int64)
        for k, s in enumerate(stage_cols):
            scols[k, : len(s)] = s
        self.scols = scols
        self.scols_next = np.concatenate(
            [scols[1:], np.full((1, self.ns), n, np.int64)], axis=0)
        self.col_pad = (scols == n)  # padded coords get unit pivots

        # ---- cone-row units: nonneg rows singly, SOC blocks whole (the NT
        # scaling mixes rows within a SOC block, so footprints are unions)
        units = [np.asarray([i]) for i in range(spec.nl)]
        off = spec.nl
        for d in spec.socs:
            units.append(np.arange(off, off + d))
            off += d
        assert off == m_C, (off, m_C)

        stage_rows = [[] for _ in range(N)]
        global_rows = []
        for u in units:
            cols = np.flatnonzero(AC[u].any(axis=0))
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
                    f"cone row unit spans non-adjacent stages {stages}; "
                    "dense KKT required")
        self.rmax = max(max((len(r) for r in stage_rows), default=0), 1)
        rows_pad = np.full((N, self.rmax), m_C, np.int64)  # phantom row m_C
        for k, r in enumerate(stage_rows):
            rows_pad[k, : len(r)] = r
        self.rows_pad = rows_pad
        self.global_rows = np.asarray(global_rows, np.int64)

        # ---- per-stage global-column footprints (for sparse H_kg / H_gg
        # formation; the factorization keeps the arrow border dense)
        g_pos = np.full(n, self.ng, np.int64)  # map col -> position in g_cols
        g_pos[g_cols] = np.arange(self.ng)
        gf = []
        for k in range(N):
            rows = stage_rows[k]
            cols = (np.flatnonzero(AC[rows].any(axis=0)) if rows
                    else np.zeros(0, np.int64))
            gcols_k = cols[col_stage[cols] < 0]
            gf.append(g_pos[gcols_k])
        self.gmax = max(max((len(f) for f in gf), default=0), 1)
        gf_pad = np.full((N, self.gmax), self.ng, np.int64)  # phantom ng
        for k, f in enumerate(gf):
            gf_pad[k, : len(f)] = f
        self.gf_pad = gf_pad
        # original column index of each footprint entry (phantom -> n)
        gcols_ext = np.concatenate([g_cols, [n]])
        self.gf_cols = gcols_ext[gf_pad]  # (N, gmax) indices into columns


def _gather(Gp, rows, cols):
    """Gp ((m+1), (n+1)) padded matrix; rows (N, r), cols (N, c) ->
    (N, r, c)."""
    return Gp[rows[:, :, None], cols[:, None, :]]


class StructuredKKT:
    """Drop-in replacement for ops.ipm._SchurKKT using the stage-structured
    factorization. Same factor(W)/solve(fac, rhs) interface and rhs layout
    [rhs_x (n); rhs_E (nz); rhs_C (m_C)]."""

    # one refinement round suffices: the block solve is already exact up to
    # the tiny static regularization (measured residuals ~1e-14 at two
    # rounds, ~1e-11 at one; the IPM gates at 1e-8)
    refine_rounds = 1

    def __init__(self, spec: ConeSpec, A, reg_eps, cone_mask,
                 structure: StageStructure):
        self.spec, self.A, self.reg_eps = spec, A, reg_eps
        self.cone_mask = cone_mask
        self.st = structure
        self.n, self.m = A.shape[1], A.shape[0]
        self.nz = spec.nz
        self.A_E = A[: self.nz]
        self.A_C = A[self.nz:]
        assert self.n == structure.n and self.A_C.shape[0] == structure.m_C

    # -- W applications (cone rows only), mirroring _SchurKKT ------------

    def _winv(self, W, M):
        """Apply W^-1 to the columns of M (m_C, k)."""
        if W is None:
            return M
        vec = M.ndim == 1
        Mm = M[:, None] if vec else M
        full = jnp.zeros((self.m, Mm.shape[1]), Mm.dtype)
        full = full.at[self.nz:].set(Mm)
        inv1 = jax.vmap(
            lambda v: cn.scale(self.spec, W, v, inverse=True),
            in_axes=1, out_axes=1)(full)
        out = inv1[self.nz:]
        return out[:, 0] if vec else out

    def _winv2(self, W, M):
        return self._winv(W, self._winv(W, M))

    # -- factorization ----------------------------------------------------

    def factor(self, W):
        st = self.st
        dt = self.A.dtype
        N, ns, ng, gmax = st.N, st.ns, st.ng, st.gmax
        G = self._winv(W, self.A_C)                       # (m_C, n)
        Gp = jnp.pad(G, ((0, 1), (0, 1)))                 # phantom row/col

        B = _gather(Gp, st.rows_pad, st.scols)            # (N, rmax, ns)
        C = _gather(Gp, st.rows_pad, st.scols_next)       # (N, rmax, ns)
        Gg = _gather(Gp, st.rows_pad, st.gf_cols)         # (N, rmax, gmax)

        eps_rel = jnp.asarray(100.0, dt) * jnp.finfo(dt).eps

        # diagonal blocks D_k = B_k'B_k + C_{k-1}'C_{k-1} (+ reg, unit pad)
        BtB = jnp.einsum("kri,krj->kij", B, B)
        CtC = jnp.einsum("kri,krj->kij", C, C)
        D = BtB + jnp.concatenate(
            [jnp.zeros((1, ns, ns), dt), CtC[:-1]], axis=0)
        diag = jnp.einsum("kii->ki", D)
        reg = self.reg_eps + eps_rel * jnp.abs(diag)
        reg = jnp.where(jnp.asarray(st.col_pad), 1.0, reg)
        D = D + jax.vmap(jnp.diag)(reg)

        # off-diagonal U_k = B_k' C_k (stage k <-> k+1)
        U = jnp.einsum("kri,krj->kij", B, C)

        # arrow blocks V_k (ns, ng): B_k'Gg_k at gf_k plus C_{k-1}'Gg_{k-1}
        BtG = jnp.einsum("kri,krg->kig", B, Gg)           # (N, ns, gmax)
        CtG = jnp.einsum("kri,krg->kig", C, Gg)

        def scatter_cols(mat, gf):                         # (ns,gmax),(gmax,)
            return jnp.zeros((ns, ng + 1), dt).at[:, gf].add(mat)[:, :ng]

        V = jax.vmap(scatter_cols)(BtG, jnp.asarray(st.gf_pad))
        Vc = jax.vmap(scatter_cols)(CtG, jnp.asarray(st.gf_pad))
        V = V + jnp.concatenate(
            [jnp.zeros((1, ns, ng), dt), Vc[:-1]], axis=0)

        # global block W_g = sum_k Gg_k'Gg_k (scattered) + global rows
        GtG = jnp.einsum("krg,krh->kgh", Gg, Gg)          # (N, gmax, gmax)

        def scatter_gg(mat, gf):
            return jnp.zeros((ng + 1, ng + 1), dt).at[
                gf[:, None], gf[None, :]].add(mat)[:ng, :ng]

        Wg = jnp.sum(jax.vmap(scatter_gg)(GtG, jnp.asarray(st.gf_pad)),
                     axis=0)
        if len(st.global_rows):
            Grow = G[jnp.asarray(st.global_rows)][:, jnp.asarray(st.g_cols)]
            Wg = Wg + Grow.T @ Grow
        if ng:
            reg_g = self.reg_eps + eps_rel * jnp.abs(jnp.diagonal(Wg))
            Wg = Wg + jnp.diag(reg_g)

        # ---- block-Cholesky sweep (lax.scan over stages) ----
        def step(carry, blk):
            M, Vp, Sg = carry
            D_next, U_k, V_next = blk
            L_k = jnp.linalg.cholesky(M)
            E_k = jax.scipy.linalg.solve_triangular(L_k, U_k, lower=True)
            F_k = (jax.scipy.linalg.solve_triangular(L_k, Vp, lower=True)
                   if ng else Vp)
            M_next = D_next - E_k.T @ E_k
            Vp_next = V_next - E_k.T @ F_k if ng else V_next
            Sg_next = Sg + F_k.T @ F_k if ng else Sg
            return (M_next, Vp_next, Sg_next), (L_k, E_k, F_k)

        # feed D_{k+1}, U_k, V_{k+1}; the last step's D/V inputs are dummies
        D_feed = jnp.concatenate([D[1:], jnp.eye(ns, dtype=dt)[None]], 0)
        V_feed = jnp.concatenate([V[1:], jnp.zeros((1, ns, ng), dt)], 0)
        (_, _, Sg), (L, E, F) = jax.lax.scan(
            step, (D[0], V[0], jnp.zeros((ng, ng), dt)),
            (D_feed, U, V_feed))
        L_g = (jnp.linalg.cholesky(Wg - Sg) if ng
               else jnp.zeros((0, 0), dt))

        fac_H = (L, E, F, L_g)

        # ---- second level: equality-row Schur complement ----
        if self.nz:
            HiAE = self._solve_H(fac_H, self.A_E.T)       # (n, nz)
            S = self.A_E @ HiAE
            reg_s = self.reg_eps + eps_rel * jnp.abs(jnp.diagonal(S))
            L_S = jnp.linalg.cholesky(S + jnp.diag(reg_s))
        else:
            HiAE = jnp.zeros((self.n, 0), dt)
            L_S = jnp.zeros((0, 0), dt)
        return (fac_H, HiAE, L_S, W)

    # -- structured H solve -------------------------------------------------

    def _solve_H(self, fac_H, R):
        """Solve H X = R for R (n,) or (n, K) via the block factor."""
        st = self.st
        L, E, F, L_g = fac_H
        vec = R.ndim == 1
        Rm = R[:, None] if vec else R
        K = Rm.shape[1]
        dt = Rm.dtype
        N, ns, ng = st.N, st.ns, st.ng
        Rp = jnp.pad(Rm, ((0, 1), (0, 0)))                # phantom row
        r_st = Rp[jnp.asarray(st.scols)]                  # (N, ns, K)
        r_g = (Rm[jnp.asarray(st.g_cols)] if ng
               else jnp.zeros((0, K), dt))

        # forward: y_k = L_k^-1 (r_k - E_{k-1}' y_{k-1}); y_g via F sums
        def fwd(carry, blk):
            y_prev, acc = carry
            r_k, L_k, E_prev, F_k = blk
            y_k = jax.scipy.linalg.solve_triangular(
                L_k, r_k - E_prev.T @ y_prev, lower=True)
            acc = acc + F_k.T @ y_k if ng else acc
            return (y_k, acc), y_k

        E_prev = jnp.concatenate([jnp.zeros((1, ns, ns), dt), E[:-1]], 0)
        (_, acc), y = jax.lax.scan(
            fwd, (jnp.zeros((ns, K), dt), jnp.zeros((ng, K), dt)),
            (r_st, L, E_prev, F))
        y_g = (jax.scipy.linalg.solve_triangular(L_g, r_g - acc, lower=True)
               if ng else r_g)

        # backward: x_g = L_g'^-1 y_g; x_k = L_k'^-1 (y_k - E_k x_{k+1}
        #                                              - F_k x_g)
        x_g = (jax.scipy.linalg.solve_triangular(L_g.T, y_g, lower=False)
               if ng else y_g)

        def bwd(x_next, blk):
            y_k, L_k, E_k, F_k = blk
            rhs = y_k - E_k @ x_next
            if ng:
                rhs = rhs - F_k @ x_g
            x_k = jax.scipy.linalg.solve_triangular(L_k.T, rhs, lower=False)
            return x_k, x_k

        _, x = jax.lax.scan(
            bwd, jnp.zeros((ns, K), dt), (y, L, E, F), reverse=True)

        # scatter stages + global back to the flat layout
        X = jnp.zeros((st.n + 1, K), dt)
        X = X.at[jnp.asarray(st.scols).reshape(-1)].set(
            x.reshape(N * ns, K))
        if ng:
            X = X.at[jnp.asarray(st.g_cols)].set(x_g)
        X = X[: st.n]
        return X[:, 0] if vec else X

    # -- full KKT solve (same contract as _SchurKKT) -----------------------

    def _solve_once(self, fac, rhs):
        fac_H, HiAE, L_S, W = fac
        n, nz = self.n, self.nz
        rx = rhs[:n]
        rE = rhs[n: n + nz]
        rC = rhs[n + nz:]
        r1 = rx + self.A_C.T @ self._winv2(W, rC)
        y = self._solve_H(fac_H, r1)
        if nz:
            dzE = jax.scipy.linalg.cho_solve((L_S, True), self.A_E @ y - rE)
            dx = y - HiAE @ dzE
        else:
            dzE = rE
            dx = y
        dzC = self._winv2(W, self.A_C @ dx - rC)
        return jnp.concatenate([dx, dzE, dzC], axis=0)

    def solve(self, fac, rhs):
        W = fac[3]
        sol = self._solve_once(fac, rhs)
        n = self.n
        mask = (self.cone_mask if sol.ndim == 1 else self.cone_mask[:, None])

        def w2_matvec(M):
            if W is None:
                return M * mask
            app = lambda v: cn.scale(
                self.spec, W, cn.scale(self.spec, W, v)) * self.cone_mask
            return app(M) if M.ndim == 1 else jax.vmap(
                app, in_axes=1, out_axes=1)(M)

        for _ in range(self.refine_rounds):
            w2z = w2_matvec(sol[n:])
            resid = rhs - jnp.concatenate(
                [self.A.T @ sol[n:], self.A @ sol[:n] - w2z], axis=0)
            sol = sol + self._solve_once(fac, resid)
        return sol


def probe_structure(layout, N: int, spec: ConeSpec, assemble_fn,
                    global_blocks=()) -> Optional[StageStructure]:
    """Build the StageStructure from a probe assembly. `assemble_fn(seed)`
    must return the dense A with RANDOM inputs substituted for the traced
    ones (structural sparsity by union of three probes; solvers use seed 2
    to also perturb the problem consts, so footprints cover runtime consts
    changes — e.g. homotopy ladders). Returns None when the row structure
    does not fit the stage pattern (dense fallback)."""
    probe = np.asarray(assemble_fn(0)) != 0.0
    for seed in (1, 2):
        probe |= np.asarray(assemble_fn(seed)) != 0.0
    try:
        return StageStructure(layout, N, spec, probe.astype(np.float64),
                              global_blocks=global_blocks)
    except ValueError:
        return None


def make_kkt_builder(structure: StageStructure):
    """Adapter for ops.ipm.solve(kkt_builder=...): same constructor
    signature as the built-in KKT classes."""

    def build(spec, A, reg_eps, cone_mask):
        return StructuredKKT(spec, A, reg_eps, cone_mask, structure)

    return build
