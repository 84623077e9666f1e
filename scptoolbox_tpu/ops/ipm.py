"""Batched primal-dual interior-point method for conic programs (the native
replacement for the reference's ECOS backend).

The reference hands every convex subproblem to the ECOS C interior-point
solver through JuMP (reference src/parser/general.jl:20-22,
src/parser/program.jl:63-75,419-424). Here the solver itself is a pure-JAX
homogeneous self-dual embedding (HSDE) Mehrotra predictor-corrector method
over symmetric cones (zero / nonneg / second-order), in the style of the
conelp algorithm (CVXOPT) that ECOS implements:

  * fully jittable: `lax.while_loop` outer iteration, branch-free cone
    algebra over a static ConeSpec (ops/cones.py);
  * batchable: `vmap` over (A, b, c) problem data gives thousands of
    simultaneous solves per chip — the core of the "batched SCP solves"
    north star;
  * returns primal AND dual solutions plus infeasibility certificates
    (the reference relies on ECOS DUAL_INFEASIBLE statuses during
    auto-scaling, src/solvers/scp.jl:473, and on duals for the KKT
    variational problem, src/parser/variation.jl:301-315);
  * the KKT solve is pluggable: dense LU with static regularization +
    iterative refinement by default; the structure-exploiting
    block-tridiagonal trajectory factorization plugs in the same slot.

Canonical problem form (single cone, equalities as zero-cone rows):

    minimize    c'x
    subject to  A x + s = b,   s in K = {0}^nz x R+^nl x SOC(d_1) x ...

HSDE state (x, s, z, tau, kappa); optimality residuals

    r_x = A'z + c*tau,   r_z = A x + s - b*tau,   r_tau = c'x + b'z + kappa.
"""

from __future__ import annotations

import enum
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from scptoolbox_tpu.ops import cones as cn
from scptoolbox_tpu.ops import pallas_kernels
from scptoolbox_tpu.ops.cones import ConeSpec

# Pallas KKT kernels on TPU (f32 path); set to False to fall back to XLA's
# stock cholesky/cho_solve lowering (e.g. for A/B benchmarking).
_PALLAS_KKT = False  # opt-in: measured 14x slower than XLA's batched
                     # Cholesky on the TPU bench (see _SchurKKT.use_pallas)


_DEBUG = False


class IPMStatus(enum.IntEnum):
    """Device-representable solver status (parity with the MOI statuses the
    reference consumes: OPTIMAL / ALMOST_OPTIMAL gate scp.jl:965-980 and
    DUAL_INFEASIBLE scp.jl:473)."""

    OPTIMAL = 0
    PRIMAL_INFEASIBLE = 1
    DUAL_INFEASIBLE = 2
    MAX_ITER = 3  # ran out of iterations: solution returned, reduced accuracy
    ALMOST_OPTIMAL = 4  # converged to tol_almost but not tol (MOI ALMOST_OPTIMAL)


class IPMSolution(NamedTuple):
    x: jnp.ndarray          # primal solution (already divided by tau)
    s: jnp.ndarray          # primal slacks
    z: jnp.ndarray          # dual cone variables
    status: jnp.ndarray     # int32 IPMStatus code
    iters: jnp.ndarray      # iterations taken
    obj: jnp.ndarray        # primal objective c'x
    pres: jnp.ndarray       # relative primal residual
    dres: jnp.ndarray       # relative dual residual
    gap: jnp.ndarray        # complementarity gap s'z (tau-normalized)
    tau: jnp.ndarray
    kappa: jnp.ndarray


class _State(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray
    tau: jnp.ndarray
    kappa: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray      # bool: stop iterating
    status: jnp.ndarray    # int32
    pres: jnp.ndarray
    dres: jnp.ndarray
    gap: jnp.ndarray
    # best iterate seen so far by merit = max(pres, dres, relgap); returned
    # when the final iterate is worse or non-finite (robustness parity with
    # ECOS's best-iterate fallback)
    best_x: jnp.ndarray
    best_s: jnp.ndarray
    best_z: jnp.ndarray
    best_tau: jnp.ndarray
    best_kappa: jnp.ndarray
    best_pres: jnp.ndarray
    best_dres: jnp.ndarray
    best_gap: jnp.ndarray
    best_merit: jnp.ndarray
    # stall detector window: best merit snapshot + its iteration
    snap_merit: jnp.ndarray
    snap_it: jnp.ndarray


def _w2_matvec(spec, W, M, cone_mask):
    """Apply W^2 to the columns of M analytically (0 on zero rows)."""
    apply = lambda v: cn.scale(spec, W, cn.scale(spec, W, v)) * cone_mask
    if M.ndim == 1:
        return apply(M)
    return jax.vmap(apply, in_axes=1, out_axes=1)(M)


class _LUKKT:
    """Dense LU factorization of the regularized quasi-definite system

        [ eps*I     A'          ] [dx]   [rhs_x]
        [ A      -(W^2 + reg)   ] [dz] = [rhs_z]

    with iterative refinement against the *unregularized* operator.
    CPU path (f64 LU is unsupported by the TPU compiler)."""

    def __init__(self, spec, A, reg_eps, cone_mask):
        self.spec, self.A, self.reg_eps = spec, A, reg_eps
        self.cone_mask = cone_mask
        self.n, self.m = A.shape[1], A.shape[0]

    def factor(self, W):
        n, m, A = self.n, self.m, self.A
        dt = A.dtype
        w2 = (cn.w2_dense(self.spec, W, dtype=dt) if W is not None
              else jnp.diag(self.cone_mask))
        K_reg = jnp.zeros((n + m, n + m), dt)
        K_reg = K_reg.at[:n, :n].set(jnp.eye(n, dtype=dt) * self.reg_eps)
        K_reg = K_reg.at[:n, n:].set(A.T)
        K_reg = K_reg.at[n:, :n].set(A)
        K_reg = K_reg.at[n:, n:].set(
            -(w2 + self.reg_eps * jnp.eye(m, dtype=dt)))
        lu, piv = jax.scipy.linalg.lu_factor(K_reg)
        return (lu, piv, w2)

    def solve(self, fac, rhs):
        lu, piv, w2 = fac
        n, A = self.n, self.A
        sol = jax.scipy.linalg.lu_solve((lu, piv), rhs)
        for _ in range(2):  # refinement vs the unregularized K0
            resid = rhs - jnp.concatenate(
                [A.T @ sol[n:], A @ sol[:n] - w2 @ sol[n:]], axis=0)
            sol = sol + jax.scipy.linalg.lu_solve((lu, piv), resid)
        return sol


class _QRCholKKT:
    """Null-space KKT solve (CVXOPT conelp's QR kktsolver): handles the
    equality (zero-cone) rows exactly through a QR of A_E' hoisted out of
    the IPM loop, then per-iteration Cholesky of the reduced normal
    equations — only Cholesky/QR/triangular solves, all of which the TPU
    compiler supports in f64 (LU does not).

        A = [A_E; A_C] (zero rows first).  A_E' = Q R, Q = [Q1 Q2].
        dx = Q1 y1 + Q2 y2 with  R' y1 = rhs_E,
        (G'G) y2 = Q2'(rhs_x + A_C' W^-2 rhs_C) - Q2'A_C'W^-2 A_C Q1 y1,
            G = W^-1 A_C Q2  (Cholesky, + reg),
        dz_C = W^-2 (A_C dx - rhs_C),   R dz_E = Q1'(rhs_x - A_C' dz_C).
    """

    def __init__(self, spec, A, reg_eps, cone_mask):
        self.spec, self.A, self.reg_eps = spec, A, reg_eps
        self.cone_mask = cone_mask
        self.n, self.m = A.shape[1], A.shape[0]
        self.nz = spec.nz
        A_E = A[: self.nz]
        # full QR of A_E' (n x nz): Q (n, n), R (n, nz)
        Q, R = jnp.linalg.qr(A_E.T, mode="complete")
        self.Q1 = Q[:, : self.nz]
        self.Q2 = Q[:, self.nz:]
        self.R = R[: self.nz]
        self.A_C = A[self.nz:]

    def _winv(self, W, M):
        """Apply W^-1 to columns of M (cone rows only, (m_C, k))."""
        if W is None:
            return M
        full = jnp.zeros((self.m,) + M.shape[1:], M.dtype)
        full = full.at[self.nz:].set(M)
        out = jax.vmap(
            lambda v: cn.scale(self.spec, W, v, inverse=True),
            in_axes=1, out_axes=1,
        )(full.reshape(self.m, -1)).reshape(full.shape)
        return out[self.nz:]

    def factor(self, W):
        G = self._winv(W, self.A_C @ self.Q2)       # (m_C, n - nz)
        nred = G.shape[1]
        M = G.T @ G + self.reg_eps * jnp.eye(nred, dtype=G.dtype)
        L = jnp.linalg.cholesky(M)
        return (L, W)

    def _solve_once(self, fac, rhs):
        L, W = fac
        n, nz = self.n, self.nz
        rx = rhs[:n]
        rE = rhs[n: n + nz]
        rC = rhs[n + nz:]
        # y1 from the equality rows: R' y1 = rE
        y1 = jax.scipy.linalg.solve_triangular(
            self.R.T, rE, lower=True)
        WirC = self._winv(W, self._winv(W, rC))     # W^-2 rC
        t = self.Q2.T @ (rx + self.A_C.T @ WirC)
        ACQ1y1 = self._winv(W, self._winv(W, self.A_C @ (self.Q1 @ y1)))
        t = t - self.Q2.T @ (self.A_C.T @ ACQ1y1)
        y2 = jax.scipy.linalg.cho_solve((L, True), t)
        dx = self.Q1 @ y1 + self.Q2 @ y2
        dzC = self._winv(W, self._winv(W, self.A_C @ dx)) - WirC
        dzE = jax.scipy.linalg.solve_triangular(
            self.R, self.Q1.T @ (rx - self.A_C.T @ dzC), lower=False)
        return jnp.concatenate([dx, dzE, dzC], axis=0)

    def solve(self, fac, rhs):
        W = fac[1]
        sol = self._solve_once(fac, rhs)
        n = self.n
        for _ in range(2):  # refinement vs the exact operator
            w2z = (_w2_matvec(self.spec, W, sol[n:], self.cone_mask)
                   if W is not None else sol[n:] * self.cone_mask[:, None])
            resid = rhs - jnp.concatenate(
                [self.A.T @ sol[n:], self.A @ sol[:n] - w2z], axis=0)
            sol = sol + self._solve_once(fac, resid)
        return sol


class _SchurKKT:
    """Reduced (normal-equations) KKT solve — the default. The augmented
    system of _LUKKT is (n+m)^2 and its dense LU is O((n+m)^3) per IPM
    iteration; here the cone rows are eliminated analytically,

        dz_C = W^-2 (A_C dx - rhs_C),

    leaving the (n + nz) symmetric quasidefinite system

        [ H       A_E' ] [dx  ]   [rhs_x + A_C' W^-2 rhs_C]
        [ A_E    -eps*I ] [dz_E] = [rhs_E]                  ,
        H = A_C' W^-2 A_C + eps*I,

    two orders of magnitude less factorization work for SCP subproblems
    (m ~ 3n). Factored by LU on CPU or by a two-level Cholesky Schur
    complement on TPU (the TPU compiler supports f64 Cholesky but not LU);
    two rounds of iterative refinement against the exact unregularized
    operator restore full accuracy.
    """

    def __init__(self, spec, A, reg_eps, cone_mask):
        self.spec, self.A, self.reg_eps = spec, A, reg_eps
        self.cone_mask = cone_mask
        self.n, self.m = A.shape[1], A.shape[0]
        self.nz = spec.nz
        self.A_E = A[: self.nz]
        self.A_C = A[self.nz:]
        self.use_lu = jax.default_backend() == "cpu"
        # Measured on TPU v5e (batched PTR bench, 128 x ~250-var
        # subproblems): XLA's batched f32 Cholesky runs the whole bench 14x
        # faster than the hand-rolled Pallas sweep in ops/pallas_kernels.py
        # (3.65 -> 51.0 solves/s) — the masked rank-1 Cholesky is O(n)
        # serial VPU steps while XLA's lowering is blocked. The Pallas
        # kernels stay available (correctness-tested, opt-in via
        # _PALLAS_KKT) as the substrate for future fused-panel work, but
        # the default hot path is stock XLA.
        self.use_pallas = (jax.default_backend() == "tpu"
                           and A.dtype == jnp.float32 and _PALLAS_KKT)

    def _chol(self, M):
        if self.use_pallas:
            return pallas_kernels.cholesky(M)
        return jnp.linalg.cholesky(M)

    def _cho_solve(self, L, B):
        if self.use_pallas:
            return pallas_kernels.cho_solve(L, B)
        return jax.scipy.linalg.cho_solve((L, True), B)

    def _winv2(self, W, M):
        """Apply W^-2 to columns of M ((m_C, k) or (m_C,))."""
        if W is None:
            return M
        vec = M.ndim == 1
        Mm = M[:, None] if vec else M
        full = jnp.zeros((self.m, Mm.shape[1]), Mm.dtype)
        full = full.at[self.nz:].set(Mm)
        inv1 = jax.vmap(
            lambda v: cn.scale(self.spec, W, v, inverse=True),
            in_axes=1, out_axes=1)(full)
        inv2 = jax.vmap(
            lambda v: cn.scale(self.spec, W, v, inverse=True),
            in_axes=1, out_axes=1)(inv1)
        out = inv2[self.nz:]
        return out[:, 0] if vec else out

    def factor(self, W):
        n, nz = self.n, self.nz
        dt = self.A.dtype
        WiAC = self._winv2(W, self.A_C)                    # (m_C, n)
        H = self.A_C.T @ WiAC
        # scale-aware regularization: near convergence the NT diag spread
        # drives kappa(H) past 1/eps_mach and an absolute shift does
        # nothing — add ~100*eps_mach of the diagonal scale so the Cholesky
        # stays positive under roundoff; iterative refinement against the
        # exact operator recovers the accuracy the shift costs
        eps_rel = jnp.asarray(100.0, dt) * jnp.finfo(dt).eps
        reg = self.reg_eps + eps_rel * jnp.abs(jnp.diagonal(H))
        H = H + jnp.diag(reg)
        if self.use_lu:
            K = jnp.zeros((n + nz, n + nz), dt)
            K = K.at[:n, :n].set(H)
            K = K.at[:n, n:].set(self.A_E.T)
            K = K.at[n:, :n].set(self.A_E)
            K = K.at[n:, n:].set(-self.reg_eps * jnp.eye(nz, dtype=dt))
            lu, piv = jax.scipy.linalg.lu_factor(K)
            return ("lu", (lu, piv), W)
        L_H = self._chol(H)
        HiAE = self._cho_solve(L_H, self.A_E.T)  # (n, nz)
        S = self.A_E @ HiAE
        reg_s = self.reg_eps + eps_rel * jnp.abs(jnp.diagonal(S))
        S = S + jnp.diag(reg_s)
        L_S = self._chol(S)
        return ("chol", (L_H, HiAE, L_S), W)

    def _solve_once(self, fac, rhs):
        kind, data, W = fac
        n, nz = self.n, self.nz
        rx = rhs[:n]
        rE = rhs[n: n + nz]
        rC = rhs[n + nz:]
        r1 = rx + self.A_C.T @ self._winv2(W, rC)
        if kind == "lu":
            red = jnp.concatenate([r1, rE], axis=0)
            sol = jax.scipy.linalg.lu_solve(data, red)
            dx, dzE = sol[:n], sol[n:]
        else:
            L_H, HiAE, L_S = data
            y = self._cho_solve(L_H, r1)
            dzE = self._cho_solve(L_S, self.A_E @ y - rE)
            dx = y - HiAE @ dzE
        dzC = self._winv2(W, self.A_C @ dx - rC)
        return jnp.concatenate([dx, dzE, dzC], axis=0)

    refine_rounds = 2

    def solve(self, fac, rhs):
        W = fac[2]
        sol = self._solve_once(fac, rhs)
        n = self.n
        mask = (self.cone_mask if sol.ndim == 1
                else self.cone_mask[:, None])
        for _ in range(self.refine_rounds):  # refinement vs exact operator
            w2z = (_w2_matvec(self.spec, W, sol[n:], self.cone_mask)
                   if W is not None else sol[n:] * mask)
            resid = rhs - jnp.concatenate(
                [self.A.T @ sol[n:], self.A @ sol[:n] - w2z], axis=0)
            sol = sol + self._solve_once(fac, resid)
        return sol


_KKT_METHODS = {"lu": _LUKKT, "qrchol": _QRCholKKT, "schur": _SchurKKT}


def _pick_kkt_method() -> str:
    """Reduced Schur KKT everywhere: LU of the (n+nz) quasidefinite system
    on CPU, Cholesky ladder on TPU (the TPU compiler rejects f64 LU)."""
    return "schur"


def _equilibrate(spec: ConeSpec, A, iters: int = 3):
    """Cone-aware Ruiz equilibration (as ECOS performs before factorizing):
    returns positive diagonal scalings (R, D) with A_eq = R A D having rows
    and columns of near-unit infinity norm. Row scaling is uniform within
    each SOC block (a non-uniform scaling would bend the cone); zero and
    nonneg rows scale freely. Essential for the reduced (normal-equations)
    KKT path, whose conditioning is squared in the row/column spread."""
    m, n = A.shape
    dt = A.dtype
    R = jnp.ones(m, dt)
    D = jnp.ones(n, dt)
    soc_idx = spec.soc_indices()
    exp_idx = spec.exp_indices() if spec.nexp > 0 else None
    for _ in range(iters):
        As = jnp.abs(R[:, None] * A * D[None, :])
        rmax = jnp.max(As, axis=1)
        for d, idx in soc_idx.items():
            blk_max = jnp.max(rmax[idx], axis=1, keepdims=True)
            rmax = rmax.at[idx].set(
                jnp.broadcast_to(blk_max, idx.shape))
        if exp_idx is not None:
            # uniform within each exp block: only the cone's ray scaling
            # s -> alpha s keeps membership invariant
            blk_max = jnp.max(rmax[exp_idx], axis=1, keepdims=True)
            rmax = rmax.at[exp_idx].set(
                jnp.broadcast_to(blk_max, exp_idx.shape))
        rmax = jnp.where(rmax > 0, rmax, 1.0)
        cmax = jnp.max(As, axis=0)
        cmax = jnp.where(cmax > 0, cmax, 1.0)
        R = R / jnp.sqrt(rmax)
        D = D / jnp.sqrt(cmax)
    return R, D


def _lambda_min(spec: ConeSpec, v):
    """Smallest cone 'eigenvalue' of v: min over nonneg entries and
    (v0 - ||v1||) per SOC block. Used for interior shifts at init."""
    vals = [jnp.asarray(jnp.inf, v.dtype)]
    if spec.nl > 0:
        vals.append(jnp.min(v[spec.lin_slice]))
    for d, idx in spec.soc_indices().items():
        vb = v[idx]
        vals.append(jnp.min(vb[:, 0] - jnp.linalg.norm(vb[:, 1:], axis=1)))
    return jnp.min(jnp.stack([jnp.atleast_1d(x).min() for x in vals]))


def _shift_interior(spec: ConeSpec, v, margin=1.0):
    """Shift v along the identity until strictly interior (conelp init)."""
    lam_min = _lambda_min(spec, v)
    e = cn.identity_elem(spec, dtype=v.dtype)
    shift = jnp.where(lam_min > 1e-8, 0.0, margin - lam_min)
    out = v + shift * e
    if spec.nz > 0:
        out = out.at[spec.zero_slice].set(v[spec.zero_slice])
    return out


def solve(
    A: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    spec: ConeSpec,
    *,
    tol: float = 1e-8,
    tol_almost: float = 1e-5,
    max_iter: int = 50,
    kkt_method: Optional[str] = None,
    kkt_builder=None,
    enabled=None,
    stall_patience: int = 10,
) -> IPMSolution:
    """Solve  min c'x  s.t.  Ax + s = b, s in K.  Jittable; vmap over
    (A, b, c) for batched solves (spec must be shared across the batch).

    stall_patience: stop iterating when the best merit max(pres, dres,
    relgap) has not at least HALVED over the last `stall_patience`
    iterations (the best-iterate fallback returns the best point seen).
    A converging IPM halves its merit far faster than that even in slow
    linear tail phases; an f32 run whose merit floor sits just above
    `tol` flatlines and would otherwise burn the full max_iter budget
    (measured 60 vs ~35 useful iterations on the batched starship
    subproblems).

    kkt_builder: optional static callable (spec, A, reg_eps, cone_mask) ->
    KKT object with factor/solve — the hook for the stage-structured
    block-tridiagonal factorization (ops/block_kkt.py).

    enabled: optional traced bool; when False the solver returns after the
    initialization solve without iterating. Under vmap this caps the
    batched while_loop trip count at the max over ACTIVE lanes, so
    converged scenarios in a batched SCP loop stop consuming IPM
    iterations.

    All matmuls are pinned to full f32 precision: the TPU default (bf16
    multiply passes) is far too coarse for interior-point linear algebra."""
    with jax.default_matmul_precision("float32"):
        return _solve_impl(A, b, c, spec, tol=tol, tol_almost=tol_almost,
                           max_iter=max_iter, kkt_method=kkt_method,
                           kkt_builder=kkt_builder, enabled=enabled,
                           stall_patience=stall_patience)


@functools.partial(
    jax.jit, static_argnames=("spec", "max_iter", "kkt_method",
                              "kkt_builder", "stall_patience")
)
def _solve_impl(
    A: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    spec: ConeSpec,
    *,
    tol: float = 1e-8,
    tol_almost: float = 1e-5,
    max_iter: int = 50,
    kkt_method: Optional[str] = None,
    kkt_builder=None,
    enabled=None,
    stall_patience: int = 10,
) -> IPMSolution:
    dt = A.dtype
    n = A.shape[1]
    m = A.shape[0]
    assert m == spec.m, f"A has {m} rows but spec.m={spec.m}"
    # cone-aware Ruiz equilibration: solve the scaled problem
    # min (Dc)'x̂ s.t. (RAD)x̂ + ŝ = Rb, and unscale on exit
    # (x = D x̂, s = ŝ/R, z = R ẑ)
    R_eq, D_eq = _equilibrate(spec, A)
    A = R_eq[:, None] * A * D_eq[None, :]
    b = R_eq * b
    c = D_eq * c
    tol = jnp.asarray(tol, dt)
    reg_eps = jnp.asarray(1e-10 if dt == jnp.float64 else 1e-7, dt)
    zero_mask = jnp.asarray(1.0 - spec.cone_mask(), dt)
    cone_mask = jnp.asarray(spec.cone_mask(), dt)
    e = cn.identity_elem(spec, dtype=dt)
    deg = spec.degree
    builder = kkt_builder or _KKT_METHODS[kkt_method or _pick_kkt_method()]
    kkt = builder(spec, A, reg_eps, cone_mask)

    norm_b = jnp.maximum(1.0, jnp.linalg.norm(b, jnp.inf))
    norm_c = jnp.maximum(1.0, jnp.linalg.norm(c, jnp.inf))

    # ---------------- initialization (conelp-style) ----------------
    rhs0 = jnp.stack(
        [
            jnp.concatenate([jnp.zeros(n, dt), b]),
            jnp.concatenate([-c, jnp.zeros(m, dt)]),
        ],
        axis=1,
    )
    sol0 = kkt.solve(kkt.factor(None), rhs0)  # W = I on cone rows
    x0 = sol0[:n, 0]
    s0 = _shift_interior(spec, -sol0[n:, 0] * cone_mask)
    z0 = _shift_interior(spec, sol0[n:, 1])
    if spec.nexp > 0:
        # exp blocks start at the barrier central points (as ECOS expinit):
        # the interior shift along the Jordan identity does not apply to the
        # nonsymmetric blocks
        eidx = spec.exp_indices()
        s0 = s0.at[eidx].set(jnp.asarray(cn.EXP_PRIMAL_CENTRAL, dt)[None, :])
        z0 = z0.at[eidx].set(jnp.asarray(cn.EXP_DUAL_CENTRAL, dt)[None, :])
    tau0 = jnp.asarray(1.0, dt)
    kap0 = jnp.asarray(1.0, dt)

    big = jnp.asarray(jnp.inf, dt)
    init = _State(
        x=x0, s=s0, z=z0, tau=tau0, kappa=kap0,
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        status=jnp.asarray(int(IPMStatus.MAX_ITER), jnp.int32),
        pres=big, dres=big, gap=big,
        best_x=x0, best_s=s0, best_z=z0, best_tau=tau0, best_kappa=kap0,
        best_pres=big, best_dres=big, best_gap=big, best_merit=big,
        snap_merit=big, snap_it=jnp.asarray(0, jnp.int32),
    )

    def residuals(st: _State):
        rx = A.T @ st.z + c * st.tau
        rz = A @ st.x + st.s - b * st.tau
        rtau = jnp.dot(c, st.x) + jnp.dot(b, st.z) + st.kappa
        return rx, rz, rtau

    def convergence(st: _State):
        """Relative residuals + optimality/infeasibility certificates."""
        rx, rz, rtau = residuals(st)
        inv_tau = 1.0 / st.tau
        pres = jnp.linalg.norm(rz, jnp.inf) * inv_tau / norm_b
        dres = jnp.linalg.norm(rx, jnp.inf) * inv_tau / norm_c
        pcost = jnp.dot(c, st.x) * inv_tau
        dcost = -jnp.dot(b, st.z) * inv_tau
        gap = jnp.dot(st.s, st.z) * inv_tau * inv_tau
        relgap = gap / jnp.maximum(1.0, jnp.minimum(jnp.abs(pcost), jnp.abs(dcost)))
        optimal = (pres < tol) & (dres < tol) & (relgap < tol)

        # primal infeasibility certificate: A'z ~ 0, b'z < 0
        bz = jnp.dot(b, st.z)
        zbar_scale = jnp.where(bz < 0, -1.0 / jnp.minimum(bz, -1e-30), 0.0)
        pinf_res = jnp.linalg.norm(A.T @ st.z, jnp.inf) * zbar_scale
        pinf = (bz < -tol * norm_b) & (pinf_res < tol)

        # dual infeasibility (primal unbounded): Ax + s ~ 0, c'x < 0
        cx = jnp.dot(c, st.x)
        xbar_scale = jnp.where(cx < 0, -1.0 / jnp.minimum(cx, -1e-30), 0.0)
        dinf_res = jnp.linalg.norm(A @ st.x + st.s, jnp.inf) * xbar_scale
        dinf = (cx < -tol * norm_c) & (dinf_res < tol)

        status = jnp.where(
            optimal,
            int(IPMStatus.OPTIMAL),
            jnp.where(
                pinf,
                int(IPMStatus.PRIMAL_INFEASIBLE),
                jnp.where(
                    dinf,
                    int(IPMStatus.DUAL_INFEASIBLE),
                    int(IPMStatus.MAX_ITER),
                ),
            ),
        ).astype(jnp.int32)
        merit = jnp.maximum(jnp.maximum(pres, dres), relgap)
        merit = jnp.where(jnp.isfinite(merit), merit, big)
        return optimal | pinf | dinf, status, pres, dres, gap, merit

    def cond(st: _State):
        return (~st.done) & (st.it < max_iter)

    def body(st: _State):
        rx, rz, rtau = residuals(st)
        mu = (jnp.dot(st.s, st.z) + st.tau * st.kappa) / (deg + 1)

        # NT scaling (symmetric blocks) + dual-barrier scaling (exp blocks)
        W = cn.nt_scaling(spec, st.s, st.z, mu=mu)
        lam = cn.lambda_vec(spec, W, st.z)
        eidx = spec.exp_indices() if spec.nexp > 0 else None

        # KKT with current W; two constant RHS columns solved together:
        #   col 0: [-c; b]            (tau-elimination direction u)
        #   col 1..: residual-driven directions, per predictor/corrector
        fac = kkt.factor(W)

        def directions(sigma, eta_corr, dkap_corr):
            """Solve for (dx, dz, ds, dtau, dkappa) for a combined target:
            residual scaling (1-sigma), complementarity RHS
              d_s = -lam o lam - eta_corr + sigma*mu*e,
              d_kappa = -tau*kappa - dkap_corr + sigma*mu.
            """
            one_m_sig = 1.0 - sigma
            d_s = -cn.cone_product(spec, lam, lam) - eta_corr + sigma * mu * e
            d_kap = -st.tau * st.kappa - dkap_corr + sigma * mu

            # bs = W(lam \ d_s)  (zero on zero-cone rows)
            bs = cn.scale(spec, W, cn.cone_div(spec, lam, d_s)) * cone_mask
            if eidx is not None:
                # exp central path s = -mu grad F*(z), linearized:
                # ds + mu H dz = -s - sigma mu grad F*(z); the KKT
                # elimination ds = bs - W^2 dz (W^2 = mu H) takes the target
                # directly as bs (no Mehrotra correction on the
                # nonsymmetric blocks)
                tgt = -st.s[eidx] - sigma * mu * W.exp_g
                bs = bs.at[eidx].set(tgt)

            rhs = jnp.stack(
                [
                    jnp.concatenate([-c, b]),
                    jnp.concatenate([-one_m_sig * rx, -one_m_sig * rz - bs]),
                ],
                axis=1,
            )
            sol = kkt.solve(fac, rhs)
            u1, u2 = sol[:n, 0], sol[n:, 0]
            v1, v2 = sol[:n, 1], sol[n:, 1]

            denom = jnp.dot(c, u1) + jnp.dot(b, u2) - st.kappa / st.tau
            numer = -one_m_sig * rtau - jnp.dot(c, v1) - jnp.dot(b, v2) - d_kap / st.tau
            dtau = numer / denom
            dx = u1 * dtau + v1
            dz = u2 * dtau + v2
            ds = (bs - _w2_matvec(spec, W, dz, cone_mask)) * cone_mask
            dkap = (d_kap - st.kappa * dtau) / st.tau
            return dx, dz, ds, dtau, dkap

        def step_len(ds, dz, dtau, dkap):
            a_s = cn.max_step(spec, st.s, ds, dual=False)
            a_z = cn.max_step(spec, st.z, dz, dual=True)
            a_t = jnp.where(dtau < 0, -st.tau / jnp.minimum(dtau, -1e-30), big)
            a_k = jnp.where(dkap < 0, -st.kappa / jnp.minimum(dkap, -1e-30), big)
            return jnp.minimum(jnp.minimum(a_s, a_z), jnp.minimum(a_t, a_k))

        # ---- predictor (affine) ----
        zero_v = jnp.zeros(m, dt)
        dx_a, dz_a, ds_a, dt_a, dk_a = directions(
            jnp.asarray(0.0, dt), zero_v, jnp.asarray(0.0, dt)
        )
        alpha_aff = jnp.minimum(1.0, step_len(ds_a, dz_a, dt_a, dk_a))
        sigma = jnp.clip((1.0 - alpha_aff) ** 3, 1e-8, 1.0 - 1e-8)

        # ---- corrector (Mehrotra): eta = (W^{-1}ds_a) o (W dz_a).
        # Using ds_a = W(lam\d_s) - W^2 dz_a  =>  W^{-1}ds_a = -lam - W dz_a.
        dz_a_t = cn.scale(spec, W, dz_a) * cone_mask
        ds_a_t = (-lam - dz_a_t) * cone_mask
        eta = cn.cone_product(spec, ds_a_t, dz_a_t)
        dkap_corr = dt_a * dk_a

        dx, dz, ds, dtau, dkap = directions(sigma, eta, dkap_corr)
        alpha = jnp.minimum(1.0, 0.99 * step_len(ds, dz, dtau, dkap))
        if spec.nexp > 0:
            # centrality safeguard for the nonsymmetric blocks (the analog
            # of ECOS-exp's neighborhood check): without it, a single exp
            # block's gap s_i'z_i can collapse to 0 while the global mu is
            # still large, its dual-barrier Hessian blows up, and every
            # subsequent direction exits the cone immediately (alpha -> 0
            # stall). Backtrack alpha until every exp block keeps
            # s_i'z_i >= beta_c * mu(alpha).
            beta_c = jnp.asarray(1e-2, dt)
            eidx3 = spec.exp_indices()

            def centr_ok(a):
                s_n = st.s + a * ds
                z_n = st.z + a * dz
                mu_n = (jnp.dot(s_n, z_n)
                        + (st.tau + a * dtau) * (st.kappa + a * dkap)) / (
                            deg + 1)
                gaps = jnp.sum(s_n[eidx3] * z_n[eidx3], axis=1)
                return jnp.all(gaps >= beta_c * mu_n)

            def bt(_, a):
                return jnp.where(centr_ok(a), a, 0.8 * a)

            alpha = jax.lax.fori_loop(0, 30, bt, alpha)
        if _DEBUG:
            jax.debug.print(
                "it={it} mu={mu} a_aff={aa} sigma={sg} alpha={al} "
                "tau={tau} kap={kap}",
                it=st.it, mu=mu, aa=alpha_aff, sg=sigma, al=alpha,
                tau=st.tau, kap=st.kappa)

        x_n = st.x + alpha * dx
        s_n = st.s + alpha * ds
        z_n = st.z + alpha * dz
        tau_n = st.tau + alpha * dtau
        kap_n = st.kappa + alpha * dkap

        # NaN guard: if the step produced non-finite values (boundary-grazing
        # NT scaling, singular KKT), discard it and stop — the best iterate
        # carries the answer.
        finite = (jnp.all(jnp.isfinite(x_n)) & jnp.all(jnp.isfinite(s_n))
                  & jnp.all(jnp.isfinite(z_n)) & jnp.isfinite(tau_n)
                  & jnp.isfinite(kap_n) & (tau_n > 0))
        x_n = jnp.where(finite, x_n, st.x)
        s_n = jnp.where(finite, s_n, st.s)
        z_n = jnp.where(finite, z_n, st.z)
        tau_n = jnp.where(finite, tau_n, st.tau)
        kap_n = jnp.where(finite, kap_n, st.kappa)

        new = st._replace(x=x_n, s=s_n, z=z_n, tau=tau_n, kappa=kap_n,
                          it=st.it + 1)
        stop, status, pres, dres, gap, merit = convergence(new)
        better = merit < st.best_merit
        best_merit_n = jnp.minimum(merit, st.best_merit)
        # windowed stall detector: every stall_patience iterations, demand
        # the best merit at least halved since the last snapshot
        window = (new.it - st.snap_it) >= stall_patience
        stalled = window & (best_merit_n > 0.5 * st.snap_merit)
        snap_merit_n = jnp.where(window & ~stalled, best_merit_n,
                                 st.snap_merit)
        snap_it_n = jnp.where(window & ~stalled, new.it, st.snap_it)
        pick = lambda a, b: jnp.where(better, a, b)
        return new._replace(
            done=stop | ~finite | stalled, status=status,
            snap_merit=snap_merit_n, snap_it=snap_it_n,
            pres=pres, dres=dres, gap=gap,
            best_x=pick(new.x, st.best_x), best_s=pick(new.s, st.best_s),
            best_z=pick(new.z, st.best_z), best_tau=pick(new.tau, st.best_tau),
            best_kappa=pick(new.kappa, st.best_kappa),
            best_pres=pick(pres, st.best_pres),
            best_dres=pick(dres, st.best_dres),
            best_gap=pick(gap, st.best_gap),
            best_merit=pick(merit, st.best_merit),
        )

    # check whether the initial point already certifies something
    stop0, status0, pres0, dres0, gap0, merit0 = convergence(init)
    if enabled is not None:
        stop0 = stop0 | ~enabled
    init = init._replace(done=stop0, status=status0, pres=pres0, dres=dres0,
                         gap=gap0, best_pres=pres0, best_dres=dres0,
                         best_gap=gap0, best_merit=merit0)

    final = jax.lax.while_loop(cond, body, init)

    # fall back to the best iterate when it beats the final one (divergence /
    # NaN-guard exit); certificates keep the final iterate.
    is_cert = (final.status == int(IPMStatus.PRIMAL_INFEASIBLE)) | (
        final.status == int(IPMStatus.DUAL_INFEASIBLE)
    )
    _, _, fpres, fdres, fgap, fmerit = convergence(final)
    use_best = (~is_cert) & (final.best_merit < fmerit)
    sel = lambda a, b: jnp.where(use_best, a, b)
    x_f = sel(final.best_x, final.x)
    s_f = sel(final.best_s, final.s)
    z_f = sel(final.best_z, final.z)
    tau_f = sel(final.best_tau, final.tau)
    kap_f = sel(final.best_kappa, final.kappa)
    pres_f = sel(final.best_pres, fpres)
    dres_f = sel(final.best_dres, fdres)
    gap_f = sel(final.best_gap, fgap)
    merit_f = jnp.minimum(final.best_merit, fmerit)
    status = jnp.where(
        (final.status == int(IPMStatus.MAX_ITER))
        & (merit_f < jnp.asarray(tol_almost, dt)),
        jnp.asarray(int(IPMStatus.ALMOST_OPTIMAL), jnp.int32),
        final.status,
    )

    inv_tau = 1.0 / tau_f
    # infeasibility certificates are returned as the (scaled) rays themselves
    scale_out = jnp.where(is_cert, 1.0, inv_tau)
    # undo the Ruiz equilibration on the way out
    x = x_f * scale_out * D_eq
    s = s_f * scale_out / R_eq
    z = z_f * scale_out * R_eq
    return IPMSolution(
        x=x, s=s, z=z,
        status=status,
        iters=final.it,
        obj=jnp.dot(c / D_eq, x),
        pres=pres_f, dres=dres_f, gap=gap_f,
        tau=tau_f, kappa=kap_f,
    )


def solve_batched(A, b, c, spec: ConeSpec, **kw) -> IPMSolution:
    """vmap'd solve over a leading batch axis of (A, b, c)."""
    fn = functools.partial(solve, spec=spec, **kw)
    return jax.vmap(fn)(A, b, c)
