"""Cone toolkit: the conic IR and the scaling ops for the native IPM.

This replaces the reference's cone layer (src/parser/cone.jl:48-224, which
maps cones onto JuMP/MOI sets consumed by the ECOS C solver) with a native
representation consumed by our batched JAX interior-point method (ops/ipm.py).

Supported base cones (reference cone.jl:48 `SupportedCone`):
  ZERO    -> `nz` leading equality rows (slack identically 0, dual free)
  NONPOS  -> lowered to the nonneg orthant by row negation at build time
  L1/LINF -> lowered to linear rows + nonneg slacks (as MOI bridges do)
  SOC     -> native second-order cone blocks
  GEOM    -> lowered to SOC powers (parser/builder layer)
  EXP     -> native 3-dim exponential cone blocks (nonsymmetric; scaled by
             the Hessian of the dual barrier, as ECOS's expcone extension)

Exponential-cone convention (MOI ExponentialCone ordering, which the
reference posts through cone.jl:103-171):

  K_exp  = cl{(x, y, z) : y > 0,  y e^{x/y} <= z}
  K_exp* = cl{(u, v, w) : u < 0,  -u e^{v/u} <= e w}

with the 3-logarithmically-homogeneous barriers
  F (x,y,z) = -log(y log(z/y) - x) - log y - log z
  F*(u,v,w) = -log(u log(-u/w) + v - u) - log(-u) - log w.

The flat slack/dual vector layout is
[zero | nonneg | soc_1 | ... | soc_k | exp_1 | ... | exp_j].
All ops are branch-free over a *static* `ConeSpec`, grouping SOC blocks of
equal dimension so each group processes as one (num_blocks, dim) tensor —
TPU-friendly (no per-cone Python loops at runtime).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

# central points e* of the exp-cone barriers (solve grad F(e*) = -e*;
# computed by Newton to machine precision — the dual one matches ECOS's
# expcone initialization constants)
EXP_PRIMAL_CENTRAL = (-0.8278384059008612, 0.8051020015847954,
                      1.2909277098569585)
EXP_DUAL_CENTRAL = (-1.0513839437502288, 0.5564096194693704,
                    1.2589678864644602)


@dataclasses.dataclass(frozen=True)
class ConeSpec:
    """Static description of a product cone
    K = 0^nz x R+^nl x SOC(d1) x ... x EXP^nexp.

    Hashable/static so it can parameterize jitted functions.
    """

    nz: int = 0
    nl: int = 0
    socs: Tuple[int, ...] = ()
    nexp: int = 0

    def __post_init__(self):
        object.__setattr__(self, "socs", tuple(int(d) for d in self.socs))
        assert all(d >= 2 for d in self.socs), "SOC blocks need dim >= 2 (use nl for dim 1)"

    @property
    def m(self) -> int:
        """Total number of rows."""
        return self.nz + self.nl + sum(self.socs) + 3 * self.nexp

    @property
    def cone_dim(self) -> int:
        """Rows excluding the zero cone (the part with actual slacks)."""
        return self.nl + sum(self.socs) + 3 * self.nexp

    @property
    def degree(self) -> int:
        """Barrier degree: nl + number of SOC blocks + 3 per exp cone
        (reference: ECOS nu)."""
        return self.nl + len(self.socs) + 3 * self.nexp

    # ---- static index helpers (numpy, computed once per spec) ----

    def soc_groups(self) -> Dict[int, np.ndarray]:
        """Map soc dim -> array of start offsets (into the full m-vector)."""
        groups: Dict[int, list] = {}
        off = self.nz + self.nl
        for d in self.socs:
            groups.setdefault(d, []).append(off)
            off += d
        return {d: np.asarray(starts, dtype=np.int32) for d, starts in groups.items()}

    def soc_indices(self) -> Dict[int, np.ndarray]:
        """Map soc dim -> (num_blocks, dim) absolute row indices."""
        return {
            d: starts[:, None] + np.arange(d)[None, :]
            for d, starts in self.soc_groups().items()
        }

    def exp_indices(self) -> np.ndarray:
        """(nexp, 3) absolute row indices of the exp-cone blocks (laid out
        after the SOC blocks)."""
        off = self.nz + self.nl + sum(self.socs)
        return (off + 3 * np.arange(self.nexp)[:, None]
                + np.arange(3)[None, :])

    @property
    def lin_slice(self) -> slice:
        return slice(self.nz, self.nz + self.nl)

    @property
    def zero_slice(self) -> slice:
        return slice(0, self.nz)

    def cone_mask(self, dtype=float) -> np.ndarray:
        """(m,) mask: 1 on nonneg/SOC rows, 0 on zero-cone rows."""
        mask = np.ones(self.m, dtype=dtype)
        mask[: self.nz] = 0
        return mask


# ------------------------------ basic elements ------------------------------


def identity_elem(spec: ConeSpec, dtype=None) -> jnp.ndarray:
    """Jordan identity e: 0 on zero rows, 1 on nonneg, (1,0,..,0) per SOC."""
    dtype = dtype or jnp.zeros(0).dtype
    e = np.zeros(spec.m)
    e[spec.lin_slice] = 1.0
    off = spec.nz + spec.nl
    for d in spec.socs:
        e[off] = 1.0
        off += d
    return jnp.asarray(e, dtype=dtype)


# --------------------------- exponential cone -------------------------------


def _exp_dual_barrier(z3):
    """F*(u,v,w) = -log(psi) - log(-u) - log(w), psi = u log(-u/w) + v - u
    (3-log-homogeneous barrier for K_exp*)."""
    u, v, w = z3[0], z3[1], z3[2]
    psi = u * jnp.log(-u / w) + v - u
    return -jnp.log(psi) - jnp.log(-u) - jnp.log(w)


def exp_dual_grad_hess(zb):
    """Gradient and Hessian of the dual exp barrier per block.
    zb (k, 3) strictly interior to K*; returns g (k, 3), H (k, 3, 3)."""
    g = jax.vmap(jax.grad(_exp_dual_barrier))(zb)
    H = jax.vmap(jax.hessian(_exp_dual_barrier))(zb)
    return g, H


def exp_interior(vb, dual: bool, margin=0.0):
    """(k,) bool: strict interior membership of (k, 3) blocks in K_exp
    (dual=False) or K_exp* (dual=True), with an optional margin on the
    barrier argument. Branch-free with guarded logs."""
    a, b, c = vb[..., 0], vb[..., 1], vb[..., 2]
    if dual:
        # u < 0, w > 0, u log(-u/w) + v - u > margin
        pos = (a < 0.0) & (c > 0.0)
        safe_a = jnp.where(pos, -a, 1.0)
        safe_c = jnp.where(pos, c, 1.0)
        psi = a * jnp.log(safe_a / safe_c) + b - a
        return pos & (psi > margin)
    # y > 0, z > 0, y log(z/y) - x > margin
    pos = (b > 0.0) & (c > 0.0)
    safe_b = jnp.where(pos, b, 1.0)
    safe_c = jnp.where(pos, c, 1.0)
    r = b * jnp.log(safe_c / safe_b) - a
    return pos & (r > margin)


def cone_product(spec: ConeSpec, u, v) -> jnp.ndarray:
    """Jordan product u o v (0 on zero rows; elementwise on nonneg;
    arrow product on SOC blocks)."""
    out = jnp.zeros_like(u)
    sl = spec.lin_slice
    out = out.at[sl].set(u[sl] * v[sl])
    for d, idx in spec.soc_indices().items():
        ub = u[idx]  # (k, d)
        vb = v[idx]
        head = jnp.sum(ub * vb, axis=1, keepdims=True)
        tail = ub[:, :1] * vb[:, 1:] + vb[:, :1] * ub[:, 1:]
        out = out.at[idx].set(jnp.concatenate([head, tail], axis=1))
    return out


def cone_div(spec: ConeSpec, lam, v) -> jnp.ndarray:
    """Solve lam o x = v for x (inverse arrow operator per block)."""
    out = jnp.zeros_like(v)
    sl = spec.lin_slice
    out = out.at[sl].set(v[sl] / lam[sl])
    for d, idx in spec.soc_indices().items():
        lb = lam[idx]  # (k, d)
        vb = v[idx]
        l0 = lb[:, :1]
        l1 = lb[:, 1:]
        v0 = vb[:, :1]
        v1 = vb[:, 1:]
        # arrow(lam) = [[l0, l1^T], [l1, l0 I]]; closed-form inverse uses the
        # Jordan determinant det = l0^2 - ||l1||^2, then back-substitution.
        det = l0**2 - jnp.sum(l1**2, axis=1, keepdims=True)
        x0 = (l0 * v0 - jnp.sum(l1 * v1, axis=1, keepdims=True)) / det
        x1 = (v1 - x0 * l1) / l0
        out = out.at[idx].set(jnp.concatenate([x0, x1], axis=1))
    return out


def max_step(spec: ConeSpec, u, du, big: float = 1e12,
             dual: bool = False) -> jnp.ndarray:
    """Largest alpha >= 0 with u + alpha*du in K (ignoring zero rows).
    `dual` selects K* for the (non-self-dual) exp blocks — pass True when
    stepping the dual iterate z.

    `u` must be strictly interior. Returns a scalar (capped at `big`).
    """
    alphas = [jnp.asarray(big, u.dtype)]
    sl = spec.lin_slice
    if spec.nl > 0:
        ul = u[sl]
        dl = du[sl]
        neg = dl < 0
        cand = jnp.where(neg, -ul / jnp.where(neg, dl, -1.0), big)
        alphas.append(jnp.min(cand))
    for d, idx in spec.soc_indices().items():
        ub = u[idx]
        db = du[idx]
        u0, u1 = ub[:, 0], ub[:, 1:]
        d0, d1 = db[:, 0], db[:, 1:]
        a = d0**2 - jnp.sum(d1**2, axis=1)
        b = 2.0 * (u0 * d0 - jnp.sum(u1 * d1, axis=1))
        c = u0**2 - jnp.sum(u1**2, axis=1)  # > 0 strictly interior
        disc = b**2 - 4.0 * a * c
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
        # numerically stable quadratic roots
        q = -0.5 * (b + jnp.sign(b + (b == 0)) * sqrt_disc)
        r1 = jnp.where(a != 0, q / jnp.where(a != 0, a, 1.0), big)
        r2 = jnp.where(q != 0, c / jnp.where(q != 0, q, 1.0), big)
        # candidate boundary crossings: smallest positive root of the quadratic
        def pos_or_big(r):
            return jnp.where((r > 0) & (disc >= 0), r, big)

        root = jnp.minimum(pos_or_big(r1), pos_or_big(r2))
        # head hits zero (ray exits through the apex side)
        head = jnp.where(d0 < 0, -u0 / jnp.where(d0 < 0, d0, -1.0), big)
        # the boundary is crossed at the earlier of the two events
        alpha_b = jnp.minimum(root, head)
        alphas.append(jnp.min(alpha_b))
    alpha = jnp.minimum(
        jnp.min(jnp.stack([jnp.atleast_1d(a).min() for a in alphas])), big)
    if spec.nexp > 0:
        # no closed form for the exp boundary crossing; the feasible alphas
        # form an interval [0, a*) (ray from an interior point of a convex
        # cone), so bisection on strict-interior membership is exact
        idx = spec.exp_indices()
        ub = u[idx]
        db = du[idx]

        def feas(a):
            return jnp.all(exp_interior(ub + a * db, dual))

        def bisect(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            ok = feas(mid)
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid))

        full = feas(alpha)
        lo, hi = jax.lax.fori_loop(
            0, 90, bisect,
            (jnp.asarray(0.0, u.dtype), alpha))
        alpha = jnp.where(full, alpha, lo)
    return alpha


# ------------------------------ NT scaling ---------------------------------


class NTScaling(NamedTuple):
    """Scaling point for K = R+^nl x SOC products x EXP^nexp.

    Symmetric part is Nesterov-Todd: W symmetric, W z = W^{-1} s = lambda:
      w_l:   (nl,) with W_lin = diag(w_l)
      socs:  per dim-group tuples (eta (k,1), wbar (k,d)) with
             W_soc = eta * [[w0, w1^T], [w1, I + w1 w1^T/(1+w0)]]

    Exp blocks use a primal-dual BFGS scaling (ECOS-exp / Dahl-Andersen
    style): starting from the dual-barrier Hessian at the per-block
    parameter, H0 = (s'z/3) * hess F*(z), the double rank-1 BFGS update
    enforces the secant W^2 z = s exactly (see nt_scaling). Stored:
      exp_W/exp_Winv: (k, 3, 3) symmetric sqrt of the BFGS W^2 and inverse;
      exp_H: (k, 3, 3) the BFGS-updated W^2 itself (NOT the raw mu*hess);
      exp_g: (k, 3) gradient of the dual barrier (central-path RHS).
    None when the spec has no exp cones.
    """

    w_l: jnp.ndarray
    socs: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    soc_dims: Tuple[int, ...]  # static group dims, parallel to socs
    exp_W: Optional[jnp.ndarray] = None
    exp_Winv: Optional[jnp.ndarray] = None
    exp_H: Optional[jnp.ndarray] = None
    exp_g: Optional[jnp.ndarray] = None


def nt_scaling(spec: ConeSpec, s, z, mu=None) -> NTScaling:
    """Compute the scaling from strictly interior s, z (`mu` required when
    the spec has exp cones — the nonsymmetric scaling is mu * hess F*(z)).

    Boundary-grazing iterates can make the Jordan determinants s'Js, z'Jz (and
    the linear ratios s/z) infinitesimally negative through roundoff; every
    sqrt argument is floored at `tiny` so the scaling degrades gracefully
    instead of producing NaN (the IPM's NaN guard then falls back to the best
    iterate)."""
    tiny = jnp.asarray(1e-300 if s.dtype == jnp.float64 else 1e-30, s.dtype)
    sl = spec.lin_slice
    w_l = (jnp.sqrt(jnp.maximum(s[sl] / z[sl], tiny)) if spec.nl > 0
           else jnp.zeros(0, s.dtype))
    socs = []
    dims = []
    for d, idx in spec.soc_indices().items():
        sb = s[idx]  # (k, d)
        zb = z[idx]
        J = jnp.concatenate([jnp.ones(1, s.dtype), -jnp.ones(d - 1, s.dtype)])
        res_s = jnp.sqrt(jnp.maximum(jnp.sum(sb * sb * J, axis=1, keepdims=True), tiny))
        res_z = jnp.sqrt(jnp.maximum(jnp.sum(zb * zb * J, axis=1, keepdims=True), tiny))
        sbar = sb / res_s
        zbar = zb / res_z
        gamma = jnp.sqrt(jnp.maximum(
            (1.0 + jnp.sum(sbar * zbar, axis=1, keepdims=True)) / 2.0, tiny))
        wbar = (sbar + zbar * J) / (2.0 * gamma)  # (sbar + J zbar)/(2 gamma)
        eta = jnp.sqrt(jnp.maximum(res_s / res_z, tiny))
        socs.append((eta, wbar))
        dims.append(d)
    exp_W = exp_Winv = exp_H = exp_g = None
    if spec.nexp > 0:
        assert mu is not None, "exp-cone scaling needs the barrier parameter"
        idx = spec.exp_indices()
        zb = z[idx]                                      # (k, 3)
        sb = s[idx]
        g, H = exp_dual_grad_hess(zb)
        # primal-dual BFGS scaling (ECOS-exp / Dahl-Andersen style): start
        # from the dual-barrier Hessian at the per-block parameter
        # mu_b = s'z/3 and apply the BFGS double rank-1 update so the
        # secant W^2 z = s holds exactly — a pure dual scaling lets the
        # -W^2 dz term push the primal iterate through the primal boundary
        # (observed alpha -> 0 stalls); the secant restores the symmetric
        # cones' ds + W^2 dz = -s consistency
        mu_b = jnp.maximum(jnp.sum(sb * zb, axis=1), tiny)[:, None, None] / 3.0
        H0 = mu_b * H
        H0z = jnp.einsum("kij,kj->ki", H0, zb)
        zH0z = jnp.maximum(jnp.sum(zb * H0z, axis=1), tiny)
        sz = jnp.maximum(jnp.sum(sb * zb, axis=1), tiny)
        W2 = (H0
              - H0z[:, :, None] * H0z[:, None, :] / zH0z[:, None, None]
              + sb[:, :, None] * sb[:, None, :] / sz[:, None, None])
        lam_e, U = jnp.linalg.eigh(W2)                   # SPD by BFGS
        # relative floor: the BFGS subtraction leaves W2 exactly singular
        # along directions roundoff can push slightly negative; an absolute
        # tiny floor would let W^-1 explode to ~1e150 and NaN the KKT
        eps_r = jnp.asarray(1e-13 if s.dtype == jnp.float64 else 1e-6,
                            s.dtype)
        lam_e = jnp.maximum(lam_e, eps_r * lam_e[:, -1:])
        sq = jnp.sqrt(lam_e)
        exp_W = jnp.einsum("kij,kj,klj->kil", U, sq, U)
        exp_Winv = jnp.einsum("kij,kj,klj->kil", U, 1.0 / sq, U)
        exp_H = W2
        exp_g = g
    return NTScaling(w_l, tuple(socs), tuple(dims),
                     exp_W=exp_W, exp_Winv=exp_Winv, exp_H=exp_H, exp_g=exp_g)


def _soc_apply(eta, wbar, v, inverse: bool):
    """Apply eta*Wbar (or its inverse) to blocks v (k, d)."""
    w0 = wbar[:, :1]
    w1 = -wbar[:, 1:] if inverse else wbar[:, 1:]
    v0 = v[:, :1]
    v1 = v[:, 1:]
    t = jnp.sum(w1 * v1, axis=1, keepdims=True)
    out0 = w0 * v0 + t
    out1 = v1 + (v0 + t / (1.0 + w0)) * w1
    out = jnp.concatenate([out0, out1], axis=1)
    return out / eta if inverse else out * eta


def scale(spec: ConeSpec, W: NTScaling, v, inverse: bool = False) -> jnp.ndarray:
    """Apply W (or W^{-1}) to v. Zero rows pass through unchanged."""
    out = v
    sl = spec.lin_slice
    if spec.nl > 0:
        out = out.at[sl].set(v[sl] / W.w_l if inverse else v[sl] * W.w_l)
    groups = spec.soc_indices()
    for (eta, wbar), d in zip(W.socs, W.soc_dims):
        idx = groups[d]
        out = out.at[idx].set(_soc_apply(eta, wbar, v[idx], inverse))
    if spec.nexp > 0 and W.exp_W is not None:
        idx = spec.exp_indices()
        M = W.exp_Winv if inverse else W.exp_W
        out = out.at[idx].set(jnp.einsum("kij,kj->ki", M, v[idx]))
    return out


def w2_dense(spec: ConeSpec, W: NTScaling, dtype=None) -> jnp.ndarray:
    """Dense (m, m) block-diagonal W^2 (zero block on zero-cone rows).

    Used to assemble the KKT matrix for the direct factorization. W^2 for an
    SOC block is eta^2 (2 wbar wbar^T - J).
    """
    dtype = dtype or W.w_l.dtype
    out = jnp.zeros((spec.m, spec.m), dtype)
    sl = spec.lin_slice
    if spec.nl > 0:
        lin_idx = np.arange(spec.nz, spec.nz + spec.nl)
        out = out.at[lin_idx, lin_idx].set(W.w_l**2)
    groups = spec.soc_indices()
    for (eta, wbar), d in zip(W.socs, W.soc_dims):
        idx = groups[d]  # (k, d)
        J = jnp.concatenate([jnp.ones(1, dtype), -jnp.ones(d - 1, dtype)])
        blocks = (eta**2)[:, :, None] * (
            2.0 * wbar[:, :, None] * wbar[:, None, :] - jnp.diag(J)[None, :, :]
        )
        rows = idx[:, :, None]
        cols = idx[:, None, :]
        out = out.at[rows, cols].set(blocks)
    if spec.nexp > 0 and W.exp_H is not None:
        idx = spec.exp_indices()
        out = out.at[idx[:, :, None], idx[:, None, :]].set(W.exp_H)
    return out


def lambda_vec(spec: ConeSpec, W: NTScaling, z) -> jnp.ndarray:
    """lambda = W z (zero on zero-cone rows; zero on exp rows — the
    nonsymmetric blocks take their central-path RHS directly, not through
    the Jordan algebra)."""
    lam = scale(spec, W, z)
    if spec.nz > 0:
        lam = lam.at[spec.zero_slice].set(0.0)
    if spec.nexp > 0:
        lam = lam.at[spec.exp_indices()].set(0.0)
    return lam


def project(spec: ConeSpec, v) -> jnp.ndarray:
    """Euclidean projection onto K (0 on zero rows; used for initialization
    checks and the SCvx nonlinear-cost cone violations)."""
    out = v
    if spec.nz > 0:
        out = out.at[spec.zero_slice].set(0.0)
    sl = spec.lin_slice
    if spec.nl > 0:
        out = out.at[sl].set(jnp.maximum(v[sl], 0.0))
    for d, idx in spec.soc_indices().items():
        vb = v[idx]
        v0 = vb[:, 0]
        v1 = vb[:, 1:]
        nv1 = jnp.linalg.norm(v1, axis=1)
        # three cases: inside (v0 >= nv1), polar (-v0 >= nv1) -> 0, else boundary
        coef = jnp.clip((v0 + nv1) / 2.0, 0.0, None)
        inside = v0 >= nv1
        p0 = jnp.where(inside, v0, coef)
        safe = jnp.where(nv1 > 0, nv1, 1.0)
        p1 = jnp.where(
            inside[:, None], v1, (coef / safe)[:, None] * v1
        )
        out = out.at[idx].set(jnp.concatenate([p0[:, None], p1], axis=1))
    assert spec.nexp == 0, (
        "Euclidean projection onto the exp cone has no closed form; use "
        "violation() (feasibility-gap measure) for exp specs")
    return out


def exp_violation(vb) -> jnp.ndarray:
    """Feasibility-gap measure of (k, 3) blocks vs K_exp: 0 iff the block is
    in the cone. Uses the log-form residual max(0, x - y log(z/y), -y, -z)
    for y > 0, z > 0; the true boundary face of cl(K_exp) beyond the
    interior chart is {y = 0, x <= 0, z >= 0}, measured only when y <= 0 —
    for y > 0 with z <= 0 the point is NOT in the cone (y e^{x/y} > 0 >= z)
    and the violation max(-z, y) keeps the measure strictly positive off
    the cone (the sign fix; the measure itself still jumps downward at
    z = 0 since the interior residual diverges as z -> 0+)."""
    x, y, z = vb[..., 0], vb[..., 1], vb[..., 2]
    ypos = y > 0.0
    zpos = z > 0.0
    safe_y = jnp.where(ypos, y, 1.0)
    safe_z = jnp.where(zpos, z, 1.0)
    r_int = jnp.maximum(x - y * jnp.log(safe_z / safe_y), -z)
    r_face = jnp.maximum(x, jnp.maximum(-z, -y))
    r_ynegz = jnp.maximum(-z, y)  # y > 0, z <= 0: infeasible by at least y
    r = jnp.where(ypos & zpos, r_int,
                  jnp.where(ypos, r_ynegz, r_face))
    return jnp.maximum(r, 0.0)


def violation(spec: ConeSpec, v) -> jnp.ndarray:
    """Distance-like infeasibility measure: ||v - proj_K(v)||_inf, with zero
    rows measured as |v| (they must equal 0) and exp rows by the log-form
    feasibility gap."""
    if spec.m == 0:
        return jnp.zeros((), v.dtype)
    vals = []
    if spec.nexp > 0:
        idx = spec.exp_indices()
        vals.append(jnp.max(exp_violation(v[idx])))
        sym = ConeSpec(nz=spec.nz, nl=spec.nl, socs=spec.socs)
        v = v[: sym.m]
        spec = sym
    if spec.m > 0:
        pv = project(spec, v)
        vals.append(jnp.max(jnp.abs(v - pv)))
    return jnp.max(jnp.stack(vals))
