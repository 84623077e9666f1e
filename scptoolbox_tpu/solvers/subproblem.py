"""Subproblem assembly infrastructure: variable layout, cone row planning,
and dense (A, b, c) assembly for the native IPM.

This replaces the reference's per-iteration JuMP model rebuild
(src/solvers/ptr.jl:470 constructs a fresh `ConicProgram`, re-running every
`@add_constraint` macro closure, each SCP iteration). Here the subproblem is
ONE traced template: the structure (variable blocks, row counts, cone spec)
is fixed at setup, and each iteration only feeds new coefficient arrays
(the DLTV matrices, linearized constraint rows, reference trajectory)
through a jitted assemble -> ipm.solve pipeline. That makes the whole SCP
iteration compilable, batchable (vmap over scenarios), and shardable.

Sign/lowering conventions (residual v affine in the decision d):
    ZERO    v  = 0       ->  A = J,  b = -v0,  zero-cone rows
    NONPOS  v <= 0       ->  A = J,  b = -v0,  nonneg slack rows (s = -v)
    SOC     v in SOC     ->  A = -J, b =  v0,  SOC slack block  (s =  v)
    LINF/L1/GEOM are lowered at planning time (aux variables for L1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.ops.cones import ConeSpec
from scptoolbox_tpu.parser.problem import ConeKind


class VarLayout:
    """Named blocks of the flat decision vector (static index bookkeeping).

    The TPU-native analog of the reference's ArgumentBlock/Argument stacking
    (src/parser/{block,argument}.jl): names map to index arrays, nothing is
    symbolic.
    """

    def __init__(self):
        self._blocks: Dict[str, Tuple[int, Tuple[int, ...]]] = {}
        self.n = 0

    def add(self, name: str, *shape: int) -> None:
        assert name not in self._blocks, f"duplicate block {name}"
        size = int(np.prod(shape)) if shape else 1
        self._blocks[name] = (self.n, tuple(shape))
        self.n += size

    def has(self, name: str) -> bool:
        return name in self._blocks

    def idx(self, name: str) -> np.ndarray:
        """Index array with the block's shape (scalars: shape ())."""
        off, shape = self._blocks[name]
        size = int(np.prod(shape)) if shape else 1
        return (off + np.arange(size)).reshape(shape)

    def sl(self, name: str) -> slice:
        off, shape = self._blocks[name]
        size = int(np.prod(shape)) if shape else 1
        return slice(off, off + size)

    def extract(self, d: jnp.ndarray, name: str) -> jnp.ndarray:
        off, shape = self._blocks[name]
        size = int(np.prod(shape)) if shape else 1
        return jax.lax.dynamic_slice_in_dim(d, off, size).reshape(shape)


class RowPlan:
    """Reserve constraint rows grouped by cone kind; freeze() orders them
    [zero | nonneg | soc...] to match ops/cones.ConeSpec layout."""

    def __init__(self):
        self._zero: List[Tuple[str, int]] = []
        self._nonneg: List[Tuple[str, int]] = []
        self._soc: List[Tuple[str, int, int]] = []  # (name, count, dim)
        self._exp: List[Tuple[str, int]] = []       # (name, count) 3-dim blks
        self._frozen = False
        self._rows: Dict[str, np.ndarray] = {}

    def zero(self, name: str, nrows: int) -> None:
        assert not self._frozen
        self._zero.append((name, int(nrows)))

    def nonneg(self, name: str, nrows: int) -> None:
        assert not self._frozen
        self._nonneg.append((name, int(nrows)))

    def soc(self, name: str, count: int, dim: int) -> None:
        assert not self._frozen
        self._soc.append((name, int(count), int(dim)))

    def exp(self, name: str, count: int) -> None:
        """`count` exponential-cone blocks (x, y, z): y e^{x/y} <= z."""
        assert not self._frozen
        self._exp.append((name, int(count)))

    def freeze(self) -> ConeSpec:
        assert not self._frozen
        self._frozen = True
        off = 0
        for name, nr in self._zero:
            self._rows[name] = off + np.arange(nr)
            off += nr
        nz = off
        for name, nr in self._nonneg:
            self._rows[name] = off + np.arange(nr)
            off += nr
        nl = off - nz
        socs: List[int] = []
        for name, count, dim in self._soc:
            self._rows[name] = (
                off + np.arange(count)[:, None] * dim + np.arange(dim)[None, :]
            )
            off += count * dim
            socs.extend([dim] * count)
        nexp = 0
        for name, count in self._exp:
            self._rows[name] = (
                off + np.arange(count)[:, None] * 3 + np.arange(3)[None, :]
            )
            off += count * 3
            nexp += count
        self.m = off
        return ConeSpec(nz=nz, nl=nl, socs=tuple(socs), nexp=nexp)

    def rows(self, name: str) -> np.ndarray:
        """(nrows,) for zero/nonneg groups; (count, dim) for SOC/EXP
        groups."""
        return self._rows[name]


class Assembler:
    """Accumulates the dense subproblem (A, b, c, const) inside jit.

    Structure (row/col indices) is static numpy; values are traced.
    """

    def __init__(self, m: int, n: int, dtype):
        self.A = jnp.zeros((m, n), dtype)
        self.b = jnp.zeros(m, dtype)
        self.c = jnp.zeros(n, dtype)
        self.const = jnp.zeros((), dtype)

    # rows: (r,) or (count, dim); cols: matching trailing structure
    def add_A(self, rows: np.ndarray, cols: np.ndarray, blk) -> None:
        """A[rows x cols] += blk. Shapes: rows (r,), cols (c,), blk (r, c);
        or batched rows (k, r), cols (k, c), blk (k, r, c)."""
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        if rows.ndim == 1:
            self.A = self.A.at[rows[:, None], cols[None, :]].add(blk)
        else:
            self.A = self.A.at[rows[:, :, None], cols[:, None, :]].add(blk)

    def add_b(self, rows: np.ndarray, vals) -> None:
        self.b = self.b.at[np.asarray(rows).reshape(-1)].add(
            jnp.asarray(vals).reshape(-1)
        )

    def add_c(self, cols: np.ndarray, vals) -> None:
        self.c = self.c.at[np.asarray(cols).reshape(-1)].add(
            jnp.asarray(vals).reshape(-1)
        )

    def add_const(self, v) -> None:
        self.const = self.const + v

    # ---- residual-level helpers (v = J d_cols + v0, membership by kind) --

    def res_zero(self, rows, cols, J, v0) -> None:
        self.add_A(rows, cols, J)
        self.add_b(rows, -jnp.asarray(v0))

    def res_nonpos(self, rows, cols, J, v0) -> None:
        self.add_A(rows, cols, J)
        self.add_b(rows, -jnp.asarray(v0))

    def res_soc(self, rows, cols, J, v0) -> None:
        self.add_A(rows, cols, -jnp.asarray(J))
        self.add_b(rows, jnp.asarray(v0))

    # membership s = v in K_exp: same sign convention as SOC
    res_exp = res_soc

    def finish(self, S_full, c_full):
        """Apply the diagonal decision scaling d = S d_hat + c and return
        (A_hat, b_hat, c_obj_hat, const_hat). The IPM then solves in d_hat."""
        A_hat = self.A * S_full[None, :]
        b_hat = self.b - self.A @ c_full
        c_hat = self.c * S_full
        const = self.const + jnp.dot(self.c, c_full)
        return A_hat, b_hat, c_hat, const


def soc_epigraph_quadratic(
    asm: Assembler,
    rows: np.ndarray,
    d_cols: np.ndarray,
    t_col: int,
    H,
    g,
    c0,
    d0,
):
    """Post rows for  t >= 0.5 (d-d0)'H(d-d0) + g'(d-d0) + c0  as one SOC.

    With H = L L' (eigh, psd clip): tau := t - lin(d) and the block
    [ (2 tau + 1)/2, (2 tau - 1)/2, L' d_shift ] in SOC(dim+2).
    `rows` must be a (1, dim+2) SOC group reservation.

    This is the bridging JuMP/MOI performs for quadratic objectives over
    ECOS (the reference's QuadraticCost, src/parser/cost.jl:68-107).
    """
    dim = len(np.asarray(d_cols).reshape(-1))
    w, V = jnp.linalg.eigh(H)
    Lt = jnp.sqrt(jnp.clip(w, 0.0, None))[:, None] * V.T  # (dim, dim) = L'
    # lin(d) = (g - H d0)' d + (c0 + 0.5 d0'H d0 - g'd0)
    lin_g = g - H @ d0
    lin_c = c0 + 0.5 * jnp.dot(d0, H @ d0) - jnp.dot(g, d0)
    # tau = t - lin_g'd - lin_c ; rows of v:
    #  v[0] = tau + 0.5 ; v[1] = tau - 0.5 ; v[2:] = L'(d - d0) + L'd0 = L'd
    dim_v = dim + 2
    J = jnp.zeros((dim_v, dim + 1), H.dtype)  # cols: [d_cols..., t_col]
    J = J.at[0, :dim].set(-lin_g)
    J = J.at[0, dim].set(1.0)
    J = J.at[1, :dim].set(-lin_g)
    J = J.at[1, dim].set(1.0)
    J = J.at[2:, :dim].set(Lt)
    v0 = jnp.concatenate(
        [jnp.stack([-lin_c + 0.5, -lin_c - 0.5]), jnp.zeros(dim, H.dtype)]
    )
    cols = np.concatenate([np.asarray(d_cols).reshape(-1), [t_col]])
    asm.res_soc(rows, cols, J, v0)
