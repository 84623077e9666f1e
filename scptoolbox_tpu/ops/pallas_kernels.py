"""Pallas TPU kernels for the IPM's dense KKT hot path.

The reduced Schur KKT (ops/ipm.py `_SchurKKT`) spends its time in the
Cholesky factorization of H = A_C' W^-2 A_C (n x n) and S (nz x nz) and in
the triangular solves against them — per IPM iteration, per scenario in the
batch (reference analog: the LDL factorization inside the ECOS C solver,
SCPToolbox.jl src/parser/general.jl:22). XLA's `jnp.linalg.cholesky` on TPU
lowers to a generic loop-heavy routine; these kernels keep the whole matrix
resident in VMEM and run the factorization as one fused right-looking sweep
per scenario, with the scenario batch vmapped onto the Pallas grid so the
pipeline stays busy (SURVEY.md §7: "batch dimension is the saving grace").

Mosaic constraints shape the implementation (pallas_guide.md):
  * no dynamic indexing on the lane (last) dimension — columns are selected
    with masked reductions (`sum(A * (cols == j), axis=1)`) and written back
    with `where(cols == j, ...)` full-matrix selects;
  * no per-step transposes — the right-looking Cholesky update needs both
    the column (np,1) and row (1,np) forms of pivot column j, and the
    trailing submatrix is symmetric, so the row form is read from row j
    instead of transposing the column;
  * rank-1 updates are broadcast outer products (np,1)*(1,np) on the VPU —
    a k=1 MXU matmul would waste the systolic array;
  * matrices are padded host-side to lane multiples (128) with a unit
    diagonal on the padding, so the factor of the padded matrix embeds the
    factor of the true one exactly;
  * everything is f32: the TPU IPM path runs f32 end-to-end (ipm.py pins
    matmul precision), and `_SchurKKT`'s iterative refinement against the
    exact operator restores the accuracy a single factorization pass loses.

CPU tests run these kernels in interpreter mode (interpret=True); on real
TPU they compile via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int = LANE) -> int:
    return -(-x // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _iotas(np_: int):
    rows_v = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)   # (np, 1)
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)   # (1, np)
    return rows_v, cols_h


# --------------------------------------------------------------------------
# Cholesky
# --------------------------------------------------------------------------


def _cholesky_kernel(n: int, a_ref, l_ref):
    """Right-looking masked Cholesky of the padded (np, np) block.

    Loop invariant: after step j, columns <= j of `l_ref` hold final factor
    columns (zero above the diagonal) and the trailing submatrix (rows and
    cols > j) holds the downdated — still symmetric — Schur complement.
    """
    np_ = l_ref.shape[0]
    l_ref[:, :] = a_ref[:, :]
    rows_v, cols_h = _iotas(np_)

    def body(j, _):
        A = l_ref[:, :]
        colm = (cols_h == j).astype(A.dtype)                # (1, np)
        rowm = (rows_v == j).astype(A.dtype)                # (np, 1)
        col = jnp.sum(A * colm, axis=1, keepdims=True)      # (np, 1) col j
        row = jnp.sum(A * rowm, axis=0, keepdims=True)      # (1, np) row j
        d = jnp.sum(col * rowm)                             # A[j, j]
        dinv = jax.lax.rsqrt(d)
        newcol = jnp.where(rows_v >= j, col * dinv, 0.0)
        low = jnp.where(rows_v > j, col * dinv, 0.0)        # (np, 1)
        # row j of the symmetric trailing block == column j: (1, np) form
        lowT = jnp.where(cols_h > j, row * dinv, 0.0)       # (1, np)
        # rank-1 downdate; rows/cols <= j of low*lowT vanish by the masks
        A = A - low * lowT
        l_ref[:, :] = jnp.where(cols_h == j, newcol, A)
        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)


def cholesky(H: jnp.ndarray, *, interpret: bool | None = None) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix (n, n), n arbitrary.

    vmap-compatible: a (B, n, n) input runs one grid program per matrix.
    """
    if interpret is None:
        interpret = _interpret_default()
    n = H.shape[-1]
    np_ = max(_round_up(n), LANE)
    dt = H.dtype
    pad = np_ - n
    Hp = jnp.pad(H, [(0, 0)] * (H.ndim - 2) + [(0, pad), (0, pad)])
    if pad:
        eye_pad = jnp.pad(jnp.zeros((n,), dt), (0, pad), constant_values=1.0)
        Hp = Hp + jnp.diag(eye_pad)
    fn = pl.pallas_call(
        functools.partial(_cholesky_kernel, n),
        out_shape=jax.ShapeDtypeStruct((np_, np_), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    for _ in range(H.ndim - 2):
        fn = jax.vmap(fn)
    L = fn(Hp)
    return L[..., :n, :n]


# --------------------------------------------------------------------------
# Triangular solves
# --------------------------------------------------------------------------


def _fwd_solve_kernel(n: int, l_ref, b_ref, y_ref):
    """Solve L Y = B for lower-triangular L (padded, unit on padding)."""
    np_ = l_ref.shape[0]
    k = b_ref.shape[1]
    y_ref[:, :] = jnp.zeros_like(y_ref)
    rows_v, cols_h = _iotas(np_)
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)

    def body(j, _):
        L = l_ref[:, :]
        B = b_ref[:, :]
        col = jnp.sum(L * (cols_h == j).astype(L.dtype), axis=1,
                      keepdims=True)                        # (np, 1)
        d = jnp.sum(col * (rows_v == j).astype(L.dtype))    # L[j, j]
        rm = (rows_b == j).astype(B.dtype)                  # (np, 1)
        yrow = jnp.sum(B * rm, axis=0, keepdims=True) / d   # (1, k)
        # subtract col * yrow; row j of col includes the diagonal so B's
        # row j is zeroed, harmless since yrow is already extracted
        b_ref[:, :] = B - col * yrow
        y_ref[:, :] = y_ref[:, :] + rm * yrow
        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)


def _bwd_solve_kernel(n: int, lt_ref, b_ref, x_ref):
    """Solve U X = B for upper-triangular U = L' (padded, unit padding)."""
    np_ = lt_ref.shape[0]
    x_ref[:, :] = jnp.zeros_like(x_ref)
    rows_v, cols_h = _iotas(np_)
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)

    def body(i, _):
        j = n - 1 - i
        U = lt_ref[:, :]
        B = b_ref[:, :]
        col = jnp.sum(U * (cols_h == j).astype(U.dtype), axis=1,
                      keepdims=True)                        # (np, 1) col j
        d = jnp.sum(col * (rows_v == j).astype(U.dtype))    # U[j, j]
        rm = (rows_b == j).astype(B.dtype)
        xrow = jnp.sum(B * rm, axis=0, keepdims=True) / d   # (1, k)
        above = jnp.where(rows_v < j, col, 0.0)             # strict upper
        b_ref[:, :] = B - above * xrow
        x_ref[:, :] = x_ref[:, :] + rm * xrow
        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)


def _tri_solve(kernel, T: jnp.ndarray, B: jnp.ndarray,
               interpret: bool | None) -> jnp.ndarray:
    """Shared padding/dispatch for the solve kernels. `T` is the (possibly
    transposed) triangular factor; padding gets a unit diagonal."""
    if interpret is None:
        interpret = _interpret_default()
    vec = B.ndim == T.ndim - 1
    if vec:
        B = B[..., None]
    n = T.shape[-1]
    k = B.shape[-1]
    np_ = max(_round_up(n), LANE)
    kp = max(_round_up(k), LANE)
    dt = T.dtype
    pad_n = np_ - n
    Tp = jnp.pad(T, [(0, 0)] * (T.ndim - 2) + [(0, pad_n), (0, pad_n)])
    if pad_n:
        eye_pad = jnp.pad(jnp.zeros((n,), dt), (0, pad_n),
                          constant_values=1.0)
        Tp = Tp + jnp.diag(eye_pad)
    Bp = jnp.pad(B.astype(dt),
                 [(0, 0)] * (B.ndim - 2) + [(0, pad_n), (0, kp - k)])
    fn = pl.pallas_call(
        functools.partial(kernel, n),
        out_shape=jax.ShapeDtypeStruct((np_, kp), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    for _ in range(T.ndim - 2):
        fn = jax.vmap(fn)
    Y = fn(Tp, Bp)[..., :n, :k]
    return Y[..., 0] if vec else Y


def solve_lower(L, B, *, interpret=None):
    """Y with L Y = B (L lower-triangular)."""
    return _tri_solve(_fwd_solve_kernel, L, B, interpret)


def solve_lower_t(L, B, *, interpret=None):
    """X with L' X = B (L lower-triangular; transposed outside the kernel —
    one XLA transpose beats a per-step Mosaic relayout)."""
    return _tri_solve(_bwd_solve_kernel, jnp.swapaxes(L, -1, -2), B,
                      interpret)


def cho_solve(L, B, *, interpret=None):
    """Solve (L L') X = B given the lower Cholesky factor."""
    return solve_lower_t(L, solve_lower(L, B, interpret=interpret),
                         interpret=interpret)


# --------------------------------------------------------------------------
# Batch-in-lanes Gauss-Jordan inverse
# --------------------------------------------------------------------------
#
# Why a second factorization kernel exists (measured, TPU v5e, round 5):
# XLA's batched decompositions on this stack are BATCH-SERIAL — timings of
# (B, 158, 158) f32: lu_factor 16ms @ B=128 -> 63ms @ B=512 (linear in B),
# cholesky 8 -> 29ms, qr 9 -> 34ms — while batched matmul is flat (1.4ms ->
# 1.8ms). The cyclic-reduction staged KKT (ops/aug_kkt.py) is therefore
# bound by its per-level small-block inverses, not by flops. This kernel
# inverts a batch of small matrices with the BATCH in the 128-wide lane
# dimension: each Gauss-Jordan step is a full-matrix (s, s, 128) VPU
# update, so the sequential depth is s (not B*s) and throughput is flat in
# the batch. The blocks it receives are Jacobi-equilibrated quasidefinite
# stage blocks (all leading pivots exist, Vanderbei); there is no pivot
# search — a tiny-pivot safeguard plus the caller's FGMRES wrapper
# (aug_kkt.StagedCR.solve) covers the unpivoted growth, the same policy as
# the unpivoted StagedLU sweep.


def _gj_kernel(s: int, in_hbm, out_hbm, w_ref, sem_in, sem_out):
    """In-place Jordan-exchange inversion of one (sp, sp, 128) lane-tile.

    The tile lives in HBM ((T, sp, sp, 128) overall) and is DMA'd into a
    single VMEM scratch — in/out BlockSpec staging would need two VMEM
    copies of the tile and OOMs at sp=160 (measured); one scratch fits.
    After step j the scratch holds the partial Jordan exchange; after all
    sp steps, the matrix inverse (classic in-place Gauss-Jordan pivot
    exchange, pivots taken in order on the diagonal). Each step is one
    masked-reduction pass (column j) plus one fused read-modify-write pass
    of the whole tile — ~3 VMEM passes per step, sequential depth sp.
    """
    t = pl.program_id(0)
    dma_in = pltpu.make_async_copy(in_hbm.at[t], w_ref, sem_in)
    dma_in.start()
    dma_in.wait()

    sp = w_ref.shape[0]
    CH = 8                       # row-chunk height: in-place chunked writes
    nch = sp // CH               # keep the step's temps at (CH, sp, 128) --
    #                              a fused full-tile update would need a
    #                              second tile-sized VMEM temp and OOM
    mids = jax.lax.broadcasted_iota(jnp.int32, (1, sp, 1), 1)

    def body(j, _):
        rowj = w_ref[pl.ds(j, 1), :, :][0]                   # (sp, 128)
        colj = w_ref[:, pl.ds(j, 1), :][:, 0]                # (sp, 128)
        riota = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)
        piv = jnp.sum(jnp.where(riota == j, rowj, 0.0), axis=0)  # (128,)
        # unpivoted safeguard: keep the sign, floor the magnitude
        tiny = jnp.asarray(1e-30, rowj.dtype)
        mag = jnp.maximum(jnp.abs(piv), tiny)
        d = jnp.where(piv < 0, -1.0, 1.0) / mag              # 1/pivot
        rowj_s = rowj * d[None, :]                           # (sp, 128)
        colj_m = jnp.where(riota == j, 0.0, colj)            # zero entry j
        # row j result: M[j,k]/p for k != j, 1/p at the pivot
        rowfin = jnp.where(riota == j, d[None, :], rowj_s)   # (sp, 128)
        for c in range(nch):
            Wc = w_ref[c * CH: (c + 1) * CH, :, :]           # (CH, sp, 128)
            rows_c = (jax.lax.broadcasted_iota(
                jnp.int32, (CH, 1, 1), 0) + c * CH)
            cj = colj_m[c * CH: (c + 1) * CH]                # (CH, 128)
            new_c = Wc - cj[:, None, :] * rowj_s[None, :, :]
            new_c = jnp.where(mids == j,
                              -cj[:, None, :] * d[None, None, :], new_c)
            new_c = jnp.where(rows_c == j, rowfin[None, :, :], new_c)
            w_ref[c * CH: (c + 1) * CH, :, :] = new_c
        return 0

    jax.lax.fori_loop(0, s, body, 0, unroll=False)

    dma_out = pltpu.make_async_copy(w_ref, out_hbm.at[t], sem_out)
    dma_out.start()
    dma_out.wait()


def gj_inverse(M: jnp.ndarray, *, interpret: bool | None = None,
               lane: int = LANE) -> jnp.ndarray:
    """Batched matrix inverse, batch-flat on TPU: (..., s, s) -> (..., s, s).

    Flattens the batch, pads it to a lane multiple with identity blocks,
    transposes batch into the lane dimension, and runs one `_gj_kernel`
    grid program per 128-wide lane tile. Sublane padding embeds the input
    in an identity: the inverse of the padded block restricted to the
    leading (s, s) corner is exactly the inverse of the input.
    """
    if interpret is None:
        interpret = _interpret_default()
    s = M.shape[-1]
    batch_shape = M.shape[:-2]
    nb = 1
    for dim in batch_shape:
        nb *= dim
    dt = M.dtype
    sp = max(_round_up(s, 8), 8)
    nbp = max(_round_up(nb, lane), lane)
    Mf = M.reshape(nb, s, s)
    Mp = jnp.pad(Mf, ((0, nbp - nb), (0, sp - s), (0, sp - s)))
    if sp > s or nbp > nb:
        eye_tail = jnp.pad(jnp.zeros((s,), dt), (0, sp - s),
                           constant_values=1.0)
        fix = jnp.concatenate(
            [jnp.broadcast_to(jnp.diag(eye_tail), (nb, sp, sp)),
             jnp.broadcast_to(jnp.eye(sp, dtype=dt), (nbp - nb, sp, sp))],
            axis=0)
        Mp = Mp + fix
    T = nbp // lane
    Mt = Mp.reshape(T, lane, sp, sp).transpose(0, 2, 3, 1)   # (T,sp,sp,128)
    out = pl.pallas_call(
        functools.partial(_gj_kernel, sp),
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((T, sp, sp, lane), dt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((sp, sp, lane), dt),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(Mt)
    inv = out.transpose(0, 3, 1, 2).reshape(nbp, sp, sp)[:nb, :s, :s]
    return inv.reshape(*batch_shape, s, s)


# --------------------------------------------------------------------------
# Batch-in-lanes LU factor + substitution solves (the staged-CR block engine)
# --------------------------------------------------------------------------
#
# Same measured rationale as gj_inverse (XLA decompositions are
# batch-serial on this stack), but in FACTORED form: at the staged KKT's
# late-IPM conditioning (kappa ~ 1e8 in f32) an explicit block inverse
# carries forward error ~eps*kappa and the preconditioned operator sees
# eps*kappa^2 — measured to stall the starship IPM (see
# aug_kkt.StagedCRQD). Triangular substitution against the stored factors
# is backward-stable (error ~eps*kappa), which the FGMRES wrapper and
# guarded refinement absorb — the same numerical contract as
# scipy's lu_factor/lu_solve that these kernels replace, minus row
# pivoting: the blocks are Jacobi-equilibrated quasidefinite stage blocks
# (all leading pivots exist, Vanderbei), with a tiny-pivot safeguard for
# the padded/degenerate lanes.


def _lu_factor_kernel(s: int, in_hbm, out_hbm, perm_hbm,
                      w_ref, perm_ref, sem_in, sem_out, sem_perm):
    """In-place partially-pivoted LU of one (sp, sp, 128) lane-tile.

    Per-lane row pivoting: at step j each lane independently picks its
    pivot row r = argmax_{i>=j} |W[i, j]| (first index on ties, via a
    min-over-matches reduction — Mosaic-friendly, no argmax primitive),
    swaps rows j and r inside the same fused update pass, and records r
    in `perm_ref` for the solve kernel to replay. After step j, column j
    below the diagonal holds the multipliers (unit-lower L) and row j
    from the diagonal right holds U — exactly scipy's lu_factor contract
    per lane, which is what makes the f32 staged KKT certify (unpivoted
    elimination breaks down on the ~1e-7 regularization pivots of the
    quasidefinite stage blocks; measured round 5)."""
    t = pl.program_id(0)
    pltpu.make_async_copy(in_hbm.at[t], w_ref, sem_in).start()
    pltpu.make_async_copy(in_hbm.at[t], w_ref, sem_in).wait()

    sp = w_ref.shape[0]
    CH = 8
    nch = sp // CH
    mids = jax.lax.broadcasted_iota(jnp.int32, (1, sp, 1), 1)
    riota = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)

    def body(j, _):
        rowj = w_ref[pl.ds(j, 1), :, :][0]                   # (sp, 128)
        colj = w_ref[:, pl.ds(j, 1), :][:, 0]                # (sp, 128)
        # per-lane pivot row: largest |entry| at or below the diagonal
        cand = jnp.where(riota >= j, jnp.abs(colj), -1.0)
        mx = jnp.max(cand, axis=0, keepdims=True)            # (1, 128)
        r = jnp.min(jnp.where(cand == mx, riota, sp),
                    axis=0).astype(jnp.int32)                # (128,)
        perm_ref[pl.ds(j, 1), :] = r[None, :]
        onehot_r = (riota == r[None, :])                     # (sp, 128)
        # post-swap pivot row, accumulated in row chunks (a full-tile
        # masked reduce would materialize a second tile-sized temp: OOM)
        rowr = jnp.zeros((sp, 128), rowj.dtype)
        for c in range(nch):
            oh_c = onehot_r[c * CH:(c + 1) * CH]             # (CH, 128)
            rowr = rowr + jnp.sum(
                jnp.where(oh_c[:, None, :],
                          w_ref[c * CH:(c + 1) * CH, :, :], 0.0), axis=0)
        cj_r = jnp.sum(jnp.where(onehot_r, colj, 0.0), axis=0)  # (128,)
        cj_j = jnp.sum(jnp.where(riota == j, colj, 0.0), axis=0)
        colj_sw = colj + (riota == j) * (cj_r - cj_j)[None, :] \
            - onehot_r * (cj_r - cj_j)[None, :]
        piv = cj_r
        tiny = jnp.asarray(1e-30, rowj.dtype)
        mag = jnp.maximum(jnp.abs(piv), tiny)
        d = jnp.where(piv < 0, -1.0, 1.0) / mag
        lcol = jnp.where(riota > j, colj_sw * d[None, :], 0.0)
        rowU = jnp.where(riota > j, rowr, 0.0)               # U part k > j
        for c in range(nch):
            Wc = w_ref[c * CH:(c + 1) * CH, :, :]
            rows_c = (jax.lax.broadcasted_iota(
                jnp.int32, (CH, 1, 1), 0) + c * CH)
            # fold the row swap into the same pass
            Wc = jnp.where(rows_c == j, rowr[None, :, :], Wc)
            Wc = jnp.where(rows_c == r[None, None, :],
                           rowj[None, :, :], Wc)
            lc = lcol[c * CH:(c + 1) * CH]                   # (CH, 128)
            new_c = Wc - lc[:, None, :] * rowU[None, :, :]
            # store the multipliers in column j (rows > j only)
            new_c = jnp.where((mids == j) & (rows_c > j),
                              lc[:, None, :], new_c)
            w_ref[c * CH:(c + 1) * CH, :, :] = new_c
        return 0

    jax.lax.fori_loop(0, s, body, 0, unroll=False)

    pltpu.make_async_copy(w_ref, out_hbm.at[t], sem_out).start()
    pltpu.make_async_copy(w_ref, out_hbm.at[t], sem_out).wait()
    pltpu.make_async_copy(perm_ref, perm_hbm.at[t], sem_perm).start()
    pltpu.make_async_copy(perm_ref, perm_hbm.at[t], sem_perm).wait()


def _lu_solve_kernel(s: int, kb: int, always_load: bool,
                     f_hbm, p_hbm, b_hbm, out_hbm,
                     f_ref, p_ref, b_ref, sem_f, sem_p, sem_b, sem_out):
    """Pivoted substitution solves of one lane-tile against one kb-column
    chunk of right-hand sides: replay the recorded row swaps fused into
    the unit-L forward pass, then U backward substitution. The K columns
    are split over the second grid dimension; the factor tile and the
    permutation record are DMA'd at the tile's first chunk and stay
    VMEM-resident across its chunk programs (TPU grids run sequentially
    on the core, so scratch persists)."""
    t = pl.program_id(0)
    kc = pl.program_id(1)

    @pl.when((kc == 0) | always_load)
    def _():
        pltpu.make_async_copy(f_hbm.at[t], f_ref, sem_f).start()
        pltpu.make_async_copy(f_hbm.at[t], f_ref, sem_f).wait()
        pltpu.make_async_copy(p_hbm.at[t], p_ref, sem_p).start()
        pltpu.make_async_copy(p_hbm.at[t], p_ref, sem_p).wait()

    pltpu.make_async_copy(
        b_hbm.at[t, :, pl.ds(kc * kb, kb), :], b_ref, sem_b).start()
    pltpu.make_async_copy(
        b_hbm.at[t, :, pl.ds(kc * kb, kb), :], b_ref, sem_b).wait()

    sp = f_ref.shape[0]
    riota2 = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)

    def pswap(j, _):
        # replay ALL recorded swaps first (LAPACK laswp order): the
        # stored multiplier columns reflect the fully-permuted row order,
        # so interleaving swaps with elimination would mismatch them
        r = p_ref[pl.ds(j, 1), :][0]                         # (128,)
        onehot_r = (riota2 == r[None, :])                    # (sp, 128)
        bj = b_ref[pl.ds(j, 1), :, :][0]                     # (kb, 128)
        br = jnp.sum(jnp.where(onehot_r[:, None, :], b_ref[:, :, :],
                               0.0), axis=0)                 # (kb, 128)
        b_ref[:, :, :] = jnp.where(
            riota2[:, :, None] == j, br[None, :, :],
            jnp.where(onehot_r[:, None, :], bj[None, :, :],
                      b_ref[:, :, :]))
        return 0

    jax.lax.fori_loop(0, s, pswap, 0, unroll=False)

    def fwd(j, _):
        colj = f_ref[:, pl.ds(j, 1), :][:, 0]                # (sp, 128)
        lcol = jnp.where(riota2 > j, colj, 0.0)
        rowj = b_ref[pl.ds(j, 1), :, :][0]                   # (kb, 128)
        b_ref[:, :, :] = (b_ref[:, :, :]
                          - lcol[:, None, :] * rowj[None, :, :])
        return 0

    jax.lax.fori_loop(0, s, fwd, 0, unroll=False)

    def bwd(i, _):
        j = s - 1 - i
        colj = f_ref[:, pl.ds(j, 1), :][:, 0]
        piv = jnp.sum(jnp.where(riota2 == j, colj, 0.0), axis=0)
        tiny = jnp.asarray(1e-30, colj.dtype)
        mag = jnp.maximum(jnp.abs(piv), tiny)
        d = jnp.where(piv < 0, -1.0, 1.0) / mag
        rowj = b_ref[pl.ds(j, 1), :, :][0] * d[None, :]      # x_j
        ucol = jnp.where(riota2 < j, colj, 0.0)
        upd = b_ref[:, :, :] - ucol[:, None, :] * rowj[None, :, :]
        b_ref[:, :, :] = jnp.where(riota2[:, :, None] == j,
                                   rowj[None, :, :], upd)
        return 0

    jax.lax.fori_loop(0, s, bwd, 0, unroll=False)

    pltpu.make_async_copy(
        b_ref, out_hbm.at[t, :, pl.ds(kc * kb, kb), :], sem_out).start()
    pltpu.make_async_copy(
        b_ref, out_hbm.at[t, :, pl.ds(kc * kb, kb), :], sem_out).wait()


def _to_lanes(Mf, nb, s2, dt, lane, pad_diag):
    """(nb, s, s2) -> (T, sp, s2p, 128) lanes layout (+identity padding of
    square tiles when pad_diag)."""
    s = Mf.shape[1]
    sp = max(_round_up(s, 8), 8)
    s2p = max(_round_up(s2, 8), 8)
    nbp = max(_round_up(nb, lane), lane)
    Mp = jnp.pad(Mf, ((0, nbp - nb), (0, sp - s), (0, s2p - s2)))
    if pad_diag and (sp > s or nbp > nb):
        eye_tail = jnp.pad(jnp.zeros((s,), dt), (0, sp - s),
                           constant_values=1.0)
        fix = jnp.concatenate(
            [jnp.broadcast_to(jnp.diag(eye_tail), (nb, sp, sp)),
             jnp.broadcast_to(jnp.eye(sp, dtype=dt), (nbp - nb, sp, sp))],
            axis=0)
        Mp = Mp + fix
    T = nbp // lane
    return Mp.reshape(T, lane, sp, s2p).transpose(0, 2, 3, 1), T, sp, s2p


def _from_lanes(out, nb, s, s2):
    T = out.shape[0]
    lane = out.shape[-1]
    return (out.transpose(0, 3, 1, 2)
            .reshape(T * lane, out.shape[1], out.shape[2])[:nb, :s, :s2])


@jax.custom_batching.custom_vmap
def lu_factor_lanes(M: jnp.ndarray):
    """Batched partially-pivoted LU, batch-flat on TPU: (..., s, s) ->
    (tableau (..., s, s), perm (..., s) int32) with unit-L below the
    diagonal, U on/above, and the per-step pivot-row record. See the
    module-section comment for the measured rationale; numerical contract
    identical to scipy's lu_factor per batch element. vmap over leading
    axes flattens into the lane dimension (custom batch rule) instead of
    serializing grid programs."""
    interpret = _interpret_default()
    s = M.shape[-1]
    batch_shape = M.shape[:-2]
    nb = 1
    for dim in batch_shape:
        nb *= dim
    dt = M.dtype
    Mt, T, sp, _ = _to_lanes(M.reshape(nb, s, s), nb, s, dt, LANE, True)
    out, perm = pl.pallas_call(
        functools.partial(_lu_factor_kernel, sp),
        grid=(T,),
        out_shape=(jax.ShapeDtypeStruct(Mt.shape, dt),
                   jax.ShapeDtypeStruct((T, sp, LANE), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.VMEM((sp, sp, LANE), dt),
                        pltpu.VMEM((sp, LANE), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(Mt)
    F = _from_lanes(out, nb, s, s).reshape(*batch_shape, s, s)
    pr = (perm.transpose(0, 2, 1).reshape(T * LANE, sp)[:nb, :s]
          .reshape(*batch_shape, s))
    return F, pr


@lu_factor_lanes.def_vmap
def _lu_factor_lanes_vmap(axis_size, in_batched, M):
    if not in_batched[0]:
        M = jnp.broadcast_to(M[None], (axis_size,) + M.shape)
    return lu_factor_lanes(M), (True, True)


@jax.custom_batching.custom_vmap
def lu_solve_lanes(fac, B: jnp.ndarray) -> jnp.ndarray:
    """Solve the batched pivoted-LU systems from `lu_factor_lanes`:
    fac = (tableau (..., s, s), perm (..., s)), B (..., s, K) -> X with
    (P L U) X = B. The factor tile and permutation stay VMEM-resident
    while the K columns stream through in chunks of 8 (VMEM budget: one
    f32 158-tile is ~13 MB of the ~16 MB core)."""
    F, perm = fac
    interpret = _interpret_default()
    s = F.shape[-1]
    K = B.shape[-1]
    batch_shape = F.shape[:-2]
    nb = 1
    for dim in batch_shape:
        nb *= dim
    dt = F.dtype
    KB = 16
    Ft, T, sp, _ = _to_lanes(F.reshape(nb, s, s), nb, s, dt, LANE, True)
    pf = jnp.pad(perm.reshape(nb, s),
                 ((0, T * LANE - nb), (0, sp - s)))
    if sp > s:
        # padded steps must be identity swaps
        tail = jax.lax.broadcasted_iota(jnp.int32, (T * LANE, sp), 1)
        pf = jnp.where(tail >= s, tail, pf)
    Pt = pf.reshape(T, LANE, sp).transpose(0, 2, 1).astype(jnp.int32)
    Bt, _, _, Kp = _to_lanes(B.reshape(nb, s, K), nb, K, dt, LANE, False)
    Kp = max(_round_up(Kp, KB), KB)
    if Bt.shape[2] < Kp:
        Bt = jnp.pad(Bt, ((0, 0), (0, 0), (0, Kp - Bt.shape[2]), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lu_solve_kernel, sp, KB, interpret),
        grid=(T, Kp // KB),
        out_shape=jax.ShapeDtypeStruct(Bt.shape, dt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((sp, sp, LANE), dt),
                        pltpu.VMEM((sp, LANE), jnp.int32),
                        pltpu.VMEM((sp, KB, LANE), dt),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(Ft, Pt, Bt)
    return _from_lanes(out, nb, s, K).reshape(*batch_shape, s, K)


@lu_solve_lanes.def_vmap
def _lu_solve_lanes_vmap(axis_size, in_batched, fac, B):
    # an unbatched operand (e.g. closure-captured factors under the
    # FGMRES per-column vmap) is broadcast so both flatten into lanes
    # with matching leading dims
    F, perm = fac
    if not jax.tree_util.tree_leaves(in_batched[0])[0]:
        F = jnp.broadcast_to(F[None], (axis_size,) + F.shape)
        perm = jnp.broadcast_to(perm[None], (axis_size,) + perm.shape)
    if not in_batched[1]:
        B = jnp.broadcast_to(B[None], (axis_size,) + B.shape)
    return lu_solve_lanes((F, perm), B), True
