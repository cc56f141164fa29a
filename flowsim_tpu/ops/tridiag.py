"""Block-tridiagonal linear solvers (2x2 blocks).

The Preissmann Jacobian with interleaved unknowns ``[h0,Q0,h1,Q1,...]`` and
equation rows ``[US, C0, M0, C1, M1, ..., D]`` (ref: preissmann.py:874-897) is
exactly block tridiagonal when equations are re-grouped per node as
``E_i = [M_{i-1} (or US), C_i (or D)]``:

    L_i x_{i-1} + D_i x_i + U_i x_{i+1} = b_i ,   i = 0..N-1,

with 2x2 blocks, ``L_0 = U_{N-1} = 0``.  The reference factorizes the
2N x 2N sparse matrix with a sequential LU (``spsolve``, ref
preissmann.py:146).  Here:

* :func:`block_thomas` — sequential block LU via ``lax.scan`` (O(N) depth);
  the correctness reference and the best choice for tiny N on CPU (~3x
  faster than PCR at N=121).  CPU-only in practice: the nested
  scan-in-while-in-scan variant reproducibly crashes the TPU worker
  (observed on v5e, jax 0.9) — use PCR on TPU.
* :func:`block_pcr` — parallel cyclic reduction: ceil(log2 N) sweeps of
  elementwise 2x2 algebra over all nodes, each a fused VPU pass.  O(log N)
  depth, the TPU default, identical results to ~1e-12.

Both are batch-friendly (leading batch dims broadcast) and differentiable.
All 2x2 inverses are closed form; the PCR paths apply a tiny-pivot guard by
default (:data:`PIVOT_EPS`) so a singular system yields large-but-finite
deltas instead of inf/NaN; :func:`block_pcr_diag` additionally returns an
in-graph reciprocal-condition proxy mirroring the reference's ``diagnos``
rcond check (ref preissmann.py:139-144).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Default tiny-pivot guard for the closed-form 2x2 inverses.  Healthy pivot
# determinants in this application are O(1) and the guard only replaces a
# determinant whose magnitude is <= eps, so results on well-conditioned
# systems are bitwise unchanged; a singular pivot gives a finite delta.
PIVOT_EPS = {jnp.dtype(jnp.float32): 1e-30, jnp.dtype(jnp.float64): 1e-250}


def _default_eps(dtype) -> float:
    return PIVOT_EPS.get(jnp.dtype(dtype), 1e-30)


def _inv2(M, eps=0.0):
    """Closed-form inverse of [..., 2, 2] blocks."""
    a = M[..., 0, 0]
    b = M[..., 0, 1]
    c = M[..., 1, 0]
    d = M[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) > eps, det, jnp.where(det >= 0, eps, -eps)) if eps else det
    inv_det = 1.0 / det
    return jnp.stack(
        [
            jnp.stack([d * inv_det, -b * inv_det], axis=-1),
            jnp.stack([-c * inv_det, a * inv_det], axis=-1),
        ],
        axis=-2,
    )


def _mm(A, B):
    """[..., 2, 2] @ [..., 2, 2] without einsum (keeps VPU-friendly)."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    A[..., 0, 0] * B[..., 0, 0] + A[..., 0, 1] * B[..., 1, 0],
                    A[..., 0, 0] * B[..., 0, 1] + A[..., 0, 1] * B[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    A[..., 1, 0] * B[..., 0, 0] + A[..., 1, 1] * B[..., 1, 0],
                    A[..., 1, 0] * B[..., 0, 1] + A[..., 1, 1] * B[..., 1, 1],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def _mv(A, x):
    """[..., 2, 2] @ [..., 2]"""
    return jnp.stack(
        [
            A[..., 0, 0] * x[..., 0] + A[..., 0, 1] * x[..., 1],
            A[..., 1, 0] * x[..., 0] + A[..., 1, 1] * x[..., 1],
        ],
        axis=-1,
    )


def _mvm(A, X):
    """[..., 2, 2] @ [..., 2, m] — multi-RHS matvec (broadcast over columns)."""
    return jnp.stack(
        [
            A[..., 0, 0, None] * X[..., 0, :] + A[..., 0, 1, None] * X[..., 1, :],
            A[..., 1, 0, None] * X[..., 0, :] + A[..., 1, 1, None] * X[..., 1, :],
        ],
        axis=-2,
    )


def block_thomas(L, D, U, b):
    """Sequential block-Thomas solve along axis -3 (the node axis).

    Shapes: L, D, U: [..., N, 2, 2]; b: [..., N, 2] (vector RHS) or
    [..., N, 2, m] (multi-RHS — one forward/backward sweep shared across the
    m columns).  Batch dims must lead; the scan runs over N.
    """
    multi = b.ndim == L.ndim  # [..., N, 2, m]
    b_mat = b if multi else b[..., None]
    # move node axis to front for scan
    L_ = jnp.moveaxis(L, -3, 0)
    D_ = jnp.moveaxis(D, -3, 0)
    U_ = jnp.moveaxis(U, -3, 0)
    b_ = jnp.moveaxis(b_mat, -3, 0)

    def fwd(carry, inp):
        Cprev, dprev = carry  # C_{i-1} = Dhat_{i-1}^{-1} U_{i-1}, dhat_{i-1}
        Li, Di, Ui, bi = inp
        Dhat = Di - _mm(Li, Cprev)
        Dhat_inv = _inv2(Dhat)
        Ci = _mm(Dhat_inv, Ui)
        di = _mvm(Dhat_inv, bi - _mvm(Li, dprev))
        return (Ci, di), (Ci, di)

    zeros_C = jnp.zeros_like(D_[0])
    zeros_d = jnp.zeros_like(b_[0])
    (_, _), (C, d) = jax.lax.scan(fwd, (zeros_C, zeros_d), (L_, D_, U_, b_))

    def bwd(x_next, inp):
        Ci, di = inp
        xi = di - _mvm(Ci, x_next)
        return xi, xi

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(b_[0]), (C, d), reverse=True)
    out = jnp.moveaxis(xs, 0, -3)
    return out if multi else out[..., 0]


def block_thomas_factor(L, D, U):
    """Forward block-LU sweep; returns reusable factors (C, Dhat_inv).

    With C_i = Dhat_i^{-1} U_i and Dhat_i = D_i - L_i C_{i-1}, a later RHS is
    solved by d_i = Dhat_i^{-1} (b_i - L_i d_{i-1}) then back-substitution —
    the factorization is shared across multiple right-hand sides (used by the
    SPIKE domain-decomposed solve, which needs 5 RHS per local system).
    """
    L_ = jnp.moveaxis(L, -3, 0)
    D_ = jnp.moveaxis(D, -3, 0)
    U_ = jnp.moveaxis(U, -3, 0)

    def fwd(Cprev, inp):
        Li, Di, Ui = inp
        Dhat_inv = _inv2(Di - _mm(Li, Cprev))
        Ci = _mm(Dhat_inv, Ui)
        return Ci, (Ci, Dhat_inv)

    _, (C, Dhat_inv) = jax.lax.scan(fwd, jnp.zeros_like(D_[0]), (L_, D_, U_))
    return C, Dhat_inv, L_


def block_thomas_apply(factor, b):
    """Solve with a precomputed factorization.

    ``b``: vector RHS ``[N, 2]`` (optionally with leading batch axes
    ``[..., N, 2]``), or multi-RHS ``[N, 2, m]`` (trailing column axis).
    The ambiguous ``[2, 2, 2]`` shape is read as multi-RHS.
    """
    C, Dhat_inv, L_ = factor
    N = C.shape[0]
    if b.ndim == 2:  # vector RHS [N, 2]
        b_ = jnp.moveaxis(b, -2, 0)

        def fwd(dprev, inp):
            Dinv, Li, bi = inp
            di = _mv(Dinv, bi - _mv(Li, dprev))
            return di, di

        _, d = jax.lax.scan(fwd, jnp.zeros_like(b_[0]), (Dhat_inv, L_, b_))

        def bwd(x_next, inp):
            Ci, di = inp
            xi = di - _mv(Ci, x_next)
            return xi, xi

        _, xs = jax.lax.scan(bwd, jnp.zeros_like(b_[0]), (C, d), reverse=True)
        return jnp.moveaxis(xs, 0, -2)
    if b.shape[-3] == N and b.shape[-2] == 2:
        # multi-RHS [..., N, 2, m]: vmap over the trailing column axis
        return jax.vmap(lambda col: block_thomas_apply(factor, col),
                        in_axes=-1, out_axes=-1)(b)
    if b.shape[-2] == N and b.shape[-1] == 2:
        # leading batch axes over vector RHS — previously misrouted into the
        # multi-RHS branch (batch read as the node axis: shape error, or
        # silently wrong answers when B == N)
        flat = b.reshape((-1,) + b.shape[-2:])
        out = jax.vmap(lambda bb: block_thomas_apply(factor, bb))(flat)
        return out.reshape(b.shape)
    raise ValueError(
        f"RHS shape {b.shape} matches neither [..., {N}, 2] nor "
        f"[..., {N}, 2, m]")


def _shift(arr, s, node_axis):
    """arr shifted so index i reads i+s; out-of-range rows give zeros."""
    N = arr.shape[node_axis]
    if s == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    if s > 0:
        pad[node_axis] = (0, s)
        padded = jnp.pad(arr, pad)
        sl = [slice(None)] * arr.ndim
        sl[node_axis] = slice(s, s + N)
        return padded[tuple(sl)]
    else:
        pad[node_axis] = (-s, 0)
        padded = jnp.pad(arr, pad)
        sl = [slice(None)] * arr.ndim
        sl[node_axis] = slice(0, N)
        return padded[tuple(sl)]


def _pcr_core(L, D, U, b, pivot_eps: float | None = None):
    """Parallel cyclic reduction over 2x2 blocks.

    Each sweep eliminates the couplings at the current stride: with
    ``a = -L_i D_{i-s}^{-1}`` and ``c = -U_i D_{i+s}^{-1}``,

        L' = a L_{i-s},  U' = c U_{i+s},
        D' = D + a U_{i-s} + c L_{i+s},
        b' = b + a b_{i-s} + c b_{i+s}.

    Out-of-range neighbours are identity-diagonal/zero rows, so the update is
    a no-op there.  After ceil(log2 N) sweeps the system is block diagonal.

    Complexity: O(N log N) work but O(log N) depth — each sweep is one fused
    elementwise pass, which is how a TPU wants to see this solve (vs the
    O(N)-depth scalar dependency chain of Thomas/spsolve).

    ``pivot_eps=None`` selects the dtype default (:data:`PIVOT_EPS`); pass
    ``0.0`` to disable the guard entirely.

    ``b`` may be a vector RHS [..., N, 2] or multi-RHS [..., N, 2, m]; the
    (RHS-independent) block reductions are shared across the m columns.
    """
    if pivot_eps is None:
        pivot_eps = _default_eps(D.dtype)
    N = L.shape[-3]
    node_axis = L.ndim - 3

    multi = b.ndim == L.ndim  # [..., N, 2, m]
    b_mat = b if multi else b[..., None]

    eye = jnp.broadcast_to(jnp.eye(2, dtype=D.dtype), D.shape)

    def pad_neighbor_blocks(X, s):
        return _shift(X, s, node_axis)

    def pad_neighbor_D(Dm, s):
        # out-of-range neighbour D must be invertible: use identity there
        shifted = _shift(Dm, s, node_axis)
        idx = jnp.arange(N) + s
        valid = (idx >= 0) & (idx < N)
        shape = [1] * Dm.ndim
        shape[node_axis] = N
        valid = valid.reshape(shape)
        return jnp.where(valid, shifted, eye)

    s = 1
    # N = L.shape[-3] is always a concrete Python int under jit
    n_sweeps = max(1, (N - 1).bit_length())
    for _ in range(n_sweeps):
        Dm = pad_neighbor_D(D, -s)
        Dp = pad_neighbor_D(D, +s)
        a = -_mm(L, _inv2(Dm, pivot_eps))
        c = -_mm(U, _inv2(Dp, pivot_eps))
        L_new = _mm(a, pad_neighbor_blocks(L, -s))
        U_new = _mm(c, pad_neighbor_blocks(U, +s))
        D_new = D + _mm(a, pad_neighbor_blocks(U, -s)) + _mm(c, pad_neighbor_blocks(L, +s))
        b_new = b_mat + _mvm(a, _shift(b_mat, -s, node_axis)) + _mvm(c, _shift(b_mat, +s, node_axis))
        L, D, U, b_mat = L_new, D_new, U_new, b_new
        s *= 2

    x = _mvm(_inv2(D, pivot_eps), b_mat)
    return (x if multi else x[..., 0]), D


def block_pcr(L, D, U, b, pivot_eps: float | None = None):
    """Parallel cyclic reduction solve (see :func:`_pcr_core`)."""
    x, _ = _pcr_core(L, D, U, b, pivot_eps)
    return x


def _rel_pivot_det(D):
    """|det| of each 2x2 pivot relative to its entry scale, [..., N]."""
    a = D[..., 0, 0]
    b_ = D[..., 0, 1]
    c = D[..., 1, 0]
    d = D[..., 1, 1]
    det = a * d - b_ * c
    scale = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b_)),
                        jnp.maximum(jnp.abs(c), jnp.abs(d)))
    tiny = jnp.asarray(jnp.finfo(D.dtype).tiny, D.dtype)
    return jnp.abs(det) / jnp.maximum(scale * scale, tiny)


def block_pcr_diag(L, D, U, b, pivot_eps: float | None = None):
    """PCR solve plus an in-graph reciprocal-condition proxy.

    Returns ``(x, rcond)`` where ``rcond`` is the minimum over the *final*
    (fully decoupled) PCR pivots of ``|det| / scale^2`` — a cheap analog of
    the reference's ``splu(...).rcond < 1e-12`` ill-conditioning check
    (ref preissmann.py:139-144): a (near-)singular global matrix collapses at
    least one final pivot determinant toward zero.
    """
    x, D_final = _pcr_core(L, D, U, b, pivot_eps)
    rcond = jnp.min(_rel_pivot_det(D_final), axis=-1)
    return x, rcond


def dense_block_thomas(L, D, U, b):
    """Sequential Thomas solve with dense m x m blocks via ``lax.scan``.

    Shapes: L, D, U [S, m, m]; b [S, m].  Used for the tiny *reduced* systems
    of the SPIKE substructuring (S = number of shards/tiles, m = 4), where a
    sequential scan of small dense solves is cheap and exact.
    """
    m = D.shape[-1]

    def fwd(carry, inp):
        Cprev, dprev = carry
        Li, Di, Ui, bi = inp
        Dh = Di - Li @ Cprev
        Ci = jnp.linalg.solve(Dh, Ui)
        di = jnp.linalg.solve(Dh, bi - Li @ dprev)
        return (Ci, di), (Ci, di)

    (_, _), (C, d) = jax.lax.scan(
        fwd, (jnp.zeros((m, m), D.dtype), jnp.zeros((m,), D.dtype)), (L, D, U, b)
    )

    def bwd(x_next, inp):
        Ci, di = inp
        xi = di - Ci @ x_next
        return xi, xi

    _, x = jax.lax.scan(bwd, jnp.zeros((m,), D.dtype), (C, d), reverse=True)
    return x


def interleave_to_blocks(A):
    """Inverse of :func:`blocks_to_dense`: split a dense 2N x 2N banded
    matrix into its (L, D, U) 2x2 block diagonals (tests / diagnostics)."""
    twoN = A.shape[-1]
    if A.shape[-2] != twoN or twoN % 2:
        raise ValueError("expected a square 2N x 2N matrix")
    N = twoN // 2
    A4 = A.reshape(*A.shape[:-2], N, 2, N, 2)
    A4 = jnp.swapaxes(A4, -3, -2)  # [..., N(row), N(col), 2, 2]
    idx = jnp.arange(N)
    D = A4[..., idx, idx, :, :]
    L = jnp.zeros_like(D)
    U = jnp.zeros_like(D)
    if N > 1:
        L = L.at[..., 1:, :, :].set(A4[..., idx[1:], idx[:-1], :, :])
        U = U.at[..., :-1, :, :].set(A4[..., idx[:-1], idx[1:], :, :])
    return L, D, U


def blocks_to_dense(L, D, U):
    """Assemble the dense 2N x 2N matrix from block-tridiagonal form (tests)."""
    N = L.shape[0]
    A = jnp.zeros((2 * N, 2 * N), dtype=D.dtype)
    for i in range(N):
        A = A.at[2 * i : 2 * i + 2, 2 * i : 2 * i + 2].set(D[i])
        if i > 0:
            A = A.at[2 * i : 2 * i + 2, 2 * i - 2 : 2 * i].set(L[i])
        if i < N - 1:
            A = A.at[2 * i : 2 * i + 2, 2 * i + 2 : 2 * i + 4].set(U[i])
    return A


@partial(jax.jit, static_argnames=("method",))
def solve_block_tridiag(L, D, U, b, method: str = "pcr"):
    """Solve the 2x2 block-tridiagonal system.

    ``b``: [..., N, 2] vector RHS, or [..., N, 2, m] multi-RHS (thomas /
    pcr / pcr_f32 share the reduction work across the m columns; the pallas
    kernels solve the columns independently).
    """
    if b.ndim == L.ndim and method in ("pallas_pcr", "pallas_tiled"):
        return jax.vmap(
            lambda col: solve_block_tridiag(L, D, U, col, method=method),
            in_axes=-1, out_axes=-1)(b)
    if method == "thomas":
        return block_thomas(L, D, U, b)
    elif method == "pcr":
        return block_pcr(L, D, U, b)
    elif method == "pcr_f32":
        # inexact-Newton inner solve: the increment only needs a few correct
        # digits for Newton to keep its convergence behavior (measured on the
        # flagship: identical 4803 iterations at tol 1e-6 on the f64
        # residual), and f32 PCR is much cheaper than emulated-f64 on TPU.
        x = block_pcr(L.astype(jnp.float32), D.astype(jnp.float32),
                      U.astype(jnp.float32), b.astype(jnp.float32))
        return x.astype(b.dtype)
    elif method == "pallas_pcr":
        # single-VMEM-block TPU kernel (f32); result cast back to b's dtype
        from flowsim_tpu.ops.pallas.pcr_kernel import pcr_pallas

        return pcr_pallas(L, D, U, b).astype(b.dtype)
    elif method == "pallas_tiled":
        # two-level SPIKE kernel (f32): in-VMEM PCR per tile + reduced
        # inter-tile system; any N (the long-reach solver)
        from flowsim_tpu.ops.pallas.tiled_pcr import tiled_spike_pallas

        return tiled_spike_pallas(L, D, U, b).astype(b.dtype)
    raise ValueError(f"unknown method {method!r}")
