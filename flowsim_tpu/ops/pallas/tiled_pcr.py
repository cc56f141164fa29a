"""Two-level (tiled) Pallas solver for large 2x2-block tridiagonal systems.

The single-block kernel (:mod:`pcr_kernel`) keeps the whole system in VMEM
and caps at N ~ 8k.  The XLA PCR (:func:`flowsim_tpu.ops.tridiag.block_pcr`)
handles any N but round-trips all 14 system rows through HBM on every one of
its ceil(log2 N) sweeps — ~2·14·N·log2(N) floats of HBM traffic.  This module
is the long-reach solver (SURVEY.md §2 preamble: the spsolve replacement, ref
preissmann.py:146): SPIKE substructuring with the per-tile local solves done
by parallel cyclic reduction entirely in VMEM.

    stage A (Pallas, grid over N/T tiles): each tile zeroes its couplings to
        the neighbor tiles, then PCR-solves its local block-tridiagonal
        system for 5 right-hand sides at once — the residual G = A_loc^-1 b
        and the two spike columns V = A_loc^-1 (e_0 L_ext),
        W = A_loc^-1 (e_last U_ext).  One HBM read of the system, one write
        of (G, V, W): the speed-of-light traffic for this solve.
    stage B (XLA): the tile-boundary unknowns satisfy a block-tridiagonal
        *reduced* system of size n_tiles with 4x4 blocks and unit diagonal
        (identical algebra to the distributed SPIKE in
        parallel/domain.py:_spike_solve, just tile-level instead of
        shard-level); solved with a short dense-block Thomas scan.
    stage C (XLA): one fused elementwise pass
        x = G - V x_prev_last - W x_next_first.

f32 only (Mosaic has no f64); padding tiles are identity-diagonal decoupled
rows, so any N is supported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowsim_tpu.ops import tridiag
from flowsim_tpu.ops.pallas import pcr_common

# tile=4096 measured fastest on v5e at N=1e5 and 1e6; 8192 exceeds the 16 MB
# scoped-VMEM limit (the sweep keeps the 24-row buffer plus rolled copies and
# concat temporaries live)
DEFAULT_TILE = 4096
MAX_TILE = 4096

# packed row indices (input):  0-3 L, 4-7 D, 8-11 U, 12-13 b, 14-15 pad
# packed row indices (output): 0-1 G, 2-5 V (cols then rows), 6-9 W, 10-15 pad


def _sweeps(n: int) -> int:
    return max(1, (n - 1).bit_length())


def _tiled_spike_kernel(in_ref, out_ref, *, n_sweeps: int, T: int):
    dtype = in_ref.dtype
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    lane0 = (idx == 0).astype(dtype)
    lanelast = (idx == T - 1).astype(dtype)

    src = in_ref[:]  # [16, T]

    def row(b, r):
        return b[r : r + 1, :]

    # external (inter-tile) couplings of this tile, as [1, 1] slices
    Lx = [src[r : r + 1, 0:1] for r in range(0, 4)]        # L of the first node
    Ux = [src[r : r + 1, T - 1 : T] for r in range(8, 12)]  # U of the last node

    # interior matrix: first node's L and last node's U are zeroed
    rows = []
    for r in range(0, 4):
        rows.append(row(src, r) * (1.0 - lane0))          # L
    for r in range(4, 8):
        rows.append(row(src, r))                           # D
    for r in range(8, 12):
        rows.append(row(src, r) * (1.0 - lanelast))        # U
    # 10 RHS rows: b (2), V seeds = e_0 (x) L_ext columns (4),
    # W seeds = e_last (x) U_ext columns (4)
    rows.append(row(src, 12))                              # g0
    rows.append(row(src, 13))                              # g1
    rows.append(lane0 * Lx[0])                             # V col0 row0 (L00)
    rows.append(lane0 * Lx[2])                             # V col0 row1 (L10)
    rows.append(lane0 * Lx[1])                             # V col1 row0 (L01)
    rows.append(lane0 * Lx[3])                             # V col1 row1 (L11)
    rows.append(lanelast * Ux[0])                          # W col0 row0
    rows.append(lanelast * Ux[2])                          # W col0 row1
    rows.append(lanelast * Ux[1])                          # W col1 row0
    rows.append(lanelast * Ux[3])                          # W col1 row1
    zero = jnp.zeros((1, T), dtype)
    rows.append(zero)
    rows.append(zero)
    buf = jnp.concatenate(rows, axis=0)  # [24, T]

    roll = lambda x, s: pltpu.roll(x, shift=np.int32(s), axis=1)
    buf = pcr_common.pcr_reduce(buf, idx, T, n_sweeps, roll, rhs_pairs=5)
    outs = []
    for x0, x1 in pcr_common.pcr_backsolve(buf, rhs_pairs=5):
        outs.append(x0)
        outs.append(x1)
    for _ in range(6):
        outs.append(zero)
    out_ref[:] = jnp.concatenate(outs, axis=0)  # [16, T]


def _pack_rows(L, D, U, b, Np, dtype):
    N = L.shape[0]

    def comp(X, i, j, pad_val=0.0):
        v = X[:, i, j].astype(dtype)
        return jnp.pad(v, (0, Np - N), constant_values=pad_val)

    rows = [comp(L, 0, 0), comp(L, 0, 1), comp(L, 1, 0), comp(L, 1, 1),
            comp(D, 0, 0, 1.0), comp(D, 0, 1), comp(D, 1, 0), comp(D, 1, 1, 1.0),
            comp(U, 0, 0), comp(U, 0, 1), comp(U, 1, 0), comp(U, 1, 1),
            jnp.pad(b[:, 0].astype(dtype), (0, Np - N)),
            jnp.pad(b[:, 1].astype(dtype), (0, Np - N)),
            jnp.zeros(Np, dtype), jnp.zeros(Np, dtype)]
    return jnp.stack(rows, axis=0)  # [16, Np]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def tiled_spike_pallas(L, D, U, b, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Solve the 2x2-block tridiagonal system (shapes as in ops.tridiag:
    L, D, U [N, 2, 2]; b [N, 2] -> x [N, 2]) for arbitrary N, f32."""
    N = L.shape[0]
    dtype = jnp.float32
    T = int(tile)
    if T > MAX_TILE:
        raise ValueError(f"tile={T} exceeds the VMEM-safe maximum {MAX_TILE}")
    T = min(T, max(128, -(-N // 128) * 128))  # no point tiling beyond N
    n_tiles = -(-N // T)
    Np = n_tiles * T

    packed = _pack_rows(L, D, U, b, Np, dtype)

    kern = functools.partial(_tiled_spike_kernel, n_sweeps=_sweeps(T), T=T)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((16, Np), dtype),
        in_specs=[pl.BlockSpec((16, T), lambda t: (0, t), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, T), lambda t: (0, t), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)

    # unpack per-tile G [nt, T, 2], V [nt, T, 2, 2], W [nt, T, 2, 2]
    def tiles(r):
        return out[r].reshape(n_tiles, T)

    G = jnp.stack([tiles(0), tiles(1)], axis=-1)
    V = jnp.stack(
        [jnp.stack([tiles(2), tiles(4)], axis=-1),   # row 0: cols 0,1
         jnp.stack([tiles(3), tiles(5)], axis=-1)],  # row 1
        axis=-2,
    )
    W = jnp.stack(
        [jnp.stack([tiles(6), tiles(8)], axis=-1),
         jnp.stack([tiles(7), tiles(9)], axis=-1)],
        axis=-2,
    )

    # stage B: reduced system over tile-boundary unknowns y_t = [x_first; x_last]
    Z = jnp.zeros((n_tiles, 2, 2), dtype)
    V0, Vl = V[:, 0], V[:, -1]
    W0, Wl = W[:, 0], W[:, -1]
    Lr = jnp.concatenate(
        [jnp.concatenate([Z, V0], axis=-1), jnp.concatenate([Z, Vl], axis=-1)], axis=-2
    )
    Ur = jnp.concatenate(
        [jnp.concatenate([W0, Z], axis=-1), jnp.concatenate([Wl, Z], axis=-1)], axis=-2
    )
    Dr = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (n_tiles, 4, 4))
    br = jnp.concatenate([G[:, 0], G[:, -1]], axis=-1)
    # sequential scan beats batched-inverse PCR here, measured on v5e:
    # 14.9 ms vs 18.3 ms total at N=1e6/tile=4096 (jnp.linalg.inv lowering
    # dominates the log-depth variant at n_tiles ~ 250)
    y = tridiag.dense_block_thomas(Lr, Dr, Ur, br)  # [n_tiles, 4]

    # stage C: back-substitute with the neighbor boundary values
    x_prev_last = jnp.concatenate([jnp.zeros((1, 2), dtype), y[:-1, 2:4]], axis=0)
    x_next_first = jnp.concatenate([y[1:, 0:2], jnp.zeros((1, 2), dtype)], axis=0)
    x = (G
         - tridiag._mv(V, x_prev_last[:, None, :])
         - tridiag._mv(W, x_next_first[:, None, :]))
    return x.reshape(Np, 2)[:N].astype(b.dtype)
