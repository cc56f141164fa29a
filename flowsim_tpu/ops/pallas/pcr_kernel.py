"""Pallas TPU kernel: in-VMEM parallel cyclic reduction for 2x2-block
tridiagonal systems.

The XLA PCR in :mod:`flowsim_tpu.ops.tridiag` round-trips the (L, D, U, b)
arrays through HBM between reduction sweeps.  For systems that fit on-chip
(N up to ~32k nodes) this kernel keeps the whole system in VMEM across all
ceil(log2 N) sweeps: one HBM read of the inputs, one write of the solution —
the speed-of-light data movement for this solve.

Layout: the 14 scalar components (4 L, 4 D, 4 U, 2 b) are rows of a
[16, N] array (node axis on lanes); neighbor access at stride s is a lane
roll + validity mask, out-of-range D neighbors read as identity.

f32 only (Mosaic has no f64); callers needing f64 use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Validated on hardware: N=8192 compiles and matches XLA PCR; N=32768 OOMs
# scoped VMEM (the sweep keeps buf + two rolled copies + concat temporaries
# live, ~30 MB at 32k).  Larger N needs a two-level (tiled) variant.
MAX_VMEM_N = 8192


def _sweeps(n: int) -> int:
    return max(1, (n - 1).bit_length())


def _pcr_kernel(in_ref, out_ref, *, n_sweeps: int, n: int):
    buf = in_ref[:]  # [16, N]
    N = buf.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    def row(b, r):
        return b[r : r + 1, :]  # [1, N]

    def inv2(d00, d01, d10, d11):
        det = d00 * d11 - d01 * d10
        inv = 1.0 / det
        return d11 * inv, -d01 * inv, -d10 * inv, d00 * inv

    s = 1
    for _ in range(n_sweeps):
        # np.int32: under x64 a python-int shift traces as i64, which
        # Mosaic's tpu.dynamic_rotate rejects (must be 32-bit)
        minus = pltpu.roll(buf, shift=np.int32(s), axis=1)     # i reads i-s
        plus = pltpu.roll(buf, shift=np.int32(N - s), axis=1)  # i reads i+s
        vm = (idx - s >= 0).astype(buf.dtype)
        vp = (idx + s <= n - 1).astype(buf.dtype)

        def nm(r, identity=0.0):
            v = row(minus, r) * vm
            return v + (1.0 - vm) * identity

        def np_(r, identity=0.0):
            v = row(plus, r) * vp
            return v + (1.0 - vp) * identity

        L00, L01, L10, L11 = (row(buf, r) for r in range(0, 4))
        D00, D01, D10, D11 = (row(buf, r) for r in range(4, 8))
        U00, U01, U10, U11 = (row(buf, r) for r in range(8, 12))
        b0, b1 = row(buf, 12), row(buf, 13)

        # inverse of D at i-s (identity off the edge) and i+s
        mi00, mi01, mi10, mi11 = inv2(nm(4, 1.0), nm(5), nm(6), nm(7, 1.0))
        pi00, pi01, pi10, pi11 = inv2(np_(4, 1.0), np_(5), np_(6), np_(7, 1.0))

        # a = -L @ inv(D[i-s]);  c = -U @ inv(D[i+s])
        a00 = -(L00 * mi00 + L01 * mi10)
        a01 = -(L00 * mi01 + L01 * mi11)
        a10 = -(L10 * mi00 + L11 * mi10)
        a11 = -(L10 * mi01 + L11 * mi11)
        c00 = -(U00 * pi00 + U01 * pi10)
        c01 = -(U00 * pi01 + U01 * pi11)
        c10 = -(U10 * pi00 + U11 * pi10)
        c11 = -(U10 * pi01 + U11 * pi11)

        def mm(a0, a1, a2, a3, b0_, b1_, b2_, b3_):
            return (a0 * b0_ + a1 * b2_, a0 * b1_ + a1 * b3_,
                    a2 * b0_ + a3 * b2_, a2 * b1_ + a3 * b3_)

        # L' = a @ L[i-s] ; U' = c @ U[i+s]
        Ln = mm(a00, a01, a10, a11, nm(0), nm(1), nm(2), nm(3))
        Un = mm(c00, c01, c10, c11, np_(8), np_(9), np_(10), np_(11))
        # D' = D + a @ U[i-s] + c @ L[i+s]
        aU = mm(a00, a01, a10, a11, nm(8), nm(9), nm(10), nm(11))
        cL = mm(c00, c01, c10, c11, np_(0), np_(1), np_(2), np_(3))
        Dn = (D00 + aU[0] + cL[0], D01 + aU[1] + cL[1],
              D10 + aU[2] + cL[2], D11 + aU[3] + cL[3])
        # b' = b + a @ b[i-s] + c @ b[i+s]
        bn0 = b0 + a00 * nm(12) + a01 * nm(13) + c00 * np_(12) + c01 * np_(13)
        bn1 = b1 + a10 * nm(12) + a11 * nm(13) + c10 * np_(12) + c11 * np_(13)

        buf = jnp.concatenate(
            [Ln[0], Ln[1], Ln[2], Ln[3],
             Dn[0], Dn[1], Dn[2], Dn[3],
             Un[0], Un[1], Un[2], Un[3],
             bn0, bn1, row(buf, 14), row(buf, 15)],
            axis=0,
        )
        s *= 2

    D00, D01, D10, D11 = (row(buf, r) for r in range(4, 8))
    b0, b1 = row(buf, 12), row(buf, 13)
    i00, i01, i10, i11 = inv2(D00, D01, D10, D11)
    x0 = i00 * b0 + i01 * b1
    x1 = i10 * b0 + i11 * b1
    out_ref[:] = jnp.concatenate([x0, x1], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pcr_pallas(L, D, U, b, interpret: bool = False):
    """Solve the block-tridiagonal system fully in VMEM (f32, N <= 32k).

    Shapes as in ops.tridiag: L, D, U [N, 2, 2]; b [N, 2] -> x [N, 2].
    Padding rows are identity-diagonal decoupled equations.
    """
    N = L.shape[0]
    if N > MAX_VMEM_N:
        raise ValueError(f"N={N} exceeds the single-block VMEM kernel limit {MAX_VMEM_N}")
    dtype = jnp.float32
    Np = max(128, -(-N // 128) * 128)

    def comp(X, i, j):
        v = X[:, i, j].astype(dtype)
        return jnp.pad(v, (0, Np - N))

    rows = [comp(L, 0, 0), comp(L, 0, 1), comp(L, 1, 0), comp(L, 1, 1),
            jnp.pad(D[:, 0, 0].astype(dtype), (0, Np - N), constant_values=1.0),
            comp(D, 0, 1), comp(D, 1, 0),
            jnp.pad(D[:, 1, 1].astype(dtype), (0, Np - N), constant_values=1.0),
            comp(U, 0, 0), comp(U, 0, 1), comp(U, 1, 0), comp(U, 1, 1),
            jnp.pad(b[:, 0].astype(dtype), (0, Np - N)),
            jnp.pad(b[:, 1].astype(dtype), (0, Np - N)),
            jnp.zeros(Np, dtype), jnp.zeros(Np, dtype)]
    packed = jnp.stack(rows, axis=0)  # [16, Np]

    kern = functools.partial(_pcr_kernel, n_sweeps=_sweeps(N), n=N)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, Np), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)
    return jnp.stack([out[0, :N], out[1, :N]], axis=-1)
