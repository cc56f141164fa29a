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

from flowsim_tpu.ops.pallas import pcr_common

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
    # np.int32: under x64 a python-int shift traces as i64, which Mosaic's
    # tpu.dynamic_rotate rejects (must be 32-bit)
    roll = lambda x, s: pltpu.roll(x, shift=np.int32(s), axis=1)
    buf = pcr_common.pcr_reduce(buf, idx, n, n_sweeps, roll, rhs_pairs=1)
    ((x0, x1),) = pcr_common.pcr_backsolve(buf, rhs_pairs=1)
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
