"""Shared 2x2-block parallel-cyclic-reduction sweep for the Pallas solvers.

One source of truth for the PCR reduction algebra used by three kernels:

* :mod:`pcr_kernel` — whole system in one VMEM block (1 RHS pair),
* :mod:`tiled_pcr` — per-tile SPIKE local solves (5 RHS pairs: residual +
  two 2-column spike blocks),
* :mod:`fused_newton` — the in-simulation solve, optionally with ``B``
  ensemble members stacked on sublanes (every op is elementwise across
  sublanes, so the batched solve is the same vreg program).

Row layout of ``buf`` (each logical row spans ``block`` sublanes):
rows 0-3 L, 4-7 D, 8-11 U (2x2 blocks in row-major scalar components),
then ``2*rhs_pairs`` right-hand-side rows, then any trailing rows (zero
pads for vreg alignment) carried through unchanged.

``roll(x, shift)`` must rotate lanes right by ``shift`` — ``pltpu.roll``
inside a Mosaic kernel (shift as np.int32: a python int traces as i64
under x64, which tpu.dynamic_rotate rejects), ``jnp.roll`` in interpret
mode / eager tests.  Pure jnp ops only, so the same function traces into
any Pallas kernel body or runs eagerly.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv2(d00, d01, d10, d11):
    """Elementwise inverse of a 2x2 block given its scalar components."""
    det = d00 * d11 - d01 * d10
    inv = 1.0 / det
    return d11 * inv, -d01 * inv, -d10 * inv, d00 * inv


def mm2(a0, a1, a2, a3, b0, b1, b2, b3):
    """Elementwise 2x2 @ 2x2 on scalar components."""
    return (a0 * b0 + a1 * b2, a0 * b1 + a1 * b3,
            a2 * b0 + a3 * b2, a2 * b1 + a3 * b3)


def pcr_reduce(buf, idx, n, n_sweeps, roll, rhs_pairs=1, block=1):
    """Run ``n_sweeps`` PCR reduction sweeps on the packed row buffer.

    ``idx`` is the ``[1 or block, lanes]`` lane iota; ``n`` the number of
    valid lanes (out-of-range D neighbors read as identity, others as 0).
    Returns the reduced buffer, where every block row's equation couples
    only to neighbors ``>= 2**n_sweeps`` away (i.e. none, for
    ``n <= 2**n_sweeps``) so the diagonal solve is exact.
    """
    T = buf.shape[1]
    total_rows = buf.shape[0] // block

    def row(b, r):
        return b[r * block:(r + 1) * block, :]

    s = 1
    for _ in range(n_sweeps):
        minus = roll(buf, s)       # lane i reads i-s
        plus = roll(buf, T - s)    # lane i reads i+s
        vm = (idx - s >= 0).astype(buf.dtype)
        vp = (idx + s <= n - 1).astype(buf.dtype)

        def nm(r, identity=0.0, minus=minus, vm=vm):
            return row(minus, r) * vm + (1.0 - vm) * identity

        def np_(r, identity=0.0, plus=plus, vp=vp):
            return row(plus, r) * vp + (1.0 - vp) * identity

        L00, L01, L10, L11 = (row(buf, r) for r in range(0, 4))
        D00, D01, D10, D11 = (row(buf, r) for r in range(4, 8))
        U00, U01, U10, U11 = (row(buf, r) for r in range(8, 12))

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

        # L' = a @ L[i-s];  U' = c @ U[i+s];  D' = D + a @ U[i-s] + c @ L[i+s]
        Ln = mm2(a00, a01, a10, a11, nm(0), nm(1), nm(2), nm(3))
        Un = mm2(c00, c01, c10, c11, np_(8), np_(9), np_(10), np_(11))
        aU = mm2(a00, a01, a10, a11, nm(8), nm(9), nm(10), nm(11))
        cL = mm2(c00, c01, c10, c11, np_(0), np_(1), np_(2), np_(3))
        Dn = (D00 + aU[0] + cL[0], D01 + aU[1] + cL[1],
              D10 + aU[2] + cL[2], D11 + aU[3] + cL[3])

        new_rows = list(Ln) + list(Dn) + list(Un)
        # b' = b + a @ b[i-s] + c @ b[i+s], for every RHS pair
        for rr in range(12, 12 + 2 * rhs_pairs, 2):
            r0, r1 = row(buf, rr), row(buf, rr + 1)
            n0, n1 = nm(rr), nm(rr + 1)
            p0, p1 = np_(rr), np_(rr + 1)
            new_rows.append(r0 + a00 * n0 + a01 * n1 + c00 * p0 + c01 * p1)
            new_rows.append(r1 + a10 * n0 + a11 * n1 + c10 * p0 + c11 * p1)
        for rr in range(12 + 2 * rhs_pairs, total_rows):
            new_rows.append(row(buf, rr))
        buf = jnp.concatenate(new_rows, axis=0)
        s *= 2
    return buf


def pcr_backsolve(buf, rhs_pairs=1, block=1):
    """Diagonal solve of the fully reduced buffer: ``x = inv(D) @ b`` per
    RHS pair.  Returns ``[(x0, x1), ...]`` row pairs."""
    def row(b, r):
        return b[r * block:(r + 1) * block, :]

    i00, i01, i10, i11 = inv2(row(buf, 4), row(buf, 5), row(buf, 6), row(buf, 7))
    outs = []
    for rr in range(12, 12 + 2 * rhs_pairs, 2):
        r0, r1 = row(buf, rr), row(buf, rr + 1)
        outs.append((i00 * r0 + i01 * r1, i10 * r0 + i11 * r1))
    return outs
