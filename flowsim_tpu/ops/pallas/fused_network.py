"""Fused whole-simulation Pallas kernel for river networks.

One ``pallas_call`` runs the ENTIRE network simulation — the level loop,
each level's network-wide Newton iteration, every branch's residual/
Jacobian stencil, the batched multi-RHS block-PCR branch solves, and the
dense junction Schur solve — with all state resident in VMEM/registers.
This is the network counterpart of :mod:`fused_newton` (whose single-reach
kernel removed the ~70 us/iteration XLA dispatch overhead at flagship
size); the XLA network path pays the same per-iteration overhead ~B-fold
(BASELINE.md: GERD tributary 0.458 s on v5e, dispatch-bound).

Structure (mirrors the stacked XLA engine, ops/network.py:
``_simulate_network_stacked``, which is pinned against the loop engine and
the single-reach solver by tests/test_network.py):

* branches ride the VPU **sublane** axis exactly like ensemble members in
  ``_kernel_batched`` — every branch edge-padded to the longest length
  Nmax, pad cells carrying delta-copy equations so each branch's real end
  mirrors at the uniform lane Nmax-1;
* junction ends override the external boundary rows with equal-stage rows
  (``_assemble_fused(..., junc=...)``);
* the per-branch systems are solved once with ``1 + max_couplings`` RHS
  pairs (the Newton RHS plus one constant ``-1`` column per junction
  coupling — :mod:`pcr_common` supports any ``rhs_pairs``);
* the J x J junction Schur system is assembled from static index maps
  (unrolled one-hot scatter/gathers on [Jp, 1] sublane columns — no
  transposes, no dynamic indexing) and solved by an unrolled in-register
  Gauss-Jordan elimination (J static);
* junction stages live as a df32 ``[Jp, 1]`` sublane column; the signed
  end-discharge sums (whose cancellation IS the convergence signal) are
  accumulated in df32.

Precision design is inherited from fused_newton: df32 residuals, f32
Jacobian + PCR + Schur solve (inexact Newton — the XLA ``pcr_f32`` network
path converges with iteration counts identical to full f64, BASELINE.md).

Scope (v3): TrapezoidGeometry AND TableGeometry branches (mixed networks
evaluate both closures per sublane and select — each branch's physics
matches the XLA engines exactly, so iteration-count parity holds; the
per-branch lookup tables must share one depth-grid resolution M and their
_NT * (M + 8-16) * B * Np f32 rows must fit the VMEM budget alongside the
working set, which bounds M to ~100 at flagship branch sizes — rebuild
tables with a coarser grid or fall back to the XLA engines beyond that),
plain junctions AND junction reservoirs (0-D storage at a junction,
trapezoidal mass balance — ref lumped_storage.py:24-35 applied at a
multi-branch node) with optional rated outflow (polynomial /
arbitrary-degree poly_n with its analytic derivative / blended_poly
release curves, ops/network.py:_junction_residuals),
constant AND time-varying [nt, N] lateral inflow (per-level
theta-weighted cell averages precomputed on the host),
``newton="while"``, and per-branch external BC kinds — ALL the kinds
fused_newton supports, including the gated controller and BOTH lumped
storage forms (constant-area and generalized curve/rating/loss storage,
the latter via per-branch stage-grid tables evaluated per sublane —
one storage end per branch).  Everything else falls back to the XLA
engines via
:class:`~flowsim_tpu.ops.pallas.fused_newton.FusedUnsupported`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowsim_tpu.ops.pallas import df32, pcr_common
from flowsim_tpu.ops.pallas.df32 import DF, df
from flowsim_tpu.ops.pallas import fused_newton as fn
from flowsim_tpu.ops.pallas.fused_newton import (
    _NG, _NS, _S_DT, _S_DX, _S_THETA, _S_TOL, _S_ZERO, _S_DSBED,
    FusedUnsupported, _LevelStreamer, _assemble_fused, _level_state,
    _out_scratch_shapes, _pack_init, _pack_trap_rows, _pack_us_series,
    _pack_ds_config, _pack_us_config, _roll, _split64)


def _sub_sum(x):
    """Sum a small [B, 1] column across sublanes -> [1, 1] (unrolled static
    adds: portable across Mosaic and interpret mode)."""
    acc = x[0:1, :]
    for i in range(1, x.shape[0]):
        acc = acc + x[i:i + 1, :]
    return acc


# junction-config rows of the ``jin`` input (each a [Jp, 128] block whose
# lane-0 column carries the per-junction value): df32 initial stages, then
# the junction-reservoir area and rated-outflow coefficients (low/high
# quadratics in the offset stage x = Y + xoff; polynomial ratings pack
# high = low and bufsafe = 1e-30 so the smoothstep saturates to alpha = 1
# and the blend collapses to the plain quadratic)
_J_YHI, _J_YLO, _J_AREA, _J_C2, _J_C1, _J_C0, _J_D2, _J_D1, _J_D0, \
    _J_XOFF, _J_BUFS, _J_FD = range(12)
_NJ = 12


def _make_jrate(jrow, has_jrate, deg=2, has_jpow=False, jtab_T=0):
    """Rated-outflow closures on junction sublane columns, shared by the
    single and batched network kernels (``jrow`` views the jin input —
    [Jp, 1] or [J*Mp, 1] columns; every op is elementwise across sublanes).

    ``jrate_q``: df32 q(Y) per junction (ops/rating_curve.py ``discharge``
    for polynomial/poly_n/blended_poly, delta-form blend; the smoothstep
    mirrors ``_rating_q``'s df32 form).  ``jrate_dq``: f32 dq/dY — central
    difference (exact for the quadratics at fd=1; blended curves mirror
    rcurve.dQ_dz's fd_step FD) or, on junctions whose fd column is the
    0.0 sentinel (poly_n), the analytic derivative polynomial (matching
    rcurve.dQ_dz's jnp.polyval exactly).

    ``deg``: static maximum polynomial degree across junctions.  deg == 2
    reads the fixed quadratic rows (byte-identical math to v2); deg > 2
    reads descending-coefficient blocks appended after the _NJ base rows:
    low (deg+1), high (deg+1), d(low)/dY (deg).
    """
    if has_jrate:
        if deg == 2:
            j_c = (jrow(_J_C2), jrow(_J_C1), jrow(_J_C0))
            j_d = (jrow(_J_D2), jrow(_J_D1), jrow(_J_D0))
            j_dc = None
            base = _NJ
        else:
            j_c = tuple(jrow(_NJ + i) for i in range(deg + 1))
            j_d = tuple(jrow(_NJ + (deg + 1) + i) for i in range(deg + 1))
            j_dc = tuple(jrow(_NJ + 2 * (deg + 1) + i) for i in range(deg))
            base = _NJ + 2 * (deg + 1) + deg
        j_xoff, j_bufs, j_fd = jrow(_J_XOFF), jrow(_J_BUFS), jrow(_J_FD)
        # round-5 kinds: power (df32 a x^b via exp/log, exact) and table
        # (the user's OWN breakpoints, per-segment masked eval — matches
        # jnp.interp incl. the end clamps, ops/rating_curve.py:239)
        if has_jpow:
            p_a = DF(jrow(base), jrow(base + 1))
            p_b = DF(jrow(base + 2), jrow(base + 3))
            # split stage shift: the shared _J_XOFF row is f32-only, whose
            # ~1e-7 relative error in x would floor the power residual at
            # q * b * 1e-7 — above tol for large releases
            p_xoff = DF(jrow(base + 4), jrow(base + 5))
            p_sel = jrow(base + 6)
            base += 7
        if jtab_T:
            t_sel = jrow(base)
            trows = [tuple(jrow(base + 1 + 6 * i + f) for f in range(6))
                     for i in range(jtab_T)]

        def _tab_s(i):
            return DF(trows[i][0], trows[i][1])

        def _tab_q(i):
            return DF(trows[i][2], trows[i][3])

        def _tab_m(i):
            return DF(trows[i][4], trows[i][5])

        def _table_q_df(Y: DF) -> DF:
            acc = DF(Y.hi * 0.0, Y.hi * 0.0)
            for i in range(jtab_T - 1):
                mask = ((Y.hi >= trows[i][0])
                        & (Y.hi < trows[i + 1][0])).astype(jnp.float32)
                seg = _tab_q(i) + (Y - _tab_s(i)) * _tab_m(i)
                acc = DF(acc.hi + mask * seg.hi, acc.lo + mask * seg.lo)
            acc = df32.where(Y.hi < trows[0][0], _tab_q(0), acc)
            acc = df32.where(Y.hi >= trows[jtab_T - 1][0],
                             _tab_q(jtab_T - 1), acc)
            return acc

        def _table_q32(yv):
            acc = yv * 0.0
            for i in range(jtab_T - 1):
                mask = ((yv >= trows[i][0])
                        & (yv < trows[i + 1][0])).astype(jnp.float32)
                acc = acc + mask * (trows[i][2]
                                    + (yv - trows[i][0]) * trows[i][4])
            acc = jnp.where(yv < trows[0][0], trows[0][2], acc)
            acc = jnp.where(yv >= trows[jtab_T - 1][0],
                            trows[jtab_T - 1][2], acc)
            return acc

    def horner_df(cs, x: DF) -> DF:
        acc = df(cs[0]) * x + df(cs[1])
        for c in cs[2:]:
            acc = acc * x + df(c)
        return acc

    def horner32(cs, xv):
        acc = cs[0] * xv + cs[1]
        for c in cs[2:]:
            acc = acc * xv + c
        return acc

    def jrate_q(Y: DF) -> DF:
        if not has_jrate:
            return DF(Y.hi * 0.0, Y.hi * 0.0)
        x = Y + df(j_xoff)
        low = horner_df(j_c, x)
        high = horner_df(j_d, x)
        s = x / df(j_bufs)
        zero = df(Y.hi * 0.0)
        one = df(jnp.ones_like(Y.hi))
        s = df32.where(s.hi < 0.0, zero, df32.where(s.hi > 1.0, one, s))
        alpha = s * s * (df(3.0) - df(2.0) * s)
        q = low + alpha * (high - low)
        if has_jpow:
            qp = p_a * df32.powf(Y + p_xoff, p_b)
            q = df32.where(p_sel > 0.5, qp, q)
        if jtab_T:
            q = df32.where(t_sel > 0.5, _table_q_df(Y), q)
        return q

    def jrate_dq(Y: DF):
        if not has_jrate:
            return None

        def q32(xv):
            lo = horner32(j_c, xv)
            hi = horner32(j_d, xv)
            s = jnp.clip(xv / j_bufs, 0.0, 1.0)
            a = s * s * (3.0 - 2.0 * s)
            return lo + a * (hi - lo)

        xv = Y.value + j_xoff
        fd_safe = jnp.maximum(j_fd, np.float32(1e-30))
        dq = (q32(xv + fd_safe) - q32(xv - fd_safe)) / (2.0 * fd_safe)
        if j_dc is not None:
            # fd == 0 sentinel: analytic derivative (poly_n junctions)
            dq = jnp.where(j_fd > 0.0, dq, horner32(j_dc, xv))
        if has_jpow:
            # analytic a b x^(b-1) = q b / x (ops/rating_curve.py:266-268)
            xv_p = Y.value + (p_xoff.hi + p_xoff.lo)
            xs = jnp.maximum(xv_p, np.float32(1e-12))
            qp32 = ((p_a.hi + p_a.lo)
                    * jnp.exp(p_b.hi * jnp.log(xs)))
            dq = jnp.where(p_sel > 0.5, qp32 * p_b.hi / xs, dq)
        if jtab_T:
            # central FD of the table eval with the packed fd_step —
            # exactly rcurve.dQ_dz's table branch
            yv = Y.value
            dq_t = (_table_q32(yv + fd_safe)
                    - _table_q32(yv - fd_safe)) / (2.0 * fd_safe)
            dq = jnp.where(t_sel > 0.5, dq_t, dq)
        return dq

    return jrate_q, jrate_dq


def _jrate_deg(junction_rating):
    """Static max polynomial degree across junction ratings (>= 2)."""
    deg = 2
    for rc in junction_rating or ():
        if rc is not None and rc.kind == "poly_n":
            deg = max(deg, int(np.asarray(rc.coeffs).shape[-1]) - 1)
    return deg


def _jrate_extra_rows(deg, has_jpow=False, jtab_T=0):
    """jin rows appended after the _NJ base block: the poly_n coefficient
    blocks (deg > 2), the power rating block (a/b split + selector), and
    the table block (selector + 6 rows per breakpoint)."""
    rows = 2 * (deg + 1) + deg if deg > 2 else 0
    if has_jpow:
        rows += 7
    if jtab_T:
        rows += 1 + 6 * jtab_T
    return rows


_JTAB_MAX_T = 64


def _jrate_kinds(junction_rating):
    """(has_jpow, jtab_T): static power/table flags across junctions."""
    has_jpow = False
    jtab_T = 0
    for rc in junction_rating or ():
        if rc is None:
            continue
        if rc.kind == "power":
            has_jpow = True
        elif rc.kind == "table":
            T = int(np.asarray(rc.table_stage).shape[-1])
            if T < 2:
                raise FusedUnsupported("table junction rating needs >= 2 "
                                       "breakpoints")
            if T > _JTAB_MAX_T:
                raise FusedUnsupported(
                    f"table junction rating has {T} breakpoints; the "
                    f"per-segment kernel eval caps at {_JTAB_MAX_T} "
                    "(use the XLA engines or thin the table)")
            st = np.asarray(rc.table_stage, np.float64)
            if not np.all(np.diff(st) > 0.0):
                raise FusedUnsupported("table junction rating stages must "
                                       "be strictly increasing")
            jtab_T = max(jtab_T, T)
    return has_jpow, jtab_T


def _pack_jrate_rows(put, rc, deg, has_jpow=False, jtab_T=0):
    """Fill one junction's rating config through ``put(row, value)``.

    deg == 2 uses the legacy quadratic rows (byte-identical packing to
    v2); deg > 2 writes DESCENDING coefficient blocks after the _NJ base
    rows: low (deg+1), high (deg+1), d(low)/dY (deg; zeros for junctions
    on the FD path).  ``fd = 0.0`` is the analytic-derivative sentinel
    (poly_n above quadratic); quadratics keep fd = 1 (central difference
    exact), blended curves their fd_step (mirrors rcurve.dQ_dz).

    Round-5 kinds ride appended blocks (see _jrate_extra_rows): "power"
    packs split-f64 (a, b) + a selector; "table" packs the user's own
    breakpoints as split-f64 (stage, q, slope) triples padded by
    repeating the last breakpoint with zero slope (empty segments).
    """
    base_x = _NJ + (2 * (deg + 1) + deg if deg > 2 else 0)

    def put_df(row, v):
        v64 = np.float64(v)
        hi = np.float32(v64)
        put(row, hi)
        put(row + 1, np.float32(v64 - np.float64(hi)))

    if rc.kind == "power":
        a_, b_ = np.asarray(rc.coeffs, np.float64)[:2]
        put_df(base_x, a_)
        put_df(base_x + 2, b_)
        put_df(base_x + 4, float(np.asarray(rc.stage_shift, np.float64)))
        put(base_x + 6, 1.0)  # p_sel
        put(_J_XOFF, float(np.asarray(rc.stage_shift, np.float64)))
        put(_J_BUFS, 1e-30)
        put(_J_FD, 1.0)  # unused (analytic dq); benign for the poly FD
        return
    if rc.kind == "table":
        st = np.asarray(rc.table_stage, np.float64)
        qv = np.asarray(rc.table_q, np.float64)
        T = len(st)
        base_t = base_x + (7 if has_jpow else 0)
        put(base_t, 1.0)  # t_sel
        m = np.zeros(jtab_T)
        m[: T - 1] = (qv[1:] - qv[:-1]) / (st[1:] - st[:-1])
        st_p = np.concatenate([st, np.full(jtab_T - T, st[-1])])
        qv_p = np.concatenate([qv, np.full(jtab_T - T, qv[-1])])
        for i in range(jtab_T):
            put_df(base_t + 1 + 6 * i, st_p[i])
            put_df(base_t + 1 + 6 * i + 2, qv_p[i])
            put_df(base_t + 1 + 6 * i + 4, m[i])
        put(_J_XOFF, 0.0)
        put(_J_BUFS, 1e-30)
        put(_J_FD, float(np.asarray(rc.fd_step, np.float64)))
        return

    c = np.asarray(rc.coeffs, np.float64)
    dlo = None
    if rc.kind == "polynomial":
        lo = hi = c
        xoff = float(np.asarray(rc.stage_shift, np.float64))
        bufs, fd = 1e-30, 1.0
    elif rc.kind == "poly_n":
        lo = hi = c[::-1]  # ascending fit -> descending Horner order
        xoff = float(np.asarray(rc.stage_shift, np.float64))
        bufs = 1e-30
        if len(c) - 1 <= 2:
            fd = 1.0
        else:
            fd = 0.0
            dasc = c[1:] * np.arange(1, len(c), dtype=np.float64)
            dlo = dasc[::-1]
    else:  # blended_poly
        lo = c
        hi = np.asarray(rc.coeffs_high, np.float64)
        xoff = -float(np.asarray(rc.pivot_stage, np.float64))
        bufs = max(float(np.asarray(rc.buffer, np.float64)), 1e-30)
        fd = float(np.asarray(rc.fd_step, np.float64))
        if fd <= 0.0:
            # fd == 0 is the poly_n analytic-derivative sentinel in the
            # kernel; a blended curve with it would silently zero dq/dY
            raise FusedUnsupported(
                "blended junction rating needs fd_step > 0")

    def pad(v, k):
        v = np.asarray(v, np.float64)
        return np.concatenate([np.zeros(k - len(v)), v])

    if deg == 2:
        lo3, hi3 = pad(lo, 3), pad(hi, 3)
        for row, v in ((_J_C2, lo3[0]), (_J_C1, lo3[1]), (_J_C0, lo3[2]),
                       (_J_D2, hi3[0]), (_J_D1, hi3[1]), (_J_D0, hi3[2])):
            put(row, v)
    else:
        lo_p, hi_p = pad(lo, deg + 1), pad(hi, deg + 1)
        dlo_p = pad(dlo, deg) if dlo is not None else np.zeros(deg)
        for i in range(deg + 1):
            put(_NJ + i, lo_p[i])
            put(_NJ + (deg + 1) + i, hi_p[i])
        for i in range(deg):
            put(_NJ + 2 * (deg + 1) + i, dlo_p[i])
    for row, v in ((_J_XOFF, xoff), (_J_BUFS, bufs), (_J_FD, fd)):
        put(row, v)


def _kernel_network(*refs,
                    nt, n, B, J, Jp, m_rhs, n_sweeps, max_iter, ds_kind,
                    us_kind, gate_init, varying, topo_j, qlat_mode, has_jstor,
                    has_jrate, has_stor_end, geo_kind, tab_M, tab_stride,
                    tab_b, has_stg, jrate_deg, has_jpow, jtab_T,
                    out_mem, interpret, both_storage=False,
                    has_stg_us=False):
    """The whole-network-simulation kernel body.

    ``topo_j``: static tuple of (us_junction_or_None, ds_junction_or_None)
    per branch sublane (None entries for external ends and pad branches).
    ``n`` = Nmax (uniform padded branch length); ``Jp`` = junction sublane
    count (J padded to a multiple of 8).  ``out_mem="hbm"`` streams the six
    per-level output stacks through the double-buffered
    :class:`_LevelStreamer` DMA stage (removes the nt VMEM ceiling).
    ``qlat_mode``: None | "const" (theta-box cell average rides the net
    rows) | "tv" (per-level [nt, B, Np] pre-averaged rows read per level).
    """
    refs = list(refs)
    geo_ref = refs.pop(0)
    tab_ref = refs.pop(0) if geo_kind == "table" else None
    init_ref = refs.pop(0)
    net_ref = refs.pop(0)
    jin_ref = refs.pop(0)
    stg_ref = refs.pop(0) if has_stg else None
    # both-ends storage: upstream reservoirs' stage-grid block (the shared
    # stg input keeps the downstream side's)
    stg_us_ref = refs.pop(0) if has_stg_us else None
    qlat_ref = refs.pop(0) if qlat_mode == "tv" else None
    tgt_ref = refs.pop(0)
    ds_tgt_ref = refs.pop(0)
    scal_ref = refs.pop(0)
    out_refs = refs
    # tv qlat: the [nt, B, Np] stack stays in HBM; a VMEM staging row +
    # DMA semaphore scratch pair sits at the END of the scratch list
    qstage = qsem = None
    if qlat_mode == "tv":
        qsem = out_refs.pop()
        qstage = out_refs.pop()
    streamer = None
    if out_mem == "hbm":
        sems = out_refs.pop()
        stage_refs = [out_refs.pop() for _ in range(6)][::-1]
        streamer = _LevelStreamer(out_refs, stage_refs, sems, nt)
    dhi_ref, dlo_ref, fhi_ref, flo_ref, stats_ref, jstat_ref = out_refs
    roll = _roll(interpret)
    geo = geo_ref[:]
    Np = geo.shape[1]
    g = [geo[r * B:(r + 1) * B, :] for r in range(_NG)]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    node_mask = (idx < n).astype(jnp.float32)
    riota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    zcol = jnp.zeros((B, 1), jnp.float32)

    # per-branch section closures: trapezoid sublanes use the analytic
    # closures, table sublanes the per-sublane lookup-table evaluation —
    # both evaluated and selected by the static per-sublane kind mask
    # (exactness per branch matches the XLA engines, so mixed networks
    # keep iteration-count parity)
    section_fn = None
    if geo_kind == "table":
        tmask = zcol
        for b in range(B):
            if tab_b[b]:
                tmask = tmask + (riota == b).astype(jnp.float32)
        tbool = tmask > 0.0

        def section_fn(hh):
            st_t = fn._section_df_table_rows(g, tab_ref, hh, M=tab_M,
                                             stride=tab_stride, B=B)
            if all(tab_b):
                return st_t
            st_s = fn._section_df(g, hh)
            return {key: (df32.where(tbool, v, st_s[key])
                          if isinstance(v, DF)
                          else jnp.where(tbool, v, st_s[key]))
                    for key, v in st_t.items()}

    # (branch, end lane, junction, sign): +1 for a ds end (flow INTO the
    # junction), -1 for an us end (ops/network.py:_sum_signed_ends)
    ends = []
    for b in range(B):
        if topo_j[b][1] is not None:
            ends.append((b, n - 1, topo_j[b][1], 1.0))
        if topo_j[b][0] is not None:
            ends.append((b, 0, topo_j[b][0], -1.0))
    # coupling-column assignment per branch: ci=0 is the us junction when
    # present else the ds one; ci=1 the ds junction when both (matches the
    # stacked XLA engine's coups ordering)
    coup = []  # per branch: tuple of (junction id, ci)
    for b in range(B):
        c = []
        if topo_j[b][0] is not None:
            c.append((topo_j[b][0], 0))
        if topo_j[b][1] is not None:
            c.append((topo_j[b][1], len(c)))
        coup.append(tuple(c))

    def member_col(ref, k):
        col = zcol
        for m in range(B):
            col = col + jnp.where(riota == m, ref[m, k], 0.0)
        return col

    scal = [member_col(scal_ref, i) if i in varying else scal_ref[0, i]
            for i in range(_NS)]
    tol = scal[_S_TOL]

    net = net_ref[:]
    node_real = net[0 * B:1 * B, :]
    cell_real = net[1 * B:2 * B, :]
    endsel = net[2 * B:3 * B, :]
    z_rows = net[3 * B:4 * B, :]
    jm_us = net[4 * B:5 * B, 0:1]
    jm_ds = net[5 * B:6 * B, 0:1]
    jm_real = net[6 * B:7 * B, 0:1]   # 0 on pad sublanes (error mask)
    qlat_const = net[7 * B:8 * B, :] if qlat_mode == "const" else None
    # mixed-kind selection masks (one [B, 1] column per kind in the tuple)
    base_r = 8
    us_masks = ds_masks = None
    if isinstance(us_kind, tuple):
        us_masks = tuple(net[(base_r + i) * B:(base_r + i + 1) * B, 0:1]
                         for i in range(len(us_kind)))
        base_r += len(us_kind)
    if isinstance(ds_kind, tuple):
        ds_masks = tuple(net[(base_r + i) * B:(base_r + i + 1) * B, 0:1]
                         for i in range(len(ds_kind)))
    gated = "gated_blend" in ((ds_kind,) if isinstance(ds_kind, str)
                              else ds_kind)
    pad_cell = (idx < n - 1).astype(jnp.float32) - cell_real
    z_us_col = z_rows[:, 0:1]
    z_ds_col = z_rows[:, n - 1:n]

    jin = jin_ref[:]
    jrow = lambda r: jin[r * Jp:(r + 1) * Jp, 0:1]
    Y0 = DF(jrow(_J_YHI), jrow(_J_YLO))
    jiota = jax.lax.broadcasted_iota(jnp.int32, (Jp, 1), 0)
    liota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # junction-reservoir / rated-outflow config columns ([Jp, 1] f32)
    j_area = jrow(_J_AREA)
    stor = (j_area > 0.0).astype(jnp.float32) if has_jstor else None
    jrate_q, jrate_dq = _make_jrate(jrow, has_jrate, deg=jrate_deg,
                                    has_jpow=has_jpow, jtab_T=jtab_T)

    init = init_ref[:]
    h0 = DF(init[0 * B:1 * B, :], init[1 * B:2 * B, :])
    Q0 = DF(init[2 * B:3 * B, :], init[3 * B:4 * B, :])

    def gather_Y(Y, side):
        """[B, 1] df32 column of each branch's junction stage on ``side``
        (0=us, 1=ds); zero rows where the end is external (masked off in
        _assemble_fused anyway)."""
        hi = zcol
        lo = zcol
        for b in range(B):
            j = topo_j[b][side]
            if j is None:
                continue
            m = (riota == b).astype(jnp.float32)
            hi = hi + m * Y.hi[j:j + 1, :]
            lo = lo + m * Y.lo[j:j + 1, :]
        return DF(hi, lo)

    def signed_end_sum(Q):
        """df32 [Jp, 1] column of sum sgn * Q_end per junction — the
        discharge-continuity residual of plain junctions.  df32: at
        convergence the inflows cancel to ~tol while each term is
        ~1e3-1e4, far past f32 resolution."""
        S = DF(Y0.hi * 0.0, Y0.hi * 0.0)
        for (b, lane, j, sgn) in ends:
            m = (jiota == j).astype(jnp.float32)
            q_end = DF(Q.hi[b:b + 1, lane:lane + 1],
                       Q.lo[b:b + 1, lane:lane + 1])
            S = S + DF(m, m * 0.0) * q_end * df(np.float32(sgn))
        return S

    def store_level(k, h, Q, iters_s, err_s, gate_open, Y, rs=None,
                    rs_us=None):
        """``iters_s``/``err_s`` are [1, 1] network-wide scalars; the
        per-branch stats row replicates them (lanes 0/1) and carries the
        per-branch gate state (lane 3) and, with storage ends, the df32
        reservoir-stage halves (lanes 4/5)."""
        stats_rows = (jnp.where(liota128 == 0, iters_s, 0.0)
                      + jnp.where(liota128 == 1, err_s, 0.0)
                      + jnp.where(liota128 == 3, gate_open, 0.0))
        if rs is not None:
            stats_rows = (stats_rows
                          + jnp.where(liota128 == 4, rs.hi, 0.0)
                          + jnp.where(liota128 == 5, rs.lo, 0.0))
        if rs_us is not None:
            # both-ends storage: upstream reservoir halves on lanes 12/13
            stats_rows = (stats_rows
                          + jnp.where(liota128 == 12, rs_us.hi, 0.0)
                          + jnp.where(liota128 == 13, rs_us.lo, 0.0))
        stats_rows = jnp.broadcast_to(stats_rows, (B, 128))
        jrows = (jnp.where(liota128 == 0, Y.hi, 0.0)
                 + jnp.where(liota128 == 1, Y.lo, 0.0)
                 + jnp.where(liota128 == 2, iters_s, 0.0)
                 + jnp.where(liota128 == 3, err_s, 0.0))
        jrows = jnp.broadcast_to(jrows, (Jp, 128))
        if streamer is not None:
            streamer.store(k, [h.hi[None], h.lo[None], Q.hi[None],
                               Q.lo[None], stats_rows[None], jrows[None]])
            return
        dhi_ref[pl.ds(k, 1)] = h.hi[None]
        dlo_ref[pl.ds(k, 1)] = h.lo[None]
        fhi_ref[pl.ds(k, 1)] = Q.hi[None]
        flo_ref[pl.ds(k, 1)] = Q.lo[None]
        stats_ref[pl.ds(k, 1)] = stats_rows[None]
        jstat_ref[pl.ds(k, 1)] = jrows[None]

    z11 = h0.hi[0:1, 0:1] * np.float32(0.0)
    rs0 = DF(zcol, zcol) if has_stor_end else None
    store_level(0, h0, Q0, z11, z11, zcol + np.float32(gate_init), Y0,
                rs=rs0)

    def sync(x):
        """Re-anchor each branch's pad nodes to its real end (the stacked
        engine's level-start sync; endsel is the one-hot of lane n_b-1, so
        the lane sum extracts exactly one element — bitwise exact)."""
        end_hi = jnp.sum(x.hi * endsel, axis=1, keepdims=True)
        end_lo = jnp.sum(x.lo * endsel, axis=1, keepdims=True)
        return DF(x.hi * node_real + end_hi * (1.0 - node_real),
                  x.lo * node_real + end_lo * (1.0 - node_real))

    def level_body(k, carry):
        (h_hi, h_lo, Q_hi, Q_lo, y_hi, y_lo,
         gopen, gcool, gptime, gstage, ry_hi, ry_lo) = carry[:12]
        h, Q = sync(DF(h_hi, h_lo)), sync(DF(Q_hi, Q_lo))
        Y = DF(y_hi, y_lo)
        # per-branch reservoir stage entering this level (storage ends)
        y_old_b = DF(ry_hi, ry_lo)
        y_old_us_b = DF(carry[12], carry[13]) if both_storage else None

        if gated:
            # per-branch gate controller (same [B,1]-column state machine
            # as _kernel_batched; junction-end branches carry inert state)
            time = k.astype(jnp.float32) * scal[_S_DT]
            elapsed = jnp.where(gptime >= 0.0, time - gptime, 0.0)
            gcool = jnp.maximum(0.0, gcool - elapsed)
            can_act = gcool <= 0.0
            want_open = (gstage >= scal[fn._S_PIVOT] + 0.5) & (gopen < 0.5)
            want_close = (gstage <= scal[fn._S_PIVOT] - 1.0) & (gopen > 0.5)
            do_open = can_act & want_open
            do_close = can_act & want_close
            gopen = jnp.where(do_open, 1.0, jnp.where(do_close, 0.0, gopen))
            gcool = jnp.where(do_open | do_close, scal[fn._S_MAXCD], gcool)
            gptime = jnp.zeros_like(gptime) + time

        prev_A, prev_Se, prev_Q2A = _level_state(g, h, Q,
                                                 section_fn=section_fn)
        tgt = member_col(tgt_ref, k)
        ds_tgt = member_col(ds_tgt_ref, k)
        if qlat_mode == "tv":
            qlat_k = fn._stream_qlat_row(qlat_ref, qstage, qsem, k)
        else:
            qlat_k = qlat_const

        # level-start constants of the junction rows (ops/network.py:
        # newton_level prev_terms): signed end sums of the previous level's
        # flows and the rated outflow at the level-start stage
        if has_jstor or has_jrate:
            Sp = signed_end_sum(Q)
            q_prev = jrate_q(Y)

        def cond(c):
            return jnp.sum(c[8]) > 0.0

        def body(c):
            (hh, hl, qh, ql, yh, yl, iters, errf, active,
             rs_h, rs_l) = c[:11]
            hc, Qc, Yc = DF(hh, hl), DF(qh, ql), DF(yh, yl)
            junc = dict(us_mask=jm_us, ds_mask=jm_ds,
                        Y_us=gather_Y(Yc, 0), Y_ds=gather_Y(Yc, 1),
                        z_us=z_us_col, z_ds=z_ds_col,
                        cell_real=cell_real, pad_cell=pad_cell,
                        us_kind_masks=us_masks, ds_kind_masks=ds_masks)
            res = _assemble_fused(
                g, scal, roll, n, ds_kind, hc, Qc, h, Q,
                prev_A, prev_Se, prev_Q2A, tgt, us_kind=us_kind,
                y_old=(y_old_b if has_stor_end else Yc), k=k,
                gate_open=gopen, ds_tgt=ds_tgt, junc=junc,
                qlat_avg=qlat_k, section_fn=section_fn, stg=stg_ref,
                y_old_us=y_old_us_b, stg_us=stg_us_ref,
                both_storage=both_storage)
            if both_storage:
                buf, errb, res_st, res_st_us = res
            else:
                buf, errb, res_st = res
                res_st_us = res_st
            # append the constant -1 coupling RHS pairs (the dR/dY columns
            # of the arrowhead system, ops/network.py:_simulate_network_
            # stacked rhs_coup)
            is0 = (idx == 0).astype(jnp.float32)
            isl = (idx == n - 1).astype(jnp.float32)
            jm_ds_only = jm_ds * (1.0 - jm_us)
            jm_both = jm_ds * jm_us
            extra = []
            if m_rhs >= 2:
                extra.append(-(is0 * jm_us))               # pair 1, comp 0
                extra.append(-(isl * jm_ds_only))          # pair 1, comp 1
            if m_rhs >= 3:
                extra.append(jnp.zeros_like(hh))           # pair 2, comp 0
                extra.append(-(isl * jm_both))             # pair 2, comp 1
            buf = jnp.concatenate([buf[:14 * B]] + extra, axis=0)
            red = pcr_common.pcr_reduce(buf, idx, n, n_sweeps, roll,
                                        rhs_pairs=m_rhs, block=B)
            X = pcr_common.pcr_backsolve(red, rhs_pairs=m_rhs, block=B)

            # junction residuals (ops/network.py:_junction_residuals):
            # plain: G = sum sgn Q_end - q_out(Y); reservoir: trapezoidal
            # 0-D mass balance area (Y - Y_prev)/dt - avg inflow + avg
            # release (ref lumped_storage.py:24-35 at a multi-branch node)
            S = signed_end_sum(Qc)
            q_out = jrate_q(Yc) if has_jrate else None
            G = S - q_out if has_jrate else S
            if has_jstor:
                G_st = (df(j_area) * (Yc - Y) / df(scal[_S_DT])
                        - df(0.5) * (S + Sp))
                if has_jrate:
                    G_st = G_st + df(0.5) * (q_out + q_prev)
                G = df32.where(stor > 0.0, G_st, G)
            Gf = G.value
            # SELECT the pad sublanes out (a mask multiply would propagate
            # a pad branch's NaN/inf via NaN*0; pads solve a detached toy
            # system and may diverge — they must only kill themselves)
            err2 = _sub_sum(jnp.where(jm_real > 0.0, errb * errb,
                                      jnp.zeros_like(errb)))
            err2 = err2 + _sub_sum(Gf * Gf)
            err_net = jnp.sqrt(err2)

            # Schur assembly: M[jj, jcol] += fac * sgn * X_coup_Q(end),
            # rhs[jj] += fac * sgn * X0_Q(end) on top of G, minus the
            # diag(dG/dY) term (fac = 1 plain, -1/2 reservoir;
            # ops/network.py:_simulate_network_stacked Schur block).
            # Data-derived f32 zeros: int-iota * python-float would trace
            # as f64 under x64 (Mosaic rejects 64-bit) and constant zeros
            # get REPLICATED layouts
            Mmat = (yh * np.float32(0.0)) * liota128.astype(jnp.float32)
            rhsJ = Gf
            # np.float32 literals: two python-float branches under x64 make
            # jnp.where produce f64, which Mosaic cannot lower
            fac = (jnp.where(stor > 0.0, np.float32(-0.5), np.float32(1.0))
                   if has_jstor else None)
            for (b, lane, j, sgn) in ends:
                rowm = (jiota == j).astype(jnp.float32)
                if has_jstor:
                    rowm = rowm * fac  # picks fac[j] at the one-hot row
                sg = np.float32(sgn)
                rhsJ = rhsJ + rowm * (sg * X[0][1][b:b + 1, lane:lane + 1])
                for (jcol, ci) in coup[b]:
                    colm = (liota128 == jcol).astype(jnp.float32)
                    v = sg * X[1 + ci][1][b:b + 1, lane:lane + 1]
                    # associate (rowm*v) first: a [1,1] broadcast straight
                    # to [Jp,128] hits Mosaic's "broadcast in both sublanes
                    # and lanes" limitation; [Jp,1]*[1,128] is one axis each
                    Mmat = Mmat + (rowm * v) * colm
            if has_jstor or has_jrate:
                # M -= diag(dG/dY): area/dt + 0.5 dq/dz for a reservoir,
                # -dq/dz for a plain junction (0 unrated)
                dq = jrate_dq(Yc) if has_jrate else np.float32(0.0)
                if has_jstor:
                    DY = jnp.where(stor > 0.0,
                                   j_area / scal[_S_DT] + np.float32(0.5) * dq,
                                   -dq)
                else:
                    DY = -dq
                Mmat = Mmat - DY * (liota128 == jiota).astype(jnp.float32)
            # identity rows for pad junctions (their M row would otherwise
            # be all-zero and break the elimination)
            padj = (jiota >= J).astype(jnp.float32)
            Mmat = Mmat + padj * (liota128 == jiota).astype(jnp.float32)
            rhsJ = rhsJ * (1.0 - padj)

            # unrolled Gauss-Jordan on the augmented [Jp, 128] system with
            # the RHS in lane column Jp (junction matrices are small and
            # well conditioned — ops/network.py:_solve_junction_system;
            # the increment only needs a few digits, inexact Newton)
            aug = Mmat + (liota128 == Jp).astype(jnp.float32) * rhsJ
            for t in range(J):
                prow = aug[t:t + 1, :]
                piv = prow[:, t:t + 1]
                prown = prow / piv
                f = aug[:, t:t + 1]
                sel = (jiota == t).astype(jnp.float32)
                aug = aug - f * prown
                aug = aug * (1.0 - sel) + sel * prown
            dY = aug[:, Jp:Jp + 1] * (1.0 - padj)

            # branch increments: delta = X0 - sum_ci X_ci * dY[colmap]
            dx0, dx1 = X[0]
            for b in range(B):
                for (jcol, ci) in coup[b]:
                    m = (riota == b).astype(jnp.float32)
                    dYc = m * dY[jcol:jcol + 1, :]
                    dx0 = dx0 - X[1 + ci][0] * dYc
                    dx1 = dx1 - X[1 + ci][1] * dYc

            upd = active  # [1,1]: the whole network iterates as one Newton
            # lift to a [B,1] column first — a [1,1]*[B,Np] product needs a
            # both-axes broadcast, which Mosaic does not implement
            updc = zcol + upd
            hn = hc + df(dx0 * node_mask * updc)
            qn = Qc + df(dx1 * node_mask * updc)
            Yn = Yc + df(dY * upd)
            iters = iters + upd
            errf = jnp.where(upd > 0.0, err_net, errf)
            if has_stor_end:
                rs_h = jnp.where(updc > 0.0, res_st.hi, rs_h)
                rs_l = jnp.where(updc > 0.0, res_st.lo, rs_l)
            active = (upd * (err_net >= tol).astype(jnp.float32)
                      * (iters < np.float32(max_iter)).astype(jnp.float32))
            out = (hn.hi, hn.lo, qn.hi, qn.lo, Yn.hi, Yn.lo,
                   iters, errf, active, rs_h, rs_l)
            if both_storage:
                out = out + (jnp.where(updc > 0.0, res_st_us.hi, c[11]),
                             jnp.where(updc > 0.0, res_st_us.lo, c[12]))
            return out

        # data-derived scalar zero (a constant-zero init would get a
        # REPLICATED Mosaic layout rejected at the carry relayout; and a
        # NaN-poisoned value must not freeze the loop — sanitize)
        hcol = h.hi[0:1, 0:1]
        hsafe = jnp.where(jnp.abs(hcol) < np.float32(3e38), hcol,
                          jnp.zeros_like(hcol))
        dz = hsafe * np.float32(0.0)
        wc0 = (h.hi, h.lo, Q.hi, Q.lo, Y.hi * 1.0, Y.lo * 1.0,
               dz, dz + np.float32(np.inf), dz + 1.0,
               ry_hi * 1.0, ry_lo * 1.0)
        if both_storage:
            wc0 = wc0 + (carry[12] * 1.0, carry[13] * 1.0)
        wout = jax.lax.while_loop(cond, body, wc0)
        (hh, hl, qh, ql, yh, yl, iters, errf, _, rs_h, rs_l) = wout[:11]

        gstage = scal[_S_DSBED] + hh[:, n - 1:n] + hl[:, n - 1:n]
        store_level(k, DF(hh, hl), DF(qh, ql), iters, errf, gopen,
                    DF(yh, yl),
                    rs=DF(rs_h, rs_l) if has_stor_end else None,
                    rs_us=(DF(wout[11], wout[12]) if both_storage
                           else None))
        out = (hh, hl, qh, ql, yh, yl, gopen, gcool, gptime, gstage,
               rs_h, rs_l)
        if both_storage:
            out = out + (wout[11], wout[12])
        return out

    with df32.fenced(scal[_S_ZERO]):
        gstage0 = scal[_S_DSBED] + h0.hi[:, n - 1:n] + h0.lo[:, n - 1:n]
        dz0 = h0.hi[:, 0:1] * np.float32(0.0)
        carry0 = (h0.hi, h0.lo, Q0.hi, Q0.lo, Y0.hi * 1.0, Y0.lo * 1.0,
                  dz0 + np.float32(gate_init), dz0, dz0 - 1.0, gstage0,
                  dz0 * 1.0, dz0 * 1.0)
        if both_storage:
            carry0 = carry0 + (dz0 * 1.0, dz0 * 1.0)
        jax.lax.fori_loop(1, nt, level_body, carry0)
    if streamer is not None:
        streamer.drain()


@functools.lru_cache(maxsize=32)
def _build_call_network(*, nt, n, B, Np, J, Jp, m_rhs, n_sweeps, max_iter,
                        ds_kind, us_kind, gate_init, varying, topo_j,
                        qlat_mode, has_jstor, has_jrate, has_stor_end,
                        geo_kind="trap", tab_M=0, tab_stride=0, tab_b=(),
                        has_stg=False, jrate_deg=2, has_jpow=False,
                        jtab_T=0, out_mem="vmem", both_storage=False,
                        has_stg_us=False,
                        interpret=False):
    kern = functools.partial(
        _kernel_network, nt=nt, n=n, B=B, J=J, Jp=Jp, m_rhs=m_rhs,
        n_sweeps=n_sweeps, max_iter=max_iter, ds_kind=ds_kind,
        us_kind=us_kind, gate_init=gate_init, varying=varying,
        topo_j=topo_j, qlat_mode=qlat_mode, has_jstor=has_jstor,
        has_jrate=has_jrate, has_stor_end=has_stor_end, geo_kind=geo_kind,
        tab_M=tab_M, tab_stride=tab_stride, tab_b=tab_b, has_stg=has_stg,
        jrate_deg=jrate_deg, has_jpow=has_jpow, jtab_T=jtab_T,
        out_mem=out_mem, both_storage=both_storage,
        has_stg_us=has_stg_us, interpret=interpret)
    out_shapes = [
        jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),   # depth hi
        jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),   # depth lo
        jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),   # flow hi
        jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),   # flow lo
        jax.ShapeDtypeStruct((nt, B, 128), jnp.float32),  # per-branch stats
        jax.ShapeDtypeStruct((nt, Jp, 128), jnp.float32),  # junction stats
    ]
    out_space = pl.ANY if out_mem == "hbm" else pltpu.VMEM
    return jax.jit(pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)]      # geometry rows
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]   # per-branch tables
               if geo_kind == "table" else [])
            + [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # init state
                pl.BlockSpec(memory_space=pltpu.VMEM),  # network masks
                pl.BlockSpec(memory_space=pltpu.VMEM),  # junction config
            ]
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]   # storage tables
               if has_stg else [])
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]   # us storage tables
               if has_stg_us else [])
            + ([pl.BlockSpec(memory_space=pl.ANY)]   # [nt, B, Np] tv qlat
               if qlat_mode == "tv" else [])         # stack stays in HBM
            + [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # us targets [B, nt]
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ds targets [B, nt]
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [B, _NS]
            ]
        ),
        out_specs=[pl.BlockSpec(memory_space=out_space)] * len(out_shapes),
        scratch_shapes=((_out_scratch_shapes(out_shapes)
                         if out_mem == "hbm" else [])
                        + ([pltpu.VMEM((1, B, Np), jnp.float32),
                            pltpu.SemaphoreType.DMA]
                           if qlat_mode == "tv" else [])),
        interpret=interpret,
    ))


def _edge_pad_np(x, Nmax):
    x = np.asarray(x)
    if x.shape[0] == Nmax:
        return x
    pad = [(0, Nmax - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, mode="edge")


def _pack_table_geo_rows(geo_p, n, Np, tab_M):
    """[_NG, Np] geometry rows for a TableGeometry branch sublane.

    Row 0 carries the reciprocal depth-grid (fn._TG_INVDG, as in the
    single-reach table mode) and _G_CURV/_G_DZ their real values; the
    remaining trapezoid rows are packed BENIGN (unit widths and Manning n,
    zero slopes) because mixed networks evaluate BOTH closures on every
    sublane and select — the trap closure must stay finite here even
    though its result is discarded.
    """
    f32 = np.float32
    a = lambda x: np.asarray(x, np.float64)
    rows = np.zeros((_NG, Np), f32)
    rows[fn._TG_INVDG, :n] = ((tab_M - 1) / a(geo_p.depth_max)).astype(f32)
    rows[fn._G_CURV, :n] = a(geo_p.curvature).astype(f32)
    z = a(geo_p.z_bed)
    rows[fn._G_DZ, : n - 1] = (z[1:] - z[:-1]).astype(f32)
    for r in (fn._G_N_MAIN, fn._G_N_LEFT, fn._G_N_RIGHT):
        rows[r, :] = 1.0
    return rows


def _pack_table_blocks(geo_p, n, Np, tab_M, tab_stride):
    """[_NT * tab_stride, Np] per-node lookup-table rows for one branch
    (same layout and benign-pad convention as the single-reach table pack,
    fused_newton.fused_simulate)."""
    f32 = np.float32
    benign = (1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0)
    tabs = np.zeros((fn._NT * tab_stride, Np), f32)
    for t, arr in enumerate((geo_p.area, geo_p.perimeter, geo_p.top_width,
                             geo_p.conveyance, geo_p.n_eq,
                             geo_p.dK_dA, geo_p.dR_dA)):
        block = np.full((tab_stride, Np), benign[t], f32)
        a2 = np.asarray(arr, np.float64).T.astype(f32)  # [M, n]
        block[:tab_M, :n] = a2
        block[tab_M:, :n] = a2[-1]
        tabs[t * tab_stride:(t + 1) * tab_stride] = block
    return tabs


def _benign_table_blocks(Np, tab_stride):
    """Benign [_NT * tab_stride, Np] table rows for a trapezoid sublane of
    a mixed network (finite discarded values: unit A/P/T/K/n_eq)."""
    f32 = np.float32
    benign = (1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0)
    tabs = np.zeros((fn._NT * tab_stride, Np), f32)
    for t in range(fn._NT):
        tabs[t * tab_stride:(t + 1) * tab_stride] = benign[t]
    return tabs


def _check_branch_qlat_shape(q, nt, n_b, b):
    """Reject mis-shaped branch lateral inflow before packing.

    The single-reach drivers validate [nt, N] explicitly; without this a
    wrong 2-D shape surfaces as a raw numpy broadcast error inside the
    pack loop — and a transposed square [n_b, nt] array with n_b == nt
    would be consumed silently with wrong semantics.
    """
    if q.ndim == 1 and q.shape[0] == n_b:
        return
    if q.ndim == 2 and q.shape == (nt, n_b):
        return
    raise ValueError(
        f"branch {b} qlat must be [N={n_b}] or [nt={nt}, N={n_b}]; got "
        f"{q.shape}")


def _check_junction_inputs(junction_area, junction_rating, J):
    """Junction config arrays must match the junction count exactly.

    Without this, a short ``junction_area`` silently zero-fills (degrading
    reservoir junctions to plain ones) and an over-length one truncates —
    where the XLA engines would shape-error.
    """
    if junction_area is not None and len(np.asarray(junction_area)) != J:
        raise ValueError(
            f"junction_area has {len(np.asarray(junction_area))} entries "
            f"for {J} junctions")
    if junction_rating is not None and len(junction_rating) != J:
        raise ValueError(
            f"junction_rating has {len(junction_rating)} entries for "
            f"{J} junctions")


def fused_simulate_network(branches, n_junctions, settings, Y0=None,
                           junction_area=None, junction_rating=None,
                           interpret: bool = False):
    """Run a whole network simulation in ONE Pallas kernel call.

    Same arguments and :class:`~flowsim_tpu.ops.network.NetworkOutput`
    contract as :func:`~flowsim_tpu.ops.network.simulate_network` —
    including junction reservoirs (``junction_area``) and rated junction
    outflows (``junction_rating``, quadratic polynomial / blended_poly);
    raises :class:`FusedUnsupported` outside the kernel's scope (callers
    fall back to the XLA engines).
    """
    from flowsim_tpu.geometry import TrapezoidGeometry
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops.network import (NetworkOutput, _check_supported,
                                         _is_junction,
                                         default_initial_stages)

    _check_supported(branches, n_junctions, settings)
    J = n_junctions
    if J < 1:
        raise FusedUnsupported("not a network (no junctions)")
    _check_junction_inputs(junction_area, junction_rating, J)
    if junction_rating is not None:
        for rc in junction_rating:
            if rc is None:
                continue
            if rc.kind not in ("polynomial", "blended_poly", "poly_n",
                               "power", "table"):
                raise FusedUnsupported(
                    f"junction rating kind {rc.kind!r} is XLA-engine only")
            if (rc.kind in ("polynomial", "blended_poly")
                    and np.asarray(rc.coeffs).shape[-1] != 3):
                raise FusedUnsupported("junction rating rows pack quadratics "
                                       "(3 coefficients; use poly_n for "
                                       "higher degrees)")
    jrate_deg = _jrate_deg(junction_rating)
    has_jpow, jtab_T = _jrate_kinds(junction_rating)
    has_jstor = junction_area is not None and bool(
        np.any(np.asarray(junction_area) > 0.0))
    has_jrate = junction_rating is not None and any(
        rc is not None for rc in junction_rating)
    if settings.newton != "while":
        raise FusedUnsupported("fused network kernel implements the "
                               "while-Newton only")
    from flowsim_tpu.geometry import TableGeometry

    B0 = len(branches)
    n_bs = []
    is_tab_b = []
    for i, br in enumerate(branches):
        if not isinstance(br.geo, (TrapezoidGeometry, TableGeometry)):
            raise FusedUnsupported(
                "fused network kernel supports TrapezoidGeometry and "
                "TableGeometry branches")
        is_tab_b.append(isinstance(br.geo, TableGeometry))
        n_bs.append(int(np.asarray(br.h0).shape[0]))

    def _stor_end(end):
        return (not _is_junction(end) and end.kind == "fixed_depth"
                and end.storage is not None)

    # storage on BOTH external ends of one branch: the upstream reservoirs
    # get their own per-branch stage carry, *_US slots and table block
    net_both = any(_stor_end(br.us) and _stor_end(br.ds) for br in branches)
    geo_kind = "table" if any(is_tab_b) else "trap"
    tab_M = tab_stride = 0
    if geo_kind == "table":
        Ms = {int(np.asarray(br.geo.area).shape[-1])
              for br, t in zip(branches, is_tab_b) if t}
        if len(Ms) > 1:
            raise FusedUnsupported(
                f"TableGeometry branches must share one depth-grid "
                f"resolution (got M = {sorted(Ms)}); rebuild the tables "
                "with a common resolution")
        tab_M = Ms.pop()
        tab_stride = -(-tab_M // 8) * 8 + 8
    any2d = any(br.qlat is not None and np.ndim(br.qlat) == 2
                for br in branches)
    qlat_mode = ("tv" if any2d
                 else ("const" if any(br.qlat is not None for br in branches)
                       else None))
    Nmax = max(n_bs)
    nt = settings.n_time_levels
    Np = max(128, -(-Nmax // 128) * 128)
    n_sweeps = max(1, (Nmax - 1).bit_length())
    B = -(-B0 // 8) * 8
    Jp = -(-J // 8) * 8
    if J > 120:
        raise FusedUnsupported("J > 120 junctions exceed the in-kernel "
                               "Gauss-Jordan lane budget")
    if Nmax > fn.MAX_VMEM_N:
        raise FusedUnsupported(f"Nmax={Nmax} exceeds the VMEM kernel limit")

    # shared external BC kinds (v1): every external us end must share one
    # kernel us_kind; every external ds end one ds_kind
    f32 = np.float32
    geo_rows = np.zeros((_NG * B, Np), f32)
    tab_rows = (np.zeros((fn._NT * tab_stride * B, Np), f32)
                if geo_kind == "table" else None)
    init_rows = np.zeros((4 * B, Np), f32)
    net_rows = np.zeros((8 * B, Np), f32)
    qlat_rows = (np.zeros((nt, B, Np), f32) if qlat_mode == "tv" else None)
    nt_pad = max(nt, 8)
    tgt_b = np.zeros((B, nt_pad), f32)
    ds_tgt_b = np.zeros((B, nt_pad), f32)
    scal_rows = np.zeros((B, _NS), f32)
    topo_j = []
    us_kind_bs = [None] * B   # per-sublane external us kind (None: junction)
    ds_kind_bs = [None] * B
    pad_steady = []           # pad ends needing post-loop steady targets
    stg_list = []             # per-sublane storage stage-grid tables
    stg_us_list = []          # both-ends mode: upstream tables per sublane

    base = np.zeros((_NS,), f32)
    base[_S_THETA] = settings.theta
    base[_S_DT] = settings.time_step
    base[_S_TOL] = settings.tolerance

    for m in range(B):
        mm = min(m, B0 - 1)
        br = branches[mm]
        is_pad = m >= B0
        n_b = n_bs[mm]
        geo_p = jax.tree_util.tree_map(
            lambda x: _edge_pad_np(np.asarray(x), Nmax), br.geo)
        if is_tab_b[mm]:
            geo_rows.reshape(_NG, B, Np)[:, m, :] = _pack_table_geo_rows(
                geo_p, Nmax, Np, tab_M)
        else:
            geo_rows.reshape(_NG, B, Np)[:, m, :] = _pack_trap_rows(
                geo_p, Nmax, Np)
        if geo_kind == "table":
            blocks = (_pack_table_blocks(geo_p, Nmax, Np, tab_M, tab_stride)
                      if is_tab_b[mm]
                      else _benign_table_blocks(Np, tab_stride))
            tab_rows.reshape(fn._NT * tab_stride, B, Np)[:, m, :] = blocks
        h0p = _edge_pad_np(np.asarray(br.h0, np.float64), Nmax)
        Q0p = _edge_pad_np(np.asarray(br.Q0, np.float64), Nmax)
        init_rows.reshape(4, B, Np)[:, m, :] = _pack_init(h0p, Q0p, Nmax, Np)

        scal_m = base.copy()
        scal_m[_S_DX] = br.dx
        jus = (int(br.us) if _is_junction(br.us) else None)
        jds = (int(br.ds) if _is_junction(br.ds) else None)
        # pad sublanes (m >= B0) replicate the last branch's geometry,
        # state, and EXTERNAL boundary config, but run detached: no
        # junction couplings, and they are masked out of the network
        # error.  A pad end whose replica end is a junction gets a benign
        # steady BC fixed up after the kind tuples are known.
        topo_j.append((None, None) if is_pad else (jus, jds))

        stg_u = stg_d = None
        if jus is None:
            us_kind_m, stg_u = _pack_us_config(
                br.us, settings, scal_m,
                stg_slots=fn._STG_US if net_both else fn._STG_SHARED)
            us_kind_bs[m] = us_kind_m
            tgt_b[m, :nt] = _pack_us_series(br.us, nt).astype(f32)
        elif is_pad:
            pad_steady.append(("us", m, f32(Q0p[0]), f32(h0p[0])))
        if jds is None:
            ds_kind_m, ds_series, stg_d = _pack_ds_config(
                br.ds, settings, scal_m, nt)
            ds_kind_bs[m] = ds_kind_m
            ds_tgt_b[m, :nt] = ds_series.astype(f32)
        elif is_pad:
            pad_steady.append(("ds", m, f32(Q0p[-1]), f32(h0p[-1])))
        # per-branch stage-grid tables (curve/rating/loss storage on an
        # external end); in both-ends mode the us tables ride their own
        # per-branch block and the *_US scalar slots
        if net_both:
            stg_list.append(stg_d)
            stg_us_list.append(stg_u)
        else:
            stg_list.append(stg_u if stg_u is not None else stg_d)
        scal_rows[m] = scal_m

        z_p = np.asarray(geo_p.z_bed, np.float64)
        nr = net_rows.reshape(8, B, Np)
        nr[0, m, :Nmax] = (np.arange(Nmax) < n_b)
        nr[1, m, :Nmax] = (np.arange(Nmax) < n_b - 1)
        nr[2, m, n_b - 1] = 1.0
        nr[3, m, :Nmax] = z_p.astype(f32)
        nr[4, m, 0] = 0.0 if jus is None else 1.0
        nr[5, m, 0] = 0.0 if jds is None else 1.0
        nr[6, m, 0] = 0.0 if is_pad else 1.0
        if br.qlat is not None and not is_pad:
            q = np.asarray(br.qlat, np.float64)
            _check_branch_qlat_shape(q, nt, n_b, mm)
            if qlat_mode == "const":
                # theta-weighted cell average of a constant-in-time inflow
                # collapses to (q_i + q_{i+1})/2 on real cells
                # (ops/preissmann.py:cell_stencil)
                nr[7, m, : n_b - 1] = (0.5 * (q[:-1] + q[1:])).astype(f32)
            else:  # tv: per-level theta-weighted cell averages, precomputed
                if q.ndim == 1:
                    q = np.broadcast_to(q, (nt, n_b))
                qlat_rows[1:, m, : n_b - 1] = fn._qlat_tv_cells(
                    q, float(settings.theta)).astype(f32)

    # distinct external-end kinds per side: a single kind stays the scalar
    # fast path (identical kernels to v1); several become a static tuple
    # with per-branch selection masks (mixed kinds)
    uniq = lambda ks: tuple(dict.fromkeys(k for k in ks if k is not None))
    us_kinds = uniq(us_kind_bs) or ("flow_hydrograph",)
    ds_kinds = uniq(ds_kind_bs) or ("fixed_h",)
    for side, m, q0, h0v in pad_steady:
        # benign steady targets for pad ends whose replica end is a
        # junction, under the first kind's row formula
        if side == "us":
            us_kind_bs[m] = us_kinds[0]
            tgt_b[m, :] = q0 if us_kinds[0] == "flow_hydrograph" else h0v
        else:
            ds_kind_bs[m] = ds_kinds[0]
            ds_tgt_b[m, :] = q0 if ds_kinds[0] == "flow_q" else h0v
    # junction-end sublanes: any kind works (the junction row overrides)
    us_kind_bs = [k or us_kinds[0] for k in us_kind_bs]
    ds_kind_bs = [k or ds_kinds[0] for k in ds_kind_bs]
    us_kind = us_kinds if len(us_kinds) > 1 else us_kinds[0]
    ds_kind = ds_kinds if len(ds_kinds) > 1 else ds_kinds[0]
    has_stor_end = any(k.startswith("storage")
                       for k in us_kind_bs + ds_kind_bs)

    # per-branch kind-selection masks ride extra net rows (only when mixed)
    n_usm = len(us_kinds) if len(us_kinds) > 1 else 0
    n_dsm = len(ds_kinds) if len(ds_kinds) > 1 else 0
    if n_usm or n_dsm:
        net_rows = np.concatenate(
            [net_rows, np.zeros(((n_usm + n_dsm) * B, Np), f32)])
        nr = net_rows.reshape(8 + n_usm + n_dsm, B, Np)
        for i, kind in enumerate(us_kinds if n_usm else ()):
            nr[8 + i, :, 0] = [1.0 if us_kind_bs[m] == kind else 0.0
                               for m in range(B)]
        for i, kind in enumerate(ds_kinds if n_dsm else ()):
            nr[8 + n_usm + i, :, 0] = [1.0 if ds_kind_bs[m] == kind else 0.0
                                       for m in range(B)]

    m_rhs = 1 + max((sum(1 for j in t if j is not None) for t in topo_j),
                    default=0)
    varying = tuple(int(i) for i in range(_NS)
                    if not np.all(scal_rows[:, i] == scal_rows[0, i]))

    # junction config columns: df32 initial stages + reservoir areas +
    # rated-outflow quadratics (lane 0 of each [Jp, 128] block)
    dtype = jnp.asarray(branches[0].h0).dtype
    if Y0 is None:
        Y0 = default_initial_stages(branches, J, dtype)
    Y0_np = np.zeros((Jp,), np.float64)
    Y0_np[:J] = np.asarray(jax.device_get(Y0), np.float64)
    y_hi, y_lo = _split64(Y0_np)
    jin = np.zeros(((_NJ + _jrate_extra_rows(jrate_deg, has_jpow,
                                       jtab_T)) * Jp, 128), f32)
    jput = lambda r, v: jin.__setitem__(
        (slice(r * Jp, r * Jp + len(v)), 0), np.asarray(v, f32))
    jput(_J_YHI, y_hi)
    jput(_J_YLO, y_lo)
    if has_jstor:
        jput(_J_AREA, np.asarray(junction_area, np.float64)[:J])
    jin[_J_FD * Jp:(_J_FD + 1) * Jp, 0] = 1.0   # benign FD step (unrated)
    jin[_J_BUFS * Jp:(_J_BUFS + 1) * Jp, 0] = 1e-30
    if has_jrate:
        for j, rc in enumerate(junction_rating):
            if rc is None:
                continue
            # high = low and bufsafe -> 0 collapses the delta-form blend
            # to the plain polynomial (see _pack_jrate_rows)
            _pack_jrate_rows(
                lambda row, v: jin.__setitem__((row * Jp + j, 0),
                                               np.float32(v)),
                rc, jrate_deg, has_jpow=has_jpow, jtab_T=jtab_T)

    # VMEM budget: inputs + per-branch working set (the PCR buffer grows
    # to 12+2*m_rhs rows; reuse the measured single-run row budget plus
    # the extra RHS pairs), plus the [nt, ...] output stacks — unless
    # out_memory="hbm" streams them (then only 2 staging slots per output
    # stay in VMEM and nt is unbounded)
    work_rows = fn._WORK_ROWS + 2 * (m_rhs - 1) * (n_sweeps + 2)
    per_level = (4 * B * Np + B * 128 + Jp * 128) * 4
    work = ((_NG + 4 + 8) * B * Np + work_rows * B * Np) * 4
    if qlat_mode == "tv":
        work += B * Np * 4  # the VMEM staging row (the stack is in HBM)
    if geo_kind == "table":
        work += fn._NT * tab_stride * B * Np * 4  # per-branch lookup tables
    has_stg_cur = any(r is not None for r in stg_list)
    if has_stg_cur:
        work += fn._STG_BYTES * B  # per-branch storage stage-grid tables
    has_stg_us_cur = any(r is not None for r in stg_us_list)
    if has_stg_us_cur:
        work += fn._STG_BYTES * B  # upstream tables (both-ends mode)
    req = getattr(settings, "out_memory", "auto")
    if req in ("vmem", "hbm"):
        out_mem = req
    else:
        out_mem = "vmem" if work + nt * per_level <= fn._FUSED_VMEM_BYTES \
            else "hbm"
    out_vmem = (nt if out_mem == "vmem" else 2) * per_level
    if work + out_vmem > fn._FUSED_VMEM_BYTES:
        raise FusedUnsupported(
            f"network working set exceeds the VMEM budget "
            f"(B={B0}, Nmax={Nmax}, nt={nt}, out_memory='{out_mem}'); run "
            f"the XLA stacked engine or checkpoint-chunk the levels")

    tab_b = tuple(bool(is_tab_b[min(m, B0 - 1)]) for m in range(B))
    call = _build_call_network(
        nt=nt, n=Nmax, B=B, Np=Np, J=J, Jp=Jp, m_rhs=m_rhs, n_sweeps=n_sweeps,
        max_iter=settings.max_iter, ds_kind=ds_kind, us_kind=us_kind,
        gate_init=1.0 if settings.gate_initially_open else 0.0,
        varying=varying, topo_j=tuple(topo_j), qlat_mode=qlat_mode,
        has_jstor=has_jstor, has_jrate=has_jrate,
        has_stor_end=has_stor_end, geo_kind=geo_kind, tab_M=tab_M,
        tab_stride=tab_stride, tab_b=tab_b if geo_kind == "table" else (),
        has_stg=has_stg_cur, jrate_deg=jrate_deg,
        has_jpow=has_jpow, jtab_T=jtab_T,
        both_storage=net_both, has_stg_us=has_stg_us_cur,
        out_mem=out_mem, interpret=interpret)
    ins = [jnp.asarray(geo_rows)]
    if geo_kind == "table":
        ins.append(jnp.asarray(tab_rows))
    ins += [jnp.asarray(init_rows), jnp.asarray(net_rows), jnp.asarray(jin)]
    if has_stg_cur:
        ins.append(jnp.asarray(fn._stack_storage_rows(stg_list)))
    if has_stg_us_cur:
        ins.append(jnp.asarray(fn._stack_storage_rows(stg_us_list)))
    if qlat_mode == "tv":
        ins.append(jnp.asarray(qlat_rows))
    ins += [jnp.asarray(tgt_b), jnp.asarray(ds_tgt_b),
            jnp.asarray(scal_rows)]
    outs = call(*ins)
    dhi, dlo, fhi, flo, stats, jstat = outs

    def df_sum(hi, lo):
        if dtype == jnp.float64:
            return hi.astype(jnp.float64) + lo.astype(jnp.float64)
        return (hi + lo).astype(dtype)

    depth = tuple(df_sum(dhi[:, b, :n_bs[b]], dlo[:, b, :n_bs[b]])
                  for b in range(B0))
    flow = tuple(df_sum(fhi[:, b, :n_bs[b]], flo[:, b, :n_bs[b]])
                 for b in range(B0))
    stage = df_sum(jstat[:, :J, 0], jstat[:, :J, 1])
    iters = jstat[:, 0, 2].astype(jnp.int32)
    errs = jstat[:, 0, 3].astype(dtype)
    lvl = jnp.arange(nt)
    converged = (errs < settings.tolerance) | (lvl == 0)
    res_stage = jnp.full((nt, B0, 2), jnp.nan, dtype)
    if has_stor_end:
        # reservoir stages ride stats lanes 4/5 (df32 halves; both-ends
        # mode adds the upstream halves on 12/13); report them only on the
        # end that actually carries storage (the XLA engines' BCState
        # contract: NaN elsewhere, NaN at level 0)
        rs = df_sum(stats[:, :B0, 4], stats[:, :B0, 5])
        rs = jnp.where(jnp.arange(nt)[:, None] == 0, jnp.nan, rs)
        if net_both:
            rs_u = df_sum(stats[:, :B0, 12], stats[:, :B0, 13])
            rs_u = jnp.where(jnp.arange(nt)[:, None] == 0, jnp.nan, rs_u)
        else:
            rs_u = rs
        us_st = np.array([topo_j[b][0] is None
                          and us_kind_bs[b].startswith("storage")
                          for b in range(B0)])[None, :]
        ds_st = np.array([topo_j[b][1] is None
                          and ds_kind_bs[b].startswith("storage")
                          for b in range(B0)])[None, :]
        nanv = jnp.asarray(jnp.nan, dtype)
        res_stage = jnp.stack(
            [jnp.where(jnp.asarray(us_st), rs_u, nanv),
             jnp.where(jnp.asarray(ds_st), rs, nanv)], axis=-1)
    gate0 = 1.0 if settings.gate_initially_open else 0.0
    if "gated_blend" in ds_kinds:
        # report the kernel's gate trajectory only for external ds ends of
        # gated branches: junction-ds sublanes run the state machine with
        # an unset pivot (physics unaffected — the junction row overrides
        # the ds residual), and non-gated kinds report the inert initial
        # state, matching the XLA engines' gate_open contract
        reports = np.array([topo_j[b][1] is None
                            and ds_kind_bs[b] == "gated_blend"
                            for b in range(B0)])[None, :]
        gds = jnp.where(jnp.asarray(reports), stats[:, :B0, 3].astype(dtype),
                        jnp.asarray(gate0, dtype))
    else:
        gds = jnp.full((nt, B0), gate0, dtype)
    gate_open = jnp.stack([jnp.full((nt, B0), gate0, dtype), gds], axis=-1)
    if has_jrate:
        # post-hoc reconstruction from the stored stage trajectory — the
        # exact rule the XLA engines use (ops/network.py stacked unpack)
        outflow = jnp.stack(
            [jnp.zeros((nt,), dtype) if rc is None
             else rcurve.discharge(rc, stage[:, j])
             for j, rc in enumerate(junction_rating)], axis=-1)
    else:
        outflow = jnp.zeros((nt, J), dtype)
    return NetworkOutput(depth=depth, flow=flow, junction_stage=stage,
                         iterations=iters, error=errs, converged=converged,
                         reservoir_stage=res_stage, gate_open=gate_open,
                         junction_outflow=outflow)


# ---------------------------------------------------------------------------
# Batched (ensemble) fused NETWORK kernel: M Monte-Carlo members x B branches
# in ONE Pallas dispatch.
#
# Layout: branch-major, member-minor sublanes — sublane index b*Mp + m (Mp =
# M padded to whole vregs), so every per-branch [B, 1]/[B, Np] column of the
# single-network kernel becomes a [B0*Mp, ...] stack of per-branch member
# blocks, and all cross-branch data movement (junction-stage gathers, signed
# end sums, Schur scatter, branch increments) stays STATIC block slicing +
# concatenation at vreg-aligned offsets.  Junction state rides [J*Mp, 1]
# columns (block j = junction j's M members); the J x J member Schur systems
# solve as ONE blocked Gauss-Jordan on a [J*Mp, 128] augmented tableau whose
# pivot rows are static [Mp, 128] blocks (vectorized across members on
# sublanes).  This is the network counterpart of fused_newton's
# ``_kernel_batched`` (DP analog, SURVEY.md §2.17; ref n_calibrate.py:58-62
# runs one full serial re-simulation per member) — per-member Newton masks
# reproduce each member's sequential iteration count exactly.
# ---------------------------------------------------------------------------


def _blocks(x, nblocks, bs):
    """Static [nblocks*bs, X] -> list of [bs, X] block views."""
    return [x[i * bs:(i + 1) * bs] for i in range(nblocks)]


def _block_sum(x, nblocks, bs):
    """Sum a [nblocks*bs, X] stack over blocks -> [bs, X] (unrolled)."""
    acc = x[0:bs]
    for i in range(1, nblocks):
        acc = acc + x[i * bs:(i + 1) * bs]
    return acc


def _tile_sub(x, times):
    """Tile a [bs, X] block along sublanes -> [times*bs, X]."""
    return x if times == 1 else jnp.concatenate([x] * times, axis=0)


def _kernel_network_batched(*refs,
                            nt, n, B0, Mp, J, m_rhs, n_sweeps, max_iter,
                            ds_kind, us_kind, gate_init, varying, topo_j,
                            qlat_mode, has_jstor, has_jrate, has_stor_end,
                            has_stg, jrate_deg, has_jpow, jtab_T,
                            out_mem, interpret, both_storage=False,
                            has_stg_us=False, geo_kind="trap", tab_M=0,
                            tab_stride=0, tab_b=()):
    """Whole-network ensemble kernel body (see section comment above).

    ``topo_j`` has B0 entries (real branches only; members replicate the
    topology).  All row tensors carry BM = B0*Mp sublanes; junction columns
    carry JM = J*Mp.
    """
    BM = B0 * Mp
    JM = J * Mp
    refs = list(refs)
    geo_ref = refs.pop(0)
    # per-(branch x member) lookup tables (batched TableGeometry networks;
    # members of a branch replicate its tables — per-member geometry does
    # not batch)
    tab_ref = refs.pop(0) if geo_kind == "table" else None
    init_ref = refs.pop(0)
    net_ref = refs.pop(0)
    jin_ref = refs.pop(0)
    stg_ref = refs.pop(0) if has_stg else None
    # both-ends storage: upstream reservoirs' stage-grid block (the shared
    # stg input keeps the downstream side's)
    stg_us_ref = refs.pop(0) if has_stg_us else None
    qlat_ref = refs.pop(0) if qlat_mode == "tv" else None
    tgt_ref = refs.pop(0)
    ds_tgt_ref = refs.pop(0)
    scal_ref = refs.pop(0)
    out_refs = refs
    # tv qlat: the [nt, BM, Np] stack stays in HBM; a VMEM staging row +
    # DMA semaphore scratch pair sits at the END of the scratch list
    qstage = qsem = None
    if qlat_mode == "tv":
        qsem = out_refs.pop()
        qstage = out_refs.pop()
    streamer = None
    if out_mem == "hbm":
        sems = out_refs.pop()
        stage_refs = [out_refs.pop() for _ in range(6)][::-1]
        streamer = _LevelStreamer(out_refs, stage_refs, sems, nt)
    dhi_ref, dlo_ref, fhi_ref, flo_ref, stats_ref, jstat_ref = out_refs
    roll = _roll(interpret)
    geo = geo_ref[:]
    Np = geo.shape[1]
    g = [geo[r * BM:(r + 1) * BM, :] for r in range(_NG)]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    node_mask = (idx < n).astype(jnp.float32)
    riota = jax.lax.broadcasted_iota(jnp.int32, (BM, 1), 0)
    zcol = jnp.zeros((BM, 1), jnp.float32)
    liota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    jmiota = jax.lax.broadcasted_iota(jnp.int32, (JM, 1), 0)

    ends = []
    for b in range(B0):
        if topo_j[b][1] is not None:
            ends.append((b, n - 1, topo_j[b][1], 1.0))
        if topo_j[b][0] is not None:
            ends.append((b, 0, topo_j[b][0], -1.0))
    coup = []
    for b in range(B0):
        c = []
        if topo_j[b][0] is not None:
            c.append((topo_j[b][0], 0))
        if topo_j[b][1] is not None:
            c.append((topo_j[b][1], len(c)))
        coup.append(tuple(c))

    def member_col(ref, k):
        col = zcol
        for r in range(BM):
            col = col + jnp.where(riota == r, ref[r, k], 0.0)
        return col

    scal = [member_col(scal_ref, i) if i in varying else scal_ref[0, i]
            for i in range(_NS)]
    tol = scal[_S_TOL]  # scalar (shared settings)

    net = net_ref[:]
    node_real = net[0 * BM:1 * BM, :]
    cell_real = net[1 * BM:2 * BM, :]
    endsel = net[2 * BM:3 * BM, :]
    z_rows = net[3 * BM:4 * BM, :]
    jm_us = net[4 * BM:5 * BM, 0:1]
    jm_ds = net[5 * BM:6 * BM, 0:1]
    qlat_const = net[7 * BM:8 * BM, :] if qlat_mode == "const" else None
    base_r = 8
    us_masks = ds_masks = None
    if isinstance(us_kind, tuple):
        us_masks = tuple(net[(base_r + i) * BM:(base_r + i + 1) * BM, 0:1]
                         for i in range(len(us_kind)))
        base_r += len(us_kind)
    if isinstance(ds_kind, tuple):
        ds_masks = tuple(net[(base_r + i) * BM:(base_r + i + 1) * BM, 0:1]
                         for i in range(len(ds_kind)))
    gated = "gated_blend" in ((ds_kind,) if isinstance(ds_kind, str)
                              else ds_kind)
    pad_cell = (idx < n - 1).astype(jnp.float32) - cell_real
    z_us_col = z_rows[:, 0:1]
    z_ds_col = z_rows[:, n - 1:n]

    # per-branch section closures (the single-network kernel's convention,
    # lifted to branch x member sublanes): table branches run the
    # per-sublane lookup eval, trap branches the analytic closures; mixed
    # networks evaluate both and select by the static branch mask
    section_fn = None
    if geo_kind == "table":
        tmask = zcol
        for b in range(B0):
            if tab_b[b]:
                tmask = tmask + ((riota >= b * Mp)
                                 & (riota < (b + 1) * Mp)).astype(jnp.float32)
        tbool = tmask > 0.0

        def section_fn(hh):
            st_t = fn._section_df_table_rows(g, tab_ref, hh, M=tab_M,
                                             stride=tab_stride, B=BM)
            if all(tab_b):
                return st_t
            st_s = fn._section_df(g, hh)
            return {key: (df32.where(tbool, v, st_s[key])
                          if isinstance(v, DF)
                          else jnp.where(tbool, v, st_s[key]))
                    for key, v in st_t.items()}

    jin = jin_ref[:]
    jrow = lambda r: jin[r * JM:(r + 1) * JM, 0:1]
    Y0 = DF(jrow(_J_YHI), jrow(_J_YLO))
    j_area = jrow(_J_AREA)
    stor = (j_area > 0.0).astype(jnp.float32) if has_jstor else None
    jrate_q, jrate_dq = _make_jrate(jrow, has_jrate, deg=jrate_deg,
                                    has_jpow=has_jpow, jtab_T=jtab_T)

    init = init_ref[:]
    h0 = DF(init[0 * BM:1 * BM, :], init[1 * BM:2 * BM, :])
    Q0 = DF(init[2 * BM:3 * BM, :], init[3 * BM:4 * BM, :])

    def gather_Y(Y: DF, side):
        """[BM, 1] df32 column of each branch sublane's junction stage on
        ``side`` (member-matched static block slices; zero blocks where the
        end is external — masked off in _assemble_fused)."""
        his, los = [], []
        for b in range(B0):
            j = topo_j[b][side]
            if j is None:
                his.append(Y.hi[0:Mp] * 0.0)
                los.append(Y.lo[0:Mp] * 0.0)
            else:
                his.append(Y.hi[j * Mp:(j + 1) * Mp])
                los.append(Y.lo[j * Mp:(j + 1) * Mp])
        return DF(jnp.concatenate(his, axis=0), jnp.concatenate(los, axis=0))

    def signed_end_sum(Q: DF) -> DF:
        """df32 [JM, 1] column of sum sgn * Q_end per (junction, member)."""
        zb_hi = Y0.hi[0:Mp] * 0.0
        S_blocks = [DF(zb_hi, zb_hi * 1.0) for _ in range(J)]
        for (b, lane, j, sgn) in ends:
            q_end = DF(Q.hi[b * Mp:(b + 1) * Mp, lane:lane + 1],
                       Q.lo[b * Mp:(b + 1) * Mp, lane:lane + 1])
            S_blocks[j] = S_blocks[j] + q_end * df(np.float32(sgn))
        return DF(jnp.concatenate([s.hi for s in S_blocks], axis=0),
                  jnp.concatenate([s.lo for s in S_blocks], axis=0))

    def store_level(k, h, Q, iters_m, err_m, gate_open, Y, rs=None,
                    rs_us=None):
        """``iters_m``/``err_m`` are per-member [Mp, 1] columns."""
        itB, erB = _tile_sub(iters_m, B0), _tile_sub(err_m, B0)
        stats_rows = (jnp.where(liota128 == 0, itB, 0.0)
                      + jnp.where(liota128 == 1, erB, 0.0)
                      + jnp.where(liota128 == 3, gate_open, 0.0))
        if rs is not None:
            stats_rows = (stats_rows
                          + jnp.where(liota128 == 4, rs.hi, 0.0)
                          + jnp.where(liota128 == 5, rs.lo, 0.0))
        if rs_us is not None:
            # both-ends storage: upstream reservoir halves on lanes 12/13
            stats_rows = (stats_rows
                          + jnp.where(liota128 == 12, rs_us.hi, 0.0)
                          + jnp.where(liota128 == 13, rs_us.lo, 0.0))
        stats_rows = jnp.broadcast_to(stats_rows, (BM, 128))
        itJ, erJ = _tile_sub(iters_m, J), _tile_sub(err_m, J)
        jrows = (jnp.where(liota128 == 0, Y.hi, 0.0)
                 + jnp.where(liota128 == 1, Y.lo, 0.0)
                 + jnp.where(liota128 == 2, itJ, 0.0)
                 + jnp.where(liota128 == 3, erJ, 0.0))
        jrows = jnp.broadcast_to(jrows, (JM, 128))
        if streamer is not None:
            streamer.store(k, [h.hi[None], h.lo[None], Q.hi[None],
                               Q.lo[None], stats_rows[None], jrows[None]])
            return
        dhi_ref[pl.ds(k, 1)] = h.hi[None]
        dlo_ref[pl.ds(k, 1)] = h.lo[None]
        fhi_ref[pl.ds(k, 1)] = Q.hi[None]
        flo_ref[pl.ds(k, 1)] = Q.lo[None]
        stats_ref[pl.ds(k, 1)] = stats_rows[None]
        jstat_ref[pl.ds(k, 1)] = jrows[None]

    zM = jnp.zeros((Mp, 1), jnp.float32)
    rs0 = DF(zcol, zcol) if has_stor_end else None
    store_level(0, h0, Q0, zM, zM, zcol + np.float32(gate_init), Y0, rs=rs0)

    def sync(x):
        end_hi = jnp.sum(x.hi * endsel, axis=1, keepdims=True)
        end_lo = jnp.sum(x.lo * endsel, axis=1, keepdims=True)
        return DF(x.hi * node_real + end_hi * (1.0 - node_real),
                  x.lo * node_real + end_lo * (1.0 - node_real))

    def level_body(k, carry):
        (h_hi, h_lo, Q_hi, Q_lo, y_hi, y_lo,
         gopen, gcool, gptime, gstage, ry_hi, ry_lo) = carry[:12]
        h, Q = sync(DF(h_hi, h_lo)), sync(DF(Q_hi, Q_lo))
        Y = DF(y_hi, y_lo)
        y_old_b = DF(ry_hi, ry_lo)
        y_old_us_b = DF(carry[12], carry[13]) if both_storage else None

        if gated:
            time = k.astype(jnp.float32) * scal[_S_DT]
            elapsed = jnp.where(gptime >= 0.0, time - gptime, 0.0)
            gcool = jnp.maximum(0.0, gcool - elapsed)
            can_act = gcool <= 0.0
            want_open = (gstage >= scal[fn._S_PIVOT] + 0.5) & (gopen < 0.5)
            want_close = (gstage <= scal[fn._S_PIVOT] - 1.0) & (gopen > 0.5)
            do_open = can_act & want_open
            do_close = can_act & want_close
            gopen = jnp.where(do_open, 1.0, jnp.where(do_close, 0.0, gopen))
            gcool = jnp.where(do_open | do_close, scal[fn._S_MAXCD], gcool)
            gptime = jnp.zeros_like(gptime) + time

        prev_A, prev_Se, prev_Q2A = _level_state(g, h, Q,
                                                 section_fn=section_fn)
        tgt = member_col(tgt_ref, k)
        ds_tgt = member_col(ds_tgt_ref, k)
        if qlat_mode == "tv":
            qlat_k = fn._stream_qlat_row(qlat_ref, qstage, qsem, k)
        else:
            qlat_k = qlat_const

        if has_jstor or has_jrate:
            Sp = signed_end_sum(Q)
            q_prev = jrate_q(Y)

        def cond(c):
            return jnp.sum(c[8]) > 0.0

        def body(c):
            (hh, hl, qh, ql, yh, yl, iters, errf, active,
             rs_h, rs_l) = c[:11]
            hc, Qc, Yc = DF(hh, hl), DF(qh, ql), DF(yh, yl)
            junc = dict(us_mask=jm_us, ds_mask=jm_ds,
                        Y_us=gather_Y(Yc, 0), Y_ds=gather_Y(Yc, 1),
                        z_us=z_us_col, z_ds=z_ds_col,
                        cell_real=cell_real, pad_cell=pad_cell,
                        us_kind_masks=us_masks, ds_kind_masks=ds_masks)
            res = _assemble_fused(
                g, scal, roll, n, ds_kind, hc, Qc, h, Q,
                prev_A, prev_Se, prev_Q2A, tgt, us_kind=us_kind,
                y_old=(y_old_b if has_stor_end else Yc), k=k,
                gate_open=gopen, ds_tgt=ds_tgt, junc=junc,
                qlat_avg=qlat_k, section_fn=section_fn, stg=stg_ref,
                y_old_us=y_old_us_b, stg_us=stg_us_ref,
                both_storage=both_storage)
            if both_storage:
                buf, errb, res_st, res_st_us = res
            else:
                buf, errb, res_st = res
                res_st_us = res_st
            is0 = (idx == 0).astype(jnp.float32)
            isl = (idx == n - 1).astype(jnp.float32)
            jm_ds_only = jm_ds * (1.0 - jm_us)
            jm_both = jm_ds * jm_us
            extra = []
            if m_rhs >= 2:
                extra.append(-(is0 * jm_us))
                extra.append(-(isl * jm_ds_only))
            if m_rhs >= 3:
                extra.append(jnp.zeros_like(hh))
                extra.append(-(isl * jm_both))
            buf = jnp.concatenate([buf[:14 * BM]] + extra, axis=0)
            red = pcr_common.pcr_reduce(buf, idx, n, n_sweeps, roll,
                                        rhs_pairs=m_rhs, block=BM)
            X = pcr_common.pcr_backsolve(red, rhs_pairs=m_rhs, block=BM)

            S = signed_end_sum(Qc)
            q_out = jrate_q(Yc) if has_jrate else None
            G = S - q_out if has_jrate else S
            if has_jstor:
                G_st = (df(j_area) * (Yc - Y) / df(scal[_S_DT])
                        - df(0.5) * (S + Sp))
                if has_jrate:
                    G_st = G_st + df(0.5) * (q_out + q_prev)
                G = df32.where(stor > 0.0, G_st, G)
            Gf = G.value

            # per-member pre-update residual: branch-block + junction-block
            # sums (each mixes only the same member's sublane rows)
            err2_m = _block_sum(errb * errb, B0, Mp)
            err2_m = err2_m + _block_sum(Gf * Gf, J, Mp)
            err_m = jnp.sqrt(err2_m)

            # Schur tableau: [J*Mp, 128] with member systems on sublanes
            if has_jstor:
                fac = jnp.where(stor > 0.0, np.float32(-0.5),
                                np.float32(1.0))
            rhs_blocks = _blocks(Gf, J, Mp)
            zMb = Gf[0:Mp] * np.float32(0.0)
            M_blocks = [zMb * liota128.astype(jnp.float32)
                        for _ in range(J)]
            for (b, lane, j, sgn) in ends:
                sg = np.float32(sgn)
                fj = (fac[j * Mp:(j + 1) * Mp] if has_jstor
                      else jnp.ones_like(zMb))
                v0 = sg * X[0][1][b * Mp:(b + 1) * Mp, lane:lane + 1]
                rhs_blocks[j] = rhs_blocks[j] + fj * v0
                for (jcol, ci) in coup[b]:
                    colm = (liota128 == jcol).astype(jnp.float32)
                    vc = sg * X[1 + ci][1][b * Mp:(b + 1) * Mp,
                                           lane:lane + 1]
                    M_blocks[j] = M_blocks[j] + (fj * vc) * colm
            if has_jstor or has_jrate:
                dq = jrate_dq(Yc) if has_jrate else np.float32(0.0)
                if has_jstor:
                    DYc = jnp.where(stor > 0.0,
                                    j_area / scal[_S_DT]
                                    + np.float32(0.5) * dq, -dq)
                else:
                    DYc = -dq
                for j in range(J):
                    colm = (liota128 == j).astype(jnp.float32)
                    M_blocks[j] = (M_blocks[j]
                                   - DYc[j * Mp:(j + 1) * Mp] * colm)
            rhs_col = (liota128 == J).astype(jnp.float32)
            aug = jnp.concatenate(
                [M_blocks[j] + rhs_col * rhs_blocks[j] for j in range(J)],
                axis=0)
            # blocked Gauss-Jordan: pivot rows are the [Mp, 128] member
            # blocks of junction t — static slices, vectorized over members
            for t in range(J):
                prow = aug[t * Mp:(t + 1) * Mp, :]
                piv = prow[:, t:t + 1]
                prown = prow / piv
                f = aug[:, t:t + 1]
                tiled = _tile_sub(prown, J)
                selt = ((jmiota >= t * Mp) & (jmiota < (t + 1) * Mp)
                        ).astype(jnp.float32)
                aug = aug - f * tiled
                aug = aug * (1.0 - selt) + selt * tiled
            dY = aug[:, J:J + 1]

            dx0, dx1 = X[0]
            d0_blocks, d1_blocks = [], []
            for b in range(B0):
                c0 = dx0[b * Mp:(b + 1) * Mp, :]
                c1 = dx1[b * Mp:(b + 1) * Mp, :]
                for (jcol, ci) in coup[b]:
                    dYc = dY[jcol * Mp:(jcol + 1) * Mp, :]
                    c0 = c0 - X[1 + ci][0][b * Mp:(b + 1) * Mp, :] * dYc
                    c1 = c1 - X[1 + ci][1][b * Mp:(b + 1) * Mp, :] * dYc
                d0_blocks.append(c0)
                d1_blocks.append(c1)
            dx0 = jnp.concatenate(d0_blocks, axis=0)
            dx1 = jnp.concatenate(d1_blocks, axis=0)

            upd = active                    # [Mp, 1] per-member mask
            updB = _tile_sub(upd, B0)       # [BM, 1]
            updJ = _tile_sub(upd, J)        # [JM, 1]
            hn = hc + df(dx0 * node_mask * updB)
            qn = Qc + df(dx1 * node_mask * updB)
            Yn = Yc + df(dY * updJ)
            iters = iters + upd
            errf = jnp.where(upd > 0.0, err_m, errf)
            if has_stor_end:
                rs_h = jnp.where(updB > 0.0, res_st.hi, rs_h)
                rs_l = jnp.where(updB > 0.0, res_st.lo, rs_l)
            active = (upd * (err_m >= tol).astype(jnp.float32)
                      * (iters < np.float32(max_iter)).astype(jnp.float32))
            out = (hn.hi, hn.lo, qn.hi, qn.lo, Yn.hi, Yn.lo,
                   iters, errf, active, rs_h, rs_l)
            if both_storage:
                out = out + (jnp.where(updB > 0.0, res_st_us.hi, c[11]),
                             jnp.where(updB > 0.0, res_st_us.lo, c[12]))
            return out

        hcol = h.hi[0:Mp, 0:1]
        hsafe = jnp.where(jnp.abs(hcol) < np.float32(3e38), hcol,
                          jnp.zeros_like(hcol))
        dz = hsafe * np.float32(0.0)
        wc0 = (h.hi, h.lo, Q.hi, Q.lo, Y.hi * 1.0, Y.lo * 1.0,
               dz, dz + np.float32(np.inf), dz + 1.0,
               ry_hi * 1.0, ry_lo * 1.0)
        if both_storage:
            wc0 = wc0 + (carry[12] * 1.0, carry[13] * 1.0)
        wout = jax.lax.while_loop(cond, body, wc0)
        (hh, hl, qh, ql, yh, yl, iters, errf, _, rs_h, rs_l) = wout[:11]

        gstage = scal[_S_DSBED] + hh[:, n - 1:n] + hl[:, n - 1:n]
        store_level(k, DF(hh, hl), DF(qh, ql), iters, errf, gopen,
                    DF(yh, yl),
                    rs=DF(rs_h, rs_l) if has_stor_end else None,
                    rs_us=(DF(wout[11], wout[12]) if both_storage
                           else None))
        out = (hh, hl, qh, ql, yh, yl, gopen, gcool, gptime, gstage,
               rs_h, rs_l)
        if both_storage:
            out = out + (wout[11], wout[12])
        return out

    with df32.fenced(scal[_S_ZERO]):
        gstage0 = scal[_S_DSBED] + h0.hi[:, n - 1:n] + h0.lo[:, n - 1:n]
        dz0 = h0.hi[:, 0:1] * np.float32(0.0)
        carry0 = (h0.hi, h0.lo, Q0.hi, Q0.lo, Y0.hi * 1.0, Y0.lo * 1.0,
                  dz0 + np.float32(gate_init), dz0, dz0 - 1.0, gstage0,
                  dz0 * 1.0, dz0 * 1.0)
        if both_storage:
            carry0 = carry0 + (dz0 * 1.0, dz0 * 1.0)
        jax.lax.fori_loop(1, nt, level_body, carry0)
    if streamer is not None:
        streamer.drain()


@functools.lru_cache(maxsize=16)
def _build_call_network_batched(*, nt, n, B0, Mp, Np, J, m_rhs, n_sweeps,
                                max_iter, ds_kind, us_kind, gate_init,
                                varying, topo_j, qlat_mode, has_jstor,
                                has_jrate, has_stor_end, n_net_rows,
                                has_stg=False, jrate_deg=2,
                                has_jpow=False, jtab_T=0,
                                out_mem="vmem", both_storage=False,
                                has_stg_us=False, geo_kind="trap",
                                tab_M=0, tab_stride=0, tab_b=(),
                                interpret=False):
    kern = functools.partial(
        _kernel_network_batched, nt=nt, n=n, B0=B0, Mp=Mp, J=J, m_rhs=m_rhs,
        n_sweeps=n_sweeps, max_iter=max_iter, ds_kind=ds_kind,
        us_kind=us_kind, gate_init=gate_init, varying=varying,
        topo_j=topo_j, qlat_mode=qlat_mode, has_jstor=has_jstor,
        has_jrate=has_jrate, has_stor_end=has_stor_end, has_stg=has_stg,
        both_storage=both_storage, has_stg_us=has_stg_us,
        jrate_deg=jrate_deg, has_jpow=has_jpow, jtab_T=jtab_T,
        geo_kind=geo_kind, tab_M=tab_M, tab_stride=tab_stride, tab_b=tab_b,
        out_mem=out_mem, interpret=interpret)
    BM, JM = B0 * Mp, J * Mp
    out_shapes = [
        jax.ShapeDtypeStruct((nt, BM, Np), jnp.float32),   # depth hi
        jax.ShapeDtypeStruct((nt, BM, Np), jnp.float32),   # depth lo
        jax.ShapeDtypeStruct((nt, BM, Np), jnp.float32),   # flow hi
        jax.ShapeDtypeStruct((nt, BM, Np), jnp.float32),   # flow lo
        jax.ShapeDtypeStruct((nt, BM, 128), jnp.float32),  # per-branch stats
        jax.ShapeDtypeStruct((nt, JM, 128), jnp.float32),  # junction stats
    ]
    out_space = pl.ANY if out_mem == "hbm" else pltpu.VMEM
    return jax.jit(pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)]     # geometry rows
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # branch x member tables
               if geo_kind == "table" else [])
            + [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # init state
                pl.BlockSpec(memory_space=pltpu.VMEM),  # network masks
                pl.BlockSpec(memory_space=pltpu.VMEM),  # junction config
            ]
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # storage tables
               if has_stg else [])
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # us storage tables
               if has_stg_us else [])
            + ([pl.BlockSpec(memory_space=pl.ANY)]  # [nt, BM, Np] tv qlat
               if qlat_mode == "tv" else [])        # stack stays in HBM
            + [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # us targets [BM, nt]
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ds targets [BM, nt]
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [BM, _NS]
            ]
        ),
        out_specs=[pl.BlockSpec(memory_space=out_space)] * len(out_shapes),
        scratch_shapes=((_out_scratch_shapes(out_shapes)
                         if out_mem == "hbm" else [])
                        + ([pltpu.VMEM((1, BM, Np), jnp.float32),
                            pltpu.SemaphoreType.DMA]
                           if qlat_mode == "tv" else [])),
        interpret=interpret,
    ))


def max_fused_network_batch(branches, settings) -> int:
    """Largest member count one batched network dispatch holds in VMEM
    (callers chunk bigger ensembles; multiples of 8 fill whole vregs).

    Returns 0 when not even one 8-member vreg block fits — many-branch
    networks multiply the per-member working set by B0, so basin-scale
    ensembles belong on the stacked XLA engine (see the support matrix in
    docs/PERFORMANCE.md)."""
    from flowsim_tpu.ops.network import _is_junction

    B0 = len(branches)
    Nmax = max(int(np.asarray(br.h0).shape[0]) for br in branches)
    Np = max(128, -(-Nmax // 128) * 128)
    n_sweeps = max(1, (Nmax - 1).bit_length())
    m_rhs = 3  # worst case bound for sizing
    work_rows = fn._WORK_ROWS + 2 * (m_rhs - 1) * (n_sweeps + 2)
    per_member = (_NG + 4 + 8 + work_rows) * B0 * Np * 4
    # plus the 2 HBM staging slots per output (J bounded by B0)
    per_member += 2 * (4 * B0 * Np + 2 * B0 * 128) * 4
    if any(not _is_junction(e) and e.kind == "fixed_depth"
           and e.storage is not None
           and fn._storage_mode(e.storage) != "storage_simple"
           for br in branches for e in (br.us, br.ds)):
        # per-(member x branch) stage-grid storage tables
        per_member += fn._STG_BYTES * B0
    if any(br.qlat is not None and np.ndim(br.qlat) == 2
           for br in branches):
        per_member += B0 * Np * 4  # tv-qlat VMEM staging row
    from flowsim_tpu.geometry import TableGeometry
    tab_Ms = [int(np.asarray(br.geo.area).shape[-1])
              for br in branches if isinstance(br.geo, TableGeometry)]
    if tab_Ms:
        stride = -(-max(tab_Ms) // 8) * 8 + 8
        per_member += fn._NT * stride * B0 * Np * 4  # per-branch tables
    return (fn._FUSED_VMEM_BYTES // per_member) // 8 * 8


def fused_simulate_network_batched(branches, n_junctions, settings, batch,
                                   Y0=None, junction_area=None,
                                   junction_rating=None,
                                   interpret: bool = False):
    """Run M Monte-Carlo members of a whole network in ONE Pallas dispatch.

    Same surface as
    :func:`flowsim_tpu.parallel.ensemble.batched_simulate_network`:
    ``batch`` is one dict per branch of stacked BranchDef overrides (geo /
    us / ds / h0 / Q0 with a leading member axis; junction ends cannot be
    overridden).  Returns a :class:`NetworkOutput` whose fields carry a
    leading member axis (the vmap contract).  Raises
    :class:`FusedUnsupported` outside the kernel's scope.
    """
    from flowsim_tpu.geometry import TrapezoidGeometry
    from flowsim_tpu.ops.network import (NetworkOutput, _check_supported,
                                         _is_junction,
                                         default_initial_stages)

    _check_supported(branches, n_junctions, settings)
    J = n_junctions
    if J < 1:
        raise FusedUnsupported("not a network (no junctions)")
    if settings.newton != "while":
        raise FusedUnsupported("fused network kernel implements the "
                               "while-Newton only")
    if len(batch) != len(branches):
        raise ValueError(f"batch has {len(batch)} entries for "
                         f"{len(branches)} branches")
    _check_junction_inputs(junction_area, junction_rating, J)
    if junction_rating is not None:
        for rc in junction_rating:
            if rc is None:
                continue
            if rc.kind not in ("polynomial", "blended_poly", "poly_n",
                               "power", "table"):
                raise FusedUnsupported(
                    f"junction rating kind {rc.kind!r} is XLA-engine only")
            if (rc.kind in ("polynomial", "blended_poly")
                    and np.asarray(rc.coeffs).shape[-1] != 3):
                raise FusedUnsupported("junction rating rows pack quadratics")
    jrate_deg = _jrate_deg(junction_rating)
    has_jpow, jtab_T = _jrate_kinds(junction_rating)
    has_jstor = junction_area is not None and bool(
        np.any(np.asarray(junction_area) > 0.0))
    has_jrate = junction_rating is not None and any(
        rc is not None for rc in junction_rating)

    # member count from the batch overrides
    M = None
    tonp = lambda t: jax.tree_util.tree_map(np.asarray, t)
    batch = [tonp(d) for d in batch]
    for d in batch:
        for v in jax.tree_util.tree_leaves(d):
            M = v.shape[0] if M is None else M
            if v.shape[0] != M:
                raise ValueError("inconsistent member counts in batch")
    if M is None:
        raise ValueError("batch carries no overrides; use the single-run "
                         "kernel")
    Mp = -(-M // 8) * 8
    B0 = len(branches)

    def member_branch(b, m):
        d = {k: jax.tree_util.tree_map(lambda x: x[min(m, M - 1)], v)
             for k, v in batch[b].items()}
        import dataclasses as _dc
        return _dc.replace(branches[b], **d)

    from flowsim_tpu.geometry import TableGeometry

    n_bs = []
    is_tab_b = []
    for b, br in enumerate(branches):
        if not isinstance(br.geo, (TrapezoidGeometry, TableGeometry)):
            raise FusedUnsupported(
                "fused network kernel supports TrapezoidGeometry and "
                "TableGeometry branches")
        is_tab_b.append(isinstance(br.geo, TableGeometry))
        if is_tab_b[-1] and "geo" in batch[b]:
            raise FusedUnsupported(
                "per-member TableGeometry overrides do not batch (the "
                "members of a branch share its lookup tables); use the "
                "stacked engine")
        n_bs.append(int(np.asarray(br.h0).shape[0]))
    geo_kind = "table" if any(is_tab_b) else "trap"
    tab_M = tab_stride = 0
    if geo_kind == "table":
        Ms = {int(np.asarray(br.geo.area).shape[-1])
              for br, t in zip(branches, is_tab_b) if t}
        if len(Ms) > 1:
            raise FusedUnsupported(
                f"TableGeometry branches must share one depth-grid "
                f"resolution (got M = {sorted(Ms)})")
        tab_M = Ms.pop()
        tab_stride = -(-tab_M // 8) * 8 + 8

    def _stor_end(end):
        return (not _is_junction(end) and end.kind == "fixed_depth"
                and end.storage is not None)

    net_both = any(_stor_end(br.us) and _stor_end(br.ds) for br in branches)
    # a per-member batch override can INTRODUCE qlat on a branch whose
    # base qlat is None — the mode must consider both, or the override
    # would be packed into net row 7 but never read by the kernel.  Any
    # time-varying field (base [nt, N] or override [M, nt, N]) upgrades
    # the whole dispatch to "tv": the [nt, BM, Np] cell-average stack
    # lives in HBM and the kernel DMA-streams one level-row per level.
    any_tv = (any(br.qlat is not None and np.ndim(br.qlat) == 2
                  for br in branches)
              or any("qlat" in d and np.ndim(d["qlat"]) == 3
                     for d in batch))
    qlat_mode = ("tv" if any_tv
                 else ("const"
                       if (any(br.qlat is not None for br in branches)
                           or any("qlat" in d for d in batch))
                       else None))
    Nmax = max(n_bs)
    nt = settings.n_time_levels
    Np = max(128, -(-Nmax // 128) * 128)
    n_sweeps = max(1, (Nmax - 1).bit_length())
    BM, JM = B0 * Mp, J * Mp
    if J > 120:
        raise FusedUnsupported("J > 120 junctions exceed the lane budget")
    if Nmax > fn.MAX_VMEM_N:
        raise FusedUnsupported(f"Nmax={Nmax} exceeds the VMEM kernel limit")

    f32 = np.float32
    geo_rows = np.zeros((_NG * BM, Np), f32)
    tab_rows = (np.zeros((fn._NT * tab_stride * BM, Np), f32)
                if geo_kind == "table" else None)
    init_rows = np.zeros((4 * BM, Np), f32)
    net_rows = np.zeros((8 * BM, Np), f32)
    qlat_rows = (np.zeros((nt, BM, Np), f32) if qlat_mode == "tv" else None)
    nt_pad = max(nt, 8)
    tgt_b = np.zeros((BM, nt_pad), f32)
    ds_tgt_b = np.zeros((BM, nt_pad), f32)
    scal_rows = np.zeros((BM, _NS), f32)
    topo_j = []
    us_kind_bs = [None] * BM
    ds_kind_bs = [None] * BM
    stg_bm = [None] * BM
    stg_us_bm = [None] * BM   # both-ends mode: upstream tables

    base = np.zeros((_NS,), f32)
    base[_S_THETA] = settings.theta
    base[_S_DT] = settings.time_step
    base[_S_TOL] = settings.tolerance

    # per-member initial junction stages (vmap semantics: the default
    # derives from each member's h0)
    Y0_np = np.zeros((JM,), np.float64)
    for b in range(B0):
        jus = int(branches[b].us) if _is_junction(branches[b].us) else None
        jds = int(branches[b].ds) if _is_junction(branches[b].ds) else None
        topo_j.append((jus, jds))

    def _np_default_stages(brs_m):
        # numpy twin of ops.network.default_initial_stages — the host pack
        # loop runs Mp times, and a traced jnp computation + blocking
        # device_get per member costs O(M) dispatch syncs for identical
        # arithmetic
        found = {}
        for br in brs_m:
            for end, idx in ((br.ds, -1), (br.us, 0)):
                if _is_junction(end) and int(end) not in found:
                    found[int(end)] = (
                        float(np.asarray(br.geo.z_bed)[idx])
                        + float(np.asarray(br.h0)[idx]))
        return np.array([found[j] for j in range(J)], np.float64)

    Y0_all = (None if Y0 is None
              else np.asarray(jax.device_get(Y0), np.float64))
    for m in range(Mp):
        brs_m = [member_branch(b, m) for b in range(B0)]
        if Y0_all is None:
            Y0_m = _np_default_stages(brs_m)
        else:
            Y0_m = Y0_all[min(m, M - 1)] if Y0_all.ndim == 2 else Y0_all
        for j in range(J):
            Y0_np[j * Mp + m] = Y0_m[j]
        for b in range(B0):
            br = brs_m[b]
            r = b * Mp + m
            n_b = n_bs[b]
            geo_p = jax.tree_util.tree_map(
                lambda x: _edge_pad_np(np.asarray(x), Nmax), br.geo)
            if is_tab_b[b]:
                geo_rows.reshape(_NG, BM, Np)[:, r, :] = \
                    _pack_table_geo_rows(geo_p, Nmax, Np, tab_M)
            else:
                geo_rows.reshape(_NG, BM, Np)[:, r, :] = _pack_trap_rows(
                    geo_p, Nmax, Np)
            if geo_kind == "table":
                blocks = (_pack_table_blocks(geo_p, Nmax, Np, tab_M,
                                             tab_stride)
                          if is_tab_b[b]
                          else _benign_table_blocks(Np, tab_stride))
                tab_rows.reshape(fn._NT * tab_stride, BM, Np)[:, r, :] = \
                    blocks
            h0p = _edge_pad_np(np.asarray(br.h0, np.float64), Nmax)
            Q0p = _edge_pad_np(np.asarray(br.Q0, np.float64), Nmax)
            init_rows.reshape(4, BM, Np)[:, r, :] = _pack_init(
                h0p, Q0p, Nmax, Np)
            scal_m = base.copy()
            scal_m[_S_DX] = br.dx
            jus, jds = topo_j[b]
            stg_u = stg_d = None
            if jus is None:
                us_kind_m, stg_u = _pack_us_config(
                    br.us, settings, scal_m,
                    stg_slots=fn._STG_US if net_both else fn._STG_SHARED)
                us_kind_bs[r] = us_kind_m
                tgt_b[r, :nt] = _pack_us_series(br.us, nt).astype(f32)
            if jds is None:
                ds_kind_m, ds_series, stg_d = _pack_ds_config(
                    br.ds, settings, scal_m, nt)
                ds_kind_bs[r] = ds_kind_m
                ds_tgt_b[r, :nt] = ds_series.astype(f32)
            # per-(member x branch) stage-grid tables (curve/loss storage);
            # in both-ends mode upstream tables ride their own block
            if net_both:
                stg_bm[r] = stg_d
                stg_us_bm[r] = stg_u
            else:
                stg_bm[r] = stg_u if stg_u is not None else stg_d
            scal_rows[r] = scal_m

            z_p = np.asarray(geo_p.z_bed, np.float64)
            nr = net_rows.reshape(8, BM, Np)
            nr[0, r, :Nmax] = (np.arange(Nmax) < n_b)
            nr[1, r, :Nmax] = (np.arange(Nmax) < n_b - 1)
            nr[2, r, n_b - 1] = 1.0
            nr[3, r, :Nmax] = z_p.astype(f32)
            nr[4, r, 0] = 0.0 if jus is None else 1.0
            nr[5, r, 0] = 0.0 if jds is None else 1.0
            nr[6, r, 0] = 1.0
            if br.qlat is not None:
                q = np.asarray(br.qlat, np.float64)
                _check_branch_qlat_shape(q, nt, n_b, b)
                if qlat_mode == "const":
                    nr[7, r, : n_b - 1] = (0.5 * (q[:-1] + q[1:])).astype(f32)
                else:  # tv: per-level theta-weighted cell averages
                    if q.ndim == 1:
                        q = np.broadcast_to(q, (nt, n_b))
                    qlat_rows[1:, r, : n_b - 1] = fn._qlat_tv_cells(
                        q, float(settings.theta)).astype(f32)

    uniq = lambda ks: tuple(dict.fromkeys(k for k in ks if k is not None))
    us_kinds = uniq(us_kind_bs) or ("flow_hydrograph",)
    ds_kinds = uniq(ds_kind_bs) or ("fixed_h",)
    us_kind_bs = [k or us_kinds[0] for k in us_kind_bs]
    ds_kind_bs = [k or ds_kinds[0] for k in ds_kind_bs]
    us_kind = us_kinds if len(us_kinds) > 1 else us_kinds[0]
    ds_kind = ds_kinds if len(ds_kinds) > 1 else ds_kinds[0]
    has_stor_end = any(k.startswith("storage")
                       for k in us_kind_bs + ds_kind_bs)
    n_usm = len(us_kinds) if len(us_kinds) > 1 else 0
    n_dsm = len(ds_kinds) if len(ds_kinds) > 1 else 0
    if n_usm or n_dsm:
        net_rows = np.concatenate(
            [net_rows, np.zeros(((n_usm + n_dsm) * BM, Np), f32)])
        nr = net_rows.reshape(8 + n_usm + n_dsm, BM, Np)
        for i, kind in enumerate(us_kinds if n_usm else ()):
            nr[8 + i, :, 0] = [1.0 if us_kind_bs[r] == kind else 0.0
                               for r in range(BM)]
        for i, kind in enumerate(ds_kinds if n_dsm else ()):
            nr[8 + n_usm + i, :, 0] = [1.0 if ds_kind_bs[r] == kind else 0.0
                                       for r in range(BM)]

    m_rhs = 1 + max((sum(1 for j in t if j is not None) for t in topo_j),
                    default=0)
    varying = tuple(int(i) for i in range(_NS)
                    if not np.all(scal_rows[:, i] == scal_rows[0, i]))

    y_hi, y_lo = _split64(Y0_np)
    jin = np.zeros(((_NJ + _jrate_extra_rows(jrate_deg, has_jpow,
                                       jtab_T)) * JM, 128), f32)
    jin[0 * JM:1 * JM, 0] = y_hi
    jin[1 * JM:2 * JM, 0] = y_lo
    jin[_J_FD * JM:(_J_FD + 1) * JM, 0] = 1.0
    jin[_J_BUFS * JM:(_J_BUFS + 1) * JM, 0] = 1e-30
    if has_jstor:
        ja = np.asarray(junction_area, np.float64)
        for j in range(J):
            jin[_J_AREA * JM + j * Mp:_J_AREA * JM + (j + 1) * Mp, 0] = ja[j]
    if has_jrate:
        for j, rc in enumerate(junction_rating):
            if rc is None:
                continue
            _pack_jrate_rows(
                lambda row, v: jin.__setitem__(
                    (slice(row * JM + j * Mp, row * JM + (j + 1) * Mp), 0),
                    np.float32(v)),
                rc, jrate_deg, has_jpow=has_jpow, jtab_T=jtab_T)

    work_rows = fn._WORK_ROWS + 2 * (m_rhs - 1) * (n_sweeps + 2)
    per_level = (4 * BM * Np + BM * 128 + JM * 128) * 4
    work = ((_NG + 4 + 8) * BM * Np + work_rows * BM * Np) * 4
    has_stg_cur = any(r is not None for r in stg_bm)
    if has_stg_cur:
        work += fn._STG_BYTES * BM  # per-(member x branch) storage tables
    has_stg_us_cur = any(r is not None for r in stg_us_bm)
    if has_stg_us_cur:
        work += fn._STG_BYTES * BM  # upstream tables (both-ends mode)
    if geo_kind == "table":
        work += fn._NT * tab_stride * BM * Np * 4  # branch x member tables
    if qlat_mode == "tv":
        work += BM * Np * 4  # the VMEM staging row (the stack is in HBM)
    req = getattr(settings, "out_memory", "auto")
    if req in ("vmem", "hbm"):
        out_mem = req
    else:
        out_mem = "vmem" if work + nt * per_level <= fn._FUSED_VMEM_BYTES \
            else "hbm"
    out_vmem = (nt if out_mem == "vmem" else 2) * per_level
    if work + out_vmem > fn._FUSED_VMEM_BYTES:
        # compute the chunking hint from member-0 EFFECTIVE branches so
        # override-introduced storage tables are budgeted in the advice
        hint = max_fused_network_batch(
            [member_branch(b, 0) for b in range(B0)], settings)
        raise FusedUnsupported(
            f"batched network working set exceeds the VMEM budget "
            f"(B={B0}, M={M}, Nmax={Nmax}, nt={nt}); chunk at <= "
            f"{hint} members")

    call = _build_call_network_batched(
        nt=nt, n=Nmax, B0=B0, Mp=Mp, Np=Np, J=J, m_rhs=m_rhs,
        n_sweeps=n_sweeps, max_iter=settings.max_iter, ds_kind=ds_kind,
        us_kind=us_kind,
        gate_init=1.0 if settings.gate_initially_open else 0.0,
        varying=varying, topo_j=tuple(topo_j), qlat_mode=qlat_mode,
        has_jstor=has_jstor, has_jrate=has_jrate,
        has_stor_end=has_stor_end, has_stg=has_stg_cur,
        jrate_deg=jrate_deg, has_jpow=has_jpow, jtab_T=jtab_T,
        n_net_rows=net_rows.shape[0] // BM,
        both_storage=net_both, has_stg_us=has_stg_us_cur,
        geo_kind=geo_kind, tab_M=tab_M, tab_stride=tab_stride,
        tab_b=tuple(bool(t) for t in is_tab_b),
        out_mem=out_mem, interpret=interpret)
    ins = [jnp.asarray(geo_rows)]
    if geo_kind == "table":
        ins.append(jnp.asarray(tab_rows))
    ins += [jnp.asarray(init_rows),
           jnp.asarray(net_rows), jnp.asarray(jin)]
    if has_stg_cur:
        ins.append(jnp.asarray(fn._stack_storage_rows(stg_bm)))
    if has_stg_us_cur:
        ins.append(jnp.asarray(fn._stack_storage_rows(stg_us_bm)))
    if qlat_mode == "tv":
        ins.append(jnp.asarray(qlat_rows))
    ins += [jnp.asarray(tgt_b), jnp.asarray(ds_tgt_b),
            jnp.asarray(scal_rows)]
    outs = call(*ins)
    dhi, dlo, fhi, flo, stats, jstat = outs

    dtype = jnp.asarray(branches[0].h0).dtype

    def df_sum(hi, lo):
        if dtype == jnp.float64:
            return hi.astype(jnp.float64) + lo.astype(jnp.float64)
        return (hi + lo).astype(dtype)

    # [nt, B0*Mp, X] -> member-major views [M, nt, ...]
    def member_view(x):  # [nt, BM, X] -> [nt, B0, Mp, X]
        return x.reshape(nt, B0, Mp, x.shape[-1])

    dhi4, dlo4 = member_view(dhi), member_view(dlo)
    fhi4, flo4 = member_view(fhi), member_view(flo)
    stats4 = member_view(stats)
    jstat4 = jstat.reshape(nt, J, Mp, 128)
    depth = tuple(
        jnp.moveaxis(df_sum(dhi4[:, b, :M, :n_bs[b]],
                            dlo4[:, b, :M, :n_bs[b]]), 1, 0)
        for b in range(B0))
    flow = tuple(
        jnp.moveaxis(df_sum(fhi4[:, b, :M, :n_bs[b]],
                            flo4[:, b, :M, :n_bs[b]]), 1, 0)
        for b in range(B0))
    stage = jnp.moveaxis(
        df_sum(jstat4[:, :, :M, 0], jstat4[:, :, :M, 1]), 2, 0)  # [M, nt, J]
    iters = jnp.moveaxis(jstat4[:, 0, :M, 2], 1, 0).astype(jnp.int32)
    errs = jnp.moveaxis(jstat4[:, 0, :M, 3], 1, 0).astype(dtype)
    lvl = jnp.arange(nt)[None, :]
    converged = (errs < settings.tolerance) | (lvl == 0)
    res_stage = jnp.full((M, nt, B0, 2), jnp.nan, dtype)
    if has_stor_end:
        rs = jnp.moveaxis(df_sum(stats4[:, :, :M, 4], stats4[:, :, :M, 5]),
                          2, 0)  # [M, nt, B0]
        rs = jnp.where(lvl[..., None] == 0, jnp.nan, rs)
        if net_both:
            rs_u = jnp.moveaxis(df_sum(stats4[:, :, :M, 12],
                                       stats4[:, :, :M, 13]), 2, 0)
            rs_u = jnp.where(lvl[..., None] == 0, jnp.nan, rs_u)
        else:
            rs_u = rs
        us_st = np.array([topo_j[b][0] is None
                          and us_kind_bs[b * Mp].startswith("storage")
                          for b in range(B0)])[None, None, :]
        ds_st = np.array([topo_j[b][1] is None
                          and ds_kind_bs[b * Mp].startswith("storage")
                          for b in range(B0)])[None, None, :]
        nanv = jnp.asarray(jnp.nan, dtype)
        res_stage = jnp.stack([jnp.where(jnp.asarray(us_st), rs_u, nanv),
                               jnp.where(jnp.asarray(ds_st), rs, nanv)],
                              axis=-1)
    gate0 = 1.0 if settings.gate_initially_open else 0.0
    if "gated_blend" in ds_kinds:
        reports = np.array([topo_j[b][1] is None
                            and ds_kind_bs[b * Mp] == "gated_blend"
                            for b in range(B0)])[None, None, :]
        gds = jnp.where(jnp.asarray(reports),
                        jnp.moveaxis(stats4[:, :, :M, 3], 2, 0).astype(dtype),
                        jnp.asarray(gate0, dtype))
    else:
        gds = jnp.full((M, nt, B0), gate0, dtype)
    gate_open = jnp.stack([jnp.full((M, nt, B0), gate0, dtype), gds],
                          axis=-1)
    if has_jrate:
        from flowsim_tpu.ops import rating_curve as rcurve
        outflow = jnp.stack(
            [jnp.zeros((M, nt), dtype) if rc is None
             else rcurve.discharge(rc, stage[:, :, j])
             for j, rc in enumerate(junction_rating)], axis=-1)
    else:
        outflow = jnp.zeros((M, nt, J), dtype)
    return NetworkOutput(depth=depth, flow=flow, junction_stage=stage,
                         iterations=iters, error=errs, converged=converged,
                         reservoir_stage=res_stage, gate_open=gate_open,
                         junction_outflow=outflow)
