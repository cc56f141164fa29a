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

Scope (v1): TrapezoidGeometry branches, plain junctions (zero storage
area, no junction rating), constant-in-time lateral inflow only (a
residual constant; time-varying [nt, N] fields fall back),
``newton="while"``, and one
shared external BC kind per side (all external upstream ends share
``us_kind``, all external downstream ends share ``ds_kind`` — any of the
non-storage kinds fused_newton supports, including the gated controller).
Everything else falls back to the XLA engines via
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


def _kernel_network(geo_ref, init_ref, net_ref, jin_ref, tgt_ref, ds_tgt_ref,
                    scal_ref, *out_refs,
                    nt, n, B, J, Jp, m_rhs, n_sweeps, max_iter, ds_kind,
                    us_kind, gate_init, varying, topo_j, has_qlat, out_mem,
                    interpret):
    """The whole-network-simulation kernel body.

    ``topo_j``: static tuple of (us_junction_or_None, ds_junction_or_None)
    per branch sublane (None entries for external ends and pad branches).
    ``n`` = Nmax (uniform padded branch length); ``Jp`` = junction sublane
    count (J padded to a multiple of 8).  ``out_mem="hbm"`` streams the six
    per-level output stacks through the double-buffered
    :class:`_LevelStreamer` DMA stage (removes the nt VMEM ceiling).
    """
    out_refs = list(out_refs)
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
    qlat_avg = net[7 * B:8 * B, :] if has_qlat else None
    pad_cell = (idx < n - 1).astype(jnp.float32) - cell_real
    z_us_col = z_rows[:, 0:1]
    z_ds_col = z_rows[:, n - 1:n]

    jin = jin_ref[:]
    Y0 = DF(jin[0:Jp, 0:1], jin[Jp:2 * Jp, 0:1])
    jiota = jax.lax.broadcasted_iota(jnp.int32, (Jp, 1), 0)
    liota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

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

    def store_level(k, h, Q, iters_s, err_s, gate_open, Y):
        """``iters_s``/``err_s`` are [1, 1] network-wide scalars; the
        per-branch stats row replicates them (lanes 0/1) and carries the
        per-branch gate state (lane 3)."""
        stats_rows = (jnp.where(liota128 == 0, iters_s, 0.0)
                      + jnp.where(liota128 == 1, err_s, 0.0)
                      + jnp.where(liota128 == 3, gate_open, 0.0))
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
    store_level(0, h0, Q0, z11, z11, zcol + np.float32(gate_init), Y0)

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
         gopen, gcool, gptime, gstage) = carry
        h, Q = sync(DF(h_hi, h_lo)), sync(DF(Q_hi, Q_lo))
        Y = DF(y_hi, y_lo)

        if ds_kind == "gated_blend":
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

        prev_A, prev_Se, prev_Q2A = _level_state(g, h, Q)
        tgt = member_col(tgt_ref, k)
        ds_tgt = member_col(ds_tgt_ref, k)

        def cond(c):
            return jnp.sum(c[8]) > 0.0

        def body(c):
            hh, hl, qh, ql, yh, yl, iters, errf, active = c
            hc, Qc, Yc = DF(hh, hl), DF(qh, ql), DF(yh, yl)
            junc = dict(us_mask=jm_us, ds_mask=jm_ds,
                        Y_us=gather_Y(Yc, 0), Y_ds=gather_Y(Yc, 1),
                        z_us=z_us_col, z_ds=z_ds_col,
                        cell_real=cell_real, pad_cell=pad_cell)
            buf, errb, _ = _assemble_fused(
                g, scal, roll, n, ds_kind, hc, Qc, h, Q,
                prev_A, prev_Se, prev_Q2A, tgt, us_kind=us_kind,
                y_old=Yc, k=k, gate_open=gopen, ds_tgt=ds_tgt, junc=junc,
                qlat_avg=qlat_avg)
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

            # junction residual (plain junctions): G = sum sgn Q_end
            G = signed_end_sum(Qc)
            Gf = G.value
            # SELECT the pad sublanes out (a mask multiply would propagate
            # a pad branch's NaN/inf via NaN*0; pads solve a detached toy
            # system and may diverge — they must only kill themselves)
            err2 = _sub_sum(jnp.where(jm_real > 0.0, errb * errb,
                                      jnp.zeros_like(errb)))
            err2 = err2 + _sub_sum(Gf * Gf)
            err_net = jnp.sqrt(err2)

            # Schur assembly: M[jj, jcol] += sgn * X_coup_Q(end), rhs[jj]
            # += sgn * X0_Q(end) on top of G (fac = 1: plain junctions;
            # ops/network.py:_simulate_network_stacked Schur block).
            # Data-derived f32 zeros: int-iota * python-float would trace
            # as f64 under x64 (Mosaic rejects 64-bit) and constant zeros
            # get REPLICATED layouts
            Mmat = (yh * np.float32(0.0)) * liota128.astype(jnp.float32)
            rhsJ = Gf
            for (b, lane, j, sgn) in ends:
                rowm = (jiota == j).astype(jnp.float32)
                sg = np.float32(sgn)
                rhsJ = rhsJ + rowm * (sg * X[0][1][b:b + 1, lane:lane + 1])
                for (jcol, ci) in coup[b]:
                    colm = (liota128 == jcol).astype(jnp.float32)
                    v = sg * X[1 + ci][1][b:b + 1, lane:lane + 1]
                    # associate (rowm*v) first: a [1,1] broadcast straight
                    # to [Jp,128] hits Mosaic's "broadcast in both sublanes
                    # and lanes" limitation; [Jp,1]*[1,128] is one axis each
                    Mmat = Mmat + (rowm * v) * colm
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
            active = (upd * (err_net >= tol).astype(jnp.float32)
                      * (iters < np.float32(max_iter)).astype(jnp.float32))
            return (hn.hi, hn.lo, qn.hi, qn.lo, Yn.hi, Yn.lo,
                    iters, errf, active)

        # data-derived scalar zero (a constant-zero init would get a
        # REPLICATED Mosaic layout rejected at the carry relayout; and a
        # NaN-poisoned value must not freeze the loop — sanitize)
        hcol = h.hi[0:1, 0:1]
        hsafe = jnp.where(jnp.abs(hcol) < np.float32(3e38), hcol,
                          jnp.zeros_like(hcol))
        dz = hsafe * np.float32(0.0)
        hh, hl, qh, ql, yh, yl, iters, errf, _ = jax.lax.while_loop(
            cond, body,
            (h.hi, h.lo, Q.hi, Q.lo, Y.hi * 1.0, Y.lo * 1.0,
             dz, dz + np.float32(np.inf), dz + 1.0))

        gstage = scal[_S_DSBED] + hh[:, n - 1:n] + hl[:, n - 1:n]
        store_level(k, DF(hh, hl), DF(qh, ql), iters, errf, gopen,
                    DF(yh, yl))
        return (hh, hl, qh, ql, yh, yl, gopen, gcool, gptime, gstage)

    with df32.fenced(scal[_S_ZERO]):
        gstage0 = scal[_S_DSBED] + h0.hi[:, n - 1:n] + h0.lo[:, n - 1:n]
        dz0 = h0.hi[:, 0:1] * np.float32(0.0)
        jax.lax.fori_loop(
            1, nt, level_body,
            (h0.hi, h0.lo, Q0.hi, Q0.lo, Y0.hi * 1.0, Y0.lo * 1.0,
             dz0 + np.float32(gate_init), dz0, dz0 - 1.0, gstage0))
    if streamer is not None:
        streamer.drain()


@functools.lru_cache(maxsize=32)
def _build_call_network(*, nt, n, B, Np, J, Jp, m_rhs, n_sweeps, max_iter,
                        ds_kind, us_kind, gate_init, varying, topo_j,
                        has_qlat, out_mem, interpret):
    kern = functools.partial(
        _kernel_network, nt=nt, n=n, B=B, J=J, Jp=Jp, m_rhs=m_rhs,
        n_sweeps=n_sweeps, max_iter=max_iter, ds_kind=ds_kind,
        us_kind=us_kind, gate_init=gate_init, varying=varying,
        topo_j=topo_j, has_qlat=has_qlat, out_mem=out_mem,
        interpret=interpret)
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
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geometry rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # init state
            pl.BlockSpec(memory_space=pltpu.VMEM),  # network masks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # junction stages Y0
            pl.BlockSpec(memory_space=pltpu.SMEM),  # us target series [B, nt]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ds target series [B, nt]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [B, _NS]
        ],
        out_specs=[pl.BlockSpec(memory_space=out_space)] * len(out_shapes),
        scratch_shapes=(_out_scratch_shapes(out_shapes)
                        if out_mem == "hbm" else []),
        interpret=interpret,
    ))


def _edge_pad_np(x, Nmax):
    x = np.asarray(x)
    if x.shape[0] == Nmax:
        return x
    pad = [(0, Nmax - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, mode="edge")


def fused_simulate_network(branches, n_junctions, settings, Y0=None,
                           interpret: bool = False):
    """Run a whole network simulation in ONE Pallas kernel call.

    Same arguments and :class:`~flowsim_tpu.ops.network.NetworkOutput`
    contract as :func:`~flowsim_tpu.ops.network.simulate_network`; raises
    :class:`FusedUnsupported` outside the kernel's scope (callers fall
    back to the XLA engines).
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
    B0 = len(branches)
    n_bs = []
    for i, br in enumerate(branches):
        if not isinstance(br.geo, TrapezoidGeometry):
            raise FusedUnsupported(
                "fused network kernel supports TrapezoidGeometry branches "
                "only")
        if br.qlat is not None and np.ndim(br.qlat) != 1:
            raise FusedUnsupported(
                "time-varying lateral inflow is XLA-engine only (constant "
                "[N] qlat is supported)")
        n_bs.append(int(np.asarray(br.h0).shape[0]))
    has_qlat = any(br.qlat is not None for br in branches)
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
    init_rows = np.zeros((4 * B, Np), f32)
    net_rows = np.zeros((8 * B, Np), f32)
    nt_pad = max(nt, 8)
    tgt_b = np.zeros((B, nt_pad), f32)
    ds_tgt_b = np.zeros((B, nt_pad), f32)
    scal_rows = np.zeros((B, _NS), f32)
    topo_j = []
    us_kind = ds_kind = None

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
        geo_rows.reshape(_NG, B, Np)[:, m, :] = _pack_trap_rows(geo_p, Nmax,
                                                                Np)
        h0p = _edge_pad_np(np.asarray(br.h0, np.float64), Nmax)
        Q0p = _edge_pad_np(np.asarray(br.Q0, np.float64), Nmax)
        init_rows.reshape(4, B, Np)[:, m, :] = _pack_init(h0p, Q0p, Nmax, Np)

        scal_m = base.copy()
        scal_m[_S_DX] = br.dx
        jus = (int(br.us) if _is_junction(br.us) else None)
        jds = (int(br.ds) if _is_junction(br.ds) else None)
        if is_pad:
            # pad sublanes replicate the last branch's geometry/state but
            # run detached: no junctions, benign steady BCs (targets = the
            # initial state under whichever row kind the kernel computes),
            # and they are masked out of the network error
            jus = jds = None
            tgt_b[m, :] = f32(Q0p[0] if us_kind in (None, "flow_hydrograph")
                              else h0p[0])
            ds_tgt_b[m, :] = f32(Q0p[-1] if ds_kind == "flow_q"
                                 else h0p[-1])
        topo_j.append((jus, jds))

        if not is_pad:
            if jus is None:
                if br.us.kind == "fixed_depth" and br.us.storage is not None:
                    raise FusedUnsupported(
                        "lumped-storage network ends are XLA-engine only")
                us_kind_m, stg_u = _pack_us_config(br.us, settings, scal_m)
                if stg_u is not None or us_kind_m.startswith("storage"):
                    raise FusedUnsupported("lumped-storage network ends are "
                                           "XLA-engine only")
                tgt_b[m, :nt] = _pack_us_series(br.us, nt).astype(f32)
                if us_kind is None:
                    us_kind = us_kind_m
                elif us_kind != us_kind_m:
                    raise FusedUnsupported(
                        "all external upstream ends must share one BC kind "
                        "in the fused network kernel")
            if jds is None:
                ds_kind_m, ds_series, stg_d = _pack_ds_config(
                    br.ds, settings, scal_m, nt)
                if stg_d is not None or ds_kind_m.startswith("storage"):
                    raise FusedUnsupported("lumped-storage network ends are "
                                           "XLA-engine only")
                ds_tgt_b[m, :nt] = ds_series.astype(f32)
                if ds_kind is None:
                    ds_kind = ds_kind_m
                elif ds_kind != ds_kind_m:
                    raise FusedUnsupported(
                        "all external downstream ends must share one BC "
                        "kind in the fused network kernel")
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
            # theta-weighted cell average of a constant-in-time inflow:
            # (q_i + q_{i+1})/2 on real cells (ops/preissmann.py:cell_stencil)
            q = np.asarray(br.qlat, np.float64)
            nr[7, m, : n_b - 1] = (0.5 * (q[:-1] + q[1:])).astype(f32)

    us_kind = us_kind or "flow_hydrograph"
    ds_kind = ds_kind or "fixed_h"

    m_rhs = 1 + max((sum(1 for j in t if j is not None) for t in topo_j),
                    default=0)
    varying = tuple(int(i) for i in range(_NS)
                    if not np.all(scal_rows[:, i] == scal_rows[0, i]))

    # initial junction stages as a df32 [Jp, 1] column (lane 0)
    dtype = jnp.asarray(branches[0].h0).dtype
    if Y0 is None:
        Y0 = default_initial_stages(branches, J, dtype)
    Y0_np = np.zeros((Jp,), np.float64)
    Y0_np[:J] = np.asarray(jax.device_get(Y0), np.float64)
    y_hi, y_lo = _split64(Y0_np)
    jin = np.zeros((2 * Jp, 128), f32)
    jin[0:Jp, 0] = y_hi
    jin[Jp:2 * Jp, 0] = y_lo

    # VMEM budget: inputs + per-branch working set (the PCR buffer grows
    # to 12+2*m_rhs rows; reuse the measured single-run row budget plus
    # the extra RHS pairs), plus the [nt, ...] output stacks — unless
    # out_memory="hbm" streams them (then only 2 staging slots per output
    # stay in VMEM and nt is unbounded)
    work_rows = fn._WORK_ROWS + 2 * (m_rhs - 1) * (n_sweeps + 2)
    per_level = (4 * B * Np + B * 128 + Jp * 128) * 4
    work = ((_NG + 4 + 8) * B * Np + work_rows * B * Np) * 4
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

    call = _build_call_network(
        nt=nt, n=Nmax, B=B, Np=Np, J=J, Jp=Jp, m_rhs=m_rhs, n_sweeps=n_sweeps,
        max_iter=settings.max_iter, ds_kind=ds_kind, us_kind=us_kind,
        gate_init=1.0 if settings.gate_initially_open else 0.0,
        varying=varying, topo_j=tuple(topo_j), has_qlat=has_qlat,
        out_mem=out_mem, interpret=interpret)
    outs = call(jnp.asarray(geo_rows), jnp.asarray(init_rows),
                jnp.asarray(net_rows), jnp.asarray(jin),
                jnp.asarray(tgt_b), jnp.asarray(ds_tgt_b),
                jnp.asarray(scal_rows))
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
    gate0 = 1.0 if settings.gate_initially_open else 0.0
    if ds_kind == "gated_blend":
        # junction-ds branches run the kernel's per-sublane gate state
        # machine against an unset pivot (physics unaffected — the junction
        # row overrides the ds residual), but the XLA engines report the
        # inert initial state there; mask to match that contract
        ds_is_junc = np.array([topo_j[b][1] is not None
                               for b in range(B0)])[None, :]
        gds = jnp.where(jnp.asarray(ds_is_junc), jnp.asarray(gate0, dtype),
                        stats[:, :B0, 3].astype(dtype))
    else:
        gds = jnp.full((nt, B0), gate0, dtype)
    gate_open = jnp.stack([jnp.full((nt, B0), gate0, dtype), gds], axis=-1)
    outflow = jnp.zeros((nt, J), dtype)
    return NetworkOutput(depth=depth, flow=flow, junction_stage=stage,
                         iterations=iters, error=errs, converged=converged,
                         reservoir_stage=res_stage, gate_open=gate_open,
                         junction_outflow=outflow)
