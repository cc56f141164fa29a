"""Space-sharded river networks: domain-decompose the LONGEST branch.

The SP analog for networks (SURVEY.md §2.17): a long main stem with short
tributaries cannot use the single-reach channel decomposition
(parallel/domain.py) because its ends couple to junctions.  Here ONE
designated branch (default: the longest) is sharded over the ``space``
mesh axis with the same halo-exchange assembly and SPIKE substructured
solve, while the remaining (short) branches are solved REDUNDANTLY on
every shard — they are replicated data, so the only extra cost is the
duplicated flops of the small systems, and the only communication beyond
the single-reach machinery is two psum broadcasts per Newton iteration
(the sharded branch's end discharges and its Schur-column end values).

Junction coupling of the sharded branch: its end rows become equal-stage
junction rows (``_assemble_local``'s ``us_row``/``ds_row`` overrides) and
its Schur columns V = T^{-1} C are obtained with one extra SPIKE solve
per coupling — algebraically identical to the loop engine's multi-RHS
solve (ops/network.py:_simulate_network_impl), so the sharded network
matches the single-device solve to solver roundoff.

Scope: TrapezoidGeometry branches, plain junctions and junction
reservoirs with rated outflow (the [J]-scalar junction physics is
replicated), the full external-boundary surface of ops/boundary.py, and
``newton="while"``.  Lateral inflow is not supported on the SHARDED
branch (short branches may carry constant [N] qlat).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from flowsim_tpu.ops import boundary as bnd
from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops import rating_curve as rcurve
from flowsim_tpu.ops.network import (BranchDef, NetworkOutput,
                                     _assemble_branch, _check_supported,
                                     _end_row_junction, _is_junction,
                                     _junction_outflow, _junction_residuals,
                                     _solve_junction_system,
                                     default_initial_stages)
from flowsim_tpu.ops.tridiag import solve_block_tridiag
from flowsim_tpu.parallel.domain import (_assemble_local, _extend,
                                         _node_fields, _spike_solve,
                                         shard_map)
from flowsim_tpu.parallel.mesh import SPACE_AXIS


def _bcast_from(pred, value, axis):
    """psum-broadcast ``value`` from the shard where ``pred`` holds."""
    return lax.psum(jnp.where(pred, value, jnp.zeros_like(value)), axis)


def simulate_network_sharded(branches, n_junctions, settings, mesh: Mesh,
                             long_branch: int = None, Y0=None,
                             junction_area=None, junction_rating=None):
    """Network solve with ``branches[long_branch]`` sharded over space.

    Same output contract as :func:`flowsim_tpu.ops.network.simulate_network`
    (while-Newton, pre-update-residual convergence); requires the sharded
    branch's node count to be divisible by the mesh's space size.
    """
    _check_supported(branches, n_junctions, settings)
    settings = prs.guard_f32_floor(settings)
    if settings.newton != "while":
        raise ValueError("simulate_network_sharded implements while-Newton")
    J = n_junctions
    B = len(branches)
    n_bs = [int(np.asarray(br.h0).shape[0]) for br in branches]
    if long_branch is None:
        long_branch = int(np.argmax(n_bs))
    lb = int(long_branch)
    S = mesh.shape[SPACE_AXIS]
    if n_bs[lb] % S != 0:
        raise ValueError(
            f"sharded branch {lb} has {n_bs[lb]} nodes, not divisible by "
            f"{S} space shards")
    if branches[lb].qlat is not None:
        raise ValueError("lateral inflow on the sharded branch is not "
                        "supported")
    dtype = jnp.asarray(branches[0].h0).dtype
    nt = settings.n_time_levels
    dt = settings.time_step
    tol = settings.tolerance

    area = (jnp.zeros((J,), dtype) if junction_area is None
            else jnp.asarray(junction_area, dtype))
    rating = None if junction_rating is None else tuple(junction_rating)
    if Y0 is None:
        Y0 = default_initial_stages(branches, J, dtype)
    Y0 = jnp.asarray(Y0, dtype)

    lbd = branches[lb]
    jus_l = int(lbd.us) if _is_junction(lbd.us) else None
    jds_l = int(lbd.ds) if _is_junction(lbd.ds) else None
    z_us_l = float(np.asarray(lbd.geo.z_bed)[0])
    z_ds_l = float(np.asarray(lbd.geo.z_bed)[-1])
    shorts = [b for b in range(B) if b != lb]

    # (junction id, end lane sign) bookkeeping for the Schur system
    def ends_of(br):
        out = []
        if _is_junction(br.ds):
            out.append((int(br.ds), -1, 1.0))
        if _is_junction(br.us):
            out.append((int(br.us), 0, -1.0))
        return out

    # per-short-branch couplings (same ordering as the loop engine)
    short_coups = {}
    for b in shorts:
        c = []
        if _is_junction(branches[b].us):
            c.append((int(branches[b].us), 0, 0))
        if _is_junction(branches[b].ds):
            c.append((int(branches[b].ds), -1, 1))
        short_coups[b] = c
    lb_coups = []  # (junction id, 'us'|'ds')
    if jus_l is not None:
        lb_coups.append((jus_l, "us"))
    if jds_l is not None:
        lb_coups.append((jds_l, "ds"))

    gate_open0 = 1.0 if settings.gate_initially_open else 0.0

    def init_est(end, b, idx):
        if _is_junction(end):
            return bnd.initial_bc_state(dtype)
        return bnd.initial_bc_state(
            dtype, gate_open=gate_open0,
            gate_stage=end.bed_level + jnp.asarray(branches[b].h0, dtype)[idx])

    end_states0 = tuple(
        (init_est(br.us, b, 0), init_est(br.ds, b, n_bs[b] - 1))
        for b, br in enumerate(branches))

    # replicated inputs: short branches' dynamic data; sharded: lb geo/state
    geo_lb = lbd.geo
    h0_lb = jnp.asarray(lbd.h0, dtype)
    Q0_lb = jnp.asarray(lbd.Q0, dtype)
    dyn_shorts = tuple(
        dict(geo=branches[b].geo, h0=jnp.asarray(branches[b].h0, dtype),
             Q0=jnp.asarray(branches[b].Q0, dtype)) for b in shorts)

    def shard_fn(geo_loc, h0_loc, Q0_loc, dyn_s, Y0_, ests0):
        axis = SPACE_AXIS
        s_idx = lax.axis_index(axis)
        first = s_idx == 0
        last = s_idx == S - 1

        def lb_end_vals(h_loc, Q_loc):
            """Sharded branch's global end (h, Q), replicated via psum."""
            h_us = _bcast_from(first, h_loc[0], axis)
            Q_us = _bcast_from(first, Q_loc[0], axis)
            h_ds = _bcast_from(last, h_loc[-1], axis)
            Q_ds = _bcast_from(last, Q_loc[-1], axis)
            return h_us, Q_us, h_ds, Q_ds

        def sum_signed_ends(Qs_short, Q_lb_us, Q_lb_ds):
            Ssum = jnp.zeros((J,), dtype)
            for bi, b in enumerate(shorts):
                for (jj, idx, sgn) in ends_of(branches[b]):
                    Ssum = Ssum.at[jj].add(sgn * Qs_short[bi][idx])
            if jds_l is not None:
                Ssum = Ssum.at[jds_l].add(Q_lb_ds)
            if jus_l is not None:
                Ssum = Ssum.at[jus_l].add(-Q_lb_us)
            return Ssum

        def newton_level(h_loc, Q_loc, hs, Qs, Y, prev_ext, prevs_s, k,
                        ests):
            Y_prev = Y
            _, Qp_us, _, Qp_ds = lb_end_vals(
                prev_ext["h"][:-1], prev_ext["Q"][:-1])
            Sp = sum_signed_ends([p.Q for p in prevs_s], Qp_us, Qp_ds)
            q_out_prev, _ = _junction_outflow(rating, Y_prev, dtype)
            prev_terms = (Y_prev, Sp, q_out_prev)

            def one(h_loc, Q_loc, hs, Qs, Y):
                # --- sharded branch: junction-aware end-row overrides ----
                h_us, Q_us, h_ds, Q_ds = lb_end_vals(h_loc, Q_loc)
                us_row = (None if jus_l is None else
                          _end_row_junction(h_us, jnp.asarray(z_us_l, dtype),
                                            Y[jus_l]))
                ds_row = (None if jds_l is None else
                          _end_row_junction(h_ds, jnp.asarray(z_ds_l, dtype),
                                            Y[jds_l]))
                est_l = ests[lb]
                L, D, Umat, b_loc, _, rs_l, rs_l_us = _assemble_local(
                    geo_loc, None if jus_l is not None else lbd.us,
                    None if jds_l is not None else lbd.ds,
                    settings, prev_ext, h_loc, Q_loc, k,
                    est_l[1].reservoir_stage, axis, bc_state=est_l[1],
                    reservoir_stage_prev_us=est_l[0].reservoir_stage,
                    us_row=us_row, ds_row=ds_row, dx=lbd.dx)
                u = _spike_solve(L, D, Umat, b_loc, axis)
                Vs_l = []
                for (jj, side) in lb_coups:
                    n_loc = h_loc.shape[0]
                    cvec = jnp.zeros_like(b_loc)
                    if side == "us":
                        cvec = cvec.at[0, 0].set(
                            jnp.where(first, -1.0, 0.0).astype(dtype))
                    else:
                        cvec = cvec.at[n_loc - 1, 1].set(
                            jnp.where(last, -1.0, 0.0).astype(dtype))
                    Vs_l.append(_spike_solve(L, D, Umat, cvec, axis))
                err2 = lax.psum(jnp.sum(b_loc * b_loc), axis)

                # --- short branches, replicated ---------------------------
                us_s, Vs_s = [], []
                stages_rows = [None] * B
                for bi, b in enumerate(shorts):
                    br = branches[b]
                    Lb, Db, Ub, bb, e2, coup, st_b = _assemble_branch(
                        br, settings, prevs_s[bi], hs[bi], Qs[bi], k, Y,
                        ests[b])
                    stages_rows[b] = jnp.stack(st_b)
                    err2 = err2 + e2
                    cols = [bb]
                    for (jc, node_idx, block_row) in coup:
                        cols.append(jnp.zeros_like(bb)
                                    .at[node_idx, block_row].set(-1.0))
                    X = solve_block_tridiag(
                        Lb, Db, Ub, jnp.stack(cols, axis=-1),
                        method=settings.linear_solver)
                    us_s.append(X[..., 0])
                    Vs_s.append([X[..., 1 + i] for i in range(len(coup))])
                stages_rows[lb] = jnp.stack([rs_l_us, rs_l])

                # --- junction residuals + Schur system --------------------
                q_out, dq_dz = _junction_outflow(rating, Y, dtype)
                Ssum = sum_signed_ends(Qs, Q_us, Q_ds)
                G = _junction_residuals(Ssum, Y, area, dt, q_out, prev_terms)
                err = jnp.sqrt(err2 + jnp.sum(G * G))

                fac = jnp.where(area > 0.0, -0.5, 1.0)
                M = jnp.zeros((J, J), dtype)
                rhs = jnp.array(G)
                # short-branch contributions (loop-engine rule)
                for bi, b in enumerate(shorts):
                    for (jj, idx, sgn) in ends_of(branches[b]):
                        rhs = rhs.at[jj].add(fac[jj] * sgn
                                             * us_s[bi][idx, 1])
                        for (jc, _, _), V in zip(short_coups[b], Vs_s[bi]):
                            M = M.at[jj, jc].add(fac[jj] * sgn * V[idx, 1])
                # sharded-branch contributions: end values of u and V,
                # broadcast from the owning shard
                u_q_us = _bcast_from(first, u[0, 1], axis)
                u_q_ds = _bcast_from(last, u[-1, 1], axis)
                if jds_l is not None:
                    rhs = rhs.at[jds_l].add(fac[jds_l] * u_q_ds)
                if jus_l is not None:
                    rhs = rhs.at[jus_l].add(-fac[jus_l] * u_q_us)
                for ci, (jc, _) in enumerate(lb_coups):
                    V_q_us = _bcast_from(first, Vs_l[ci][0, 1], axis)
                    V_q_ds = _bcast_from(last, Vs_l[ci][-1, 1], axis)
                    if jds_l is not None:
                        M = M.at[jds_l, jc].add(fac[jds_l] * V_q_ds)
                    if jus_l is not None:
                        M = M.at[jus_l, jc].add(-fac[jus_l] * V_q_us)
                D_Y = jnp.where(area > 0.0, area / dt + 0.5 * dq_dz,
                                -dq_dz)
                M = M - jnp.diag(D_Y)
                dY = _solve_junction_system(M, rhs)

                # --- increments ------------------------------------------
                dx_l = u
                for ci, (jc, _) in enumerate(lb_coups):
                    dx_l = dx_l - Vs_l[ci] * dY[jc]
                h_loc2 = h_loc + dx_l[:, 0]
                Q_loc2 = Q_loc + dx_l[:, 1]
                hs2, Qs2 = [], []
                for bi, b in enumerate(shorts):
                    dxb = us_s[bi]
                    for (jc, _, _), V in zip(short_coups[b], Vs_s[bi]):
                        dxb = dxb - V * dY[jc]
                    hs2.append(hs[bi] + dxb[:, 0])
                    Qs2.append(Qs[bi] + dxb[:, 1])
                return (h_loc2, Q_loc2, tuple(hs2), tuple(Qs2), Y + dY,
                        err, jnp.stack(stages_rows))

            stages0 = jnp.stack([
                jnp.stack([es[0].reservoir_stage, es[1].reservoir_stage])
                for es in ests])
            init = (h_loc, Q_loc, hs, Qs, Y,
                    jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32),
                    stages0)

            def cond(c):
                return (c[5] >= tol) & (c[6] < settings.max_iter)

            def body(c):
                h_loc, Q_loc, hs, Qs, Y = c[:5]
                h2, Q2, hs2, Qs2, Y2, err, st2 = one(h_loc, Q_loc, hs, Qs,
                                                     Y)
                return (h2, Q2, hs2, Qs2, Y2, err, c[6] + 1, st2)

            h_loc, Q_loc, hs, Qs, Y, err, iters, stages = lax.while_loop(
                cond, body, init)
            return h_loc, Q_loc, hs, Qs, Y, err, iters, stages

        def step(carry, k):
            h_loc, Q_loc, hs, Qs, Y, ests = carry
            t_now = k.astype(dtype) * dt
            new_states = []
            for b, br in enumerate(branches):
                pair = []
                for j, end in enumerate((br.us, br.ds)):
                    est = ests[b][j]
                    if not _is_junction(end):
                        est = bnd.update_gate_level_start(end, est, t_now)
                    pair.append(est)
                new_states.append(tuple(pair))
            ests = tuple(new_states)

            fields, _ = _node_fields(geo_loc, h_loc, Q_loc)
            pf = prs.prev_level_state(geo_loc, h_loc, Q_loc)
            prev_ext = _extend(
                dict(A=pf.A, Se=pf.Se, Q2A=pf.Q2A, Q=pf.Q, h=pf.h), axis)
            prevs_s = tuple(prs.prev_level_state(dyn_s[bi]["geo"], hs[bi],
                                                 Qs[bi])
                            for bi in range(len(shorts)))
            (h_loc, Q_loc, hs, Qs, Y, err, iters,
             stages) = newton_level(h_loc, Q_loc, hs, Qs, Y, prev_ext,
                                    prevs_s, k, ests)
            new_states, gate_rows = [], []
            for b, br in enumerate(branches):
                pair = []
                for j, (end, idx) in enumerate(((br.us, 0),
                                                (br.ds, n_bs[b] - 1))):
                    est = ests[b][j]
                    if not _is_junction(end):
                        if b == lb:
                            h_end = _bcast_from(
                                first if idx == 0 else last,
                                h_loc[0] if idx == 0 else h_loc[-1], axis)
                        else:
                            h_end = hs[shorts.index(b)][idx if idx == 0
                                                        else -1]
                        est = est._replace(
                            reservoir_stage=stages[b, j],
                            gate_stage=end.bed_level + h_end)
                    pair.append(est)
                gate_rows.append(jnp.stack([pair[0].gate_open,
                                            pair[1].gate_open]))
                new_states.append(tuple(pair))
            ests = tuple(new_states)
            out = (h_loc, Q_loc, hs, Qs, Y, err, iters, stages,
                   jnp.stack(gate_rows))
            return (h_loc, Q_loc, hs, Qs, Y, ests), out

        carry0 = (h0_loc, Q0_loc,
                  tuple(d["h0"] for d in dyn_s),
                  tuple(d["Q0"] for d in dyn_s), Y0_, ests0)
        carry, outs = lax.scan(step, carry0, jnp.arange(1, nt))
        return outs

    geo_specs = jax.tree_util.tree_map(lambda _: P(SPACE_AXIS), geo_lb)
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
    n_short = len(shorts)
    out_specs = (P(None, SPACE_AXIS), P(None, SPACE_AXIS),
                 (P(None),) * n_short, (P(None),) * n_short,
                 P(None), P(None), P(None), P(None), P(None))
    f = shard_map(
        shard_fn, mesh,
        in_specs=(geo_specs, P(SPACE_AXIS), P(SPACE_AXIS),
                  rep(dyn_shorts), P(None), rep(end_states0)),
        out_specs=out_specs)

    @jax.jit
    def run():
        (h_l, Q_l, hs_s, Qs_s, Y_t, errs, iters, stages_t,
         gates_t) = f(geo_lb, h0_lb, Q0_lb, dyn_shorts, Y0, end_states0)
        return h_l, Q_l, hs_s, Qs_s, Y_t, errs, iters, stages_t, gates_t

    h_l, Q_l, hs_s, Qs_s, Y_t, errs, iters, stages_t, gates_t = run()

    depth, flow = [None] * B, [None] * B
    depth[lb] = jnp.concatenate([h0_lb[None], h_l], axis=0)
    flow[lb] = jnp.concatenate([Q0_lb[None], Q_l], axis=0)
    for bi, b in enumerate(shorts):
        depth[b] = jnp.concatenate([dyn_shorts[bi]["h0"][None], hs_s[bi]],
                                   axis=0)
        flow[b] = jnp.concatenate([dyn_shorts[bi]["Q0"][None], Qs_s[bi]],
                                  axis=0)
    stage = jnp.concatenate([Y0[None], Y_t], axis=0)
    zero = jnp.zeros((1,), errs.dtype)
    errs = jnp.concatenate([zero, errs])
    iters = jnp.concatenate([jnp.zeros((1,), iters.dtype), iters])
    res0 = jnp.full((1,) + stages_t.shape[1:], jnp.nan, stages_t.dtype)
    gates0 = jnp.stack([
        jnp.stack([es[0].gate_open, es[1].gate_open])
        for es in end_states0])[None]
    if rating is None:
        outflow = jnp.zeros_like(stage)
    else:
        outflow = jnp.stack(
            [jnp.zeros((stage.shape[0],), dtype) if rc is None
             else rcurve.discharge(rc, stage[:, j])
             for j, rc in enumerate(rating)], axis=-1)
    return NetworkOutput(depth=tuple(depth), flow=tuple(flow),
                         junction_stage=stage, iterations=iters,
                         error=errs, converged=errs < tol,
                         reservoir_stage=jnp.concatenate([res0, stages_t]),
                         gate_open=jnp.concatenate([gates0, gates_t]),
                         junction_outflow=outflow)
