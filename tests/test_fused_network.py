"""Fused whole-network kernel (ops/pallas/fused_network.py): parity vs the
XLA network engines.

Runs in Pallas interpret mode on CPU (the same kernel code path the TPU
executes, minus Mosaic lowering).  The bar matches the single-reach fused
kernel's: *identical Newton iteration counts per level* vs the f64 XLA
network solve, and fields matching well under the physical tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops.network import BranchDef, simulate_network
from flowsim_tpu.ops.pallas.fused_network import (FusedUnsupported,
                                                  fused_simulate_network)


def _split_akbari(cut=15, nt=9, tol=1e-6):
    from flowsim_tpu.models import akbari_firoozi as ak

    solver, _ = ak.build()
    sset = dataclasses.replace(
        solver.settings(tolerance=tol, max_iter=100), n_time_levels=nt)
    geo = solver.channel.geometry
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    br1 = BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                    us=solver.us_params, ds=0,
                    h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1])
    br2 = BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                    us=0, ds=solver.ds_params,
                    h0=solver.h0[cut:], Q0=solver.Q0[cut:])
    return [br1, br2], sset


def _assert_parity(out_ref, out_f, n_branches, dh=5e-6, dY=5e-6):
    assert bool(np.asarray(out_f.converged).all())
    np.testing.assert_array_equal(np.asarray(out_f.iterations),
                                  np.asarray(out_ref.iterations))
    for b in range(n_branches):
        assert np.abs(np.asarray(out_ref.depth[b])
                      - np.asarray(out_f.depth[b])).max() < dh
    assert np.abs(np.asarray(out_ref.junction_stage)
                  - np.asarray(out_f.junction_stage)).max() < dY


def test_serial_split_iteration_identical():
    """The 2-branch serial split (the strongest oracle: the same nonlinear
    system as the single reach) — iteration counts must match the f64 loop
    engine level by level."""
    branches, sset = _split_akbari()
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    _assert_parity(out_l, out_f, 2, dh=1e-6, dY=1e-6)


def test_gerd_tributary_parity():
    """Flagship-geometry 3-branch confluence (per-branch dx via `varying`
    scal columns, blended rating downstream, two inflow hydrographs)."""
    from flowsim_tpu.models import gerd_tributary

    branches, nj, sset, _ = gerd_tributary.build(sim_duration=3600 * 12)
    out_l = simulate_network(branches, nj, sset, engine="loop")
    out_f = simulate_network(branches, nj, sset, engine="fused")
    _assert_parity(out_l, out_f, 3, dh=1e-5, dY=1e-5)


def test_basin_parity():
    """7-branch / 3-junction dendritic tree: multi-coupling Schur (m_rhs=3
    interior branches), normal-depth outlet, per-leaf hydrographs."""
    from flowsim_tpu.models import basin

    bb, bnj, bsset = basin.build(levels=3, sim_hours=6)
    out_l = simulate_network(bb, bnj, bsset, engine="loop")
    out_f = simulate_network(bb, bnj, bsset, engine="fused")
    _assert_parity(out_l, out_f, len(bb), dh=1e-5, dY=1e-5)


def test_gated_end_parity():
    """The non-smooth gated controller on the external downstream end of a
    split reach: gate trajectories must match the XLA loop engine exactly
    (the hysteresis state machine runs per branch in the kernel)."""
    from tests.test_gated_curve import _build_gated_solver

    solver = _build_gated_solver()
    sset = solver.settings(tolerance=1e-6, max_iter=100)
    geo = solver.channel.geometry
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    cut = 10
    branches = [
        BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                  us=solver.us_params, ds=0,
                  h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                  us=0, ds=solver.ds_params,
                  h0=solver.h0[cut:], Q0=solver.Q0[cut:]),
    ]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    _assert_parity(out_l, out_f, 2, dh=5e-5, dY=5e-5)
    gl = np.asarray(out_l.gate_open)[:, 1, 1]
    gf = np.asarray(out_f.gate_open)[:, 1, 1]
    assert gl.max() == 1.0, "oracle must actually open its gates"
    np.testing.assert_array_equal(gf, gl)


def test_unsupported_configs_raise():
    branches, sset = _split_akbari(nt=4)

    # the gated controller is downstream-boundary-only; at a junction it
    # is XLA-engine only (table/power junction ratings run in-kernel
    # since round 5 — test_junction_table/power_rating_parity)
    from flowsim_tpu.ops import rating_curve as rcurve
    rc_gate = rcurve.make_gated_blend(np.array([0.0, 1.0, 0.0]),
                                      np.array([0.0, 2.0, 0.0]), 485.0)
    with pytest.raises((FusedUnsupported, ValueError)):
        simulate_network(branches, 1, sset, engine="fused",
                         junction_rating=[rc_gate])
    # fixed-Newton mode (differentiable path) is XLA-engine only
    s_fixed = dataclasses.replace(sset, newton="fixed")
    with pytest.raises(FusedUnsupported):
        simulate_network(branches, 1, s_fixed, engine="fused")
    # (curve/loss lumped storage on external ends now runs in ALL network
    # kernels — test_network_storage_curve_parity and
    # test_batched_network_storage_curve)


def test_junction_reservoir_parity():
    """Junction reservoir (0-D storage at the junction): the fused kernel's
    trapezoidal mass-balance rows must reproduce the f64 loop engine
    iteration-for-iteration, and the pool must actually move."""
    branches, sset = _split_akbari(nt=9)
    SA = 5.0e5
    out_l = simulate_network(branches, 1, sset, junction_area=[SA],
                             engine="loop")
    out_f = simulate_network(branches, 1, sset, junction_area=[SA],
                             engine="fused")
    _assert_parity(out_l, out_f, 2, dh=5e-6, dY=5e-6)
    Y = np.asarray(out_f.junction_stage)[:, 0]
    assert np.abs(np.diff(Y)).max() > 1e-4, "pool must respond to the flood"
    # the kernel's trapezoidal balance closes at solver tolerance
    qin = np.asarray(out_f.flow[0])[:, -1]
    qout = np.asarray(out_f.flow[1])[:, 0]
    dt = sset.time_step
    lhs = SA * (Y[1:] - Y[:-1]) / dt
    rhs = 0.5 * ((qin[1:] + qin[:-1]) - (qout[1:] + qout[:-1]))
    assert np.abs(lhs - rhs).max() < 1e-4


def test_junction_dam_rated_parity():
    """Junction reservoir + polynomial rated outflow (a dam at the junction
    releasing out of the network): iteration parity vs the loop engine and
    a live junction_outflow trajectory."""
    from flowsim_tpu.ops import rating_curve as rcurve

    branches, sset = _split_akbari(nt=9)
    geo0 = branches[0].geo
    z_conf = float(np.asarray(geo0.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    rc = rcurve.make_polynomial(0.0, 40.0, -40.0 * Y_init + 20.0)
    SA = 5.0e5
    kw = dict(junction_area=[SA], junction_rating=[rc])
    out_l = simulate_network(branches, 1, sset, engine="loop", **kw)
    out_f = simulate_network(branches, 1, sset, engine="fused", **kw)
    _assert_parity(out_l, out_f, 2, dh=5e-6, dY=5e-6)
    qo_l = np.asarray(out_l.junction_outflow)[:, 0]
    qo_f = np.asarray(out_f.junction_outflow)[:, 0]
    assert qo_f[1:].min() > 0.0
    np.testing.assert_allclose(qo_f, qo_l, atol=1e-3)


def test_plain_withdrawal_parity():
    """Rated withdrawal on a plain (area=0) junction: continuity includes
    the stage-dependent release; parity vs the loop engine."""
    from flowsim_tpu.ops import rating_curve as rcurve

    branches, sset = _split_akbari(nt=9)
    z_conf = float(np.asarray(branches[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    rc = rcurve.make_polynomial(0.0, 10.0, -10.0 * Y_init + 5.0)
    out_l = simulate_network(branches, 1, sset, engine="loop",
                             junction_rating=[rc])
    out_f = simulate_network(branches, 1, sset, engine="fused",
                             junction_rating=[rc])
    _assert_parity(out_l, out_f, 2, dh=5e-6, dY=5e-6)
    # the withdrawal drains: downstream branch carries less than the feeder
    assert (np.asarray(out_f.flow[1])[1:, 0]
            < np.asarray(out_f.flow[0])[1:, -1]).all()


def test_junction_blended_rating_parity():
    """blended_poly release curve at a junction reservoir (smoothstep gate
    blend, the Roseires-style smooth curve): parity vs the loop engine."""
    from flowsim_tpu.ops import rating_curve as rcurve

    branches, sset = _split_akbari(nt=9)
    z_conf = float(np.asarray(branches[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    rc = rcurve.make_blended_poly(
        [0.0, 20.0, -20.0 * Y_init + 10.0],
        [0.0, 60.0, -60.0 * Y_init + 30.0],
        pivot_stage=Y_init + 0.05, buffer=0.5)
    SA = 5.0e5
    kw = dict(junction_area=[SA], junction_rating=[rc])
    out_l = simulate_network(branches, 1, sset, engine="loop", **kw)
    out_f = simulate_network(branches, 1, sset, engine="fused", **kw)
    _assert_parity(out_l, out_f, 2, dh=5e-6, dY=5e-6)
    np.testing.assert_allclose(np.asarray(out_f.junction_outflow),
                               np.asarray(out_l.junction_outflow), atol=1e-3)


def test_batched_network_parity():
    """The batched fused-NETWORK kernel (members x branches on sublanes):
    per-member iteration counts and fields must match the vmapped XLA loop
    engine member-for-member (per-member inflow scaling + roughness)."""
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    M = 3
    us = branches[0].us
    series = np.asarray(us.target_series, np.float64)
    scales = np.asarray([0.9, 1.0, 1.15])
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us, target_series=jnp.asarray(series) * s))(jnp.asarray(scales))
    batch = [dict(us=us_b), dict()]

    out_l = batched_simulate_network(branches, 1, sset, batch, engine="loop")
    out_f = batched_simulate_network(branches, 1, sset, batch,
                                     engine="fused")
    assert bool(np.asarray(out_f.converged).all())
    np.testing.assert_array_equal(np.asarray(out_f.iterations),
                                  np.asarray(out_l.iterations))
    for b in range(2):
        assert np.abs(np.asarray(out_l.depth[b])
                      - np.asarray(out_f.depth[b])).max() < 5e-6
        assert np.abs(np.asarray(out_l.flow[b])
                      - np.asarray(out_f.flow[b])).max() < 5e-3
    assert np.abs(np.asarray(out_l.junction_stage)
                  - np.asarray(out_f.junction_stage)).max() < 5e-6
    # members genuinely differ (the scaling is live)
    q = np.asarray(out_f.flow[0])[:, -1, 0]
    assert q[2] > q[0] + 1.0


def test_batched_network_dam_junction():
    """Batched network kernel with a junction-reservoir dam (shared
    junction config, per-member inflows): parity vs the vmapped loop
    engine including the per-member outflow trajectories."""
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    z_conf = float(np.asarray(branches[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    rc = rcurve.make_polynomial(0.0, 40.0, -40.0 * Y_init + 20.0)
    SA = 5.0e5
    us = branches[0].us
    series = np.asarray(us.target_series, np.float64)
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us, target_series=jnp.asarray(series) * s))(
            jnp.asarray([0.95, 1.1]))
    batch = [dict(us=us_b), dict()]
    kw = dict(junction_area=[SA], junction_rating=[rc])
    out_l = batched_simulate_network(branches, 1, sset, batch,
                                     engine="loop", **kw)
    out_f = batched_simulate_network(branches, 1, sset, batch,
                                     engine="fused", **kw)
    assert bool(np.asarray(out_f.converged).all())
    np.testing.assert_array_equal(np.asarray(out_f.iterations),
                                  np.asarray(out_l.iterations))
    np.testing.assert_allclose(np.asarray(out_f.junction_outflow),
                               np.asarray(out_l.junction_outflow),
                               atol=1e-3)
    assert np.abs(np.asarray(out_l.junction_stage)
                  - np.asarray(out_f.junction_stage)).max() < 5e-6


def _prismatic(n=16, slope=6e-4, width=120.0):
    from flowsim_tpu.geometry import TrapezoidGeometry

    z = np.linspace(slope * (n - 1) * 1000.0, 0.0, n)
    ones, zeros = np.ones(n), np.zeros(n)
    return TrapezoidGeometry(
        z_bed=jnp.asarray(z), b_main=jnp.asarray(width * ones),
        m_main=jnp.asarray(zeros), n_main=jnp.asarray(0.025 * ones),
        compound=jnp.asarray(np.zeros(n, bool)),
        h_bank=jnp.asarray(1e30 * ones),
        b_fp_left=jnp.asarray(zeros), b_fp_right=jnp.asarray(zeros),
        m_fp=jnp.asarray(zeros), n_left=jnp.asarray(0.025 * ones),
        n_right=jnp.asarray(0.025 * ones),
        bed_slope=jnp.asarray(slope * ones), curvature=jnp.asarray(zeros))


def test_storage_end_parity():
    """Constant-area lumped storage (storage_simple) on an external
    UPSTREAM network end — a reservoir draining through the split reach:
    iteration parity vs the loop engine and matching reservoir stages."""
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import storage as stg

    slope, dx, dt, nt = 6e-4, 1000.0, 1800.0, 13
    geo = _prismatic()
    z = np.asarray(geo.z_bed)
    us = bnd.make_boundary(
        "fixed_depth", bed_level=float(z[0]),
        storage=stg.make_storage(surface_area=4.0e6,
                                 min_stage=float(z[0]) - 5.0,
                                 solution_boundaries=(0.0, 100.0)))
    ds = bnd.make_boundary("normal_depth", bed_level=float(z[-1]),
                           bed_slope=slope)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 150.0, dx)
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-8,
                                  max_iter=100)
    cut = 8
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    branches = [
        BranchDef(geo=sl(slice(0, cut + 1)), dx=dx, us=us, ds=0,
                  h0=h0[: cut + 1], Q0=Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=dx, us=0, ds=ds,
                  h0=h0[cut:], Q0=Q0[cut:]),
    ]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    _assert_parity(out_l, out_f, 2, dh=5e-6, dY=5e-6)
    rs_l = np.asarray(out_l.reservoir_stage)[1:, 0, 0]
    rs_f = np.asarray(out_f.reservoir_stage)[1:, 0, 0]
    assert np.isfinite(rs_f).all()
    np.testing.assert_allclose(rs_f, rs_l, atol=5e-6)
    # the other slots stay NaN (no storage there), as in the XLA contract
    assert np.isnan(np.asarray(out_f.reservoir_stage)[1:, 0, 1]).all()
    assert np.isnan(np.asarray(out_f.reservoir_stage)[1:, 1, :]).all()


def test_mixed_end_kinds_parity():
    """MIXED external-end kinds in one fused dispatch: a diversion with two
    outlets of different ds kinds (normal_depth + fixed_h) fed by two
    feeders of different us kinds (flow_hydrograph + stage_hydrograph)."""
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic

    slope, dx, dt, nt = 6e-4, 1000.0, 1800.0, 11
    geo = _prismatic(n=31)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 150.0, dx)
    z = np.asarray(geo.z_bed)
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-8,
                                  max_iter=100)
    times = np.arange(nt, dtype=np.float64)
    flood = 150.0 + 80.0 * np.exp(-((times - 4.0) / 2.5) ** 2)
    us_q = bnd.make_boundary("flow_hydrograph", bed_level=float(z[0]),
                             target_series=flood)
    # second feeder: stage hydrograph pinned at its initial water level
    stage0 = float(z[0] + h0[0])
    us_h = bnd.make_boundary("stage_hydrograph", bed_level=float(z[0]),
                             target_series=np.full(nt, stage0))
    ds_n = bnd.make_boundary("normal_depth", bed_level=float(z[-1]),
                             bed_slope=slope)
    ds_h = bnd.make_boundary("fixed_depth", bed_level=float(z[-1]),
                             initial_depth=float(h0[-1]))
    mk = lambda s, us, ds: BranchDef(geo=sl(s), dx=dx, us=us, ds=ds,
                                     h0=h0[s], Q0=Q0[s])
    branches = [
        mk(slice(0, 11), us_q, 0),
        mk(slice(0, 11), us_h, 0),
        mk(slice(10, 21), 0, ds_n),
        mk(slice(10, 21), 0, ds_h),
    ]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    _assert_parity(out_l, out_f, 4, dh=5e-6, dY=5e-6)
    # both outlets actually carry flood water
    assert np.asarray(out_f.flow[2]).max() > 100.0
    assert np.asarray(out_f.flow[3]).max() > 10.0


def test_hbm_streaming_bitwise():
    """out_memory="hbm" (double-buffered DMA streaming of the six output
    stacks) must be bitwise-identical to the in-VMEM store, and removes
    the nt VMEM ceiling for network runs."""
    branches, sset = _split_akbari(nt=7)
    out_v = simulate_network(
        branches, 1, dataclasses.replace(sset, out_memory="vmem"),
        engine="fused")
    out_h = simulate_network(
        branches, 1, dataclasses.replace(sset, out_memory="hbm"),
        engine="fused")
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(out_v.depth[b]),
                                      np.asarray(out_h.depth[b]))
        np.testing.assert_array_equal(np.asarray(out_v.flow[b]),
                                      np.asarray(out_h.flow[b]))
    np.testing.assert_array_equal(np.asarray(out_v.junction_stage),
                                  np.asarray(out_h.junction_stage))
    np.testing.assert_array_equal(np.asarray(out_v.iterations),
                                  np.asarray(out_h.iterations))


def test_branch_qlat_parity():
    """Constant-in-time distributed lateral inflow on network branches:
    fused must match the XLA loop engine iteration-for-iteration (the
    inflow is a residual constant with no Jacobian term)."""
    branches, sset = _split_akbari(nt=9)
    qlat = [0.004 * (1.0 + np.linspace(0.0, 1.0, int(br.h0.shape[0])))
            for br in branches]
    branches = [dataclasses.replace(br, qlat=jnp.asarray(q))
                for br, q in zip(branches, qlat)]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    _assert_parity(out_l, out_f, 2, dh=1e-6, dY=1e-6)
    # the added volume actually shows up: downstream outflow exceeds the
    # no-inflow run's at the last level
    plain, _ = _split_akbari(nt=9)
    out_p = simulate_network(plain, 1, sset, engine="fused")
    assert (np.asarray(out_f.flow[1])[-1, -1]
            > np.asarray(out_p.flow[1])[-1, -1] + 1.0)


def test_time_varying_qlat_parity():
    """Time-varying [nt, N] lateral inflow (a storm pulse moving through
    the levels, one branch constant, one varying): the per-level
    theta-weighted cell averages must match the XLA loop engine
    iteration-for-iteration."""
    branches, sset = _split_akbari(nt=9)
    nt = sset.n_time_levels
    n0 = int(branches[0].h0.shape[0])
    n1 = int(branches[1].h0.shape[0])
    t = np.linspace(0.0, 1.0, nt)[:, None]
    pulse = 0.02 * np.exp(-((t - 0.4) / 0.2) ** 2) \
        * (1.0 + np.linspace(0.0, 1.0, n0))[None, :]
    branches = [dataclasses.replace(branches[0], qlat=jnp.asarray(pulse)),
                dataclasses.replace(branches[1],
                                    qlat=jnp.asarray(np.full(n1, 0.003)))]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    _assert_parity(out_l, out_f, 2, dh=1e-6, dY=1e-6)
    # the pulse is live: mid-run outflow exceeds the start's
    q = np.asarray(out_f.flow[1])[:, -1]
    assert q[nt // 2] > q[1] + 1.0


def test_batched_network_chunked(monkeypatch):
    """Ensembles beyond the VMEM member cap run as sequential fused
    dispatches, concatenated on the member axis — bitwise identical to
    one big dispatch."""
    import flowsim_tpu.ops.pallas.fused_network as fnet
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=7)
    us = branches[0].us
    series = np.asarray(us.target_series, np.float64)
    scales = np.linspace(0.9, 1.1, 10)
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us, target_series=jnp.asarray(series) * s))(jnp.asarray(scales))
    batch = [dict(us=us_b), dict()]

    out_one = batched_simulate_network(branches, 1, sset, batch,
                                       engine="fused")
    monkeypatch.setattr(fnet, "max_fused_network_batch",
                        lambda *a, **k: 8)
    out_chk = batched_simulate_network(branches, 1, sset, batch,
                                       engine="fused")
    np.testing.assert_array_equal(np.asarray(out_chk.iterations),
                                  np.asarray(out_one.iterations))
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(out_chk.depth[b]),
                                      np.asarray(out_one.depth[b]))
    np.testing.assert_array_equal(np.asarray(out_chk.junction_stage),
                                  np.asarray(out_one.junction_stage))


def test_batched_network_vmem_cap_raises():
    """Many-branch networks whose per-member working set can't fit even one
    8-member vreg block raise FusedUnsupported with a clear message (the
    basin-scale ensembles belong on the stacked engine)."""
    from flowsim_tpu.models import basin
    from flowsim_tpu.ops.pallas.fused_network import max_fused_network_batch
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    from flowsim_tpu.ops.network import _is_junction

    bb, bnj, bsset = basin.build(levels=4, sim_hours=6)
    assert max_fused_network_batch(bb, bsset) < 8
    bi = next(i for i, br in enumerate(bb) if not _is_junction(br.us))
    us0 = bb[bi].us
    se = np.asarray(us0.target_series, np.float64)
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us0, target_series=jnp.asarray(se) * s))(jnp.asarray([0.9, 1.1]))
    batch = [dict(us=us_b) if i == bi else dict() for i in range(len(bb))]
    with pytest.raises(FusedUnsupported, match="stacked"):
        batched_simulate_network(bb, bnj, bsset, batch, engine="fused")


def _table_reach(samples=48, n_nodes=9, nt=17):
    """A TableGeometry reach + BCs + settings (the test_fused_newton
    table-parity builder at a network-friendly resolution)."""
    from flowsim_tpu.geometry_tables import (IrregularStation,
                                             build_table_geometry)
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic

    length, slope = 8000.0, 2e-4

    def section_pts(seed, z0):
        rng = np.random.default_rng(seed)
        x = np.linspace(0, 220, 21)
        z = z0 + 8.0 * ((x - 110) / 110) ** 2 + rng.uniform(0, 0.5, x.size)
        return x, z

    x1, z1 = section_pts(1, slope * length)
    x2, z2 = section_pts(2, 0.0)
    node_ch = np.linspace(0, length, n_nodes)
    sts = [IrregularStation(x=x1, z=z1, n_main=0.03, bed_slope=slope),
           IrregularStation(x=x2, z=z2, n_main=0.03, bed_slope=slope)]
    geo = build_table_geometry(sts, [0.0, length], node_ch, samples=samples)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 400.0, 1000.0)
    times = np.arange(nt) * 1800.0
    us_p = bnd.make_boundary(
        "flow_hydrograph", bed_level=float(geo.z_bed[0]),
        target_series=[400.0 + 600.0 * min(t / (4 * 3600.0), 1.0)
                       for t in times])
    ds_p = bnd.make_boundary("normal_depth", bed_level=float(geo.z_bed[-1]),
                             bed_slope=float(geo.bed_slope[-1]))
    sset = prs.PreissmannSettings(theta=0.7, time_step=1800.0,
                                  spatial_step=1000.0, n_time_levels=nt,
                                  tolerance=1e-8, max_iter=100)
    return geo, us_p, ds_p, h0, Q0, sset, times


def test_table_network_parity():
    """TableGeometry branches in the fused network kernel (per-sublane
    mask-accumulated table lookup, fused_newton._section_df_table_rows):
    a split table reach matches the loop engine with identical iteration
    counts."""
    geo, us_p, ds_p, h0, Q0, sset, _ = _table_reach()
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    brs = [BranchDef(geo=sl(slice(0, 5)), dx=1000.0, us=us_p, ds=0,
                     h0=h0[:5], Q0=Q0[:5]),
           BranchDef(geo=sl(slice(4, None)), dx=1000.0, us=0, ds=ds_p,
                     h0=h0[4:], Q0=Q0[4:])]
    ref = simulate_network(brs, 1, sset, engine="loop")
    out = fused_simulate_network(brs, 1, sset, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    assert bool(np.asarray(out.converged).all())
    for b in range(2):
        assert np.abs(np.asarray(out.depth[b])
                      - np.asarray(ref.depth[b])).max() < 1e-5
    assert np.abs(np.asarray(out.junction_stage)
                  - np.asarray(ref.junction_stage)).max() < 1e-5


def test_mixed_table_trap_network_parity():
    """MIXED networks (table main stem + trapezoid tributary): both
    closures evaluate per sublane and the static kind mask selects, so
    each branch's physics matches the XLA loop engine exactly."""
    from flowsim_tpu.geometry import interpolate_stations, trapezoid_station
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic

    geo, us_p, ds_p, h0, Q0, sset, times = _table_reach()
    slope = 2e-4
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    z_conf = float(np.asarray(geo.z_bed)[4])
    st_a = trapezoid_station(z_bed=z_conf + 4000.0 * slope, b_main=40.0,
                             m_main=2.0, n_main=0.03, bed_slope=slope)
    st_b = trapezoid_station(z_bed=z_conf, b_main=40.0, m_main=2.0,
                             n_main=0.03, bed_slope=slope)
    gT = interpolate_stations([st_a, st_b], [0.0, 4000.0],
                              np.linspace(0.0, 4000.0, 5))
    hT, QT = ic.initial_conditions(gT, "steady-state", 150.0, 1000.0)
    us_t = bnd.make_boundary(
        "flow_hydrograph", bed_level=float(gT.z_bed[0]),
        target_series=[150.0 + 150.0 * min(t / (4 * 3600.0), 1.0)
                       for t in times])
    brs = [BranchDef(geo=sl(slice(0, 5)), dx=1000.0, us=us_p, ds=0,
                     h0=h0[:5], Q0=Q0[:5]),
           BranchDef(geo=gT, dx=1000.0, us=us_t, ds=0, h0=hT, Q0=QT),
           BranchDef(geo=sl(slice(4, None)), dx=1000.0, us=0, ds=ds_p,
                     h0=h0[4:], Q0=Q0[4:] + 150.0)]
    ref = simulate_network(brs, 1, sset, engine="loop")
    out = fused_simulate_network(brs, 1, sset, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    assert bool(np.asarray(out.converged).all())
    for b in range(3):
        assert np.abs(np.asarray(out.depth[b])
                      - np.asarray(ref.depth[b])).max() < 1e-5


def test_table_network_guards():
    """Mismatched depth-grid resolutions and VMEM-exceeding tables raise
    FusedUnsupported with actionable messages."""
    geo, us_p, ds_p, h0, Q0, sset, _ = _table_reach()
    geo64, *_ = _table_reach(samples=64)
    sl = lambda g, s: jax.tree_util.tree_map(lambda x: x[s], g)
    brs = [BranchDef(geo=sl(geo, slice(0, 5)), dx=1000.0, us=us_p, ds=0,
                     h0=h0[:5], Q0=Q0[:5]),
           BranchDef(geo=sl(geo64, slice(4, None)), dx=1000.0, us=0,
                     ds=ds_p, h0=h0[4:], Q0=Q0[4:])]
    with pytest.raises(FusedUnsupported, match="resolution"):
        fused_simulate_network(brs, 1, sset, interpret=True)

    geo_big, *_ = _table_reach(samples=4096)
    brs_big = [BranchDef(geo=sl(geo_big, slice(0, 5)), dx=1000.0, us=us_p,
                         ds=0, h0=h0[:5], Q0=Q0[:5]),
               BranchDef(geo=sl(geo_big, slice(4, None)), dx=1000.0, us=0,
                         ds=ds_p, h0=h0[4:], Q0=Q0[4:])]
    with pytest.raises(FusedUnsupported, match="VMEM"):
        fused_simulate_network(brs_big, 1, sset, interpret=True)


def test_cross_branch_storage_ends_parity():
    """Branch A carries storage on its external UPSTREAM end while branch
    B carries storage on its external DOWNSTREAM end (regression: the
    single-reach rule "the upstream stage takes the reservoir-stage slot"
    used to clobber branch B's ds stage carry in network mode)."""
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import storage as stg

    slope, dx, dt, nt = 6e-4, 1000.0, 1800.0, 13
    geo = _prismatic()
    z = np.asarray(geo.z_bed)
    us = bnd.make_boundary(
        "fixed_depth", bed_level=float(z[0]),
        storage=stg.make_storage(surface_area=4.0e6,
                                 min_stage=float(z[0]) - 5.0,
                                 solution_boundaries=(0.0, 100.0)))
    ds = bnd.make_boundary(
        "fixed_depth", bed_level=float(z[-1]),
        storage=stg.make_storage(surface_area=6.0e6,
                                 min_stage=float(z[-1]) - 5.0,
                                 solution_boundaries=(0.0, 100.0)))
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 150.0, dx)
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-8,
                                  max_iter=100)
    cut = 8
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    branches = [
        BranchDef(geo=sl(slice(0, cut + 1)), dx=dx, us=us, ds=0,
                  h0=h0[: cut + 1], Q0=Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=dx, us=0, ds=ds,
                  h0=h0[cut:], Q0=Q0[cut:]),
    ]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    # the dual-reservoir bootstrap level is stiff: BOTH engines hit
    # max_iter at k=1 identically, so assert engine parity (identical
    # per-level iterations/convergence), not absolute convergence
    np.testing.assert_array_equal(np.asarray(out_f.iterations),
                                  np.asarray(out_l.iterations))
    np.testing.assert_array_equal(np.asarray(out_f.converged),
                                  np.asarray(out_l.converged))
    for b in range(2):
        assert np.abs(np.asarray(out_f.depth[b])
                      - np.asarray(out_l.depth[b])).max() < 5e-6
    # branch 0's us slot and branch 1's ds slot both carry their OWN stage
    for b, side in ((0, 0), (1, 1)):
        rs_l = np.asarray(out_l.reservoir_stage)[1:, b, side]
        rs_f = np.asarray(out_f.reservoir_stage)[1:, b, side]
        assert np.isfinite(rs_f).all()
        np.testing.assert_allclose(rs_f, rs_l, atol=5e-6)
    assert np.isnan(np.asarray(out_f.reservoir_stage)[1:, 0, 1]).all()
    assert np.isnan(np.asarray(out_f.reservoir_stage)[1:, 1, 0]).all()


def test_batched_network_qlat_override():
    """A per-member batch override can INTRODUCE lateral inflow on a
    branch whose base qlat is None (regression: qlat_mode was derived
    from the base branches only, silently dropping the override)."""
    import dataclasses as _dc

    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=7)
    scales = np.asarray([0.5, 1.0, 2.0])
    n0 = int(np.asarray(branches[0].h0).shape[0])
    q_base = 0.01 * (1.0 + np.linspace(0.0, 1.0, n0))
    q_b = jnp.asarray(scales[:, None] * q_base[None, :])
    batch = [dict(qlat=q_b), dict()]
    out = batched_simulate_network(branches, 1, sset, batch, engine="fused")
    for m, s in enumerate(scales):
        brm = [_dc.replace(branches[0], qlat=jnp.asarray(q_base * s)),
               branches[1]]
        ref = simulate_network(brm, 1, sset, engine="loop")
        np.testing.assert_array_equal(np.asarray(out.iterations)[m],
                                      np.asarray(ref.iterations))
        for b in range(2):
            assert np.abs(np.asarray(out.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 5e-6
    # members actually differ
    fl = np.asarray(out.flow[1])[:, -1, -1]
    assert len(set(np.round(fl, 5))) == 3


def test_network_storage_curve_parity():
    """Generalized lumped storage (stage-area curve + storage rating +
    entrance losses) on an external network end, evaluated per sublane on
    the stage grid (fused_newton._stg_pick): parity vs the loop engine."""
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops import storage as stg

    branches, sset = _split_akbari(nt=9)
    bed_ds = float(np.asarray(branches[1].geo.z_bed)[-1])
    ac_stages = bed_ds + np.linspace(-2.0, 25.0, 12)
    sp = stg.make_storage(
        area_curve=np.stack([ac_stages,
                             4.0e5 * (1.0 + 0.08 * np.arange(12))], axis=1),
        min_stage=bed_ds - 1.0,
        rating=rcurve.make_polynomial(0.0, 30.0, -30.0 * (bed_ds - 1.0)),
        capture_losses=True, reservoir_length=1500.0, K_q=0.2)
    ds_new = dataclasses.replace(branches[1].ds, kind="fixed_depth",
                                 storage=sp)
    brs = [branches[0], dataclasses.replace(branches[1], ds=ds_new)]
    out_l = simulate_network(brs, 1, sset, engine="loop")
    out_f = simulate_network(brs, 1, sset, engine="fused")
    it_l = np.asarray(out_l.iterations)
    it_f = np.asarray(out_f.iterations)
    # within-1: the grid inverse vs bisection can sit a hair apart at a
    # single level (same tolerance band as the single-reach curve tests)
    assert (np.abs(it_l - it_f) <= 1).all()
    assert bool(np.asarray(out_f.converged).all())
    for b in range(2):
        assert np.abs(np.asarray(out_f.depth[b])
                      - np.asarray(out_l.depth[b])).max() < 1e-4
    rs_l = np.asarray(out_l.reservoir_stage)[1:, 1, 1]
    rs_f = np.asarray(out_f.reservoir_stage)[1:, 1, 1]
    assert np.isfinite(rs_f).all()
    np.testing.assert_allclose(rs_f, rs_l, atol=1e-4)


def test_batched_network_storage_curve():
    """Per-member generalized lumped storage on a network end in the
    BATCHED network kernel (stage-grid tables per member x branch
    sublane): each member matches its own serial loop-engine run."""
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops import storage as stg
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    bed_ds = float(np.asarray(branches[1].geo.z_bed)[-1])
    ac_stages = bed_ds + np.linspace(-2.0, 25.0, 12)
    sp = stg.make_storage(
        area_curve=np.stack([ac_stages,
                             4.0e5 * (1.0 + 0.08 * np.arange(12))], axis=1),
        min_stage=bed_ds - 1.0,
        rating=rcurve.make_polynomial(0.0, 30.0, -30.0 * (bed_ds - 1.0)))
    ds_new = dataclasses.replace(branches[1].ds, kind="fixed_depth",
                                 storage=sp)
    brs = [branches[0], dataclasses.replace(branches[1], ds=ds_new)]
    us0 = brs[0].us
    se = np.asarray(us0.target_series, np.float64)
    scales = np.asarray([0.9, 1.0, 1.1])
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us0, target_series=jnp.asarray(se) * s))(jnp.asarray(scales))
    out = batched_simulate_network(brs, 1, sset, [dict(us=us_b), dict()],
                                   engine="fused")
    for m, s in enumerate(scales):
        brm = [dataclasses.replace(brs[0], us=dataclasses.replace(
            us0, target_series=jnp.asarray(se * s))), brs[1]]
        ref = simulate_network(brm, 1, sset, engine="loop")
        assert (np.abs(np.asarray(out.iterations)[m]
                       - np.asarray(ref.iterations)) <= 1).all()
        for b in range(2):
            assert np.abs(np.asarray(out.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 1e-4
        rs_r = np.asarray(ref.reservoir_stage)[1:, 1, 1]
        rs_f = np.asarray(out.reservoir_stage)[m][1:, 1, 1]
        np.testing.assert_allclose(rs_f, rs_r, atol=1e-4)


def test_batched_network_tv_qlat():
    """Time-varying lateral inflow in the BATCHED network kernel: the
    [nt, BM, Np] cell-average stack stays in HBM and the kernel
    DMA-streams one level-row per level.  Mixed sources — a shared
    [nt, N] field on one branch plus per-member [M, nt, N] overrides on
    another — each member matches its serial loop run."""
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    nt = sset.n_time_levels
    n0 = int(np.asarray(branches[0].h0).shape[0])
    n1 = int(np.asarray(branches[1].h0).shape[0])
    t = np.linspace(0, 1, nt)[:, None]
    q1_tv = 0.02 * np.exp(-((t - 0.4) / 0.25) ** 2) \
        * (1 + np.linspace(0, 1, n1))[None]
    br1 = dataclasses.replace(branches[1], qlat=jnp.asarray(q1_tv))
    scales = np.asarray([0.5, 1.0, 2.0])
    q0_base = (0.01 * (1 + np.linspace(0, 1, n0))[None, :]
               * np.ones((nt, 1)) * (1 + 0.5 * np.sin(2 * np.pi * t)))
    q0_mem = jnp.asarray(scales[:, None, None] * q0_base[None])
    out = batched_simulate_network([branches[0], br1], 1, sset,
                                   [dict(qlat=q0_mem), dict()],
                                   engine="fused")
    for m, s in enumerate(scales):
        brm = [dataclasses.replace(branches[0],
                                   qlat=jnp.asarray(q0_base * s)), br1]
        ref = simulate_network(brm, 1, sset, engine="loop")
        np.testing.assert_array_equal(np.asarray(out.iterations)[m],
                                      np.asarray(ref.iterations))
        for b in range(2):
            assert np.abs(np.asarray(out.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 1e-4


def test_junction_poly_n_rating_parity():
    """Arbitrary-degree (poly_n) rated junction outflow: the kernel packs
    descending-coefficient Horner blocks and uses the ANALYTIC derivative
    polynomial (matching rcurve.dQ_dz), so iteration counts match the
    loop engine exactly — single and member-batched network kernels."""
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    z_conf = float(np.asarray(branches[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    rc = rcurve.make_polynomial_general(
        np.array([5.0, 20.0, 6.0, 1.5, 0.25]),  # ascending, degree 4
        stage_shift=-(Y_init - 1.0))
    assert rc.kind == "poly_n"
    SA = 5.0e5
    kw = dict(junction_area=[SA], junction_rating=[rc])
    out_l = simulate_network(branches, 1, sset, engine="loop", **kw)
    out_f = simulate_network(branches, 1, sset, engine="fused", **kw)
    _assert_parity(out_l, out_f, 2, dh=1e-4, dY=1e-4)
    assert np.asarray(out_f.junction_outflow)[1:, 0].min() > 0.0

    us0 = branches[0].us
    se = np.asarray(us0.target_series, np.float64)
    scales = np.asarray([0.9, 1.1])
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us0, target_series=jnp.asarray(se) * s))(jnp.asarray(scales))
    outb = batched_simulate_network(branches, 1, sset,
                                    [dict(us=us_b), dict()],
                                    engine="fused", **kw)
    for m, s in enumerate(scales):
        brm = [dataclasses.replace(branches[0], us=dataclasses.replace(
            us0, target_series=jnp.asarray(se * s))), branches[1]]
        ref = simulate_network(brm, 1, sset, engine="loop", **kw)
        np.testing.assert_array_equal(np.asarray(outb.iterations)[m],
                                      np.asarray(ref.iterations))
        for b in range(2):
            assert np.abs(np.asarray(outb.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 1e-4


def test_junction_table_rating_parity():
    """Round-5: TABLE junction release curves run in-kernel via exact
    per-segment masked eval on the user's own breakpoints — iteration
    counts identical to the loop engine (single + batched kernels)."""
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    z_conf = float(np.asarray(branches[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    stages = Y_init + np.array([-2.0, -0.5, 0.0, 0.4, 1.1, 2.5, 6.0])
    qs = np.array([0.0, 40.0, 100.0, 180.0, 420.0, 900.0, 2500.0])
    rc = rcurve.make_table(stages, qs)
    SA = 5.0e5
    kw = dict(junction_area=[SA], junction_rating=[rc])
    out_l = simulate_network(branches, 1, sset, engine="loop", **kw)
    out_f = simulate_network(branches, 1, sset, engine="fused", **kw)
    _assert_parity(out_l, out_f, 2, dh=1e-4, dY=1e-4)

    us0 = branches[0].us
    se = np.asarray(us0.target_series, np.float64)
    scales = np.asarray([0.9, 1.1])
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us0, target_series=jnp.asarray(se) * s))(jnp.asarray(scales))
    outb = batched_simulate_network(branches, 1, sset,
                                    [dict(us=us_b), dict()],
                                    engine="fused", **kw)
    for m, s in enumerate(scales):
        brm = [dataclasses.replace(branches[0], us=dataclasses.replace(
            us0, target_series=jnp.asarray(se * s))), branches[1]]
        ref = simulate_network(brm, 1, sset, engine="loop", **kw)
        # within-1: a member whose converged residual sits in the
        # f32-constant-rounding band of the tolerance may flip one
        # iteration (docs/PRECISION.md)
        assert np.abs(np.asarray(outb.iterations)[m]
                      - np.asarray(ref.iterations)).max() <= 1
        for b in range(2):
            assert np.abs(np.asarray(outb.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 1e-4


def test_junction_power_rating_parity():
    """Round-5: POWER junction release curves (Q = a x^b) run in-kernel via
    df32 exp/log (exact to ~1e-11 relative) — iteration counts identical
    to the loop engine (single + batched kernels)."""
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    branches, sset = _split_akbari(nt=9)
    z_conf = float(np.asarray(branches[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(branches[0].h0)[-1])
    # x = Y + shift ~ 3 at the initial stage, Q(Y0) ~ 15 (a small rated
    # withdrawal: larger ones drain the junction to divergence on EVERY
    # engine — the loop engine NaNs too)
    rc = rcurve.make_power(a=15.0 / 3.0 ** 1.6, b=1.6,
                           stage_shift=-(Y_init - 3.0))
    SA = 5.0e5
    kw = dict(junction_area=[SA], junction_rating=[rc])
    out_l = simulate_network(branches, 1, sset, engine="loop", **kw)
    out_f = simulate_network(branches, 1, sset, engine="fused", **kw)
    _assert_parity(out_l, out_f, 2, dh=1e-4, dY=1e-4)

    us0 = branches[0].us
    se = np.asarray(us0.target_series, np.float64)
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us0, target_series=jnp.asarray(se) * s))(jnp.asarray([0.9, 1.1]))
    outb = batched_simulate_network(branches, 1, sset,
                                    [dict(us=us_b), dict()],
                                    engine="fused", **kw)
    for m, s in enumerate((0.9, 1.1)):
        brm = [dataclasses.replace(branches[0], us=dataclasses.replace(
            us0, target_series=jnp.asarray(se * s))), branches[1]]
        ref = simulate_network(brm, 1, sset, engine="loop", **kw)
        assert np.abs(np.asarray(outb.iterations)[m]
                      - np.asarray(ref.iterations)).max() <= 1
        for b in range(2):
            assert np.abs(np.asarray(outb.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 1e-4


def test_junction_table_rating_guards():
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops.pallas.fused_network import (_JTAB_MAX_T,
                                                      fused_simulate_network)

    branches, sset = _split_akbari(nt=5)
    big = np.linspace(0.0, 10.0, _JTAB_MAX_T + 1)
    rc = rcurve.make_table(big, big * 10.0)
    with pytest.raises(FusedUnsupported, match="breakpoints"):
        fused_simulate_network(branches, 1, sset, junction_rating=[rc],
                               junction_area=[1e5], interpret=True)
    rc2 = rcurve.make_table(np.array([1.0, 0.5, 2.0]),
                            np.array([0.0, 1.0, 2.0]))
    with pytest.raises(FusedUnsupported, match="increasing"):
        fused_simulate_network(branches, 1, sset, junction_rating=[rc2],
                               junction_area=[1e5], interpret=True)


def test_branch_both_ends_storage_parity():
    """Round-5: ONE branch carrying lumped storage on BOTH external ends
    runs in the network kernel (upstream stage carry + *_US slots + second
    per-branch table block).  Branch 0 is the known-good both-ends reach
    of tests/test_both_boundary_storage; branches 1-2 form a junction pair
    so the dispatch is a real network."""
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.parallel.ensemble import batched_simulate_network
    from tests.test_both_boundary_storage import DT, DX, build

    geo_b, us_b0, ds_b0, h0_b, Q0_b = build()
    slope = 6e-4
    geo = _prismatic()
    z = np.asarray(geo.z_bed)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 150.0, DX)
    cut = 8
    sl = lambda s_: jax.tree_util.tree_map(lambda x: x[s_], geo)
    us_q = bnd.make_boundary(
        "flow_hydrograph", bed_level=float(z[0]),
        target_series=np.full(11, 150.0))
    ds_n = bnd.make_boundary("normal_depth", bed_level=float(z[-1]),
                             bed_slope=slope)
    sset = prs.PreissmannSettings(theta=0.6, time_step=DT, spatial_step=DX,
                                  n_time_levels=11, tolerance=1e-8,
                                  max_iter=100)
    branches = [
        BranchDef(geo=geo_b, dx=DX, us=us_b0, ds=ds_b0, h0=h0_b, Q0=Q0_b),
        BranchDef(geo=sl(slice(0, cut + 1)), dx=DX, us=us_q, ds=0,
                  h0=h0[: cut + 1], Q0=Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=DX, us=0, ds=ds_n,
                  h0=h0[cut:], Q0=Q0[cut:]),
    ]
    out_l = simulate_network(branches, 1, sset, engine="loop")
    out_f = simulate_network(branches, 1, sset, engine="fused")
    np.testing.assert_array_equal(np.asarray(out_f.iterations),
                                  np.asarray(out_l.iterations))
    np.testing.assert_array_equal(np.asarray(out_f.converged),
                                  np.asarray(out_l.converged))
    for b in range(3):
        assert np.abs(np.asarray(out_f.depth[b])
                      - np.asarray(out_l.depth[b])).max() < 5e-6
    # branch 0 reports BOTH stages, independently evolving
    for side in (0, 1):
        rs_l = np.asarray(out_l.reservoir_stage)[1:, 0, side]
        rs_f = np.asarray(out_f.reservoir_stage)[1:, 0, side]
        assert np.isfinite(rs_f).all()
        np.testing.assert_allclose(rs_f, rs_l, atol=5e-6)

    # member-batched: 2 members scaling branch-1 inflow
    se = np.asarray(us_q.target_series, np.float64)
    usv = jax.vmap(lambda sc: dataclasses.replace(
        us_q, target_series=jnp.asarray(se) * sc))(jnp.asarray([0.95, 1.05]))
    outb = batched_simulate_network(
        branches, 1, sset, [dict(), dict(us=usv), dict()], engine="fused")
    for m, sc in enumerate((0.95, 1.05)):
        brm = [branches[0],
               dataclasses.replace(branches[1], us=dataclasses.replace(
                   us_q, target_series=jnp.asarray(se * sc))),
               branches[2]]
        ref = simulate_network(brm, 1, sset, engine="loop")
        assert np.abs(np.asarray(outb.iterations)[m]
                      - np.asarray(ref.iterations)).max() <= 1
        for side in (0, 1):
            rs_f = np.asarray(outb.reservoir_stage)[m][1:, 0, side]
            rs_l = np.asarray(ref.reservoir_stage)[1:, 0, side]
            np.testing.assert_allclose(rs_f, rs_l, atol=5e-6)


def test_batched_table_network_parity():
    """Round-5: batched NETWORK kernel with a TableGeometry branch (mixed
    table + trapezoid network; members share each branch's tables) —
    per-member iteration counts within 1 of serial loop-engine runs."""
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    geo, us_p, ds_p, h0, Q0, sset, _ = _table_reach()
    sl = lambda s_: jax.tree_util.tree_map(lambda x: x[s_], geo)
    branches = [BranchDef(geo=sl(slice(0, 5)), dx=1000.0, us=us_p, ds=0,
                          h0=h0[:5], Q0=Q0[:5]),
                BranchDef(geo=sl(slice(4, None)), dx=1000.0, us=0, ds=ds_p,
                          h0=h0[4:], Q0=Q0[4:])]
    us0 = branches[0].us
    se = np.asarray(us0.target_series, np.float64)
    us_b = jax.vmap(lambda sc: dataclasses.replace(
        us0, target_series=jnp.asarray(se) * sc))(jnp.asarray([0.9, 1.1]))
    outb = batched_simulate_network(branches, 1, sset,
                                    [dict(us=us_b), dict()],
                                    engine="fused")
    for m, sc in enumerate((0.9, 1.1)):
        brm = [dataclasses.replace(branches[0], us=dataclasses.replace(
            us0, target_series=jnp.asarray(se * sc))), branches[1]]
        ref = simulate_network(brm, 1, sset, engine="loop")
        assert np.abs(np.asarray(outb.iterations)[m]
                      - np.asarray(ref.iterations)).max() <= 1
        assert bool(np.asarray(outb.converged)[m].all())
        for b in range(2):
            assert np.abs(np.asarray(outb.depth[b])[m]
                          - np.asarray(ref.depth[b])).max() < 1e-4
