"""River-network (junction) solver tests (ops/network.py — a capability
beyond the reference, which is strictly single-reach).

Oracles:
1. A single reach split in two at an interior node and rejoined through a
   junction must reproduce the single-reach solution closely (the junction
   replaces one node's continuity/momentum pair with equal-stage +
   discharge-continuity — the standard 1-D junction treatment, exact up to
   the neglected momentum flux through the junction).
2. A symmetric Y-split must route exactly half the flow down each arm.
3. Discharge continuity at every junction must hold to solver tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops.network import BranchDef, NetworkOutput, simulate_network

HOURS = 20


def akbari_like():
    """Rectangular 29 km reach: flow-hydrograph us, normal-depth ds (the
    akbari_firoozi configuration — no storage, v1 network BC surface)."""
    from flowsim_tpu.models import akbari_firoozi as ak

    solver, channel = ak.build()
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    return solver, dataclasses.replace(sset, n_time_levels=HOURS + 1)


def slice_geo(geo, sl):
    return jax.tree_util.tree_map(lambda x: x[sl], geo)


def test_serial_split_matches_single_reach():
    solver, sset = akbari_like()
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)

    cut = 15  # interior node index shared by both branches
    br1 = BranchDef(geo=slice_geo(geo, slice(0, cut + 1)), dx=solver.spatial_step,
                    us=solver.us_params, ds=0,
                    h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1])
    br2 = BranchDef(geo=slice_geo(geo, slice(cut, None)), dx=solver.spatial_step,
                    us=0, ds=solver.ds_params,
                    h0=solver.h0[cut:], Q0=solver.Q0[cut:])
    out = simulate_network([br1, br2], n_junctions=1, settings=sset)
    assert isinstance(out, NetworkOutput)
    assert bool(np.asarray(out.converged).all())

    d1, d2 = np.asarray(out.depth[0]), np.asarray(out.depth[1])
    q1, q2 = np.asarray(out.flow[0]), np.asarray(out.flow[1])
    d_ref, q_ref = np.asarray(ref.depth), np.asarray(ref.flow)

    # equal stage at the junction is exact by construction
    np.testing.assert_allclose(d1[:, -1], d2[:, 0], rtol=0, atol=1e-9)
    # discharge continuity across the junction to solver tolerance
    assert np.abs(q1[:, -1] - q2[:, 0]).max() < 1e-5

    # network vs single reach: the junction loses one interior momentum
    # balance, so agreement is physical, not bitwise
    assert np.abs(d1 - d_ref[:, : cut + 1]).max() < 2e-3
    assert np.abs(d2 - d_ref[:, cut:]).max() < 2e-3
    assert np.abs(q1 - q_ref[:, : cut + 1]).max() < 2.0
    assert np.abs(q2 - q_ref[:, cut:]).max() < 2.0


def test_symmetric_y_split():
    """One feeder splits into two identical arms: each carries exactly half
    the junction discharge, and the junction balances to tolerance."""
    solver, sset = akbari_like()
    geo = solver.channel.geometry
    cut = 15
    feeder_geo = slice_geo(geo, slice(0, cut + 1))
    arm_geo = slice_geo(geo, slice(cut, None))

    from flowsim_tpu.ops import initial_conditions as ic

    # consistent t=0 state: each arm starts at steady normal depth for HALF
    # the feeder's initial flow
    h_arm, Q_arm = ic.initial_conditions(
        arm_geo, "steady-state", float(solver.Q0[0]) / 2.0,
        solver.spatial_step)
    feeder = BranchDef(geo=feeder_geo, dx=solver.spatial_step,
                       us=solver.us_params, ds=0,
                       h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1])
    arm = lambda: BranchDef(geo=arm_geo, dx=solver.spatial_step,
                            us=0, ds=solver.ds_params, h0=h_arm, Q0=Q_arm)
    out = simulate_network([feeder, arm(), arm()], n_junctions=1,
                           settings=sset)
    assert bool(np.asarray(out.converged).all())
    qf = np.asarray(out.flow[0])
    qa = np.asarray(out.flow[1])
    qb = np.asarray(out.flow[2])
    # exact symmetry: the two arms see identical systems
    np.testing.assert_allclose(qa, qb, rtol=0, atol=1e-6)
    # junction continuity
    assert np.abs(qf[:, -1] - (qa[:, 0] + qb[:, 0])).max() < 1e-5
    # each arm carries about half the feeder peak
    assert abs(qa[:, 0].max() / qf[:, -1].max() - 0.5) < 1e-3


def test_confluence_mass_balance():
    """Two feeders merging into one arm: junction imbalance ~0 every level,
    and the downstream arm carries the sum."""
    solver, sset = akbari_like()
    geo = solver.channel.geometry
    cut = 15
    feeder_geo = slice_geo(geo, slice(0, cut + 1))
    arm_geo = slice_geo(geo, slice(cut, None))

    from flowsim_tpu.ops import initial_conditions as ic

    def feeder(scale):
        us = dataclasses.replace(
            solver.us_params,
            target_series=jnp.asarray(
                np.asarray(solver.us_params.target_series) * scale))
        h0, Q0 = ic.initial_conditions(
            feeder_geo, "steady-state", float(solver.Q0[0]) * scale,
            solver.spatial_step)
        return BranchDef(geo=feeder_geo, dx=solver.spatial_step,
                         us=us, ds=0, h0=h0, Q0=Q0)

    h_arm, Q_arm = ic.initial_conditions(
        arm_geo, "steady-state", float(solver.Q0[0]) * 1.5,
        solver.spatial_step)
    arm = BranchDef(geo=arm_geo, dx=solver.spatial_step,
                    us=0, ds=solver.ds_params, h0=h_arm, Q0=Q_arm)
    out = simulate_network([feeder(1.0), feeder(0.5), arm], n_junctions=1,
                           settings=sset)
    assert bool(np.asarray(out.converged).all())
    q0 = np.asarray(out.flow[0])
    q1 = np.asarray(out.flow[1])
    qa = np.asarray(out.flow[2])
    assert np.abs(q0[:, -1] + q1[:, -1] - qa[:, 0]).max() < 1e-5
    # the junction stage is a sensible water level (above both bed ends)
    Y = np.asarray(out.junction_stage)[:, 0]
    z_end = float(np.asarray(feeder_geo.z_bed)[-1])
    assert (Y > z_end).all()


def _split_in_two(solver, cut, sset):
    """The single reach of ``solver`` as a 2-branch network joined at one
    plain junction (the same-physics oracle construction of
    test_serial_split_matches_single_reach)."""
    geo = solver.channel.geometry
    br1 = BranchDef(geo=slice_geo(geo, slice(0, cut + 1)), dx=solver.spatial_step,
                    us=solver.us_params, ds=0,
                    h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1])
    br2 = BranchDef(geo=slice_geo(geo, slice(cut, None)), dx=solver.spatial_step,
                    us=0, ds=solver.ds_params,
                    h0=solver.h0[cut:], Q0=solver.Q0[cut:])
    return [br1, br2]


def test_storage_end_matches_single_reach():
    """A lumped-storage (fixed_depth + reservoir) downstream end on a network
    branch: the split example case must reproduce the single-reach solution
    including the carried reservoir-stage trajectory (ref boundary.py:97-133
    is the single-reach downstream-storage case)."""
    from flowsim_tpu.models import example

    solver, _ = example.build()
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)
    out = simulate_network(_split_in_two(solver, 10, sset), n_junctions=1,
                           settings=sset)
    assert bool(np.asarray(out.converged).all())

    # reservoir stage: branch 1's ds end vs the single-reach carry
    rs_net = np.asarray(out.reservoir_stage)[:, 1, 1]
    rs_ref = np.asarray(ref.reservoir_stage)
    assert np.abs(rs_net[1:] - rs_ref[1:]).max() < 5e-3
    # unused end slots stay NaN
    assert np.isnan(np.asarray(out.reservoir_stage)[1:, 0, 0]).all()

    d2 = np.asarray(out.depth[1])
    d_ref = np.asarray(ref.depth)[:, 10:]
    assert np.abs(d2 - d_ref).max() < 5e-3


def test_upstream_storage_network_end():
    """Orientation-aware upstream storage on a network branch: draining
    reservoir physics (stage strictly decreasing, exact mass balance) carries
    over from the single-reach extension (test_bc_completeness)."""
    import jax.numpy as jnp

    from flowsim_tpu.geometry import TrapezoidGeometry
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import storage as stg

    n, slope, dx, dt, nt = 16, 6e-4, 1000.0, 1800.0, 13
    z = np.linspace(slope * (n - 1) * dx, 0.0, n)
    ones, zeros = np.ones(n), np.zeros(n)
    geo = TrapezoidGeometry(
        z_bed=jnp.asarray(z), b_main=jnp.asarray(120.0 * ones),
        m_main=jnp.asarray(zeros), n_main=jnp.asarray(0.025 * ones),
        compound=jnp.asarray(np.zeros(n, bool)), h_bank=jnp.asarray(1e30 * ones),
        b_fp_left=jnp.asarray(zeros), b_fp_right=jnp.asarray(zeros),
        m_fp=jnp.asarray(zeros), n_left=jnp.asarray(0.025 * ones),
        n_right=jnp.asarray(0.025 * ones), bed_slope=jnp.asarray(slope * ones),
        curvature=jnp.asarray(zeros))
    SA = 4.0e6
    us = bnd.make_boundary(
        "fixed_depth", bed_level=float(z[0]),
        storage=stg.make_storage(surface_area=SA, min_stage=float(z[0]) - 5.0,
                                 solution_boundaries=(0.0, 100.0)))
    ds = bnd.make_boundary("normal_depth", bed_level=float(z[-1]),
                           bed_slope=slope)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 150.0, dx)
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-10, max_iter=100)
    ref = prs.simulate(geo, us, ds, h0, Q0, sset)

    cut = 8
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    br1 = BranchDef(geo=sl(slice(0, cut + 1)), dx=dx, us=us, ds=0,
                    h0=h0[: cut + 1], Q0=Q0[: cut + 1])
    br2 = BranchDef(geo=sl(slice(cut, None)), dx=dx, us=0, ds=ds,
                    h0=h0[cut:], Q0=Q0[cut:])
    out = simulate_network([br1, br2], n_junctions=1, settings=sset)
    assert bool(np.asarray(out.converged).all())

    stages = np.asarray(out.reservoir_stage)[:, 0, 0]  # branch 0 us end
    flow0 = np.asarray(out.flow[0])[:, 0]
    assert (flow0[1:] > 0).all()
    assert (np.diff(stages[1:]) < 0).all()
    # exact trapezoidal mass balance of the network's storage end (k >= 2)
    vol = 0.5 * (flow0[1:-1] + flow0[2:]) * dt
    np.testing.assert_allclose(SA * -np.diff(stages[1:]), vol, rtol=1e-8)
    # close to the single-reach trajectory
    assert np.abs(stages[1:] - np.asarray(ref.reservoir_stage)[1:]).max() < 2e-3


def test_gated_end_matches_single_reach():
    """The non-smooth gated rating controller on a network end: the split
    reach must reproduce the single-reach gate trajectory (hysteresis +
    cooldown state carried per end) and fields."""
    from tests.test_gated_curve import _build_gated_solver

    solver = _build_gated_solver()
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)
    out = simulate_network(_split_in_two(solver, 10, sset), n_junctions=1,
                           settings=sset)
    assert bool(np.asarray(out.converged).all())

    gates_net = np.asarray(out.gate_open)[:, 1, 1]  # branch 1 ds end
    gates_ref = np.asarray(ref.gate_open)
    assert gates_ref.max() == 1.0, "oracle must actually open its gates"
    np.testing.assert_array_equal(gates_net, gates_ref)

    d2 = np.asarray(out.depth[1])
    d_ref = np.asarray(ref.depth)[:, 10:]
    assert np.abs(d2 - d_ref).max() < 5e-3
    q2 = np.asarray(out.flow[1])
    q_ref = np.asarray(ref.flow)[:, 10:]
    assert np.abs(q2 - q_ref).max() < 5.0


def test_junction_reservoir_mass_balance():
    """A junction with area > 0 is a 0-D reservoir: its stage follows the
    trapezoidal mass balance of the connected branch ends exactly, and as
    area -> 0 the behavior approaches the plain equal-stage junction."""
    solver, sset = akbari_like()
    geo = solver.channel.geometry
    cut = 15
    br1 = BranchDef(geo=slice_geo(geo, slice(0, cut + 1)), dx=solver.spatial_step,
                    us=solver.us_params, ds=0,
                    h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1])
    br2 = BranchDef(geo=slice_geo(geo, slice(cut, None)), dx=solver.spatial_step,
                    us=0, ds=solver.ds_params,
                    h0=solver.h0[cut:], Q0=solver.Q0[cut:])

    SA = 5.0e5  # m^2
    out = simulate_network([br1, br2], n_junctions=1, settings=sset,
                           junction_area=[SA])
    assert bool(np.asarray(out.converged).all())
    Y = np.asarray(out.junction_stage)[:, 0]
    qin = np.asarray(out.flow[0])[:, -1]
    qout = np.asarray(out.flow[1])[:, 0]
    dt = sset.time_step
    # per-level trapezoidal balance, the residual the solver drove to ~0
    lhs = SA * (Y[1:] - Y[:-1]) / dt
    rhs = 0.5 * ((qin[1:] + qin[:-1]) - (qout[1:] + qout[:-1]))
    assert np.abs(lhs - rhs).max() < 1e-5
    # the reservoir attenuates: junction outflow peak < inflow peak
    assert qout.max() < qin.max()

    # area -> 0 approaches the plain junction
    plain = simulate_network([br1, br2], n_junctions=1, settings=sset)
    tiny = simulate_network([br1, br2], n_junctions=1, settings=sset,
                            junction_area=[1e-3])
    dY = np.abs(np.asarray(tiny.junction_stage)
                - np.asarray(plain.junction_stage)).max()
    assert dY < 1e-4


def test_gerd_tributary_demo():
    """Flagship-geometry network demo (models/gerd_tributary): the GERD
    reach with a tributary confluence and the smooth Roseires rating
    downstream converges, balances the junction, and routes a larger flood
    than the single-reach flagship (the tributary adds ~20%)."""
    from flowsim_tpu.models import gerd_tributary

    branches, nj, sset, solver = gerd_tributary.build(
        sim_duration=3600 * 24)
    out = simulate_network(branches, nj, sset)
    assert bool(np.asarray(out.converged).all())
    q_up = np.asarray(out.flow[0])[:, -1]
    q_tr = np.asarray(out.flow[1])[:, -1]
    q_dn = np.asarray(out.flow[2])[:, 0]
    assert np.abs(q_up[1:] + q_tr[1:] - q_dn[1:]).max() < 1e-4
    # single-reach flagship run over the same horizon for comparison
    ref = prs.simulate(solver.channel.geometry, solver.us_params,
                       solver.ds_params, solver.h0, solver.Q0, sset)
    q_ref = np.asarray(ref.flow)[:, -1]
    q_net = np.asarray(out.flow[2])[:, -1]
    assert q_net.max() > q_ref.max()  # the tributary raises the flood


def test_junction_dam_rated_outflow():
    """A junction reservoir with a rated outflow (a dam at the junction
    releasing OUT of the network): the pool satisfies the trapezoidal mass
    balance including the release, and the release caps the pool rise
    relative to the unrated reservoir."""
    from flowsim_tpu.ops import rating_curve as rcurve

    solver, sset = akbari_like()
    geo = solver.channel.geometry
    cut = 15
    branches = _split_in_two(solver, cut, sset)

    SA = 5.0e5
    z_conf = float(np.asarray(geo.z_bed)[cut])
    Y_init = z_conf + float(np.asarray(solver.h0)[cut])
    # linear rating through the initial pool stage: release grows with stage
    rc = rcurve.make_polynomial(0.0, 40.0, -40.0 * Y_init + 20.0)

    out = simulate_network(branches, n_junctions=1, settings=sset,
                           junction_area=[SA], junction_rating=[rc])
    assert bool(np.asarray(out.converged).all())

    Y = np.asarray(out.junction_stage)[:, 0]
    qo = np.asarray(out.junction_outflow)[:, 0]
    qin = np.asarray(out.flow[0])[:, -1]
    qdn = np.asarray(out.flow[1])[:, 0]
    dt = sset.time_step
    # trapezoidal balance with the rated release included
    S = qin - qdn
    lhs = SA * (Y[1:] - Y[:-1]) / dt
    rhs = 0.5 * ((S[1:] + S[:-1]) - (qo[1:] + qo[:-1]))
    assert np.abs(lhs - rhs).max() < 1e-5
    # the release is live and positive during the flood
    assert qo[1:].min() > 0.0
    assert qo.max() > qo[1] + 1.0  # grows as the pool rises

    # vs the unrated reservoir: the release caps the pool
    ref = simulate_network(branches, n_junctions=1, settings=sset,
                           junction_area=[SA])
    assert Y.max() < np.asarray(ref.junction_stage)[:, 0].max()
    assert np.asarray(ref.junction_outflow).max() == 0.0


def test_plain_junction_withdrawal():
    """A rated withdrawal on a plain (area=0) junction: instantaneous
    continuity sum sgn Q = Q_out(Y) holds at every level, and the
    downstream branch carries less than the feeder."""
    from flowsim_tpu.ops import rating_curve as rcurve

    solver, sset = akbari_like()
    geo = solver.channel.geometry
    cut = 15
    branches = _split_in_two(solver, cut, sset)
    z_conf = float(np.asarray(geo.z_bed)[cut])
    Y_init = z_conf + float(np.asarray(solver.h0)[cut])
    rc = rcurve.make_polynomial(0.0, 15.0, -15.0 * Y_init + 10.0)

    out = simulate_network(branches, n_junctions=1, settings=sset,
                           junction_rating=[rc])
    assert bool(np.asarray(out.converged).all())
    qin = np.asarray(out.flow[0])[:, -1]
    qdn = np.asarray(out.flow[1])[:, 0]
    qo = np.asarray(out.junction_outflow)[:, 0]
    # continuity with the withdrawal, to solver tolerance
    assert np.abs(qin[1:] - qdn[1:] - qo[1:]).max() < 1e-5
    assert (qo[1:] > 0.0).all()
    assert (qdn[1:] < qin[1:]).all()


def test_network_ensemble_matches_serial():
    """batched_simulate_network: per-member inflow scaling (feeder) and
    roughness (downstream arm) — each vmapped member must match its own
    serial simulate_network run."""
    from flowsim_tpu.parallel.ensemble import (batch_boundaries,
                                               batched_simulate_network,
                                               roughness_ensemble)

    solver, sset = akbari_like()
    sset = dataclasses.replace(sset, n_time_levels=9)
    cut = 15
    branches = _split_in_two(solver, cut, sset)

    scales = [0.9, 1.0, 1.15]
    ns = [0.021, 0.023, 0.026]
    us_members = [
        dataclasses.replace(
            solver.us_params,
            target_series=jnp.asarray(
                np.asarray(solver.us_params.target_series) * s))
        for s in scales]
    us_stacked, _ = batch_boundaries(us_members)
    geo1_batch = roughness_ensemble(branches[1].geo, ns)

    batch = [dict(us=us_stacked), dict(geo=geo1_batch)]
    out = batched_simulate_network(branches, 1, sset, batch)
    assert np.asarray(out.converged).all()
    assert np.asarray(out.depth[0]).shape[0] == 3

    for m in range(3):
        brs = [dataclasses.replace(branches[0], us=us_members[m]),
               dataclasses.replace(
                   branches[1],
                   geo=jax.tree_util.tree_map(lambda x: x[m], geo1_batch))]
        ref = simulate_network(brs, 1, sset)
        np.testing.assert_allclose(np.asarray(out.depth[0])[m],
                                   np.asarray(ref.depth[0]),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.flow[1])[m],
                                   np.asarray(ref.flow[1]),
                                   rtol=0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(out.junction_stage)[m],
                                   np.asarray(ref.junction_stage),
                                   rtol=0, atol=1e-10)
    # members genuinely differ
    assert np.abs(np.asarray(out.flow[1])[0] - np.asarray(out.flow[1])[2]).max() > 10.0


def test_stacked_engine_matches_loop_tributary():
    """engine="stacked" (one batched padded assembly + one batched multi-RHS
    solve per iteration) must reproduce the loop engine on the tributary
    network (unequal branch lengths) to solver roundoff, with identical
    Newton iteration counts."""
    from flowsim_tpu.models import gerd_tributary

    branches, nj, sset, _ = gerd_tributary.build(sim_duration=3600 * 24)
    a = simulate_network(branches, nj, sset)
    b = simulate_network(branches, nj, sset, engine="stacked")
    assert bool(np.asarray(b.converged).all())
    np.testing.assert_array_equal(np.asarray(a.iterations),
                                  np.asarray(b.iterations))
    for i in range(3):
        assert np.abs(np.asarray(a.depth[i]) - np.asarray(b.depth[i])).max() < 1e-9
        assert np.abs(np.asarray(a.flow[i]) - np.asarray(b.flow[i])).max() < 1e-6
    assert np.abs(np.asarray(a.junction_stage)
                  - np.asarray(b.junction_stage)).max() < 1e-9


def test_stacked_engine_storage_and_gated_ends():
    """Stacked engine with the stateful ends: the split example case
    (downstream lumped storage) and the split gated reach reproduce the
    loop engine's carried reservoir stage and gate trajectory."""
    from flowsim_tpu.models import example

    solver, _ = example.build()
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    branches = _split_in_two(solver, 10, sset)
    a = simulate_network(branches, 1, sset)
    b = simulate_network(branches, 1, sset, engine="stacked")
    assert bool(np.asarray(b.converged).all())
    rs_a = np.asarray(a.reservoir_stage)[:, 1, 1]
    rs_b = np.asarray(b.reservoir_stage)[:, 1, 1]
    assert np.abs(rs_a[1:] - rs_b[1:]).max() < 1e-8

    from tests.test_gated_curve import _build_gated_solver

    gsolver = _build_gated_solver()
    gsset = gsolver.settings(tolerance=1e-8, max_iter=100)
    gbranches = _split_in_two(gsolver, 10, gsset)
    ga = simulate_network(gbranches, 1, gsset)
    gb = simulate_network(gbranches, 1, gsset, engine="stacked")
    assert bool(np.asarray(gb.converged).all())
    np.testing.assert_array_equal(np.asarray(ga.gate_open),
                                  np.asarray(gb.gate_open))
    assert np.asarray(gb.gate_open)[:, 1, 1].max() == 1.0
    assert np.abs(np.asarray(ga.depth[1]) - np.asarray(gb.depth[1])).max() < 1e-8


def test_stacked_engine_dam_junction_and_qlat():
    """Stacked engine: rated junction reservoir outflow and per-branch
    lateral inflow both match the loop engine."""
    from flowsim_tpu.ops import rating_curve as rcurve

    solver, sset = akbari_like()
    geo = solver.channel.geometry
    cut = 15
    branches = _split_in_two(solver, cut, sset)
    N1 = cut + 1
    branches[0] = dataclasses.replace(
        branches[0], qlat=jnp.asarray(0.003 * np.linspace(1.0, 2.0, N1)))

    SA = 5.0e5
    z_conf = float(np.asarray(geo.z_bed)[cut])
    Y_init = z_conf + float(np.asarray(solver.h0)[cut])
    rc = rcurve.make_polynomial(0.0, 40.0, -40.0 * Y_init + 20.0)
    kw = dict(junction_area=[SA], junction_rating=[rc])
    a = simulate_network(branches, 1, sset, **kw)
    b = simulate_network(branches, 1, sset, engine="stacked", **kw)
    assert bool(np.asarray(b.converged).all())
    assert np.abs(np.asarray(a.junction_stage)
                  - np.asarray(b.junction_stage)).max() < 1e-9
    assert np.abs(np.asarray(a.junction_outflow)
                  - np.asarray(b.junction_outflow)).max() < 1e-7
    for i in range(2):
        assert np.abs(np.asarray(a.flow[i]) - np.asarray(b.flow[i])).max() < 1e-6


def test_network_checkpoint_resume_bitwise(tmp_path):
    """Checkpointed network runs (utils/checkpoint.py): chunked advancement
    is bitwise-equal to the one-shot scan, and resuming from a mid-run
    checkpoint (simulated crash) reproduces it exactly — including the
    carried gate-controller state of a gated end."""
    from flowsim_tpu.utils.checkpoint import (latest_checkpoint,
                                              simulate_network_with_checkpoints)
    from tests.test_gated_curve import _build_gated_solver

    solver = _build_gated_solver()
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    branches = _split_in_two(solver, 10, sset)
    ref = simulate_network(branches, 1, sset)

    out = simulate_network_with_checkpoints(branches, 1, sset,
                                            str(tmp_path / "a"), interval=7)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(out.depth[i]),
                                      np.asarray(ref.depth[i]))
        np.testing.assert_array_equal(np.asarray(out.flow[i]),
                                      np.asarray(ref.flow[i]))
    np.testing.assert_array_equal(np.asarray(out.gate_open),
                                  np.asarray(ref.gate_open))
    np.testing.assert_array_equal(np.asarray(out.junction_stage),
                                  np.asarray(ref.junction_stage))
    assert np.asarray(out.gate_open)[:, 1, 1].max() == 1.0

    # crash at level 14 (partial run), then resume with the full settings
    part = dataclasses.replace(sset, n_time_levels=15)
    d = tmp_path / "b"
    simulate_network_with_checkpoints(branches, 1, part, str(d), interval=7)
    assert latest_checkpoint(str(d)).endswith("ckpt_00000014.npz")
    out2 = simulate_network_with_checkpoints(branches, 1, sset, str(d),
                                             interval=7)
    np.testing.assert_array_equal(np.asarray(out2.depth[1]),
                                  np.asarray(ref.depth[1]))
    np.testing.assert_array_equal(np.asarray(out2.gate_open),
                                  np.asarray(ref.gate_open))


def test_network_fixed_newton_and_gradient():
    """settings.newton="fixed" (masked fixed-length Newton) matches the
    while-loop mode exactly on both engines, and makes the network solve
    reverse-mode differentiable: d(peak outflow)/d(roughness) from jax.grad
    matches central finite differences."""
    solver, sset = akbari_like()
    sset = dataclasses.replace(sset, n_time_levels=9, max_iter=30)
    branches = _split_in_two(solver, 15, sset)
    fix = dataclasses.replace(sset, newton="fixed")
    for engine in ("loop", "stacked"):
        a = simulate_network(branches, 1, sset, engine=engine)
        b = simulate_network(branches, 1, fix, engine=engine)
        np.testing.assert_array_equal(np.asarray(a.iterations),
                                      np.asarray(b.iterations))
        for i in range(2):
            np.testing.assert_array_equal(np.asarray(a.depth[i]),
                                          np.asarray(b.depth[i]))

    def loss(n_main):
        geo1 = dataclasses.replace(
            branches[1].geo,
            n_main=jnp.broadcast_to(n_main, branches[1].geo.n_main.shape)
            .astype(branches[1].geo.n_main.dtype))
        brs = [branches[0], dataclasses.replace(branches[1], geo=geo1)]
        out = simulate_network(brs, 1, fix)
        return jnp.sum(out.flow[1][-1]) + jnp.sum(out.junction_stage)

    g = jax.grad(loss)(jnp.asarray(0.023))
    eps = 1e-6
    fd = (loss(jnp.asarray(0.023 + eps)) - loss(jnp.asarray(0.023 - eps))) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-4)


def test_basin_tree_model():
    """Dendritic-basin demo (models/basin): a 15-branch binary-tree network
    converges, conserves discharge through every confluence, and the outlet
    carries the sum of the headwater inflows at t=0."""
    from flowsim_tpu.models import basin

    branches, nj, sset = basin.build(levels=4, sim_hours=12)
    out = simulate_network(branches, nj, sset, engine="stacked")
    assert bool(np.asarray(out.converged).all())
    n_internal = nj
    # junction continuity at every confluence, every level
    for i in range(n_internal):
        qa = np.asarray(out.flow[2 * i + 1])[:, -1]
        qb = np.asarray(out.flow[2 * i + 2])[:, -1]
        qp = np.asarray(out.flow[i])[:, 0]
        assert np.abs(qa + qb - qp).max() < 1e-4, i
    # outlet base flow = sum of headwater base inflows
    q0_out = float(np.asarray(out.flow[0])[0, -1])
    leaf_base = sum(float(np.asarray(branches[i].Q0)[0])
                    for i in range(n_internal, len(branches)))
    assert abs(q0_out - leaf_base) / leaf_base < 0.02
    # the flood actually routes: outlet peak well above base
    assert np.asarray(out.flow[0])[:, -1].max() > 2.5 * q0_out


def test_network_checkpoint_stacked_engine(tmp_path):
    """Checkpointed stacked-engine runs match the one-shot stacked run
    bitwise, and the engine-agnostic carry lets a resume switch engines."""
    from flowsim_tpu.utils.checkpoint import simulate_network_with_checkpoints

    solver, sset = akbari_like()
    sset = dataclasses.replace(sset, n_time_levels=13)
    branches = _split_in_two(solver, 15, sset)
    ref = simulate_network(branches, 1, sset, engine="stacked")

    out = simulate_network_with_checkpoints(
        branches, 1, sset, str(tmp_path / "s"), interval=5, engine="stacked")
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(out.depth[i]),
                                      np.asarray(ref.depth[i]))

    # loop-checkpointed partial run resumed with the stacked engine
    part = dataclasses.replace(sset, n_time_levels=6)
    d = tmp_path / "x"
    simulate_network_with_checkpoints(branches, 1, part, str(d), interval=5,
                                      engine="loop")
    out2 = simulate_network_with_checkpoints(branches, 1, sset, str(d),
                                             interval=5, engine="stacked")
    assert (np.asarray(out2.error)[1:] < sset.tolerance).all()
    assert np.abs(np.asarray(out2.depth[1])
                  - np.asarray(ref.depth[1])).max() < 1e-8
