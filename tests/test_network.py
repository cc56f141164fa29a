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


def test_unsupported_ends_raise():
    solver, sset = akbari_like()
    geo = solver.channel.geometry
    from flowsim_tpu.models import example

    ex_solver, _ = example.build()  # ds has lumped storage
    br = BranchDef(geo=geo, dx=solver.spatial_step,
                   us=solver.us_params, ds=ex_solver.ds_params,
                   h0=solver.h0, Q0=solver.Q0)
    with pytest.raises(NotImplementedError):
        simulate_network([br, br], n_junctions=0, settings=sset)


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
