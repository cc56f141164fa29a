"""api-level network surface: NetworkSolver / Junction / per-branch results.

Oracle: the example case (ref cases/example/main.py — rectangular reach into
a lumped-storage reservoir) split at mid-reach through a Junction must
reproduce the single-reach api.PreissmannSolver run; the per-branch views
expose the single-reach results surface including the reservoir series.
"""

import os

import numpy as np
import pytest

from flowsim_tpu.api import (Boundary, Channel, Hydrograph, Junction,
                             LumpedStorage, NetworkSolver, PreissmannSolver)
from flowsim_tpu.models.example import trapezoid_hydrograph


def _boundaries():
    us = Boundary(condition="flow_hydrograph", bed_level=5, chainage=0,
                  hydrograph=Hydrograph(function=trapezoid_hydrograph))
    ds = Boundary(condition="fixed_depth", initial_depth=5, bed_level=0,
                  chainage=20000)
    ds.set_lumped_storage(LumpedStorage(surface_area=5000 * 250, min_stage=5,
                                        solution_boundaries=(0, 200)))
    return us, ds


def _single_reach():
    us, ds = _boundaries()
    channel = Channel(width=250, initial_flow=1000.0, roughness=0.027,
                      upstream_boundary=us, downstream_boundary=ds)
    return PreissmannSolver(channel=channel, theta=0.8, time_step=3600,
                            spatial_step=1000, simulation_time=24 * 3600)


def _network(ref):
    us, ds = _boundaries()
    cut = 10  # node index of chainage 10,000 on the single-reach grid
    ch1 = Channel(width=250, initial_flow=1000.0, roughness=0.027,
                  upstream_boundary=us,
                  downstream_boundary=Junction(0, 10000, bed_level=2.5))
    ch2 = Channel(width=250, initial_flow=1000.0, roughness=0.027,
                  upstream_boundary=Junction(0, 10000, bed_level=2.5),
                  downstream_boundary=ds)
    ics = [(ref.h0[: cut + 1], ref.Q0[: cut + 1]),
           (ref.h0[cut:], ref.Q0[cut:])]
    return NetworkSolver([ch1, ch2], theta=0.8, time_step=3600,
                         spatial_step=1000, simulation_time=24 * 3600,
                         initial_conditions=ics)


def test_network_solver_matches_single_reach(tmp_path):
    ref = _single_reach()
    ref_out = ref.run(verbose=0, tolerance=1e-8)

    net = _network(ref)
    assert net.n_junctions == 1
    out = net.run(verbose=0, tolerance=1e-8)
    assert bool(np.asarray(out.converged).all())

    d1 = np.asarray(out.depth[0])
    d2 = np.asarray(out.depth[1])
    assert np.abs(d1 - np.asarray(ref_out.depth)[:, :11]).max() < 5e-3
    assert np.abs(d2 - np.asarray(ref_out.depth)[:, 10:]).max() < 5e-3

    # per-branch facade: accessors + reservoir-stage reconstruction
    b1 = net.branch(1)
    assert b1.depth_at(None, -1) == pytest.approx(d2[-1, -1])
    res = b1.prepare_results()
    assert res.storage_stage is not None
    np.testing.assert_allclose(
        res.storage_stage[1:],
        np.asarray(ref_out.reservoir_stage)[1:], atol=5e-3)

    # workbook export per branch + junction CSV
    net.save_results(str(tmp_path))
    assert (tmp_path / "junctions.csv").exists()
    found = list(tmp_path.glob("branch_0/*")) + list(tmp_path.glob("branch_1/*"))
    assert found, "per-branch results files missing"
    csv = np.genfromtxt(tmp_path / "junctions.csv", delimiter=",", names=True)
    assert csv["stage_0"].shape[0] == net.number_of_time_levels
    assert np.allclose(csv["outflow_0"], 0.0)


def test_network_solver_nonconvergence_raises():
    ref = _single_reach()
    net = _network(ref)
    with pytest.raises(ValueError, match="Convergence"):
        net.run(verbose=0, tolerance=1e-13, max_iter=3)


def test_network_check_criticality_subcritical():
    ref = _single_reach()
    net = _network(ref)
    net.run(verbose=0, tolerance=1e-6)
    assert net.check_criticality() is False  # example case stays subcritical


def test_network_summary_matches_single_reach():
    """utils.results.network_summary on a serial split must reproduce the
    single-reach summary_metrics volume balance (same external fluxes), and
    the junction-continuity residual must sit at solver tolerance."""
    import dataclasses

    import jax

    from flowsim_tpu.models import akbari_firoozi as ak
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops.network import BranchDef, simulate_network
    from flowsim_tpu.utils.results import network_summary, summary_metrics

    solver, _ = ak.build()
    sset = dataclasses.replace(
        solver.settings(tolerance=1e-8, max_iter=100), n_time_levels=13)
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)
    ref_sum = summary_metrics(np.asarray(ref.flow), sset.time_step)

    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    cut = 15
    branches = [
        BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                  us=solver.us_params, ds=0,
                  h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                  us=0, ds=solver.ds_params,
                  h0=solver.h0[cut:], Q0=solver.Q0[cut:]),
    ]
    out = simulate_network(branches, 1, sset)
    s = network_summary(out, branches, sset.time_step)
    assert s["all_converged"]
    assert s["max_junction_imbalance"] < 1e-6
    assert s["junction_storage_change"] == 0.0
    np.testing.assert_allclose(s["mass_imbalance"], ref_sum["mass_imbalance"],
                               rtol=1e-6)
    np.testing.assert_allclose(s["peak_inflow"], ref_sum["peak_inflow"],
                               rtol=1e-9)


def test_network_summary_junction_reservoir():
    """network_summary with a junction reservoir: the storage-change term
    must anchor on Y[0] (the true initial pool stage — the first trapezoidal
    balance spans Y[0] -> Y[1]), and the volume balance must close to the
    integration-rule difference (summary uses the reference's plain sum*dt
    while the solver balances trapezoidally)."""
    import dataclasses

    import jax

    from flowsim_tpu.models import akbari_firoozi as ak
    from flowsim_tpu.ops.network import BranchDef, simulate_network
    from flowsim_tpu.utils.results import network_summary

    solver, _ = ak.build()
    sset = dataclasses.replace(
        solver.settings(tolerance=1e-8, max_iter=100), n_time_levels=13)
    geo = solver.channel.geometry
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    cut = 15
    branches = [
        BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                  us=solver.us_params, ds=0,
                  h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                  us=0, ds=solver.ds_params,
                  h0=solver.h0[cut:], Q0=solver.Q0[cut:]),
    ]
    SA = 5.0e5
    out = simulate_network(branches, 1, sset, junction_area=[SA])
    s = network_summary(out, branches, sset.time_step, junction_area=[SA])
    assert s["all_converged"]

    Y = np.asarray(out.junction_stage)[:, 0]
    assert abs(Y[1] - Y[0]) > 1e-6, "test needs a moving pool at level 1"
    np.testing.assert_allclose(s["junction_storage_change"],
                               SA * (Y[-1] - Y[0]), rtol=1e-12)

    # the Y[0] anchor is what makes the stored volume equal the trapezoidal
    # integral of the junction's net end inflow (the per-level solver
    # balance telescopes: SA*(Y[-1]-Y[0]) = dt*trapz(S)); the old Y[1]
    # anchor was off by SA*(Y[1]-Y[0])
    S = (np.asarray(out.flow[0])[:, -1] - np.asarray(out.flow[1])[:, 0])
    trapz = sset.time_step * (0.5 * S[0] + S[1:-1].sum() + 0.5 * S[-1])
    np.testing.assert_allclose(s["junction_storage_change"], trapz,
                               rtol=1e-6)
