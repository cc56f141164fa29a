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
    from flowsim_tpu.ops import storage as stg

    branches, sset = _split_akbari(nt=4)

    # junction reservoirs / rated junction outflow are XLA-engine only
    with pytest.raises(FusedUnsupported):
        simulate_network(branches, 1, sset, engine="fused",
                         junction_area=[5e5])
    # time-varying lateral inflow (constant [N] fields ARE supported —
    # test_branch_qlat_parity)
    nt, n0 = sset.n_time_levels, int(branches[0].h0.shape[0])
    br0 = dataclasses.replace(branches[0], qlat=np.full((nt, n0), 0.1))
    with pytest.raises(FusedUnsupported):
        simulate_network([br0, branches[1]], 1, sset, engine="fused")
    # fixed-Newton mode (differentiable path) is XLA-engine only
    s_fixed = dataclasses.replace(sset, newton="fixed")
    with pytest.raises(FusedUnsupported):
        simulate_network(branches, 1, s_fixed, engine="fused")
    # lumped-storage external ends
    ds_stor = dataclasses.replace(
        branches[1].ds, kind="fixed_depth",
        storage=stg.make_storage(surface_area=5e6, min_stage=0.0))
    br1s = dataclasses.replace(branches[1], ds=ds_stor)
    with pytest.raises(FusedUnsupported):
        simulate_network([branches[0], br1s], 1, sset, engine="fused")


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
