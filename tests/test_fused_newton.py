"""Fused whole-simulation kernel: parity vs the f64 XLA path.

Runs in Pallas interpret mode on CPU (the same kernel code path the TPU
executes, minus Mosaic lowering).  The bar is the round-1 flagship bar:
*identical Newton iteration counts per level* vs the f64 solver, and fields
matching to well under the physical tolerance.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops.pallas.fused_newton import (FusedUnsupported,
                                                 fused_simulate)

SIM_HOURS = 48


@pytest.fixture(scope="module")
def gerd():
    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings

    solver, channel = model.build(sim_duration=3600 * SIM_HOURS)
    sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
    return solver, sset


@pytest.fixture(scope="module")
def runs(gerd):
    solver, sset = gerd
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)
    fused = fused_simulate(geo, solver.us_params, solver.ds_params,
                           solver.h0, solver.Q0, sset, interpret=True)
    return ref, fused


def test_iteration_counts_identical(runs):
    ref, fused = runs
    assert (np.asarray(fused.iterations) == np.asarray(ref.iterations)).all()
    assert bool(np.asarray(fused.converged).all())


def test_fields_match_f64(runs):
    ref, fused = runs
    dd = np.abs(np.asarray(fused.depth) - np.asarray(ref.depth))
    dq = np.abs(np.asarray(fused.flow) - np.asarray(ref.flow))
    assert dd.max() < 1e-4      # m; df32 + f32-rounded constants
    assert dq.max() < 1.0       # m3/s on ~1e4 flows


def test_error_norms_close(runs):
    ref, fused = runs
    e_ref = np.asarray(ref.error)[1:]
    e_f = np.asarray(fused.error)[1:]
    # final pre-update residual norms agree to f32 noise levels
    assert np.abs(e_f - e_ref).max() < 1e-4


def test_unsupported_configs_raise(gerd):
    solver, sset = gerd
    geo = solver.channel.geometry

    # fixed Newton variant unsupported
    s2 = dataclasses.replace(sset, newton="fixed")
    with pytest.raises(FusedUnsupported):
        fused_simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, s2, interpret=True)


def test_example_storage_parity():
    """Fixed-depth + constant-area lumped-storage downstream (cases/example):
    iteration counts and reservoir stage match the f64 path."""
    from flowsim_tpu.models import example

    solver, _ = example.build()
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)
    fused = fused_simulate(geo, solver.us_params, solver.ds_params,
                           solver.h0, solver.Q0, sset, interpret=True)
    assert (np.asarray(fused.iterations) == np.asarray(ref.iterations)).all()
    assert bool(np.asarray(fused.converged).all())
    assert np.abs(np.asarray(fused.depth) - np.asarray(ref.depth)).max() < 1e-5
    drs = np.abs(np.asarray(fused.reservoir_stage)
                 - np.asarray(ref.reservoir_stage))
    assert np.nanmax(drs) < 1e-4


def test_normal_depth_downstream_parity():
    """Fused kernel with flow-hydrograph us + normal-depth ds (the long-reach
    configuration): iteration counts identical to the f64 path."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from bench_scaling import build_long_reach

    geo, us, ds, h0, Q0, sset = build_long_reach(128, np.float64, levels=12)
    ref = prs.simulate(geo, us, ds, h0, Q0, sset)
    fused = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=True)
    assert (np.asarray(fused.iterations) == np.asarray(ref.iterations)).all()
    assert bool(np.asarray(fused.converged).all())
    assert np.abs(np.asarray(fused.depth) - np.asarray(ref.depth)).max() < 1e-5


def test_gated_curve_parity():
    """Non-smooth (gated_blend) Roseires downstream curve: the fused kernel
    carries the gate-controller state across levels (open/cooldown/previous
    time/stage) and reproduces the XLA path's gate trajectory and iteration
    counts exactly (ops/rating_curve.py:155-182)."""
    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings

    solver, _ = model.build(sim_duration=3600 * SIM_HOURS, smooth=False)
    sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
    geo = solver.channel.geometry
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)
    fused = fused_simulate(geo, solver.us_params, solver.ds_params,
                           solver.h0, solver.Q0, sset, interpret=True)
    assert (np.asarray(fused.iterations) == np.asarray(ref.iterations)).all()
    assert bool(np.asarray(fused.converged).all())
    assert (np.asarray(fused.gate_open) == np.asarray(ref.gate_open)).all()
    assert np.abs(np.asarray(fused.depth) - np.asarray(ref.depth)).max() < 1e-4


def test_table_geometry_parity():
    """Irregular (TableGeometry) sections in the fused kernel: the chunked
    sublane-gather lookup (ops/pallas/fused_newton.py:_section_df_table)
    reproduces the XLA table path (ops/sections.py:179-199) with identical
    iteration counts."""
    from flowsim_tpu.geometry_tables import IrregularStation, build_table_geometry
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
    n_nodes, nt = 9, 17
    node_ch = np.linspace(0, length, n_nodes)
    sts = [IrregularStation(x=x1, z=z1, n_main=0.03, bed_slope=slope),
           IrregularStation(x=x2, z=z2, n_main=0.03, bed_slope=slope)]
    geo = build_table_geometry(sts, [0.0, length], node_ch, samples=512)
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
    ref = prs.simulate(geo, us_p, ds_p, h0, Q0, sset)
    fused = fused_simulate(geo, us_p, ds_p, h0, Q0, sset, interpret=True)
    assert (np.asarray(fused.iterations) == np.asarray(ref.iterations)).all()
    assert bool(np.asarray(fused.converged).all())
    assert np.abs(np.asarray(fused.depth) - np.asarray(ref.depth)).max() < 1e-5
    assert np.abs(np.asarray(fused.flow) - np.asarray(ref.flow)).max() < 1e-3


def _rect_reach(n=30, slope=0.00061):
    from flowsim_tpu.geometry import TrapezoidGeometry

    z = np.linspace(slope * (n - 1) * 1000.0, 0.0, n)
    ones, zeros = np.ones(n), np.zeros(n)
    return TrapezoidGeometry(
        z_bed=jnp.asarray(z), b_main=jnp.asarray(120.0 * ones),
        m_main=jnp.asarray(zeros), n_main=jnp.asarray(0.023 * ones),
        compound=jnp.asarray(np.zeros(n, bool)),
        h_bank=jnp.asarray(1e30 * ones),
        b_fp_left=jnp.asarray(zeros), b_fp_right=jnp.asarray(zeros),
        m_fp=jnp.asarray(zeros), n_left=jnp.asarray(0.023 * ones),
        n_right=jnp.asarray(0.023 * ones),
        bed_slope=jnp.asarray(slope * ones), curvature=jnp.asarray(zeros))


def test_bc_surface_combinations():
    """The fused kernel's extended BC surface (plain fixed_depth and
    stage_hydrograph downstream; fixed_depth and normal_depth upstream)
    matches the XLA path (ops/boundary.py:160-213)."""
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic

    slope, nt, dx, dt = 0.00061, 21, 1000.0, 3600.0
    geo = _rect_reach(slope=slope)
    z = np.asarray(geo.z_bed)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 100.0, dx)
    times = np.arange(nt) * dt
    inflow = [100.0 + 200.0 * np.sin(np.pi * min(t / (12 * 3600), 1.0))
              for t in times]
    bed_us, bed_ds = float(z[0]), float(z[-1])
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-6,
                                  max_iter=100)
    us_hyd = bnd.make_boundary("flow_hydrograph", bed_level=bed_us,
                               target_series=inflow)
    stage_series = (bed_ds + float(np.asarray(h0)[-1])
                    + 0.2 * np.sin(np.linspace(0, np.pi, nt)))
    combos = {
        "ds_fixed_plain": (us_hyd, bnd.make_boundary(
            "fixed_depth", bed_level=bed_ds,
            initial_depth=float(np.asarray(h0)[-1]))),
        "ds_stage_hyd": (us_hyd, bnd.make_boundary(
            "stage_hydrograph", bed_level=bed_ds,
            target_series=stage_series)),
        "us_fixed": (bnd.make_boundary(
            "fixed_depth", bed_level=bed_us,
            initial_depth=float(np.asarray(h0)[0])), bnd.make_boundary(
            "normal_depth", bed_level=bed_ds, bed_slope=slope)),
        "us_normal": (bnd.make_boundary(
            "normal_depth", bed_level=bed_us, bed_slope=slope),
            bnd.make_boundary("stage_hydrograph", bed_level=bed_ds,
                              target_series=stage_series)),
    }
    for name, (us_p, ds_p) in combos.items():
        ref = prs.simulate(geo, us_p, ds_p, h0, Q0, sset)
        out = fused_simulate(geo, us_p, ds_p, h0, Q0, sset, interpret=True)
        it_r = np.asarray(ref.iterations)
        it_f = np.asarray(out.iterations)
        if name == "us_fixed":
            # fully-steady configuration: the reference's residual is exactly
            # ~1e-14 at the f64 steady state while the fused kernel's
            # f32-rounded constants put level 1's first pre-update residual
            # in the tolerance band (docs/PRECISION.md) -> within-1 bar
            assert (np.abs(it_r - it_f) <= 1).all(), name
        else:
            assert (it_r == it_f).all(), name
        assert bool(np.asarray(out.converged).all()), name
        dd = np.abs(np.asarray(out.depth) - np.asarray(ref.depth)).max()
        assert dd < 1e-4, (name, dd)


def test_bc_surface_extended():
    """The round-2 completion of the fused BC surface: downstream flow
    hydrograph, upstream rating curves, generalized lumped storage
    (stage-area curve, storage rating, entrance losses) on either end —
    each vs the XLA path (ops/boundary.py:160-205, ops/storage.py).

    Config notes: upstream rating curves use gate-style negative dQ/dz
    (backpressure — positive-slope inlet ratings are dynamically unstable
    and diverge identically in the XLA path); storage ends use a quiescent
    pool start because the reference's level-1 trial-stage rule
    (ref boundary.py:104-108) forces avg Q -> 0 at the first level.
    """
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops import storage as stg

    slope, nt, dx, dt = 0.00061, 21, 1000.0, 3600.0
    geo = _rect_reach(slope=slope)
    z = np.asarray(geo.z_bed)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 100.0, dx)
    bed_us, bed_ds = float(z[0]), float(z[-1])
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-6,
                                  max_iter=100)
    inflow = 100.0 + 200.0 * np.sin(np.linspace(0, np.pi, nt))
    us_hyd = bnd.make_boundary("flow_hydrograph", bed_level=bed_us,
                               target_series=inflow)
    ds_stage = bnd.make_boundary(
        "stage_hydrograph", bed_level=bed_ds,
        target_series=(bed_ds + float(np.asarray(h0)[-1])
                       + 0.2 * np.sin(np.linspace(0, np.pi, nt))))
    ds_normal = bnd.make_boundary("normal_depth", bed_level=bed_ds,
                                  bed_slope=slope)

    # upstream gate-style ratings anchored exactly at the IC
    stage0 = bed_us + float(np.asarray(h0)[0])
    q0 = float(np.asarray(Q0)[0])
    us_rating_poly = bnd.make_boundary(
        "rating_curve", bed_level=bed_us,
        rating=rcurve.make_polynomial(
            0.5, -30.0 - stage0, q0 + 30.0 * stage0 + 0.5 * stage0 * stage0))
    us_rating_blend = bnd.make_boundary(
        "rating_curve", bed_level=bed_us,
        rating=rcurve.make_blended_poly(
            low_quad=np.array([0.0, -25.0, q0 + 25.0 * stage0]),
            high_quad=np.array([0.0, -20.0, q0 + 20.0 * stage0]),
            pivot_stage=stage0 - 0.3, buffer=0.5))

    # downstream general storage: area curve + storage rating + losses
    ac_stages = bed_ds + np.linspace(-2.0, 20.0, 12)
    sp_curve = stg.make_storage(
        area_curve=np.stack([ac_stages,
                             4.0e5 * (1.0 + 0.08 * np.arange(12))], axis=1),
        min_stage=bed_ds - 1.0,
        rating=rcurve.make_polynomial(0.0, 30.0, -30.0 * (bed_ds - 1.0)),
        capture_losses=True, reservoir_length=1500.0, K_q=0.2)
    ds_storage_curve = bnd.make_boundary("fixed_depth", bed_level=bed_ds,
                                         storage=sp_curve)
    # constant-area + losses only (exercises the synthesized-linear V table)
    sp_hl = stg.make_storage(
        surface_area=5.0e5, min_stage=bed_ds - 1.0,
        solution_boundaries=(bed_ds - 2.0, bed_ds + 30.0),
        capture_losses=True, reservoir_length=1500.0, K_q=0.2)
    ds_storage_hl = bnd.make_boundary("fixed_depth", bed_level=bed_ds,
                                      storage=sp_hl)

    # quiescent pool for the storage/flow-forced ends
    stage_pool = bed_us + 2.0
    pool_h0 = jnp.asarray(stage_pool - z)
    pool_Q0 = jnp.zeros_like(Q0)
    ds_flow = bnd.make_boundary(
        "flow_hydrograph", bed_level=bed_ds,
        target_series=10.0 * np.sin(np.linspace(0, np.pi, nt)))
    ds_stage_pool = bnd.make_boundary(
        "stage_hydrograph", bed_level=bed_ds,
        target_series=stage_pool + 0.05 * np.sin(np.linspace(0, np.pi, nt)))
    us_stage_pool = bnd.make_boundary(
        "stage_hydrograph", bed_level=bed_us,
        target_series=np.full(nt, stage_pool))
    us_storage = bnd.make_boundary(
        "fixed_depth", bed_level=bed_us,
        storage=stg.make_storage(
            surface_area=8.0e6, min_stage=bed_us - 1.0,
            solution_boundaries=(bed_us - 2.0, bed_us + 30.0)))
    us_storage_curve = bnd.make_boundary(
        "fixed_depth", bed_level=bed_us,
        storage=stg.make_storage(
            area_curve=np.stack(
                [bed_us + np.linspace(-2.0, 30.0, 10),
                 8.0e6 * (1.0 + 0.05 * np.arange(10))], axis=1),
            min_stage=bed_us - 1.0))

    combos = {
        "ds_flow_q": (us_stage_pool, ds_flow, pool_h0, pool_Q0),
        "us_rating_poly": (us_rating_poly, ds_stage, h0, Q0),
        "us_rating_blend": (us_rating_blend, ds_normal, h0, Q0),
        "ds_storage_curve_hl": (us_hyd, ds_storage_curve, h0, Q0),
        "ds_storage_const_hl": (us_hyd, ds_storage_hl, h0, Q0),
        "us_storage_simple": (us_storage, ds_stage_pool, pool_h0, pool_Q0),
        "us_storage_curve": (us_storage_curve, ds_stage_pool,
                             pool_h0, pool_Q0),
    }
    for name, (us_p, ds_p, ich, icq) in combos.items():
        ref = prs.simulate(geo, us_p, ds_p, ich, icq, sset)
        out = fused_simulate(geo, us_p, ds_p, ich, icq, sset, interpret=True)
        it_r, it_f = np.asarray(ref.iterations), np.asarray(out.iterations)
        # within-1: blend-ramp levels can sit in the f32-constant tolerance
        # band (docs/PRECISION.md); every other combo matches exactly
        assert (np.abs(it_r - it_f) <= 1).all(), (name, it_r, it_f)
        dd = np.abs(np.asarray(out.depth) - np.asarray(ref.depth)).max()
        assert dd < 1e-4, (name, dd)
        # both engines agree on convergence level by level (the us_storage
        # combos plateau identically at a few levels: the level-1 rule makes
        # the Jacobian inconsistent there, in both engines alike)
        conv_r = np.asarray(ref.converged)
        conv_f = np.asarray(out.converged)
        assert (conv_r == conv_f).all(), name
        rs_r = np.asarray(ref.reservoir_stage)
        if np.isfinite(rs_r[1:]).any():
            drs = np.nanmax(np.abs(np.asarray(out.reservoir_stage) - rs_r))
            assert drs < 1e-4, (name, drs)


def test_storage_both_ends_in_kernel():
    # Round-5: storage on both boundaries no longer falls back; the kernel
    # accepts it and matches the XLA path (the full parity bar lives in
    # tests/test_both_boundary_storage.py; this pins that the old
    # FusedUnsupported rejection is gone).
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import storage as stg

    geo = _rect_reach()
    z = np.asarray(geo.z_bed)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 100.0, 1000.0)
    sset = prs.PreissmannSettings(theta=0.6, time_step=3600.0,
                                  spatial_step=1000.0, n_time_levels=4,
                                  tolerance=1e-6, max_iter=100)
    mk = lambda bed, floor: bnd.make_boundary(
        "fixed_depth", bed_level=bed,
        storage=stg.make_storage(surface_area=1e6, min_stage=floor,
                                 solution_boundaries=(0.0, 100.0)))
    us = mk(float(z[0]), float(z[0] + np.asarray(h0)[0]))
    ds = mk(float(z[-1]), float(z[-1] + np.asarray(h0)[-1]))
    out = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=True)
    ref = prs.simulate(geo, us, ds, h0, Q0, sset)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    assert np.isfinite(np.asarray(out.reservoir_stage)[1:]).all()
    assert np.isfinite(np.asarray(out.reservoir_stage_us)[1:]).all()


def test_hbm_streaming_bitwise(gerd):
    """Single-run kernel with out_memory='hbm' (per-level DMA streaming of
    the output stacks to HBM) is bitwise identical to the in-VMEM store."""
    solver, sset = gerd
    geo = solver.channel.geometry
    args = (geo, solver.us_params, solver.ds_params, solver.h0, solver.Q0)
    fields = ("depth", "flow", "iterations", "error", "reservoir_stage",
              "gate_open")
    for store in ("full", "boundaries"):
        sv = dataclasses.replace(sset, store=store, out_memory="vmem")
        sh = dataclasses.replace(sset, store=store, out_memory="hbm")
        ov = fused_simulate(*args, sv, interpret=True)
        oh = fused_simulate(*args, sh, interpret=True)
        for f in fields:
            assert np.array_equal(np.asarray(getattr(ov, f)),
                                  np.asarray(getattr(oh, f)),
                                  equal_nan=True), (store, f)


def test_hbm_streaming_lifts_nt_ceiling():
    """With out_memory='auto' the kernel accepts durations whose stacked
    outputs exceed the VMEM budget (they stream to HBM); 'vmem' rejects
    them.  Uses the budget math, not a multi-hour interpret run."""
    import dataclasses as _dc

    from flowsim_tpu.ops.pallas.fused_newton import (_FUSED_VMEM_BYTES,
                                                     _pick_out_mem,
                                                     _vmem_per_member)

    nt_huge = 100_000  # ~a decade of hourly levels at the flagship size
    assert _vmem_per_member(nt_huge, 128, "full", "vmem") > _FUSED_VMEM_BYTES

    class S:
        out_memory = "auto"

    assert _pick_out_mem(S(), nt_huge, 128, "full") == "hbm"
    s_vmem = S()
    s_vmem.out_memory = "vmem"
    with pytest.raises(FusedUnsupported):
        _pick_out_mem(s_vmem, nt_huge, 128, "full")


def test_lateral_inflow_parity():
    """Single-reach fused kernel with distributed lateral inflow, constant
    [N] and time-varying [nt, N]: iteration counts identical to the f64
    XLA path (the inflow is a residual constant with no Jacobian term)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from bench_scaling import build_long_reach

    geo, us, ds, h0, Q0, sset = build_long_reach(128, np.float64, levels=10)
    n = geo.n_nodes
    nt = sset.n_time_levels
    q_const = 0.004 * (1.0 + np.linspace(0.0, 1.0, n))
    t = np.linspace(0.0, 1.0, nt)[:, None]
    q_tv = 0.01 * np.exp(-((t - 0.4) / 0.25) ** 2) * (q_const / 0.004)[None]
    for q in (q_const, q_tv):
        ref = prs.simulate(geo, us, ds, h0, Q0, sset,
                           lateral_inflow=jnp.asarray(q))
        fused = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=True,
                               lateral_inflow=q)
        np.testing.assert_array_equal(np.asarray(fused.iterations),
                                      np.asarray(ref.iterations))
        assert bool(np.asarray(fused.converged).all())
        assert np.abs(np.asarray(fused.depth)
                      - np.asarray(ref.depth)).max() < 1e-5
    # the inflow is live: more outflow than the dry run at the last level
    dry = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=True)
    wet = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=True,
                         lateral_inflow=q_const)
    assert (np.asarray(wet.flow)[-1, -1]
            > np.asarray(dry.flow)[-1, -1] + 1.0)


def test_batched_lateral_inflow_parity():
    """Batched fused kernel with per-member lateral inflow [B, N]:
    iteration counts identical to the XLA vmap ensemble path; shared [N]
    inflow broadcasts; time-varying shapes raise FusedUnsupported."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import jax

    from bench_scaling import build_long_reach
    from flowsim_tpu.ops.pallas.fused_newton import fused_simulate_batched
    from flowsim_tpu.parallel.ensemble import batched_simulate

    geo, us, ds, h0, Q0, sset = build_long_reach(128, np.float64, levels=8)
    n = geo.n_nodes
    B = 4
    geob = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), geo)
    rng = np.random.default_rng(0)
    q = 0.004 * (1.0 + rng.random((B, n)))

    out_f = fused_simulate_batched(geob, us, ds, h0, Q0, sset,
                                   interpret=True, lateral_inflow=q)
    out_x = batched_simulate(geob, us, ds, h0, Q0, sset, shard=False,
                             lateral_inflow=jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(out_f.iterations),
                                  np.asarray(out_x.iterations))
    assert np.abs(np.asarray(out_f.depth)
                  - np.asarray(out_x.depth)).max() < 1e-5
    # members actually differ (the per-member inflow is live)
    fl = np.asarray(out_f.flow)[:, -1, -1]
    assert len(set(np.round(fl, 4))) == B

    # shared [N] broadcasts to every member
    out_s = fused_simulate_batched(geob, us, ds, h0, Q0, sset,
                                   interpret=True, lateral_inflow=q[0])
    one = np.asarray(out_s.depth)
    assert np.abs(one - one[0][None]).max() == 0.0

    # per-member TIME-VARYING [B, nt, N]: the [nt, B, Np] cell-average
    # stack stays in HBM and the kernel DMA-streams one level-row per
    # level — parity vs the XLA vmap path again
    nt = sset.n_time_levels
    t = np.linspace(0.0, 1.0, nt)[None, :, None]
    q_tv = q[:, None, :] * (1.0 + 0.8 * np.sin(
        2 * np.pi * (t + np.arange(B)[:, None, None] / B)))
    out_ftv = fused_simulate_batched(geob, us, ds, h0, Q0, sset,
                                     interpret=True, lateral_inflow=q_tv)
    out_xtv = batched_simulate(geob, us, ds, h0, Q0, sset, shard=False,
                               lateral_inflow=jnp.asarray(q_tv))
    np.testing.assert_array_equal(np.asarray(out_ftv.iterations),
                                  np.asarray(out_xtv.iterations))
    assert np.abs(np.asarray(out_ftv.depth)
                  - np.asarray(out_xtv.depth)).max() < 1e-5

    # wrong time axis still raises with a clear message
    with pytest.raises(FusedUnsupported, match="lateral_inflow"):
        fused_simulate_batched(geob, us, ds, h0, Q0, sset, interpret=True,
                               lateral_inflow=np.zeros((B, 5, n)))
