"""Batched (ensemble) fused kernel: members across VPU sublanes.

The batched kernel runs B full simulations in ONE pallas_call with the
member axis on the sublane dimension (ops/pallas/fused_newton.py
``fused_simulate_batched``).  Bar: bitwise identity with per-member
single-run fused kernels (same f32 vreg program, masked per-member Newton),
and the usual tolerance parity vs the vmapped f64 XLA path.  This is the
fused-engine counterpart of the reference's serial calibration loop
(ref n_calibrate.py:58-62).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops.pallas.fused_newton import (FusedUnsupported,
                                                 fused_simulate,
                                                 fused_simulate_batched,
                                                 max_fused_batch)
from flowsim_tpu.parallel.ensemble import batch_boundaries, roughness_ensemble


@pytest.fixture(scope="module")
def example_ensemble():
    from flowsim_tpu.models import example

    solver, channel = example.build()
    sset = solver.settings(tolerance=1e-6, max_iter=100)
    geo = channel.geometry
    geob = roughness_ensemble(geo, [0.024, 0.027, 0.031])
    us_members = []
    for f in (0.9, 1.0, 1.1):
        ts = jnp.asarray(np.asarray(solver.us_params.target_series) * f)
        us_members.append(dataclasses.replace(solver.us_params,
                                              target_series=ts))
    us_stacked, _ = batch_boundaries(us_members)
    return solver, sset, geob, us_members, us_stacked


@pytest.fixture(scope="module")
def batched_out(example_ensemble):
    solver, sset, geob, us_members, us_stacked = example_ensemble
    return fused_simulate_batched(geob, us_stacked, solver.ds_params,
                                  solver.h0, solver.Q0, sset,
                                  interpret=True, us_batched=True)


def test_batched_bitwise_vs_single_fused(example_ensemble, batched_out):
    """Per-member roughness AND inflow; constant-area storage downstream.
    Each member of the batched run must match its own single-run fused
    simulation bitwise (identical vreg program, masked increments)."""
    solver, sset, geob, us_members, _ = example_ensemble
    outb = batched_out
    assert outb.depth.shape[0] == 3
    for m in range(3):
        gm = jax.tree_util.tree_map(lambda x: x[m], geob)
        outs = fused_simulate(gm, us_members[m], solver.ds_params,
                              solver.h0, solver.Q0, sset, interpret=True)
        assert (np.asarray(outb.depth[m]) == np.asarray(outs.depth)).all()
        assert (np.asarray(outb.flow[m]) == np.asarray(outs.flow)).all()
        assert (np.asarray(outb.iterations[m])
                == np.asarray(outs.iterations)).all()
        rs_b = np.asarray(outb.reservoir_stage[m])[1:]
        rs_s = np.asarray(outs.reservoir_stage)[1:]
        assert (rs_b == rs_s).all()
        assert bool(np.asarray(outb.converged[m]).all())


def test_batched_vs_xla_vmap(example_ensemble, batched_out):
    """Tolerance parity vs the vmapped f64 XLA path (same bar as the
    single-run fused kernel: iteration counts identical, fields close)."""
    solver, sset, geob, us_members, us_stacked = example_ensemble
    outb = batched_out
    axes = jax.tree_util.tree_map(lambda _: 0, us_members[0])
    ref = jax.vmap(
        lambda g, us: prs.simulate(g, us, solver.ds_params,
                                   solver.h0, solver.Q0, sset),
        in_axes=(0, axes))(geob, us_stacked)
    assert (np.asarray(outb.iterations) == np.asarray(ref.iterations)).all()
    assert np.abs(np.asarray(outb.depth) - np.asarray(ref.depth)).max() < 1e-4
    assert np.abs(np.asarray(outb.flow) - np.asarray(ref.flow)).max() < 1.0


def test_batched_gated_per_member_state():
    """Per-member gate-controller state: members with different inflows run
    in one kernel; each must reproduce its own single-run gate trajectory
    (hysteresis + cooldown carried per sublane)."""
    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings

    solver, _ = model.build(sim_duration=3600 * 24, smooth=False)
    sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
    geo = solver.channel.geometry
    geob = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), geo)
    us_members = []
    for f in (1.0, 0.2):
        ts = jnp.asarray(np.asarray(solver.us_params.target_series) * f)
        us_members.append(dataclasses.replace(solver.us_params,
                                              target_series=ts))
    us_stacked, _ = batch_boundaries(us_members)
    outb = fused_simulate_batched(geob, us_stacked, solver.ds_params,
                                  solver.h0, solver.Q0, sset,
                                  interpret=True, us_batched=True)
    for m in range(2):
        outs = fused_simulate(geo, us_members[m], solver.ds_params,
                              solver.h0, solver.Q0, sset, interpret=True)
        assert (np.asarray(outb.gate_open[m])
                == np.asarray(outs.gate_open)).all()
        assert (np.asarray(outb.iterations[m])
                == np.asarray(outs.iterations)).all()
        assert (np.asarray(outb.depth[m]) == np.asarray(outs.depth)).all()


def test_batched_unsupported_configs(example_ensemble):
    solver, sset, geob, us_members, us_stacked = example_ensemble

    # unbatched geometry
    geo0 = jax.tree_util.tree_map(lambda x: x[0], geob)
    with pytest.raises(FusedUnsupported):
        fused_simulate_batched(geo0, solver.us_params, solver.ds_params,
                               solver.h0, solver.Q0, sset, interpret=True)

    # (curve/rating/loss storage IS now supported per member — the
    # per-sublane stage-grid tables; see test_batched_storage_curve_per_
    # member)

    # output-VMEM budget: a batch far beyond the cap must be rejected
    big = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:1], (4096,) + x.shape[1:]), geob)
    with pytest.raises(FusedUnsupported):
        fused_simulate_batched(big, solver.us_params, solver.ds_params,
                               solver.h0, solver.Q0, sset, interpret=True)


def test_batched_per_member_storage_scalars(example_ensemble):
    """Per-member reservoir surface area (a kernel SCALAR slot, not a
    series): varying slots are lifted to per-sublane columns; each member
    must match its own single-run fused simulation bitwise, including the
    carried reservoir stage."""
    solver, sset, geob, us_members, us_stacked = example_ensemble
    ds_members = []
    for sa in (1.0e6, 1.25e6, 1.5e6):
        sp = dataclasses.replace(solver.ds_params.storage,
                                 surface_area=jnp.asarray(sa))
        ds_members.append(dataclasses.replace(solver.ds_params, storage=sp))
    ds_stacked, _ = batch_boundaries(ds_members)
    outb = fused_simulate_batched(geob, us_stacked, ds_stacked,
                                  solver.h0, solver.Q0, sset,
                                  interpret=True, us_batched=True,
                                  ds_batched=True)
    for m in range(3):
        gm = jax.tree_util.tree_map(lambda x: x[m], geob)
        outs = fused_simulate(gm, us_members[m], ds_members[m],
                              solver.h0, solver.Q0, sset, interpret=True)
        assert (np.asarray(outb.depth[m]) == np.asarray(outs.depth)).all()
        assert (np.asarray(outb.flow[m]) == np.asarray(outs.flow)).all()
        assert (np.asarray(outb.iterations[m])
                == np.asarray(outs.iterations)).all()
        assert (np.asarray(outb.reservoir_stage[m])[1:]
                == np.asarray(outs.reservoir_stage)[1:]).all()


def test_batched_per_member_rating_coeffs():
    """Per-member downstream rating-curve coefficients (gerd smooth
    blended_poly): both quadratic blocks live in kernel scalar slots; each
    member must reproduce its own single-run trajectory bitwise."""
    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings

    solver, _ = model.build(sim_duration=3600 * 24)
    sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
    geo = solver.channel.geometry
    geob = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), geo)
    ds_members = []
    for f in (1.0, 1.03):
        rc = solver.ds_params.rating
        rc2 = dataclasses.replace(rc, coeffs=rc.coeffs * f,
                                  coeffs_high=rc.coeffs_high * f)
        ds_members.append(dataclasses.replace(solver.ds_params, rating=rc2))
    ds_stacked, _ = batch_boundaries(ds_members)
    outb = fused_simulate_batched(geob, solver.us_params, ds_stacked,
                                  solver.h0, solver.Q0, sset,
                                  interpret=True, ds_batched=True)
    for m in range(2):
        outs = fused_simulate(geo, solver.us_params, ds_members[m],
                              solver.h0, solver.Q0, sset, interpret=True)
        assert (np.asarray(outb.depth[m]) == np.asarray(outs.depth)).all()
        assert (np.asarray(outb.flow[m]) == np.asarray(outs.flow)).all()
        assert (np.asarray(outb.iterations[m])
                == np.asarray(outs.iterations)).all()
    # members genuinely diverge (the coefficient change is live)
    assert np.abs(np.asarray(outb.flow[0]) - np.asarray(outb.flow[1])).max() > 1e-3


def test_max_fused_batch_bounds():
    from flowsim_tpu.ops.pallas.fused_newton import (_vmem_per_member,
                                                     _FUSED_VMEM_BYTES)
    for out_mem in ("vmem", "hbm"):
        b = max_fused_batch(121, 385, out_memory=out_mem)
        assert b >= 8 and b % 8 == 0
        # budget respected: outputs (or their 2 staging slots) + per-member
        # working set fit in VMEM
        assert (_vmem_per_member(385, 128, "full", out_mem) * b
                <= _FUSED_VMEM_BYTES or b == 8)
    assert max_fused_batch(256, 25) >= 64  # auto upgrades to hbm streaming
    # hbm streaming removes the output-stack bound entirely: the cap is set
    # by the per-member working set (~_WORK_ROWS rows of Np lanes), so it is
    # independent of nt and much larger than the in-VMEM store="full" cap
    assert (max_fused_batch(121, 385, "full", "hbm")
            == max_fused_batch(121, 9999, "full", "hbm"))
    assert (max_fused_batch(121, 385, "full", "hbm")
            >= 8 * max_fused_batch(121, 385, "full", "vmem"))
    # boundaries mode: the cap is bounded by the working set, not just the
    # tiny output rows — 24 levels of 128-lane rows alone would allow
    # thousands of members, but ~176 rows of [1, Np] working state per
    # member must also fit in ~16 MB VMEM
    bb = max_fused_batch(256, 24, "boundaries", "vmem")
    assert bb * _vmem_per_member(24, 256, "boundaries") <= _FUSED_VMEM_BYTES
    assert bb <= 256


def test_ensemble_engine_fused_chunked(example_ensemble):
    """parallel.ensemble.batched_simulate(engine='fused'): chunked dispatch
    (two kernel calls) concatenates to the same results as one call."""
    from flowsim_tpu.parallel.ensemble import batched_simulate

    solver, sset, geob, us_members, us_stacked = example_ensemble
    axes = jax.tree_util.tree_map(lambda _: 0, us_members[0])
    one = batched_simulate(geob, us_stacked, solver.ds_params,
                           solver.h0, solver.Q0, sset,
                           us_axes=axes, engine="fused")
    two = batched_simulate(geob, us_stacked, solver.ds_params,
                           solver.h0, solver.Q0, sset,
                           us_axes=axes, engine="fused", chunk_size=2)
    for a, b in zip(jax.tree_util.tree_leaves(one),
                    jax.tree_util.tree_leaves(two)):
        # reservoir_stage is NaN at level 0 by design
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True)


def test_calibration_sweep_fused_engine(example_ensemble):
    """models.calibrate.rmse_sweep(engine='fused') matches the XLA sweep
    (the vectorized form of ref n_calibrate.py:55-75)."""
    from flowsim_tpu.models.calibrate import rmse_sweep

    solver, sset, geob, _, _ = example_ensemble
    geo = jax.tree_util.tree_map(lambda x: x[0], geob)
    nv = [0.022, 0.027, 0.033]
    Qt = [3000.0, 6000.0, 9000.0]
    Ht = [9.0, 12.0, 15.0]
    r_x = rmse_sweep(geo, solver.us_params, solver.ds_params,
                     solver.h0, solver.Q0, sset, Qt, Ht, nv)
    r_f = rmse_sweep(geo, solver.us_params, solver.ds_params,
                     solver.h0, solver.Q0, sset, Qt, Ht, nv, engine="fused")
    assert np.abs(np.asarray(r_x) - np.asarray(r_f)).max() < 1e-5


def test_batched_store_boundaries(example_ensemble, batched_out):
    """settings.store='boundaries' packs the boundary (h, Q) into the stats
    row in-kernel: bitwise-equal to the full run's boundary columns, and the
    VMEM member cap rises (the Monte-Carlo dispatch-count lever)."""
    solver, sset, geob, us_members, us_stacked = example_ensemble
    sset_b = dataclasses.replace(sset, store="boundaries")
    outb = fused_simulate_batched(geob, us_stacked, solver.ds_params,
                                  solver.h0, solver.Q0, sset_b,
                                  interpret=True, us_batched=True)
    full = batched_out
    nt = sset.n_time_levels
    assert outb.depth.shape == (3, nt, 2)
    assert (np.asarray(outb.depth) == np.asarray(full.depth)[:, :, [0, -1]]).all()
    assert (np.asarray(outb.flow) == np.asarray(full.flow)[:, :, [0, -1]]).all()
    assert (np.asarray(outb.iterations) == np.asarray(full.iterations)).all()
    assert (np.asarray(outb.error) == np.asarray(full.error)).all()
    rs_b, rs_f = np.asarray(outb.reservoir_stage), np.asarray(full.reservoir_stage)
    assert (rs_b[:, 1:] == rs_f[:, 1:]).all()

    from flowsim_tpu.ops.pallas.fused_newton import max_fused_batch
    assert max_fused_batch(121, 385, "boundaries") > max_fused_batch(121, 385)


def test_single_fused_store_boundaries(example_ensemble):
    """Single-run fused path honors store='boundaries' (same contract as
    prs.simulate: the two boundary nodes of every level)."""
    solver, sset, geob, us_members, _ = example_ensemble
    gm = jax.tree_util.tree_map(lambda x: x[0], geob)
    full = fused_simulate(gm, us_members[0], solver.ds_params,
                          solver.h0, solver.Q0, sset, interpret=True)
    sset_b = dataclasses.replace(sset, store="boundaries")
    bnd = fused_simulate(gm, us_members[0], solver.ds_params,
                         solver.h0, solver.Q0, sset_b, interpret=True)
    assert bnd.depth.shape == (sset.n_time_levels, 2)
    assert (np.asarray(bnd.depth) == np.asarray(full.depth)[:, [0, -1]]).all()
    assert (np.asarray(bnd.flow) == np.asarray(full.flow)[:, [0, -1]]).all()


def test_batched_hbm_streaming_bitwise(example_ensemble, batched_out):
    """out_memory='hbm' streams the per-level outputs to HBM via
    double-buffered DMA (_LevelStreamer) instead of keeping the [nt, B, Np]
    stacks in VMEM: results must be bitwise identical to the in-VMEM store
    for both output modes."""
    solver, sset, geob, us_members, us_stacked = example_ensemble
    fields = ("depth", "flow", "iterations", "error", "reservoir_stage",
              "gate_open")
    for store in ("full", "boundaries"):
        sv = dataclasses.replace(sset, store=store, out_memory="vmem")
        sh = dataclasses.replace(sset, store=store, out_memory="hbm")
        ov = fused_simulate_batched(geob, us_stacked, solver.ds_params,
                                    solver.h0, solver.Q0, sv,
                                    interpret=True, us_batched=True)
        oh = fused_simulate_batched(geob, us_stacked, solver.ds_params,
                                    solver.h0, solver.Q0, sh,
                                    interpret=True, us_batched=True)
        for f in fields:
            assert np.array_equal(np.asarray(getattr(ov, f)),
                                  np.asarray(getattr(oh, f)),
                                  equal_nan=True), (store, f)


def test_batched_above_vmem_cap_auto_streams(example_ensemble):
    """A member batch larger than the in-VMEM store='full' cap is rejected
    with out_memory='vmem' but runs under 'auto' (HBM streaming), and each
    member still matches its own single-run fused simulation bitwise."""
    from flowsim_tpu.ops.pallas.fused_newton import _vmem_per_member, \
        _FUSED_VMEM_BYTES

    solver, sset, geob3, us_members, _ = example_ensemble
    nt = sset.n_time_levels
    vmem_cap = max_fused_batch(geob3.n_nodes, nt, "full", "vmem")
    B = vmem_cap + 8
    # stay inside the Newton-stable roughness band for this case: at
    # n >~ 0.047 the example config genuinely diverges (the f64 XLA path
    # and the reference do too — the reference raises on non-convergence)
    rng = np.random.default_rng(7)
    n_vals = rng.uniform(0.023, 0.042, B)
    geob = roughness_ensemble(
        jax.tree_util.tree_map(lambda x: x[0], geob3), n_vals)

    with pytest.raises(FusedUnsupported):
        fused_simulate_batched(geob, solver.us_params, solver.ds_params,
                               solver.h0, solver.Q0,
                               dataclasses.replace(sset, out_memory="vmem"),
                               interpret=True)
    assert B * _vmem_per_member(nt, 128, "full", "hbm") <= _FUSED_VMEM_BYTES
    outb = fused_simulate_batched(geob, solver.us_params, solver.ds_params,
                                  solver.h0, solver.Q0, sset, interpret=True)
    assert outb.depth.shape[0] == B
    assert bool(np.asarray(outb.converged).all())
    for m in (0, B // 2, B - 1):
        gm = jax.tree_util.tree_map(lambda x: x[m], geob)
        outs = fused_simulate(gm, solver.us_params, solver.ds_params,
                              solver.h0, solver.Q0, sset, interpret=True)
        assert (np.asarray(outb.depth[m]) == np.asarray(outs.depth)).all()
        assert (np.asarray(outb.iterations[m])
                == np.asarray(outs.iterations)).all()


def test_diverged_member_does_not_poison_batch(example_ensemble):
    """A member whose Newton genuinely diverges to NaN (n=0.0471 on this
    case diverges in f64 too; the reference raises there) must only kill
    itself: the healthy members of the same batched kernel call still
    match their own single-run fused simulations bitwise.  Regression for
    the while-cond `sum(active)` picking up NaN from a dead member's state
    and freezing the whole batch."""
    solver, sset, _, _, _ = example_ensemble
    from flowsim_tpu.models import example as _ex

    geo = _ex.build()[1].geometry
    n_vals = [0.027, 0.0471, 0.031]  # middle member diverges
    geob = roughness_ensemble(geo, n_vals)
    outb = fused_simulate_batched(geob, solver.us_params, solver.ds_params,
                                  solver.h0, solver.Q0, sset, interpret=True)
    conv = np.asarray(outb.converged)
    assert not conv[1].all()  # the unstable member did diverge
    for m in (0, 2):
        gm = jax.tree_util.tree_map(lambda x: x[m], geob)
        outs = fused_simulate(gm, solver.us_params, solver.ds_params,
                              solver.h0, solver.Q0, sset, interpret=True)
        assert bool(np.asarray(outs.converged).all())
        assert (np.asarray(outb.depth[m]) == np.asarray(outs.depth)).all()
        assert (np.asarray(outb.iterations[m])
                == np.asarray(outs.iterations)).all()


def test_sharded_fused_ensemble_bitwise(example_ensemble):
    """fused_simulate_batched_sharded: members split over the mesh's
    ensemble axis, one fused-kernel dispatch per device (shard_map) — every
    member bitwise-identical to the single-device batched kernel, including
    awkward member counts (padding replicates the last member per device).
    Also exercises the batched_simulate(engine='fused', mesh=...) route."""
    from flowsim_tpu.ops.pallas.fused_newton import (
        fused_simulate_batched_sharded)
    from flowsim_tpu.parallel.ensemble import batched_simulate
    from flowsim_tpu.parallel.mesh import make_mesh

    solver, sset, _, _, _ = example_ensemble
    from flowsim_tpu.models import example as _ex

    geo = _ex.build()[1].geometry
    rng = np.random.default_rng(3)
    B0 = 19  # not divisible by 8 or the device count
    geob = roughness_ensemble(geo, rng.uniform(0.023, 0.042, B0))
    us_members = [
        dataclasses.replace(
            solver.us_params,
            target_series=jnp.asarray(
                np.asarray(solver.us_params.target_series) * f))
        for f in rng.uniform(0.9, 1.1, B0)]
    us_b, axes = batch_boundaries(us_members)

    mesh = make_mesh(n_ensemble=4, n_space=2)
    ref = fused_simulate_batched(geob, us_b, solver.ds_params,
                                 solver.h0, solver.Q0, sset,
                                 interpret=True, us_batched=True)
    shd = fused_simulate_batched_sharded(geob, us_b, solver.ds_params,
                                         solver.h0, solver.Q0, sset,
                                         mesh=mesh, interpret=True,
                                         us_batched=True)
    fields = ("depth", "flow", "iterations", "error", "reservoir_stage",
              "gate_open")
    for f in fields:
        assert np.array_equal(np.asarray(getattr(ref, f)),
                              np.asarray(getattr(shd, f)),
                              equal_nan=True), f

    via_api = batched_simulate(geob, us_b, solver.ds_params,
                               solver.h0, solver.Q0, sset,
                               mesh=mesh, us_axes=axes, engine="fused")
    for f in fields:
        assert np.array_equal(np.asarray(getattr(ref, f)),
                              np.asarray(getattr(via_api, f)),
                              equal_nan=True), f


def test_sharded_lateral_inflow_shape_guard(example_ensemble):
    """The sharded driver validates the GLOBAL member-major shape of
    lateral_inflow before member-slicing (regression: a shared [nt, N]
    time series used to be silently sliced into per-member constants)."""
    from flowsim_tpu.ops.pallas.fused_newton import (
        FusedUnsupported, fused_simulate_batched_sharded)
    from flowsim_tpu.parallel.mesh import make_mesh

    solver, sset, _, _, _ = example_ensemble
    from flowsim_tpu.models import example as _ex

    geo = _ex.build()[1].geometry
    B0 = 16
    geob = roughness_ensemble(geo, np.linspace(0.025, 0.035, B0))
    mesh = make_mesh(n_ensemble=4, n_space=2)
    n = geo.n_nodes
    nt = sset.n_time_levels
    assert nt != B0  # the guard must catch the [nt, N] shape below
    q_shared_tv = np.zeros((nt, n))
    with pytest.raises(FusedUnsupported, match="member-major"):
        fused_simulate_batched_sharded(
            geob, solver.us_params, solver.ds_params, solver.h0, solver.Q0,
            sset, mesh=mesh, interpret=True, lateral_inflow=q_shared_tv)


def test_batched_storage_curve_per_member():
    """Per-member generalized lumped storage in the batched kernel: each
    member carries its OWN stage-area curve and storage rating (the
    stage-grid tables ride sublane-interleaved VMEM rows and the grid
    lookups run per sublane) — parity vs per-member XLA runs."""
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops import storage as stg
    from tests.test_fused_newton import _rect_reach

    slope, nt, dx, dt = 0.00061, 15, 1000.0, 3600.0
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
    ac_stages = bed_ds + np.linspace(-2.0, 20.0, 12)
    members = []
    for fA, fQ in ((0.8, 25.0), (1.0, 30.0), (1.3, 35.0)):
        sp = stg.make_storage(
            area_curve=np.stack(
                [ac_stages, fA * 4.0e5 * (1.0 + 0.08 * np.arange(12))],
                axis=1),
            min_stage=bed_ds - 1.0,
            rating=rcurve.make_polynomial(0.0, fQ, -fQ * (bed_ds - 1.0)),
            capture_losses=True, reservoir_length=1500.0, K_q=0.2)
        members.append(bnd.make_boundary("fixed_depth", bed_level=bed_ds,
                                         storage=sp))
    ds_b, _ = batch_boundaries(members)
    B = 3
    geob = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), geo)
    out = fused_simulate_batched(geob, us_hyd, ds_b, h0, Q0, sset,
                                 interpret=True, ds_batched=True)
    for m in range(B):
        ref = prs.simulate(geo, us_hyd, members[m], h0, Q0, sset)
        assert (np.abs(np.asarray(ref.iterations)
                       - np.asarray(out.iterations)[m]) <= 1).all()
        assert np.abs(np.asarray(out.depth)[m]
                      - np.asarray(ref.depth)).max() < 1e-4
        rs_r = np.asarray(ref.reservoir_stage)[1:]
        rs_f = np.asarray(out.reservoir_stage)[m][1:]
        np.testing.assert_allclose(rs_f, rs_r, atol=1e-4)
    # members actually differ (per-member reservoir physics is live)
    rs_all = np.asarray(out.reservoir_stage)[:, -1]
    assert len(set(np.round(rs_all, 4))) == B


def _table_reach(samples=96, n_nodes=9, nt=13):
    """Small irregular reach (the test_fused_newton table fixture shape)."""
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
                                  tolerance=1e-6, max_iter=100)
    return geo, us_p, ds_p, h0, Q0, sset


def test_batched_table_geometry_parity():
    """Round-5: batched TableGeometry (shared tables + per-member
    conveyance/roughness scale, table_roughness_ensemble semantics) runs
    IN-KERNEL with per-member iteration counts identical to the vmapped
    XLA table path."""
    from flowsim_tpu.parallel.ensemble import table_roughness_ensemble

    geo, us_p, ds_p, h0, Q0, sset = _table_reach()
    ns = [0.026, 0.030, 0.035]
    geob = table_roughness_ensemble(geo, ns)
    outb = fused_simulate_batched(geob, us_p, ds_p, h0, Q0, sset,
                                  interpret=True)
    assert outb.depth.shape[0] == len(ns)
    for m, _n in enumerate(ns):
        gm = jax.tree_util.tree_map(lambda x: x[m], geob)
        ref = prs.simulate(gm, us_p, ds_p, h0, Q0, sset)
        np.testing.assert_array_equal(np.asarray(outb.iterations[m]),
                                      np.asarray(ref.iterations))
        assert bool(np.asarray(outb.converged[m]).all())
        assert np.abs(np.asarray(outb.depth[m])
                      - np.asarray(ref.depth)).max() < 1e-5
        assert np.abs(np.asarray(outb.flow[m])
                      - np.asarray(ref.flow)).max() < 1e-3


def test_batched_table_geometry_guards():
    """Per-member geometric tables (non-factorable) and oversized depth
    grids raise FusedUnsupported (the XLA vmap engine owns those)."""
    from flowsim_tpu.parallel.ensemble import table_roughness_ensemble

    geo, us_p, ds_p, h0, Q0, sset = _table_reach()
    geob = table_roughness_ensemble(geo, [0.026, 0.030, 0.035])
    # break the shared-geometry premise on one member
    bad = dataclasses.replace(
        geob, area=jnp.asarray(np.asarray(geob.area)
                               * np.array([1.0, 1.01, 1.0])[:, None, None]))
    with pytest.raises(FusedUnsupported, match="share the geometric"):
        fused_simulate_batched(bad, us_p, ds_p, h0, Q0, sset, interpret=True)
    # break the uniform-scale premise on ONE member's conveyance (a
    # depth-dependent distortion cannot factor into a scalar c_m)
    K = np.asarray(geob.conveyance).copy()
    K[1] *= 1.0 + 0.05 * np.linspace(0, 1, geob.area.shape[-1])
    bad2 = dataclasses.replace(geob, conveyance=jnp.asarray(K))
    with pytest.raises(FusedUnsupported, match="uniform conveyance scale"):
        fused_simulate_batched(bad2, us_p, ds_p, h0, Q0, sset,
                               interpret=True)
    # oversized depth grid
    geo_big, *rest = _table_reach(samples=512)
    geob_big = table_roughness_ensemble(geo_big, [0.026, 0.030])
    with pytest.raises(FusedUnsupported, match="O\\(M\\)"):
        fused_simulate_batched(geob_big, rest[0], rest[1], rest[2], rest[3],
                               rest[4], interpret=True)


def test_batched_both_ends_storage():
    """Round-5: lumped storage on BOTH boundaries in the BATCHED kernel —
    per-member stage pairs match the vmapped XLA path with identical
    iteration counts."""
    from tests.test_both_boundary_storage import build, settings

    geo, us, ds, h0, Q0 = build()
    sset = settings(tolerance=1e-6)
    B = 3
    geob = roughness_ensemble(geo, [0.023, 0.025, 0.028])
    outb = fused_simulate_batched(geob, us, ds, h0, Q0, sset, interpret=True)
    assert outb.reservoir_stage_us is not None
    for m in range(B):
        gm = jax.tree_util.tree_map(lambda x: x[m], geob)
        ref = prs.simulate(gm, us, ds, h0, Q0, sset)
        np.testing.assert_array_equal(np.asarray(outb.iterations[m]),
                                      np.asarray(ref.iterations))
        assert bool(np.asarray(outb.converged[m]).all())
        assert np.abs(np.asarray(outb.depth[m])
                      - np.asarray(ref.depth)).max() < 1e-5
        assert np.abs(np.asarray(outb.reservoir_stage[m][1:])
                      - np.asarray(ref.reservoir_stage[1:])).max() < 1e-4
        assert np.abs(np.asarray(outb.reservoir_stage_us[m][1:])
                      - np.asarray(ref.reservoir_stage_us[1:])).max() < 1e-4
