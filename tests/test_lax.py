"""Lax-Friedrichs explicit solver: stability, CFL guard, cross-scheme check.

The reference LaxSolver is bit-rotted (SURVEY.md §2.12) so there is no oracle
trajectory; the akbari_firoozi case doubles as the cross-scheme benchmark
(ref cases/akbari_firoozi/main_lax.py: dt=150 s vs Preissmann dt=3600 s).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from flowsim_tpu.api import Boundary, Channel, Hydrograph, LaxSolver
from flowsim_tpu.geometry import TrapezoidStation, interpolate_stations
from flowsim_tpu.ops.lax_friedrichs import depth_from_area
from flowsim_tpu.ops import sections as sec
from tests.test_preissmann_parity import akbari_hydrograph, run_ours_akbari

pytestmark = pytest.mark.fast


def build_akbari_lax(dt=150):
    S_0, length, width, roughness = 0.00061, 29000, 120, 0.023
    us = Boundary(condition="flow_hydrograph", bed_level=S_0 * length, chainage=0,
                  hydrograph=Hydrograph(function=akbari_hydrograph))
    ds = Boundary(condition="normal_depth", bed_level=0, chainage=length)
    channel = Channel(width=width, initial_flow=100, roughness=roughness,
                      upstream_boundary=us, downstream_boundary=ds,
                      interpolation_method="steady-state")
    return LaxSolver(channel=channel, time_step=dt, spatial_step=1000,
                     simulation_time=20 * 3600, secondary_BC=("constant", "constant"))


def test_depth_from_area_roundtrip():
    sts = [
        TrapezoidStation(z_bed=0.0, b_main=50.0, m_main=0.0, n_main=0.03),
        TrapezoidStation(z_bed=0.0, b_main=40.0, m_main=2.0, n_main=0.03),
        TrapezoidStation(z_bed=0.0, b_main=30.0, m_main=1.5, n_main=0.03,
                         h_bank=3.0, b_fp_left=20.0, b_fp_right=25.0, m_fp=4.0),
    ]
    geo = interpolate_stations(sts, [0.0, 100.0, 200.0], np.array([0.0, 100.0, 200.0]))
    for depth in [0.5, 2.0, 3.0, 5.5, 12.0]:
        d = jnp.full(3, depth)
        A = sec.section_state(geo, d).A
        back = depth_from_area(geo, A)
        np.testing.assert_allclose(np.asarray(back), depth, rtol=1e-12)


def test_akbari_lax_runs_and_agrees_with_preissmann():
    lax = build_akbari_lax(dt=150)
    out = lax.run(verbose=0)
    assert not bool(out.cfl_violated.any())
    assert np.all(np.isfinite(lax.depth))

    prs = run_ours_akbari(1e-8)
    # compare at shared times (every 24th Lax level = Preissmann level)
    ratio = 3600 // 150
    d_lax = lax.depth[::ratio]
    d_prs = prs.depth
    assert d_lax.shape == d_prs.shape
    # cross-scheme agreement: different schemes + steps, expect decimeter-level
    assert np.max(np.abs(d_lax - d_prs)) < 0.1
    # flow peaks: Lax-Friedrichs attenuates more (first-order diffusion);
    # observed ~5% below Preissmann on this case
    np.testing.assert_allclose(lax.flow[:, -1].max(), prs.flow[:, -1].max(), rtol=0.08)


def test_cfl_guard_raises():
    lax = build_akbari_lax(dt=3600)  # dx/dt = 0.28 m/s << wave celerity
    with pytest.raises(ValueError, match="CFL"):
        lax.run(verbose=0)


def test_mass_conservation():
    lax = build_akbari_lax(dt=150)
    lax.run(verbose=0)
    dt = lax.time_step
    inflow = lax.flow[:, 0].sum() * dt
    outflow = lax.flow[:, -1].sum() * dt
    assert abs(inflow - outflow) / inflow < 0.02


def test_upstream_storage_carries_stage():
    """fixed_depth + lumped storage on the UPSTREAM end: the carried
    reservoir stage must come from the upstream BC (previously discarded —
    Y_old went NaN at k=2 and the whole run silently NaN'd)."""
    from flowsim_tpu.api import LumpedStorage

    S_0, length = 0.0006, 29000
    us = Boundary(condition="fixed_depth", initial_depth=4.0,
                  bed_level=S_0 * length, chainage=0)
    us.set_lumped_storage(LumpedStorage(surface_area=5.0e6,
                                        min_stage=S_0 * length - 1.0,
                                        solution_boundaries=(0, 200)))
    ds = Boundary(condition="stage_hydrograph", bed_level=0, chainage=length,
                  initial_depth=4.0,
                  hydrograph=Hydrograph(function=lambda t: 4.0))
    channel = Channel(width=120, initial_flow=50.0, roughness=0.023,
                      upstream_boundary=us, downstream_boundary=ds,
                      interpolation_method="GVF_equation")
    lax = LaxSolver(channel=channel, time_step=60, spatial_step=1000,
                    simulation_time=1800)
    lax.run(verbose=0)
    assert np.all(np.isfinite(lax.depth)), "upstream-storage Lax run went NaN"
    # the reservoir stage series is carried (finite from level 1 on)
    assert np.all(np.isfinite(np.asarray(lax.output.reservoir_stage)[1:]))


def test_secondary_bc_variants():
    for mode in ["constant", "mirror", "linear"]:
        S_0, length = 0.00061, 29000
        us = Boundary(condition="flow_hydrograph", bed_level=S_0 * length, chainage=0,
                      hydrograph=Hydrograph(function=akbari_hydrograph))
        ds = Boundary(condition="normal_depth", bed_level=0, chainage=length)
        channel = Channel(width=120, initial_flow=100, roughness=0.023,
                          upstream_boundary=us, downstream_boundary=ds,
                          interpolation_method="steady-state")
        lax = LaxSolver(channel=channel, time_step=150, spatial_step=1000,
                        simulation_time=4 * 3600, secondary_BC=(mode, mode))
        lax.run(verbose=0)
        assert np.all(np.isfinite(lax.depth))


def test_lax_gated_curve_opens_on_flood():
    """gated_blend downstream curve on the Lax path: the scan-carried gate
    controller (same per-level semantics as Preissmann's BCState) opens when
    the flood raises the downstream stage past pivot+0.5 and the release
    jumps to the high curve."""
    from flowsim_tpu.geometry import TrapezoidGeometry
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import lax_friedrichs as lfx
    from flowsim_tpu.ops import rating_curve as rcurve

    n, slope, dx = 30, 2e-4, 1000.0
    z = np.linspace(slope * (n - 1) * dx, 0.0, n)
    ones, zeros = np.ones(n), np.zeros(n)
    geo = TrapezoidGeometry(
        z_bed=jnp.asarray(z), b_main=jnp.asarray(200.0 * ones),
        m_main=jnp.asarray(zeros), n_main=jnp.asarray(0.03 * ones),
        compound=jnp.asarray(np.zeros(n, bool)), h_bank=jnp.asarray(1e30 * ones),
        b_fp_left=jnp.asarray(zeros), b_fp_right=jnp.asarray(zeros),
        m_fp=jnp.asarray(zeros), n_left=jnp.asarray(0.03 * ones),
        n_right=jnp.asarray(0.03 * ones), bed_slope=jnp.asarray(slope * ones),
        curvature=jnp.asarray(zeros))
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 500.0, dx)
    bed_ds = float(z[-1])
    pivot = bed_ds + float(np.asarray(h0)[-1])
    low = [0.0, 150.0, 500.0 - 150.0 * pivot]
    high = [0.0, 200.0, 1500.0 - 200.0 * pivot]
    rc = rcurve.make_gated_blend(low, high, pivot_stage=pivot, max_cooldown=3600.0)

    dt, nt = 60.0, 361  # 6 h at CFL-safe dt
    t = np.arange(nt) * dt
    inflow = 500.0 + (6000.0 - 500.0) * np.minimum(t / (3 * 3600.0), 1.0)
    us = bnd.make_boundary("flow_hydrograph", bed_level=float(z[0]),
                           target_series=inflow)
    ds = bnd.make_boundary("rating_curve", bed_level=bed_ds, rating=rc)
    sset = lfx.LaxSettings(time_step=dt, spatial_step=dx, n_time_levels=nt)
    out = lfx.simulate(geo, us, ds, h0, Q0, sset)
    assert not bool(np.asarray(out.cfl_violated).any())
    assert np.isfinite(np.asarray(out.depth)).all()
    gates = np.asarray(out.gate_open)
    assert gates[1] == 0.0          # starts closed
    assert gates[-1] == 1.0         # flood opened it
    k_open = int(np.argmax(gates > 0.5))
    # the level-start stage that triggered the opening crossed pivot+0.5
    stage_before = bed_ds + np.asarray(out.depth)[k_open - 1, -1]
    assert stage_before >= pivot + 0.5 - 1e-6
    # release after opening exceeds the low-curve value at the same stage
    stage_after = bed_ds + np.asarray(out.depth)[-1, -1]
    q_low = np.polyval(low, stage_after)
    assert np.asarray(out.flow)[-1, -1] > q_low + 500.0
