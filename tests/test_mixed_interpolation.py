"""Mixed trapezoid x irregular station interpolation vs the reference.

The reference resamples any mixed pair on the union x grid and blends the
lateral profiles into an IrregularSection (ref cross_section.py:933-968);
nodes bracketed by two trapezoids stay analytic trapezoids (ref :898-930).
Round-1 VERDICT gap #4.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flowsim_tpu.geometry import TrapezoidStation
from flowsim_tpu.geometry_tables import (
    IrregularStation,
    blend_stations,
    build_table_geometry,
    equivalent_n,
    polyline_properties,
    trapezoid_as_irregular,
    trapezoid_z_profile,
)
from tests.oracle import import_reference, reference_available

pytestmark = [pytest.mark.fast, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]


def _irr_polyline(width=260.0, relief=10.0, seed=3, n_pts=21):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, width, n_pts))
    x[0], x[-1] = 0.0, width
    z = relief * ((x - width / 2) / (width / 2)) ** 2 + rng.uniform(0, 1.0, n_pts)
    # center laterally like the trapezoid profiles (x=0 at channel center)
    return x - width / 2, z + 480.0


def _ref_sections():
    import_reference()
    from src.hydromodel.cross_section import IrregularSection, TrapezoidalSection

    x, z = _irr_polyline()
    irr = IrregularSection(x=x, z=z, n=0.035, bed_slope=2e-4)
    simple = TrapezoidalSection(z_bed=float(z.min()) - 0.5, b_main=80.0, m_main=2.5,
                                n_main=0.03, bed_slope=2e-4)
    compound = TrapezoidalSection(z_bed=float(z.min()) - 1.0, b_main=60.0, m_main=3.0,
                                  z_bank=float(z.min()) + 4.0, b_fp_left=40.0,
                                  b_fp_right=50.0, m_fp=8.0, n_main=0.03,
                                  n_left=0.05, n_right=0.06, bed_slope=2e-4)
    return irr, simple, compound


def _our_stations():
    x, z = _irr_polyline()
    irr = IrregularStation(x=x, z=z, n_main=0.035, bed_slope=2e-4)
    simple = TrapezoidStation(z_bed=float(z.min()) - 0.5, b_main=80.0, m_main=2.5,
                              n_main=0.03, bed_slope=2e-4)
    compound = TrapezoidStation(z_bed=float(z.min()) - 1.0, b_main=60.0, m_main=3.0,
                                h_bank=5.0, b_fp_left=40.0, b_fp_right=50.0, m_fp=8.0,
                                n_main=0.03, n_left=0.05, n_right=0.06, bed_slope=2e-4)
    return irr, simple, compound


def test_trapezoid_z_profile_matches_reference_z_at():
    _, ref_simple, ref_compound = _ref_sections()
    _, simple, compound = _our_stations()
    xq = np.linspace(-400.0, 400.0, 401)
    for ours, ref in [(simple, ref_simple), (compound, ref_compound)]:
        z_ref = np.array([ref.z_at(float(x)) for x in xq])
        z_ours = trapezoid_z_profile(ours, xq, z_cap=np.inf)
        np.testing.assert_allclose(z_ours, z_ref, rtol=1e-12)


@pytest.mark.parametrize("kind", ["simple", "compound"])
@pytest.mark.parametrize("order", ["trap_first", "irr_first"])
def test_mixed_blend_matches_reference(kind, order):
    import_reference()
    from src.hydromodel.cross_section import interpolate_cross_section

    ref_irr, ref_simple, ref_compound = _ref_sections()
    irr, simple, compound = _our_stations()
    ref_trap = ref_simple if kind == "simple" else ref_compound
    trap = simple if kind == "simple" else compound

    d1, d2 = 300.0, 700.0
    if order == "trap_first":
        ref_blend = interpolate_cross_section(ref_trap, ref_irr, d1, d2)
        ours = blend_stations(trap, irr, d2 / (d1 + d2), d1 / (d1 + d2))
    else:
        ref_blend = interpolate_cross_section(ref_irr, ref_trap, d1, d2)
        ours = blend_stations(irr, trap, d2 / (d1 + d2), d1 / (d1 + d2))

    assert isinstance(ours, IrregularStation)
    np.testing.assert_array_equal(ours.x, ref_blend.x)
    # profiles finite on this grid (sloped walls) -> exact parity
    np.testing.assert_allclose(ours.z, ref_blend.z, rtol=1e-12)

    z0 = ref_blend.z_min
    for hw in [z0 + 0.8, z0 + 2.5, z0 + 6.0, z0 + 9.0]:
        A, P, R, T = ref_blend.properties(float(hw))
        ours_props = polyline_properties(ours.x, ours.z, hw)
        np.testing.assert_allclose(ours_props, (A, P, R, T), rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(equivalent_n(ours, hw),
                                   ref_blend.get_equivalent_n(float(hw)), rtol=1e-10)


def test_trapezoid_as_irregular_reproduces_analytic_A():
    """The breakpoint polyline reproduces the trapezoid A(h)/T(h) exactly
    below the cap (used for trapezoid-station rasterization)."""
    from flowsim_tpu import geometry as geom
    from flowsim_tpu.ops import sections as sec

    _, simple, _ = _our_stations()
    poly = trapezoid_as_irregular(simple, depth_cap=15.0)
    g = geom.interpolate_stations([simple, simple], [0.0, 1.0], [0.0])
    for depth in [0.5, 3.0, 8.0, 14.0]:
        A_ref = float(sec.section_state(g, jnp.asarray([depth])).A[0])
        A_poly, _, _, _ = polyline_properties(poly.x, poly.z, simple.z_bed + depth)
        np.testing.assert_allclose(A_poly, A_ref, rtol=1e-12)


def test_mixed_channel_tables_and_node_types():
    """A mixed station list builds TableGeometry whose trapezoid-coincident
    nodes keep the analytic closures and whose mixed-blend nodes match the
    reference's interpolated irregular section."""
    import_reference()
    from src.hydromodel.cross_section import interpolate_cross_section
    from flowsim_tpu import geometry as geom
    from flowsim_tpu.ops import sections as sec

    ref_irr, ref_simple, _ = _ref_sections()
    irr, simple, _ = _our_stations()

    chainages = [0.0, 2000.0]
    nodes = [0.0, 500.0, 2000.0]
    geo = build_table_geometry([simple, irr], chainages, nodes, samples=4096)

    # node 0: exactly at the trapezoid station -> analytic closures
    g1 = geom.interpolate_stations([simple, simple], [0.0, 1.0], [0.0])
    for depth in [1.0, 4.0, 8.0]:
        s_tab = sec.section_state(geo, jnp.asarray([depth, 0.0, 0.0]))
        s_ana = sec.section_state(g1, jnp.asarray([depth]))
        np.testing.assert_allclose(float(s_tab.A[0]), float(s_ana.A[0]), rtol=5e-4)
        np.testing.assert_allclose(float(s_tab.K[0]), float(s_ana.K[0]), rtol=5e-4)

    # node 1: mixed blend -> reference interpolated section
    ref_blend = interpolate_cross_section(ref_simple, ref_irr, 500.0, 1500.0)
    for depth in [1.0, 4.0, 8.0]:
        s_tab = sec.section_state(geo, jnp.asarray([0.0, depth, 0.0]))
        hw = ref_blend.z_min + depth
        A, P, R, T = ref_blend.properties(float(hw))
        np.testing.assert_allclose(float(s_tab.A[1]), A, rtol=2e-3)
        np.testing.assert_allclose(float(s_tab.T[1]), T, rtol=5e-3)


def test_mixed_channel_simulation_runs():
    """End-to-end: Channel accepts a mixed station list and the Preissmann
    solver converges on it (previously raised NotImplementedError)."""
    from flowsim_tpu.api import Boundary, Channel, Hydrograph, PreissmannSolver

    irr, simple, compound = _our_stations()
    length = 6000.0
    z_us = 481.0 + length * 2e-4

    sim = TrapezoidStation(z_bed=z_us, b_main=80.0, m_main=2.5, n_main=0.03,
                           bed_slope=2e-4)
    mid = IrregularStation(x=irr.x, z=irr.z - irr.z.min() + 481.0 + 3000.0 * 2e-4,
                           n_main=0.035, bed_slope=2e-4)
    ds_st = TrapezoidStation(z_bed=481.0, b_main=90.0, m_main=2.0, n_main=0.03,
                             bed_slope=2e-4)

    def hyd_fn(t):
        return 300.0 + 500.0 * min(t / (4 * 3600.0), 1.0)

    us = Boundary(condition="flow_hydrograph", bed_level=z_us, chainage=0.0,
                  hydrograph=Hydrograph(function=hyd_fn))
    ds = Boundary(condition="normal_depth", bed_level=481.0, chainage=length)
    ch = Channel(initial_flow=300.0, upstream_boundary=us, downstream_boundary=ds,
                 interpolation_method="steady-state")
    ch.set_cross_sections([0.0, 3000.0, length], [sim, mid, ds_st])
    solver = PreissmannSolver(channel=ch, theta=0.7, time_step=900.0,
                              spatial_step=500.0, simulation_time=6 * 3600.0)
    out = solver.run(verbose=0, tolerance=1e-6)
    assert bool(np.asarray(out.converged).all())
    assert np.isfinite(solver.depth).all()
