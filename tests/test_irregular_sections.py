"""Irregular (polyline) sections: table closures + simulation parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowsim_tpu.geometry_tables import (
    IrregularStation,
    build_table_geometry,
    polyline_properties,
    equivalent_n,
    effective_conveyance,
)
from flowsim_tpu.ops import sections as sec
from tests.oracle import import_reference, reference_available

pytestmark = [pytest.mark.fast, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]


def make_polyline(seed=0, n_pts=25, relief=12.0, width=300.0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, width, n_pts))
    x[0], x[-1] = 0.0, width
    # V-shaped valley with noise and a levee to create multiple subchannels
    z = relief * np.abs(x - width * 0.45) / (width * 0.55) + rng.uniform(0, 2.0, n_pts)
    z[n_pts // 2] += 6.0  # levee
    return x, z


def ref_station(x, z, n=0.03, bed_slope=1e-4):
    import_reference()
    from src.hydromodel.cross_section import IrregularSection

    return IrregularSection(x=x, z=z, n=n, bed_slope=bed_slope)


def test_polyline_properties_match_reference():
    x, z = make_polyline()
    st = IrregularStation(x=x, z=z, n_main=0.03)
    ref = ref_station(x, z)
    for hw in np.linspace(z.min() + 0.3, z.max() + 5.0, 23):
        ours = polyline_properties(st.x, st.z, hw)
        theirs = ref.properties(float(hw))
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12, err_msg=f"hw={hw}")
        np.testing.assert_allclose(equivalent_n(st, hw), ref.get_equivalent_n(float(hw)), rtol=1e-12)
        np.testing.assert_allclose(conveyance_eff := effective_conveyance(st, hw),
                                   _ref_K_eff(ref, float(hw)), rtol=1e-10)


def _ref_K_eff(ref, hw):
    """Effective conveyance the reference uses inside Sf (ref :373-394)."""
    h = hw - ref.z_min
    sf = ref.friction_slope(h=h, Q=100.0)
    return np.sqrt(100.0 * 100.0 / sf)


def test_split_section_dK_dA_matches_reference():
    """On a section split by a levee into multiple wetted subchannels, the
    table's dK/dA must be the derivative of the composite Horton K — the
    reference combines per-subchannel derivatives (ref cross_section.py:
    395-420 dSf_dA), not the single-channel formula on the full section."""
    from flowsim_tpu.geometry_tables import _split_K_and_dK_dA, _subchannels

    x, z = make_polyline()
    st = IrregularStation(x=x, z=z, n_main=0.03)
    ref = ref_station(x, z)
    Q = 100.0
    checked = 0
    for hw in np.linspace(z.min() + 1.0, z[len(z) // 2] - 0.2, 9):
        subs = _subchannels(st.x, st.z, float(hw))
        if len(subs) <= 1:
            continue
        checked += 1
        K, dK = _split_K_and_dK_dA(st, subs, float(hw), 1e-6)
        # invert ref dSf_dA = -2 Q^2 K^-3 dK_dA through its own K_eff
        K_ref = _ref_K_eff(ref, float(hw))
        dSf = ref.dSf_dA(h=float(hw) - ref.z_min, Q=Q)
        dK_ref = -dSf * K_ref**3 / (2.0 * Q * Q)
        np.testing.assert_allclose(K, K_ref, rtol=1e-10, err_msg=f"hw={hw}")
        np.testing.assert_allclose(dK, dK_ref, rtol=1e-8, err_msg=f"hw={hw}")
    assert checked >= 3  # the levee scenario actually splits the section


def test_table_geometry_closures_close():
    x, z = make_polyline()
    st = IrregularStation(x=x, z=z, n_main=0.03, bed_slope=1e-4)
    geo = build_table_geometry([st], [0.0], [0.0, 0.0], samples=2048)
    ref = ref_station(x, z)
    for depth in [0.5, 2.0, 5.0, 9.0]:
        s = sec.section_state(geo, jnp.full(2, depth))
        hw = ref.z_min + depth
        A, P, R, T = ref.properties(hw)
        np.testing.assert_allclose(float(s.A[0]), A, rtol=2e-4)
        np.testing.assert_allclose(float(s.T[0]), T, rtol=2e-3)
        np.testing.assert_allclose(float(s.K[0]), _ref_K_eff(ref, hw), rtol=1e-3)


def test_preissmann_with_irregular_sections_matches_reference():
    """Short routing through surveyed polyline sections vs the reference."""
    import_reference()
    from src.hydromodel.boundary import Boundary as RBoundary
    from src.hydromodel.channel import Channel as RChannel
    from src.hydromodel.cross_section import IrregularSection
    from src.hydromodel.hydrograph import Hydrograph as RHydrograph
    from src.hydromodel.preissmann import PreissmannSolver as RPreissmann

    length = 8000.0
    slope = 2e-4

    def section_pts(seed, z0):
        rng = np.random.default_rng(seed)
        x = np.linspace(0, 220, 21)
        z = z0 + 8.0 * ((x - 110) / 110) ** 2 + rng.uniform(0, 0.5, x.size)
        return x, z

    x1, z1 = section_pts(1, slope * length)
    x2, z2 = section_pts(2, 0.0)

    def hyd_fn(t):
        return 400.0 + 600.0 * min(t / (4 * 3600.0), 1.0)

    # reference
    us = RBoundary(condition="flow_hydrograph", bed_level=float(z1.min()), chainage=0,
                   hydrograph=RHydrograph(function=hyd_fn))
    ds = RBoundary(condition="normal_depth", bed_level=float(z2.min()), chainage=length)
    ch = RChannel(initial_flow=400.0, upstream_boundary=us, downstream_boundary=ds,
                  interpolation_method="steady-state")
    ch.set_cross_sections(
        chainages=[0.0, length],
        sections=[IrregularSection(x=x1, z=z1, n=0.03, bed_slope=slope),
                  IrregularSection(x=x2, z=z2, n=0.03, bed_slope=slope)],
    )
    rsolver = RPreissmann(channel=ch, theta=0.7, time_step=1800, spatial_step=1000,
                          simulation_time=8 * 3600)
    rsolver.run(verbose=0, tolerance=1e-8)

    # flowsim_tpu
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import preissmann as prs

    n_nodes = rsolver.number_of_nodes
    node_ch = np.linspace(0, length, n_nodes)
    sts = [IrregularStation(x=x1, z=z1, n_main=0.03, bed_slope=slope),
           IrregularStation(x=x2, z=z2, n_main=0.03, bed_slope=slope)]
    geo = build_table_geometry(sts, [0.0, length], node_ch, samples=3000)

    h0, Q0 = ic.initial_conditions(geo, "steady-state", 400.0, rsolver.spatial_step)
    times = np.arange(rsolver.number_of_time_levels) * 1800.0
    us_p = bnd.make_boundary("flow_hydrograph", bed_level=float(geo.z_bed[0]),
                             target_series=[hyd_fn(t) for t in times])
    ds_p = bnd.make_boundary("normal_depth", bed_level=float(geo.z_bed[-1]),
                             bed_slope=float(geo.bed_slope[-1]))
    sset = prs.PreissmannSettings(theta=0.7, time_step=1800.0,
                                  spatial_step=rsolver.spatial_step,
                                  n_time_levels=rsolver.number_of_time_levels,
                                  tolerance=1e-8, max_iter=100)
    out = prs.simulate(geo, us_p, ds_p, h0, Q0, sset)

    assert bool(np.asarray(out.converged).all())
    np.testing.assert_allclose(np.asarray(out.depth), rsolver.depth, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.flow), rsolver.flow, rtol=2e-3, atol=1e-1)
