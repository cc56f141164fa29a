"""Vectorized section closures vs the reference TrapezoidalSection."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowsim_tpu.geometry import TrapezoidStation, interpolate_stations
from flowsim_tpu.ops import sections as sec
from tests.oracle import import_reference, reference_available

pytestmark = [pytest.mark.fast, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]


def _geo_from_stations(stations, chainages, node_ch, **kw):
    return interpolate_stations(stations, np.asarray(chainages), np.asarray(node_ch), **kw)


def _ref_sections(stations, chainages, node_ch):
    import_reference()
    from src.hydromodel.cross_section import TrapezoidalSection, interpolate_cross_section

    refs = []
    for st, _ in zip(stations, chainages):
        pass
    ref_stations = []
    for st in stations:
        ref_stations.append(
            TrapezoidalSection(
                z_bed=st.z_bed,
                b_main=st.b_main,
                m_main=st.m_main,
                n_main=st.n_main,
                z_bank=None if st.h_bank is None else st.z_bed + st.h_bank,
                b_fp_left=st.b_fp_left,
                b_fp_right=st.b_fp_right,
                m_fp=st.m_fp,
                n_left=st.n_left,
                n_right=st.n_right,
                bed_slope=st.bed_slope,
                curvature=st.curvature,
            )
        )
    chain = np.asarray(chainages, float)
    out = []
    for s in node_ch:
        if s <= chain[0]:
            out.append(ref_stations[0])
            continue
        if s >= chain[-1]:
            out.append(ref_stations[-1])
            continue
        j = int(np.searchsorted(chain, s)) - 1
        out.append(
            interpolate_cross_section(
                xs1=ref_stations[j],
                xs2=ref_stations[j + 1],
                dist1=s - chain[j],
                dist2=chain[j + 1] - s,
            )
        )
    return out


STATIONS = [
    TrapezoidStation(z_bed=10.0, b_main=50.0, m_main=0.0, n_main=0.03, bed_slope=1e-4),
    TrapezoidStation(z_bed=8.0, b_main=40.0, m_main=2.0, n_main=0.025, bed_slope=1e-4),
    TrapezoidStation(
        z_bed=5.0, b_main=30.0, m_main=1.5, n_main=0.028, h_bank=4.0,
        b_fp_left=20.0, b_fp_right=35.0, m_fp=3.0, n_left=0.05, n_right=0.06,
        bed_slope=2e-4, curvature=1e-3,
    ),
    TrapezoidStation(
        z_bed=3.0, b_main=45.0, m_main=2.5, n_main=0.033, h_bank=6.0,
        b_fp_left=10.0, b_fp_right=12.0, m_fp=4.0, n_left=0.045, n_right=0.05,
        bed_slope=2e-4, curvature=-5e-4,
    ),
]
CHAINAGES = [0.0, 1000.0, 2500.0, 4000.0]
NODE_CH = np.linspace(0.0, 4000.0, 17)


def test_properties_and_closures_match_reference():
    geo = _geo_from_stations(STATIONS, CHAINAGES, NODE_CH)
    refs = _ref_sections(STATIONS, CHAINAGES, NODE_CH)

    for depth in [0.05, 0.8, 2.0, 3.999, 4.0, 4.2, 7.5, 15.0]:
        d = jnp.full(len(refs), depth)
        st = sec.section_state(geo, d)
        for i, rs in enumerate(refs):
            hw = rs.z_min + depth
            A, P, R, T = rs.properties(hw)
            np.testing.assert_allclose(float(st.A[i]), A, rtol=1e-10, err_msg=f"A node {i} d={depth}")
            np.testing.assert_allclose(float(st.P[i]), P, rtol=1e-10)
            np.testing.assert_allclose(float(st.R[i]), R, rtol=1e-10)
            np.testing.assert_allclose(float(st.T[i]), T, rtol=1e-10)
            np.testing.assert_allclose(float(st.K[i]), rs.conveyance(hw), rtol=1e-10)
            np.testing.assert_allclose(float(st.n_eq[i]), rs.get_equivalent_n(hw), rtol=1e-10)
            np.testing.assert_allclose(float(st.dA_dh[i]), rs.dA_dh(hw), rtol=1e-10)
            np.testing.assert_allclose(float(st.dR_dA[i]), rs.dR_dA(hw), rtol=1e-10)
            np.testing.assert_allclose(float(st.dK_dA[i]), rs.dK_dA(hw), rtol=1e-10)


def test_energy_slope_matches_reference():
    geo = _geo_from_stations(STATIONS, CHAINAGES, NODE_CH)
    refs = _ref_sections(STATIONS, CHAINAGES, NODE_CH)
    rng = np.random.default_rng(1)

    for depth in [0.8, 3.0, 4.5, 9.0]:
        d = jnp.full(len(refs), depth)
        Q = jnp.asarray(rng.uniform(100.0, 8000.0, len(refs)))
        es = sec.energy_slope(geo, d, Q)
        for i, rs in enumerate(refs):
            q = float(Q[i])
            sf = rs.friction_slope(h=depth, Q=q)
            scs = rs.curvature_slope(h=depth, Q=q)
            np.testing.assert_allclose(float(es.Se[i]), sf + scs, rtol=1e-10)
            d_ref = rs.dSf_dA(h=depth, Q=q) + rs.dSc_dA(h=depth, Q=q)
            np.testing.assert_allclose(float(es.dSe_dA_eff[i]), d_ref, rtol=1e-9)
            dq_ref = rs.dSf_dQ(h=depth, Q=q) + rs.dSc_dQ(h=depth, Q=q)
            np.testing.assert_allclose(float(es.dSe_dQ[i]), dq_ref, rtol=1e-9)


def test_normal_flow_matches_reference():
    geo = _geo_from_stations(STATIONS, CHAINAGES, NODE_CH)
    refs = _ref_sections(STATIONS, CHAINAGES, NODE_CH)
    for depth in [1.0, 5.0]:
        d = jnp.full(len(refs), depth)
        qn = sec.normal_flow(geo, d)
        for i, rs in enumerate(refs):
            np.testing.assert_allclose(float(qn[i]), rs.normal_flow(hw=rs.z_min + depth), rtol=1e-10)


def test_dry_section_is_zero_and_finite():
    geo = _geo_from_stations(STATIONS, CHAINAGES, NODE_CH)
    st = sec.section_state(geo, jnp.zeros(geo.n_nodes))
    for arr in [st.A, st.P, st.R, st.T, st.K]:
        assert np.all(np.asarray(arr) == 0.0)
    es = sec.energy_slope(geo, jnp.zeros(geo.n_nodes), jnp.zeros(geo.n_nodes))
    assert np.all(np.isfinite(np.asarray(es.Se)))
