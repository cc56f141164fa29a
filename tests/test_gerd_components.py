"""GERD case component parity: release routing, Roseires rating curve."""

import os
import sys

import numpy as np
import pytest

from tests.oracle import REFERENCE_ROOT, import_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

REF_DATA = os.path.join(REFERENCE_ROOT, "cases", "gerd_roseires", "data")


@pytest.fixture(scope="module")
def ref_cwd(tmp_path_factory):
    """A cwd where the reference's literal Windows-style relative paths
    resolve (the reference hardcodes 'cases\\gerd_roseires\\data\\...' which
    on Linux is a filename containing backslashes)."""
    d = tmp_path_factory.mktemp("refrun")
    for name in [
        "gerd_vol_curve.csv",
        "roseires_spillway_releases.csv",
        "roseires_deep_sluice_releases.csv",
        "composite_trapezoids.csv",
        "centerline_coords.csv",
        "inflow_hydrograph.csv",
        "inflow_hydrograph_small.csv",
    ]:
        link = d / ("cases\\gerd_roseires\\data\\" + name)
        link.symlink_to(os.path.join(REF_DATA, name))
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


def test_gerd_hydrograph_table_matches(ref_cwd):
    import_reference()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from cases.gerd_roseires.gerd_discharge import GerdHydrograph as RefGerd
    from src.hydromodel.hydrograph import Hydrograph as RefHyd

    from flowsim_tpu.api import Hydrograph
    from flowsim_tpu.models.gerd_roseires.gerd_discharge import GerdHydrograph
    from flowsim_tpu.models.gerd_roseires.settings import sin_wave

    dt, T = 3600, 3600 * 96
    ref = RefGerd()
    ref.build(inflow_hydrograph=RefHyd(function=sin_wave), time_step=dt, duration=T, initial_stage=637.0)

    ours = GerdHydrograph()
    ours.build(inflow_hydrograph=Hydrograph(function=sin_wave), time_step=dt, duration=T, initial_stage=637.0)

    np.testing.assert_allclose(ours.table, ref.table, rtol=1e-9, atol=1e-6)


def test_roseires_rating_curve_matches(ref_cwd):
    import_reference()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from cases.gerd_roseires.roseires_rating_curve import RoseiresRatingCurve as RefRC

    from flowsim_tpu.models.gerd_roseires.roseires_rating_curve import RoseiresRatingCurve

    kw = dict(initial_stage=487.0, initial_flow=2094.106301)
    ref = RefRC(**kw)
    ours = RoseiresRatingCurve(**kw)

    stages = np.linspace(470.0, 492.0, 45)
    for s in stages:
        q_ref = ref.discharge(stage=s, update_stage=False, update_gate_state=False)  # smooth
        q_ours = ours.discharge(stage=s)
        np.testing.assert_allclose(q_ours, q_ref, rtol=1e-6, err_msg=f"stage {s}")
        d_ref = ref.dQ_dz(s)
        d_ours = ours.dQ_dz(s)
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-5, atol=1e-3, err_msg=f"dQdz {s}")

    # non-smooth gate states
    for s in [480.0, 487.0, 492.0]:
        q_ref = ref.discharge(stage=s, update_stage=False, update_gate_state=False, smooth=False)
        q_ours = ours.discharge(stage=s, update_stage=False, update_gate_state=False, smooth=False)
        np.testing.assert_allclose(q_ours, q_ref, rtol=1e-6)


def test_release_envelopes_match_repo_csvs(ref_cwd):
    """Low/high release curves vs the stored CSV artifacts
    (ref low/high_release_rating_curve.csv, generator roseires:259-280)."""
    import pandas as pd

    from flowsim_tpu.models.gerd_roseires.roseires_rating_curve import RoseiresRatingCurve

    low = pd.read_csv(os.path.join(REFERENCE_ROOT, "low_release_rating_curve.csv"))
    high = pd.read_csv(os.path.join(REFERENCE_ROOT, "high_release_rating_curve.csv"))

    rc_low = RoseiresRatingCurve(initial_stage=487.0, initial_flow=2094.106301, initially_open=False)
    rc_high = RoseiresRatingCurve(initial_stage=487.0, initial_flow=2094.106301, initially_open=True)
    for (_, row_l), (_, row_h) in zip(low.iterrows(), high.iterrows()):
        y = row_l["Y"]
        np.testing.assert_allclose(
            rc_low.discharge(stage=y, update_stage=False, update_gate_state=False, smooth=False),
            row_l["Q"], rtol=1e-5,
        )
        np.testing.assert_allclose(
            rc_high.discharge(stage=y, update_stage=False, update_gate_state=False, smooth=False),
            row_h["Q"], rtol=1e-5,
        )


def test_trapezoid_station_loading_matches(ref_cwd):
    import_reference()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from cases.gerd_roseires.custom_functions import load_trapzoid_xs

    from flowsim_tpu.utils.io import load_trapezoid_stations

    ref_ch, ref_xs = load_trapzoid_xs("cases\\gerd_roseires\\data\\composite_trapezoids.csv")
    ch, sts = load_trapezoid_stations(os.path.join(REF_DATA, "composite_trapezoids.csv"))

    assert len(ch) == len(ref_ch) == 21
    np.testing.assert_allclose(ch, ref_ch)
    for st, rx in zip(sts, ref_xs):
        assert st.z_bed == rx.z_bed
        assert st.b_main == rx.b_main
        assert st.m_main == rx.m_main
        assert st.n_main == rx.n_main
        assert st.z_bed + st.h_bank == pytest.approx(rx.z_bank)
        assert st.b_fp_left == rx.b_fp_left
        assert st.m_fp == rx.m_fp
