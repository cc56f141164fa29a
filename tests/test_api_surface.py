"""Small reference-API-surface parity: utility functions, RatingCurve
.tostring, Channel per-node closure accessors, solver state accessors
(ref utility.py, rating_curve.py:149-162, channel.py:53-190,
solver.py:244-296)."""

import numpy as np
import pytest

from flowsim_tpu.api import RatingCurve
from flowsim_tpu.utils import utility as util
from tests.oracle import import_reference, reference_available

pytestmark = [pytest.mark.fast,
              pytest.mark.skipif(not reference_available(),
                                 reason="reference not mounted")]


def test_utility_parity():
    hm = import_reference()
    ru = hm.utility
    rng = np.random.default_rng(0)
    v = rng.normal(size=257)
    assert util.euclidean_norm(v) == pytest.approx(ru.euclidean_norm(v),
                                                   rel=1e-15)
    assert util.manhattan_norm(v) == pytest.approx(ru.manhattan_norm(v),
                                                   rel=1e-15)
    for s in (0, 59, 61, 3599, 3661, 86399, -5):
        assert util.seconds_to_hms(s) == ru.seconds_to_hms(s)
    t = np.linspace(0, 2 * np.pi, 50)
    x, y = 1000 * np.cos(t), 800 * np.sin(t)
    np.testing.assert_allclose(util.compute_curv(x, y),
                               ru.compute_curv(x, y), rtol=1e-12)


def test_rating_curve_tostring():
    hm = import_reference()
    ref = hm.rating_curve.RatingCurve()
    ref.set("polynomial", 0.5, -2.0, 30.0, stage_shift=None)
    rc = RatingCurve()
    rc.set("polynomial", 0.5, -2.0, 30.0)
    assert rc.tostring() == ref.tostring()

    ref2 = hm.rating_curve.RatingCurve()
    ref2.set("power", 1.7, 1.4, stage_shift=None)
    rc2 = RatingCurve()
    rc2.set("power", 1.7, 1.4)
    assert rc2.tostring() == ref2.tostring()

    with pytest.raises(ValueError):
        RatingCurve().tostring()


@pytest.fixture(scope="module")
def example_pair():
    """Run cases/example on both implementations."""
    from tests.test_preissmann_parity import (run_ours_example,
                                              run_reference_example)

    return run_ours_example(1e-8), run_reference_example(1e-8)


def test_solver_accessors_match_reference(example_pair):
    solver, ref = example_pair
    for k in (None, -1, 5):
        for i in (0, 7, solver.number_of_nodes - 1):
            assert solver.depth_at(k, i) == pytest.approx(
                ref.depth_at(k=k, i=i), rel=1e-5)
            assert solver.flow_at(k, i) == pytest.approx(
                ref.flow_at(k=k, i=i), rel=1e-5)
            assert solver.water_level_at(k, i) == pytest.approx(
                ref.water_level_at(k=k, i=i), rel=1e-5)
            assert solver.area_at(k, i) == pytest.approx(
                ref.area_at(k=k, i=i), rel=1e-5)
            assert solver.Se_at(k, i) == pytest.approx(
                ref.Se_at(k=k, i=i), rel=1e-4, abs=1e-12)
            assert solver.dA_dh(k, i) == pytest.approx(
                ref.dA_dh(k=k, i=i), rel=1e-5)
    with pytest.raises(ValueError):
        solver.depth_at(0, None)


def test_channel_closure_accessors(example_pair):
    solver, ref = example_pair
    ch, rch = solver.channel, ref.channel
    for i in (0, 3, 11):
        h, Q = ref.depth_at(k=None, i=i), ref.flow_at(k=None, i=i)
        hw = rch.bed_level_at(i=i) + h
        assert ch.area_at(i, hw) == pytest.approx(rch.area_at(i=i, hw=hw),
                                                  rel=1e-9)
        assert ch.dA_dh(i, hw) == pytest.approx(rch.dA_dh(i=i, hw=hw),
                                                rel=1e-9)
        assert ch.Se(h, Q, i) == pytest.approx(rch.Se(h=h, Q=Q, i=i),
                                               rel=1e-9, abs=1e-15)
        assert ch.dSe_dA(h, Q, i) == pytest.approx(
            rch.dSe_dA(h=h, Q=Q, i=i), rel=1e-9, abs=1e-15)
        assert ch.dSe_dQ(h, Q, i) == pytest.approx(
            rch.dSe_dQ(h=h, Q=Q, i=i), rel=1e-9, abs=1e-15)
