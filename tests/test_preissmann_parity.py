"""End-to-end Preissmann parity vs the reference solver (SURVEY.md §4).

Runs the reference NumPy/SciPy solver in-process on the bundled case
configurations and asserts the prognostic (h, Q) fields of flowsim_tpu match
allclose after all time levels.  Tolerances: both sides converge each level to
``tol`` on the pre-update residual and then apply one extra Newton increment,
so trajectories can differ by O(J^{-1} tol) plus arithmetic noise; we run with
tight tolerances to shrink that window.
"""

import math

import numpy as np
import pytest

from tests.oracle import import_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def akbari_hydrograph(t):
    # ref cases/akbari_firoozi/settings.py:22-34
    t_b = 15 * 3600
    t_p = 5 * 3600
    Q_p = 200
    Q_b = 100
    if t <= t_p:
        return Q_p / 2 * math.sin(math.pi * t / t_p - math.pi / 2) + Q_p / 2 + Q_b
    elif t <= t_b:
        return Q_p / 2 * math.cos(math.pi * (t - t_p) / (t_b - t_p)) + Q_p / 2 + Q_b
    return Q_b


def example_hydrograph(t):
    # ref cases/example/main.py:8-28
    initial_flow, peak_flow = 1000, 10000
    time_to_peak, peak_time, recession_time = 3 * 3600, 6 * 3600, 4 * 3600
    if t <= 0:
        return initial_flow
    if t < time_to_peak:
        return initial_flow + (peak_flow - initial_flow) * t / time_to_peak
    if t - time_to_peak < peak_time:
        return peak_flow
    if t - time_to_peak - peak_time < recession_time:
        return peak_flow - (peak_flow - initial_flow) * (t - time_to_peak - peak_time) / recession_time
    return initial_flow


def run_reference_akbari(tolerance):
    import_reference()
    from src.hydromodel.boundary import Boundary
    from src.hydromodel.channel import Channel
    from src.hydromodel.hydrograph import Hydrograph
    from src.hydromodel.preissmann import PreissmannSolver

    S_0, length, width, roughness = 0.00061, 29000, 120, 0.023
    us = Boundary(condition="flow_hydrograph", bed_level=S_0 * length, chainage=0,
                  hydrograph=Hydrograph(akbari_hydrograph))
    ds = Boundary(condition="normal_depth", bed_level=0, chainage=length)
    channel = Channel(width=width, initial_flow=100, roughness=roughness,
                      upstream_boundary=us, downstream_boundary=ds,
                      interpolation_method="steady-state")
    solver = PreissmannSolver(channel=channel, theta=0.5, time_step=3600,
                              spatial_step=1000, simulation_time=20 * 3600)
    solver.run(verbose=0, tolerance=tolerance)
    return solver


def run_ours_akbari(tolerance, **kw):
    from flowsim_tpu.api import Boundary, Channel, Hydrograph, PreissmannSolver

    S_0, length, width, roughness = 0.00061, 29000, 120, 0.023
    us = Boundary(condition="flow_hydrograph", bed_level=S_0 * length, chainage=0,
                  hydrograph=Hydrograph(function=akbari_hydrograph))
    ds = Boundary(condition="normal_depth", bed_level=0, chainage=length)
    channel = Channel(width=width, initial_flow=100, roughness=roughness,
                      upstream_boundary=us, downstream_boundary=ds,
                      interpolation_method="steady-state")
    solver = PreissmannSolver(channel=channel, theta=0.5, time_step=3600,
                              spatial_step=1000, simulation_time=20 * 3600, **kw)
    solver.run(verbose=0, tolerance=tolerance)
    return solver


def run_reference_example(tolerance):
    import_reference()
    from src.hydromodel.boundary import Boundary
    from src.hydromodel.channel import Channel
    from src.hydromodel.hydrograph import Hydrograph
    from src.hydromodel.lumped_storage import LumpedStorage
    from src.hydromodel.preissmann import PreissmannSolver

    us = Boundary(condition="flow_hydrograph", bed_level=5, chainage=0,
                  hydrograph=Hydrograph(function=example_hydrograph))
    ds = Boundary(condition="fixed_depth", initial_depth=5, bed_level=0, chainage=20000)
    ss = LumpedStorage(surface_area=5000 * 250, min_stage=5, solution_boundaries=(0, 200))
    ds.set_lumped_storage(ss)
    channel = Channel(width=250, initial_flow=example_hydrograph(0), roughness=0.027,
                      upstream_boundary=us, downstream_boundary=ds)
    solver = PreissmannSolver(channel=channel, theta=0.8, time_step=3600,
                              spatial_step=1000, simulation_time=24 * 3600)
    solver.run(verbose=0, max_iter=100, tolerance=tolerance)
    return solver


def run_ours_example(tolerance, **kw):
    from flowsim_tpu.api import Boundary, Channel, Hydrograph, LumpedStorage, PreissmannSolver

    us = Boundary(condition="flow_hydrograph", bed_level=5, chainage=0,
                  hydrograph=Hydrograph(function=example_hydrograph))
    ds = Boundary(condition="fixed_depth", initial_depth=5, bed_level=0, chainage=20000)
    ss = LumpedStorage(surface_area=5000 * 250, min_stage=5, solution_boundaries=(0, 200))
    ds.set_lumped_storage(ss)
    channel = Channel(width=250, initial_flow=example_hydrograph(0), roughness=0.027,
                      upstream_boundary=us, downstream_boundary=ds)
    solver = PreissmannSolver(channel=channel, theta=0.8, time_step=3600,
                              spatial_step=1000, simulation_time=24 * 3600, **kw)
    solver.run(verbose=0, max_iter=100, tolerance=tolerance)
    return solver


class TestAkbari:
    def test_initial_conditions_match(self):
        ref = run_reference_akbari(1e-8)
        ours = run_ours_akbari(1e-8)
        np.testing.assert_allclose(
            np.asarray(ours.h0), ref.channel.initial_conditions[:, 0], rtol=1e-9, atol=1e-10
        )

    def test_fields_match(self):
        tol = 1e-8
        ref = run_reference_akbari(tol)
        ours = run_ours_akbari(tol)
        assert ours.depth.shape == ref.depth.shape
        np.testing.assert_allclose(ours.depth, ref.depth, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(ours.flow, ref.flow, rtol=1e-6, atol=1e-6)

    def test_thomas_and_fixed_newton_match(self):
        tol = 1e-8
        a = run_ours_akbari(tol)
        b = run_ours_akbari(tol, linear_solver="thomas")
        c = run_ours_akbari(tol, newton="fixed")
        np.testing.assert_allclose(a.depth, b.depth, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(a.depth, c.depth, rtol=1e-8, atol=1e-10)


class TestExample:
    def test_initial_conditions_match(self):
        ref = run_reference_example(1e-8)
        ours = run_ours_example(1e-8)
        np.testing.assert_allclose(
            np.asarray(ours.h0), ref.channel.initial_conditions[:, 0], rtol=1e-9, atol=1e-10
        )

    def test_fields_match(self):
        tol = 1e-8
        ref = run_reference_example(tol)
        ours = run_ours_example(tol)
        np.testing.assert_allclose(ours.depth, ref.depth, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(ours.flow, ref.flow, rtol=1e-6, atol=1e-4)

    def test_reservoir_stage_matches(self):
        tol = 1e-8
        ref = run_reference_example(tol)
        ours = run_ours_example(tol)
        # note: ref prepare_results() has already inserted the initial stage
        # at index 0 (ref solver.py:108); solved levels start at entry 1.
        ref_stages = np.asarray(
            [s[1] for s in ref.channel.downstream_boundary.lumped_storage.stage_hydrograph],
            dtype=np.float64,
        )
        np.testing.assert_allclose(
            ours.output.reservoir_stage[1:], ref_stages[1:], rtol=1e-7, atol=1e-7
        )
