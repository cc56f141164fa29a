"""Example case: 20 km rectangular reach routing a trapezoidal flood wave
into a reservoir (ref: cases/example/main.py).

Run: ``python -m flowsim_tpu.models.example [results_dir]``
"""

from __future__ import annotations

import sys

from flowsim_tpu.api import Boundary, Channel, Hydrograph, LumpedStorage, PreissmannSolver, LaxSolver


def trapezoid_hydrograph(t):
    """Trapezoidal flood wave 1,000 -> 10,000 m^3/s (ref main.py:8-28)."""
    initial_flow, peak_flow = 1000.0, 10000.0
    lag_time = 0.0
    time_to_peak = 3 * 3600.0
    peak_time = 6 * 3600.0
    recession_time = 4 * 3600.0
    if t <= lag_time:
        return initial_flow
    elif t - lag_time < time_to_peak:
        return initial_flow + (peak_flow - initial_flow) * (t - lag_time) / time_to_peak
    elif t - lag_time - time_to_peak < peak_time:
        return peak_flow
    elif t - lag_time - time_to_peak - peak_time < recession_time:
        return peak_flow - (peak_flow - initial_flow) * (t - lag_time - time_to_peak - peak_time) / recession_time
    return initial_flow


def build(scheme: str = "preissmann"):
    """(solver, channel) for the example configuration (ref main.py:31-57)."""
    us = Boundary(condition="flow_hydrograph", bed_level=5, chainage=0,
                  hydrograph=Hydrograph(function=trapezoid_hydrograph))
    ds = Boundary(condition="fixed_depth", initial_depth=5, bed_level=0, chainage=20000)
    ds.set_lumped_storage(LumpedStorage(surface_area=5000 * 250, min_stage=5,
                                        solution_boundaries=(0, 200)))
    if scheme == "preissmann":
        channel = Channel(width=250, initial_flow=trapezoid_hydrograph(0), roughness=0.027,
                          upstream_boundary=us, downstream_boundary=ds)
        solver = PreissmannSolver(channel=channel, theta=0.8, time_step=3600,
                                  spatial_step=1000, simulation_time=24 * 3600)
    else:  # ref main.py:64-80 (commented Lax variant)
        channel = Channel(width=250, initial_flow=trapezoid_hydrograph(0), roughness=0.027,
                          upstream_boundary=us, downstream_boundary=ds,
                          interpolation_method="steady-state")
        solver = LaxSolver(channel=channel, time_step=30, spatial_step=1000,
                           simulation_time=24 * 3600, secondary_BC=("constant", "constant"))
    return solver, channel


def main(folder="results/example"):
    solver, _ = build("preissmann")
    solver.run(verbose=1, max_iter=100)
    solver.save_results(folder_path=folder)
    print("Finished Preissmann.")
    return solver


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["results/example"]))
