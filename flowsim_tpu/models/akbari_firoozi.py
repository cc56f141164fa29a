"""Akbari-Firoozi literature benchmark reach
(ref: cases/akbari_firoozi/{settings,main_preissmann,main_lax}.py).

Rectangular 29 km x 120 m channel, n = 0.023, S0 = 0.00061, sinusoidal
inflow 100 -> 300 m^3/s, steady-state ICs, downstream normal-depth BC.
Runs both schemes for the cross-scheme comparison.

Run: ``python -m flowsim_tpu.models.akbari_firoozi [preissmann|lax]``
"""

from __future__ import annotations

import sys
from math import cos, pi, sin

from flowsim_tpu.api import Boundary, Channel, Hydrograph, LaxSolver, PreissmannSolver

width = 120
length = 29000
roughness = 0.023
S_0 = 0.00061
spatial_step = 1000
duration = 20 * 3600
tolerance = 1e-4
theta = 0.5
preissmann_dt = 3600
lax_dt = 150
lax_secondary_bc = ("constant", "constant")
initial_flow = 100


def hydrograph(t):
    """Sinusoidal inflow wave (ref settings.py:22-34)."""
    t_b = 15 * 3600
    t_p = 5 * 3600
    Q_p = 200
    Q_b = initial_flow
    if t <= t_p:
        return Q_p / 2 * sin(pi * t / t_p - pi / 2) + Q_p / 2 + Q_b
    elif t_p < t <= t_b:
        return Q_p / 2 * cos(pi * (t - t_p) / (t_b - t_p)) + Q_p / 2 + Q_b
    return Q_b


def build(scheme: str = "preissmann"):
    us = Boundary(condition="flow_hydrograph", bed_level=S_0 * length, chainage=0,
                  hydrograph=Hydrograph(function=hydrograph))
    ds = Boundary(condition="normal_depth", bed_level=0, chainage=length)
    channel = Channel(width=width, initial_flow=initial_flow, roughness=roughness,
                      upstream_boundary=us, downstream_boundary=ds,
                      interpolation_method="steady-state")
    if scheme == "preissmann":
        solver = PreissmannSolver(channel=channel, theta=theta, time_step=preissmann_dt,
                                  spatial_step=spatial_step, simulation_time=duration)
    else:
        solver = LaxSolver(channel=channel, time_step=lax_dt, spatial_step=spatial_step,
                           simulation_time=duration, secondary_BC=lax_secondary_bc)
    return solver, channel


def main(scheme="preissmann", folder=None):
    solver, _ = build(scheme)
    if scheme == "preissmann":
        solver.run(verbose=1, tolerance=tolerance)
    else:
        solver.run(verbose=0)
    if folder:
        solver.save_results(folder_path=folder)
    print("Simulation finished successfuly.")
    return solver


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["preissmann"]))
