"""Non-smooth gated rating curve: explicit gate state in the solver scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowsim_tpu.ops import rating_curve as rcurve


def test_gate_update_hysteresis_and_cooldown():
    rc = rcurve.make_gated_blend([0.1, 10.0, 100.0], [0.2, 20.0, 200.0],
                                 pivot_stage=487.0, max_cooldown=5 * 3600)
    f = lambda *a: [np.asarray(v) for v in rcurve.gate_update(rc, *map(jnp.asarray, a))]

    # closed, below the open threshold: stays closed
    g, cd, pt = f(0.0, 0.0, -1.0, 487.2, 3600.0)
    assert g == 0.0 and cd == 0.0
    # closed, at/above pivot+0.5: opens and starts cooldown
    g, cd, pt = f(0.0, 0.0, 3600.0, 487.6, 7200.0)
    assert g == 1.0 and cd == 5 * 3600
    # open, wants to close but cooldown not yet elapsed
    g, cd, pt = f(1.0, 5 * 3600.0, 7200.0, 485.0, 10800.0)
    assert g == 1.0 and cd == 5 * 3600 - 3600
    # open, cooldown elapsed, below pivot-1: closes
    g, cd, pt = f(1.0, 3600.0, 10800.0, 485.0, 6 * 3600.0)
    assert g == 0.0 and cd == 5 * 3600


def test_gated_discharge_switches_curves():
    rc = rcurve.make_gated_blend([0.0, 0.0, 100.0], [0.0, 0.0, 500.0], pivot_stage=10.0)
    assert float(rcurve.gated_discharge(rc, jnp.asarray(10.0), jnp.asarray(0.0))) == 100.0
    assert float(rcurve.gated_discharge(rc, jnp.asarray(10.0), jnp.asarray(1.0))) == 500.0


def test_gated_simulation_runs_and_gates_respond():
    """A reach whose downstream stage crosses the open threshold mid-flood
    must open the gates (higher release) and record the transition."""
    from flowsim_tpu.api import Boundary, Channel, Hydrograph, RatingCurve, PreissmannSolver

    length = 20000.0
    bed_ds = 0.0

    def hyd_fn(t):
        base, peak = 500.0, 6000.0
        ramp = 6 * 3600.0
        return base + (peak - base) * min(t / ramp, 1.0)

    # rating quads referencing the initial stage ~4 m depth
    pivot = bed_ds + 4.0
    low = [0.0, 150.0, 500.0 - 150.0 * pivot]     # Q(stage) = 150 (stage) + c
    high = [0.0, 200.0, 1100.0 - 200.0 * pivot]   # modest jump: gates must not
    rc = RatingCurve(rcurve.make_gated_blend(low, high, pivot_stage=pivot, max_cooldown=3600.0))

    us = Boundary(condition="flow_hydrograph", bed_level=length * 2e-4, chainage=0,
                  hydrograph=Hydrograph(function=hyd_fn))
    ds = Boundary(condition="rating_curve", bed_level=bed_ds, chainage=length,
                  initial_depth=4.0, rating_curve=rc)
    ch = Channel(width=200.0, initial_flow=500.0, roughness=0.03,
                 upstream_boundary=us, downstream_boundary=ds,
                 interpolation_method="GVF_equation")
    s = PreissmannSolver(channel=ch, theta=0.7, time_step=900, spatial_step=1000,
                         simulation_time=12 * 3600)
    out = s.run(verbose=0, tolerance=1e-8)

    gates = np.asarray(out.gate_open)
    assert gates[0] == 0.0
    assert gates[-1] == 1.0, "gates should open during the flood"
    k_open = int(np.argmax(gates > 0.5))
    # stage at the level before opening must have exceeded pivot + 0.5
    stage_before = s.depth[k_open - 1, -1] + bed_ds
    assert stage_before >= pivot + 0.5 - 1e-6
    # release jumps when the gate opens (discharge curve switches)
    assert s.flow[k_open, -1] > s.flow[k_open - 1, -1] + 200.0
