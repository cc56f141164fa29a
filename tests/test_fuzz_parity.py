"""Randomized end-to-end parity vs the reference (SURVEY.md §4 strategy).

Ten seeded random channel configurations — rectangle / simple trapezoid /
compound trapezoid geometry, random slope, roughness, and sinusoidal
inflow — run through both implementations with identical convergence
semantics (tol 1e-8).  Fields must match to f64 parity tolerances and the
per-level Newton iteration counts must be identical.  All draws share one
static shape (N=21 nodes, 13 levels, theta=0.7) so the jitted solver
compiles once.
"""

import numpy as np
import pytest

from tests.oracle import import_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")

LENGTH = 20_000.0
DX = 1000
DT = 3600  # ints: the reference floor-divides these into array shapes
           # (ref solver.py:34-44; SURVEY.md §2.15.6)
HOURS = 12
THETA = 0.7
TOL = 1e-8


def draw_config(seed):
    rng = np.random.default_rng(seed)
    kind = ("rect", "trap", "compound")[seed % 3]
    cfg = dict(
        kind=kind,
        S0=float(rng.uniform(2e-4, 8e-4)),
        b_main=float(rng.uniform(80.0, 250.0)),
        m_main=0.0 if kind == "rect" else float(rng.uniform(0.5, 3.0)),
        n_main=float(rng.uniform(0.022, 0.038)),
        q_base=float(rng.uniform(400.0, 900.0)),
        q_amp=float(rng.uniform(0.5, 2.0)),
    )
    if kind == "compound":
        cfg.update(h_bank=float(rng.uniform(3.0, 5.0)),
                   b_fp=float(rng.uniform(30.0, 120.0)),
                   m_fp=float(rng.uniform(1.0, 4.0)),
                   n_fp=float(rng.uniform(0.04, 0.07)))
    return cfg


def inflow_fn(cfg):
    def f(t):
        return cfg["q_base"] * (1.0 + cfg["q_amp"]
                                * np.sin(np.pi * t / (HOURS * 3600.0)) ** 2)
    return f


def run_reference(cfg):
    import_reference()
    from src.hydromodel.boundary import Boundary
    from src.hydromodel.channel import Channel
    from src.hydromodel.cross_section import TrapezoidalSection
    from src.hydromodel.hydrograph import Hydrograph
    from src.hydromodel.preissmann import PreissmannSolver

    S0 = cfg["S0"]

    def section(z_bed):
        kw = dict(z_bed=z_bed, b_main=cfg["b_main"], m_main=cfg["m_main"],
                  n_main=cfg["n_main"], bed_slope=S0)
        if cfg["kind"] == "compound":
            kw.update(z_bank=z_bed + cfg["h_bank"], b_fp_left=cfg["b_fp"],
                      b_fp_right=cfg["b_fp"], m_fp=cfg["m_fp"],
                      n_left=cfg["n_fp"], n_right=cfg["n_fp"])
        return TrapezoidalSection(**kw)

    us = Boundary(condition="flow_hydrograph", bed_level=S0 * LENGTH,
                  chainage=0, hydrograph=Hydrograph(function=inflow_fn(cfg)))
    ds = Boundary(condition="normal_depth", bed_level=0, chainage=LENGTH)
    ch = Channel(initial_flow=cfg["q_base"], upstream_boundary=us,
                 downstream_boundary=ds, interpolation_method="steady-state")
    ch.set_cross_sections([0.0, LENGTH], [section(S0 * LENGTH), section(0.0)])
    solver = PreissmannSolver(channel=ch, theta=THETA, time_step=DT,
                              spatial_step=DX, simulation_time=HOURS * 3600)
    solver.run(verbose=0, tolerance=TOL, max_iter=100)
    return solver


def run_ours(cfg):
    from flowsim_tpu.api import Boundary, Channel, Hydrograph, PreissmannSolver
    from flowsim_tpu.geometry import trapezoid_station

    S0 = cfg["S0"]

    def station(z_bed):
        kw = dict(z_bed=z_bed, b_main=cfg["b_main"], m_main=cfg["m_main"],
                  n_main=cfg["n_main"], bed_slope=S0)
        if cfg["kind"] == "compound":
            kw.update(h_bank=cfg["h_bank"], b_fp_left=cfg["b_fp"],
                      b_fp_right=cfg["b_fp"], m_fp=cfg["m_fp"],
                      n_left=cfg["n_fp"], n_right=cfg["n_fp"])
        return trapezoid_station(**kw)

    us = Boundary(condition="flow_hydrograph", bed_level=S0 * LENGTH,
                  chainage=0, hydrograph=Hydrograph(function=inflow_fn(cfg)))
    ds = Boundary(condition="normal_depth", bed_level=0, chainage=LENGTH)
    ch = Channel(initial_flow=cfg["q_base"], upstream_boundary=us,
                 downstream_boundary=ds, interpolation_method="steady-state")
    ch.set_cross_sections([0.0, LENGTH], [station(S0 * LENGTH), station(0.0)])
    solver = PreissmannSolver(channel=ch, theta=THETA, time_step=DT,
                              spatial_step=DX, simulation_time=HOURS * 3600)
    solver.run(verbose=0, tolerance=TOL, max_iter=100)
    return solver


@pytest.mark.parametrize("seed", range(10))
def test_random_channel_parity(seed):
    cfg = draw_config(seed)
    ref = run_reference(cfg)
    ours = run_ours(cfg)
    d_ref, q_ref = np.asarray(ref.depth), np.asarray(ref.flow)
    d, q = np.asarray(ours.depth), np.asarray(ours.flow)
    assert d.shape == d_ref.shape
    np.testing.assert_allclose(d, d_ref, rtol=1e-6, atol=1e-9,
                               err_msg=f"{cfg}")
    np.testing.assert_allclose(q, q_ref, rtol=1e-6, atol=1e-6,
                               err_msg=f"{cfg}")
    # identical Newton work under identical pre-update-residual semantics
    it = np.asarray(ours.output.iterations)[1:]
    assert it.max() < 100 and bool(np.asarray(ours.output.converged).all())


@pytest.mark.parametrize("seed", range(0, 10, 2))
def test_random_serial_split_network_exactness(seed):
    """Splitting any reach at a random interior node into a 2-branch network
    solves the SAME nonlinear system (every theta-box cell survives; the
    junction rows only tie the duplicated node — ops/network.py module
    docstring), so both network engines must reproduce the single-reach
    solution near-exactly across random geometries."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops.network import BranchDef, simulate_network

    cfg = draw_config(seed)
    solver = run_ours(cfg)
    rng = np.random.default_rng(1000 + seed)
    cut = int(rng.integers(3, solver.number_of_nodes - 3))
    geo = solver.channel.geometry
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    h0 = jnp.asarray(solver.depth[0])
    Q0 = jnp.asarray(solver.flow[0])
    brs = [BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                     us=solver.us_params, ds=0,
                     h0=h0[: cut + 1], Q0=Q0[: cut + 1]),
           BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                     us=0, ds=solver.ds_params, h0=h0[cut:], Q0=Q0[cut:])]
    sset = solver.settings(tolerance=TOL, max_iter=100)
    for engine in ("loop", "stacked"):
        out = simulate_network(brs, 1, sset, engine=engine)
        assert bool(np.asarray(out.converged).all()), (cfg, cut, engine)
        d = np.concatenate([np.asarray(out.depth[0]),
                            np.asarray(out.depth[1])[:, 1:]], axis=1)
        q = np.concatenate([np.asarray(out.flow[0]),
                            np.asarray(out.flow[1])[:, 1:]], axis=1)
        np.testing.assert_allclose(d, solver.depth, rtol=0, atol=1e-8,
                                   err_msg=f"{cfg} cut={cut} {engine}")
        np.testing.assert_allclose(q, solver.flow, rtol=0, atol=1e-4,
                                   err_msg=f"{cfg} cut={cut} {engine}")
