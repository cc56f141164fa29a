"""Distributed lateral inflow (flowsim_tpu extension — no reference
counterpart): continuity dA/dt + dQ/dx = q with the theta-weighted cell
average of q (ops/preissmann.py:cell_stencil).

Oracles:
1. q = 0 (and qlat=None) leave the solution bitwise unchanged.
2. The discrete per-level mass balance holds to solver tolerance: summing
   the continuity residuals over cells telescopes the flux terms, so
   sum_cells dx*tdiff(A) = -[theta (Q_N - Q_0) + (1-theta)(Q^p_N - Q^p_0)]
   + sum_cells dx*cavg(q).
3. A constant uniform q run to steady state gives the linear discharge
   profile Q(x) = Q_us + q*x.
4. A split-reach network with per-branch qlat slices reproduces the
   single-reach lateral-inflow run.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops import sections as sec


def setup(hours=20):
    from flowsim_tpu.models import akbari_firoozi as ak

    solver, channel = ak.build()
    sset = solver.settings(tolerance=1e-10, max_iter=100)
    sset = dataclasses.replace(sset, n_time_levels=hours + 1)
    return solver, sset


def test_zero_qlat_bitwise_identical():
    solver, sset = setup()
    geo = solver.channel.geometry
    args = (geo, solver.us_params, solver.ds_params, solver.h0, solver.Q0, sset)
    ref = prs.simulate(*args)
    zero = prs.simulate(*args, lateral_inflow=jnp.zeros_like(solver.h0))
    np.testing.assert_array_equal(np.asarray(ref.depth), np.asarray(zero.depth))
    np.testing.assert_array_equal(np.asarray(ref.flow), np.asarray(zero.flow))


def test_discrete_mass_balance_with_qlat():
    solver, sset = setup()
    geo = solver.channel.geometry
    N = solver.h0.shape[0]
    dx, dt, theta = sset.spatial_step, sset.time_step, sset.theta
    # time-varying, spatially varying inflow
    x = np.linspace(0.0, 1.0, N)
    t = np.arange(sset.n_time_levels)[:, None]
    qlat = 0.004 * (1.0 + 0.5 * np.sin(x * 3.0))[None, :] * (1.0 + 0.3 * np.cos(t / 5.0))
    out = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset,
                       lateral_inflow=jnp.asarray(qlat))
    assert bool(np.asarray(out.converged).all())

    depth = np.asarray(out.depth)
    flow = np.asarray(out.flow)
    A = np.asarray(jax.vmap(lambda h: sec.section_state(geo, jnp.asarray(h)).A)(depth))
    for k in range(1, sset.n_time_levels):
        Ak, Ap = A[k], A[k - 1]
        storage = dx * 0.5 * ((Ak[1:] + Ak[:-1]) - (Ap[1:] + Ap[:-1])) / dt
        flux = (theta * (flow[k, -1] - flow[k, 0])
                + (1 - theta) * (flow[k - 1, -1] - flow[k - 1, 0]))
        qbar = 0.5 * theta * (qlat[k, 1:] + qlat[k, :-1]) \
            + 0.5 * (1 - theta) * (qlat[k - 1, 1:] + qlat[k - 1, :-1])
        imbalance = storage.sum() + flux - dx * qbar.sum()
        # the summed continuity residuals are driven below tol by Newton
        assert abs(imbalance) < 1e-6 * max(1.0, abs(flux)), (k, imbalance)


def test_steady_state_linear_discharge_profile():
    solver, sset = setup(hours=96)
    geo = solver.channel.geometry
    # constant upstream inflow (flatten the sinusoidal hydrograph)
    us = dataclasses.replace(
        solver.us_params,
        target_series=jnp.full_like(solver.us_params.target_series, 100.0))
    q = 0.003  # m^2/s over 29 km -> +87 m^3/s at the outlet
    out = prs.simulate(geo, us, solver.ds_params, solver.h0, solver.Q0, sset,
                       lateral_inflow=jnp.full_like(solver.h0, q))
    assert bool(np.asarray(out.converged).all())
    Q_end = np.asarray(out.flow)[-1]
    x = np.arange(Q_end.shape[0]) * sset.spatial_step
    expected = 100.0 + q * x
    np.testing.assert_allclose(Q_end, expected, rtol=2e-3)
    # and the gain is real
    assert Q_end[-1] > 180.0


def test_network_branch_qlat_matches_single_reach():
    from flowsim_tpu.ops.network import BranchDef, simulate_network

    solver, sset = setup()
    geo = solver.channel.geometry
    N = solver.h0.shape[0]
    qlat = 0.004 * (1.0 + np.linspace(0.0, 1.0, N))
    ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset,
                       lateral_inflow=jnp.asarray(qlat))

    cut = 15
    sl = lambda s: jax.tree_util.tree_map(lambda a: a[s], geo)
    br1 = BranchDef(geo=sl(slice(0, cut + 1)), dx=sset.spatial_step,
                    us=solver.us_params, ds=0,
                    h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1],
                    qlat=jnp.asarray(qlat[: cut + 1]))
    br2 = BranchDef(geo=sl(slice(cut, None)), dx=sset.spatial_step,
                    us=0, ds=solver.ds_params,
                    h0=solver.h0[cut:], Q0=solver.Q0[cut:],
                    qlat=jnp.asarray(qlat[cut:]))
    out = simulate_network([br1, br2], n_junctions=1, settings=sset)
    assert bool(np.asarray(out.converged).all())
    d_ref = np.asarray(ref.depth)
    assert np.abs(np.asarray(out.depth[0]) - d_ref[:, : cut + 1]).max() < 2e-3
    assert np.abs(np.asarray(out.depth[1]) - d_ref[:, cut:]).max() < 2e-3
