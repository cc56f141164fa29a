"""Ill-conditioning diagnostics (ref preissmann.py:133-144 `diagnos` path).

The reference factorizes the Jacobian with splu and raises when
``lu.rcond < 1e-12``.  flowsim_tpu's in-graph analog is the PCR pivot rcond
proxy of :func:`flowsim_tpu.ops.tridiag.block_pcr_diag`: these tests pin that
(a) the proxy agrees with scipy's rcond criterion on singular and healthy
systems, (b) the pivot guard keeps singular solves finite (documented
behavior), and (c) the solver surfaces/raises like the reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flowsim_tpu.ops import tridiag

pytestmark = pytest.mark.fast


def _random_system(rng, N=16, coupled=True):
    L = jnp.asarray(rng.normal(size=(N, 2, 2))) * (0.3 if coupled else 0.0)
    L = L.at[0].set(0.0)
    D = jnp.asarray(rng.normal(size=(N, 2, 2)) + 4.0 * np.eye(2))
    U = jnp.asarray(rng.normal(size=(N, 2, 2))) * (0.3 if coupled else 0.0)
    U = U.at[-1].set(0.0)
    b = jnp.asarray(rng.normal(size=(N, 2)))
    return L, D, U, b


def test_interleave_to_blocks_roundtrip(rng):
    L, D, U, _ = _random_system(rng)
    A = tridiag.blocks_to_dense(L, D, U)
    L2, D2, U2 = tridiag.interleave_to_blocks(A)
    np.testing.assert_array_equal(np.asarray(L2), np.asarray(L))
    np.testing.assert_array_equal(np.asarray(D2), np.asarray(D))
    np.testing.assert_array_equal(np.asarray(U2), np.asarray(U))


def test_pivot_guard_keeps_singular_solve_finite(rng):
    """A structurally singular system must give large-but-finite deltas, not
    inf/NaN (the guard is on by default; tridiag module docstring)."""
    L, D, U, b = _random_system(rng)
    # make one node's equations identically zero -> singular global matrix
    L, D, U = (X.at[7].set(0.0) for X in (L, D, U))
    U = U.at[6].set(0.0)
    L = L.at[8].set(0.0)
    x = tridiag.block_pcr(L, D, U, b)
    assert np.isfinite(np.asarray(x)).all()


def test_rcond_proxy_agrees_with_scipy_rcond(rng):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    THRESH = 1e-12  # ref preissmann.py:142

    def scipy_rcond(A):
        # the reference reads splu(J).rcond (ref preissmann.py:140); scipy
        # builds without UMFPACK don't expose it (the ref guards rcond is not
        # None) -- fall back to the dense reciprocal condition number
        lu = spla.splu(sp.csc_matrix(A))
        rc = getattr(lu, "rcond", None)
        if rc is not None:
            return rc
        c = np.linalg.cond(A)
        return 1.0 / c if np.isfinite(c) and c > 0 else 0.0

    # healthy diagonally-dominant system: both say well-conditioned
    L, D, U, b = _random_system(rng)
    _, rc = tridiag.block_pcr_diag(L, D, U, b)
    assert scipy_rcond(np.asarray(tridiag.blocks_to_dense(L, D, U))) > THRESH
    assert float(rc) > THRESH

    # singular system: both say ill-conditioned
    Ls, Ds, Us = (X.at[5].set(0.0) for X in (L, D, U))
    Us = Us.at[4].set(0.0)
    Ls = Ls.at[6].set(0.0)
    _, rcs = tridiag.block_pcr_diag(Ls, Ds, Us, b)
    assert float(rcs) < THRESH
    As = np.asarray(tridiag.blocks_to_dense(Ls, Ds, Us))
    assert np.linalg.cond(As) > 1 / THRESH or not np.isfinite(np.linalg.cond(As))


def _build_example_solver():
    """The cases/example configuration, not yet run."""
    from flowsim_tpu.api import Boundary, Channel, Hydrograph, LumpedStorage, PreissmannSolver
    from tests.test_preissmann_parity import example_hydrograph

    us = Boundary(condition="flow_hydrograph", bed_level=5, chainage=0,
                  hydrograph=Hydrograph(function=example_hydrograph))
    ds = Boundary(condition="fixed_depth", initial_depth=5, bed_level=0, chainage=20000)
    ss = LumpedStorage(surface_area=5000 * 250, min_stage=5, solution_boundaries=(0, 200))
    ds.set_lumped_storage(ss)
    channel = Channel(width=250, initial_flow=example_hydrograph(0), roughness=0.027,
                      upstream_boundary=us, downstream_boundary=ds)
    return PreissmannSolver(channel=channel, theta=0.8, time_step=3600,
                            spatial_step=1000, simulation_time=24 * 3600)


def test_diagnos_healthy_run_records_rcond():
    """diagnos=True on a healthy case completes and surfaces the per-level
    rcond proxy in SimOutput (ref raises only when rcond < 1e-12)."""
    solver = _build_example_solver()
    out = solver.run(tolerance=1e-8, verbose=0, diagnos=True)
    rc = np.asarray(out.rcond)
    assert rc.shape == (solver.number_of_time_levels,)
    assert (rc[1:] > 1e-12).all()
    assert rc[0] == 1.0  # level 0 is the IC, no solve


def test_diagnos_off_costs_nothing():
    solver = _build_example_solver()
    out = solver.run(tolerance=1e-8, verbose=0, diagnos=False)
    assert (np.asarray(out.rcond) == 1.0).all()


def test_diagnos_raises_like_reference(monkeypatch):
    """Plumbing: an ill-conditioned level must raise the reference's message
    (ref preissmann.py:143) before the convergence check."""
    from flowsim_tpu.ops import preissmann as prs

    solver = _build_example_solver()
    real_simulate = prs.simulate

    def poisoned(*args, **kwargs):
        out = real_simulate(*args, **kwargs)
        rc = out.rcond.at[3].set(1e-14)
        return out._replace(rcond=rc)

    monkeypatch.setattr(prs, "simulate", poisoned)
    with pytest.raises(ValueError, match="ill-conditioned"):
        solver.run(tolerance=1e-8, verbose=0, diagnos=True)


def test_live_progress_streams_reference_lines(capfd):
    """live=True emits the reference's per-level verbose lines from inside
    the scan (ref preissmann.py:116-117,151-155) via jax.debug.callback."""
    solver = _build_example_solver()
    solver.run(tolerance=1e-4, verbose=0, live=True)
    out = capfd.readouterr().out
    assert "> Time level #1" in out
    assert "> Time level #24" in out
    assert ">> Error = " in out
    assert out.index("#1") < out.index("#24")  # ordered callbacks


def test_f32_floor_guard_auto_upgrades():
    """tolerance < 1e-6 with linear_solver='pcr_f32' sits below the f32
    inner-solve precision floor (docs/PRECISION.md; a Monte-Carlo member
    NaN'd at tol=1e-8 on the stacked network engine, BASELINE.md r3): the
    solver entries now warn and auto-select the f64 'pcr' solve, so the
    tight-tolerance ensemble converges on every member."""
    import dataclasses
    import warnings

    import jax
    import jax.numpy as jnp

    from flowsim_tpu.models import akbari_firoozi as ak
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops.network import BranchDef
    from flowsim_tpu.parallel.ensemble import batched_simulate_network

    s = prs.PreissmannSettings(theta=0.6, time_step=3600.0,
                               spatial_step=1000.0, n_time_levels=5,
                               tolerance=1e-8, max_iter=100,
                               linear_solver="pcr_f32")
    with pytest.warns(UserWarning, match="precision floor"):
        g = prs.guard_f32_floor(s)
    assert g.linear_solver == "pcr"
    # tolerance >= 1e-6 passes through untouched (no warning)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s6 = dataclasses.replace(s, tolerance=1e-6)
        assert prs.guard_f32_floor(s6) is s6

    # end-to-end: the stacked network ensemble at tol=1e-8 converges on
    # every member through the auto-upgraded f64 solve
    solver, _ = ak.build()
    sset = dataclasses.replace(
        solver.settings(tolerance=1e-8, max_iter=100), n_time_levels=7,
        linear_solver="pcr_f32")
    geo = solver.channel.geometry
    sl = lambda sli: jax.tree_util.tree_map(lambda x: x[sli], geo)
    cut = 15
    branches = [
        BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                  us=solver.us_params, ds=0,
                  h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
        BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                  us=0, ds=solver.ds_params,
                  h0=solver.h0[cut:], Q0=solver.Q0[cut:]),
    ]
    us = branches[0].us
    series = np.asarray(us.target_series, np.float64)
    us_b = jax.vmap(lambda sc: dataclasses.replace(
        us, target_series=jnp.asarray(series) * sc))(
            jnp.asarray([0.9, 1.0, 1.1, 1.2]))
    with pytest.warns(UserWarning, match="precision floor"):
        out = batched_simulate_network(branches, 1, sset,
                                       [dict(us=us_b), dict()],
                                       engine="stacked")
    assert bool(np.asarray(out.converged).all())
    assert np.isfinite(np.asarray(out.depth[0])).all()
