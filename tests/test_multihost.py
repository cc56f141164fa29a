"""Simulated multi-host runtime: 2 CPU processes x 4 virtual devices.

Validates the DCN half of SURVEY.md §2.17 ("JAX collectives over ICI within a
slice and DCN across hosts"): the domain-decomposed solve runs over a global
mesh spanning 2 OS processes (jax.distributed + Gloo CPU collectives), so the
SPIKE halo exchange / reduced-system all_gather / residual psum all cross the
process boundary, and the result must equal the single-process run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from flowsim_tpu.ops import preissmann as prs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "_multihost_runner.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_solve_matches_single_process(tmp_path):
    nprocs = 2
    port = _free_port()
    out_path = str(tmp_path / "mh.npz")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # runner sets its own device count (4/process)
    procs = [
        subprocess.Popen(
            [sys.executable, RUNNER, str(i), str(nprocs), str(port), out_path],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    assert os.path.exists(out_path)

    mh = np.load(out_path)

    # single-process truth on the in-process 8-virtual-device runtime
    from tests.test_domain_decomposition import build_case

    solver = build_case(n_nodes=64, simulation_hours=6)
    sset = solver.settings(tolerance=1e-10, max_iter=100)
    ref = prs.simulate(solver.channel.geometry, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset)

    np.testing.assert_allclose(mh["depth"], np.asarray(ref.depth), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(mh["flow"], np.asarray(ref.flow), rtol=1e-9, atol=1e-7)
    np.testing.assert_array_equal(mh["iterations"], np.asarray(ref.iterations))

    # network ensemble sharded across the process (DCN) boundary: every
    # member converged, members genuinely differ, and each member matches
    # its single-process serial network run
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops.network import BranchDef, simulate_network

    assert mh["net_converged"].all()
    B = mh["net_depth0"].shape[0]
    assert B == 8
    assert np.abs(mh["net_depth0"][0] - mh["net_depth0"][-1]).max() > 1e-4

    geo = solver.channel.geometry
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    cut = 32
    brs = [BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                     us=solver.us_params, ds=0,
                     h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
           BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                     us=0, ds=solver.ds_params,
                     h0=solver.h0[cut:], Q0=solver.Q0[cut:])]
    sset_net = dataclasses.replace(sset, n_time_levels=5)
    scales = np.linspace(0.9, 1.1, B)
    for m in (0, B - 1):
        us_m = dataclasses.replace(
            solver.us_params,
            target_series=jnp.asarray(
                np.asarray(solver.us_params.target_series) * scales[m]))
        ser = simulate_network([dataclasses.replace(brs[0], us=us_m), brs[1]],
                               1, sset_net, engine="stacked")
        np.testing.assert_allclose(mh["net_depth0"][m],
                                   np.asarray(ser.depth[0]),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(mh["net_Y"][m],
                                   np.asarray(ser.junction_stage),
                                   rtol=0, atol=1e-10)
