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
