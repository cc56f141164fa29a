"""Subprocess entry for the simulated multi-host test.

Launched N times by tests/test_multihost.py (one OS process per simulated
host, 4 virtual CPU devices each).  Runs the channel-decomposed Preissmann
solve over the GLOBAL 2x4-host mesh — the SPIKE halo ppermutes, reduced-
system all_gather, and residual psums all cross the process (DCN) boundary —
and writes the fully-replicated result from process 0.

Usage: python tests/_multihost_runner.py <proc_id> <nprocs> <port> <out.npz>
"""

import os
import sys

proc_id, nprocs, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowsim_tpu.parallel import multihost

multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=nprocs, process_id=proc_id)
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 4 * nprocs

from flowsim_tpu.parallel.domain import simulate_sharded

# build the same case as the single-process truth (imported from the suite)
from tests.test_domain_decomposition import build_case

solver = build_case(n_nodes=64, simulation_hours=6)
sset = solver.settings(tolerance=1e-10, max_iter=100)

mesh = multihost.make_multihost_mesh(n_ensemble=1, n_space=4 * nprocs)
out = simulate_sharded(solver.channel.geometry, solver.us_params, solver.ds_params,
                       solver.h0, solver.Q0, sset, mesh)

host = multihost.replicate_to_host(
    dict(depth=out.depth, flow=out.flow, iterations=out.iterations, error=out.error),
    mesh,
)
if proc_id == 0:
    np.savez(out_path, **host)
    print(f"[p0] wrote {out_path}", flush=True)
print(f"[p{proc_id}] done", flush=True)
