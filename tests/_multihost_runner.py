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

# -- network ensemble sharded over the cross-process ensemble axis ----------
import dataclasses

import jax.numpy as jnp

from flowsim_tpu.ops.network import BranchDef
from flowsim_tpu.parallel.ensemble import batched_simulate_network

geo = solver.channel.geometry
sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
cut = 32
brs = [BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                 us=solver.us_params, ds=0,
                 h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
       BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                 us=0, ds=solver.ds_params,
                 h0=solver.h0[cut:], Q0=solver.Q0[cut:])]
B = 4 * nprocs
ens_mesh = multihost.make_multihost_mesh(n_ensemble=B, n_space=1)
scales = np.linspace(0.9, 1.1, B)
us_members = [dataclasses.replace(
    solver.us_params,
    target_series=jnp.asarray(np.asarray(solver.us_params.target_series) * s))
    for s in scales]
us_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *us_members)
sset_net = dataclasses.replace(sset, n_time_levels=5)
out_net = batched_simulate_network(brs, 1, sset_net,
                                   [dict(us=us_stacked), dict()],
                                   mesh=ens_mesh, shard=True,
                                   engine="stacked")
host_net = multihost.replicate_to_host(
    dict(net_depth0=out_net.depth[0], net_depth1=out_net.depth[1],
         net_Y=out_net.junction_stage,
         net_converged=out_net.converged.astype(np.int8)),
    ens_mesh,
)
host.update(host_net)

if proc_id == 0:
    np.savez(out_path, **host)
    print(f"[p0] wrote {out_path}", flush=True)
print(f"[p{proc_id}] done", flush=True)
