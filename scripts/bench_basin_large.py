"""Large-basin stress benchmark (round 5, VERDICT r4 #5).

A dendritic binary-tree basin at 511-1023 branches / ~10^5 total nodes
(models/basin.py scaled via ``levels`` and ``link_nodes``) run on the
STACKED XLA engine — the engine the round-4 crossover measurement assigned
to basin-scale work.  Reports branches / junctions / nodes, compile and
steady wall, Newton iterations, and node-update throughput as one JSON
line.

Run from the repo root:
    python scripts/bench_basin_large.py [levels] [link_nodes] [cpu]
defaults: levels=9 (511 branches, 255 junctions), link_nodes=197
(~100,667 nodes), 6 simulated hours at dt=900 s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    force_cpu = "cpu" in args
    nums = [int(a) for a in args if a.isdigit()]
    levels = nums[0] if nums else 9
    link_nodes = nums[1] if len(nums) > 1 else 197

    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from flowsim_tpu.utils import compile_cache

    compile_cache.enable()

    import dataclasses

    import jax.numpy as jnp

    from flowsim_tpu.models import basin
    from flowsim_tpu.ops.network import simulate_network

    device = jax.devices()[0]
    on_tpu = device.platform == "tpu"
    log(f"device: {device}")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        branches, nj, sset = basin.build(levels=levels, sim_hours=6,
                                         time_step=900.0,
                                         link_nodes=link_nodes)
    if on_tpu:
        sset = dataclasses.replace(sset, linear_solver="pcr_f32")
    n_nodes = sum(int(np.asarray(b.h0).shape[0]) for b in branches)
    log(f"basin: {len(branches)} branches, {nj} junctions, "
        f"{n_nodes} nodes, nt={sset.n_time_levels}")

    def sync(out):
        return float(jnp.sum(jnp.where(jnp.isnan(out.junction_stage), 0.0,
                                       out.junction_stage)))

    if on_tpu:
        t0 = time.time()
        float(jnp.sum(jnp.ones(8)))
        log(f"tunnel session floor: {time.time()-t0:.1f}s")

    t0 = time.time()
    out = simulate_network(branches, nj, sset, engine="stacked")
    sync(out)
    compile_s = time.time() - t0
    log(f"compile+first run: {compile_s:.1f}s")

    best = np.inf
    for rep in range(2):
        brs = [dataclasses.replace(
            branches[0], h0=jnp.asarray(np.asarray(branches[0].h0)
                                        * (1.0 + 1e-12 * (rep + 1))))] \
            + branches[1:]
        t0 = time.time()
        out = simulate_network(brs, nj, sset, engine="stacked")
        sync(out)
        best = min(best, time.time() - t0)

    iters = int(np.asarray(out.iterations).sum())
    conv = bool(np.asarray(out.converged).all())
    nnups = n_nodes * iters / best
    log(f"steady: {best:.2f}s converged={conv} iters={iters} "
        f"({nnups:.3g} newton-node-updates/s)")
    print(json.dumps(dict(
        branches=len(branches), junctions=nj, nodes=n_nodes,
        nt=sset.n_time_levels, compile_s=round(compile_s, 1),
        steady_s=round(best, 2), newton_iters=iters, converged=conv,
        nnups=round(nnups, 1), platform=device.platform)))


if __name__ == "__main__":
    main()
