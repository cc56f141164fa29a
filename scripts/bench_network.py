"""River-network solver benchmark: the GERD tributary network (3 branches,
1 junction, flagship geometry/duration) on the default device vs the CPU
f64 oracle path.

Run: ``python scripts/bench_network.py [hours]``  (default: the flagship
384 h).  On the tunneled TPU the first compile takes 30 s - 7 min; the
steady number is a best-of-reps wall time with perturbed inputs between
reps (the remote result cache serves identical (executable, inputs) pairs,
CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(hours=384, reps=4):
    import jax
    import jax.numpy as jnp

    from flowsim_tpu.models import gerd_tributary
    from flowsim_tpu.ops.network import simulate_network

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    t0 = time.time()
    branches, nj, sset, _ = gerd_tributary.build(sim_duration=3600 * hours)
    # thomas is ~3x faster than pcr at this size on CPU but crashes the TPU
    # worker (nested scan depth, CLAUDE.md); on TPU the fastest validated
    # path is the fused whole-network kernel (0.100 s vs 0.492 s stacked
    # XLA on v5e, identical iteration counts)
    import dataclasses as _dc

    on_cpu = dev.platform == "cpu"
    sset = _dc.replace(sset, linear_solver="thomas" if on_cpu else "pcr_f32")
    engine = "loop" if on_cpu else "fused"
    print(f"engine={engine} linear_solver={sset.linear_solver}")
    n_nodes = sum(int(np.asarray(br.h0).shape[0]) for br in branches)
    print(f"host build: {time.time() - t0:.1f}s  branches=3 junctions=1 "
          f"nodes={n_nodes} nt={sset.n_time_levels}")

    def sim(branches):
        return simulate_network(branches, nj, sset, engine=engine)

    if engine == "fused":
        from flowsim_tpu.ops.pallas.fused_newton import FusedUnsupported

        try:
            sim(branches)
        except FusedUnsupported as e:
            print(f"fused unavailable ({e}); falling back to stacked")
            engine = "stacked"

    t0 = time.time()
    out = sim(branches)
    iters = int(np.asarray(out.iterations).sum())
    # host transfer = completion barrier on the tunneled TPU (CLAUDE.md)
    _ = float(jnp.sum(out.depth[0]))
    print(f"compile+first run: {time.time() - t0:.1f}s  "
          f"converged={bool(np.asarray(out.converged).all())}  iters={iters}")

    best = np.inf
    import dataclasses
    for r in range(reps):
        # perturb h0 in the last ulp-ish digit to defeat the result cache
        pert = [dataclasses.replace(br, h0=np.asarray(br.h0) * (1 + 1e-12 * (r + 1)))
                for br in branches]
        t0 = time.time()
        out = sim(pert)
        _ = float(jnp.sum(out.depth[0]))
        best = min(best, time.time() - t0)
    nnups = iters * n_nodes / best
    print(f"steady (best of {reps}): {best:.3f}s  "
          f"newton-node-updates/s: {nnups:,.0f}")
    return best, iters, n_nodes


def chain_branches(B):
    """A B-branch chain of 15-node akbari-like links sharing junction
    elevations (consecutive links continue the bed profile)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flowsim_tpu.models import akbari_firoozi as ak
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops.network import BranchDef

    solver, _ = ak.build()
    geo = solver.channel.geometry
    seg = jax.tree_util.tree_map(lambda x: x[:15], geo)
    drop = float(np.asarray(seg.z_bed)[0] - np.asarray(seg.z_bed)[-1])
    brs = []
    for i in range(B):
        g = dataclasses.replace(seg, z_bed=seg.z_bed - i * drop)
        h0, Q0 = ic.initial_conditions(g, "steady-state",
                                       float(solver.Q0[0]), solver.spatial_step)
        us = solver.us_params if i == 0 else i - 1
        ds = (dataclasses.replace(
                  solver.ds_params,
                  bed_level=jnp.asarray(np.asarray(g.z_bed)[-1]))
              if i == B - 1 else i)
        brs.append(BranchDef(geo=g, dx=solver.spatial_step, us=us, ds=ds,
                             h0=h0, Q0=Q0))
    sset = solver.settings(tolerance=1e-8, max_iter=100)
    return brs, B - 1, sset


def run_chain(B=16, levels=25, reps=3):
    """loop vs stacked engines on a B-branch chain (see BASELINE.md)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops.network import simulate_network

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})  chain B={B}")
    brs, nj, sset = chain_branches(B)
    sset = dataclasses.replace(sset, n_time_levels=levels,
                               linear_solver="thomas" if dev.platform == "cpu"
                               else "pcr_f32")
    for eng in ("loop", "stacked"):
        t0 = time.time()
        out = simulate_network(brs, nj, sset, engine=eng)
        _ = float(jnp.sum(out.depth[0]))
        tc = time.time() - t0
        best = np.inf
        for r in range(reps):
            pert = [dataclasses.replace(br, h0=np.asarray(br.h0) * (1 + 1e-12 * (r + 1)))
                    for br in brs]
            t0 = time.time()
            out = simulate_network(pert, nj, sset, engine=eng)
            _ = float(jnp.sum(out.depth[0]))
            best = min(best, time.time() - t0)
        print(f"{eng:8s} compile+first {tc:6.1f}s  steady {best:7.3f}s  "
              f"iters {int(np.asarray(out.iterations).sum())}  "
              f"converged {bool(np.asarray(out.converged).all())}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if args and args[-1] == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        args = args[:-1]
    import jax

    jax.config.update("jax_enable_x64", True)
    if args and args[0] == "chain":
        run_chain(int(args[1]) if len(args) > 1 else 16)
    else:
        run(int(args[0]) if args else 384)
