"""Scaling benchmarks beyond the flagship config (BASELINE.md targets).

1. Long-reach stress: N = 1e4..1e6 nodes, single chip, f32, node-updates/s
   (the channel axis the reference cannot scale; SURVEY.md §5).
2. Monte-Carlo ensemble: vmapped roughness scenarios, sims/s.
3. Domain-decomposition scaling efficiency on the virtual CPU mesh
   (1 -> 8 shards; the driver has no multi-chip TPU).

Usage: python scripts/bench_scaling.py [longreach|ensemble|ddscale|all]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] in ("ddscale",)):
    # dd scaling needs the virtual multi-device CPU mesh
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_device():
    """First contact with the (possibly recovering) TPU tunnel: a trivial op
    that may take minutes after a previous client exited; do it before any
    real work so compiles aren't conflated with tunnel recovery."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"device probe ok in {time.time() - t0:.1f}s ({jax.devices()[0].platform})")


def build_long_reach(n_nodes, dtype, levels=8, linear_solver="pcr"):
    """Synthetic long prismatic reach with gerd-like magnitudes."""
    import jax.numpy as jnp

    from flowsim_tpu.geometry import TrapezoidStation, interpolate_stations
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import preissmann as prs

    length = (n_nodes - 1) * 200.0
    slope = 2e-4
    sts = [
        TrapezoidStation(z_bed=length * slope, b_main=80.0, m_main=10.0, n_main=0.03,
                         bed_slope=slope),
        TrapezoidStation(z_bed=0.0, b_main=80.0, m_main=10.0, n_main=0.03, bed_slope=slope),
    ]
    geo = interpolate_stations(sts, [0.0, length], np.linspace(0, length, n_nodes), dtype=dtype)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 1500.0, 200.0)

    nt = levels + 1
    times = np.arange(nt) * 600.0
    series = 1500.0 + 1500.0 * np.minimum(times / 3600.0, 1.0)
    us = bnd.make_boundary("flow_hydrograph", bed_level=float(geo.z_bed[0]), target_series=series)
    ds = bnd.make_boundary("normal_depth", bed_level=0.0, bed_slope=slope)
    # make_boundary builds leaves in the default dtype (f64 when tests enable
    # x64); cast to the requested state dtype so f32 runs stay f32 throughout
    import jax

    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a, t)
    us, ds = cast(us), cast(ds)
    sset = prs.PreissmannSettings(
        theta=0.7, time_step=600.0, spatial_step=200.0, n_time_levels=nt,
        tolerance=1e-2 if dtype == np.float32 else 1e-6, max_iter=30,
        linear_solver=linear_solver,
    )
    return geo, us, ds, h0.astype(dtype), Q0.astype(dtype), sset


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench_longreach():
    import jax
    from flowsim_tpu.ops import preissmann as prs

    # the tiled Pallas SPIKE kernel is the measured-fastest long-reach solver
    # on TPU (scripts/bench_solvers.py: 2.5x over XLA PCR at N=1e6); XLA PCR
    # remains the CPU path (Mosaic kernels are TPU-only)
    on_tpu = jax.devices()[0].platform != "cpu"
    solver = "pallas_tiled" if on_tpu else "pcr"

    results = {}
    for n in [10_000, 100_000, 1_000_000]:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            geo, us, ds, h0, Q0, sset = build_long_reach(n, np.float32,
                                                         linear_solver=solver)
        dev = jax.devices()[0]
        args = jax.device_put((geo, us, ds, h0, Q0), dev)
        t0 = time.time()
        out = prs.simulate(*args, sset)
        sync(out.depth)
        compile_s = time.time() - t0
        best = np.inf
        for rep in range(3):
            a = (args[0], args[1], args[2], args[3] * (1 + 1e-6 * (rep + 1)), args[4])
            t0 = time.time()
            out = prs.simulate(*a, sset)
            sync(out.depth)
            best = min(best, time.time() - t0)
        iters = int(np.asarray(out.iterations).sum())
        nnups = n * iters / best
        results[n] = dict(wall_s=best, iters=iters, newton_node_updates_per_s=nnups,
                          compile_s=compile_s)
        log(f"long-reach N={n}: {best:.3f}s, {iters} iters, {nnups:.3e} newton-node-updates/s")
    return results


def bench_ensemble():
    import jax
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.parallel.ensemble import roughness_ensemble

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        geo, us, ds, h0, Q0, sset = build_long_reach(256, np.float32, levels=24)
    dev = jax.devices()[0]
    results = {}
    for batch in [64, 512, 4096]:
        n_vals = np.linspace(0.02, 0.06, batch).astype(np.float32)
        with jax.default_device(cpu):
            geo_b = roughness_ensemble(geo, n_vals)
        args = jax.device_put((geo_b, us, ds, h0, Q0), dev)
        f = jax.jit(jax.vmap(lambda g: prs.simulate(g, args[1], args[2], args[3], args[4], sset)))
        t0 = time.time()
        out = f(args[0])
        sync(out.depth)
        compile_s = time.time() - t0
        best = np.inf
        for rep in range(3):
            gb = jax.tree_util.tree_map(lambda a: a, args[0])
            gb = gb.astype(np.float32) if hasattr(gb, "astype") else gb
            t0 = time.time()
            out = f(args[0])
            sync(out.depth + rep)  # rep-dependent sync defeats result caching
            best = min(best, time.time() - t0)
        sims_per_s = batch / best
        results[batch] = dict(wall_s=best, sims_per_s=sims_per_s, compile_s=compile_s)
        log(f"ensemble batch={batch}: {best:.3f}s -> {sims_per_s:.1f} sims/s "
            f"(24 levels x 256 nodes each)")
    return results


def bench_ddscale():
    """Domain-decomposition scaling on the virtual CPU mesh (driver has 1 TPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.parallel.domain import simulate_sharded
    from flowsim_tpu.parallel.mesh import make_mesh

    n = 65536
    geo, us, ds, h0, Q0, sset = build_long_reach(n, np.float64, levels=4)
    results = {}
    base = None
    for shards in [1, 2, 4, 8]:
        if shards == 1:
            f = lambda: prs.simulate(geo, us, ds, h0, Q0, sset)
        else:
            mesh = make_mesh(n_ensemble=1, n_space=shards, devices=jax.devices()[:shards])
            f = lambda: simulate_sharded(geo, us, ds, h0, Q0, sset, mesh)
        out = f(); sync(out.depth)
        t0 = time.time(); out = f(); sync(out.depth); el = time.time() - t0
        eff = None if base is None else base / (el * shards)
        if shards == 1:
            base = el
        results[shards] = dict(wall_s=el, efficiency=eff)
        log(f"dd shards={shards}: {el:.3f}s  efficiency={eff}")
    return results


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if "--cpu" in sys.argv or what == "ddscale":
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = {}
    if what in ("longreach", "ensemble", "all"):
        probe_device()
    if what in ("longreach", "all"):
        out["longreach"] = bench_longreach()
    if what in ("ensemble", "all"):
        out["ensemble"] = bench_ensemble()
    if what in ("ddscale", "all"):
        out["ddscale"] = bench_ddscale()
    print(json.dumps(out, indent=1, default=float))
