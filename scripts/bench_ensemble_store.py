"""Large-batch ensemble throughput: store='full' vs store='boundaries'.

BASELINE.md records the 16k-batch decay as a stacked-output working-set
effect (executed/useful iteration ratio flat at 1.02). store='boundaries'
shrinks the stacked outputs [B, nt, N] -> [B, nt, 2]; this script measures
whether that recovers the flat sims/s rate at 16k+ on hardware.

Workload matches bench_ensemble_decay.py (256-node reach, 24 levels, f32
roughness ensemble).

Usage: python scripts/bench_ensemble_store.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.parallel.ensemble import roughness_ensemble
    from scripts.bench_scaling import build_long_reach, sync

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        geo, us, ds, h0, Q0, sset = build_long_reach(256, np.float32, levels=24)
    dev = jax.devices()[0]
    log(f"device: {dev.platform}")
    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"probe ok in {time.time()-t0:.1f}s")

    us_d, ds_d, h0_d, Q0_d = jax.device_put((us, ds, h0, Q0), dev)
    sset_b = dataclasses.replace(sset, store="boundaries")
    fns = {
        "full": jax.jit(jax.vmap(
            lambda g: prs.simulate(g, us_d, ds_d, h0_d, Q0_d, sset))),
        "boundaries": jax.jit(jax.vmap(
            lambda g: prs.simulate(g, us_d, ds_d, h0_d, Q0_d, sset_b))),
    }

    results = {}
    for batch in [2048, 16384, 32768, 65536]:
        n_vals = np.linspace(0.02, 0.06, batch).astype(np.float32)
        with jax.default_device(cpu):
            geo_b = roughness_ensemble(geo, n_vals)
        geo_b = jax.device_put(geo_b, dev)
        row = {}
        for mode, f in fns.items():
            try:
                out = f(geo_b)
                sync(out.depth)
            except Exception as e:  # noqa: BLE001 — OOM etc: record, move on
                log(f"batch {batch} {mode}: FAILED {type(e).__name__}: {e}")
                row[mode] = None
                continue
            best = np.inf
            for rep in range(3):
                gb = dataclasses.replace(
                    geo_b, n_main=geo_b.n_main * (1.0 + 1e-6 * (rep + 1)))
                t0 = time.time()
                out = f(gb)
                sync(out.depth)
                best = min(best, time.time() - t0)
            row[mode] = {"wall_s": round(best, 4),
                         "sims_per_s": round(batch / best, 1),
                         "iters": int(np.asarray(out.iterations).sum())}
            log(f"batch {batch:6d} {mode:10s}: {best:.3f}s "
                f"({batch/best:,.0f} sims/s)")
        results[batch] = row

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
