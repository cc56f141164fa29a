"""Sweep the fused kernel's Newton while-trip unroll factor on hardware.

The while-loop carry costs ~5.6 us/trip at N=121 vs ~2.9 us of body compute
(scripts/bench_fused_micro.py); `settings.fused_unroll` amortizes it over
k masked iterations per trip at the price of up to (k-1) wasted masked
evaluations per level.  This sweep measures the end-to-end flagship wall
for k in 1..4 (iteration counts must stay exactly 4803 for every k — the
masking reproduces the sequential trajectory).

Usage: python scripts/bench_unroll.py
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

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings
    from flowsim_tpu.ops.pallas.fused_newton import fused_simulate

    dev = jax.devices()[0]
    log(f"device: {dev.platform}")
    assert float(jnp.sum(jnp.ones(8))) == 8.0

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        solver, channel = model.build()
        sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
        geo = solver.channel.geometry
    h0np = np.asarray(solver.h0)

    results = {}
    for u in (1, 2, 3, 4):
        ss = dataclasses.replace(sset, fused_unroll=u)
        try:
            out = fused_simulate(geo, solver.us_params, solver.ds_params,
                                 solver.h0, solver.Q0, ss)
            float(jnp.sum(out.depth))  # compile + completion barrier
            best = np.inf
            for rep in range(3):
                h0p = jnp.asarray(h0np * (1.0 + 1e-12 * (rep + 1)))
                t0 = time.time()
                out = fused_simulate(geo, solver.us_params, solver.ds_params,
                                     h0p, solver.Q0, ss)
                float(jnp.sum(out.depth))
                best = min(best, time.time() - t0)
            iters = int(np.asarray(out.iterations).sum())
            conv = bool(np.asarray(out.converged).all())
            results[u] = dict(wall_s=round(best, 4), iters=iters,
                              converged=conv)
            log(f"unroll={u}: {best:.3f}s iters={iters} conv={conv}")
        except Exception as e:  # noqa: BLE001
            results[u] = dict(error=f"{type(e).__name__}: {str(e)[:200]}")
            log(f"unroll={u} FAILED: {results[u]['error']}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
