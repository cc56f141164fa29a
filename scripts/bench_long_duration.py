"""Year-long hourly simulation in ONE fused kernel dispatch.

With HBM-streamed outputs (settings.out_memory="hbm"/auto) the fused
whole-simulation kernel has no nt ceiling: this runs a full year of hourly
levels (nt=8761) of the flagship reach — 22.8x the reference case's
duration, whose [nt, ...] output stacks (8761 x 640 lanes) could never fit
VMEM — in a single dispatch, and cross-checks convergence and fields
against the CPU f64 XLA path.

Forcing: the 384 h GERD release hydrograph repeated with a +-10% seasonal
modulation (a synthetic wet/dry cycle) so every level has realistic
dynamics; downstream the standard smooth Roseires rating curve.

Usage: python scripts/bench_long_duration.py [n_years_hours]
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
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops.pallas.fused_newton import (_pick_out_mem,
                                                     fused_simulate)

    hours = int(sys.argv[1]) if len(sys.argv) > 1 else 8760

    dev = jax.devices()[0]
    log(f"device: {dev.platform}")
    assert float(jnp.sum(jnp.ones(8))) == 8.0

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        solver, channel = model.build()
        base = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
        geo = solver.channel.geometry

        # year-long forcing: tile the 384 h release table with a slow
        # seasonal modulation; same downstream rating params
        ts0 = np.asarray(solver.us_params.target_series)
        nt = hours + 1
        reps = -(-nt // len(ts0))
        tiled = np.tile(ts0, reps)[:nt]
        season = 1.0 + 0.1 * np.sin(2 * np.pi * np.arange(nt) / nt)
        us = dataclasses.replace(solver.us_params,
                                 target_series=jnp.asarray(tiled * season))
        sset = dataclasses.replace(base, n_time_levels=nt)
        Np = 128
        log(f"nt={nt}  out_mem={_pick_out_mem(sset, nt, Np, 'full')}")

        t0 = time.time()
        ref = prs.simulate(geo, us, solver.ds_params, solver.h0, solver.Q0,
                           sset)
        ref_iters = int(np.asarray(ref.iterations).sum())
        log(f"CPU f64 XLA: {time.time()-t0:.1f}s  iters={ref_iters}")

    t0 = time.time()
    out = fused_simulate(geo, us, solver.ds_params, solver.h0, solver.Q0,
                         sset)
    float(jnp.sum(out.depth))
    log(f"fused compile+first: {time.time()-t0:.1f}s")
    best = np.inf
    h0np = np.asarray(solver.h0)
    for rep in range(2):
        h0p = jnp.asarray(h0np * (1.0 + 1e-12 * (rep + 1)))
        t0 = time.time()
        out = fused_simulate(geo, us, solver.ds_params, h0p, solver.Q0, sset)
        float(jnp.sum(out.depth))
        best = min(best, time.time() - t0)

    iters = int(np.asarray(out.iterations).sum())
    conv = bool(np.asarray(out.converged).all())
    dd = float(np.abs(np.asarray(out.depth) - np.asarray(ref.depth)).max())
    it_ident = bool((np.asarray(out.iterations)
                     == np.asarray(ref.iterations)).all())
    log(f"fused: {best:.2f}s  iters={iters}  identical={it_ident} "
        f"conv={conv}  max|dh|={dd:.2e} m")
    print(json.dumps({
        "levels": nt, "wall_s": round(best, 3), "newton_iters": iters,
        "iters_identical_to_f64": it_ident, "converged": conv,
        "max_dh_m": dd,
        "newton_node_updates_per_s": round(121 * iters / best, 0),
    }))


if __name__ == "__main__":
    main()
