"""Hardware validation + timing of the fused whole-simulation kernel.

Runs the full gerd_roseires config (N=121, 385 levels, tol 1e-6) on the
default device three ways and compares:

  1. XLA path, pcr_f32 inner solve (the round-2 bench configuration)
  2. fused Pallas kernel (df32 residual, f32 Jacobian/PCR, one dispatch)
  3. CPU f64 reference fields (for numerical validation)

Usage: python scripts/bench_fused.py
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
    from flowsim_tpu.ops.pallas.fused_newton import fused_simulate

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        solver, channel = model.build()
        sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
        sset_f32 = dataclasses.replace(sset, linear_solver="pcr_f32")
        geo = solver.channel.geometry
        out_cpu = prs.simulate(geo, solver.us_params, solver.ds_params,
                               solver.h0, solver.Q0, sset)
        D_cpu = np.asarray(out_cpu.depth)
        iters_cpu = int(np.asarray(out_cpu.iterations).sum())
    log(f"CPU f64 reference: {iters_cpu} iters")

    dev = jax.devices()[0]
    log(f"device: {dev.platform}")
    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"probe ok in {time.time()-t0:.1f}s")

    geo_d, us_d, ds_d, h0_d, Q0_d = jax.device_put(
        (geo, solver.us_params, solver.ds_params, solver.h0, solver.Q0), dev)

    def sync(x):
        return float(jnp.sum(x))

    results = {}

    # XLA pcr_f32 path
    t0 = time.time()
    out = prs.simulate(geo_d, us_d, ds_d, h0_d, Q0_d, sset_f32)
    sync(out.depth)
    log(f"xla compile+run: {time.time()-t0:.1f}s")
    best = np.inf
    for rep in range(3):
        h0p = h0_d * (1.0 + 1e-12 * (rep + 1))
        t0 = time.time()
        out = prs.simulate(geo_d, us_d, ds_d, h0p, Q0_d, sset_f32)
        sync(out.depth)
        best = min(best, time.time() - t0)
    it = int(np.asarray(out.iterations).sum())
    results["xla_pcr_f32"] = dict(wall_s=best, iters=it,
                                  converged=bool(np.asarray(out.converged).all()))
    log(f"xla_pcr_f32: {best:.3f}s, {it} iters")

    # fused kernel
    t0 = time.time()
    outf = fused_simulate(geo, solver.us_params, solver.ds_params,
                          solver.h0, solver.Q0, sset)
    sync(outf.depth)
    log(f"fused compile+run: {time.time()-t0:.1f}s")
    best = np.inf
    for rep in range(3):
        h0p = np.asarray(solver.h0) * (1.0 + 1e-12 * (rep + 1))
        t0 = time.time()
        outf = fused_simulate(geo, solver.us_params, solver.ds_params,
                              jnp.asarray(h0p), solver.Q0, sset)
        sync(outf.depth)
        best = min(best, time.time() - t0)
    itf = int(np.asarray(outf.iterations).sum())
    dd = float(np.abs(np.asarray(outf.depth) - D_cpu).max())
    results["fused"] = dict(
        wall_s=best, iters=itf,
        converged=bool(np.asarray(outf.converged).all()),
        max_dh_vs_cpu_f64=dd,
        iters_identical=bool((np.asarray(outf.iterations)
                              == np.asarray(out_cpu.iterations)).all()),
    )
    n = geo.n_nodes
    results["fused"]["nnups"] = n * itf / best
    log(f"fused: {best:.3f}s, {itf} iters, max|dh| vs CPU f64 = {dd:.2e} m, "
        f"identical iters = {results['fused']['iters_identical']}, "
        f"{n*itf/best:.3g} nnups")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
