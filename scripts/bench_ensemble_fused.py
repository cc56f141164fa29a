"""Hardware measurement: batched fused kernel vs vmapped XLA ensemble.

Two regimes, matching the two ensemble use cases:

1. Throughput regime (BASELINE "Monte-Carlo ensemble"): the 256-node /
   24-level synthetic reach of bench_ensemble_decay.py, roughness ensemble,
   both engines at batch 8 .. 512.  The fused kernel packs members on the
   VPU sublane axis (8 per vreg) and dispatches once per VMEM chunk; the
   XLA path is one monolithic vmap.  Expectation from the vreg model: the
   fused path wins the small-batch (dispatch-bound) regime, the XLA vmap
   wins at large batch where its per-op overhead is amortized — this script
   measures the crossover.

2. Calibration regime (ref n_calibrate.py:55-75): a 10-candidate Manning-n
   sweep on the gerd_roseires small-inflow config through
   models.calibrate.rmse_sweep with engine="xla" vs engine="fused".

Usage: python scripts/bench_ensemble_fused.py
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
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.parallel.ensemble import batched_simulate, roughness_ensemble
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
    f_xla = jax.jit(jax.vmap(
        lambda g: prs.simulate(g, us_d, ds_d, h0_d, Q0_d, sset)))

    # store="boundaries" raises the fused VMEM member cap (64 -> 128 at
    # this size — the cap is bounded by the per-member working set, see
    # max_fused_batch), halving the number of ~30 ms kernel dispatches for
    # large Monte-Carlo batches; "fused_bnd" measures that mode (validated
    # below against the full run's boundary columns).
    sset_bnd = dataclasses.replace(sset, store="boundaries")

    results = {"throughput": {}, "calibration": {}}
    for batch in [8, 32, 104, 512, 2048]:
        n_vals = np.linspace(0.02, 0.06, batch).astype(np.float32)
        with jax.default_device(cpu):
            geo_b = roughness_ensemble(geo, n_vals)
        geo_b = jax.device_put(geo_b, dev)
        row = {}
        for engine in ("xla", "fused", "fused_bnd"):
            def run(gb):
                if engine == "xla":
                    return f_xla(gb)
                return batched_simulate(
                    gb, us, ds, h0, Q0,
                    sset_bnd if engine == "fused_bnd" else sset,
                    shard=False, engine="fused")

            try:
                out = run(geo_b)
                sync(out.depth)
            except Exception as e:  # noqa: BLE001 — record and move on
                log(f"batch {batch} {engine}: FAILED {type(e).__name__}: {e}")
                row[engine] = None
                continue
            best = np.inf
            for rep in range(3):
                gb = dataclasses.replace(
                    geo_b, n_main=geo_b.n_main * (1.0 + 1e-6 * (rep + 1)))
                t0 = time.time()
                out = run(gb)
                sync(out.depth)
                best = min(best, time.time() - t0)
            row[engine] = {"wall_s": round(best, 4),
                           "sims_per_s": round(batch / best, 1),
                           "iters": int(np.asarray(out.iterations).sum()),
                           "converged": bool(np.asarray(out.converged).all())}
            row[engine + "_depth"] = np.asarray(out.depth)
            log(f"batch {batch:5d} {engine:5s}: {best:.4f}s "
                f"({batch/best:,.0f} sims/s, "
                f"iters={row[engine]['iters']})")
        if row.get("xla") and row.get("fused"):
            dd = float(np.abs(row["xla_depth"]
                              - row["fused_depth"]).max())
            row["max_depth_delta_m"] = dd
            log(f"batch {batch:5d} cross-check: max|dh xla-fused| = {dd:.2e} m")
        if row.get("fused") and row.get("fused_bnd"):
            # boundaries mode must be bitwise-equal to the full run's
            # boundary columns (same kernel arithmetic, smaller stores)
            db = float(np.abs(row["fused_depth"][:, :, [0, -1]]
                              - row["fused_bnd_depth"]).max())
            row["bnd_vs_full_delta_m"] = db
            log(f"batch {batch:5d} bnd-check: max|dh full-bnd| = {db:.2e} m")
        for k in ("xla_depth", "fused_depth", "fused_bnd_depth"):
            row.pop(k, None)
        results["throughput"][batch] = row

    # -- calibration regime: gerd small-inflow 10-candidate sweep ----------
    # Mirrors tests/test_calibration.py / ref n_calibrate.py:55-75 (per-
    # candidate GVF initial conditions, 6 published stage targets).
    jax.config.update("jax_enable_x64", True)
    from flowsim_tpu.models.calibrate import gvf_ic_fn, rmse_sweep
    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings

    with jax.default_device(cpu):
        solver, channel = model.build(
            inflow_hyd_path=os.path.join(gsettings.DATA_DIR,
                                         "inflow_hydrograph_small.csv"),
            inflow_hyd_func=None, coords_path=None, sim_duration=None)
        gset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
        ggeo = channel.geometry
        ic_fn = gvf_ic_fn(dx=solver.spatial_step,
                          Q_init=channel.initial_flow_rate,
                          h_downstream=channel.downstream_boundary.initial_depth)
    n_vals = np.linspace(0.02, 0.06, 10)
    Qt = [1562.5, 3850.0, 6000.0, 10000.0, 14000.0, 21000.0]
    Ht = [497.5, 500.0, 502.0, 505.0, 507.0, 510.0]
    for engine in ("xla", "fused"):
        def sweep(nv):
            return rmse_sweep(ggeo, solver.us_params, solver.ds_params,
                              solver.h0, solver.Q0, gset, Qt, Ht, nv,
                              engine=engine, ic_fn=ic_fn)

        try:
            r = np.asarray(sweep(n_vals))
        except Exception as e:  # noqa: BLE001
            log(f"calibration {engine}: FAILED {type(e).__name__}: {e}")
            results["calibration"][engine] = None
            continue
        best = np.inf
        for rep in range(3):
            nv = n_vals * (1.0 + 1e-9 * (rep + 1))
            t0 = time.time()
            r = np.asarray(sweep(nv))
            best = min(best, time.time() - t0)
        results["calibration"][engine] = {
            "wall_s": round(best, 4),
            "members_per_s": round(len(n_vals) / best, 1),
            "rmse0": float(r[0])}
        log(f"calibration {engine:5s}: {best:.4f}s for {len(n_vals)} members "
            f"(rmse[0]={float(r[0]):.4f})")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
