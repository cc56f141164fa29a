"""BASELINE north-star measurement: 10^4-scenario Monte-Carlo on one chip.

Runs a 10,240-member roughness x inflow ensemble of the FULL flagship
gerd_roseires configuration (N=121 nodes, 385 hourly levels, tol 1e-6
semantics) through the batched fused kernel, chunked at the VMEM member
cap (HBM-streamed outputs).  Reports ensemble sims/s and the wall for the
whole 10^4 study; the reference runs ONE such simulation in ~569 s, so a
10^4-member study would take ~66 days serial CPU.

Usage: python scripts/bench_montecarlo.py [n_members] [store]
  store: "boundaries" (default; hydrograph outputs per member) or "full"
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
    from flowsim_tpu.ops.pallas.fused_newton import (fused_simulate_batched,
                                                     max_fused_batch)
    from flowsim_tpu.parallel.ensemble import roughness_ensemble

    B_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    store = sys.argv[2] if len(sys.argv) > 2 else "boundaries"

    dev = jax.devices()[0]
    log(f"device: {dev.platform}")
    assert float(jnp.sum(jnp.ones(8))) == 8.0

    import jax.tree_util as jtu

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(42)
    with jax.default_device(cpu):
        solver, channel = model.build()
        sset = dataclasses.replace(
            solver.settings(tolerance=gsettings.tolerance, max_iter=100),
            store=store)
        geo = solver.channel.geometry
        cap = max_fused_batch(geo.n_nodes, sset.n_time_levels, store)
        log(f"member cap/dispatch: {cap}  chunks: {-(-B_total // cap)}")

        # build the WHOLE ensemble once (vectorized), slice per chunk —
        # per-chunk python member construction would dominate the wall
        n_draws = rng.uniform(0.025, 0.045, B_total)
        q_scale = rng.uniform(0.8, 1.2, B_total)
        ts0 = np.asarray(solver.us_params.target_series)
        t0 = time.time()
        geob_all = jtu.tree_map(np.asarray,
                                roughness_ensemble(geo, n_draws))
        us_all = jtu.tree_map(
            lambda x: np.broadcast_to(np.asarray(x),
                                      (B_total,) + np.shape(x)),
            solver.us_params)
        us_all = dataclasses.replace(
            us_all, target_series=ts0[None, :] * q_scale[:, None])
        log(f"ensemble build ({B_total} members): {time.time()-t0:.1f}s")

    done = 0
    t_start = time.time()
    iters_total = 0
    conv_all = True
    peak_q = []
    while done < B_total:
        B = min(cap, B_total - done)
        sl = lambda x: x[done:done + B]
        out = fused_simulate_batched(jtu.tree_map(sl, geob_all),
                                     jtu.tree_map(sl, us_all),
                                     solver.ds_params,
                                     solver.h0, solver.Q0, sset,
                                     us_batched=True)
        # completion barrier + a real reduction a study would do
        peak_q.append(np.asarray(out.flow).max(axis=1))
        iters_total += int(np.asarray(out.iterations).sum())
        conv_all &= bool(np.asarray(out.converged).all())
        done += B
        log(f"  {done}/{B_total} members  ({time.time()-t_start:.1f}s)")
    wall = time.time() - t_start

    peak = np.concatenate([p if p.ndim == 1 else p.max(axis=-1)
                           for p in peak_q])
    log(f"converged={conv_all} total Newton iters={iters_total}")
    log(f"downstream peak-flow quantiles [5,50,95]%: "
        f"{np.percentile(peak, [5, 50, 95]).round(1)}")
    sims_per_s = B_total / wall
    ref_serial_days = 569.0 * B_total / 86400.0
    print(json.dumps({
        "members": B_total, "store": store, "wall_s": round(wall, 2),
        "sims_per_s": round(sims_per_s, 1),
        "newton_iters": iters_total, "converged": conv_all,
        "ref_serial_equiv_days": round(ref_serial_days, 1),
    }))


if __name__ == "__main__":
    main()
