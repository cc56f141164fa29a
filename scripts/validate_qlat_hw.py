"""Hardware validation of the lateral-inflow fused-kernel paths (round 4).

Runs on the real TPU chip (Mosaic, not interpret mode):
  1. single-reach fused, constant [N] lateral inflow
  2. single-reach fused, time-varying [nt, N] lateral inflow
  3. batched fused, per-member [B, N] constant lateral inflow
Each is pinned against the f64 XLA engine run on CPU: identical Newton
iteration counts and |dh| < 1e-4.

Usage: python scripts/validate_qlat_hw.py   (prints one JSON line)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def _sync(x):
    return float(jnp.sum(jnp.nan_to_num(x)))


def main():
    from bench_scaling import build_long_reach

    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops.pallas.fused_newton import (fused_simulate,
                                                     fused_simulate_batched)

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev} (tpu={on_tpu})", file=sys.stderr)

    geo, us, ds, h0, Q0, sset = build_long_reach(128, np.float64, levels=10)
    n, nt = geo.n_nodes, sset.n_time_levels
    q_const = 0.004 * (1.0 + np.linspace(0.0, 1.0, n))
    t = np.linspace(0.0, 1.0, nt)[:, None]
    q_tv = 0.01 * np.exp(-((t - 0.4) / 0.25) ** 2) * (q_const / 0.004)[None]

    cpu = jax.devices("cpu")[0]
    results = {}

    def check(name, fused_out, q):
        with jax.default_device(cpu):
            ref = prs.simulate(geo, us, ds, h0, Q0, sset,
                               lateral_inflow=jnp.asarray(q))
            it_ref = np.asarray(ref.iterations)
            d_ref = np.asarray(ref.depth)
        it_f = np.asarray(fused_out.iterations)
        same = bool(np.array_equal(it_f, it_ref))
        dh = float(np.abs(np.asarray(fused_out.depth) - d_ref).max())
        conv = bool(np.asarray(fused_out.converged).all())
        results[name] = dict(same_iters=same, converged=conv,
                             max_dh=round(dh, 9))
        print(f"{name}: same_iters={same} converged={conv} |dh|={dh:.2e}",
              file=sys.stderr)
        return same and conv and dh < 1e-4

    ok = True
    out = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=not on_tpu,
                         lateral_inflow=q_const)
    _sync(out.depth)
    ok &= check("single_const", out, q_const)

    out = fused_simulate(geo, us, ds, h0, Q0, sset, interpret=not on_tpu,
                         lateral_inflow=q_tv)
    _sync(out.depth)
    ok &= check("single_tv", out, q_tv)

    B = 8
    geob = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), geo)
    rng = np.random.default_rng(0)
    qb = 0.004 * (1.0 + rng.random((B, n)))
    outb = fused_simulate_batched(geob, us, ds, h0, Q0, sset,
                                  interpret=not on_tpu, lateral_inflow=qb)
    _sync(outb.depth)
    per = []
    with jax.default_device(cpu):
        for m in range(B):
            r = prs.simulate(geo, us, ds, h0, Q0, sset,
                             lateral_inflow=jnp.asarray(qb[m]))
            per.append((np.asarray(r.iterations), np.asarray(r.depth)))
    it_b = np.asarray(outb.iterations)
    d_b = np.asarray(outb.depth)
    same_b = all(np.array_equal(it_b[m], per[m][0]) for m in range(B))
    dh_b = max(float(np.abs(d_b[m] - per[m][1]).max()) for m in range(B))
    conv_b = bool(np.asarray(outb.converged).all())
    results["batched_const"] = dict(same_iters=same_b, converged=conv_b,
                                    max_dh=round(dh_b, 9))
    print(f"batched_const: same_iters={same_b} converged={conv_b} "
          f"|dh|={dh_b:.2e}", file=sys.stderr)
    ok &= same_b and conv_b and dh_b < 1e-4

    # 4. batched, per-member TIME-VARYING [B, nt, N] (HBM-streamed rows)
    tt = np.linspace(0.0, 1.0, nt)[None, :, None]
    qb_tv = qb[:, None, :] * (1.0 + 0.8 * np.sin(
        2 * np.pi * (tt + np.arange(B)[:, None, None] / B)))
    outtv = fused_simulate_batched(geob, us, ds, h0, Q0, sset,
                                   interpret=not on_tpu,
                                   lateral_inflow=qb_tv)
    _sync(outtv.depth)
    per_tv = []
    with jax.default_device(cpu):
        for m in range(B):
            r = prs.simulate(geo, us, ds, h0, Q0, sset,
                             lateral_inflow=jnp.asarray(qb_tv[m]))
            per_tv.append((np.asarray(r.iterations), np.asarray(r.depth)))
    it_tv = np.asarray(outtv.iterations)
    d_tv = np.asarray(outtv.depth)
    same_tv = all(np.array_equal(it_tv[m], per_tv[m][0]) for m in range(B))
    dh_tv = max(float(np.abs(d_tv[m] - per_tv[m][1]).max()) for m in range(B))
    conv_tv = bool(np.asarray(outtv.converged).all())
    results["batched_tv"] = dict(same_iters=same_tv, converged=conv_tv,
                                 max_dh=round(dh_tv, 9))
    print(f"batched_tv: same_iters={same_tv} converged={conv_tv} "
          f"|dh|={dh_tv:.2e}", file=sys.stderr)
    ok &= same_tv and conv_tv and dh_tv < 1e-4

    results["platform"] = dev.platform
    results["ok"] = bool(ok)
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
