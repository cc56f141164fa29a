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


def validate_storage_curves():
    """Round-4 per-sublane stage-grid eval: single-reach storage curve
    (rewritten lookups), per-member batched curves, network curve end —
    each vs CPU f64 XLA.  Run: python scripts/validate_qlat_hw.py storage"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_fused_newton import _rect_reach

    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops import rating_curve as rcurve
    from flowsim_tpu.ops import storage as stg
    from flowsim_tpu.ops.pallas.fused_newton import (fused_simulate,
                                                     fused_simulate_batched)
    from flowsim_tpu.parallel.ensemble import batch_boundaries

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    cpu = jax.devices("cpu")[0]
    results = {}
    ok = True

    slope, nt, dx, dt = 0.00061, 15, 1000.0, 3600.0
    geo = _rect_reach(slope=slope)
    z = np.asarray(geo.z_bed)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 100.0, dx)
    bed_us, bed_ds = float(z[0]), float(z[-1])
    sset = prs.PreissmannSettings(theta=0.6, time_step=dt, spatial_step=dx,
                                  n_time_levels=nt, tolerance=1e-6,
                                  max_iter=100)
    inflow = 100.0 + 200.0 * np.sin(np.linspace(0, np.pi, nt))
    us_hyd = bnd.make_boundary("flow_hydrograph", bed_level=bed_us,
                               target_series=inflow)
    ac_stages = bed_ds + np.linspace(-2.0, 20.0, 12)

    def mk_ds(fA, fQ):
        sp = stg.make_storage(
            area_curve=np.stack(
                [ac_stages, fA * 4.0e5 * (1.0 + 0.08 * np.arange(12))],
                axis=1),
            min_stage=bed_ds - 1.0,
            rating=rcurve.make_polynomial(0.0, fQ, -fQ * (bed_ds - 1.0)),
            capture_losses=True, reservoir_length=1500.0, K_q=0.2)
        return bnd.make_boundary("fixed_depth", bed_level=bed_ds,
                                 storage=sp)

    def pin(name, it_f, d_f, rs_f, ds_p):
        with jax.default_device(cpu):
            ref = prs.simulate(geo, us_hyd, ds_p, h0, Q0, sset)
        di = int(np.abs(np.asarray(ref.iterations) - it_f).max())
        dd = float(np.abs(d_f - np.asarray(ref.depth)).max())
        drs = float(np.abs(rs_f[1:]
                           - np.asarray(ref.reservoir_stage)[1:]).max())
        good = di <= 1 and dd < 1e-4 and drs < 1e-4
        results[name] = dict(ok=good, d_iters=di, max_dh=round(dd, 9),
                             max_dY=round(drs, 9))
        print(f"{name}: ok={good} d_iters={di} |dh|={dd:.2e} "
              f"|dY|={drs:.2e}", file=sys.stderr)
        return good

    out1 = fused_simulate(geo, us_hyd, mk_ds(1.0, 30.0), h0, Q0, sset,
                          interpret=not on_tpu)
    _sync(out1.depth)
    ok &= pin("single_curve", np.asarray(out1.iterations),
              np.asarray(out1.depth), np.asarray(out1.reservoir_stage),
              mk_ds(1.0, 30.0))

    members = [mk_ds(fA, fQ)
               for fA, fQ in ((0.8, 25.0), (1.0, 30.0), (1.3, 35.0))]
    ds_b, _ = batch_boundaries(members)
    B = 3
    geob = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), geo)
    outb = fused_simulate_batched(geob, us_hyd, ds_b, h0, Q0, sset,
                                  interpret=not on_tpu, ds_batched=True)
    _sync(outb.depth)
    for m in range(B):
        ok &= pin(f"batched_curve_m{m}", np.asarray(outb.iterations)[m],
                  np.asarray(outb.depth)[m],
                  np.asarray(outb.reservoir_stage)[m], members[m])

    from flowsim_tpu.ops.network import BranchDef, simulate_network
    cut = 8
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    brs = [BranchDef(geo=sl(slice(0, cut + 1)), dx=dx, us=us_hyd, ds=0,
                     h0=h0[: cut + 1], Q0=Q0[: cut + 1]),
           BranchDef(geo=sl(slice(cut, None)), dx=dx, us=0,
                     ds=mk_ds(1.0, 30.0), h0=h0[cut:], Q0=Q0[cut:])]
    outn = simulate_network(brs, 1, sset, engine="fused")
    _sync(outn.depth[0])
    with jax.default_device(cpu):
        refn = simulate_network(brs, 1, sset, engine="loop")
    din = int(np.abs(np.asarray(refn.iterations)
                     - np.asarray(outn.iterations)).max())
    ddn = max(float(np.abs(np.asarray(outn.depth[b])
                           - np.asarray(refn.depth[b])).max())
              for b in range(2))
    drn = float(np.abs(np.asarray(outn.reservoir_stage)[1:, 1, 1]
                       - np.asarray(refn.reservoir_stage)[1:, 1, 1]).max())
    goodn = din <= 1 and ddn < 1e-4 and drn < 1e-4
    results["network_curve_end"] = dict(ok=goodn, d_iters=din,
                                        max_dh=round(ddn, 9),
                                        max_dY=round(drn, 9))
    print(f"network_curve_end: ok={goodn} d_iters={din} |dh|={ddn:.2e} "
          f"|dY|={drn:.2e}", file=sys.stderr)
    ok &= goodn

    # batched NETWORK kernel with the same curve end, 3 members scaling
    # the inflow (stage-grid tables per member x branch sublane)
    from flowsim_tpu.parallel.ensemble import batched_simulate_network
    scales = np.asarray([0.9, 1.0, 1.1])
    se = np.asarray(us_hyd.target_series, np.float64)
    us_b = jax.vmap(lambda s: dataclasses.replace(
        us_hyd, target_series=jnp.asarray(se) * s))(jnp.asarray(scales))
    outm = batched_simulate_network(brs, 1, sset, [dict(us=us_b), dict()],
                                    engine="fused")
    _sync(outm.junction_stage)
    goodm = True
    for m, s in enumerate(scales):
        brm = [dataclasses.replace(brs[0], us=dataclasses.replace(
            us_hyd, target_series=jnp.asarray(se * s))), brs[1]]
        with jax.default_device(cpu):
            refm = simulate_network(brm, 1, sset, engine="loop")
        dim = int(np.abs(np.asarray(refm.iterations)
                         - np.asarray(outm.iterations)[m]).max())
        ddm = max(float(np.abs(np.asarray(outm.depth[b])[m]
                               - np.asarray(refm.depth[b])).max())
                  for b in range(2))
        goodm &= dim <= 1 and ddm < 1e-4
        print(f"batched_net_curve_m{m}: d_iters={dim} |dh|={ddm:.2e}",
              file=sys.stderr)
    results["batched_network_curve"] = dict(ok=goodm)
    ok &= goodm

    # round 5: storage on BOTH boundaries in one kernel (us stage carry +
    # *_US slots + second stage-grid table input) — simple us + curve ds
    us_st = bnd.make_boundary(
        "fixed_depth", bed_level=bed_us,
        storage=stg.make_storage(surface_area=8.0e5,
                                 min_stage=bed_us - 5.0,
                                 solution_boundaries=(0.0, 100.0)))
    ds_both = mk_ds(1.0, 30.0)
    out2 = fused_simulate(geo, us_st, ds_both, h0, Q0, sset,
                          interpret=not on_tpu)
    _sync(out2.depth)
    with jax.default_device(cpu):
        ref2 = prs.simulate(geo, us_st, ds_both, h0, Q0, sset)
    di2 = int(np.abs(np.asarray(ref2.iterations)
                     - np.asarray(out2.iterations)).max())
    dd2 = float(np.abs(np.asarray(out2.depth)
                       - np.asarray(ref2.depth)).max())
    dr2 = float(np.abs(np.asarray(out2.reservoir_stage)[1:]
                       - np.asarray(ref2.reservoir_stage)[1:]).max())
    du2 = float(np.abs(np.asarray(out2.reservoir_stage_us)[1:]
                       - np.asarray(ref2.reservoir_stage_us)[1:]).max())
    good2 = di2 <= 1 and dd2 < 1e-4 and dr2 < 1e-4 and du2 < 1e-4
    results["both_ends_storage"] = dict(ok=good2, d_iters=di2,
                                        max_dh=round(dd2, 9),
                                        max_dY_ds=round(dr2, 9),
                                        max_dY_us=round(du2, 9))
    print(f"both_ends_storage: ok={good2} d_iters={di2} |dh|={dd2:.2e} "
          f"|dY_ds|={dr2:.2e} |dY_us|={du2:.2e}", file=sys.stderr)
    ok &= good2

    results["platform"] = dev.platform
    results["ok"] = bool(ok)
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    if "storage" in sys.argv[1:]:
        raise SystemExit(validate_storage_curves())
    raise SystemExit(main())
