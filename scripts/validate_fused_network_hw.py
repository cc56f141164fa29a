"""Hardware validation of the fused whole-network kernel.

Runs every supported fused-network configuration on the default device
(TPU) and compares against the XLA network engines run on CPU f64:
iteration counts (exact), convergence, fields, junction stages, and
gate trajectories.

Cases:
* serial split (2 branches, 1 junction) — the strongest oracle (the same
  nonlinear system as the single reach);
* GERD tributary (3 branches, blended Roseires rating downstream,
  per-branch dx) at the flagship 385-level duration;
* 31-branch dendritic basin (15 junctions, m_rhs=3 interior branches);
* gated controller on an external network end (gate trajectory bit-equal);
* constant lateral inflow on both branches of a split reach;
* HBM output streaming bitwise vs the in-VMEM store (full tributary);
* year-long tributary run (nt=8761, only possible via streaming).

Usage: python scripts/validate_fused_network_hw.py
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


def _cpu_oracle(branches, nj, sset, engine="loop"):
    import jax

    from flowsim_tpu.ops.network import simulate_network

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return simulate_network(branches, nj, sset, engine=engine)


def _compare(name, branches, nj, sset, results, dh=1e-4):
    import jax.numpy as jnp

    from flowsim_tpu.ops.network import simulate_network

    t0 = time.time()
    out_f = simulate_network(branches, nj, sset, engine="fused")
    _ = float(jnp.sum(out_f.depth[0]))
    wall = time.time() - t0
    ref = _cpu_oracle(branches, nj, sset)
    il = np.asarray(ref.iterations)
    iff = np.asarray(out_f.iterations)
    same_iters = bool((il == iff).all())
    conv = bool(np.asarray(out_f.converged).all())
    dmax = max(np.abs(np.asarray(ref.depth[b]) - np.asarray(out_f.depth[b])).max()
               for b in range(len(branches)))
    dy = float(np.abs(np.asarray(ref.junction_stage)
                      - np.asarray(out_f.junction_stage)).max())
    ok = same_iters and conv and dmax < dh and dy < dh
    results[name] = dict(ok=ok, wall_first=round(wall, 3),
                         iters=int(iff.sum()), same_iters=same_iters,
                         converged=conv, max_dh=float(dmax), max_dY=dy)
    log(f"{name}: ok={ok} iters={int(iff.sum())} same={same_iters} "
        f"conv={conv} |dh|={dmax:.2e} |dY|={dy:.2e} first={wall:.1f}s")
    return out_f


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from flowsim_tpu.models import akbari_firoozi as ak
    from flowsim_tpu.models import basin, gerd_tributary
    from flowsim_tpu.ops.network import BranchDef, simulate_network

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    results = {}

    def split_branches(solver, cut, sset):
        geo = solver.channel.geometry
        sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
        return [
            BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                      us=solver.us_params, ds=0,
                      h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1]),
            BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                      us=0, ds=solver.ds_params,
                      h0=solver.h0[cut:], Q0=solver.Q0[cut:]),
        ]

    # 1) serial split
    solver, _ = ak.build()
    sset = dataclasses.replace(solver.settings(tolerance=1e-6, max_iter=100),
                               n_time_levels=21)
    _compare("serial_split", split_branches(solver, 15, sset), 1, sset,
             results, dh=1e-5)

    # 2) GERD tributary, flagship duration
    branches, nj, tset, _ = gerd_tributary.build(sim_duration=3600 * 384)
    _compare("gerd_tributary", branches, nj, tset, results, dh=1e-4)

    # 3) 31-branch basin
    bb, bnj, bsset = basin.build(levels=5)
    _compare("basin31", bb, bnj, bsset, results, dh=1e-4)

    # 4) gated external end
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_gated_curve import _build_gated_solver

    gsolver = _build_gated_solver()
    gset = gsolver.settings(tolerance=1e-6, max_iter=100)
    gbr = split_branches(gsolver, 10, gset)
    out_f = _compare("gated_end", gbr, 1, gset, results, dh=1e-4)
    ref = _cpu_oracle(gbr, 1, gset)
    gates_equal = bool(np.array_equal(np.asarray(ref.gate_open)[:, 1, 1],
                                      np.asarray(out_f.gate_open)[:, 1, 1]))
    results["gated_end"]["gates_equal"] = gates_equal
    results["gated_end"]["ok"] &= gates_equal
    log(f"gated_end gates_equal={gates_equal}")

    # 5) constant lateral inflow
    qbr = split_branches(solver, 15, sset)
    qbr = [dataclasses.replace(
        br, qlat=jnp.asarray(0.004 * (1.0 + np.linspace(
            0.0, 1.0, int(br.h0.shape[0])))))
        for br in qbr]
    _compare("qlat_split", qbr, 1, sset, results, dh=1e-5)

    # 6) HBM streaming bitwise on the full tributary
    out_v = simulate_network(branches, nj,
                             dataclasses.replace(tset, out_memory="vmem"),
                             engine="fused")
    out_h = simulate_network(branches, nj,
                             dataclasses.replace(tset, out_memory="hbm"),
                             engine="fused")
    bitwise = all(
        np.array_equal(np.asarray(out_v.depth[b]), np.asarray(out_h.depth[b]))
        for b in range(3)) and np.array_equal(
            np.asarray(out_v.junction_stage), np.asarray(out_h.junction_stage))
    results["hbm_bitwise"] = dict(ok=bool(bitwise))
    log(f"hbm_bitwise: {bitwise}")

    # 7) year-long tributary (streaming only)
    b2, nj2, ss2, _ = gerd_tributary.build(sim_duration=3600 * 8760)
    t0 = time.time()
    out = simulate_network(b2, nj2, ss2, engine="fused")
    _ = float(jnp.sum(out.depth[0]))
    wall = time.time() - t0
    conv = bool(np.asarray(out.converged).all())
    results["year_long"] = dict(ok=conv, wall_first=round(wall, 1),
                                iters=int(np.asarray(out.iterations).sum()),
                                converged=conv)
    log(f"year_long: conv={conv} iters={results['year_long']['iters']} "
        f"first={wall:.1f}s")

    all_ok = all(r.get("ok") for r in results.values())
    print(json.dumps(dict(ok=all_ok, device=str(dev.device_kind),
                          cases=results)))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
