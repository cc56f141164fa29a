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


def _cpu_oracle(branches, nj, sset, engine="loop", **net_kw):
    import jax

    from flowsim_tpu.ops.network import simulate_network

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return simulate_network(branches, nj, sset, engine=engine, **net_kw)


ONLY = sys.argv[1:]  # optional case-name substrings to run


def _skip(name):
    return ONLY and not any(s in name for s in ONLY)


def _compare(name, branches, nj, sset, results, dh=1e-4, **net_kw):
    import jax.numpy as jnp

    from flowsim_tpu.ops.network import simulate_network

    if _skip(name):
        return None
    t0 = time.time()
    try:
        out_f = simulate_network(branches, nj, sset, engine="fused",
                                 **net_kw)
        _ = float(jnp.sum(out_f.depth[0]))
    except Exception as e:  # noqa: BLE001 — record, keep validating
        results[name] = dict(ok=False, error=f"{type(e).__name__}: {e}")
        log(f"{name}: FAILED {type(e).__name__}: {e}")
        return None
    wall = time.time() - t0
    ref = _cpu_oracle(branches, nj, sset, **net_kw)
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
    if out_f is not None:
        ref = _cpu_oracle(gbr, 1, gset)
        gates_equal = bool(np.array_equal(
            np.asarray(ref.gate_open)[:, 1, 1],
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

    # 5b) junction reservoir + rated dam outflow (round-4 kernel scope)
    from flowsim_tpu.ops import rating_curve as rcurve

    rbr = split_branches(solver, 15, sset)
    SA = 5.0e5
    z_conf = float(np.asarray(rbr[0].geo.z_bed)[-1])
    Y_init = z_conf + float(np.asarray(rbr[0].h0)[-1])
    _compare("junction_reservoir", rbr, 1, sset, results, dh=1e-5,
             junction_area=[SA])
    rc = rcurve.make_polynomial(0.0, 40.0, -40.0 * Y_init + 20.0)
    out_f = _compare("junction_dam_rated", rbr, 1, sset, results, dh=1e-5,
                     junction_area=[SA], junction_rating=[rc])
    if out_f is not None:
        qo = np.asarray(out_f.junction_outflow)[:, 0]
        live = bool(qo[1:].min() > 0.0)
        results["junction_dam_rated"]["outflow_live"] = live
        results["junction_dam_rated"]["ok"] &= live
    rcb = rcurve.make_blended_poly(
        [0.0, 20.0, -20.0 * Y_init + 10.0],
        [0.0, 60.0, -60.0 * Y_init + 30.0],
        pivot_stage=Y_init + 0.05, buffer=0.5)
    _compare("junction_blended", rbr, 1, sset, results, dh=1e-5,
             junction_area=[SA], junction_rating=[rcb])

    # 5b2) round-5 junction rating kinds: exact TABLE (per-segment masked
    # eval on the user's breakpoints) and POWER (df32 exp/log)
    rct = rcurve.make_table(
        Y_init + np.array([-2.0, -0.5, 0.0, 0.4, 1.1, 2.5, 6.0]),
        np.array([0.0, 8.0, 20.0, 36.0, 84.0, 180.0, 500.0]))
    _compare("junction_table_rating", rbr, 1, sset, results, dh=1e-5,
             junction_area=[SA], junction_rating=[rct])
    rcp = rcurve.make_power(a=20.0 / 3.0 ** 1.6, b=1.6,
                            stage_shift=-(Y_init - 3.0))
    _compare("junction_power_rating", rbr, 1, sset, results, dh=1e-5,
             junction_area=[SA], junction_rating=[rcp])

    # 5b3) round-5 both-ends storage on one branch (tests/test_fused_
    # network.py::test_branch_both_ends_storage_parity topology)
    from test_both_boundary_storage import DT as BDT, DX as BDX
    from test_both_boundary_storage import build as both_build
    from test_fused_network import _prismatic

    from flowsim_tpu.ops import boundary as bnd_m
    from flowsim_tpu.ops import initial_conditions as ic

    geo_b, us_b0, ds_b0, h0_b, Q0_b = both_build()
    pg = _prismatic()
    pz = np.asarray(pg.z_bed)
    ph0, pQ0 = ic.initial_conditions(pg, "steady-state", 150.0, BDX)
    pcut = 8
    psl = lambda s: jax.tree_util.tree_map(lambda x: x[s], pg)
    us_pq = bnd_m.make_boundary("flow_hydrograph", bed_level=float(pz[0]),
                                target_series=np.full(11, 150.0))
    ds_pn = bnd_m.make_boundary("normal_depth", bed_level=float(pz[-1]),
                                bed_slope=6e-4)
    import flowsim_tpu.ops.preissmann as prs_m

    bset = prs_m.PreissmannSettings(
        theta=0.6, time_step=BDT, spatial_step=BDX, n_time_levels=11,
        tolerance=1e-8, max_iter=100)
    bebr = [
        BranchDef(geo=geo_b, dx=BDX, us=us_b0, ds=ds_b0, h0=h0_b, Q0=Q0_b),
        BranchDef(geo=psl(slice(0, pcut + 1)), dx=BDX, us=us_pq, ds=0,
                  h0=ph0[: pcut + 1], Q0=pQ0[: pcut + 1]),
        BranchDef(geo=psl(slice(pcut, None)), dx=BDX, us=0, ds=ds_pn,
                  h0=ph0[pcut:], Q0=pQ0[pcut:]),
    ]
    _compare("branch_both_ends_storage", bebr, 1, bset, results, dh=1e-5)

    # 5c) constant-area storage on an external network end + mixed kinds
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import test_fused_network as tfn

    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops import storage as stg

    slope, dxp, dtp, ntp = 6e-4, 1000.0, 1800.0, 13
    pg = tfn._prismatic()
    zp = np.asarray(pg.z_bed)
    us_s = bnd.make_boundary(
        "fixed_depth", bed_level=float(zp[0]),
        storage=stg.make_storage(surface_area=4.0e6,
                                 min_stage=float(zp[0]) - 5.0,
                                 solution_boundaries=(0.0, 100.0)))
    ds_n = bnd.make_boundary("normal_depth", bed_level=float(zp[-1]),
                             bed_slope=slope)
    h0p, Q0p = ic.initial_conditions(pg, "steady-state", 150.0, dxp)
    pset = prs.PreissmannSettings(theta=0.6, time_step=dtp, spatial_step=dxp,
                                  n_time_levels=ntp, tolerance=1e-8,
                                  max_iter=100)
    slp = lambda s: jax.tree_util.tree_map(lambda x: x[s], pg)
    sbr = [BranchDef(geo=slp(slice(0, 9)), dx=dxp, us=us_s, ds=0,
                     h0=h0p[:9], Q0=Q0p[:9]),
           BranchDef(geo=slp(slice(8, None)), dx=dxp, us=0, ds=ds_n,
                     h0=h0p[8:], Q0=Q0p[8:])]
    out_f = _compare("storage_end", sbr, 1, pset, results, dh=1e-5)
    if out_f is not None:
        ref_s = _cpu_oracle(sbr, 1, pset)
        rs_ok = bool(np.allclose(
            np.asarray(out_f.reservoir_stage)[1:, 0, 0],
            np.asarray(ref_s.reservoir_stage)[1:, 0, 0], atol=5e-6))
        results["storage_end"]["stage_match"] = rs_ok
        results["storage_end"]["ok"] &= rs_ok

    gm = tfn._prismatic(n=31)
    h0g, Q0g = ic.initial_conditions(gm, "steady-state", 150.0, dxp)
    zg = np.asarray(gm.z_bed)
    slg = lambda s: jax.tree_util.tree_map(lambda x: x[s], gm)
    tms = np.arange(11, dtype=np.float64)
    flood = 150.0 + 80.0 * np.exp(-((tms - 4.0) / 2.5) ** 2)
    mset = dataclasses.replace(pset, n_time_levels=11)
    mbr = [
        BranchDef(geo=slg(slice(0, 11)), dx=dxp,
                  us=bnd.make_boundary("flow_hydrograph",
                                       bed_level=float(zg[0]),
                                       target_series=flood),
                  ds=0, h0=h0g[:11], Q0=Q0g[:11]),
        BranchDef(geo=slg(slice(0, 11)), dx=dxp,
                  us=bnd.make_boundary(
                      "stage_hydrograph", bed_level=float(zg[0]),
                      target_series=np.full(11, float(zg[0] + h0g[0]))),
                  ds=0, h0=h0g[:11], Q0=Q0g[:11]),
        BranchDef(geo=slg(slice(10, 21)), dx=dxp, us=0,
                  ds=bnd.make_boundary("normal_depth",
                                       bed_level=float(zg[20]),
                                       bed_slope=slope),
                  h0=h0g[10:21], Q0=Q0g[10:21]),
        BranchDef(geo=slg(slice(10, 21)), dx=dxp, us=0,
                  ds=bnd.make_boundary("fixed_depth",
                                       bed_level=float(zg[20]),
                                       initial_depth=float(h0g[20])),
                  h0=h0g[10:21], Q0=Q0g[10:21]),
    ]
    _compare("mixed_end_kinds", mbr, 1, mset, results, dh=1e-5)

    # 5d) time-varying lateral inflow (per-level rows in VMEM)
    tvbr = split_branches(solver, 15, sset)
    ntv = sset.n_time_levels
    tv = []
    for br in tvbr:
        nb = int(br.h0.shape[0])
        t = np.linspace(0.0, 1.0, ntv)[:, None]
        pulse = 0.02 * np.exp(-((t - 0.4) / 0.2) ** 2) \
            * (1.0 + np.linspace(0.0, 1.0, nb))[None, :]
        tv.append(dataclasses.replace(br, qlat=jnp.asarray(pulse)))
    _compare("qlat_tv", tv, 1, sset, results, dh=1e-5)

    # 5e) TableGeometry branches (per-sublane mask-accumulated lookup) and
    # a MIXED table+trapezoid network (both closures evaluated + selected)
    if not (_skip("table_net") and _skip("mixed_geo")):
        from flowsim_tpu.geometry import (interpolate_stations,
                                          trapezoid_station)
        from flowsim_tpu.geometry_tables import (IrregularStation,
                                                 build_table_geometry)
        from flowsim_tpu.ops import initial_conditions as ic

        length, slope_t = 8000.0, 2e-4

        def section_pts(seed, z0):
            rng = np.random.default_rng(seed)
            x = np.linspace(0, 220, 21)
            z = z0 + 8.0 * ((x - 110) / 110) ** 2 \
                + rng.uniform(0, 0.5, x.size)
            return x, z

        x1, z1 = section_pts(1, slope_t * length)
        x2, z2 = section_pts(2, 0.0)
        node_ch = np.linspace(0, length, 9)
        stg = [IrregularStation(x=x1, z=z1, n_main=0.03, bed_slope=slope_t),
               IrregularStation(x=x2, z=z2, n_main=0.03, bed_slope=slope_t)]
        tgeo = build_table_geometry(stg, [0.0, length], node_ch, samples=48)
        h0t, Q0t = ic.initial_conditions(tgeo, "steady-state", 400.0, 1000.0)
        ntt = 17
        times_t = np.arange(ntt) * 1800.0
        us_t = bnd.make_boundary(
            "flow_hydrograph", bed_level=float(tgeo.z_bed[0]),
            target_series=[400.0 + 600.0 * min(t / (4 * 3600.0), 1.0)
                           for t in times_t])
        ds_t = bnd.make_boundary(
            "normal_depth", bed_level=float(tgeo.z_bed[-1]),
            bed_slope=float(tgeo.bed_slope[-1]))
        tset2 = dataclasses.replace(sset, n_time_levels=ntt,
                                    time_step=1800.0, tolerance=1e-8)
        slt = lambda s: jax.tree_util.tree_map(lambda x: x[s], tgeo)
        tbr = [BranchDef(geo=slt(slice(0, 5)), dx=1000.0, us=us_t, ds=0,
                         h0=h0t[:5], Q0=Q0t[:5]),
               BranchDef(geo=slt(slice(4, None)), dx=1000.0, us=0, ds=ds_t,
                         h0=h0t[4:], Q0=Q0t[4:])]
        _compare("table_net", tbr, 1, tset2, results, dh=1e-5)

        z_conf = float(np.asarray(tgeo.z_bed)[4])
        st_a = trapezoid_station(z_bed=z_conf + 4000.0 * slope_t,
                                 b_main=40.0, m_main=2.0, n_main=0.03,
                                 bed_slope=slope_t)
        st_b = trapezoid_station(z_bed=z_conf, b_main=40.0, m_main=2.0,
                                 n_main=0.03, bed_slope=slope_t)
        gT = interpolate_stations([st_a, st_b], [0.0, 4000.0],
                                  np.linspace(0.0, 4000.0, 5))
        hT, QT = ic.initial_conditions(gT, "steady-state", 150.0, 1000.0)
        us_trib = bnd.make_boundary(
            "flow_hydrograph", bed_level=float(gT.z_bed[0]),
            target_series=[150.0 + 150.0 * min(t / (4 * 3600.0), 1.0)
                           for t in times_t])
        mixbr = [tbr[0],
                 BranchDef(geo=gT, dx=1000.0, us=us_trib, ds=0,
                           h0=hT, Q0=QT),
                 BranchDef(geo=slt(slice(4, None)), dx=1000.0, us=0,
                           ds=ds_t, h0=h0t[4:], Q0=Q0t[4:] + 150.0)]
        _compare("mixed_geo", mixbr, 1, tset2, results, dh=1e-5)

    # 6) HBM streaming bitwise on the full tributary
    if not _skip("hbm_bitwise"):
        _run_hbm_bitwise(simulate_network, branches, nj, tset, results)
    if not _skip("year_long"):
        _run_year_long(simulate_network, gerd_tributary, jnp, results)

    all_ok = all(r.get("ok") for r in results.values())
    print(json.dumps(dict(ok=all_ok, device=str(dev.device_kind),
                          cases=results)))
    return 0 if all_ok else 1


def _run_hbm_bitwise(simulate_network, branches, nj, tset, results):
    import dataclasses
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


def _run_year_long(simulate_network, gerd_tributary, jnp, results):
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


if __name__ == "__main__":
    raise SystemExit(main())
