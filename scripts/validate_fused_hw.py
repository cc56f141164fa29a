"""Hardware validation of every fused-kernel configuration.

Runs each supported case on the default device (TPU) through the fused
whole-simulation kernel and compares against a CPU f64 XLA run: iteration
counts (exact), convergence, fields, and mode-specific state (reservoir
stage / gate trajectory).

Cases: gerd smooth (blended_poly ds), gerd gated (gated_blend ds),
example (fixed_depth + storage ds), akbari_firoozi (normal_depth ds),
irregular_table (surveyed-polyline TableGeometry, normal_depth ds).

Batched-kernel cases (fused_simulate_batched): a flagship-config
roughness ensemble at EXACTLY the VMEM member cap in both store modes
("full" B=cap and "boundaries" B=cap) — this is what proves the
max_fused_batch budget actually compiles and runs on real TPU (the
batched kernel's working set scales with B*Np; interpret-mode CPU tests
cannot catch a VMEM overflow).  Numerics: every member's iteration count
vs its own serial CPU f64 run; fields spot-checked on 3 members.

Usage: python scripts/validate_fused_hw.py
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
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops.pallas.fused_newton import fused_simulate

    dev = jax.devices()[0]
    log(f"device: {dev.platform}")
    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"probe ok in {time.time()-t0:.1f}s")

    cpu = jax.devices("cpu")[0]

    def build_irregular_case():
        """Synthetic surveyed-polyline reach (TableGeometry) with a
        flow-hydrograph us and normal-depth ds BC."""
        from types import SimpleNamespace

        from flowsim_tpu.geometry_tables import (IrregularStation,
                                                 build_table_geometry)
        from flowsim_tpu.ops import boundary as bnd
        from flowsim_tpu.ops import initial_conditions as ic

        length, slope = 40000.0, 2e-4

        def section_pts(seed, z0):
            rng = np.random.default_rng(seed)
            x = np.linspace(0, 220, 21)
            z = z0 + 8.0 * ((x - 110) / 110) ** 2 + rng.uniform(0, 0.5, x.size)
            return x, z

        x1, z1 = section_pts(1, slope * length)
        x2, z2 = section_pts(2, 0.0)
        n_nodes, nt = 121, 193
        node_ch = np.linspace(0, length, n_nodes)
        dx = length / (n_nodes - 1)
        sts = [IrregularStation(x=x1, z=z1, n_main=0.03, bed_slope=slope),
               IrregularStation(x=x2, z=z2, n_main=0.03, bed_slope=slope)]
        geo = build_table_geometry(sts, [0.0, length], node_ch, samples=1024)
        h0, Q0 = ic.initial_conditions(geo, "steady-state", 400.0, dx)
        times = np.arange(nt) * 1800.0
        us_p = bnd.make_boundary(
            "flow_hydrograph", bed_level=float(geo.z_bed[0]),
            target_series=[400.0 + 600.0 * min(t / (4 * 3600.0), 1.0)
                           for t in times])
        ds_p = bnd.make_boundary(
            "normal_depth", bed_level=float(geo.z_bed[-1]),
            bed_slope=float(geo.bed_slope[-1]))
        sset = prs.PreissmannSettings(
            theta=0.7, time_step=1800.0, spatial_step=dx, n_time_levels=nt,
            tolerance=1e-8, max_iter=100)
        solver = SimpleNamespace(
            channel=SimpleNamespace(geometry=geo),
            us_params=us_p, ds_params=ds_p, h0=h0, Q0=Q0)
        return solver, sset

    def build_extended_bc_cases():
        """Round-2 BC-surface completion: general storage (area curve +
        storage rating + entrance losses), upstream rating, upstream
        storage (tests/test_fused_newton.py::test_bc_surface_extended)."""
        from types import SimpleNamespace

        from flowsim_tpu.geometry import TrapezoidGeometry
        from flowsim_tpu.ops import boundary as bnd
        from flowsim_tpu.ops import initial_conditions as ic
        from flowsim_tpu.ops import rating_curve as rcurve
        from flowsim_tpu.ops import storage as stg

        slope, nt, dx, dt = 0.00061, 21, 1000.0, 3600.0
        n = 30
        z = np.linspace(slope * (n - 1) * 1000.0, 0.0, n)
        ones, zeros = np.ones(n), np.zeros(n)
        geo = TrapezoidGeometry(
            z_bed=jnp.asarray(z), b_main=jnp.asarray(120.0 * ones),
            m_main=jnp.asarray(zeros), n_main=jnp.asarray(0.023 * ones),
            compound=jnp.asarray(np.zeros(n, bool)),
            h_bank=jnp.asarray(1e30 * ones),
            b_fp_left=jnp.asarray(zeros), b_fp_right=jnp.asarray(zeros),
            m_fp=jnp.asarray(zeros), n_left=jnp.asarray(0.023 * ones),
            n_right=jnp.asarray(0.023 * ones),
            bed_slope=jnp.asarray(slope * ones),
            curvature=jnp.asarray(zeros))
        h0, Q0 = ic.initial_conditions(geo, "steady-state", 100.0, dx)
        bed_us, bed_ds = float(z[0]), float(z[-1])
        sset = prs.PreissmannSettings(
            theta=0.6, time_step=dt, spatial_step=dx, n_time_levels=nt,
            tolerance=1e-6, max_iter=100)
        inflow = 100.0 + 200.0 * np.sin(np.linspace(0, np.pi, nt))
        us_hyd = bnd.make_boundary("flow_hydrograph", bed_level=bed_us,
                                   target_series=inflow)
        ds_normal = bnd.make_boundary("normal_depth", bed_level=bed_ds,
                                      bed_slope=slope)
        ac_stages = bed_ds + np.linspace(-2.0, 20.0, 12)
        sp_curve = stg.make_storage(
            area_curve=np.stack(
                [ac_stages, 4.0e5 * (1.0 + 0.08 * np.arange(12))], axis=1),
            min_stage=bed_ds - 1.0,
            rating=rcurve.make_polynomial(0.0, 30.0, -30.0 * (bed_ds - 1.0)),
            capture_losses=True, reservoir_length=1500.0, K_q=0.2)
        ds_storage_curve = bnd.make_boundary(
            "fixed_depth", bed_level=bed_ds, storage=sp_curve)
        stage0 = bed_us + float(np.asarray(h0)[0])
        q0 = float(np.asarray(Q0)[0])
        us_rating_blend = bnd.make_boundary(
            "rating_curve", bed_level=bed_us,
            rating=rcurve.make_blended_poly(
                low_quad=np.array([0.0, -25.0, q0 + 25.0 * stage0]),
                high_quad=np.array([0.0, -20.0, q0 + 20.0 * stage0]),
                pivot_stage=stage0 - 0.3, buffer=0.5))
        stage_pool = bed_us + 2.0
        pool_h0 = jnp.asarray(stage_pool - z)
        pool_Q0 = jnp.zeros_like(Q0)
        ds_stage_pool = bnd.make_boundary(
            "stage_hydrograph", bed_level=bed_ds,
            target_series=stage_pool
            + 0.05 * np.sin(np.linspace(0, np.pi, nt)))
        us_storage_curve = bnd.make_boundary(
            "fixed_depth", bed_level=bed_us,
            storage=stg.make_storage(
                area_curve=np.stack(
                    [bed_us + np.linspace(-2.0, 30.0, 10),
                     8.0e6 * (1.0 + 0.05 * np.arange(10))], axis=1),
                min_stage=bed_us - 1.0))

        def ns(us_p, ds_p, ih, iq):
            return (SimpleNamespace(channel=SimpleNamespace(geometry=geo),
                                    us_params=us_p, ds_params=ds_p,
                                    h0=ih, Q0=iq), sset)

        return {
            "ds_storage_curve_hl": ns(us_hyd, ds_storage_curve, h0, Q0),
            "us_rating_blend": ns(us_rating_blend, ds_normal, h0, Q0),
            "us_storage_curve": ns(us_storage_curve, ds_stage_pool,
                                   pool_h0, pool_Q0),
        }

    def build_cases():
        from flowsim_tpu.models import akbari_firoozi, example
        from flowsim_tpu.models.gerd_roseires import model, settings as gs

        cases = {}
        s, _ = model.build()
        cases["gerd_smooth"] = (s, s.settings(tolerance=gs.tolerance, max_iter=100))
        s, _ = model.build(smooth=False)
        cases["gerd_gated"] = (s, s.settings(tolerance=gs.tolerance, max_iter=100))
        s, _ = example.build()
        cases["example_storage"] = (s, s.settings(tolerance=1e-8, max_iter=100))
        s, _ = akbari_firoozi.build()
        cases["akbari_normal_depth"] = (s, s.settings(tolerance=1e-4, max_iter=100))
        cases["irregular_table"] = build_irregular_case()
        cases.update(build_extended_bc_cases())
        return cases

    with jax.default_device(cpu):
        cases = build_cases()

    only = set(sys.argv[1:])  # e.g. `validate_fused_hw.py batched` -> batched only

    def wanted(name):
        return not only or any(tok in name for tok in only)

    # single-kernel HBM output streaming (_LevelStreamer): same flagship
    # case, outputs DMA'd level-by-level to HBM instead of VMEM stacks
    import dataclasses as _dc
    _s0, _ss0 = cases["gerd_smooth"]
    cases["gerd_smooth_hbm_stream"] = (_s0, _dc.replace(_ss0,
                                                        out_memory="hbm"))

    results = {}
    for name, (solver, sset) in cases.items():
        if not wanted(name):
            continue
        geo = solver.channel.geometry
        with jax.default_device(cpu):
            ref = prs.simulate(geo, solver.us_params, solver.ds_params,
                               solver.h0, solver.Q0, sset)
        try:
            out = fused_simulate(geo, solver.us_params, solver.ds_params,
                                 solver.h0, solver.Q0, sset)
            float(jnp.sum(out.depth))
            best = np.inf
            for rep in range(2):
                h0p = jnp.asarray(np.asarray(solver.h0)
                                  * (1.0 + 1e-12 * (rep + 1)))
                t0 = time.time()
                out = fused_simulate(geo, solver.us_params, solver.ds_params,
                                     h0p, solver.Q0, sset)
                float(jnp.sum(out.depth))
                best = min(best, time.time() - t0)
            it_ref = np.asarray(ref.iterations)
            it_f = np.asarray(out.iterations)
            dd = float(np.abs(np.asarray(out.depth)
                              - np.asarray(ref.depth)).max())
            r = dict(
                wall_s=best,
                iters=int(it_f.sum()),
                iters_identical=bool((it_ref == it_f).all()),
                # a level whose converged residual lands within the
                # f32-constant-rounding band of the tolerance may flip by
                # one iteration (docs/PRECISION.md); within-1 is the bar for
                # those boundary levels
                iters_within_1=bool((np.abs(it_ref - it_f) <= 1).all()),
                converged=bool(np.asarray(out.converged).all()),
                max_dh_m=dd,
            )
            if name == "gerd_gated":
                r["gate_identical"] = bool(
                    (np.asarray(out.gate_open)
                     == np.asarray(ref.gate_open)).all())
            rs_ref = np.asarray(ref.reservoir_stage)
            if np.isfinite(rs_ref[1:]).any():
                drs = np.abs(np.asarray(out.reservoir_stage) - rs_ref)
                r["max_dstage_m"] = float(np.nanmax(drs))
            results[name] = r
            log(f"{name}: {best:.3f}s iters={r['iters']} "
                f"identical={r['iters_identical']} conv={r['converged']} "
                f"max|dh|={dd:.2e}")
        except Exception as e:  # noqa: BLE001
            results[name] = dict(error=f"{type(e).__name__}: {str(e)[:300]}")
            log(f"{name} FAILED: {results[name]['error']}")

    # -- batched kernel at the VMEM member cap, both store modes ----------
    import dataclasses as dc

    from flowsim_tpu.ops.pallas.fused_newton import (fused_simulate_batched,
                                                     max_fused_batch)
    from flowsim_tpu.parallel.ensemble import roughness_ensemble

    solver, sset = cases["gerd_smooth"]
    geo = solver.channel.geometry
    n_nodes, nt = geo.n_nodes, sset.n_time_levels
    # each (store, out_memory) combo at ITS OWN VMEM member cap: "vmem"
    # validates the in-VMEM output stacks (round-2 path), "hbm" the
    # _LevelStreamer DMA path at the ~18x larger working-set-bound cap
    for store, out_mem in (("full", "vmem"), ("boundaries", "vmem"),
                           ("full", "hbm"), ("boundaries", "hbm")):
        B = max_fused_batch(n_nodes, nt, store, out_mem)
        name = f"batched_{store}_{out_mem}_b{B}"
        if not wanted(name):
            continue
        sset_b = dc.replace(sset, store=store, out_memory=out_mem)
        n_vals = np.linspace(0.025, 0.045, B)
        with jax.default_device(cpu):
            geo_b = roughness_ensemble(geo, n_vals)
        probe_members = sorted({0, B // 2, B - 1})
        try:
            out = fused_simulate_batched(
                geo_b, solver.us_params, solver.ds_params,
                solver.h0, solver.Q0, sset_b)
            float(jnp.sum(out.depth))
            best = np.inf
            for rep in range(2):
                h0p = jnp.asarray(np.asarray(solver.h0)
                                  * (1.0 + 1e-12 * (rep + 1)))
                t0 = time.time()
                out = fused_simulate_batched(
                    geo_b, solver.us_params, solver.ds_params,
                    h0p, solver.Q0, sset_b)
                float(jnp.sum(out.depth))
                best = min(best, time.time() - t0)
            r = dict(wall_s=best, members=B,
                     sims_per_s=round(B / best, 1),
                     iters=int(np.asarray(out.iterations).sum()),
                     converged=bool(np.asarray(out.converged).all()))
            idmax = 0.0
            dmax = 0.0
            for m in probe_members:
                gm = jax.tree_util.tree_map(lambda a, m=m: a[m], geo_b)
                with jax.default_device(cpu):
                    ref = prs.simulate(gm, solver.us_params, solver.ds_params,
                                       solver.h0, solver.Q0, sset_b)
                it_d = np.abs(np.asarray(out.iterations[m])
                              - np.asarray(ref.iterations)).max()
                idmax = max(idmax, float(it_d))
                dmax = max(dmax, float(np.abs(
                    np.asarray(out.depth[m]) - np.asarray(ref.depth)).max()))
            r["max_iter_delta_vs_serial"] = idmax
            r["max_dh_m_vs_serial"] = dmax
            results[name] = r
            log(f"{name}: {best:.3f}s B={B} ({B/best:,.0f} sims/s) "
                f"iterdelta<={idmax:.0f} max|dh|={dmax:.2e} "
                f"conv={r['converged']}")
        except Exception as e:  # noqa: BLE001
            results[name] = dict(error=f"{type(e).__name__}: {str(e)[:300]}",
                                 members=B)
            log(f"{name} FAILED: {results[name]['error']}")

    # -- batched TableGeometry (round 5): shared tables + per-member
    # conveyance scale (table_roughness_ensemble), members on sublanes ----
    if wanted("batched_table"):
        from flowsim_tpu.parallel.ensemble import table_roughness_ensemble

        with jax.default_device(cpu):
            tsolver, tsset = build_irregular_case()
            # re-rasterize at an in-cap resolution (the O(M) row-accumulate
            # lookup caps M at 257 for the member-on-sublane layout)
            from flowsim_tpu.geometry_tables import (IrregularStation,
                                                     build_table_geometry)
            from flowsim_tpu.ops import initial_conditions as ic

            length, slope = 40000.0, 2e-4

            def _pts(seed, z0):
                rng = np.random.default_rng(seed)
                x = np.linspace(0, 220, 21)
                z = (z0 + 8.0 * ((x - 110) / 110) ** 2
                     + rng.uniform(0, 0.5, x.size))
                return x, z

            x1, z1 = _pts(1, slope * length)
            x2, z2 = _pts(2, 0.0)
            node_ch = np.linspace(0, length, 121)
            sts = [IrregularStation(x=x1, z=z1, n_main=0.03, bed_slope=slope),
                   IrregularStation(x=x2, z=z2, n_main=0.03, bed_slope=slope)]
            tgeo = build_table_geometry(sts, [0.0, length], node_ch,
                                        samples=96)
            th0, tQ0 = ic.initial_conditions(tgeo, "steady-state", 400.0,
                                             length / 120)
            Bt = 16
            tgeob = table_roughness_ensemble(tgeo, np.linspace(0.025, 0.04,
                                                               Bt))
        tsset = dc.replace(tsset, tolerance=1e-6)
        try:
            out = fused_simulate_batched(tgeob, tsolver.us_params,
                                         tsolver.ds_params, th0, tQ0, tsset)
            float(jnp.sum(out.depth))
            t0 = time.time()
            out = fused_simulate_batched(
                tgeob, tsolver.us_params, tsolver.ds_params,
                jnp.asarray(np.asarray(th0) * (1.0 + 1e-12)), tQ0, tsset)
            float(jnp.sum(out.depth))
            best = time.time() - t0
            r = dict(wall_s=best, members=Bt,
                     iters=int(np.asarray(out.iterations).sum()),
                     converged=bool(np.asarray(out.converged).all()))
            idmax = dmax = 0.0
            for m in (0, Bt // 2, Bt - 1):
                gm = jax.tree_util.tree_map(lambda a, m=m: a[m], tgeob)
                with jax.default_device(cpu):
                    ref = prs.simulate(gm, tsolver.us_params,
                                       tsolver.ds_params, th0, tQ0, tsset)
                idmax = max(idmax, float(np.abs(
                    np.asarray(out.iterations[m])
                    - np.asarray(ref.iterations)).max()))
                dmax = max(dmax, float(np.abs(
                    np.asarray(out.depth[m])
                    - np.asarray(ref.depth)).max()))
            r["max_iter_delta_vs_serial"] = idmax
            r["max_dh_m_vs_serial"] = dmax
            results["batched_table_b16"] = r
            log(f"batched_table_b16: {best:.3f}s iterdelta<={idmax:.0f} "
                f"max|dh|={dmax:.2e} conv={r['converged']}")
        except Exception as e:  # noqa: BLE001
            results["batched_table_b16"] = dict(
                error=f"{type(e).__name__}: {str(e)[:300]}")
            log(f"batched_table_b16 FAILED: "
                f"{results['batched_table_b16']['error']}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
