"""Hardware validation of every fused-kernel configuration.

Runs each supported case on the default device (TPU) through the fused
whole-simulation kernel and compares against a CPU f64 XLA run: iteration
counts (exact), convergence, fields, and mode-specific state (reservoir
stage / gate trajectory).

Cases: gerd smooth (blended_poly ds), gerd gated (gated_blend ds),
example (fixed_depth + storage ds), akbari_firoozi (normal_depth ds),
irregular_table (surveyed-polyline TableGeometry, normal_depth ds).

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
        return cases

    with jax.default_device(cpu):
        cases = build_cases()

    results = {}
    for name, (solver, sset) in cases.items():
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
            if name == "example_storage":
                drs = np.abs(np.asarray(out.reservoir_stage)
                             - np.asarray(ref.reservoir_stage))
                r["max_dstage_m"] = float(np.nanmax(drs))
            results[name] = r
            log(f"{name}: {best:.3f}s iters={r['iters']} "
                f"identical={r['iters_identical']} conv={r['converged']} "
                f"max|dh|={dd:.2e}")
        except Exception as e:  # noqa: BLE001
            results[name] = dict(error=f"{type(e).__name__}: {str(e)[:300]}")
            log(f"{name} FAILED: {results[name]['error']}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
