"""Hardware validation of every fused-kernel configuration.

Runs each supported case on the default device (TPU) through the fused
whole-simulation kernel and compares against a CPU f64 XLA run: iteration
counts (exact), convergence, fields, and mode-specific state (reservoir
stage / gate trajectory).

Cases: gerd smooth (blended_poly ds), gerd gated (gated_blend ds),
example (fixed_depth + storage ds), akbari_firoozi (normal_depth ds).

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
