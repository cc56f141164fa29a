"""Flagship-latency decomposition (VERDICT r1 item 8).

The full gerd run is one jit: scan over 384 levels x while_loop Newton
(~4803 iterations total, N=121).  At 0.338 s that is ~70 us per Newton
iteration — far above what 121-node arithmetic costs.  This script measures
where the time goes by chaining K data-dependent repetitions of each stage
inside a single jit (amortizing the ~30 ms tunnel dispatch floor and
defeating the remote result cache):

  a. assemble-only      — residual + Jacobian stencil (f64-emulated on TPU)
  b. solve-only         — block-PCR Newton solve (pcr_f32 path)
  c. assemble+solve     — one full Newton iteration body
  d. chained-noop floor — scan of trivial chained vector ops (loop overhead)
  e. end-to-end simulate (the bench.py number, for cross-checking a+b vs it)

Usage: python scripts/bench_flagship_latency.py [K]
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
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.ops import tridiag

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4800

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        solver, channel = model.build()
        sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
        sset = dataclasses.replace(sset, linear_solver="pcr_f32")
        geo = solver.channel.geometry
    dev = jax.devices()[0]
    log(f"device: {dev.platform}; K={K}")
    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"probe ok in {time.time()-t0:.1f}s")

    geo_d, us_d, ds_d, h0_d, Q0_d = jax.device_put(
        (geo, solver.us_params, solver.ds_params, solver.h0, solver.Q0), dev
    )

    def sync(x):
        return float(jnp.sum(x))

    def best_of(fn, *args, reps=3):
        fn(*args)  # compile
        best = np.inf
        for rep in range(reps):
            pert = tuple(a * (1.0 + 1e-12 * (rep + 1)) for a in args)
            t0 = time.time()
            sync(fn(*pert))
            best = min(best, time.time() - t0)
        return best

    bc0 = bnd.initial_bc_state(h0_d.dtype, gate_open=0.0,
                               gate_stage=ds_d.bed_level + h0_d[-1])
    karr = jnp.asarray(1)

    # (a) assemble-only: chain h,Q through a tiny function of the outputs
    @jax.jit
    def assemble_loop(h, Q):
        prev = prs.prev_level_state(geo_d, h, Q)

        def body(c, _):
            h, Q = c
            L, D, U, b, err, rs, _ = prs.assemble(
                geo_d, us_d, ds_d, sset, prev, h, Q, karr,
                bc0.reservoir_stage, bc0)
            use = jnp.sum(L) + jnp.sum(D) + jnp.sum(U)
            return (h + 1e-30 * b[:, 0] + 1e-30 * err,
                    Q + 1e-30 * b[:, 1] + 1e-30 * use), None

        (h, Q), _ = jax.lax.scan(body, (h, Q), None, length=K)
        return h + Q

    # (b) solve-only: fixed system, chained rhs
    with jax.default_device(cpu):
        prev0 = prs.prev_level_state(geo, solver.h0, solver.Q0)
        L0, D0, U0, b0, _, _, _ = prs.assemble(
            geo, solver.us_params, solver.ds_params, sset, prev0,
            solver.h0, solver.Q0, jnp.asarray(1),
            jnp.asarray(jnp.nan, solver.h0.dtype),
            bnd.initial_bc_state(solver.h0.dtype, gate_open=0.0,
                                 gate_stage=solver.ds_params.bed_level + solver.h0[-1]))
    L0, D0, U0, b0 = jax.device_put((L0, D0, U0, b0), dev)

    @jax.jit
    def solve_loop(L, D, U, b):
        f32 = jnp.float32
        Lf, Df, Uf = L.astype(f32), D.astype(f32), U.astype(f32)

        def body(c, _):
            x = tridiag.solve_block_tridiag(Lf, Df, Uf, c.astype(f32), method="pcr")
            return b + 1e-30 * x.astype(b.dtype), None

        c, _ = jax.lax.scan(body, b, None, length=K)
        return c

    # (c) full Newton iteration body (assemble + solve), chained
    @jax.jit
    def newton_body_loop(h, Q):
        prev = prs.prev_level_state(geo_d, h, Q)

        def body(c, _):
            h, Q = c
            L, D, U, b, err, rs, _ = prs.assemble(
                geo_d, us_d, ds_d, sset, prev, h, Q, karr,
                bc0.reservoir_stage, bc0)
            delta, _ = prs._solve_with_diag(L, D, U, b, sset)
            return (h + 1e-30 * delta[:, 0], Q + 1e-30 * delta[:, 1]), None

        (h, Q), _ = jax.lax.scan(body, (h, Q), None, length=K)
        return h + Q

    # (d) chained-noop floor: same scan length, trivial body
    @jax.jit
    def noop_loop(h):
        def body(c, _):
            return c * 1.0000000001 + 1e-30, None

        c, _ = jax.lax.scan(body, h, None, length=K)
        return c

    # (e) end-to-end, for each candidate inner solver
    def end_to_end(h0, s=sset):
        return prs.simulate(geo_d, us_d, ds_d, h0, Q0_d, s).depth

    results = {}
    for name, fn, args in [
        ("noop_floor", noop_loop, (h0_d,)),
        ("assemble_only", assemble_loop, (h0_d, Q0_d)),
        ("solve_only", solve_loop, (L0, D0, U0, b0)),
        ("newton_body", newton_body_loop, (h0_d, Q0_d)),
    ]:
        t = best_of(fn, *args)
        per_iter_us = t / K * 1e6
        results[name] = dict(wall_s=t, per_iter_us=per_iter_us)
        log(f"{name}: {t:.3f}s total, {per_iter_us:.1f} us/iter")

    solvers = ["pcr_f32"]
    if dev.platform != "cpu":
        solvers.append("pallas_pcr")
    for method in solvers:
        s = dataclasses.replace(sset, linear_solver=method)
        try:
            t = best_of(lambda h0: end_to_end(h0, s), h0_d)
            out = prs.simulate(geo_d, us_d, ds_d, h0_d, Q0_d, s)
            iters = int(np.asarray(out.iterations).sum())
            conv = bool(np.asarray(out.converged).all())
            results[f"end_to_end_{method}"] = dict(
                wall_s=t, iters=iters, converged=conv,
                per_iter_us=t / iters * 1e6)
            log(f"end_to_end[{method}]: {t:.3f}s, {iters} iters "
                f"(converged={conv}), {t/iters*1e6:.1f} us/iter")
        except Exception as e:  # noqa: BLE001 — report and keep measuring
            log(f"end_to_end[{method}] failed: {type(e).__name__}: {e}")
            results[f"end_to_end_{method}"] = dict(error=str(e)[:200])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
