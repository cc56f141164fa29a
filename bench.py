"""Benchmark: Newton-Preissmann throughput on the flagship GERD config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the gerd_roseires standard configuration (N=121 nodes, 384 hourly
levels, theta=0.6, tol=1e-6, float64) — identical numerical semantics to the
reference (same tolerance, same convergence rule), so wall-clocks compare
like for like.  The baseline is the measured wall time of the mounted
reference NumPy/SciPy solver on the same machine
(scripts/measure_reference_baseline.py -> scripts/reference_baseline.json).

Metric: newton-node-updates/s = n_nodes * total_Newton_iterations / wall_s
(one "node update" = one node's residual+Jacobian row assembly + its share
of the linear solve, per Newton iteration; ref does the same work per
iteration, preissmann.py:122-153).

Extra diagnostics (stderr): node-level updates/s, f32 throughput, and a
long-reach scaling probe.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    """Dispatch: try the TPU in a watchdogged subprocess (the tunneled device
    can hang indefinitely on connect, and a separate probe would itself
    consume the tunnel session), fall back to an in-process CPU run."""
    import subprocess

    if os.environ.get("FLOWSIM_BENCH_INNER") == "1":
        return _run_benchmark(force_cpu=os.environ.get("FLOWSIM_BENCH_CPU") == "1")
    if os.environ.get("FLOWSIM_BENCH_CPU") == "1":
        return _run_benchmark(force_cpu=True)

    env = dict(os.environ, FLOWSIM_BENCH_INNER="1")
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           timeout=int(os.environ.get("FLOWSIM_BENCH_TPU_TIMEOUT", "2400")),
                           capture_output=True, text=True, env=env)
        sys.stderr.write(r.stderr)
        if r.returncode == 0 and '"metric"' in r.stdout:
            sys.stdout.write(r.stdout)
            return
        log("TPU benchmark attempt failed — falling back to CPU")
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr.decode() if isinstance(e.stderr, bytes) else e.stderr)
        log("TPU benchmark attempt timed out (wedged tunnel?) — falling back to CPU")
    return _run_benchmark(force_cpu=True)


def _run_benchmark(force_cpu: bool = False):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_enable_x64", True)

    # persistent compilation cache: pay each executable's compile once per
    # machine instead of once per process (round-5; utils/compile_cache.py)
    from flowsim_tpu.utils import compile_cache

    cache_dir = compile_cache.enable()
    try:
        n_entries = len(os.listdir(cache_dir))
    except OSError:
        n_entries = 0
    log(f"compile cache: {cache_dir} ({n_entries} entries)")

    import jax.numpy as jnp

    from flowsim_tpu.models.gerd_roseires import model, settings
    from flowsim_tpu.ops import preissmann as prs

    device = jax.devices()[0]
    log(f"device: {device} ({device.platform})")

    # Host-side setup (station interpolation, GERD routing, ICs) is many tiny
    # eager ops; pin it to the local CPU backend — on the tunneled TPU each op
    # would be a network round trip.  Only the fused simulate runs on-device.
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        solver, channel = model.build()
        sset = solver.settings(tolerance=settings.tolerance, max_iter=100)
        import dataclasses

        if device.platform == "cpu":
            # at N=121 the sequential block-Thomas scan beats log-depth PCR
            # ~3x on CPU
            sset = dataclasses.replace(sset, linear_solver="thomas")
        else:
            # inexact-Newton f32 inner solve: identical iteration counts at
            # tol 1e-6 on the f64 residual, ~21% faster than emulated-f64 PCR
            sset = dataclasses.replace(sset, linear_solver="pcr_f32")
        geo = solver.channel.geometry
    args = jax.device_put(
        (geo, solver.us_params, solver.ds_params, solver.h0, solver.Q0), device
    )
    log(f"host build: {time.time()-t0:.1f}s  N={solver.number_of_nodes} nt={solver.number_of_time_levels}")

    def sync(x):
        # the tunneled runtime's block_until_ready can return before remote
        # execution finishes; a host transfer of a data-dependent scalar is
        # the reliable completion barrier.
        return float(jnp.sum(x))

    if device.platform != "cpu":
        # Pay the tunnel's per-session first-contact floor on a TRIVIAL
        # executable and report it separately: it reached 100-680 s on some
        # days (BENCH_r03's "678 s fused compile" was almost entirely this
        # floor — the kernel's own warm-session compile is ~17 s, measured
        # round 4, BASELINE.md "compile-time decomposition").
        t0 = time.time()
        sync(jnp.ones(8))
        log(f"tunnel session floor (trivial executable): {time.time()-t0:.1f}s")

    # --- fused whole-simulation Pallas kernel (TPU fast path) -------------
    # One dispatch for the entire run; df32 residual arithmetic in VMEM
    # (ops/pallas/fused_newton.py).  Validated against the CPU f64 fields
    # below; any failure (unsupported config, Mosaic regression) falls back
    # to the XLA scan-of-Newton path.
    fused_result = None
    out_cpu64 = None  # CPU f64 validation run, computed at most once
    if device.platform != "cpu":
        try:
            from flowsim_tpu.ops.pallas.fused_newton import fused_simulate

            t0 = time.time()
            outf = fused_simulate(geo, solver.us_params, solver.ds_params,
                                  solver.h0, solver.Q0, sset)
            sync(outf.depth)
            log(f"fused compile+first run: {time.time()-t0:.1f}s")
            bestf = np.inf
            h0np = np.asarray(solver.h0)
            # 6 reps: the tunneled chip's per-dispatch latency drifts 2-3x
            # between sessions (BASELINE.md) — more draws tighten the min
            for rep in range(6):
                h0p = jnp.asarray(h0np * (1.0 + 1e-12 * (rep + 1)))
                t0 = time.time()
                outf = fused_simulate(geo, solver.us_params, solver.ds_params,
                                      h0p, solver.Q0, sset)
                sync(outf.depth)
                bestf = min(bestf, time.time() - t0)
            with jax.default_device(cpu):
                out_cpu64 = prs.simulate(geo, solver.us_params, solver.ds_params,
                                         solver.h0, solver.Q0, sset)
            max_dd = float(np.abs(np.asarray(outf.depth)
                                  - np.asarray(out_cpu64.depth)).max())
            conv = bool(np.asarray(outf.converged).all())
            log(f"fused: {bestf:.3f}s  converged={conv}  "
                f"iters={int(np.asarray(outf.iterations).sum())}  "
                f"max|dh - CPU f64| = {max_dd:.2e} m")
            if conv and max_dd < 1e-3:
                fused_result = (bestf, outf)
            else:
                log("fused run failed validation — using the XLA path")
        except Exception as e:  # noqa: BLE001 — any failure means fallback
            log(f"fused path unavailable ({type(e).__name__}: {e}) — XLA path")

    t0 = time.time()
    out = prs.simulate(*args, sset)
    sync(out.depth)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    # perturb the initial state per repetition: the tunneled runtime caches
    # results for bit-identical (executable, inputs) pairs, which would make
    # repeat timings meaningless.
    geo_, us_, ds_, h0_, Q0_ = args
    best = np.inf
    for rep in range(3):
        h0p = h0_ * (1.0 + 1e-12 * (rep + 1))
        t0 = time.time()
        out = prs.simulate(geo_, us_, ds_, h0p, Q0_, sset)
        sync(out.depth)
        best = min(best, time.time() - t0)

    if fused_result is not None and fused_result[0] < best:
        best, out = fused_result
        log("fused kernel is the fastest validated path — reporting it")

    iters = int(np.asarray(out.iterations).sum())
    converged = bool(np.asarray(out.converged).all())
    n = solver.number_of_nodes
    levels = solver.number_of_time_levels - 1
    nnups = n * iters / best
    log(f"steady: {best:.3f}s  converged={converged}  newton_iters={iters}")
    log(f"node-level-updates/s: {n*levels/best:.1f}")

    platform_tag = jax.devices()[0].platform
    if not converged and platform_tag != "cpu":
        # The TPU f64 emulation can floor the residual slightly above the
        # 1e-6 tolerance at a few flood-peak levels.  Validate the fields
        # against a CPU f64 run; if they agree, the throughput number stands
        # (the stalled levels did *more* Newton work, so it is conservative).
        # Reuse the fused block's validation run if it already paid for one
        # (a full 384-level CPU Newton run costs minutes).
        if out_cpu64 is None:
            with jax.default_device(cpu):
                out_cpu64 = prs.simulate(geo, solver.us_params, solver.ds_params,
                                         solver.h0, solver.Q0, sset)
        max_dd = float(np.abs(np.asarray(out.depth)
                              - np.asarray(out_cpu64.depth)).max())
        floor = float(np.asarray(out.error)[~np.asarray(out.converged)].max())
        log(f"TPU residual floor {floor:.2e} > tol at some levels; "
            f"max |depth - CPU f64| = {max_dd:.2e} m")
        if max_dd > 1e-3:
            log("fields diverge from CPU f64 — rejecting the TPU run")
            sys.exit(3)  # outer dispatcher falls back to CPU

    baseline_path = os.path.join(os.path.dirname(__file__), "scripts", "reference_baseline.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # like-for-like: same metric definition on the measured reference run
        vs = nnups / base["newton_node_updates_per_s"]
        log(f"reference CPU: {base['newton_node_updates_per_s']:.1f} newton-node-updates/s "
            f"({base['wall_s']:.1f}s, {base['newton_iterations']} iters)")

    print(json.dumps({
        "metric": "newton-node-updates/s/chip (gerd_roseires, f64, tol=1e-6)",
        "value": round(nnups, 1),
        "unit": "node-updates/s",
        "vs_baseline": None if vs is None else round(vs, 2),
    }))


if __name__ == "__main__":
    main()
