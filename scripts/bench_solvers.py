"""On-host-style TPU measurement of the block-tridiagonal solvers.

The axon tunnel adds a ~30 ms dispatch floor per call, so single-solve
timings are meaningless; here K independent solves (perturbed RHS so the
remote result cache and CSE can't collapse them) run inside ONE jitted scan
and the wall clock is divided by K — an amortized, on-host-style number.
A host transfer of the checksum is the completion barrier (block_until_ready
can return early over the tunnel; CLAUDE.md).

Usage: python scripts/bench_solvers.py [validate|bench|all]
Writes JSON lines to stdout; progress to stderr.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_system(N, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    L = (rng.normal(size=(N, 2, 2)) * 0.3).astype(np.float32)
    L[0] = 0.0
    D = (rng.normal(size=(N, 2, 2)) + 4 * np.eye(2)).astype(np.float32)
    U = (rng.normal(size=(N, 2, 2)) * 0.3).astype(np.float32)
    U[-1] = 0.0
    b = rng.normal(size=(N, 2)).astype(np.float32)
    return tuple(map(jnp.asarray, (L, D, U, b)))


def solver_fn(method, tile=None):
    from flowsim_tpu.ops import tridiag

    if method == "pallas_tiled":
        from flowsim_tpu.ops.pallas.tiled_pcr import tiled_spike_pallas

        return functools.partial(tiled_spike_pallas, tile=tile or 2048)
    if method == "pallas_pcr":
        from flowsim_tpu.ops.pallas.pcr_kernel import pcr_pallas

        return pcr_pallas
    return functools.partial(tridiag.solve_block_tridiag, method=method)


def amortized_time(fn, L, D, U, b, K):
    """Wall time per solve over K perturbed solves inside one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(L, D, U, b):
        def body(acc, i):
            bb = b * (1.0 + 1e-6 * i.astype(b.dtype))
            x = fn(L, D, U, bb)
            return acc + jnp.sum(x), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), b.dtype),
                              jnp.arange(1, K + 1))
        return acc

    t0 = time.time()
    float(many(L, D, U, b))  # compile + first run
    compile_s = time.time() - t0
    best = np.inf
    for rep in range(3):
        bb = b * (1.0 + 1e-5 * (rep + 1))  # new inputs: dodge result cache
        t0 = time.time()
        float(many(L, D, U, bb))
        best = min(best, time.time() - t0)
    return best / K, compile_s


def validate(device):
    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops import tridiag
    from flowsim_tpu.ops.pallas.tiled_pcr import tiled_spike_pallas

    out = {}
    for N in [10_000, 100_000]:
        sys_ = jax.device_put(make_system(N), device)
        x_ref = tridiag.block_pcr(*sys_)
        x = tiled_spike_pallas(*sys_)
        rel = float(jnp.max(jnp.abs(x - x_ref)) / jnp.max(jnp.abs(x_ref)))
        out[N] = rel
        log(f"validate N={N}: tiled vs XLA PCR max rel diff {rel:.3e}")
    return out


def bench(device):
    import jax

    results = []
    cases = [
        (100_000, [("pcr", None), ("pallas_tiled", 1024),
                   ("pallas_tiled", 2048), ("pallas_tiled", 4096)], 20),
        (1_000_000, [("pcr", None), ("pallas_tiled", 2048),
                     ("pallas_tiled", 4096), ("pallas_tiled", 8192)], 5),
    ]
    for N, methods, K in cases:
        sys_ = jax.device_put(make_system(N), device)
        for method, tile in methods:
            fn = solver_fn(method, tile)
            try:
                per_solve, compile_s = amortized_time(fn, *sys_, K)
            except Exception as e:  # noqa: BLE001
                log(f"N={N} {method} tile={tile}: FAILED {type(e).__name__}: {e}")
                continue
            rec = dict(N=N, method=method, tile=tile, per_solve_s=per_solve,
                       solves_per_s=1.0 / per_solve, compile_s=compile_s, K=K)
            results.append(rec)
            log(f"N={N} {method} tile={tile}: {per_solve*1e3:.3f} ms/solve "
                f"(compile {compile_s:.1f}s)")
    return results


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev}")
    # tunnel probe (CLAUDE.md): cheap op with the same client before real work
    import jax.numpy as jnp

    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"probe ok in {time.time()-t0:.1f}s")

    payload = {"platform": dev.platform}
    if what in ("validate", "all"):
        payload["validate"] = validate(dev)
    if what in ("bench", "all"):
        payload["bench"] = bench(dev)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
