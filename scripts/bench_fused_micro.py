"""Bisect the fused kernel's on-hardware per-iteration cost.

The full fused kernel measured 1.1 ms/Newton-iteration on v5e (16x slower
than the XLA path) despite correct numerics. This runs stripped kernels
with a FIXED total iteration count K inside one pallas_call:

  loop_only      fori(K) over a trivial df32 update      -> loop + df cost
  pcr_only       fori(K) over the 7-sweep in-VMEM PCR    -> + solve cost
  assemble_only  fori(K) over the full df32 stencil      -> + assembly cost
  newton_body    fori(K) over assemble + PCR             -> the real body

Usage: python scripts/bench_fused_micro.py [K]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import flowsim_tpu.ops.pallas.fused_newton as F
    from flowsim_tpu.ops.pallas import df32
    from flowsim_tpu.ops.pallas.df32 import DF, df
    from flowsim_tpu.models.gerd_roseires import model, settings as gsettings

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4800

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        solver, channel = model.build()
        sset = solver.settings(tolerance=gsettings.tolerance, max_iter=100)
        geo = solver.channel.geometry
    dev = jax.devices()[0]
    log(f"device: {dev.platform}; K={K}")
    t0 = time.time()
    assert float(jnp.sum(jnp.ones(8))) == 8.0
    log(f"probe ok in {time.time()-t0:.1f}s")

    n = geo.n_nodes
    nt = sset.n_time_levels
    Np = 128
    n_sweeps = max(1, (n - 1).bit_length())

    # reuse fused_simulate's host packing by calling its internals
    # (build geo rows/scal/init identically)
    import flowsim_tpu.ops.pallas.fused_newton as FN

    # pack via the public entry once in interpret mode? cheaper: replicate
    f32 = np.float32
    a = lambda x: np.asarray(x, np.float64)
    m_main, m_fp = a(geo.m_main), a(geo.m_fp)
    compound = np.asarray(geo.compound, bool)
    h_bank = np.where(compound, a(geo.h_bank), 1.0)
    T_bank = a(geo.b_main) + 2.0 * m_main * h_bank
    A_mf = (a(geo.b_main) + T_bank) / 2.0 * h_bank
    P_mf = a(geo.b_main) + 2.0 * h_bank * np.sqrt(1.0 + m_main**2)
    z = a(geo.z_bed)
    dz = np.zeros(n)
    dz[: n - 1] = z[1:] - z[:-1]
    rows = np.zeros((FN._NG, Np), f32)

    def put(r, v):
        rows[r, :n] = np.asarray(v, f32)

    put(FN._G_B_MAIN, geo.b_main); put(FN._G_M_MAIN, geo.m_main)
    put(FN._G_H_BANK, h_bank); put(FN._G_COMPOUND, compound.astype(f32))
    put(FN._G_B_FPL, geo.b_fp_left); put(FN._G_B_FPR, geo.b_fp_right)
    put(FN._G_M_FP, geo.m_fp); put(FN._G_N_MAIN, geo.n_main)
    put(FN._G_N_LEFT, geo.n_left); put(FN._G_N_RIGHT, geo.n_right)
    put(FN._G_CURV, geo.curvature); put(FN._G_DZ, dz)
    put(FN._G_SQM, np.sqrt(1 + m_main**2)); put(FN._G_SQFP, np.sqrt(1 + m_fp**2))
    put(FN._G_AMF, A_mf); put(FN._G_PMF, P_mf); put(FN._G_TBANK, T_bank)
    rows[FN._G_N_MAIN, n:] = 1.0
    rows[FN._G_N_LEFT, n:] = 1.0
    rows[FN._G_N_RIGHT, n:] = 1.0

    rcv = solver.ds_params.rating
    bed = float(np.asarray(solver.ds_params.bed_level, np.float64))
    scal = np.zeros((FN._NS,), f32)
    scal[FN._S_THETA] = sset.theta
    scal[FN._S_DT] = sset.time_step
    scal[FN._S_DX] = sset.spatial_step
    scal[FN._S_TOL] = sset.tolerance
    scal[FN._S_C2], scal[FN._S_C1], scal[FN._S_C0] = np.asarray(rcv.coeffs, np.float64)
    scal[FN._S_D2], scal[FN._S_D1], scal[FN._S_D0] = np.asarray(rcv.coeffs_high, np.float64)
    scal[FN._S_STAGEC] = bed - float(np.asarray(rcv.pivot_stage, np.float64))
    scal[FN._S_BUF] = float(np.asarray(rcv.buffer, np.float64))
    scal[FN._S_FD] = float(np.asarray(rcv.fd_step, np.float64))

    init = np.zeros((4, Np), f32)

    def split64(x):
        x = np.asarray(x, np.float64)
        hi = x.astype(np.float32)
        return hi, (x - hi.astype(np.float64)).astype(np.float32)

    init[0, :n], init[1, :n] = split64(solver.h0)
    init[2, :n], init[3, :n] = split64(solver.Q0)

    def make_kernel(mode):
        def kern(geo_ref, init_ref, scal_ref, out_ref):
            roll = FN._roll(False)
            g = [geo_ref[r:r + 1, :] for r in range(FN._NG)]
            sc = [scal_ref[i] for i in range(FN._NS)]
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
            node_mask = (idx < n).astype(jnp.float32)
            ini = init_ref[:]
            h = DF(ini[0:1, :], ini[1:2, :])
            Q = DF(ini[2:3, :], ini[3:4, :])
            with df32.fenced(sc[FN._S_ZERO]):
                prev_A, prev_Se, prev_Q2A = FN._level_state(g, h, Q)
                buf0, _, _ = FN._assemble_fused(
                    g, sc, roll, n, "blended_poly", h, Q, h, Q,
                    prev_A, prev_Se, prev_Q2A, np.float32(10000.0),
                    y_old=df(jnp.zeros((1, 1), jnp.float32)), k=np.int32(2))

                def body(i, c):
                    hh, hl, qh, ql = c
                    hc, Qc = DF(hh, hl), DF(qh, ql)
                    if mode == "loop_only":
                        h2 = hc + df(np.float32(1e-30))
                        return h2.hi, h2.lo, qh, ql
                    if mode == "pcr_only":
                        x0, x1 = FN._pcr_solve(
                            buf0 + 1e-30 * hh[0, 0], idx, n, n_sweeps, roll)
                        h2 = hc + df(x0 * node_mask * 1e-30)
                        return h2.hi, h2.lo, qh, ql
                    buf, err, _ = FN._assemble_fused(
                        g, sc, roll, n, "blended_poly", hc, Qc, h, Q,
                        prev_A, prev_Se, prev_Q2A, np.float32(10000.0),
                        y_old=df(jnp.zeros((1, 1), jnp.float32)), k=np.int32(2))
                    if mode == "assemble_only":
                        h2 = hc + df(buf[12:13, :] * 1e-30 * node_mask)
                        q2 = Qc + df(buf[13:14, :] * 1e-30 * node_mask
                                     + buf[4:5, :] * 1e-30)
                        return h2.hi, h2.lo, q2.hi, q2.lo
                    x0, x1 = FN._pcr_solve(buf, idx, n, n_sweeps, roll)
                    h2 = hc + df(x0 * node_mask * 1e-30)
                    q2 = Qc + df(x1 * node_mask * 1e-30)
                    return h2.hi, h2.lo, q2.hi, q2.lo

                if mode == "while_counter":
                    # lax.while_loop with a pure-counter cond (no vector ->
                    # scalar dependency): isolates while-lowering cost
                    def wcond(c):
                        return c[4] < K

                    def wbody(c):
                        hh, hl, qh, ql, it = c
                        hc, Qc = DF(hh, hl), DF(qh, ql)
                        buf, err, _ = FN._assemble_fused(
                            g, sc, roll, n, "blended_poly", hc, Qc, h, Q,
                            prev_A, prev_Se, prev_Q2A, np.float32(10000.0),
                            y_old=df(jnp.zeros((1, 1), jnp.float32)),
                            k=np.int32(2))
                        x0, x1 = FN._pcr_solve(buf, idx, n, n_sweeps, roll)
                        h2 = hc + df(x0 * node_mask * 1e-30)
                        q2 = Qc + df(x1 * node_mask * 1e-30)
                        return h2.hi, h2.lo, q2.hi, q2.lo, c[4] + 1

                    hh, hl, qh, ql, _ = jax.lax.while_loop(
                        wcond, wbody,
                        (h.hi, h.lo, Q.hi, Q.lo, np.int32(0)))
                elif mode == "while_err":
                    # the real structure: cond reads a scalar err reduced
                    # from vectors each iteration
                    def wcond(c):
                        return (c[4] >= np.float32(1e-30)) & (c[5] < K)

                    def wbody(c):
                        hh, hl, qh, ql, _, it = c
                        hc, Qc = DF(hh, hl), DF(qh, ql)
                        buf, err, _ = FN._assemble_fused(
                            g, sc, roll, n, "blended_poly", hc, Qc, h, Q,
                            prev_A, prev_Se, prev_Q2A, np.float32(10000.0),
                            y_old=df(jnp.zeros((1, 1), jnp.float32)),
                            k=np.int32(2))
                        x0, x1 = FN._pcr_solve(buf, idx, n, n_sweeps, roll)
                        h2 = hc + df(x0 * node_mask * 1e-30)
                        q2 = Qc + df(x1 * node_mask * 1e-30)
                        return h2.hi, h2.lo, q2.hi, q2.lo, err, it + 1

                    hh, hl, qh, ql, _, _ = jax.lax.while_loop(
                        wcond, wbody,
                        (h.hi, h.lo, Q.hi, Q.lo, np.float32(np.inf),
                         np.int32(0)))
                elif mode in ("nested", "nested_store"):
                    # fori over levels x while over inner iterations — the
                    # real kernel's loop structure (384 x ~12 = 4608 iters)
                    inner = max(1, K // 384)

                    def wcond(c):
                        return c[4] < inner

                    def wbody(c):
                        hh, hl, qh, ql, it = c
                        hc, Qc = DF(hh, hl), DF(qh, ql)
                        buf, err, rs = FN._assemble_fused(
                            g, sc, roll, n, "blended_poly", hc, Qc, h, Q,
                            prev_A, prev_Se, prev_Q2A, np.float32(10000.0),
                            y_old=df(jnp.zeros((1, 1), jnp.float32)),
                            k=np.int32(2))
                        x0, x1 = FN._pcr_solve(buf, idx, n, n_sweeps, roll)
                        h2 = hc + df(x0 * node_mask * 1e-30)
                        q2 = Qc + df(x1 * node_mask * 1e-30)
                        return h2.hi, h2.lo, q2.hi, q2.lo, it + 1

                    def lbody(kk, c):
                        hh, hl, qh, ql = c
                        hh, hl, qh, ql, _ = jax.lax.while_loop(
                            wcond, wbody, (hh, hl, qh, ql, np.int32(0)))
                        if mode == "nested_store":
                            out_ref[pl.ds(kk, 1), :] = hh + hl
                        return hh, hl, qh, ql

                    hh, hl, qh, ql = jax.lax.fori_loop(
                        0, 384, lbody, (h.hi, h.lo, Q.hi, Q.lo))
                else:
                    hh, hl, qh, ql = jax.lax.fori_loop(
                        0, K, body, (h.hi, h.lo, Q.hi, Q.lo))
            out_ref[0:1, :] = hh + hl
            out_ref[1:2, :] = qh + ql

        return kern

    def run(mode):
        kern = make_kernel(mode)
        out_rows = 385 if mode == "nested_store" else 2
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((out_rows, Np), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        grows = jnp.asarray(rows)
        ginit = jnp.asarray(init)
        gscal = jnp.asarray(scal)
        t0 = time.time()
        r = call(grows, ginit, gscal)
        float(jnp.sum(r))
        compile_s = time.time() - t0
        best = np.inf
        for rep in range(3):
            ginit2 = jnp.asarray(init * (1.0 + 1e-7 * (rep + 1)))
            t0 = time.time()
            r = call(grows, ginit2, gscal)
            float(jnp.sum(r))
            best = min(best, time.time() - t0)
        return compile_s, best

    results = {}
    for mode in ["newton_body", "while_err", "nested", "nested_store"]:
        try:
            comp, best = run(mode)
            results[mode] = dict(compile_s=comp, wall_s=best,
                                 per_iter_us=best / K * 1e6)
            log(f"{mode}: compile {comp:.1f}s, {best:.3f}s, "
                f"{best/K*1e6:.2f} us/iter")
        except Exception as e:  # noqa: BLE001
            results[mode] = dict(error=str(e)[:300])
            log(f"{mode} failed: {type(e).__name__}: {str(e)[:300]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
