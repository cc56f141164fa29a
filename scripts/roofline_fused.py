"""Ops-budget / MFU accounting for the two Pallas kernels (VERDICT r3 #4).

Counts the f32 VPU work of ONE fused-kernel Newton iteration (assembly +
block-PCR solve) and of one tiled-SPIKE PCR sweep by walking the traced
jaxpr: every primitive contributes its output element count as f32
lane-ops (an elementwise vreg op does one ALU op per lane; transcendental
and divide ops are weighted by their typical VPU expansion).  Dividing by
the measured on-chip wall gives sustained lane-ops/s, stated against the
v5e VPU peak in BASELINE.md.

Run on CPU (the count is platform-independent):
    python scripts/roofline_fused.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# expansion factors: VPU has no divide/rsqrt/exp/log single-cycle ops; XLA
# expands them to ~Newton-iteration polynomials (public Mosaic lowering:
# ~10-20 ops).  Conservative weights keep the count honest.
WEIGHTS = {
    "div": 10.0,
    "sqrt": 10.0,
    "rsqrt": 10.0,
    "exp": 10.0,
    "log": 10.0,
    "sign": 2.0,
    "integer_pow": 2.0,
}
SKIP = {"broadcast_in_dim", "reshape", "convert_element_type", "squeeze",
        "slice", "concatenate", "transpose", "iota", "constant",
        "dynamic_slice", "dynamic_update_slice", "select_n", "pad",
        "gather", "rev", "copy", "stop_gradient", "custom_jvp_call",
        "pjit", "closed_call"}


def _count_jaxpr(jaxpr, mul=1.0):
    """Total weighted f32 lane-ops + vector-op (vreg-row) count."""
    import jax

    lane_ops = 0.0
    vops = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("pjit", "closed_call", "custom_jvp_call"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                lo, vo = _count_jaxpr(getattr(inner, "jaxpr", inner), mul)
                lane_ops += lo
                vops += vo
            continue
        if prim in ("while", "scan", "cond"):
            # count one trip of every branch/body (callers scale by trips)
            for key in ("body_jaxpr", "cond_jaxpr", "jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    lo, vo = _count_jaxpr(getattr(inner, "jaxpr", inner),
                                          mul)
                    lane_ops += lo
                    vops += vo
            for br in eqn.params.get("branches", ()) or ():
                lo, vo = _count_jaxpr(br.jaxpr, mul)
                lane_ops += lo
                vops += vo
            continue
        if prim in SKIP:
            continue
        w = WEIGHTS.get(prim, 1.0)
        for out in eqn.outvars:
            sh = getattr(out.aval, "shape", ())
            n = int(np.prod(sh)) if sh else 1
            lane_ops += w * n * mul
            # vreg rows: ceil(sublanes/8) * ceil(lanes/128) for 2-D shapes
            if len(sh) == 2:
                vops += (-(-sh[0] // 8)) * (-(-sh[1] // 128)) * w * mul
            else:
                vops += w * mul
    return lane_ops, vops


def fused_iteration_count():
    """One single-run fused-kernel Newton iteration at the flagship size."""
    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops.pallas import df32, pcr_common
    from flowsim_tpu.ops.pallas import fused_newton as fn
    from flowsim_tpu.ops.pallas.df32 import DF, df

    n, Np = 121, 128
    n_sweeps = 7
    roll = lambda x, s: jnp.roll(x, s, axis=1)
    rng = np.random.default_rng(0)
    g = [jnp.asarray(rng.random((1, Np)), jnp.float32) + 0.5
         for _ in range(fn._NG)]
    scal = [jnp.float32(v) for v in rng.random(fn._NS) + 0.5]
    mk = lambda: DF(jnp.asarray(rng.random((1, Np)), jnp.float32) + 1.0,
                    jnp.asarray(rng.random((1, Np)) * 1e-7, jnp.float32))

    def one_iter(h_hi, h_lo, q_hi, q_lo):
        h, Q = DF(h_hi, h_lo), DF(q_hi, q_lo)
        with df32.fenced(jnp.float32(0.0)):
            prev_A, prev_Se, prev_Q2A = fn._level_state(g, h, Q)
            buf, err, _ = fn._assemble_fused(
                g, scal, roll, n, "blended_poly", h, Q, h, Q,
                prev_A, prev_Se, prev_Q2A, jnp.float32(1.0),
                us_kind="flow_hydrograph", y_old=mk(), k=jnp.asarray(2),
                gate_open=jnp.ones((1, 1), jnp.float32),
                ds_tgt=jnp.float32(1.0))
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
            x0, x1 = fn._pcr_solve(buf, idx, n, n_sweeps, roll)
        return x0, x1, err

    h, Q = mk(), mk()
    jaxpr = jax.make_jaxpr(one_iter)(h.hi, h.lo, Q.hi, Q.lo)
    return _count_jaxpr(jaxpr.jaxpr)


def spike_sweep_count(tile=4096):
    """One PCR sweep of the tiled SPIKE kernel's in-tile reduction."""
    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops.pallas import pcr_common

    roll = lambda x, s: jnp.roll(x, s, axis=1)
    rng = np.random.default_rng(0)
    rows = 16
    buf0 = jnp.asarray(rng.random((rows, tile)), jnp.float32) + 0.5
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)

    def sweeps(buf):
        return pcr_common.pcr_reduce(buf, idx, tile, 1, roll, rhs_pairs=1,
                                     block=1)

    jaxpr = jax.make_jaxpr(sweeps)(buf0)
    return _count_jaxpr(jaxpr.jaxpr)


def network_iteration_count(B=8, n=60, m_rhs=2):
    """One fused-NETWORK Newton iteration on the GERD-tributary shape:
    3 real branches on 8 sublanes (Nmax ~ 60 -> Np=128), equal-stage
    junction rows, and the multi-RHS block-PCR (Newton RHS + one -1
    coupling column per junction coupling).  The J x J Schur solve is a
    few hundred scalar-column ops at J <= 15 and is left out (<1%)."""
    import jax
    import jax.numpy as jnp

    from flowsim_tpu.ops.pallas import df32, pcr_common
    from flowsim_tpu.ops.pallas import fused_newton as fn
    from flowsim_tpu.ops.pallas.df32 import DF

    Np = 128
    n_sweeps = max(1, (n - 1).bit_length())
    roll = lambda x, s: jnp.roll(x, s, axis=1)
    rng = np.random.default_rng(0)
    g = [jnp.asarray(rng.random((B, Np)), jnp.float32) + 0.5
         for _ in range(fn._NG)]
    scal = [jnp.float32(v) for v in rng.random(fn._NS) + 0.5]
    mk = lambda shape=(B, Np): DF(
        jnp.asarray(rng.random(shape), jnp.float32) + 1.0,
        jnp.asarray(rng.random(shape) * 1e-7, jnp.float32))
    col = lambda: jnp.asarray(rng.random((B, 1)), jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    cell_real = (idx < n - 1).astype(jnp.float32) * jnp.ones((B, 1),
                                                             jnp.float32)

    def one_iter(h_hi, h_lo, q_hi, q_lo):
        h, Q = DF(h_hi, h_lo), DF(q_hi, q_lo)
        with df32.fenced(jnp.float32(0.0)):
            prev_A, prev_Se, prev_Q2A = fn._level_state(g, h, Q)
            junc = dict(us_mask=col(), ds_mask=col(),
                        Y_us=mk((B, 1)), Y_ds=mk((B, 1)),
                        z_us=col(), z_ds=col(),
                        cell_real=cell_real,
                        pad_cell=(idx < n - 1).astype(jnp.float32)
                        * jnp.zeros((B, 1), jnp.float32),
                        us_kind_masks=None, ds_kind_masks=None)
            buf, err, _ = fn._assemble_fused(
                g, scal, roll, n, "fixed_h", h, Q, h, Q,
                prev_A, prev_Se, prev_Q2A, col(),
                us_kind="flow_hydrograph", y_old=mk((B, 1)),
                k=jnp.asarray(2), gate_open=jnp.ones((B, 1), jnp.float32),
                ds_tgt=col(), junc=junc)
            extra = [-(idx == 0).astype(jnp.float32) * col()
                     for _ in range(2 * (m_rhs - 1))]
            buf = jnp.concatenate([buf[:14 * B]] + extra, axis=0)
            red = pcr_common.pcr_reduce(buf, idx, n, n_sweeps, roll,
                                        rhs_pairs=m_rhs, block=B)
            X = pcr_common.pcr_backsolve(red, rhs_pairs=m_rhs, block=B)
        return X, err

    h, Q = mk(), mk()
    jaxpr = jax.make_jaxpr(one_iter)(h.hi, h.lo, Q.hi, Q.lo)
    return _count_jaxpr(jaxpr.jaxpr)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    lane_ops, vops = fused_iteration_count()
    print(f"fused kernel, one Newton iteration (N=121, Np=128):")
    print(f"  weighted f32 lane-ops: {lane_ops:,.0f}")
    print(f"  vreg-row ops:          {vops:,.0f}")
    sl, sv = spike_sweep_count()
    print(f"tiled SPIKE, one PCR sweep over a 4096-lane tile (16 rows):")
    print(f"  weighted f32 lane-ops: {sl:,.0f}")
    print(f"  vreg-row ops:          {sv:,.0f}")

    # v5e VPU peak model (scaling-book VPU shape): 4 ALUs x (8x128) lanes
    # per cycle at ~1.5 GHz (the clock that reproduces the public 197
    # bf16-TFLOP MXU spec: 4 MXUs x 128x128 x 2 flops x 1.5e9)
    clock = 1.5e9
    peak_lane = 4 * 1024 * clock
    peak_vreg = 4 * clock
    print(f"\nv5e VPU peak model: {peak_lane:.2e} lane-ops/s "
          f"({peak_vreg:.2e} vreg-ops/s)")
    cases = [
        # (name, lane-ops, vreg-ops, measured wall)
        ("fused single-run / Newton iteration (BASELINE r2 micro: 8.5 us)",
         lane_ops, vops, 8.5e-6),
        # batched B=152: every row op grows to ceil(152/8)=19 vregs; the
        # measured 0.291 s full-flagship wall over ~5,000 synchronized
        # executed iterations -> ~58 us/iteration
        ("fused batched B=152 / iteration (0.291 s / ~5,000 iters)",
         lane_ops * 19, vops * 19, 58e-6),
        # tiled SPIKE at N=1e6: 12 sweeps x 245 tiles, ~9 ms pure solve
        ("tiled SPIKE solve N=1e6 (12 sweeps x 245 tiles, ~9 ms)",
         sl * 12 * 245, sv * 12 * 245, 9e-3),
    ]
    nl, nv = network_iteration_count()
    print(f"\nfused NETWORK kernel, one Newton iteration "
          f"(3-branch tributary, B=8 sublanes, m_rhs=2):")
    print(f"  weighted f32 lane-ops: {nl:,.0f}")
    print(f"  vreg-row ops:          {nv:,.0f}")
    cases += [
        # tributary flagship: 0.100 s end-to-end over 4,339 iterations
        # (BASELINE r3), minus the ~30 ms dispatch floor -> 16.1 us/iter
        ("fused NETWORK / iteration (0.100 s - floor over 4,339 iters)",
         nl, nv, 16.1e-6),
        # batched network M=8 on the tributary: 14 sims/s (BENCH r4
        # crossover table) -> 0.571 s/dispatch - floor over ~4,339
        # synchronized iterations; rows grow to ceil(3*8 x pad /8) = 3x
        # the single network kernel's vregs (24 vs 8 sublanes)
        ("fused batched NETWORK M=8 / iteration (0.541 s / 4,339 iters)",
         nl * 3, nv * 3, 125e-6),
    ]
    for name, lo, vo, wall in cases:
        sus_l = lo / wall
        sus_v = vo / wall
        print(f"{name}:\n  {sus_l:.2e} lane-ops/s = "
              f"{100 * sus_l / peak_lane:.2f}% of lane peak; "
              f"{sus_v:.2e} vreg-ops/s = "
              f"{100 * sus_v / peak_vreg:.1f}% of issue peak")


if __name__ == "__main__":
    main()
