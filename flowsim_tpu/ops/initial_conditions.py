"""Initial-condition generators: steady-state, linear, GVF backwater.

Replicates the three generators of the reference ``Channel``
(ref: src/hydromodel/channel.py:296-390) as jittable device code:

* steady-state — per-node normal depth.  The reference brackets
  ``Q - normal_flow(h)`` with brentq on [z_min, z_min+100]
  (ref cross_section.py:184-202); here a vectorized 100-step bisection over
  all nodes at once, with the same out-of-bracket fallbacks.
* linear — linear depth profile between the boundary depths (ref :380-390).
* GVF — downstream->upstream predictor-corrector on dh/dx = (S0-Se)/(1-Fr²)
  as a ``lax.scan`` (sequential by nature; runs once), with the reference's
  exact clamps: denominator floor 0.01, depth floor 0.01, supercritical and
  dry-section guards (ref :307-378).  Supercritical states set a flag that
  the host wrapper turns into the reference's RuntimeError.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flowsim_tpu.ops import hydraulics as hyd
from flowsim_tpu.ops import sections as sec


def steady_normal_depth(geo, Q, hw_span: float = 100.0, iters: int = 100):
    """Normal depth per node for discharge Q (vectorized bisection).

    Matches brentq-root behavior on the bracket [z_min, z_min + hw_span] and
    the reference's fallbacks: Q <= 0 -> depth 0; Q above capacity -> span.
    """
    Q = jnp.asarray(Q)
    zeros = jnp.zeros_like(geo.z_bed)

    def f(depth):
        return Q - sec.normal_flow(geo, depth)

    lo = zeros
    hi = zeros + hw_span
    f_lo = f(lo)
    f_hi = f(hi)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        same = jnp.sign(f_mid) == jnp.sign(f_lo)
        return (jnp.where(same, mid, lo), jnp.where(same, hi, mid), jnp.where(same, f_mid, f_lo))

    lo, hi, _ = jax.lax.fori_loop(0, iters, body, (lo, hi, f_lo))
    depth = 0.5 * (lo + hi)
    # brentq-failure fallbacks (ref cross_section.py:196-202)
    depth = jnp.where(f_lo < 0, 0.0, depth)          # Q below zero-depth flow
    depth = jnp.where(f_hi > 0, hw_span, depth)      # Q above capacity
    return depth


def linear_profile(n_nodes: int, h_us, h_ds, dtype=None):
    """Linear depth interpolation (ref channel.py:380-390)."""
    w = jnp.linspace(0.0, 1.0, n_nodes, dtype=dtype)
    return h_us + (h_ds - h_us) * w


class GVFResult(NamedTuple):
    depth: jnp.ndarray
    supercritical: jnp.ndarray  # bool: any node tripped the Fr > 1 guard


def gvf_profile(geo, Q, h_downstream, dx) -> GVFResult:
    """GVF backwater march (ref channel.py:307-378).

    Returns depths at all nodes and a supercritical flag (the reference
    raises RuntimeError; in-graph we flag and let the host raise).
    """
    N = geo.n_nodes
    Q = jnp.asarray(Q)

    def node_geo(i):
        return jax.tree_util.tree_map(lambda a: a[i], geo)

    def dh_dx_at(h_in, idx, S0):
        """ref channel.py:316-347; S0 is passed in because the reference
        evaluates it at the *enclosing loop's* node pair for both the
        predictor and the corrector."""
        gi = node_geo(idx)
        st = sec.section_state(gi, h_in)
        dry = (st.T < 1e-6) | (st.A < 1e-6)
        Fr = hyd.froude(st.T, st.A, Q)
        supercrit = (Fr > 1.0) & ~dry
        denom = jnp.maximum(1.0 - Fr * Fr, 0.01)
        Se = sec.energy_slope(gi, h_in, Q, st).Se
        val = (S0 - Se) / denom
        return jnp.where(dry, 0.0, val), supercrit

    z = geo.z_bed

    def scan_body(carry, i):
        h_down, flag = carry
        S0 = (z[i] - z[i + 1]) / dx
        dh_down, sc1 = dh_dx_at(h_down, i + 1, S0)
        h_pred = h_down - dh_down * dx
        # ref channel.py:360-361/371-374 clamps only at h <= 0 (a positive
        # near-dry depth like 0.004 is kept, not floored to 0.01)
        h_pred = jnp.where(h_pred <= 0.0, 0.01, h_pred)
        dh_pred, sc2 = dh_dx_at(h_pred, i, S0)
        h_up = h_down - 0.5 * (dh_down + dh_pred) * dx
        h_up = jnp.where(h_up <= 0.0, 0.01, h_up)
        return (h_up, flag | sc1 | sc2), h_up

    idxs = jnp.arange(N - 2, -1, -1)
    (h_final, flag), hs = jax.lax.scan(scan_body, (jnp.asarray(h_downstream, dtype=z.dtype), False), idxs)
    depth = jnp.concatenate([hs[::-1], jnp.asarray([h_downstream], dtype=z.dtype)])
    return GVFResult(depth=depth, supercritical=flag)


# module-level jit: a fresh jax.jit(gvf_profile) per call would miss the
# dispatch cache and re-trace the GVF scan for every model build
_gvf_jit = jax.jit(gvf_profile)


def initial_conditions(geo, method: str, Q, dx, h_us=None, h_ds=None):
    """Dispatch matching ``Channel.initialize_conditions`` (ref :107-138).

    Returns (h[N], Q[N]); raises on supercritical GVF like the reference.
    """
    N = geo.n_nodes
    if method == "steady-state":
        h = steady_normal_depth(geo, Q)
    elif method == "linear":
        if h_us is None or h_ds is None:
            raise ValueError("linear ICs need both boundary depths")
        h = linear_profile(N, h_us, h_ds, dtype=geo.z_bed.dtype)
    elif method == "GVF_equation":
        if h_ds is None:
            raise ValueError("GVF ICs need the downstream depth")
        res = _gvf_jit(geo, Q, h_ds, dx)
        if bool(res.supercritical):
            raise RuntimeError(
                "GVF Error: Flow became supercritical. "
                "Downstream boundary control is not valid for this Q."
            )  # ref channel.py:329-333
        h = res.depth
    else:
        raise ValueError("Invalid interpolation method.")  # ref channel.py:41-44
    return h, jnp.full((N,), Q, dtype=geo.z_bed.dtype)
