"""Lax-Friedrichs explicit solver.

The reference's ``LaxSolver`` (ref: src/hydromodel/lax.py) is documented in
SURVEY.md §2.12 as bit-rotted (it references attributes/methods that no longer
exist and would crash on construction).  This module implements the *scheme
it specifies* — state (A, Q), cell-average + flux-divergence update
(ref :204-232), ghost-node secondary BCs 'constant' | 'mirror' | 'linear'
(ref :82-106, with the ds ghost reading secondary_BC[1], fixing the index bug
at ref :96), primary BCs through the shared boundary residuals (ref :108-202),
and the per-step CFL guard (ref :234-247) — as one vectorized update per time
level under ``lax.scan``.

Because the state is (A, Q) while the geometry closures are functions of
depth, the update needs the inverse map depth(A); for trapezoid geometry this
is closed-form per regime (see :func:`depth_from_area`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from flowsim_tpu.config import GRAVITY as g
from flowsim_tpu.ops import boundary as bnd
from flowsim_tpu.ops import rating_curve as rcurve
from flowsim_tpu.ops import sections as sec
from flowsim_tpu.ops import storage as storage_mod
from flowsim_tpu.ops import hydraulics as hyd


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LaxSettings:
    time_step: float = field(metadata=dict(static=True))
    spatial_step: float = field(metadata=dict(static=True))
    n_time_levels: int = field(metadata=dict(static=True))
    secondary_bc_us: str = field(default="constant", metadata=dict(static=True))
    secondary_bc_ds: str = field(default="constant", metadata=dict(static=True))
    # gated_blend downstream curve: initial gate flag (ops/boundary.py BCState)
    gate_initially_open: bool = field(default=False, metadata=dict(static=True))


class LaxOutput(NamedTuple):
    depth: jnp.ndarray
    flow: jnp.ndarray
    cfl_violated: jnp.ndarray    # [nt] bool
    reservoir_stage: jnp.ndarray
    reservoir_stage_us: Optional[jnp.ndarray] = None  # [nt] upstream storage stage
    gate_open: Optional[jnp.ndarray] = None  # [nt] gate flag (gated_blend ds curve)


def depth_from_area(geo, A):
    """Invert the area closure A(h) per node.

    Table geometry: monotone-table inverse interpolation per node."""
    from flowsim_tpu.geometry import TableGeometry

    if isinstance(geo, TableGeometry):
        return jax.vmap(lambda arow, dmax, a: jnp.interp(
            a, arow, jnp.linspace(0.0, 1.0, arow.shape[-1]) * dmax))(geo.area, geo.depth_max, A)
    return _trapezoid_depth_from_area(geo, A)


def _trapezoid_depth_from_area(geo, A):
    """Invert the trapezoid area closure A(h) per node (closed form).

    Main-channel regime: A = (b + m h) h.  Overbank regime (replicating the
    reference area bookkeeping where the main channel stops contributing at
    bankfull, ref cross_section.py:655-674):
    A = A_bank + (b_fp_l + b_fp_r) d + m_fp d^2 with d = h - h_bank.
    """
    b, m = geo.b_main, geo.m_main
    # main regime inverse
    h_main = jnp.where(
        m > 0.0,
        (-b + jnp.sqrt(b * b + 4.0 * m * A)) / (2.0 * jnp.maximum(m, 1e-30)),
        A / b,
    )
    hb = jnp.where(geo.compound, geo.h_bank, 0.0)
    A_bank = (b + m * hb) * hb
    over = geo.compound & (A > A_bank)
    bf = geo.b_fp_left + geo.b_fp_right
    mf = geo.m_fp
    dA = jnp.maximum(A - A_bank, 0.0)
    d_fp = jnp.where(
        mf > 0.0,
        (-bf + jnp.sqrt(bf * bf + 4.0 * mf * dA)) / (2.0 * jnp.maximum(mf, 1e-30)),
        dA / jnp.maximum(bf, 1e-30),
    )
    return jnp.where(over, hb + d_fp, h_main)


def _ghost(values, mode: str, upstream: bool):
    """Ghost-node value per secondary BC (ref lax.py:82-106)."""
    x0 = values[0] if upstream else values[-1]
    x1 = values[1] if upstream else values[-2]
    if mode == "constant":
        return x0
    if mode == "mirror":
        return x1
    if mode == "linear":
        return 2.0 * x0 - x1
    raise ValueError(f"invalid secondary BC {mode!r}")


def _bc_value(bc: bnd.BoundaryParams, geo, st_node: bnd.NodeSection, depth_scheme, Q_scheme,
              k, dt, Q_prev_node, reservoir_stage_prev, bed_slope,
              upstream: bool = False, h_prev_node=None, gate_open=None):
    """Primary BC at a boundary node (ref lax.py:108-202).

    Q-type BCs take Q = target evaluated at the scheme-predicted depth and
    keep the scheme A; h-type BCs take depth = target and keep the scheme Q.
    Returns (depth, Q, reservoir_stage).  ``upstream`` flips the storage
    orientation (positive Q drains an upstream reservoir; entrance loss
    drops the channel surface below the stage) — same convention as
    ops.boundary.evaluate.
    """
    nan = jnp.asarray(jnp.nan, dtype=depth_scheme.dtype)
    if bc.kind == "flow_hydrograph":
        return depth_scheme, bc.target_series[k], nan
    if bc.kind == "normal_depth":
        return depth_scheme, hyd.normal_flow(bc.bed_slope, st_node.K), nan
    if bc.kind == "rating_curve":
        if bc.rating.kind == "gated_blend":
            # non-smooth gated curve: the scan carries the explicit
            # controller state (same semantics as the Preissmann path —
            # one gate decision per time level, ref roseires:111-141)
            q = rcurve.gated_discharge(bc.rating, bc.bed_level + depth_scheme, gate_open)
            return depth_scheme, q, nan
        return depth_scheme, rcurve.discharge(bc.rating, bc.bed_level + depth_scheme), nan
    if bc.kind == "stage_hydrograph":
        return bc.target_series[k] - bc.bed_level, Q_scheme, nan
    if bc.kind == "fixed_depth":
        if bc.storage is None:
            return bc.initial_depth * jnp.ones_like(depth_scheme), Q_scheme, nan
        sp = bc.storage
        sign = -1.0 if upstream else 1.0
        vol_in = sign * 0.5 * (Q_prev_node + Q_scheme) * dt
        # upstream anchors the first-level stage on the PREVIOUS level's
        # surface (see ops.boundary.evaluate); downstream keeps the
        # reference's trial-stage bootstrap
        boot = (h_prev_node if upstream and h_prev_node is not None
                else depth_scheme)
        Y_old = jnp.where(k == 1, boot + bc.bed_level, reservoir_stage_prev)
        Y_new = storage_mod.mass_balance(sp, dt, vol_in, Y_old)
        head_loss = storage_mod.energy_loss(sp, st_node.A, Q_scheme, st_node.n_eq, st_node.R)
        return (Y_new + sign * head_loss) - bc.bed_level, Q_scheme, Y_new
    raise ValueError(bc.kind)


@partial(jax.jit, static_argnames=("settings",))
def simulate(geo, us_bc, ds_bc, h0, Q0, settings: LaxSettings) -> LaxOutput:
    dt = settings.time_step
    dx = settings.spatial_step
    nt = settings.n_time_levels
    num_celerity = dx / dt

    st0 = sec.section_state(geo, h0)
    A0 = st0.A

    def step(carry, k):
        A, Q, bc_state = carry
        # per-level gate-controller update (no-op unless gated_blend ds)
        bc_state = bnd.update_gate_level_start(
            ds_bc, bc_state, k.astype(A.dtype) * dt)
        res_stage_prev = bc_state.reservoir_stage
        res_stage_prev_us = bc_state.reservoir_stage_us
        h = depth_from_area(geo, A)
        st = sec.section_state(geo, h)
        Y = geo.z_bed + h
        Se = sec.energy_slope(geo, h, Q, st).Se
        Q2A = Q * Q / A

        def pad(vals, us_mode=settings.secondary_bc_us, ds_mode=settings.secondary_bc_ds):
            gu = _ghost(vals, us_mode, upstream=True)
            gd = _ghost(vals, ds_mode, upstream=False)
            return jnp.concatenate([gu[None], vals, gd[None]])

        Ae, Qe, Ye, See, Q2Ae = pad(A), pad(Q), pad(Y), pad(Se), pad(Q2A)

        # vectorized interior + boundary scheme update (ref lax.py:204-232)
        avg_A = 0.5 * (Ae[2:] + Ae[:-2])
        avg_Q = 0.5 * (Qe[2:] + Qe[:-2])
        dQ_dx = 0.5 * (Qe[2:] - Qe[:-2]) / dx
        dQ2A_dx = 0.5 * (Q2Ae[2:] - Q2Ae[:-2]) / dx
        dY_dx = 0.5 * (Ye[2:] - Ye[:-2]) / dx
        avg_Se = 0.5 * (See[2:] + See[:-2])

        A_new = avg_A - dQ_dx * dt
        Q_new = avg_Q - (dQ2A_dx + g * avg_A * (dY_dx + avg_Se)) * dt

        # primary BCs at the two end nodes (ref lax.py:108-202)
        def node(st_, i):
            return bnd.NodeSection(A=st_.A[i], R=st_.R[i], K=st_.K[i], n_eq=st_.n_eq[i],
                                   dA_dh=st_.dA_dh[i], dR_dA=st_.dR_dA[i], dK_dA=st_.dK_dA[i])

        h_sch_us = depth_from_area(jax.tree_util.tree_map(lambda a: a[:1], geo), A_new[:1])[0]
        h_sch_ds = depth_from_area(jax.tree_util.tree_map(lambda a: a[-1:], geo), A_new[-1:])[0]
        st_us = sec.section_state(jax.tree_util.tree_map(lambda a: a[0], geo), h_sch_us)
        st_ds = sec.section_state(jax.tree_util.tree_map(lambda a: a[-1], geo), h_sch_ds)
        ns_us = bnd.NodeSection(A=st_us.A, R=st_us.R, K=st_us.K, n_eq=st_us.n_eq,
                                dA_dh=st_us.dA_dh, dR_dA=st_us.dR_dA, dK_dA=st_us.dK_dA)
        ns_ds = bnd.NodeSection(A=st_ds.A, R=st_ds.R, K=st_ds.K, n_eq=st_ds.n_eq,
                                dA_dh=st_ds.dA_dh, dR_dA=st_ds.dR_dA, dK_dA=st_ds.dK_dA)

        h_us, Q_us, rs_us = _bc_value(us_bc, geo, ns_us, h_sch_us, Q_new[0], k, dt, Q[0], res_stage_prev_us, geo.bed_slope[0], upstream=True, h_prev_node=h[0], gate_open=bc_state.gate_open)
        h_ds, Q_ds, rs_ds = _bc_value(ds_bc, geo, ns_ds, h_sch_ds, Q_new[-1], k, dt, Q[-1], res_stage_prev, geo.bed_slope[-1], gate_open=bc_state.gate_open)
        # each boundary carries its OWN stage (both-ends storage evolves
        # independently, mirroring ops.preissmann); the merged output keeps
        # the ds-preferred precedence for backward compatibility
        res_stage = jnp.where(jnp.isnan(rs_ds), rs_us, rs_ds)

        geo_us = jax.tree_util.tree_map(lambda a: a[0], geo)
        geo_ds = jax.tree_util.tree_map(lambda a: a[-1], geo)
        A_us = sec.section_state(geo_us, h_us).A
        A_ds = sec.section_state(geo_ds, h_ds).A

        A_out = jnp.concatenate([A_us[None], A_new[1:-1], A_ds[None]])
        Q_out = jnp.concatenate([Q_us[None], Q_new[1:-1], Q_ds[None]])

        # CFL check (ref lax.py:234-247)
        h_out = depth_from_area(geo, A_out)
        V = Q_out / A_out
        cel = jnp.maximum(V + jnp.sqrt(g * h_out), V - jnp.sqrt(g * h_out))
        violated = jnp.any(cel > num_celerity)

        bc_state = bc_state._replace(
            reservoir_stage=res_stage,
            reservoir_stage_us=rs_us,
            gate_stage=ds_bc.bed_level + h_out[-1],
        )
        return (A_out, Q_out, bc_state), (h_out, Q_out, violated, res_stage,
                                          rs_us, bc_state.gate_open)

    ks = jnp.arange(1, nt)
    gate_open0 = 1.0 if settings.gate_initially_open else 0.0
    bc_state0 = bnd.initial_bc_state(
        h0.dtype, gate_open=gate_open0,
        gate_stage=ds_bc.bed_level + h0[-1])
    _, (hs, qs, viol, stages, stages_us, gates) = jax.lax.scan(
        step, (A0, Q0, bc_state0), ks)

    depth = jnp.concatenate([h0[None], hs], axis=0)
    flow = jnp.concatenate([Q0[None], qs], axis=0)
    pad0 = lambda x, v: jnp.concatenate([jnp.asarray([v], dtype=x.dtype), x])
    return LaxOutput(depth=depth, flow=flow,
                     cfl_violated=pad0(viol, False),
                     reservoir_stage=pad0(stages, jnp.nan),
                     reservoir_stage_us=pad0(stages_us, jnp.nan),
                     gate_open=pad0(gates, gate_open0))
