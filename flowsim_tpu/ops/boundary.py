"""Boundary-condition residuals and Jacobian entries (device side).

The five boundary types of the reference (ref: src/hydromodel/boundary.py:32)
evaluated as pure functions of the boundary node's section state.  The BC
``kind`` is static, so jit specializes each simulation to exactly its two
boundary code paths (no lax.switch).

Residual form is ``unknown - target`` (ref boundary.py:141) with

    kind              unknown   target
    flow_hydrograph   Q         hydrograph(t)                     (ref :85-89)
    normal_depth      Q         K(h) sqrt(S0)                     (ref :91-92)
    rating_curve      Q         RC(bed_level + h)                 (ref :94-95)
    fixed_depth       h         initial depth, or reservoir stage
                                + head loss - bed level           (ref :97-133)
    stage_hydrograph  h         hydrograph(t) - bed_level         (ref :135-139)

Hydrograph targets are precomputed per time level on the host (the solvers
only ever evaluate them at t = k*dt), so a hydrograph is just a [nt] array.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from flowsim_tpu.config import farray

from flowsim_tpu.ops import hydraulics as hyd
from flowsim_tpu.ops import rating_curve as rcurve
from flowsim_tpu.ops import storage as storage_mod

Q_TYPE_KINDS = ("flow_hydrograph", "normal_depth", "rating_curve")  # ref :244-247


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BoundaryParams:
    kind: str = field(metadata=dict(static=True))
    bed_level: jnp.ndarray           # stage datum of the boundary (ref :30)
    bed_slope: jnp.ndarray           # section bed slope (normal_depth)
    initial_depth: jnp.ndarray       # fixed_depth target (no storage)
    target_series: jnp.ndarray       # [nt] hydrograph values at k*dt
    rating: Optional[rcurve.RatingCurveParams] = None
    storage: Optional[storage_mod.StorageParams] = None

    @property
    def is_q_type(self) -> bool:
        return self.kind in Q_TYPE_KINDS


class NodeSection(NamedTuple):
    """Scalar section quantities at a boundary node (slice of SectionState)."""

    A: jnp.ndarray
    R: jnp.ndarray
    K: jnp.ndarray
    n_eq: jnp.ndarray
    dA_dh: jnp.ndarray
    dR_dA: jnp.ndarray
    dK_dA: jnp.ndarray


def make_boundary(
    kind: str,
    bed_level=0.0,
    bed_slope=jnp.nan,
    initial_depth=jnp.nan,
    target_series=None,
    rating=None,
    storage=None,
) -> BoundaryParams:
    if kind not in ("flow_hydrograph", "fixed_depth", "normal_depth", "rating_curve", "stage_hydrograph"):
        raise ValueError("Invalid boundary condition.")  # ref boundary.py:32-33
    if storage is not None and kind != "fixed_depth":
        raise ValueError("lumped storage is only supported on a fixed_depth boundary")
    if kind == "rating_curve" and rating is None:
        raise ValueError("Rating curve is undefined.")  # ref boundary.py:96
    if kind in ("flow_hydrograph", "stage_hydrograph") and target_series is None:
        # without this, target_series[k] would clamp to a silent 0.0 target
        raise ValueError(
            "Insufficient arguments for boundary condition.")  # ref boundary.py:87
    return BoundaryParams(
        kind=kind,
        bed_level=farray(bed_level),
        bed_slope=farray(bed_slope),
        initial_depth=farray(initial_depth),
        target_series=(jnp.zeros((1,)) if target_series is None else farray(target_series)),
        rating=rating,
        storage=storage,
    )


class BCState(NamedTuple):
    """Cross-time-level boundary state carried by the solver scan.

    ``reservoir_stage``: previous level's DOWNSTREAM lumped-storage stage
    (NaN if no ds storage BC; for backward compatibility it also mirrors an
    upstream-only storage's stage).  ``reservoir_stage_us``: the UPSTREAM
    storage's stage (NaN unless the us boundary has storage) — a separate
    carry so storage on BOTH boundaries evolves independently (the
    reference keeps per-boundary ``stage_hydrograph`` state inside each
    LumpedStorage, ref boundary.py:104-131, so both-ends storage works
    there too).  The ``gate_*`` fields hold the explicit gate-controller
    state for a ``gated_blend`` downstream rating curve (SURVEY.md §3.3):
    open flag (0/1), remaining cooldown [s], last controller time (-1 before
    the first update), and the stage the controller last saw.
    """

    reservoir_stage: jnp.ndarray
    gate_open: jnp.ndarray
    gate_cooldown: jnp.ndarray
    gate_prev_time: jnp.ndarray
    gate_stage: jnp.ndarray
    reservoir_stage_us: jnp.ndarray


def initial_bc_state(dtype, gate_open=0.0, gate_stage=jnp.nan) -> BCState:
    z = lambda v: jnp.asarray(v, dtype=dtype)
    return BCState(
        reservoir_stage=z(jnp.nan),
        gate_open=z(gate_open),
        gate_cooldown=z(0.0),
        gate_prev_time=z(-1.0),
        gate_stage=z(gate_stage),
        reservoir_stage_us=z(jnp.nan),
    )


def update_gate_level_start(bc: BoundaryParams, state: BCState, time) -> BCState:
    """Per-level gate-controller update for a gated_blend rating curve;
    identity otherwise (see rcurve.gate_update)."""
    if bc.kind != "rating_curve" or bc.rating is None or bc.rating.kind != "gated_blend":
        return state
    gate_open, cooldown, prev_time = rcurve.gate_update(
        bc.rating, state.gate_open, state.gate_cooldown, state.gate_prev_time,
        state.gate_stage, time,
    )
    return state._replace(gate_open=gate_open, gate_cooldown=cooldown, gate_prev_time=prev_time)


class BCEval(NamedTuple):
    residual: jnp.ndarray
    df_dh: jnp.ndarray
    df_dQ: jnp.ndarray
    reservoir_stage: jnp.ndarray  # NaN unless fixed_depth + storage


def evaluate(
    bc: BoundaryParams,
    node: NodeSection,
    h,
    Q,
    k,
    dt,
    Q_prev=None,
    reservoir_stage_prev=None,
    bc_state: Optional[BCState] = None,
    upstream: bool = False,
    h_prev=None,
) -> BCEval:
    """Residual + its two Jacobian entries for one boundary.

    ``k`` is the (traced) time-level index; targets use ``target_series[k]``.
    ``Q_prev`` is the previous-level discharge at this node (for the storage
    volume, ref preissmann.py:314).  ``reservoir_stage_prev`` is the stage
    recorded at the previous time level (ref boundary.py:104-108 indexes the
    stage hydrograph written during level k-1).

    ``upstream`` flips the lumped-storage orientation: at the upstream end
    positive Q leaves the reservoir (mass balance gets -vol_in) and the
    channel surface sits BELOW the reservoir stage by the entrance loss.
    (The reference supports downstream storage only; upstream storage is a
    flowsim_tpu extension — ref boundary.py:97-133 is the ds case.)
    """
    nan = jnp.asarray(jnp.nan, dtype=jnp.result_type(h))
    res_stage = nan

    if bc.kind == "flow_hydrograph":
        target = bc.target_series[k]
        return BCEval(Q - target, jnp.zeros_like(h), jnp.ones_like(h), res_stage)

    if bc.kind == "stage_hydrograph":
        target = bc.target_series[k] - bc.bed_level
        return BCEval(h - target, jnp.ones_like(h), jnp.zeros_like(h), res_stage)

    if bc.kind == "normal_depth":
        target = hyd.normal_flow(bc.bed_slope, node.K)
        df_dh = -hyd.dQn_dA(bc.bed_slope, node.dK_dA) * node.dA_dh  # ref :179-180
        return BCEval(Q - target, df_dh, jnp.ones_like(h), res_stage)

    if bc.kind == "rating_curve":
        stage = bc.bed_level + h
        if bc.rating.kind == "gated_blend":
            if bc_state is None:
                raise ValueError("gated_blend rating curve needs a carried BCState")
            target = rcurve.gated_discharge(bc.rating, stage, bc_state.gate_open)
            df_dh = -rcurve.gated_dQ_dz(bc.rating, stage, bc_state.gate_open)
        else:
            target = rcurve.discharge(bc.rating, stage)
            df_dh = -rcurve.dQ_dz(bc.rating, stage)  # ref :182-184
        return BCEval(Q - target, df_dh, jnp.ones_like(h), res_stage)

    if bc.kind == "fixed_depth":
        if bc.storage is None:
            return BCEval(h - bc.initial_depth, jnp.ones_like(h), jnp.zeros_like(h), res_stage)

        sp = bc.storage
        # upstream: positive Q drains the reservoir, and the entrance loss
        # drops the channel surface below the reservoir stage
        sign = -1.0 if upstream else 1.0
        vol_in = sign * 0.5 * (Q_prev + Q) * dt  # ref preissmann.py:314
        # ref boundary.py:104-108: at the first solved level the previous
        # reservoir stage is taken as the *current trial* boundary stage —
        # a reference quirk kept for the downstream case.  For the upstream
        # extension the trial bootstrap makes a draining reservoir's
        # residual unsatisfiable in h (f = -vol_in/SA + hl > 0 identically),
        # so it anchors on the PREVIOUS level's surface instead.
        boot = (h_prev if upstream and h_prev is not None else h)
        Y_old = jnp.where(k == 1, boot + bc.bed_level, reservoir_stage_prev)
        Y_new = storage_mod.mass_balance(sp, dt, vol_in, Y_old)

        head_loss = storage_mod.energy_loss(sp, node.A, Q, node.n_eq, node.R)
        target = (Y_new + sign * head_loss) - bc.bed_level
        res_stage = Y_new

        d_hl_dA = storage_mod.dhl_dA(sp, node.A, Q, node.n_eq, node.R, node.dR_dA)
        df_dh = 1.0 - sign * d_hl_dA * node.dA_dh  # ref :167-177
        dY_dvol = storage_mod.dY_new_dvol_in(sp, Y_new)
        d_hl_dQ = storage_mod.dhl_dQ(sp, node.A, Q, node.n_eq, node.R)
        df_dQ = -sign * (dY_dvol * 0.5 * dt + d_hl_dQ)  # ref :224-237
        return BCEval(h - target, df_dh, df_dQ, res_stage)

    raise ValueError(f"unknown boundary kind {bc.kind!r}")
