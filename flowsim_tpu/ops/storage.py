"""0-D lumped reservoir storage attached to a boundary.

Device-side replacement for the reference's ``LumpedStorage``
(ref: src/hydromodel/lumped_storage.py).  The implicit per-step mass balance,
solved there with ``scipy.optimize.brentq`` (ref :24-35), becomes a
fixed-count bracketed bisection that jits, vmaps and differentiates.

Stage-area curves: the reference integrates the storage volume with a
data-dependent-resolution trapezoid rule per call (ref :168-179).  Here the
cumulative volume V(Y) is precomputed once on a dense fixed grid at setup and
``net_vol_change = V(Y2) - V(Y1)`` is a table interpolation — same physics,
static shapes.  (With a constant ``surface_area`` the two are identical:
net_vol_change = (Y2-Y1)*SA, ref :169-170.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from flowsim_tpu.config import GRAVITY as g, farray
from flowsim_tpu.ops import hydraulics as hyd
from flowsim_tpu.ops import rating_curve as rcurve

_BISECT_ITERS = 80


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StorageParams:
    has_area_curve: bool = field(metadata=dict(static=True))
    has_rating: bool = field(metadata=dict(static=True))
    capture_losses: bool = field(metadata=dict(static=True))
    surface_area: jnp.ndarray     # scalar (unused if has_area_curve)
    min_stage: jnp.ndarray
    y_min: jnp.ndarray            # solution bracket
    y_max: jnp.ndarray
    vol_stage: jnp.ndarray        # dense stage grid for V(Y) (has_area_curve)
    vol_table: jnp.ndarray        # cumulative volume on vol_stage
    area_stage: jnp.ndarray       # stage grid of the area curve
    area_table: jnp.ndarray       # alpha-scaled areas on area_stage
    area_gradient: jnp.ndarray    # d(area)/d(stage) table (ref :149)
    beta: jnp.ndarray             # stage shift of the area lookup (ref :159)
    reservoir_length: jnp.ndarray
    K_q: jnp.ndarray
    rating: rcurve.RatingCurveParams | None = None


def make_storage(
    surface_area=None,
    min_stage=-jnp.inf,
    solution_boundaries=(0.0, 200.0),
    area_curve=None,
    alpha=1.0,
    beta=0.0,
    rating: rcurve.RatingCurveParams | None = None,
    capture_losses=False,
    reservoir_length=0.0,
    K_q=0.0,
    vol_grid_points: int = 4096,
) -> StorageParams:
    """Build storage params (host side).  ``area_curve`` is an (M, 2) array of
    (stage, area) rows (ref :145-153 ``set_area_curve``)."""
    has_area_curve = area_curve is not None
    if has_area_curve:
        ac = np.asarray(area_curve, dtype=np.float64)
        stages, areas = ac[:, 0], alpha * ac[:, 1]
        y_min, y_max = float(stages.min()), float(stages.max())
        grid = np.linspace(y_min, y_max, vol_grid_points)
        area_on_grid = np.interp(grid + beta, stages, areas)
        vol = np.concatenate([[0.0], np.cumsum(0.5 * (area_on_grid[1:] + area_on_grid[:-1]) * np.diff(grid))])
        area_gradient = np.gradient(areas, stages)
        return StorageParams(
            has_area_curve=True,
            has_rating=rating is not None,
            capture_losses=capture_losses,
            surface_area=jnp.asarray(0.0),
            min_stage=farray(min_stage),
            y_min=jnp.asarray(y_min),
            y_max=jnp.asarray(y_max),
            vol_stage=jnp.asarray(grid),
            vol_table=jnp.asarray(vol),
            area_stage=jnp.asarray(stages),
            area_table=jnp.asarray(areas),
            area_gradient=jnp.asarray(area_gradient),
            beta=farray(beta),
            reservoir_length=farray(reservoir_length),
            K_q=farray(K_q),
            rating=rating,
        )
    if surface_area is None:
        raise ValueError("surface_area or area_curve required")
    e = jnp.zeros((0,))
    return StorageParams(
        has_area_curve=False,
        has_rating=rating is not None,
        capture_losses=capture_losses,
        surface_area=farray(surface_area),
        min_stage=farray(min_stage),
        y_min=farray(solution_boundaries[0]),
        y_max=farray(solution_boundaries[1]),
        vol_stage=e, vol_table=e, area_stage=e, area_table=e, area_gradient=e,
        beta=jnp.asarray(0.0),
        reservoir_length=farray(reservoir_length),
        K_q=farray(K_q),
        rating=rating,
    )


def area_at(sp: StorageParams, stage):
    """Water-surface area at stage (ref :155-160)."""
    if sp.has_area_curve:
        return jnp.interp(stage + sp.beta, sp.area_stage, sp.area_table)
    return sp.surface_area


def dA_dY(sp: StorageParams, stage):
    """d(area)/d(stage) from the tabulated gradient (ref :162-166)."""
    if sp.has_area_curve:
        return jnp.interp(stage, sp.area_stage, sp.area_gradient)
    return jnp.zeros_like(stage)


def net_vol_change(sp: StorageParams, Y1, Y2):
    """Volume between stages Y1 -> Y2 (ref :168-179)."""
    if sp.has_area_curve:
        v = lambda y: jnp.interp(y, sp.vol_stage, sp.vol_table)
        return v(Y2) - v(Y1)
    return (Y2 - Y1) * sp.surface_area


def _mass_balance_residual(sp: StorageParams, duration, vol_in, Y_old, Y):
    """g(Y) whose root is the new stage:  net_vol_change(Y_old, Y)
    - (vol_in - 0.5*(Qout(Y_old)+Qout(Y))*dt)  (ref :24-35)."""
    q_old = rcurve.discharge(sp.rating, Y_old) if sp.has_rating else 0.0
    q_new = rcurve.discharge(sp.rating, Y) if sp.has_rating else 0.0
    target_vol = vol_in - 0.5 * (q_old + q_new) * duration
    return net_vol_change(sp, Y_old, Y) - target_vol


def _mass_balance_bisect(sp: StorageParams, duration, vol_in, Y_old):
    f = lambda Y: _mass_balance_residual(sp, duration, vol_in, Y_old, Y)
    lo = sp.y_min * jnp.ones_like(Y_old)
    hi = sp.y_max * jnp.ones_like(Y_old)
    f_lo = f(lo)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        go_right = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo_new = jnp.where(go_right, mid, lo)
        f_lo_new = jnp.where(go_right, f_mid, f_lo)
        hi_new = jnp.where(go_right, hi, mid)
        return lo_new, hi_new, f_lo_new

    lo, hi, _ = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi, f_lo))
    Y = 0.5 * (lo + hi)
    return jnp.maximum(Y, sp.min_stage)


@jax.custom_jvp
def mass_balance(sp: StorageParams, duration, vol_in, Y_old):
    """Implicit new stage from the trapezoidal mass balance (ref :24-35).

    Solves  net_vol_change(Y_old, Y) = vol_in - 0.5*(Qout(Y_old)+Qout(Y))*dt
    by bracketed bisection on [y_min, y_max] (replacing brentq), then clamps
    to ``min_stage``.

    Derivatives come from the implicit function theorem (``custom_jvp``),
    NOT from differentiating the bisection: every value path through the
    bracket updates goes through boolean ``where`` selections from constant
    brackets, so autodiff of the loop yields an identically-zero (and thus
    silently wrong) gradient.  The IFT rule dY = -(dg . dtheta)/(dg/dY) is
    linear in the tangents, so JAX transposes it for reverse mode too —
    both the gradient-calibration and adjoint paths (ops/adjoint.py, which
    additionally needs FORWARD mode for its exact-Jacobian block
    extraction) rely on this.  Below ``min_stage`` the clamp is active and
    all sensitivities are zero (matching :func:`dY_new_dvol_in`'s guard,
    ref :37-45).
    """
    return _mass_balance_bisect(sp, duration, vol_in, Y_old)


@mass_balance.defjvp
def _mass_balance_jvp(primals, tangents):
    sp, duration, vol_in, Y_old = primals
    Y = _mass_balance_bisect(sp, duration, vol_in, Y_old)
    _, gY = jax.jvp(
        lambda y: _mass_balance_residual(sp, duration, vol_in, Y_old, y),
        (Y,), (jnp.ones_like(Y),))
    _, dg = jax.jvp(
        lambda s, d, v, yo: _mass_balance_residual(s, d, v, yo, Y),
        primals, tangents)
    dY = jnp.where(Y <= sp.min_stage, 0.0, -dg / gY)
    return Y, dY


def dY_new_dvol_in(sp: StorageParams, Y_new):
    """d(new stage)/d(inflow volume) = 1/A(Y); 0 below min stage (ref :37-45)."""
    return jnp.where(Y_new <= sp.min_stage, 0.0, 1.0 / area_at(sp, Y_new))


# ---------------------------------------------------------------------------
# Entrance energy losses (ref :47-143); A_str (expansion) not used by any
# shipped case and kept None-equivalent (contributes 0).
# ---------------------------------------------------------------------------


def energy_loss(sp: StorageParams, entry_area, flow, roughness, hydraulic_radius):
    if not sp.capture_losses:
        return jnp.zeros_like(entry_area)
    K = hyd.conveyance(entry_area, roughness, hydraulic_radius)
    hf = hyd.friction_slope(flow, K) * sp.reservoir_length
    V = flow / entry_area
    h_emp = sp.K_q * V * V / (2.0 * g)
    return hf + h_emp


def dhl_dA(sp: StorageParams, entry_area, flow, roughness, hydraulic_radius, dR_dA):
    if not sp.capture_losses:
        return jnp.zeros_like(entry_area)
    K = hyd.conveyance(entry_area, roughness, hydraulic_radius)
    dK = hyd.dK_dA(entry_area, roughness, hydraulic_radius, dR_dA)
    dhf = hyd.dSf_dA(flow, K, dK) * sp.reservoir_length
    V = flow / entry_area
    dV_dA = -flow / (entry_area * entry_area)
    d_h_emp = sp.K_q * 2.0 * V * dV_dA / (2.0 * g)
    return dhf + d_h_emp


def dhl_dQ(sp: StorageParams, entry_area, flow, roughness, hydraulic_radius):
    if not sp.capture_losses:
        return jnp.zeros_like(entry_area)
    K = hyd.conveyance(entry_area, roughness, hydraulic_radius)
    dhf = hyd.dSf_dQ(flow, K) * sp.reservoir_length
    V = flow / entry_area
    dV_dQ = 1.0 / entry_area
    d_h_emp = sp.K_q * 2.0 * V * dV_dQ / (2.0 * g)
    return dhf + d_h_emp
