"""Vectorized cross-section closures.

Branch-free jnp re-implementations of the reference's per-object section
methods, evaluated for **all nodes at once** as pure functions of
``(geometry, depth)``.  Formula parity:

* trapezoid properties            ref cross_section.py:623-679
* subsection split (composite n)  ref cross_section.py:681-708
* Horton-Einstein equivalent n    ref cross_section.py:710-739
* compound conveyance             ref cross_section.py:741-754
* dK/dA, dR/dA, dA/dh             ref cross_section.py:756-793
* Sf / Sc and their derivatives   ref cross_section.py:114-175
* normal flow                     ref cross_section.py:177-182

Dispatch on the geometry type happens at trace time (Python ``isinstance``),
so the compiled program contains only the relevant path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from flowsim_tpu.geometry import TableGeometry, TrapezoidGeometry
from flowsim_tpu.ops import hydraulics as hyd


class SectionState(NamedTuple):
    """All per-node section quantities needed by the solvers at depth h.

    Computing them together lets XLA share the piecewise-regime subterms.
    """

    A: jnp.ndarray
    P: jnp.ndarray
    R: jnp.ndarray
    T: jnp.ndarray
    K: jnp.ndarray        # total (Horton-Einstein) conveyance
    n_eq: jnp.ndarray     # equivalent Manning n
    dA_dh: jnp.ndarray
    dR_dA: jnp.ndarray
    dK_dA: jnp.ndarray


# ---------------------------------------------------------------------------
# Trapezoid path
# ---------------------------------------------------------------------------


def _trapz_regimes(g: TrapezoidGeometry, depth):
    """Shared regime quantities for a (possibly compound) trapezoid."""
    depth = jnp.maximum(depth, 0.0)
    wet = depth > 0.0

    overbank = g.compound & (depth > g.h_bank)
    h_bank = jnp.where(g.compound, g.h_bank, 1.0)  # finite sentinel for math
    d_fp = jnp.where(overbank, depth - h_bank, 0.0)

    sq_m = jnp.sqrt(1.0 + g.m_main * g.m_main)
    sq_fp = jnp.sqrt(1.0 + g.m_fp * g.m_fp)

    # main-channel-only regime (also the full-section simple formulas)
    T_s = g.b_main + 2.0 * g.m_main * depth
    A_s = (g.b_main + g.m_main * depth) * depth
    P_s = g.b_main + 2.0 * depth * sq_m

    # bankfull main channel
    T_bank = g.b_main + 2.0 * g.m_main * h_bank
    A_mf = (g.b_main + T_bank) / 2.0 * h_bank
    P_mf = g.b_main + 2.0 * h_bank * sq_m

    # floodplains (trapezoidal, one sloped outer wall each)
    A_l = (g.b_fp_left + 0.5 * g.m_fp * d_fp) * d_fp
    P_l = g.b_fp_left + d_fp * sq_fp
    A_r = (g.b_fp_right + 0.5 * g.m_fp * d_fp) * d_fp
    P_r = g.b_fp_right + d_fp * sq_fp

    width_at_bank = g.b_fp_left + T_bank + g.b_fp_right
    return dict(
        depth=depth, wet=wet, overbank=overbank, d_fp=d_fp,
        sq_m=sq_m, sq_fp=sq_fp,
        T_s=T_s, A_s=A_s, P_s=P_s,
        T_bank=T_bank, A_mf=A_mf, P_mf=P_mf,
        A_l=A_l, P_l=P_l, A_r=A_r, P_r=P_r,
        width_at_bank=width_at_bank,
    )


def trapezoid_properties(g: TrapezoidGeometry, depth):
    """(A, P, R, T) per node (ref: cross_section.py:623-679)."""
    r = _trapz_regimes(g, depth)
    ob, wet = r["overbank"], r["wet"]
    A = jnp.where(ob, r["A_mf"] + r["A_l"] + r["A_r"], r["A_s"])
    P = jnp.where(ob, r["P_mf"] + r["P_l"] + r["P_r"], r["P_s"])
    T = jnp.where(ob, r["width_at_bank"] + 2.0 * g.m_fp * r["d_fp"], r["T_s"])
    A = jnp.where(wet, A, 0.0)
    P = jnp.where(wet, P, 0.0)
    T = jnp.where(wet, T, 0.0)
    R = jnp.where(P > 0.0, A / jnp.where(P > 0.0, P, 1.0), 0.0)
    return A, P, R, T


def _subsection_conveyances(g: TrapezoidGeometry, r, A, P, R):
    """Per-subsection conveyances for the Horton-Einstein combination.

    Below bankfull the whole section is "main" (ref: cross_section.py:687-689);
    above it the main channel extends rectangularly with width T_bank and its
    bed perimeter excludes the floodplain interfaces (ref: 694-708).
    """
    ob = r["overbank"]
    A_m = jnp.where(ob, r["A_mf"] + r["T_bank"] * r["d_fp"], A)
    P_m = jnp.where(ob, r["P_mf"], P)
    R_m = jnp.where(P_m > 0.0, A_m / jnp.where(P_m > 0.0, P_m, 1.0), 0.0)

    A_l = jnp.where(ob, r["A_l"], 0.0)
    P_l = jnp.where(ob, r["P_l"], 0.0)
    R_l = jnp.where(P_l > 0.0, A_l / jnp.where(P_l > 0.0, P_l, 1.0), 0.0)

    A_r = jnp.where(ob, r["A_r"], 0.0)
    P_r = jnp.where(ob, r["P_r"], 0.0)
    R_r = jnp.where(P_r > 0.0, A_r / jnp.where(P_r > 0.0, P_r, 1.0), 0.0)

    # inactive subsections (R = 0) need a sentinel INSIDE conveyance, not
    # just on its output: pow_2_3's derivative at 0 is infinite, so the
    # jvp/vjp of A * R^(2/3) evaluates 0 * inf = NaN even though the value
    # is an exact 0 — which poisoned d(Horton K)/dh for every below-bankfull
    # node (and the n_left/n_right cotangents) until round 5's adjoint
    # surfaced it.  Values are bitwise unchanged (the masks select the same
    # 0 the raw formula produced).
    act_l, act_m, act_r = P_l > 0.0, P_m > 0.0, P_r > 0.0
    K_l = jnp.where(act_l,
                    hyd.conveyance(A_l, g.n_left, jnp.where(act_l, R_l, 1.0)),
                    0.0)
    K_m = jnp.where(act_m,
                    hyd.conveyance(A_m, g.n_main, jnp.where(act_m, R_m, 1.0)),
                    0.0)
    K_r = jnp.where(act_r,
                    hyd.conveyance(A_r, g.n_right, jnp.where(act_r, R_r, 1.0)),
                    0.0)
    return K_l, K_m, K_r


def section_state(g, depth) -> SectionState:
    """All closure quantities at once; see :class:`SectionState`."""
    if isinstance(g, TableGeometry):
        return _table_section_state(g, depth)

    r = _trapz_regimes(g, depth)
    A, P, R, T = trapezoid_properties(g, depth)

    K_l, K_m, K_r = _subsection_conveyances(g, r, A, P, R)
    ksum = hyd.pow_3_2(K_l) + hyd.pow_3_2(K_m) + hyd.pow_3_2(K_r)
    K_compound = jnp.where(ksum > 0.0, hyd.pow_2_3(ksum), 0.0)
    K_simple = hyd.conveyance(A, g.n_main, R)
    K = jnp.where(g.compound, K_compound, K_simple)

    # equivalent n (ref: cross_section.py:710-739): simple -> n_main; compound
    # -> A R^{2/3} / K_total with n_main fallback on degenerate sections.
    n_eq_c = jnp.where(
        (A > 0.0) & (R > 0.0) & (K_compound > 0.0),
        A * hyd.pow_2_3(R) / jnp.where(K_compound > 0.0, K_compound, 1.0),
        g.n_main,
    )
    n_eq = jnp.where(g.compound, n_eq_c, g.n_main)

    dA_dh = T  # ref: cross_section.py:792-793

    # dR/dA with piecewise dP/dh (ref: cross_section.py:766-790)
    dP_dh = jnp.where(r["overbank"], 2.0 * r["sq_fp"], 2.0 * r["sq_m"])
    ok = (P > 0.0) & (T > 0.0)
    dP_dA = dP_dh / jnp.where(ok, T, 1.0)
    dR_dA = jnp.where(ok, (P - A * dP_dA) / jnp.where(ok, P * P, 1.0), 0.0)

    # dK/dA uses the *equivalent-n single-channel* formula even for compound
    # sections (ref: cross_section.py:756-764).
    dK_dA = jnp.where(A > 0.0, hyd.dK_dA(A, n_eq, R, dR_dA), 0.0)

    return SectionState(A=A, P=P, R=R, T=T, K=K, n_eq=n_eq, dA_dh=dA_dh, dR_dA=dR_dA, dK_dA=dK_dA)


# ---------------------------------------------------------------------------
# Table (irregular-section) path
# ---------------------------------------------------------------------------


def _table_lookup(table, idx, frac):
    lo = jnp.take_along_axis(table, idx[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(table, (idx + 1)[..., None], axis=-1)[..., 0]
    return lo + frac * (hi - lo)


def _table_section_state(g: TableGeometry, depth) -> SectionState:
    M = g.area.shape[-1]
    dgrid = g.depth_max / (M - 1)
    x = depth / dgrid
    idx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, M - 2)
    frac = x - idx  # may exceed 1 beyond the table: linear extrapolation

    A = _table_lookup(g.area, idx, frac)
    P = _table_lookup(g.perimeter, idx, frac)
    T = _table_lookup(g.top_width, idx, frac)
    K = _table_lookup(g.conveyance, idx, frac)
    n_eq = _table_lookup(g.n_eq, idx, frac)
    dK = _table_lookup(g.dK_dA, idx, frac)
    dR = _table_lookup(g.dR_dA, idx, frac)
    wet = depth > 0.0
    A = jnp.where(wet, A, 0.0)
    P = jnp.where(wet, P, 0.0)
    T = jnp.where(wet, T, 0.0)
    K = jnp.where(wet, K, 0.0)
    R = jnp.where(P > 0.0, A / jnp.where(P > 0.0, P, 1.0), 0.0)
    return SectionState(A=A, P=P, R=R, T=T, K=K, n_eq=n_eq, dA_dh=T, dR_dA=dR, dK_dA=dK)


# ---------------------------------------------------------------------------
# Energy slope Se = Sf + Sc and derivatives (vectorized over nodes)
# ---------------------------------------------------------------------------


class EnergySlope(NamedTuple):
    Se: jnp.ndarray
    dSe_dA_eff: jnp.ndarray  # dSf/dA + (dSc/dA * dA/dh)   [see note]
    dSe_dQ: jnp.ndarray


def energy_slope(g, depth, Q, state: SectionState | None = None) -> EnergySlope:
    """Se and its derivatives, matching the reference's channel closure.

    Note on ``dSe_dA_eff``: the reference pre-multiplies the **curvature**
    term by dA/dh inside the section object (ref: cross_section.py:164) while
    the friction term is left as a pure d/dA (ref: cross_section.py:124-132);
    the Preissmann assembly then multiplies the sum by dA/dh again
    (ref: preissmann.py:543,605).  We replicate that exact composition so
    Newton trajectories match the reference bit-for-bit in the same precision.
    """
    s = state if state is not None else section_state(g, depth)
    Ksafe = jnp.where(s.K > 0.0, s.K, 1.0)

    Sf = jnp.where(s.K > 0.0, hyd.friction_slope(Q, Ksafe), 0.0)
    dSf_dA = jnp.where(s.K > 0.0, hyd.dSf_dA(Q, Ksafe, s.dK_dA), 0.0)
    dSf_dQ = jnp.where(s.K > 0.0, hyd.dSf_dQ(Q, Ksafe), 0.0)

    curv = g.curvature
    has_curv = curv != 0.0           # ref: cross_section.py:145 (Sc)
    has_curv_d = jnp.abs(curv) > 1e-12  # ref: cross_section.py:156,168 (dSc)
    rc = 1.0 / jnp.where(has_curv, curv, 1.0)
    Rsafe = jnp.where(s.R > 0.0, s.R, 1.0)

    Sc = jnp.where(
        has_curv,
        hyd.curvature_slope(depth, s.T, s.A, Q, s.n_eq, Rsafe, rc),
        0.0,
    )
    dSc_dA = jnp.where(
        has_curv_d,
        hyd.dSc_dA(depth, s.A, Q, s.n_eq, Rsafe, rc, s.dR_dA, s.T) * s.dA_dh,
        0.0,
    )
    dSc_dQ = jnp.where(
        has_curv_d,
        hyd.dSc_dQ(depth, s.T, s.A, Q, s.n_eq, Rsafe, rc),
        0.0,
    )

    return EnergySlope(Se=Sf + Sc, dSe_dA_eff=dSf_dA + dSc_dA, dSe_dQ=dSf_dQ + dSc_dQ)


def normal_flow(g, depth, state: SectionState | None = None):
    """Normal discharge at given depth; 0 where bed slope is unset or <= 0
    (ref: cross_section.py:177-182)."""
    s = state if state is not None else section_state(g, depth)
    S0 = g.bed_slope
    valid = jnp.isfinite(S0) & (S0 > 0.0)
    return jnp.where(valid, s.K * jnp.sqrt(jnp.abs(jnp.where(valid, S0, 1.0))), 0.0)
