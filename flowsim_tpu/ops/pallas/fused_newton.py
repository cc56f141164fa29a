"""Fused whole-simulation Pallas kernel for the flagship Preissmann solve.

One ``pallas_call`` runs the ENTIRE simulation — the level loop, each
level's Newton iteration, the residual/Jacobian stencil, and the in-VMEM
block-PCR solve — with all state resident in VMEM/registers.  This removes
the per-iteration XLA fusion/dispatch overhead that dominates the small-N
flagship run (N=121: ~70 us per Newton iteration on v5e for ~1 us of
arithmetic; ref hot loop: src/hydromodel/preissmann.py:101-163).

Precision design: Mosaic has no f64, so the residual path — everything that
is a *function of the iterate* (h, Q) — is evaluated in double-single
``df32`` arithmetic (~1e-13 relative; see ops/pallas/df32.py).  Problem
CONSTANTS (widths, slopes, Manning n, rating coefficients, dt, dx, theta)
are f32: rounding a constant perturbs the problem by ~6e-8 relative but
keeps the residual an exact smooth function of the iterate, so Newton still
converges to the 1e-6 tolerance; evaluating any h-dependent quantity in
plain f32 would instead put ~ulp-sized staircase noise on the residual
(e.g. the blended rating curve's alpha ramp scales a ~1e4 m3/s flow
difference) and stall the iteration — the same failure round 1 measured for
raw f32 on CPU/TPU.  Jacobian entries and the PCR solve are plain f32: the
increment only needs a few digits (inexact Newton; validated in round 1 by
the pcr_f32 path's identical iteration counts).

Supported configurations — the full Boundary surface of ops/boundary.py:
TrapezoidGeometry (simple or compound, with planform curvature) or
TableGeometry (irregular surveyed sections via per-node lookup tables,
fetched in-kernel with chunked sublane ``tpu.dynamic_gather``); upstream
``flow_hydrograph``, ``stage_hydrograph``, ``fixed_depth`` (plain or with
lumped storage), ``normal_depth``, or ``rating_curve`` (polynomial /
blended_poly); downstream any of those plus the non-smooth ``gated_blend``
rating with the gate-controller state machine carried across levels.
Lumped storage on either end covers the general StorageParams surface —
stage-area curves, a rating on the storage, and entrance losses — via
pack-time split-f64 stage-grid tables and an in-kernel vectorized monotone
inverse of the mass balance (see ``_storage_curve_eval``); only
storage-on-both-ends, a gated storage rating, non-quadratic rating
polynomials, batched geometry, and ``newton='fixed'`` fall back to the XLA
path (api dispatch keeps behavior identical).

Formula parity: the df32 math mirrors ops/sections.py / ops/hydraulics.py /
ops/preissmann.py line for line (which in turn cite the reference); the
Jacobian reuses ops/hydraulics.py's f32 functions directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowsim_tpu.config import GRAVITY
from flowsim_tpu.ops import hydraulics as hyd
from flowsim_tpu.ops.pallas import df32, pcr_common
from flowsim_tpu.ops.pallas.df32 import DF, df

MAX_VMEM_N = 8192

# GEO packed rows (f32, [NG, Np])
_G_B_MAIN, _G_M_MAIN, _G_H_BANK, _G_COMPOUND, _G_B_FPL, _G_B_FPR, _G_M_FP, \
    _G_N_MAIN, _G_N_LEFT, _G_N_RIGHT, _G_CURV, _G_DZ, _G_SQM, _G_SQFP, \
    _G_AMF, _G_PMF, _G_TBANK = range(17)
_NG = 17

# Table mode (TableGeometry): the geo row tensor re-purposes row 0 for the
# per-node reciprocal depth-grid (M-1)/depth_max; only _G_CURV and _G_DZ keep
# their trapezoid meaning.  The 7 lookup tables ride a separate VMEM input.
_TG_INVDG = 0
_T_A, _T_P, _T_T, _T_K, _T_NEQ, _T_DK, _T_DR = range(7)
_NT = 7

# SCAL slots (f32 SMEM)
_S_THETA, _S_DT, _S_DX, _S_TOL, _S_C2, _S_C1, _S_C0, _S_D2, _S_D1, _S_D0, \
    _S_STAGEC, _S_BUF, _S_FD, _S_SQS0, _S_ZERO, _S_SA, _S_MINSTAGE, \
    _S_DSBED, _S_MAXCD, _S_PIVOT, _S_SQS0_US, \
    _S_UC2, _S_UC1, _S_UC0, _S_UD2, _S_UD1, _S_UD0, \
    _S_USTAGEC, _S_UBUF, _S_UFD, _S_USBED, \
    _S_STG_YMIN, _S_STG_INVDY, _S_STG_DY, _S_STG_LRES, _S_STG_KQ, \
    _S_TABK, _S_SA_US, _S_MINSTAGE_US, _S_STG_YMIN_US, _S_STG_INVDY_US, \
    _S_STG_DY_US, _S_STG_LRES_US, _S_STG_KQ_US = range(44)
_NS = 44  # _S_ZERO holds a literal 0.0: the opaque fence for df32 EFTs
# _S_TABK: batched-TableGeometry per-member conveyance multiplier c
# (K -> c K, dK_dA -> c dK_dA, n_eq -> n_eq / c): the member-on-sublane
# kernel shares ONE set of lookup tables and scales conveyance per member —
# exactly parallel.ensemble.table_roughness_ensemble's semantics.
# The *_US storage slots hold the UPSTREAM reservoir's scalars when BOTH
# boundaries carry lumped storage (round 5); a single storage end keeps the
# shared slots, whichever side it is on (the pre-round-5 convention).

# rating-coefficient slot blocks: (c2, c1, c0, d2, d1, d0, stagec, buf, fd)
_DS_RC_SLOTS = (_S_C2, _S_C1, _S_C0, _S_D2, _S_D1, _S_D0,
                _S_STAGEC, _S_BUF, _S_FD)
_US_RC_SLOTS = (_S_UC2, _S_UC1, _S_UC0, _S_UD2, _S_UD1, _S_UD0,
                _S_USTAGEC, _S_UBUF, _S_UFD)

# storage-curve tables (rows of the stg input, each `stg_rows` sublanes of
# the flattened stage grid): df32 cumulative volume V(Y), df32 storage-rating
# discharge q(Y), df32 g(Y) = V(Y) + dt/2 q(Y) (the mass-balance monotone
# inverse target), f32 surface area A(Y)
_STG_VHI, _STG_VLO, _STG_QHI, _STG_QLO, _STG_GHI, _STG_GLO, _STG_A = range(7)
_NSTG = 7
_STG_P = 2048  # stage-grid resolution (16 sublanes x 128 lanes)
_STG_SR = _STG_P // 128


def _roll(interpret):
    if interpret:
        return lambda x, shift: jnp.roll(x, shift, axis=1)
    # np.int32 shift: under x64 a python-int shift traces as i64, which
    # Mosaic's tpu.dynamic_rotate rejects (must be 32-bit)
    return lambda x, shift: pltpu.roll(x, shift=np.int32(shift), axis=1)


def _roll_df(roll, x: DF, shift) -> DF:
    return DF(roll(x.hi, shift), roll(x.lo, shift))


# -- Mosaic-safe f32 fractional powers (no cbrt primitive on TPU) -----------


def _cbrt32(x):
    """f32 cube root for x >= 0 via exp/log seed + one Newton polish."""
    safe = x > 0.0
    xs = jnp.where(safe, x, 1.0)
    y = jnp.exp(jnp.log(xs) * np.float32(1.0 / 3.0))
    y = y - (y * y * y - xs) / (3.0 * y * y)
    return jnp.where(safe, y, 0.0)


def _dK_dA32(A, n, R, dR_dA):
    """hyd.dK_dA with the Mosaic-safe cbrt (formula ref hydraulics.py:28-40)."""
    c = _cbrt32(R)
    Rsafe = jnp.where(R > 0.0, R, 1.0)
    pm13 = jnp.where(R > 0.0, 1.0 / _cbrt32(Rsafe), 0.0)
    return (c * c + A * np.float32(2.0 / 3.0) * pm13 * dR_dA) / n


def _dSc32(h, T, A, Q, n, R, rc, dR_dA):
    """hyd.dSc_dA / dSc_dQ with Mosaic-safe powers (ref hydraulics.py:119-153)."""
    Fr = hyd.froude(T, A, Q)
    c = _cbrt32(R)
    C = jnp.sqrt(c) / n          # pow_1_6(R)/n
    f = 8.0 * np.float32(GRAVITY) / (C * C)
    pm13 = 1.0 / c
    df_dA = -(8.0 / 3.0) * np.float32(GRAVITY) * n * n * (pm13 / R) * dR_dA
    dh_dA = 1.0 / T
    dFrA = hyd.dFr_dA(T, A, Q)
    dFrQ = hyd.dFr_dQ(T, A)
    sqrtf = jnp.sqrt(f)
    num = (2.86 * sqrtf + 2.07 * f) * h * h * Fr * Fr
    den = (0.565 + sqrtf) * rc * rc
    dnum_dA = (2.86 / (2.0 * sqrtf) * df_dA + 2.07 * df_dA) * h * h * Fr * Fr + (
        2.86 * sqrtf + 2.07 * f
    ) * (2.0 * h * dh_dA * Fr * Fr + h * h * 2.0 * Fr * dFrA)
    dden_dA = (1.0 / (2.0 * sqrtf) * df_dA) * rc * rc
    dSc_dA = (dnum_dA * den - num * dden_dA) / (den * den)
    dnum_dQ = (2.86 * sqrtf + 2.07 * f) * h * h * 2.0 * Fr * dFrQ
    dSc_dQ = dnum_dQ / den
    return dSc_dA, dSc_dQ


def _section_df(g, h: DF):
    """df32 section closures, mirroring ops/sections.py:51-165.

    Returns (A, R, K, n_eq, Se-inputs...) as DF plus f32 derivative
    quantities (dA_dh, dR_dA, dK_dA).
    """
    zero = df(jnp.zeros_like(h.hi))
    depth = df32.where(h.hi > 0.0, h, zero)
    wet = depth.hi > 0.0

    compound = g[_G_COMPOUND] > 0.5
    h_bank = jnp.where(compound, g[_G_H_BANK], 1.0)
    overbank = compound & (depth.hi > h_bank)

    b, m = g[_G_B_MAIN], g[_G_M_MAIN]
    sq_m, sq_fp = g[_G_SQM], g[_G_SQFP]

    # main-channel / simple regime
    T_s = df(b) + df(2.0 * m) * depth
    A_s = (df(b) + df(m) * depth) * depth
    P_s = df(b) + depth * df(2.0 * sq_m)

    # floodplains above bankfull
    d_fp = df32.where(overbank, depth - df(h_bank), zero)
    A_l = (df(g[_G_B_FPL]) + df(0.5 * g[_G_M_FP]) * d_fp) * d_fp
    P_l = df(g[_G_B_FPL]) + d_fp * df(sq_fp)
    A_r = (df(g[_G_B_FPR]) + df(0.5 * g[_G_M_FP]) * d_fp) * d_fp
    P_r = df(g[_G_B_FPR]) + d_fp * df(sq_fp)

    A_mf, P_mf, T_bank = df(g[_G_AMF]), g[_G_PMF], g[_G_TBANK]

    A = df32.where(overbank, A_mf + A_l + A_r, A_s)
    P = df32.where(overbank, df(P_mf) + P_l + P_r, P_s)
    T = df32.where(overbank,
                   df(g[_G_B_FPL] + T_bank + g[_G_B_FPR]) + df(2.0 * g[_G_M_FP]) * d_fp,
                   T_s)
    A = df32.where(wet, A, zero)
    P = df32.where(wet, P, zero)
    T = df32.where(wet, T, zero)
    Pok = P.hi > 0.0
    R = df32.where(Pok, A / df32.where(Pok, P, df(jnp.ones_like(h.hi))), zero)

    # Horton-Einstein compound conveyance (ops/sections.py:104-142)
    ones = df(jnp.ones_like(h.hi))
    A_m = df32.where(overbank, A_mf + df(T_bank) * d_fp, A)
    P_m = df32.where(overbank, df(P_mf), P)  # stays DF: P(h) below bankfull
    Pm_ok = P_m.hi > 0.0
    R_m = df32.where(Pm_ok, A_m / df32.where(Pm_ok, P_m, ones), zero)
    Pl_ok = overbank & (P_l.hi > 0.0)
    R_l = df32.where(Pl_ok, A_l / df32.where(Pl_ok, P_l, df(jnp.ones_like(h.hi))), zero)
    Pr_ok = overbank & (P_r.hi > 0.0)
    R_r = df32.where(Pr_ok, A_r / df32.where(Pr_ok, P_r, df(jnp.ones_like(h.hi))), zero)

    K_m = A_m * df32.pow_2_3(R_m) / df(g[_G_N_MAIN])
    K_l = df32.where(Pl_ok, A_l * df32.pow_2_3(R_l) / df(g[_G_N_LEFT]), zero)
    K_r = df32.where(Pr_ok, A_r * df32.pow_2_3(R_r) / df(g[_G_N_RIGHT]), zero)

    ksum = df32.pow_3_2(K_l) + df32.pow_3_2(K_m) + df32.pow_3_2(K_r)
    ks_ok = ksum.hi > 0.0
    K_compound = df32.where(ks_ok, df32.pow_2_3(ksum), zero)
    K_simple = A * df32.pow_2_3(R) / df(g[_G_N_MAIN])
    K = df32.where(compound, K_compound, K_simple)

    n_eq_ok = (A.hi > 0.0) & (R.hi > 0.0) & (K_compound.hi > 0.0)
    ones = df(jnp.ones_like(h.hi))
    n_eq_c = df32.where(
        n_eq_ok,
        A * df32.pow_2_3(R) / df32.where(n_eq_ok, K_compound, ones),
        df(g[_G_N_MAIN]),
    )
    n_eq = df32.where(compound, n_eq_c, df(g[_G_N_MAIN]))

    # f32 derivative quantities (Jacobian path; ops/sections.py:153-163)
    Af, Pf, Tf, Rf = A.value, P.value, T.value, R.value
    dA_dh = Tf
    dP_dh = jnp.where(overbank, 2.0 * sq_fp, 2.0 * sq_m)
    ok = (Pf > 0.0) & (Tf > 0.0)
    dP_dA = dP_dh / jnp.where(ok, Tf, 1.0)
    dR_dA = jnp.where(ok, (Pf - Af * dP_dA) / jnp.where(ok, Pf * Pf, 1.0), 0.0)
    dK_dA = jnp.where(Af > 0.0, _dK_dA32(Af, n_eq.value, Rf, dR_dA), 0.0)

    return dict(A=A, P=P, R=R, T=T, K=K, n_eq=n_eq, depth=depth,
                dA_dh=dA_dh, dR_dA=dR_dA, dK_dA=dK_dA)


def _gather_vreg8(tab8, idx_row):
    """``out[0, lane] = tab8[idx_row[0, lane], lane]`` for an [8, Np] block.

    Lowers to a single ``tpu.dynamic_gather`` across sublanes.  Mosaic only
    supports the within-vreg form (operand <= 8 sublanes; larger shapes crash
    the backend — probed on v5e), hence the chunked loop in
    :func:`_section_df_table`.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,))
    idx_full = jnp.broadcast_to(idx_row, tab8.shape)[..., None]
    out = jax.lax.gather(tab8, idx_full, dnums, (1, 1),
                         mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out[0:1]


def _section_df_table(g, tab_ref, h: DF, *, M, stride):
    """df32 section closures from per-node lookup tables.

    Mirrors ops/sections.py:179-199 (``_table_section_state``) exactly: the
    raw (possibly negative) depth drives the lookup, the bracketing index is
    clipped to [0, M-2] (so beyond-table depths extrapolate on the last
    interval and negative depths on the first), only A/P/T/K are wet-masked,
    and n_eq/dK_dA/dR_dA keep their extrapolated values.  Table VALUES are
    f32 problem constants; the interpolation weight is df32 so the residual
    stays a smooth function of the iterate (see module docstring).

    ``tab_ref`` holds 7 tables of ``stride`` rows each (``stride >= M + 1``,
    last rows replicated) so the shifted j+1 window of the final chunk stays
    in bounds.  Per 8-row chunk, one sublane ``tpu.dynamic_gather`` fetches
    the j value and one (on the row-shifted window) the j+1 value; the chunk
    mask is shared across all 7 tables.
    """
    invdg = g[_TG_INVDG]
    x = h * df(invdg)
    jf = jnp.clip(jnp.floor(x.hi), 0.0, np.float32(M - 2))
    j0 = jf.astype(jnp.int32)
    frac = x - df(jf)  # df32; may exceed [0, 1): linear extrapolation
    c0 = j0 >> np.int32(3)
    s0 = j0 & np.int32(7)
    n_chunks = -(-(M - 1) // 8)  # j0 <= M-2
    # Two-stage lookup: (1) mask-accumulate each node's winning 8-row window
    # (plain vreg FMAs, chunk masks shared across tables — values land exactly
    # since exactly one chunk mask is 1), (2) ONE sublane gather per table per
    # bracket.  A gather per chunk instead measured ~60x slower on v5e
    # (Mosaic expands each sublane dynamic_gather into a long select chain).
    # The j+1 window reuses the j window shifted up one sublane, with only
    # its missing last row (base+8) accumulated separately — the scan reads
    # each table ~once per evaluation instead of twice (cost is VMEM-read
    # bound and scales with M; see BASELINE.md).
    zrow = jnp.zeros_like(h.hi)
    W0 = [zrow * jnp.zeros((8, 1), jnp.float32) for _ in range(_NT)]
    r8 = [zrow for _ in range(_NT)]
    for c in range(n_chunks):
        m = (c0 == np.int32(c)).astype(jnp.float32)
        for t in range(_NT):
            base = t * stride + 8 * c
            W0[t] = W0[t] + m * tab_ref[base:base + 8, :]
            r8[t] = r8[t] + m * tab_ref[base + 8:base + 9, :]
    v0 = [_gather_vreg8(W0[t], s0) for t in range(_NT)]
    W1 = [jnp.concatenate([W0[t][1:8, :], r8[t]], axis=0) for t in range(_NT)]
    v1 = [_gather_vreg8(W1[t], s0) for t in range(_NT)]
    return _section_from_brackets(h, v0, v1, frac)


def _section_from_brackets(h: DF, v0, v1, frac: DF):
    """Section closures from the two bracketing table sample rows (shared
    tail of :func:`_section_df_table` / :func:`_section_df_table_rows`)."""

    def lerp_df(t):
        return df(v0[t]) + frac * df(v1[t] - v0[t])

    zero = df(jnp.zeros_like(h.hi))
    wet = h.hi > 0.0
    A = df32.where(wet, lerp_df(_T_A), zero)
    P = df32.where(wet, lerp_df(_T_P), zero)
    T = df32.where(wet, lerp_df(_T_T), zero)
    K = df32.where(wet, lerp_df(_T_K), zero)
    n_eq = lerp_df(_T_NEQ)
    Pok = P.hi > 0.0
    R = df32.where(Pok, A / df32.where(Pok, P, df(jnp.ones_like(h.hi))), zero)

    fr = frac.hi  # f32 is enough for the Jacobian path
    dK_dA = v0[_T_DK] + fr * (v1[_T_DK] - v0[_T_DK])
    dR_dA = v0[_T_DR] + fr * (v1[_T_DR] - v0[_T_DR])
    return dict(A=A, P=P, R=R, T=T, K=K, n_eq=n_eq, depth=h,
                dA_dh=T.value, dR_dA=dR_dA, dK_dA=dK_dA)


def _section_df_table_rows(g, tab_ref, h: DF, *, M, stride, B):
    """Per-sublane table closures for kernels whose sublanes carry
    BRANCHES, each with its own per-node lookup tables (the network
    kernel).  The within-vreg sublane gather of :func:`_section_df_table`
    cannot apply — sublanes are branches, not table windows — so every
    sample row j in [0, M-1) is mask-accumulated directly:
    ``v[t] = sum_j (j0 == j) * tab[t, j]`` with the mask shared across the
    7 tables and both brackets (tab[t, j+1] reuses it).  Cost is O(M)
    [B, Np] FMAs per evaluation (~2x a trap-branch iteration at M ~ 40);
    VMEM holds _NT * stride * B rows.

    ``tab_ref`` rows are [B, Np] blocks laid out as row (t*stride + j)*B + b
    (same convention as the network geometry rows).  Interpolation
    semantics identical to :func:`_section_df_table` (clip to [0, M-2],
    extrapolate first/last interval, wet-mask A/P/T/K only).
    """
    invdg = g[_TG_INVDG]
    x = h * df(invdg)
    jf = jnp.clip(jnp.floor(x.hi), 0.0, np.float32(M - 2))
    j0 = jf.astype(jnp.int32)
    frac = x - df(jf)

    def blk(t, j):
        r = (t * stride + j) * B
        return tab_ref[r:r + B, :]

    zero_b = jnp.zeros_like(h.hi)
    v0 = [zero_b for _ in range(_NT)]
    v1 = [zero_b for _ in range(_NT)]
    for j in range(M - 1):  # j0 <= M-2
        m = (j0 == np.int32(j)).astype(jnp.float32)
        for t in range(_NT):
            v0[t] = v0[t] + m * blk(t, j)
            v1[t] = v1[t] + m * blk(t, j + 1)
    return _section_from_brackets(h, v0, v1, frac)


def _energy_slope_df(g, st, Q: DF):
    """df32 Se + f32 derivatives, mirroring ops/sections.py:213-252."""
    zero = df(jnp.zeros_like(Q.hi))
    ones = df(jnp.ones_like(Q.hi))
    K, A, R, T, n_eq, depth = st["K"], st["A"], st["R"], st["T"], st["n_eq"], st["depth"]
    K_ok = K.hi > 0.0
    Ksafe = df32.where(K_ok, K, ones)
    Sf = df32.where(K_ok, Q * df32.abs_(Q) / (Ksafe * Ksafe), zero)

    curv = g[_G_CURV]
    has_curv = curv != 0.0
    has_curv_d = jnp.abs(curv) > 1e-12
    rc = 1.0 / jnp.where(has_curv, curv, 1.0)
    Rsafe = df32.where(R.hi > 0.0, R, ones)

    # df32 Sc (hyd.curvature_slope with the reference clamps on Fr inputs)
    Asafe = df32.maximum(A, df(1e-6))
    Tsafe = df32.maximum(T, df(1e-6))
    V = Q / Asafe
    D = df32.maximum(Asafe / Tsafe, df(1e-6))
    Fr = V / df32.sqrt(df(GRAVITY) * D)
    C = df32.sqrt(df32.cbrt(Rsafe)) / n_eq
    f_dw = df(8.0 * GRAVITY) / (C * C)
    sqrtf = df32.sqrt(f_dw)
    num = (df(2.86) * sqrtf + df(2.07) * f_dw) \
        * depth * depth * Fr * Fr
    den = (df(0.565) + sqrtf) * df(rc * rc)
    Sc = df32.where(has_curv, num / den, zero)

    Se = Sf + Sc

    # f32 derivatives (reusing ops/hydraulics.py on collapsed values)
    Af, Rf, Tf, nf, hf = A.value, R.value, T.value, n_eq.value, depth.value
    Kf = jnp.where(K_ok, K.value, 1.0)
    Qf = Q.value
    dSf_dA = jnp.where(K_ok, hyd.dSf_dA(Qf, Kf, st["dK_dA"]), 0.0)
    dSf_dQ = jnp.where(K_ok, hyd.dSf_dQ(Qf, Kf), 0.0)
    Rsf = jnp.where(Rf > 0.0, Rf, 1.0)
    dScA_raw, dScQ_raw = _dSc32(hf, Tf, Af, Qf, nf, Rsf, rc, st["dR_dA"])
    dSc_dA = jnp.where(has_curv_d, dScA_raw * st["dA_dh"], 0.0)
    dSc_dQ = jnp.where(has_curv_d, dScQ_raw, 0.0)
    return Se, dSf_dA + dSc_dA, dSf_dQ + dSc_dQ


def _rating_q(scal, stage_c: DF, kind: str, gate_open=None,
              slots=_DS_RC_SLOTS):
    """Q(stage) for a rating curve in df32 (ops/rating_curve.py:187-211).

    ``stage_c`` is the *centered* stage: for blended_poly, stage - pivot;
    for polynomial, stage + stage_shift (both host-precomputed offsets).
    ``gated_blend`` selects the low/high quadratic on the carried gate flag
    (ops/rating_curve.py:155-160).  ``slots`` picks the coefficient block
    (downstream or upstream boundary).
    """
    s_c2, s_c1, s_c0, s_d2, s_d1, s_d0, _, s_buf, _ = slots
    if kind == "polynomial":
        c2, c1, c0 = scal[s_c2], scal[s_c1], scal[s_c0]
        return (df(c2) * stage_c + df(c1)) * stage_c + df(c0)
    if kind == "gated_blend":
        low = (df(scal[s_c2]) * stage_c + df(scal[s_c1])) * stage_c + df(scal[s_c0])
        high = (df(scal[s_d2]) * stage_c + df(scal[s_d1])) * stage_c + df(scal[s_d0])
        return df32.where(gate_open > 0.5, high, low)
    # blended_poly: smoothstep alpha over [0, buffer] + delta-form blend
    s = stage_c / df(scal[s_buf])
    zero = df(jnp.zeros_like(s.hi))
    one = df(jnp.ones_like(s.hi))
    s = df32.where(s.hi < 0.0, zero, df32.where(s.hi > 1.0, one, s))
    alpha = s * s * (df(3.0) - df(2.0) * s)
    low = (df(scal[s_c2]) * stage_c + df(scal[s_c1])) * stage_c + df(scal[s_c0])
    high = (df(scal[s_d2]) * stage_c + df(scal[s_d1])) * stage_c + df(scal[s_d0])
    return low + alpha * (high - low)


class _StgSlots(NamedTuple):
    """Scal-slot indices of one lumped storage's scalars (the shared set
    for a single storage end — either side — or the *_US set when both
    boundaries carry storage)."""

    sa: int
    minstage: int
    ymin: int
    invdy: int
    dy: int
    lres: int
    kq: int


_STG_SHARED = _StgSlots(_S_SA, _S_MINSTAGE, _S_STG_YMIN, _S_STG_INVDY,
                        _S_STG_DY, _S_STG_LRES, _S_STG_KQ)
_STG_US = _StgSlots(_S_SA_US, _S_MINSTAGE_US, _S_STG_YMIN_US,
                    _S_STG_INVDY_US, _S_STG_DY_US, _S_STG_LRES_US,
                    _S_STG_KQ_US)


def _stg_B(stg):
    """Sublane batch of a stacked storage-table block (1 = single run)."""
    return stg.shape[0] // (_NSTG * _STG_SR)


def _stg_blk(stg, t, c, B):
    """[B, 128] chunk ``c`` of table ``t`` (grid points c*128..c*128+127,
    one row per sublane member/branch; layout row (t*SR + c)*B + b)."""
    r = (t * _STG_SR + c) * B
    return stg[r:r + B, :]


def _stg_liota():
    return jax.lax.broadcasted_iota(
        jnp.int32, (1, 128), 1).astype(jnp.float32)


def _stg_bracket(jf):
    """(chunk, lane) f32 indices of integer-valued grid index jf — exact:
    jf <= 2047 is exactly representable and /128 is a power-of-two scale."""
    c0 = jnp.floor(jf * np.float32(1.0 / 128.0))
    l0 = jf - c0 * np.float32(128.0)
    return c0, l0


def _stg_masks(jf, liota):
    """Shared one-hot masks of grid index ``jf`` ([B, 1] f32): the [B, 128]
    lane mask and the _STG_SR per-chunk [B, 1] masks.  All products are
    [B, 1] x [1, 128] — per-sublane grid indices without the scalar
    extraction the flat single-run layout needed (a [1,1] vector broadcast
    in both axes does not lower; [B,1] against [1,128] does)."""
    c0, l0 = _stg_bracket(jf)
    lm = (liota == l0).astype(jnp.float32)
    cms = [(c0 == np.float32(c)).astype(jnp.float32)
           for c in range(_STG_SR)]
    return lm, cms


def _stg_pick_tabs(stg, ts, lm, cms):
    """[B, 1] columns of several tables at ONE grid index (the bracket and
    one-hot masks are computed once by the caller and shared across the
    tables and, between brackets, across table pairs — this runs in the
    hot while-Newton loop)."""
    B = _stg_B(stg)
    outs = [jnp.zeros_like(cms[0]) for _ in ts]
    for c in range(_STG_SR):
        for i, t in enumerate(ts):
            outs[i] = outs[i] + cms[c] * jnp.sum(
                _stg_blk(stg, t, c, B) * lm, axis=1, keepdims=True)
    return outs


def _stg_lookup_df(stg, thi, tlo, scal, Y: DF, slots=_STG_SHARED) -> DF:
    """df32 linear interpolation of the (hi, lo) table pair at stage Y,
    per sublane ([B, 1] stages against per-sublane tables).

    Table VALUES are split-f64 constants; the interpolation weight is df32 in
    the iterate, so the result is a smooth df32 function of Y (same design as
    :func:`_section_df_table`).  Out-of-range stages extrapolate on the first
    or last cell — callers clamp Y to the grid range first where the XLA
    bisection would have clamped to its bracket (ops/storage.py:150-166).
    """
    liota = _stg_liota()
    u = (Y - df(scal[slots.ymin])) * df(scal[slots.invdy])
    jf = jnp.clip(jnp.floor(u.hi), 0.0, np.float32(_STG_P - 2))
    frac = u - df(jf)
    v0h, v0l = _stg_pick_tabs(stg, (thi, tlo), *_stg_masks(jf, liota))
    v1h, v1l = _stg_pick_tabs(stg, (thi, tlo),
                              *_stg_masks(jf + 1.0, liota))
    v0 = df(v0h) + df(v0l)
    v1 = df(v1h) + df(v1l)
    return v0 + frac * (v1 - v0)


def _stg_lookup32(stg, t, scal, y, slots=_STG_SHARED):
    """f32 per-sublane linear interpolation of a single table at stage y."""
    liota = _stg_liota()
    u = (y - scal[slots.ymin]) * scal[slots.invdy]
    jf = jnp.clip(jnp.floor(u), 0.0, np.float32(_STG_P - 2))
    frac = u - jf
    (v0,) = _stg_pick_tabs(stg, (t,), *_stg_masks(jf, liota))
    (v1,) = _stg_pick_tabs(stg, (t,), *_stg_masks(jf + 1.0, liota))
    return v0 + frac * (v1 - v0)


def _storage_curve_eval(scal, stg, h_node: DF, Q_node: DF, Qp_node: DF,
                        y_old: DF, k, bed, losses: bool, node, sign=1.0,
                        h_boot: DF | None = None, slots=_STG_SHARED):
    """Generalized lumped-storage boundary row (ops/boundary.py:185-205).

    ``sign=-1.0`` flips the orientation for UPSTREAM storage: positive Q
    drains the reservoir, and the entrance loss drops the channel surface
    below the reservoir stage (same convention as ops.boundary.evaluate's
    ``upstream=True``).

    Solves the implicit trapezoidal mass balance on the pack-time stage grid:
    with g(Y) := V(Y) + dt/2 q(Y) (strictly increasing: g' = A + dt/2 dq/dY),
    the new stage satisfies  g(Y) = V(Y_old) + vol_in - dt/2 q(Y_old) =: C.
    A vectorized sign count over the grid brackets the root and one linear
    interpolation finds it — the same piecewise-linear root the XLA path's
    bisection of the interpolated tables converges to (ops/storage.py:
    135-166).  ``node`` carries the boundary node's [1,1] section values for
    the optional entrance-loss terms (ops/storage.py:180-210).

    Returns (residual, df_dh, df_dQ, res_stage), all [1,1].
    """
    dt = scal[_S_DT]
    first = k.astype(jnp.float32) == np.float32(1.0)
    # ref boundary.py:104-108: trial stage at the first solved level
    # (``h_boot`` overrides the anchor — the upstream row passes the
    # previous level's depth, see ops/boundary.py evaluate upstream=True)
    Y_old_eff = df32.where(first,
                           (h_node if h_boot is None else h_boot) + df(bed),
                           y_old)
    vol_in = df(np.float32(sign) * 0.5) * (Qp_node + Q_node) * df(dt)
    V_old = _stg_lookup_df(stg, _STG_VHI, _STG_VLO, scal, Y_old_eff,
                           slots=slots)
    q_old = _stg_lookup_df(stg, _STG_QHI, _STG_QLO, scal, Y_old_eff,
                           slots=slots)
    C = V_old + vol_in - df(0.5) * df(dt) * q_old

    # monotone inverse of g on the grid: count cells below C per sublane,
    # then lerp (per-sublane [B, 1] columns throughout)
    B = _stg_B(stg)
    liota = _stg_liota()
    Cv = C.value
    below = jnp.zeros_like(Cv)
    for c in range(_STG_SR):
        gsum = _stg_blk(stg, _STG_GHI, c, B) + _stg_blk(stg, _STG_GLO, c, B)
        below = below + jnp.sum((gsum < Cv).astype(jnp.float32),
                                axis=1, keepdims=True)
    jf = jnp.clip(below - 1.0, 0.0, np.float32(_STG_P - 2))
    g0h, g0l = _stg_pick_tabs(stg, (_STG_GHI, _STG_GLO),
                              *_stg_masks(jf, liota))
    g1h, g1l = _stg_pick_tabs(stg, (_STG_GHI, _STG_GLO),
                              *_stg_masks(jf + 1.0, liota))
    g0 = df(g0h) + df(g0l)
    g1 = df(g1h) + df(g1l)
    dy = scal[slots.dy]
    slope = dy / jnp.maximum((g1 - g0).value, np.float32(1e-30))
    ymin = scal[slots.ymin]
    Y_new = df(ymin) + df(jf) * df(dy) + (C - g0) * df(slope)
    # clamp to the solution bracket (bisection stays inside [y_min, y_max])
    ymax = ymin + dy * np.float32(_STG_P - 1)
    Y_new = df32.maximum(Y_new, df(ymin))
    Y_new = df32.where(Y_new.hi > ymax, df(ymax) + df(jnp.zeros_like(Y_new.hi)),
                       Y_new)
    Y_new = df32.maximum(Y_new, df(scal[slots.minstage]))

    # optional entrance losses, df32 in the iterate (ops/storage.py:180-188)
    if losses:
        A, K = node["A"], node["K"]
        lres, kq = scal[slots.lres], scal[slots.kq]
        inv2g = np.float32(1.0 / (2.0 * GRAVITY))
        hf = Q_node * df32.abs_(Q_node) / (K * K) * df(lres)
        Vel = Q_node / A
        h_emp = df(kq * inv2g) * Vel * Vel
        head_loss = hf + h_emp
    else:
        head_loss = df(jnp.zeros_like(h_node.hi))

    sgn = np.float32(sign)
    res = h_node - (Y_new + df(sgn) * head_loss - df(bed))
    res_stage = Y_new

    # f32 Jacobian entries (ops/boundary.py:200-205)
    A_new = jnp.maximum(_stg_lookup32(stg, _STG_A, scal, Y_new.value,
                                      slots=slots),
                        np.float32(1e-30))
    dY_dvol = jnp.where(Y_new.hi <= scal[slots.minstage], 0.0, 1.0 / A_new)
    if losses:
        Af, Kf = node["A"].value, node["K"].value
        Qf = Q_node.value
        d_hl_dA = (hyd.dSf_dA(Qf, Kf, node["dK_dA"]) * lres
                   + kq * 2.0 * (Qf / Af) * (-Qf / (Af * Af)) * inv2g)
        d_hl_dQ = (hyd.dSf_dQ(Qf, Kf) * lres
                   + kq * 2.0 * (Qf / Af) * (1.0 / Af) * inv2g)
        df_dh = 1.0 - sgn * d_hl_dA * node["dA_dh"]
        df_dQ = -sgn * (dY_dvol * 0.5 * dt + d_hl_dQ)
    else:
        df_dh = jnp.ones_like(h_node.hi)
        df_dQ = -sgn * (dY_dvol * 0.5 * dt)
    return res, df_dh, df_dQ, res_stage


def _pcr_solve(buf, idx, n, n_sweeps, roll):
    """In-register block-PCR on the packed [16*B, Np] f32 system.

    Same algorithm as ops/pallas/pcr_kernel.py:_pcr_kernel (validated on
    hardware); `roll` is pltpu.roll in-kernel, jnp.roll in interpret mode.
    The 16 system rows may each carry ``B`` sublanes (one independent system
    per sublane — the ensemble batch axis); every op is elementwise across
    sublanes, so the batched solve is the same vreg program.
    """
    bs = buf.shape[0] // 16
    buf = pcr_common.pcr_reduce(buf, idx, n, n_sweeps, roll,
                                rhs_pairs=1, block=bs)
    ((x0, x1),) = pcr_common.pcr_backsolve(buf, rhs_pairs=1, block=bs)
    return x0, x1


def _level_state(g, h: DF, Q: DF, section_fn=None):
    """Previous-level quantities (A, Se, Q2A), df32."""
    st = section_fn(h) if section_fn is not None else _section_df(g, h)
    Se, _, _ = _energy_slope_df(g, st, Q)
    A = st["A"]
    ok = A.hi > 0.0
    Q2A = df32.where(ok, Q * Q / df32.where(ok, A, df(jnp.ones_like(A.hi))),
                     df(jnp.zeros_like(A.hi)))
    return A, Se, Q2A


def _us_row(us_kind, st, scal, h, Q, prev_h, prev_Q, tgt, y_old, k, stg,
            slots=_STG_SHARED):
    """Upstream boundary row (ops/boundary.py:160-205) on [B, 1] columns.

    Returns ``(us_res DF, us_df_dh, us_df_dQ, us_res_stage | None)``.
    Factored out of :func:`_assemble_fused` so network mode can evaluate
    several kinds and select per branch (mixed external-end kinds).
    """
    if us_kind == "flow_hydrograph":
        return (DF(Q.hi[:, 0:1], Q.lo[:, 0:1]) - df(tgt),
                np.float32(0.0), np.float32(1.0), None)
    if us_kind == "normal_depth":
        # Q - K(h) sqrt(S0) at the head node (ops/boundary.py:178-183)
        sq = scal[_S_SQS0_US]
        K_head = DF(st["K"].hi[:, 0:1], st["K"].lo[:, 0:1])
        Q_head = DF(Q.hi[:, 0:1], Q.lo[:, 0:1])
        us_res = Q_head - K_head * df(sq)
        us_df_dh = -(st["dK_dA"][:, 0:1] * sq * st["dA_dh"][:, 0:1])
        return us_res, us_df_dh, np.float32(1.0), None
    if us_kind in ("rating_poly", "rating_blend"):
        # Q - RC(bed + h) at the head node (ops/boundary.py:173-183), with
        # the upstream coefficient block; central-difference dQ/dz (exact
        # for the quadratics at fd=1, matching the ds rating row)
        rkind = "polynomial" if us_kind == "rating_poly" else "blended_poly"
        h_head = DF(h.hi[:, 0:1], h.lo[:, 0:1])
        Q_head = DF(Q.hi[:, 0:1], Q.lo[:, 0:1])
        stage_c = h_head + df(scal[_S_USTAGEC])
        us_res = Q_head - _rating_q(scal, stage_c, rkind, slots=_US_RC_SLOTS)
        ufd = scal[_S_UFD]
        qp_ = _rating_q(scal, stage_c + df(ufd), rkind, slots=_US_RC_SLOTS)
        qm_ = _rating_q(scal, stage_c - df(ufd), rkind, slots=_US_RC_SLOTS)
        us_df_dh = -((qp_ - qm_).value) / (2.0 * ufd)
        return us_res, us_df_dh, np.float32(1.0), None
    if us_kind == "storage_simple":
        # fixed_depth + constant-area storage at the head (ops/boundary.py
        # :185-205 with upstream=True: positive Q DRAINS the reservoir)
        h_head = DF(h.hi[:, 0:1], h.lo[:, 0:1])
        Q_head = DF(Q.hi[:, 0:1], Q.lo[:, 0:1])
        Qp_head = DF(prev_Q.hi[:, 0:1], prev_Q.lo[:, 0:1])
        bed_u = scal[_S_USBED]
        sa_u, dt_u = scal[slots.sa], scal[_S_DT]
        first_u = k.astype(jnp.float32) == np.float32(1.0)
        # upstream bootstrap anchors on the PREVIOUS level's surface (see
        # ops/boundary.py evaluate upstream=True; the downstream rows keep
        # the reference's trial-stage quirk)
        hp_head = DF(prev_h.hi[:, 0:1], prev_h.lo[:, 0:1])
        Y_old_u = df32.where(first_u, hp_head + df(bed_u), y_old)
        vol_in_u = df(-0.5) * (Qp_head + Q_head) * df(dt_u)
        Y_new_u = Y_old_u + vol_in_u / df(sa_u)
        Y_new_u = df32.maximum(Y_new_u, df(scal[slots.minstage]))
        us_res = h_head - (Y_new_u - df(bed_u))
        us_df_dh = jnp.ones_like(h_head.hi)
        dY_dvol_u = jnp.where(Y_new_u.hi <= scal[slots.minstage], 0.0,
                              1.0 / sa_u)
        us_df_dQ = dY_dvol_u * 0.5 * dt_u
        return us_res, us_df_dh, us_df_dQ, Y_new_u
    if us_kind in ("storage_curve", "storage_curve_hl"):
        h_head = DF(h.hi[:, 0:1], h.lo[:, 0:1])
        Q_head = DF(Q.hi[:, 0:1], Q.lo[:, 0:1])
        Qp_head = DF(prev_Q.hi[:, 0:1], prev_Q.lo[:, 0:1])
        node_u = {kk: (DF(st[kk].hi[:, 0:1], st[kk].lo[:, 0:1])
                       if isinstance(st[kk], DF) else st[kk][:, 0:1])
                  for kk in ("A", "K", "dK_dA", "dA_dh")}
        hp_head = DF(prev_h.hi[:, 0:1], prev_h.lo[:, 0:1])
        return _storage_curve_eval(
            scal, stg, h_head, Q_head, Qp_head, y_old, k,
            scal[_S_USBED], us_kind == "storage_curve_hl", node_u,
            sign=-1.0, h_boot=hp_head, slots=slots)
    # stage_hydrograph / fixed_depth: host bakes the datum into tgt
    return (DF(h.hi[:, 0:1], h.lo[:, 0:1]) - df(tgt),
            np.float32(1.0), np.float32(0.0), None)


def _ds_row(ds_kind, st, scal, h, Q, prev_Q, ds_tgt, y_old, k, gate_open,
            stg, n):
    """Downstream boundary row on [B, 1] columns (the ds counterpart of
    :func:`_us_row`); returns ``(ds_res, ds_df_dh, ds_df_dQ, res_stage)``
    with ``res_stage`` a zero DF unless the row carries storage."""
    h_tail = DF(h.hi[:, n - 1:n], h.lo[:, n - 1:n])
    Q_tail = DF(Q.hi[:, n - 1:n], Q.lo[:, n - 1:n])
    res_stage = df(jnp.zeros_like(h_tail.hi))
    if ds_kind == "fixed_h":
        # plain fixed_depth (constant series) or a ds stage_hydrograph; the
        # host bakes the datum/constant into ds_tgt (ops/boundary.py:185-187,
        # 211-213; ref boundary.py:97-99,135-139)
        ds_res = h_tail - df(ds_tgt)
        return ds_res, jnp.ones_like(h_tail.hi), np.float32(0.0), res_stage
    if ds_kind == "storage_simple":
        # fixed_depth + constant-area lumped storage, closed-form mass
        # balance (ops/boundary.py:185-205; ref boundary.py:97-133 with
        # surface_area only): Y = max(Y_old + vol_in/SA, min_stage)
        bed = scal[_S_DSBED]
        sa, dt_s = scal[_S_SA], scal[_S_DT]
        Qp_tail = DF(prev_Q.hi[:, n - 1:n], prev_Q.lo[:, n - 1:n])
        # Compare in f32: the fori_loop level index `k` is a weak i64 under
        # x64 (fori lowers to scan, whose index dtype is the canonical int),
        # and an integer compare against an i32 literal inserts
        # convert(i64->i32), which Mosaic cannot lower (its _convert_helper
        # recurses infinitely on 64-bit ints).  i64->f32 DOES lower (the
        # gated branch's time computation uses it), so route through f32.
        # ref boundary.py:104-108: trial stage at level 1
        first = k.astype(jnp.float32) == np.float32(1.0)
        Y_old_eff = df32.where(first, h_tail + df(bed), y_old)
        vol_in = df(0.5) * (Qp_tail + Q_tail) * df(dt_s)
        Y_new = Y_old_eff + vol_in / df(sa)
        Y_new = df32.maximum(Y_new, df(scal[_S_MINSTAGE]))
        ds_res = h_tail - (Y_new - df(bed))
        dY_dvol = jnp.where(Y_new.hi <= scal[_S_MINSTAGE], 0.0, 1.0 / sa)
        ds_df_dQ = -(dY_dvol * 0.5 * dt_s)
        return ds_res, jnp.ones_like(h_tail.hi), ds_df_dQ, Y_new
    if ds_kind in ("storage_curve", "storage_curve_hl"):
        # generalized lumped storage: stage-area curve / storage rating /
        # entrance losses via the pack-time stage-grid tables
        Qp_tail = DF(prev_Q.hi[:, n - 1:n], prev_Q.lo[:, n - 1:n])
        node_d = {kk: (DF(st[kk].hi[:, n - 1:n], st[kk].lo[:, n - 1:n])
                       if isinstance(st[kk], DF) else st[kk][:, n - 1:n])
                  for kk in ("A", "K", "dK_dA", "dA_dh")}
        return _storage_curve_eval(
            scal, stg, h_tail, Q_tail, Qp_tail, y_old, k,
            scal[_S_DSBED], ds_kind == "storage_curve_hl", node_d)
    if ds_kind == "flow_q":
        # downstream flow hydrograph: Q - target (ops/boundary.py:160-162)
        ds_res = Q_tail - df(ds_tgt)
        return (ds_res, jnp.zeros_like(h_tail.hi), np.float32(1.0),
                res_stage)
    if ds_kind == "normal_depth":
        # Q - K(h) sqrt(S0); df_dh = -dK_dA sqrt(S0) dA_dh (ref boundary
        # :91-92,179-180; S0 > 0 enforced at pack time)
        sq = scal[_S_SQS0]
        K_tail = DF(st["K"].hi[:, n - 1:n], st["K"].lo[:, n - 1:n])
        ds_res = Q_tail - K_tail * df(sq)
        ds_df_dh = -(st["dK_dA"][:, n - 1:n] * sq
                     * st["dA_dh"][:, n - 1:n])
        return ds_res, ds_df_dh, np.float32(1.0), res_stage
    stage_c = h_tail + df(scal[_S_STAGEC])
    q_curve = _rating_q(scal, stage_c, ds_kind, gate_open=gate_open)
    ds_res = Q_tail - q_curve
    fd = scal[_S_FD]
    qp = _rating_q(scal, stage_c + df(fd), ds_kind, gate_open=gate_open)
    qm = _rating_q(scal, stage_c - df(fd), ds_kind, gate_open=gate_open)
    ds_df_dh = -((qp - qm).value) / (2.0 * fd)
    return ds_res, ds_df_dh, np.float32(1.0), res_stage


def _assemble_fused(g, scal, roll, n, ds_kind,
                    h, Q, prev_h, prev_Q, prev_A, prev_Se, prev_Q2A, tgt,
                    us_kind="flow_hydrograph", y_old=None, k=None,
                    gate_open=None, section_fn=None, ds_tgt=None, stg=None,
                    junc=None, qlat_avg=None, y_old_us=None, stg_us=None,
                    both_storage=False):
    """df32 residual + f32 Jacobian, packed as the [16, Np] PCR system.

    Module-level (not a kernel closure) so tests can drive the exact same
    math eagerly with jnp.roll.  Returns ``(buf, err, res_stage)`` — or
    ``(buf, err, res_stage, res_stage_us)`` when ``both_storage`` is set
    (round 5: lumped storage on BOTH boundaries — the upstream row then
    carries its own stage ``y_old_us``, tables ``stg_us`` and the *_US
    scalar slot set, while the downstream row keeps the shared set).

    ``junc`` (network mode, ops/pallas/fused_network.py): a dict overriding
    selected per-sublane (per-branch) end rows with equal-stage junction
    rows (ops/network.py:_end_row_junction) and replacing the static cell
    mask with per-branch masks — ``cell_real`` [B, Np] marks real theta-box
    cells, ``pad_cell`` marks edge-pad cells that carry delta-copy equations
    (dh_{i+1}=dh_i, dQ_{i+1}=dQ_i with the pad-drift residual; the stacked
    XLA engine's padding scheme, ops/network.py:_simulate_network_stacked).
    Keys: us_mask/ds_mask [B,1] (1.0 at junction ends), Y_us/Y_ds (DF
    [B,1] junction stages), z_us/z_ds ([B,1] f32 end bed levels),
    cell_real/pad_cell ([B, Np] f32).
    """
    Np = h.hi.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    cell_mask = (idx < n - 1).astype(jnp.float32)
    is0 = (idx == 0).astype(jnp.float32)
    isl = (idx == n - 1).astype(jnp.float32)
    pad = (idx >= n).astype(jnp.float32)

    theta, dt, dx = scal[_S_THETA], scal[_S_DT], scal[_S_DX]
    gacc = np.float32(GRAVITY)
    th_dx = theta / dx
    inv2dt = 1.0 / (2.0 * dt)

    def shift_r(x):
        return roll(x, 1) * (1.0 - is0)

    def shift_l(x):
        return roll(x, Np - 1)

    def cdiff_df(x: DF):  # x[i+1] - x[i] at cell i
        return _roll_df(roll, x, Np - 1) - x

    def csum_df(x: DF):  # x[i+1] + x[i]
        return _roll_df(roll, x, Np - 1) + x

    half = df(0.5)

    st = section_fn(h) if section_fn is not None else _section_df(g, h)
    Se, dSe_dA, dSe_dQ = _energy_slope_df(g, st, Q)
    A = st["A"]
    ok = A.hi > 0.0
    Q2A = df32.where(ok, Q * Q / df32.where(ok, A, df(jnp.ones_like(A.hi))),
                     df(jnp.zeros_like(A.hi)))

    # interior residuals, df32 (ops/preissmann.py:112-132)
    dt_df, dx_df = df(dt), df(dx)
    th_df = df(theta)
    one_m_th = df(1.0) - th_df

    def tdiff(cur, prv):
        return (csum_df(cur) - csum_df(prv)) / (dt_df * df(2.0))

    def sdiff(cur, prv):
        return (th_df * cdiff_df(cur) + one_m_th * cdiff_df(prv)) / dx_df

    def cavg(cur, prv):
        return half * (th_df * csum_df(cur) + one_m_th * csum_df(prv))

    Rc = tdiff(A, prev_A) + sdiff(Q, prev_Q)
    if qlat_avg is not None:
        # constant-in-time distributed lateral inflow: the theta-weighted
        # cell average collapses to (q_i + q_{i+1})/2, a residual constant
        # with no Jacobian contribution (ops/preissmann.py:cell_stencil)
        Rc = Rc - df(qlat_avg)
    dQdt = tdiff(Q, prev_Q)
    dQ2A_dx = sdiff(Q2A, prev_Q2A)
    avgA = cavg(A, prev_A)
    dYdx = df(g[_G_DZ] / dx) + sdiff(h, prev_h)
    avgSe = cavg(Se, prev_Se)
    g_df = df(gacc)
    geom = dYdx + avgSe
    Rm = dQdt + dQ2A_dx + g_df * avgA * geom

    # boundary rows (ops/boundary.py:160-205); a tuple kind means MIXED
    # external-end kinds (network mode): evaluate each kind's row on the
    # full [B, 1] columns and SELECT per branch (masks aligned with the
    # kind tuple in junc["us_kind_masks"]/["ds_kind_masks"])
    # both-ends storage: the us rows read their own stage carry, table
    # block, and *_US scalar slots (the ds rows keep the shared set)
    us_y = y_old_us if both_storage else y_old
    us_stg = stg_us if both_storage else stg
    us_slots = _STG_US if both_storage else _STG_SHARED
    if isinstance(us_kind, tuple):
        masks = junc["us_kind_masks"]
        one_c = jnp.ones_like(masks[0])
        us_res, us_df_dh, us_df_dQ, us_res_stage = _us_row(
            us_kind[0], st, scal, h, Q, prev_h, prev_Q, tgt, us_y, k,
            us_stg, slots=us_slots)
        us_df_dh = us_df_dh * one_c
        us_df_dQ = us_df_dQ * one_c
        for kind, m in zip(us_kind[1:], masks[1:]):
            r2, dh2, dq2, st2 = _us_row(kind, st, scal, h, Q, prev_h,
                                        prev_Q, tgt, us_y, k, us_stg,
                                        slots=us_slots)
            sel = m > 0.0
            us_res = df32.where(sel, r2, us_res)
            us_df_dh = jnp.where(sel, dh2 * one_c, us_df_dh)
            us_df_dQ = jnp.where(sel, dq2 * one_c, us_df_dQ)
            if st2 is not None:
                us_res_stage = (st2 if us_res_stage is None else
                                df32.where(sel, st2, us_res_stage))
    else:
        us_res, us_df_dh, us_df_dQ, us_res_stage = _us_row(
            us_kind, st, scal, h, Q, prev_h, prev_Q, tgt, us_y, k, us_stg,
            slots=us_slots)
    if isinstance(ds_kind, tuple):
        masks = junc["ds_kind_masks"]
        one_c = jnp.ones_like(masks[0])
        _ds = _ds_row(ds_kind[0], st, scal, h, Q, prev_Q, ds_tgt, y_old, k,
                      gate_open, stg, n)
        _ds = (_ds[0], _ds[1] * one_c, _ds[2] * one_c, _ds[3])
        for kind, m in zip(ds_kind[1:], masks[1:]):
            r2, dh2, dq2, st2 = _ds_row(kind, st, scal, h, Q, prev_Q,
                                        ds_tgt, y_old, k, gate_open, stg, n)
            sel = m > 0.0
            _ds = (df32.where(sel, r2, _ds[0]),
                   jnp.where(sel, dh2 * one_c, _ds[1]),
                   jnp.where(sel, dq2 * one_c, _ds[2]),
                   df32.where(sel, st2, _ds[3]))
    else:
        _ds = _ds_row(ds_kind, st, scal, h, Q, prev_Q, ds_tgt, y_old, k,
                      gate_open, stg, n)
    ds_res, ds_df_dh, ds_df_dQ, res_stage = _ds
    h_tail = DF(h.hi[:, n - 1:n], h.lo[:, n - 1:n])

    if junc is not None:
        # equal-stage junction rows override the external end rows on the
        # branches whose end meets a junction: res = h_end + z_end - Y_j,
        # df/dh = 1, df/dQ = 0 (ops/network.py:_end_row_junction)
        jm_us, jm_ds = junc["us_mask"], junc["ds_mask"]
        h_head_j = DF(h.hi[:, 0:1], h.lo[:, 0:1])
        us_res = df32.where(jm_us > 0.0,
                            (h_head_j + df(junc["z_us"])) - junc["Y_us"],
                            us_res)
        one_c = jnp.ones_like(jm_us)
        us_df_dh = jnp.where(jm_us > 0.0, 1.0, us_df_dh * one_c)
        us_df_dQ = jnp.where(jm_us > 0.0, 0.0, us_df_dQ * one_c)
        ds_res = df32.where(jm_ds > 0.0,
                            (h_tail + df(junc["z_ds"])) - junc["Y_ds"],
                            ds_res)
        ds_df_dh = jnp.where(jm_ds > 0.0, 1.0, ds_df_dh * one_c)
        ds_df_dQ = jnp.where(jm_ds > 0.0, 0.0, ds_df_dQ * one_c)

    # f32 Jacobian entries (ops/preissmann.py:134-158)
    Af, dA_dh = A.value, st["dA_dh"]
    QA = jnp.where(Af > 0.0, Q.value / jnp.where(Af > 0.0, Af, 1.0), 0.0)
    avgAf, geomf = avgA.value, geom.value
    QA1, dA1 = shift_l(QA), shift_l(dA_dh)
    dSe1, dSeQ1 = shift_l(dSe_dA), shift_l(dSe_dQ)
    dM_dh_i = (th_dx * QA * QA * dA_dh
               + gacc * (avgAf * (-th_dx + 0.5 * theta * dSe_dA * dA_dh)
                         + 0.5 * theta * dA_dh * geomf))
    dM_dh_i1 = (-th_dx * QA1 * QA1 * dA1
                + gacc * (avgAf * (th_dx + 0.5 * theta * dSe1 * dA1)
                          + 0.5 * theta * dA1 * geomf))
    dM_dQ_i = inv2dt - th_dx * 2.0 * QA + gacc * avgAf * 0.5 * theta * dSe_dQ
    dM_dQ_i1 = inv2dt + th_dx * 2.0 * QA1 + gacc * avgAf * 0.5 * theta * dSeQ1

    # pack the 2x2-block tridiagonal system (ops/preissmann.py:172-205)
    cmask = cell_mask if junc is None else junc["cell_real"]
    Rm_e, Rc_e = Rm.value * cmask, Rc.value * cmask
    if junc is None:
        Rm_f, Rc_f = Rm_e, Rc_e
        pc = None
    else:
        # pad-cell delta-copy equations: residual = drift of the pad value
        # from its neighbor, Jacobian rows (dQ_i=-1, dQ_{i+1}=+1) /
        # (dh_i=-1, dh_{i+1}=+1) — exactly the stacked XLA engine's rows
        pc = junc["pad_cell"]
        Rm_f = Rm_e + cdiff_df(Q).value * pc
        Rc_f = Rc_e + cdiff_df(h).value * pc
    us_f = us_res.value
    ds_f = ds_res.value
    zero_row = jnp.zeros_like(Rm_f)

    L00 = shift_r(dM_dh_i * cmask)
    D00 = shift_r(dM_dh_i1 * cmask) + is0 * us_df_dh + pad  # pad: identity
    if pc is None:
        L01 = shift_r(dM_dQ_i * cmask)
        D01 = shift_r(dM_dQ_i1 * cmask) + is0 * us_df_dQ
        D10 = dA_dh * inv2dt * cmask + isl * ds_df_dh
        U10 = shift_l(dA_dh) * inv2dt * cmask
    else:
        L01 = shift_r(dM_dQ_i * cmask - pc)
        D01 = shift_r(dM_dQ_i1 * cmask + pc) + is0 * us_df_dQ
        D10 = dA_dh * inv2dt * cmask - pc + isl * ds_df_dh
        U10 = shift_l(dA_dh) * inv2dt * cmask + pc
    D11 = -th_dx * cmask + isl * ds_df_dQ + pad
    U11 = th_dx * cmask

    b0 = -(shift_r(Rm_f) + is0 * us_f)
    b1 = -(Rc_f + isl * ds_f)

    # per-member (per-sublane) pre-update residual norm, [B, 1]; pad-cell
    # drift residuals are excluded (ops/network.py stacked-engine rule)
    err2 = (jnp.sum(Rm_e * Rm_e, axis=1, keepdims=True)
            + jnp.sum(Rc_e * Rc_e, axis=1, keepdims=True)
            + us_f * us_f + ds_f * ds_f)
    err = jnp.sqrt(err2)

    if both_storage:
        bshape = Rm_f.shape
        buf = jnp.concatenate(
            [jnp.broadcast_to(r, bshape)
             for r in (L00, L01, zero_row, zero_row,
                       D00, D01, D10, D11,
                       zero_row, zero_row, U10, U11,
                       b0, b1, zero_row, zero_row)], axis=0)
        return buf, err, res_stage, us_res_stage
    if us_res_stage is not None:
        if junc is None:
            # single reach with ONE storage end: the upstream stage takes
            # the (shared) slot when the us boundary carries it
            res_stage = us_res_stage
        else:
            # network mode: different SUBLANES may carry storage on
            # different sides (branch A us-storage, branch B ds-storage) —
            # take the us stage only on branches whose EXTERNAL us end is
            # a storage kind; everywhere else keep the ds-row stage
            if isinstance(us_kind, tuple):
                m_st = jnp.zeros_like(junc["us_mask"])
                for kind, m in zip(us_kind, junc["us_kind_masks"]):
                    if kind.startswith("storage"):
                        m_st = m_st + m
            else:
                m_st = (jnp.ones_like(junc["us_mask"])
                        if us_kind.startswith("storage")
                        else jnp.zeros_like(junc["us_mask"]))
            m_st = m_st * (1.0 - junc["us_mask"])
            res_stage = df32.where(m_st > 0.0, us_res_stage, res_stage)

    # broadcast every group to the full member batch: rows built purely from
    # scalars x [1,Np] masks (e.g. U11, or D11 under a scalar ds_df_dQ) have
    # no member axis of their own
    bshape = Rm_f.shape
    buf = jnp.concatenate(
        [jnp.broadcast_to(r, bshape)
         for r in (L00, L01, zero_row, zero_row,
                   D00, D01, D10, D11,
                   zero_row, zero_row, U10, U11,
                   b0, b1, zero_row, zero_row)], axis=0)
    return buf, err, res_stage


class _LevelStreamer:
    """Double-buffered VMEM->HBM DMA streaming of per-level output rows.

    With ``out_memory="hbm"`` the stacked ``[nt, ...]`` outputs live in HBM
    (``memory_space=ANY``) instead of VMEM, so the outputs no longer count
    against the ~16 MB VMEM budget — only the per-level working set does.
    Level ``k`` writes its rows into VMEM staging slot ``k % 2`` and starts
    one DMA per output; the DMAs started two levels earlier on the same slot
    are waited first (by then they are long complete — a level's Newton solve
    takes 10-1000x a row DMA — so the streaming is fully overlapped).
    ``drain()`` waits the final in-flight slot(s) before the kernel returns.

    This lifts the batched kernel's VMEM member cap from the output-stack
    bound to the working-set bound (~18x for store="full" at the flagship
    size) and removes the single-run kernel's ``nt`` ceiling entirely
    (arbitrary-duration simulations in one dispatch).
    """

    def __init__(self, out_refs, stage_refs, sems, nt):
        self.out_refs = out_refs
        self.stage_refs = stage_refs
        self.sems = sems
        self.nt = nt

    @staticmethod
    def _i32(v):
        # python-int indices trace as i64 constants under x64, which
        # Mosaic's tpu.memref_slice rejects
        return np.int32(v) if isinstance(v, (int, np.integer)) else v

    def _dma(self, i, slot, k):
        slot, k = self._i32(slot), self._i32(k)
        return pltpu.make_async_copy(self.stage_refs[i].at[pl.ds(slot, 1)],
                                     self.out_refs[i].at[pl.ds(k, 1)],
                                     self.sems.at[slot, np.int32(i)])

    def store(self, k, rows):
        """rows[i] must be shaped like one leading-1 slice of stage_refs[i]."""
        if isinstance(k, int):  # the static pre-loop level-0 store
            assert k == 0
            slot = 0
        else:
            # parity without integer ops: the fori_loop index is a weak i64
            # under x64 and Mosaic cannot lower i64 arithmetic/compares;
            # i64->f32 conversion does lower (see the storage-branch note).
            # The DMA slice index must also be i32 (tpu.memref_slice rejects
            # i64 operands), so route k itself through f32 too.
            kf = k.astype(jnp.float32)
            slot = (kf - 2.0 * jnp.floor(kf * 0.5)).astype(jnp.int32)
            k = kf.astype(jnp.int32)

            @pl.when(kf >= np.float32(2.0))
            def _wait_previous():
                # waits the copy started at level k-2 on this slot; the
                # descriptor only needs the matching transfer shape, which
                # is level-invariant
                for i in range(len(self.out_refs)):
                    self._dma(i, slot, k).wait()

        for i, row in enumerate(rows):
            self.stage_refs[i][pl.ds(slot, 1)] = row
            self._dma(i, slot, k).start()

    def drain(self):
        # exactly one DMA is outstanding per used slot: levels 0 and 1
        # started without a prior wait, every k >= 2 waited for k-2
        for s in range(min(self.nt, 2)):
            for i in range(len(self.out_refs)):
                self._dma(i, s, s).wait()


def _out_scratch_shapes(out_shapes):
    """VMEM staging (2 slots per output) + one DMA semaphore per (slot, out)."""
    return ([pltpu.VMEM((2,) + s.shape[1:], s.dtype) for s in out_shapes]
            + [pltpu.SemaphoreType.DMA((2, len(out_shapes)))])


def _kernel(*refs, nt, n, n_sweeps, max_iter, ds_kind, us_kind, gate_init,
            geo_kind, tab_M, tab_stride, has_stg, qlat_mode, store, out_mem,
            unroll, interpret, both_storage=False, has_stg_us=False):
    refs = list(refs)
    geo_ref = refs.pop(0)
    tab_ref = refs.pop(0) if geo_kind == "table" else None
    stg_ref = refs.pop(0) if has_stg else None
    stg_us_ref = refs.pop(0) if has_stg_us else None
    qlat_ref = refs.pop(0) if qlat_mode else None
    streamer = None
    if out_mem == "hbm":
        n_out = 1 if store == "boundaries" else 5
        sems = refs.pop()
        stage_refs = [refs.pop() for _ in range(n_out)][::-1]
        out_refs = refs[-n_out:]
        refs = refs[:-n_out]
        streamer = _LevelStreamer(out_refs, stage_refs, sems, nt)
        refs += out_refs  # unpacked below exactly like the VMEM layout
    if store == "boundaries":
        (init_ref, tgt_ref, ds_tgt_ref, scal_ref, stats_ref) = refs
        dhi_ref = dlo_ref = fhi_ref = flo_ref = None
    else:
        (init_ref, tgt_ref, ds_tgt_ref, scal_ref,
         dhi_ref, dlo_ref, fhi_ref, flo_ref, stats_ref) = refs
    roll = _roll(interpret)
    geo = geo_ref[:]
    Np = geo.shape[1]
    g = [geo[r:r + 1, :] for r in range(_NG)]
    scal = [scal_ref[i] for i in range(_NS)]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    node_mask = (idx < n).astype(jnp.float32)
    tol = scal[_S_TOL]
    if geo_kind == "table":
        # pass the ref: each chunk loads only its 8-row window from VMEM
        # (ref[a:b, :] is a load; plain arrays slice identically in tests)
        section_fn = functools.partial(_section_df_table, g, tab_ref,
                                       M=tab_M, stride=tab_stride)
    else:
        section_fn = None

    def newton_iter(h, Q, prev_h, prev_Q, prev_A, prev_Se, prev_Q2A, tgt,
                    y_old, k, gate_open, ds_tgt, qlat_k, y_old_us=None):
        res = _assemble_fused(g, scal, roll, n, ds_kind,
                              h, Q, prev_h, prev_Q,
                              prev_A, prev_Se, prev_Q2A, tgt,
                              us_kind=us_kind, y_old=y_old, k=k,
                              gate_open=gate_open,
                              section_fn=section_fn,
                              ds_tgt=ds_tgt, stg=stg_ref,
                              qlat_avg=qlat_k, y_old_us=y_old_us,
                              stg_us=stg_us_ref, both_storage=both_storage)
        if both_storage:
            buf, err, res_stage, res_stage_us = res
        else:
            buf, err, res_stage = res
            res_stage_us = res_stage
        x0, x1 = _pcr_solve(buf, idx, n, n_sweeps, roll)
        h = h + df(x0 * node_mask)
        Q = Q + df(x1 * node_mask)
        return h, Q, err[0, 0], res_stage, res_stage_us

    def store_level(k, h, Q, iters, err, res_stage=np.float32(np.nan),
                    gate_open=np.float32(0.0),
                    res_stage_us=np.float32(np.nan)):
        idx128 = jax.lax.broadcasted_iota(jnp.int32, (1, stats_ref.shape[1]), 1)
        stats_row = (jnp.where(idx128 == 0, iters.astype(jnp.float32), 0.0)
                     + jnp.where(idx128 == 1, err, 0.0)
                     + jnp.where(idx128 == 2, res_stage, 0.0)
                     + jnp.where(idx128 == 3, gate_open, 0.0))
        if both_storage:
            # upstream reservoir stage rides lane 12 (both-ends storage)
            stats_row = stats_row + jnp.where(idx128 == 12, res_stage_us,
                                              0.0)
        if store == "boundaries":
            # boundary-node (h, Q) df32 halves ride lanes 4-11 of the stats
            # row (same packing as _kernel_batched.store_level): the
            # per-level VMEM output shrinks from 4*Np+128 to 128 lanes,
            # lifting the nt ceiling for long Monte-Carlo-style runs
            for lane, val in ((4, h.hi[:, 0:1]), (5, h.lo[:, 0:1]),
                              (6, h.hi[:, n - 1:n]), (7, h.lo[:, n - 1:n]),
                              (8, Q.hi[:, 0:1]), (9, Q.lo[:, 0:1]),
                              (10, Q.hi[:, n - 1:n]), (11, Q.lo[:, n - 1:n])):
                stats_row = stats_row + jnp.where(idx128 == lane, val, 0.0)
            if streamer is not None:
                streamer.store(k, [stats_row])
            else:
                stats_ref[pl.ds(k, 1), :] = stats_row
            return
        if streamer is not None:
            streamer.store(k, [h.hi, h.lo, Q.hi, Q.lo, stats_row])
            return
        dhi_ref[pl.ds(k, 1), :] = h.hi
        dlo_ref[pl.ds(k, 1), :] = h.lo
        fhi_ref[pl.ds(k, 1), :] = Q.hi
        flo_ref[pl.ds(k, 1), :] = Q.lo
        stats_ref[pl.ds(k, 1), :] = stats_row

    init = init_ref[:]
    h0 = DF(init[0:1, :], init[1:2, :])
    Q0 = DF(init[2:3, :], init[3:4, :])
    store_level(0, h0, Q0, np.int32(0), np.float32(0.0),
                gate_open=np.float32(gate_init))

    def _run_levels(level_body):
        # df32 EFT fence (see df32._fz): active for the whole traced body,
        # released when tracing finishes so no tracer leaks into later traces
        with df32.fenced(scal[_S_ZERO]):
            zrow = jnp.zeros((1, 1), jnp.float32)
            gstage0 = scal[_S_DSBED] + h0.hi[0:1, n - 1:n] + h0.lo[0:1, n - 1:n]
            carry0 = (h0.hi, h0.lo, Q0.hi, Q0.lo, zrow, zrow,
                      zrow + np.float32(gate_init), zrow,
                      zrow - np.float32(1.0), gstage0)
            if both_storage:
                # + the upstream reservoir's own stage carry (df32 halves)
                carry0 = carry0 + (zrow, zrow)
            jax.lax.fori_loop(1, nt, level_body, carry0)

    def level_body(k, carry):
        (h_hi, h_lo, Q_hi, Q_lo, y_hi, y_lo,
         gopen, gcool, gptime, gstage) = carry[:10]
        h, Q = DF(h_hi, h_lo), DF(Q_hi, Q_lo)
        y_old = DF(y_hi, y_lo)
        y_old_us = DF(carry[10], carry[11]) if both_storage else None

        if ds_kind == "gated_blend":
            # per-level gate-controller update (ops/rating_curve.py:168-182;
            # ref roseires_rating_curve.py:111-141), on [1,1] vector values
            time = k.astype(jnp.float32) * scal[_S_DT]
            elapsed = jnp.where(gptime >= 0.0, time - gptime, 0.0)
            gcool = jnp.maximum(0.0, gcool - elapsed)
            can_act = gcool <= 0.0
            want_open = (gstage >= scal[_S_PIVOT] + 0.5) & (gopen < 0.5)
            want_close = (gstage <= scal[_S_PIVOT] - 1.0) & (gopen > 0.5)
            do_open = can_act & want_open
            do_close = can_act & want_close
            gopen = jnp.where(do_open, 1.0, jnp.where(do_close, 0.0, gopen))
            gcool = jnp.where(do_open | do_close, scal[_S_MAXCD], gcool)
            gptime = jnp.zeros_like(gptime) + time

        prev_A, prev_Se, prev_Q2A = _level_state(g, h, Q, section_fn=section_fn)
        tgt = tgt_ref[k]
        ds_tgt = ds_tgt_ref[k]
        if qlat_mode == "tv":
            # per-level theta-weighted cell averages, precomputed host-side
            qlat_k = qlat_ref[pl.ds(k, 1), :]
        elif qlat_mode == "const":
            qlat_k = qlat_ref[:]
        else:
            qlat_k = None

        def cond(c):
            err, it = c[4], c[5]
            return (err >= tol) & (it < max_iter)

        def body(c):
            # `unroll` Newton iterations per while trip: the loop-carry
            # overhead is ~2/3 of the per-iteration cost at N=121 (measured:
            # 5.6 us trip floor vs 2.9 us body; scripts/bench_fused_micro.py),
            # so unrolling amortizes it.  Iterations after the first are
            # masked on the previous pre-update residual, which reproduces
            # the sequential trajectory and iteration counts exactly; the
            # tradeoff is up to (unroll-1) masked-out extra evaluations at
            # each level's convergence boundary.
            hh, hl, qh, ql, _, it = c[:6]
            h1, Q1, e1, rs1, ru1 = newton_iter(DF(hh, hl), DF(qh, ql), h, Q,
                                               prev_A, prev_Se, prev_Q2A,
                                               tgt, y_old, k, gopen, ds_tgt,
                                               qlat_k, y_old_us=y_old_us)
            st = (h1, Q1, e1, it + np.int32(1), rs1.hi[0, 0], rs1.lo[0, 0],
                  ru1.hi[0, 0], ru1.lo[0, 0])
            for _ in range(unroll - 1):
                hp, Qp, ep, itv, rh, rl, ruh, rul = st
                cont = (ep >= tol) & (itv < max_iter)
                h2, Q2, e2, rs2, ru2 = newton_iter(hp, Qp, h, Q,
                                                   prev_A, prev_Se,
                                                   prev_Q2A, tgt,
                                                   y_old, k, gopen, ds_tgt,
                                                   qlat_k,
                                                   y_old_us=y_old_us)
                pick = lambda a, b: jnp.where(cont, a, b)
                st = (DF(pick(h2.hi, hp.hi), pick(h2.lo, hp.lo)),
                      DF(pick(Q2.hi, Qp.hi), pick(Q2.lo, Qp.lo)),
                      pick(e2, ep), itv + cont.astype(jnp.int32),
                      pick(rs2.hi[0, 0], rh), pick(rs2.lo[0, 0], rl),
                      pick(ru2.hi[0, 0], ruh), pick(ru2.lo[0, 0], rul))
            hf, Qf, ef, itf, rhf, rlf, ruhf, rulf = st
            out = (hf.hi, hf.lo, Qf.hi, Qf.lo, ef, itf, rhf, rlf)
            return out + ((ruhf, rulf) if both_storage else ())

        wc0 = (h.hi, h.lo, Q.hi, Q.lo, np.float32(np.inf), np.int32(0),
               y_hi[0, 0] * 1.0, y_lo[0, 0] * 1.0)
        if both_storage:
            wc0 = wc0 + (carry[10][0, 0] * 1.0, carry[11][0, 0] * 1.0)
        wout = jax.lax.while_loop(cond, body, wc0)
        hh, hl, qh, ql, err, iters, rs_hi, rs_lo = wout[:8]
        rs_row_hi = jnp.full_like(y_hi, 0.0) + rs_hi
        rs_row_lo = jnp.full_like(y_lo, 0.0) + rs_lo
        gstage = scal[_S_DSBED] + hh[0:1, n - 1:n] + hl[0:1, n - 1:n]
        rsu = (wout[8] + wout[9]) if both_storage else np.float32(np.nan)
        store_level(k, DF(hh, hl), DF(qh, ql), iters, err,
                    res_stage=rs_hi + rs_lo, gate_open=gopen[0, 0],
                    res_stage_us=rsu)
        out = (hh, hl, qh, ql, rs_row_hi, rs_row_lo,
               gopen, gcool, gptime, gstage)
        if both_storage:
            out = out + (jnp.full_like(y_hi, 0.0) + wout[8],
                         jnp.full_like(y_lo, 0.0) + wout[9])
        return out

    _run_levels(level_body)
    if streamer is not None:
        streamer.drain()


@functools.lru_cache(maxsize=64)
def _build_call(*, nt, n, Np, tgt_len, n_sweeps, max_iter, ds_kind, us_kind,
                gate_init, interpret, geo_kind="trap", tab_M=0, tab_stride=0,
                has_stg=False, qlat_mode=None, store="full", out_mem="vmem",
                unroll=2, both_storage=False, has_stg_us=False):
    """Cache the pallas_call wrapper per static configuration.

    Rebuilding the closure per invocation defeats jax's trace cache: every
    ``fused_simulate`` call would retrace + re-lower the whole 385-level
    kernel (~5 s on v5e) even though the compiled executable is identical —
    measured as the entire gap between the 8.5 us/iteration kernel body
    (scripts/bench_fused_micro.py) and the first end-to-end timing.
    """
    kern = functools.partial(
        _kernel, nt=nt, n=n, n_sweeps=n_sweeps, max_iter=max_iter,
        ds_kind=ds_kind, us_kind=us_kind, gate_init=gate_init,
        geo_kind=geo_kind, tab_M=tab_M, tab_stride=tab_stride,
        has_stg=has_stg, qlat_mode=qlat_mode, store=store, out_mem=out_mem,
        unroll=unroll, interpret=interpret, both_storage=both_storage,
        has_stg_us=has_stg_us)
    if store == "boundaries":
        out_shapes = [
            jax.ShapeDtypeStruct((nt, 128), jnp.float32),  # stats+bnd
        ]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((nt, Np), jnp.float32),  # depth hi
            jax.ShapeDtypeStruct((nt, Np), jnp.float32),  # depth lo
            jax.ShapeDtypeStruct((nt, Np), jnp.float32),  # flow hi
            jax.ShapeDtypeStruct((nt, Np), jnp.float32),  # flow lo
            jax.ShapeDtypeStruct((nt, 128), jnp.float32),  # stats
        ]
    out_space = pl.ANY if out_mem == "hbm" else pltpu.VMEM
    # jax.jit so repeat calls hit the executable cache (a bare pallas_call
    # wrapper re-traces on every invocation)
    return jax.jit(pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)]
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]
               if geo_kind == "table" else [])
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if has_stg else [])
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if has_stg_us else [])
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if qlat_mode else [])
            + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # us target series
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ds target series
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            ]
        ),
        out_specs=[pl.BlockSpec(memory_space=out_space)] * len(out_shapes),
        scratch_shapes=(_out_scratch_shapes(out_shapes)
                        if out_mem == "hbm" else []),
        interpret=interpret,
    ))


class FusedUnsupported(Exception):
    """Raised when the configuration is outside the fused kernel's scope."""


_TAB_VMEM_BYTES = 6 * 1024 * 1024  # budget for the 7 lookup tables


def _check_supported(geo, us_bc, ds_bc, settings):
    from flowsim_tpu.geometry import TableGeometry, TrapezoidGeometry

    if isinstance(geo, TableGeometry):
        if geo.area.ndim != 2:
            raise FusedUnsupported("batched TableGeometry is not supported")
        M = geo.area.shape[-1]
        Np = max(128, -(-geo.n_nodes // 128) * 128)
        if _NT * M * Np * 4 > _TAB_VMEM_BYTES:
            raise FusedUnsupported(
                f"lookup tables ({_NT}x{M}x{Np} f32) exceed the VMEM budget; "
                "rebuild with fewer samples or a shorter reach")
    elif not isinstance(geo, TrapezoidGeometry):
        raise FusedUnsupported(
            "fused kernel supports TrapezoidGeometry and TableGeometry only")
    if us_bc.kind not in ("flow_hydrograph", "stage_hydrograph",
                          "fixed_depth", "normal_depth", "rating_curve"):
        raise FusedUnsupported(f"unknown upstream BC kind {us_bc.kind!r}")
    if us_bc.kind == "normal_depth":
        s0 = float(np.asarray(us_bc.bed_slope, np.float64))
        if not np.isfinite(s0) or s0 <= 0.0:
            raise FusedUnsupported("normal_depth upstream BC needs S0 > 0")
    if us_bc.kind == "rating_curve":
        if us_bc.rating is None or us_bc.rating.kind not in ("polynomial",
                                                             "blended_poly"):
            raise FusedUnsupported(
                "upstream rating curve must be polynomial or blended_poly "
                "(the gate controller is downstream-only)")
        if np.asarray(us_bc.rating.coeffs).shape[-1] != 3:
            raise FusedUnsupported("fused rating rows pack quadratics "
                                   "(3 coefficients)")
    us_sp = us_bc.storage if us_bc.kind == "fixed_depth" else None
    ds_sp = ds_bc.storage if ds_bc.kind == "fixed_depth" else None
    # storage on BOTH boundaries is in-kernel since round 5: the upstream
    # reservoir gets its own stage carry, *_US scalar slots, and (for
    # curve/rating/loss storage) a second stage-grid table input
    for sp in (us_sp, ds_sp):
        if sp is not None and sp.has_rating and sp.rating.kind == "gated_blend":
            raise FusedUnsupported(
                "a gated_blend rating on the storage itself is unsupported "
                "(the XLA mass balance cannot evaluate it either)")
    if ds_bc.kind == "normal_depth":
        s0 = float(np.asarray(ds_bc.bed_slope, np.float64))
        if not np.isfinite(s0) or s0 <= 0.0:
            raise FusedUnsupported("normal_depth downstream BC needs S0 > 0")
    elif ds_bc.kind == "rating_curve" and ds_bc.rating is not None:
        if ds_bc.rating.kind not in ("polynomial", "blended_poly", "gated_blend"):
            raise FusedUnsupported(f"unsupported rating kind {ds_bc.rating.kind!r}")
        if np.asarray(ds_bc.rating.coeffs).shape[-1] != 3:
            raise FusedUnsupported("fused rating rows pack quadratics "
                                   "(3 coefficients)")
    elif ds_bc.kind in ("fixed_depth", "stage_hydrograph", "flow_hydrograph"):
        pass  # fixed_h / flow_q kernel paths (storage handled above)
    else:
        raise FusedUnsupported(f"unknown downstream BC kind {ds_bc.kind!r}")
    if settings.newton != "while":
        raise FusedUnsupported("fused kernel implements the while-Newton only")
    n = geo.n_nodes
    if n > MAX_VMEM_N:
        raise FusedUnsupported(f"N={n} exceeds the VMEM kernel limit {MAX_VMEM_N}")


def _storage_mode(sp) -> str:
    """Kernel path for a StorageParams: closed-form constant-area
    ("storage_simple") or the tabulated general path ("storage_curve[_hl]")."""
    if sp.has_area_curve or sp.has_rating:
        return "storage_curve_hl" if sp.capture_losses else "storage_curve"
    return "storage_curve_hl" if sp.capture_losses else "storage_simple"


def _pack_storage_tables(sp, dt: float):
    """Tabulate V(Y), q(Y), g(Y) = V + dt/2 q, and A(Y) on a uniform
    ``_STG_P``-point stage grid over the solution bracket (split-f64 rows
    for the df32 residual path, f32 for the area).

    Constant-area storages get the exact linear V = SA (Y - y_min), so the
    kernel's piecewise-linear inverse is exact for them; curve storages
    resample the dense pack-time tables of :func:`ops.storage.make_storage`.
    Returns (rows[_NSTG*_STG_SR, 128] f32, scalars dict).
    """
    from flowsim_tpu.ops import rating_curve as rcurve

    y_min = float(np.asarray(sp.y_min, np.float64))
    y_max = float(np.asarray(sp.y_max, np.float64))
    grid = np.linspace(y_min, y_max, _STG_P)
    if sp.has_area_curve:
        V = np.interp(grid, np.asarray(sp.vol_stage, np.float64),
                      np.asarray(sp.vol_table, np.float64))
        A = np.interp(grid + float(np.asarray(sp.beta, np.float64)),
                      np.asarray(sp.area_stage, np.float64),
                      np.asarray(sp.area_table, np.float64))
    else:
        sa = float(np.asarray(sp.surface_area, np.float64))
        V = sa * (grid - y_min)
        A = np.full(_STG_P, sa)
    if sp.has_rating:
        q = np.asarray(jax.device_get(rcurve.discharge(sp.rating,
                                                       jnp.asarray(grid))),
                       np.float64)
    else:
        q = np.zeros(_STG_P)
    gtab = V + 0.5 * dt * q
    if not np.all(np.diff(gtab) > 0.0):
        raise FusedUnsupported(
            "storage mass-balance function g(Y) = V(Y) + dt/2 q(Y) is not "
            "strictly increasing on the solution bracket (check the storage "
            "rating curve's sign)")

    def split(x):
        hi = x.astype(np.float32)
        return hi, (x - hi.astype(np.float64)).astype(np.float32)

    rows = np.zeros((_NSTG * _STG_SR, 128), np.float32)
    for t_hi, t_lo, arr in ((_STG_VHI, _STG_VLO, V), (_STG_QHI, _STG_QLO, q),
                            (_STG_GHI, _STG_GLO, gtab)):
        hi, lo = split(arr)
        rows[t_hi * _STG_SR:(t_hi + 1) * _STG_SR] = hi.reshape(_STG_SR, 128)
        rows[t_lo * _STG_SR:(t_lo + 1) * _STG_SR] = lo.reshape(_STG_SR, 128)
    rows[_STG_A * _STG_SR:(_STG_A + 1) * _STG_SR] = \
        A.astype(np.float32).reshape(_STG_SR, 128)
    dy = (y_max - y_min) / (_STG_P - 1)
    scalars = {
        _S_STG_YMIN: y_min, _S_STG_INVDY: 1.0 / dy, _S_STG_DY: dy,
        _S_STG_LRES: float(np.asarray(sp.reservoir_length, np.float64)),
        _S_STG_KQ: float(np.asarray(sp.K_q, np.float64)),
        _S_MINSTAGE: float(np.asarray(sp.min_stage, np.float64)),
    }
    return rows, scalars


def _qlat_tv_cells(q, theta):
    """[nt-1, n-1] theta-weighted cell averages of a [nt, n] inflow field
    (ops/preissmann.py:cell_stencil's cavg applied to the source term;
    shared by every kernel's host-side time-varying qlat pack)."""
    q = np.asarray(q, np.float64)
    qc, qp = q[1:], q[:-1]
    return (0.5 * theta * (qc[:, :-1] + qc[:, 1:])
            + 0.5 * (1.0 - theta) * (qp[:, :-1] + qp[:, 1:]))


def _stream_qlat_row(qlat_ref, qstage, qsem, k):
    """DMA level ``k``'s row of the HBM inflow stack into the VMEM staging
    slot and return it (blocking — the copy is ~1000x shorter than a level
    solve; the loop index routes i64->f32->i32 for Mosaic's memref_slice).
    Shared by every kernel's time-varying qlat path."""
    k32 = k.astype(jnp.float32).astype(jnp.int32)
    cp = pltpu.make_async_copy(qlat_ref.at[pl.ds(k32, 1)], qstage, qsem)
    cp.start()
    cp.wait()
    return qstage[0]


def _stack_storage_rows(rows_list):
    """Interleave per-sublane storage tables for the batched/network
    kernels: row (t*SR + c)*B + b (``_stg_blk``'s layout; B=1 collapses to
    the single-run layout).  ``None`` entries (sublanes without a storage
    end) get all-zero tables — every value they produce is finite and is
    discarded by the kind/junction selection masks."""
    B = len(rows_list)
    out = np.zeros((_NSTG * _STG_SR * B, 128), np.float32)
    for b, r in enumerate(rows_list):
        if r is not None:
            out[b::B] = r
    return out


def _split64(x):
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    return hi, (x - hi.astype(np.float64)).astype(np.float32)


def _pack_trap_rows(geo, n, Np):
    """numpy ``[_NG, Np]`` f32 geometry rows for one TrapezoidGeometry."""
    f32 = np.float32
    a = lambda x: np.asarray(x, np.float64)
    z = a(geo.z_bed)
    dz = np.zeros(n)
    dz[: n - 1] = z[1:] - z[:-1]
    rows = np.zeros((_NG, Np), f32)

    def put(r, v):
        rows[r, :n] = np.asarray(v, f32)

    m_main, m_fp = a(geo.m_main), a(geo.m_fp)
    compound = np.asarray(geo.compound, bool)
    h_bank = np.where(compound, a(geo.h_bank), 1.0)
    T_bank = a(geo.b_main) + 2.0 * m_main * h_bank
    A_mf = (a(geo.b_main) + T_bank) / 2.0 * h_bank
    P_mf = a(geo.b_main) + 2.0 * h_bank * np.sqrt(1.0 + m_main**2)

    put(_G_B_MAIN, geo.b_main); put(_G_M_MAIN, geo.m_main)
    put(_G_H_BANK, h_bank); put(_G_COMPOUND, compound.astype(f32))
    put(_G_B_FPL, geo.b_fp_left); put(_G_B_FPR, geo.b_fp_right)
    put(_G_M_FP, geo.m_fp)
    put(_G_N_MAIN, geo.n_main); put(_G_N_LEFT, geo.n_left)
    put(_G_N_RIGHT, geo.n_right); put(_G_CURV, geo.curvature)
    put(_G_DZ, dz)
    put(_G_SQM, np.sqrt(1.0 + m_main**2))
    put(_G_SQFP, np.sqrt(1.0 + m_fp**2))
    put(_G_AMF, A_mf); put(_G_PMF, P_mf); put(_G_TBANK, T_bank)
    # padded Manning n must be nonzero (divisor); geometry rows stay 0
    rows[_G_N_MAIN, n:] = 1.0
    rows[_G_N_LEFT, n:] = 1.0
    rows[_G_N_RIGHT, n:] = 1.0
    return rows


def _pack_init(h0, Q0, n, Np):
    init = np.zeros((4, Np), np.float32)
    init[0, :n], init[1, :n] = _split64(h0)
    init[2, :n], init[3, :n] = _split64(Q0)
    return init


def _pack_us_series(us_bc, nt):
    """Per-level upstream target series as numpy f64 ``[nt]``."""
    if us_bc.kind == "fixed_depth" and us_bc.storage is None:
        # constant target (ops/boundary.py:185-187): a constant series
        return np.full(nt, float(np.asarray(us_bc.initial_depth, np.float64)))
    if us_bc.kind in ("normal_depth", "rating_curve", "fixed_depth"):
        return np.zeros(nt)  # no target series for these residuals
    series = np.asarray(us_bc.target_series, np.float64)[:nt]
    if us_bc.kind == "stage_hydrograph":
        # residual is h - (target - bed_level): bake the datum in
        series = series - float(np.asarray(us_bc.bed_level, np.float64))
    out = np.zeros(nt)
    out[: len(series)] = series
    return out


def _pack_ds_config(ds_bc, settings, scal, nt):
    """Fill the downstream scal slots; returns (ds_kind, series[nt], stg)."""
    rc = ds_bc.rating
    bed = float(np.asarray(ds_bc.bed_level, np.float64))
    stg_rows = None
    ds_series = np.zeros(nt)
    if ds_bc.kind == "fixed_depth" and ds_bc.storage is not None:
        sp = ds_bc.storage
        scal[_S_DSBED] = bed
        ds_kind = _storage_mode(sp)
        if ds_kind == "storage_simple":
            scal[_S_SA] = float(np.asarray(sp.surface_area, np.float64))
            scal[_S_MINSTAGE] = float(np.asarray(sp.min_stage, np.float64))
        else:
            stg_rows, s_stg = _pack_storage_tables(sp, settings.time_step)
            for slot, v in s_stg.items():
                scal[slot] = v
    elif ds_bc.kind == "flow_hydrograph":
        ds_kind = "flow_q"
        series = np.asarray(ds_bc.target_series, np.float64)[:nt]
        ds_series[: len(series)] = series
    elif ds_bc.kind == "fixed_depth":
        ds_kind = "fixed_h"
        ds_series[:] = float(np.asarray(ds_bc.initial_depth, np.float64))
    elif ds_bc.kind == "stage_hydrograph":
        ds_kind = "fixed_h"
        series = np.asarray(ds_bc.target_series, np.float64)[:nt] - bed
        ds_series[: len(series)] = series
    elif ds_bc.kind == "normal_depth":
        scal[_S_SQS0] = np.sqrt(float(np.asarray(ds_bc.bed_slope, np.float64)))
        ds_kind = "normal_depth"
    elif rc.kind == "polynomial":
        ds_kind = "polynomial"
        c = np.asarray(rc.coeffs, np.float64)
        scal[_S_C2], scal[_S_C1], scal[_S_C0] = c
        # stage_c = (bed + h) + shift  ->  offset = bed + shift
        scal[_S_STAGEC] = bed + float(np.asarray(rc.stage_shift, np.float64))
        scal[_S_FD] = 1.0  # unused (analytic path still uses FD; harmless)
        scal[_S_BUF] = 1.0
    else:
        ds_kind = rc.kind  # blended_poly | gated_blend
        scal[_S_C2], scal[_S_C1], scal[_S_C0] = np.asarray(rc.coeffs, np.float64)
        scal[_S_D2], scal[_S_D1], scal[_S_D0] = np.asarray(rc.coeffs_high, np.float64)
        scal[_S_STAGEC] = bed - float(np.asarray(rc.pivot_stage, np.float64))
        scal[_S_BUF] = float(np.asarray(rc.buffer, np.float64))
        scal[_S_FD] = float(np.asarray(rc.fd_step, np.float64))
        if rc.kind == "gated_blend":
            scal[_S_PIVOT] = float(np.asarray(rc.pivot_stage, np.float64))
            scal[_S_MAXCD] = float(np.asarray(rc.max_cooldown, np.float64))
            scal[_S_DSBED] = bed
    return ds_kind, ds_series, stg_rows


def _pack_us_config(us_bc, settings, scal, stg_slots=_STG_SHARED):
    """Fill the upstream scal slots; returns (us_kind_str, stg_rows).

    ``stg_slots``: where the upstream STORAGE scalars land — the shared set
    (single storage end, the default) or ``_STG_US`` when both boundaries
    carry storage (the caller decides; the kernel's ``both_storage`` flag
    must agree)."""
    us_kind_str = us_bc.kind
    stg_rows = None
    if us_bc.kind == "normal_depth":
        scal[_S_SQS0_US] = np.sqrt(
            float(np.asarray(us_bc.bed_slope, np.float64)))
    elif us_bc.kind == "rating_curve":
        rcu = us_bc.rating
        ubed = float(np.asarray(us_bc.bed_level, np.float64))
        c = np.asarray(rcu.coeffs, np.float64)
        scal[_S_UC2], scal[_S_UC1], scal[_S_UC0] = c
        if rcu.kind == "polynomial":
            us_kind_str = "rating_poly"
            scal[_S_USTAGEC] = ubed + float(np.asarray(rcu.stage_shift,
                                                       np.float64))
            scal[_S_UFD] = 1.0  # central diff is exact for the quadratic
            scal[_S_UBUF] = 1.0
        else:
            us_kind_str = "rating_blend"
            ch = np.asarray(rcu.coeffs_high, np.float64)
            scal[_S_UD2], scal[_S_UD1], scal[_S_UD0] = ch
            scal[_S_USTAGEC] = ubed - float(np.asarray(rcu.pivot_stage,
                                                       np.float64))
            scal[_S_UBUF] = float(np.asarray(rcu.buffer, np.float64))
            scal[_S_UFD] = float(np.asarray(rcu.fd_step, np.float64))
    elif us_bc.kind == "fixed_depth" and us_bc.storage is not None:
        sp = us_bc.storage
        us_kind_str = _storage_mode(sp)
        scal[_S_USBED] = float(np.asarray(us_bc.bed_level, np.float64))
        if us_kind_str == "storage_simple":
            scal[stg_slots.sa] = float(np.asarray(sp.surface_area,
                                                  np.float64))
            scal[stg_slots.minstage] = float(np.asarray(sp.min_stage,
                                                        np.float64))
        else:
            stg_rows, s_stg = _pack_storage_tables(sp, settings.time_step)
            remap = {getattr(_STG_SHARED, f): getattr(stg_slots, f)
                     for f in _StgSlots._fields}
            for slot, v in s_stg.items():
                scal[remap.get(slot, slot)] = v
    return us_kind_str, stg_rows


def fused_simulate(geo, us_bc, ds_bc, h0, Q0, settings, interpret: bool = False,
                   lateral_inflow=None):
    """Run the full simulation in one Pallas kernel; returns a SimOutput.

    ``lateral_inflow``: optional distributed source q [m^2/s], per-node [N]
    (constant) or per-level [nt, N] — same contract as
    :func:`ops.preissmann.simulate` (theta-weighted cell averages are
    precomputed host-side; a residual constant with no Jacobian term).

    Raises :class:`FusedUnsupported` for configurations outside the kernel's
    scope (callers fall back to :func:`ops.preissmann.simulate`).
    """
    from flowsim_tpu.ops.preissmann import SimOutput

    _check_supported(geo, us_bc, ds_bc, settings)
    n = geo.n_nodes
    nt = settings.n_time_levels
    Np = max(128, -(-n // 128) * 128)
    store = getattr(settings, "store", "full")
    n_sweeps = max(1, (n - 1).bit_length())

    f32 = np.float32

    qlat_mode = None
    qlat_rows = None
    if lateral_inflow is not None:
        q = np.asarray(lateral_inflow, np.float64)
        if q.shape[-1] != n or q.ndim not in (1, 2) or (
                q.ndim == 2 and q.shape[0] != nt):
            raise ValueError(
                f"lateral_inflow must be [N={n}] or [nt={nt}, N]; got "
                f"{q.shape}")
        if q.ndim == 1:
            qlat_mode = "const"
            qlat_rows = np.zeros((1, Np), f32)
            qlat_rows[0, : n - 1] = (0.5 * (q[:-1] + q[1:])).astype(f32)
        else:
            qlat_mode = "tv"
            qlat_rows = np.zeros((max(nt, 8), Np), f32)
            qlat_rows[1:nt, : n - 1] = _qlat_tv_cells(
                q, float(settings.theta)).astype(f32)
            if nt * Np * 4 > 2 * 1024 * 1024:
                raise FusedUnsupported(
                    "time-varying lateral inflow rows exceed the VMEM "
                    "side budget at this nt; use the XLA path")

    # when the [nt, ...] output stacks don't fit VMEM, stream them to HBM
    # (arbitrary-duration runs in one dispatch; see _LevelStreamer).  The
    # qlat VMEM rows (parsed above) count against the same budget, so a
    # config near the boundary cannot pick "vmem" and then blow real VMEM.
    qlat_bytes = 0 if qlat_rows is None else qlat_rows.size * 4
    out_mem = _pick_out_mem(settings, nt, Np, store,
                            extra_per_member=qlat_bytes)

    from flowsim_tpu.geometry import TableGeometry

    is_table = isinstance(geo, TableGeometry)
    if is_table:
        a = lambda x: np.asarray(x, np.float64)
        z = a(geo.z_bed)
        dz = np.zeros(n)
        dz[: n - 1] = z[1:] - z[:-1]

        rows = np.zeros((_NG, Np), f32)

        def put(r, v):
            rows[r, :n] = np.asarray(v, f32)

        tab_M = geo.area.shape[-1]
        # stride: M rounded up to a vreg (8 rows) plus one extra vreg so the
        # j+1 shifted window of the last chunk stays inside this table
        tab_stride = -(-tab_M // 8) * 8 + 8
        put(_TG_INVDG, (tab_M - 1) / a(geo.depth_max))
        put(_G_CURV, geo.curvature)
        put(_G_DZ, dz)
        # pad lanes/rows benignly: unit A/P/T/K/n_eq (finite closures on dry
        # padded nodes), zero derivative tables
        benign = (1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0)
        tabs = np.zeros((_NT * tab_stride, Np), f32)
        for t, arr in enumerate((geo.area, geo.perimeter, geo.top_width,
                                 geo.conveyance, geo.n_eq,
                                 geo.dK_dA, geo.dR_dA)):
            block = np.full((tab_stride, Np), benign[t], f32)
            a2 = np.asarray(arr, np.float64).T.astype(f32)  # [M, N]
            block[:tab_M, :n] = a2
            block[tab_M:, :n] = a2[-1]  # replicate the last sample row
            tabs[t * tab_stride:(t + 1) * tab_stride] = block
    else:
        tab_M = tab_stride = 0
        rows = _pack_trap_rows(geo, n, Np)

    init = _pack_init(h0, Q0, n, Np)

    tgt = np.zeros((max(nt, 8),), f32)
    tgt[:nt] = _pack_us_series(us_bc, nt).astype(f32)

    scal = np.zeros((_NS,), f32)
    scal[_S_THETA] = settings.theta
    scal[_S_DT] = settings.time_step
    scal[_S_DX] = settings.spatial_step
    scal[_S_TOL] = settings.tolerance
    ds_kind, ds_series, stg_rows = _pack_ds_config(ds_bc, settings, scal, nt)
    ds_tgt = np.zeros((max(nt, 8),), f32)
    ds_tgt[:nt] = ds_series.astype(f32)
    both_storage = (us_bc.kind == "fixed_depth" and us_bc.storage is not None
                    and ds_bc.kind == "fixed_depth"
                    and ds_bc.storage is not None)
    us_kind_str, stg_us = _pack_us_config(
        us_bc, settings, scal,
        stg_slots=_STG_US if both_storage else _STG_SHARED)
    if stg_us is not None and not both_storage:
        # single storage end: whichever side carries it uses the shared
        # slots + the one stg input (the pre-round-5 convention)
        stg_rows = stg_us
        stg_us = None
    if not both_storage:
        stg_us = None

    call = _build_call(nt=nt, n=n, Np=Np, tgt_len=len(tgt),
                       n_sweeps=n_sweeps, max_iter=settings.max_iter,
                       ds_kind=ds_kind, us_kind=us_kind_str,
                       gate_init=1.0 if settings.gate_initially_open else 0.0,
                       geo_kind="table" if is_table else "trap",
                       tab_M=tab_M, tab_stride=tab_stride,
                       has_stg=stg_rows is not None, qlat_mode=qlat_mode,
                       store=store, out_mem=out_mem,
                       unroll=max(1, int(getattr(settings, "fused_unroll", 2))),
                       both_storage=both_storage,
                       has_stg_us=stg_us is not None,
                       interpret=interpret)
    ins = [jnp.asarray(rows)]
    if is_table:
        ins.append(jnp.asarray(tabs))
    if stg_rows is not None:
        ins.append(jnp.asarray(stg_rows))
    if stg_us is not None:
        ins.append(jnp.asarray(stg_us))
    if qlat_mode:
        ins.append(jnp.asarray(qlat_rows))
    ins += [jnp.asarray(init), jnp.asarray(tgt), jnp.asarray(ds_tgt),
            jnp.asarray(scal)]
    outs = call(*ins)

    out_dtype = jnp.asarray(h0).dtype

    def df_sum(hi, lo):
        if out_dtype == jnp.float64:
            return hi.astype(jnp.float64) + lo.astype(jnp.float64)
        return (hi + lo).astype(out_dtype)

    if store == "boundaries":
        # same output contract as prs.simulate (ops/preissmann.py store=
        # "boundaries"): the two boundary nodes of each level, unpacked
        # from lanes 4-11 of the in-kernel stats row (the kernel never
        # materializes the [nt, Np] depth/flow stacks in VMEM)
        (stats,) = outs
        depth = jnp.stack([df_sum(stats[:, 4], stats[:, 5]),
                           df_sum(stats[:, 6], stats[:, 7])], axis=-1)
        flow = jnp.stack([df_sum(stats[:, 8], stats[:, 9]),
                          df_sum(stats[:, 10], stats[:, 11])], axis=-1)
    else:
        dhi, dlo, fhi, flo, stats = outs
        depth = df_sum(dhi, dlo)[:, :n]
        flow = df_sum(fhi, flo)[:, :n]
    iters = stats[:, 0].astype(jnp.int32)
    errs = stats[:, 1].astype(out_dtype)
    nanv = jnp.full((nt,), jnp.nan, out_dtype)
    if ds_kind.startswith("storage") or us_kind_str.startswith("storage"):
        res_stage = stats[:, 2].astype(out_dtype)
        res_stage = jnp.where(jnp.arange(nt) == 0, jnp.nan, res_stage)
    else:
        res_stage = nanv
    if both_storage:
        # upstream reservoir stage rides lane 12 (see _kernel.store_level);
        # the merged lane-2 slot keeps the ds stage, like the XLA BCState
        res_stage_us = stats[:, 12].astype(out_dtype)
        res_stage_us = jnp.where(jnp.arange(nt) == 0, jnp.nan, res_stage_us)
    else:
        res_stage_us = None
    converged = (errs < settings.tolerance) | (jnp.arange(nt) == 0)
    if ds_kind == "gated_blend":
        gate_open = stats[:, 3].astype(out_dtype)
    else:
        gate_open = jnp.full(
            (nt,), 1.0 if settings.gate_initially_open else 0.0, out_dtype)
    return SimOutput(
        depth=depth, flow=flow, iterations=iters, error=errs,
        converged=converged, reservoir_stage=res_stage,
        gate_open=gate_open,
        rcond=jnp.ones((nt,), out_dtype),
        reservoir_stage_us=res_stage_us,
    )


# ---------------------------------------------------------------------------
# Batched (ensemble) fused kernel: B members across VPU sublanes.
#
# The single-run kernel's state rows are [1, Np] — one sublane of each 8x128
# vreg does useful work.  Stacking B ensemble members as the SUBLANE axis
# ([B, Np] rows, PCR buffer [16*B, Np]) runs the identical vreg program on
# all members at once: every op in the assembly and the PCR solve is
# elementwise across sublanes, and the lane rolls (spatial stencil) don't
# touch the member axis.  At B <= 8 the per-iteration vreg count is the
# SAME as a single run, so the batch is near-free; beyond 8 it scales
# ~B/8.  This is the fused-engine counterpart of parallel/ensemble.py's
# vmapped XLA path (the DP analog of SURVEY.md §2.17; ref n_calibrate.py
# :58-62 runs one full serial re-simulation per member).
#
# Per-member Newton parity: each member applies Newton increments only
# while its OWN pre-update residual is >= tol (plus the final increment of
# the converging iteration), masked per sublane — reproducing each member's
# sequential trajectory and iteration count exactly (same semantics as the
# single-run while loop; ref preissmann.py:149-153).
# ---------------------------------------------------------------------------


def _kernel_batched(*refs, nt, n, B, n_sweeps, max_iter, ds_kind, us_kind,
                    gate_init, varying, qlat_mode, has_stg, store, out_mem,
                    geo_kind="trap", tab_M=0, tab_stride=0,
                    both_storage=False, has_stg_us=False, interpret=False):
    refs = list(refs)
    geo_ref = refs.pop(0)
    # shared lookup tables (batched TableGeometry): single-run [t*stride+j]
    # row layout, ONE copy for all members (members only differ by _S_TABK)
    tab_ref = refs.pop(0) if geo_kind == "table" else None
    init_ref = refs.pop(0)
    tgt_ref = refs.pop(0)
    ds_tgt_ref = refs.pop(0)
    scal_ref = refs.pop(0)
    out_refs = refs
    # per-member lateral inflow theta-box cell averages: "const" is a
    # loop-invariant VMEM [B, Np] row; "tv" keeps the [nt, B, Np] stack in
    # HBM and DMAs level k's [B, Np] slice into a VMEM staging row at the
    # top of each level (the copy is ~1000x shorter than the level's Newton
    # solve, so a blocking wait costs nothing and VMEM holds one row/member
    # either way — inside the _WORK_ROWS envelope)
    qlat_ref = out_refs.pop(0) if qlat_mode else None
    # per-member stage-grid storage tables (curve/rating/loss lumped
    # storage; _stg_blk's (t*SR + c)*B + b row layout)
    stg_ref = out_refs.pop(0) if has_stg else None
    # both-ends storage: the UPSTREAM reservoirs' table block (the shared
    # stg input keeps the downstream side's)
    stg_us_ref = out_refs.pop(0) if has_stg_us else None
    qstage = qsem = None
    if qlat_mode == "tv":
        qsem = out_refs.pop()
        qstage = out_refs.pop()
    streamer = None
    if out_mem == "hbm":
        n_out = 1 if store == "boundaries" else 5
        sems = out_refs.pop()
        stage_refs = [out_refs.pop() for _ in range(n_out)][::-1]
        streamer = _LevelStreamer(out_refs, stage_refs, sems, nt)
    if store == "boundaries":
        (stats_ref,) = out_refs
        dhi_ref = dlo_ref = fhi_ref = flo_ref = None
    else:
        dhi_ref, dlo_ref, fhi_ref, flo_ref, stats_ref = out_refs
    roll = _roll(interpret)
    geo = geo_ref[:]
    Np = geo.shape[1]
    g = [geo[r * B:(r + 1) * B, :] for r in range(_NG)]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    node_mask = (idx < n).astype(jnp.float32)
    riota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    zcol = jnp.zeros((B, 1), jnp.float32)

    def member_col(ref, k):
        """[B, 1] column of the SMEM [B, nt] series at level k."""
        col = zcol
        for m in range(B):
            col = col + jnp.where(riota == m, ref[m, k], 0.0)
        return col

    # per-member scalar slots: the SMEM scal input is [B, _NS]; slots in
    # `varying` (static) are lifted to [B, 1] sublane columns, which
    # broadcast through the whole assembly exactly like the node rows —
    # everything else reads member 0's (shared) scalar.  Built once, loop-
    # invariant.  _S_ZERO/_S_TOL/theta/dt/dx come from shared settings and
    # are never in `varying`.
    scal = [member_col(scal_ref, i) if i in varying else scal_ref[0, i]
            for i in range(_NS)]
    tol = scal[_S_TOL]

    if geo_kind == "table":
        base_section = functools.partial(_section_df_table_rows, g, tab_ref,
                                         M=tab_M, stride=tab_stride, B=1)
        if _S_TABK in varying:
            # per-member conveyance multiplier ([B,1] column): tables come
            # from member 0 (c = 1 there by construction), scaling is exact
            # Manning algebra (see parallel.ensemble.table_roughness_ensemble)
            c = scal[_S_TABK]
            inv_c = 1.0 / c

            def section_fn(h):
                st = dict(base_section(h))
                st["K"] = st["K"] * df(c)
                st["dK_dA"] = st["dK_dA"] * c
                st["n_eq"] = st["n_eq"] * df(inv_c)
                return st
        else:  # all members share c == 1.0: the tables are already exact
            section_fn = base_section
    else:
        section_fn = None

    init = init_ref[:]
    h0 = DF(init[0 * B:1 * B, :], init[1 * B:2 * B, :])
    Q0 = DF(init[2 * B:3 * B, :], init[3 * B:4 * B, :])
    qlat_const = qlat_ref[:] if qlat_mode == "const" else None

    def store_level(k, h, Q, iters, err, res_stage, gate_open,
                    res_stage_us=np.float32(np.nan)):
        # outputs are rank-3 [nt, B, lanes] with the dynamic level index on
        # the UNTILED leading dim: a flat [nt*B, lanes] layout needs a
        # k*B row offset, which Mosaic can neither lower (i64 multiply
        # under x64) nor prove tile-aligned for vector stores taller than
        # one vreg ("cannot statically prove that index in dimension 0 is
        # a multiple of 8", seen at B=32)
        idx128 = jax.lax.broadcasted_iota(jnp.int32, (1, stats_ref.shape[2]), 1)
        stats_rows = (jnp.where(idx128 == 0, iters, 0.0)
                      + jnp.where(idx128 == 1, err, 0.0)
                      + jnp.where(idx128 == 2, res_stage, 0.0)
                      + jnp.where(idx128 == 3, gate_open, 0.0))
        if both_storage:
            # upstream reservoir stages ride lane 12 per member
            stats_rows = stats_rows + jnp.where(idx128 == 12, res_stage_us,
                                                0.0)
        if store == "boundaries":
            # boundary-node (h, Q) df32 halves ride lanes 4-11 of the stats
            # row — the per-level output shrinks from (4*Np + 128) to 128
            # lanes/member, raising the VMEM member cap until the working
            # set binds (settings.store="boundaries", the Monte-Carlo
            # output mode; see max_fused_batch)
            for lane, val in ((4, h.hi[:, 0:1]), (5, h.lo[:, 0:1]),
                              (6, h.hi[:, n - 1:n]), (7, h.lo[:, n - 1:n]),
                              (8, Q.hi[:, 0:1]), (9, Q.lo[:, 0:1]),
                              (10, Q.hi[:, n - 1:n]), (11, Q.lo[:, n - 1:n])):
                stats_rows = stats_rows + jnp.where(idx128 == lane, val, 0.0)
            if streamer is not None:
                streamer.store(k, [stats_rows[None]])
            else:
                stats_ref[pl.ds(k, 1)] = stats_rows[None]
            return
        if streamer is not None:
            streamer.store(k, [h.hi[None], h.lo[None], Q.hi[None],
                               Q.lo[None], stats_rows[None]])
            return
        dhi_ref[pl.ds(k, 1)] = h.hi[None]
        dlo_ref[pl.ds(k, 1)] = h.lo[None]
        fhi_ref[pl.ds(k, 1)] = Q.hi[None]
        flo_ref[pl.ds(k, 1)] = Q.lo[None]
        stats_ref[pl.ds(k, 1)] = stats_rows[None]

    store_level(0, h0, Q0, zcol, zcol, zcol, zcol + np.float32(gate_init))

    def level_body(k, carry):
        (h_hi, h_lo, Q_hi, Q_lo, y_hi, y_lo,
         gopen, gcool, gptime, gstage) = carry[:10]
        h, Q = DF(h_hi, h_lo), DF(Q_hi, Q_lo)
        y_old = DF(y_hi, y_lo)
        y_old_us = DF(carry[10], carry[11]) if both_storage else None

        if ds_kind == "gated_blend":
            # per-member gate controller on [B,1] columns (the state machine
            # of ops/rating_curve.py:168-182; ref roseires_rating_curve.py
            # :111-141)
            time = k.astype(jnp.float32) * scal[_S_DT]
            elapsed = jnp.where(gptime >= 0.0, time - gptime, 0.0)
            gcool = jnp.maximum(0.0, gcool - elapsed)
            can_act = gcool <= 0.0
            want_open = (gstage >= scal[_S_PIVOT] + 0.5) & (gopen < 0.5)
            want_close = (gstage <= scal[_S_PIVOT] - 1.0) & (gopen > 0.5)
            do_open = can_act & want_open
            do_close = can_act & want_close
            gopen = jnp.where(do_open, 1.0, jnp.where(do_close, 0.0, gopen))
            gcool = jnp.where(do_open | do_close, scal[_S_MAXCD], gcool)
            gptime = jnp.zeros_like(gptime) + time

        prev_A, prev_Se, prev_Q2A = _level_state(g, h, Q,
                                                 section_fn=section_fn)
        tgt = member_col(tgt_ref, k)
        ds_tgt = member_col(ds_tgt_ref, k)
        if qlat_mode == "tv":
            qlat_k = _stream_qlat_row(qlat_ref, qstage, qsem, k)
        else:
            qlat_k = qlat_const

        def cond(c):
            return jnp.sum(c[4]) > 0.0

        def body(c):
            hh, hl, qh, ql, active, iters, errf, rs_hi, rs_lo = c[:9]
            res = _assemble_fused(
                g, scal, roll, n, ds_kind, DF(hh, hl), DF(qh, ql), h, Q,
                prev_A, prev_Se, prev_Q2A, tgt, us_kind=us_kind,
                y_old=y_old, k=k, gate_open=gopen, ds_tgt=ds_tgt,
                qlat_avg=qlat_k, section_fn=section_fn, stg=stg_ref,
                y_old_us=y_old_us, stg_us=stg_us_ref,
                both_storage=both_storage)
            if both_storage:
                buf, errb, res_stage, res_stage_us = res
            else:
                buf, errb, res_stage = res
                res_stage_us = res_stage
            x0, x1 = _pcr_solve(buf, idx, n, n_sweeps, roll)
            upd = active  # [B,1] f32 mask: members still iterating
            hn = DF(hh, hl) + df(x0 * node_mask * upd)
            qn = DF(qh, ql) + df(x1 * node_mask * upd)
            iters = iters + upd
            errf = jnp.where(upd > 0.0, errb, errf)
            rs_hi = jnp.where(upd > 0.0, res_stage.hi, rs_hi)
            rs_lo = jnp.where(upd > 0.0, res_stage.lo, rs_lo)
            active_n = (upd * (errb >= tol).astype(jnp.float32)
                        * (iters < np.float32(max_iter)).astype(jnp.float32))
            out = (hn.hi, hn.lo, qn.hi, qn.lo, active_n, iters, errf,
                   rs_hi, rs_lo)
            if both_storage:
                ru_hi = jnp.where(upd > 0.0, res_stage_us.hi, c[9])
                ru_lo = jnp.where(upd > 0.0, res_stage_us.lo, c[10])
                out = out + (ru_hi, ru_lo)
            return out

        # data-derived zero column: a constant-zero [B,1] init gets a
        # REPLICATED Mosaic layout, while the loop body computes a concrete
        # one — the carry relayout is then rejected ("Non-singleton logical
        # dimension is replicated in destination but not in source").
        # Deriving the init from runtime data pins a concrete layout.
        # NaN-sanitize h first: a member whose Newton diverged to NaN at an
        # earlier level would otherwise poison sum(active) in `cond` and
        # freeze EVERY member's iteration for the rest of the run (a dead
        # member must only kill itself, as in per-member single runs).
        hcol = h.hi[:, 0:1]
        hsafe = jnp.where(jnp.abs(hcol) < np.float32(3e38), hcol,
                          jnp.zeros_like(hcol))
        dz = hsafe * np.float32(0.0)
        wc0 = (h.hi, h.lo, Q.hi, Q.lo, dz + 1.0, dz,
               dz + np.float32(np.inf), y_hi * 1.0, y_lo * 1.0)
        if both_storage:
            wc0 = wc0 + (carry[10] * 1.0, carry[11] * 1.0)
        wout = jax.lax.while_loop(cond, body, wc0)
        hh, hl, qh, ql, _, iters, errf, rs_hi, rs_lo = wout[:9]

        gstage = scal[_S_DSBED] + hh[:, n - 1:n] + hl[:, n - 1:n]
        rsu = (wout[9] + wout[10]) if both_storage else np.float32(np.nan)
        store_level(k, DF(hh, hl), DF(qh, ql), iters, errf,
                    rs_hi + rs_lo, gopen, res_stage_us=rsu)
        out = (hh, hl, qh, ql, rs_hi, rs_lo, gopen, gcool, gptime, gstage)
        if both_storage:
            out = out + (wout[9], wout[10])
        return out

    with df32.fenced(scal[_S_ZERO]):
        gstage0 = scal[_S_DSBED] + h0.hi[:, n - 1:n] + h0.lo[:, n - 1:n]
        # data-derived zero column for the level-loop carry (see the layout
        # note at the inner while_loop init)
        dz0 = h0.hi[:, 0:1] * np.float32(0.0)
        carry0 = (h0.hi, h0.lo, Q0.hi, Q0.lo, dz0, dz0,
                  dz0 + np.float32(gate_init), dz0, dz0 - 1.0, gstage0)
        if both_storage:
            carry0 = carry0 + (dz0, dz0)
        jax.lax.fori_loop(1, nt, level_body, carry0)
    if streamer is not None:
        streamer.drain()


@functools.lru_cache(maxsize=64)
def _build_call_batched(*, nt, n, B, Np, n_sweeps, max_iter, ds_kind,
                        us_kind, gate_init, varying, qlat_mode=None,
                        has_stg=False, store="full", out_mem="vmem",
                        geo_kind="trap", tab_M=0, tab_stride=0,
                        both_storage=False, has_stg_us=False,
                        interpret=False):
    kern = functools.partial(
        _kernel_batched, nt=nt, n=n, B=B, n_sweeps=n_sweeps,
        max_iter=max_iter, ds_kind=ds_kind, us_kind=us_kind,
        gate_init=gate_init, varying=varying, qlat_mode=qlat_mode,
        has_stg=has_stg, store=store, out_mem=out_mem, geo_kind=geo_kind,
        tab_M=tab_M, tab_stride=tab_stride, both_storage=both_storage,
        has_stg_us=has_stg_us, interpret=interpret)
    if store == "boundaries":
        out_shapes = [
            jax.ShapeDtypeStruct((nt, B, 128), jnp.float32),  # stats+bnd
        ]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),  # depth hi
            jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),  # depth lo
            jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),  # flow hi
            jax.ShapeDtypeStruct((nt, B, Np), jnp.float32),  # flow lo
            jax.ShapeDtypeStruct((nt, B, 128), jnp.float32),  # stats
        ]
    out_space = pl.ANY if out_mem == "hbm" else pltpu.VMEM
    return jax.jit(pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geometry rows
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # shared lookup tables
             if geo_kind == "table" else [])
          + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # init state
            pl.BlockSpec(memory_space=pltpu.SMEM),  # us target series [B, nt]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ds target series [B, nt]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM  # [B, Np] qlat cells
                           if qlat_mode == "const" else pl.ANY)]
             if qlat_mode else [])  # tv: [nt, B, Np] stays in HBM
          + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # storage tables
             if has_stg else [])
          + ([pl.BlockSpec(memory_space=pltpu.VMEM)]  # us storage tables
             if has_stg_us else []),
        out_specs=[pl.BlockSpec(memory_space=out_space)] * len(out_shapes),
        scratch_shapes=((_out_scratch_shapes(out_shapes)
                         if out_mem == "hbm" else [])
                        + ([pltpu.VMEM((1, B, Np), jnp.float32),
                            pltpu.SemaphoreType.DMA]
                           if qlat_mode == "tv" else [])),
        interpret=interpret,
    ))


_FUSED_VMEM_BYTES = 14 * 1024 * 1024  # ~16 MB/core VMEM minus headroom
# Resident per-member [1, Np] f32 rows besides the stacked outputs: the 17
# geometry + 4 init input rows, the loop-carried (h, Q, y) df32 state, the
# 16-row PCR buffer plus its rolled copies per sweep, and assembly
# transients.  The outputs alone do NOT bound B — with store="boundaries"
# they shrink to one 128-lane row/level while the working set still scales
# with B*Np, so the cap must budget both.  Measured on v5e (scoped-vmem
# OOM reports): ~168 rows/member at Np=256/nt=25 (18.34 MB at B=64 with
# 7.37 MB of outputs) and <=173 at Np=128/nt=385 (B=56 compiled at
# ~16 MB); 96 rows was optimistic and OOMed the compiler at caps the
# model allowed.
_WORK_ROWS = 176


_STG_BYTES = _NSTG * _STG_SR * 128 * 4  # per-sublane storage stage tables


def _vmem_per_member(n_time_levels: int, Np: int, store: str,
                     out_mem: str = "vmem") -> int:
    out_lanes = 128 if store == "boundaries" else 4 * Np + 128
    # out_mem="hbm": the [nt, ...] stacks live in HBM; VMEM holds only the
    # 2 double-buffer staging slots per output (_LevelStreamer)
    out_levels = 2 if out_mem == "hbm" else n_time_levels
    return (out_levels * out_lanes + _WORK_ROWS * Np) * 4


def _pick_out_mem(settings, nt: int, Np: int, store: str, B: int = 1,
                  extra_per_member: int = 0, extra_fixed: int = 0) -> str:
    """Output memory space: settings.out_memory, or smallest that fits.

    "vmem" (direct vector stores, no DMA machinery) is preferred when the
    stacked outputs fit the VMEM budget; otherwise "hbm" streams them via
    :class:`_LevelStreamer`.  Raises FusedUnsupported when even the HBM
    layout's per-member working set exceeds VMEM.  ``extra_fixed`` budgets
    member-count-independent VMEM residents (shared lookup tables, the
    single-run qlat rows).
    """
    req = getattr(settings, "out_memory", "auto")
    if req in ("vmem", "hbm"):
        out_mem = req
    else:
        out_mem = ("vmem"
                   if B * (_vmem_per_member(nt, Np, store, "vmem")
                           + extra_per_member) + extra_fixed
                   <= _FUSED_VMEM_BYTES else "hbm")
    if (B * (_vmem_per_member(nt, Np, store, out_mem)
             + extra_per_member) + extra_fixed) > _FUSED_VMEM_BYTES:
        limit = max_fused_batch(Np, nt, store, out_mem,
                                stg_curve=extra_per_member > 0)
        raise FusedUnsupported(
            f"per-member working set exceeds the VMEM budget at Np={Np} "
            f"with out_memory='{out_mem}' (B={B}; cap {limit})")
    return out_mem


def max_fused_batch(n_nodes: int, n_time_levels: int,
                    store: str = "full", out_memory: str = "auto",
                    stg_curve=False) -> int:
    """Largest member count one batched kernel call can hold in VMEM
    (callers chunk bigger ensembles; multiples of 8 fill whole vregs).

    With ``out_memory="hbm"`` (or "auto", which upgrades to it when the
    in-VMEM output stacks would bind first) the per-level fields stream to
    HBM and only the per-member *working set* (inputs + PCR buffers,
    ~:data:`_WORK_ROWS` rows of Np lanes) limits the batch — ~18x the
    in-VMEM store="full" cap at the flagship size.  ``store="boundaries"``
    additionally shrinks what is stored at all (the Monte-Carlo output
    mode)."""
    Np = max(128, -(-n_nodes // 128) * 128)
    mems = ("vmem", "hbm") if out_memory == "auto" else (out_memory,)
    per_member = min(_vmem_per_member(n_time_levels, Np, store, m)
                     for m in mems)
    # per-member stage-grid storage tables; stg_curve counts curve-storage
    # ENDS (True == 1; both-ends reservoirs pass 2)
    per_member += _STG_BYTES * int(stg_curve)
    return max(8, (_FUSED_VMEM_BYTES // per_member) // 8 * 8)


# batched TableGeometry: the row-accumulate lookup costs O(M) [B, Np] FMAs
# per section evaluation (the member-on-sublane layout rules out the
# single-run within-vreg gather), so cap the depth-grid resolution
_TAB_BATCH_MAX_M = 257


def _pack_table_geo_rows_1(geo, n, Np, tab_M):
    """[_NG, Np] geometry rows for one TableGeometry member (batched
    kernel): row 0 = reciprocal depth grid, _G_CURV/_G_DZ real, the n-rows
    benign 1.0 (the trap closure is never selected but must stay finite) —
    the single-member twin of fused_network._pack_table_geo_rows."""
    f32 = np.float32
    a = lambda x: np.asarray(x, np.float64)
    rows = np.zeros((_NG, Np), f32)
    rows[_TG_INVDG, :n] = ((tab_M - 1) / a(geo.depth_max)).astype(f32)
    rows[_G_CURV, :n] = a(geo.curvature).astype(f32)
    z = a(geo.z_bed)
    rows[_G_DZ, : n - 1] = (z[1:] - z[:-1]).astype(f32)
    for r in (_G_N_MAIN, _G_N_LEFT, _G_N_RIGHT):
        rows[r, :] = 1.0
    return rows


def _check_batched_table(geo_batch, B0, n, Np):
    """Validate + factor a batched TableGeometry for the member-on-sublane
    kernel: members must share the A/P/T/dR_dA tables exactly and differ
    only by a per-member CONVEYANCE scale (K and dK_dA scaled by c_m,
    n_eq by 1/c_m) — exactly what
    :func:`parallel.ensemble.table_roughness_ensemble` produces (Manning
    K = A R^(2/3) / n makes a uniform roughness change an exact rescale;
    ref cross_section.py:503-522).  Returns
    ``(tab_M, tab_stride, tab_rows, c[B0])`` with tables packed from
    member 0 in the single-run layout.
    """
    a = lambda x: np.asarray(x, np.float64)
    area = a(geo_batch.area)  # [B0, N, M]
    tab_M = area.shape[-1]
    if tab_M > _TAB_BATCH_MAX_M:
        raise FusedUnsupported(
            f"batched TableGeometry lookup costs O(M) per evaluation in "
            f"the member-on-sublane layout; M={tab_M} > {_TAB_BATCH_MAX_M}."
            f" Rebuild the tables at a coarser depth-grid resolution or "
            f"use the XLA vmap engine")

    def same(name):
        v = a(getattr(geo_batch, name))
        return np.all(v == v[0:1])

    shared = ("area", "perimeter", "top_width", "dR_dA", "depth_max",
              "z_bed", "curvature")
    if not all(same(f) for f in shared):
        raise FusedUnsupported(
            "batched TableGeometry members must share the geometric tables "
            "(A/P/T/dR_dA and the depth grid); only a per-member "
            "conveyance/roughness scale batches in-kernel "
            "(parallel.ensemble.table_roughness_ensemble). Per-member "
            "geometry falls back to the XLA vmap engine")

    K = a(geo_batch.conveyance)
    dK = a(geo_batch.dK_dA)
    n_eq = a(geo_batch.n_eq)
    pos = K[0] > 0.0
    c = np.ones((B0,), np.float64)
    for m in range(B0):
        ratios = K[m][pos] / K[0][pos]
        c_m = np.median(ratios)
        ok = (np.allclose(K[m], c_m * K[0], rtol=1e-9, atol=1e-30)
              and np.allclose(dK[m], c_m * dK[0], rtol=1e-9, atol=1e-30)
              and np.allclose(n_eq[m] * c_m, n_eq[0], rtol=1e-9))
        if not ok:
            raise FusedUnsupported(
                "batched TableGeometry members must differ by one uniform "
                "conveyance scale (K, dK_dA x c; n_eq / c); member "
                f"{m} does not factor. Use the XLA vmap engine")
        c[m] = c_m

    # pack member 0's tables in the single-run [t*stride + j] layout
    f32 = np.float32
    tab_stride = -(-tab_M // 8) * 8 + 8
    benign = (1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0)
    tabs = np.zeros((_NT * tab_stride, Np), f32)
    g0 = jax.tree_util.tree_map(lambda x: np.asarray(x)[0], geo_batch)
    for t, arr in enumerate((g0.area, g0.perimeter, g0.top_width,
                             g0.conveyance, g0.n_eq, g0.dK_dA, g0.dR_dA)):
        block = np.full((tab_stride, Np), benign[t], f32)
        a2 = np.asarray(arr, np.float64).T.astype(f32)  # [M, N]
        block[:tab_M, :n] = a2
        block[tab_M:, :n] = a2[-1]
        tabs[t * tab_stride:(t + 1) * tab_stride] = block
    return tab_M, tab_stride, tabs, c


def _prepare_batched(geo_batch, us_bc, ds_bc, h0, Q0, settings,
                     us_batched, ds_batched, B_pad=None,
                     lateral_inflow=None):
    """Host-side pack shared by the single-device and sharded batched
    drivers: checks the configuration, packs the five kernel input arrays,
    and returns ``(cfg, ins)`` where ``cfg`` carries every static kernel
    parameter (including the per-chunk ``varying`` slot set — callers
    sharing one executable across chunks must union it)."""
    from flowsim_tpu.geometry import TableGeometry, TrapezoidGeometry

    if not isinstance(geo_batch, (TrapezoidGeometry, TableGeometry)):
        raise FusedUnsupported(
            "batched fused kernel supports TrapezoidGeometry and "
            "TableGeometry (shared tables + per-member conveyance scale)")
    if np.ndim(geo_batch.z_bed) != 2:
        raise FusedUnsupported("geo_batch needs a leading member axis")
    B0 = geo_batch.z_bed.shape[0]
    n = geo_batch.n_nodes
    nt = settings.n_time_levels
    Np = max(128, -(-n // 128) * 128)
    n_sweeps = max(1, (n - 1).bit_length())
    B = B_pad or (-(-B0 // 8) * 8)  # pad to whole vregs of sublanes
    assert B % 8 == 0 and B >= B0

    # hoist the device->host conversion: one np.asarray per leaf, then
    # per-member slicing is a cheap numpy view
    tonp = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
    geo_batch = tonp(geo_batch)
    if us_batched:
        us_bc = tonp(us_bc)
    if ds_batched:
        ds_bc = tonp(ds_bc)

    def member(tree, m):
        return jax.tree_util.tree_map(lambda x: x[m], tree)

    geo0 = member(geo_batch, 0)
    us0 = member(us_bc, 0) if us_batched else us_bc
    ds0 = member(ds_bc, 0) if ds_batched else ds_bc
    _check_supported(geo0, us0, ds0, settings)
    from flowsim_tpu.geometry import TableGeometry

    is_table = isinstance(geo0, TableGeometry)
    tab_M = tab_stride = 0
    tab_rows = None
    tabk = np.ones((B0,), np.float64)
    if is_table:
        tab_M, tab_stride, tab_rows, tabk = _check_batched_table(
            geo_batch, B0, n, Np)
    # per-member stage-grid tables (curve/rating/loss storage) add
    # _STG_BYTES of VMEM per sublane PER CURVE-STORAGE END — budget them
    # before picking out_mem
    n_stg_curve = sum(
        1 for bc in (us0, ds0)
        if bc.kind == "fixed_depth" and bc.storage is not None
        and _storage_mode(bc.storage) != "storage_simple")
    stg_curve = n_stg_curve > 0
    both_storage = (us0.kind == "fixed_depth" and us0.storage is not None
                    and ds0.kind == "fixed_depth"
                    and ds0.storage is not None)
    store = getattr(settings, "store", "full")
    try:
        out_mem = _pick_out_mem(settings, nt, Np, store, B=B,
                                extra_per_member=_STG_BYTES * n_stg_curve,
                                extra_fixed=(_NT * tab_stride * Np * 4
                                             if is_table else 0))
    except FusedUnsupported:
        raise FusedUnsupported(
            f"batch {B0} x {nt} levels exceeds the VMEM budget "
            f"(per-member working set); chunk at <= "
            f"{max_fused_batch(n, nt, store, stg_curve=stg_curve)} "
            f"members") from None

    f32 = np.float32
    geo_rows = np.zeros((_NG * B, Np), f32)
    init_rows = np.zeros((4 * B, Np), f32)
    nt_pad = max(nt, 8)
    tgt_b = np.zeros((B, nt_pad), f32)
    ds_tgt_b = np.zeros((B, nt_pad), f32)

    h0_nd, Q0_nd = np.asarray(h0), np.asarray(Q0)
    base = np.zeros((_NS,), f32)
    base[_S_THETA] = settings.theta
    base[_S_DT] = settings.time_step
    base[_S_DX] = settings.spatial_step
    base[_S_TOL] = settings.tolerance
    scal_rows = np.zeros((B, _NS), f32)
    ds_kind = us_kind_str = None
    stg_list = []
    stg_us_list = []
    for m in range(B):
        mm = min(m, B0 - 1)  # pad members replicate the last real member
        if is_table:
            # geometry rows are shared (only _S_TABK varies per member)
            geo_rows.reshape(_NG, B, Np)[:, m, :] = _pack_table_geo_rows_1(
                geo0, n, Np, tab_M)
        else:
            gm = member(geo_batch, mm)
            geo_rows.reshape(_NG, B, Np)[:, m, :] = _pack_trap_rows(gm, n, Np)
        h0_m = h0_nd[mm] if h0_nd.ndim > 1 else h0_nd
        Q0_m = Q0_nd[mm] if Q0_nd.ndim > 1 else Q0_nd
        init_rows.reshape(4, B, Np)[:, m, :] = _pack_init(h0_m, Q0_m, n, Np)
        us_m = member(us_bc, mm) if us_batched else us_bc
        ds_m = member(ds_bc, mm) if ds_batched else ds_bc
        scal_m = base.copy()
        scal_m[_S_TABK] = tabk[mm]
        ds_kind_m, ds_series, stg_d = _pack_ds_config(ds_m, settings,
                                                      scal_m, nt)
        us_kind_m, stg_u = _pack_us_config(
            us_m, settings, scal_m,
            stg_slots=_STG_US if both_storage else _STG_SHARED)
        if both_storage:
            # both ends: ds tables keep the shared stg input, us tables
            # ride their own (per-member) block
            stg_list.append(stg_d)
            stg_us_list.append(stg_u)
        else:
            # one storage end: the us rows win the stg slot when present,
            # as in the single-run driver
            stg_list.append(stg_u if stg_u is not None else stg_d)
        scal_rows[m] = scal_m
        tgt_b[m, :nt] = _pack_us_series(us_m, nt).astype(f32)
        ds_tgt_b[m, :nt] = ds_series.astype(f32)
        if m == 0:
            ds_kind, us_kind_str = ds_kind_m, us_kind_m
        elif ds_kind_m != ds_kind or us_kind_m != us_kind_str:
            raise FusedUnsupported(
                "members must share the same BC kinds (per-member values of "
                "rating coefficients, storage scalars, targets, geometry, "
                "and state are supported; per-member kernel paths are not)")

    # slots that differ across members are lifted to [B, 1] sublane columns
    # in the kernel; everything else stays a shared scalar
    varying = tuple(int(i) for i in range(_NS)
                    if not np.all(scal_rows[:, i] == scal_rows[0, i]))

    # lateral inflow: shared [N], per-member constants [B0, N] (a 2D
    # argument is ALWAYS member-major here), or per-member time-varying
    # [B0, nt, N] (packed as an HBM [nt, B, Np] stack the kernel streams
    # one level-row at a time — express a shared time-varying inflow by
    # broadcasting to [B0, nt, N])
    qlat_mode = None
    qlat_rows = None
    if lateral_inflow is not None:
        q = np.asarray(lateral_inflow, np.float64)
        if q.ndim == 1 and q.shape[0] == n:
            q = np.broadcast_to(q, (B0, n))
        if q.ndim == 2 and B0 == nt and q.shape == (B0, n):
            # [B0, N] per-member constants and a shared time-varying
            # [nt, N] field are indistinguishable when B0 == nt — refuse
            # rather than silently pick member-major (the sharded driver
            # already guards this)
            raise ValueError(
                f"2-D lateral_inflow is ambiguous when the member count "
                f"equals the level count (B={B0} == nt={nt}): broadcast "
                f"per-member constants to [B, nt, N] (or a shared time "
                f"series to [B, nt, N]) to disambiguate")
        if q.ndim == 2 and q.shape == (B0, n):
            qlat_mode = "const"
            qlat_rows = np.zeros((B, Np), f32)
            for m in range(B):
                qm = q[min(m, B0 - 1)]
                qlat_rows[m, : n - 1] = (0.5 * (qm[:-1] + qm[1:])).astype(f32)
        elif q.ndim == 3 and q.shape == (B0, nt, n):
            qlat_mode = "tv"
            th = float(settings.theta)
            qlat_rows = np.zeros((nt, B, Np), f32)
            for m in range(B):
                qlat_rows[1:nt, m, : n - 1] = _qlat_tv_cells(
                    q[min(m, B0 - 1)], th).astype(f32)
        else:
            raise FusedUnsupported(
                f"batched kernel lateral_inflow must be [N={n}], "
                f"[B={B0}, N] per-member constants, or [B, nt={nt}, N] "
                f"per-member time series; got {q.shape}")

    has_stg = any(r is not None for r in stg_list)
    has_stg_us = any(r is not None for r in stg_us_list)
    cfg = dict(nt=nt, n=n, B=B, B0=B0, Np=Np, n_sweeps=n_sweeps,
               max_iter=settings.max_iter, ds_kind=ds_kind,
               us_kind=us_kind_str,
               gate_init=1.0 if settings.gate_initially_open else 0.0,
               varying=varying, qlat_mode=qlat_mode, has_stg=has_stg,
               store=store, out_mem=out_mem,
               geo_kind="table" if is_table else "trap",
               tab_M=tab_M, tab_stride=tab_stride,
               both_storage=both_storage, has_stg_us=has_stg_us)
    ins = (geo_rows,)
    if is_table:
        ins = ins + (tab_rows,)
    ins = ins + (init_rows, tgt_b, ds_tgt_b, scal_rows)
    if qlat_rows is not None:
        ins = ins + (qlat_rows,)
    if has_stg:
        ins = ins + (_stack_storage_rows(stg_list),)
    if has_stg_us:
        ins = ins + (_stack_storage_rows(stg_us_list),)
    return cfg, ins


def _unpack_batched(outs, cfg, settings, out_dtype):
    """Kernel outputs -> SimOutput with a leading member axis (shared by
    the single-device and sharded batched drivers)."""
    from flowsim_tpu.ops.preissmann import SimOutput

    nt, B, B0, Np, n = (cfg["nt"], cfg["B"], cfg["B0"], cfg["Np"], cfg["n"])
    store, ds_kind, us_kind_str = cfg["store"], cfg["ds_kind"], cfg["us_kind"]

    def df_sum(hi, lo):
        if out_dtype == jnp.float64:
            return hi.astype(jnp.float64) + lo.astype(jnp.float64)
        return (hi + lo).astype(out_dtype)

    if store == "boundaries":
        (stats,) = outs
        stats = stats.reshape(nt, B, 128)[:, :B0, :]
        # lanes 4-11: (h, Q) df32 halves at nodes 0 and n-1 (see store_level)
        depth = jnp.stack([df_sum(stats[:, :, 4], stats[:, :, 5]),
                           df_sum(stats[:, :, 6], stats[:, :, 7])], axis=-1)
        flow = jnp.stack([df_sum(stats[:, :, 8], stats[:, :, 9]),
                          df_sum(stats[:, :, 10], stats[:, :, 11])], axis=-1)
        depth = jnp.moveaxis(depth, 1, 0)  # [B0, nt, 2]
        flow = jnp.moveaxis(flow, 1, 0)
    else:
        dhi, dlo, fhi, flo, stats = outs

        def unpack(hi, lo):
            hi = hi.reshape(nt, B, Np)[:, :B0, :n]
            lo = lo.reshape(nt, B, Np)[:, :B0, :n]
            return jnp.moveaxis(df_sum(hi, lo), 1, 0)  # [B0, nt, n]

        depth = unpack(dhi, dlo)
        flow = unpack(fhi, flo)
        stats = stats.reshape(nt, B, 128)[:, :B0, :]
    iters = jnp.moveaxis(stats[:, :, 0], 1, 0).astype(jnp.int32)
    errs = jnp.moveaxis(stats[:, :, 1], 1, 0).astype(out_dtype)
    lvl = jnp.arange(nt)[None, :]
    if ds_kind.startswith("storage") or us_kind_str.startswith("storage"):
        res_stage = jnp.moveaxis(stats[:, :, 2], 1, 0).astype(out_dtype)
        res_stage = jnp.where(lvl == 0, jnp.nan, res_stage)
    else:
        res_stage = jnp.full((B0, nt), jnp.nan, out_dtype)
    if cfg.get("both_storage"):
        res_stage_us = jnp.moveaxis(stats[:, :, 12], 1, 0).astype(out_dtype)
        res_stage_us = jnp.where(lvl == 0, jnp.nan, res_stage_us)
    else:
        res_stage_us = None
    converged = (errs < settings.tolerance) | (lvl == 0)
    if ds_kind == "gated_blend":
        gate_open = jnp.moveaxis(stats[:, :, 3], 1, 0).astype(out_dtype)
    else:
        gate_open = jnp.full(
            (B0, nt), 1.0 if settings.gate_initially_open else 0.0, out_dtype)
    return SimOutput(
        depth=depth, flow=flow, iterations=iters, error=errs,
        converged=converged, reservoir_stage=res_stage, gate_open=gate_open,
        rcond=jnp.ones((B0, nt), out_dtype),
        reservoir_stage_us=res_stage_us,
    )


def fused_simulate_batched(geo_batch, us_bc, ds_bc, h0, Q0, settings,
                           interpret: bool = False,
                           us_batched: bool = False, ds_batched: bool = False,
                           lateral_inflow=None):
    """Run a member-batch of full simulations in ONE Pallas kernel call.

    ``geo_batch``: TrapezoidGeometry with a leading member axis on every
    leaf (see parallel/ensemble.py ``stack_geometries``/``roughness_ensemble``).
    ``us_bc``/``ds_bc``: either shared BoundaryParams, or (with
    ``us_batched``/``ds_batched``) stacked per-member params from
    ``ensemble.batch_boundaries`` — per-member ``target_series``,
    ``initial_depth``, rating-curve coefficients/pivots, gate-controller
    thresholds, and constant-area storage scalars are all supported (scalar
    slots that differ across members are lifted to per-sublane columns);
    the BC *kinds* must match across members.
    ``h0``/``Q0``: [N] shared or [B, N] per-member initial state.

    Supported BC surface: everything the single-run kernel supports except
    TableGeometry (per-member table windows don't fit the member-on-sublane
    layout).  Lumped storage batches in BOTH forms: constant-area
    (``storage_simple``, per-member scalar slots) and generalized
    curve/rating/loss storage (``storage_curve*`` — per-member stage-grid
    tables ride sublane-interleaved VMEM rows, _STG_BYTES/member, and the
    grid lookups run per sublane; see :func:`_stg_pick`); each member
    carries its own reservoir-stage trajectory.

    Returns a SimOutput whose fields carry a leading member axis (the same
    shapes as ``vmap(prs.simulate)``).  ``settings.store="boundaries"``
    stores only the two boundary nodes per level (packed into the stats
    row's lanes in-kernel), which raises the VMEM member cap (~7x at the
    flagship size; bounded by the per-member working set, not the outputs
    — see :func:`max_fused_batch`).
    """
    cfg, ins = _prepare_batched(geo_batch, us_bc, ds_bc, h0, Q0, settings,
                                us_batched, ds_batched,
                                lateral_inflow=lateral_inflow)
    call = _build_call_batched(
        nt=cfg["nt"], n=cfg["n"], B=cfg["B"], Np=cfg["Np"],
        n_sweeps=cfg["n_sweeps"], max_iter=cfg["max_iter"],
        ds_kind=cfg["ds_kind"], us_kind=cfg["us_kind"],
        gate_init=cfg["gate_init"], varying=cfg["varying"],
        qlat_mode=cfg["qlat_mode"], has_stg=cfg["has_stg"],
        store=cfg["store"], geo_kind=cfg["geo_kind"],
        tab_M=cfg["tab_M"], tab_stride=cfg["tab_stride"],
        both_storage=cfg["both_storage"], has_stg_us=cfg["has_stg_us"],
        out_mem=cfg["out_mem"], interpret=interpret)
    outs = call(*(jnp.asarray(x) for x in ins))
    return _unpack_batched(outs, cfg, settings, jnp.asarray(h0).dtype)


def fused_simulate_batched_sharded(geo_batch, us_bc, ds_bc, h0, Q0, settings,
                                   mesh, axis=None, interpret: bool = False,
                                   us_batched: bool = False,
                                   ds_batched: bool = False,
                                   lateral_inflow=None):
    """Shard a member-batch across the mesh's ensemble axis, each device
    running its VMEM-resident slice through its own fused-kernel dispatch
    (``shard_map`` over the kernel; the multi-chip Monte-Carlo path for
    the fused engine — the DP analog of SURVEY.md §2.17 on the fastest
    engine).  Same surface as :func:`fused_simulate_batched`; members are
    split contiguously, padded by replicating the last member, and every
    device must hold at most one VMEM cap's worth (chunk bigger ensembles
    with ``parallel.ensemble.batched_simulate(engine="fused", mesh=...)``).

    Results are bitwise identical to the single-device batched kernel for
    every member (same vreg program per device)."""
    from flowsim_tpu.parallel.domain import shard_map
    from flowsim_tpu.parallel.mesh import ENSEMBLE_AXIS
    from jax.sharding import PartitionSpec as P

    axis = axis or ENSEMBLE_AXIS
    D = mesh.shape[axis]
    B0 = np.shape(jax.tree_util.tree_leaves(geo_batch)[0])[0]
    Bd = -(-(-(-B0 // D)) // 8) * 8  # per-device members, whole vregs

    # validate the GLOBAL member-major shape before slicing: a shared
    # [nt, N] time series would otherwise be member-sliced into per-member
    # constants that pass the per-device shape check (silently wrong)
    if lateral_inflow is not None and np.ndim(lateral_inflow) > 1:
        qs = np.shape(lateral_inflow)
        if qs[0] != B0:
            raise FusedUnsupported(
                f"batched lateral_inflow must be member-major with "
                f"leading dim B={B0}; got {qs} (a shared time-varying "
                f"field must be broadcast to [B, nt, N])")

    def take(tree, lo):
        idx = np.minimum(np.arange(lo, lo + Bd), B0 - 1)
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[idx], tree)

    cfgs, ins_dev = [], []
    for d in range(D):
        lo = d * Bd
        cfg_d, ins_d = _prepare_batched(
            take(geo_batch, lo),
            take(us_bc, lo) if us_batched else us_bc,
            take(ds_bc, lo) if ds_batched else ds_bc,
            np.asarray(h0)[np.minimum(np.arange(lo, lo + Bd), B0 - 1)]
            if np.ndim(h0) > 1 else h0,
            np.asarray(Q0)[np.minimum(np.arange(lo, lo + Bd), B0 - 1)]
            if np.ndim(Q0) > 1 else Q0,
            settings, us_batched, ds_batched, B_pad=Bd,
            lateral_inflow=(
                np.asarray(lateral_inflow)[
                    np.minimum(np.arange(lo, lo + Bd), B0 - 1)]
                if np.ndim(lateral_inflow) > 1 else lateral_inflow))
        cfgs.append(cfg_d)
        ins_dev.append(ins_d)
    cfg = dict(cfgs[0])
    for c in cfgs[1:]:
        if (c["ds_kind"], c["us_kind"]) != (cfg["ds_kind"], cfg["us_kind"]):
            raise FusedUnsupported(
                "members must share BC kinds across all devices")
    # one executable for every device: union the per-chunk varying sets
    # (the packed inputs are identical either way — `varying` only selects
    # which scal slots the kernel lifts to per-sublane columns)
    cfg["varying"] = tuple(sorted({s for c in cfgs for s in c["varying"]}))

    call = _build_call_batched(
        nt=cfg["nt"], n=cfg["n"], B=Bd, Np=cfg["Np"],
        n_sweeps=cfg["n_sweeps"], max_iter=cfg["max_iter"],
        ds_kind=cfg["ds_kind"], us_kind=cfg["us_kind"],
        gate_init=cfg["gate_init"], varying=cfg["varying"],
        qlat_mode=cfg["qlat_mode"], has_stg=cfg["has_stg"],
        store=cfg["store"], geo_kind=cfg["geo_kind"],
        tab_M=cfg["tab_M"], tab_stride=cfg["tab_stride"],
        both_storage=cfg["both_storage"], has_stg_us=cfg["has_stg_us"],
        out_mem=cfg["out_mem"], interpret=interpret)

    stacked = [jnp.asarray(np.stack([ins_dev[d][i] for d in range(D)]))
               for i in range(len(ins_dev[0]))]
    n_out = 1 if cfg["store"] == "boundaries" else 5

    def local(*ins):
        outs = call(*(x[0] for x in ins))
        return tuple(o[None] for o in outs)

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(axis),) * len(stacked),
                        out_specs=(P(axis),) * n_out)
    outs_dev = jax.jit(sharded)(*stacked)
    # [D, nt, Bd, X] -> [nt, D*Bd, X]; global member m = d*Bd + local m
    outs = tuple(
        jnp.moveaxis(o, 0, 1).reshape(cfg["nt"], D * Bd, o.shape[-1])
        for o in outs_dev)
    cfg["B"] = D * Bd
    cfg["B0"] = B0
    return _unpack_batched(outs, cfg, settings, jnp.asarray(h0).dtype)
