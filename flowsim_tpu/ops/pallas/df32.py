"""Double-single (two-float32) arithmetic for TPU Pallas kernels.

TPU Mosaic has no float64, but the flagship Newton solve needs ~1e-9
relative accuracy in its residual path (tol 1e-6 on residual entries built
from ~1e3-magnitude terms with cancellation).  A double-single number
``x = hi + lo`` (|lo| <= ulp(hi)/2) carries ~2^-48 ≈ 3.6e-15 relative
precision — comfortably between f32 (6e-8, too coarse) and f64.

Algorithms are the classic error-free transformations (Dekker 1971, Knuth
TAOCP v2; the double-double recipes of Hida/Li/Bailey's QD library, public
domain technique).  Products use Veltkamp splitting rather than FMA so the
code is exact under plain IEEE-754 f32 multiply — portable across Mosaic,
XLA CPU (tests run the same code path), and interpret mode.

``DF`` is a NamedTuple of two equal-shaped f32 arrays with operator
overloads, so closure formulas read like the f64 originals:

    A = (b + m * d) * d        # b, m, d : DF

Use ``df(x)`` to lift an f32/f64 array (splitting f64 exactly), ``.value``
to collapse back (f32), ``to_f64`` on the host for validation.

All ops are pure jnp and work identically inside Pallas kernels, under jit,
and eagerly.  Division and roots cost one f32-seeded Newton polish each.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1: Veltkamp constant for f32 (24-bit)


# ---------------------------------------------------------------------------
# Compiler fencing.
#
# XLA's optimization pipeline rewrites floating-point expressions under
# real-arithmetic identities (measured on XLA:CPU: the Dekker/Knuth
# transformations collapse entirely — t-(t-a) -> a etc. — degrading df32 to
# plain f32; each op in isolation survives, chains do not).
# ``lax.optimization_barrier`` does NOT protect them: barriers are expanded
# away before the offending pass (measured: 6 barriers pre-opt, 0 post-opt,
# EFT folded).  The robust fence is an *opaque runtime zero*: adding an
# input value the compiler cannot prove to be 0.0 to each critical
# intermediate blocks every such pattern match while leaving the arithmetic
# bit-identical (x + 0.0 == x).  Enter ``fenced(z)`` with a traced zero
# (e.g. read from kernel SMEM or passed as an argument) around any jitted
# df32 region; eager execution needs no fence.
# ---------------------------------------------------------------------------

_FENCE = [None]


class fenced:
    """Context manager installing the opaque runtime zero for df32 EFTs."""

    def __init__(self, zero):
        self.zero = zero

    def __enter__(self):
        self._old = _FENCE[0]
        _FENCE[0] = self.zero
        return self

    def __exit__(self, *exc):
        _FENCE[0] = self._old
        return False


def _fz(x):
    z = _FENCE[0]
    if z is not None:
        return x + z
    return jax.lax.optimization_barrier((x,))[0]


def _two_sum(a, b):
    """s + e == a + b exactly (Knuth).

    The rounded sum and the intermediate are fenced so the simplifier cannot
    substitute their defining expressions into the error term (measured: it
    rewrites e to garbage otherwise — see _fence).
    """
    s = _fz(a + b)
    v = _fz(s - a)
    e = (a - (s - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (Dekker)."""
    s = _fz(a + b)
    e = b - (s - a)
    return s, e


def _split(a):
    """a == hi + lo with hi, lo representable in 12 bits of mantissa."""
    t = _fz(_SPLIT * a)
    hi = _fz(t - (t - a))
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """p + e == a * b exactly (Dekker product, no FMA required)."""
    p = _fz(a * b)
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


class DF(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray

    # -- construction / collapse ------------------------------------------
    @property
    def value(self):
        return self.hi + self.lo

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    # -- ring ops ----------------------------------------------------------
    def __add__(self, o):
        o = df(o)
        s, e = _two_sum(self.hi, o.hi)
        e = e + (self.lo + o.lo)
        s, e = _quick_two_sum(s, e)
        return DF(s, e)

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __sub__(self, o):
        return self + (-df(o))

    def __rsub__(self, o):
        return df(o) + (-self)

    def __mul__(self, o):
        o = df(o)
        p, e = _two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        p, e = _quick_two_sum(p, e)
        return DF(p, e)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = df(o)
        # f32 quotient seed + one df Newton correction; the correction is
        # below ulp(q0) so it becomes the LO word via two_sum, never a bare
        # f32 add (which would round it away entirely).
        q0 = self.hi / o.hi
        r = self - DF(*_two_prod(q0, o.hi)) - df(q0) * DF(o.lo, jnp.zeros_like(o.lo))
        corr = r.hi / o.hi
        s, e = _two_sum(q0, corr)
        return DF(s, e)

    def __rtruediv__(self, o):
        return df(o) / self

    # -- comparisons (on the collapsed leading term: hi ordering is exact
    # for normalized df values whenever the difference exceeds ~ulp(hi)) ---
    def __lt__(self, o):
        o = df(o)
        return (self.hi < o.hi) | ((self.hi == o.hi) & (self.lo < o.lo))

    def __gt__(self, o):
        o = df(o)
        return (self.hi > o.hi) | ((self.hi == o.hi) & (self.lo > o.lo))

    def __le__(self, o):
        return ~self.__gt__(o)

    def __ge__(self, o):
        return ~self.__lt__(o)


def df(x) -> DF:
    """Lift to DF.

    Python/NumPy scalars split exactly through f64 into numpy-scalar hi/lo —
    these stay jaxpr *literals*, which Pallas kernels require (a materialized
    jnp constant would be rejected as a captured array).  f64 arrays split
    exactly; f32 arrays get lo = 0.
    """
    if isinstance(x, DF):
        return x
    if isinstance(x, (int, float, np.floating, np.integer)):
        x64 = np.float64(x)
        hi = np.float32(x64)
        return DF(hi, np.float32(x64 - np.float64(hi)))
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        return DF(hi, lo)
    x = x.astype(jnp.float32)
    return DF(x, jnp.zeros_like(x))


def to_f64(x: DF):
    """Host/validation helper (needs x64 enabled)."""
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def where(cond, a, b) -> DF:
    a, b = df(a), df(b)
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def maximum(a, b) -> DF:
    a, b = df(a), df(b)
    return where(a > b, a, b)


def sqrt(a: DF) -> DF:
    """df sqrt via f32 seed + one Heron step in df arithmetic.

    One df-precision Newton step squares the f32 seed's 6e-8 relative error
    to ~4e-15 — at the df32 precision floor.  Domain: a >= 0 (0 maps to 0).
    """
    a = df(a)
    y0 = jnp.sqrt(a.hi)
    safe = y0 > 0.0
    y0s = jnp.where(safe, y0, 1.0)
    y = df(y0s)
    y = (y + a / y) * df(0.5)
    return where(safe, y, df(jnp.zeros_like(y0)))


def cbrt(a: DF) -> DF:
    """df cube root, a >= 0, via exp/log seed + Newton steps.

    Mosaic has no ``cbrt`` primitive, so the f32 seed is exp(log(a)/3)
    (~1e-7 relative) polished once in f32; the df step below then squares
    the error to the df32 floor.  a = 0 maps to 0.
    """
    a = df(a)
    safe = a.hi > 0.0
    ah = jnp.where(safe, a.hi, 1.0)
    y0 = jnp.exp(jnp.log(ah) * np.float32(1.0 / 3.0))
    y0 = y0 - (y0 * y0 * y0 - ah) / (3.0 * y0 * y0)
    y = df(y0)
    # y <- y - (y^3 - a) / (3 y^2) = (2 y + a / y^2) / 3.  NB: divide by the
    # exact constant 3 — multiplying by f32(1/3) would inject its 2e-8
    # representation error into the polished root.
    y = (y * df(2.0) + a / (y * y)) / df(3.0)
    return where(safe, y, df(jnp.zeros_like(y0)))


def pow_2_3(a: DF) -> DF:
    """a^(2/3) = cbrt(a)^2 (TPU-safe form, matches ops.hydraulics policy)."""
    c = cbrt(a)
    return c * c


def pow_3_2(a: DF) -> DF:
    """a^(3/2) = a * sqrt(a)."""
    a = df(a)
    return a * sqrt(a)


def abs_(a: DF) -> DF:
    a = df(a)
    neg = a.hi < 0.0
    return where(neg, -a, a)


_LN2 = df(0.6931471805599453094)  # split-f64 ln 2 (exact to df32 precision)


def exp(a: DF) -> DF:
    """df e^a via exact ln2 range reduction + Taylor (Hida/Li/Bailey QD
    technique): a = k ln2 + r with |r| <= ln2/2, e^a = 2^k e^r, and the
    degree-9 Taylor series of e^r carries ~3e-12 relative error at
    |r| <= 0.35 — at the df32 floor.  2^k is exact (jnp.exp2 of a small
    integer).  Domain: |a| <~ 80 (f32 exponent range)."""
    a = df(a)
    kf = jnp.round(a.hi * np.float32(1.4426950408889634))  # a / ln2
    r = a - _LN2 * df(kf)
    # Horner Taylor: 1 + r (1 + r/2 (1 + r/3 (...)))
    acc = df(jnp.ones_like(a.hi))
    for n in range(9, 0, -1):
        acc = df(jnp.ones_like(a.hi)) + r * acc / df(float(n))
    # 2^k EXACTLY by exponent-field construction — jnp.exp2 is an
    # approximation even at integer arguments (measured on XLA:CPU:
    # exp2(36) off by 1.2e-7 relative), which would waste the df precision.
    ki = jnp.clip(kf, -126.0, 127.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((ki + np.int32(127)) << np.int32(23)).astype(jnp.int32),
        jnp.float32)
    return DF(acc.hi * scale, acc.lo * scale)


def log(x: DF) -> DF:
    """df natural log via f32 seed + one df Newton step
    (y <- y0 + (x e^{-y0} - 1)): the correction term is computed in full
    df arithmetic, so the seed's ~1e-7 error collapses to the df32 floor.
    Domain: x > 0 (non-positive inputs map to log of a 1.0 sentinel = 0)."""
    x = df(x)
    safe = x.hi > 0.0
    xs = where(safe, x, df(jnp.ones_like(x.hi)))
    y0 = jnp.log(xs.hi)
    corr = xs * exp(df(-y0)) - df(1.0)
    y = df(y0) + corr
    return where(safe, y, df(jnp.zeros_like(y0)))


def powf(x: DF, b) -> DF:
    """df x^b for x > 0 and a constant (or per-lane) exponent b: exp(b ln x).
    Relative error ~|b ln x| * 3e-12 — df32 grade for rating-curve ranges.
    x <= 0 maps to 0 (rating curves clamp their argument positive)."""
    x = df(x)
    safe = x.hi > 0.0
    y = exp(df(b) * log(where(safe, x, df(jnp.ones_like(x.hi)))))
    return where(safe, y, df(jnp.zeros_like(x.hi)))
