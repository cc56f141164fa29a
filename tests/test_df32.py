"""Double-single (df32) arithmetic: precision vs float64.

The fused flagship kernel computes its Newton residual path in df32 inside
Pallas (Mosaic has no f64); these tests pin every primitive at or below
~1e-12 relative error — four orders of magnitude under the 1e-6 Newton
tolerance — on the magnitude ranges the hydraulic closures actually use
(areas 1e2-1e5, conveyances 1e4-1e7, slopes 1e-6-1e-2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flowsim_tpu.ops.pallas import df32
from flowsim_tpu.ops.pallas.df32 import DF, df, to_f64

pytestmark = pytest.mark.fast


def relerr(x, ref):
    return float(jnp.max(jnp.abs((to_f64(x) - ref) / ref)))


@pytest.fixture(params=[(0.1, 1e6), (1e-6, 1.0), (1.0, 1e3)])
def pair(request, rng):
    lo, hi = request.param
    a = jnp.asarray(rng.uniform(lo, hi, 4096))
    b = jnp.asarray(rng.uniform(lo, hi, 4096))
    return a, b


def test_ring_ops(pair):
    a64, b64 = pair
    a, b = df(a64), df(b64)
    assert relerr(a + b, a64 + b64) < 1e-13
    assert relerr(a * b, a64 * b64) < 1e-13
    assert relerr(a / b, a64 / b64) < 1e-13


def test_subtraction_cancellation():
    # (a + 1) - a == 1 exactly in df32 for a up to ~1e6 (the classic f32
    # killer: in plain f32 the 1 is lost entirely at a ~ 1e7)
    a = df(jnp.asarray(np.linspace(1.0, 1e6, 1000)))
    one = (a + df(1.0)) - a
    assert float(jnp.max(jnp.abs(to_f64(one) - 1.0))) == 0.0


def test_roots_and_powers(pair):
    a64, _ = pair
    a = df(a64)
    assert relerr(df32.sqrt(a), jnp.sqrt(a64)) < 1e-13
    assert relerr(df32.cbrt(a), jnp.cbrt(a64)) < 1e-13
    assert relerr(df32.pow_2_3(a), a64 ** (2.0 / 3.0)) < 1e-12
    assert relerr(df32.pow_3_2(a), a64 ** 1.5) < 1e-13


def test_roots_zero_domain():
    z = df(jnp.asarray([0.0, 4.0]))
    assert to_f64(df32.sqrt(z)).tolist() == [0.0, 2.0]
    assert to_f64(df32.cbrt(df(jnp.asarray([0.0, 8.0])))).tolist() == [0.0, 2.0]


def test_conveyance_chain(pair):
    """K = A R^(2/3) / n and Se = Q|Q|/K^2 — the deepest residual chain."""
    A64, R64 = pair
    A, R = df(A64), df(R64)
    n = df(0.0321)
    K = A * df32.pow_2_3(R) / n
    K64 = A64 * R64 ** (2.0 / 3.0) / 0.0321
    assert relerr(K, K64) < 1e-12
    Se = A * df32.abs_(A) / (K * K)
    assert relerr(Se, A64 * jnp.abs(A64) / K64**2) < 1e-12


def test_where_select_and_compare(rng):
    a64 = jnp.asarray(rng.uniform(-1, 1, 512))
    b64 = jnp.asarray(rng.uniform(-1, 1, 512))
    a, b = df(a64), df(b64)
    m = df32.maximum(a, b)
    assert relerr(m, jnp.maximum(a64, b64)) < 1e-13
    assert bool(jnp.all((a > b) == (a64 > b64)))


def test_f64_round_trip():
    # hi+lo recovers the f64 value to the lo word's own rounding (~2^-48 rel)
    x = jnp.asarray([1.0 + 2.0**-40, 123456.789, 1e-12])
    assert relerr(df(x), x) < 2.0**-46


def test_works_under_jit_and_vmap():
    import jax

    def f(a64):
        a = df(a64)
        return to_f64(df32.sqrt(a * a + df(1.0)))

    x = jnp.asarray(np.linspace(0.5, 1e4, 256))
    ref = jnp.sqrt(x * x + 1.0)
    assert float(jnp.max(jnp.abs((jax.jit(f)(x) - ref) / ref))) < 1e-13
    xm = x.reshape(8, 32)
    got = jax.vmap(f)(xm)
    assert float(jnp.max(jnp.abs((got - ref.reshape(8, 32)) / ref.reshape(8, 32)))) < 1e-13


def test_exp_log_powf():
    """Round-5 transcendentals (for power rating curves): df32 exp/log/pow
    vs float64, ~1e-11 relative."""
    from flowsim_tpu.ops.pallas import df32
    from flowsim_tpu.ops.pallas.df32 import df

    x64 = np.array([1e-3, 0.5, 1.0, 2.718281828, 37.5, 900.0, 4.2e4])
    a64 = np.array([-20.0, -1.0, -1e-6, 0.0, 1e-6, 3.0, 25.0])
    ex = np.asarray(df32.to_f64(df32.exp(df(jnp.asarray(a64)))))
    np.testing.assert_allclose(ex, np.exp(a64), rtol=5e-12)
    lg = np.asarray(df32.to_f64(df32.log(df(jnp.asarray(x64)))))
    np.testing.assert_allclose(lg, np.log(x64), rtol=0, atol=5e-12)
    for b in (0.5, 1.6180339887, 2.5):
        pw = np.asarray(df32.to_f64(df32.powf(df(jnp.asarray(x64)), df(b))))
        np.testing.assert_allclose(pw, x64 ** b, rtol=5e-11)
    # domain guards: x <= 0 -> 0 (powf/log sentinels, no NaN)
    bad = df32.powf(df(jnp.asarray([-1.0, 0.0])), df(1.5))
    np.testing.assert_array_equal(np.asarray(bad.hi), [0.0, 0.0])
