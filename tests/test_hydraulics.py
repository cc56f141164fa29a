"""Closure-library parity vs the reference hydraulics module."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowsim_tpu.ops import hydraulics as hyd
from tests.oracle import import_reference, reference_available

pytestmark = [pytest.mark.fast, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def sample_states(rng, n=200):
    A = rng.uniform(1.0, 5000.0, n)
    Q = rng.uniform(-5000.0, 20000.0, n)
    nman = rng.uniform(0.015, 0.08, n)
    R = rng.uniform(0.1, 30.0, n)
    T = rng.uniform(5.0, 800.0, n)
    h = rng.uniform(0.05, 30.0, n)
    rc = rng.uniform(200.0, 1e5, n) * rng.choice([-1.0, 1.0], n)
    dR_dA = rng.uniform(-0.01, 0.05, n)
    S0 = rng.uniform(-0.01, 0.01, n)
    return A, Q, nman, R, T, h, rc, dR_dA, S0


def test_closures_match_reference(ref, rng):
    from src.hydromodel import hydraulics as rh

    A, Q, nman, R, T, h, rc, dR_dA, S0 = sample_states(rng)
    K = hyd.conveyance(jnp.array(A), jnp.array(nman), jnp.array(R))

    for i in range(0, len(A), 17):
        a, q, nm, r, t, hh, rcc, drda, s0 = (
            A[i], Q[i], nman[i], R[i], T[i], h[i], rc[i], dR_dA[i], S0[i],
        )
        k = float(K[i])
        assert np.isclose(k, rh.conveyance(A=a, n=nm, R=r), rtol=1e-12)
        assert np.isclose(float(hyd.friction_slope(q, k)), rh.Sf(Q=q, K=k), rtol=1e-12)
        assert np.isclose(
            float(hyd.dK_dA(a, nm, r, drda)), rh.dK_dA_(A=a, n=nm, R=r, dR_dA=drda), rtol=1e-12
        )
        assert np.isclose(
            float(hyd.dSf_dA(q, k, hyd.dK_dA(a, nm, r, drda))),
            rh.dSf_dA(Q=q, K=k, dK_dA=rh.dK_dA_(A=a, n=nm, R=r, dR_dA=drda)),
            rtol=1e-12,
        )
        assert np.isclose(float(hyd.dSf_dQ(q, k)), rh.dSf_dQ(Q=q, K=k), rtol=1e-12)
        assert np.isclose(float(hyd.froude(t, a, q)), rh.froude_num(T=t, A=a, Q=q), rtol=1e-12)
        assert np.isclose(float(hyd.dFr_dA(t, a, q)), rh.dFr_dA(T=t, A=a, Q=q), rtol=1e-12)
        assert np.isclose(float(hyd.dFr_dQ(t, a)), rh.dFr_dQ(T=t, A=a), rtol=1e-12)
        assert np.isclose(
            float(hyd.darcy_weisbach_f(nm, r)), rh.darcey_weisbach_f(n=nm, R=r), rtol=1e-12
        )
        assert np.isclose(
            float(hyd.curvature_slope(hh, t, a, q, nm, r, rcc)),
            rh.Sc(h=hh, T=t, A=a, Q=q, n=nm, R=r, rc=rcc),
            rtol=1e-12,
        )
        assert np.isclose(
            float(hyd.dSc_dA(hh, a, q, nm, r, rcc, drda, t)),
            rh.dSc_dA(h=hh, A=a, Q=q, n=nm, R=r, rc=rcc, dR_dA=drda, T=t),
            rtol=1e-10,
        )
        assert np.isclose(
            float(hyd.dSc_dQ(hh, t, a, q, nm, r, rcc)),
            rh.dSc_dQ(h=hh, T=t, A=a, Q=q, n=nm, R=r, rc=rcc),
            rtol=1e-10,
        )
        assert np.isclose(
            float(hyd.normal_flow(s0, k)),
            rh.normal_flow(bed_slope=s0, K=k),
            rtol=1e-12,
        )
        assert np.isclose(
            float(hyd.dQn_dA(s0, drda)), rh.dQn_dA(S_0=s0, dK_dA=drda), rtol=1e-12
        )


def test_derivatives_vs_autodiff(rng):
    """Hand-written derivatives agree with jax.grad of the primal closures."""
    A, Q, nman, R, T, h, rc, dR_dA, _ = sample_states(rng, 50)

    # dSf/dQ at fixed K
    def sf(q, k):
        return hyd.friction_slope(q, k)

    K = hyd.conveyance(jnp.array(A), jnp.array(nman), jnp.array(R))
    g = jax.vmap(jax.grad(sf), in_axes=(0, 0))(jnp.array(Q), K)
    np.testing.assert_allclose(np.asarray(g), np.asarray(hyd.dSf_dQ(jnp.array(Q), K)), rtol=1e-9)

    # dFr/dA, dFr/dQ
    gA = jax.vmap(jax.grad(lambda a, t, q: hyd.froude(t, a, q)))(
        jnp.array(A), jnp.array(T), jnp.array(Q)
    )
    np.testing.assert_allclose(
        np.asarray(gA), np.asarray(hyd.dFr_dA(jnp.array(T), jnp.array(A), jnp.array(Q))), rtol=1e-8
    )
    gQ = jax.vmap(jax.grad(lambda q, t, a: hyd.froude(t, a, q)))(
        jnp.array(Q), jnp.array(T), jnp.array(A)
    )
    np.testing.assert_allclose(
        np.asarray(gQ), np.asarray(hyd.dFr_dQ(jnp.array(T), jnp.array(A))), rtol=1e-8
    )

    # dSc/dQ via autodiff
    gScQ = jax.vmap(
        jax.grad(lambda q, hh, t, a, nm, r, rcc: hyd.curvature_slope(hh, t, a, q, nm, r, rcc))
    )(
        jnp.array(Q), jnp.array(h), jnp.array(T), jnp.array(A),
        jnp.array(nman), jnp.array(R), jnp.array(rc),
    )
    np.testing.assert_allclose(
        np.asarray(gScQ),
        np.asarray(
            hyd.dSc_dQ(
                jnp.array(h), jnp.array(T), jnp.array(A), jnp.array(Q),
                jnp.array(nman), jnp.array(R), jnp.array(rc),
            )
        ),
        rtol=1e-7,
    )
