"""Native C components vs their NumPy/JAX equivalents."""

import numpy as np
import pytest

from flowsim_tpu import native
from flowsim_tpu.geometry_tables import polyline_properties
from tests.test_irregular_sections import make_polyline

pytestmark = pytest.mark.fast


@pytest.mark.skipif(not native.available(), reason="no C toolchain")
def test_polyline_tables_match_python():
    x, z = make_polyline(seed=3)
    depths = np.linspace(0.0, (z.max() - z.min()) * 1.2, 777)
    A, P, T = native.polyline_tables(x, z, depths)
    zmin = z.min()
    for j in range(0, len(depths), 37):
        a, p, _, t = polyline_properties(x, z, zmin + depths[j])
        np.testing.assert_allclose(A[j], a, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(P[j], p, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(T[j], t, rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason="no C toolchain")
def test_block_thomas_matches_dense(rng):
    from flowsim_tpu.ops.tridiag import blocks_to_dense

    N = 57
    L = rng.normal(size=(N, 2, 2))
    U = rng.normal(size=(N, 2, 2))
    D = rng.normal(size=(N, 2, 2)) + 4 * np.eye(2)
    L[0] = 0
    U[-1] = 0
    b = rng.normal(size=(N, 2))
    x = native.block_thomas(L, D, U, b)
    import jax.numpy as jnp

    A = np.asarray(blocks_to_dense(jnp.asarray(L), jnp.asarray(D), jnp.asarray(U)))
    np.testing.assert_allclose(A @ x.ravel(), b.ravel(), atol=1e-9)


@pytest.mark.skipif(not native.available(), reason="no C toolchain")
def test_native_rasterizer_speedup():
    """The native rasterizer should beat the Python loop by a wide margin."""
    import time

    x, z = make_polyline(seed=5, n_pts=60)
    depths = np.linspace(0.0, (z.max() - z.min()) * 1.2, 2000)

    t0 = time.time()
    native.polyline_tables(x, z, depths)
    t_native = time.time() - t0

    t0 = time.time()
    zmin = z.min()
    for d in depths[:200]:
        polyline_properties(x, z, zmin + d)
    t_python = (time.time() - t0) * 10  # extrapolate to 2000 samples

    assert t_native < t_python / 5, (t_native, t_python)
