"""Pallas in-VMEM PCR kernel vs the XLA solvers (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowsim_tpu.ops.pallas.pcr_kernel import pcr_pallas
from tests.test_tridiag import dense_solution, random_system

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("N", [7, 64, 121, 700])
def test_interpret_matches_dense(N, rng):
    L, D, U, b = random_system(rng, N)
    Lf, Df, Uf, bf = (x.astype(jnp.float32) for x in (L, D, U, b))
    x = pcr_pallas(Lf, Df, Uf, bf, interpret=True)
    x_ref = dense_solution(L, D, U, b)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=2e-4)


def test_rejects_oversize(rng):
    L, D, U, b = random_system(rng, 8)
    big = jnp.zeros((40000, 2, 2), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        pcr_pallas(big, big, big, jnp.zeros((40000, 2), jnp.float32), interpret=True)
