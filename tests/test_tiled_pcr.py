"""Tiled Pallas SPIKE solver (interpret mode on CPU; hardware runs on TPU).

The two-level solve must reproduce the f64 block-Thomas reference to f32
accuracy for any N/tile combination, including N not a multiple of the tile
and systems assembled by the actual Preissmann stencil.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowsim_tpu.ops import tridiag
from flowsim_tpu.ops.pallas.tiled_pcr import tiled_spike_pallas


def _random_system(rng, N, coupling=0.3):
    L = jnp.asarray(rng.normal(size=(N, 2, 2)).astype(np.float32)) * coupling
    L = L.at[0].set(0.0)
    D = jnp.asarray((rng.normal(size=(N, 2, 2)) + 4 * np.eye(2)).astype(np.float32))
    U = jnp.asarray(rng.normal(size=(N, 2, 2)).astype(np.float32)) * coupling
    U = U.at[-1].set(0.0)
    b = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32))
    return L, D, U, b


@pytest.mark.parametrize("N,tile", [(256, 128), (1000, 128), (4096, 512), (8192, 1024)])
def test_tiled_matches_thomas_f64(rng, N, tile):
    L, D, U, b = _random_system(rng, N)
    x64 = tridiag.block_thomas(*(a.astype(jnp.float64) for a in (L, D, U, b)))
    x = tiled_spike_pallas(L, D, U, b, tile=tile, interpret=True)
    scale = float(jnp.max(jnp.abs(x64)))
    assert float(jnp.max(jnp.abs(x - x64.astype(jnp.float32)))) < 5e-6 * scale


def test_tiled_on_preissmann_system(rng):
    """Realistic conditioning: the actual Newton system of a long reach."""
    from scripts.bench_scaling import build_long_reach
    from flowsim_tpu.ops import preissmann as prs

    geo, us, ds, h0, Q0, sset = build_long_reach(2048, np.float32, levels=2)
    prev = prs.prev_level_state(geo, h0, Q0)
    L, D, U, b, err, _, _ = prs.assemble(geo, us, ds, sset, prev, h0, Q0,
                                         jnp.asarray(1), jnp.asarray(jnp.nan), None)
    x64 = tridiag.block_thomas(*(a.astype(jnp.float64) for a in (L, D, U, b)))
    x = tiled_spike_pallas(L, D, U, b, tile=256, interpret=True)
    scale = float(jnp.max(jnp.abs(x64))) + 1e-30
    rel = float(jnp.max(jnp.abs(x - x64.astype(jnp.float32)))) / scale
    assert rel < 1e-4, rel


def test_tiled_single_tile_degenerates_to_plain_pcr(rng):
    """N <= tile: one tile, no reduced system work, same answer."""
    L, D, U, b = _random_system(rng, 200)
    x_plain = tridiag.block_pcr(L, D, U, b)
    x = tiled_spike_pallas(L, D, U, b, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_plain), rtol=2e-4, atol=2e-5)
