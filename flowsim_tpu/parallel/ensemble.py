"""Ensemble (scenario-batch) parallelism.

The DP analog for this workload (SURVEY.md §2.17): vmap the whole Preissmann
step over a batch of scenarios (per-member roughness fields, inflow series,
boundary parameters) and shard the batch axis across the device mesh.  The
reference's serial calibration loop (ref n_calibrate.py:58-62) and any
Monte-Carlo study become one sharded batched simulation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.parallel.mesh import ENSEMBLE_AXIS, make_mesh


def shard_batch(x, mesh: Optional[Mesh] = None):
    """Place a batch-leading array (or pytree) on the ensemble mesh axis."""
    mesh = mesh or make_mesh()
    sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), x)


def batched_simulate(geo_batch, us_bc, ds_bc, h0, Q0, settings: prs.PreissmannSettings,
                     mesh: Optional[Mesh] = None, shard: bool = True):
    """Simulate a batch of scenarios differing in geometry (e.g. roughness).

    ``geo_batch`` has a leading batch dim on every leaf; boundary params and
    ICs may be shared (broadcast) or batched likewise.
    """
    if shard:
        geo_batch = shard_batch(geo_batch, mesh)

    def one(geo, h, Q):
        return prs.simulate(geo, us_bc, ds_bc, h, Q, settings)

    in_axes = (0, 0 if jnp.ndim(h0) > 1 else None, 0 if jnp.ndim(Q0) > 1 else None)
    return jax.jit(jax.vmap(one, in_axes=in_axes))(geo_batch, h0, Q0)


def stack_geometries(geos):
    """Stack per-member geometry pytrees into one batched pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *geos)


def roughness_ensemble(geo, n_values):
    """Batched geometry with per-member main-channel roughness."""
    n_values = jnp.asarray(n_values)

    def set_n(n):
        return dataclasses.replace(
            geo, n_main=jnp.broadcast_to(n, geo.n_main.shape).astype(geo.n_main.dtype)
        )

    return jax.vmap(set_n)(n_values)
