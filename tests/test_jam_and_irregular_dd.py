"""Jam scenarios (physical fault injection) and irregular-geometry sharding."""

import os
import sys

import numpy as np
import jax
import pytest

from tests.oracle import REFERENCE_ROOT, reference_available
from tests.test_gerd_components import ref_cwd  # fixture

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


@pytest.mark.parametrize("jam_sp,jam_sl", [(1, 0), (0, 1), (2, 2)])
def test_jammed_gate_scenarios_match_reference(ref_cwd, jam_sp, jam_sl):
    """Jammed spillways/sluices (the reference's physical fault-injection
    scenarios, ref roseires_rating_curve.py:42-46, settings.py:14-15)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from cases.gerd_roseires.roseires_rating_curve import RoseiresRatingCurve as RefRC

    from flowsim_tpu.models.gerd_roseires.roseires_rating_curve import RoseiresRatingCurve

    kw = dict(initial_stage=487.0, initial_flow=2094.106301,
              jammed_spillways=jam_sp, jammed_sluice_gates=jam_sl)
    ref = RefRC(**kw)
    ours = RoseiresRatingCurve(**kw)
    for s in np.linspace(480.0, 492.0, 13):
        q_ref = ref.discharge(stage=s, update_stage=False, update_gate_state=False)
        np.testing.assert_allclose(ours.discharge(s), q_ref, rtol=1e-6, err_msg=f"s={s}")


def test_domain_decomposition_with_irregular_sections():
    """shard_map channel decomposition over TableGeometry (2-D table leaves
    shard along the node axis)."""
    from flowsim_tpu.geometry_tables import IrregularStation, build_table_geometry
    from flowsim_tpu.ops import boundary as bnd
    from flowsim_tpu.ops import initial_conditions as ic
    from flowsim_tpu.ops import preissmann as prs
    from flowsim_tpu.parallel.domain import simulate_sharded
    from flowsim_tpu.parallel.mesh import make_mesh

    def mk(seed, z0):
        rng = np.random.default_rng(seed)
        x = np.linspace(0, 200, 25)
        z = z0 + 7.0 * ((x - 100) / 100) ** 2 + rng.uniform(0, 0.4, x.size)
        return IrregularStation(x=x, z=z, n_main=0.03, bed_slope=2e-4)

    n_nodes = 64
    length = (n_nodes - 1) * 1000.0
    geo = build_table_geometry([mk(1, length * 2e-4), mk(2, 0.0)], [0.0, length],
                               np.linspace(0, length, n_nodes), samples=512)
    h0, Q0 = ic.initial_conditions(geo, "steady-state", 300.0, 1000.0)
    nt = 9
    times = np.arange(nt) * 900.0
    series = 300.0 + 300.0 * np.minimum(times / 3600.0, 1.0)
    us = bnd.make_boundary("flow_hydrograph", bed_level=float(geo.z_bed[0]), target_series=series)
    ds = bnd.make_boundary("normal_depth", bed_level=float(geo.z_bed[-1]),
                           bed_slope=float(geo.bed_slope[-1]))
    sset = prs.PreissmannSettings(theta=0.7, time_step=900.0, spatial_step=1000.0,
                                  n_time_levels=nt, tolerance=1e-9, max_iter=60)

    ref = prs.simulate(geo, us, ds, h0, Q0, sset)
    mesh = make_mesh(n_ensemble=1, n_space=8)
    out = simulate_sharded(geo, us, ds, h0, Q0, sset, mesh)
    assert bool(np.asarray(out.converged).all())
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.flow), np.asarray(ref.flow), rtol=1e-9, atol=1e-8)
