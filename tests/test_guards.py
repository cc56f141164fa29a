"""User-facing input guards (round-5 hardening).

Covers:
* the ``linear_solver="thomas"``-on-TPU rejection (the nested-scan solve
  reproducibly crashes the TPU runtime worker — CLAUDE.md);
* the ambiguous 2-D lateral_inflow rejection when member count == level
  count (member-major [B, N] vs shared time-varying [nt, N]);
* branch-qlat shape validation and junction config length validation in
  the fused network drivers.
"""

import dataclasses

import jax
import numpy as np
import pytest

from flowsim_tpu.ops import preissmann as prs
from flowsim_tpu.ops.network import BranchDef
from flowsim_tpu.ops.pallas import fused_network as fnet

pytestmark = pytest.mark.fast


def _settings(**kw):
    base = dict(theta=0.6, time_step=3600.0, spatial_step=1000.0,
                n_time_levels=5, tolerance=1e-6, max_iter=50)
    base.update(kw)
    return prs.PreissmannSettings(**base)


def test_thomas_rejected_on_tpu_platform():
    sset = _settings(linear_solver="thomas")
    with pytest.raises(ValueError, match="thomas.*TPU|TPU.*thomas"):
        prs.guard_tpu_thomas(sset, platform="tpu")
    # CPU default is untouched
    prs.guard_tpu_thomas(sset, platform="cpu")
    prs.guard_tpu_thomas(_settings(linear_solver="pcr"), platform="tpu")


def test_thomas_guard_wired_into_solver_entry(monkeypatch):
    from flowsim_tpu.models import akbari_firoozi as ak

    solver, _ = ak.build()
    solver.linear_solver = "thomas"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="thomas"):
        solver.settings(tolerance=1e-6, max_iter=50)


def test_ambiguous_2d_lateral_inflow_raises():
    from flowsim_tpu.models import akbari_firoozi as ak
    from flowsim_tpu.parallel.ensemble import batched_simulate

    solver, _ = ak.build()
    geo = solver.channel.geometry
    nt = 6
    sset = dataclasses.replace(
        solver.settings(tolerance=1e-6, max_iter=50), n_time_levels=nt)
    B = nt  # the ambiguous case
    n = solver.h0.shape[0]
    geo_b = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (B,) + np.shape(x)), geo)
    q2d = np.full((B, n), 1e-4)
    with pytest.raises(ValueError, match="ambiguous"):
        batched_simulate(geo_b, solver.us_params, solver.ds_params,
                         solver.h0, solver.Q0, sset, shard=False,
                         lateral_inflow=q2d)
    with pytest.raises(ValueError, match="ambiguous"):
        batched_simulate(geo_b, solver.us_params, solver.ds_params,
                         solver.h0, solver.Q0, sset, shard=False,
                         engine="fused", lateral_inflow=q2d)


def _tiny_network(nt=5):
    """A 2-branch serial split of the akbari reach (tests/test_fused_network
    _split_akbari shape) for guard checks — never actually run."""
    from flowsim_tpu.models import akbari_firoozi as ak

    solver, _ = ak.build()
    sset = dataclasses.replace(
        solver.settings(tolerance=1e-6, max_iter=50), n_time_levels=nt)
    geo = solver.channel.geometry
    cut = 15
    sl = lambda s: jax.tree_util.tree_map(lambda x: x[s], geo)
    br1 = BranchDef(geo=sl(slice(0, cut + 1)), dx=solver.spatial_step,
                    us=solver.us_params, ds=0,
                    h0=solver.h0[: cut + 1], Q0=solver.Q0[: cut + 1])
    br2 = BranchDef(geo=sl(slice(cut, None)), dx=solver.spatial_step,
                    us=0, ds=solver.ds_params,
                    h0=solver.h0[cut:], Q0=solver.Q0[cut:])
    return [br1, br2], sset


def test_network_branch_qlat_shape_validated():
    branches, sset = _tiny_network()
    n_b = int(np.asarray(branches[0].h0).shape[0])
    # transposed [n_b, nt] (wrong) and off-by-one node count both raise
    for bad in (np.zeros((n_b, sset.n_time_levels)),
                np.zeros((sset.n_time_levels, n_b + 1)),
                np.zeros(n_b - 1)):
        brs = [dataclasses.replace(branches[0], qlat=bad), branches[1]]
        with pytest.raises(ValueError, match="qlat"):
            fnet.fused_simulate_network(brs, 1, sset, interpret=True)


def test_network_junction_config_lengths_validated():
    branches, sset = _tiny_network()
    with pytest.raises(ValueError, match="junction_area"):
        fnet.fused_simulate_network(branches, 1, sset,
                                    junction_area=[100.0, 200.0],
                                    interpret=True)
    from flowsim_tpu.ops import rating_curve as rc
    curve = rc.make_polynomial(0.0, 1.0, 0.0)
    with pytest.raises(ValueError, match="junction_rating"):
        fnet.fused_simulate_network(branches, 1, sset,
                                    junction_rating=[curve, None],
                                    interpret=True)
