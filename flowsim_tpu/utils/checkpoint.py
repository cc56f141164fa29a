"""Periodic checkpoint / resume of solver state.

The reference has no checkpointing (SURVEY.md §5): full state history lives
in RAM and is dumped once at the end.  Here the minimal restart state
(time level k, h, Q, reservoir stage) plus the accumulated history can be
saved every ``interval`` levels and a run resumed from the latest file.
Plain ``.npz`` files — dependency-free and portable; an orbax-backed variant
can layer on top for multi-host sharded state.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np


CKPT_RE = re.compile(r"ckpt_(\d+)\.npz$")


def save_checkpoint(directory: str, k: int, h, Q, reservoir_stage=np.nan, history=None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{k:08d}.npz")
    payload = dict(k=np.asarray(k), h=np.asarray(h), Q=np.asarray(Q),
                   reservoir_stage=np.asarray(reservoir_stage))
    if history is not None:
        payload["depth_history"] = np.asarray(history[0])
        payload["flow_history"] = np.asarray(history[1])
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best = None
    best_k = -1
    for name in os.listdir(directory):
        m = CKPT_RE.match(name)
        if m and int(m.group(1)) > best_k:
            best_k = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def load_checkpoint(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def simulate_with_checkpoints(solver, tolerance=1e-4, max_iter=100, interval=50,
                              directory="checkpoints", resume=True, verbose=0):
    """Run a PreissmannSolver in chunks, checkpointing every ``interval`` levels.

    Resumes from the latest checkpoint in ``directory`` if present.
    """
    import jax.numpy as jnp
    from flowsim_tpu.ops import preissmann as prs

    nt = solver.number_of_time_levels
    N = solver.number_of_nodes
    depth = np.zeros((nt, N))
    flow = np.zeros((nt, N))
    depth[0] = np.asarray(solver.h0)
    flow[0] = np.asarray(solver.Q0)

    start_k = 1
    h, Q = solver.h0, solver.Q0
    res_stage = jnp.asarray(np.nan, dtype=jnp.asarray(solver.h0).dtype)
    if resume:
        ck = latest_checkpoint(directory)
        if ck is not None:
            z = load_checkpoint(ck)
            start_k = int(z["k"]) + 1
            h, Q = jnp.asarray(z["h"]), jnp.asarray(z["Q"])
            res_stage = jnp.asarray(float(z["reservoir_stage"]), dtype=h.dtype)
            if "depth_history" in z:
                kk = int(z["k"]) + 1
                depth[:kk] = z["depth_history"][:kk]
                flow[:kk] = z["flow_history"][:kk]

    settings = solver.settings(tolerance, max_iter)
    geo = solver.channel.geometry
    for k in range(start_k, nt):
        h, Q, err, iters, rs = prs.single_step(
            geo, solver.us_params, solver.ds_params, h, Q, jnp.asarray(k), res_stage, settings
        )
        res_stage = rs
        depth[k] = np.asarray(h)
        flow[k] = np.asarray(Q)
        if float(err) >= tolerance:
            raise ValueError(f"Convergence within {int(iters)} iterations couldn't be achieved.")
        if k % interval == 0 or k == nt - 1:
            save_checkpoint(directory, k, h, Q, float(res_stage), history=(depth, flow))
        if verbose:
            print(f"level {k}: iters={int(iters)} err={float(err):.2e}")

    solver.depth = depth
    solver.flow = flow
    solver.total_sim_duration = (nt - 1) * solver.time_step
    return depth, flow
