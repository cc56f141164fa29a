"""Profiling / observability helpers.

The reference's only observability is print-based verbose levels and a final
TXT summary (ref: preissmann.py:116-159, solver.py:187-233; SURVEY.md §5).
Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the compiled solver;
* :func:`timed` — wall-clock timing with a host-transfer completion barrier
  (the tunneled TPU runtime's ``block_until_ready`` can return early);
* :class:`StepLogger` — per-level iteration/error logging equivalent to the
  reference's verbose>=2 output, fed from SimOutput after the fact (logging
  inside the scan would force host syncs every level).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/flowsim_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Completion barrier: host transfer of a data-dependent scalar."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def timed(fn, *args, reps: int = 3, **kw):
    """(best_seconds, last_result) with reliable completion barriers."""
    best = np.inf
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        leaves = [l for l in _leaves(out) if hasattr(l, "dtype")]
        if leaves:
            sync(leaves[0])
        best = min(best, time.time() - t0)
    return best, out


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


class StepLogger:
    """Post-hoc per-level log lines matching the reference's verbose output
    (ref preissmann.py:116-117,151-159)."""

    def __init__(self, verbose: int = 1):
        self.verbose = verbose

    def report(self, output) -> None:
        if self.verbose < 1:
            return
        iters = np.asarray(output.iterations)
        errs = np.asarray(output.error)
        for k in range(1, len(iters)):
            if self.verbose >= 1:
                print(f"\n> Time level #{k}")
            if self.verbose >= 2:
                print(f">> {int(iters[k])} iterations.")
            if self.verbose >= 3:
                print(f">> Error = {errs[k]}")
