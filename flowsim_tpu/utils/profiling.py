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


def timed(fn, *args, reps: int = 3, perturb=None, **kw):
    """(best_seconds, last_result) with reliable completion barriers.

    The barrier sums EVERY array leaf of the output (a single-leaf barrier
    only awaits the executable producing that leaf).  ``perturb(rep, args)
    -> args`` varies the inputs between reps: on the tunneled TPU identical
    (executable, inputs) pairs may be served from a remote result cache
    (CLAUDE.md), so re-timing the same call measures a cache hit.  With the
    default, a float64/float32 leading array argument is nudged by a 1e-12
    relative factor per rep; pass ``perturb=False`` to disable.
    """
    if perturb is None:
        def perturb(rep, a):
            if a and hasattr(a[0], "dtype") and np.issubdtype(
                    np.asarray(a[0]).dtype, np.floating):
                return (a[0] * (1.0 + 1e-12 * rep),) + a[1:]
            return a

    best = np.inf
    out = None
    for rep in range(reps):
        a = args if perturb is False else perturb(rep, args)
        t0 = time.time()
        out = fn(*a, **kw)
        leaves = [l for l in _leaves(out) if hasattr(l, "dtype")]
        if leaves:
            # one host transfer whose value depends on every leaf — awaits
            # all dispatches with a single round trip
            import jax.numpy as jnp

            float(sum(jnp.sum(l) for l in leaves))
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
