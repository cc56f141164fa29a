"""Test configuration.

Parity tests compare against the float64 NumPy/SciPy reference, so tests run
on CPU with x64 enabled.  An 8-device virtual CPU mesh is forced so the
multi-chip (shard_map) paths are exercised without TPU hardware, mirroring
how the driver dry-runs ``__graft_entry__.dryrun_multichip``.

Note: this image pins ``jax_platforms`` to the remote-TPU "axon" plugin at
interpreter startup (env JAX_PLATFORMS is ignored), so CPU must be forced via
``jax.config`` before any backend is touched — otherwise every op becomes a
network round-trip to the tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_state():
    """Clear jit executables at every module boundary.

    The XLA CPU compiler segfaults after ~100+ accumulated jit programs in
    one process (reproducible only in long full-suite runs, never in
    isolation — an upstream jit-state accumulation issue, not a flowsim
    defect). Clearing per module keeps the live-executable count bounded at
    the cost of some cross-module recompilation.
    """
    jax.clear_caches()
    yield


_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _bounded_compile_state_per_test():
    """Also clear every 8 tests WITHIN a module.

    Round 5 grew the kernel-heavy modules (test_fused_network et al.) past
    the same upstream crash threshold on their own: running the four fused
    modules together segfaulted reproducibly ~14 minutes in (3/3 attempts,
    faulthandler dump with no Python frame) until the per-test cap was
    added.  Eight tests of fused-kernel size stay safely under the limit.
    """
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 8:
        _TESTS_SINCE_CLEAR[0] = 0
        jax.clear_caches()
