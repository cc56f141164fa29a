"""Persistent compilation cache (utils/compile_cache.py, round 5).

Two fresh subprocesses compile the same nontrivial program with the cache
enabled: the first must populate the on-disk directory, the second must hit
it (observed via jax's cache-hit logging counter exposed through the
monitoring records is version-dependent — we assert on entries existing and
on the second process reusing them rather than growing the directory).
"""

import os
import subprocess
import sys
import tempfile

import pytest

pytestmark = pytest.mark.fast

_INNER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from flowsim_tpu.utils import compile_cache
compile_cache.enable(sys.argv[1], min_compile_time_secs=0.0)
import jax.numpy as jnp

def body(c, _):
    x = c
    for i in range(4):
        x = jnp.tanh(x @ x.T @ x * 1e-3 + i)
    return x, jnp.sum(x)

f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=3))
y = f(jnp.ones((32, 32)))
jax.block_until_ready(y)
print("OK")
"""


def _run(cache_dir):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    r = subprocess.run([sys.executable, "-c", _INNER, cache_dir],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_cache_populated_and_reused():
    with tempfile.TemporaryDirectory() as d:
        cache = os.path.join(d, "xla")
        _run(cache)
        entries = set(os.listdir(cache))
        assert entries, "first process wrote no cache entries"
        _run(cache)
        # second process must REUSE, not duplicate (same keys -> same files)
        assert set(os.listdir(cache)) == entries


def test_enable_returns_and_creates_dir():
    from flowsim_tpu.utils import compile_cache

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "nested", "xla")
        got = compile_cache.enable(p)
        assert got == p and os.path.isdir(p)
        compile_cache.disable()
