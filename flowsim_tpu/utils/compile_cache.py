"""Persistent XLA compilation cache (pay each compile once per machine).

The reference pays zero compile time (SciPy's spsolve is pre-built,
ref src/hydromodel/preissmann.py:146); this framework's fused kernels pay
~15-17 s of XLA+Mosaic compilation per PROCESS by default — the worst
user-facing number for a 0.07 s simulation.  Enabling JAX's persistent
compilation cache stores every compiled executable (keyed on the lowered
HLO + compile options + backend) in an on-disk directory, so the second
process that compiles the same program loads the serialized executable
instead of recompiling.

Usage (bench.py and the graft entry call this automatically)::

    from flowsim_tpu.utils import compile_cache
    compile_cache.enable()          # ~/.cache/flowsim_tpu/xla, or
                                    # $FLOWSIM_COMPILE_CACHE

Backend notes:

* CPU: supported by stock XLA; the ~40-minute test suite and CPU bench
  paths benefit immediately.
* Tunneled TPU (axon plugin): executable serialization happens on the
  PJRT plugin side; whether a cache *hit* skips the remote compile is a
  property of the plugin.  Measured on this setup — see BASELINE.md
  "Persistent compile cache" for the round-5 numbers.
* Caching is keyed on jax/jaxlib versions, so upgrading jax invalidates
  entries (they are simply re-created); the directory is safe to delete
  at any time.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "flowsim_tpu",
                        "xla")


def enable(path: str | None = None,
           min_compile_time_secs: float = 0.5) -> str:
    """Turn on the persistent compilation cache; returns the directory.

    ``path`` defaults to ``$FLOWSIM_COMPILE_CACHE`` or
    ``~/.cache/flowsim_tpu/xla``.  ``min_compile_time_secs`` skips caching
    trivial executables (they recompile faster than they deserialize).
    Safe to call more than once and before or after backend init.
    """
    import jax

    path = path or os.environ.get("FLOWSIM_COMPILE_CACHE") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        # also persist XLA-internal (autotune etc.) caches where supported
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # older jax: knob absent — executable cache still on
        pass
    return path


def disable() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
