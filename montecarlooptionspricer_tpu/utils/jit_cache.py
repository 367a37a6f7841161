"""Persistent XLA compilation cache setup.

The reference is an ahead-of-time-compiled C++ binary, so it pays its
compilation cost once at build time.  The JAX rebuild pays it at first trace
instead — and on a remote-tunneled TPU a cold compile of the streaming
pricer takes minutes.  Enabling JAX's persistent compilation cache gives the
rebuild the same pay-once property: every CLI and the benchmark call
``enable_persistent_cache()`` before touching the device, so re-runs load
compiled executables from disk.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "montecarlooptionspricer_tpu",
    "xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    Idempotent; respects an explicit ``JAX_COMPILATION_CACHE_DIR`` in the
    environment (or a cache dir already configured programmatically) and
    returns whichever directory ends up active.
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if not current:
        cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or _DEFAULT_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        current = cache_dir
    # Cache everything — EVEN when the directory was configured externally
    # (JAX_COMPILATION_CACHE_DIR initializes jax_compilation_cache_dir, so
    # returning early here would leave the 1-second threshold in place and
    # silently drop every sub-second compile): through a remote tunnel even
    # "fast" compiles cost a round trip worth saving.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return current
