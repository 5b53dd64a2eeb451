"""Persistent XLA compilation cache.

First compile of the full UNet over the remote-compile path costs minutes;
the persistent cache turns every later process start into a cache hit. Called
by the CLI apps, bench.py, and the driver entry hooks.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    base = path or os.environ.get(
        "T2V_TPU_JAX_CACHE", os.path.expanduser("~/.cache/t2v_tpu_jax")
    )
    # key by platform: CPU loading TPU-era AOT entries trips machine-feature
    # mismatch warnings/SIGILL risk
    platform = jax.default_backend()
    path = os.path.join(base, platform)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
