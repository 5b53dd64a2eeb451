"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests run unchanged on fake CPU devices — this is the
"multi-node without a cluster" mechanism the reference lacks (it delegated
distributed correctness entirely to HF accelerate; see SURVEY.md §4).
Env vars must be set before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment exports JAX_PLATFORMS=axon (the TPU tunnel), which wins over
# env-var overrides set here; jax.config.update is authoritative instead.
jax.config.update("jax_platforms", "cpu")

# This box has ONE CPU core, so XLA compiles are serial and expensive
# (~40-100s for the tiny trainer graphs). The persistent cache makes every
# re-run of an unchanged graph near-instant, including across test files that
# build identical HLO from the shared tiny fixtures.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def stub_module(name, **attrs):
    """Install a stub module with a valid __spec__ (transformers probes
    importlib.util.find_spec, which raises on spec-less stubs)."""
    import importlib.machinery
    import sys
    import types

    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod
