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
