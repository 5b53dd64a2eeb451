"""Device mesh and sharding rules.

The reference's only parallelism is NCCL DDP plus rank-role partitioning
(SURVEY.md §2.9); here parallelism is declarative GSPMD over a named mesh:

- axis "data": batch data-parallelism (grad psum inserted by XLA),
- axis "seq":  temporal sequence parallelism — video frames T are the natural
  long-context axis (SURVEY.md §5); sharding (B, T, H, W, C) on T makes XLA
  insert halo exchanges for the (3,1,1) temporal convs and all-gathers for
  temporal attention, which ride ICI,
- axis "model": reserved for tensor parallelism of the attention/FF blocks
  (size 1 until needed).

Shardings are expressed once, on the batch and params, and pjit propagates
the rest.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    seq: int = 1,
    model: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (seq * model) != 0:
            raise ValueError(
                f"make_mesh: need a device count divisible by seq*model="
                f"{seq}*{model}={seq * model}, but got {n} device(s) "
                f"({[str(d) for d in devices[:4]]}{'...' if n > 4 else ''}). "
                "If this is a single-chip or CPU host, force virtual devices "
                "with XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                'jax.config.update("jax_platforms", "cpu") before any jax '
                "device query (see tests/conftest.py)."
            )
        data = n // (seq * model)
    if data * seq * model != n:
        raise ValueError(
            f"make_mesh: data*seq*model = {data}*{seq}*{model} = "
            f"{data * seq * model} does not match the {n} device(s) provided."
        )
    arr = np.array(devices).reshape(data, seq, model)
    return Mesh(arr, ("data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, ...) video batches: B over data, T over seq."""
    return NamedSharding(mesh, P("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Shard a pytree of (B, T, ...) arrays onto the mesh; (B,) arrays go on
    data only; everything else is replicated."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return jax.device_put(x, NamedSharding(mesh, P("data", "seq")
                if x.ndim >= 5 else P("data")))
        if hasattr(x, "ndim") and x.ndim == 1:
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return jax.device_put(x, replicated(mesh))
    return jax.tree.map(put, batch)
