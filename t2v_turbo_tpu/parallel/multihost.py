"""Multi-host (multi-process) runtime initialization and batch assembly.

The reference's multi-node story is HF accelerate spawning one process per
GPU with NCCL DDP (reference train_t2v_turbo_v1_lora.py:578-584 and
utils/utils.py:75-79 `setup_dist`). The TPU-native equivalent:

- `initialize()` wires `jax.distributed` (GSPMD then sees every host's
  devices as one global mesh; collectives ride ICI within a slice and DCN
  across slices),
- `host_local_batch_to_global()` assembles per-host batches into global
  jax.Arrays via `jax.make_array_from_process_local_data` — each host feeds
  only its shard (the webdataset layer already splits shards per host on
  `jax.process_index()`, data/webdata.py), no host ever materializes the
  global batch.

Tested with real multi-process coordination on CPU devices in
tests/test_multihost.py (the "multi-node without a cluster" strategy,
SURVEY.md §4).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize jax.distributed. On TPU pods all arguments are inferred
    from the TPU metadata server; pass them explicitly for CPU/GPU clusters
    or tests. Safe to call once per process, before any device query."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def host_local_batch_to_global(mesh: Mesh, batch: dict) -> dict:
    """Assemble per-host batch arrays into global sharded jax.Arrays.

    Sharding rules match trainer.shard_batch: (B, T, H, W, C) videos go
    (data, seq), (B, ...) rows go (data,), scalars replicate. Each host
    passes its LOCAL batch (global_B / process_count rows); the result is a
    global array without any cross-host gather of actual data.
    """

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 5:
            spec = P("data", "seq")
        elif x.ndim >= 1:
            spec = P("data")
        else:
            spec = P()
        sh = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    batch = {k: v for k, v in batch.items() if not k.startswith("_")}
    return jax.tree.map(put, batch)
