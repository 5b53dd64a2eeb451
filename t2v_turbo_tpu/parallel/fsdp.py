"""FSDP-style parameter / optimizer-state sharding over the "data" axis.

The reference absorbs full-model (v2) training by replicating the model on
every DDP rank and shrinking optimizer memory with bitsandbytes AdamW8bit
(reference train_latent_t2v_turbo_v2.py:669,764-797). On TPU the idiomatic
equivalent is ZeRO-3/FSDP expressed declaratively: parameters and Adam
moments live SHARDED over the mesh's "data" axis, and XLA's SPMD
partitioner inserts the per-layer all-gathers for forward/backward and a
reduce-scatter for the gradients — no manual collectives, just
PartitionSpecs. Memory per chip for params + grads + moments drops by the
data-axis size, which is what lets the full VC2 UNet (+ f32 Adam state)
train inside a 16 GB chip.

Rules:
- `fsdp_spec_for` shards the LARGEST dim of a leaf that is divisible by
  the data-axis size, skipping dims already claimed by another rule (TP
  specs compose: a q-projection kernel sharded P(None, "model") gets
  "data" on dim 0 -> P("data", "model")).
- Leaves with fewer than `min_size` elements stay replicated — gathering
  a 1 KB bias costs more latency than its shard saves.
- Works on ANY pytree: params, optax states (Adam mu/nu mirror the param
  shapes and get identical specs; blockwise-int8 moment tables shard on
  their block dim), EMA trees, MultiSteps accumulators.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec_for(
    leaf,
    data_n: int,
    base: Optional[P] = None,
    min_size: int = 1 << 14,
    axis: str = "data",
) -> P:
    """PartitionSpec sharding `leaf`'s largest divisible dim over `axis`,
    preserving any dims `base` already shards."""
    shape = getattr(leaf, "shape", ())
    base_spec = tuple(base) if base is not None else ()
    if data_n <= 1 or not shape:
        return P(*base_spec)
    size = 1
    for s in shape:
        size *= s
    if size < min_size:
        return P(*base_spec)
    spec = list(base_spec) + [None] * (len(shape) - len(base_spec))
    candidates = [
        i for i, s in enumerate(shape) if spec[i] is None and s % data_n == 0
    ]
    if not candidates:
        return P(*base_spec)
    dim = max(candidates, key=lambda i: shape[i])
    spec[dim] = axis
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def fsdp_shardings(
    mesh: Mesh,
    tree: Any,
    base_shardings: Any = None,
    min_size: int = 1 << 14,
) -> Any:
    """NamedShardings mirroring `tree` with every large leaf sharded over
    the "data" axis. `base_shardings` (optional, e.g. from
    parallel.tp.tp_param_shardings) contributes pre-existing specs that
    FSDP composes around instead of overriding."""
    data_n = mesh.shape.get("data", 1)

    def one(leaf, base=None):
        spec = base.spec if isinstance(base, NamedSharding) else base
        return NamedSharding(
            mesh, fsdp_spec_for(leaf, data_n, base=spec, min_size=min_size)
        )

    if base_shardings is None:
        return jax.tree.map(one, tree)
    return jax.tree.map(one, tree, base_shardings)
