"""Tensor parallelism for the UNet attention blocks over the mesh's
"model" axis.

The reference has no TP at all (SURVEY.md §2.9: DDP only), so this is a
TPU-native capability, not a port: TP here is purely *declarative* — the
attention projection kernels get PartitionSpecs and GSPMD inserts the
all-reduces. Megatron-style column/row split:

- to_q/to_k/to_v kernels (in, out): split the OUTPUT dim -> each shard
  computes its subset of heads (the reshape to (B, S, H, D) keeps the
  sharding on H),
- to_out kernel (in, out): split the INPUT dim -> partial products are
  psum'ed by XLA right where DDP's gradient sync already runs,
- GEGLU FF: the proj kernel is stored (C, 2, F) with value/gate on their
  own axis (models/layers.py _GEGLUProj) precisely so F column-splits
  cleanly — P(None, None, "model") on proj, row-parallel P("model", None)
  on the out kernel (Megatron MLP): one psum per FF, no mid-block
  reshard. These are the widest matmuls in every transformer block, so
  this is where most of the TP FLOP coverage comes from,
- everything else (convs, norms, embeddings) replicated.

Head counts must divide the model-axis size; `tp_param_shardings` checks
this per leaf and leaves non-conforming kernels replicated rather than
failing. Pass `head_dim` (num_head_channels) so the guard counts HEADS —
a split must land on a head boundary or the (B, S, H, D) reshape inside
attention cannot propagate it and GSPMD falls back to a mid-attention
reshard. Without `head_dim` only raw-dim divisibility is checked.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return "/".join(out)


def tp_spec_for(path_str: str, leaf) -> P:
    """PartitionSpec for one UNet param leaf under model-axis TP."""
    if not path_str.endswith("kernel"):
        return P()
    nd = getattr(leaf, "ndim", 0)
    if nd == 3 and "/ff/proj/" in path_str:
        return P(None, None, "model")  # GEGLU column parallel (F split)
    if nd != 2:
        return P()
    if any(
        f"/{n}/" in path_str
        for n in ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip")
    ):
        return P(None, "model")  # column parallel (per-head split)
    if "/to_out/" in path_str:
        return P("model", None)  # row parallel (psum on output)
    if "/ff/out/" in path_str:
        return P("model", None)  # GEGLU out: row parallel (psum)
    return P()


def tp_param_shardings(
    mesh: Mesh, params, head_dim: Optional[int] = None
) -> Any:
    """NamedShardings mirroring `params` with attention kernels split over
    the "model" axis. A kernel stays replicated unless the split lands on a
    head boundary: with `head_dim` given, the head count (split_dim //
    head_dim) must divide the axis; otherwise only the raw dim is checked
    (which can silently split mid-head — pass head_dim for real models,
    e.g. level-0 VC2 attention has 5 heads of 64 and must NOT split 2-way)."""
    model_n = mesh.shape.get("model", 1)

    def to_sharding(path, leaf):
        ps = _path_str(path)
        spec = tp_spec_for(ps, leaf)
        is_attn = any(
            f"/{n}/" in ps
            for n in ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "to_out")
        )
        for dim, axis in enumerate(spec):
            if axis != "model":
                continue
            size = leaf.shape[dim]
            ok = size % model_n == 0
            if ok and head_dim is not None and is_attn:
                # q/k/v split the head (output) dim; to_out's input dim is
                # the same H*D concatenation — both must split per-head.
                # FF kernels have no head structure: raw divisibility
                # suffices there.
                ok = size % head_dim == 0 and (size // head_dim) % model_n == 0
            if not ok:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_tp(mesh: Mesh, params, head_dim: Optional[int] = None):
    """device_put `params` with TP shardings over `mesh`."""
    return jax.device_put(params, tp_param_shardings(mesh, params, head_dim))
