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
- conv channels (opt-in, `conv_channels=True`): the same column/row
  pairing applied to the ResBlock and TemporalConvBlock conv chains.
  The key observation making this reshard-free is that GroupNorm's
  32-group statistics are LOCAL under a channel shard whenever the
  shard count divides the group count (guarded below): splitting C over
  n lands exactly on group boundaries, so the GN between the paired
  convs needs no collective. Pairs: ResBlock in_conv (out-split) →
  emb_proj (out-split, so the emb add stays sharded) → out_norm (local
  stats) → out_conv (in-split, one psum); TemporalConvBlock conv1/conv3
  out-split, conv2/conv4 in-split (two psums), norms 2/4 local.
  skip_connection / Down/Upsample / the top-level conv_in, out_norm,
  out_conv stay replicated (their inputs are replicated activations).
  Caveat: with use_scale_shift_norm (not used by VC2) the emb_proj
  kernel is (E, 2C) and the jnp.split forces a reshard — correct but
  slower. Perf on real multi-chip hardware is unmeasured here (single
  chip); the CPU-mesh equality test pins correctness and the dryrun
  exercises the layout,
- everything else (norms, embeddings, biases) replicated — GSPMD slices
  a replicated (C,) scale/bias against a sharded activation locally.

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


_BLOCK_MARKERS = ("input_blocks", "middle_block", "output_blocks")


def tp_spec_for(path_str: str, leaf, conv_channels: bool = False) -> P:
    """PartitionSpec for one UNet param leaf under model-axis TP."""
    if not path_str.endswith("kernel"):
        return P()
    nd = getattr(leaf, "ndim", 0)
    if nd == 3 and "/ff/proj/" in path_str:
        return P(None, None, "model")  # GEGLU column parallel (F split)
    in_block = any(m in path_str for m in _BLOCK_MARKERS)
    if conv_channels and in_block and nd == 4:
        # ResBlock / TemporalConvBlock conv pairing (see module docstring);
        # the in-block guard keeps the top-level conv_in/out_conv (whose
        # names collide) replicated.
        if any(s in path_str for s in ("/in_conv/", "/conv1/", "/conv3/")):
            return P(None, None, None, "model")  # column (out-ch split)
        if any(s in path_str for s in ("/out_conv/", "/conv2/", "/conv4/")):
            return P(None, None, "model", None)  # row (in-ch split, psum)
        return P()
    if nd != 2:
        return P()
    if conv_channels and in_block and "/emb_proj/" in path_str:
        # out-split so the timestep-embedding add meets in_conv's sharded
        # output without a reshard
        return P(None, "model")
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
    mesh: Mesh, params, head_dim: Optional[int] = None,
    conv_channels: bool = False,
) -> Any:
    """NamedShardings mirroring `params` with attention kernels split over
    the "model" axis. A kernel stays replicated unless the split lands on a
    head boundary: with `head_dim` given, the head count (split_dim //
    head_dim) must divide the axis; otherwise only the raw dim is checked
    (which can silently split mid-head — pass head_dim for real models,
    e.g. level-0 VC2 attention has 5 heads of 64 and must NOT split 2-way).

    conv_channels=True additionally pairs the ResBlock/TemporalConvBlock
    convs column/row over the model axis — only when the axis size divides
    the GroupNorm group count (32), the condition under which the
    between-conv GN stats stay shard-local (module docstring)."""
    model_n = mesh.shape.get("model", 1)
    if "model" not in mesh.shape or model_n <= 1:
        # no "model" axis (or a trivial one): emitting specs that NAME the
        # axis would make NamedSharding construction raise on every kernel
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: rep, params)
    conv_channels = conv_channels and 32 % model_n == 0

    def to_sharding(path, leaf):
        ps = _path_str(path)
        spec = tp_spec_for(ps, leaf, conv_channels=conv_channels)
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


def shard_params_tp(
    mesh: Mesh, params, head_dim: Optional[int] = None,
    conv_channels: bool = False,
):
    """device_put `params` with TP shardings over `mesh`."""
    return jax.device_put(
        params,
        tp_param_shardings(
            mesh, params, head_dim, conv_channels=conv_channels
        ),
    )
