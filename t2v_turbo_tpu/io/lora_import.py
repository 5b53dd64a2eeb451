"""Importer for the reference's `unet_lora.pt` LoRA exports (cloneofsimo
format, reference utils/lora.py:582-596).

The file is a flat list [up_0, down_0, up_1, down_1, ...] whose order is the
torch `named_modules()` DFS over every nn.Linear / nn.Conv2d / nn.Conv3d in
the UNet (reference _find_modules_v2:263-307 with ancestor {"UNetModel"}).
`lora_module_order` reproduces that order analytically from UNetConfig
(module registration order of the reference __init__); a parity test checks
it against the real reference model instantiated on the torch meta device.

`apply_lora_pt` folds each pair into the base kernels with alpha=1.0 —
exactly `collapse_lora` (reference utils/lora.py:793-860, invoked by
app.py:244-265), so the imported params are inference-ready with zero LoRA
overhead.

Note: Conv1d proj layers (the init_attn temporal transformer's conv
projections) are NOT in the search classes, hence never LoRA-injected.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..models.unet_vc2 import UNetConfig


def _btb_order(prefix: str) -> List[Tuple[str, str]]:
    """BasicTransformerBlock registration order: attn1, ff, attn2
    (reference attention.py:243-282 — ff is created before attn2)."""
    out = []
    for attn in ("attn1",):
        for t in ("to_q", "to_k", "to_v"):
            out.append((f"{prefix}.{attn}.{t}", "linear"))
        out.append((f"{prefix}.{attn}.to_out.0", "linear"))
    out.append((f"{prefix}.ff.net.0.proj", "linear"))
    out.append((f"{prefix}.ff.net.2", "linear"))
    for attn in ("attn2",):
        for t in ("to_q", "to_k", "to_v"):
            out.append((f"{prefix}.{attn}.{t}", "linear"))
        out.append((f"{prefix}.{attn}.to_out.0", "linear"))
    return out


def _transformer_order(prefix: str, depth: int, use_linear: bool) -> List[Tuple[str, str]]:
    out = []
    if use_linear:
        out.append((f"{prefix}.proj_in", "linear"))
    for d in range(depth):
        out.extend(_btb_order(f"{prefix}.transformer_blocks.{d}"))
    if use_linear:
        out.append((f"{prefix}.proj_out", "linear"))
    return out


def _resblock_order(prefix: str, has_skip: bool, temporal: bool) -> List[Tuple[str, str]]:
    out = [
        (f"{prefix}.in_layers.2", "conv2d"),
        (f"{prefix}.emb_layers.1", "linear"),
        (f"{prefix}.out_layers.3", "conv2d"),
    ]
    if has_skip:
        out.append((f"{prefix}.skip_connection", "conv2d"))
    if temporal:
        out.extend(
            (f"{prefix}.temopral_conv.conv{i}.{2 if i == 1 else 3}", "conv3d")
            for i in range(1, 5)
        )
    return out


def lora_module_order(cfg: UNetConfig) -> List[Tuple[str, str]]:
    """Ordered (torch_module_name, kind) of every LoRA-injected layer."""
    order: List[Tuple[str, str]] = [
        ("time_embed.0", "linear"),
        ("time_embed.2", "linear"),
    ]
    if cfg.fps_cond:
        order += [("fps_embedding.0", "linear"), ("fps_embedding.2", "linear")]
    if cfg.time_cond_proj_dim is not None:
        order.append(("time_cond_proj", "linear"))
    if cfg.motion_cond_proj_dim is not None:
        order += [("motion_cond_proj", "linear"), ("combine_proj", "linear")]

    # input_blocks is registered before init_attn; its later appends keep
    # the attribute position (torch _modules insertion order)
    input_blocks: List[Tuple[str, str]] = [("input_blocks.0.0", "conv2d")]
    ds, ch = 1, cfg.model_channels
    ti = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            out_ch = mult * cfg.model_channels
            input_blocks += _resblock_order(
                f"input_blocks.{ti}.0", has_skip=ch != out_ch, temporal=cfg.temporal_conv
            )
            ch = out_ch
            if ds in cfg.attention_resolutions:
                input_blocks += _transformer_order(f"input_blocks.{ti}.1", cfg.transformer_depth, True)
                if cfg.temporal_attention:
                    input_blocks += _transformer_order(
                        f"input_blocks.{ti}.2", cfg.temporal_transformer_depth, True
                    )
            ti += 1
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append((f"input_blocks.{ti}.0.op", "conv2d"))
            ti += 1
            ds *= 2
    order += input_blocks

    if cfg.addition_attention:
        # init_attn uses conv1d projections (excluded); only its inner blocks
        order += _transformer_order("init_attn.0", cfg.transformer_depth, False)

    order += _resblock_order("middle_block.0", False, cfg.temporal_conv)
    order += _transformer_order("middle_block.1", cfg.transformer_depth, True)
    j = 2
    if cfg.temporal_attention:
        order += _transformer_order("middle_block.2", cfg.temporal_transformer_depth, True)
        j = 3
    order += _resblock_order(f"middle_block.{j}", False, cfg.temporal_conv)

    chans = [cfg.model_channels]
    ch2 = cfg.model_channels
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch2 = mult * cfg.model_channels
            chans.append(ch2)
        if level != len(cfg.channel_mult) - 1:
            chans.append(ch2)
    oi = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            out_ch = mult * cfg.model_channels
            order += _resblock_order(
                f"output_blocks.{oi}.0", has_skip=(ch2 + ich) != out_ch,
                temporal=cfg.temporal_conv,
            )
            ch2 = out_ch
            j = 0
            if ds in cfg.attention_resolutions:
                order += _transformer_order(f"output_blocks.{oi}.1", cfg.transformer_depth, True)
                j = 1
                if cfg.temporal_attention:
                    order += _transformer_order(
                        f"output_blocks.{oi}.2", cfg.temporal_transformer_depth, True
                    )
                    j = 2
            if level and i == cfg.num_res_blocks:
                order.append((f"output_blocks.{oi}.{j + 1}.conv", "conv2d"))
                ds //= 2
            oi += 1

    order.append(("out.2", "conv2d"))
    return order


# --------------------------------------------------------------------------
# torch name -> flax param path
# --------------------------------------------------------------------------

_REST_MAP = {
    "in_layers.2": ("in_conv",),
    "emb_layers.1": ("emb_proj",),
    "out_layers.3": ("out_conv",),
    "skip_connection": ("skip_connection",),
    "proj_in": ("proj_in",),
    "proj_out": ("proj_out",),
}


def _translate(name: str, cfg: UNetConfig) -> Tuple[str, ...]:
    parts = name.split(".")
    if name == "out.2":
        return ("out_conv",)
    if parts[0] in ("time_embed", "fps_embedding"):
        return (f"{parts[0]}_{parts[1]}",)
    if parts[0] in ("time_cond_proj", "motion_cond_proj", "combine_proj"):
        return (parts[0],)
    if name == "input_blocks.0.0":
        return ("conv_in",)

    def rest_path(rest: List[str]) -> Tuple[str, ...]:
        joined = ".".join(rest)
        if joined in _REST_MAP:
            return _REST_MAP[joined]
        if rest[0] == "temopral_conv":
            return ("temporal_conv", rest[1].split(".")[0] if "." in rest[1] else rest[1])
        if rest[0] == "transformer_blocks":
            d = rest[1]
            inner = rest[2:]
            if inner[0] in ("attn1", "attn2"):
                leaf = "to_out" if inner[1] == "to_out" else inner[1]
                return (f"blocks_{d}", inner[0], leaf)
            if inner[0] == "ff":
                leaf = "proj" if inner[-1] == "proj" else "out"
                return (f"blocks_{d}", "ff", leaf)
        raise KeyError(name)

    if parts[0] == "init_attn":
        return ("init_attn",) + rest_path(parts[2:])
    if parts[0] == "input_blocks":
        i, j = int(parts[1]), int(parts[2])
        if parts[3] == "op":
            return (f"input_blocks_{i - 1}_0", "op")
        return (f"input_blocks_{i - 1}_{j}",) + rest_path(parts[3:])
    if parts[0] == "middle_block":
        return (f"middle_block_{parts[1]}",) + rest_path(parts[2:])
    if parts[0] == "output_blocks":
        i, j = int(parts[1]), int(parts[2])
        if parts[3] == "conv":
            return (f"output_blocks_{i}_{j}", "conv")
        return (f"output_blocks_{i}_{j}",) + rest_path(parts[3:])
    raise KeyError(name)


def _delta_kernel(up: np.ndarray, down: np.ndarray, kind: str) -> np.ndarray:
    """ΔW = up @ down in torch layout, converted to the flax kernel layout."""
    up2 = up.reshape(up.shape[0], -1).astype(np.float32)
    down2 = down.reshape(down.shape[0], -1).astype(np.float32)
    dw = up2 @ down2  # (O, I*k...)
    if kind == "linear":
        return np.ascontiguousarray(dw.T)
    if kind == "conv2d":
        o = up.shape[0]
        i, kh, kw = down.shape[1], down.shape[2], down.shape[3]
        return np.ascontiguousarray(dw.reshape(o, i, kh, kw).transpose(2, 3, 1, 0))
    if kind == "conv3d":
        o = up.shape[0]
        i, kt = down.shape[1], down.shape[2]
        return np.ascontiguousarray(
            dw.reshape(o, i, kt).transpose(2, 1, 0).reshape(kt, 1, i, o)
        )
    raise ValueError(kind)


def apply_lora_pt(params: Dict, weights: List[np.ndarray], cfg: UNetConfig,
                  alpha: float = 1.0) -> Dict:
    """Fold a cloneofsimo [up, down, ...] list into flax UNet params
    (collapse semantics, alpha=1.0 like the reference app)."""
    order = lora_module_order(cfg)
    assert len(weights) == 2 * len(order), (
        f"lora file has {len(weights)} tensors, expected {2 * len(order)} "
        f"for this config"
    )
    import jax.numpy as jnp

    new = dict(params)

    def set_in(tree, path, fn):
        node = tree
        for p in path[:-1]:
            node[p] = dict(node[p])
            node = node[p]
        node[path[-1]] = dict(node[path[-1]])
        node[path[-1]]["kernel"] = fn(node[path[-1]]["kernel"])

    root = new["params"] if "params" in new else new
    if "params" in new:
        new["params"] = dict(new["params"])
        root = new["params"]
    for idx, (name, kind) in enumerate(order):
        up = np.asarray(weights[2 * idx])
        down = np.asarray(weights[2 * idx + 1])
        # skip-connection 1x1 convs are stored as dense kernels here
        path = _translate(name, cfg)
        delta = _delta_kernel(up, down, kind)
        if path[-1] == "skip_connection" and delta.shape[0] == 1:
            delta = delta  # (1,1,I,O) matches stored layout
        set_in(root, path, lambda k, d=delta: (
            jnp.asarray(k) + alpha * jnp.asarray(d).reshape(jnp.asarray(k).shape)
        ).astype(k.dtype) if hasattr(k, "dtype") else k + d)
    return new


def load_lora_pt(path: str) -> List[np.ndarray]:
    import torch

    weights = torch.load(path, map_location="cpu", weights_only=False)
    return [w.float().numpy() for w in weights]
