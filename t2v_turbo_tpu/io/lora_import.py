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
    if len(weights) != 2 * len(order):
        raise ValueError(
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


# ==========================================================================
# ModelScope (diffusers UNet3DConditionModel) LoRA — reference app_ms.py:
# LoraHandler.add_lora_to_model(..., lora_path=args.unet_dir, r=32) loads the
# same flat [up, down, ...] list via monkeypatch_or_replace_lora_extended
# (utils/lora.py:818-886), consuming pairs in named_modules() DFS order over
# every nn.Linear / nn.Conv2d / nn.Conv3d under UNet3DConditionModel, then
# collapse_lora + monkeypatch_remove_lora (app_ms.py:206-215).
# ==========================================================================
#
# Registration-order facts the analytic order depends on (diffusers==0.30.0,
# the version pinned by the reference cog.yaml, and any >=0.17):
#  * UNet3DConditionModel._modules order is conv_in, time_proj,
#    time_embedding, transformer_in, down_blocks, **up_blocks, mid_block**,
#    conv_norm_out, conv_act, conv_out — up_blocks is registered as an empty
#    ModuleList BEFORE mid_block is assigned (reference
#    model_scope/unet_3d_condition.py:159-190), so the DFS visits up blocks
#    before the mid block even though data flows down→mid→up.
#  * TimestepEmbedding registers linear_1, cond_proj (when
#    time_cond_proj_dim is set — true for the LCM student), linear_2.
#  * BasicTransformerBlock registers norm1, attn1, norm2, attn2, norm3, ff —
#    Linear order attn1(q,k,v,to_out.0), attn2(...), ff(net.0.proj, net.2).
#    (The lvdm order attn1, ff, attn2 does NOT apply here.)
#  * TransformerTemporalModel passes double_self_attention=True, so temporal
#    attn2 is self-attention (inner→inner), matching MSUNet's temp_attn.
#  * Transformer2DModel is built with use_linear_projection=True
#    (model_scope/unet_3d_blocks.py:170,226 defaults), so proj_in/proj_out
#    are Linear.
#  * 3D blocks register resnets, temp_convs, [attentions, temp_attentions],
#    [downsamplers|upsamplers] in that order (unet_3d_blocks.py:364-367,
#    502-513, 737-743, 849-853).
#  * ResnetBlock2D: conv1, time_emb_proj, conv2, conv_shortcut; every
#    up-block resnet has a conv_shortcut (input = prev + skip > out).
#  * TemporalConvLayer: conv1.2, conv2.3, conv3.3, conv4.3 (Conv3d).


def _ms_btb_order(prefix: str) -> List[Tuple[str, str]]:
    out = []
    for attn in ("attn1", "attn2"):
        for t in ("to_q", "to_k", "to_v"):
            out.append((f"{prefix}.{attn}.{t}", "linear"))
        out.append((f"{prefix}.{attn}.to_out.0", "linear"))
    out.append((f"{prefix}.ff.net.0.proj", "linear"))
    out.append((f"{prefix}.ff.net.2", "linear"))
    return out


def _ms_transformer_order(prefix: str) -> List[Tuple[str, str]]:
    return (
        [(f"{prefix}.proj_in", "linear")]
        + _ms_btb_order(f"{prefix}.transformer_blocks.0")
        + [(f"{prefix}.proj_out", "linear")]
    )


def _ms_resnet_order(prefix: str, has_shortcut: bool) -> List[Tuple[str, str]]:
    out = [
        (f"{prefix}.conv1", "conv2d"),
        (f"{prefix}.time_emb_proj", "linear"),
        (f"{prefix}.conv2", "conv2d"),
    ]
    if has_shortcut:
        out.append((f"{prefix}.conv_shortcut", "conv2d"))
    return out


def _ms_temp_conv_order(prefix: str) -> List[Tuple[str, str]]:
    return [
        (f"{prefix}.conv{i}.{2 if i == 1 else 3}", "conv3d") for i in range(1, 5)
    ]


def lora_module_order_ms(cfg) -> List[Tuple[str, str]]:
    """Ordered (torch_module_name, kind) of every LoRA-injected layer of the
    MS UNet (MSUNetConfig)."""
    n_levels = len(cfg.block_out_channels)
    L = cfg.layers_per_block
    order: List[Tuple[str, str]] = [("conv_in", "conv2d")]
    order.append(("time_embedding.linear_1", "linear"))
    if cfg.time_cond_proj_dim is not None:
        order.append(("time_embedding.cond_proj", "linear"))
    order.append(("time_embedding.linear_2", "linear"))
    order += _ms_transformer_order("transformer_in")

    ch = cfg.block_out_channels[0]
    for i, out_ch in enumerate(cfg.block_out_channels):
        bp = f"down_blocks.{i}"
        cross = i < n_levels - 1
        for j in range(L):
            in_ch = ch if j == 0 else out_ch
            order += _ms_resnet_order(f"{bp}.resnets.{j}", in_ch != out_ch)
        for j in range(L):
            order += _ms_temp_conv_order(f"{bp}.temp_convs.{j}")
        if cross:
            for j in range(L):
                order += _ms_transformer_order(f"{bp}.attentions.{j}")
            for j in range(L):
                order += _ms_transformer_order(f"{bp}.temp_attentions.{j}")
            order.append((f"{bp}.downsamplers.0.conv", "conv2d"))
        ch = out_ch

    # up_blocks are registered before mid_block (see module-order note above)
    for i in range(n_levels):
        bp = f"up_blocks.{i}"
        cross = i > 0
        for j in range(L + 1):
            # input = prev + skip channels, always != out -> shortcut always
            order += _ms_resnet_order(f"{bp}.resnets.{j}", True)
        for j in range(L + 1):
            order += _ms_temp_conv_order(f"{bp}.temp_convs.{j}")
        if cross:
            for j in range(L + 1):
                order += _ms_transformer_order(f"{bp}.attentions.{j}")
            for j in range(L + 1):
                order += _ms_transformer_order(f"{bp}.temp_attentions.{j}")
        if i < n_levels - 1:
            order.append((f"{bp}.upsamplers.0.conv", "conv2d"))

    order += _ms_resnet_order("mid_block.resnets.0", False)
    order += _ms_resnet_order("mid_block.resnets.1", False)
    order += _ms_temp_conv_order("mid_block.temp_convs.0")
    order += _ms_temp_conv_order("mid_block.temp_convs.1")
    order += _ms_transformer_order("mid_block.attentions.0")
    order += _ms_transformer_order("mid_block.temp_attentions.0")

    order.append(("conv_out", "conv2d"))
    return order


def _ms_tfm_rest(rest: List[str]) -> Tuple[str, ...]:
    joined = ".".join(rest)
    if joined in ("proj_in", "proj_out"):
        return (joined,)
    assert rest[0] == "transformer_blocks", rest
    inner = rest[2:]
    if inner[0] in ("attn1", "attn2"):
        leaf = "to_out" if inner[1] == "to_out" else inner[1]
        return (f"blocks_{rest[1]}", inner[0], leaf)
    if inner[0] == "ff":
        return (f"blocks_{rest[1]}", "ff", "proj" if inner[-1] == "proj" else "out")
    raise KeyError(joined)


def _translate_ms(name: str) -> Tuple[str, ...]:
    """torch module name (MS UNet) -> flax param path in MSUNet3DConditionModel."""
    parts = name.split(".")
    if name in ("conv_in", "conv_out"):
        return (name,)
    if parts[0] == "time_embedding":
        return (parts[1],)
    if parts[0] == "transformer_in":
        return ("transformer_in",) + _ms_tfm_rest(parts[1:])

    def level_rest(rest: List[str]) -> Tuple[str, ...]:
        kind, j = rest[0], rest[1]
        inner = rest[2:]
        if kind == "resnets":
            leaf = {
                "conv1": "in_conv",
                "time_emb_proj": "emb_proj",
                "conv2": "out_conv",
                "conv_shortcut": "skip_connection",
            }[inner[0]]
            return ("resnet", leaf), j
        if kind == "temp_convs":
            return ("temp_conv", inner[0].split(".")[0] if "." in inner[0] else inner[0]), j
        if kind == "attentions":
            return ("attn",) + _ms_tfm_rest(inner), j
        if kind == "temp_attentions":
            return ("temp_attn",) + _ms_tfm_rest(inner), j
        raise KeyError(name)

    if parts[0] in ("down_blocks", "up_blocks"):
        side = "down" if parts[0] == "down_blocks" else "up"
        i = parts[1]
        if parts[2] == "downsamplers":
            return (f"down_{i}_downsample", "op")
        if parts[2] == "upsamplers":
            return (f"up_{i}_upsample", "conv")
        rest, j = level_rest(parts[2:])
        return (f"{side}_{i}_layer_{j}",) + rest
    if parts[0] == "mid_block":
        if parts[1] == "resnets":
            leaf = {
                "conv1": "in_conv",
                "time_emb_proj": "emb_proj",
                "conv2": "out_conv",
            }[parts[3]]
            return (f"mid_resnet_{parts[2]}", leaf)
        if parts[1] == "temp_convs":
            return (f"mid_temp_conv_{parts[2]}", parts[3])
        if parts[1] == "attentions":
            return ("mid_attn",) + _ms_tfm_rest(parts[3:])
        if parts[1] == "temp_attentions":
            return ("mid_temp_attn",) + _ms_tfm_rest(parts[3:])
    raise KeyError(name)


def apply_lora_pt_ms(params: Dict, weights: List[np.ndarray], cfg,
                     alpha: float = 1.0) -> Dict:
    """Fold a cloneofsimo [up, down, ...] list into flax MS UNet params
    (collapse semantics, alpha=1.0 — reference app_ms.py:206-215)."""
    order = lora_module_order_ms(cfg)
    if len(weights) != 2 * len(order):
        raise ValueError(
            f"MS lora file has {len(weights)} tensors, expected "
            f"{2 * len(order)} for this config"
        )
    import jax.numpy as jnp

    new = dict(params)
    root = new
    if "params" in new:
        new["params"] = dict(new["params"])
        root = new["params"]

    def set_in(tree, path, fn):
        node = tree
        for p in path[:-1]:
            node[p] = dict(node[p])
            node = node[p]
        node[path[-1]] = dict(node[path[-1]])
        node[path[-1]]["kernel"] = fn(node[path[-1]]["kernel"])

    for idx, (name, kind) in enumerate(order):
        up = np.asarray(weights[2 * idx])
        down = np.asarray(weights[2 * idx + 1])
        path = _translate_ms(name)
        delta = _delta_kernel(up, down, kind)
        set_in(root, path, lambda k, d=delta: (
            jnp.asarray(k) + alpha * jnp.asarray(d).reshape(jnp.asarray(k).shape)
        ).astype(k.dtype))
    return new
