"""PyTorch checkpoint -> JAX pytree importers for all model families.

Maps Lightning-style state dicts (the VideoCrafter2 `model.ckpt` layout:
`model.diffusion_model.*` UNet, `first_stage_model.*` VAE,
`cond_stage_model.model.*` OpenCLIP text tower — reference
utils/common_utils.py:399-411, lvdm/models/ddpm3d.py) onto the channels-last
flax parameter trees of this package.

Conventions:
- torch Linear weight (out, in)    -> Dense kernel (in, out)        [transpose]
- torch Conv2d weight (O, I, H, W) -> Conv kernel (H, W, I, O)
- torch Conv3d (O, I, 3, 1, 1)     -> temporal Conv kernel (3, 1, I, O)
- torch Conv1d/Conv2d 1x1          -> Dense kernel (in, out)
- torch GroupNorm/LayerNorm weight/bias -> scale/bias

Everything returns plain nested dicts of numpy arrays ready for
`flax.core.freeze({"params": ...})` / direct `model.apply({"params": ...})`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from ..models.unet_vc2 import UNetConfig


Array = np.ndarray
StateDict = Mapping[str, "np.ndarray"]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """torch.load a checkpoint to numpy (CPU, no grad state).

    Floating tensors are normalized to float32 regardless of the
    checkpoint's storage dtype (fp16/bf16 releases exist for several of
    the reference's towers): the jitted programs' param avals must match
    the flax-init trees that `apps/warmup.py` AOT-lowers from, or every
    warmed persistent-cache entry would silently miss. bf16 torch tensors
    also have no direct numpy dtype, so the upcast doubles as the only
    portable conversion. Integer/bool buffers keep their dtype.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj

    def _to_np(v):
        if hasattr(v, "numpy"):
            return (v.float() if v.is_floating_point() else v).numpy()
        a = np.asarray(v)
        return a.astype(np.float32) if np.issubdtype(a.dtype, np.floating) else a

    return {k: _to_np(v) for k, v in sd.items()}


def split_vc2_checkpoint(sd: StateDict):
    """Split a full VideoCrafter2 LatentDiffusion state dict into
    (unet_sd, vae_sd, clip_sd) with prefixes stripped."""
    unet, vae, clip = {}, {}, {}
    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            unet[k[len("model.diffusion_model.") :]] = v
        elif k.startswith("first_stage_model."):
            vae[k[len("first_stage_model.") :]] = v
        elif k.startswith("cond_stage_model.model."):
            clip[k[len("cond_stage_model.model.") :]] = v
    return unet, vae, clip


# --------------------------------------------------------------------------
# primitive converters
# --------------------------------------------------------------------------


def _lin(sd, prefix, bias=True):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _geglu_lin(sd, prefix):
    """GEGLU proj Linear (2F, C) -> the (C, 2, F) kernel layout of
    models.layers._GEGLUProj (value rows 0..F-1 first, matching torch
    chunk(2, dim=-1)); pure reshape, value-identical."""
    d = _lin(sd, prefix)
    k = d["kernel"]  # (C, 2F)
    c, o2 = k.shape
    out = {"kernel": np.ascontiguousarray(k.reshape(c, 2, o2 // 2))}
    if "bias" in d:
        out["bias"] = np.ascontiguousarray(d["bias"].reshape(2, o2 // 2))
    return out


def _conv2d(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (O, I, H, W)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv1x1_as_dense(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (O, I, 1, 1) or (O, I, 1) or (O, I)
    w = w.reshape(w.shape[0], w.shape[1])
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv_temporal(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (O, I, 3, 1, 1)
    o, i, kt = w.shape[0], w.shape[1], w.shape[2]
    out = {
        "kernel": np.ascontiguousarray(
            w.reshape(o, i, kt).transpose(2, 1, 0).reshape(kt, 1, i, o)
        )
    }
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


# --------------------------------------------------------------------------
# UNet
# --------------------------------------------------------------------------


def _attn(sd, p):
    return {
        "to_q": _lin(sd, f"{p}.to_q", bias=False),
        "to_k": _lin(sd, f"{p}.to_k", bias=False),
        "to_v": _lin(sd, f"{p}.to_v", bias=False),
        "to_out": _lin(sd, f"{p}.to_out.0"),
    }


def _btb(sd, p):
    """BasicTransformerBlock."""
    out = {
        "attn1": _attn(sd, f"{p}.attn1"),
        "attn2": _attn(sd, f"{p}.attn2"),
        "norm1": _norm(sd, f"{p}.norm1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "norm3": _norm(sd, f"{p}.norm3"),
        "ff": {
            "proj": _geglu_lin(sd, f"{p}.ff.net.0.proj"),
            "out": _lin(sd, f"{p}.ff.net.2"),
        },
    }
    for attn_name in ("attn1", "attn2"):
        for rp in ("relative_position_k", "relative_position_v"):
            key = f"{p}.{attn_name}.{rp}.embeddings_table"
            if key in sd:
                out[attn_name][rp] = {"embeddings_table": sd[key]}
    return out


def _transformer(sd, p, depth=1):
    """Spatial/Temporal transformer. proj layers may be Linear (use_linear),
    Conv2d 1x1 (spatial conv mode) or Conv1d 1 (temporal conv mode) — all
    become Dense."""
    w = sd[f"{p}.proj_in.weight"]
    proj_in = _lin(sd, f"{p}.proj_in") if w.ndim == 2 else _conv1x1_as_dense(sd, f"{p}.proj_in")
    w = sd[f"{p}.proj_out.weight"]
    proj_out = _lin(sd, f"{p}.proj_out") if w.ndim == 2 else _conv1x1_as_dense(sd, f"{p}.proj_out")
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": proj_in,
        "proj_out": proj_out,
    }
    for d in range(depth):
        out[f"blocks_{d}"] = _btb(sd, f"{p}.transformer_blocks.{d}")
    return out


def _temporal_conv_block(sd, p):
    out = {}
    for i in range(1, 5):
        # torch Sequential: conv1 = [GN, SiLU, Conv3d]; conv2..4 = [GN, SiLU, Dropout, Conv3d]
        conv_idx = 2 if i == 1 else 3
        out[f"norm{i}"] = _norm(sd, f"{p}.conv{i}.0")
        out[f"conv{i}"] = _conv_temporal(sd, f"{p}.conv{i}.{conv_idx}")
    return out


def _resblock(sd, p):
    out = {
        "in_norm": _norm(sd, f"{p}.in_layers.0"),
        "in_conv": _conv2d(sd, f"{p}.in_layers.2"),
        "emb_proj": _lin(sd, f"{p}.emb_layers.1"),
        "out_norm": _norm(sd, f"{p}.out_layers.0"),
        "out_conv": _conv2d(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        w = sd[f"{p}.skip_connection.weight"]
        out["skip_connection"] = (
            _conv2d(sd, f"{p}.skip_connection")
            if w.shape[-1] > 1
            else {"kernel": np.ascontiguousarray(
                w.reshape(w.shape[0], w.shape[1]).T[None, None]
            ), "bias": sd[f"{p}.skip_connection.bias"]}
        )
    # reference misspells the attribute: "temopral_conv" (openaimodel3d.py:196)
    if f"{p}.temopral_conv.conv1.0.weight" in sd:
        out["temporal_conv"] = _temporal_conv_block(sd, f"{p}.temopral_conv")
    return out


def import_unet_params(sd: StateDict, cfg: UNetConfig) -> Dict:
    """Map a torch UNetModel state dict (reference openaimodel3d.py:312-740)
    to the flax UNetModel parameter tree."""
    p: Dict = {}
    p["conv_in"] = _conv2d(sd, "input_blocks.0.0")
    p["time_embed_0"] = _lin(sd, "time_embed.0")
    p["time_embed_2"] = _lin(sd, "time_embed.2")
    if cfg.fps_cond:
        p["fps_embedding_0"] = _lin(sd, "fps_embedding.0")
        p["fps_embedding_2"] = _lin(sd, "fps_embedding.2")
    if cfg.time_cond_proj_dim is not None and "time_cond_proj.weight" in sd:
        p["time_cond_proj"] = _lin(sd, "time_cond_proj", bias=False)
    if cfg.motion_cond_proj_dim is not None and "motion_cond_proj.weight" in sd:
        p["motion_cond_proj"] = _lin(sd, "motion_cond_proj", bias=False)
        p["combine_proj"] = _lin(sd, "combine_proj", bias=False)
    if cfg.addition_attention:
        p["init_attn"] = _transformer(sd, "init_attn.0", cfg.transformer_depth)

    # walk encoder structure exactly as both builders do
    ds, ch = 1, cfg.model_channels
    ti = 1  # torch input block index (0 is conv_in)
    mi = 0  # my input_blocks index
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            j = 0
            p[f"input_blocks_{mi}_{j}"] = _resblock(sd, f"input_blocks.{ti}.{j}")
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                j += 1
                p[f"input_blocks_{mi}_{j}"] = _transformer(
                    sd, f"input_blocks.{ti}.{j}", cfg.transformer_depth
                )
                if cfg.temporal_attention:
                    j += 1
                    p[f"input_blocks_{mi}_{j}"] = _transformer(
                        sd, f"input_blocks.{ti}.{j}", cfg.temporal_transformer_depth
                    )
            ti += 1
            mi += 1
        if level != len(cfg.channel_mult) - 1:
            p[f"input_blocks_{mi}_0"] = {"op": _conv2d(sd, f"input_blocks.{ti}.0.op")}
            ti += 1
            mi += 1
            ds *= 2

    # middle
    p["middle_block_0"] = _resblock(sd, "middle_block.0")
    p["middle_block_1"] = _transformer(sd, "middle_block.1", cfg.transformer_depth)
    j = 2
    if cfg.temporal_attention:
        p["middle_block_2"] = _transformer(
            sd, "middle_block.2", cfg.temporal_transformer_depth
        )
        j = 3
    p[f"middle_block_{j}"] = _resblock(sd, f"middle_block.{j}")

    # decoder
    oi = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            j = 0
            p[f"output_blocks_{oi}_{j}"] = _resblock(sd, f"output_blocks.{oi}.{j}")
            if ds in cfg.attention_resolutions:
                j += 1
                p[f"output_blocks_{oi}_{j}"] = _transformer(
                    sd, f"output_blocks.{oi}.{j}", cfg.transformer_depth
                )
                if cfg.temporal_attention:
                    j += 1
                    p[f"output_blocks_{oi}_{j}"] = _transformer(
                        sd, f"output_blocks.{oi}.{j}", cfg.temporal_transformer_depth
                    )
            if level and i == cfg.num_res_blocks:
                j += 1
                p[f"output_blocks_{oi}_{j}"] = {
                    "conv": _conv2d(sd, f"output_blocks.{oi}.{j}.conv")
                }
                ds //= 2
            oi += 1

    p["out_norm"] = _norm(sd, "out.0")
    p["out_conv"] = _conv2d(sd, "out.2")
    return p


# --------------------------------------------------------------------------
# VAE
# --------------------------------------------------------------------------


def _ae_resblock(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv2d(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv2d(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv2d(sd, f"{p}.nin_shortcut")
    return out


def _ae_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv1x1_as_dense(sd, f"{p}.q"),
        "k": _conv1x1_as_dense(sd, f"{p}.k"),
        "v": _conv1x1_as_dense(sd, f"{p}.v"),
        "proj_out": _conv1x1_as_dense(sd, f"{p}.proj_out"),
    }


def import_vae_params(sd: StateDict, n_levels: int = 4, n_res: int = 2) -> Dict:
    """Map a torch AutoencoderKL state dict (reference ae_modules.py:381-643)
    to the flax AutoencoderKL parameter tree."""
    enc: Dict = {"conv_in": _conv2d(sd, "encoder.conv_in")}
    for l in range(n_levels):
        for i in range(n_res):
            enc[f"down_{l}_block_{i}"] = _ae_resblock(sd, f"encoder.down.{l}.block.{i}")
        if l != n_levels - 1:
            enc[f"down_{l}_downsample"] = _conv2d(sd, f"encoder.down.{l}.downsample.conv")
    enc["mid_block_1"] = _ae_resblock(sd, "encoder.mid.block_1")
    enc["mid_attn_1"] = _ae_attn(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _ae_resblock(sd, "encoder.mid.block_2")
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv2d(sd, "encoder.conv_out")

    dec: Dict = {"conv_in": _conv2d(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _ae_resblock(sd, "decoder.mid.block_1")
    dec["mid_attn_1"] = _ae_attn(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _ae_resblock(sd, "decoder.mid.block_2")
    for l in range(n_levels):
        for i in range(n_res + 1):
            dec[f"up_{l}_block_{i}"] = _ae_resblock(sd, f"decoder.up.{l}.block.{i}")
        if l != 0:
            dec[f"up_{l}_upsample"] = _conv2d(sd, f"decoder.up.{l}.upsample.conv")
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv2d(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv1x1_as_dense(sd, "quant_conv"),
        "post_quant_conv": _conv1x1_as_dense(sd, "post_quant_conv"),
    }


# --------------------------------------------------------------------------
# OpenCLIP text tower
# --------------------------------------------------------------------------


def import_clip_text_params(sd: StateDict, layers: int = 24, penultimate: bool = True) -> Dict:
    """Map an open_clip text-tower state dict (keys like
    transformer.resblocks.{i}.attn.in_proj_weight) to CLIPTextModel params.
    The final block is dropped in penultimate mode (reference
    condition.py:273-283 never runs it)."""
    p: Dict = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _norm(sd, "ln_final"),
    }
    n_run = layers - 1 if penultimate else layers
    for i in range(n_run):
        rp = f"transformer.resblocks.{i}"
        p[f"resblocks_{i}"] = {
            "ln_1": _norm(sd, f"{rp}.ln_1"),
            "ln_2": _norm(sd, f"{rp}.ln_2"),
            "in_proj": {
                "kernel": np.ascontiguousarray(sd[f"{rp}.attn.in_proj_weight"].T),
                "bias": sd[f"{rp}.attn.in_proj_bias"],
            },
            "out_proj": _lin(sd, f"{rp}.attn.out_proj"),
            "c_fc": _lin(sd, f"{rp}.mlp.c_fc"),
            "c_proj": _lin(sd, f"{rp}.mlp.c_proj"),
        }
    return p


# --------------------------------------------------------------------------
# Reward towers: open_clip CLIP (HPSv2 / CLIP-H / PickScore-as-openclip) and
# ViCLIP (reference reward_fn/reward_fn.py, viclip/)
# --------------------------------------------------------------------------


def _vit_block(sd, rp):
    return {
        "ln_1": _norm(sd, f"{rp}.ln_1"),
        "ln_2": _norm(sd, f"{rp}.ln_2"),
        "in_proj": {
            "kernel": np.ascontiguousarray(sd[f"{rp}.attn.in_proj_weight"].T),
            "bias": sd[f"{rp}.attn.in_proj_bias"],
        },
        "out_proj": _lin(sd, f"{rp}.attn.out_proj"),
        "c_fc": _lin(sd, f"{rp}.mlp.c_fc"),
        "c_proj": _lin(sd, f"{rp}.mlp.c_proj"),
    }


def _count_blocks(sd: StateDict, prefix: str) -> int:
    n = 0
    while f"{prefix}.{n}.ln_1.weight" in sd:
        n += 1
    return n


def import_clip_vision_params(sd: StateDict, prefix: str = "visual.") -> Dict:
    """open_clip VisionTransformer state dict -> rewards.vit.VisionTransformer
    params. conv1 (O,I,P,P) has no bias in CLIP."""
    g = lambda k: sd[prefix + k]
    w = g("conv1.weight")
    p: Dict = {
        "conv1": {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))},
        "class_embedding": g("class_embedding"),
        "positional_embedding": g("positional_embedding"),
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
        "proj": g("proj"),
    }
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    n = _count_blocks(sub, "transformer.resblocks")
    for i in range(n):
        p[f"resblocks_{i}"] = _vit_block(sub, f"transformer.resblocks.{i}")
    return p


def import_clip_text_pooled_params(sd: StateDict, layers: Optional[int] = None) -> Dict:
    """open_clip text tower -> CLIPTextPooled params (full depth + projection)."""
    if layers is None:
        layers = _count_blocks(sd, "transformer.resblocks")
    tower = import_clip_text_params(sd, layers=layers, penultimate=False)
    return {"tower": tower, "text_projection": sd["text_projection"]}


def import_openclip_params(sd: StateDict) -> Dict:
    """Full open_clip CLIP model (visual + text + logit_scale) — the layout of
    HPSv2 / laion CLIP-H checkpoints used by the image rewards."""
    return {
        "visual": import_clip_vision_params(sd, "visual."),
        "text": import_clip_text_pooled_params(sd),
        "logit_scale": float(np.asarray(sd["logit_scale"])),
    }


def import_viclip_params(sd: StateDict) -> Dict:
    """ViCLIP checkpoint ('vision_encoder.*' + 'text_encoder.*', reference
    viclip/viclip.py) -> video reward model params."""
    ve = {k[len("vision_encoder."):]: v for k, v in sd.items()
          if k.startswith("vision_encoder.")}
    te = {k[len("text_encoder."):]: v for k, v in sd.items()
          if k.startswith("text_encoder.")}
    w = ve["conv1.weight"]  # (O, I, kt, P, P); kt == 1 for ViCLIP-L
    o, i = w.shape[0], w.shape[1]
    kernel = w.reshape(o, i, w.shape[-2], w.shape[-1]).transpose(2, 3, 1, 0)
    visual: Dict = {
        "conv1": {"kernel": np.ascontiguousarray(kernel)},
        "class_embedding": ve["class_embedding"],
        "positional_embedding": ve["positional_embedding"],
        "temporal_positional_embedding": ve["temporal_positional_embedding"],
        "ln_pre": {"scale": ve["ln_pre.weight"], "bias": ve["ln_pre.bias"]},
        "ln_post": {"scale": ve["ln_post.weight"], "bias": ve["ln_post.bias"]},
        "proj": ve["proj"],
    }
    n = _count_blocks(ve, "transformer.resblocks")
    for b in range(n):
        visual[f"resblocks_{b}"] = _vit_block(ve, f"transformer.resblocks.{b}")
    out = {
        "visual": visual,
        "temp": float(np.asarray(sd.get("temp", 0.01))),
    }
    if te:
        out["text"] = import_clip_text_pooled_params(te)
    return out


# --------------------------------------------------------------------------
# ModelScope UNet3DConditionModel (diffusers layout) — reference
# model_scope/unet_3d_condition.py + unet_3d_blocks.py
# --------------------------------------------------------------------------


def _ms_resnet(sd, p):
    out = {
        "in_norm": _norm(sd, f"{p}.norm1"),
        "in_conv": _conv2d(sd, f"{p}.conv1"),
        "emb_proj": _lin(sd, f"{p}.time_emb_proj"),
        "out_norm": _norm(sd, f"{p}.norm2"),
        "out_conv": _conv2d(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        w = sd[f"{p}.conv_shortcut.weight"]
        out["skip_connection"] = {
            "kernel": np.ascontiguousarray(
                w.reshape(w.shape[0], w.shape[1]).T[None, None]
            ),
            "bias": sd[f"{p}.conv_shortcut.bias"],
        }
    return out


def _ms_level_layer(sd, block_prefix, j):
    return {
        "resnet": _ms_resnet(sd, f"{block_prefix}.resnets.{j}"),
        "temp_conv": _temporal_conv_block(sd, f"{block_prefix}.temp_convs.{j}"),
    }


def _ms_level_layer_attn(sd, block_prefix, j):
    out = _ms_level_layer(sd, block_prefix, j)
    out["attn"] = _transformer(sd, f"{block_prefix}.attentions.{j}")
    out["temp_attn"] = _transformer(sd, f"{block_prefix}.temp_attentions.{j}")
    return out


def import_ms_unet_params(sd: StateDict, layers_per_block: int = 2,
                          n_levels: int = 4) -> Dict:
    """diffusers text-to-video-ms state dict -> MSUNet3DConditionModel params.
    Down blocks 0..2 are CrossAttnDownBlock3D, 3 is DownBlock3D; up block 0 is
    UpBlock3D, 1..3 CrossAttnUpBlock3D."""
    p: Dict = {
        "conv_in": _conv2d(sd, "conv_in"),
        "linear_1": _lin(sd, "time_embedding.linear_1"),
        "linear_2": _lin(sd, "time_embedding.linear_2"),
        "transformer_in": _transformer(sd, "transformer_in"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv2d(sd, "conv_out"),
    }
    if "time_embedding.cond_proj.weight" in sd:
        p["cond_proj"] = _lin(sd, "time_embedding.cond_proj", bias=False)

    for i in range(n_levels):
        bp = f"down_blocks.{i}"
        cross = i < n_levels - 1
        for j in range(layers_per_block):
            p[f"down_{i}_layer_{j}"] = (
                _ms_level_layer_attn(sd, bp, j) if cross else _ms_level_layer(sd, bp, j)
            )
        if i < n_levels - 1:
            key = (
                f"{bp}.downsamplers.0.conv"
                if f"{bp}.downsamplers.0.conv.weight" in sd
                else f"{bp}.downsamplers.0.op"
            )
            p[f"down_{i}_downsample"] = {"op": _conv2d(sd, key)}

    p["mid_resnet_0"] = _ms_resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _ms_resnet(sd, "mid_block.resnets.1")
    p["mid_temp_conv_0"] = _temporal_conv_block(sd, "mid_block.temp_convs.0")
    p["mid_temp_conv_1"] = _temporal_conv_block(sd, "mid_block.temp_convs.1")
    p["mid_attn"] = _transformer(sd, "mid_block.attentions.0")
    p["mid_temp_attn"] = _transformer(sd, "mid_block.temp_attentions.0")

    for i in range(n_levels):
        bp = f"up_blocks.{i}"
        cross = i > 0
        for j in range(layers_per_block + 1):
            p[f"up_{i}_layer_{j}"] = (
                _ms_level_layer_attn(sd, bp, j) if cross else _ms_level_layer(sd, bp, j)
            )
        if i < n_levels - 1:
            p[f"up_{i}_upsample"] = {"conv": _conv2d(sd, f"{bp}.upsamplers.0.conv")}
    return p


# --------------------------------------------------------------------------
# HF-transformers CLIPModel layout (PickScore_v1 and other HF CLIP weights)
# --------------------------------------------------------------------------


def _hf_clip_block(sd, rp):
    """HF CLIPEncoderLayer -> packed-QKV ViT/text block params."""
    qw, kw, vw = (sd[f"{rp}.self_attn.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj"))
    qb, kb, vb = (sd[f"{rp}.self_attn.{n}.bias"] for n in ("q_proj", "k_proj", "v_proj"))
    return {
        "ln_1": {"scale": sd[f"{rp}.layer_norm1.weight"], "bias": sd[f"{rp}.layer_norm1.bias"]},
        "ln_2": {"scale": sd[f"{rp}.layer_norm2.weight"], "bias": sd[f"{rp}.layer_norm2.bias"]},
        "in_proj": {
            "kernel": np.ascontiguousarray(np.concatenate([qw, kw, vw], axis=0).T),
            "bias": np.concatenate([qb, kb, vb]),
        },
        "out_proj": _lin(sd, f"{rp}.self_attn.out_proj"),
        "c_fc": _lin(sd, f"{rp}.mlp.fc1"),
        "c_proj": _lin(sd, f"{rp}.mlp.fc2"),
    }


def _hf_count_layers(sd, prefix):
    n = 0
    while f"{prefix}.{n}.layer_norm1.weight" in sd:
        n += 1
    return n


def import_hf_clip_params(sd: StateDict) -> Dict:
    """HF CLIPModel state dict (text_model.* / vision_model.*) ->
    {'visual': VisionTransformer params, 'text': CLIPTextPooled params,
    'logit_scale': float} — the PickScore_v1 layout
    (reference reward_fn/reward_fn.py:30-69 loads it via AutoModel)."""
    tprefix = "text_model."
    n_text = _hf_count_layers(sd, f"{tprefix}encoder.layers")
    tower: Dict = {
        "token_embedding": sd[f"{tprefix}embeddings.token_embedding.weight"],
        "positional_embedding": sd[f"{tprefix}embeddings.position_embedding.weight"],
        "ln_final": {
            "scale": sd[f"{tprefix}final_layer_norm.weight"],
            "bias": sd[f"{tprefix}final_layer_norm.bias"],
        },
    }
    for i in range(n_text):
        tower[f"resblocks_{i}"] = _hf_clip_block(sd, f"{tprefix}encoder.layers.{i}")
    text = {
        "tower": tower,
        "text_projection": np.ascontiguousarray(sd["text_projection.weight"].T),
    }

    vprefix = "vision_model."
    n_vis = _hf_count_layers(sd, f"{vprefix}encoder.layers")
    w = sd[f"{vprefix}embeddings.patch_embedding.weight"]  # (O, 3, P, P)
    visual: Dict = {
        "conv1": {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))},
        "class_embedding": sd[f"{vprefix}embeddings.class_embedding"],
        "positional_embedding": sd[f"{vprefix}embeddings.position_embedding.weight"],
        "ln_pre": {
            "scale": sd[f"{vprefix}pre_layrnorm.weight"],
            "bias": sd[f"{vprefix}pre_layrnorm.bias"],
        },
        "ln_post": {
            "scale": sd[f"{vprefix}post_layernorm.weight"],
            "bias": sd[f"{vprefix}post_layernorm.bias"],
        },
        "proj": np.ascontiguousarray(sd["visual_projection.weight"].T),
    }
    for i in range(n_vis):
        visual[f"resblocks_{i}"] = _hf_clip_block(sd, f"{vprefix}encoder.layers.{i}")
    return {
        "visual": visual,
        "text": text,
        "logit_scale": float(np.asarray(sd["logit_scale"])),
    }


# --------------------------------------------------------------------------
# ImageReward-v1.0 (BLIP ViT-L/16 timm-layout + med-BERT + MLP head) —
# the external package the reference's img_reward loads
# (reference reward_fn/reward_fn.py:128-174)
# --------------------------------------------------------------------------


def _import_med_bert(sd: StateDict, tp: str) -> Dict:
    """med-style BERT (BLIP / InternVideo2 text towers): embeddings +
    post-LN layers with optional per-layer cross-attention."""
    bert: Dict = {
        "word_embeddings": sd[f"{tp}embeddings.word_embeddings.weight"],
        "position_embeddings": sd[f"{tp}embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd[f"{tp}embeddings.token_type_embeddings.weight"],
        "emb_norm": _norm(sd, f"{tp}embeddings.LayerNorm"),
    }

    def _bert_attn(prefix):
        return {
            "query": _lin(sd, f"{prefix}.self.query"),
            "key": _lin(sd, f"{prefix}.self.key"),
            "value": _lin(sd, f"{prefix}.self.value"),
            "output": {
                "dense": _lin(sd, f"{prefix}.output.dense"),
                "norm": _norm(sd, f"{prefix}.output.LayerNorm"),
            },
        }

    j = 0
    while f"{tp}encoder.layer.{j}.attention.self.query.weight" in sd:
        lp = f"{tp}encoder.layer.{j}"
        layer = {
            "attention": _bert_attn(f"{lp}.attention"),
            "intermediate": _lin(sd, f"{lp}.intermediate.dense"),
            "out_dense": _lin(sd, f"{lp}.output.dense"),
            "out_norm": _norm(sd, f"{lp}.output.LayerNorm"),
        }
        if f"{lp}.crossattention.self.query.weight" in sd:
            layer["crossattention"] = _bert_attn(f"{lp}.crossattention")
        bert[f"layer_{j}"] = layer
        j += 1
    return bert


def import_image_reward_params(sd: StateDict) -> Dict:
    """ImageReward .pt state dict -> {'vit', 'bert', 'head'} params."""
    vp = "blip.visual_encoder."
    vit: Dict = {
        "patch_embedding": _conv2d(sd, f"{vp}patch_embed.proj"),
        "class_embedding": sd[f"{vp}cls_token"],
        "position_embedding": sd[f"{vp}pos_embed"],
        "post_layernorm": _norm(sd, f"{vp}norm"),
    }
    i = 0
    while f"{vp}blocks.{i}.norm1.weight" in sd:
        bp = f"{vp}blocks.{i}"
        vit[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{bp}.norm1"),
            "layer_norm2": _norm(sd, f"{bp}.norm2"),
            "qkv": _lin(sd, f"{bp}.attn.qkv"),
            "projection": _lin(sd, f"{bp}.attn.proj"),
            "fc1": _lin(sd, f"{bp}.mlp.fc1"),
            "fc2": _lin(sd, f"{bp}.mlp.fc2"),
        }
        i += 1

    bert = _import_med_bert(sd, "blip.text_encoder.bert.")

    # MLP head: mlp.layers.{idx}.weight in ascending Sequential index order
    head = []
    idxs = sorted(
        int(k.split(".")[2]) for k in sd
        if k.startswith("mlp.layers.") and k.endswith(".weight")
    )
    for idx in idxs:
        head.append({
            "kernel": np.ascontiguousarray(sd[f"mlp.layers.{idx}.weight"].T),
            "bias": sd.get(f"mlp.layers.{idx}.bias", np.zeros(sd[f"mlp.layers.{idx}.weight"].shape[0], np.float32)),
        })
    return {"vit": vit, "bert": bert, "head": head}


# --------------------------------------------------------------------------
# InternVideo2-Stage2 (vi_clip2) — reference intern_vid2/demo_utils.py:152-361
# --------------------------------------------------------------------------


def _rms(sd, prefix):
    return {"weight": sd[f"{prefix}.weight"]}


def import_internvideo2_params(sd: StateDict) -> Dict:
    """InternVideo2-Stage2 checkpoint -> reward-model params:
    vision_encoder.* (ViT-g blocks + clip_projector), text_encoder.bert.*
    (BERT-large), vision_proj / text_proj heads."""
    vp = "vision_encoder."
    vision: Dict = {
        "patch_proj": _conv2d_or_tubelet(sd, f"{vp}patch_embed.proj"),
        "cls_token": sd[f"{vp}cls_token"],
        "pos_embed": sd[f"{vp}pos_embed"],
    }
    i = 0
    while f"{vp}blocks.{i}.norm1.weight" in sd:
        bp = f"{vp}blocks.{i}"
        vision[f"blocks_{i}"] = {
            "norm1": _rms(sd, f"{bp}.norm1"),
            "norm2": _rms(sd, f"{bp}.norm2"),
            "qkv": _lin(sd, f"{bp}.attn.qkv", bias=False),
            "q_norm": _rms(sd, f"{bp}.attn.q_norm"),
            "k_norm": _rms(sd, f"{bp}.attn.k_norm"),
            "proj": _lin(sd, f"{bp}.attn.proj"),
            "fc1": _lin(sd, f"{bp}.mlp.fc1"),
            "fc2": _lin(sd, f"{bp}.mlp.fc2"),
            "ls1": {"gamma": sd[f"{bp}.ls1.gamma"]},
            "ls2": {"gamma": sd[f"{bp}.ls2.gamma"]},
        }
        i += 1
    cp = f"{vp}clip_projector"
    vision["clip_projector"] = {
        "norm1_q": _norm(sd, f"{cp}.norm1_q"),
        "norm1_k": _norm(sd, f"{cp}.norm1_k"),
        "norm1_v": _norm(sd, f"{cp}.norm1_v"),
        "q": {
            "kernel": np.ascontiguousarray(sd[f"{cp}.cross_attn.q.weight"].T),
            "bias": sd.get(f"{cp}.cross_attn.q_bias",
                           np.zeros(sd[f"{cp}.cross_attn.q.weight"].shape[0], np.float32)),
        },
        "k": {
            "kernel": np.ascontiguousarray(sd[f"{cp}.cross_attn.k.weight"].T),
            "bias": sd.get(f"{cp}.cross_attn.k_bias",
                           np.zeros(sd[f"{cp}.cross_attn.k.weight"].shape[0], np.float32)),
        },
        "v": {
            "kernel": np.ascontiguousarray(sd[f"{cp}.cross_attn.v.weight"].T),
            "bias": sd.get(f"{cp}.cross_attn.v_bias",
                           np.zeros(sd[f"{cp}.cross_attn.v.weight"].shape[0], np.float32)),
        },
        "proj": _lin(sd, f"{cp}.cross_attn.proj"),
    }

    # BERT-large text tower (same med layout as BLIP)
    tp = "text_encoder.bert."
    bert = (
        _import_med_bert(sd, tp)
        if f"{tp}embeddings.word_embeddings.weight" in sd
        else {}
    )

    out = {
        "vision": vision,
        "text": bert,
        "vision_proj": _lin(sd, "vision_proj"),
        "text_proj": _lin(sd, "text_proj"),
    }
    return out


def _conv2d_or_tubelet(sd, prefix):
    """IV2 patch embed is Conv3d with tubelet 1 -> per-frame 2D conv."""
    w = sd[f"{prefix}.weight"]
    if w.ndim == 5:  # (O, I, 1, P, P)
        w = w[:, :, 0]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


# --------------------------------------------------------------------------
# ModelScope diffusers multi-file layout (reference app_ms.py:181-227 loads
# tokenizer/text_encoder/vae/unet subfolders via from_pretrained)
# --------------------------------------------------------------------------


def _diffusers_vae_to_orig(sd: StateDict) -> StateDict:
    """Rename a diffusers AutoencoderKL state dict to the original SD/lvdm
    layout so the existing `import_vae_params` mapping applies (inverse of
    the reference's key converter,
    model_scope/utils/convert_diffusers_to_original_ms_text_to_video.py).

    Structural differences handled:
    - down_blocks.{l}.resnets.{i} -> down.{l}.block.{i}; conv_shortcut ->
      nin_shortcut; downsamplers.0.conv -> downsample.conv
    - decoder up_blocks are indexed in EXECUTION order (0 = lowest res);
      original up.{l} indexes by resolution level (runs n-1..0), so
      up_blocks.{j} -> up.{n-1-j}
    - mid_block.resnets.{0,1} -> mid.block_{1,2}; mid_block.attentions.0
      {group_norm,to_q,to_k,to_v,to_out.0} -> mid.attn_1 {norm,q,k,v,
      proj_out} (Linear weights; import_vae_params' 1x1-conv handler accepts
      2-D kernels)
    - conv_norm_out -> norm_out
    """
    import re

    n_up = 0
    for k in sd:
        m = re.match(r"decoder\.up_blocks\.(\d+)\.", k)
        if m:
            n_up = max(n_up, int(m.group(1)) + 1)

    out: StateDict = {}
    for k, v in sd.items():
        nk = k
        nk = re.sub(r"mid_block\.resnets\.0\.", "mid.block_1.", nk)
        nk = re.sub(r"mid_block\.resnets\.1\.", "mid.block_2.", nk)
        nk = re.sub(r"mid_block\.attentions\.0\.group_norm\.", "mid.attn_1.norm.", nk)
        nk = re.sub(r"mid_block\.attentions\.0\.to_q\.", "mid.attn_1.q.", nk)
        nk = re.sub(r"mid_block\.attentions\.0\.to_k\.", "mid.attn_1.k.", nk)
        nk = re.sub(r"mid_block\.attentions\.0\.to_v\.", "mid.attn_1.v.", nk)
        nk = re.sub(
            r"mid_block\.attentions\.0\.to_out\.0\.", "mid.attn_1.proj_out.", nk
        )
        nk = re.sub(r"down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down.\1.block.\2.", nk)
        nk = re.sub(
            r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.",
            r"down.\1.downsample.conv.",
            nk,
        )
        m = re.match(r"decoder\.up_blocks\.(\d+)\.(.+)", nk)
        if m:
            j, rest = int(m.group(1)), m.group(2)
            rest = re.sub(r"^resnets\.(\d+)\.", r"block.\1.", rest)
            rest = re.sub(r"^upsamplers\.0\.conv\.", "upsample.conv.", rest)
            nk = f"decoder.up.{n_up - 1 - j}.{rest}"
        nk = nk.replace("conv_shortcut", "nin_shortcut")
        nk = nk.replace("conv_norm_out", "norm_out")
        out[nk] = v
    return out


def import_diffusers_vae_params(
    sd: StateDict, n_levels: Optional[int] = None, n_res: Optional[int] = None
) -> Dict:
    """diffusers AutoencoderKL state dict -> flax AutoencoderKL params.
    Level/resblock counts are inferred from the key structure when not
    given (SD-style VAEs: 4 levels x 2 resblocks)."""
    import re

    if n_levels is None or n_res is None:
        lv, res = 0, 0
        for k in sd:
            m = re.match(r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.", k)
            if m:
                lv = max(lv, int(m.group(1)) + 1)
                res = max(res, int(m.group(2)) + 1)
        n_levels = n_levels if n_levels is not None else lv
        n_res = n_res if n_res is not None else res
    return import_vae_params(_diffusers_vae_to_orig(sd), n_levels, n_res)


def import_hf_clip_text_model_params(sd: StateDict, quick_gelu: bool = True):
    """HF transformers CLIPTextModel state dict -> (CLIPTextModel params,
    inferred config kwargs). The MS backbone's text encoder
    (reference app_ms.py:184-186 / t2v_turbo_ms_pipeline) is a CLIP text
    tower in HF layout: separate q/k/v projections packed here into the
    in_proj convention and the FULL layer stack (no penultimate trick).
    quick_gelu should come from the HF config.json hidden_act (True for
    openai CLIP-L; laion ViT-H towers use exact gelu)."""
    tp = "text_model."
    if not any(k.startswith(tp) for k in sd):
        tp = ""  # bare CLIPTextModel state dicts have no wrapper prefix
    emb = sd[f"{tp}embeddings.token_embedding.weight"]
    vocab, width = emb.shape

    p: Dict = {
        "token_embedding": emb,
        "positional_embedding": sd[f"{tp}embeddings.position_embedding.weight"],
        "ln_final": _norm(sd, f"{tp}final_layer_norm"),
    }
    i = 0
    while f"{tp}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        lp = f"{tp}encoder.layers.{i}"
        qw = sd[f"{lp}.self_attn.q_proj.weight"]
        kw = sd[f"{lp}.self_attn.k_proj.weight"]
        vw = sd[f"{lp}.self_attn.v_proj.weight"]
        qb = sd[f"{lp}.self_attn.q_proj.bias"]
        kb = sd[f"{lp}.self_attn.k_proj.bias"]
        vb = sd[f"{lp}.self_attn.v_proj.bias"]
        p[f"resblocks_{i}"] = {
            "ln_1": _norm(sd, f"{lp}.layer_norm1"),
            "ln_2": _norm(sd, f"{lp}.layer_norm2"),
            "in_proj": {
                "kernel": np.ascontiguousarray(
                    np.concatenate([qw, kw, vw], axis=0).T
                ),
                "bias": np.concatenate([qb, kb, vb], axis=0),
            },
            "out_proj": _lin(sd, f"{lp}.self_attn.out_proj"),
            "c_fc": _lin(sd, f"{lp}.mlp.fc1"),
            "c_proj": _lin(sd, f"{lp}.mlp.fc2"),
        }
        i += 1
    cfg_kw = dict(
        vocab_size=int(vocab),
        width=int(width),
        heads=int(width) // 64,
        layers=i,
        context_length=int(p["positional_embedding"].shape[0]),
        penultimate=False,
        quick_gelu=quick_gelu,
    )
    return p, cfg_kw


def _find_weight_file(folder: str):
    import glob as _glob
    import os as _os

    for pat in (
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
        "*.bin",
        "*.safetensors",
        "*.pt",
        "*.ckpt",
    ):
        hits = sorted(_glob.glob(_os.path.join(folder, pat)))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no weight file under {folder}")


def load_state_dict_any(path: str) -> Dict[str, Array]:
    """torch.load or safetensors, to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    return load_torch_state_dict(path)


def load_ms_components(pretrained_dir: str, unet_kwargs: Optional[Dict] = None):
    """Load the ModelScope diffusers multi-file layout
    (reference app_ms.py:181-227): returns
    {"unet": params, "vae": params, "text": params, "text_cfg": kwargs}.
    The tokenizer subfolder is the standard CLIP BPE vocabulary — the
    framework's self-contained CLIPTokenizer (t2v_turbo_tpu/assets) is
    byte-identical, so no per-directory tokenizer state is needed."""
    import os as _os

    unet_sd = load_state_dict_any(
        _find_weight_file(_os.path.join(pretrained_dir, "unet"))
    )
    vae_sd = load_state_dict_any(
        _find_weight_file(_os.path.join(pretrained_dir, "vae"))
    )
    text_sd = load_state_dict_any(
        _find_weight_file(_os.path.join(pretrained_dir, "text_encoder"))
    )
    quick_gelu = True
    cfg_json = _os.path.join(pretrained_dir, "text_encoder", "config.json")
    if _os.path.exists(cfg_json):
        import json as _json

        hf_cfg = _json.load(open(cfg_json))
        quick_gelu = hf_cfg.get("hidden_act", "quick_gelu") == "quick_gelu"
    text_params, text_cfg = import_hf_clip_text_model_params(
        text_sd, quick_gelu=quick_gelu
    )
    return {
        "unet": import_ms_unet_params(unet_sd, **(unet_kwargs or {})),
        "vae": import_diffusers_vae_params(vae_sd),
        "text": text_params,
        "text_cfg": text_cfg,
    }


# --- x_transformer (lvdm/modules/x_transformer.py) --------------------------


def import_x_transformer_layers(
    sd: StateDict,
    layer_types,
    prefix: str = "",
    use_rezero: bool = False,
    gate_residual: bool = False,
    glu: bool = False,
    on_attn: bool = False,
    norm_has_g: bool = False,
) -> Dict:
    """AttentionLayers state dict -> models/x_transformer.AttentionLayers
    params. `layer_types` is the ('a'|'c'|'f') schedule from
    models.x_transformer.build_layer_types; `norm_has_g` selects the
    ScaleNorm/RMSNorm single-'g' layout over LayerNorm weight/bias."""
    out: Dict = {}
    for i, lt in enumerate(layer_types):
        lp = f"{prefix}layers.{i}."
        if not use_rezero:  # rezero replaces norms with Identity
            if norm_has_g:
                out[f"norm_{i}"] = {"g": sd[lp + "0.g"]}
            else:
                out[f"norm_{i}"] = {
                    "scale": sd[lp + "0.weight"], "bias": sd[lp + "0.bias"]
                }
        bp = lp + "1."
        if use_rezero and lt in ("a", "c"):
            out[f"rezero_g_{i}"] = sd[bp + "g"]
            bp += "fn."
        if lt in ("a", "c"):
            attn = {
                "to_q": _lin(sd, bp + "to_q", bias=False),
                "to_k": _lin(sd, bp + "to_k", bias=False),
                "to_v": _lin(sd, bp + "to_v", bias=False),
                "to_out": _lin(sd, bp + ("to_out.0" if on_attn
                                         else "to_out")),
            }
            if bp + "pre_softmax_proj" in sd:
                attn["pre_softmax_proj"] = sd[bp + "pre_softmax_proj"]
                attn["post_softmax_proj"] = sd[bp + "post_softmax_proj"]
            if bp + "mem_k" in sd:
                attn["mem_k"] = sd[bp + "mem_k"]
                attn["mem_v"] = sd[bp + "mem_v"]
            out[f"attn_{i}"] = attn
        else:  # 'f'
            pin = bp + ("net.0.proj" if glu else "net.0.0")
            out[f"ff_{i}"] = {
                "proj_in": _lin(sd, pin),
                "proj_out": _lin(sd, bp + "net.2"),
            }
        if gate_residual:
            gp = lp + "2.gru."
            w_ih = sd[gp + "weight_ih"]  # (3H, D): gates r, z, n
            w_hh = sd[gp + "weight_hh"]
            b_ih = sd[gp + "bias_ih"]
            b_hh = sd[gp + "bias_hh"]
            h3 = w_ih.shape[0] // 3
            ir, iz, inn = (w_ih[k * h3:(k + 1) * h3].T for k in range(3))
            hr, hz, hn = (w_hh[k * h3:(k + 1) * h3].T for k in range(3))
            bir, biz, bin_ = (b_ih[k * h3:(k + 1) * h3] for k in range(3))
            bhr, bhz, bhn = (b_hh[k * h3:(k + 1) * h3] for k in range(3))
            out[f"gru_{i}"] = {"gru": {
                # flax GRUCell has no bias on hr/hz: fold b_h into the
                # i-side bias (the gate sums them anyway); hn keeps its
                # own bias because r gates it separately
                "ir": {"kernel": ir, "bias": bir + bhr},
                "iz": {"kernel": iz, "bias": biz + bhz},
                "in": {"kernel": inn, "bias": bin_},
                "hr": {"kernel": hr},
                "hz": {"kernel": hz},
                "hn": {"kernel": hn, "bias": bhn},
            }}
    return out


def import_x_transformer_params(sd: StateDict, layer_types, **kw) -> Dict:
    """TransformerWrapper state dict -> models/x_transformer
    .TransformerWrapper params (x_transformer.py:593-650 layout)."""
    out: Dict = {
        "token_emb": {"embedding": sd["token_emb.weight"]},
        "norm": _norm(sd, "norm"),
        "attn_layers": import_x_transformer_layers(
            sd, layer_types, prefix="attn_layers.", **kw
        ),
    }
    if "pos_emb.emb.weight" in sd:
        out["pos_emb"] = {"embedding": sd["pos_emb.emb.weight"]}
    if "project_emb.weight" in sd:
        out["project_emb"] = _lin(sd, "project_emb")
    if "memory_tokens" in sd:
        out["memory_tokens"] = sd["memory_tokens"]
    if "to_logits.weight" in sd:
        out["to_logits"] = _lin(sd, "to_logits")
    return out
