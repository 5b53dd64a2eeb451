"""JAX pytree -> PyTorch checkpoint exporters (the inverse of torch_import).

The reference trainers ship inference-ready torch artifacts from their
pre-save hooks: v1 exports the LoRA-only `unet_lora.pt` (cloneofsimo flat
list, train_t2v_turbo_v1_lora.py:739-756) and v2 exports the full `unet.pt`
state dict (train_latent_t2v_turbo_v2.py:760-773). These exporters produce
the same formats from the flax trees so models trained here drop straight
into the reference's torch apps (and back into this repo via torch_import —
the round trip is the correctness test, since the importers carry the
torch-parity goldens).

Layout conventions are the exact inverses of torch_import.py:
- Dense kernel (in, out)             -> Linear weight (out, in)
- Conv kernel (H, W, I, O)           -> Conv2d weight (O, I, H, W)
- temporal Conv kernel (3, 1, I, O)  -> Conv3d weight (O, I, 3, 1, 1)
- Dense kernel for a torch Conv1d 1  -> (O, I, 1)   (init_attn projections)
- 1x1-dense skip kernel (1, 1, I, O) -> (O, I, 1, 1)
- scale/bias                         -> GroupNorm/LayerNorm weight/bias
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.unet_vc2 import UNetConfig
from .lora_import import lora_module_order, _translate

Array = np.ndarray


def _np(x) -> Array:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


# --------------------------------------------------------------------------
# primitive inverse converters: flax node -> torch entries
# --------------------------------------------------------------------------


def _x_lin(node, name, sd):
    sd[f"{name}.weight"] = _np(node["kernel"]).T
    if "bias" in node:
        sd[f"{name}.bias"] = _np(node["bias"])


def _x_geglu_lin(node, name, sd):
    """(C, 2, F) _GEGLUProj kernel -> the reference's (2F, C) Linear
    (inverse of torch_import._geglu_lin)."""
    k = _np(node["kernel"])
    flat = {"kernel": k.reshape(k.shape[0], -1)}
    if "bias" in node:
        flat["bias"] = _np(node["bias"]).reshape(-1)
    _x_lin(flat, name, sd)


def _x_conv2d(node, name, sd):
    sd[f"{name}.weight"] = _np(node["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in node:
        sd[f"{name}.bias"] = _np(node["bias"])


def _x_conv1d(node, name, sd):
    """Dense kernel (I, O) -> torch Conv1d weight (O, I, 1)."""
    sd[f"{name}.weight"] = _np(node["kernel"]).T[:, :, None]
    if "bias" in node:
        sd[f"{name}.bias"] = _np(node["bias"])


def _x_conv_temporal(node, name, sd):
    k = _np(node["kernel"])  # (kt, 1, I, O)
    kt, one, i, o = k.shape
    sd[f"{name}.weight"] = np.ascontiguousarray(
        k.reshape(kt, i, o).transpose(2, 1, 0)
    ).reshape(o, i, kt, 1, 1)
    if "bias" in node:
        sd[f"{name}.bias"] = _np(node["bias"])


def _x_norm(node, name, sd):
    sd[f"{name}.weight"] = _np(node["scale"])
    sd[f"{name}.bias"] = _np(node["bias"])


def _x_attn(node, p, sd):
    for t in ("to_q", "to_k", "to_v"):
        _x_lin(node[t], f"{p}.{t}", sd)
    _x_lin(node["to_out"], f"{p}.to_out.0", sd)
    for rp in ("relative_position_k", "relative_position_v"):
        if rp in node:
            sd[f"{p}.{rp}.embeddings_table"] = _np(node[rp]["embeddings_table"])


def _x_btb(node, p, sd):
    _x_attn(node["attn1"], f"{p}.attn1", sd)
    _x_attn(node["attn2"], f"{p}.attn2", sd)
    for n in ("norm1", "norm2", "norm3"):
        _x_norm(node[n], f"{p}.{n}", sd)
    _x_geglu_lin(node["ff"]["proj"], f"{p}.ff.net.0.proj", sd)
    _x_lin(node["ff"]["out"], f"{p}.ff.net.2", sd)


def _x_transformer(node, p, sd, depth=1, proj="linear"):
    """proj: 'linear' (VC2 use_linear spatial/temporal transformers) or
    'conv1d' (init_attn's inner temporal transformer)."""
    _x_norm(node["norm"], f"{p}.norm", sd)
    emit = _x_lin if proj == "linear" else _x_conv1d
    emit(node["proj_in"], f"{p}.proj_in", sd)
    emit(node["proj_out"], f"{p}.proj_out", sd)
    for d in range(depth):
        _x_btb(node[f"blocks_{d}"], f"{p}.transformer_blocks.{d}", sd)


def _x_temporal_conv_block(node, p, sd):
    for i in range(1, 5):
        conv_idx = 2 if i == 1 else 3
        _x_norm(node[f"norm{i}"], f"{p}.conv{i}.0", sd)
        _x_conv_temporal(node[f"conv{i}"], f"{p}.conv{i}.{conv_idx}", sd)


def _x_resblock(node, p, sd):
    _x_norm(node["in_norm"], f"{p}.in_layers.0", sd)
    _x_conv2d(node["in_conv"], f"{p}.in_layers.2", sd)
    _x_lin(node["emb_proj"], f"{p}.emb_layers.1", sd)
    _x_norm(node["out_norm"], f"{p}.out_layers.0", sd)
    _x_conv2d(node["out_conv"], f"{p}.out_layers.3", sd)
    if "skip_connection" in node:
        _x_conv2d(node["skip_connection"], f"{p}.skip_connection", sd)
    if "temporal_conv" in node:
        # the reference misspells the attribute (openaimodel3d.py:196)
        _x_temporal_conv_block(node["temporal_conv"], f"{p}.temopral_conv", sd)


# --------------------------------------------------------------------------
# UNet state dict (v2 trainer's unet.pt / target_unet.pt artifact)
# --------------------------------------------------------------------------


def export_unet_params(params: Dict, cfg: UNetConfig) -> Dict[str, Array]:
    """flax UNetModel params -> torch UNetModel state dict (numpy values).
    Inverse of torch_import.import_unet_params; same structural walk."""
    p = params.get("params", params)
    sd: Dict[str, Array] = {}
    _x_conv2d(p["conv_in"], "input_blocks.0.0", sd)
    _x_lin(p["time_embed_0"], "time_embed.0", sd)
    _x_lin(p["time_embed_2"], "time_embed.2", sd)
    if cfg.fps_cond:
        _x_lin(p["fps_embedding_0"], "fps_embedding.0", sd)
        _x_lin(p["fps_embedding_2"], "fps_embedding.2", sd)
    if cfg.time_cond_proj_dim is not None and "time_cond_proj" in p:
        _x_lin(p["time_cond_proj"], "time_cond_proj", sd)
    if cfg.motion_cond_proj_dim is not None and "motion_cond_proj" in p:
        _x_lin(p["motion_cond_proj"], "motion_cond_proj", sd)
        _x_lin(p["combine_proj"], "combine_proj", sd)
    if cfg.addition_attention:
        _x_transformer(
            p["init_attn"], "init_attn.0", sd,
            cfg.transformer_depth, proj="conv1d",
        )

    ds = 1
    ti, mi = 1, 0
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            j = 0
            _x_resblock(p[f"input_blocks_{mi}_{j}"], f"input_blocks.{ti}.{j}", sd)
            if ds in cfg.attention_resolutions:
                j += 1
                _x_transformer(
                    p[f"input_blocks_{mi}_{j}"], f"input_blocks.{ti}.{j}", sd,
                    cfg.transformer_depth,
                )
                if cfg.temporal_attention:
                    j += 1
                    _x_transformer(
                        p[f"input_blocks_{mi}_{j}"], f"input_blocks.{ti}.{j}",
                        sd, cfg.temporal_transformer_depth,
                    )
            ti += 1
            mi += 1
        if level != len(cfg.channel_mult) - 1:
            _x_conv2d(p[f"input_blocks_{mi}_0"]["op"], f"input_blocks.{ti}.0.op", sd)
            ti += 1
            mi += 1
            ds *= 2

    _x_resblock(p["middle_block_0"], "middle_block.0", sd)
    _x_transformer(p["middle_block_1"], "middle_block.1", sd, cfg.transformer_depth)
    j = 2
    if cfg.temporal_attention:
        _x_transformer(
            p["middle_block_2"], "middle_block.2", sd,
            cfg.temporal_transformer_depth,
        )
        j = 3
    _x_resblock(p[f"middle_block_{j}"], f"middle_block.{j}", sd)

    oi = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            j = 0
            _x_resblock(p[f"output_blocks_{oi}_{j}"], f"output_blocks.{oi}.{j}", sd)
            if ds in cfg.attention_resolutions:
                j += 1
                _x_transformer(
                    p[f"output_blocks_{oi}_{j}"], f"output_blocks.{oi}.{j}", sd,
                    cfg.transformer_depth,
                )
                if cfg.temporal_attention:
                    j += 1
                    _x_transformer(
                        p[f"output_blocks_{oi}_{j}"], f"output_blocks.{oi}.{j}",
                        sd, cfg.temporal_transformer_depth,
                    )
            if level and i == cfg.num_res_blocks:
                j += 1
                _x_conv2d(
                    p[f"output_blocks_{oi}_{j}"]["conv"],
                    f"output_blocks.{oi}.{j}.conv", sd,
                )
                ds //= 2
            oi += 1

    _x_norm(p["out_norm"], "out.0", sd)
    _x_conv2d(p["out_conv"], "out.2", sd)
    return sd


# --------------------------------------------------------------------------
# LoRA flat list (v1 trainer's unet_lora.pt artifact)
# --------------------------------------------------------------------------


def vc2_reference_lora_target(cfg: UNetConfig):
    """LoRAConfig.target predicate selecting exactly the kernel leaves the
    reference injects (every Linear/Conv2d/Conv3d; Conv1d init_attn
    projections are NOT in its search classes, lora_import.py docstring).
    Training with this target makes the factors exportable 1:1."""
    allowed = {
        _translate(name, cfg) + ("kernel",)
        for name, _ in lora_module_order(cfg)
    }

    def target(path: Tuple[str, ...]) -> bool:
        pt = path[1:] if path and path[0] == "params" else path
        return tuple(pt) in allowed

    return target


def _lora_pair_torch(fac: Dict, kernel_shape, kind: str) -> Tuple[Array, Array]:
    """flax {down (in_f, r), up (r, out)} -> torch (up.weight, down.weight).
    in_f is the flax-order flattening of the kernel's leading dims."""
    down = _np(fac["down"])
    up = _np(fac["up"])
    r = down.shape[1]
    o = up.shape[1]
    if kind == "linear":
        return up.T, down.T  # (O, r), (r, I)
    if kind == "conv2d":
        kh, kw, i, _ = kernel_shape
        d = down.T.reshape(r, kh, kw, i).transpose(0, 3, 1, 2)  # (r, I, kh, kw)
        return up.T.reshape(o, r, 1, 1), np.ascontiguousarray(d)
    if kind == "conv3d":
        kt, one, i, _ = kernel_shape
        d = down.T.reshape(r, kt, i).transpose(0, 2, 1).reshape(r, i, kt, 1, 1)
        return up.T.reshape(o, r, 1, 1, 1), np.ascontiguousarray(d)
    raise ValueError(kind)


def export_lora_pt(
    lora_flat: Dict[Tuple[str, ...], Dict],
    cfg: UNetConfig,
    params: Optional[Dict] = None,
    rank: Optional[int] = None,
) -> List[Array]:
    """LoRA factor pytree (lora.init_lora layout) -> the reference's flat
    [up_0, down_0, up_1, down_1, ...] list in named_modules() order
    (save_lora_weight, reference utils/lora.py:582-596).

    Factors for modules the reference never injects (e.g. init_attn's Conv1d
    projections, covered by the default all-kernels LoRAConfig) cannot be
    represented and raise — train with
    LoRAConfig(target=vc2_reference_lora_target(cfg)) for exact export.
    Reference slots with no factor are emitted as zero pairs (a no-op on
    load), which needs `params` (or `rank`) for the shapes."""
    # factor keys may carry the {"params": ...} root prefix
    def norm_key(k: Tuple[str, ...]) -> Tuple[str, ...]:
        return tuple(k[1:]) if k and k[0] == "params" else tuple(k)

    factors = {norm_key(k): v for k, v in lora_flat.items()}
    p = params.get("params", params) if params is not None else None

    order = lora_module_order(cfg)
    slots = {}
    for name, kind in order:
        slots[_translate(name, cfg) + ("kernel",)] = (name, kind)

    extra = sorted(set(factors) - set(slots))
    if extra:
        raise ValueError(
            f"{len(extra)} LoRA factors have no unet_lora.pt slot (first: "
            f"{extra[0]}); the reference never injects these modules. Train "
            "with LoRAConfig(target=vc2_reference_lora_target(cfg)) to "
            "produce an exportable factor set."
        )

    def kernel_shape(path):
        if path in factors:
            down = factors[path]["down"]
            up = factors[path]["up"]
            name, kind = slots[path]
            if kind == "linear":
                return (down.shape[0], up.shape[1])
        if p is None:
            return None
        node = p
        for k in path:
            node = node[k]
        return np.shape(node)

    out: List[Array] = []
    for name, kind in order:
        path = _translate(name, cfg) + ("kernel",)
        shape = kernel_shape(path)
        if path in factors:
            if shape is None:
                raise ValueError(
                    f"need `params` to recover the conv kernel shape of {name}"
                )
            up_t, down_t = _lora_pair_torch(factors[path], shape, kind)
        else:
            if shape is None:
                raise ValueError(
                    f"no factor for {name} and no `params` to synthesize a "
                    "zero pair; pass the student params"
                )
            if rank is None and not factors:
                raise ValueError(
                    "the factor dict is empty and no rank was given; pass "
                    "rank= to emit an all-zero (no-op) lora list"
                )
            r = rank or next(iter(factors.values()))["down"].shape[1]
            i = int(np.prod(shape[:-1]))
            o = int(shape[-1])
            if kind == "linear" and len(shape) == 3:
                # GEGLU proj kernel stored (C, 2, F); the underlying
                # reference Linear is (2F, C)
                i, o = int(shape[0]), int(shape[1] * shape[2])
            zero = {
                "down": np.zeros((i, r), np.float32),
                "up": np.zeros((r, o), np.float32),
            }
            up_t, down_t = _lora_pair_torch(zero, shape, kind)
        out.extend([up_t, down_t])
    return out


def save_torch(obj, path: str) -> None:
    """torch.save a state dict / tensor list (torch is CPU-only here and
    used solely for checkpoint IO)."""
    import torch

    def t(v):  # copy: torch tensors must own writable memory
        return torch.from_numpy(np.array(v, dtype=np.float32, copy=True))

    if isinstance(obj, dict):
        obj = {k: t(v) for k, v in obj.items()}
    else:
        obj = [t(v) for v in obj]
    torch.save(obj, path)
