"""CLIP-style vision transformers for the reward towers.

Two variants share the blocks:
- `VisionTransformer`: per-image ViT (class token, 2D patch conv, pre/post
  LN, optional projection) — the open_clip ViT-H/14 tower behind the
  `clip` / `hpsv2` / `pick` image rewards (reference reward_fn/reward_fn.py:
  30-125, 283-328).
- `VideoVisionTransformer`: ViCLIP's joint space-time ViT-L/14 — (1,P,P)
  3D patch embed, spatial pos per frame + temporal pos per patch, one joint
  transformer over [cls] + N·T tokens (reference viclip/viclip_vision.py:
  105-199).

Both are differentiable w.r.t. pixel inputs — the reward losses backprop
through decoded frames into the student (reference
train_t2v_turbo_v1_lora.py:1043-1098).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.layers import LayerNorm, gelu_exact
from ..ops.attention import attention_xla


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ViTBlock(nn.Module):
    width: int
    heads: int
    quick_gelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        h = LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.width // self.heads
        sp = lambda t: t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        out = attention_xla(sp(q), sp(k), sp(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)
        h = LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h) if self.quick_gelu else gelu_exact(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x


class _BlockStep(nn.Module):
    """scan body: (carry, None) -> (carry, None) around one ViTBlock."""

    width: int
    heads: int
    quick_gelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        x = ViTBlock(
            self.width, self.heads, self.quick_gelu, dtype=self.dtype,
            name="block",
        )(x)
        return x, None


def _run_blocks(x, cfg, dtype):
    """The transformer stack, unrolled or as one lax.scan over layers.

    `cfg.scan_layers=True` stacks the per-layer params on a leading axis
    under a single `resblocks` scope and lowers ONE block body — the HLO
    for the tower shrinks ~layers-x and so does XLA compile time, which is
    what makes the rewards-ON training graphs (UNet + VAE decode + two
    towers, all with backward) compilable inside a bounded remote-compile
    window. Numerics are identical: the same blocks run in the same order.
    Use `stack_tower_layers` to convert imported per-layer checkpoints.
    """
    if not cfg.scan_layers:
        for i in range(cfg.layers):
            x = ViTBlock(
                cfg.width, cfg.heads, cfg.quick_gelu, dtype=dtype,
                name=f"resblocks_{i}",
            )(x)
        return x
    blocks = nn.scan(
        _BlockStep,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=cfg.layers,
    )(cfg.width, cfg.heads, cfg.quick_gelu, dtype=dtype, name="resblocks")
    x, _ = blocks(x, None)
    return x


def stack_params_by_prefix(params: dict, prefix: str, layers: int) -> dict:
    """Convert per-layer `{prefix}_{i}/...` param subtrees to the scanned
    layout `{prefix}/block/...` with a leading layer axis."""
    p = dict(params)
    per = [p.pop(f"{prefix}_{i}") for i in range(layers)]
    p[prefix] = {"block": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *per)}
    return p


def unstack_params_by_prefix(params: dict, prefix: str, layers: int) -> dict:
    p = dict(params)
    stacked = p.pop(prefix)["block"]
    for i in range(layers):
        p[f"{prefix}_{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    return p


def stack_tower_layers(params: dict, layers: int) -> dict:
    """Convert a per-layer CLIP tower param tree (`resblocks_{i}/...`) to the
    `scan_layers=True` layout (`resblocks/block/...` with a leading layer
    axis). Inverse: `unstack_tower_layers`."""
    return stack_params_by_prefix(params, "resblocks", layers)


def unstack_tower_layers(params: dict, layers: int) -> dict:
    return unstack_params_by_prefix(params, "resblocks", layers)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    output_dim: int = 1024
    quick_gelu: bool = False
    scan_layers: bool = False


VIT_H_14 = ViTConfig()  # open_clip ViT-H/14 (HPSv2 / CLIP-H / PickScore)
VIT_L_14 = ViTConfig(width=1024, layers=24, heads=16, output_dim=768)


class VisionTransformer(nn.Module):
    cfg: ViTConfig = VIT_H_14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_tokens: bool = False) -> jax.Array:
        """x: (B, H, W, 3) normalized images -> (B, output_dim) features.

        `return_tokens=True` returns the full post-transformer token
        sequence (B, 1+N, width) with NO ln_post/pooling/projection — the
        open_clip token path of the reference's
        FrozenOpenCLIPImageEmbedderV2 (condition.py:436-485), consumed by
        the finegrained perceiver Resampler."""
        cfg = self.cfg
        b = x.shape[0]
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x.astype(self.dtype))
        x = x.reshape(b, -1, cfg.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,)
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (x.shape[1] + 1, cfg.width),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.width)), x], axis=1
        )
        x = x + pos.astype(x.dtype)
        x = LayerNorm(name="ln_pre")(x)
        x = _run_blocks(x, cfg, self.dtype)
        if return_tokens:
            return x
        x = LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (cfg.width, cfg.output_dim)
        )
        return x @ proj.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class VideoViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    num_frames: int = 8
    quick_gelu: bool = True  # ViCLIP uses QuickGELU (viclip_vision.py:53)
    scan_layers: bool = False


class VideoVisionTransformer(nn.Module):
    """ViCLIP joint space-time tower (reference viclip_vision.py:105-199)."""

    cfg: VideoViTConfig = VideoViTConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, H, W, 3) normalized -> (B, output_dim)."""
        cfg = self.cfg
        b, t, h, w, _ = x.shape
        # (1, P, P) conv3d == per-frame 2D patch conv
        xf = x.reshape(b * t, h, w, 3).astype(self.dtype)
        xf = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(xf)
        n = xf.shape[1] * xf.shape[2]
        xf = xf.reshape(b, t, n, cfg.width)

        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02), (n + 1, cfg.width)
        ).astype(xf.dtype)
        tpos = self.param(
            "temporal_positional_embedding",
            nn.initializers.zeros,
            (1, cfg.num_frames, cfg.width),
        ).astype(xf.dtype)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,)
        ).astype(xf.dtype)

        xf = xf + pos[None, None, 1:, :]
        if t == 1:
            xf = xf + tpos.mean(1)[:, None, None, :]
        else:
            xf = xf + tpos[:, :t][:, :, None, :]
        # tokens ordered (n, t): (B, N, T, W) -> (B, N*T, W) like the
        # reference's '(b n) t m -> b (n t) m'
        xf = xf.transpose(0, 2, 1, 3).reshape(b, n * t, cfg.width)
        cls_tok = jnp.broadcast_to(cls + pos[0], (b, 1, cfg.width))
        xx = jnp.concatenate([cls_tok, xf], axis=1)
        xx = LayerNorm(name="ln_pre")(xx)
        xx = _run_blocks(xx, cfg, self.dtype)
        feat = LayerNorm(name="ln_post")(xx[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (cfg.width, cfg.output_dim)
        )
        return feat @ proj.astype(feat.dtype)
