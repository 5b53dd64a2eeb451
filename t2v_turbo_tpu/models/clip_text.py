"""OpenCLIP ViT-H/14 text tower (penultimate-layer variant), TPU-native.

Rebuild of the reference FrozenOpenCLIPEmbedder (reference
lvdm/modules/encoders/condition.py:212-287): token + positional embedding,
causal transformer, run `layers - 1` blocks for layer="penultimate"
(condition.py:273-283), then ln_final. Output: (B, 77, width) context for the
UNet cross-attention.

QKV is kept packed like torch MultiheadAttention's in_proj so checkpoint
import is a reshape, and the attention runs through the shared ops layer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNorm, gelu_exact
from ..ops.attention import attention_xla


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    mlp_ratio: int = 4
    penultimate: bool = True  # layer="penultimate" in the live config
    quick_gelu: bool = False  # ViCLIP text tower uses QuickGELU


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: int = 4
    quick_gelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        h = LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.width // self.heads
        split = lambda t: t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        out = attention_xla(split(q), split(k), split(v), causal=True)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)
        h = LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * self.mlp_ratio, dtype=self.dtype, name="c_fc")(h)
        h = (h * jax.nn.sigmoid(1.702 * h)) if self.quick_gelu else gelu_exact(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, context_length) int32 -> (B, context_length, width)."""
        cfg = self.cfg
        embed = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = jnp.take(embed, tokens, axis=0).astype(self.dtype) + pos.astype(
            self.dtype
        )
        n_run = cfg.layers - 1 if cfg.penultimate else cfg.layers
        for i in range(n_run):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, cfg.mlp_ratio,
                quick_gelu=cfg.quick_gelu, dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x)
        # note: params for the skipped final block are not created — the
        # importer simply drops them (they are dead weight at inference).
        return LayerNorm(name="ln_final")(x)
