"""Image-conditioning projection heads (IP-adapter style).

Rebuild of reference lvdm/modules/encoders/ip_resampler.py:7-148: the
ImageProjModel (CLIP image embedding -> N extra context tokens) and the
perceiver Resampler used by LatentVisualDiffusion (image-conditioned VC2
variant, reference ddpm3d.py:835-887). The live T2V configs don't exercise
these, but they complete the lvdm component inventory and enable the
image-cross-attention branch of CrossAttention (img_cross_attention).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNorm, gelu_exact


class ImageProjModel(nn.Module):
    """CLIP image embedding (B, D_clip) -> (B, N, D_ctx) context tokens."""

    cross_attention_dim: int = 1024
    clip_extra_context_tokens: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        n, d = self.clip_extra_context_tokens, self.cross_attention_dim
        x = nn.Dense(n * d, dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(-1, n, d)
        return LayerNorm(name="norm")(x)


class PerceiverAttention(nn.Module):
    """Cross-attention from learned latents to [image feats ++ latents]
    (reference ip_resampler.py:56-102; the sqrt-sqrt scaling trick kept)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        inner = self.dim_head * self.heads
        x = LayerNorm(name="norm1")(x)
        latents = LayerNorm(name="norm2")(latents)
        b, l, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(self.dim_head)))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler: image patch features -> num_queries context
    tokens (reference ip_resampler.py:105-148)."""

    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lat0 = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / self.dim**0.5,
            (1, self.num_queries, self.dim),
        )
        latents = jnp.broadcast_to(
            lat0.astype(self.dtype), (x.shape[0], self.num_queries, self.dim)
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.dim_head, self.heads, dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(x, latents)
            h = LayerNorm(name=f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(
                self.dim * self.ff_mult, use_bias=False, dtype=self.dtype,
                name=f"layers_{i}_ff_in",
            )(h)
            latents = latents + nn.Dense(
                self.dim, use_bias=False, dtype=self.dtype, name=f"layers_{i}_ff_out"
            )(gelu_exact(h))
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        return LayerNorm(name="norm_out")(out)
