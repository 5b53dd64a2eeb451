"""InternVideo2-Stage2 video-text reward tower (`vi_clip2`).

Rebuild of the reference's vendored InternVideo2 reward path
(intern_vid2/demo_utils.py:152-361, models/backbones/internvideo2/
internvideo2.py:28-660, reward_fn/reward_fn.py:234-281):

- `IV2VisionEncoder`: ViT-g/14-style joint space-time transformer — per-frame
  patch conv (tubelet 1), cls token + joint positional embedding, 40
  pre-RMSNorm blocks with packed no-bias QKV, full-width q/k RMS
  normalization, LayerScale, 48/11 MLP ratio — followed by the
  attention-pooling clip projector (LayerNorm q/k/v + single-query
  cross-attention to clip_embed_dim).
- `IV2TextEncoder`: BERT-large CLS features (reuses rewards.blip's
  BertCrossEncoder without cross-attention).
- `InternVideo2RewardModel`: score = <normalize(vision_proj(pooled_v)),
  normalize(text_proj(cls_t))> with gradients through the video branch only
  (the reference's get_vid_feat_with_grad, demo_utils.py:332-346).

The reference's CUDA specifics (flash_attn varlen kernels, fused RMSNorm /
MLP) are replaced by the shared attention ops and plain XLA; the
use_flash_attn=False torch path is the parity oracle for the block math.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import LayerNorm, gelu_exact
from ..ops.attention import attention_xla
from .blip import BertConfig, BertCrossEncoder


class RMSNorm(nn.Module):
    """x * w / sqrt(mean(x^2) + eps), f32 statistics
    (reference internvideo2.py:127-138)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w.astype(
            x.dtype
        )


class LayerScale(nn.Module):
    """per-channel learned residual gain (reference internvideo2.py:141-156)."""

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(1e-5), (x.shape[-1],))
        return x * gamma.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class IV2VisionConfig:
    img_size: int = 224
    patch_size: int = 14
    width: int = 1408
    depth: int = 40
    heads: int = 16
    mlp_hidden: int = 6144  # int(1408 * 48/11)
    num_frames: int = 8
    clip_embed_dim: int = 768
    attn_pool_heads: int = 16
    qk_normalization: bool = True
    scan_layers: bool = False


class IV2Block(nn.Module):
    cfg: IV2VisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, s, d = x.shape
        hd = c.width // c.heads

        h = RMSNorm(name="norm1")(x)
        qkv = nn.Dense(3 * c.width, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if c.qk_normalization:
            # full-width RMS over the flattened head dims (internvideo2.py:188-192)
            q = RMSNorm(name="q_norm")(q)
            k = RMSNorm(name="k_norm")(k)
        sp = lambda t: t.reshape(b, s, c.heads, hd).transpose(0, 2, 1, 3)
        out = attention_xla(sp(q), sp(k), sp(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c.width)
        out = nn.Dense(c.width, dtype=self.dtype, name="proj")(out)
        x = x + LayerScale(name="ls1")(out)

        h = RMSNorm(name="norm2")(x)
        h = nn.Dense(c.mlp_hidden, dtype=self.dtype, name="fc1")(h)
        h = gelu_exact(h)
        h = nn.Dense(c.width, dtype=self.dtype, name="fc2")(h)
        return x + LayerScale(name="ls2")(h)


class _IV2BlockStep(nn.Module):
    """scan body around one IV2Block (see rewards/vit.py::_run_blocks for
    why: one lowered block body + stacked params instead of depth=40
    unrolled blocks — same numerics, ~40x smaller tower HLO, which keeps
    the vi_clip2 rewards-ON training graph compilable)."""

    cfg: IV2VisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        return IV2Block(self.cfg, dtype=self.dtype, name="block")(x), None


class AttentionPooling(nn.Module):
    """Single-query cross-attention pooling (reference internvideo2.py:93-124);
    q/k/v projections are bias-full (qkv_bias=True at construction :484)."""

    dim: int
    heads: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        hd = d // self.heads
        xq = LayerNorm(name="norm1_q")(x.mean(axis=1, keepdims=True))
        xk = LayerNorm(name="norm1_k")(x)
        xv = LayerNorm(name="norm1_v")(x)
        q = nn.Dense(d, dtype=self.dtype, name="q")(xq)
        k = nn.Dense(d, dtype=self.dtype, name="k")(xk)
        v = nn.Dense(d, dtype=self.dtype, name="v")(xv)
        sp = lambda t, n: t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        out = attention_xla(sp(q, 1), sp(k, s), sp(v, s))
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(out)
        return out[:, 0]


class IV2VisionEncoder(nn.Module):
    cfg: IV2VisionConfig = IV2VisionConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        """video: (B, T, H, W, 3) normalized -> pooled (B, clip_embed_dim)."""
        c = self.cfg
        b, t, hh, ww, _ = video.shape
        x = video.reshape(b * t, hh, ww, 3).astype(self.dtype)
        x = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), dtype=self.dtype, name="patch_proj",
        )(x)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, t * n, c.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + c.num_frames * (c.img_size // c.patch_size) ** 2, c.width),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c.width)), x], axis=1
        )
        x = x + pos[:, : x.shape[1]].astype(x.dtype)
        if c.scan_layers:
            x, _ = nn.scan(
                _IV2BlockStep,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.depth,
            )(c, dtype=self.dtype, name="blocks")(x, None)
        else:
            for i in range(c.depth):
                x = IV2Block(c, dtype=self.dtype, name=f"blocks_{i}")(x)
        return AttentionPooling(
            c.width, c.attn_pool_heads, c.clip_embed_dim, dtype=self.dtype,
            name="clip_projector",
        )(x)


BERT_LARGE = BertConfig(
    vocab_size=30522, hidden=1024, layers=24, heads=16, intermediate=4096,
    max_position=512, cross_attention=False, encoder_width=1024,
)


def _norm_feat(x):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


@dataclasses.dataclass
class InternVideo2RewardModel:
    vision: IV2VisionEncoder
    vision_params: Any
    text: BertCrossEncoder
    text_params: Any
    vision_proj: Any  # {"kernel", "bias"}
    text_proj: Any
    tokenizer: Any = None

    def encode_texts_tokens(self, token_ids, mask=None) -> jax.Array:
        cls = self.text.apply(self.text_params, token_ids, mask=mask)[:, 0]
        feats = cls @ self.text_proj["kernel"] + self.text_proj["bias"]
        return jax.lax.stop_gradient(_norm_feat(feats))

    def encode_texts(self, texts: Sequence[str]) -> jax.Array:
        assert self.tokenizer is not None, "provide a BERT tokenizer or token ids"
        toks = self.tokenizer(list(texts))
        # BERT-style tokenizers (utils.bert_tokenizer.BertWordPieceTokenizer)
        # return (ids, attention_mask); the mask must reach the encoder or
        # padding tokens contaminate the [CLS] feature (the reference always
        # applies it).
        if isinstance(toks, tuple):
            ids, mask = toks
            return self.encode_texts_tokens(jnp.asarray(ids), jnp.asarray(mask))
        return self.encode_texts_tokens(jnp.asarray(toks))

    def score(self, videos: jax.Array, text_feats: jax.Array) -> jax.Array:
        """videos (B, T, H, W, 3) preprocessed; text_feats (B, D) normalized.
        Cosine score, grads through the video branch (reference
        reward_fn.py:264-266)."""
        pooled = self.vision.apply(self.vision_params, videos)
        vfeat = pooled @ self.vision_proj["kernel"] + self.vision_proj["bias"]
        vfeat = _norm_feat(vfeat)
        return jnp.sum(vfeat * jax.lax.stop_gradient(text_feats), axis=-1)

    def __call__(self, videos, texts):
        return self.score(videos, self.encode_texts(texts))

    @property
    def grad_path_params(self):
        return {"vision": self.vision_params, "vision_proj": self.vision_proj}

    def with_grad_path_params(self, tree):
        return dataclasses.replace(
            self, vision_params=tree["vision"], vision_proj=tree["vision_proj"]
        )


def build_internvideo2_reward(
    vision_cfg: IV2VisionConfig = IV2VisionConfig(),
    text_cfg: BertConfig = BERT_LARGE,
    embed_dim: int = 512,
    weights: Optional[dict] = None,
    tokenizer=None,
    seed: int = 0,
    scan_layers: Optional[bool] = None,
) -> InternVideo2RewardModel:
    if scan_layers is not None and scan_layers != vision_cfg.scan_layers:
        vision_cfg = dataclasses.replace(vision_cfg, scan_layers=scan_layers)
    vision = IV2VisionEncoder(cfg=vision_cfg)
    text = BertCrossEncoder(cfg=text_cfg)
    if weights is None:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        vp = vision.init(
            k1,
            jnp.zeros((1, vision_cfg.num_frames, vision_cfg.img_size,
                       vision_cfg.img_size, 3)),
        )
        tp = text.init(k2, jnp.zeros((1, 8), jnp.int32))
        ka, kb = jax.random.split(k3)
        vproj = {
            "kernel": jax.random.normal(ka, (vision_cfg.clip_embed_dim, embed_dim)) * 0.02,
            "bias": jnp.zeros((embed_dim,)),
        }
        tproj = {
            "kernel": jax.random.normal(kb, (text_cfg.hidden, embed_dim)) * 0.02,
            "bias": jnp.zeros((embed_dim,)),
        }
    else:
        vw = weights["vision"]
        if vision_cfg.scan_layers and "blocks_0" in vw:
            from .vit import stack_params_by_prefix

            vw = stack_params_by_prefix(vw, "blocks", vision_cfg.depth)
        vp = {"params": vw}
        tp = {"params": weights["text"]}
        vproj, tproj = weights["vision_proj"], weights["text_proj"]
    return InternVideo2RewardModel(vision, vp, text, tp, vproj, tproj, tokenizer)
