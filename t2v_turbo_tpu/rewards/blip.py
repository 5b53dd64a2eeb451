"""BLIP towers + ImageReward head (the reference's `img_reward` function,
reward_fn/reward_fn.py:128-174, which loads the external ImageReward
package = BLIP ViT-L/16 + BERT text encoder with per-layer cross-attention
to image states + an MLP scoring head on [CLS]).

- `BlipViT`: BLIP vision transformer (packed-QKV pre-LN blocks, class token,
  post layernorm) — parity-tested against transformers.BlipVisionModel.
- `BertCrossEncoder`: BERT (post-LN) text encoder with optional
  cross-attention in every layer — parity-tested against
  transformers.BertModel(add_cross_attention=True).
- `ImageRewardModel`: score(images, token_ids) -> scalar reward, gradients
  flowing through the image branch (and the cross-attended image states)
  exactly like the reference's differentiable reward.

The MLP head dims follow the published ImageReward-v1.0 architecture
(768 -> 1024 -> 128 -> 64 -> 16 -> 1); the head structure is configurable
since no local oracle exists for the external package's exact head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import LayerNorm, gelu_exact
from ..ops.attention import attention_xla


@dataclasses.dataclass(frozen=True)
class BlipViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    scan_layers: bool = False


class BlipViTBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        h = LayerNorm(name="layer_norm1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = self.width // self.heads
        sp = lambda t: t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        out = attention_xla(sp(q), sp(k), sp(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="projection")(out)
        h = LayerNorm(name="layer_norm2")(x)
        h = nn.Dense(self.width * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = gelu_exact(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x


class _BlipBlockStep(nn.Module):
    """scan body around one BlipViTBlock (see rewards/vit.py::_run_blocks)."""

    width: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        x = BlipViTBlock(
            self.width, self.heads, self.mlp_ratio, dtype=self.dtype,
            name="block",
        )(x)
        return x, None


class BlipViT(nn.Module):
    cfg: BlipViTConfig = BlipViTConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 3) normalized -> (B, 1+N, width) token states."""
        cfg = self.cfg
        b = x.shape[0]
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype,
            name="patch_embedding",
        )(x.astype(self.dtype))
        x = x.reshape(b, -1, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, cfg.width))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, x.shape[1] + 1, cfg.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.width)), x], axis=1
        )
        x = x + pos.astype(x.dtype)
        if cfg.scan_layers:
            x, _ = nn.scan(
                _BlipBlockStep,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.layers,
            )(cfg.width, cfg.heads, cfg.mlp_ratio, dtype=self.dtype,
              name="layers")(x, None)
        else:
            for i in range(cfg.layers):
                x = BlipViTBlock(
                    cfg.width, cfg.heads, cfg.mlp_ratio, dtype=self.dtype,
                    name=f"layers_{i}",
                )(x)
        return LayerNorm(name="post_layernorm")(x)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30524  # BLIP's extended bert-base-uncased vocab
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    cross_attention: bool = True
    encoder_width: int = 1024  # image state dim for cross-attention


class BertSelfOut(nn.Module):
    """dense -> residual -> LayerNorm (post-LN)."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, residual):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="dense")(h)
        return LayerNorm(eps=1e-12, name="norm")(h + residual)


class BertAttention(nn.Module):
    hidden: int
    heads: int
    kv_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv, mask=None):
        d = self.hidden // self.heads
        b, sq = x.shape[:2]
        sk = kv.shape[1]
        q = nn.Dense(self.hidden, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="key")(kv)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="value")(kv)
        sp = lambda t, s: t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)
        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
        out = attention_xla(sp(q, sq), sp(k, sk), sp(v, sk), bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, self.hidden)
        return BertSelfOut(self.hidden, dtype=self.dtype, name="output")(out, x)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, image_states=None, mask=None):
        c = self.cfg
        x = BertAttention(c.hidden, c.heads, dtype=self.dtype, name="attention")(
            x, x, mask
        )
        if c.cross_attention and image_states is not None:
            x = BertAttention(
                c.hidden, c.heads, kv_dim=c.encoder_width, dtype=self.dtype,
                name="crossattention",
            )(x, image_states)
        h = nn.Dense(c.intermediate, dtype=self.dtype, name="intermediate")(x)
        h = gelu_exact(h)
        h = nn.Dense(c.hidden, dtype=self.dtype, name="out_dense")(h)
        return LayerNorm(eps=1e-12, name="out_norm")(h + x)


class BertCrossEncoder(nn.Module):
    cfg: BertConfig = BertConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, image_states=None, mask=None):
        c = self.cfg
        words = self.param(
            "word_embeddings", nn.initializers.normal(0.02), (c.vocab_size, c.hidden)
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_position, c.hidden),
        )
        ttype = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02), (2, c.hidden)
        )
        s = token_ids.shape[1]
        x = (
            jnp.take(words, token_ids, axis=0)
            + pos[None, :s]
            + ttype[0][None, None]
        ).astype(self.dtype)
        x = LayerNorm(eps=1e-12, name="emb_norm")(x)
        for i in range(c.layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, image_states, mask
            )
        return x


# ImageReward-v1.0 published normalization constants
IMAGE_REWARD_MEAN = 0.16717362830052426
IMAGE_REWARD_STD = 1.0333394966054072


@dataclasses.dataclass
class ImageRewardModel:
    vit: BlipViT
    vit_params: Any
    bert: BertCrossEncoder
    bert_params: Any
    head_params: Any  # list of Dense params dicts
    tokenizer: Any = None
    head_dims: Tuple[int, ...] = (1024, 128, 64, 16, 1)
    mean: float = IMAGE_REWARD_MEAN
    std: float = IMAGE_REWARD_STD

    def _head(self, x):
        # the published ImageReward-v1.0 MLP is a pure linear stack with
        # dropout only (activations commented out upstream), so no
        # nonlinearities are applied between layers
        for p in self.head_params:
            x = x @ p["kernel"] + p["bias"]
        return x

    def score(self, images: jax.Array, token_ids: jax.Array,
              mask: Optional[jax.Array] = None) -> jax.Array:
        """images (B,H,W,3) in [0,1] BLIP-normalized upstream; token_ids
        (B,S). Returns (B,) standardized rewards."""
        img_states = self.vit.apply(self.vit_params, images)
        txt = self.bert.apply(
            self.bert_params, token_ids, image_states=img_states, mask=mask
        )
        raw = self._head(txt[:, 0])[:, 0]
        return (raw - self.mean) / self.std

    def __call__(self, images, token_ids, mask=None):
        return self.score(images, token_ids, mask)

    # the whole model (ViT + cross-BERT + head) sits on the in-jit scoring
    # path — unlike CLIP rewards, BLIP's text branch consumes image states
    @property
    def grad_path_params(self):
        return {
            "vit": self.vit_params,
            "bert": self.bert_params,
            "head": self.head_params,
        }

    def with_grad_path_params(self, tree):
        return dataclasses.replace(
            self,
            vit_params=tree["vit"],
            bert_params=tree["bert"],
            head_params=tree["head"],
        )


def build_image_reward_blip(
    vit_cfg: BlipViTConfig = BlipViTConfig(),
    bert_cfg: BertConfig = BertConfig(),
    head_dims: Sequence[int] = (1024, 128, 64, 16, 1),
    weights: Optional[dict] = None,
    tokenizer=None,
    seed: int = 0,
    scan_layers: Optional[bool] = None,
) -> ImageRewardModel:
    if scan_layers is not None and scan_layers != vit_cfg.scan_layers:
        vit_cfg = dataclasses.replace(vit_cfg, scan_layers=scan_layers)
    vit = BlipViT(cfg=vit_cfg)
    bert = BertCrossEncoder(cfg=bert_cfg)
    if weights is None:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        vp = vit.init(k1, jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3)))
        bp = bert.init(
            k2, jnp.zeros((1, 8), jnp.int32),
            image_states=jnp.zeros((1, 4, bert_cfg.encoder_width)),
        )
        dims = [bert_cfg.hidden] + list(head_dims)
        keys = jax.random.split(k3, len(head_dims))
        head = [
            {
                "kernel": jax.random.normal(keys[i], (dims[i], dims[i + 1])) * 0.02,
                "bias": jnp.zeros((dims[i + 1],)),
            }
            for i in range(len(head_dims))
        ]
    else:
        vw = weights["vit"]
        if vit_cfg.scan_layers and "layers_0" in vw:
            from .vit import stack_params_by_prefix

            vw = stack_params_by_prefix(vw, "layers", vit_cfg.layers)
        vp = {"params": vw}
        bp = {"params": weights["bert"]}
        head = weights["head"]
    return ImageRewardModel(vit, vp, bert, bp, head, tokenizer,
                            head_dims=tuple(head_dims))
