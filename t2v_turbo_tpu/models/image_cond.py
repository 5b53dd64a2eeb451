"""Image-conditioned generation glue (LatentVisualDiffusion equivalent).

Rebuilds the reference's image-conditioning stack around the pieces that
already exist here:

- `FrozenOpenCLIPImageEmbedder` (reference
  lvdm/modules/encoders/condition.py:289-370): CLIP preprocessing + the
  open_clip ViT-H/14 visual tower -> pooled projected embedding. The tower
  is `rewards.vit.VisionTransformer` (same module family the reward models
  use; weights import via `io.torch_import.import_clip_vision_params`).
- `LatentVisualDiffusion.get_image_embeds` (reference ddpm3d.py:835-887):
  embedder -> ImageProjModel (coarse, 4 tokens) or perceiver Resampler
  (finegrained, 16 tokens) -> extra context tokens consumed by the UNet's
  image cross-attention branch (`UNetConfig.use_image_attention`).

TPU notes: preprocessing is pure jnp (resize on device, fused with the
tower's first conv under jit); the reference's kornia bicubic-with-
antialias resize maps to jax.image.resize(method="cubic"), which also
antialiases by default when downscaling — matching behavior, including on
the 512 -> 224 (~2.3x) downscale of the standard input path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..rewards.vit import VisionTransformer, ViTConfig, VIT_H_14
from .ip_resampler import ImageProjModel, Resampler

# open_clip normalization constants (reference condition.py:324-330)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_image_preprocess(x: jax.Array, size: int = 224) -> jax.Array:
    """[-1, 1] images (B, H, W, 3) -> CLIP-normalized (B, size, size, 3)
    (reference condition.py:332-345)."""
    b, _, _, c = x.shape
    x = jax.image.resize(x, (b, size, size, c), method="cubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


@dataclasses.dataclass
class ImageCondEncoder:
    """Frozen image embedder + projection head -> extra context tokens.

    Mirrors LatentVisualDiffusion's construction (reference
    ddpm3d.py:836-879): `finegrained=False` uses ImageProjModel with 4
    tokens; `finegrained=True` uses the 4-deep perceiver Resampler with 16
    tokens. `__call__` is `get_image_embeds` (ddpm3d.py:881-887).
    """

    tower: VisionTransformer
    tower_params: Any
    proj: Any  # ImageProjModel | Resampler
    proj_params: Any
    finegrained: bool = False

    @classmethod
    def create(
        cls,
        key: jax.Array,
        finegrained: bool = False,
        cross_attention_dim: int = 1024,
        vit_cfg: Optional[ViTConfig] = None,
        dtype=jnp.float32,
    ) -> "ImageCondEncoder":
        """Random-weight construction (checkpoint import replaces the
        params with `import_clip_vision_params` / ip_resampler imports)."""
        cfg = vit_cfg or VIT_H_14
        tower = VisionTransformer(cfg=cfg, dtype=dtype)
        k1, k2 = jax.random.split(key)
        tp = tower.init(k1, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
        num_tokens = 16 if finegrained else 4
        if finegrained:
            # finegrained consumes the V2 embedder's token sequence (width
            # cfg.width, reference ddpm3d.py:870-878: embedding_dim=1280)
            proj = Resampler(
                dim=cfg.output_dim,
                depth=4,
                dim_head=64,
                heads=12,
                num_queries=num_tokens,
                embedding_dim=cfg.width,
                output_dim=cross_attention_dim,
                dtype=dtype,
            )
            pp = proj.init(k2, jnp.zeros((1, 1, cfg.width)))
        else:
            proj = ImageProjModel(
                cross_attention_dim=cross_attention_dim,
                clip_extra_context_tokens=num_tokens,
                dtype=dtype,
            )
            pp = proj.init(k2, jnp.zeros((1, cfg.output_dim)))
        return cls(
            tower=tower, tower_params=tp, proj=proj, proj_params=pp,
            finegrained=finegrained,
        )

    def __call__(self, imgs: jax.Array) -> jax.Array:
        """[-1,1] images (B, H, W, 3) -> (B, N, cross_attention_dim) tokens
        (= get_image_embeds, reference ddpm3d.py:881-887). Coarse mode uses
        the pooled projected embedding (V1 embedder); finegrained uses the
        token sequence (V2 embedder)."""
        x = clip_image_preprocess(imgs, self.tower.cfg.image_size)
        emb = self.tower.apply(
            self.tower_params, x, return_tokens=self.finegrained
        )
        return self.proj.apply(self.proj_params, emb)


def append_image_context(
    text_ctx: jax.Array, img_tokens: jax.Array, text_context_len: int = 200
) -> jax.Array:
    """Build the combined context the image-attention UNet splits back
    apart (CrossAttention.text_context_len): text rows padded/truncated to
    `text_context_len`, image tokens appended after.

    Padding repeats the LAST text row rather than inserting zeros: zero
    rows would become attendable keys with logit exactly 0 (bias-free
    to_k) and dilute the softmax over the real tokens, whereas repeating
    the final (eot-like) embedding mirrors how CLIP text encoders fill
    their own padded positions."""
    b, s, d = text_ctx.shape
    if s > text_context_len:
        text_ctx = text_ctx[:, :text_context_len]
    elif s < text_context_len:
        pad = jnp.broadcast_to(
            text_ctx[:, -1:, :], (b, text_context_len - s, d)
        )
        text_ctx = jnp.concatenate([text_ctx, pad], axis=1)
    return jnp.concatenate([text_ctx, img_tokens.astype(text_ctx.dtype)], axis=1)
