"""Differentiable reward functions (image + video) and their factory.

Rebuild of reference reward_fn/reward_fn.py:30-358. All rewards are
cosine similarities between L2-normalized tower features:
    score(images, texts) = <img_feat/||.||, text_feat/||.||>
with gradients flowing through the image/video branch only (text features
are precomputed / stop_gradient'ed), exactly like the reference's
torch.no_grad() text branches.

Names mirror the reference factory (reward_fn.py:342-358):
  clip               open_clip CLIP ViT-H/14 cosine score
  hpsv2              HPSv2.1-finetuned ViT-H/14 (same arch, different weights)
  pick               PickScore (CLIP-H weights in HF layout)
  weighted_hpsv2_clip  w0*hpsv2 + w1*clip
  vi_clip            ViCLIP-L video-text score
  img_reward         ImageReward (BLIP tower, rewards/blip.py)
  vi_clip2           InternVideo2-Stage2 (rewards/internvideo2.py)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPTextConfig, CLIPTextModel
from .vit import (
    VIT_H_14,
    VideoViTConfig,
    VideoVisionTransformer,
    VisionTransformer,
    ViTConfig,
)

# CLIP / ViCLIP pixel normalization (reference reward_fn.py CLIP_NORMALIZE /
# ViCLIP_NORMALIZE constants)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
VICLIP_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
VICLIP_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_images(
    images: jax.Array, size: int = 224, mean=CLIP_MEAN, std=CLIP_STD
) -> jax.Array:
    """images: (..., H, W, 3) in [0,1] -> resized+normalized (..., size, size, 3).
    Bicubic resize is differentiable (the reference uses torchvision Resize
    inside the grad path)."""
    lead = images.shape[:-3]
    h, w, c = images.shape[-3:]
    flat = images.reshape((-1, h, w, c))
    # aspect-preserving short-side resize + center crop
    scale = size / min(h, w)
    nh, nw = max(size, round(h * scale)), max(size, round(w * scale))
    flat = jax.image.resize(flat, (flat.shape[0], nh, nw, c), "bicubic")
    y, x = (nh - size) // 2, (nw - size) // 2
    flat = flat[:, y : y + size, x : x + size]
    flat = (flat - jnp.asarray(mean)) / jnp.asarray(std)
    return flat.reshape(lead + (size, size, c))


class CLIPTextPooled(nn.Module):
    """Full-depth CLIP text tower with eot pooling + projection (the scoring
    text branch; differs from the UNet-conditioning tower, which stops at
    the penultimate layer and keeps all 77 positions)."""
    cfg: CLIPTextConfig
    proj_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        full_cfg = dataclasses.replace(self.cfg, penultimate=False)
        x = CLIPTextModel(cfg=full_cfg, dtype=self.dtype, name="tower")(tokens)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.02),
            (self.cfg.width, self.proj_dim),
        )
        return pooled @ proj.astype(pooled.dtype)


def _norm(x):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


@dataclasses.dataclass
class ImageRewardModel:
    """CLIP-style image reward: vision tower + pooled text tower."""

    vision: VisionTransformer
    vision_params: Any
    text: CLIPTextPooled
    text_params: Any
    tokenizer: Any
    logit_scale: float = 100.0
    mean: np.ndarray = dataclasses.field(default_factory=lambda: CLIP_MEAN)
    std: np.ndarray = dataclasses.field(default_factory=lambda: CLIP_STD)

    def encode_texts(self, texts: Sequence[str]) -> jax.Array:
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        feats = self.text.apply(self.text_params, tokens)
        return jax.lax.stop_gradient(_norm(feats))

    def score(self, images: jax.Array, text_feats: jax.Array, logits=False):
        """images (B,H,W,3) in [0,1]; text_feats (B,D) pre-normalized."""
        px = preprocess_images(
            images, size=self.vision.cfg.image_size, mean=self.mean, std=self.std
        )
        img = _norm(self.vision.apply(self.vision_params, px))
        s = jnp.sum(img * jax.lax.stop_gradient(text_feats), axis=-1)
        return s * self.logit_scale if logits else s

    def __call__(self, images, texts):
        return self.score(images, self.encode_texts(texts))

    # Param trees on the in-jit scoring path (text runs host-side /
    # precomputed). The trainer threads these through the step as runtime
    # args (LCDTrainer reward_fn_factory) instead of closure constants.
    @property
    def grad_path_params(self):
        return {"vision": self.vision_params}

    def with_grad_path_params(self, tree):
        return dataclasses.replace(self, vision_params=tree["vision"])


@dataclasses.dataclass
class VideoRewardModel:
    """ViCLIP-style video reward."""

    vision: VideoVisionTransformer
    vision_params: Any
    text: CLIPTextPooled
    text_params: Any
    tokenizer: Any
    mean: np.ndarray = dataclasses.field(default_factory=lambda: VICLIP_MEAN)
    std: np.ndarray = dataclasses.field(default_factory=lambda: VICLIP_STD)

    def encode_texts(self, texts: Sequence[str]) -> jax.Array:
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        feats = self.text.apply(self.text_params, tokens)
        return jax.lax.stop_gradient(_norm(feats))

    def score(self, videos: jax.Array, text_feats: jax.Array):
        """videos (B,T,H,W,3) in [0,1]."""
        px = preprocess_images(
            videos, size=self.vision.cfg.image_size, mean=self.mean, std=self.std
        )
        feats = _norm(self.vision.apply(self.vision_params, px))
        return jnp.sum(feats * jax.lax.stop_gradient(text_feats), axis=-1)

    def __call__(self, videos, texts):
        return self.score(videos, self.encode_texts(texts))

    @property
    def grad_path_params(self):
        return {"vision": self.vision_params}

    def with_grad_path_params(self, tree):
        return dataclasses.replace(self, vision_params=tree["vision"])


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------

OPEN_CLIP_H14_TEXT = CLIPTextConfig(
    vocab_size=49408, width=1024, heads=16, layers=24, context_length=77,
    penultimate=False,
)
VICLIP_TEXT = CLIPTextConfig(
    vocab_size=49408, width=768, heads=12, layers=12, context_length=77,
    penultimate=False, quick_gelu=True,
)


def build_image_reward_model(
    weights: Optional[dict] = None,
    tokenizer=None,
    vit_cfg: ViTConfig = VIT_H_14,
    text_cfg: CLIPTextConfig = OPEN_CLIP_H14_TEXT,
    dtype=jnp.float32,
    seed: int = 0,
    scan_layers: Optional[bool] = None,
) -> ImageRewardModel:
    """weights: {'visual': ..., 'text': ..., 'logit_scale': float} param trees
    from io.torch_import.import_openclip_params, or None for random init
    (tests/smoke). `scan_layers=True` lowers the vision tower as ONE scanned
    block over stacked params (same numerics, ~layers-x smaller HLO — use
    when the tower sits inside a training graph); imported per-layer
    checkpoints are restacked automatically."""
    if scan_layers is not None and scan_layers != vit_cfg.scan_layers:
        import dataclasses

        vit_cfg = dataclasses.replace(vit_cfg, scan_layers=scan_layers)
    vision = VisionTransformer(cfg=vit_cfg, dtype=dtype)
    text = CLIPTextPooled(cfg=text_cfg, proj_dim=vit_cfg.output_dim, dtype=dtype)
    if weights is None:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vision.init(k1, jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3)))
        tp = text.init(k2, jnp.zeros((1, text_cfg.context_length), jnp.int32))
        scale = 100.0
    else:
        visual = weights["visual"]
        if vit_cfg.scan_layers and "resblocks_0" in visual:
            from .vit import stack_tower_layers

            visual = stack_tower_layers(visual, vit_cfg.layers)
        vp = {"params": visual}
        tp = {"params": weights["text"]}
        scale = float(np.exp(weights.get("logit_scale", np.log(100.0))))
    if tokenizer is None:
        from ..utils.tokenizer import CLIPTokenizer

        tokenizer = CLIPTokenizer(context_length=text_cfg.context_length)
    return ImageRewardModel(vision, vp, text, tp, tokenizer, logit_scale=scale)


def build_video_reward_model(
    weights: Optional[dict] = None,
    tokenizer=None,
    vit_cfg: VideoViTConfig = VideoViTConfig(),
    text_cfg: CLIPTextConfig = VICLIP_TEXT,
    dtype=jnp.float32,
    seed: int = 0,
    scan_layers: Optional[bool] = None,
) -> VideoRewardModel:
    if scan_layers is not None and scan_layers != vit_cfg.scan_layers:
        import dataclasses

        vit_cfg = dataclasses.replace(vit_cfg, scan_layers=scan_layers)
    vision = VideoVisionTransformer(cfg=vit_cfg, dtype=dtype)
    text = CLIPTextPooled(cfg=text_cfg, proj_dim=vit_cfg.output_dim, dtype=dtype)
    if weights is None:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vision.init(
            k1,
            jnp.zeros((1, vit_cfg.num_frames, vit_cfg.image_size, vit_cfg.image_size, 3)),
        )
        tp = text.init(k2, jnp.zeros((1, text_cfg.context_length), jnp.int32))
    else:
        visual = weights["visual"]
        if vit_cfg.scan_layers and "resblocks_0" in visual:
            from .vit import stack_tower_layers

            visual = stack_tower_layers(visual, vit_cfg.layers)
        vp = {"params": visual}
        tp = {"params": weights["text"]}
    if tokenizer is None:
        from ..utils.tokenizer import CLIPTokenizer

        tokenizer = CLIPTokenizer(context_length=text_cfg.context_length)
    return VideoRewardModel(vision, vp, text, tp, tokenizer)


class _HashTokenizer:
    """Deterministic fallback tokenizer for smoke/CI runs without a BERT
    vocab file: stable per-word hash ids. NOT for real training — pass a
    BertWordPieceTokenizer (utils/bert_tokenizer.py) with the published
    vocab for reference-matching text encoding."""

    def __init__(self, max_length: int = 35, vocab_size: int = 30522):
        self.max_length, self.vocab_size = max_length, vocab_size
        self.pad_id = 0

    def __call__(self, texts):
        import hashlib

        out = np.zeros((len(texts), self.max_length), np.int32)
        for i, t in enumerate(texts):
            words = str(t).lower().split()[: self.max_length - 2]
            ids = [101] + [
                int(hashlib.md5(w.encode()).hexdigest()[:6], 16)
                % (self.vocab_size - 999) + 999
                for w in words
            ] + [102]
            out[i, : len(ids)] = ids
        return out, (out != 0).astype(np.int32)


class BlipTrainReward:
    """Training-loop facade over rewards.blip.ImageRewardModel with the
    CLIP-reward interface the LCD adapters expect: `encode_texts` produces
    the per-batch host-side field and `score(images01, field)` scores
    decoded frames. The field is BERT token ids (ints ride through the
    `reward_text_feats` batch slot unchanged). Matches reference
    reward_fn.py:128-174: CLIP-normalized 224 bicubic resize, BLIP
    tokenizer max_length=35, final reward -relu(-r + 2)."""

    def __init__(self, rm, tokenizer=None, max_length: int = 35):
        self.rm = rm
        self.tokenizer = tokenizer or _HashTokenizer(max_length=max_length)

    def encode_texts(self, texts: Sequence[str]):
        ids = self.tokenizer(list(texts))
        return ids[0] if isinstance(ids, tuple) else np.asarray(ids)

    def score(self, images: jax.Array, token_ids: jax.Array, logits=False):
        del logits
        px = preprocess_images(images, size=self.rm.vit.cfg.image_size)
        token_ids = token_ids.astype(jnp.int32)
        mask = (token_ids != 0).astype(jnp.int32)
        r = self.rm.score(px, token_ids, mask)
        return -jax.nn.relu(-r + 2.0)  # reference reward_fn.py:172

    @property
    def grad_path_params(self):
        return self.rm.grad_path_params

    def with_grad_path_params(self, tree):
        import copy

        new = copy.copy(self)
        new.rm = self.rm.with_grad_path_params(tree)
        return new


class InternVideo2TrainReward:
    """Training-loop facade over rewards.internvideo2.InternVideo2RewardModel
    (reference reward_fn.py:234-281, the v1 trainer's DEFAULT video RM —
    train_t2v_turbo_v1_lora.py:518-520): ViCLIP-normalized min-side 224
    resize on the grad path, no-grad text features precomputed host-side."""

    def __init__(self, rm, tokenizer=None, image_size: int = 224):
        self.rm = rm
        self.image_size = image_size
        if tokenizer is not None:
            self.rm.tokenizer = tokenizer

    def encode_texts(self, texts: Sequence[str]) -> jax.Array:
        if self.rm.tokenizer is None:
            tok = _HashTokenizer(max_length=40)
            ids, mask = tok(list(texts))
            return self.rm.encode_texts_tokens(jnp.asarray(ids), jnp.asarray(mask))
        return self.rm.encode_texts(list(texts))

    def score(self, videos: jax.Array, text_feats: jax.Array) -> jax.Array:
        px = preprocess_images(
            videos, size=self.image_size, mean=VICLIP_MEAN, std=VICLIP_STD
        )
        return self.rm.score(px, text_feats)

    @property
    def grad_path_params(self):
        return self.rm.grad_path_params

    def with_grad_path_params(self, tree):
        import copy

        new = copy.copy(self)
        new.rm = self.rm.with_grad_path_params(tree)
        return new


def get_reward_fn(name: str, weights: Optional[dict] = None, **kw) -> Callable:
    """Factory matching reference reward_fn.py:342-358 names."""
    if name in ("clip", "hpsv2", "pick"):
        model = build_image_reward_model(weights=weights, **kw)
        return model
    if name == "weighted_hpsv2_clip":
        w = kw.pop("weights_pair", (1.0, 5.0))
        hps = build_image_reward_model(weights=kw.pop("hpsv2_weights", None), **kw)
        clip = build_image_reward_model(weights=kw.pop("clip_weights", None), **kw)

        def score(images, texts):
            return w[0] * hps(images, texts) + w[1] * clip(images, texts)

        return score
    if name == "vi_clip":
        return build_video_reward_model(weights=weights, **kw)
    if name == "img_reward":
        from .blip import build_image_reward_blip

        return build_image_reward_blip(weights=weights, **kw)
    if name == "vi_clip2":
        from .internvideo2 import build_internvideo2_reward

        return build_internvideo2_reward(weights=weights, **kw)
    raise ValueError(f"unknown reward fn {name!r}")
