"""VideoCrafter2 3D UNet denoiser, TPU-native.

Functional rebuild of the reference UNetModel
(lvdm/modules/networks/openaimodel3d.py:312-740): per-level
ResBlock(+TemporalConv) -> SpatialTransformer -> TemporalTransformer, an
extra temporal transformer after conv_in (`init_attn`), timestep + fps +
LCM w-embedding (+ v2 motion-cond) conditioning.

TPU-first choices:
- channels-last (B, T, H, W, C); spatial stages run on (B·T, H, W, C), the
  temporal stages on (B, T, H, W, C) — no einops-style (b h) folding.
- computation dtype configurable (bf16 hot path), params f32.
- optional per-block remat (`use_remat`) replacing torch checkpointing.
- attention-prob capture for MotionClone via flax `sow` on the output-block
  temporal transformers (reference openaimodel3d.py:644, attention.py:124-126).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..diffusion.lcm import timestep_embedding
from .layers import (
    BasicTransformerBlock,
    Downsample,
    GroupNorm,
    ResBlock,
    SpatialTransformer,
    TemporalTransformer,
    Upsample,
    conv2d,
    silu,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors configs/inference_t2v_512_v2.0.yaml unet_config params."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    temporal_transformer_depth: int = 1
    context_dim: int = 1024
    temporal_conv: bool = True
    temporal_attention: bool = True
    temporal_selfatt_only: bool = True
    use_relative_position: bool = False
    use_causal_attention: bool = False
    temporal_length: int = 16
    addition_attention: bool = True
    fps_cond: bool = True
    use_scale_shift_norm: bool = False
    time_cond_proj_dim: Optional[int] = None  # 256 for LCM students
    motion_cond_proj_dim: Optional[int] = None  # 256 for v2 motion cond
    # image-conditioned cross-attn branch (reference openaimodel3d.py:368,
    # 490; used by the LatentVisualDiffusion/ip_resampler variant)
    use_image_attention: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


class UNetModel(nn.Module):
    cfg: UNetConfig
    dtype: Any = jnp.float32
    use_remat: bool = False

    def setup(self):
        cfg = self.cfg
        ted = cfg.time_embed_dim
        dt = self.dtype

        if self.use_remat:
            # per-block rematerialization (the reference's use_checkpoint,
            # lvdm/common.py:99-112): recompute activations in backward.
            # static argnums: batch_size/deterministic/record_probs flags.
            RB = nn.remat(ResBlock, static_argnums=(3, 4))
            ST = nn.remat(SpatialTransformer, static_argnums=())
            TT = nn.remat(TemporalTransformer, static_argnums=(3,))
        else:
            RB, ST, TT = ResBlock, SpatialTransformer, TemporalTransformer

        self.time_embed_0 = nn.Dense(ted, dtype=dt)
        self.time_embed_2 = nn.Dense(ted, dtype=dt)
        if cfg.fps_cond:
            self.fps_embedding_0 = nn.Dense(ted, dtype=dt)
            self.fps_embedding_2 = nn.Dense(ted, dtype=dt)
        if cfg.time_cond_proj_dim is not None:
            self.time_cond_proj = nn.Dense(
                cfg.model_channels, use_bias=False, dtype=dt
            )
        if cfg.motion_cond_proj_dim is not None:
            self.motion_cond_proj = nn.Dense(
                cfg.model_channels, use_bias=False, dtype=dt
            )
            self.combine_proj = nn.Dense(cfg.model_channels, use_bias=False, dtype=dt)

        def spatial(ch):
            n_heads = ch // cfg.num_head_channels
            return ST(
                ch,
                n_heads,
                cfg.num_head_channels,
                depth=cfg.transformer_depth,
                context_dim=cfg.context_dim,
                img_cross_attention=cfg.use_image_attention,
                dtype=dt,
            )

        def temporal(ch, n_heads=None):
            return TT(
                ch,
                n_heads if n_heads is not None else ch // cfg.num_head_channels,
                cfg.num_head_channels,
                depth=cfg.temporal_transformer_depth,
                only_self_att=cfg.temporal_selfatt_only,
                relative_position=cfg.use_relative_position,
                causal_attention=cfg.use_causal_attention,
                temporal_length=cfg.temporal_length,
                dtype=dt,
            )

        def res(in_ch, out_ch):
            return RB(
                in_ch,
                ted,
                out_channels=out_ch,
                use_temporal_conv=cfg.temporal_conv,
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                dtype=dt,
            )

        self.conv_in = conv2d(
            cfg.model_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=dt,
        )
        if cfg.addition_attention:
            # reference init_attn: n_heads=8 fixed (openaimodel3d.py:439-453)
            self.init_attn = temporal(cfg.model_channels, n_heads=8)

        # --- encoder ---
        blocks = []
        kinds = []  # parallel structure of layer-kind strings
        ch = cfg.model_channels
        input_chans = [ch]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                layer = [res(ch, mult * cfg.model_channels)]
                kind = ["res"]
                ch = mult * cfg.model_channels
                if ds in cfg.attention_resolutions:
                    layer.append(spatial(ch))
                    kind.append("spat")
                    if cfg.temporal_attention:
                        layer.append(temporal(ch))
                        kind.append("temp")
                blocks.append(layer)
                kinds.append(kind)
                input_chans.append(ch)
            if level != len(cfg.channel_mult) - 1:
                blocks.append([Downsample(ch, dtype=dt)])
                kinds.append(["down"])
                input_chans.append(ch)
                ds *= 2
        self.input_blocks = blocks
        self._input_kinds = kinds
        self._input_chans = input_chans

        # --- middle ---
        mid = [res(ch, ch), spatial(ch)]
        mid_kinds = ["res", "spat"]
        if cfg.temporal_attention:
            mid.append(temporal(ch))
            mid_kinds.append("temp")
        mid.append(res(ch, ch))
        mid_kinds.append("res")
        self.middle_block = mid
        self._middle_kinds = mid_kinds

        # --- decoder ---
        out_blocks = []
        out_kinds = []
        chans = list(input_chans)
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                ich = chans.pop()
                layer = [res(ch + ich, mult * cfg.model_channels)]
                kind = ["res"]
                ch = mult * cfg.model_channels
                if ds in cfg.attention_resolutions:
                    layer.append(spatial(ch))
                    kind.append("spat")
                    if cfg.temporal_attention:
                        layer.append(temporal(ch))
                        kind.append("temp")
                if level and i == cfg.num_res_blocks:
                    layer.append(Upsample(ch, dtype=dt))
                    kind.append("up")
                    ds //= 2
                out_blocks.append(layer)
                out_kinds.append(kind)
        self.output_blocks = out_blocks
        self._output_kinds = out_kinds

        self.out_norm = GroupNorm(32, act="silu")
        self.out_conv = conv2d(
            cfg.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros,
            dtype=dt,
        )

    def _run(self, layers, kinds, h, emb, context, b, deterministic, record_probs):
        for layer, kind in zip(layers, kinds):
            if kind == "res":
                # positional args so nn.remat static_argnums line up
                h = layer(h, emb, b, deterministic)
            elif kind == "spat":
                h = layer(h, context)
            elif kind == "temp":
                n, hh, ww, cc = h.shape
                ht = h.reshape(b, n // b, hh, ww, cc)
                ht = layer(ht, None, record_probs)
                h = ht.reshape(n, hh, ww, cc)
            elif kind == "down" or kind == "up":
                h = layer(h)
            else:  # pragma: no cover
                raise ValueError(kind)
        return h

    def __call__(
        self,
        x: jax.Array,  # (B, T, H, W, C)
        timesteps: jax.Array,  # (B,)
        context: jax.Array,  # (B, L, context_dim)
        fps: Optional[jax.Array] = None,  # scalar or (B,)
        timestep_cond: Optional[jax.Array] = None,  # (B, time_cond_proj_dim)
        motion_cond: Optional[jax.Array] = None,  # (B, motion_cond_proj_dim)
        deterministic: bool = True,
        record_probs: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        b, t, hh, ww, _ = x.shape

        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(self.dtype)
        if timestep_cond is not None:
            cond = self.time_cond_proj(timestep_cond.astype(self.dtype))
            if motion_cond is not None:
                m = self.motion_cond_proj(motion_cond.astype(self.dtype))
                cond = self.combine_proj(jnp.concatenate([cond, m], axis=-1))
            t_emb = t_emb + cond
        emb = self.time_embed_2(silu(self.time_embed_0(t_emb)))

        if cfg.fps_cond:
            if fps is None:
                fps = jnp.full((b,), 16.0)
            fps = jnp.broadcast_to(jnp.asarray(fps, jnp.float32), (b,))
            fps_emb = timestep_embedding(fps, cfg.model_channels).astype(self.dtype)
            emb = emb + self.fps_embedding_2(silu(self.fps_embedding_0(fps_emb)))

        # per-frame replication: (B, ...) -> (B*T, ...)
        emb_f = jnp.repeat(emb, t, axis=0)
        ctx_f = jnp.repeat(context.astype(self.dtype), t, axis=0)

        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)

        h = self.conv_in(h)
        if cfg.addition_attention:
            n = h.shape[0]
            ht = h.reshape(b, t, *h.shape[1:])
            ht = self.init_attn(ht, None, False)
            h = ht.reshape(n, *h.shape[1:])

        hs = [h]
        for layer, kind in zip(self.input_blocks, self._input_kinds):
            h = self._run(layer, kind, h, emb_f, ctx_f, b, deterministic, False)
            hs.append(h)

        h = self._run(
            self.middle_block,
            self._middle_kinds,
            h,
            emb_f,
            ctx_f,
            b,
            deterministic,
            False,
        )

        for layer, kind in zip(self.output_blocks, self._output_kinds):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._run(
                layer, kind, h, emb_f, ctx_f, b, deterministic, record_probs
            )

        h = self.out_conv(self.out_norm(h))
        return h.reshape(b, t, hh, ww, cfg.out_channels).astype(x.dtype)
