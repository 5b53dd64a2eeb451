"""ModelScope T2V 3D UNet (diffusers UNet3DConditionModel layout), TPU-native.

Rebuild of reference model_scope/unet_3d_condition.py:55-470 and
unet_3d_blocks.py: conv_in -> temporal transformer_in -> 3x CrossAttnDown +
Down -> mid -> Up + 3x CrossAttnUp -> out, where every level layer is
ResnetBlock2D -> TemporalConvLayer -> Transformer2D (spatial+cross) ->
TransformerTemporal (frames), channels (320, 640, 1280, 1280).

Reuses the VC2 building blocks (the math is identical; ModelScope is where
VideoCrafter's TemporalConvBlock came from): ResBlock (diffusers
ResnetBlock2D ordering matches its non-scale-shift path), TemporalConvBlock,
BasicTransformerBlock, GroupNorm. The LCM w-embedding enters through
TimestepEmbedding's cond_proj exactly like the reference
(unet_3d_condition.py:144-149).

diffusers is not installed in this environment, so parity is asserted
structurally + via the importer key-map (io/torch_import.import_ms_unet_params)
rather than against a live torch oracle; note diffusers does NOT zero-init
resnet conv2/proj_out, which only matters for training from scratch.

Layout: x (B, T, H, W, C); context (B, L, cross_attention_dim).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..diffusion.lcm import timestep_embedding
from .layers import (
    BasicTransformerBlock,
    Downsample,
    GroupNorm,
    ResBlock,
    TemporalConvBlock,
    Upsample,
    silu,
)


@dataclasses.dataclass(frozen=True)
class MSUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_eps: float = 1e-5
    time_cond_proj_dim: Optional[int] = None  # 256 for the LCM student

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


class SpatialTransformer2D(nn.Module):
    """diffusers Transformer2DModel (conv-proj variant) on (N, H, W, C)."""

    channels: int
    n_heads: int
    d_head: int
    context_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        n, h, w, c = x.shape
        residual = x
        x = GroupNorm(32, eps=1e-6, name="norm")(x)
        x = x.reshape(n, h * w, c)
        # proj_in/out are 1x1 convs in the MS checkpoints -> Dense here
        x = nn.Dense(self.n_heads * self.d_head, dtype=self.dtype, name="proj_in")(x)
        x = BasicTransformerBlock(
            self.n_heads * self.d_head,
            self.n_heads,
            self.d_head,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="blocks_0",
        )(x, context=context)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(n, h, w, c) + residual


class TemporalTransformerMS(nn.Module):
    """diffusers TransformerTemporalModel: attention over frames per spatial
    position; proj layers are Linear; attn2 self-attends (no encoder states
    are passed by the 3D blocks)."""

    channels: int
    n_heads: int
    d_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_bt, batch: int):
        n, h, w, c = x_bt.shape
        t = n // batch
        residual = x_bt
        # diffusers normalizes the (B, C, T, H, W) tensor: GroupNorm stats
        # span the WHOLE clip (T, H, W), not each frame — reshape first
        x = GroupNorm(32, eps=1e-6, name="norm")(x_bt.reshape(batch, t, h, w, c))
        x = x.transpose(0, 2, 3, 1, 4)
        x = x.reshape(batch * h * w, t, c)
        x = nn.Dense(self.n_heads * self.d_head, dtype=self.dtype, name="proj_in")(x)
        x = BasicTransformerBlock(
            self.n_heads * self.d_head,
            self.n_heads,
            self.d_head,
            context_dim=None,
            dtype=self.dtype,
            name="blocks_0",
        )(x, context=None, use_flash=False)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(batch, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x.reshape(n, h, w, c) + residual


class MSLevelLayer(nn.Module):
    """One (resnet, temp_conv, [attn, temp_attn]) quartet."""

    in_channels: int
    out_channels: int
    emb_channels: int
    head_dim: int
    context_dim: int
    cross_attention: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context, batch: int, deterministic=True):
        x = ResBlock(
            self.in_channels,
            self.emb_channels,
            out_channels=self.out_channels,
            use_temporal_conv=False,
            zero_init=False,  # diffusers init semantics
            dtype=self.dtype,
            name="resnet",
        )(x, emb, batch_size=batch, deterministic=deterministic)
        n, h, w, c = x.shape
        xt = x.reshape(batch, n // batch, h, w, c)
        xt = TemporalConvBlock(
            self.out_channels, zero_init=False, dtype=self.dtype, name="temp_conv"
        )(xt, deterministic=deterministic)
        x = xt.reshape(n, h, w, c)
        if self.cross_attention:
            heads = self.out_channels // self.head_dim
            x = SpatialTransformer2D(
                self.out_channels, heads, self.head_dim, self.context_dim,
                dtype=self.dtype, name="attn",
            )(x, context)
            x = TemporalTransformerMS(
                self.out_channels, heads, self.head_dim, dtype=self.dtype,
                name="temp_attn",
            )(x, batch)
        return x


class MSUNet3DConditionModel(nn.Module):
    cfg: MSUNetConfig = MSUNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, H, W, C)
        timesteps: jax.Array,  # (B,)
        context: jax.Array,  # (B, L, cross_attention_dim)
        timestep_cond: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        b, t, hh, ww, _ = x.shape
        ch0 = cfg.block_out_channels[0]
        ted = cfg.time_embed_dim

        # time embedding (diffusers Timesteps flip_sin_to_cos=True, shift=0
        # == our cos|sin embedding) + LCM cond_proj
        t_emb = timestep_embedding(timesteps, ch0).astype(self.dtype)
        if timestep_cond is not None:
            t_emb = t_emb + nn.Dense(
                ch0, use_bias=False, dtype=self.dtype, name="cond_proj"
            )(timestep_cond.astype(self.dtype))
        emb = nn.Dense(ted, dtype=self.dtype, name="linear_1")(t_emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="linear_2")(silu(emb))

        emb_f = jnp.repeat(emb, t, axis=0)
        ctx_f = jnp.repeat(context.astype(self.dtype), t, axis=0)

        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)
        h = nn.Conv(
            ch0, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in"
        )(h)
        h = TemporalTransformerMS(
            ch0, 8, cfg.attention_head_dim, dtype=self.dtype, name="transformer_in"
        )(h, b)

        n_levels = len(cfg.block_out_channels)
        skips = [h]
        ch = ch0
        # --- down ---
        for i, out_ch in enumerate(cfg.block_out_channels):
            cross = i < n_levels - 1  # last level is a plain DownBlock3D
            for j in range(cfg.layers_per_block):
                h = MSLevelLayer(
                    ch if j == 0 else out_ch,
                    out_ch,
                    ted,
                    cfg.attention_head_dim,
                    cfg.cross_attention_dim,
                    cross,
                    dtype=self.dtype,
                    name=f"down_{i}_layer_{j}",
                )(h, emb_f, ctx_f, b, deterministic)
                skips.append(h)
            ch = out_ch
            if i < n_levels - 1:
                h = Downsample(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid: resnet/temp_conv then attn/temp_attn/resnet/temp_conv ---
        heads = ch // cfg.attention_head_dim
        h = ResBlock(ch, ted, out_channels=ch, use_temporal_conv=False,
                     zero_init=False, dtype=self.dtype,
                     name="mid_resnet_0")(h, emb_f, batch_size=b)
        ht = h.reshape(b, t, *h.shape[1:])
        ht = TemporalConvBlock(
            ch, zero_init=False, dtype=self.dtype, name="mid_temp_conv_0"
        )(ht, deterministic=deterministic)
        h = ht.reshape(b * t, *h.shape[1:])
        h = SpatialTransformer2D(
            ch, heads, cfg.attention_head_dim, cfg.cross_attention_dim,
            dtype=self.dtype, name="mid_attn",
        )(h, ctx_f)
        h = TemporalTransformerMS(
            ch, heads, cfg.attention_head_dim, dtype=self.dtype, name="mid_temp_attn"
        )(h, b)
        h = ResBlock(ch, ted, out_channels=ch, use_temporal_conv=False,
                     zero_init=False, dtype=self.dtype,
                     name="mid_resnet_1")(h, emb_f, batch_size=b)
        ht = h.reshape(b, t, *h.shape[1:])
        ht = TemporalConvBlock(
            ch, zero_init=False, dtype=self.dtype, name="mid_temp_conv_1"
        )(ht, deterministic=deterministic)
        h = ht.reshape(b * t, *h.shape[1:])

        # --- up ---
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            cross = i > 0  # first up level is the plain UpBlock3D
            prev_ch = ch
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = MSLevelLayer(
                    h.shape[-1],
                    out_ch,
                    ted,
                    cfg.attention_head_dim,
                    cfg.cross_attention_dim,
                    cross,
                    dtype=self.dtype,
                    name=f"up_{i}_layer_{j}",
                )(h, emb_f, ctx_f, b, deterministic)
            ch = out_ch
            if i < n_levels - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNorm(32, eps=cfg.norm_eps, act="silu", name="conv_norm_out")(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_out",
        )(h)
        return h.reshape(b, t, hh, ww, cfg.out_channels).astype(x.dtype)
