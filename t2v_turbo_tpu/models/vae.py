"""2D image VAE (SD-style AutoencoderKL), channels-last, TPU-native.

Rebuild of the reference first stage (lvdm/models/autoencoder.py:13-113,
lvdm/modules/networks/ae_modules.py:29-643): f=8, z=4, ch=128,
ch_mult (1,2,4,4), no encoder/decoder attention except at the bottleneck.

Video use is per-frame ("2DAE", reference ddpm3d.py:587-600,667-679): frames
fold into the batch axis, and encode/decode can be micro-batched to bound
activation memory (the reference's --vae_decode_batch_size chunking,
train_t2v_turbo_v1_lora.py:416-435) via `frame_chunk`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import group_norm
from .layers import GroupNorm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """ddconfig of configs/inference_t2v_512_v2.0.yaml (first_stage_config)."""

    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True
    scale_factor: float = 0.18215


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm(32, eps=1e-6, act="silu", name="norm1")(x)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv1",
        )(h)
        h = GroupNorm(32, eps=1e-6, act="silu", name="norm2")(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv2",
        )(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head bottleneck self-attention over H·W
    (reference ae_modules.py:29-73)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hn = GroupNorm(32, eps=1e-6, name="norm")(x)
        # 1x1 convs == per-pixel Dense
        q = nn.Dense(c, dtype=self.dtype, name="q")(hn).reshape(n, h * w, 1, c)
        k = nn.Dense(c, dtype=self.dtype, name="k")(hn).reshape(n, h * w, 1, c)
        v = nn.Dense(c, dtype=self.dtype, name="v")(hn).reshape(n, h * w, 1, c)
        # same dispatcher as the UNet (flash for long S, XLA einsum below
        # the threshold): avoids materializing the (N, HW, HW) f32 logits
        # (420 MB at 16 frames of 320x512)
        from ..ops.attention import sdpa_bshd

        out = sdpa_bshd(q, k, v, scale=c**-0.5).reshape(n, h, w, c)
        return x + nn.Dense(c, dtype=self.dtype, name="proj_out")(out)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(
            cfg.ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_in",
        )(x)
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(
                    cfg.ch * mult, dtype=self.dtype, name=f"down_{level}_block_{i}"
                )(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1)x(0,1) + stride-2 valid conv
                # (reference ae_modules.py:87-105)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_{level}_downsample",
                )(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm(32, eps=1e-6, act="silu", name="norm_out")(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(
            out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_out",
        )(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(
            block_in, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_in",
        )(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(
                    out_ch, dtype=self.dtype, name=f"up_{level}_block_{i}"
                )(h)
            if level != 0:
                n, hh, ww, c = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(
                    c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name=f"up_{level}_upsample",
                )(h)
        h = GroupNorm(32, eps=1e-6, act="silu", name="norm_out")(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_out",
        )(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z) -> image. Frames fold into batch.
    (reference lvdm/models/autoencoder.py:13-113, distributions.py:24-73)."""

    cfg: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Dense(2 * self.cfg.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.cfg.embed_dim, dtype=self.dtype)

    def encode(self, x) -> tuple[jax.Array, jax.Array]:
        """x: (N, H, W, 3) in [-1, 1] -> posterior (mean, logvar), each
        (N, H/8, W/8, z)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return self.decode(z), mean, logvar


def posterior_kl(mean, logvar, other_mean=None, other_logvar=None):
    """KL of the diagonal-Gaussian posterior, reduced over all non-batch axes
    (reference lvdm/distributions.py:44-61). Against N(0, I) when `other_*`
    is None, else against another diagonal Gaussian."""
    axes = tuple(range(1, mean.ndim))
    if other_mean is None:
        return 0.5 * jnp.sum(
            jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar, axis=axes
        )
    return 0.5 * jnp.sum(
        jnp.square(mean - other_mean) * jnp.exp(-other_logvar)
        + jnp.exp(logvar - other_logvar)
        - 1.0
        - logvar
        + other_logvar,
        axis=axes,
    )


def posterior_nll(mean, logvar, sample, axes=None):
    """Negative log-likelihood of `sample` under the diagonal-Gaussian
    posterior (reference lvdm/distributions.py:63-70)."""
    if axes is None:
        axes = tuple(range(1, mean.ndim))
    log2pi = jnp.log(2.0 * jnp.pi)
    return 0.5 * jnp.sum(
        log2pi + logvar + jnp.square(sample - mean) * jnp.exp(-logvar),
        axis=axes,
    )


def encode_video(
    vae: AutoencoderKL,
    params,
    video: jax.Array,  # (B, T, H, W, 3)
    key: Optional[jax.Array] = None,
    scale_factor: float = 0.18215,
    frame_chunk: Optional[int] = None,
) -> jax.Array:
    """Per-frame 2DAE encode -> scaled latents (B, T, H/8, W/8, z).
    Sampling uses the posterior when `key` given, else the mean (the
    reference samples; mode is deterministic eval)."""
    b, t, h, w, c = video.shape
    frames = video.reshape(b * t, h, w, c)

    def enc(fr):
        mean, logvar = vae.apply(params, fr, method=vae.encode)
        return mean, logvar

    if frame_chunk and frame_chunk < b * t:
        n = b * t
        chunks = [
            enc(frames[i : i + frame_chunk]) for i in range(0, n, frame_chunk)
        ]
        mean = jnp.concatenate([m for m, _ in chunks])
        logvar = jnp.concatenate([lv for _, lv in chunks])
    else:
        mean, logvar = enc(frames)
    z = mean
    if key is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
    z = scale_factor * z
    return z.reshape(b, t, *z.shape[1:])


def decode_video(
    vae: AutoencoderKL,
    params,
    latents: jax.Array,  # (B, T, h, w, z)
    scale_factor: float = 0.18215,
    frame_chunk: Optional[int] = None,
) -> jax.Array:
    """Per-frame 2DAE decode -> video (B, T, H, W, 3) in [-1, 1]
    (reference decode_first_stage_2DAE, ddpm3d.py:667-679)."""
    b, t, h, w, z = latents.shape
    frames = latents.reshape(b * t, h, w, z) / scale_factor

    def dec(fr):
        return vae.apply(params, fr, method=vae.decode)

    if frame_chunk and frame_chunk < b * t:
        n = b * t
        out = jnp.concatenate(
            [dec(frames[i : i + frame_chunk]) for i in range(0, n, frame_chunk)]
        )
    else:
        out = dec(frames)
    return out.reshape(b, t, *out.shape[1:])
