"""Building blocks for the VideoCrafter2 3D UNet, TPU-first.

Everything is channels-last: spatial tensors are (N, H, W, C) with N = B·T,
temporal tensors are (B, T, H, W, C). Computation dtype is configurable
(bf16 for the hot path); parameters stay float32; all norms compute f32
statistics.

Functional parity targets (cited per class) are the reference modules in
lvdm/modules/attention.py and lvdm/modules/networks/openaimodel3d.py — the
structure matches so checkpoints can be imported, but the implementation is
JAX-idiomatic (no (b h) folding tricks, no in-place masking, fused attention
via ops.attention).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import group_norm, layer_norm
from ..ops.attention import attention_xla_bshd, sdpa_bshd


def silu(x):
    return jax.nn.silu(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _int8_conv(x32, w32, strides, padding, dn):
    """int8xint8->int32 MXU conv with dynamic symmetric quantization.

    Straight-through backward: int8 arrays carry no tangent in JAX, so
    without a custom VJP every gradient through this op is silently zero —
    the whole UNet below conv_in would stop learning if the T2V_INT8_CONV
    flag leaked into a training run. The VJP differentiates the float conv
    instead (the standard fake-quant/QAT estimator), so training under the
    flag is quantization-aware rather than broken."""
    # 1e-8 floor: zero-init residual tails would otherwise divide by 0
    ws = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w32 / ws), -127, 127).astype(jnp.int8)
    xs = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x8, w8, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (xs * ws).reshape(1, 1, 1, -1)


def _int8_conv_fwd(x32, w32, strides, padding, dn):
    return _int8_conv(x32, w32, strides, padding, dn), (x32, w32)


def _int8_conv_bwd(strides, padding, dn, res, g):
    x32, w32 = res
    _, vjp = jax.vjp(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, strides, padding, dimension_numbers=dn
        ),
        x32, w32,
    )
    return vjp(g)


_int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


class Int8Conv(nn.Module):
    """Drop-in nn.Conv (2D spatial) running the MXU int8 path.

    v5e's MXU multiplies int8xint8->int32 at ~2x the bf16 rate; measured at
    the production UNet conv shapes (tests_tpu/bench_int8.py, chained-loop
    timing): 0.78->0.58 ms (L0 320ch), 0.65->0.44 ms (L1 640ch),
    0.63->0.47 ms (L2 1280ch) — 25-32% per conv including the dynamic
    quantization passes, at ~1.2e-2 relative output error per conv
    (per-output-channel symmetric weight scales + per-tensor dynamic
    activation scale). Same param schema as nn.Conv ("kernel" (kh,kw,ci,co)
    f32, "bias" (co,)), so checkpoint import/export and LoRA folding are
    untouched — quantization is a compute-time transform only. Gradients
    flow via the straight-through VJP in `_int8_conv` (float-conv backward),
    so the flag cannot silently detach a training graph.

    Selected by `conv2d(...)` when T2V_INT8_CONV=1 (experimental inference
    lever, ROADMAP #3; accept/reject numbers in PERF_NOTES r5)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ci = x.shape[-1]
        w = self.param(
            "kernel", self.kernel_init, (kh, kw, ci, self.features)
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = _int8_conv(
            x.astype(jnp.float32), w.astype(jnp.float32),
            tuple(self.strides),
            self.padding if isinstance(self.padding, str)
            else tuple(tuple(p) for p in self.padding),
            dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(jnp.float32)
        return y.astype(self.dtype)


def conv2d(features, kernel_size=(3, 3), *, strides=(1, 1),
           padding=((1, 1), (1, 1)), use_bias=True,
           kernel_init=nn.initializers.lecun_normal(), dtype=jnp.float32,
           name=None):
    """Spatial conv factory: nn.Conv, or Int8Conv under T2V_INT8_CONV=1.

    The flag is read at module-construction (trace) time; both variants
    share one param schema so a single checkpoint serves either path."""
    if os.environ.get("T2V_INT8_CONV", "0") == "1":
        return Int8Conv(
            features, kernel_size=tuple(kernel_size), strides=tuple(strides),
            padding=padding, use_bias=use_bias, kernel_init=kernel_init,
            dtype=dtype, name=name,
        )
    return nn.Conv(
        features, kernel_size=kernel_size, strides=strides, padding=padding,
        use_bias=use_bias, kernel_init=kernel_init, dtype=dtype, name=name,
    )


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class GroupNorm(nn.Module):
    """GroupNorm over trailing channels with f32 statistics
    (reference lvdm/basics.py:75-86 GroupNorm32).

    `act="silu"` fuses the trailing activation into the norm — on TPU the
    dispatch in ops/norms.py folds both into one Pallas pass (one HBM
    read+write instead of XLA's convert+reduce multi-pass plus a separate
    elementwise silu on the far side of the kernel boundary)."""

    num_groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, self.num_groups, self.eps, self.act)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, self.eps)


class RelativePosition(nn.Module):
    """Learned relative-position embedding table
    (reference lvdm/modules/attention.py:24-47)."""

    num_units: int
    max_relative_position: int

    @nn.compact
    def __call__(self, length_q: int, length_k: int) -> jax.Array:
        table = self.param(
            "embeddings_table",
            nn.initializers.xavier_uniform(),
            (self.max_relative_position * 2 + 1, self.num_units),
        )
        rq = jnp.arange(length_q)[:, None]
        rk = jnp.arange(length_k)[None, :]
        dist = jnp.clip(
            rk - rq, -self.max_relative_position, self.max_relative_position
        )
        return jnp.take(table, dist + self.max_relative_position, axis=0)


class CrossAttention(nn.Module):
    """Multi-head attention with optional temporal rel-pos terms and
    attention-prob capture (reference lvdm/modules/attention.py:50-240).

    Probs are exposed via `self.sow('intermediates', 'attn_probs', p)` when
    `record_probs` — the MotionClone hook.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    relative_position: bool = False
    temporal_length: Optional[int] = None
    # image-conditioned branch (reference attention.py:78-83,151-161, used
    # by the LatentVisualDiffusion/ip_resampler variant): context rows
    # beyond `text_context_len` are image tokens attended through separate
    # to_k_ip/to_v_ip projections, added at `image_cross_attention_scale`.
    img_cross_attention: bool = False
    image_cross_attention_scale: float = 1.0
    text_context_len: int = 200
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        causal: bool = False,
        record_probs: bool = False,
        use_flash: Optional[bool] = None,
    ):
        inner = self.heads * self.dim_head
        ctx_dim = self.context_dim or self.query_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, name=name
        )
        q = dense(inner, "to_q")(x)
        ctx = x if context is None else context
        ctx_img = None
        if self.img_cross_attention:
            # the reference splits after context-defaulting, so the image
            # branch applies to whatever context the layer sees. A context
            # without appended image tokens would leave ctx_img empty and
            # softmax over zero keys emits NaN (the reference fails the
            # same way, silently — lvdm/modules/attention.py:81-83) — so
            # reject it at trace time instead.
            if ctx.shape[1] <= self.text_context_len:
                raise ValueError(
                    f"img_cross_attention=True needs image tokens appended "
                    f"beyond text_context_len={self.text_context_len}, but "
                    f"context has only {ctx.shape[1]} tokens; append image "
                    "context (models/image_cond.py append_image_context) or "
                    "build the UNet without use_image_attention."
                )
            ctx, ctx_img = (
                ctx[:, : self.text_context_len, :],
                ctx[:, self.text_context_len :, :],
            )
        k = dense(inner, "to_k")(ctx)
        v = dense(inner, "to_v")(ctx)
        if ctx_img is not None:
            k_ip = dense(inner, "to_k_ip")(ctx_img)
            v_ip = dense(inner, "to_v_ip")(ctx_img)

        b, sq, _ = q.shape
        sk = k.shape[1]
        # BSHD layout: (B, S, H, D) straight off the projection — a free
        # reshape, no head transpose in either direction (the old
        # (B,H,S,D) path paid 4-6 layout copies per attention; see
        # PERF_NOTES "BSHD-native" lever).
        split = lambda t: t.reshape(b, -1, self.heads, self.dim_head)
        q, k, v = split(q), split(k), split(v)
        scale = self.dim_head**-0.5

        if self.relative_position or record_probs:
            bias = None
            if self.relative_position:
                assert self.temporal_length is not None
                k2 = RelativePosition(
                    self.dim_head, self.temporal_length, name="relative_position_k"
                )(sq, sk)
                # logits bias: q · k2 per (query, key) position
                bias = jnp.einsum(
                    "bqhd,qkd->bhqk", q.astype(jnp.float32), k2.astype(jnp.float32)
                ) * scale
            out, probs = attention_xla_bshd(
                q, k, v, bias=bias, causal=causal, scale=scale, return_probs=True
            )
            if self.relative_position:
                v2 = RelativePosition(
                    self.dim_head, self.temporal_length, name="relative_position_v"
                )(sq, sk)
                out = out + jnp.einsum(
                    "bhqk,qkd->bqhd", probs.astype(out.dtype), v2.astype(out.dtype)
                )
            if record_probs:
                # (B·H, Sq, Sk) like the reference's attention_probs
                self.sow(
                    "intermediates",
                    "attn_probs",
                    probs.reshape(b * self.heads, sq, sk),
                )
        else:
            out = sdpa_bshd(
                q, k, v, causal=causal, scale=scale, use_flash=use_flash
            )

        if ctx_img is not None:
            out_ip = sdpa_bshd(
                q, split(k_ip), split(v_ip), causal=False, scale=scale,
                use_flash=use_flash,
            )
            out = out + self.image_cross_attention_scale * out_ip

        out = out.reshape(b, sq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class _GEGLUProj(nn.Module):
    """The GEGLU input projection with its kernel stored (C, 2, F): value
    and gate live on their own axis instead of concatenated along one 2F
    column dim. Numerically identical (one einsum on the MXU), but tensor
    parallelism can now column-split F with a plain PartitionSpec
    P(None, None, "model") — with the (C, 2F) layout the jnp.split at F
    lands mid-shard and GSPMD reshards the whole activation
    (parallel/tp.py). Importers reshape the reference's (2F, C) Linear
    weight into this layout (io/torch_import.py _geglu_lin)."""

    features: int  # F
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=0, out_axis=(1, 2)
            ),
            (c, 2, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (2, self.features))
        y = jnp.einsum(
            "...c,cgf->...gf", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        return y + bias.astype(self.dtype)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (reference lvdm/modules/attention.py:516-542)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = _GEGLUProj(inner, dtype=self.dtype, name="proj")(x)
        # torch chunk(2, dim=-1): first half is the value, second the gate
        h = h[..., 0, :] * gelu_exact(h[..., 1, :])
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LN residuals
    (reference lvdm/modules/attention.py:243-311)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    relative_position: bool = False
    temporal_length: Optional[int] = None
    # image-conditioned cross-attn on attn2 only (reference attention.py:272-278)
    img_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, context=None, causal=False, record_probs=False, use_flash=None
    ):
        attn_kw = dict(
            heads=self.n_heads,
            dim_head=self.d_head,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            dtype=self.dtype,
        )
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            name="attn1",
            **attn_kw,
        )(
            LayerNorm(name="norm1")(x),
            context=context if self.disable_self_attn else None,
            causal=causal,
            record_probs=record_probs,
            use_flash=use_flash,
        )
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            img_cross_attention=self.img_cross_attention,
            name="attn2",
            **attn_kw,
        )(
            LayerNorm(name="norm2")(x),
            context=context,
            causal=causal,
            use_flash=use_flash,
        )
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            LayerNorm(name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    """Per-frame spatial transformer on (N, H, W, C)
    (reference lvdm/modules/attention.py:314-389)."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = True
    zero_init: bool = True
    # threads the UNet's use_image_attention (reference openaimodel3d.py:490)
    img_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, use_flash=None):
        n, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm(32, eps=1e-6, name="norm")(x)
        x = x.reshape(n, h * w, c)
        # proj_in/out are 1x1 convs when use_linear=False in the reference;
        # both are Dense here (the importer reshapes conv kernels).
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner,
                self.n_heads,
                self.d_head,
                context_dim=self.context_dim,
                img_cross_attention=self.img_cross_attention,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, context=context, use_flash=use_flash)
        x = nn.Dense(
            c,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal(),
            name="proj_out",
        )(x)
        return x.reshape(n, h, w, c) + x_in


class TemporalTransformer(nn.Module):
    """Temporal transformer: attention over T per spatial position, on
    (B, T, H, W, C) (reference lvdm/modules/attention.py:392-513).

    only_self_att=True is the only mode used by the live configs; context is
    accepted but ignored in that mode.
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    only_self_att: bool = True
    relative_position: bool = False
    causal_attention: bool = False
    temporal_length: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, record_probs=False):
        b, t, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        x = GroupNorm(32, eps=1e-6, name="norm")(x)
        # (B, T, H, W, C) -> (B·H·W, T, C)
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner,
                self.n_heads,
                self.d_head,
                context_dim=None if self.only_self_att else self.context_dim,
                relative_position=self.relative_position,
                temporal_length=self.temporal_length,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(
                x,
                context=None,
                causal=self.causal_attention,
                record_probs=record_probs,
                use_flash=False,  # T <= 48: XLA path is optimal
            )
        x = nn.Dense(
            c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out"
        )(x)
        x = x.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x + x_in


class TemporalConvBlock(nn.Module):
    """Four (3,1,1) temporal conv stacks with GN+SiLU, zero-init last conv,
    identity residual (reference openaimodel3d.py:257-309). Operates on
    (B, T, H, W, C); the (3,1,1) kernel is expressed as a length-3 conv over
    T with spatial dims folded into the batch for XLA efficiency.
    """

    channels: int
    dropout: float = 0.1
    zero_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, h, w, c = x.shape
        identity = x

        def tconv(x, name, zero_init=False):
            # (B, T, H, W, C) -> (B, T, H*W, C): conv over (T,) only
            xr = x.reshape(b, t, h * w, c)
            y = nn.Conv(
                self.channels,
                kernel_size=(3, 1),
                padding=((1, 1), (0, 0)),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros
                if (zero_init and self.zero_init)
                else nn.initializers.lecun_normal(),
                name=name,
            )(xr)
            return y.reshape(b, t, h, w, self.channels)

        for i, zero in [(1, False), (2, False), (3, False), (4, True)]:
            x = GroupNorm(32, act="silu", name=f"norm{i}")(x)
            if i > 1 and self.dropout > 0 and not deterministic:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
            x = tconv(x, f"conv{i}", zero_init=zero)
        return x + identity


class Downsample(nn.Module):
    """3x3 stride-2 conv (reference openaimodel3d.py:48-79)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv2d(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="op",
        )(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv (reference openaimodel3d.py:82-112)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return conv2d(
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)


class ResBlock(nn.Module):
    """GN-SiLU-conv residual block with timestep-embedding injection and an
    optional trailing TemporalConvBlock (reference openaimodel3d.py:115-254).

    x: (N, H, W, C) with N = B·T; emb: (N, emb_channels).
    """

    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    use_temporal_conv: bool = True
    use_scale_shift_norm: bool = False
    zero_init: bool = True  # VC2 zero-inits residual tails; diffusers doesn't
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, batch_size: Optional[int] = None, deterministic=True):
        out_ch = self.out_channels or self.channels
        h = GroupNorm(32, act="silu", name="in_norm")(x)
        h = conv2d(
            out_ch,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="in_conv",
        )(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
            name="emb_proj",
        )(silu(emb))
        if self.use_scale_shift_norm:
            # FiLM scales the normalized output before the activation, so
            # the act cannot fuse into the norm here.
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = GroupNorm(32, name="out_norm")(h) * (1 + scale) + shift
            h = silu(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNorm(32, act="silu", name="out_norm")(h)
        h = conv2d(
            out_ch,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal(),
            name="out_conv",
        )(h)

        if out_ch == self.channels:
            skip = x
        else:
            skip = conv2d(
                out_ch, kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                dtype=self.dtype, name="skip_connection",
            )(x)
        h = skip + h

        if self.use_temporal_conv:
            assert batch_size is not None
            n, hh, ww, cc = h.shape
            ht = h.reshape(batch_size, n // batch_size, hh, ww, cc)
            ht = TemporalConvBlock(out_ch, dtype=self.dtype, name="temporal_conv")(
                ht, deterministic=deterministic
            )
            h = ht.reshape(n, hh, ww, cc)
        return h
