"""Fused GroupNorm+SiLU+Conv Pallas kernel — the ResBlock hot path.

The UNet step is HBM-bound (PERF_NOTES: 73% of peak bandwidth, activation
traffic dominated) because the GN -> SiLU -> conv3x3 chain in every
ResBlock/TemporalConvBlock (reference openaimodel3d.py:115-309) materializes
the normalized tensor between the pointwise pass and the conv. This kernel
reads x from HBM ONCE and writes only the conv output:

- group statistics are reduced in XLA (one cheap read) and folded with the
  GN affine (and the optional FiLM scale/shift) into per-(N, C) a/b vectors,
  so the kernel is just  y = conv(silu(x*a + b), w) + bias;
- the conv runs as kh*kw shifted (H*W, C) @ (C, O) matmuls on the MXU from a
  zero-padded VMEM copy, one image per grid step (the largest UNet image,
  level-0 at 40x64x320, is 1.6MB — whole images fit VMEM), with the output
  channel dim tiled to bound kh*kw*C*O_t weight blocks;
- works for the spatial 3x3 convs and the (3,1) temporal convs alike.

Gradients: jax.custom_vjp whose backward replays the reference XLA
composition — training numerics are exactly the unfused path's, and under
remat nothing extra is stored.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_stats(x: jax.Array, num_groups: int, eps: float):
    """Per-(N, group) mean/rstd over all non-batch dims, f32 (the
    reference GroupNorm32 semantics, lvdm/basics.py:75-86)."""
    n = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3))
    # centered (two-pass) variance: E[(x-mean)^2]. The E[x^2]-E[x]^2 form
    # cancels catastrophically in f32 when |mean| >> std, which would make
    # the fused forward diverge from the unfused composition the custom VJP
    # replays in backward.
    var = jnp.mean(jnp.square(xf - mean[:, None, :, None]), axis=(1, 3))
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd  # (N, G)


def _gn_affine_vectors(
    x, gn_scale, gn_bias, num_groups, eps, film_scale=None, film_shift=None
):
    """Fold GN stats + affine (+ optional per-(N,C) FiLM (1+scale), shift)
    into per-(N, C) a/b:  normalized = x*a + b."""
    n = x.shape[0]
    c = x.shape[-1]
    mean, rstd = _gn_stats(x, num_groups, eps)  # (N, G)
    per_c = jnp.repeat(rstd, c // num_groups, axis=1)  # (N, C)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)
    a = per_c * gn_scale.astype(jnp.float32)[None, :]
    b = gn_bias.astype(jnp.float32)[None, :] - mean_c * a
    if film_scale is not None:
        a = a * (1.0 + film_scale.astype(jnp.float32))
        b = b * (1.0 + film_scale.astype(jnp.float32)) + film_shift.astype(
            jnp.float32
        )
    return a, b


def _fused_kernel(
    x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, xp_ref, acc_ref,
    *, kh, kw, height, width, row_chunk=8
):
    """All loops below are static (unrolled); row chunking keeps the f32
    temporaries (pointwise intermediates, matmul partials) to
    row_chunk*W-sized slabs so the scoped-VMEM stack stays small — the
    whole-image variants blew the 16MB limit at the level-0 shapes."""
    h, w = height, width
    a = a_ref[0]  # (1, C) -> broadcasts
    b = b_ref[0]
    ph, pw = kh // 2, kw // 2
    rc = min(row_chunk, h)

    if ph or pw:
        xp_ref[:] = jnp.zeros_like(xp_ref)
    for r in range(0, h, rc):
        re = min(r + rc, h)
        xr = x_ref[0, r:re].astype(jnp.float32)
        xn = xr * a + b
        xp_ref[ph + r:ph + re, pw:pw + w, :] = (
            xn * jax.nn.sigmoid(xn)
        ).astype(xp_ref.dtype)

    for di in range(kh):
        for dj in range(kw):
            wblk = w_ref[di * kw + dj]
            first = di == 0 and dj == 0
            for r in range(0, h, rc):
                re = min(r + rc, h)
                patch = xp_ref[di + r:di + re, dj:dj + w, :].reshape(
                    (re - r) * w, -1
                )
                part = jax.lax.dot_general(
                    patch, wblk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                if first:
                    acc_ref[r * w:re * w] = part
                else:
                    acc_ref[r * w:re * w] = acc_ref[r * w:re * w] + part

    bias_f = bias_ref[0].astype(jnp.float32)
    for r in range(0, h, rc):
        re = min(r + rc, h)
        out = acc_ref[r * w:re * w] + bias_f
        o_ref[0, r:re] = out.reshape(re - r, w, -1).astype(o_ref.dtype)


def _pick_o_tile(c: int, o: int, kh: int, kw: int) -> int:
    """Largest divisor of O keeping the weight block under ~4MB bf16."""
    budget = 4 * 1024 * 1024
    max_t = max(128, budget // (kh * kw * c * 2))
    if o <= max_t:
        return o
    # tiles smaller than O must be lane-aligned (divisible by 128) for the
    # Mosaic block constraint on the weight/output blocks
    for t in range(max_t - max_t % 128, 0, -128):
        if o % t == 0:
            return t
    return o


def _pick_w_tile(h: int, wd: int, c: int) -> int:
    """Width tile for kw==1 convs (no W coupling): keep the x block under
    ~2MB bf16. The temporal (3,1) conv's 'image' is (T, H*W) — 26MB at
    level 0, far over VMEM — so W MUST tile there."""
    budget = 2 * 1024 * 1024
    max_t = max(128, budget // (h * c * 2))
    for t in range(min(wd, max_t), 0, -1):
        if wd % t == 0:
            return t
    return wd


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_gn_silu_conv_impl(x, a, b, w, bias, *, interpret=False):
    n, h, wd, c = x.shape
    kh, kw, _, o = w.shape
    o_t = _pick_o_tile(c, o, kh, kw)
    w_t = _pick_w_tile(h, wd, c) if kw == 1 else wd
    wr = w.reshape(kh * kw, c, o)
    a3 = a.reshape(n, 1, c)
    b3 = b.reshape(n, 1, c)
    bias2d = bias.reshape(1, 1, o)

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, kh=kh, kw=kw, height=h, width=w_t
        ),
        grid=(n, wd // w_t, o // o_t),
        in_specs=[
            pl.BlockSpec((1, h, w_t, c), lambda i, v, j: (i, 0, v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, v, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, v, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, c, o_t), lambda i, v, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, o_t), lambda i, v, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w_t, o_t), lambda i, v, j: (i, 0, v, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + kh - 1, w_t + kw - 1, c), x.dtype),
            pltpu.VMEM((h * w_t, o_t), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(x, a3, b3, wr, bias2d)
    return out


def _reference_impl(x, gn_scale, gn_bias, w, bias, num_groups, eps,
                    film_scale=None, film_shift=None):
    """Unfused XLA composition — numerics oracle and VJP source."""
    from .norms import group_norm

    h = group_norm(x, gn_scale, gn_bias, num_groups, eps)
    if film_scale is not None:
        h = h * (1.0 + film_scale[:, None, None, :]) + film_shift[
            :, None, None, :
        ]
    h = jax.nn.silu(h)
    kh, kw = w.shape[0], w.shape[1]
    out = jax.lax.conv_general_dilated(
        h.astype(x.dtype), w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(out.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_op(x, gn_scale, gn_bias, w, bias, film_scale, film_shift,
              num_groups, eps):
    a, b = _gn_affine_vectors(
        x, gn_scale, gn_bias, num_groups, eps, film_scale, film_shift
    )
    return _fused_gn_silu_conv_impl(
        x, a, b, w, bias, interpret=not _on_tpu()
    )


def _fused_fwd(x, gn_scale, gn_bias, w, bias, film_scale, film_shift,
               num_groups, eps):
    out = _fused_op(
        x, gn_scale, gn_bias, w, bias, film_scale, film_shift, num_groups, eps
    )
    return out, (x, gn_scale, gn_bias, w, bias, film_scale, film_shift)


def _fused_bwd(num_groups, eps, res, g):
    x, gn_scale, gn_bias, w, bias, film_scale, film_shift = res
    has_film = film_scale is not None

    def ref(x, gn_scale, gn_bias, w, bias, film_scale, film_shift):
        return _reference_impl(
            x, gn_scale, gn_bias, w, bias, num_groups, eps,
            film_scale if has_film else None,
            film_shift if has_film else None,
        )

    _, vjp = jax.vjp(ref, x, gn_scale, gn_bias, w, bias, film_scale, film_shift)
    return vjp(g)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def fused_gn_silu_conv(
    x: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    conv_kernel: jax.Array,
    conv_bias: Optional[jax.Array],
    num_groups: int = 32,
    eps: float = 1e-5,
    film_scale: Optional[jax.Array] = None,
    film_shift: Optional[jax.Array] = None,
) -> jax.Array:
    """y = conv(silu(film(group_norm(x)))), fused.

    x: (N, H, W, C); conv_kernel: (kh, kw, C, O) HWIO, stride 1, SAME
    zero padding (the UNet's 3x3 spatial and (3,1) temporal convs);
    film_scale/shift: optional per-(N, C) FiLM from the timestep embedding
    (use_scale_shift_norm). Returns (N, H, W, O) in x.dtype.
    """
    if conv_bias is None:
        conv_bias = jnp.zeros((conv_kernel.shape[-1],), jnp.float32)
    if (film_scale is None) != (film_shift is None):
        raise ValueError(
            "film_scale and film_shift must be given together "
            f"(got scale={'set' if film_scale is not None else 'None'}, "
            f"shift={'set' if film_shift is not None else 'None'})"
        )
    return _fused_op(
        x, gn_scale, gn_bias, conv_kernel, conv_bias, film_scale, film_shift,
        num_groups, eps,
    )
