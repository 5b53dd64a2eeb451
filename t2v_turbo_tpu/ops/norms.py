"""Normalization ops (channels-last).

GroupNorm is computed in float32 regardless of input dtype — the reference's
GroupNorm32 semantics (reference lvdm/basics.py:75-86) — then cast back, so
bf16 activations don't lose normalization precision on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over the trailing channel axis of an (..., C) tensor.

    All leading axes are treated as batch/spatial; statistics are computed per
    group over (spatial..., C/G) exactly like torch GroupNorm on NCHW.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    lead = x.shape[:1]  # batch
    spatial = x.shape[1:-1]
    xf = x.astype(jnp.float32).reshape(lead + (-1, num_groups, c // num_groups))
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(lead + spatial + (c,))
    return (xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        orig_dtype
    )


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        orig_dtype
    )
