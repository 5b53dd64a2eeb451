"""Latent-consistency-model math: boundary-condition scalings, guidance-scale
Fourier embeddings, and parameterization converters.

Pure functions over arrays; used by both the inference scheduler and the
distillation trainers. Cf. reference utils/common_utils.py:47-133 and
pipeline/t2v_turbo_vc2_pipeline.py:99-120.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule, extract


def guidance_scale_embedding(
    w: jax.Array, embedding_dim: int = 512, dtype=jnp.float32
) -> jax.Array:
    """Fourier embedding of the guidance scale w (the LCM "w-embedding").

    w: (B,) guidance scales. Returns (B, embedding_dim).
    Matches reference utils/common_utils.py:47-73 (w * 1000, sin|cos halves,
    zero-pad when odd).
    """
    assert w.ndim == 1
    w = w.astype(jnp.float32) * 1000.0
    half_dim = embedding_dim // 2
    freqs = jnp.exp(
        jnp.arange(half_dim, dtype=jnp.float32) * (-math.log(10000.0) / (half_dim - 1))
    )
    emb = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def timestep_embedding(
    t: jax.Array, dim: int, max_period: int = 10000, dtype=jnp.float32
) -> jax.Array:
    """Sinusoidal timestep embedding, cos|sin ordering as used by the UNet.

    t: (B,). Returns (B, dim). Matches reference
    lvdm/models/utils_diffusion.py:8-32 (half = dim//2, freqs exp(-log(P)*i/half),
    concat [cos, sin], zero-pad odd dims).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def scalings_for_boundary_conditions(
    timestep: jax.Array, sigma_data: float = 0.5, timestep_scaling: float = 10.0
):
    """Consistency-model boundary scalings (c_skip, c_out).

    The inference scheduler's `t / 0.1` (reference
    scheduler/t2v_turbo_scheduler.py:359-365) equals timestep_scaling=10
    (reference utils/common_utils.py:87-92); one function serves both.
    """
    st = timestep_scaling * timestep.astype(jnp.float32)
    c_skip = sigma_data**2 / (st**2 + sigma_data**2)
    c_out = st / jnp.sqrt(st**2 + sigma_data**2)
    return c_skip, c_out


def predicted_origin(
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    prediction_type: str,
    sched: DiffusionSchedule,
) -> jax.Array:
    """pred_x0 from a model output under eps/sample/v parameterization.
    Cf. reference utils/common_utils.py:95-113."""
    nd = sample.ndim
    a = extract(sched.sqrt_alphas_cumprod, t, nd)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
    if prediction_type == "epsilon":
        return (sample - s * model_output) / a
    if prediction_type == "sample":
        return model_output
    if prediction_type == "v_prediction":
        return a * sample - s * model_output
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def predicted_noise(
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    prediction_type: str,
    sched: DiffusionSchedule,
) -> jax.Array:
    """pred_epsilon from a model output. Cf. reference utils/common_utils.py:116-133."""
    nd = sample.ndim
    a = extract(sched.sqrt_alphas_cumprod, t, nd)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
    if prediction_type == "epsilon":
        return model_output
    if prediction_type == "sample":
        return (sample - a * model_output) / s
    if prediction_type == "v_prediction":
        return a * model_output + s * sample
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def huber_loss(pred: jax.Array, target: jax.Array, c: float = 0.001) -> jax.Array:
    """Pseudo-huber loss used for the distillation objective.
    Cf. reference utils/common_utils.py:302-304."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + c**2) - c)
