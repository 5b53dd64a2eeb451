"""Ancestral DDPM sampling: q-posterior math and the p_sample loop.

Rebuilds the reference's base-model sampling path
(lvdm/models/ddpm3d.py:267-283 predict_start_from_noise/q_posterior,
:680-765 p_mean_variance/p_sample, :765-833 p_sample_loop) as pure
functions over a `DiffusionSchedule`. TPU-first: the whole reverse chain is
one `lax.scan` inside jit — per-step Python iteration (the reference's tqdm
loop) would dispatch T separate programs.

The derived tables (sqrt-recip alphas, posterior coefficients) are computed
from the schedule's base tables on the fly; under jit they constant-fold,
so there is no extra runtime cost versus the reference's register_buffer
approach, and `DiffusionSchedule` stays minimal.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule, extract


class PosteriorTables(NamedTuple):
    """q(x_{t-1} | x_t, x_0) coefficient tables, each shape (T,).

    Cf. reference lvdm/models/ddpm3d.py:174-194 (register_schedule): the
    posterior variance optionally interpolates toward beta_t via
    `v_posterior` (0.0 in every shipped config)."""

    mean_coef1: jax.Array  # on x_0
    mean_coef2: jax.Array  # on x_t
    variance: jax.Array
    log_variance_clipped: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array


def posterior_tables(
    sched: DiffusionSchedule, v_posterior: float = 0.0
) -> PosteriorTables:
    betas = sched.betas
    abar = sched.alphas_cumprod
    abar_prev = jnp.concatenate([jnp.ones((1,), abar.dtype), abar[:-1]])
    var = (1.0 - v_posterior) * betas * (1.0 - abar_prev) / (
        1.0 - abar
    ) + v_posterior * betas
    return PosteriorTables(
        mean_coef1=betas * jnp.sqrt(abar_prev) / (1.0 - abar),
        mean_coef2=(1.0 - abar_prev) * jnp.sqrt(1.0 - betas) / (1.0 - abar),
        variance=var,
        log_variance_clipped=jnp.log(jnp.maximum(var, 1e-20)),
        sqrt_recip_alphas_cumprod=jnp.sqrt(1.0 / abar),
        sqrt_recipm1_alphas_cumprod=jnp.sqrt(1.0 / abar - 1.0),
    )


def predict_start_from_noise(
    tabs: PosteriorTables, x_t: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """x_0 estimate from an eps prediction (ddpm3d.py:267-272)."""
    nd = x_t.ndim
    return (
        extract(tabs.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(tabs.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def q_posterior(
    tabs: PosteriorTables, x_start: jax.Array, x_t: jax.Array, t: jax.Array
):
    """Mean / variance / clipped-log-variance of q(x_{t-1} | x_t, x_0)
    (ddpm3d.py:274-283)."""
    nd = x_t.ndim
    mean = (
        extract(tabs.mean_coef1, t, nd) * x_start
        + extract(tabs.mean_coef2, t, nd) * x_t
    )
    return mean, extract(tabs.variance, t, nd), extract(
        tabs.log_variance_clipped, t, nd
    )


def p_mean_variance(
    tabs: PosteriorTables,
    model_out: jax.Array,
    x: jax.Array,
    t: jax.Array,
    parameterization: str = "eps",
    clip_denoised: bool = False,
):
    """Posterior parameters given a model output (ddpm3d.py:680-717)."""
    if parameterization == "eps":
        x_recon = predict_start_from_noise(tabs, x, t, model_out)
    elif parameterization == "x0":
        x_recon = model_out
    else:
        raise NotImplementedError(parameterization)
    if clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    mean, var, logvar = q_posterior(tabs, x_recon, x, t)
    return mean, var, logvar, x_recon


def p_sample(
    tabs: PosteriorTables,
    key: jax.Array,
    model_out: jax.Array,
    x: jax.Array,
    t: jax.Array,
    parameterization: str = "eps",
    clip_denoised: bool = False,
    temperature: float = 1.0,
):
    """One ancestral step x_t -> x_{t-1} (ddpm3d.py:719-765): posterior mean
    plus exp(0.5 * logvar) * noise, with the noise zeroed at t == 0."""
    mean, _, logvar, x_recon = p_mean_variance(
        tabs, model_out, x, t, parameterization, clip_denoised
    )
    noise = jax.random.normal(key, x.shape, x.dtype) * temperature
    nonzero = extract((jnp.arange(tabs.variance.shape[0]) > 0).astype(x.dtype),
                      t, x.ndim)
    return mean + nonzero * jnp.exp(0.5 * logvar) * noise, x_recon


def p_sample_loop(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    sched: DiffusionSchedule,
    x_T: jax.Array,
    key: jax.Array,
    timesteps: Optional[int] = None,
    parameterization: str = "eps",
    clip_denoised: bool = False,
    temperature: float = 1.0,
    v_posterior: float = 0.0,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
) -> jax.Array:
    """Full reverse chain t = timesteps-1 .. 0 as one `lax.scan`
    (ddpm3d.py:765-833, minus the host-side callbacks/intermediates — stack
    outputs outside if intermediates are wanted).

    `model_fn(x, t_batch) -> model_out` is the denoiser with conditioning
    already closed over (the reference threads `cond` through apply_model;
    here a partial application keeps this loop model-agnostic).

    `mask`/`x0` (given together) enable the reference's inpainting blend
    (ddpm3d.py:814-821): after each step, mask==1 regions are replaced by
    `x0` re-noised to the current timestep, so only mask==0 regions are
    generated."""
    if (mask is None) != (x0 is None):
        raise ValueError("mask and x0 must be given together")
    T = timesteps if timesteps is not None else sched.num_timesteps
    b = x_T.shape[0]
    tabs = posterior_tables(sched, v_posterior)

    def step(carry, t_scalar):
        x, k = carry
        k, sub = jax.random.split(k)
        tb = jnp.full((b,), t_scalar, jnp.int32)
        x, _ = p_sample(
            tabs, sub, model_fn(x, tb), x, tb,
            parameterization, clip_denoised, temperature,
        )
        if mask is not None:
            from .schedule import q_sample

            k, kq = jax.random.split(k)
            noise = jax.random.normal(kq, x.shape, x.dtype)
            x_orig = q_sample(sched, x0, tb, noise)
            x = x_orig * mask + (1.0 - mask) * x
        return (x, k), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(step, (x_T, key), ts)
    return x
