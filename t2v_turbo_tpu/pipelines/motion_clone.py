"""MotionClone-style training-free motion transfer sampling.

Rebuild of reference motion_prior_sample.py:87-300: DDIM-invert a reference
video, then run guided DDIM sampling where, inside the top timestep band,
the noise estimate is corrected by the gradient of the temporal-attention
rank loss (and optionally an image-reward gradient):

    eps <- eps_cfg - (1 - sqrt(abar_t))**0.5 * (score_motion + score_reward)

The per-step score needs attention-prob capture, so the loop is host-driven
over jitted pieces (inversion and each guided step are jitted; the band
structure is static).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import DDIMSolver, DiffusionSchedule
from ..diffusion.lcm import predicted_origin, predicted_noise as pred_noise_of
from ..diffusion.schedule import extract
from ..training.motion import motion_prior_score, reverse_ddim_loop


@dataclasses.dataclass(frozen=True)
class MotionCloneConfig:
    num_ddim_timesteps: int = 50
    guidance_scale: float = 7.5
    percentage: float = 0.3  # top band where motion guidance applies
    temp_loss_scale: float = 100.0
    rank_k: int = 1
    reward_scale: float = 0.0  # >0 enables reward-gradient guidance


def motion_transfer_sample(
    *,
    unet_apply: Callable,  # (params, z, ts, ctx, fps=None) -> eps
    unet_apply_mutable: Callable,  # record_probs variant
    params,
    ref_latents: jax.Array,  # (1, T, h, w, C) clean latents of the reference video
    original_ctx: jax.Array,  # reference-video prompt embedding
    inference_ctx: jax.Array,  # generation prompt embedding
    uncond_ctx: jax.Array,
    sched: DiffusionSchedule,
    solver: DDIMSolver,
    cfg: MotionCloneConfig,
    fps=None,
    reward_grad_fn: Optional[Callable] = None,  # (latents, ts) -> d(reward)/dz
    return_trace: bool = False,
):
    """Returns the final denoised latents (1, T, h, w, C).

    return_trace=True returns (latents, trace) where trace["motion_loss"]
    is the UNSCALED rank loss at each in-band step, measured at the
    pre-update latents — the motion statistic the guidance is descending,
    observable without re-running the capture forward."""
    n = cfg.num_ddim_timesteps
    b = ref_latents.shape[0]
    nd = ref_latents.ndim

    # 1. invert the reference video across the full grid
    inter = reverse_ddim_loop(
        unet_apply, params, ref_latents.astype(jnp.float32), original_ctx,
        solver, num_steps=n, fps=fps,
    )
    latents = inter[-1]

    band_lo = (1.0 - cfg.percentage) * n

    def update(z, ts, index, cond_eps, uncond_eps, score):
        w = cfg.guidance_scale
        eps = cond_eps + w * (cond_eps - uncond_eps)
        cond_x0 = predicted_origin(cond_eps, ts, z, "epsilon", sched)
        uncond_x0 = predicted_origin(uncond_eps, ts, z, "epsilon", sched)
        x0 = cond_x0 + w * (cond_x0 - uncond_x0)
        # guidance correction (reference motion_prior_sample.py:283-292;
        # alpha_schedule there is sqrt(abar))
        sqrt_abar = extract(sched.sqrt_alphas_cumprod, ts, nd)
        eps = eps - jnp.sqrt(1.0 - sqrt_abar) * score
        return solver.ddim_step(x0, eps, index)

    # Two jitted step programs compiled ONCE and reused across the loop
    # (the in-band step is a full teacher fwd+bwd — eager it dispatches
    # op-by-op every step; reward_grad_fn must be traceable jax code).
    # temp_loss_scale rides in as a TRACED operand, not a baked constant,
    # so sweeping the scale (ablations, the effectiveness tests) replays
    # one cached XLA program instead of recompiling the teacher fwd+bwd.
    @jax.jit
    def motion_step(p, z, ts, index, z_example, temp_loss_scale):
        score, cond_eps, raw_loss = motion_prior_score(
            unet_apply_mutable, p, z, ts, z_example,
            original_ctx, inference_ctx, fps=fps,
            temp_loss_scale=temp_loss_scale, rank_k=cfg.rank_k,
            return_loss=True,
        )
        uncond_eps = unet_apply(p, z, ts, uncond_ctx, fps=fps).astype(
            jnp.float32
        )
        if reward_grad_fn is not None and cfg.reward_scale > 0:
            score = score + cfg.reward_scale * reward_grad_fn(z, ts)
        return update(z, ts, index, cond_eps, uncond_eps, score), raw_loss

    @jax.jit
    def plain_step(p, z, ts, index):
        cond_eps = unet_apply(p, z, ts, inference_ctx, fps=fps).astype(
            jnp.float32
        )
        uncond_eps = unet_apply(p, z, ts, uncond_ctx, fps=fps).astype(
            jnp.float32
        )
        return update(z, ts, index, cond_eps, uncond_eps,
                      jnp.zeros_like(z))

    # 2. guided DDIM sampling from high noise to low (host loop: the band
    # structure is static, each iteration is one jitted dispatch)
    motion_losses = []
    for i in reversed(range(n)):
        index = jnp.full((b,), i, jnp.int32)
        ts = solver.index_to_timestep(index)
        if i >= band_lo:
            latents, raw_loss = motion_step(
                params, latents, ts, index, inter[i],
                jnp.float32(cfg.temp_loss_scale),
            )
            motion_losses.append(raw_loss)
        else:
            latents = plain_step(params, latents, ts, index)

    # after the final grid step latents sit at the alpha_cumprods[0] level —
    # effectively the clean sample (reference decodes them directly, :299)
    if return_trace:
        return latents, {"motion_loss": np.asarray(motion_losses)}
    return latents
