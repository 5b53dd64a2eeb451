"""v2: full-model latent consistency post-training on precomputed teacher
outputs, with motion-prior guidance and an optional EMA target network.

Rebuild of reference train_latent_t2v_turbo_v2.py:978-1270: the teacher never
runs at train time — batches carry {index, z_t, cond_teacher_out,
uncond_teacher_out, score, prompt_emb, use_motion_guide} produced by the
offline preprocess jobs (see training/preprocess.py). The CFG estimate is
derived from the stored outputs, the motion-prior score is subtracted from
the CFG noise inside the top `percentage` timestep band, one DDIM step gives
x_prev, and the target comes from the EMA net (or the online student)
without grad.

Faithful quirk: the guidance scale factor is (1 - sqrt(alpha_bar_t))**0.5 —
the reference gathers from alpha_schedule = sqrt(alphas_cumprod) and then
applies (1-.)**0.5 (train_latent_t2v_turbo_v2.py:705,1213-1226).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion import DDIMSolver, DiffusionSchedule, guidance_scale_embedding
from ..diffusion.lcm import (
    predicted_noise,
    predicted_origin,
    scalings_for_boundary_conditions,
)
from ..diffusion.schedule import bcast_right, extract


@dataclasses.dataclass(frozen=True)
class LCDV2Config:
    num_ddim_timesteps: int = 50
    w_min: float = 5.0
    w_max: float = 15.0
    w_embedding_dim: int = 256
    timestep_scaling: float = 10.0
    prediction_type: str = "epsilon"
    loss_type: str = "huber"
    huber_c: float = 0.001
    motion_gs: float = 0.05
    percentage: float = 0.3  # top timestep band for motion guidance
    use_motion_cond: bool = False  # feed motion_gs embedding into the UNet
    reward_scale: float = 1.0
    video_reward_scale: float = 1.0


def lcd_v2_loss(
    student_params,
    batch: dict,
    key: jax.Array,
    *,
    student_apply: Callable,
    target_params=None,  # EMA target UNet params (None -> online student)
    target_apply: Optional[Callable] = None,
    sched: DiffusionSchedule,
    solver: DDIMSolver,
    cfg: LCDV2Config,
    reward_fn: Optional[Callable] = None,
    video_reward_fn: Optional[Callable] = None,
):
    """batch fields (all (B, ...)): index int, z_t, cond_teacher_out,
    uncond_teacher_out, score, prompt_emb, use_motion_guide bool, fps."""
    z_t = batch["z_t"].astype(jnp.float32)
    index = batch["index"].astype(jnp.int32)
    ctx = batch["prompt_emb"]
    fps = batch.get("fps")
    b = z_t.shape[0]
    nd = z_t.ndim

    start_timesteps = solver.index_to_timestep(index)
    timesteps = jnp.maximum(start_timesteps - solver.step_ratio, 0)

    c_skip_s, c_out_s = scalings_for_boundary_conditions(
        start_timesteps, timestep_scaling=cfg.timestep_scaling
    )
    c_skip_s, c_out_s = bcast_right(c_skip_s, nd), bcast_right(c_out_s, nd)
    c_skip, c_out = scalings_for_boundary_conditions(
        timesteps, timestep_scaling=cfg.timestep_scaling
    )
    c_skip, c_out = bcast_right(c_skip, nd), bcast_right(c_out, nd)

    k_w, _ = jax.random.split(key)
    w = cfg.w_min + (cfg.w_max - cfg.w_min) * jax.random.uniform(k_w, (b,))
    w_emb = guidance_scale_embedding(w, cfg.w_embedding_dim)
    w_b = bcast_right(w, nd)

    # motion-guidance gating: use_motion_guide AND index in top band
    use_mg = batch.get("use_motion_guide", jnp.ones((b,), bool))
    in_band = index >= (1.0 - cfg.percentage) * cfg.num_ddim_timesteps
    gate = jnp.logical_and(use_mg, in_band)
    motion_gs = jnp.where(gate, cfg.motion_gs, 0.0)
    motion_cond = (
        guidance_scale_embedding(motion_gs, cfg.w_embedding_dim)
        if cfg.use_motion_cond
        else None
    )

    # 7. online student prediction
    noise_pred = student_apply(
        student_params,
        z_t,
        start_timesteps,
        ctx,
        fps=fps,
        timestep_cond=w_emb,
        motion_cond=motion_cond,
    ).astype(jnp.float32)
    pred_x0 = predicted_origin(
        noise_pred, start_timesteps, z_t, cfg.prediction_type, sched
    )
    model_pred = c_skip_s * z_t + c_out_s * pred_x0

    # 8. stored-teacher CFG + motion prior + DDIM step (no-grad island)
    def teacher_branch():
        cond = batch["cond_teacher_out"].astype(jnp.float32)
        uncond = batch["uncond_teacher_out"].astype(jnp.float32)
        cx0 = predicted_origin(cond, start_timesteps, z_t, cfg.prediction_type, sched)
        ceps = predicted_noise(cond, start_timesteps, z_t, cfg.prediction_type, sched)
        ux0 = predicted_origin(uncond, start_timesteps, z_t, cfg.prediction_type, sched)
        ueps = predicted_noise(uncond, start_timesteps, z_t, cfg.prediction_type, sched)
        px0 = cx0 + w_b * (cx0 - ux0)
        peps = ceps + w_b * (ceps - ueps)
        # motion prior: peps -= gs * (1 - sqrt(abar))**0.5 * score, gated
        sqrt_abar = extract(sched.sqrt_alphas_cumprod, start_timesteps, nd)
        factor = jnp.where(
            bcast_right(gate, nd), jnp.sqrt(1.0 - sqrt_abar), 0.0
        )
        peps = peps - bcast_right(motion_gs, nd) * factor * batch["score"].astype(
            jnp.float32
        )
        return solver.ddim_step(px0, peps, index)

    x_prev = jax.lax.stop_gradient(teacher_branch())

    # 9. target from EMA net (or the online student), no grad
    t_apply = target_apply or student_apply
    t_params = target_params if target_params is not None else student_params

    def target_branch():
        tgt = t_apply(
            t_params,
            x_prev,
            timesteps,
            ctx,
            fps=fps,
            timestep_cond=w_emb,
            motion_cond=motion_cond,
        ).astype(jnp.float32)
        tx0 = predicted_origin(tgt, timesteps, x_prev, cfg.prediction_type, sched)
        return c_skip * x_prev + c_out * tx0

    target = jax.lax.stop_gradient(target_branch())

    if cfg.loss_type == "l2":
        distill = jnp.mean((model_pred - target) ** 2)
    else:
        distill = jnp.mean(
            jnp.sqrt((model_pred - target) ** 2 + cfg.huber_c**2) - cfg.huber_c
        )

    metrics = {"distill_loss": distill}
    total = distill
    if reward_fn is not None:
        mask = batch.get("reward_mask", jnp.ones((b,)))
        r = reward_fn(model_pred, batch)
        rl = -(r * mask).sum() / jnp.maximum(mask.sum(), 1.0) * cfg.reward_scale
        metrics["reward_loss"] = rl
        total = total + rl
    if video_reward_fn is not None:
        mask = batch.get("video_reward_mask", jnp.ones((b,)))
        r = video_reward_fn(model_pred, batch)
        vl = -(r * mask).sum() / jnp.maximum(mask.sum(), 1.0) * cfg.video_reward_scale
        metrics["video_rm_loss"] = vl
        total = total + vl
    metrics["loss"] = total
    return total, metrics
