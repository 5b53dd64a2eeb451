"""Latent consistency distillation (LCD) — the v1 trainer's core math as a
pure, pjit-able step function.

Rebuild of the reference per-step computation
(train_t2v_turbo_v1_lora.py:978-1196): sample a DDIM grid index, noise the
clean latents to t_{n+k}, run the student with a random guidance-scale
embedding, form the boundary-condition prediction, run the frozen teacher
cond/uncond for a CFG estimate, take one DDIM step, evaluate the student on
x_prev without grad, and regress huber(model_pred, target).

TPU-first differences from the reference:
- one SPMD program instead of heterogeneous rank roles: the reward terms are
  per-example *masked* losses (reference assigned whole ranks to loss types,
  train_t2v_turbo_v1_lora.py:218-234 — see SURVEY.md §2.9.2),
- explicit RNG keys, no global generator,
- the teacher/target forwards are `stop_gradient` islands inside one program,
  letting XLA overlap them with the student backward.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion import (
    DDIMSolver,
    DiffusionSchedule,
    guidance_scale_embedding,
)
from ..diffusion.lcm import (
    predicted_noise,
    predicted_origin,
    scalings_for_boundary_conditions,
)
from ..diffusion.schedule import add_noise, bcast_right


@dataclasses.dataclass(frozen=True)
class LCDConfig:
    num_ddim_timesteps: int = 50
    w_min: float = 5.0
    w_max: float = 15.0
    w_embedding_dim: int = 256
    timestep_scaling: float = 10.0
    prediction_type: str = "epsilon"
    loss_type: str = "huber"  # 'huber' | 'l2'
    huber_c: float = 0.001
    reward_scale: float = 1.0
    video_reward_scale: float = 1.0


def lcd_loss(
    student_params,
    batch: dict,
    key: jax.Array,
    *,
    student_apply: Callable,
    teacher_apply: Callable,
    teacher_params,
    sched: DiffusionSchedule,
    solver: DDIMSolver,
    cfg: LCDConfig,
    reward_fn: Optional[Callable] = None,
    video_reward_fn: Optional[Callable] = None,
):
    """Compute the combined LCD + reward loss for one batch.

    batch:
      latents:     (B, T, h, w, C) clean VAE latents (already scaled)
      ctx:         (B, L, D) prompt embeddings
      uncond_ctx:  (B, L, D) empty-prompt embeddings
      fps:         (B,)
      reward_mask / video_reward_mask: optional (B,) {0,1} role masks
    Returns (total_loss, metrics_dict).
    """
    latents = batch["latents"].astype(jnp.float32)
    ctx = batch["ctx"]
    uncond_ctx = batch["uncond_ctx"]
    fps = batch.get("fps")
    b = latents.shape[0]
    nd = latents.ndim

    k_idx, k_noise, k_w = jax.random.split(key, 3)

    # 2. random DDIM grid index -> (start_timesteps, timesteps)
    index = jax.random.randint(k_idx, (b,), 0, cfg.num_ddim_timesteps)
    start_timesteps = solver.index_to_timestep(index)
    timesteps = jnp.maximum(start_timesteps - solver.step_ratio, 0)

    # 3. boundary scalings at both ends
    c_skip_s, c_out_s = scalings_for_boundary_conditions(
        start_timesteps, timestep_scaling=cfg.timestep_scaling
    )
    c_skip_s, c_out_s = bcast_right(c_skip_s, nd), bcast_right(c_out_s, nd)
    c_skip, c_out = scalings_for_boundary_conditions(
        timesteps, timestep_scaling=cfg.timestep_scaling
    )
    c_skip, c_out = bcast_right(c_skip, nd), bcast_right(c_out, nd)

    # 4. forward diffusion to t_{n+k}
    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    noisy = add_noise(sched, latents, noise, start_timesteps)

    # 5. guidance scale w ~ U[w_min, w_max]
    w = cfg.w_min + (cfg.w_max - cfg.w_min) * jax.random.uniform(k_w, (b,))
    w_emb = guidance_scale_embedding(w, cfg.w_embedding_dim)
    w_b = bcast_right(w, nd)

    # 7. online student prediction at t_{n+k}
    noise_pred = student_apply(
        student_params, noisy, start_timesteps, ctx, fps=fps, timestep_cond=w_emb
    ).astype(jnp.float32)
    pred_x0 = predicted_origin(
        noise_pred, start_timesteps, noisy, cfg.prediction_type, sched
    )
    model_pred = c_skip_s * noisy + c_out_s * pred_x0

    # 8. teacher CFG estimate + one DDIM step (no-grad island).
    # cond/uncond deliberately run as TWO separate forwards: the batched
    # single-pass variant was built and MEASURED SLOWER on v5e
    # (1069 vs 986 ms/step full size — the UNet's HBM-bound ops scale
    # linearly with batch while tiling gets worse; same effect as
    # PERF_NOTES r1 #3 where per-video cost rises with batch).
    def teacher_branch():
        cond = teacher_apply(
            teacher_params, noisy, start_timesteps, ctx, fps=fps
        ).astype(jnp.float32)
        uncond = teacher_apply(
            teacher_params, noisy, start_timesteps, uncond_ctx, fps=fps
        ).astype(jnp.float32)
        cx0 = predicted_origin(cond, start_timesteps, noisy, cfg.prediction_type, sched)
        ceps = predicted_noise(cond, start_timesteps, noisy, cfg.prediction_type, sched)
        ux0 = predicted_origin(uncond, start_timesteps, noisy, cfg.prediction_type, sched)
        ueps = predicted_noise(uncond, start_timesteps, noisy, cfg.prediction_type, sched)
        px0 = cx0 + w_b * (cx0 - ux0)
        peps = ceps + w_b * (ceps - ueps)
        return solver.ddim_step(px0, peps, index)

    x_prev = jax.lax.stop_gradient(teacher_branch())

    # 9. target LCM prediction at t_n (no-grad through the student)
    def target_branch():
        tgt_pred = student_apply(
            student_params, x_prev, timesteps, ctx, fps=fps, timestep_cond=w_emb
        ).astype(jnp.float32)
        tx0 = predicted_origin(tgt_pred, timesteps, x_prev, cfg.prediction_type, sched)
        return c_skip * x_prev + c_out * tx0

    target = jax.lax.stop_gradient(target_branch())

    # 10. distillation loss
    if cfg.loss_type == "l2":
        distill = jnp.mean((model_pred - target) ** 2)
    else:
        distill = jnp.mean(
            jnp.sqrt((model_pred - target) ** 2 + cfg.huber_c**2) - cfg.huber_c
        )

    metrics = {"distill_loss": distill}
    total = distill

    # reward terms — role-as-data: per-example masks select which examples
    # contribute, all inside one SPMD program
    if reward_fn is not None:
        mask = batch.get("reward_mask", jnp.ones((b,)))
        r = reward_fn(model_pred, batch)  # (B,) rewards
        reward_loss = -(r * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        reward_loss = reward_loss * cfg.reward_scale
        metrics["reward_loss"] = reward_loss
        total = total + reward_loss
    if video_reward_fn is not None:
        mask = batch.get("video_reward_mask", jnp.ones((b,)))
        r = video_reward_fn(model_pred, batch)
        vloss = -(r * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        vloss = vloss * cfg.video_reward_scale
        metrics["video_rm_loss"] = vloss
        total = total + vloss

    metrics["loss"] = total
    return total, metrics


def make_train_step(
    optimizer,
    *,
    student_apply: Callable,
    teacher_apply: Callable,
    sched: DiffusionSchedule,
    solver: DDIMSolver,
    cfg: LCDConfig,
    reward_fn: Optional[Callable] = None,
    video_reward_fn: Optional[Callable] = None,
    max_grad_norm: float = 10.0,
):
    """Returns a pure train_step(params, opt_state, teacher_params, batch, key)
    -> (params, opt_state, metrics), ready for jit/pjit with sharded batches.
    """
    import optax

    def train_step(params, opt_state, teacher_params, batch, key):
        (loss, metrics), grads = jax.value_and_grad(lcd_loss, has_aux=True)(
            params,
            batch,
            key,
            student_apply=student_apply,
            teacher_apply=teacher_apply,
            teacher_params=teacher_params,
            sched=sched,
            solver=solver,
            cfg=cfg,
            reward_fn=reward_fn,
            video_reward_fn=video_reward_fn,
        )
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = gnorm
        return params, opt_state, metrics

    return train_step
