"""Offline v2 data production: clean latents -> {z_t, teacher outputs,
motion-prior score} pickles.

Rebuild of reference preprocess_with_motion_prior.py:192-408 and
preprocess_no_motion_*.py: VAE-encode the clip, sample a DDIM index in the
top `max_percentage` band, noise to z_t, optionally DDIM-invert the clean
latents to the same index (the motion variant's z_example), compute teacher
cond/uncond outputs at z_t and the MotionClone score, and pickle one dict
per sample.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import DDIMSolver, DiffusionSchedule, add_noise
from .motion import motion_prior_score, reverse_ddim_loop


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    num_ddim_timesteps: int = 50
    max_percentage: float = 0.3  # sample index in the top band
    with_motion_prior: bool = True
    temp_loss_scale: float = 1.0
    rank_k: int = 1


def preprocess_sample(
    *,
    latents: jax.Array,  # (1, T, h, w, C) clean scaled latents
    prompt_emb: jax.Array,  # (1, L, D)
    uncond_emb: jax.Array,  # (1, L, D)
    key: jax.Array,
    teacher_apply: Callable,  # (params, z, ts, ctx, fps=None) -> eps
    teacher_apply_mutable: Optional[Callable],  # record_probs variant
    teacher_params,
    sched: DiffusionSchedule,
    solver: DDIMSolver,
    cfg: PreprocessConfig,
    fps=None,
    txt: str = "",
    short_txt: str = "",
) -> dict:
    """One sample -> the v2 training dict (reference
    preprocess_with_motion_prior.py:330-408)."""
    k_idx, k_noise = jax.random.split(key)
    lo = int((1.0 - cfg.max_percentage) * cfg.num_ddim_timesteps)
    index = jax.random.randint(k_idx, (1,), lo, cfg.num_ddim_timesteps)
    ts = solver.index_to_timestep(index)

    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    z_t = add_noise(sched, latents.astype(jnp.float32), noise, ts)

    use_motion = cfg.with_motion_prior and teacher_apply_mutable is not None
    if use_motion:
        # invert clean latents index+1 steps -> z_example at the same noise
        # level (reference :348-355)
        n_steps = int(index[0]) + 1
        inter = reverse_ddim_loop(
            teacher_apply, teacher_params, latents.astype(jnp.float32),
            prompt_emb, solver, num_steps=n_steps, fps=fps,
        )
        z_example = inter[-1]
        score, cond_out = motion_prior_score(
            teacher_apply_mutable, teacher_params, z_t, ts, z_example,
            prompt_emb, prompt_emb, fps=fps,
            temp_loss_scale=cfg.temp_loss_scale, rank_k=cfg.rank_k,
        )
    else:
        z_example = None
        score = jnp.zeros_like(z_t)
        cond_out = teacher_apply(
            teacher_params, z_t, ts, prompt_emb, fps=fps
        ).astype(jnp.float32)

    uncond_out = teacher_apply(
        teacher_params, z_t, ts, uncond_emb, fps=fps
    ).astype(jnp.float32)

    out = {
        "index": np.asarray(index)[0],
        "z_t": np.asarray(z_t)[0],
        "cond_teacher_out": np.asarray(cond_out)[0],
        "uncond_teacher_out": np.asarray(uncond_out)[0],
        "score": np.asarray(score)[0],
        "prompt_emb": np.asarray(prompt_emb)[0],
        "use_motion_guide": bool(use_motion),
        # raw captions ride along for the v2 reward losses and the
        # trainable-text-encoder path (reference mp4_dataset.py:127-129
        # aliases them; short_txt == "" means no short caption)
        "txt": txt,
        "short_txt": short_txt,
    }
    if z_example is not None:
        out["z_example"] = np.asarray(z_example)[0]
    return out


def save_sample(out_dir: str, name: str, sample: dict) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.pkl")
    with open(path, "wb") as f:
        pickle.dump(sample, f)
    return path
