"""Diffusion noise schedules as immutable array tables.

TPU-first design: every schedule is a small precomputed table held in a frozen
pytree dataclass. All "gathers by timestep" happen inside jitted programs with
static table shapes, so the sampling/training loops compile to single XLA
programs (no Python-side schedule state, unlike the reference's buffer-holding
scheduler objects — cf. reference scheduler/t2v_turbo_scheduler.py:182-250 and
lvdm/models/ddpm3d.py:121-213).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    schedule: str,
    num_timesteps: int,
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    cosine_s: float = 8e-3,
    max_beta: float = 0.999,
) -> np.ndarray:
    """Beta schedule table. `scaled_linear` is the latent-diffusion schedule
    used by every T2V-Turbo config (cf. reference
    scheduler/t2v_turbo_scheduler.py:205-226, lvdm/models/utils_diffusion.py:35).
    """
    if schedule == "linear":
        betas = np.linspace(linear_start, linear_end, num_timesteps, dtype=np.float64)
    elif schedule == "scaled_linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "squaredcos_cap_v2":
        t = np.arange(num_timesteps, dtype=np.float64)

        def alpha_bar(u):
            return np.cos((u + cosine_s) / (1.0 + cosine_s) * math.pi / 2) ** 2

        t1 = t / num_timesteps
        t2 = (t + 1) / num_timesteps
        betas = np.minimum(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta)
    else:
        raise ValueError(f"unknown beta schedule: {schedule!r}")
    return betas.astype(np.float64)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas for zero terminal SNR (arXiv 2305.08891, Algorithm 1).
    Cf. reference scheduler/t2v_turbo_scheduler.py:96-126."""
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    ab_sqrt = np.sqrt(alphas_bar)
    ab0, abT = ab_sqrt[0], ab_sqrt[-1]
    ab_sqrt = (ab_sqrt - abT) * (ab0 / (ab0 - abT))
    alphas_bar = ab_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


def make_vc2_scale_arr(
    num_timesteps: int,
    scale_a: float = 1.0,
    scale_b: float = 0.7,
    mid_step: int = 400,
    fix_scale_bug: bool = False,
) -> np.ndarray:
    """VideoCrafter2 per-timestep latent scale array.

    The reference intentionally reproduces a VC2 off-by-mid_step bug: the tail
    is `num_timesteps` long instead of `num_timesteps - mid_step`, and the
    concatenated array is truncated by indexing (cf. reference
    lvdm/models/ddpm3d.py:448-456, ode_solver/ddim_solver.py:36-40). We keep
    the same semantics (first `mid_step` entries ramp a->b, rest constant b)
    and return exactly `num_timesteps` entries.
    """
    tail = num_timesteps if not fix_scale_bug else max(num_timesteps - mid_step, 0)
    arr = np.concatenate(
        [np.linspace(scale_a, scale_b, mid_step), np.full(tail, scale_b)]
    )
    return arr[:num_timesteps].astype(np.float64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All derived schedule tables, shape (T,) float32, as one pytree.

    Replaces the reference's register_buffer blocks
    (lvdm/models/ddpm3d.py:121-213) with a functional value that can be closed
    over by jitted programs or donated as an argument.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    # VC2 latent scaling (all-ones when disabled)
    scale_arr: jax.Array
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    final_alpha_cumprod: float = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        num_timesteps: int = 1000,
        beta_schedule: str = "scaled_linear",
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        rescale_betas_zero_snr: bool = False,
        set_alpha_to_one: bool = True,
        use_scale: bool = False,
        scale_a: float = 1.0,
        scale_b: float = 0.7,
        mid_step: int = 400,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = make_betas(beta_schedule, num_timesteps, linear_start, linear_end)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas_cumprod = np.cumprod(1.0 - betas)
        if use_scale:
            scale_arr = make_vc2_scale_arr(num_timesteps, scale_a, scale_b, mid_step)
        else:
            scale_arr = np.ones(num_timesteps)
        final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
        as_dt = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=as_dt(betas),
            alphas_cumprod=as_dt(alphas_cumprod),
            sqrt_alphas_cumprod=as_dt(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=as_dt(np.sqrt(1.0 - alphas_cumprod)),
            scale_arr=as_dt(scale_arr),
            num_timesteps=num_timesteps,
            final_alpha_cumprod=final,
        )


def bcast_right(x: jax.Array, ndim: int) -> jax.Array:
    """Right-broadcast a (B,) array to `ndim` dims: (B, 1, 1, ...)."""
    assert x.ndim <= ndim
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather table[t] and right-broadcast for blending with an `ndim` tensor.
    Cf. reference utils/common_utils.py:17 (`extract_into_tensor`)."""
    return bcast_right(jnp.take(table, t, axis=0), ndim)


def q_sample(
    sched: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    use_scale: bool = False,
) -> jax.Array:
    """Forward diffusion q(x_t | x_0), with optional VC2 latent scaling.
    Cf. reference lvdm/models/ddpm3d.py:499-519."""
    nd = x_start.ndim
    a = extract(sched.sqrt_alphas_cumprod, t, nd)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
    if use_scale:
        a = a * extract(sched.scale_arr, t, nd)
    return a * x_start + s * noise


def add_noise(
    sched: DiffusionSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Standard DDPM add_noise (no VC2 scale).
    Cf. reference scheduler/t2v_turbo_scheduler.py:470-495."""
    return q_sample(sched, x0, t, noise, use_scale=False)


def get_velocity(
    sched: DiffusionSchedule, sample: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v-parameterization target. Cf. reference t2v_turbo_scheduler.py:498-521."""
    nd = sample.ndim
    a = extract(sched.sqrt_alphas_cumprod, t, nd)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
    return a * noise - s * sample
