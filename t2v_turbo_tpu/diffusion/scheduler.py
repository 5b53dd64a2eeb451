"""LCM multistep inference scheduler (the T2VTurboScheduler equivalent).

TPU-first design: instead of a stateful scheduler object with `set_timesteps`
mutating Python attributes (reference scheduler/t2v_turbo_scheduler.py:323-355),
timestep selection is a host-side pure function returning a static numpy array,
and `step` is a pure array function suitable for use inside `lax.scan`: noise
is passed explicitly (explicit `jax.random` threading) and the "previous
timestep" is an array argument, so the whole 4..16-step sampling loop compiles
to one XLA program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .lcm import predicted_origin, scalings_for_boundary_conditions
from .schedule import DiffusionSchedule, extract


def lcm_timesteps(
    num_inference_steps: int,
    lcm_origin_steps: int = 50,
    num_train_timesteps: int = 1000,
) -> np.ndarray:
    """LCM inference timestep subsampling (descending int64 array).

    Linear spacing over the LCM training grid, then stride-subsampled from the
    end. Matches reference scheduler/t2v_turbo_scheduler.py:345-355.
    """
    if num_inference_steps > num_train_timesteps:
        raise ValueError(
            f"num_inference_steps {num_inference_steps} > train timesteps "
            f"{num_train_timesteps}"
        )
    c = num_train_timesteps // lcm_origin_steps
    origin = np.arange(1, lcm_origin_steps + 1, dtype=np.int64) * c - 1
    skip = len(origin) // num_inference_steps
    return origin[::-skip][:num_inference_steps].copy()


@dataclasses.dataclass(frozen=True)
class LCMScheduler:
    """Thin functional wrapper bundling a schedule with LCM step math.

    prediction_type: 'epsilon' | 'sample' | 'v_prediction'
    (reference t2v_turbo_scheduler.py:437-444).
    """

    schedule: DiffusionSchedule
    prediction_type: str = "epsilon"
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    init_noise_sigma: float = 1.0

    def timesteps(self, num_inference_steps: int, lcm_origin_steps: int = 50):
        return lcm_timesteps(
            num_inference_steps, lcm_origin_steps, self.schedule.num_timesteps
        )

    def step(
        self,
        model_output: jax.Array,
        timestep: jax.Array,
        prev_timestep: jax.Array,
        sample: jax.Array,
        noise: jax.Array | None = None,
    ):
        """One LCM denoise+renoise step.

        timestep / prev_timestep: scalar int arrays (prev_timestep == timestep
        on the final step, matching reference t2v_turbo_scheduler.py:413-418).
        `noise` must be provided for multistep sampling and None for the final
        (or single-step) case — the caller owns RNG.

        Returns (prev_sample, denoised). Cf. reference
        t2v_turbo_scheduler.py:367-467.
        """
        sched = self.schedule
        nd = sample.ndim
        t_b = jnp.reshape(timestep, (1,))
        pred_x0 = predicted_origin(
            model_output, t_b, sample, self.prediction_type, sched
        )
        c_skip, c_out = scalings_for_boundary_conditions(
            timestep, self.sigma_data, self.timestep_scaling
        )
        denoised = c_out * pred_x0 + c_skip * sample

        if noise is None:
            return denoised, denoised

        alpha_prev = extract(sched.alphas_cumprod, jnp.reshape(prev_timestep, (1,)), nd)
        prev_sample = (
            jnp.sqrt(alpha_prev) * denoised + jnp.sqrt(1.0 - alpha_prev) * noise
        )
        return prev_sample, denoised
