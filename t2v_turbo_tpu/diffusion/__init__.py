from .schedule import (
    DiffusionSchedule,
    add_noise,
    bcast_right,
    extract,
    get_velocity,
    make_betas,
    make_vc2_scale_arr,
    q_sample,
    rescale_zero_terminal_snr,
)
from .lcm import (
    guidance_scale_embedding,
    huber_loss,
    predicted_noise,
    predicted_origin,
    scalings_for_boundary_conditions,
    timestep_embedding,
)
from .scheduler import LCMScheduler, lcm_timesteps
from .ddim import DDIMSolver, ddim_sample_loop
from .ancestral import (
    PosteriorTables,
    p_mean_variance,
    p_sample,
    p_sample_loop,
    posterior_tables,
    predict_start_from_noise,
    q_posterior,
)

__all__ = [
    "DiffusionSchedule",
    "DDIMSolver",
    "LCMScheduler",
    "add_noise",
    "bcast_right",
    "ddim_sample_loop",
    "extract",
    "get_velocity",
    "guidance_scale_embedding",
    "huber_loss",
    "lcm_timesteps",
    "make_betas",
    "make_vc2_scale_arr",
    "PosteriorTables",
    "p_mean_variance",
    "p_sample",
    "p_sample_loop",
    "posterior_tables",
    "predict_start_from_noise",
    "predicted_noise",
    "predicted_origin",
    "q_posterior",
    "q_sample",
    "rescale_zero_terminal_snr",
    "scalings_for_boundary_conditions",
    "timestep_embedding",
]
