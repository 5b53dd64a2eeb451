"""Training-time DDIM ODE solver with VideoCrafter2 latent scaling and DDIM
inversion — the `DDIMSolver` equivalent (reference ode_solver/ddim_solver.py).

Implemented as a frozen pytree dataclass of precomputed tables + pure step
functions, so the solver can be closed over (or donated) by pjit'd train
steps and by the jitted inversion scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import bcast_right, extract, make_vc2_scale_arr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMSolver:
    """Precomputed DDIM grid over `ddim_timesteps` uniform steps.

    Tables are float32 (N,) where N = ddim_timesteps; `alpha_cumprods` is the
    full (T,) table used by the inversion step. Cf. reference
    ode_solver/ddim_solver.py:8-52.
    """

    alpha_cumprods: jax.Array  # (T,)
    ddim_timesteps: jax.Array  # (N,) int32
    ddim_alpha_cumprods: jax.Array  # (N,)
    ddim_alpha_cumprods_prev: jax.Array  # (N,)
    ddim_scale_arr: jax.Array  # (N,) ones when use_scale=False
    ddim_scale_arr_prev: jax.Array  # (N,)
    ddim_sigmas: jax.Array  # (N,) zeros when eta=0
    step_ratio: int = dataclasses.field(metadata=dict(static=True))
    use_scale: bool = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        alpha_cumprods: np.ndarray,
        timesteps: int = 1000,
        ddim_timesteps: int = 50,
        scale_a: float = 1.0,
        scale_b: float = 0.7,
        mid_step: int = 400,
        ddim_eta: float = 0.0,
        use_scale: bool = False,
        dtype=jnp.float32,
    ) -> "DDIMSolver":
        alpha_cumprods = np.asarray(alpha_cumprods, dtype=np.float64)
        step_ratio = timesteps // ddim_timesteps
        ts = (np.arange(1, ddim_timesteps + 1) * step_ratio).round().astype(np.int64) - 1
        ac = alpha_cumprods[ts]
        ac_prev = np.concatenate([alpha_cumprods[:1], alpha_cumprods[ts[:-1]]])
        if use_scale:
            scale_arr = make_vc2_scale_arr(timesteps, scale_a, scale_b, mid_step)
            s = scale_arr[ts]
            s_prev = np.concatenate([scale_arr[:1], scale_arr[ts[:-1]]])
        else:
            s = np.ones_like(ac)
            s_prev = np.ones_like(ac)
        sigmas = ddim_eta * np.sqrt((1 - ac_prev) / (1 - ac) * (1 - ac / ac_prev))
        as_dt = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            alpha_cumprods=as_dt(alpha_cumprods),
            ddim_timesteps=jnp.asarray(ts, dtype=jnp.int32),
            ddim_alpha_cumprods=as_dt(ac),
            ddim_alpha_cumprods_prev=as_dt(ac_prev),
            ddim_scale_arr=as_dt(s),
            ddim_scale_arr_prev=as_dt(s_prev),
            ddim_sigmas=as_dt(sigmas),
            step_ratio=step_ratio,
            use_scale=use_scale,
        )

    def ddim_step(
        self,
        pred_x0: jax.Array,
        pred_noise: jax.Array,
        timestep_index: jax.Array,
        noise: jax.Array | None = None,
    ) -> jax.Array:
        """Deterministic DDIM step x_t -> x_{t-Δ} on the precomputed grid.

        timestep_index: (B,) indices into the DDIM grid. `noise` is only used
        when use_scale and ddim_eta > 0 (explicit RNG; reference used
        torch.randn_like, ode_solver/ddim_solver.py:82).
        Cf. reference ode_solver/ddim_solver.py:67-87.
        """
        nd = pred_x0.ndim
        ac_prev = extract(self.ddim_alpha_cumprods_prev, timestep_index, nd)
        dir_xt = jnp.sqrt(1.0 - ac_prev) * pred_noise
        if self.use_scale:
            scale_t = extract(self.ddim_scale_arr, timestep_index, nd)
            scale_prev = extract(self.ddim_scale_arr_prev, timestep_index, nd)
            sigma_t = extract(self.ddim_sigmas, timestep_index, nd)
            eps = 0.0 if noise is None else sigma_t * noise
            coef = scale_prev / scale_t
            return jnp.sqrt(ac_prev) * coef * pred_x0 + dir_xt + eps
        return jnp.sqrt(ac_prev) * pred_x0 + dir_xt

    def ddim_reverse_step(
        self, x_prev: jax.Array, pred_noise: jax.Array, ts: jax.Array
    ) -> jax.Array:
        """DDIM inversion step x_{t-Δ} -> x_t (deterministic, no scale).
        ts: (B,) absolute timesteps. Cf. reference ode_solver/ddim_solver.py:89-97.
        """
        assert not self.use_scale
        nd = x_prev.ndim
        prev_ts = jnp.clip(ts - self.step_ratio, 0, None)
        ac_next = extract(self.alpha_cumprods, ts, nd)
        ac = extract(self.alpha_cumprods, prev_ts, nd)
        return (x_prev - jnp.sqrt(1.0 - ac) * pred_noise) * jnp.sqrt(
            ac_next / ac
        ) + jnp.sqrt(1.0 - ac_next) * pred_noise

    def index_to_timestep(self, index: jax.Array) -> jax.Array:
        """Map DDIM grid index -> absolute diffusion timestep."""
        return jnp.take(self.ddim_timesteps, index, axis=0)


def ddim_sample_loop(
    model_fn,
    solver: DDIMSolver,
    x_T: jax.Array,
    key: jax.Array | None = None,
    cfg_scale: float = 1.0,
    uncond_model_fn=None,
    temperature: float = 1.0,
    grid: str = "sampler",
    eta: float = 0.0,
) -> jax.Array:
    """Full DDIM sampling chain with eta noise, CFG mixing, and the VC2
    latent-scale correction — the reference's standalone `DDIMSampler`
    surface (lvdm/models/samplers/ddim.py:306-430 p_sample_ddim; dead code
    in the reference but part of the lvdm API). TPU-first: the chain is one
    `lax.scan` over the DDIM grid.

    `grid` selects the timestep discretization — the two reference
    codepaths use DIFFERENT grids:
      - "sampler" (default): `make_ddim_timesteps("uniform")` =
        i*(T//N) + 1, i.e. 1..981 for T=1000, N=50 — what DDIMSampler
        samples on (utils_diffusion.py:70-90). Tables are derived from the
        solver's full alpha_cumprod table; `eta` sets the sigmas
        (make_ddim_sampling_parameters). use_scale is not supported on
        this grid (the solver doesn't carry the full scale_arr).
      - "solver": the training-time DDIMSolver grid (i+1)*(T//N) - 1 =
        19..999 with the solver's own precomputed tables, including the
        VC2 scale correction when solver.use_scale (p_sample_ddim's
        `pred_x0 /= scale_t; x_prev = sqrt(a_prev)·scale_prev·pred_x0 ...`,
        reference ddim.py:412-427) and the solver's ddim_eta sigmas (the
        `eta` argument is ignored).

    `model_fn(x, t_batch) -> eps` has conditioning closed over;
    `uncond_model_fn` likewise for the unconditional branch (required when
    cfg_scale != 1). Noise is always emitted (sigma==0 folds it away under
    XLA); with no `key` a fixed PRNGKey(0) is used, so eta>0 without a key
    yields a correctly-distributed but run-to-run identical sample.
    """
    if cfg_scale != 1.0 and uncond_model_fn is None:
        raise ValueError("cfg_scale != 1 requires uncond_model_fn")
    n = solver.ddim_timesteps.shape[0]
    b = x_T.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    if grid == "sampler":
        if solver.use_scale:
            raise NotImplementedError(
                "use_scale needs the full scale_arr; use grid='solver'"
            )
        T = solver.alpha_cumprods.shape[0]
        ts = jnp.arange(n, dtype=jnp.int32) * (T // n) + 1
        ac = jnp.take(solver.alpha_cumprods, ts)
        ac_prev = jnp.concatenate([solver.alpha_cumprods[:1], ac[:-1]])
        sigmas = eta * jnp.sqrt(
            (1 - ac_prev) / (1 - ac) * (1 - ac / ac_prev)
        )
        scale_t = scale_prev = None
    elif grid == "solver":
        ts = solver.ddim_timesteps
        ac = solver.ddim_alpha_cumprods
        ac_prev = solver.ddim_alpha_cumprods_prev
        sigmas = solver.ddim_sigmas
        scale_t = solver.ddim_scale_arr if solver.use_scale else None
        scale_prev = solver.ddim_scale_arr_prev if solver.use_scale else None
    else:
        raise ValueError(f"unknown grid: {grid!r}")

    def step(carry, i):
        x, k = carry
        tb = jnp.full((b,), ts[i], jnp.int32)
        e_t = model_fn(x, tb)
        if cfg_scale != 1.0:
            e_u = uncond_model_fn(x, tb)
            e_t = e_u + cfg_scale * (e_t - e_u)
        nd = x.ndim
        idx = jnp.full((b,), i, jnp.int32)
        a_t = extract(ac, idx, nd)
        a_prev = extract(ac_prev, idx, nd)
        sigma = extract(sigmas, idx, nd)
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e_t
        k, sub = jax.random.split(k)
        noise = sigma * jax.random.normal(sub, x.shape, x.dtype) * temperature
        if scale_t is not None:
            pred_x0 = pred_x0 / extract(scale_t, idx, nd)
            x0_term = jnp.sqrt(a_prev) * extract(scale_prev, idx, nd) * pred_x0
        else:
            x0_term = jnp.sqrt(a_prev) * pred_x0
        return (x0_term + dir_xt + noise, k), None

    (x, _), _ = jax.lax.scan(
        step, (x_T, key), jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
    )
    return x
