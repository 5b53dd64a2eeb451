"""Analytically-tractable distillation problem for end-to-end convergence
proofs of the LCD recipes.

The teacher is EXACT, not trained: for Gaussian data x0 | mu ~ N(mu, σ²I)
the Bayes-optimal ε-predictor has a closed form, so a "teacher UNet" can be
a pure function of (x_t, t, mu). Classifier-free guidance over this family
stays Gaussian (cond and uncond marginals share a variance, so the guided
score is the score of N((1+w)·√ᾱ·mu, ᾱσ² + 1-ᾱ)), which makes the guided
50-step DDIM rollout's endpoint distribution known and lets sample-set
statistics decide convergence sharply.

Used by tests/test_distill_convergence.py to run the REAL v1/v2 trainers
(training/lcd.py, training/lcd_v2.py via training/trainer.py) to convergence
and assert the few-step student matches the teacher's 50-step samples — the
whole-machine check the per-step goldens can't provide. A deliberately
mis-indexed solver grid trains to the same loss floor (2.6e-5) but lands
~2.6 off in sample mean vs ≤0.09 for correct code, so the tolerances here
separate the two by >25x. Cf. reference loops
train_t2v_turbo_v1_lora.py:978-1196, train_latent_t2v_turbo_v2.py:1169-1254.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from t2v_turbo_tpu.diffusion import (
    DDIMSolver,
    DiffusionSchedule,
    LCMScheduler,
    guidance_scale_embedding,
)
from t2v_turbo_tpu.diffusion.lcm import (
    predicted_noise,
    predicted_origin,
    timestep_embedding,
)
from t2v_turbo_tpu.diffusion.schedule import extract

SIGMA = 0.4  # data std around the per-example mean
C = 4  # latent channels
LAT = (1, 1, 1, C)  # (T, h, w, C) video-latent shape the trainers expect
W_DIM = 32  # guidance-scale embedding width
# w-range for the toy: the reference's [5, 15] amplifies the guided mean by
# up to 16x, which makes the self-bootstrap fixed-point iteration diverge at
# toy scale (measured: loss oscillates 0.1->10 at any lr that converges in
# <10k steps). [1, 3] keeps the recipe identical while the amplification
# stays contractive; the machinery under test does not depend on the range.
W_MIN, W_MAX = 1.0, 3.0

SCHED = DiffusionSchedule.create()
SOLVER = DDIMSolver.create(np.asarray(SCHED.alphas_cumprod))
_ABAR = np.asarray(SCHED.alphas_cumprod, np.float64)
_TS = np.asarray(SOLVER.ddim_timesteps)


def analytic_eps(x, t, mu, sched=SCHED):
    """Bayes-optimal ε(x_t, t) for x0 ~ N(mu, σ²I): E[ε | x_t] via the
    Gaussian posterior E[x0 | x_t] = mu + √ᾱσ²/(ᾱσ²+1-ᾱ)·(x_t - √ᾱ·mu)."""
    nd = x.ndim
    abar = extract(sched.alphas_cumprod, t, nd)
    v = abar * SIGMA**2 + (1.0 - abar)
    x0 = mu + (jnp.sqrt(abar) * SIGMA**2 / v) * (x - jnp.sqrt(abar) * mu)
    return (x - jnp.sqrt(abar) * x0) / jnp.sqrt(1.0 - abar)


def teacher_apply(params, z, t, ctx, fps=None):
    """Exact teacher with the UNet apply signature; mu rides in as ctx."""
    mu = ctx[:, 0, :].reshape(
        (z.shape[0],) + (1,) * (z.ndim - 2) + (z.shape[-1],)
    )
    return analytic_eps(z, t, mu)


def np_eps(x, t, mu):
    """numpy analytic_eps for offline v2 batch generation (t: (B,) ints)."""
    ab = _ABAR[t].reshape((-1,) + (1,) * (x.ndim - 1))
    v = ab * SIGMA**2 + (1 - ab)
    x0 = mu + (np.sqrt(ab) * SIGMA**2 / v) * (x - np.sqrt(ab) * mu)
    return ((x - np.sqrt(ab) * x0) / np.sqrt(1 - ab)).astype(np.float32)


class ToyDenoiser(nn.Module):
    """FiLM ε-net matching the problem's true function class.

    The guided consistency function for a Gaussian family is affine in
    (x, mu) with (t, w)-dependent coefficients, so an MLP over
    [t-embedding | w-embedding] emitting per-channel scales on x and mu can
    represent the optimum EXACTLY — convergence failures then indict the
    training recipe, not model capacity. The additive head `off` is zero at
    that optimum (zero-init keeps it reachable); it exists so the REWARD
    branch has a mean-shift channel: under the symmetric mu distribution a
    judge's gradient w.r.t. multiplicative coefficients averages to ~0, and
    without an additive term a reward could only act through higher-order
    correlations (measured: non-monotone in reward_scale). Signature matches
    the UNet apply the trainers drive (incl. the v2 motion_cond kwarg)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, z, timesteps, ctx, fps=None, timestep_cond=None,
                 motion_cond=None):
        h = timestep_embedding(timesteps, 32)
        if timestep_cond is not None:
            h = jnp.concatenate([h, timestep_cond], -1)
        h = nn.silu(nn.Dense(self.hidden)(h))
        h = nn.silu(nn.Dense(self.hidden)(h))
        c = z.shape[-1]
        a = nn.Dense(c, kernel_init=nn.initializers.zeros)(h)
        b = nn.Dense(c, kernel_init=nn.initializers.zeros)(h)
        off = nn.Dense(c, kernel_init=nn.initializers.zeros, name="off")(h)
        shape = (z.shape[0],) + (1,) * (z.ndim - 2) + (c,)
        mu = ctx[:, 0, :].reshape(shape)
        # zero-init around ε̂ = z: the right prediction at high noise
        return (
            (1.0 + a.reshape(shape)) * z
            + b.reshape(shape) * mu
            + off.reshape(shape)
        )


def toy_student(batch=512):
    """(module, init_params) with every optional trainer input covered."""
    student = ToyDenoiser()
    params = student.init(
        jax.random.PRNGKey(0),
        jnp.zeros((batch,) + LAT),
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch, 1, C)),
        timestep_cond=jnp.zeros((batch, W_DIM)),
    )
    return student, params


def v1_data_iter(b=512, seed=0, roles=None):
    """Clean-latent batches for the v1 (online-teacher) recipe.

    roles: None -> no mask keys; "halves" -> reward_mask selects the first
    half and video_reward_mask the disjoint second half (the reference's
    rank-role split, train_t2v_turbo_v1_lora.py:218-234, as per-example
    masks); "zero" -> both masks all-zero (machinery wired, every example
    gated out — the masking control)."""
    rng = np.random.RandomState(seed)
    masks = {}
    if roles == "halves":
        half = np.zeros((b,), np.float32)
        half[: b // 2] = 1.0
        masks = {"reward_mask": half, "video_reward_mask": 1.0 - half}
    elif roles == "zero":
        masks = {
            "reward_mask": np.zeros((b,), np.float32),
            "video_reward_mask": np.zeros((b,), np.float32),
        }
    while True:
        mu = rng.uniform(-1, 1, (b, C)).astype(np.float32)
        x0 = mu + SIGMA * rng.randn(b, C).astype(np.float32)
        yield {
            "latents": x0.reshape((b,) + LAT),
            "ctx": mu.reshape(b, 1, C),
            "uncond_ctx": np.zeros((b, 1, C), np.float32),
            **masks,
        }


def v2_data_iter(b=512, seed=0):
    """Precomputed-teacher batches for the v2 recipe: {index, z_t,
    cond/uncond_teacher_out, score, prompt_emb, use_motion_guide} exactly as
    training/preprocess.py would emit (reference preprocess outputs,
    train_latent_t2v_turbo_v2.py:1169-1196). score=0 and the motion gate off
    keep the analytic teacher exact."""
    rng = np.random.RandomState(seed)
    while True:
        mu = rng.uniform(-1, 1, (b, C)).astype(np.float32)
        x0 = mu + SIGMA * rng.randn(b, C).astype(np.float32)
        idx = rng.randint(0, 50, (b,))
        t = _TS[idx]
        ab = _ABAR[t].reshape(b, 1)
        z = (np.sqrt(ab) * x0 + np.sqrt(1 - ab) * rng.randn(b, C)).astype(
            np.float32
        )
        mub = mu.reshape((b,) + (1,) * (len(LAT) - 1) + (C,))
        zl = z.reshape((b,) + LAT)
        yield {
            "index": idx.astype(np.int32),
            "z_t": zl,
            "cond_teacher_out": np_eps(zl, t, mub),
            "uncond_teacher_out": np_eps(zl, t, np.zeros_like(mub)),
            "score": np.zeros_like(zl),
            "prompt_emb": mu.reshape(b, 1, C),
            "use_motion_guide": np.zeros((b,), bool),
        }


def teacher_rollout(mu, w, key, n, solver=SOLVER, sched=SCHED):
    """The teacher's full 50-step guided DDIM chain — the exact flow the LCD
    student distills (teacher CFG estimate + solver.ddim_step per grid
    index, as lcd_loss's teacher_branch). Returns (n, C) samples."""
    x = jax.random.normal(key, (n,) + LAT)
    mu_b = jnp.broadcast_to(jnp.asarray(mu).reshape((1,) + LAT), (n,) + LAT)
    zero = jnp.zeros_like(mu_b)
    w_b = jnp.float32(w)

    def body(x, i):
        idx = jnp.full((n,), i, jnp.int32)
        t = solver.index_to_timestep(idx)
        ce = analytic_eps(x, t, mu_b, sched)
        ue = analytic_eps(x, t, zero, sched)
        cx0 = predicted_origin(ce, t, x, "epsilon", sched)
        ceps = predicted_noise(ce, t, x, "epsilon", sched)
        ux0 = predicted_origin(ue, t, x, "epsilon", sched)
        ueps = predicted_noise(ue, t, x, "epsilon", sched)
        px0 = cx0 + w_b * (cx0 - ux0)
        peps = ceps + w_b * (ceps - ueps)
        return solver.ddim_step(px0, peps, idx), None

    x, _ = jax.lax.scan(body, x, jnp.arange(49, -1, -1, dtype=jnp.int32))
    return np.asarray(x).reshape(n, C)


def student_sample(student, params, mu, w, key, n, steps, sched=SCHED):
    """Few-step LCM sampling with the INFERENCE scheduler math
    (diffusion/scheduler.py step + lcm_timesteps grid), mirroring
    pipelines/vc2.py's loop — so a train-grid/inference-grid mismatch fails
    here too. Returns (n, C) samples."""
    scheduler = LCMScheduler(schedule=sched)
    ts = scheduler.timesteps(steps, 50)
    prev = np.concatenate([ts[1:], ts[-1:]])
    ctx = jnp.broadcast_to(jnp.asarray(mu).reshape(1, 1, C), (n, 1, C))
    w_emb = guidance_scale_embedding(jnp.full((n,), w), W_DIM)
    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, (n,) + LAT) * scheduler.init_noise_sigma
    denoised = x
    for i, (t, pt) in enumerate(zip(ts, prev)):
        tb = jnp.full((n,), t, jnp.int32)
        eps = student.apply(params, x, tb, ctx, timestep_cond=w_emb)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape) if i < steps - 1 else None
        x, denoised = scheduler.step(
            eps, jnp.asarray(t), jnp.asarray(pt), x, noise
        )
    return np.asarray(denoised).reshape(n, C)


# --- toy reward machinery ------------------------------------------------
# The reference's reward branch decodes the consistency prediction to frames
# and scores them with frozen judge towers, adding -R·scale to the loss
# (train_t2v_turbo_v1_lora.py:1043-1098: image RM on decoded frames, video RM
# on strided frames). The toy keeps that exact structure — a frozen nonlinear
# "decoder" followed by a frozen linear judge — so a detached decode, a
# dropped mask, or a sign flip in the production lcd_loss reward path breaks
# the same assertions the real recipe would.
P_PIX = 16
_R_RNG = np.random.RandomState(7)
_DEC = (_R_RNG.randn(C, P_PIX) / np.sqrt(C)).astype(np.float32)


def _unit(v):
    return (v / np.linalg.norm(v)).astype(np.float32)


JUDGE_IMG = _unit(_R_RNG.randn(P_PIX))
JUDGE_VID = _unit(_R_RNG.randn(P_PIX))


def toy_decode(x):
    """Frozen differentiable 'VAE decode': frame-pool then tanh-project to
    P_PIX pixels (the 0.3 gain keeps tanh unsaturated at the guided-sample
    scale (1+w)·mu ≈ 2.7, so the judge keeps gradient there). Stands in for
    the chunked VAE decode the reference backprops through
    (train_t2v_turbo_v1_lora.py:1051-1060)."""
    f = x.reshape(x.shape[0], -1, x.shape[-1]).mean(1)
    return jnp.tanh(0.3 * (f @ jnp.asarray(_DEC)))


def toy_image_reward(model_pred, batch):
    """(B,) scores — frozen judge over decoded 'pixels'."""
    return toy_decode(model_pred) @ jnp.asarray(JUDGE_IMG)


def toy_video_reward(model_pred, batch):
    return toy_decode(model_pred) @ jnp.asarray(JUDGE_VID)


def sample_scores(samples, judge):
    """Mean judge score of (N, C) student samples."""
    return float(
        np.mean(np.asarray(toy_decode(jnp.asarray(samples))) @ judge)
    )


EVAL_MU = np.array([0.8, -0.5, 0.3, -0.9], np.float32)
EVAL_W = 2.0


def eval_errors(student, params, n=4096):
    """Per-step-count (mean_err, std_err) of student samples vs the
    teacher's 50-step rollout at a fixed (mu, w) operating point."""
    t50 = teacher_rollout(EVAL_MU, EVAL_W, jax.random.PRNGKey(5), n)
    out = {}
    for k in (1, 2, 4):
        s = student_sample(
            student, params, EVAL_MU, EVAL_W, jax.random.PRNGKey(6 + k), n, k
        )
        out[k] = (
            float(np.abs(s.mean(0) - t50.mean(0)).max()),
            float(np.abs(s.std(0) - t50.std(0)).max()),
        )
    return out, t50
