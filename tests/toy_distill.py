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
    scalings_for_boundary_conditions,
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


def v2_data_iter(b=512, seed=0, score_vec=None, motion_gate=False):
    """Precomputed-teacher batches for the v2 recipe: {index, z_t,
    cond/uncond_teacher_out, score, prompt_emb, use_motion_guide} exactly as
    training/preprocess.py would emit (reference preprocess outputs,
    train_latent_t2v_turbo_v2.py:1169-1196). Default (score=0, gate off)
    keeps the analytic teacher exact; score_vec=(C,) installs that constant
    motion-prior score on every example and motion_gate sets each example's
    use_motion_guide flag — the toy stand-in for a preprocess job that
    emitted real scores (reference preprocess_with_motion_prior.py:371-408),
    so the REAL v2 trainer can be proven to steer by them."""
    rng = np.random.RandomState(seed)
    if score_vec is None:
        score = np.zeros((b,) + LAT, np.float32)
    else:
        score = np.broadcast_to(
            np.asarray(score_vec, np.float32).reshape((1,) + LAT), (b,) + LAT
        ).copy()
    gate = np.full((b,), bool(motion_gate))
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
            "score": score,
            "prompt_emb": mu.reshape(b, 1, C),
            "use_motion_guide": gate,
        }


def _flow_step(x, i, mu_b, w, solver, sched,
               score_b=None, motion_gs=0.0, percentage=0.3):
    """One guided-teacher DDIM grid step at index i — the shared body of
    teacher_rollout and the consistency oracle.

    score_b=(1,)+LAT applies the v2 motion-prior correction per the
    REFERENCE formula (train_latent_t2v_turbo_v2.py:705,1213-1226:
    peps -= motion_gs · (1 - √ᾱ_t)^0.5 · score inside the top `percentage`
    of grid indices) — written here from the reference, NOT by calling
    lcd_v2_loss, so a sign/gate/factor error in the production trainer
    cannot hide by replicating itself into the oracle."""
    n = x.shape[0]
    n_grid = int(solver.ddim_timesteps.shape[0])
    mu_b = jnp.broadcast_to(mu_b, (n,) + LAT)
    zero = jnp.zeros_like(mu_b)
    w_b = jnp.float32(w)
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
    if score_b is not None:
        in_band = i >= (1.0 - percentage) * n_grid
        sqrt_abar = extract(sched.sqrt_alphas_cumprod, t, x.ndim)
        factor = jnp.where(in_band, jnp.sqrt(1.0 - sqrt_abar), 0.0)
        peps = peps - motion_gs * factor * score_b
    return solver.ddim_step(px0, peps, idx)


def teacher_rollout(mu, w, key, n, solver=SOLVER, sched=SCHED,
                    score=None, motion_gs=0.0, percentage=0.3):
    """The teacher's full 50-step guided DDIM chain — the exact flow the LCD
    student distills (teacher CFG estimate + solver.ddim_step per grid
    index, as lcd_loss's teacher_branch; score → the v2 motion-prior
    correction, see _flow_step). Returns (n, C) samples."""
    x = jax.random.normal(key, (n,) + LAT)
    mu_b = jnp.asarray(mu).reshape((1,) + LAT)
    n_grid = int(solver.ddim_timesteps.shape[0])
    score_b = (
        None if score is None
        else jnp.asarray(score, jnp.float32).reshape((1,) + LAT)
    )

    def body(x, i):
        return _flow_step(
            x, i, mu_b, w, solver, sched, score_b, motion_gs, percentage
        ), None

    x, _ = jax.lax.scan(
        body, x, jnp.arange(n_grid - 1, -1, -1, dtype=jnp.int32)
    )
    return np.asarray(x).reshape(n, C)


def _lcm_sample(eps_fn, mu, w, key, n, steps, sched=SCHED):
    """Few-step LCM sampling with the INFERENCE scheduler math
    (diffusion/scheduler.py step + lcm_timesteps grid), mirroring
    pipelines/vc2.py's loop — so a train-grid/inference-grid mismatch fails
    here too. eps_fn(x, tb, ctx, w_emb) -> ε̂. Returns (n, C) samples."""
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
        eps = eps_fn(x, tb, ctx, w_emb)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape) if i < steps - 1 else None
        x, denoised = scheduler.step(
            eps, jnp.asarray(t), jnp.asarray(pt), x, noise
        )
    return np.asarray(denoised).reshape(n, C)


def student_sample(student, params, mu, w, key, n, steps, sched=SCHED):
    """Few-step LCM samples from a trained student (see _lcm_sample)."""
    return _lcm_sample(
        lambda x, tb, ctx, w_emb: student.apply(
            params, x, tb, ctx, timestep_cond=w_emb
        ),
        mu, w, key, n, steps, sched,
    )


def oracle_lcm_sample(mu, w, key, n, steps, score=None, motion_gs=0.0,
                      percentage=0.3, sched=SCHED, solver=SOLVER):
    """Few-step LCM sampling with the student replaced by the TRUE (guided)
    consistency function, evaluated per query by rolling the guided teacher
    flow from (x, t) down the full grid and inverting the boundary-condition
    combine back to the ε̂ a perfect student would have to emit. Shares
    _lcm_sample (and the key-split sequence) with student_sample, so
    student-vs-oracle comparisons are noise-paired.

    This is the toy-exact answer to "what should a perfectly distilled
    guided student produce at k LCM steps". Notably the guided mean
    displacement ATTENUATES as k grows: re-queries at out-of-band timesteps
    are governed by the unguided flow, which is mean-reverting in this
    Gaussian family — a property of the true consistency function, not a
    training artifact (the 1-step oracle equals the guided 50-step
    rollout)."""
    mu_b = jnp.asarray(mu).reshape((1,) + LAT)
    score_b = (
        None if score is None
        else jnp.asarray(score, jnp.float32).reshape((1,) + LAT)
    )
    grid = np.asarray(SOLVER.ddim_timesteps if solver is SOLVER
                      else solver.ddim_timesteps)

    def eps_fn(x, tb, ctx, w_emb):
        t = int(np.asarray(tb)[0])  # static per LCM loop iteration
        idx = int(np.where(grid == t)[0][0])
        f = x
        for i in range(idx, -1, -1):
            f = _flow_step(
                f, i, mu_b, w, solver, sched, score_b, motion_gs, percentage
            )
        abar = extract(sched.alphas_cumprod, tb, x.ndim)
        c_skip, c_out = scalings_for_boundary_conditions(jnp.float32(t))
        x0 = (f - c_skip * x) / c_out
        return (x - jnp.sqrt(abar) * x0) / jnp.sqrt(1.0 - abar)

    return _lcm_sample(eps_fn, mu, w, key, n, steps, sched)


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


def eval_errors(student, params, n=4096, rollout_kw=None):
    """Per-step-count (mean_err, std_err) of student samples vs the
    teacher's 50-step rollout at a fixed (mu, w) operating point.
    rollout_kw (e.g. {"score": s, "motion_gs": g}) selects a guided
    teacher flow as the comparison target."""
    t50 = teacher_rollout(
        EVAL_MU, EVAL_W, jax.random.PRNGKey(5), n, **(rollout_kw or {})
    )
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
