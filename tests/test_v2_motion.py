"""v2 latent trainer loss + MotionClone machinery tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
from t2v_turbo_tpu.training.lcd_v2 import LCDV2Config, lcd_v2_loss
from t2v_turbo_tpu.training.motion import (
    motion_prior_score,
    motion_rank_loss,
    reverse_ddim_loop,
    temp_attn_probs,
)


@pytest.fixture(scope="module")
def setup():
    from tinymodels import tiny_unet

    model = tiny_unet()
    x = jnp.zeros((2, 4, 8, 8, 4))
    ctx = jnp.zeros((2, 7, 16))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), ctx,
        timestep_cond=jnp.zeros((2, 8)),
    )
    # make outputs nonzero
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.RandomState(0).randn(*p.shape).astype(p.dtype),
        params,
    )
    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
    return model, params, sched, solver


def v2_batch(b=2, t=4):
    rng = np.random.RandomState(1)
    return {
        "index": np.array([45, 10]),  # one in top band, one out
        "z_t": rng.randn(b, t, 8, 8, 4).astype(np.float32),
        "cond_teacher_out": rng.randn(b, t, 8, 8, 4).astype(np.float32),
        "uncond_teacher_out": rng.randn(b, t, 8, 8, 4).astype(np.float32),
        "score": rng.randn(b, t, 8, 8, 4).astype(np.float32),
        "prompt_emb": rng.randn(b, 7, 16).astype(np.float32),
        "use_motion_guide": np.array([True, True]),
        "fps": np.full((b,), 16.0, np.float32),
    }


class TestLCDV2:
    def test_loss_finite_and_grad(self, setup):
        model, params, sched, solver = setup

        def apply(p, z, t, c, fps=None, timestep_cond=None, motion_cond=None):
            return model.apply(
                p, z, t, c, fps=fps, timestep_cond=timestep_cond,
                motion_cond=motion_cond,
            )

        cfg = LCDV2Config(w_embedding_dim=8)
        (loss, metrics), grads = jax.jit(jax.value_and_grad(
            lambda p: lcd_v2_loss(
                p, {k: jnp.asarray(v) if not isinstance(v, list) else v
                    for k, v in v2_batch().items()},
                jax.random.PRNGKey(0),
                student_apply=apply, sched=sched, solver=solver, cfg=cfg,
            ),
            has_aux=True,
        ))(params)
        assert np.isfinite(float(loss))
        gn = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert gn > 0

    def test_motion_guidance_gating(self, setup):
        """Score only affects samples with index in the top percentage band;
        zeroing the in-band score must change the loss, zeroing the
        out-of-band score must not."""
        model, params, sched, solver = setup

        def apply(p, z, t, c, fps=None, timestep_cond=None, motion_cond=None):
            return model.apply(
                p, z, t, c, fps=fps, timestep_cond=timestep_cond,
                motion_cond=motion_cond,
            )

        cfg = LCDV2Config(w_embedding_dim=8, motion_gs=0.5, percentage=0.3)
        key = jax.random.PRNGKey(0)
        base = {k: jnp.asarray(v) for k, v in v2_batch().items()}

        jloss = jax.jit(
            lambda batch: lcd_v2_loss(
                params, batch, key, student_apply=apply, sched=sched,
                solver=solver, cfg=cfg,
            )[0]
        )

        def loss_of(batch):
            return float(jloss(batch))

        l0 = loss_of(base)
        in_band_zeroed = dict(base, score=base["score"].at[0].set(0.0))
        out_band_zeroed = dict(base, score=base["score"].at[1].set(0.0))
        assert loss_of(out_band_zeroed) == pytest.approx(l0, rel=1e-6)
        assert loss_of(in_band_zeroed) != pytest.approx(l0, rel=1e-6)

    def test_ema_target(self, setup):
        model, params, sched, solver = setup

        def apply(p, z, t, c, fps=None, timestep_cond=None, motion_cond=None):
            return model.apply(
                p, z, t, c, fps=fps, timestep_cond=timestep_cond,
                motion_cond=motion_cond,
            )

        cfg = LCDV2Config(w_embedding_dim=8)
        batch = {k: jnp.asarray(v) for k, v in v2_batch().items()}
        key = jax.random.PRNGKey(0)
        l_online, _ = jax.jit(
            lambda p: lcd_v2_loss(
                p, batch, key, student_apply=apply, sched=sched,
                solver=solver, cfg=cfg,
            )
        )(params)
        ema = jax.tree.map(lambda p: p * 0.5, params)
        l_ema, _ = jax.jit(
            lambda p, t: lcd_v2_loss(
                p, batch, key, student_apply=apply, target_params=t,
                sched=sched, solver=solver, cfg=cfg,
            )
        )(params, ema)
        assert float(l_online) != pytest.approx(float(l_ema), rel=1e-6)


class TestMotionQuirkFactor:
    """The motion-prior correction must shift the teacher branch's x_prev by
    EXACTLY -motion_gs · (1-√ᾱ_t)^0.5 · √(1-ᾱ_prev) · score — the
    reference's quirky factor comes from gathering alpha_schedule =
    sqrt(alphas_cumprod) and applying (1-·)**0.5
    (train_latent_t2v_turbo_v2.py:705,1213-1226), NOT the plain
    √(1-ᾱ_t) a naive reading would produce (30% off at mid ᾱ). The
    expected value below is derived from the schedule tables directly, so a
    wrong factor form, sign, or gate in lcd_v2_loss mismatches to machine
    precision. x_prev is observed by capturing the target net's input."""

    def _xprev(self, batch, cfg, sched, solver):
        captured = []

        def student_apply(p, z, t, c, fps=None, timestep_cond=None,
                          motion_cond=None):
            return 0.1 * z

        def capture_apply(p, z, t, c, fps=None, timestep_cond=None,
                          motion_cond=None):
            captured.append(np.asarray(z))
            return jnp.zeros_like(z)

        lcd_v2_loss(  # eager on purpose: the closure capture needs no jit
            {}, batch, jax.random.PRNGKey(3), student_apply=student_apply,
            target_apply=capture_apply, target_params={}, sched=sched,
            solver=solver, cfg=cfg,
        )
        assert len(captured) == 1
        return captured[0]

    def test_xprev_shift_matches_reference_formula(self):
        sched = DiffusionSchedule.create()
        solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
        rng = np.random.RandomState(0)
        b = 4
        # ex0: gated + in-band; ex1: out-of-band; ex2: use_motion_guide off;
        # ex3: gated at a LOW grid index under percentage=1.0, where the
        # quirk factor (1-√ᾱ)^0.5 = 0.543 differs sharply from both 1 and
        # √(1-ᾱ) = 0.654 — the sharp leg of the factor check
        index = np.array([45, 10, 45, 10], np.int32)
        gate = np.array([True, True, False, True])
        batch = {
            "index": index,
            "z_t": rng.randn(b, 2, 4, 4, 4).astype(np.float32),
            "cond_teacher_out": rng.randn(b, 2, 4, 4, 4).astype(np.float32),
            "uncond_teacher_out": rng.randn(b, 2, 4, 4, 4).astype(np.float32),
            "score": rng.randn(b, 2, 4, 4, 4).astype(np.float32),
            "prompt_emb": rng.randn(b, 7, 16).astype(np.float32),
            "use_motion_guide": gate,
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        zero_score = dict(batch, score=jnp.zeros_like(batch["score"]))

        for percentage, live in [(0.3, [0]), (1.0, [0, 1, 3])]:
            cfg = LCDV2Config(
                w_embedding_dim=8, motion_gs=0.7, percentage=percentage
            )
            shift = self._xprev(batch, cfg, sched, solver) - self._xprev(
                zero_score, cfg, sched, solver
            )
            t = np.asarray(solver.index_to_timestep(jnp.asarray(index)))
            abar = np.asarray(sched.alphas_cumprod)[t]
            ac_prev = np.asarray(solver.ddim_alpha_cumprods_prev)[index]
            factor = (1.0 - np.sqrt(abar)) ** 0.5  # the reference quirk
            expected = (
                -cfg.motion_gs
                * factor[:, None, None, None, None]
                * np.sqrt(1.0 - ac_prev)[:, None, None, None, None]
                * np.asarray(batch["score"])
            )
            for ex in range(b):
                if ex in live:
                    np.testing.assert_allclose(
                        shift[ex], expected[ex], rtol=2e-5, atol=2e-6,
                        err_msg=f"percentage={percentage} example {ex}",
                    )
                    assert np.abs(shift[ex]).max() > 0.05  # shift is real
                else:
                    np.testing.assert_allclose(
                        shift[ex], 0.0, atol=1e-7,
                        err_msg=f"gated-out example {ex} was shifted "
                        f"(percentage={percentage})",
                    )


class TestMotion:
    def _apply_mutable(self, model):
        def f(p, z, ts, ctx, fps=None):
            return model.apply(
                p, z, ts, ctx, fps=fps, record_probs=True,
                mutable=["intermediates"],
            )

        return f

    def test_prob_capture_layers(self, setup):
        model, params, sched, solver = setup
        f = self._apply_mutable(model)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
        out, probs = temp_attn_probs(
            f, params, z, jnp.array([500]), jnp.ones((1, 7, 16))
        )
        assert out.shape == z.shape
        # single-level tiny config still has >=1 temporal attention tap
        assert len(probs) > 0
        for p in probs:
            assert p.shape[-1] == 4  # T
            np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-4)

    def test_rank_loss(self):
        ref = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4))
        gen = ref + 0.1
        l_same = motion_rank_loss([ref], [ref])
        l_diff = motion_rank_loss([gen], [ref])
        assert float(l_same) == pytest.approx(0.0, abs=1e-8)
        assert float(l_diff) > 0
        assert float(motion_rank_loss([gen], [ref], rank_k=0)) == 0.0

    def test_motion_score(self, setup):
        model, params, sched, solver = setup
        f = self._apply_mutable(model)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 4))
        z_ex = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4))
        ctx = jnp.ones((1, 7, 16))
        score, cond_out = jax.jit(
            lambda z_, z_ex_: motion_prior_score(
                f, params, z_, jnp.array([900]), z_ex_, ctx, ctx
            )
        )(z, z_ex)
        assert score.shape == z.shape
        assert float(jnp.abs(score).sum()) > 0
        assert cond_out.shape == z.shape

    def test_inversion_loop(self, setup):
        model, params, sched, solver = setup

        def apply(p, z, ts, ctx, fps=None):
            return model.apply(p, z, ts, ctx, fps=fps)

        z0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8, 4)) * 0.2
        inter = reverse_ddim_loop(
            apply, params, z0, jnp.ones((1, 7, 16)), solver, num_steps=5
        )
        assert inter.shape == (5, 1, 4, 8, 8, 4)
        assert np.isfinite(np.asarray(inter)).all()
        # noising trajectory: variance grows toward the prior
        v0 = float(jnp.var(inter[0]))
        v4 = float(jnp.var(inter[4]))
        assert v4 > v0 * 0.5  # sanity: not collapsing
