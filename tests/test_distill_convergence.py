"""End-to-end distillation convergence proofs — the machine works, not just
its parts.

Each test runs a REAL trainer (training/trainer.py driving training/lcd.py or
training/lcd_v2.py: live teacher CFG / stored teacher outputs, w-sampling,
boundary scalings, DDIM solver step, optimizer, loop) to convergence on the
analytic Gaussian teacher from toy_distill.py, then asserts the 1/2/4-step
student's samples match the teacher's full 50-step guided DDIM rollout in
distribution (per-dim mean/std of 4096 samples).

Sharpness (measured while building the harness): correct code lands at
mean_err ≤ 0.09 / std_err ≤ 0.03; an injected off-by-one in the solver's
prev-alpha table — which trains to the SAME loss floor and passes every
per-step golden — lands at mean_err ≈ 2.6 / std_err ≈ 0.58. The tolerances
below sit >10x below the bug signal and >2.5x above the noise floor.

Reference loops being proven: train_t2v_turbo_v1_lora.py:978-1196 (v1) and
train_latent_t2v_turbo_v2.py:1169-1254 (v2)."""

import json

import numpy as np
import jax
import pytest

from t2v_turbo_tpu.parallel.mesh import make_mesh
from t2v_turbo_tpu.training.lcd import LCDConfig
from t2v_turbo_tpu.training.lcd_v2 import LCDV2Config, lcd_v2_loss
from t2v_turbo_tpu.training.optim import make_optimizer
from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig

import toy_distill as T

STEPS = 8000
MEAN_TOL = 0.25
STD_TOL = 0.12


def _make_v1_trainer(tmp_path, optimizer_name="adamw", steps=STEPS,
                     reward_scale=None):
    """reward_scale=None -> no reward branch at all; a float -> both toy
    judges wired through the REAL lcd_loss reward path at that scale."""
    student, sp = T.toy_student()
    reward_kw = {}
    lcd_kw = {}
    if reward_scale is not None:
        reward_kw = {
            "reward_fn": T.toy_image_reward,
            "video_reward_fn": T.toy_video_reward,
        }
        lcd_kw = {
            "reward_scale": reward_scale,
            "video_reward_scale": reward_scale,
        }
    trainer = LCDTrainer(
        student_apply=lambda p, z, t, c, fps=None, timestep_cond=None: (
            student.apply(p, z, t, c, timestep_cond=timestep_cond)
        ),
        teacher_apply=T.teacher_apply,
        teacher_params={"sigma": np.float32(T.SIGMA)},
        student_params=sp,
        sched=T.SCHED,
        solver=T.SOLVER,
        lcd_cfg=LCDConfig(
            w_embedding_dim=T.W_DIM, w_min=T.W_MIN, w_max=T.W_MAX,
            loss_type="l2", **lcd_kw,
        ),
        optimizer=make_optimizer(
            optimizer_name, 1e-3, schedule="cosine", total_steps=steps
        ),
        cfg=TrainerConfig(
            output_dir=str(tmp_path),
            max_steps=steps,
            checkpoint_every=10**6,
            log_every=1000,
            lora_rank=None,
            seed=0,
        ),
        mesh=make_mesh(seq=1),
        **reward_kw,
    )
    return trainer, student


def _assert_distilled(errors, label=""):
    for k, (mean_err, std_err) in errors.items():
        assert mean_err < MEAN_TOL, (
            f"{label}{k}-step sample mean off the teacher's 50-step rollout "
            f"by {mean_err:.3f} (tol {MEAN_TOL}) — the distillation recipe "
            f"did not reproduce the teacher's flow"
        )
        assert std_err < STD_TOL, (
            f"{label}{k}-step sample std off by {std_err:.3f} (tol {STD_TOL})"
        )


class TestV1Distills:
    def test_v1_lcd_recipe_distills(self, tmp_path):
        """The full v1 trainer loop (trainer.run: prefetch, sharded steps,
        logging, final checkpoint) distills a few-step student whose samples
        match the teacher's 50-step guided DDIM rollout."""
        trainer, student = _make_v1_trainer(tmp_path)
        metrics = trainer.run(T.v1_data_iter())
        assert metrics["loss"] < 5e-4, "distillation loss did not converge"

        params = trainer.export_student_params()
        errors, t50 = T.eval_errors(student, params)

        # harness self-check: the teacher rollout must land on the analytic
        # guided Gaussian N((1+w)mu, sigma^2) (up to 50-step discretization)
        analytic_mean = (1 + T.EVAL_W) * T.EVAL_MU
        assert np.abs(t50.mean(0) - analytic_mean).max() < 0.1
        assert np.abs(t50.std(0) - T.SIGMA).max() < 0.05

        _assert_distilled(errors)

        # the loop logged a real convergence trajectory
        rows = [
            json.loads(l)
            for l in open(trainer._metrics_path).read().splitlines()
        ]
        assert rows[-1]["step"] == STEPS
        assert rows[-1]["loss"] < rows[0]["loss"]


def _make_v2_trainer(tmp_path, steps=STEPS, ema_decay=0.95, **v2cfg_kw):
    """REAL v2 trainer (stored-teacher lcd_v2_loss through trainer.run) on
    the toy student; v2cfg_kw overrides LCDV2Config fields (e.g. motion_gs)."""
    student, sp = T.toy_student()

    def apply(p, z, t, c, fps=None, timestep_cond=None, motion_cond=None):
        return student.apply(
            p, z, t, c, timestep_cond=timestep_cond,
            motion_cond=motion_cond,
        )

    v2cfg = LCDV2Config(
        w_embedding_dim=T.W_DIM, w_min=T.W_MIN, w_max=T.W_MAX,
        loss_type="l2", **v2cfg_kw,
    )

    def loss_override(trainable, batch, key, ema=None):
        return lcd_v2_loss(
            trainable, batch, key, student_apply=apply,
            target_params=ema, sched=T.SCHED, solver=T.SOLVER, cfg=v2cfg,
        )

    trainer = LCDTrainer(
        student_apply=apply,
        teacher_apply=lambda p, z, t, c, fps=None: z,  # unused in v2
        teacher_params={},
        student_params=sp,
        sched=T.SCHED,
        solver=T.SOLVER,
        lcd_cfg=None,
        optimizer=make_optimizer(
            "adamw", 1e-3, schedule="cosine", total_steps=steps
        ),
        cfg=TrainerConfig(
            output_dir=str(tmp_path),
            max_steps=steps,
            checkpoint_every=10**6,
            log_every=1000,
            lora_rank=None,
            ema_decay=ema_decay,
            seed=0,
        ),
        mesh=make_mesh(seq=1),
        loss_fn_override=loss_override,
    )
    return trainer, student


class TestV2Distills:
    def test_v2_latent_recipe_distills(self, tmp_path):
        """The v2 recipe — stored teacher outputs, motion-guidance gating
        (gate off -> exact), EMA target network — distills equally; both the
        online student and the EMA export must match the teacher."""
        trainer, student = _make_v2_trainer(tmp_path)
        metrics = trainer.run(T.v2_data_iter())
        assert metrics["loss"] < 5e-4

        online_errors, _ = T.eval_errors(student, trainer.state["trainable"])
        _assert_distilled(online_errors, "online ")
        ema_errors, _ = T.eval_errors(student, trainer.state["ema"])
        _assert_distilled(ema_errors, "EMA ")


class TestMotionGuidanceSteers:
    """The v2 paper's contribution — motion-prior guidance inside the
    distillation target (reference train_latent_t2v_turbo_v2.py:1214-1233) —
    proven EFFECTIVE, not just gated: the REAL v2 trainer runs on batches
    carrying a constant nonzero score with use_motion_guide ON, and the
    trained few-step student's samples must land on the GUIDED consistency
    function — an oracle (toy_distill.oracle_lcm_sample) that applies the
    reference's correction formula independently of lcd_v2_loss. At
    motion_gs=0.5 the guided flow's 1-step samples sit displaced from the
    unguided flow by ≈2.6·|s| per dim (8-10x the mean tolerance) exactly
    along -score; at 2/4 steps the TRUE consistency function attenuates the
    displacement (re-queries at out-of-band timesteps follow the
    mean-reverting unguided flow — see the oracle's docstring), and the
    student must track THAT, not the naive 50-step rollout. A trainer that
    ignores the score matches the unguided flow instead (1-step off by
    ~2.6); a sign flip lands 2x the displacement away; a broken band gate
    shifts the magnitude — each fails a specific assertion. The gate-off
    control (same score, use_motion_guide=False) must still match the
    UNGUIDED flow, so a trainer that reads the score while the per-example
    gate is down fails too. The exact (1-√ᾱ)^0.5 factor is pinned
    separately to machine precision in
    test_v2_motion.py::TestMotionQuirkFactor."""

    SCORE = np.array([0.8, -0.6, -1.0, 0.7], np.float32)
    GS = 0.5

    def _oracle_errors(self, student, params, guide_kw, n=4096):
        """Per-step-count (mean_err, std_err) of student samples vs the
        guided consistency oracle (noise-paired key sequence)."""
        out = {}
        for k in (1, 2, 4):
            s = T.student_sample(
                student, params, T.EVAL_MU, T.EVAL_W,
                jax.random.PRNGKey(6 + k), n, k,
            )
            o = T.oracle_lcm_sample(
                T.EVAL_MU, T.EVAL_W, jax.random.PRNGKey(6 + k), n, k,
                **guide_kw,
            )
            out[k] = (
                float(np.abs(s.mean(0) - o.mean(0)).max()),
                float(np.abs(s.std(0) - o.std(0)).max()),
            )
        return out

    def test_motion_guidance_steers_student(self, tmp_path):
        guided_kw = {"score": self.SCORE, "motion_gs": self.GS}

        # guided: the student must distill the guided consistency function
        trainer, student = _make_v2_trainer(
            tmp_path / "guided", motion_gs=self.GS
        )
        metrics = trainer.run(
            T.v2_data_iter(score_vec=self.SCORE, motion_gate=True)
        )
        assert metrics["loss"] < 5e-4, "guided distillation did not converge"
        params = trainer.state["trainable"]
        _assert_distilled(
            self._oracle_errors(student, params, guided_kw), "guided "
        )

        # 1-step displacement from the UNGUIDED flow: right direction
        # (-score), right magnitude (the guided flow's own displacement)
        unguided_t50 = T.teacher_rollout(
            T.EVAL_MU, T.EVAL_W, jax.random.PRNGKey(5), 4096
        )
        guided_t50 = T.teacher_rollout(
            T.EVAL_MU, T.EVAL_W, jax.random.PRNGKey(5), 4096, **guided_kw
        )
        oracle_disp = guided_t50.mean(0) - unguided_t50.mean(0)
        samples = T.student_sample(
            student, params, T.EVAL_MU, T.EVAL_W, jax.random.PRNGKey(11),
            4096, 1,
        )
        student_disp = samples.mean(0) - unguided_t50.mean(0)
        assert (np.sign(student_disp) == -np.sign(self.SCORE)).all(), (
            f"guided student displaced {student_disp} — not along -score "
            f"{-self.SCORE}: the score is ignored or mis-signed in training"
        )
        np.testing.assert_allclose(
            student_disp, oracle_disp, atol=2 * MEAN_TOL,
            err_msg="guided student's displacement does not match the "
            "reference-formula oracle (wrong gate band or factor scale)",
        )

        # gate-off control: same nonzero score in every batch, per-example
        # use_motion_guide False -> the score must be IGNORED
        trainer, student = _make_v2_trainer(
            tmp_path / "gated", motion_gs=self.GS
        )
        metrics = trainer.run(
            T.v2_data_iter(score_vec=self.SCORE, motion_gate=False)
        )
        assert metrics["loss"] < 5e-4
        off_errors, _ = T.eval_errors(student, trainer.state["trainable"])
        _assert_distilled(off_errors, "gate-off ")


class TestRewardFeedbackSteers:
    """The paper's core contribution — reward feedback on decoded frames
    steering the consistency student (reference
    train_t2v_turbo_v1_lora.py:1043-1098) — proven EFFECTIVE, not just
    wired: the REAL v1 trainer runs with both toy judges and disjoint
    per-example role masks ON, and the trained student's samples must score
    measurably higher under each judge than the masked-out control, while a
    sign-flipped reward scale moves scores the other way and distillation
    still converges. A detached decode, a dropped mask, or a sign error in
    lcd_loss's reward branch each fail a specific assertion.

    Calibrated (3000 steps, scale 1.0, 4096 4-step samples): masked-out
    img=+0.937 vid=-0.076; rewards-on img=+1.158 vid=+0.021; sign-flip
    img=-0.710 vid=-0.545. Margins below sit ~2-5x inside those gaps."""

    R_STEPS = 3000
    SCALE = 1.0

    def _train_and_score(self, tmp_path, roles, scale):
        trainer, student = _make_v1_trainer(
            tmp_path, steps=self.R_STEPS, reward_scale=scale
        )
        metrics = trainer.run(T.v1_data_iter(roles=roles))
        # masked-out must reach the pure-distill floor (~2e-4); live rewards
        # DELIBERATELY trade distill for score — the reference's total loss
        # is distill - reward too — so the live bound only guards against
        # the reward destroying distillation (observed equilibrium ~1.6e-2)
        assert float(metrics["distill_loss"]) < (
            5e-3 if roles == "zero" else 5e-2
        )
        samples = T.student_sample(
            student, trainer.export_student_params(), T.EVAL_MU, T.EVAL_W,
            jax.random.PRNGKey(10), 4096, 4,
        )
        return (
            T.sample_scores(samples, T.JUDGE_IMG),
            T.sample_scores(samples, T.JUDGE_VID),
            metrics,
        )

    def test_reward_gradient_raises_sample_scores(self, tmp_path):
        # control: reward machinery fully wired but every example masked out
        # (role masks are the gate — reference rank roles :218-234)
        zi, zv, zm = self._train_and_score(tmp_path / "zero", "zero", self.SCALE)
        # live: image judge on the first half, video judge on the second
        pi, pv, pm = self._train_and_score(
            tmp_path / "plus", "halves", self.SCALE
        )
        # sign-flip canary
        mi, mv, _ = self._train_and_score(
            tmp_path / "minus", "halves", -self.SCALE
        )

        assert pi > zi + 0.1, (
            f"image-judge score did not rise with rewards on: {pi} vs "
            f"masked-out {zi} — the image reward gradient path is detached, "
            f"mis-masked, or mis-signed"
        )
        assert pv > zv + 0.05, (
            f"video-judge score did not rise: {pv} vs masked-out {zv}"
        )
        assert mi < zi - 0.3 and mv < zv - 0.1, (
            f"sign-flipped reward did not lower scores: img {mi} vs {zi}, "
            f"vid {mv} vs {zv}"
        )
        # the masked-out run's reward_loss metric is exactly the -mean score
        # of ZERO examples -> masking gated everything (loss==0 contribution)
        assert np.isfinite(float(zm["reward_loss"]))
        # live run logged both reward branches
        assert "reward_loss" in pm and "video_rm_loss" in pm


class TestQuantizedOptimizerQuality:
    """The reference assumes bitsandbytes AdamW8bit trains LCD as well as
    f32 Adam (train_t2v_turbo_v1_lora.py:764-775). Prove the optax rebuilds
    do on the same convergence harness: blockwise-int8 and bf16 moment
    states must reach the same sample-quality thresholds as f32 (curves in
    PERF_NOTES.md round 4)."""

    @pytest.mark.parametrize("opt", ["adamw8bit", "adamw_bf16"])
    def test_quantized_moments_distill_like_f32(self, tmp_path, opt):
        trainer, student = _make_v1_trainer(tmp_path, optimizer_name=opt)
        it = T.v1_data_iter()
        key = jax.random.PRNGKey(1)
        for _ in range(STEPS):
            batch = trainer.shard_batch(next(it))
            key, sub = jax.random.split(key)
            trainer.state, m = trainer._step_jit(trainer.state, batch, sub)
        assert float(m["loss"]) < 5e-4, f"{opt} did not converge"
        errors, _ = T.eval_errors(student, trainer.export_student_params())
        _assert_distilled(errors, f"{opt} ")
