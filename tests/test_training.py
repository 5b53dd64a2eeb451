"""Trainer tests on tiny configs with a deterministic fake teacher — runs the
full loop (sharded steps, checkpoint rotation, resume) on the 8-device CPU
mesh. This is the distillation-step test strategy SURVEY.md §4 prescribes."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
from t2v_turbo_tpu.models import UNetConfig, UNetModel
from t2v_turbo_tpu.parallel.mesh import make_mesh
from t2v_turbo_tpu.training.lcd import LCDConfig
from t2v_turbo_tpu.training.optim import (
    adamw_bf16_states,
    adamw_q8_states,
    make_optimizer,
)
from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig


def tiny_models():
    cfg = UNetConfig(
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2),
        num_head_channels=16,
        context_dim=16,
        temporal_length=4,
        time_cond_proj_dim=8,
    )
    student = UNetModel(cfg=cfg)
    tcfg = UNetConfig(**{**cfg.__dict__, "time_cond_proj_dim": None})
    teacher = UNetModel(cfg=tcfg)
    x = jnp.zeros((1, 4, 8, 8, 4))
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 16))
    sp = student.init(
        jax.random.PRNGKey(0), x, ts, ctx, timestep_cond=jnp.zeros((1, 8))
    )
    tp = teacher.init(jax.random.PRNGKey(1), x, ts, ctx)
    return student, sp, teacher, tp


def data_iter(b=8, t=4):
    rng = np.random.RandomState(0)
    while True:
        yield {
            "latents": rng.randn(b, t, 8, 8, 4).astype(np.float32),
            "ctx": rng.randn(b, 7, 16).astype(np.float32),
            "uncond_ctx": np.zeros((b, 7, 16), np.float32),
            "fps": np.full((b,), 16.0, np.float32),
        }


def build_trainer(tmp_path, lora_rank=2, ema=None, max_steps=4):
    student, sp, teacher, tp = tiny_models()
    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
    mesh = make_mesh(seq=2)
    return LCDTrainer(
        student_apply=lambda p, z, t, c, fps=None, timestep_cond=None: student.apply(
            p, z, t, c, fps=fps, timestep_cond=timestep_cond
        ),
        teacher_apply=lambda p, z, t, c, fps=None: teacher.apply(p, z, t, c, fps=fps),
        teacher_params=tp,
        student_params=sp,
        sched=sched,
        solver=solver,
        lcd_cfg=LCDConfig(w_embedding_dim=8),
        optimizer=make_optimizer("adamw", 1e-4),
        cfg=TrainerConfig(
            output_dir=str(tmp_path),
            max_steps=max_steps,
            checkpoint_every=2,
            keep_checkpoints=2,
            log_every=1,
            lora_rank=lora_rank,
            ema_decay=ema,
        ),
        mesh=mesh,
    )


class TestTrainer:
    def test_lora_trainer_end_to_end(self, tmp_path):
        """One trainer instance covers: loop + logging, checkpoint rotation,
        resume, LoRA isolation, merged export (a single CPU compile of the
        LCD step is expensive, so everything shares it)."""
        trainer = build_trainer(tmp_path, max_steps=4)
        base_before = jax.tree.map(np.asarray, trainer.student_params)
        metrics = trainer.run(data_iter())

        # loop + metrics
        assert np.isfinite(metrics["loss"])
        lines = open(trainer._metrics_path).read().strip().splitlines()
        assert len(lines) >= 4

        # rotation: keep_checkpoints=2 of steps {2,4}
        ckpts = sorted(
            int(os.path.basename(p))
            for p in glob.glob(str(tmp_path / "checkpoints" / "*"))
            if os.path.basename(p).isdigit()
        )
        assert ckpts == [2, 4]

        # base untouched; lora moved
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
            base_before,
            trainer.student_params,
        )
        moved = sum(
            float(np.abs(np.asarray(f["up"])).sum())
            for f in trainer.state["trainable"].values()
        )
        assert moved > 0

        # merged export finite
        merged = trainer.export_student_params()
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(merged))

        # resume from latest
        trainer2 = build_trainer(tmp_path, max_steps=4)
        start = trainer2.resume_if_available()
        assert start == 4
        assert int(trainer2.state["step"]) == 4

    def test_full_finetune_with_ema(self, tmp_path):
        trainer = build_trainer(tmp_path, lora_rank=None, ema=0.9, max_steps=2)
        trainer.run(data_iter())
        assert "ema" in trainer.state
        # ema lags the online params
        diff = jax.tree.map(
            lambda e, p: float(jnp.abs(e - p).max()),
            trainer.state["ema"],
            trainer.state["trainable"],
        )
        assert max(jax.tree.leaves(diff)) > 0


class TestOptim:
    def _quad(self, tx, steps=60):
        params = {"w": jnp.array([3.0, -2.0])}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            grads = {"w": 2 * params["w"]}  # d/dw (w^2)
            updates, state = tx.update(grads, state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), state

        for _ in range(steps):
            params, state = step(params, state)
        return float(jnp.abs(params["w"]).max())

    def test_bf16_states_converge(self):
        assert self._quad(adamw_bf16_states(0.1)) < 0.5

    def test_q8_states_converge(self):
        assert self._quad(adamw_q8_states(0.1)) < 0.5

    def test_q8_memory_shrinks(self):
        tx = adamw_q8_states(0.1)
        params = {"w": jnp.zeros((1024, 64))}
        state = tx.init(params)
        q = state.mu["w"].q
        assert q.dtype == jnp.int8
        assert q.size == 1024 * 64  # padded blocks of the flattened param

    def test_factory(self):
        tx = make_optimizer("adamw8bit", 1e-4, max_grad_norm=1.0, warmup_steps=10)
        params = {"w": jnp.ones((8,))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((8,))}, state, params)
        assert jax.tree.leaves(updates)[0].shape == (8,)
