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
from t2v_turbo_tpu.parallel.mesh import make_mesh
from t2v_turbo_tpu.training.lcd import LCDConfig, make_train_step
from t2v_turbo_tpu.training.optim import (
    adamw_bf16_states,
    adamw_q8_states,
    make_optimizer,
)
from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig

from tinymodels import tiny_student_pair, tiny_unet_pair


def tiny_models():
    # toy student/teacher: the trainer machinery under test is
    # network-agnostic and the real UNet costs minutes to compile on this
    # 1-core box (see tinymodels.py); UNet-through-the-step is covered by
    # test_unet_lcd_train_step below.
    return tiny_student_pair()


def data_iter(b=8, t=4):
    rng = np.random.RandomState(0)
    while True:
        yield {
            "latents": rng.randn(b, t, 8, 8, 4).astype(np.float32),
            "ctx": rng.randn(b, 7, 16).astype(np.float32),
            "uncond_ctx": np.zeros((b, 7, 16), np.float32),
            "fps": np.full((b,), 16.0, np.float32),
        }


def build_trainer(tmp_path, lora_rank=2, ema=None, max_steps=4,
                  optimizer=None, **cfg_kw):
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
        optimizer=optimizer or make_optimizer("adamw", 1e-4),
        cfg=TrainerConfig(
            output_dir=str(tmp_path),
            max_steps=max_steps,
            checkpoint_every=2,
            keep_checkpoints=2,
            log_every=1,
            lora_rank=lora_rank,
            ema_decay=ema,
            **cfg_kw,
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

    def test_bf16_grads_track_f32_grads(self, tmp_path):
        """TrainerConfig.grads_bf16 (the full-model-v2 memory lever,
        bench.py --train-v2): a bf16 grad tree must track the f32 run —
        same loss trajectory to ~1%, params move, finite grad norm. Run
        full-finetune + adamw8bit, the config the lever exists for."""
        runs = {}
        for bf16 in (False, True):
            trainer = build_trainer(
                tmp_path / f"g{int(bf16)}",
                lora_rank=None,
                optimizer=make_optimizer("adamw8bit", 1e-4),
                grads_bf16=bf16,
            )
            it = data_iter()
            key = jax.random.PRNGKey(7)
            losses, gnorms = [], []
            for _ in range(5):
                batch = trainer.shard_batch(next(it))
                trainer.state, m = trainer._step_jit(trainer.state, batch, key)
                losses.append(float(m["loss"]))
                gnorms.append(float(m["grad_norm"]))
            runs[bf16] = (np.asarray(losses), gnorms, trainer.state["trainable"])

        l32, g32, p32 = runs[False]
        l16, g16, p16 = runs[True]
        assert np.all(np.isfinite(l16)) and np.all(np.isfinite(g16))
        np.testing.assert_allclose(l16, l32, rtol=2e-2)
        # the two runs' final params agree to bf16-rounding-accumulation
        # tolerance and both moved from init
        d = max(
            float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8))
            for a, b in zip(jax.tree.leaves(p16), jax.tree.leaves(p32))
        )
        assert d < 5e-2

    def test_bf16_grads_reject_accumulation(self, tmp_path):
        """grads_bf16 + grad_accum_steps>1 would sum micro-grads at 8-bit
        mantissa (MultiSteps accumulates in the grad dtype) — the trainer
        must refuse the combination loudly instead of silently degrading."""
        with pytest.raises(ValueError, match="grads_bf16"):
            build_trainer(tmp_path, grads_bf16=True, grad_accum_steps=2)

    def test_split_step_equals_fused(self, tmp_path):
        """TrainerConfig.split_step (grad program + apply program — the
        final memory lever fitting full-size v2 on one 16 GB chip,
        bench.py --train-v2) must be numerically IDENTICAL to the fused
        step: the split moves the program boundary, not the math. Run the
        full-finetune + EMA + adamw8bit config the lever exists for."""
        runs = {}
        for split in (False, True):
            trainer = build_trainer(
                tmp_path / f"s{int(split)}",
                lora_rank=None,
                ema=0.9,
                optimizer=make_optimizer("adamw8bit", 1e-4),
                split_step=split,
            )
            it = data_iter()
            key = jax.random.PRNGKey(3)
            losses = []
            for _ in range(3):
                batch = trainer.shard_batch(next(it))
                trainer.state, m = trainer._step_jit(trainer.state, batch, key)
                losses.append(float(m["loss"]))
            assert float(m["grad_norm"]) > 0
            runs[split] = (losses, trainer.state)

        lf, sf = runs[False]
        ls, ss = runs[True]
        np.testing.assert_allclose(ls, lf, rtol=1e-6)
        for a, b in zip(
            jax.tree.leaves(sf["trainable"]), jax.tree.leaves(ss["trainable"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(sf["ema"]), jax.tree.leaves(ss["ema"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

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


class TestGradAccum:
    """--gradient-accumulation-steps parity: K accumulated micro-steps must
    equal one big-batch step (reference accelerator.accumulate,
    train_t2v_turbo_v1_lora.py:287-291,945)."""

    def _trainer(self, tmp_path, accum, lr=0.1):
        import optax

        # deterministic loss that ignores the RNG key so micro-batch grads
        # are comparable to the big-batch grad
        def loss_override(trainable, batch, key, ema=None):
            pred = trainable["w"] * batch["x"]
            loss = jnp.mean((pred - 1.0) ** 2)
            return loss, {"loss": loss}

        return LCDTrainer(
            student_apply=None,
            teacher_apply=None,
            teacher_params=None,
            student_params={"w": jnp.ones((4,))},
            sched=None,
            solver=None,
            lcd_cfg=None,
            optimizer=optax.sgd(lr),
            cfg=TrainerConfig(
                output_dir=str(tmp_path),
                max_steps=100,
                checkpoint_every=1000,
                log_every=1,
                lora_rank=None,
                grad_accum_steps=accum,
                max_grad_norm=1e9,  # keep clipping out of the equivalence
            ),
            mesh=make_mesh(seq=1),
            loss_fn_override=loss_override,
        )

    def test_k_micro_steps_equal_one_big_step(self, tmp_path):
        rng = np.random.RandomState(0)
        m1 = {"x": rng.randn(8, 4).astype(np.float32)}
        m2 = {"x": rng.randn(8, 4).astype(np.float32)}
        big = {"x": np.concatenate([m1["x"], m2["x"]])}

        tr_a = self._trainer(tmp_path / "a", accum=2)
        key = jax.random.PRNGKey(0)
        for m in (m1, m2):
            tr_a.state, _ = tr_a._step_jit(tr_a.state, tr_a.shard_batch(m), key)

        tr_b = self._trainer(tmp_path / "b", accum=1)
        tr_b.state, _ = tr_b._step_jit(tr_b.state, tr_b.shard_batch(big), key)

        np.testing.assert_allclose(
            np.asarray(tr_a.state["trainable"]["w"]),
            np.asarray(tr_b.state["trainable"]["w"]),
            rtol=1e-6,
        )

    def test_update_cadence(self, tmp_path):
        """Params move only on the K-th micro-step."""
        rng = np.random.RandomState(1)
        tr = self._trainer(tmp_path, accum=2)
        w0 = np.asarray(tr.state["trainable"]["w"]).copy()
        key = jax.random.PRNGKey(0)
        batch = tr.shard_batch({"x": rng.randn(8, 4).astype(np.float32)})
        tr.state, _ = tr._step_jit(tr.state, batch, key)
        np.testing.assert_array_equal(
            np.asarray(tr.state["trainable"]["w"]), w0
        )
        tr.state, _ = tr._step_jit(tr.state, batch, key)
        assert np.abs(np.asarray(tr.state["trainable"]["w"]) - w0).max() > 0


class TestUNetIntegration:
    def test_unet_lcd_train_step(self):
        """One sharded LCD train step through the real (tiny) UNet — the
        single expensive compile in this file; everything else rides the toy
        model. Mirrors the driver's dryrun_multichip but lives in pytest."""
        import optax

        student, sp, teacher, tp = tiny_unet_pair()
        sched = DiffusionSchedule.create()
        solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
        step = make_train_step(
            optax.adamw(1e-4),
            student_apply=lambda p, z, t, c, fps=None, timestep_cond=None: (
                student.apply(p, z, t, c, fps=fps, timestep_cond=timestep_cond)
            ),
            teacher_apply=lambda p, z, t, c, fps=None: teacher.apply(
                p, z, t, c, fps=fps
            ),
            sched=sched,
            solver=solver,
            cfg=LCDConfig(w_embedding_dim=8),
        )
        opt_state = optax.adamw(1e-4).init(sp)
        rng = np.random.RandomState(0)
        batch = {
            "latents": jnp.asarray(rng.randn(8, 4, 8, 8, 4), jnp.float32),
            "ctx": jnp.asarray(rng.randn(8, 7, 16), jnp.float32),
            "uncond_ctx": jnp.zeros((8, 7, 16)),
            "fps": jnp.full((8,), 16.0),
        }
        mesh = make_mesh(seq=2)
        from t2v_turbo_tpu.parallel.mesh import replicated, shard_batch

        batch = shard_batch(mesh, batch)
        sp = jax.device_put(sp, replicated(mesh))
        tp = jax.device_put(tp, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        with mesh:
            new_params, _, metrics = jax.jit(step)(
                sp, opt_state, tp, batch, jax.random.PRNGKey(0)
            )
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        delta = float(
            jnp.sqrt(
                sum(
                    jnp.sum((a - b) ** 2)
                    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(sp))
                )
            )
        )
        assert delta > 0


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


class TestStableStepSignature:
    def test_no_recompile_on_second_step(self, tmp_path):
        """State/frozen are committed to the mesh at init, so the second
        step must hit the jit cache — uncommitted-then-committed inputs
        would recompile the whole multi-minute program at full size (the
        failure mode seen on the TPU train bench)."""
        tr = build_trainer(tmp_path, lora_rank=2)
        batch = tr.shard_batch(next(data_iter()))
        key = jax.random.PRNGKey(0)
        tr.state, _ = tr._step_jit(tr.state, batch, key)
        inner = tr._step_jit.__closure__  # wrapper over the jitted fn
        # find the jitted function in the closure and check its cache
        jitted = [c.cell_contents for c in inner
                  if hasattr(c.cell_contents, "_cache_size")][0]
        assert jitted._cache_size() == 1
        tr.state, _ = tr._step_jit(tr.state, batch, key)
        assert jitted._cache_size() == 1, "second step recompiled"


class TestScheduleAlignment:
    def test_q8_schedule_matches_optax_counting(self):
        """LR schedules must evaluate at the PRE-increment count in every
        optimizer path (optax convention): with a warmup starting at 0 the
        first adamw8bit update is exactly zero, like optax.adamw."""
        import optax

        from t2v_turbo_tpu.training.optim import adamw_q8_states

        sched = optax.linear_schedule(0.0, 1e-2, transition_steps=4)
        params = {"w": jnp.ones((4,))}
        grads = {"w": jnp.ones((4,))}
        for tx in (optax.adamw(sched), adamw_q8_states(sched)):
            state = tx.init(params)
            u1, state = tx.update(grads, state, params)
            assert float(jnp.abs(u1["w"]).max()) == 0.0  # lr(0) == 0
            u2, state = tx.update(grads, state, params)
            assert float(jnp.abs(u2["w"]).max()) > 0.0  # lr(1) > 0

    def test_zero_base_lr_with_temporal_lr_raises(self):
        from t2v_turbo_tpu.training.optim import (
            make_grouped_optimizer,
            make_v2_optimizer,
        )

        with pytest.raises(ValueError):
            make_v2_optimizer("adamw", 0.0, temporal_learning_rate=1e-4)
        with pytest.raises(ValueError):
            make_grouped_optimizer("adamw", 0.0, temporal_learning_rate=1e-4)
