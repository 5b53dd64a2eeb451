"""FSDP (ZeRO-3) sharding tests on the 8-device CPU mesh.

Covers the r3 capability (VERDICT r2 action #1): parameter + optimizer-state
+ EMA sharding over the "data" axis, numerical equality with the replicated
step, and checkpoint restore that PRESERVES shardings instead of silently
re-replicating (the r2 trainer bug)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
from t2v_turbo_tpu.parallel.fsdp import fsdp_spec_for, fsdp_shardings
from t2v_turbo_tpu.parallel.mesh import make_mesh
from t2v_turbo_tpu.training.lcd import LCDConfig
from t2v_turbo_tpu.training.optim import make_optimizer
from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig

from tinymodels import tiny_student_pair


class TestSpecRule:
    def test_largest_divisible_dim(self):
        a = jnp.zeros((3, 3, 320, 640))
        assert fsdp_spec_for(a, 8, min_size=0) == P(None, None, None, "data")

    def test_small_leaf_replicated(self):
        assert fsdp_spec_for(jnp.zeros((1280,)), 8) == P()  # < min_size

    def test_indivisible_replicated(self):
        assert fsdp_spec_for(jnp.zeros((33, 7)), 8, min_size=0) == P()

    def test_composes_with_tp(self):
        # a TP column-split kernel gets "data" on the remaining dim
        a = jnp.zeros((1024, 512))
        spec = fsdp_spec_for(a, 8, base=P(None, "model"), min_size=0)
        assert spec == P("data", "model")
        # TP dim is never overridden
        b = jnp.zeros((8, 512))
        assert fsdp_spec_for(b, 8, base=P("model"), min_size=0) == P(
            "model", "data"
        )

    def test_scalar_replicated(self):
        assert fsdp_spec_for(jnp.zeros([]), 8, min_size=0) == P()

    def test_shardings_tree(self):
        mesh = make_mesh()
        tree = {"k": jnp.zeros((16, 8)), "b": jnp.zeros((8,))}
        sh = fsdp_shardings(mesh, tree, min_size=0)
        assert sh["k"].spec == P("data")  # dim0=16 divisible by data=8
        assert sh["b"].spec == P("data")


def _mk_trainer(tmp_path, *, fsdp, optimizer="adamw", ema=None, seed=0,
                max_steps=4, subdir=""):
    student, sp, teacher, tp = tiny_student_pair()
    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
    mesh = make_mesh()  # (data=8, seq=1, model=1)
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
        optimizer=make_optimizer(optimizer, 1e-3),
        cfg=TrainerConfig(
            output_dir=str(tmp_path) + subdir,
            max_steps=max_steps,
            checkpoint_every=2,
            keep_checkpoints=2,
            log_every=1,
            lora_rank=None,  # full finetune: the FSDP target case
            ema_decay=ema,
            seed=seed,
            fsdp=fsdp,
            fsdp_min_size=0,
        ),
        mesh=mesh,
    ), mesh


def _batch(mesh, b=8, t=4, seed=0):
    rng = np.random.RandomState(seed)
    from t2v_turbo_tpu.parallel.mesh import shard_batch

    return shard_batch(mesh, {
        "latents": rng.randn(b, t, 8, 8, 4).astype(np.float32),
        "ctx": rng.randn(b, 7, 16).astype(np.float32),
        "uncond_ctx": np.zeros((b, 7, 16), np.float32),
        "fps": np.full((b,), 16.0, np.float32),
    })


class TestFSDPTrainer:
    def test_sharded_equals_replicated(self, tmp_path):
        """3 FSDP steps == 3 replicated steps bit-for-bit-close, and the
        FSDP state is actually sharded (specs non-empty on large leaves)."""
        tr_rep, mesh = _mk_trainer(tmp_path, fsdp=False, subdir="/rep")
        tr_fsdp, _ = _mk_trainer(tmp_path, fsdp=True, subdir="/fsdp")

        # confirm real sharding happened on the trainable tree
        specs = [
            a.sharding.spec
            for a in jax.tree.leaves(tr_fsdp.state["trainable"])
            if a.ndim > 0
        ]
        assert any(spec != P() for spec in specs), "nothing sharded"
        # and the optimizer state inherited it
        opt_specs = [
            a.sharding.spec
            for a in jax.tree.leaves(tr_fsdp.state["opt_state"])
            if hasattr(a, "sharding") and a.ndim > 0
        ]
        assert any(spec != P() for spec in opt_specs), "opt state replicated"

        key = jax.random.PRNGKey(7)
        with mesh:
            for i in range(3):
                batch = _batch(mesh, seed=i)
                key, sub = jax.random.split(key)
                tr_rep.state, m_rep = tr_rep._step_jit(tr_rep.state, batch, sub)
                tr_fsdp.state, m_fsdp = tr_fsdp._step_jit(
                    tr_fsdp.state, batch, sub
                )
        np.testing.assert_allclose(
            float(m_rep["loss"]), float(m_fsdp["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(tr_rep.state["trainable"]),
            jax.tree.leaves(tr_fsdp.state["trainable"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
            )

    def test_q8_optimizer_shards(self, tmp_path):
        """The blockwise-int8 moment tables (the adamw8bit state) carry
        FSDP shardings too and the step still runs."""
        tr, mesh = _mk_trainer(tmp_path, fsdp=True, optimizer="adamw8bit",
                               subdir="/q8")
        int8_leaves = [
            a
            for a in jax.tree.leaves(tr.state["opt_state"])
            if hasattr(a, "dtype") and a.dtype == jnp.int8
        ]
        assert int8_leaves, "no int8 moment tables found"
        assert any(a.sharding.spec != P() for a in int8_leaves)
        with mesh:
            state, metrics = tr._step_jit(
                tr.state, _batch(mesh), jax.random.PRNGKey(0)
            )
        assert np.isfinite(float(metrics["loss"]))

    def test_restore_preserves_sharding(self, tmp_path):
        """save -> fresh trainer -> resume: restored leaves carry the SAME
        shardings the live state was created with (r2 restore bug: a
        device_put(P()) wiped them)."""
        tr, mesh = _mk_trainer(tmp_path, fsdp=True, ema=0.9, subdir="/ck")
        with mesh:
            tr.state, _ = tr._step_jit(tr.state, _batch(mesh), jax.random.PRNGKey(0))
        tr.save(1)
        want = jax.tree.map(lambda a: a.sharding, tr.state)
        expect = jax.tree.map(np.asarray, tr.state)

        tr2, _ = _mk_trainer(tmp_path, fsdp=True, ema=0.9, subdir="/ck")
        step = tr2.resume_if_available()
        assert step == 1
        got = jax.tree.map(lambda a: a.sharding, tr2.state)
        mismatches = [
            (w, g)
            for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got))
            if w.spec != g.spec
        ]
        assert not mismatches, f"{len(mismatches)} leaves re-replicated"
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(tr2.state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        # and the restored state steps without recompiling to a new signature
        with mesh:
            tr2.state, metrics = tr2._step_jit(
                tr2.state, _batch(mesh, seed=1), jax.random.PRNGKey(1)
            )
        assert np.isfinite(float(metrics["loss"]))


class TestFSDPInitPlacement:
    def test_committed_replicated_params_still_shard(self, tmp_path):
        """fsdp=True must never silently run replicated: params the caller
        already committed (e.g. device_put(P()) after checkpoint surgery)
        are re-placed with FSDP shardings composed around their layout,
        not skipped."""
        student, sp, teacher, tp = tiny_student_pair()
        mesh = make_mesh()
        rep = NamedSharding(mesh, P())
        sp = jax.device_put(sp, rep)  # committed, replicated
        assert all(a.committed for a in jax.tree.leaves(sp))
        sched = DiffusionSchedule.create()
        solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
        tr = LCDTrainer(
            student_apply=lambda p, z, t, c, fps=None, timestep_cond=None:
                student.apply(p, z, t, c, fps=fps, timestep_cond=timestep_cond),
            teacher_apply=lambda p, z, t, c, fps=None: teacher.apply(
                p, z, t, c, fps=fps),
            teacher_params=jax.device_put(tp, rep),
            student_params=sp,
            sched=sched, solver=solver,
            lcd_cfg=LCDConfig(w_embedding_dim=8),
            optimizer=make_optimizer("adamw", 1e-3),
            cfg=TrainerConfig(output_dir=str(tmp_path), lora_rank=None,
                              fsdp=True, fsdp_min_size=0),
            mesh=mesh,
        )
        for tree in (tr.state["trainable"], tr.state["opt_state"],
                     tr._frozen):
            specs = [
                a.sharding.spec for a in jax.tree.leaves(tree)
                if hasattr(a, "sharding") and a.ndim > 0
            ]
            assert any(s != P() for s in specs), "silently replicated"
        # and the sharded state actually steps
        with mesh:
            tr.state, m = tr._step_jit(tr.state, _batch(mesh),
                                       jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))


class TestRunLoopEdges:
    def test_finite_iterator_saves_final_checkpoint(self, tmp_path):
        """Data exhaustion before max_steps stops run() cleanly and the
        final checkpoint is still written (StopIteration must not escape
        the loop)."""
        tr, mesh = _mk_trainer(tmp_path, fsdp=False, max_steps=50)

        def three_batches():
            rng = np.random.RandomState(0)
            for _ in range(3):
                yield {
                    "latents": rng.randn(8, 4, 8, 8, 4).astype(np.float32),
                    "ctx": rng.randn(8, 7, 16).astype(np.float32),
                    "uncond_ctx": np.zeros((8, 7, 16), np.float32),
                    "fps": np.full((8,), 16.0, np.float32),
                }

        metrics = tr.run(three_batches())
        assert metrics["step"] <= 3
        assert tr.ckpt_mgr.latest_step() == 3  # final save happened

    def test_save_is_idempotent(self, tmp_path):
        """Relaunching a finished job re-saves its own final step; orbax
        would raise StepAlreadyExists — save() must no-op instead."""
        tr, mesh = _mk_trainer(tmp_path, fsdp=False)
        with mesh:
            tr.state, _ = tr._step_jit(tr.state, _batch(mesh),
                                       jax.random.PRNGKey(0))
        tr.save(1)
        tr.save(1)  # must not raise
        assert tr.ckpt_mgr.latest_step() == 1
