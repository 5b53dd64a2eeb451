"""Trainer auxiliary subsystems: reward adapters inside the LCD loss,
heartbeat/graceful-shutdown, validation logging."""

import json
import os
import signal
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig
from t2v_turbo_tpu.training.lcd import LCDConfig, lcd_loss
from t2v_turbo_tpu.training.reward_adapters import (
    make_image_reward_fn,
    make_video_reward_fn,
    sample_frame_indices,
)
from t2v_turbo_tpu.training.watchdog import GracefulShutdown, Heartbeat


class FakeRewardModel:
    """Differentiable stand-in: reward = mean pixel * <feat, 1>."""

    def score(self, imgs, feats):
        per = imgs.reshape(imgs.shape[0], -1).mean(axis=1)
        return per * feats.sum(axis=-1)

    # video variant uses (B, T, H, W, 3)
    def video_score(self, vids, feats):
        per = vids.reshape(vids.shape[0], -1).mean(axis=1)
        return per * feats.sum(axis=-1)


class TestRewardAdapters:
    @pytest.fixture(scope="class")
    def setup(self):
        from tinymodels import tiny_unet

        unet = tiny_unet()
        x = jnp.zeros((2, 4, 8, 8, 4))
        ctx = jnp.zeros((2, 7, 16))
        up = jax.jit(unet.init)(
            jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), ctx,
            timestep_cond=jnp.zeros((2, 8)))
        up = jax.tree.map(
            lambda p: p + 0.01 * np.random.RandomState(0).randn(*p.shape).astype(p.dtype), up
        )
        vae = AutoencoderKL(cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        sched = DiffusionSchedule.create()
        solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
        return unet, up, vae, vp, sched, solver

    def test_rewarded_loss_and_masking(self, setup):
        unet, up, vae, vp, sched, solver = setup
        rng = np.random.RandomState(0)
        b, t = 2, 4
        batch = {
            "latents": jnp.asarray(rng.randn(b, t, 8, 8, 4).astype(np.float32)),
            "ctx": jnp.asarray(rng.randn(b, 7, 16).astype(np.float32)),
            "uncond_ctx": jnp.zeros((b, 7, 16)),
            "reward_frame_idx": jnp.asarray(sample_frame_indices(rng, b, t, 2)),
            "reward_text_feats": jnp.ones((b, 3)),
            "video_frame_idx": jnp.asarray(
                sample_frame_indices(rng, b, t, 2, strided=True)
            ),
            "video_text_feats": jnp.ones((b, 3)),
            "reward_mask": jnp.asarray([1.0, 0.0]),  # role-as-data
            "video_reward_mask": jnp.asarray([0.0, 1.0]),
        }
        rm = FakeRewardModel()
        img_fn = make_image_reward_fn(vae, vp, rm)

        class VRM:
            def score(self, vids, feats):
                return rm.video_score(vids, feats)

        vid_fn = make_video_reward_fn(vae, vp, VRM())

        def apply(p, z, ts, c, fps=None, timestep_cond=None):
            return unet.apply(p, z, ts, c, timestep_cond=timestep_cond)

        def loss_fn(p):
            return lcd_loss(
                p, batch, jax.random.PRNGKey(0),
                student_apply=apply,
                teacher_apply=lambda p_, z, ts, c, fps=None: apply(p_, z, ts, c, timestep_cond=jnp.zeros((z.shape[0], 8))),
                teacher_params=up, sched=sched, solver=solver,
                cfg=LCDConfig(w_embedding_dim=8, reward_scale=0.5,
                              video_reward_scale=0.2),
                reward_fn=img_fn, video_reward_fn=vid_fn,
            )

        (loss, metrics), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(up)
        assert np.isfinite(float(loss))
        assert "reward_loss" in metrics and "video_rm_loss" in metrics
        gn = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert gn > 0

    def test_frame_sampling(self):
        rng = np.random.RandomState(1)
        idx = sample_frame_indices(rng, 4, 16, 5)
        assert idx.shape == (4, 5) and idx.max() < 16
        # no duplicate frames per sample for permutation mode
        for row in idx:
            assert len(set(row.tolist())) == 5
        strided = sample_frame_indices(rng, 2, 16, 4, strided=True)
        d = np.diff(strided, axis=1)
        assert (d == 4).all()  # stride 16//4


class TestWatchdog:
    def test_heartbeat_writes_and_stall_detection(self, tmp_path):
        path = str(tmp_path / "hb.json")
        with Heartbeat(path, interval_s=0.05) as hb:
            hb.update(7)
            time.sleep(0.2)
        data = json.load(open(path))
        assert data["step"] == 7
        assert not Heartbeat.is_stalled(path, max_age_s=60)
        assert Heartbeat.is_stalled(str(tmp_path / "missing.json"))

    def test_graceful_shutdown_flag(self):
        with GracefulShutdown(signals=(signal.SIGUSR1,)) as stop:
            assert not stop.requested
            os.kill(os.getpid(), signal.SIGUSR1)
            time.sleep(0.05)
            assert stop.requested


class TestValidationLogger:
    def test_renders_and_indexes(self, tmp_path):
        from t2v_turbo_tpu.diffusion import DiffusionSchedule
        from t2v_turbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline
        from t2v_turbo_tpu.training.validation import make_validation_logger

        from tinymodels import tiny_unet

        unet = tiny_unet()
        up = jax.jit(unet.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 16)),
            timestep_cond=jnp.zeros((1, 8)),
        )
        vae = AutoencoderKL(cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
        text = CLIPTextModel(cfg=CLIPTextConfig(
            vocab_size=50, width=16, heads=2, layers=2, context_length=8))
        tp = text.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))

        class Tok:
            def __call__(self, p):
                p = [p] if isinstance(p, str) else p
                return np.ones((len(p), 8), np.int32)

        pipe = T2VTurboVC2Pipeline(
            unet=unet, unet_params=up, vae=vae, vae_params=vp,
            text_model=text, text_params=tp, tokenizer=Tok(),
            schedule=DiffusionSchedule.create(), vae_scale=2,
            w_embedding_dim=8, dtype=jnp.float32,
        )
        fn = make_validation_logger(
            pipe, str(tmp_path), step_counts=(2,), frames=4, height=8, width=8,
            max_prompts=2,
        )
        fn(100, up)
        idx_path = tmp_path / "validation" / "index.jsonl"
        rows = [json.loads(l) for l in open(idx_path)]
        assert len(rows) == 2
        assert all(os.path.exists(r["path"]) for r in rows)
        assert rows[0]["step"] == 100


class TestChunkedDecode:
    def test_chunked_equals_unchunked_with_grad(self):
        """decode_chunk micro-batching (reference --vae_decode_batch_size)
        is numerically identical to one-shot decode, forward and backward,
        including a non-dividing chunk size (padding path)."""
        from t2v_turbo_tpu.training.reward_adapters import chunked_decode

        vae = AutoencoderKL(cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        z = jnp.asarray(
            np.random.RandomState(0).randn(5, 2, 2, 4).astype(np.float32)
        )
        full = chunked_decode(vae, vp, z, None)
        for chunk in (2, 3, 5, 8):
            out = chunked_decode(vae, vp, z, chunk)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(full), rtol=2e-5, atol=1e-5
            )
        g_full = jax.jit(jax.grad(lambda z_: chunked_decode(vae, vp, z_, None).sum()))(z)
        g_chunk = jax.jit(jax.grad(lambda z_: chunked_decode(vae, vp, z_, 2).sum()))(z)
        np.testing.assert_allclose(
            np.asarray(g_chunk), np.asarray(g_full), rtol=2e-4, atol=1e-5
        )


class TestFrozenGradMaskAndEmaPath:
    """frozen_grad_mask zeroes frozen-leaf grads BEFORE the global-norm
    clip (the reference's requires_grad=False params never enter its
    clip), and ema_path restricts the EMA state to one trainable subtree
    (the v2 target net is UNet-only, reference :671-675)."""

    def _build(self, out, frozen_mask=None, ema_decay=None, ema_path=None):
        import optax

        from t2v_turbo_tpu.parallel.mesh import make_mesh
        from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig

        trainable = {
            "unet": {"w": jnp.ones((4,))},
            "text": {"locked": jnp.ones((4,)), "live": jnp.ones((4,))},
        }

        def loss_override(tr, batch, key, ema=None):
            # enormous grad on the frozen leaf, small on the live ones:
            # if the frozen mass reaches the clip it crushes the live update
            loss = (
                100.0 * tr["text"]["locked"].sum()
                + 0.001 * tr["text"]["live"].sum()
                + 0.001 * tr["unet"]["w"].sum()
            )
            return loss, {"loss": loss}

        sched = DiffusionSchedule.create()
        solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
        return LCDTrainer(
            student_apply=lambda *a, **k: None,
            teacher_apply=lambda *a, **k: None,
            teacher_params={},
            student_params=trainable,
            sched=sched,
            solver=solver,
            lcd_cfg=None,
            optimizer=optax.sgd(1.0),
            cfg=TrainerConfig(
                output_dir=str(out), lora_rank=None, max_grad_norm=0.1,
                ema_decay=ema_decay, ema_path=ema_path,
            ),
            mesh=make_mesh(),
            loss_fn_override=loss_override,
            frozen_grad_mask=frozen_mask,
        )

    @staticmethod
    def _is_locked(path):
        return any(str(getattr(p, "key", p)) == "locked" for p in path)

    def test_frozen_grads_excluded_from_clip(self, tmp_path):
        batch = {"x": np.zeros((8, 1), np.float32)}
        key = jax.random.PRNGKey(0)

        masked = self._build(tmp_path / "m", frozen_mask=self._is_locked)
        st, m = masked._step_jit(
            masked.state, masked.shard_batch(batch), key
        )
        # grad_norm excludes the frozen leaf's 100-per-element grads:
        # only the two 0.001 leaves remain -> norm ~ 0.0028 < clip 0.1
        assert float(m["grad_norm"]) < 0.01
        # live update is NOT shrunk by the frozen mass: unclipped sgd step
        np.testing.assert_allclose(
            np.asarray(st["trainable"]["unet"]["w"]), 1.0 - 0.001, rtol=1e-5
        )
        # frozen leaf does not move even though sgd itself never zeroes it
        np.testing.assert_allclose(
            np.asarray(st["trainable"]["text"]["locked"]), 1.0
        )

        unmasked = self._build(tmp_path / "u")
        st_u, m_u = unmasked._step_jit(
            unmasked.state, unmasked.shard_batch(batch), key
        )
        # without the mask the frozen mass inflates grad_norm (~200) and
        # over-clips the live params — the bug this guards against
        assert float(m_u["grad_norm"]) > 100
        assert abs(float(st_u["trainable"]["unet"]["w"][0]) - (1.0 - 0.001)) > 1e-6

    def test_ema_path_tracks_subtree_only(self, tmp_path):
        trainer = self._build(
            tmp_path / "e", ema_decay=0.5, ema_path="unet"
        )
        assert set(trainer.state["ema"].keys()) == {"w"}  # unet subtree only
        batch = {"x": np.zeros((8, 1), np.float32)}
        st, _ = trainer._step_jit(
            trainer.state, trainer.shard_batch(batch), jax.random.PRNGKey(0)
        )
        expect = 0.5 * 1.0 + 0.5 * np.asarray(st["trainable"]["unet"]["w"])
        np.testing.assert_allclose(
            np.asarray(st["ema"]["w"]), expect, rtol=1e-6
        )


class TestRewardParamsAsArgs:
    """LCDTrainer(reward_fn_factory=..., reward_params=...) threads the
    reward towers through the jitted step as runtime args (under
    frozen['rewards']) instead of closure-captured jit constants — at full
    size the constants cost gigabytes of serialized proto per compile.
    The two forms must be numerically identical."""

    def test_factory_step_equals_closure_step(self, tmp_path):
        from tinymodels import tiny_student_pair

        from t2v_turbo_tpu.models.clip_text import CLIPTextConfig
        from t2v_turbo_tpu.parallel.mesh import make_mesh
        from t2v_turbo_tpu.rewards.reward_fn import (
            build_image_reward_model,
            build_video_reward_model,
        )
        from t2v_turbo_tpu.rewards.vit import VideoViTConfig, ViTConfig
        from t2v_turbo_tpu.training.optim import make_optimizer
        from t2v_turbo_tpu.training.reward_adapters import (
            make_reward_fn_factory,
        )
        from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig

        tvit = ViTConfig(image_size=28, patch_size=14, width=32, layers=2,
                         heads=4, output_dim=16)
        tvvit = VideoViTConfig(image_size=28, patch_size=14, width=32,
                               layers=2, heads=4, output_dim=16, num_frames=4)
        ttxt = CLIPTextConfig(vocab_size=60, width=32, heads=4, layers=2,
                              context_length=8, penultimate=False)
        irm = build_image_reward_model(vit_cfg=tvit, text_cfg=ttxt,
                                       tokenizer=lambda t: np.zeros((len(t), 8), np.int32))
        vrm = build_video_reward_model(vit_cfg=tvvit, text_cfg=ttxt,
                                       tokenizer=lambda t: np.zeros((len(t), 8), np.int32))
        vae = AutoencoderKL(cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

        student, sp, teacher, tp = tiny_student_pair()
        sched = DiffusionSchedule.create()
        solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))

        def batch_iter():
            rng = np.random.RandomState(0)
            b, t = 8, 4
            while True:
                yield {
                    "latents": rng.randn(b, t, 8, 8, 4).astype(np.float32),
                    "ctx": rng.randn(b, 7, 16).astype(np.float32),
                    "uncond_ctx": np.zeros((b, 7, 16), np.float32),
                    "fps": np.full((b,), 16.0, np.float32),
                    "reward_frame_idx": sample_frame_indices(rng, b, t, 2),
                    "reward_text_feats": rng.randn(b, 16).astype(np.float32),
                    "reward_mask": np.ones((b,), np.float32),
                    "video_frame_idx": sample_frame_indices(rng, b, t, 2,
                                                            strided=True),
                    "video_text_feats": rng.randn(b, 16).astype(np.float32),
                    "video_reward_mask": np.ones((b,), np.float32),
                }

        def build(reward_kw, out):
            return LCDTrainer(
                student_apply=lambda p, z, t, c, fps=None, timestep_cond=None:
                    student.apply(p, z, t, c, fps=fps,
                                  timestep_cond=timestep_cond),
                teacher_apply=lambda p, z, t, c, fps=None: teacher.apply(
                    p, z, t, c, fps=fps),
                teacher_params=tp,
                student_params=sp,
                sched=sched,
                solver=solver,
                lcd_cfg=LCDConfig(w_embedding_dim=8, reward_scale=0.5,
                                  video_reward_scale=0.2),
                optimizer=make_optimizer("adamw", 1e-4),
                cfg=TrainerConfig(output_dir=str(out), max_steps=2,
                                  log_every=1, lora_rank=2),
                mesh=make_mesh(),
                **reward_kw,
            )

        from t2v_turbo_tpu.training.reward_adapters import (
            make_image_reward_fn,
            make_video_reward_fn,
        )

        closure = build(
            dict(
                reward_fn=make_image_reward_fn(vae, vp, irm),
                video_reward_fn=make_video_reward_fn(vae, vp, vrm),
            ),
            tmp_path / "closure",
        )
        factory, rparams = make_reward_fn_factory(
            vae, vp, image_rm=irm, video_rm=vrm
        )
        viafactory = build(
            dict(reward_fn_factory=factory, reward_params=rparams),
            tmp_path / "factory",
        )

        key = jax.random.PRNGKey(5)
        for trainer in (closure, viafactory):
            it = batch_iter()
            losses = []
            for _ in range(2):
                b = trainer.shard_batch(next(it))
                trainer.state, m = trainer._step_jit(trainer.state, b, key)
                losses.append(float(m["loss"]))
            trainer.final_losses = losses
            assert float(m["reward_loss"]) != 0.0

        np.testing.assert_allclose(
            viafactory.final_losses, closure.final_losses, rtol=1e-6
        )
        # constants-vs-args lower to different fusions, so expect float
        # epsilon, not bitwise equality
        for a, b in zip(
            jax.tree.leaves(closure.state["trainable"]),
            jax.tree.leaves(viafactory.state["trainable"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-8
            )
