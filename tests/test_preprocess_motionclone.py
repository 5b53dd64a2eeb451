"""Preprocess job + MotionClone sampling pipeline tests (tiny configs)."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
from t2v_turbo_tpu.models import UNetConfig, UNetModel
from t2v_turbo_tpu.pipelines.motion_clone import (
    MotionCloneConfig,
    motion_transfer_sample,
)
from t2v_turbo_tpu.training.preprocess import (
    PreprocessConfig,
    preprocess_sample,
    save_sample,
)


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig(
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2),
        num_head_channels=16,
        context_dim=16,
        temporal_length=4,
        fps_cond=False,
    )
    model = UNetModel(cfg=cfg)
    x = jnp.zeros((1, 4, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), ctx)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.RandomState(0).randn(*p.shape).astype(p.dtype),
        params,
    )
    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod), ddim_timesteps=10)

    def apply(p, z, ts, c, fps=None):
        return model.apply(p, z, ts, c)

    def apply_mut(p, z, ts, c, fps=None):
        return model.apply(p, z, ts, c, record_probs=True, mutable=["intermediates"])

    return apply, apply_mut, params, sched, solver


class TestPreprocess:
    def test_no_motion_sample(self, setup, tmp_path):
        apply, apply_mut, params, sched, solver = setup
        cfg = PreprocessConfig(num_ddim_timesteps=10, with_motion_prior=False)
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 4)) * 0.2
        ctx = jnp.ones((1, 7, 16))
        d = preprocess_sample(
            latents=lat, prompt_emb=ctx, uncond_emb=jnp.zeros_like(ctx),
            key=jax.random.PRNGKey(2), teacher_apply=apply,
            teacher_apply_mutable=None, teacher_params=params,
            sched=sched, solver=solver, cfg=cfg,
        )
        assert d["z_t"].shape == (4, 8, 8, 4)
        assert not d["use_motion_guide"]
        assert np.allclose(d["score"], 0)
        # index in top band: [7, 10)
        assert 7 <= d["index"] < 10
        p = save_sample(str(tmp_path), "sample0", d)
        loaded = pickle.load(open(p, "rb"))
        assert set(loaded) >= {"index", "z_t", "cond_teacher_out",
                               "uncond_teacher_out", "score", "prompt_emb"}

    def test_motion_sample(self, setup, tmp_path):
        apply, apply_mut, params, sched, solver = setup
        cfg = PreprocessConfig(num_ddim_timesteps=10, with_motion_prior=True)
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8, 4)) * 0.2
        ctx = jnp.ones((1, 7, 16))
        d = preprocess_sample(
            latents=lat, prompt_emb=ctx, uncond_emb=jnp.zeros_like(ctx),
            key=jax.random.PRNGKey(4), teacher_apply=apply,
            teacher_apply_mutable=apply_mut, teacher_params=params,
            sched=sched, solver=solver, cfg=cfg,
        )
        assert d["use_motion_guide"]
        assert np.abs(d["score"]).sum() > 0
        assert "z_example" in d
        # feeds MP4LatentDataset directly
        from t2v_turbo_tpu.data.datasets import MP4LatentDataset

        p = save_sample(str(tmp_path), "m0", d)
        ds = MP4LatentDataset([p])
        batch = next(ds.batches(1))
        assert batch["z_t"].shape == (1, 4, 8, 8, 4)


class TestMotionClone:
    def test_transfer_sample(self, setup):
        apply, apply_mut, params, sched, solver = setup
        ref = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8, 4)) * 0.2
        ctx_o = jnp.ones((1, 7, 16))
        ctx_i = jnp.ones((1, 7, 16)) * 0.5
        out = motion_transfer_sample(
            unet_apply=apply,
            unet_apply_mutable=apply_mut,
            params=params,
            ref_latents=ref,
            original_ctx=ctx_o,
            inference_ctx=ctx_i,
            uncond_ctx=jnp.zeros_like(ctx_o),
            sched=sched,
            solver=solver,
            cfg=MotionCloneConfig(num_ddim_timesteps=10, percentage=0.3),
        )
        assert out.shape == ref.shape
        assert np.isfinite(np.asarray(out)).all()
