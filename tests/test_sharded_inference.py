"""Sharded inference: the pipeline's sampling scan + VAE decode over a
(data, seq) mesh must produce EXACTLY the unsharded result (GSPMD is a
layout change, not a numerics change) — validated on the 8-device virtual
CPU mesh. This is the inference-side counterpart of the training dryrun
(ROADMAP #3 / VERDICT r1 next-step #8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.diffusion import DiffusionSchedule
from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig
from t2v_turbo_tpu.parallel.mesh import make_mesh
from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline

from tinymodels import tiny_unet


def build_pipe(mesh=None):
    unet = tiny_unet(time_cond_proj_dim=8)
    up = jax.jit(unet.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 8, 8, 4)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 7, 16)),
        fps=jnp.full((2,), 16.0), timestep_cond=jnp.zeros((2, 8)),
    )
    up = jax.tree.map(
        lambda p: p + 0.01 * np.random.RandomState(0).randn(*p.shape).astype(
            p.dtype
        ),
        up,
    )
    vae = AutoencoderKL(cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    return T2VTurboVC2Pipeline(
        unet=unet, unet_params=up, vae=vae, vae_params=vp,
        text_model=None, text_params=None, tokenizer=None,
        schedule=DiffusionSchedule.create(), vae_scale=2,
        w_embedding_dim=8, dtype=jnp.float32, mesh=mesh,
    )


def run(pipe, frames=4):
    ctx = jnp.asarray(
        np.random.RandomState(1).randn(2, 7, 16).astype(np.float32)
    )
    return pipe(
        prompt_embeds=ctx, height=16, width=16, frames=frames,
        num_inference_steps=2, key=jax.random.PRNGKey(7),
    )


class TestShardedInference:
    def test_matches_unsharded(self):
        ref = np.asarray(run(build_pipe(mesh=None)))
        mesh = make_mesh(seq=4)  # 8 CPU devices -> (data=2, seq=4)
        out = np.asarray(run(build_pipe(mesh=mesh)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    def test_tp_mesh_matches_unsharded(self):
        """(data, seq, model) mesh: the UNet weights go tensor-parallel
        (attention/FF/conv-channel splits, pipelines/vc2.py) and the result
        must still equal the unsharded run."""
        ref = np.asarray(run(build_pipe(mesh=None)))
        mesh = make_mesh(seq=2, model=2)  # (data=2, seq=2, model=2)
        pipe = build_pipe(mesh=mesh)
        out = np.asarray(run(pipe))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
        # the weights really are TP-placed
        flat = jax.tree_util.tree_flatten_with_path(pipe.unet_params)[0]
        assert any(
            "model" in str(leaf.sharding.spec)
            for _, leaf in flat
            if hasattr(leaf, "sharding")
        )

    def test_latents_are_sharded_through_the_scan(self):
        mesh = make_mesh(seq=4)
        pipe = build_pipe(mesh=mesh)
        lat = run(pipe)  # smoke: full call works
        # direct check on the sampling fn output sharding
        ctx = jnp.zeros((2, 7, 16))
        sample = pipe._sample_fn(2, 50, False, 0.3)
        from jax.sharding import NamedSharding, PartitionSpec as P

        latents = jax.device_put(
            jnp.zeros((2, 4, 8, 8, 4)), NamedSharding(mesh, P("data", "seq"))
        )
        row = NamedSharding(mesh, P("data"))
        out = sample(
            pipe.unet_params, latents, jax.device_put(ctx, row),
            jax.device_put(jnp.zeros((2, 8)), row),
            jax.device_put(jnp.full((2,), 16.0), row),
            jnp.float32(0.0), jax.random.PRNGKey(0),
        )
        # output keeps the (data, seq) layout — no implicit full gather
        assert len(out.addressable_shards) == 8
        shard_shape = out.addressable_shards[0].data.shape
        assert shard_shape[0] == 1 and shard_shape[1] == 1  # B/2, T/4

    def test_divisibility_error(self):
        mesh = make_mesh(seq=4)
        pipe = build_pipe(mesh=mesh)
        with pytest.raises(ValueError, match="divisible"):
            run(pipe, frames=6)  # 6 % 4 != 0

    def test_spatial_decode_fallback_matches_unsharded(self):
        """When b*t doesn't divide the mesh, VAE decode shards latent rows
        instead (conv halos + GN stats become collectives); the result must
        still equal the unsharded decode."""
        mesh = make_mesh(seq=4)
        pipe = build_pipe(mesh=mesh)
        # 6 latent frames don't divide the 8-dev mesh; latent rows (8) do
        z = jnp.asarray(
            np.random.RandomState(5).randn(6, 8, 8, 4).astype(np.float32)
        )
        ref = np.asarray(pipe._decode_jit(pipe.vae_params, z))
        from jax.sharding import NamedSharding, PartitionSpec as P

        zs = jax.device_put(
            z, NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
        )
        out = np.asarray(pipe._decode_jit(pipe.vae_params, zs))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


class TestShardedMSInference:
    """The MS backbone takes the same mesh (apps/generate.py now builds one
    for --backbone ms too); sharded must equal unsharded exactly."""

    def build(self, mesh=None):
        from t2v_turbo_tpu.models.unet_ms import (
            MSUNetConfig, MSUNet3DConditionModel,
        )
        from t2v_turbo_tpu.pipelines.ms import T2VTurboMSPipeline

        unet = MSUNet3DConditionModel(cfg=MSUNetConfig(
            block_out_channels=(32, 64), layers_per_block=1,
            attention_head_dim=16, cross_attention_dim=24,
            time_cond_proj_dim=8,
        ))
        up = jax.jit(unet.init)(
            jax.random.PRNGKey(0), jnp.zeros((2, 4, 8, 8, 4)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 7, 24)),
            timestep_cond=jnp.zeros((2, 8)),
        )
        vae = AutoencoderKL(
            cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
        )
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
        return T2VTurboMSPipeline(
            unet=unet, unet_params=up, vae=vae, vae_params=vp,
            text_model=None, text_params=None, tokenizer=None,
            schedule=DiffusionSchedule.create(), vae_scale=2,
            w_embedding_dim=8, dtype=jnp.float32, mesh=mesh,
        )

    def run(self, pipe):
        ctx = jnp.asarray(
            np.random.RandomState(1).randn(2, 7, 24).astype(np.float32)
        )
        return pipe(
            prompt_embeds=ctx, height=16, width=16, frames=4,
            num_inference_steps=2, key=jax.random.PRNGKey(7),
        )

    def test_matches_unsharded(self):
        ref = np.asarray(self.run(self.build(mesh=None)))
        out = np.asarray(self.run(self.build(mesh=make_mesh(seq=4))))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
