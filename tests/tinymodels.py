"""Shared tiny models for trainer-path tests.

This box has ONE CPU core, so XLA compiles are serial and slow; the round-1
trainer tests each compiled their own multi-minute LCD graph and never
finished in CI-sized windows. Two remedies live here:

- ONE canonical tiny-UNet config (single level, attention at full res) used
  identically by every trainer-path test file, so the persistent compile
  cache (tests/conftest.py) dedupes across files and runs.
- TinyStudent: a ~10-op conv net with the same call signature as the UNet
  apply fns. The trainer *machinery* (loop, sharding, checkpoint rotation,
  resume, LoRA isolation, EMA) is network-agnostic, so exercising it through
  TinyStudent compiles in seconds; the real-UNet-through-the-sharded-step
  path stays guarded by one dedicated integration test plus the driver's
  dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from t2v_turbo_tpu.diffusion.lcm import timestep_embedding
from t2v_turbo_tpu.models import UNetConfig, UNetModel

# Single-level config: ~40% cheaper to compile than the old two-level one,
# still covers temporal+spatial attention, prob capture, and conditioning.
TINY_UNET_KW = dict(
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(1,),
    channel_mult=(1,),
    num_head_channels=16,
    context_dim=16,
    temporal_length=4,
    time_cond_proj_dim=8,
)


def tiny_unet(**overrides):
    kw = dict(TINY_UNET_KW, **overrides)
    return UNetModel(cfg=UNetConfig(**kw))


def tiny_unet_pair(b=1, t=4, hw=8):
    """(student, student_params, teacher, teacher_params) with jitted inits
    (eager flax init compiles hundreds of micro-ops individually; one jitted
    init is a single cacheable compile)."""
    student = tiny_unet()
    teacher = tiny_unet(time_cond_proj_dim=None)
    x = jnp.zeros((b, t, hw, hw, 4))
    ts = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 7, TINY_UNET_KW["context_dim"]))
    sp = jax.jit(student.init)(
        jax.random.PRNGKey(0), x, ts, ctx, timestep_cond=jnp.zeros((b, 8))
    )
    tp = jax.jit(teacher.init)(jax.random.PRNGKey(1), x, ts, ctx)
    return student, sp, teacher, tp


class TinyStudent(nn.Module):
    """Minimal stand-in denoiser with the UNet apply signature: consumes
    latents, timesteps, context, fps, and the LCM w-embedding, produces a
    same-shape output with gradient flow from every input."""

    features: int = 16
    w_dim: int = 8

    @nn.compact
    def __call__(self, z, timesteps, ctx, fps=None, timestep_cond=None):
        emb = nn.Dense(self.features)(
            timestep_embedding(timesteps, self.features)
        )
        if timestep_cond is not None:
            emb = emb + nn.Dense(self.features)(timestep_cond)
        if fps is not None:
            emb = emb + nn.Dense(self.features)(
                timestep_embedding(fps.astype(jnp.float32), self.features)
            )
        emb = emb + nn.Dense(self.features)(ctx.mean(axis=1))
        h = nn.Conv(self.features, (1, 3, 3))(z)
        h = nn.silu(h + emb[:, None, None, None, :])
        return nn.Conv(z.shape[-1], (1, 3, 3))(h)


def tiny_student_pair(b=1, t=4, hw=8, ctx_dim=16):
    """(student, sp, teacher, tp) toy pair for trainer-machinery tests."""
    student = TinyStudent()
    teacher = TinyStudent()
    x = jnp.zeros((b, t, hw, hw, 4))
    ts = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 7, ctx_dim))
    fps = jnp.full((b,), 16.0)
    # init with every optional input the trainers feed (fps comes from the
    # batch), so the compact param tree covers all branches
    sp = student.init(
        jax.random.PRNGKey(0), x, ts, ctx, fps=fps,
        timestep_cond=jnp.zeros((b, 8)),
    )
    tp = teacher.init(jax.random.PRNGKey(1), x, ts, ctx, fps=fps)
    return student, sp, teacher, tp
