"""t2v_turbo_tpu — TPU-native (JAX / XLA / Pallas / pjit) framework for few-step
text-to-video generation via latent consistency distillation.

A ground-up rebuild of the capabilities of the T2V-Turbo reference
(Ji4chenLi/t2v-turbo): VideoCrafter2 / ModelScope 3D-UNet denoisers, LCM
scheduler + DDIM ODE solver, 2D VAE, OpenCLIP text tower, LoRA and
consistency-distillation training — designed TPU-first:

- channels-last (B, T, H, W, C) layouts for XLA convolutions,
- the whole sampling loop compiled as one `lax.scan` under `jit`,
- Pallas fused flash-attention for the spatio-temporal attention hot path,
- SPMD via `jax.sharding.Mesh` + NamedSharding (data/sequence axes),
- explicit `jax.random` key threading everywhere.
"""

__version__ = "0.1.0"
