"""T2V-Turbo (VideoCrafter2) prompt→video pipeline, TPU-native.

Equivalent of the reference T2VTurboVC2Pipeline
(pipeline/t2v_turbo_vc2_pipeline.py:14-220), redesigned for XLA: the whole
LCM multistep loop — UNet forward, boundary-condition combine, renoise — is
ONE jitted `lax.scan` over timesteps (SURVEY.md §3.1's north star), VAE
decode is a second jit, and RNG is explicit key threading. Jitted programs
are cached per static shape bucket (frames, H, W, steps), so repeated calls
at the same operating point pay zero retrace cost.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (
    DiffusionSchedule,
    LCMScheduler,
    guidance_scale_embedding,
)
from ..models.clip_text import CLIPTextModel
from ..models.unet_vc2 import UNetModel
from ..models.vae import AutoencoderKL


@dataclasses.dataclass
class T2VTurboVC2Pipeline:
    """Bundles models + params + tokenizer + schedule.

    All heavy entry points are jit-cached methods; the object itself holds no
    device state beyond the param pytrees.
    """

    unet: UNetModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_model: CLIPTextModel
    text_params: Any
    tokenizer: Any
    schedule: DiffusionSchedule
    scale_factor: float = 0.18215
    vae_scale: int = 8
    w_embedding_dim: int = 256
    dtype: Any = jnp.bfloat16
    # Optional jax.sharding.Mesh with ("data", "seq", ...) axes: videos are
    # sharded B->data, frames T->seq through the whole sampling scan (XLA
    # inserts halo exchanges for the (3,1,1) temporal convs and all-gathers
    # for temporal attention over ICI), and VAE decode spreads frames over
    # every device. Params replicate lazily on first sharded call — except
    # when the mesh has a "model" axis > 1: then the UNet weights are
    # tensor-parallel (parallel/tp.py column/row splits over attention
    # projections, GEGLU FF, and the ResBlock/TemporalConv conv pairs), the
    # third latency axis for a single video once seq is exhausted at T<=48.
    mesh: Any = None

    def __post_init__(self):
        self.scheduler = LCMScheduler(schedule=self.schedule)
        self._params_placed = False
        self._encode_jit = jax.jit(
            lambda p, toks: self.text_model.apply(p, toks)
        )
        self._decode_jit = jax.jit(
            lambda p, z: self.vae.apply(
                p, z / self.scale_factor, method=self.vae.decode
            )
        )
        self._sample_jit_cache = {}

    # ------------------------------------------------------------------
    def encode_prompt(self, prompt: str | Sequence[str]) -> jax.Array:
        """prompt(s) -> (B, 77, 1024) cross-attention context
        (reference pipeline:34-68 + condition.py:257-283)."""
        tokens = self.tokenizer(prompt)
        return self._encode_jit(self.text_params, jnp.asarray(tokens))

    def _unet_call(self, unet_params, lat, tb, ctx, fps, w_emb, motion_cond):
        """Denoiser invocation — overridden by backbone-specific pipelines."""
        return self.unet.apply(
            unet_params,
            lat,
            tb,
            ctx,
            fps=fps,
            timestep_cond=w_emb,
            motion_cond=motion_cond,
        )

    # ------------------------------------------------------------------
    def _sample_fn(self, num_steps: int, lcm_origin_steps: int, use_motion_cond: bool, percentage: float):
        """Build (and cache) the jitted scan sampling program for a static
        step count."""
        cache_key = (num_steps, lcm_origin_steps, use_motion_cond, percentage)
        if cache_key in self._sample_jit_cache:
            return self._sample_jit_cache[cache_key]

        ts_np = self.scheduler.timesteps(num_steps, lcm_origin_steps)
        ts = jnp.asarray(ts_np, dtype=jnp.int32)
        prev_ts = jnp.concatenate([ts[1:], ts[-1:]])
        multistep = num_steps > 1
        # motion-cond time threshold (reference pipeline:190,197-204)
        thresh = self.schedule.num_timesteps * (1.0 - percentage)

        def sample(unet_params, latents, ctx, w_emb, fps, motion_gs, key):
            def body(carry, step_inputs):
                lat, key = carry
                t, pt = step_inputs
                tb = jnp.broadcast_to(t, (lat.shape[0],))
                motion_cond = None
                if use_motion_cond:
                    gs = jnp.where(t < thresh, 0.0, motion_gs)
                    motion_cond = guidance_scale_embedding(
                        jnp.broadcast_to(gs, (lat.shape[0],)),
                        self.w_embedding_dim,
                    ).astype(self.dtype)
                eps = self._unet_call(
                    unet_params, lat, tb, ctx, fps, w_emb, motion_cond
                )
                key, sub = jax.random.split(key)
                noise = (
                    jax.random.normal(sub, lat.shape, lat.dtype)
                    if multistep
                    else None
                )
                lat_next, denoised = self.scheduler.step(
                    eps.astype(jnp.float32),
                    t,
                    pt,
                    lat.astype(jnp.float32),
                    noise,
                )
                return (lat_next.astype(lat.dtype), key), denoised

            (_, _), denoised_seq = jax.lax.scan(
                body, (latents, key), (ts, prev_ts)
            )
            return denoised_seq[-1]

        fn = jax.jit(sample)
        self._sample_jit_cache[cache_key] = fn
        return fn

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt: str | Sequence[str] | None = None,
        height: int = 320,
        width: int = 512,
        frames: int = 16,
        fps: int = 16,
        guidance_scale: float = 7.5,
        motion_gs: float = 0.1,
        use_motion_cond: bool = False,
        percentage: float = 0.3,
        num_videos_per_prompt: int = 1,
        num_inference_steps: int = 4,
        lcm_origin_steps: int = 50,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "video",
        decode_frame_chunk: Optional[int] = None,
    ):
        """prompt -> video (B, T, H, W, 3) in [-1, 1] (or latents).

        Mirrors reference pipeline __call__:122-220: encode prompt, N(0,1)
        latents, w-embedding, LCM loop, per-frame VAE decode.
        """
        # the UNet downsamples the latent 2^(levels-1)x; reject sizes that
        # would break the skip concatenation deep in the net
        cfg = self.unet.cfg
        levels = len(
            getattr(cfg, "channel_mult", None)
            or getattr(cfg, "block_out_channels", (1, 2, 4, 4))
        )
        multiple = self.vae_scale * (2 ** (levels - 1))
        if height % multiple or width % multiple:
            raise ValueError(
                f"height/width must be multiples of {multiple} "
                f"(got {height}x{width})"
            )
        if key is None:
            key = jax.random.PRNGKey(0)
        if prompt_embeds is None:
            assert prompt is not None
            prompt_embeds = self.encode_prompt(prompt)
        if num_videos_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_videos_per_prompt, 0)
        bs = prompt_embeds.shape[0]

        key, lat_key, sample_key = jax.random.split(key, 3)
        if latents is None:
            latents = jax.random.normal(
                lat_key,
                (
                    bs,
                    frames,
                    height // self.vae_scale,
                    width // self.vae_scale,
                    self.unet.cfg.in_channels,
                ),
                self.dtype,
            )
        latents = latents * self.scheduler.init_noise_sigma

        w = jnp.full((bs,), guidance_scale, jnp.float32)
        w_emb = guidance_scale_embedding(w, self.w_embedding_dim).astype(self.dtype)
        fps_arr = jnp.full((bs,), float(fps))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_n = self.mesh.shape.get("data", 1)
            seq_n = self.mesh.shape.get("seq", 1)
            if bs % data_n or frames % seq_n:
                raise ValueError(
                    f"sharded inference needs batch {bs} divisible by the "
                    f"data axis ({data_n}) and frames {frames} by the seq "
                    f"axis ({seq_n})"
                )
            bt = NamedSharding(self.mesh, P("data", "seq"))
            row = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            latents = jax.device_put(latents, bt)
            prompt_embeds = jax.device_put(prompt_embeds, row)
            w_emb = jax.device_put(w_emb, row)
            fps_arr = jax.device_put(fps_arr, row)
            if not self._params_placed:
                if self.mesh.shape.get("model", 1) > 1:
                    from ..parallel.tp import tp_param_shardings

                    self.unet_params = jax.device_put(
                        self.unet_params,
                        tp_param_shardings(
                            self.mesh,
                            self.unet_params,
                            head_dim=getattr(
                                self.unet.cfg, "num_head_channels", None
                            ),
                            conv_channels=True,
                        ),
                    )
                else:
                    self.unet_params = jax.device_put(self.unet_params, rep)
                self.vae_params = jax.device_put(self.vae_params, rep)
                self._params_placed = True

        sample = self._sample_fn(
            num_inference_steps, lcm_origin_steps, use_motion_cond, percentage
        )
        denoised = sample(
            self.unet_params,
            latents,
            prompt_embeds.astype(self.dtype),
            w_emb,
            fps_arr,
            jnp.float32(motion_gs),
            sample_key,
        )

        if output_type == "latent":
            return denoised

        b, t, hh, ww, c = denoised.shape
        frames_flat = denoised.reshape(b * t, hh, ww, c).astype(self.dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = self.mesh.devices.size
            axes = tuple(self.mesh.axis_names)
            if (b * t) % n_dev == 0:
                # decode spreads frames over ALL mesh devices
                frames_flat = jax.device_put(
                    frames_flat, NamedSharding(self.mesh, P(axes))
                )
            elif hh % n_dev == 0:
                # frame count doesn't divide the mesh (short clips / large
                # meshes): shard latent ROWS instead — GSPMD turns the
                # decoder's conv halos and GroupNorm stats into ICI
                # collectives, so single-video decode latency still scales
                frames_flat = jax.device_put(
                    frames_flat, NamedSharding(self.mesh, P(None, axes))
                )
        chunk = decode_frame_chunk or b * t
        outs = [
            self._decode_jit(self.vae_params, frames_flat[i : i + chunk])
            for i in range(0, b * t, chunk)
        ]
        video = jnp.concatenate(outs, axis=0)
        return video.reshape(b, t, *video.shape[1:])


def video_to_uint8(video: jax.Array) -> np.ndarray:
    """[-1,1] float video -> uint8, host-side (reference app.py:97-99)."""
    v = np.asarray(jnp.clip((video.astype(jnp.float32) + 1.0) / 2.0, 0, 1))
    return (v * 255).round().astype(np.uint8)
