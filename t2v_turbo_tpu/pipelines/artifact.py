"""Serve-from-artifacts pipeline: the product inference path rebuilt from
`apps/warmup.py --export` StableHLO programs, with NO model code.

The reference's serving host (app.py:201-392) must import the full lvdm
model tree and re-trace torch modules on every process start. The TPU-native
deployment story is different: `warmup --export DIR` serializes the three
production programs (sampling scan, VAE decode, text encode) via jax.export,
and this class rehydrates them and reproduces the pipeline's host-side
orchestration (pipelines/vc2.py __call__:150-296) around the fixed operating
point baked into the manifest. The serving host needs:

- the artifact dir (StableHLO blobs + manifest.json),
- the param pytrees (a checkpoint import — io/torch_import maps torch
  key trees to pytrees without constructing any flax module),
- the BPE tokenizer (pure Python + a vocab data file).

None of models/, ops/, or diffusion/ is imported here; every diffusion
constant (timestep grid, boundary scalings, scale_factor) is already baked
into the exported HLO, and the only host math is the guidance-scale Fourier
embedding (reference utils/common_utils.py:47-74), inlined below.

Exported programs are shape-specialized: requests must match the manifest's
operating point (steps/frames/height/width); prompt, seed, fps, and guidance
scale remain free runtime inputs. This mirrors production TPU serving, where
one warmed shape bucket serves all traffic at that operating point.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _guidance_scale_embedding(w: jax.Array, dim: int) -> jax.Array:
    """w*1000 sinusoidal Fourier embedding (reference common_utils.py:47-74).

    Duplicated from diffusion.lcm so this module stays free of the model
    packages; equality with the live pipeline is covered by the
    artifact-vs-live test (tests/test_serve.py)."""
    w = w.astype(jnp.float32) * 1000.0
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = w[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ArtifactPipeline:
    """Prompt -> video from exported StableHLO programs + param pytrees.

    Call surface mirrors T2VTurboVC2Pipeline.__call__ closely enough that
    apps/serve.py can swap it in unchanged; static knobs that differ from
    the baked operating point raise with a message naming the fixed point.
    """

    def __init__(
        self,
        *,
        sample,
        vae_decode,
        text_encode,
        op: dict,
        unet_params: Any,
        vae_params: Any,
        text_params: Any,
        tokenizer: Any = None,
    ):
        self._sample = sample
        self._decode = vae_decode
        self._encode = text_encode
        self.op = op
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.dtype = jnp.dtype(op["dtype"])
        # serve.py /healthz introspects this; artifacts have exactly one
        # compiled operating point
        self._sample_jit_cache = {
            (
                op["steps"],
                op["lcm_origin_steps"],
                op["use_motion_cond"],
                op["percentage"],
            ): None
        }

    # ------------------------------------------------------------------
    @classmethod
    def from_dir(
        cls,
        path: str,
        *,
        unet_params: Any,
        vae_params: Any,
        text_params: Any,
        tokenizer: Any = None,
    ) -> "ArtifactPipeline":
        from jax import export as jax_export

        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        op = manifest.get("operating_point")
        if op is None:
            raise ValueError(
                f"{path}/manifest.json has no operating_point — re-export "
                "with the current apps/warmup.py"
            )

        def load(name):
            art = manifest["programs"][name]["artifact"]
            with open(os.path.join(path, art), "rb") as f:
                return jax_export.deserialize(f.read())

        return cls(
            sample=load("sample"),
            vae_decode=load("vae_decode"),
            text_encode=load("text_encode"),
            op=op,
            unet_params=unet_params,
            vae_params=vae_params,
            text_params=text_params,
            tokenizer=tokenizer,
        )

    # ------------------------------------------------------------------
    def encode_prompt(self, prompt: str | Sequence[str]) -> jax.Array:
        tokens = self.tokenizer(prompt)
        return self._encode.call(self.text_params, jnp.asarray(tokens))

    def _check(self, name, got, want):
        if got != want:
            raise ValueError(
                f"artifact pipeline is compiled for {name}={want}; got "
                f"{got}. Re-export with `python -m t2v_turbo_tpu.apps.warmup "
                f"--export ...` at the requested operating point."
            )

    def __call__(
        self,
        prompt: str | Sequence[str] | None = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        frames: Optional[int] = None,
        fps: int = 16,
        guidance_scale: float = 7.5,
        motion_gs: float = 0.1,
        use_motion_cond: Optional[bool] = None,
        percentage: Optional[float] = None,
        num_videos_per_prompt: int = 1,
        num_inference_steps: Optional[int] = None,
        lcm_origin_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "video",
        decode_frame_chunk: Optional[int] = None,
    ):
        # Every static knob the live pipeline exposes is either checked
        # against the baked operating point or implemented as a runtime
        # input; an unknown kwarg is a TypeError, never silently ignored.
        op = self.op
        self._check("height", height if height is not None else op["height"], op["height"])
        self._check("width", width if width is not None else op["width"], op["width"])
        self._check("frames", frames if frames is not None else op["frames"], op["frames"])
        self._check(
            "steps",
            num_inference_steps if num_inference_steps is not None else op["steps"],
            op["steps"],
        )
        self._check(
            "lcm_origin_steps",
            lcm_origin_steps if lcm_origin_steps is not None else op["lcm_origin_steps"],
            op["lcm_origin_steps"],
        )
        if use_motion_cond is not None:
            self._check("use_motion_cond", use_motion_cond, op["use_motion_cond"])
        # percentage is baked into the motion-cond gating threshold of the
        # exported scan; it only affects output when motion-cond is on
        if percentage is not None and op["use_motion_cond"]:
            self._check("percentage", percentage, op["percentage"])
        if decode_frame_chunk is not None:
            self._check("decode_frame_chunk", decode_frame_chunk, op["decode_chunk"])

        if key is None:
            key = jax.random.PRNGKey(0)
        if prompt_embeds is None:
            assert prompt is not None
            prompt_embeds = self.encode_prompt(prompt)
        if num_videos_per_prompt != 1:
            # live-pipeline semantics (pipelines/vc2.py): duplicate the
            # embeddings per requested video; the batch check below catches
            # operating-point overflow
            prompt_embeds = jnp.repeat(prompt_embeds, num_videos_per_prompt, axis=0)
        bs = prompt_embeds.shape[0]
        self._check("batch", bs, op["batch"])

        # identical RNG stream to the live pipeline (pipelines/vc2.py:197)
        key, lat_key, sample_key = jax.random.split(key, 3)
        latent_shape = (
            bs,
            op["frames"],
            op["height"] // op["vae_scale"],
            op["width"] // op["vae_scale"],
            op["in_channels"],
        )
        if latents is None:
            latents = jax.random.normal(lat_key, latent_shape, self.dtype)
        else:
            # caller-provided initial noise (reproducing a generation):
            # a runtime input of the exported program, like the live path
            if tuple(latents.shape) != latent_shape:
                raise ValueError(
                    f"latents shape {tuple(latents.shape)} != compiled "
                    f"shape {latent_shape}"
                )
            latents = jnp.asarray(latents, self.dtype)
        # the live pipeline scales caller latents too (pipelines/vc2.py:210)
        latents = latents * op["init_noise_sigma"]

        w = jnp.full((bs,), guidance_scale, jnp.float32)
        w_emb = _guidance_scale_embedding(w, op["w_embedding_dim"]).astype(
            self.dtype
        )
        fps_arr = jnp.full((bs,), float(fps))

        denoised = self._sample.call(
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
        chunk = op["decode_chunk"] or b * t
        if (b * t) % chunk:
            raise ValueError(
                f"decode artifact is compiled for chunks of {chunk} frames; "
                f"{b * t} frames do not divide evenly"
            )
        outs = [
            self._decode.call(self.vae_params, frames_flat[i : i + chunk])
            for i in range(0, b * t, chunk)
        ]
        video = jnp.concatenate(outs, axis=0)
        return video.reshape(b, t, *video.shape[1:])


def video_to_uint8(video: jax.Array) -> np.ndarray:
    """[-1,1] float video -> uint8 (kept here so an artifact host can avoid
    importing pipelines.vc2, which pulls in the model packages)."""
    v = np.asarray(jnp.clip((video.astype(jnp.float32) + 1.0) / 2.0, 0, 1))
    return (v * 255).round().astype(np.uint8)
