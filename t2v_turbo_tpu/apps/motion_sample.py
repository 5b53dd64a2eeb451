"""CLI: MotionClone-style motion transfer sampling (motion_prior_sample.py
parity): DDIM-invert a reference video, then generate a new prompt's video
with the reference's motion via temporal-attention guidance."""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo motion transfer")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--tiny-model", action="store_true")
    p.add_argument("--reference-video", default=None, help="mp4 with the motion")
    p.add_argument("--reference-prompt", default="")
    p.add_argument("--prompt", required=True)
    p.add_argument("--n-frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-ddim-timesteps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--percentage", type=float, default=0.3)
    p.add_argument("--temp-loss-scale", type=float, default=100.0)
    p.add_argument("--output", default="motion_out.mp4")
    p.add_argument("--save-fps", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ..diffusion import DDIMSolver, DiffusionSchedule
    from ..io.video import save_video
    from ..models.unet_vc2 import UNetConfig, UNetModel
    from ..pipelines.motion_clone import MotionCloneConfig, motion_transfer_sample
    from ..pipelines.vc2 import video_to_uint8

    if args.tiny_model:
        ucfg = UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(2, 1),
            channel_mult=(1, 2), num_head_channels=16, context_dim=16,
            temporal_length=4, fps_cond=False,
        )
        ctx_shape = (1, 7, 16)
        lat_shape = (1, 4, 8, 8, 4)
        spec = None
    else:
        from ..config import load_vc2_config

        spec = load_vc2_config(args.config)
        ucfg = spec.unet
        ctx_shape = (1, 77, ucfg.context_dim)
        lat_shape = (1, args.n_frames, args.height // 8, args.width // 8, 4)

    unet = UNetModel(cfg=ucfg)
    key = jax.random.PRNGKey(args.seed)

    if args.checkpoint:
        from ..io.torch_import import (
            import_clip_text_params,
            import_unet_params,
            import_vae_params,
            load_torch_state_dict,
            split_vc2_checkpoint,
        )
        from ..models.clip_text import CLIPTextModel
        from ..models.vae import AutoencoderKL, encode_video
        from ..utils.tokenizer import CLIPTokenizer

        sd = load_torch_state_dict(args.checkpoint)
        unet_sd, vae_sd, clip_sd = split_vc2_checkpoint(sd)
        params = {"params": import_unet_params(unet_sd, ucfg)}
        vae = AutoencoderKL(cfg=spec.vae)
        vp = {"params": import_vae_params(vae_sd)}
        text = CLIPTextModel()
        tp = {"params": import_clip_text_params(clip_sd)}
        tok = CLIPTokenizer()
        embed = jax.jit(lambda t: text.apply(tp, t))
        original_ctx = embed(jnp.asarray(tok([args.reference_prompt])))
        inference_ctx = embed(jnp.asarray(tok([args.prompt])))
        uncond_ctx = embed(jnp.asarray(tok([""])))

        assert args.reference_video, "--reference-video required with --checkpoint"
        from ..data import videoio
        from ..data.transforms import normalize_video, resize_crop

        raw = videoio.decode(args.reference_video, n_frames=args.n_frames)
        raw = resize_crop(raw, (args.height, args.width))
        video = jnp.asarray(normalize_video(raw))[None]
        ref_latents = encode_video(vae, vp, video, scale_factor=spec.scale_factor)
    elif args.random_weights:
        params = unet.init(
            key, jnp.zeros(lat_shape), jnp.zeros((1,), jnp.int32),
            jnp.zeros(ctx_shape),
        )
        rng = np.random.RandomState(args.seed)
        ref_latents = jnp.asarray(rng.randn(*lat_shape).astype(np.float32)) * 0.2
        original_ctx = jnp.asarray(rng.randn(*ctx_shape).astype(np.float32))
        inference_ctx = jnp.asarray(rng.randn(*ctx_shape).astype(np.float32))
        uncond_ctx = jnp.zeros(ctx_shape)
        vae = vp = spec = None
    else:
        print("error: provide --checkpoint or --random-weights", file=sys.stderr)
        sys.exit(2)

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(
        np.asarray(sched.alphas_cumprod), ddim_timesteps=args.num_ddim_timesteps
    )

    def apply(p, z, ts, c, fps=None):
        return unet.apply(p, z, ts, c, fps=fps)

    def apply_mut(p, z, ts, c, fps=None):
        return unet.apply(
            p, z, ts, c, fps=fps, record_probs=True, mutable=["intermediates"]
        )

    t0 = time.time()
    latents = motion_transfer_sample(
        unet_apply=apply,
        unet_apply_mutable=apply_mut,
        params=params,
        ref_latents=ref_latents,
        original_ctx=original_ctx,
        inference_ctx=inference_ctx,
        uncond_ctx=uncond_ctx,
        sched=sched,
        solver=solver,
        cfg=MotionCloneConfig(
            num_ddim_timesteps=args.num_ddim_timesteps,
            guidance_scale=args.guidance_scale,
            percentage=args.percentage,
            temp_loss_scale=args.temp_loss_scale,
        ),
    )
    print(f"sampled in {time.time()-t0:.1f}s; latents {latents.shape}", file=sys.stderr)

    if args.checkpoint:
        from ..models.vae import decode_video

        dec = jax.jit(
            lambda p, z: vae.apply(p, z / spec.scale_factor, method=vae.decode)
        )
        b, t, hh, ww, cc = latents.shape
        frames = dec(vp, latents.reshape(b * t, hh, ww, cc))
        video = frames.reshape(b, t, *frames.shape[1:])
        out = save_video(video_to_uint8(video)[0], args.output, fps=args.save_fps)
        print(out)
    else:
        np.save(args.output + ".latents.npy", np.asarray(latents))
        print(args.output + ".latents.npy")


if __name__ == "__main__":
    main()
