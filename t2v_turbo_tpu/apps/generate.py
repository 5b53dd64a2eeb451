"""CLI: prompt -> video (predict.py / app.py parity surface).

Usage:
  python -m t2v_turbo_tpu.apps.generate \
      --prompt "An astronaut riding a horse" \
      --checkpoint /path/to/VideoCrafter2+lora-collapsed.ckpt \
      --unet-ckpt /path/to/unet.pt \
      --steps 4 --frames 16 --fps 16 --seed 123 --output out.mp4

Without --checkpoint, --random-weights must be passed explicitly (smoke /
benchmark mode). Cf. reference predict.py:30-139, app.py:201-392.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo TPU text-to-video")
    p.add_argument("--prompt", required=True)
    p.add_argument("--backbone", default="vc2", choices=["vc2", "ms"],
                   help="vc2 = VideoCrafter2 320x512; ms = ModelScope 256x256")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None, help="VideoCrafter2 model.ckpt")
    p.add_argument("--unet-ckpt", default=None, help="LCM student unet.pt (v2) or collapsed-LoRA weights")
    p.add_argument("--lora-ckpt", default=None,
                   help="cloneofsimo unet_lora.pt (v1) or this trainer's "
                        "unet_lora.npz; folded into the base UNet")
    p.add_argument("--ms-dir", default=None,
                   help="ModelScope diffusers multi-file directory with "
                        "unet/ vae/ text_encoder/ subfolders "
                        "(reference app_ms.py:181-227)")
    p.add_argument("--random-weights", action="store_true",
                   help="run with random weights (smoke mode, no checkpoint)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--lcm-origin-steps", type=int, default=50)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--motion-gs", type=float, default=0.05)
    p.add_argument("--use-motion-cond", action="store_true")
    p.add_argument("--percentage", type=float, default=0.3)
    p.add_argument("--num-videos", type=int, default=1)
    p.add_argument("--data-shards", type=int, default=1,
                   help="mesh data axis (videos in parallel across chips)")
    p.add_argument("--seq-shards", type=int, default=1,
                   help="mesh seq axis (frames sharded across chips for "
                        "latency; temporal collectives ride ICI)")
    p.add_argument("--model-shards", type=int, default=1,
                   help="mesh model axis (tensor-parallel UNet weights: "
                        "attention/FF column-row splits + conv-channel "
                        "pairs; the third latency axis once seq is "
                        "exhausted at T<=48)")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--save-fps", type=int, default=8)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args(argv)


def _maybe_make_mesh(args):
    """Build the inference mesh from --data/--seq/--model-shards, or None.

    Uses exactly data*seq*model devices (the first that many), leaving any
    extras idle rather than inflating the data axis: generate runs ONE video
    (batch 1), so a silently-grown data axis would fail the pipeline's
    batch-divisibility check on any host with spare devices."""
    if args.data_shards * args.seq_shards * args.model_shards <= 1:
        return None
    import jax

    from ..parallel.mesh import make_mesh

    need = args.data_shards * args.seq_shards * args.model_shards
    devs = jax.devices()
    if len(devs) < need:
        raise SystemExit(
            f"--data/--seq/--model-shards need {need} devices, "
            f"have {len(devs)}"
        )
    return make_mesh(devices=devs[:need], data=args.data_shards,
                     seq=args.seq_shards, model=args.model_shards)


def load_vc2_checkpoint_params(args, spec):
    """Import (unet, vae, text) param pytrees from torch checkpoints.

    Needs only the typed config (for key mapping) — no flax module is
    constructed, so an AOT-artifact serving host (apps/serve.py
    --artifacts) can load weights without any model code.
    """
    from ..io.torch_import import (
        import_clip_text_params,
        import_unet_params,
        import_vae_params,
        load_torch_state_dict,
        split_vc2_checkpoint,
    )

    sd = load_torch_state_dict(args.checkpoint)
    unet_sd, vae_sd, clip_sd = split_vc2_checkpoint(sd)
    if args.unet_ckpt:
        unet_sd = load_torch_state_dict(args.unet_ckpt)
    unet_params = {"params": import_unet_params(unet_sd, spec.unet)}
    if args.lora_ckpt:
        if args.lora_ckpt.endswith(".npz"):
            # this repo's trainer export (lora.save_lora_npz)
            from ..lora import load_lora_npz, merge_lora

            unet_params = merge_lora(unet_params, load_lora_npz(args.lora_ckpt))
        else:
            from ..io.lora_import import apply_lora_pt, load_lora_pt

            unet_params = apply_lora_pt(
                unet_params, load_lora_pt(args.lora_ckpt), spec.unet
            )
    vae_params = {"params": import_vae_params(vae_sd)}
    text_params = {"params": import_clip_text_params(clip_sd)}
    return unet_params, vae_params, text_params


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from ..config import load_vc2_config
    from ..models.clip_text import CLIPTextModel
    from ..models.unet_vc2 import UNetModel
    from ..models.vae import AutoencoderKL
    from ..pipelines.vc2 import T2VTurboVC2Pipeline
    from ..utils.tokenizer import CLIPTokenizer

    backbone = getattr(args, "backbone", "vc2")
    if backbone == "ms":
        return build_ms_pipeline(args)
    spec = load_vc2_config(args.config, time_cond_proj_dim=256)
    dtype = jnp.bfloat16
    unet = UNetModel(cfg=spec.unet, dtype=dtype)
    vae = AutoencoderKL(cfg=spec.vae, dtype=dtype)
    text_model = CLIPTextModel(dtype=dtype)
    tokenizer = CLIPTokenizer()

    if args.checkpoint:
        unet_params, vae_params, text_params = load_vc2_checkpoint_params(
            args, spec
        )
    elif args.random_weights:
        import jax.random as jr

        b = 1
        x = jnp.zeros((b, args.frames, args.height // 8, args.width // 8, 4), dtype)
        unet_params = jax.jit(
            lambda k: unet.init(
                k, x, jnp.zeros((b,), jnp.int32), jnp.zeros((b, 77, 1024), dtype),
                fps=jnp.full((b,), 16.0), timestep_cond=jnp.zeros((b, 256), dtype),
            )
        )(jr.PRNGKey(0))
        vae_params = jax.jit(
            lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), dtype))
        )(jr.PRNGKey(1))
        text_params = jax.jit(
            lambda k: text_model.init(k, jnp.zeros((1, 77), jnp.int32))
        )(jr.PRNGKey(2))
    else:
        print("error: provide --checkpoint or pass --random-weights", file=sys.stderr)
        sys.exit(2)

    mesh = _maybe_make_mesh(args)
    return T2VTurboVC2Pipeline(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_model=text_model,
        text_params=text_params,
        tokenizer=tokenizer,
        schedule=spec.make_schedule(),
        scale_factor=spec.scale_factor,
        dtype=dtype,
        mesh=mesh,
    )


def build_ms_pipeline(args):
    """ModelScope backbone (reference app_ms.py / t2v_turbo_ms_pipeline):
    diffusers UNet3D + SD VAE + full-depth CLIP text tower, 256x256/4-step."""
    import jax
    import jax.numpy as jnp

    from ..models.clip_text import CLIPTextConfig, CLIPTextModel
    from ..models.unet_ms import MSUNetConfig, MSUNet3DConditionModel
    from ..models.vae import AutoencoderKL, VAEConfig
    from ..pipelines.ms import T2VTurboMSPipeline
    from ..utils.tokenizer import CLIPTokenizer

    dtype = jnp.bfloat16
    ucfg = MSUNetConfig(time_cond_proj_dim=256)
    unet = MSUNet3DConditionModel(cfg=ucfg, dtype=dtype)
    vae = AutoencoderKL(cfg=VAEConfig(), dtype=dtype)
    tokenizer = CLIPTokenizer()

    if args.ms_dir:
        # full diffusers multi-file layout (reference app_ms.py:181-227)
        from ..io.torch_import import import_ms_unet_params, load_ms_components
        from ..io.torch_import import load_torch_state_dict

        comps = load_ms_components(args.ms_dir)
        unet_params = {"params": comps["unet"]}
        if args.unet_ckpt:  # LCM student unet.pt overrides the teacher UNet
            unet_params = {"params": import_ms_unet_params(
                load_torch_state_dict(args.unet_ckpt)
            )}
        if args.lora_ckpt:
            # reference app_ms.py:206-215: LoRA r=32 folded into the base
            # UNet (collapse_lora + monkeypatch_remove_lora)
            from ..io.lora_import import apply_lora_pt_ms, load_lora_pt

            unet_params = apply_lora_pt_ms(
                unet_params, load_lora_pt(args.lora_ckpt), ucfg
            )
        vae_params = {"params": comps["vae"]}
        text_model = CLIPTextModel(
            cfg=CLIPTextConfig(**comps["text_cfg"]), dtype=dtype
        )
        text_params = {"params": comps["text"]}
    elif args.random_weights:
        import jax.random as jr

        text_model = CLIPTextModel(
            cfg=CLIPTextConfig(penultimate=False), dtype=dtype
        )
        f, h8, w8 = args.frames, args.height // 8, args.width // 8
        unet_params = jax.jit(lambda k: unet.init(
            k, jnp.zeros((1, f, h8, w8, 4), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 1024), dtype), timestep_cond=jnp.zeros((1, 256), dtype),
        ))(jr.PRNGKey(0))
        vae_params = jax.jit(lambda k: vae.init(
            k, jnp.zeros((1, 64, 64, 3), dtype)))(jr.PRNGKey(1))
        text_params = jax.jit(lambda k: text_model.init(
            k, jnp.zeros((1, 77), jnp.int32)))(jr.PRNGKey(2))
    else:
        import sys as _sys

        print("error: MS backbone requires --ms-dir (diffusers layout) or "
              "--random-weights", file=_sys.stderr)
        raise SystemExit(2)

    from ..diffusion import DiffusionSchedule

    mesh = _maybe_make_mesh(args)
    return T2VTurboMSPipeline(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_model=text_model,
        text_params=text_params,
        tokenizer=tokenizer,
        schedule=DiffusionSchedule.create(),
        dtype=dtype,
        mesh=mesh,
    )


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ..io.video import save_video
    from ..pipelines.vc2 import video_to_uint8

    t0 = time.time()
    pipe = build_pipeline(args)
    print(f"pipeline ready in {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    video = pipe(
        prompt=args.prompt,
        height=args.height,
        width=args.width,
        frames=args.frames,
        fps=args.fps,
        guidance_scale=args.guidance_scale,
        motion_gs=args.motion_gs,
        use_motion_cond=args.use_motion_cond,
        percentage=args.percentage,
        num_videos_per_prompt=args.num_videos,
        num_inference_steps=args.steps,
        lcm_origin_steps=args.lcm_origin_steps,
        key=jax.random.PRNGKey(args.seed),
    )
    frames = video_to_uint8(video)
    print(
        f"generated {frames.shape} in {time.time()-t0:.1f}s (incl. compile)",
        file=sys.stderr,
    )
    for i in range(frames.shape[0]):
        out = args.output if frames.shape[0] == 1 else (
            f"{args.output.rsplit('.', 1)[0]}_{i}.{args.output.rsplit('.', 1)[1]}"
        )
        written = save_video(frames[i], out, fps=args.save_fps)
        print(written)


if __name__ == "__main__":
    main()
