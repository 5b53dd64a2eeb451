"""CLI: offline v2 data production (preprocess_* scripts parity).

Reads videos (CSV or tar shards), VAE-encodes, runs the teacher (+ optional
DDIM inversion and motion-prior score), writes one pickle per sample.

Smoke mode: --random-weights --synthetic-data writes valid pickles from a
random teacher (structure-checking the v2 data path without checkpoints).
"""

from __future__ import annotations

import argparse
import glob
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo v2 preprocessing")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--tiny-model", action="store_true")
    p.add_argument("--data-csv", default=None)
    p.add_argument("--data-shards", default=None)
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--n-frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-ddim-timesteps", type=int, default=50)
    p.add_argument("--max-percentage", type=float, default=0.3)
    p.add_argument("--no-motion-prior", action="store_true")
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
    from ..models.unet_vc2 import UNetConfig, UNetModel
    from ..training.preprocess import (
        PreprocessConfig,
        make_preprocess_fn,
        save_sample,
    )

    if args.tiny_model:
        ucfg = UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(2, 1),
            channel_mult=(1, 2), num_head_channels=16, context_dim=16,
            temporal_length=4, fps_cond=False,
        )
        ctx_shape = (1, 7, 16)
        lat_shape = (1, 4, 8, 8, 4)
    else:
        from ..config import load_vc2_config

        spec = load_vc2_config(args.config)
        ucfg = spec.unet
        ctx_shape = (1, 77, ucfg.context_dim)
        lat_shape = (1, args.n_frames, args.height // 8, args.width // 8, 4)

    teacher = UNetModel(cfg=ucfg)
    if args.checkpoint:
        from ..io.torch_import import (
            import_unet_params,
            load_torch_state_dict,
            split_vc2_checkpoint,
        )

        sd = load_torch_state_dict(args.checkpoint)
        unet_sd, _, _ = split_vc2_checkpoint(sd)
        params = {"params": import_unet_params(unet_sd, ucfg)}
    elif args.random_weights:
        params = teacher.init(
            jax.random.PRNGKey(0),
            jnp.zeros(lat_shape),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros(ctx_shape),
        )
    else:
        print("error: provide --checkpoint or --random-weights", file=sys.stderr)
        sys.exit(2)

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(
        np.asarray(sched.alphas_cumprod), ddim_timesteps=args.num_ddim_timesteps
    )
    cfg = PreprocessConfig(
        num_ddim_timesteps=args.num_ddim_timesteps,
        max_percentage=args.max_percentage,
        with_motion_prior=not args.no_motion_prior,
    )

    def apply(p, z, ts, c, fps=None):
        return teacher.apply(p, z, ts, c, fps=fps)

    def apply_mut(p, z, ts, c, fps=None):
        return teacher.apply(
            p, z, ts, c, fps=fps, record_probs=True, mutable=["intermediates"]
        )

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    def synthetic():
        for i in range(args.num_samples):
            yield (
                f"synthetic_{i:06d}",
                jnp.asarray(rng.randn(*lat_shape).astype(np.float32)) * 0.2,
                jnp.asarray(rng.randn(*ctx_shape).astype(np.float32)),
                f"synthetic sample {i}",
            )

    def from_videos():
        from ..models.vae import AutoencoderKL
        from ..models.clip_text import CLIPTextModel
        from ..io.torch_import import (
            import_clip_text_params,
            import_vae_params,
            load_torch_state_dict,
            split_vc2_checkpoint,
        )
        from ..utils.tokenizer import CLIPTokenizer

        sd = load_torch_state_dict(args.checkpoint)
        _, vae_sd, clip_sd = split_vc2_checkpoint(sd)
        vae = AutoencoderKL(cfg=spec.vae)
        text = CLIPTextModel()
        vp = {"params": import_vae_params(vae_sd)}
        tp = {"params": import_clip_text_params(clip_sd)}
        tok = CLIPTokenizer()
        encode = jax.jit(
            lambda v: vae.apply(vp, v, method=vae.encode)[0] * spec.scale_factor
        )
        embed = jax.jit(lambda t: text.apply(tp, t))

        if args.data_csv:
            from ..data.datasets import MP4Dataset, read_csv_index

            ds = MP4Dataset(
                read_csv_index(args.data_csv), n_frames=args.n_frames,
                size_hw=(args.height, args.width), random_crop=False,
            )
            for i in range(min(len(ds), args.num_samples)):
                item = ds[i]
                v = jnp.asarray(item["video"])[None]
                z = encode(v.reshape(-1, *v.shape[2:]))[None]
                yield (f"sample_{i:06d}", z,
                       embed(jnp.asarray(tok([item["text"]]))), item["text"])
        else:
            from ..data.webdata import WebVideoDataset

            ds = WebVideoDataset(
                sorted(glob.glob(args.data_shards)), batch_size=1,
                n_frames=args.n_frames, size_hw=(args.height, args.width),
                loop=False, random_crop=False,
            )
            for i, batch in enumerate(ds):
                if i >= args.num_samples:
                    break
                v = jnp.asarray(batch["video"])
                z = encode(v.reshape(-1, *v.shape[2:]))[None]
                yield (f"sample_{i:06d}", z,
                       embed(jnp.asarray(tok(batch["txt"]))), batch["txt"][0])

    source = synthetic() if args.synthetic_data else from_videos()
    uncond = jnp.zeros(ctx_shape)

    # build the jitted per-sample core ONCE: every sample reuses the same
    # compiled program (inversion scan + motion fwd/bwd + teacher outputs)
    run = make_preprocess_fn(
        teacher_apply=apply,
        teacher_apply_mutable=None if args.no_motion_prior else apply_mut,
        sched=sched, solver=solver, cfg=cfg,
    )

    written = 0
    for name, latents, ctx, txt in source:
        key, sub = jax.random.split(key)
        d = run(params, latents, ctx, uncond, sub, txt=txt)
        print(save_sample(args.output_dir, name, d))
        written += 1
    print(f"wrote {written} samples to {args.output_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
