"""CLI: DDIM inversion -> reconstruction round trip (inverse_ddim.py parity).

Encodes a video, inverts it with the DDIM solver, re-samples deterministic
DDIM from the inverted noise, and reports the reconstruction error — the
solver-consistency correctness probe (reference inverse_ddim.py:21-96).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DDIM inversion round trip")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--tiny-model", action="store_true")
    p.add_argument("--video", default=None)
    p.add_argument("--prompt", default="")
    p.add_argument("--n-frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-ddim-timesteps", type=int, default=50)
    p.add_argument("--invert-steps", type=int, default=25)
    p.add_argument("--output", default=None, help="save reconstruction mp4")
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
    from ..diffusion.lcm import predicted_origin
    from ..models.unet_vc2 import UNetConfig, UNetModel
    from ..training.motion import reverse_ddim_loop

    if args.tiny_model:
        ucfg = UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(2, 1),
            channel_mult=(1, 2), num_head_channels=16, context_dim=16,
            temporal_length=4, fps_cond=False,
        )
        ctx_shape, lat_shape = (1, 7, 16), (1, 4, 8, 8, 4)
    else:
        from ..config import load_vc2_config

        spec = load_vc2_config(args.config)
        ucfg = spec.unet
        ctx_shape = (1, 77, ucfg.context_dim)
        lat_shape = (1, args.n_frames, args.height // 8, args.width // 8, 4)

    unet = UNetModel(cfg=ucfg)
    rng = np.random.RandomState(args.seed)
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
        from ..data import videoio
        from ..data.transforms import normalize_video, resize_crop

        sd = load_torch_state_dict(args.checkpoint)
        unet_sd, vae_sd, clip_sd = split_vc2_checkpoint(sd)
        params = {"params": import_unet_params(unet_sd, ucfg)}
        vae = AutoencoderKL(cfg=spec.vae)
        vp = {"params": import_vae_params(vae_sd)}
        text = CLIPTextModel()
        tp = {"params": import_clip_text_params(clip_sd)}
        tok = CLIPTokenizer()
        ctx = jax.jit(lambda t: text.apply(tp, t))(jnp.asarray(tok([args.prompt])))
        raw = videoio.decode(args.video, n_frames=args.n_frames)
        raw = resize_crop(raw, (args.height, args.width))
        z0 = encode_video(
            vae, vp, jnp.asarray(normalize_video(raw))[None],
            scale_factor=spec.scale_factor,
        )
    elif args.random_weights:
        params = unet.init(
            jax.random.PRNGKey(0), jnp.zeros(lat_shape),
            jnp.zeros((1,), jnp.int32), jnp.zeros(ctx_shape),
        )
        ctx = jnp.asarray(rng.randn(*ctx_shape).astype(np.float32))
        z0 = jnp.asarray(rng.randn(*lat_shape).astype(np.float32)) * 0.2
    else:
        print("error: provide --checkpoint or --random-weights", file=sys.stderr)
        sys.exit(2)

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(
        np.asarray(sched.alphas_cumprod), ddim_timesteps=args.num_ddim_timesteps
    )

    def apply(p, z, ts, c, fps=None):
        return unet.apply(p, z, ts, c, fps=fps)

    n = args.invert_steps
    z_inv = reverse_ddim_loop(
        apply, params, z0, ctx, solver, num_steps=n, return_intermediates=False
    )

    # deterministic DDIM back down the same grid
    @jax.jit
    def resample(z):
        def body(lat, i):
            idx = n - 1 - i
            ib = jnp.full((lat.shape[0],), idx, jnp.int32)
            ts = solver.index_to_timestep(ib)
            eps = apply(params, lat, ts, ctx).astype(jnp.float32)
            x0 = predicted_origin(eps, ts, lat, "epsilon", sched)
            lat = solver.ddim_step(x0, eps, ib)
            return lat, None

        out, _ = jax.lax.scan(body, z, jnp.arange(n))
        return out

    z_rec = resample(z_inv)
    err = float(jnp.sqrt(jnp.mean((z_rec - z0) ** 2)))
    rel = err / float(jnp.sqrt(jnp.mean(z0**2)))
    print(f"inversion round-trip: rmse={err:.5f} relative={rel:.4f}")

    if args.checkpoint and args.output:
        from ..io.video import save_video
        from ..models.vae import decode_video
        from ..pipelines.vc2 import video_to_uint8

        video = decode_video(vae, vp, z_rec, scale_factor=spec.scale_factor)
        print(save_video(video_to_uint8(video)[0], args.output))
    return rel


if __name__ == "__main__":
    main()
