"""CLI: v1 LoRA consistency distillation (train_t2v_turbo_v1_lora parity).

Usage (with checkpoints):
  python -m t2v_turbo_tpu.apps.train_v1 \
      --checkpoint VideoCrafter2_model.ckpt --data-shards 'shards/*.tar' \
      --output-dir runs/v1 --max-steps 10000

Smoke mode (no checkpoint, synthetic data):
  python -m t2v_turbo_tpu.apps.train_v1 --random-weights --synthetic-data \
      --tiny-model --max-steps 3 --output-dir /tmp/run
"""

from __future__ import annotations

import argparse
import glob
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo v1 LoRA LCD trainer")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--tiny-model", action="store_true",
                   help="small UNet (CI / smoke)")
    p.add_argument("--data-shards", default=None, help="glob of webdataset tars")
    p.add_argument("--prefix-weights", default=None,
                   help="mixture-of-prefixes shard resampling, e.g. "
                        "'path/a=0.7,path/b=0.3' (reference custom_wds.py "
                        "PrefixResampler)")
    p.add_argument("--data-csv", default=None, help="CSV of mp4 paths+captions")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--output-dir", default="runs/v1")
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=1, help="per host")
    p.add_argument("--n-frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--optimizer", default="adamw8bit",
                   choices=["adamw", "adamw_bf16", "adamw8bit"])
    p.add_argument("--lora-rank", type=int, default=64)
    p.add_argument("--w-min", type=float, default=5.0)
    p.add_argument("--w-max", type=float, default=15.0)
    p.add_argument("--num-ddim-timesteps", type=int, default=50)
    p.add_argument("--loss-type", default="huber", choices=["huber", "l2"])
    p.add_argument("--huber-c", type=float, default=0.001)
    p.add_argument("--checkpointing-steps", type=int, default=2000)
    p.add_argument("--checkpoints-total-limit", type=int, default=3)
    p.add_argument("--max-grad-norm", type=float, default=10.0)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1,
                   help="average grads over K micro-batches per update "
                        "(reference train_t2v_turbo_v1_lora.py:287-291)")
    p.add_argument("--seed", type=int, default=453645634)
    p.add_argument("--seq-shards", type=int, default=1,
                   help="mesh seq axis size (temporal sharding)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over the data axis "
                        "(ZeRO-3)")
    p.add_argument("--grads-bf16", action="store_true",
                   help="bf16 gradient tree (f32 Adam math/update; halves "
                        "grad memory — what fits full-model v2 on one 16 GB "
                        "chip, see TrainerConfig.grads_bf16)")
    p.add_argument("--split-step", action="store_true",
                   help="compile grad + optimizer-apply as two programs "
                        "(lower peak hbm, halves the largest compile; "
                        "bit-identical to the fused step)")
    # reward feedback (reference --reward_fn_name/--video_rm_name etc.)
    p.add_argument("--reward-fn", default="none",
                   choices=["none", "clip", "hpsv2", "pick", "img_reward"])
    p.add_argument("--reward-ckpt", default=None,
                   help="open_clip/HF/ImageReward checkpoint for the image "
                        "reward tower")
    p.add_argument("--bert-vocab", default=None,
                   help="BERT vocab.txt for the img_reward / vi_clip2 text "
                        "towers (smoke runs fall back to a hash tokenizer)")
    p.add_argument("--no-scan-towers", action="store_true",
                   help="lower the CLIP/ViCLIP reward towers unrolled "
                        "instead of as one scanned block over stacked "
                        "params (scan is the default: identical numerics, "
                        "~layers-x smaller HLO and far faster XLA compiles "
                        "for the rewards-ON training graph)")
    p.add_argument("--reward-scale", type=float, default=1.0)
    p.add_argument("--reward-frames", type=int, default=5,
                   help="random frames scored per sample")
    p.add_argument("--reward-fraction", type=float, default=0.75,
                   help="fraction of each batch carrying the image-reward "
                        "loss (role-as-data mask)")
    p.add_argument("--video-rm-fn", default="none",
                   choices=["none", "vi_clip", "vi_clip2"],
                   help="video reward tower; vi_clip2 (InternVideo2) is the "
                        "reference's default (train_t2v_turbo_v1_lora.py:518-520)")
    p.add_argument("--video-rm-ckpt", default=None)
    p.add_argument("--video-reward-scale", type=float, default=1.0)
    p.add_argument("--video-rm-frames", type=int, default=8)
    p.add_argument("--vae-decode-batch-size", type=int, default=16,
                   help="frames decoded per VAE chunk inside the reward "
                        "losses (reference --vae_decode_batch_size, "
                        "train_t2v_turbo_v1_lora.py:416-435); 0 = no "
                        "chunking")
    p.add_argument("--video-rm-fraction", type=float, default=0.25)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for multi-process "
                        "training (reference: accelerate multi-node DDP)")
    p.add_argument("--use-remat", action="store_true",
                   help="per-block activation rematerialization (reference use_checkpoint)")
    return p.parse_args(argv)


def build_reward_stack(args, spec):
    """Build the differentiable reward towers from the shared reward CLI
    flags (used by both the v1 and v2 trainer apps; reference flag surface
    train_t2v_turbo_v1_lora.py:506-547 / train_latent_t2v_turbo_v2.py:
    507-573). Returns (reward_fn_factory, reward_params, reward_models):
    the factory/params pair plugs into LCDTrainer so the tower + reward-VAE
    param trees ride the jitted step as runtime args (sharded under FSDP)
    instead of being baked into the program as constants."""
    import jax
    import jax.numpy as jnp

    # optional differentiable reward feedback
    reward_models = {}
    factory = reward_params = None
    if args.reward_fn != "none" or args.video_rm_fn != "none":
        from ..models.vae import AutoencoderKL, VAEConfig
        from ..training.reward_adapters import make_reward_fn_factory

        dchunk = getattr(args, "vae_decode_batch_size", None) or None
        if spec is not None and args.checkpoint:
            from ..io.torch_import import (
                import_vae_params,
                load_torch_state_dict,
                split_vc2_checkpoint,
            )

            _, vae_sd, _ = split_vc2_checkpoint(load_torch_state_dict(args.checkpoint))
            rvae = AutoencoderKL(cfg=spec.vae, dtype=jnp.bfloat16)
            rvae_params = {"params": import_vae_params(vae_sd)}
        else:
            rvae = AutoencoderKL(
                cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
                if args.tiny_model else VAEConfig()
            )
            rvae_params = rvae.init(
                jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3))
            )
        tiny_kw = {}
        if args.tiny_model:
            from ..models.clip_text import CLIPTextConfig
            from ..rewards.vit import VideoViTConfig, ViTConfig

            tiny_kw = dict(
                vit_cfg=ViTConfig(image_size=28, patch_size=14, width=32,
                                  layers=2, heads=4, output_dim=16),
                text_cfg=CLIPTextConfig(vocab_size=49408, width=32, heads=4,
                                        layers=2, context_length=77,
                                        penultimate=False),
            )
        bert_tok = None
        if args.bert_vocab:
            from ..utils.bert_tokenizer import BertWordPieceTokenizer

            bert_tok = BertWordPieceTokenizer(args.bert_vocab)
        if args.reward_fn == "img_reward":
            from ..rewards.blip import (
                BertConfig,
                BlipViTConfig,
                build_image_reward_blip,
            )
            from ..rewards.reward_fn import BlipTrainReward

            weights = None
            if args.reward_ckpt:
                from ..io.torch_import import (
                    import_image_reward_params,
                    load_torch_state_dict,
                )

                weights = import_image_reward_params(
                    load_torch_state_dict(args.reward_ckpt)
                )
            bkw = {}
            if args.tiny_model:
                bkw = dict(
                    vit_cfg=BlipViTConfig(image_size=28, patch_size=14,
                                          width=32, layers=2, heads=4),
                    bert_cfg=BertConfig(vocab_size=30524, hidden=32, layers=2,
                                        heads=4, intermediate=64,
                                        encoder_width=32),
                    head_dims=(8, 1),
                )
            rm = BlipTrainReward(
                build_image_reward_blip(
                    weights=weights, scan_layers=not args.no_scan_towers, **bkw
                ),
                tokenizer=bert_tok,
            )
            reward_models["image"] = rm
        elif args.reward_fn != "none":
            from ..rewards.reward_fn import build_image_reward_model

            weights = None
            if args.reward_ckpt:
                from ..io.torch_import import (
                    import_hf_clip_params,
                    import_openclip_params,
                    load_torch_state_dict,
                )

                sd = load_torch_state_dict(args.reward_ckpt)
                weights = (
                    import_hf_clip_params(sd)
                    if any(k.startswith("text_model.") for k in sd)
                    else import_openclip_params(sd)
                )
            rm = build_image_reward_model(
                weights=weights, scan_layers=not args.no_scan_towers, **tiny_kw
            )
            reward_models["image"] = rm
        if args.video_rm_fn == "vi_clip2":
            from ..rewards.blip import BertConfig
            from ..rewards.internvideo2 import (
                IV2VisionConfig,
                build_internvideo2_reward,
            )
            from ..rewards.reward_fn import InternVideo2TrainReward

            weights = None
            if args.video_rm_ckpt:
                from ..io.torch_import import (
                    import_internvideo2_params,
                    load_torch_state_dict,
                )

                weights = import_internvideo2_params(
                    load_torch_state_dict(args.video_rm_ckpt)
                )
            ikw = {}
            if args.tiny_model:
                ikw = dict(
                    vision_cfg=IV2VisionConfig(img_size=28, patch_size=14,
                                               width=32, depth=2, heads=4,
                                               mlp_hidden=64, num_frames=4,
                                               clip_embed_dim=16,
                                               attn_pool_heads=4),
                    text_cfg=BertConfig(vocab_size=30524, hidden=32, layers=2,
                                        heads=4, intermediate=64,
                                        cross_attention=False,
                                        encoder_width=32),
                    embed_dim=16,
                )
            vrm = InternVideo2TrainReward(
                build_internvideo2_reward(
                    weights=weights, scan_layers=not args.no_scan_towers, **ikw
                ),
                tokenizer=bert_tok,
                image_size=28 if args.tiny_model else 224,
            )
            reward_models["video"] = vrm
        elif args.video_rm_fn != "none":
            from ..rewards.reward_fn import build_video_reward_model

            weights = None
            if args.video_rm_ckpt:
                from ..io.torch_import import (
                    import_viclip_params,
                    load_torch_state_dict,
                )

                weights = import_viclip_params(load_torch_state_dict(args.video_rm_ckpt))
            vtiny = {}
            if args.tiny_model:
                from ..rewards.vit import VideoViTConfig

                vtiny = dict(
                    vit_cfg=VideoViTConfig(image_size=28, patch_size=14,
                                           width=32, layers=2, heads=4,
                                           output_dim=16, num_frames=8),
                    text_cfg=tiny_kw["text_cfg"],
                )
            vrm = build_video_reward_model(
                weights=weights, scan_layers=not args.no_scan_towers, **vtiny
            )
            reward_models["video"] = vrm
        factory, reward_params = make_reward_fn_factory(
            rvae, rvae_params,
            image_rm=reward_models.get("image"),
            video_rm=reward_models.get("video"),
            decode_chunk=dchunk,
        )
    return factory, reward_params, reward_models


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.multihost:
        from ..parallel.multihost import initialize

        initialize()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ..diffusion import DDIMSolver
    from ..models.unet_vc2 import UNetConfig, UNetModel
    from ..parallel.mesh import make_mesh
    from ..training.lcd import LCDConfig
    from ..training.optim import make_optimizer
    from ..io.torch_export import vc2_reference_lora_target
    from ..training.trainer import LCDTrainer, TrainerConfig

    if args.tiny_model:
        ucfg = UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(2, 1),
            channel_mult=(1, 2), num_head_channels=16, context_dim=16,
            temporal_length=4, time_cond_proj_dim=8,
        )
        ctx_dim, lat_hw, frames, wdim = 16, (8, 8), 4, 8
        from ..config import VC2ModelSpec  # noqa: F401  (not needed for tiny)
        spec = None
    else:
        from ..config import load_vc2_config

        spec = load_vc2_config(args.config, time_cond_proj_dim=256)
        ucfg = spec.unet
        ctx_dim = ucfg.context_dim
        lat_hw = (args.height // 8, args.width // 8)
        frames, wdim = args.n_frames, 256

    student = UNetModel(cfg=ucfg, dtype=jnp.bfloat16 if not args.tiny_model else jnp.float32,
                        use_remat=args.use_remat)
    tcfg = UNetConfig(**{**ucfg.__dict__, "time_cond_proj_dim": None})
    teacher = UNetModel(cfg=tcfg, dtype=student.dtype)

    b = args.batch_size if not args.tiny_model else 4
    frames_eff = frames
    x = jnp.zeros((1, frames_eff, *lat_hw, ucfg.in_channels))
    ctx0 = jnp.zeros((1, 7 if args.tiny_model else 77, ctx_dim))
    ts0 = jnp.zeros((1,), jnp.int32)

    if args.checkpoint:
        from ..io.torch_import import (
            import_unet_params,
            load_torch_state_dict,
            split_vc2_checkpoint,
        )

        sd = load_torch_state_dict(args.checkpoint)
        unet_sd, _, _ = split_vc2_checkpoint(sd)
        teacher_params = {"params": import_unet_params(unet_sd, tcfg)}
        # student = teacher weights + fresh (zero) time_cond_proj
        sp = dict(import_unet_params(unet_sd, ucfg))
        sp["time_cond_proj"] = {
            "kernel": np.zeros((ucfg.time_cond_proj_dim, ucfg.model_channels), np.float32)
        }
        student_params = {"params": sp}
    elif args.random_weights:
        student_params = student.init(
            jax.random.PRNGKey(0), x, ts0, ctx0,
            timestep_cond=jnp.zeros((1, wdim)),
        )
        teacher_params = teacher.init(jax.random.PRNGKey(1), x, ts0, ctx0)
    else:
        print("error: provide --checkpoint or --random-weights", file=sys.stderr)
        sys.exit(2)

    from ..diffusion import DiffusionSchedule

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod),
                               ddim_timesteps=args.num_ddim_timesteps)
    mesh = make_mesh(seq=args.seq_shards)

    reward_factory, reward_params, reward_models = build_reward_stack(args, spec)

    trainer = LCDTrainer(
        student_apply=lambda p, z, t, c, fps=None, timestep_cond=None: student.apply(
            p, z, t, c, fps=fps, timestep_cond=timestep_cond
        ),
        teacher_apply=lambda p, z, t, c, fps=None: teacher.apply(p, z, t, c, fps=fps),
        teacher_params=teacher_params,
        student_params=student_params,
        sched=sched,
        solver=solver,
        lcd_cfg=LCDConfig(
            num_ddim_timesteps=args.num_ddim_timesteps,
            w_min=args.w_min,
            w_max=args.w_max,
            w_embedding_dim=wdim,
            loss_type=args.loss_type,
            huber_c=args.huber_c,
            reward_scale=args.reward_scale,
            video_reward_scale=args.video_reward_scale,
        ),
        reward_fn_factory=reward_factory,
        reward_params=reward_params,
        optimizer=make_optimizer(args.optimizer, args.learning_rate),
        cfg=TrainerConfig(
            output_dir=args.output_dir,
            max_steps=args.max_steps,
            checkpoint_every=args.checkpointing_steps,
            keep_checkpoints=args.checkpoints_total_limit,
            lora_rank=args.lora_rank if args.lora_rank > 0 else None,
            # inject exactly the module set the reference's
            # inject_trainable_lora_extended covers, so the trained factors
            # export 1:1 to its unet_lora.pt format
            lora_target=vc2_reference_lora_target(ucfg),
            max_grad_norm=args.max_grad_norm,
            seed=args.seed,
            log_every=1,
            grad_accum_steps=args.gradient_accumulation_steps,
            fsdp=args.fsdp,
            grads_bf16=args.grads_bf16,
            split_step=args.split_step,
        ),
        mesh=mesh,
    )

    data = make_data_iter(args, ctx_dim, lat_hw, frames_eff, b, spec)
    if reward_factory is not None:
        data = add_reward_fields(
            data, args, frames_eff, b,
            reward_models.get("image"), reward_models.get("video"),
        )
    metrics = trainer.run(data)
    print(f"final metrics: {metrics}")
    # export inference-ready weights: native npz + the reference's
    # unet_lora.pt flat-list format (train_t2v_turbo_v1_lora.py:739-756)
    from ..lora import save_lora_npz

    if trainer.cfg.lora_rank:
        save_lora_npz(f"{args.output_dir}/unet_lora.npz", trainer.state["trainable"])
        print(f"{args.output_dir}/unet_lora.npz")
        try:
            from ..io.torch_export import export_lora_pt, save_torch

            weights = export_lora_pt(
                trainer.state["trainable"], ucfg, params=student_params
            )
            save_torch(weights, f"{args.output_dir}/unet_lora.pt")
            print(f"{args.output_dir}/unet_lora.pt")
        except ImportError:
            print("torch unavailable: skipped unet_lora.pt export")


def add_reward_fields(base_iter, args, frames, b, image_rm, video_rm):
    """Augment batches with frame indices, text features, and role masks
    (the SPMD replacement for the reference's rank-role partitioning)."""
    import numpy as np

    from ..training.reward_adapters import sample_frame_indices

    rng = np.random.RandomState(args.seed % (2**31 - 1))
    n_img = max(1, int(round(args.reward_fraction * b)))
    n_vid = max(1, int(round(args.video_rm_fraction * b)))
    for batch in base_iter:
        texts = batch.pop("_texts", [""] * b)
        if image_rm is not None:
            batch["reward_frame_idx"] = sample_frame_indices(
                rng, b, frames, min(args.reward_frames, frames)
            )
            batch["reward_text_feats"] = np.asarray(image_rm.encode_texts(texts))
            mask = np.zeros((b,), np.float32)
            mask[:n_img] = 1.0
            batch["reward_mask"] = mask
        if video_rm is not None:
            batch["video_frame_idx"] = sample_frame_indices(
                rng, b, frames, min(args.video_rm_frames, frames), strided=True
            )
            batch["video_text_feats"] = np.asarray(video_rm.encode_texts(texts))
            mask = np.zeros((b,), np.float32)
            mask[b - n_vid:] = 1.0
            batch["video_reward_mask"] = mask
        yield batch


def _make_raw_video_iter(args, frames, b):
    """Decoded video batches {video (B,T,H,W,3) [-1,1], txt} from tar shards
    or a CSV index (the reference's webdataset / MP4Dataset inputs)."""
    if args.data_shards:
        from ..data.webdata import WebVideoDataset

        prefix_weights = None
        if args.prefix_weights:
            prefix_weights = {
                k: float(v)
                for k, v in (kv.split("=") for kv in args.prefix_weights.split(","))
            }
        ds = WebVideoDataset(
            sorted(glob.glob(args.data_shards)),
            batch_size=b,
            n_frames=frames,
            size_hw=(args.height, args.width),
            prefix_weights=prefix_weights,
        )
        return iter(ds)
    if args.data_csv:
        from ..data.datasets import MP4Dataset, read_csv_index

        ds = MP4Dataset(
            read_csv_index(args.data_csv),
            n_frames=frames,
            size_hw=(args.height, args.width),
        )
        return ({"video": d["video"], "txt": d["text"]} for d in ds.batches(b))
    raise SystemExit("provide --data-shards/--data-csv/--synthetic-data")


def make_data_iter(args, ctx_dim, lat_hw, frames, b, spec):
    """Batches of {latents, ctx, uncond_ctx, fps}. Real path: webdataset /
    CSV video -> VAE encode + text encode per step; synthetic: random."""
    if args.synthetic_data:
        rng = np.random.RandomState(0)

        def it():
            while True:
                yield {
                    "latents": rng.randn(b, frames, *lat_hw, 4).astype(np.float32),
                    "ctx": rng.randn(b, 7 if args.tiny_model else 77, ctx_dim).astype(np.float32),
                    "uncond_ctx": np.zeros((b, 7 if args.tiny_model else 77, ctx_dim), np.float32),
                    "fps": np.full((b,), float(args.fps), np.float32),
                    "_texts": ["synthetic sample"] * b,
                }

        return it()

    # real data: encode videos + prompts on the fly
    import jax
    import jax.numpy as jnp

    from ..models.clip_text import CLIPTextModel
    from ..models.vae import AutoencoderKL
    from ..utils.tokenizer import CLIPTokenizer

    if args.tiny_model:
        # tiny + real tars (the soak test's CPU shape): real decode ->
        # tiny random VAE encode; text context is a deterministic hash
        # embedding at the tiny ctx_dim (no full CLIP tower)
        from ..models.vae import VAEConfig

        tiny_vae = AutoencoderKL(
            cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
        )
        tv_params = jax.jit(
            lambda k: tiny_vae.init(k, jnp.zeros((1, 16, 16, 3)))
        )(jax.random.PRNGKey(21))
        tiny_encode = jax.jit(
            lambda v: tiny_vae.apply(tv_params, v, method=tiny_vae.encode)[0]
            * 0.18215
        )

        def hash_ctx(texts):
            # crc32, not hash(): str hashing is salted per interpreter, and
            # the soak resume (apps/soak_v1.py) restarts in a fresh process —
            # the caption->embedding map must survive that boundary
            import zlib

            out = np.zeros((len(texts), 7, ctx_dim), np.float32)
            for i, s in enumerate(texts):
                r = np.random.RandomState(zlib.crc32(s.encode("utf-8")))
                out[i] = r.randn(7, ctx_dim).astype(np.float32)
            return out

        raw_iter = _make_raw_video_iter(args, frames, b)

        def tiny_it():
            for batch in raw_iter:
                video = jnp.asarray(batch["video"])
                bb, tt = video.shape[:2]
                z = tiny_encode(video.reshape(bb * tt, *video.shape[2:]))
                z = np.asarray(z).reshape(bb, tt, *z.shape[1:])
                yield {
                    "latents": z,
                    "ctx": hash_ctx(batch["txt"]),
                    "uncond_ctx": np.zeros((bb, 7, ctx_dim), np.float32),
                    "fps": np.full((bb,), float(args.fps), np.float32),
                    "_texts": list(batch["txt"]),
                }

        return tiny_it()

    assert spec is not None and (args.checkpoint or args.random_weights), (
        "real data requires --checkpoint (or --random-weights for a "
        "production-shape smoke/soak run)"
    )
    vae = AutoencoderKL(cfg=spec.vae, dtype=jnp.bfloat16)
    text = CLIPTextModel(dtype=jnp.bfloat16)
    if args.checkpoint:
        from ..io.torch_import import (
            import_clip_text_params,
            import_vae_params,
            load_torch_state_dict,
            split_vc2_checkpoint,
        )

        sd = load_torch_state_dict(args.checkpoint)
        _, vae_sd, clip_sd = split_vc2_checkpoint(sd)
        vae_params = {"params": import_vae_params(vae_sd)}
        text_params = {"params": import_clip_text_params(clip_sd)}
    else:
        # soak mode: real decode/encode path, random frozen towers — the
        # data-pipeline + step composition is what's under test, not quality
        vae_params = jax.jit(
            lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
        )(jax.random.PRNGKey(11))
        text_params = jax.jit(
            lambda k: text.init(k, jnp.zeros((1, 77), jnp.int32))
        )(jax.random.PRNGKey(12))
    tok = CLIPTokenizer()

    encode = jax.jit(
        lambda v: vae.apply(vae_params, v, method=vae.encode)[0] * spec.scale_factor
    )
    embed = jax.jit(lambda t: text.apply(text_params, t))
    uncond = np.asarray(embed(jnp.asarray(tok([""]))))

    raw_iter = _make_raw_video_iter(args, frames, b)

    def it():
        import jax.numpy as jnp

        for batch in raw_iter:
            video = jnp.asarray(batch["video"])  # (B,T,H,W,3) in [-1,1]
            bb, tt = video.shape[:2]
            z = encode(video.reshape(bb * tt, *video.shape[2:]))
            z = np.asarray(z).reshape(bb, tt, *z.shape[1:])
            ctx = np.asarray(embed(jnp.asarray(tok(batch["txt"]))))
            yield {
                "latents": z,
                "ctx": ctx,
                "uncond_ctx": np.repeat(uncond, bb, 0),
                "fps": np.full((bb,), float(args.fps), np.float32),
                "_texts": list(batch["txt"]),
            }

    return it()


if __name__ == "__main__":
    main()
