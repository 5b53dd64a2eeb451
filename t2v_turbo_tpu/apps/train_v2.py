"""CLI: v2 full-model latent post-training (train_latent_t2v_turbo_v2 parity).

Consumes the pickles produced by apps/preprocess.py via MP4LatentDataset;
full-UNet finetune with EMA target net, motion-prior guidance, mixed
image/video reward feedback with the reference's short-caption preference
and webvid opt-out (train_latent_t2v_turbo_v2.py:1068-1162), and optional
partial text-encoder unfreeze (last N resblocks, :816-830).
"""

from __future__ import annotations

import argparse
import glob
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo v2 latent trainer")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--tiny-model", action="store_true")
    p.add_argument("--latent-glob", required=True, help="glob of preprocess pickles")
    p.add_argument("--output-dir", default="runs/v2")
    p.add_argument("--max-steps", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=3)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--temporal-lr", type=float, default=None,
                   help="separate LR for init_attn + temporal transformers")
    p.add_argument("--optimizer", default="adamw8bit",
                   choices=["adamw", "adamw_bf16", "adamw8bit"])
    p.add_argument("--use-target-unet", action="store_true")
    p.add_argument("--ema-decay", type=float, default=0.95)
    p.add_argument("--motion-gs", type=float, default=0.05)
    p.add_argument("--percentage", type=float, default=0.3)
    p.add_argument("--use-motion-cond", action="store_true")
    p.add_argument("--num-ddim-timesteps", type=int, default=50)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1,
                   help="average grads over K micro-batches per update")
    p.add_argument("--checkpointing-steps", type=int, default=2000)
    p.add_argument("--checkpoints-total-limit", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for multi-process "
                        "training (reference: accelerate multi-node DDP)")
    p.add_argument("--use-remat", action="store_true",
                   help="per-block activation rematerialization (reference use_checkpoint)")
    p.add_argument("--seq-shards", type=int, default=1,
                   help="mesh seq axis size (temporal sharding)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state + EMA over the data "
                        "axis (ZeRO-3; fits full-model training on 16 GB "
                        "chips — the reference relies on replicated DDP + "
                        "AdamW8bit instead)")
    p.add_argument("--grads-bf16", action="store_true",
                   help="bf16 gradient tree (f32 Adam math/update; halves "
                        "grad memory — what fits full-model v2 on one 16 GB "
                        "chip, see TrainerConfig.grads_bf16)")
    p.add_argument("--split-step", action="store_true",
                   help="compile grad + optimizer-apply as two programs "
                        "(lower peak hbm, halves the largest compile; "
                        "bit-identical to the fused step)")
    # partial text-encoder unfreeze (reference :127-137,816-830)
    p.add_argument("--train-text-encoder", action="store_true",
                   help="re-encode captions at train time and train the last "
                        "N text resblocks + ln_final")
    p.add_argument("--unlocked-text-layers", type=int, default=4)
    # reward feedback (reference --reward_fn_name/--video_rm_name etc.,
    # train_latent_t2v_turbo_v2.py:507-573,1068-1162)
    p.add_argument("--reward-fn", default="none",
                   choices=["none", "clip", "hpsv2", "pick", "img_reward"])
    p.add_argument("--reward-ckpt", default=None,
                   help="open_clip/HF/ImageReward checkpoint for the image "
                        "reward tower")
    p.add_argument("--bert-vocab", default=None,
                   help="BERT vocab.txt for the img_reward / vi_clip2 text "
                        "towers (smoke runs fall back to a hash tokenizer)")
    p.add_argument("--no-scan-towers", action="store_true",
                   help="unrolled reward towers (see train_v1)")
    p.add_argument("--reward-scale", type=float, default=1.0)
    p.add_argument("--reward-frames", type=int, default=2,
                   help="frames scored per selected sample (reference "
                        "--reward_frame_bsz)")
    p.add_argument("--reward-batch", type=int, default=2,
                   help="samples per batch carrying the image-reward loss "
                        "(reference --reward_train_bsz)")
    p.add_argument("--video-rm-fn", default="none",
                   choices=["none", "vi_clip", "vi_clip2"])
    p.add_argument("--video-rm-ckpt", default=None)
    p.add_argument("--video-reward-scale", type=float, default=1.0)
    p.add_argument("--video-rm-frames", type=int, default=8,
                   help="strided frames per scored sample (reference "
                        "--video_rm_frame_bsz)")
    p.add_argument("--video-rm-batch", type=int, default=1,
                   help="samples per batch carrying the video-reward loss "
                        "(reference --video_rm_train_bsz)")
    p.add_argument("--vae-decode-batch-size", type=int, default=16,
                   help="frames decoded per VAE chunk inside the reward "
                        "losses (reference --vae_decode_batch_size); 0 = "
                        "no chunking")
    p.add_argument("--webvid-no-reward", action="store_true",
                   help="skip reward losses on batches with NO short "
                        "captions (the reference infers this opt-out from "
                        "'webvid' in the shards path, "
                        "train_latent_t2v_turbo_v2.py:1086-1090)")
    return p.parse_args(argv)


def add_v2_reward_fields(base_iter, args, image_rm, video_rm):
    """Per-batch host-side reward fields implementing the reference's v2
    selection semantics as SPMD role-as-data masks
    (train_latent_t2v_turbo_v2.py:1068-1162):

    - short-caption preference: when any sample carries a short caption,
      only short-caption samples are eligible for the reward losses and are
      scored WITH their short captions (:1077-1100);
    - otherwise random samples with full captions — unless
      --webvid-no-reward, which skips the loss entirely on such batches
      (:1086-1090, the reference's "webvid in shards path" opt-out);
    - the video RM scores with FULL captions (the reference passes `text`,
      not selected_text, to video_rm_fn at :1157).
    """
    from ..training.reward_adapters import sample_frame_indices

    rng = np.random.RandomState(args.seed % (2**31 - 1))
    for batch in base_iter:
        txt = batch.get("txt")
        short = batch.get("short_txt")
        b = batch["z_t"].shape[0]
        txt = list(txt) if txt is not None else [""] * b
        short = list(short) if short is not None else [""] * b
        frames = batch["z_t"].shape[1]
        has_short = np.array([s != "" for s in short])

        def choose(n_sel):
            if has_short.any():
                cand = np.flatnonzero(has_short)
                return rng.permutation(cand)[:n_sel]
            if args.webvid_no_reward:
                return np.array([], np.int64)
            return rng.permutation(b)[:n_sel]

        if image_rm is not None:
            n = min(args.reward_frames, frames)
            batch["reward_frame_idx"] = sample_frame_indices(rng, b, frames, n)
            sel_txt = [short[i] if short[i] else txt[i] for i in range(b)]
            batch["reward_text_feats"] = np.asarray(
                image_rm.encode_texts(sel_txt)
            )
            mask = np.zeros((b,), np.float32)
            mask[choose(args.reward_batch)] = 1.0
            batch["reward_mask"] = mask
        if video_rm is not None:
            n = min(args.video_rm_frames, frames)
            batch["video_frame_idx"] = sample_frame_indices(
                rng, b, frames, n, strided=True
            )
            batch["video_text_feats"] = np.asarray(video_rm.encode_texts(txt))
            mask = np.zeros((b,), np.float32)
            mask[choose(args.video_rm_batch)] = 1.0
            batch["video_reward_mask"] = mask
        yield batch


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

    from ..diffusion import DDIMSolver, DiffusionSchedule
    from ..models.unet_vc2 import UNetConfig, UNetModel
    from ..parallel.mesh import make_mesh
    from ..training.lcd_v2 import LCDV2Config, lcd_v2_loss
    from ..training.optim import make_v2_label_fn, make_v2_optimizer
    from ..training.trainer import LCDTrainer, TrainerConfig
    from ..data.datasets import MP4LatentDataset
    from .train_v1 import build_reward_stack

    if args.tiny_model:
        ucfg = UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(2, 1),
            channel_mult=(1, 2), num_head_channels=16, context_dim=16,
            temporal_length=4, time_cond_proj_dim=8,
            motion_cond_proj_dim=8 if args.use_motion_cond else None,
        )
        wdim = 8
        spec = None
    else:
        from ..config import load_vc2_config

        spec = load_vc2_config(
            args.config,
            time_cond_proj_dim=256,
            motion_cond_proj_dim=256 if args.use_motion_cond else None,
        )
        ucfg = spec.unet
        wdim = 256

    student = UNetModel(cfg=ucfg, use_remat=args.use_remat)

    paths = sorted(glob.glob(args.latent_glob))
    if not paths:
        print(f"error: no latent pickles match {args.latent_glob}", file=sys.stderr)
        sys.exit(2)
    ds = MP4LatentDataset(paths, seed=args.seed)
    probe = ds[0]
    lat_shape = (1,) + probe["z_t"].shape
    ctx_shape = (1,) + probe["prompt_emb"].shape

    if args.checkpoint:
        from ..io.torch_import import (
            import_unet_params,
            load_torch_state_dict,
            split_vc2_checkpoint,
        )

        sd = load_torch_state_dict(args.checkpoint)
        unet_sd, _, clip_sd = split_vc2_checkpoint(sd)
        sp = dict(import_unet_params(unet_sd, ucfg))
        if "time_cond_proj" not in sp:
            sp["time_cond_proj"] = {
                "kernel": np.zeros(
                    (ucfg.time_cond_proj_dim, ucfg.model_channels), np.float32
                )
            }
        student_params = {"params": sp}
    elif args.random_weights:
        clip_sd = None
        kw = {}
        if args.use_motion_cond:
            kw["motion_cond"] = jnp.zeros((1, wdim))
        student_params = student.init(
            jax.random.PRNGKey(0), jnp.zeros(lat_shape),
            jnp.zeros((1,), jnp.int32), jnp.zeros(ctx_shape),
            timestep_cond=jnp.zeros((1, wdim)), **kw,
        )
    else:
        print("error: provide --checkpoint or --random-weights", file=sys.stderr)
        sys.exit(2)

    # trainable text encoder: re-encode captions each step (reference
    # train_latent_t2v_turbo_v2.py:989-992), last-N-resblocks unlocked via
    # the optimizer's frozen-label group (optim.make_v2_optimizer)
    text_model = text_tok = None
    text_resblocks = 0
    if args.train_text_encoder:
        from ..models.clip_text import CLIPTextConfig, CLIPTextModel
        from ..utils.tokenizer import CLIPTokenizer

        if args.tiny_model:
            tcfg = CLIPTextConfig(
                width=16, heads=4, layers=3,
                context_length=probe["prompt_emb"].shape[0],
            )
        else:
            tcfg = CLIPTextConfig()
        text_model = CLIPTextModel(cfg=tcfg)
        text_tok = CLIPTokenizer(context_length=tcfg.context_length)
        if clip_sd is not None:
            from ..io.torch_import import import_clip_text_params

            text_params = {"params": import_clip_text_params(clip_sd)}
        else:
            text_params = text_model.init(
                jax.random.PRNGKey(3),
                jnp.zeros((1, tcfg.context_length), jnp.int32),
            )
        text_resblocks = tcfg.layers - 1 if tcfg.penultimate else tcfg.layers
        trainable_params = {"unet": student_params, "text": text_params}
    else:
        trainable_params = student_params

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(
        np.asarray(sched.alphas_cumprod), ddim_timesteps=args.num_ddim_timesteps
    )
    v2cfg = LCDV2Config(
        num_ddim_timesteps=args.num_ddim_timesteps,
        w_embedding_dim=wdim,
        motion_gs=args.motion_gs,
        percentage=args.percentage,
        use_motion_cond=args.use_motion_cond,
        reward_scale=args.reward_scale,
        video_reward_scale=args.video_reward_scale,
    )

    def apply(p, z, t, c, fps=None, timestep_cond=None, motion_cond=None):
        return student.apply(
            p, z, t, c, fps=fps, timestep_cond=timestep_cond,
            motion_cond=motion_cond,
        )

    reward_factory, reward_params, reward_models = build_reward_stack(args, spec)

    def loss_override(trainable, batch, key, ema=None, reward_fns=(None, None)):
        if args.train_text_encoder:
            unet_tr = trainable["unet"]
            ctx = text_model.apply(trainable["text"], batch["tokens"])
            batch = dict(batch, prompt_emb=ctx)
            # the context always comes from the ONLINE text encoder (:989)
        else:
            unet_tr = trainable
        # the EMA target net is UNet-only in the reference (:671-675) and
        # the trainer state holds it that way (ema_path="unet" below), so
        # `ema` is already the UNet subtree in both branches
        target = ema
        return lcd_v2_loss(
            unet_tr, batch, key,
            student_apply=apply,
            target_params=target,
            sched=sched, solver=solver, cfg=v2cfg,
            reward_fn=reward_fns[0],
            video_reward_fn=reward_fns[1],
        )

    # frozen text leaves (embeddings + locked resblocks) must have their
    # grads zeroed BEFORE the trainer's global-norm clip — the reference's
    # requires_grad=False params never enter its clip — not just inside
    # the optimizer's frozen-label group
    frozen_mask = None
    if args.train_text_encoder:
        _label = make_v2_label_fn(
            train_text_encoder=True,
            unlocked_text_layers=args.unlocked_text_layers,
            text_resblocks=text_resblocks,
        )
        frozen_mask = lambda path: _label(path) == "frozen"

    # Adapt LCDTrainer to the v2 loss by overriding its loss closure: the
    # trainer drives state/checkpoints; the loss comes from lcd_v2_loss.
    trainer = LCDTrainer(
        student_apply=apply,
        teacher_apply=lambda p, z, t, c, fps=None: jnp.zeros_like(z),  # unused
        teacher_params={},
        student_params=trainable_params,
        sched=sched,
        solver=solver,
        lcd_cfg=None,  # replaced below
        optimizer=make_v2_optimizer(
            args.optimizer, args.learning_rate,
            temporal_learning_rate=args.temporal_lr,
            train_text_encoder=args.train_text_encoder,
            unlocked_text_layers=args.unlocked_text_layers,
            text_resblocks=text_resblocks,
        ),
        cfg=TrainerConfig(
            output_dir=args.output_dir,
            max_steps=args.max_steps,
            checkpoint_every=args.checkpointing_steps,
            keep_checkpoints=args.checkpoints_total_limit,
            lora_rank=None,  # full finetune
            ema_decay=args.ema_decay if args.use_target_unet else None,
            seed=args.seed,
            log_every=1,
            grad_accum_steps=args.gradient_accumulation_steps,
            fsdp=args.fsdp,
            grads_bf16=args.grads_bf16,
            split_step=args.split_step,
            ema_path="unet" if args.train_text_encoder else None,
        ),
        mesh=make_mesh(seq=args.seq_shards),
        loss_fn_override=loss_override,
        reward_fn_factory=reward_factory,
        reward_params=reward_params,
        frozen_grad_mask=frozen_mask,
    )

    def data_iter():
        base = ds.batches(args.batch_size)
        if reward_factory is not None:
            base = add_v2_reward_fields(
                base, args, reward_models.get("image"),
                reward_models.get("video"),
            )
        for batch in base:
            txt = batch.pop("txt", None)
            batch.pop("short_txt", None)
            if args.train_text_encoder:
                batch["tokens"] = np.asarray(
                    text_tok(txt if txt is not None
                             else [""] * batch["z_t"].shape[0])
                )
            yield batch

    metrics = trainer.run(data_iter())
    print(f"final metrics: {metrics}")
    # export the reference's inference-ready torch artifacts: full unet.pt
    # (+ target_unet.pt when the EMA target net is on) — reference
    # train_latent_t2v_turbo_v2.py:760-773. The trained text tower (which
    # the reference leaves buried in accelerate save_state) is exported as
    # a native npz alongside.
    trained = trainer.state["trainable"]
    trained_unet = trained["unet"] if args.train_text_encoder else trained
    try:
        from ..io.torch_export import export_unet_params, save_torch

        save_torch(
            export_unet_params(trained_unet, ucfg),
            f"{args.output_dir}/unet.pt",
        )
        print(f"{args.output_dir}/unet.pt")
        if "ema" in trainer.state:
            # ema_path="unet": the EMA state IS the UNet subtree
            save_torch(
                export_unet_params(trainer.state["ema"], ucfg),
                f"{args.output_dir}/target_unet.pt",
            )
            print(f"{args.output_dir}/target_unet.pt")
    except ImportError:
        print("torch unavailable: skipped unet.pt export")
    if args.train_text_encoder:
        import jax

        flat = jax.tree_util.tree_flatten_with_path(trained["text"])[0]
        np.savez(
            f"{args.output_dir}/text_encoder.npz",
            **{
                "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
                for path, v in flat
            },
        )
        print(f"{args.output_dir}/text_encoder.npz")


if __name__ == "__main__":
    main()
