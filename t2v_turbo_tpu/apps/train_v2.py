"""CLI: v2 full-model latent post-training (train_latent_t2v_turbo_v2 parity).

Consumes the pickles produced by apps/preprocess.py via MP4LatentDataset;
full-UNet finetune with EMA target net and motion-prior guidance.
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
    return p.parse_args(argv)


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
    from ..training.optim import make_grouped_optimizer
    from ..training.trainer import LCDTrainer, TrainerConfig
    from ..data.datasets import MP4LatentDataset

    if args.tiny_model:
        ucfg = UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(2, 1),
            channel_mult=(1, 2), num_head_channels=16, context_dim=16,
            temporal_length=4, time_cond_proj_dim=8,
            motion_cond_proj_dim=8 if args.use_motion_cond else None,
        )
        wdim = 8
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
        unet_sd, _, _ = split_vc2_checkpoint(sd)
        sp = dict(import_unet_params(unet_sd, ucfg))
        if "time_cond_proj" not in sp:
            sp["time_cond_proj"] = {
                "kernel": np.zeros(
                    (ucfg.time_cond_proj_dim, ucfg.model_channels), np.float32
                )
            }
        student_params = {"params": sp}
    elif args.random_weights:
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
    )

    def apply(p, z, t, c, fps=None, timestep_cond=None, motion_cond=None):
        return student.apply(
            p, z, t, c, fps=fps, timestep_cond=timestep_cond,
            motion_cond=motion_cond,
        )

    # Adapt LCDTrainer to the v2 loss by overriding its loss closure: the
    # trainer drives state/checkpoints; the loss comes from lcd_v2_loss.
    trainer = LCDTrainer(
        student_apply=apply,
        teacher_apply=lambda p, z, t, c, fps=None: jnp.zeros_like(z),  # unused
        teacher_params={},
        student_params=student_params,
        sched=sched,
        solver=solver,
        lcd_cfg=None,  # replaced below
        optimizer=make_grouped_optimizer(
            args.optimizer, args.learning_rate,
            temporal_learning_rate=args.temporal_lr,
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
        ),
        mesh=make_mesh(seq=args.seq_shards),
        loss_fn_override=lambda trainable, batch, key, ema=None: lcd_v2_loss(
            trainable, batch, key,
            student_apply=apply,
            target_params=ema,
            sched=sched, solver=solver, cfg=v2cfg,
        ),
    )

    def data_iter():
        for batch in ds.batches(args.batch_size):
            batch.pop("short_txt", None)
            yield batch

    metrics = trainer.run(data_iter())
    print(f"final metrics: {metrics}")
    # export the reference's inference-ready torch artifacts: full unet.pt
    # (+ target_unet.pt when the EMA target net is on) — reference
    # train_latent_t2v_turbo_v2.py:760-773
    try:
        from ..io.torch_export import export_unet_params, save_torch

        save_torch(
            export_unet_params(trainer.state["trainable"], ucfg),
            f"{args.output_dir}/unet.pt",
        )
        print(f"{args.output_dir}/unet.pt")
        if "ema" in trainer.state:
            save_torch(
                export_unet_params(trainer.state["ema"], ucfg),
                f"{args.output_dir}/target_unet.pt",
            )
            print(f"{args.output_dir}/target_unet.pt")
    except ImportError:
        print("torch unavailable: skipped unet.pt export")


if __name__ == "__main__":
    main()
