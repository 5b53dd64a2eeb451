"""Benchmark harness: end-to-end 4-step 16x320x512 generation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the real product hot path (jitted scan sampling loop + jitted VAE
decode) on one chip with randomly-initialized weights (identical compute to
trained weights). Compile time is excluded; device completion is forced via
host transfers (this platform's block_until_ready returns early).

vs_baseline: the reference publishes no numbers (BASELINE.md); we use an
estimated A100 reference of 12 videos/min for the same 4-step 16x320x512
T2V-Turbo (VC2) operating point (~5 s/video with torch fp16 incl. per-frame
VAE decode). The north-star target is 3x that (36 videos/min/chip).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_BASELINE_VIDEOS_PER_MIN = 12.0


def kernel_parity_gate() -> bool:
    """Cheap Pallas-kernel parity asserts before timing (the tests_tpu
    cases, folded in here so the driver-run bench catches kernel
    regressions every round). TPU-only: the flash kernels target the real
    MXU; on CPU the XLA fallback path is what tests/ already gate."""
    if jax.devices()[0].platform != "tpu":
        return True
    from t2v_turbo_tpu.ops import attention_xla, flash_attention

    cases = [
        # (b, h, sq, sk, d, dtype, atol) — spatial 320x512 self-attn,
        # bf16 variant, cross-attn 77 tokens, VAE bottleneck single-head
        (16, 5, 2560, 2560, 64, jnp.float32, 2e-3),
        (16, 5, 2560, 2560, 64, jnp.bfloat16, 5e-2),
        (16, 5, 2560, 77, 64, jnp.bfloat16, 5e-2),
        (4, 1, 2560, 2560, 512, jnp.bfloat16, 5e-2),
    ]
    ok = True
    for b, h, sq, sk, d, dtype, atol in cases:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), dtype)
        k = jax.random.normal(ks[1], (b, h, sk, d), dtype)
        v = jax.random.normal(ks[2], (b, h, sk, d), dtype)
        out = flash_attention(q, k, v)
        ref = attention_xla(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        case_ok = err < atol
        ok &= case_ok
        print(
            f"# kernel parity {dtype.__name__} ({b},{h},{sq},{sk},{d}): "
            f"max|d|={err:.2e} {'OK' if case_ok else 'FAIL'}",
            file=sys.stderr,
        )

    # Fused GN/LN kernels (ops/fused_norms.py) vs the XLA reference math at
    # the production UNet shapes — these ARE the hot path now (dispatch in
    # ops/norms.py routes eligible single-chip TPU shapes to Pallas), so a
    # kernel regression must fail the bench, not just skew it.
    from t2v_turbo_tpu.ops.fused_norms import (
        _gn_ref,
        _ln_ref,
        fused_group_norm,
        fused_layer_norm,
        gn_shape_supported,
        ln_shape_supported,
    )

    gn_cases = [
        # (n, hw, c, dtype, atol) — UNet levels L0..L2 at 16 frames
        (16, 2560, 320, jnp.bfloat16, 5e-2),
        (16, 640, 640, jnp.bfloat16, 5e-2),
        (16, 160, 1280, jnp.float32, 1e-4),
    ]
    for n, hw, c, dtype, atol in gn_cases:
        assert gn_shape_supported((n, hw, c), 32), (n, hw, c)
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        x = jax.random.normal(ks[0], (n, hw, c), dtype)
        s = jax.random.normal(ks[1], (c,), jnp.float32)
        bb = jax.random.normal(ks[2], (c,), jnp.float32)
        out = fused_group_norm(x, s, bb, 32, 1e-5, "silu")
        ref = _gn_ref(x, s, bb, 32, 1e-5, "silu")
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        case_ok = err < atol
        ok &= case_ok
        print(
            f"# gn parity {dtype.__name__} ({n},{hw},{c}): "
            f"max|d|={err:.2e} {'OK' if case_ok else 'FAIL'}",
            file=sys.stderr,
        )
    ln_cases = [(40960, 320, jnp.bfloat16, 5e-2), (2560, 1280, jnp.float32, 1e-4)]
    for r, c, dtype, atol in ln_cases:
        assert ln_shape_supported((r, c)), (r, c)
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        x = jax.random.normal(ks[0], (r, c), dtype)
        s = jax.random.normal(ks[1], (c,), jnp.float32)
        bb = jax.random.normal(ks[2], (c,), jnp.float32)
        out = fused_layer_norm(x, s, bb)
        ref = _ln_ref(x, s, bb, 1e-5, None)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        case_ok = err < atol
        ok &= case_ok
        print(
            f"# ln parity {dtype.__name__} ({r},{c}): "
            f"max|d|={err:.2e} {'OK' if case_ok else 'FAIL'}",
            file=sys.stderr,
        )

    if not ok:
        print(
            json.dumps(
                {
                    "metric": "kernel_parity",
                    "value": 0,
                    "unit": "bool",
                    "vs_baseline": 0,
                }
            )
        )
        sys.exit(1)
    return ok


def train_bench(rewards: bool = False):
    """Optional `python bench.py --train [--rewards]`: full-size v1 LCD
    training-step throughput (LoRA r=64 student + frozen teacher, bs=1,
    16x40x64 latents, bf16 + remat — the reference's per-rank recipe,
    train_t2v_turbo_v1.sh). --rewards adds the ViT-H image RM and ViCLIP-L
    video RM inside the loss (VAE-decoded frames, backprop through the
    towers, decode_chunk=16 — reference train_t2v_turbo_v1_lora.py:
    1043-1098). Prints one JSON line with samples/sec."""
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    kernel_parity_gate()
    b, step_s = _v1_train_core(rewards)
    print(
        json.dumps(
            {
                "metric": "lcd_v1_train_samples_per_sec_bs1_16f_320x512"
                + ("_rewards_on" if rewards else ""),
                "value": round(b / step_s, 3),
                "unit": "samples/sec",
                "step_ms": round(step_s * 1e3, 1),
                "lora_rank": 64,
                "rewards": rewards,
            }
        )
    )


def _v1_train_core(rewards: bool = False):
    """Full-size v1 LCD training-step timing; returns (batch_size, step_s).
    Shared by `--train` and the driver-run main() (which folds v1_step_ms
    into the canonical JSON line so training-perf regressions are visible
    round-over-round, not just in PERF_NOTES prose)."""
    import optax

    from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
    from t2v_turbo_tpu.models import UNetConfig, UNetModel
    from t2v_turbo_tpu.training.lcd import LCDConfig
    from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig

    dtype = jnp.bfloat16
    cfg = UNetConfig(time_cond_proj_dim=256)
    # BENCH_REMAT=0 measures the no-remat student: OOMs at full size
    # (18.4 G > 15.75 G hbm) — remat is required, not just preferred
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    student = UNetModel(cfg=cfg, dtype=dtype, use_remat=remat)
    tcfg = UNetConfig(**{**cfg.__dict__, "time_cond_proj_dim": None})
    teacher = UNetModel(cfg=tcfg, dtype=dtype, use_remat=True)

    b, t, lh, lw = 1, 16, 40, 64
    x = jnp.zeros((b, t, lh, lw, 4), dtype)
    ts = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 77, 1024), dtype)
    fps = jnp.full((b,), 16.0)
    t0 = time.time()
    # frozen trees in bf16 (the reference casts teacher/frozen towers to
    # weight_dtype, train_t2v_turbo_v1_lora.py:712-730); only the trainable
    # LoRA factors stay f32. Three f32 trees (teacher, base, merged) would
    # need ~17 GB and OOM the 16 GB v5e.
    to_bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32
        else a,
        t,
    )
    sp = jax.jit(
        lambda k: to_bf16(student.init(
            k, x, ts, ctx, fps=fps, timestep_cond=jnp.zeros((b, 256), dtype)
        ))
    )(jax.random.PRNGKey(0))
    tp = jax.jit(lambda k: to_bf16(teacher.init(k, x, ts, ctx, fps=fps)))(
        jax.random.PRNGKey(1)
    )
    jax.block_until_ready((sp, tp))
    print(f"# init: {time.time()-t0:.0f}s", file=sys.stderr)

    reward_factory = reward_params = None
    img_dim = vid_dim = 8
    vid_frames = 4
    if rewards:
        rvae, rvae_params = _full_size_vae()
        reward_factory, reward_params, img_dim, vid_dim, vid_frames = (
            _full_size_reward_stack(rvae, rvae_params)
        )

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
    trainer = LCDTrainer(
        student_apply=lambda p, z, tt, c, fps=None, timestep_cond=None: (
            student.apply(p, z, tt, c, fps=fps, timestep_cond=timestep_cond)
        ),
        teacher_apply=lambda p, z, tt, c, fps=None: teacher.apply(
            p, z, tt, c, fps=fps
        ),
        teacher_params=tp,
        student_params=sp,
        sched=sched,
        solver=solver,
        lcd_cfg=LCDConfig(reward_scale=1.0, video_reward_scale=1.0),
        reward_fn_factory=reward_factory,
        reward_params=reward_params,
        optimizer=optax.adamw(1e-5),
        cfg=TrainerConfig(
            output_dir="/tmp/bench_train",
            lora_rank=64,
            # BENCH_SPLIT=1: two-program grad/apply split (see train_v2_bench)
            split_step=os.environ.get("BENCH_SPLIT", "0") == "1",
        ),
    )
    rng = np.random.RandomState(0)
    host_batch = {
        "latents": rng.randn(b, t, lh, lw, 4).astype(np.float32),
        "ctx": rng.randn(b, 77, 1024).astype(np.float32),
        "uncond_ctx": np.zeros((b, 77, 1024), np.float32),
        "fps": np.full((b,), 16.0, np.float32),
    }
    if rewards:
        # reference per-rank recipe: 5 random frames -> image RM, 8 strided
        # frames -> video RM (train_t2v_turbo_v1_lora.py:1049,1071-1076)
        host_batch["reward_frame_idx"] = np.stack(
            [rng.permutation(t)[:5] for _ in range(b)]
        ).astype(np.int32)
        host_batch["reward_text_feats"] = rng.randn(b, img_dim).astype(np.float32)
        host_batch["reward_mask"] = np.ones((b,), np.float32)
        skip = t // vid_frames
        host_batch["video_frame_idx"] = np.stack(
            [np.arange(0, t, skip)[:vid_frames] for _ in range(b)]
        ).astype(np.int32)
        host_batch["video_text_feats"] = rng.randn(b, vid_dim).astype(np.float32)
        host_batch["video_reward_mask"] = np.ones((b,), np.float32)
    batch = trainer.shard_batch(host_batch)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    trainer.state, m = trainer._step_jit(trainer.state, batch, key)
    _ = float(m["loss"])  # host transfer fences completion
    print(f"# compile+first step: {time.time()-t0:.0f}s", file=sys.stderr)

    n = 8
    t0 = time.time()
    for _ in range(n):
        trainer.state, m = trainer._step_jit(trainer.state, batch, key)
    _ = float(m["loss"])
    step_s = (time.time() - t0) / n
    return b, step_s


def _full_size_reward_stack(rvae, rvae_params, decode_chunk=16):
    """Full-size reward towers with random bf16 weights (identical compute
    to trained ones): ViT-H/14 image RM + ViCLIP-L video RM — the v1
    reference recipe's towers (train_t2v_turbo_v1_lora.py:506-547). Text
    features are precomputed per batch in real training, so the benches
    feed random (B, D) features and skip the text towers entirely.
    Returns (reward_fn_factory, reward_params, img_dim, vid_dim,
    vid_frames): tower params ride the trainer's frozen tree as runtime
    args, not jit-captured constants (~2.5 GB less proto per compile)."""
    from t2v_turbo_tpu.rewards.reward_fn import ImageRewardModel, VideoRewardModel
    from t2v_turbo_tpu.rewards.vit import (
        VIT_H_14,
        VideoViTConfig,
        VideoVisionTransformer,
        VisionTransformer,
    )
    from t2v_turbo_tpu.training.reward_adapters import make_reward_fn_factory

    import dataclasses

    to_bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
    )
    # scan_layers: one lax.scan block body instead of 32/24 unrolled blocks
    # — identical numerics (tested), ~layers-x smaller tower HLO. This is
    # what brings the rewards-ON training-graph compiles back inside the
    # remote-compile channel's reliable window. BENCH_SCAN_TOWERS=0 to
    # measure the unrolled layout.
    scan_towers = os.environ.get("BENCH_SCAN_TOWERS", "1") == "1"
    vit = VisionTransformer(
        cfg=dataclasses.replace(VIT_H_14, scan_layers=scan_towers),
        dtype=jnp.bfloat16,
    )
    vvit_cfg = dataclasses.replace(VideoViTConfig(), scan_layers=scan_towers)
    vp = jax.jit(lambda k: to_bf16(vit.init(k, jnp.zeros((1, 224, 224, 3)))))(
        jax.random.PRNGKey(11)
    )
    irm = ImageRewardModel(vit, vp, None, None, None)
    # BENCH_VIDEO_RM=0 drops the ViCLIP tower (image RM only): with
    # unrolled towers the two-tower graph compiled >45 min, past the
    # remote-compile channel's reliable window; scanned towers are the fix,
    # the toggle remains for measuring the intermediate recipe point.
    vrm = None
    if os.environ.get("BENCH_VIDEO_RM", "1") == "1":
        vvit = VideoVisionTransformer(cfg=vvit_cfg, dtype=jnp.bfloat16)
        vvp = jax.jit(
            lambda k: to_bf16(
                vvit.init(k, jnp.zeros((1, vvit_cfg.num_frames, 224, 224, 3)))
            )
        )(jax.random.PRNGKey(12))
        vrm = VideoRewardModel(vvit, vvp, None, None, None)
    factory, reward_params = make_reward_fn_factory(
        rvae, rvae_params, image_rm=irm, video_rm=vrm, decode_chunk=decode_chunk
    )
    return (factory, reward_params, VIT_H_14.output_dim, vvit_cfg.output_dim,
            vvit_cfg.num_frames)


def _full_size_vae():
    from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(cfg=VAEConfig(), dtype=jnp.bfloat16)
    to_bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
    )
    vae_params = jax.jit(
        lambda k: to_bf16(vae.init(k, jnp.zeros((1, 64, 64, 3))))
    )(jax.random.PRNGKey(10))
    return vae, vae_params


def train_v2_bench():
    """`python bench.py --train-v2`: full-size v2 full-model training step
    (the reference's production recipe, train_t2v_turbo_v2.sh: bs=3,
    16x40x64 latents, full f32 UNet trainable, blockwise-int8 AdamW,
    stored-teacher CFG — no live teacher). Env toggles:
      BENCH_EMA=1      add the f32 EMA target net (ref --use_target_unet)
      BENCH_REWARDS=0  drop the reward towers (recipe default is ON:
                       reward_scale 0.2 / video 0.5)
      BENCH_FSDP=1     FSDP state sharding (single chip -> no-op)
      BENCH_GRADS_BF16=0  f32 grad tree (default bf16: the f32 tree is
                       5.6 GB and pushes the single-chip step to 18.6 GB
                       > 15.75 GB hbm — measured OOM; see PERF_NOTES r3)
      BENCH_BS=N       per-chip batch (default 3 = the recipe's per-GPU
                       batch on 80 GB A100s; measured 18.6 GB on one 16 GB
                       v5e even with bf16 grads and no towers — the
                       init-level activation peak alone is ~6 GB at bs=3.
                       bs=1 is the honest 16 GB-chip recipe point; the
                       recipe's global batch comes from data-parallel
                       chips and/or gradient accumulation)
    """
    from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
    from t2v_turbo_tpu.models import UNetConfig, UNetModel
    from t2v_turbo_tpu.training.lcd_v2 import LCDV2Config, lcd_v2_loss
    from t2v_turbo_tpu.training.optim import make_v2_optimizer
    from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    kernel_parity_gate()
    use_ema = os.environ.get("BENCH_EMA", "0") == "1"
    use_rewards = os.environ.get("BENCH_REWARDS", "1") == "1"
    use_fsdp = os.environ.get("BENCH_FSDP", "0") == "1"
    grads_bf16 = os.environ.get("BENCH_GRADS_BF16", "1") == "1"
    # BENCH_LHS=0: request latency-hiding-scheduler off. Measured NO
    # effect through the remote-compile channel (identical 15.96 G peak —
    # the option is silently dropped or the scheduler isn't the cause);
    # kept for local experimentation.
    compiler_options = (
        {"xla_tpu_enable_latency_hiding_scheduler": "false"}
        if os.environ.get("BENCH_LHS", "1") == "0"
        else None
    )
    # BENCH_SPLIT=0: fuse grad+update into one program (the default TWO-
    # program split is what fits bs=1 on one 16 GB chip — the fused step
    # measured 15.96 G, OOM by 215 MB; see TrainerConfig.split_step)
    split_step = os.environ.get("BENCH_SPLIT", "1") == "1"

    cfg = UNetConfig(time_cond_proj_dim=256, motion_cond_proj_dim=256)
    student = UNetModel(cfg=cfg, dtype=jnp.bfloat16, use_remat=True)
    b, t, lh, lw = int(os.environ.get("BENCH_BS", "3")), 16, 40, 64
    x = jnp.zeros((b, t, lh, lw, 4))
    ts0 = jnp.zeros((b,), jnp.int32)
    ctx0 = jnp.zeros((b, 77, 1024))

    t0 = time.time()
    sp = jax.jit(
        lambda k: student.init(
            k, x, ts0, ctx0, fps=jnp.full((b,), 8.0),
            timestep_cond=jnp.zeros((b, 256)),
            motion_cond=jnp.zeros((b, 256)),
        )
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(sp)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(sp))
    print(
        f"# init: {time.time()-t0:.0f}s  unet_params={n_params/1e9:.2f}B (f32 trainable)",
        file=sys.stderr,
    )

    reward_factory = reward_params = None
    img_dim = vid_dim = 8
    vid_frames = 4
    if use_rewards:
        rvae, rvae_params = _full_size_vae()
        reward_factory, reward_params, img_dim, vid_dim, vid_frames = (
            _full_size_reward_stack(rvae, rvae_params)
        )

    sched = DiffusionSchedule.create()
    solver = DDIMSolver.create(np.asarray(sched.alphas_cumprod))
    v2cfg = LCDV2Config(
        w_embedding_dim=256,
        use_motion_cond=True,
        reward_scale=0.2,
        video_reward_scale=0.5,
    )

    def apply(p, z, tt, c, fps=None, timestep_cond=None, motion_cond=None):
        return student.apply(
            p, z, tt, c, fps=fps, timestep_cond=timestep_cond,
            motion_cond=motion_cond,
        )

    trainer = LCDTrainer(
        student_apply=apply,
        teacher_apply=lambda p, z, tt, c, fps=None: jnp.zeros_like(z),
        teacher_params={},
        student_params=sp,
        sched=sched,
        solver=solver,
        lcd_cfg=None,
        # the recipe's grouped optimizer (temporal-LR group) — fused
        # single-adam design in optim.py, so the group costs no extra
        # compile/graph size
        optimizer=make_v2_optimizer("adamw8bit", 1e-5,
                                    temporal_learning_rate=1e-5),
        cfg=TrainerConfig(
            output_dir="/tmp/bench_train_v2",
            lora_rank=None,
            ema_decay=0.95 if use_ema else None,
            fsdp=use_fsdp,
            grads_bf16=grads_bf16,
            compiler_options=compiler_options,
            split_step=split_step,
        ),
        loss_fn_override=lambda trainable, batch, key, ema=None,
        reward_fns=(None, None): lcd_v2_loss(
            trainable, batch, key, student_apply=apply, target_params=ema,
            sched=sched, solver=solver, cfg=v2cfg,
            reward_fn=reward_fns[0], video_reward_fn=reward_fns[1],
        ),
        reward_fn_factory=reward_factory,
        reward_params=reward_params,
    )

    rng = np.random.RandomState(0)
    batch = {
        "index": rng.randint(25, 50, (b,)).astype(np.int32),
        "z_t": rng.randn(b, t, lh, lw, 4).astype(np.float32),
        "cond_teacher_out": rng.randn(b, t, lh, lw, 4).astype(np.float32),
        "uncond_teacher_out": rng.randn(b, t, lh, lw, 4).astype(np.float32),
        "score": rng.randn(b, t, lh, lw, 4).astype(np.float32) * 0.01,
        "prompt_emb": rng.randn(b, 77, 1024).astype(np.float32),
        "use_motion_guide": np.ones((b,), bool),
        "fps": np.full((b,), 8.0, np.float32),
    }
    if use_rewards:
        batch["reward_frame_idx"] = np.stack(
            [rng.permutation(t)[:2] for _ in range(b)]
        ).astype(np.int32)
        batch["reward_text_feats"] = rng.randn(b, img_dim).astype(np.float32)
        batch["reward_mask"] = np.array([1.0] + [0.0] * (b - 1), np.float32)
        skip = t // vid_frames
        batch["video_frame_idx"] = np.stack(
            [np.arange(0, t, skip)[:vid_frames] for _ in range(b)]
        ).astype(np.int32)
        batch["video_text_feats"] = rng.randn(b, vid_dim).astype(np.float32)
        batch["video_reward_mask"] = np.array(
            [0.0] * (b - 1) + [1.0], np.float32
        )
    batch = trainer.shard_batch(batch)

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    trainer.state, m = trainer._step_jit(trainer.state, batch, key)
    _ = float(m["loss"])
    print(f"# compile+first step: {time.time()-t0:.0f}s", file=sys.stderr)

    n = 8
    t0 = time.time()
    for _ in range(n):
        trainer.state, m = trainer._step_jit(trainer.state, batch, key)
    _ = float(m["loss"])
    step_s = (time.time() - t0) / n
    print(
        json.dumps(
            {
                "metric": f"lcd_v2_train_samples_per_sec_bs{b}_16f_320x512"
                + ("_rewards_on" if use_rewards else ""),
                "value": round(b / step_s, 3),
                "unit": "samples/sec",
                "step_ms": round(step_s * 1e3, 1),
                "ema_target": use_ema,
                "rewards": use_rewards,
                "grads_bf16": grads_bf16,
                "split_step": split_step,
                "lhs_scheduler": compiler_options is None,
                "optimizer": "adamw8bit",
                "unet_params_b": round(n_params / 1e9, 3),
            }
        )
    )


def profile_bench():
    """`python bench.py --profile`: trace the 4-step sampling loop and print
    the top device ops by time (the per-op evidence for PERF_NOTES'
    'practical floor' claim)."""
    import tempfile

    from t2v_turbo_tpu.utils.profiling import top_ops_from_trace

    # reuse main()'s setup by inlining the sampling-loop portion
    from t2v_turbo_tpu.diffusion import DiffusionSchedule
    from t2v_turbo_tpu.models import UNetConfig, UNetModel
    from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig
    from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16
    cfg = UNetConfig(time_cond_proj_dim=256)
    unet = UNetModel(cfg=cfg, dtype=dtype)
    b, t, h, w = 1, 16, 320, 512
    lh, lw = h // 8, w // 8
    x = jnp.zeros((b, t, lh, lw, 4), dtype)
    ts = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 77, 1024), dtype)
    unet_params = jax.jit(
        lambda k: unet.init(
            k, x, ts, ctx, fps=jnp.full((b,), 16.0),
            timestep_cond=jnp.zeros((b, 256), dtype),
        )
    )(jax.random.PRNGKey(0))
    vae = AutoencoderKL(cfg=VAEConfig(), dtype=dtype)
    vae_params = jax.jit(lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), dtype)))(
        jax.random.PRNGKey(1)
    )
    pipe = T2VTurboVC2Pipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_model=None, text_params=None, tokenizer=None,
        schedule=DiffusionSchedule.create(), dtype=dtype,
    )
    sample = pipe._sample_fn(4, 50, False, 0.3)
    prompt_embeds = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 1024), dtype)
    w_emb = jnp.zeros((b, 256), dtype)
    lat = jax.random.normal(jax.random.PRNGKey(3), (b, t, lh, lw, 4), dtype)
    fps_arr = jnp.full((b,), 16.0)

    def run(seed):
        r = sample(
            unet_params, lat, prompt_embeds, w_emb, fps_arr,
            jnp.float32(0.0), jax.random.PRNGKey(seed),
        )
        _ = np.asarray(r[0, 0, 0, 0])

    run(0)  # compile
    log_dir = tempfile.mkdtemp(prefix="t2v_bench_trace_")
    jax.profiler.start_trace(log_dir)
    for i in range(2):
        run(i + 1)
    jax.profiler.stop_trace()
    top = top_ops_from_trace(log_dir, k=15)
    print(
        "# top device op groups over 2x 4-step sampling loops "
        "(pct of program span):",
        file=sys.stderr,
    )
    for name, ms, pct, n_ev in top:
        print(
            f"#   {pct:5.1f}%  {ms:8.2f} ms  {n_ev:6d}x  {name}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "profile_top_op_pct",
                "value": round(top[0][2], 1) if top else 0,
                "unit": "%",
                "top_ops": [
                    {"name": n, "ms": round(ms, 2), "pct": round(p, 1),
                     "count": c}
                    for n, ms, p, c in top
                ],
            }
        )
    )


def operating_points_bench():
    """`python bench.py --op-points`: measure every OTHER operating point
    the reference publishes (BASELINE.md table; the 4-step 16f 320x512 VC2
    headline is main()'s job):

      - T2V-Turbo-v2 recipe: 16 steps, lcm_origin_steps=200, 320x512
        (reference predict.py:78-79,121; app.py:169)
      - frame envelope top: 48 frames, 4 steps, 320x512
        (reference app.py:342-348, predict.py:91-95)
      - T2V-Turbo (MS): 4 steps, 16 frames, 256x256
        (reference app_ms.py:276-282)

    Random bf16 weights (identical compute to trained ones), completion
    forced via host transfer. Prints one JSON line with all three."""
    from t2v_turbo_tpu.diffusion import DiffusionSchedule
    from t2v_turbo_tpu.models import UNetConfig, UNetModel
    from t2v_turbo_tpu.models.unet_ms import MSUNet3DConditionModel, MSUNetConfig
    from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig
    from t2v_turbo_tpu.pipelines.ms import T2VTurboMSPipeline
    from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16
    results = {}

    def measure(pipe, embeds, h, w, frames, steps, origin, n=6):
        def one(seed):
            return pipe(
                prompt_embeds=embeds, height=h, width=w, frames=frames,
                num_inference_steps=steps, lcm_origin_steps=origin,
                key=jax.random.PRNGKey(seed),
            )

        t0 = time.time()
        out = one(0)
        _ = np.asarray(out[0, 0, 0, 0])
        print(f"#   compile+first video: {time.time()-t0:.0f}s", file=sys.stderr)
        t0 = time.time()
        for i in range(n):
            out = one(i + 1)
        _ = np.asarray(out[0, 0, 0, 0])
        dt = (time.time() - t0) / n
        return round(60.0 / dt, 2), round(dt * 1e3 / steps, 1)

    vae = AutoencoderKL(cfg=VAEConfig(), dtype=dtype)
    vae_params = jax.jit(lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), dtype)))(
        jax.random.PRNGKey(1)
    )

    # --- VC2 backbone points (one param set serves both: no shape params) ---
    cfg = UNetConfig(time_cond_proj_dim=256)
    unet = UNetModel(cfg=cfg, dtype=dtype)
    unet_params = jax.jit(
        lambda k: unet.init(
            k, jnp.zeros((1, 16, 40, 64, 4), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 1024), dtype), fps=jnp.full((1,), 16.0),
            timestep_cond=jnp.zeros((1, 256), dtype),
        )
    )(jax.random.PRNGKey(0))
    pipe = T2VTurboVC2Pipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_model=None, text_params=None, tokenizer=None,
        schedule=DiffusionSchedule.create(), dtype=dtype,
    )
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 1024), dtype)

    print("# v2 recipe: 16 steps, origin 200, 16f 320x512", file=sys.stderr)
    vpm, spm = measure(pipe, embeds, 320, 512, 16, 16, 200)
    results["v2_16step_videos_per_min"] = vpm
    results["v2_16step_step_ms"] = spm

    print("# frame envelope: 48f, 4 steps, 320x512", file=sys.stderr)
    vpm, spm = measure(pipe, embeds, 320, 512, 48, 4, 50, n=4)
    results["vc2_48f_videos_per_min"] = vpm
    results["vc2_48f_step_ms"] = spm

    del pipe, unet_params  # free ~2.8 GB of UNet state before the MS point

    # --- MS backbone point ---
    ucfg = MSUNetConfig(time_cond_proj_dim=256)
    ms_unet = MSUNet3DConditionModel(cfg=ucfg, dtype=dtype)
    ms_params = jax.jit(
        lambda k: ms_unet.init(
            k, jnp.zeros((1, 16, 32, 32, 4), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 1024), dtype),
            timestep_cond=jnp.zeros((1, 256), dtype),
        )
    )(jax.random.PRNGKey(3))
    ms_pipe = T2VTurboMSPipeline(
        unet=ms_unet, unet_params=ms_params, vae=vae, vae_params=vae_params,
        text_model=None, text_params=None, tokenizer=None,
        schedule=DiffusionSchedule.create(), dtype=dtype,
    )
    print("# MS backbone: 4 steps, 16f 256x256", file=sys.stderr)
    vpm, spm = measure(ms_pipe, embeds, 256, 256, 16, 4, 50)
    results["ms_4step_256_videos_per_min"] = vpm
    results["ms_4step_256_step_ms"] = spm

    print(json.dumps({
        "metric": "operating_points",
        "value": results["v2_16step_videos_per_min"],
        "unit": "videos/min (v2 16-step)",
        **results,
    }))


def main():
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    kernel_parity_gate()

    # Training-step timing first (its device buffers free when the function
    # scope drops, before the sampling bench allocates). BENCH_TRAIN=0 skips;
    # a failure must not cost the headline metric.
    train_stats = {}
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            bt, step_s = _v1_train_core(rewards=False)
            train_stats = {
                "v1_step_ms": round(step_s * 1e3, 1),
                "v1_samples_per_sec": round(bt / step_s, 3),
            }
            print(
                f"# v1 train step {step_s * 1e3:.0f} ms (bs={bt})",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - deliberately broad
            print(f"# v1 train bench failed: {e!r}", file=sys.stderr)
            train_stats = {"v1_step_ms": None, "v1_samples_per_sec": None}

    from t2v_turbo_tpu.diffusion import DiffusionSchedule
    from t2v_turbo_tpu.models import UNetConfig, UNetModel
    from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig
    from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline

    dtype = jnp.bfloat16
    cfg = UNetConfig(time_cond_proj_dim=256)
    unet = UNetModel(cfg=cfg, dtype=dtype)
    vae = AutoencoderKL(cfg=VAEConfig(), dtype=dtype)

    b, t, h, w = 1, 16, 320, 512
    lh, lw = h // 8, w // 8

    x = jnp.zeros((b, t, lh, lw, 4), dtype)
    ts = jnp.zeros((b,), jnp.int32)
    ctx_shape = (b, 77, 1024)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    unet_params = jax.jit(
        lambda k: unet.init(
            k, x, ts, jnp.zeros(ctx_shape, dtype),
            fps=jnp.full((b,), 16.0),
            timestep_cond=jnp.zeros((b, 256), dtype),
        )
    )(key)
    vae_params = jax.jit(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3), dtype))
    )(jax.random.PRNGKey(1))
    jax.block_until_ready((unet_params, vae_params))
    print(f"# init: {time.time()-t0:.0f}s", file=sys.stderr)

    pipe = T2VTurboVC2Pipeline(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_model=None,
        text_params=None,
        tokenizer=None,
        schedule=DiffusionSchedule.create(),
        dtype=dtype,
    )

    prompt_embeds = jax.random.normal(jax.random.PRNGKey(2), ctx_shape, dtype)

    def one_video(seed):
        return pipe(
            prompt_embeds=prompt_embeds,
            height=h,
            width=w,
            frames=t,
            num_inference_steps=4,
            key=jax.random.PRNGKey(seed),
        )

    # compile
    t0 = time.time()
    out = one_video(0)
    _ = np.asarray(out[0, 0, 0, 0])
    print(f"# compile+first video: {time.time()-t0:.0f}s", file=sys.stderr)

    # measure end-to-end videos/min
    n = 8
    t0 = time.time()
    for i in range(n):
        out = one_video(i + 1)
    _ = np.asarray(out[0, 0, 0, 0])  # force completion
    dt = (time.time() - t0) / n
    videos_per_min = 60.0 / dt

    # per-UNet-step ms (sampling loop only / 4 steps)
    sample = pipe._sample_fn(4, 50, False, 0.3)
    w_emb = jnp.zeros((b, 256), dtype)
    lat = jax.random.normal(jax.random.PRNGKey(3), (b, t, lh, lw, 4), dtype)
    fps_arr = jnp.full((b,), 16.0)
    r = sample(unet_params, lat, prompt_embeds, w_emb, fps_arr, jnp.float32(0.0), key)
    _ = np.asarray(r[0, 0, 0, 0])
    t0 = time.time()
    for i in range(4):
        r = sample(unet_params, lat, prompt_embeds, w_emb, fps_arr, jnp.float32(0.0), jax.random.PRNGKey(i))
    _ = np.asarray(r[0, 0, 0, 0])
    step_ms = (time.time() - t0) / 4 / 4 * 1e3

    print(
        f"# end-to-end {dt:.2f} s/video; sampling loop {step_ms:.1f} ms/UNet-step",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "videos_per_min_per_chip_4step_16f_320x512",
                "value": round(videos_per_min, 2),
                "unit": "videos/min",
                "vs_baseline": round(videos_per_min / A100_BASELINE_VIDEOS_PER_MIN, 2),
                "baseline_estimated": True,  # reference publishes no numbers
                "unet_step_ms": round(step_ms, 1),
                **train_stats,
            }
        )
    )


if __name__ == "__main__":
    if "--train-v2" in sys.argv:
        train_v2_bench()
    elif "--train" in sys.argv:
        train_bench(rewards="--rewards" in sys.argv)
    elif "--profile" in sys.argv:
        profile_bench()
    elif "--op-points" in sys.argv:
        operating_points_bench()
    else:
        main()
