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


def train_bench():
    """Optional `python bench.py --train`: full-size v1 LCD training-step
    throughput (LoRA r=64 student + frozen teacher, bs=1, 16x40x64 latents,
    bf16 + remat — the reference's per-rank recipe,
    train_t2v_turbo_v1.sh). Prints one JSON line with samples/sec."""
    import optax

    from t2v_turbo_tpu.diffusion import DDIMSolver, DiffusionSchedule
    from t2v_turbo_tpu.models import UNetConfig, UNetModel
    from t2v_turbo_tpu.training.lcd import LCDConfig
    from t2v_turbo_tpu.training.trainer import LCDTrainer, TrainerConfig
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
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
        lcd_cfg=LCDConfig(),
        optimizer=optax.adamw(1e-5),
        cfg=TrainerConfig(output_dir="/tmp/bench_train", lora_rank=64),
    )
    rng = np.random.RandomState(0)
    batch = trainer.shard_batch(
        {
            "latents": rng.randn(b, t, lh, lw, 4).astype(np.float32),
            "ctx": rng.randn(b, 77, 1024).astype(np.float32),
            "uncond_ctx": np.zeros((b, 77, 1024), np.float32),
            "fps": np.full((b,), 16.0, np.float32),
        }
    )
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
    print(
        json.dumps(
            {
                "metric": "lcd_v1_train_samples_per_sec_bs1_16f_320x512",
                "value": round(b / step_s, 3),
                "unit": "samples/sec",
                "step_ms": round(step_s * 1e3, 1),
                "lora_rank": 64,
            }
        )
    )


def main():
    from t2v_turbo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
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
            }
        )
    )


if __name__ == "__main__":
    if "--train" in sys.argv:
        train_bench()
    else:
        main()
