"""CLI: warm the compile cache / export serialized inference programs.

Compile time is a first-class operational constraint for this framework
(PERF_NOTES r3 #5: a remote-compile channel that breaks ~45-65 min into a
single compile, and a persistent cache that only stores COMPLETED
compiles). This app compiles the production inference programs OUT OF
BAND so serving and first-generate start as cache hits:

- abstract-shape AOT lowering (`jax.jit(...).lower(ShapeDtypeStruct...)
  .compile()`): no weights are materialized — warming the full 1.4B-param
  pipeline needs no checkpoint and only megabytes of host memory;
- the warmed programs are built from the SAME jit closures generate/serve
  use (`T2VTurboVC2Pipeline._sample_fn` / `_decode_jit` / `_encode_jit`),
  so the persistent-cache keys match what production traffic will look up;
- `--export DIR` additionally serializes each program with `jax.export`
  (versioned StableHLO) and writes a manifest; `load_exported` rehydrates
  an artifact and calls it WITHOUT the model code — a deployment surface
  the reference does not have (its predict.py re-traces torch modules on
  every process start; SURVEY.md §5 notes it manages compile/startup time
  not at all).

Usage:
  python -m t2v_turbo_tpu.apps.warmup --steps 4 --frames 16 \
      --height 320 --width 512                 # fill the persistent cache
  python -m t2v_turbo_tpu.apps.warmup --export /models/t2v_aot   # + artifacts
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="AOT-compile / export the T2V-Turbo inference programs"
    )
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--backbone", default="vc2", choices=["vc2", "ms"],
                   help="VideoCrafter2 (320x512) or ModelScope (256x256); "
                        "both pipelines share the same three programs")
    p.add_argument("--tiny-model", action="store_true",
                   help="tiny UNet/VAE/text configs (smoke / tests)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--lcm-origin-steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--decode-chunk", type=int, default=0,
                   help="frames per VAE-decode program (0 = batch*frames, "
                        "matching the pipeline default)")
    p.add_argument("--use-motion-cond", action="store_true")
    p.add_argument("--percentage", type=float, default=0.3)
    p.add_argument("--f32", action="store_true",
                   help="float32 compute (default bfloat16)")
    p.add_argument("--export", default=None, metavar="DIR",
                   help="also serialize each program (jax.export StableHLO) "
                        "into DIR with a manifest.json")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args(argv)


def build_models(args):
    """Models + geometry for the requested operating point (no weights).

    Returns (unet, vae, text_model, meta) where meta carries the latent /
    context geometry the program shapes derive from PLUS the schedule /
    scale_factor the loaded --config defines: warmed programs must bake
    the SAME diffusion constants generate/serve bake, or the persistent
    cache keys silently never match production (any config whose
    linear_start/linear_end/timesteps or scale_factor differs from the
    defaults would otherwise warm a dead cache entry). Shared with tests
    so an exported tiny program can be replayed against a live pipeline
    built from the identical modules.
    """
    import jax.numpy as jnp

    from ..diffusion import DiffusionSchedule
    from ..models.clip_text import CLIPTextConfig, CLIPTextModel
    from ..models.vae import AutoencoderKL, VAEConfig

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    backbone = getattr(args, "backbone", "vc2")
    if backbone == "ms":
        from ..models.unet_ms import MSUNetConfig, MSUNet3DConditionModel

        if args.tiny_model:
            ucfg = MSUNetConfig(
                block_out_channels=(32, 64), layers_per_block=1,
                attention_head_dim=16, cross_attention_dim=16,
                time_cond_proj_dim=8,
            )
            vcfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
            tcfg = CLIPTextConfig(
                vocab_size=50, width=16, heads=2, layers=2, context_length=8
            )
        else:
            # reference app_ms.py operating point: full SD VAE, full-depth
            # CLIP text tower (generate.build_ms_pipeline)
            ucfg = MSUNetConfig(time_cond_proj_dim=256)
            vcfg = VAEConfig()
            tcfg = CLIPTextConfig(penultimate=False)
        unet = MSUNet3DConditionModel(cfg=ucfg, dtype=dtype)
        schedule = DiffusionSchedule.create()
        scale_factor = 0.18215
        ctx_dim = ucfg.cross_attention_dim
    else:
        from ..models.unet_vc2 import UNetConfig, UNetModel

        if args.tiny_model:
            ucfg = UNetConfig(
                model_channels=32, num_res_blocks=1,
                attention_resolutions=(2, 1), channel_mult=(1, 2),
                num_head_channels=16, context_dim=16,
                temporal_length=4, time_cond_proj_dim=8,
            )
            vcfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
            tcfg = CLIPTextConfig(
                vocab_size=50, width=16, heads=2, layers=2, context_length=8
            )
            schedule = DiffusionSchedule.create()
            scale_factor = 0.18215
        else:
            from ..config import load_vc2_config

            spec = load_vc2_config(args.config, time_cond_proj_dim=256)
            ucfg, vcfg, tcfg = spec.unet, spec.vae, CLIPTextConfig()
            schedule = spec.make_schedule()
            scale_factor = spec.scale_factor
        unet = UNetModel(cfg=ucfg, dtype=dtype)
        ctx_dim = ucfg.context_dim
    vae = AutoencoderKL(cfg=vcfg, dtype=dtype)
    text_model = CLIPTextModel(cfg=tcfg, dtype=dtype)
    meta = {
        "dtype": dtype,
        "backbone": backbone,
        "vae_scale": 2 ** (len(vcfg.ch_mult) - 1),
        "ctx_len": tcfg.context_length,
        "ctx_dim": ctx_dim,
        "in_channels": ucfg.in_channels,
        "z_channels": vcfg.embed_dim,
        "schedule": schedule,
        "scale_factor": scale_factor,
    }
    return unet, vae, text_model, meta


def build_programs(args):
    """(name, jitted_fn, abstract_args) for each production program.

    Param trees are `jax.eval_shape` abstractions of the real inits —
    identical structure/shapes/dtypes to a loaded checkpoint, zero bytes
    materialized.
    """
    import jax
    import jax.numpy as jnp

    from ..pipelines.ms import T2VTurboMSPipeline
    from ..pipelines.vc2 import T2VTurboVC2Pipeline

    unet, vae, text_model, meta = build_models(args)
    dtype = meta["dtype"]
    b, t = args.batch, args.frames
    lh = args.height // meta["vae_scale"]
    lw = args.width // meta["vae_scale"]

    lat = jax.ShapeDtypeStruct((b, t, lh, lw, meta["in_channels"]), dtype)
    ts = jax.ShapeDtypeStruct((b,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((b, meta["ctx_len"], meta["ctx_dim"]), dtype)
    wemb = jax.ShapeDtypeStruct((b, 256), dtype)
    fps = jax.ShapeDtypeStruct((b,), jnp.float32)
    gs = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)  # legacy threefry key
    toks = jax.ShapeDtypeStruct((b, meta["ctx_len"]), jnp.int32)

    if meta["backbone"] == "ms":
        unet_abs = jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros(lat.shape, dtype),
                jnp.zeros((b,), jnp.int32),
                jnp.zeros(ctx.shape, dtype),
                timestep_cond=jnp.zeros((b, 256), dtype),
            )
        )
    else:
        unet_abs = jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros(lat.shape, dtype),
                jnp.zeros((b,), jnp.int32),
                jnp.zeros(ctx.shape, dtype),
                fps=jnp.full((b,), 16.0),
                timestep_cond=jnp.zeros((b, 256), dtype),
            )
        )
    vae_abs = jax.eval_shape(
        lambda: vae.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, meta["vae_scale"] * 8, meta["vae_scale"] * 8, 3), dtype),
        )
    )
    text_abs = jax.eval_shape(
        lambda: text_model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, meta["ctx_len"]), jnp.int32)
        )
    )

    pipe_cls = (
        T2VTurboMSPipeline if meta["backbone"] == "ms" else T2VTurboVC2Pipeline
    )
    pipe = pipe_cls(
        unet=unet, unet_params=unet_abs, vae=vae, vae_params=vae_abs,
        text_model=text_model, text_params=text_abs, tokenizer=None,
        schedule=meta["schedule"], scale_factor=meta["scale_factor"],
        vae_scale=meta["vae_scale"], dtype=dtype,
    )
    sample = pipe._sample_fn(
        args.steps, args.lcm_origin_steps, args.use_motion_cond,
        args.percentage,
    )
    chunk = args.decode_chunk or b * t
    dec = jax.ShapeDtypeStruct((chunk, lh, lw, meta["z_channels"]), dtype)
    # the operating point baked into the exported HLO: everything
    # pipelines/artifact.py needs to reproduce the host orchestration
    # (and to reject requests the artifacts cannot serve)
    op = {
        "steps": args.steps,
        "lcm_origin_steps": args.lcm_origin_steps,
        "batch": b,
        "frames": t,
        "height": args.height,
        "width": args.width,
        "use_motion_cond": args.use_motion_cond,
        "percentage": args.percentage,
        "decode_chunk": chunk,
        "dtype": jnp.dtype(dtype).name,
        "tiny_model": args.tiny_model,
        "backbone": meta["backbone"],
        "vae_scale": meta["vae_scale"],
        "ctx_dim": meta["ctx_dim"],
        "z_channels": meta["z_channels"],
        "ctx_len": meta["ctx_len"],
        "in_channels": meta["in_channels"],
        "w_embedding_dim": pipe.w_embedding_dim,
        "init_noise_sigma": pipe.scheduler.init_noise_sigma,
    }
    programs = [
        ("sample", sample, (unet_abs, lat, ctx, wemb, fps, gs, key)),
        ("vae_decode", pipe._decode_jit, (vae_abs, dec)),
        ("text_encode", pipe._encode_jit, (text_abs, toks)),
    ]
    return programs, op


def export_program(fn, abstract_args, path: str) -> int:
    """Serialize one jitted program (jax.export StableHLO) to `path`."""
    from jax import export as jax_export

    exp = jax_export.export(fn)(*abstract_args)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Rehydrate a serialized program; call it via `.call(*args)` — no
    model code needed (the artifact embeds the StableHLO + pytree defs)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..utils.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    programs, op = build_programs(args)

    manifest = {
        "platform": jax.default_backend(),
        "operating_point": op,
        "programs": {},
    }
    if args.export:
        os.makedirs(args.export, exist_ok=True)
    for name, fn, abstract_args in programs:
        t0 = time.perf_counter()
        lowered = fn.lower(*abstract_args)
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        del compiled
        entry = {"compile_s": round(dt, 2)}
        if args.export:
            path = os.path.join(args.export, f"{name}.stablehlo")
            entry["artifact"] = os.path.basename(path)
            entry["bytes"] = export_program(fn, abstract_args, path)
        manifest["programs"][name] = entry
        print(f"# {name}: compiled in {dt:.1f}s"
              + (f", exported {entry.get('bytes', 0)} B" if args.export else ""),
              file=sys.stderr)
    if args.export:
        with open(os.path.join(args.export, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
    print(json.dumps({"cache_dir": cache_dir, **manifest}))


if __name__ == "__main__":
    main()
