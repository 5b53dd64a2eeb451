"""Warmup / AOT-export app tests (tiny configs, CPU).

The warmup app AOT-compiles the production inference programs from
abstract shapes (no weights) and optionally serializes them with
jax.export. These tests check (a) the CLI end-to-end writes the
artifacts + manifest, and (b) a rehydrated artifact computes the SAME
function as the live jitted pipeline it was exported from — replayed
with real weights the export never saw.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from t2v_turbo_tpu.apps import warmup
from t2v_turbo_tpu.diffusion import DiffusionSchedule
from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline

ARGV = [
    "--tiny-model", "--f32", "--steps", "2", "--batch", "1",
    "--frames", "4", "--height", "16", "--width", "16",
]


def test_warmup_exports_and_replays(tmp_path):
    warmup.main(ARGV + ["--export", str(tmp_path)])

    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert set(manifest["programs"]) == {"sample", "vae_decode", "text_encode"}
    for name, entry in manifest["programs"].items():
        assert (tmp_path / entry["artifact"]).exists()
        assert entry["bytes"] > 0

    # live pipeline from the SAME modules, now with real weights
    args = warmup.parse_args(ARGV)
    unet, vae, text, meta = warmup.build_models(args)
    b, t, lh, lw = 1, 4, 8, 8
    key = jax.random.PRNGKey(0)
    lat0 = jnp.zeros((b, t, lh, lw, meta["in_channels"]))
    ctx0 = jnp.zeros((b, meta["ctx_len"], meta["ctx_dim"]))
    up = unet.init(
        key, lat0, jnp.zeros((b,), jnp.int32), ctx0,
        fps=jnp.full((b,), 16.0), timestep_cond=jnp.zeros((b, 256)),
    )
    vp = vae.init(key, jnp.zeros((1, 16, 16, 3)))
    tp = text.init(key, jnp.zeros((1, meta["ctx_len"]), jnp.int32))
    pipe = T2VTurboVC2Pipeline(
        unet=unet, unet_params=up, vae=vae, vae_params=vp,
        text_model=text, text_params=tp, tokenizer=None,
        schedule=DiffusionSchedule.create(), vae_scale=meta["vae_scale"],
        dtype=jnp.float32,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    lat = jax.random.normal(ks[0], lat0.shape)
    ctx = jax.random.normal(ks[1], ctx0.shape)
    wemb = jax.random.normal(ks[2], (b, 256))
    fps = jnp.full((b,), 16.0)
    gs = jnp.float32(0.0)
    skey = jax.random.PRNGKey(11)

    direct = pipe._sample_fn(2, 50, False, 0.3)(
        up, lat, ctx, wemb, fps, gs, skey
    )
    exported = warmup.load_exported(str(tmp_path / "sample.stablehlo"))
    replay = exported.call(up, lat, ctx, wemb, fps, gs, skey)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(replay), rtol=1e-6, atol=1e-6
    )

    z = jax.random.normal(ks[3], (b * t, lh, lw, meta["z_channels"]))
    dec_direct = pipe._decode_jit(vp, z)
    dec_replay = warmup.load_exported(
        str(tmp_path / "vae_decode.stablehlo")
    ).call(vp, z)
    np.testing.assert_allclose(
        np.asarray(dec_direct), np.asarray(dec_replay), rtol=1e-6, atol=1e-6
    )

    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 50, (b, meta["ctx_len"])),
        jnp.int32,
    )
    enc_direct = pipe._encode_jit(tp, toks)
    enc_replay = warmup.load_exported(
        str(tmp_path / "text_encode.stablehlo")
    ).call(tp, toks)
    np.testing.assert_allclose(
        np.asarray(enc_direct), np.asarray(enc_replay), rtol=1e-6, atol=1e-6
    )


def test_warmup_ms_backbone_exports_and_replays(tmp_path):
    """--backbone ms: the MS pipeline's sample program exports and replays
    bit-exactly against the live jit (the MS UNet has no fps conditioning,
    but shares the sample-fn argument surface)."""
    argv = ["--backbone", "ms"] + ARGV
    warmup.main(argv + ["--export", str(tmp_path)])

    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["operating_point"]["backbone"] == "ms"

    args = warmup.parse_args(argv)
    unet, vae, text, meta = warmup.build_models(args)
    from t2v_turbo_tpu.pipelines.ms import T2VTurboMSPipeline

    b, t, lh, lw = 1, 4, 8, 8
    key = jax.random.PRNGKey(0)
    lat0 = jnp.zeros((b, t, lh, lw, meta["in_channels"]))
    ctx0 = jnp.zeros((b, meta["ctx_len"], meta["ctx_dim"]))
    up = unet.init(
        key, lat0, jnp.zeros((b,), jnp.int32), ctx0,
        timestep_cond=jnp.zeros((b, 256)),
    )
    vp = vae.init(key, jnp.zeros((1, 16, 16, 3)))
    tp = text.init(key, jnp.zeros((1, meta["ctx_len"]), jnp.int32))
    pipe = T2VTurboMSPipeline(
        unet=unet, unet_params=up, vae=vae, vae_params=vp,
        text_model=text, text_params=tp, tokenizer=None,
        schedule=DiffusionSchedule.create(), vae_scale=meta["vae_scale"],
        dtype=jnp.float32,
    )
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    lat = jax.random.normal(ks[0], lat0.shape)
    ctx = jax.random.normal(ks[1], ctx0.shape)
    wemb = jax.random.normal(ks[2], (b, 256))
    argsd = (up, lat, ctx, wemb, jnp.full((b,), 16.0), jnp.float32(0.0),
             jax.random.PRNGKey(5))
    direct = pipe._sample_fn(2, 50, False, 0.3)(*argsd)
    replay = warmup.load_exported(str(tmp_path / "sample.stablehlo")).call(*argsd)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(replay), rtol=1e-6, atol=1e-6
    )
