"""HTTP serving surface: routes, browser UI, gallery — against a stub
pipeline (no model compile), mirroring the reference demo app.py:201-392."""

import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.apps.serve import make_server


class StubPipe:
    _sample_jit_cache = {(4, 50, False, 0.3): None}

    def __call__(self, prompt=None, height=32, width=32, frames=4, **kw):
        t = np.linspace(-1, 1, 1 * frames * height * width * 3)
        return jnp.asarray(
            t.reshape(1, frames, height, width, 3), jnp.float32
        )


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    class A:
        host = "127.0.0.1"
        port = 0
        output_dir = str(tmp_path_factory.mktemp("srv"))
        height = 32
        width = 32
        frames = 4

    srv = make_server(StubPipe(), A())
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_index_page(server):
    code, ctype, body = get(server + "/")
    assert code == 200 and "text/html" in ctype
    assert b"Generate" in body and b"/generate" in body


def test_healthz(server):
    code, _, body = get(server + "/healthz")
    assert code == 200
    data = json.loads(body)
    assert data["status"] == "ok"
    assert data["compiled_shapes"] == [[4, 50, False, 0.3]]


def test_generate_gallery_and_video(server):
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps({"prompt": "a cat", "frames": 4,
                         "height": 32, "width": 32}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    assert out["prompt"] == "a cat"
    assert out["video_url"].startswith("/videos/")
    assert out["shape"] == [4, 32, 32, 3]

    code, _, body = get(server + "/gallery")
    assert code == 200 and json.loads(body)[0]["prompt"] == "a cat"

    code, ctype, body = get(server + out["video_url"])
    assert code == 200 and ctype == "video/mp4" and len(body) > 100


def test_missing_prompt_400(server):
    req = urllib.request.Request(
        server + "/generate", data=b"{}", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_404(server):
    try:
        get(server + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_parse_args_ms_backbone_plumbing():
    """--backbone ms / --ms-dir parse and reach build_pipeline's arg surface
    (app_ms.py-parity serving; the pipeline build itself is covered by
    test_unet_ms.py::TestMSPipeline)."""
    from t2v_turbo_tpu.apps.serve import parse_args

    args = parse_args(
        ["--backbone", "ms", "--ms-dir", "/tmp/msdir", "--random-weights"]
    )
    assert args.backbone == "ms" and args.ms_dir == "/tmp/msdir"
    # the adapter in main() copies these keys verbatim; keep them in sync
    import inspect

    from t2v_turbo_tpu.apps import serve

    src = inspect.getsource(serve.main)
    for k in ("backbone", "ms_dir"):
        assert f'"{k}"' in src


# ---------------------------------------------------------------------------
# AOT-artifact serving (serve.py --artifacts): the exported StableHLO
# programs + param pytrees reproduce the live pipeline bit-for-bit, and the
# HTTP surface runs on top of them with no model code in the request path.
# ---------------------------------------------------------------------------


class _StubTokenizer:
    """Fixed-token tokenizer for the tiny text config (ctx_len=8)."""

    def __call__(self, prompt):
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        toks = np.zeros((len(prompts), 8), np.int32)
        for i, p in enumerate(prompts):
            for j, ch in enumerate(p[:8]):
                toks[i, j] = (ord(ch) % 49) + 1
        return toks


@pytest.fixture(scope="module")
def artifact_setup(tmp_path_factory):
    """Export tiny artifacts + build the matching live pipeline."""
    import jax

    from t2v_turbo_tpu.apps import warmup
    from t2v_turbo_tpu.diffusion import DiffusionSchedule
    from t2v_turbo_tpu.pipelines.artifact import ArtifactPipeline
    from t2v_turbo_tpu.pipelines.vc2 import T2VTurboVC2Pipeline

    outdir = tmp_path_factory.mktemp("aot")
    argv = [
        "--tiny-model", "--f32", "--steps", "2", "--batch", "1",
        "--frames", "4", "--height", "16", "--width", "16",
    ]
    warmup.main(argv + ["--export", str(outdir)])

    args = warmup.parse_args(argv)
    unet, vae, text, meta = warmup.build_models(args)
    b = 1
    key = jax.random.PRNGKey(0)
    lat0 = jnp.zeros((b, 4, 8, 8, meta["in_channels"]))
    ctx0 = jnp.zeros((b, meta["ctx_len"], meta["ctx_dim"]))
    up = unet.init(
        key, lat0, jnp.zeros((b,), jnp.int32), ctx0,
        fps=jnp.full((b,), 16.0), timestep_cond=jnp.zeros((b, 256)),
    )
    vp = vae.init(key, jnp.zeros((1, 16, 16, 3)))
    tp = text.init(key, jnp.zeros((1, meta["ctx_len"]), jnp.int32))

    tok = _StubTokenizer()
    live = T2VTurboVC2Pipeline(
        unet=unet, unet_params=up, vae=vae, vae_params=vp,
        text_model=text, text_params=tp, tokenizer=tok,
        schedule=DiffusionSchedule.create(), vae_scale=meta["vae_scale"],
        dtype=jnp.float32,
    )
    art = ArtifactPipeline.from_dir(
        str(outdir), unet_params=up, vae_params=vp, text_params=tp,
        tokenizer=tok,
    )
    return live, art


def test_artifact_pipeline_matches_live(artifact_setup):
    """Full prompt->video equality: artifacts vs live modules, same key."""
    import jax

    live, art = artifact_setup
    kw = dict(
        prompt="a cat", height=16, width=16, frames=4, fps=16,
        guidance_scale=7.5, num_inference_steps=2, lcm_origin_steps=50,
        key=jax.random.PRNGKey(42),
    )
    v_live = live(**kw)
    v_art = art(**kw)
    assert v_art.shape == v_live.shape == (1, 4, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(v_live), np.asarray(v_art))


def test_artifact_pipeline_rejects_off_point(artifact_setup):
    import jax

    _, art = artifact_setup
    with pytest.raises(ValueError, match="frames=4"):
        art(prompt="a cat", frames=8, height=16, width=16,
            num_inference_steps=2, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="steps=2"):
        art(prompt="a cat", frames=4, height=16, width=16,
            num_inference_steps=4, key=jax.random.PRNGKey(0))


def test_http_serving_from_artifacts(artifact_setup, tmp_path):
    """POST /generate against a server backed by the artifact pipeline."""
    _, art = artifact_setup

    class A:
        host = "127.0.0.1"
        port = 0
        output_dir = str(tmp_path)
        height = 16
        width = 16
        frames = 4

    srv = make_server(art, A())
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        code, _, body = get(url + "/healthz")
        assert code == 200
        assert json.loads(body)["compiled_shapes"] == [[2, 50, False, 0.3]]

        req = urllib.request.Request(
            url + "/generate",
            data=json.dumps({"prompt": "a dog", "steps": 2, "frames": 4,
                             "seed": 7}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["shape"] == [4, 16, 16, 3]
        code, ctype, body = get(url + out["video_url"])
        assert code == 200 and ctype == "video/mp4" and len(body) > 100
    finally:
        srv.shutdown()
