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
