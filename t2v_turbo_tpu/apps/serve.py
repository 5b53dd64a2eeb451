"""HTTP serving app — the reference's gradio demo surface (app.py:201-392)
as a dependency-free JSON API plus a static browser UI.

  python -m t2v_turbo_tpu.apps.serve --random-weights --tiny --port 7860

  GET  /          -> browser demo (prompt box, knobs, examples, gallery —
                     the app.py gradio UI equivalents, zero dependencies)
  POST /generate {"prompt": "...", "steps": 4, "frames": 16, "seed": 123,
                  "guidance_scale": 7.5, "fps": 16}
    -> {"path": "outputs/xxxx.mp4", "video_url": "/videos/xxxx.mp4", ...}
  GET  /videos/<name>.mp4 -> the rendered clip
  GET  /gallery -> JSON list of this session's generations
  GET  /healthz -> {"status": "ok", "device": "...", "compiled_shapes": [...]}

The pipeline's per-shape jit cache means the first request at a new
(frames, steps) operating point pays compile; later requests are pure
device time (the recompilation-discipline answer to the reference's
user-facing knobs, SURVEY.md §7).

With --artifacts DIR the server instead loads the `warmup --export`
StableHLO programs (pipelines/artifact.py): no model code, no tracing, no
compile on the serving host — requests are bound to the exported operating
point and every request is pure device time from the first one.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


# Example prompts: the reference demo's flavor (app.py examples) using the
# fixed validation set from training/validation.py for comparability.
_EXAMPLE_PROMPTS = [
    "An astronaut riding a horse.",
    "A cat eating food out of a bowl, in style of van Gogh.",
    "A dog wearing a superhero outfit with red cape flying through the sky.",
    "A panda drinking coffee in a cafe in Paris.",
    "A musk ox grazing on beautiful wildflowers.",
]

_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>T2V-Turbo TPU</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:880px;margin:2rem auto;
      padding:0 1rem;color:#222}
 h1{font-size:1.4rem} .row{display:flex;gap:.6rem;flex-wrap:wrap;
      align-items:center;margin:.4rem 0}
 textarea{width:100%;height:3.2rem;font-size:1rem;padding:.4rem}
 label{font-size:.85rem;color:#555} input[type=number]{width:5.5rem}
 button{padding:.5rem 1.2rem;font-size:1rem;cursor:pointer}
 .ex{cursor:pointer;color:#06c;font-size:.85rem;margin-right:.8rem}
 #status{color:#777;font-size:.9rem;min-height:1.2rem}
 #gallery{display:flex;flex-wrap:wrap;gap:.8rem;margin-top:1rem}
 #gallery figure{margin:0;width:256px}
 #gallery video{width:100%%;border-radius:6px;background:#000}
 #gallery figcaption{font-size:.75rem;color:#666;word-break:break-word}
</style></head><body>
<h1>T2V-Turbo (TPU) — text to video</h1>
<textarea id="prompt" placeholder="Describe the video..."></textarea>
<div class="row" id="examples"></div>
<div class="row">
 <label>steps <input id="steps" type="number" value="4" min="1" max="16"></label>
 <label>frames <input id="frames" type="number" value="16" min="8" max="48"></label>
 <label>guidance <input id="gs" type="number" value="7.5" step="0.5"></label>
 <label>seed <input id="seed" type="number" value="123"></label>
 <label>fps <input id="fps" type="number" value="16" min="8" max="32"></label>
 <button id="go">Generate</button>
</div>
<div id="status"></div>
<div id="gallery"></div>
<script>
const EXAMPLES = %EXAMPLES%;
const ex = document.getElementById('examples');
EXAMPLES.forEach(p => { const a=document.createElement('span');
  a.className='ex'; a.textContent=p;
  a.onclick=()=>{document.getElementById('prompt').value=p;}; ex.appendChild(a);});
async function refresh(){
  const g = await (await fetch('/gallery')).json();
  const el = document.getElementById('gallery'); el.innerHTML='';
  g.slice().reverse().forEach(it => {
    const f=document.createElement('figure');
    f.innerHTML=`<video src="${it.video_url}" controls loop muted autoplay></video>
      <figcaption>${it.prompt} — ${it.latency_s}s</figcaption>`;
    el.appendChild(f);});
}
document.getElementById('go').onclick = async () => {
  const s=document.getElementById('status');
  const body={prompt:document.getElementById('prompt').value,
    steps:+document.getElementById('steps').value,
    frames:+document.getElementById('frames').value,
    guidance_scale:+document.getElementById('gs').value,
    seed:+document.getElementById('seed').value,
    fps:+document.getElementById('fps').value};
  if(!body.prompt){s.textContent='enter a prompt';return;}
  s.textContent='generating... (first request at a new shape compiles)';
  const r=await fetch('/generate',{method:'POST',body:JSON.stringify(body)});
  const j=await r.json();
  s.textContent = r.ok ? `done in ${j.latency_s}s` : `error: ${j.error}`;
  refresh();
};
refresh();
</script></body></html>"""


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo TPU server")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--backbone", default="vc2", choices=["vc2", "ms"],
                   help="VideoCrafter2 (app.py parity) or ModelScope "
                        "(app_ms.py parity)")
    p.add_argument("--ms-dir", default=None,
                   help="diffusers multi-file dir for --backbone ms")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--unet-ckpt", default=None)
    p.add_argument("--lora-ckpt", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--artifacts", default=None, metavar="DIR",
                   help="serve from `warmup --export DIR` StableHLO "
                        "artifacts instead of live modules: no model code "
                        "runs on this host, no tracing, no compile — the "
                        "programs are deserialized and called as-is. "
                        "Requests are bound to the artifact's operating "
                        "point (steps/frames/height/width).")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny dims for smoke")
    p.add_argument("--data-shards", type=int, default=1)
    p.add_argument("--seq-shards", type=int, default=1)
    p.add_argument("--model-shards", type=int, default=1)
    return p.parse_args(argv)


def build_artifact_pipeline(args):
    """ArtifactPipeline from --artifacts DIR + checkpoint-imported params.

    The checkpoint path (--checkpoint/--unet-ckpt/--lora-ckpt) constructs
    NO model modules — io/torch_import maps the torch key trees straight to
    pytrees. --random-weights falls back to flax inits (smoke mode only;
    that path does import the model code).
    """
    import sys

    from ..pipelines.artifact import ArtifactPipeline
    from ..utils.tokenizer import CLIPTokenizer

    with open(os.path.join(args.artifacts, "manifest.json")) as f:
        op = json.load(f)["operating_point"]

    if args.checkpoint:
        from ..config import load_vc2_config
        from .generate import load_vc2_checkpoint_params

        spec = load_vc2_config(args.config, time_cond_proj_dim=256)
        unet_params, vae_params, text_params = load_vc2_checkpoint_params(
            args, spec
        )
    elif args.ms_dir:
        # ModelScope diffusers layout: key-converted pytrees, no modules
        from ..io.torch_import import (
            import_ms_unet_params,
            load_ms_components,
            load_torch_state_dict,
        )

        comps = load_ms_components(args.ms_dir)
        unet_params = {"params": comps["unet"]}
        if args.unet_ckpt:
            unet_params = {"params": import_ms_unet_params(
                load_torch_state_dict(args.unet_ckpt)
            )}
        vae_params = {"params": comps["vae"]}
        text_params = {"params": comps["text"]}
    elif args.random_weights:
        # smoke mode: init random params MATCHING the artifact's operating
        # point (this path does import the model code)
        import jax
        import jax.numpy as jnp

        from . import warmup

        wargs = warmup.parse_args(
            (["--tiny-model"] if op.get("tiny_model") else [])
            + (["--f32"] if op["dtype"] == "float32" else [])
            + ["--backbone", op.get("backbone", "vc2")]
            + ["--config", args.config]
        )
        unet, vae, text, meta = warmup.build_models(wargs)
        dtype = jnp.dtype(op["dtype"])
        b, t = op["batch"], op["frames"]
        lh = op["height"] // op["vae_scale"]
        lw = op["width"] // op["vae_scale"]
        cond_kw = dict(timestep_cond=jnp.zeros((b, 256), dtype))
        if op.get("backbone", "vc2") == "vc2":
            cond_kw["fps"] = jnp.full((b,), 16.0)
        unet_params = jax.jit(lambda k: unet.init(
            k, jnp.zeros((b, t, lh, lw, op["in_channels"]), dtype),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, op["ctx_len"], op["ctx_dim"]), dtype),
            **cond_kw,
        ))(jax.random.PRNGKey(0))
        vae_params = jax.jit(lambda k: vae.init(
            k, jnp.zeros((1, op["vae_scale"] * 8, op["vae_scale"] * 8, 3),
                         dtype)))(jax.random.PRNGKey(1))
        text_params = jax.jit(lambda k: text.init(
            k, jnp.zeros((1, op["ctx_len"]), jnp.int32),
        ))(jax.random.PRNGKey(2))
    else:
        print("error: --artifacts needs --checkpoint or --random-weights",
              file=sys.stderr)
        raise SystemExit(2)

    ctx_len = op["ctx_len"]
    if ctx_len == 77:
        tokenizer = CLIPTokenizer()
    else:
        # tiny smoke exports use a toy text config; zero tokens suffice
        import numpy as _np

        def tokenizer(prompt):
            n = 1 if isinstance(prompt, str) else len(prompt)
            return _np.zeros((n, ctx_len), _np.int32)

    return ArtifactPipeline.from_dir(
        args.artifacts,
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        tokenizer=tokenizer,
    )


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        args.height, args.width, args.frames = 128, 128, 8

    from .generate import build_pipeline

    class A:  # adapter for build_pipeline's arg surface
        pass

    a = A()
    for k in ("config", "backbone", "ms_dir", "checkpoint", "unet_ckpt",
              "lora_ckpt", "random_weights",
              "frames", "height", "width", "data_shards", "seq_shards",
              "model_shards"):
        setattr(a, k, getattr(args, k, None))
    a.cpu = args.cpu

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if args.artifacts:
        pipe = build_artifact_pipeline(args)
    else:
        # generate.build_pipeline doesn't read lora for random mode; as-is
        pipe = build_pipeline(a)
    server = make_server(pipe, args)
    print(
        f"serving on http://{args.host}:{args.port} "
        f"(device {jax.devices()[0]})"
    )
    server.serve_forever()


def make_server(pipe, args) -> ThreadingHTTPServer:
    """Build the HTTP server around any pipeline object (tests inject a
    stub; main() passes the real one)."""
    import jax

    os.makedirs(args.output_dir, exist_ok=True)

    from ..io.video import save_video
    # pipelines.artifact's copy: identical math, but importing pipelines.vc2
    # would pull the model packages onto an artifacts-only serving host
    from ..pipelines.artifact import video_to_uint8

    device = str(jax.devices()[0])
    gallery: list = []
    index_html = _INDEX_HTML.replace(
        "%EXAMPLES%", json.dumps(_EXAMPLE_PROMPTS)
    ).replace("%%", "%").encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                return self._bytes(200, index_html, "text/html; charset=utf-8")
            if self.path == "/healthz":
                return self._json(200, {
                    "status": "ok",
                    "device": device,
                    "compiled_shapes": [list(k) for k in pipe._sample_jit_cache],
                })
            if self.path == "/gallery":
                return self._json(200, gallery)
            if self.path.startswith("/videos/"):
                name = os.path.basename(self.path)
                fp = os.path.join(args.output_dir, name)
                if os.path.exists(fp) and name.endswith(".mp4"):
                    with open(fp, "rb") as f:
                        return self._bytes(200, f.read(), "video/mp4")
                return self._json(404, {"error": "no such video"})
            self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req.get("prompt")
                if not prompt:
                    return self._json(400, {"error": "missing 'prompt'"})
                t0 = time.time()
                video = pipe(
                    prompt=prompt,
                    height=int(req.get("height", args.height)),
                    width=int(req.get("width", args.width)),
                    frames=int(req.get("frames", args.frames)),
                    fps=int(req.get("fps", 16)),
                    guidance_scale=float(req.get("guidance_scale", 7.5)),
                    num_inference_steps=int(req.get("steps", 4)),
                    lcm_origin_steps=int(req.get("lcm_origin_steps", 50)),
                    key=jax.random.PRNGKey(int(req.get("seed", 0))),
                )
                frames_u8 = video_to_uint8(video)[0]
                name = f"{uuid.uuid4().hex[:12]}.mp4"
                path = save_video(
                    frames_u8, os.path.join(args.output_dir, name),
                    fps=int(req.get("save_fps", 8)),
                )
                entry = {
                    "path": path,
                    "video_url": f"/videos/{name}",
                    "prompt": prompt,
                    "latency_s": round(time.time() - t0, 3),
                    "shape": list(frames_u8.shape),
                }
                gallery.append(entry)
                del gallery[:-50]  # bound the in-memory gallery
                self._json(200, entry)
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((args.host, args.port), Handler)


if __name__ == "__main__":
    main()
