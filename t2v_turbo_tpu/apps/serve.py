"""HTTP serving app — the reference's gradio demo surface (app.py:201-392)
as a dependency-free JSON API.

  python -m t2v_turbo_tpu.apps.serve --random-weights --tiny --port 7860

  POST /generate {"prompt": "...", "steps": 4, "frames": 16, "seed": 123,
                  "guidance_scale": 7.5, "fps": 16}
    -> {"path": "outputs/xxxx.mp4", "latency_s": ..., "shape": [...]}
  GET /healthz -> {"status": "ok", "device": "...", "compiled_shapes": [...]}

The pipeline's per-shape jit cache means the first request at a new
(frames, steps) operating point pays compile; later requests are pure
device time (the recompilation-discipline answer to the reference's
user-facing knobs, SURVEY.md §7).
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo TPU server")
    p.add_argument("--config", default="configs/vc2_t2v_512.yaml")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--unet-ckpt", default=None)
    p.add_argument("--lora-ckpt", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny dims for smoke")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        args.height, args.width, args.frames = 128, 128, 8

    from .generate import build_pipeline

    class A:  # adapter for build_pipeline's arg surface
        pass

    a = A()
    for k in ("config", "checkpoint", "unet_ckpt", "lora_ckpt", "random_weights",
              "frames", "height", "width"):
        setattr(a, k, getattr(args, k, None))
    a.cpu = args.cpu

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    # generate.build_pipeline doesn't read lora for random mode; reuse as-is
    pipe = build_pipeline(a)
    os.makedirs(args.output_dir, exist_ok=True)

    from ..io.video import save_video
    from ..pipelines.vc2 import video_to_uint8

    device = str(jax.devices()[0])

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

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "device": device,
                    "compiled_shapes": [list(k) for k in pipe._sample_jit_cache],
                })
            else:
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
                self._json(200, {
                    "path": path,
                    "latency_s": round(time.time() - t0, 3),
                    "shape": list(frames_u8.shape),
                })
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port} (device {device})")
    server.serve_forever()


if __name__ == "__main__":
    main()
