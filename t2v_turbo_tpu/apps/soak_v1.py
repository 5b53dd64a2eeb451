"""Production-shape soak run: tar shards -> webdata loader -> native decode
-> VAE/text encode -> the real jitted v1 LCD step, under preemption fire.

The reference never composes its layers under test (SURVEY.md §4: no test
suite; its training loop is only ever validated by running the real job,
train_t2v_turbo_v1_lora.py:812-836,908-933). This driver composes the full
input path with the real train step and measures what a production operator
cares about:

  1. synthesize tar shards of real x264 mp4s (the native encoder writes
     them; the native decoder reads them back — a codec round-trip, not a
     numpy shortcut),
  2. phase A: run `apps.train_v1` as a SUBPROCESS against the shards,
     SIGTERM it mid-run, assert a graceful final checkpoint,
  3. phase B: relaunch the same command, assert it RESUMES (first logged
     step continues past phase A's checkpoint, no step-0 restart),
  4. summarize end-to-end samples/sec and the input-bound fraction
     (`data_wait_frac` from the trainer's metrics.jsonl: host time blocked
     on the prefetcher / wall time).

Usage (full production shape, one TPU chip, ~10-15 min):
  python -m t2v_turbo_tpu.apps.soak_v1 --workdir /tmp/soak \
      --phase-a-s 360 --phase-b-s 240

Tiny CPU shape (CI: tests/test_soak.py drives this in-process):
  python -m t2v_turbo_tpu.apps.soak_v1 --workdir /tmp/soak --tiny \
      --phase-a-s 40 --phase-b-s 30
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tarfile
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="T2V-Turbo v1 trainer+data soak")
    p.add_argument("--workdir", required=True)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + 16x16 clips on CPU (CI shape)")
    p.add_argument("--n-shards", type=int, default=4)
    p.add_argument("--clips-per-shard", type=int, default=12)
    p.add_argument("--clip-frames", type=int, default=64)
    p.add_argument("--clip-fps", type=float, default=16.0)
    p.add_argument("--phase-a-s", type=float, default=360.0,
                   help="seconds before the mid-run SIGTERM")
    p.add_argument("--phase-b-s", type=float, default=240.0,
                   help="seconds for the resumed run")
    p.add_argument("--checkpointing-steps", type=int, default=50)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--n-frames", type=int, default=16)
    p.add_argument("--optimizer", default="adamw8bit")
    p.add_argument("--seed", type=int, default=453645634)
    return p.parse_args(argv)


def make_shards(shard_dir: str, n_shards: int, clips_per_shard: int,
                frames: int, h: int, w: int, fps: float, seed: int = 0):
    """Write tar shards of synthetic-but-real x264 mp4s + captions.

    Clip content is a per-clip moving gradient + drifting square + noise so
    the encoder does real motion-compensation work (an all-black clip would
    compress to nothing and decode for free)."""
    import numpy as np

    from ..data import videoio

    os.makedirs(shard_dir, exist_ok=True)
    paths = []
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    clip_id = 0
    for s in range(n_shards):
        tar_path = os.path.join(shard_dir, f"soak-{s:04d}.tar")
        paths.append(tar_path)
        if os.path.exists(tar_path):
            clip_id += clips_per_shard
            continue
        with tarfile.open(tar_path, "w") as tf:
            for c in range(clips_per_shard):
                phase = rng.uniform(0, 2 * np.pi)
                speed = rng.uniform(1.0, 4.0)
                vid = np.empty((frames, h, w, 3), np.uint8)
                for t in range(frames):
                    base = 127.5 * (1 + np.sin(
                        0.02 * (xx + yy) + phase + speed * 0.2 * t))
                    fr = np.stack([base, np.roll(base, t, 1),
                                   np.roll(base, -t, 0)], -1)
                    cy = int((h - 40) * (0.5 + 0.4 * np.sin(0.3 * t + phase)))
                    cx = int((w - 40) * (0.5 + 0.4 * np.cos(0.2 * t)))
                    fr[cy:cy + 32, cx:cx + 32] = 255.0
                    fr += rng.randn(h, w, 3) * 6.0
                    vid[t] = np.clip(fr, 0, 255).astype(np.uint8)
                key = f"{clip_id:08d}"
                clip_id += 1
                mp4 = os.path.join(shard_dir, f"{key}.mp4")
                videoio.encode(mp4, vid, fps=fps)
                tf.add(mp4, arcname=f"{key}.mp4")
                os.remove(mp4)
                caption = (f"synthetic soak clip {key}: moving gradient "
                           f"with a drifting square").encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(caption)
                import io as _io

                tf.addfile(info, _io.BytesIO(caption))
    return paths


def train_cmd(args, run_dir: str):
    cmd = [
        sys.executable, "-m", "t2v_turbo_tpu.apps.train_v1",
        "--random-weights",
        "--data-shards", os.path.join(args.workdir, "shards", "*.tar"),
        "--output-dir", run_dir,
        "--max-steps", "1000000",
        "--checkpointing-steps", str(args.checkpointing_steps),
        "--optimizer", args.optimizer,
        "--n-frames", str(args.n_frames),
        "--height", str(args.height),
        "--width", str(args.width),
        "--seed", str(args.seed),
    ]
    if args.tiny:
        cmd += ["--tiny-model", "--cpu"]
    return cmd


def run_phase(cmd, duration_s: float, log_path: str, run_dir: str,
              min_new_rows: int = 2, hard_cap_s: float = 3600.0) -> int:
    """Run the trainer; SIGTERM once duration_s has elapsed AND at least
    min_new_rows new metrics rows exist (cold compiles must not eat the
    whole phase); require a clean exit."""
    rows_before = len(read_metrics(run_dir))
    # the trainer subprocess must see the real device topology: strip a
    # test-harness virtual-device override (tests/conftest.py exports
    # XLA_FLAGS=--xla_force_host_platform_device_count=8, which an
    # inherited env would impose on the single-host tiny run)
    env = dict(os.environ)
    if "xla_force_host_platform_device_count" in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = " ".join(
            f for f in env["XLA_FLAGS"].split()
            if "xla_force_host_platform_device_count" not in f
        )
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                env=env)
        t0 = time.time()
        while True:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"trainer died before SIGTERM (rc={proc.returncode}); "
                    f"see {log_path}"
                )
            elapsed = time.time() - t0
            new_rows = len(read_metrics(run_dir)) - rows_before
            if elapsed >= duration_s and new_rows >= min_new_rows:
                break
            if elapsed >= hard_cap_s:
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=60)  # reap — no zombie behind the raise
                raise RuntimeError(
                    f"phase produced only {new_rows} steps in "
                    f"{hard_cap_s:.0f}s; see {log_path}"
                )
            time.sleep(1.0)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=600)
    if rc != 0:
        raise RuntimeError(f"trainer exited rc={rc} after SIGTERM; "
                           f"see {log_path}")
    return rc


def read_metrics(run_dir: str):
    """Parse metrics.jsonl, skipping torn lines.

    The trainer appends while we poll every second, so the final line can be
    a partial write; treat unparseable lines as not-yet-complete rather than
    aborting the soak run.
    """
    rows = []
    path = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return rows


def latest_checkpoint_step(run_dir: str):
    import re

    steps = []
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if os.path.isdir(ckpt_dir):
        for name in os.listdir(ckpt_dir):
            if re.fullmatch(r"\d+", name):
                steps.append(int(name))
    return max(steps) if steps else None


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        args.height = args.width = 16
        args.n_frames = 4
        args.clip_frames = min(args.clip_frames, 24)
        args.optimizer = "adamw"

    os.makedirs(args.workdir, exist_ok=True)
    run_dir = os.path.join(args.workdir, "run")

    t0 = time.time()
    shards = make_shards(
        os.path.join(args.workdir, "shards"), args.n_shards,
        args.clips_per_shard, args.clip_frames, args.height, args.width,
        args.clip_fps,
    )
    print(f"# {len(shards)} shards ready in {time.time()-t0:.1f}s",
          file=sys.stderr)

    cmd = train_cmd(args, run_dir)
    print("# phase A:", " ".join(cmd), file=sys.stderr)
    run_phase(cmd, args.phase_a_s, os.path.join(args.workdir, "phase_a.log"),
              run_dir)
    rows_a = read_metrics(run_dir)
    ckpt_a = latest_checkpoint_step(run_dir)
    if not rows_a:
        raise RuntimeError("phase A logged no steps")
    if ckpt_a is None:
        raise RuntimeError("phase A left no checkpoint after SIGTERM")
    last_a = rows_a[-1]["step"]
    print(f"# phase A: reached step {last_a}, checkpoint @ {ckpt_a}",
          file=sys.stderr)

    print("# phase B (resume):", file=sys.stderr)
    run_phase(cmd, args.phase_b_s, os.path.join(args.workdir, "phase_b.log"),
              run_dir)
    rows_b = read_metrics(run_dir)
    new_rows = [r for r in rows_b if r["step"] > last_a]
    resumed_from = min((r["step"] for r in new_rows), default=None)
    if resumed_from is None or resumed_from <= ckpt_a:
        raise RuntimeError(
            f"phase B did not resume past the checkpoint (ckpt {ckpt_a}, "
            f"first new step {resumed_from})"
        )

    # summary over the steady-state (skip each phase's first logged window,
    # which folds compile/restore time into time_per_step)
    steady = [r for r in rows_b[1:] if r["step"] != resumed_from]
    if not steady:
        steady = rows_b
    import numpy as np

    tps = float(np.median([r["time_per_step_s"] for r in steady]))
    wait = float(np.median([r.get("data_wait_frac", 0.0) for r in steady]))
    summary = {
        "steps_total": rows_b[-1]["step"],
        "ckpt_phase_a": ckpt_a,
        "resumed_at_step": resumed_from,
        "time_per_step_s": round(tps, 4),
        "samples_per_sec_e2e": round(1.0 / tps, 4),
        "data_wait_frac": round(wait, 4),
        "shards": len(shards),
        "shape": f"{args.n_frames}f_{args.height}x{args.width}",
    }
    with open(os.path.join(args.workdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
