"""Host-side video IO.

The reference writes mp4 via torchvision/ffmpeg (reference app.py:97-99,
utils/utils.py:82-99). This environment has no ffmpeg/cv2/av; we write mp4
when an ffmpeg binary exists, else fall back to GIF (imageio) and .npy.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np


def save_video(frames: np.ndarray, path: str, fps: int = 8) -> str:
    """frames: (T, H, W, 3) uint8. Returns the actual path written (the
    extension may change if a fallback container is used)."""
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    assert frames.dtype == np.uint8
    root, ext = os.path.splitext(path)
    ext = ext.lower() or ".mp4"

    if ext == ".npy":
        np.save(path, frames)
        return path

    if ext == ".mp4":
        try:
            from ..data import videoio

            if videoio.available():
                videoio.encode(path, frames, fps=fps)
                return path
        except Exception:
            pass  # fall through to ffmpeg binary / gif

    if ext == ".mp4" and shutil.which("ffmpeg"):
        t, h, w, _ = frames.shape
        cmd = [
            "ffmpeg", "-y", "-loglevel", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
            "-r", str(fps), "-i", "-",
            "-c:v", "libx264", "-pix_fmt", "yuv420p", path,
        ]
        proc = subprocess.run(cmd, input=frames.tobytes(), capture_output=True)
        if proc.returncode == 0:
            return path
        # fall through to gif on encoder failure

    gif_path = root + ".gif"
    import imageio

    with imageio.get_writer(gif_path, duration=1000.0 / fps, loop=0) as w:
        for fr in frames:
            w.append_data(fr)
    return gif_path
