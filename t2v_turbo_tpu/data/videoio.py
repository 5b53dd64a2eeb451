"""ctypes bindings for the native videoio library (decode/encode/probe).

The C++ library (native/videoio) replaces the reference's decord decoder
(data/dataloader/video_decode.py) and torchvision mp4 writer. Decoding
releases the GIL inside libav, so a plain ThreadPoolExecutor gives true
parallel decode — see `VideoDecoder.decode_batch`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

# Library resolution: a source tree / editable install has the C++ sources
# at <repo>/native/videoio (buildable via make); a wheel install ships only
# the prebuilt .so at t2v_turbo_tpu/_native/libvideoio.so (setup.py hook).
_REPO_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "videoio",
)
_PKG_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_native"
)
if os.path.isdir(_REPO_NATIVE_DIR):
    _NATIVE_DIR = _REPO_NATIVE_DIR
elif os.path.exists(os.path.join(_PKG_NATIVE_DIR, "libvideoio.so")):
    _NATIVE_DIR = _PKG_NATIVE_DIR
else:  # neither: keep the repo path so the error message names it
    _NATIVE_DIR = _REPO_NATIVE_DIR
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvideoio.so")


class _VioInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("fps", ctypes.c_double),
        ("n_frames", ctypes.c_int64),
        ("duration", ctypes.c_double),
    ]


_lib = None


def _stale() -> bool:
    """True when the built .so predates the sources (e.g. a checkout that
    added vio_decode_audio after the user last ran make)."""
    try:
        so_mtime = os.path.getmtime(_LIB_PATH)
    except OSError:
        return True
    for src in ("videoio.cpp", "Makefile"):
        p = os.path.join(_NATIVE_DIR, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    can_build = os.path.exists(os.path.join(_NATIVE_DIR, "Makefile"))
    if can_build and (not os.path.exists(_LIB_PATH) or _stale()):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception as e:  # pragma: no cover
            if not os.path.exists(_LIB_PATH):
                raise RuntimeError(
                    f"libvideoio.so missing and build failed: {e}"
                ) from e
            # a stale .so that fails to rebuild (no toolchain on this host):
            # fall through and let the symbol check below decide
    if not os.path.exists(_LIB_PATH):
        raise RuntimeError(
            f"libvideoio.so not found at {_LIB_PATH} and no buildable "
            "sources alongside it (wheel built without the native library?); "
            "install from a source tree or rebuild the wheel on a host with "
            "the ffmpeg dev libraries"
        )
    lib = ctypes.CDLL(_LIB_PATH)
    # newest symbol first: a library from before the audio decoder would
    # otherwise die with a bare AttributeError mid-binding and available()
    # would silently report the whole native layer missing
    if not hasattr(lib, "vio_decode_audio"):  # pragma: no cover
        raise RuntimeError(
            "libvideoio.so is stale (missing vio_decode_audio); rebuild "
            f"with `make -B -C {_NATIVE_DIR}` and restart the process"
        )
    lib.vio_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(_VioInfo)]
    lib.vio_probe.restype = ctypes.c_int
    lib.vio_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_uint,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vio_decode.restype = ctypes.c_int
    lib.vio_decode_window.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vio_decode_window.restype = ctypes.c_int
    lib.vio_encode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_char_p,
    ]
    lib.vio_encode.restype = ctypes.c_int
    lib.vio_decode_audio.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vio_decode_audio.restype = ctypes.c_int64
    lib.vio_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _err(lib) -> str:
    return lib.vio_last_error().decode("utf-8", "replace")


@dataclass(frozen=True)
class VideoInfo:
    width: int
    height: int
    fps: float
    n_frames: int
    duration: float


def probe(path: str) -> VideoInfo:
    lib = _load()
    info = _VioInfo()
    if lib.vio_probe(path.encode(), ctypes.byref(info)) != 0:
        raise IOError(f"probe({path}): {_err(lib)}")
    return VideoInfo(info.width, info.height, info.fps, info.n_frames, info.duration)


def decode(
    path: str,
    n_frames: int = 16,
    target_fps: float = 0.0,
    random_offset: bool = False,
    seed: int = 0,
    width: int = 0,
    height: int = 0,
) -> np.ndarray:
    """Decode n_frames sampled at target_fps -> (T, H, W, 3) uint8.
    target_fps<=0 uses native fps; width/height<=0 keep native size.
    Mirrors the reference VideoDecorder semantics
    (data/dataloader/video_decode.py:41-186)."""
    lib = _load()
    if width <= 0 or height <= 0:
        info = probe(path)
        width = width if width > 0 else info.width
        height = height if height > 0 else info.height
    out = np.empty((n_frames, height, width, 3), np.uint8)
    got = lib.vio_decode(
        path.encode(),
        n_frames,
        float(target_fps),
        1 if random_offset else 0,
        seed,
        width,
        height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        raise IOError(f"decode({path}): {_err(lib)}")
    return out


def decode_window(
    path: str,
    start: int,
    n_frames: int,
    stride: int = 1,
    width: int = 0,
    height: int = 0,
) -> np.ndarray:
    """Decode exact frame indices start, start+stride, ... -> (T, H, W, 3)
    uint8 (decord get_batch analog; the cut-aware sampler's decode path,
    reference video_decode.py:222-224)."""
    lib = _load()
    if width <= 0 or height <= 0:
        info = probe(path)
        width = width if width > 0 else info.width
        height = height if height > 0 else info.height
    out = np.empty((n_frames, height, width, 3), np.uint8)
    got = lib.vio_decode_window(
        path.encode(), start, stride, n_frames, width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        raise IOError(f"decode_window({path}): {_err(lib)}")
    return out


def detect_cuts(
    frames: np.ndarray, threshold: float = 0.3, min_scene_len: int = 2
) -> np.ndarray:
    """Host-side scene-cut detection on decoded frames: normalized mean
    absolute luma difference between consecutive frames; a cut wherever
    the difference exceeds `threshold`. Returns an (n_scenes, 2) array of
    [start, end) frame ranges — the scene-list format the reference's
    VideoDecorderWithCutDetection consumes (video_decode.py:188-224; note
    the reference only CONSUMES precomputed cut lists from the tar — the
    detection itself is a capability it does not have)."""
    f = frames.astype(np.float32)
    luma = f @ np.array([0.299, 0.587, 0.114], np.float32)
    diff = np.abs(np.diff(luma, axis=0)).mean(axis=(1, 2)) / 255.0
    cut_points = np.flatnonzero(diff > threshold) + 1
    bounds = [0, *cut_points.tolist(), frames.shape[0]]
    scenes = [
        (a, b)
        for a, b in zip(bounds[:-1], bounds[1:])
        if b - a >= min_scene_len
    ]
    if not scenes:
        scenes = [(0, frames.shape[0])]
    return np.asarray(scenes, np.int64)


def sample_scene_clip(
    scene_list: np.ndarray, n_frames: int, stride: int = 1, seed: int = 0
) -> np.ndarray:
    """Pick a random scene long enough for n_frames*stride and a random
    start inside it; return the strided frame indices (the reference's
    cut-aware get_frames sampling, video_decode.py:211-224)."""
    min_len = n_frames * stride
    eligible = [s for s in np.asarray(scene_list) if s[1] - s[0] > min_len]
    if not eligible:
        raise ValueError("video clips not long enough for decoding")
    rng = np.random.RandomState(seed)
    start, end = eligible[rng.randint(len(eligible))]
    frame_start = rng.randint(int(end - start) - min_len) + start
    return np.arange(frame_start, frame_start + min_len, stride)[:n_frames]


def decode_scene_aware(
    path: str,
    n_frames: int = 16,
    stride: int = 1,
    seed: int = 0,
    width: int = 0,
    height: int = 0,
    scene_list: Optional[np.ndarray] = None,
    threshold: float = 0.3,
    probe_height: int = 72,
) -> np.ndarray:
    """Cut-aware clip decode: the sampled window never crosses a scene
    boundary. scene_list=None detects cuts from a cheap low-res strip of
    EVERY frame first (probe_height tall), then only the chosen window is
    decoded at full size via decode_window."""
    if scene_list is None:
        info = probe(path)
        total = max(int(info.n_frames), n_frames)
        pw = max(2, round(probe_height * info.width / max(info.height, 1)))
        strip = decode(
            path, n_frames=total, target_fps=0.0, width=pw, height=probe_height
        )
        scene_list = detect_cuts(strip, threshold=threshold)
    idx = sample_scene_clip(scene_list, n_frames, stride=stride, seed=seed)
    return decode_window(
        path, int(idx[0]), n_frames, stride=stride, width=width, height=height
    )


def encode(path: str, frames: np.ndarray, fps: float = 8.0, codec: str = "") -> None:
    """frames: (T, H, W, 3) uint8 -> mp4 (libx264 if present, else mpeg4)."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    rc = lib.vio_encode(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t,
        h,
        w,
        float(fps),
        codec.encode(),
    )
    if rc != 0:
        raise IOError(f"encode({path}): {_err(lib)}")


class VideoDecoder:
    """Threaded batch decoder (GIL released in libav)."""

    def __init__(
        self, n_frames=16, target_fps=8.0, width=0, height=0, workers=None
    ):
        self.n_frames = n_frames
        self.target_fps = target_fps
        self.width = width
        self.height = height
        if workers is None:
            # one decode thread per core: oversubscription actively hurts
            # (measured 2.5x slower aggregate with 4 threads on a 1-core
            # host — libav per-thread contexts thrash the cache)
            workers = os.cpu_count() or 1
        self.pool = ThreadPoolExecutor(max_workers=workers)

    def decode_batch(
        self, paths: Sequence[str], random_offset=True, seed: int = 0
    ) -> list[Optional[np.ndarray]]:
        futs = [
            self.pool.submit(
                decode,
                p,
                self.n_frames,
                self.target_fps,
                random_offset,
                seed + i,
                self.width,
                self.height,
            )
            for i, p in enumerate(paths)
        ]
        out = []
        for f in futs:
            try:
                out.append(f.result())
            except Exception:
                out.append(None)  # warn_and_continue semantics
        return out
