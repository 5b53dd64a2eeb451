"""CSV-indexed MP4 dataset and the v2 precomputed-latent dataset.

Rebuild of reference data/mp4_dataset.py: MP4Dataset (CSV of video paths +
captions -> decoded clips) and MP4LatentDataset (pickled dicts of
{index, z_t, cond_teacher_out, uncond_teacher_out, score, prompt_emb,
use_motion_guide, short_txt} produced by the preprocess jobs). Local
filesystem paths by default; s3:// URIs via boto3 when available. Failed
reads retry with a random resample (reference mp4_dataset.py:74-80,137-153),
bounded instead of infinite.
"""

from __future__ import annotations

import csv
import io
import os
import pickle
import random
from typing import Iterator, List, Optional, Sequence

import numpy as np

from . import videoio
from .transforms import normalize_video, resize_crop


def _read_bytes(path: str) -> bytes:
    if path.startswith("s3://"):
        import boto3  # optional dependency

        bucket, _, key = path[5:].partition("/")
        buf = io.BytesIO()
        boto3.client("s3").download_fileobj(bucket, key, buf)
        return buf.getvalue()
    with open(path, "rb") as f:
        return f.read()


def read_csv_index(csv_path: str, path_col="path", text_col="text") -> List[dict]:
    with open(csv_path) as f:
        return [
            {"path": row[path_col], "text": row.get(text_col, "")}
            for row in csv.DictReader(f)
        ]


class MP4Dataset:
    """rows of {path, text} -> {video (T,H,W,3) f32 [-1,1], text}."""

    def __init__(
        self,
        rows: Sequence[dict],
        n_frames=16,
        target_fps=8.0,
        size_hw=(320, 512),
        random_crop=True,
        seed=0,
        max_retries=10,
    ):
        self.rows = list(rows)
        self.n_frames = n_frames
        self.target_fps = target_fps
        self.size_hw = tuple(size_hw)
        self.random_crop = random_crop
        self.seed = seed
        self.max_retries = max_retries

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i: int) -> dict:
        rng = np.random.RandomState(self.seed + i)
        pyrng = random.Random(self.seed + i)
        for attempt in range(self.max_retries):
            row = self.rows[i if attempt == 0 else pyrng.randrange(len(self.rows))]
            try:
                path = row["path"]
                if path.startswith("s3://"):
                    import tempfile

                    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                        f.write(_read_bytes(path))
                        f.flush()
                        video = videoio.decode(
                            f.name, self.n_frames, self.target_fps,
                            self.random_crop, int(rng.randint(2**31 - 1)),
                        )
                else:
                    video = videoio.decode(
                        path, self.n_frames, self.target_fps,
                        self.random_crop, int(rng.randint(2**31 - 1)),
                    )
                video = resize_crop(
                    video, self.size_hw, random_crop=self.random_crop, rng=rng
                )
                return {"video": normalize_video(video), "text": row.get("text", "")}
            except Exception:
                continue
        raise IOError(f"MP4Dataset: {self.max_retries} failed attempts near row {i}")

    def batches(self, batch_size: int, shuffle=True, loop=True) -> Iterator[dict]:
        order = list(range(len(self)))
        rng = random.Random(self.seed)
        while True:
            if shuffle:
                rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[j] for j in order[i : i + batch_size]]
                yield {
                    "video": np.stack([it["video"] for it in items]),
                    "text": [it["text"] for it in items],
                }
            if not loop:
                return


class MP4LatentDataset:
    """v2 training data: pickled latent/teacher/score dicts (one file per
    sample). Fields per reference train_latent_t2v_turbo_v2.py:975-992."""

    REQUIRED = ("index", "z_t", "cond_teacher_out", "uncond_teacher_out", "prompt_emb")

    def __init__(self, paths: Sequence[str], seed=0, max_retries=10,
                 webvid_alias: Optional[dict] = None):
        self.paths = list(paths)
        self.seed = seed
        self.max_retries = max_retries
        # reference aliases webvid text fields (mp4_dataset.py:127-129)
        self.webvid_alias = webvid_alias or {}

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> dict:
        pyrng = random.Random(self.seed + i)
        for attempt in range(self.max_retries):
            p = self.paths[i if attempt == 0 else pyrng.randrange(len(self.paths))]
            try:
                d = pickle.loads(_read_bytes(p))
                for k in self.REQUIRED:
                    assert k in d, f"missing {k}"
                return apply_latent_defaults(d)
            except Exception:
                continue
        raise IOError(f"MP4LatentDataset: {self.max_retries} failures near {i}")

    def batches(self, batch_size: int, shuffle=True, loop=True) -> Iterator[dict]:
        order = list(range(len(self)))
        rng = random.Random(self.seed)
        while True:
            if shuffle:
                rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                yield collate_latent_batch(
                    [self[j] for j in order[i : i + batch_size]]
                )
            if not loop:
                return


def apply_latent_defaults(d: dict) -> dict:
    """Default the optional v2-latent fields in place (shared by
    MP4LatentDataset and webdata.LatentWebDataset so the two loaders the
    trainer consumes interchangeably cannot drift)."""
    d.setdefault("score", np.zeros_like(d["z_t"]))
    d.setdefault("use_motion_guide", True)
    d.setdefault("txt", "")
    # "" means NO short caption (the reference's short-caption preference
    # keys on short_txt != "", train_latent_t2v_turbo_v2.py:1077-1081) —
    # do not alias the full caption into it
    d.setdefault("short_txt", "")
    return d


def collate_latent_batch(items: Sequence[dict]) -> dict:
    """Stack v2-latent samples into the trainer batch schema."""
    out = {}
    for k in (
        "index", "z_t", "cond_teacher_out", "uncond_teacher_out",
        "score", "prompt_emb",
    ):
        out[k] = np.stack([np.asarray(it[k]) for it in items])
    out["use_motion_guide"] = np.asarray(
        [bool(it["use_motion_guide"]) for it in items]
    )
    out["txt"] = [it["txt"] for it in items]
    out["short_txt"] = [it["short_txt"] for it in items]
    return out


class DevicePrefetcher:
    """Host->device double-buffered prefetch (the async input pipeline the
    reference delegated to torch DataLoader workers)."""

    def __init__(self, it: Iterator, put, depth: int = 2):
        import queue
        import threading

        self.q = queue.Queue(maxsize=depth)
        self._stop = object()

        def worker():
            try:
                for batch in it:
                    self.q.put(put(batch))
            finally:
                self.q.put(self._stop)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._stop:
            raise StopIteration
        return item
