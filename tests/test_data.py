"""Data layer tests: native videoio, tar pipeline, datasets, transforms."""

import io
import os
import pickle
import tarfile

import numpy as np
import pytest

from t2v_turbo_tpu.data import videoio
from t2v_turbo_tpu.data.transforms import (
    AestheticsFilter,
    KeyFilter,
    LanguageFilter,
    UnsafeFilter,
    crop_video,
    normalize_video,
    resize_crop,
    resize_video,
)

NATIVE = videoio.available()


def make_video(path, t=24, h=64, w=96, fps=8):
    rng = np.random.RandomState(0)
    frames = (rng.rand(t, h, w, 3) * 255).astype(np.uint8)
    videoio.encode(str(path), frames, fps=fps)
    return frames


@pytest.mark.skipif(not NATIVE, reason="native videoio not built")
class TestVideoIO:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "v.mp4"
        src = make_video(p)
        info = videoio.probe(str(p))
        assert (info.width, info.height) == (96, 64)
        dec = videoio.decode(str(p), n_frames=8, target_fps=4)
        assert dec.shape == (8, 64, 96, 3)
        # lossy codec: mean brightness preserved
        assert abs(float(dec.mean()) - float(src.mean())) < 5

    def test_resize_decode(self, tmp_path):
        p = tmp_path / "v.mp4"
        make_video(p)
        dec = videoio.decode(str(p), n_frames=4, width=48, height=32)
        assert dec.shape == (4, 32, 48, 3)

    def test_missing_file(self):
        with pytest.raises(IOError):
            videoio.decode("/tmp/definitely_missing_video.mp4", 4)

    def test_threaded_batch_error_tolerance(self, tmp_path):
        p = tmp_path / "v.mp4"
        make_video(p)
        d = videoio.VideoDecoder(n_frames=4)
        out = d.decode_batch([str(p), "/tmp/missing.mp4"])
        assert out[0] is not None and out[1] is None

    def test_short_clip_pads(self, tmp_path):
        p = tmp_path / "short.mp4"
        make_video(p, t=4, fps=8)
        dec = videoio.decode(str(p), n_frames=16, target_fps=8)
        assert dec.shape[0] == 16  # padded by repeating last frame


class TestTransforms:
    def test_resize_video(self):
        v = np.zeros((2, 64, 96, 3), np.uint8)
        out = resize_video(v, 32)
        assert out.shape == (2, 32, 48, 3)

    def test_crop_center_and_random(self):
        v = np.arange(2 * 8 * 8 * 3, dtype=np.uint8).reshape(2, 8, 8, 3)
        c = crop_video(v, 4, 4)
        np.testing.assert_array_equal(c, v[:, 2:6, 2:6])
        r = crop_video(v, 4, 4, random=True, rng=np.random.RandomState(0))
        assert r.shape == (2, 4, 4, 3)

    def test_resize_crop_target(self):
        v = np.zeros((2, 100, 300, 3), np.uint8)
        out = resize_crop(v, (64, 96))
        assert out.shape == (2, 64, 96, 3)

    def test_normalize(self):
        v = np.array([[[[0, 127, 255]]]], np.uint8)
        out = normalize_video(v)
        assert out.min() >= -1.0 and out.max() <= 1.0
        assert out[0, 0, 0, 0] == pytest.approx(-1.0)
        assert out[0, 0, 0, 2] == pytest.approx(1.0)

    def test_filters(self):
        s = {"mp4": b"", "txt": "hi", "json": {"language": "en", "aesthetic": 5.0, "p_unsafe": 0.1}}
        assert KeyFilter()(s)
        assert LanguageFilter()(s)
        assert AestheticsFilter(4.0)(s)
        assert not AestheticsFilter(6.0)(s)
        assert UnsafeFilter(0.5)(s)
        assert not UnsafeFilter(0.05)(s)
        assert not KeyFilter()({"txt": "no video"})


@pytest.mark.skipif(not NATIVE, reason="native videoio not built")
class TestWebData:
    @pytest.fixture()
    def shard(self, tmp_path):
        # build a 3-sample tar shard with mp4+txt+json per key
        vids = []
        for i in range(3):
            p = tmp_path / f"s{i}.mp4"
            vids.append(make_video(p, t=12, h=48, w=64))
        tar_path = tmp_path / "shard-000000.tar"
        with tarfile.open(tar_path, "w") as tf:
            for i in range(3):
                tf.add(tmp_path / f"s{i}.mp4", arcname=f"{i:05d}.mp4")
                txt = tmp_path / "t.txt"
                txt.write_text(f"caption {i}")
                tf.add(txt, arcname=f"{i:05d}.txt")
                js = tmp_path / "j.json"
                js.write_text('{"language": "en"}')
                tf.add(js, arcname=f"{i:05d}.json")
        return str(tar_path)

    def test_tar_iteration(self, shard):
        from t2v_turbo_tpu.data.webdata import iterate_tar_samples

        samples = list(iterate_tar_samples(shard))
        assert len(samples) == 3
        assert all("mp4" in s and "txt" in s and "json" in s for s in samples)
        assert samples[0]["txt"] == "caption 0"

    def test_pipeline_batches(self, shard):
        from t2v_turbo_tpu.data.webdata import WebVideoDataset

        ds = WebVideoDataset(
            [shard],
            batch_size=2,
            n_frames=4,
            target_fps=4,
            size_hw=(32, 48),
            split_by_host=False,
            loop=False,
            seed=0,
        )
        batches = list(ds)
        assert len(batches) == 1  # 3 samples -> one full batch of 2
        b = batches[0]
        assert b["video"].shape == (2, 4, 32, 48, 3)
        assert b["video"].dtype == np.float32
        assert abs(float(b["video"].mean())) < 0.2  # normalized around 0
        assert len(b["txt"]) == 2

    def test_host_sharding(self):
        from t2v_turbo_tpu.data.webdata import split_shards_by_host

        shards = [f"s{i}" for i in range(10)]
        a = split_shards_by_host(shards, 0, 4)
        b = split_shards_by_host(shards, 1, 4)
        assert not set(a) & set(b)
        all_assigned = sum(
            (split_shards_by_host(shards, i, 4) for i in range(4)), []
        )
        assert sorted(all_assigned) == sorted(shards)


@pytest.mark.skipif(not NATIVE, reason="native videoio not built")
class TestPrefixResampler:
    """Mixture-of-prefixes shard resampling (reference custom_wds.py:312)."""

    def test_mixture_proportions(self):
        from t2v_turbo_tpu.data.webdata import resample_shards_by_prefix

        shards = [f"a/{i}.tar" for i in range(10)] + [f"b/{i}.tar" for i in range(10)]
        it = resample_shards_by_prefix(shards, {"a/": 0.8, "b/": 0.2}, seed=0)
        draws = [next(it) for _ in range(4000)]
        frac_a = sum(d.startswith("a/") for d in draws) / len(draws)
        assert 0.75 < frac_a < 0.85

    def test_without_replacement_until_refill(self):
        from t2v_turbo_tpu.data.webdata import resample_shards_by_prefix

        shards = [f"a/{i}.tar" for i in range(5)]
        it = resample_shards_by_prefix(shards, {"a/": 1.0}, seed=1)
        first_epoch = [next(it) for _ in range(5)]
        assert sorted(first_epoch) == sorted(shards)  # each exactly once
        second = [next(it) for _ in range(5)]
        assert sorted(second) == sorted(shards)

    def test_empty_prefix_dropped(self):
        from t2v_turbo_tpu.data.webdata import resample_shards_by_prefix

        shards = [f"a/{i}.tar" for i in range(3)]
        it = resample_shards_by_prefix(
            shards, {"a/": 0.5, "missing/": 0.5}, seed=2
        )
        assert all(next(it).startswith("a/") for _ in range(20))

    def test_no_match_raises(self):
        import pytest as _pytest

        from t2v_turbo_tpu.data.webdata import resample_shards_by_prefix

        with _pytest.raises(ValueError):
            next(resample_shards_by_prefix(["x.tar"], {"nope/": 1.0}))

    def test_dataset_integration(self, tmp_path):
        """WebVideoDataset draws its epoch shard list from the resampler."""
        from t2v_turbo_tpu.data.webdata import WebVideoDataset

        ds = WebVideoDataset(
            [f"a/{i}.tar" for i in range(4)] + ["b/0.tar"],
            prefix_weights={"a/": 1.0, "b/": 0.0},
            split_by_host=False,
        )
        epoch = ds._shard_stream(None, 0)
        assert len(epoch) == 5
        assert all(p.startswith("a/") for p in epoch)


class TestDatasets:
    def test_mp4_dataset(self, tmp_path):
        from t2v_turbo_tpu.data.datasets import MP4Dataset

        p = tmp_path / "v.mp4"
        make_video(p)
        rows = [{"path": str(p), "text": "a video"}] * 3
        ds = MP4Dataset(rows, n_frames=4, size_hw=(32, 48))
        item = ds[0]
        assert item["video"].shape == (4, 32, 48, 3)
        batch = next(ds.batches(2))
        assert batch["video"].shape == (2, 4, 32, 48, 3)

    def test_mp4_dataset_retries_bad_rows(self, tmp_path):
        from t2v_turbo_tpu.data.datasets import MP4Dataset

        p = tmp_path / "v.mp4"
        make_video(p)
        rows = [{"path": "/missing.mp4", "text": "bad"},
                {"path": str(p), "text": "good"}]
        ds = MP4Dataset(rows, n_frames=4, size_hw=(32, 48), seed=1)
        item = ds[0]  # resamples to the good row
        assert item["video"].shape[0] == 4

    def test_latent_dataset(self, tmp_path):
        from t2v_turbo_tpu.data.datasets import MP4LatentDataset

        rng = np.random.RandomState(0)
        paths = []
        for i in range(4):
            d = {
                "index": np.int32(i),
                "z_t": rng.randn(4, 8, 8, 4).astype(np.float32),
                "cond_teacher_out": rng.randn(4, 8, 8, 4).astype(np.float32),
                "uncond_teacher_out": rng.randn(4, 8, 8, 4).astype(np.float32),
                "score": rng.randn(4, 8, 8, 4).astype(np.float32),
                "prompt_emb": rng.randn(7, 16).astype(np.float32),
                "use_motion_guide": i % 2 == 0,
                "short_txt": f"cap {i}",
            }
            p = tmp_path / f"{i}.pkl"
            p.write_bytes(pickle.dumps(d))
            paths.append(str(p))
        ds = MP4LatentDataset(paths)
        batch = next(ds.batches(2))
        assert batch["z_t"].shape == (2, 4, 8, 8, 4)
        assert batch["prompt_emb"].shape == (2, 7, 16)
        assert batch["use_motion_guide"].dtype == bool


class TestPrefixResamplerExclusivity:
    def test_unmatched_shard_raises(self):
        from t2v_turbo_tpu.data.webdata import resample_shards_by_prefix

        with pytest.raises(ValueError, match="match no prefix"):
            resample_shards_by_prefix(
                ["a/0.tar", "c/0.tar"], {"a/": 1.0}, seed=0
            )

    def test_overlapping_prefixes_first_match_wins(self):
        from t2v_turbo_tpu.data.webdata import resample_shards_by_prefix

        # "a/b0.tar" matches both "a/" and "a/b"; reference PrefixResampler
        # assigns to the FIRST matching prefix (custom_wds.py:335), so with
        # weights {"a/b": x, "a/": y} it belongs only to the "a/b" pool
        shards = ["a/b0.tar", "a/c0.tar"]
        it = resample_shards_by_prefix(
            shards, {"a/b": 0.0001, "a/": 0.9999}, seed=3
        )
        draws = [next(it) for _ in range(50)]
        # the "a/" pool must contain only a/c0.tar: a/b0.tar is near-never
        # drawn because its (first-match) pool has ~zero weight
        assert sum(d == "a/b0.tar" for d in draws) <= 2


@pytest.mark.skipif(not NATIVE, reason="native videoio not built")
class TestCutDetection:
    """Cut-aware decoding (reference VideoDecorderWithCutDetection,
    video_decode.py:188-224): scene detection on a synthetic two-scene
    clip, window decode, and the guarantee that sampled clips never cross
    a scene boundary."""

    def _two_scene_mp4(self, tmp_path, n_a=12, n_b=12):
        frames = np.concatenate([
            np.full((n_a, 64, 64, 3), 30, np.uint8),
            np.full((n_b, 64, 64, 3), 220, np.uint8),
        ])
        p = tmp_path / "two_scene.mp4"
        videoio.encode(str(p), frames, fps=8.0)
        return str(p), n_a, n_b

    def test_detect_cuts_synthetic(self, tmp_path):
        path, n_a, n_b = self._two_scene_mp4(tmp_path)
        frames = videoio.decode(path, n_frames=n_a + n_b, target_fps=0.0)
        scenes = videoio.detect_cuts(frames, threshold=0.3)
        assert scenes.shape[0] == 2
        # codec smear can move the boundary by a frame
        assert abs(int(scenes[0][1]) - n_a) <= 1
        assert int(scenes[0][0]) == 0 and int(scenes[1][1]) == n_a + n_b

    def test_sample_never_crosses_boundary(self):
        scenes = np.array([[0, 12], [12, 24]])
        for seed in range(20):
            idx = videoio.sample_scene_clip(scenes, n_frames=4, stride=2, seed=seed)
            assert len(idx) == 4
            inside = any(s <= idx[0] and idx[-1] < e for s, e in scenes)
            assert inside, (idx, scenes)
        with pytest.raises(ValueError, match="not long enough"):
            videoio.sample_scene_clip(np.array([[0, 4]]), n_frames=8)

    def test_decode_window_exact_indices(self, tmp_path):
        # gradient clip: frame i has constant value ~i*9
        frames = np.stack([
            np.full((64, 64, 3), i * 9, np.uint8) for i in range(24)
        ])
        p = tmp_path / "grad.mp4"
        videoio.encode(str(p), frames, fps=8.0)
        win = videoio.decode_window(str(p), start=5, n_frames=4, stride=2)
        assert win.shape == (4, 64, 64, 3)
        got = win.mean(axis=(1, 2, 3))
        want = np.array([5, 7, 9, 11]) * 9.0
        assert np.all(np.abs(got - want) < 9.0), (got, want)

    def test_decode_scene_aware_single_scene(self, tmp_path):
        path, n_a, n_b = self._two_scene_mp4(tmp_path, 16, 16)
        for seed in range(4):
            clip = videoio.decode_scene_aware(path, n_frames=8, seed=seed)
            means = clip.mean(axis=(1, 2, 3))
            # all frames from ONE scene: uniformly dark or uniformly bright
            assert means.max() - means.min() < 60, means


class TestLatentWebDataset:
    """Text2VideoDataset parity (reference data/video_webdata.py:87-147):
    tar shards of pickled latent dicts, resampled with replacement,
    shuffle-buffered, full-size batches only, num_batches/num_samples
    metadata."""

    def make_latent(self, rng, i):
        return {
            "index": np.int32(i),
            "z_t": rng.randn(4, 8, 8, 4).astype(np.float32),
            "cond_teacher_out": rng.randn(4, 8, 8, 4).astype(np.float32),
            "uncond_teacher_out": rng.randn(4, 8, 8, 4).astype(np.float32),
            "prompt_emb": rng.randn(7, 16).astype(np.float32),
            "txt": f"caption {i}",
        }

    @pytest.fixture
    def latent_shards(self, tmp_path):
        rng = np.random.RandomState(0)
        shards = []
        k = 0
        for s in range(2):
            path = tmp_path / f"lat-{s:04d}.tar"
            with tarfile.open(path, "w") as tf:
                for _ in range(5):
                    blob = pickle.dumps(self.make_latent(rng, k))
                    info = tarfile.TarInfo(f"{k:08d}.pickle")
                    info.size = len(blob)
                    tf.addfile(info, io.BytesIO(blob))
                    k += 1
            shards.append(str(path))
        return shards

    def test_batches_match_mp4latent_schema(self, latent_shards):
        from t2v_turbo_tpu.data.webdata import LatentWebDataset

        ds = LatentWebDataset(
            latent_shards, num_train_examples=100, per_host_batch_size=3,
            global_batch_size=6, shuffle_buffer_size=4, split_by_host=False,
        )
        it = iter(ds)
        b = next(it)
        assert b["z_t"].shape == (3, 4, 8, 8, 4)
        assert b["prompt_emb"].shape == (3, 7, 16)
        # defaults applied like MP4LatentDataset (score zeros, motion on,
        # short_txt empty means "no short caption")
        assert b["score"].shape == b["z_t"].shape
        assert np.all(b["score"] == 0)
        assert b["use_motion_guide"].dtype == bool and b["use_motion_guide"].all()
        assert b["short_txt"] == ["", "", ""]
        assert all(t.startswith("caption") for t in b["txt"])
        # reference :122-124 metadata
        assert ds.num_batches == 17 and ds.num_samples == 102
        assert ds.batch_size == 6

    def test_resampled_stream_is_infinite(self, latent_shards):
        from t2v_turbo_tpu.data.webdata import LatentWebDataset

        ds = LatentWebDataset(
            latent_shards, num_train_examples=10, per_host_batch_size=2,
            global_batch_size=2, shuffle_buffer_size=1, split_by_host=False,
        )
        it = iter(ds)
        # 10 samples total but resampling-with-replacement never exhausts
        got = [next(it) for _ in range(12)]
        assert len(got) == 12

    def test_bad_members_skipped(self, latent_shards, tmp_path):
        from t2v_turbo_tpu.data.webdata import LatentWebDataset

        bad = tmp_path / "lat-bad.tar"
        with tarfile.open(bad, "w") as tf:
            blob = b"not a pickle"
            info = tarfile.TarInfo("zz.pickle")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
            # pickle missing required keys is also skipped
            blob2 = pickle.dumps({"z_t": np.zeros(3)})
            info2 = tarfile.TarInfo("zy.pickle")
            info2.size = len(blob2)
            tf.addfile(info2, io.BytesIO(blob2))
        ds = LatentWebDataset(
            [str(bad), *latent_shards], num_train_examples=10,
            per_host_batch_size=2, global_batch_size=2,
            shuffle_buffer_size=1, split_by_host=False, seed=3,
        )
        b = next(iter(ds))
        assert b["z_t"].shape[0] == 2
