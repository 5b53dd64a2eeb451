"""v2 trainer reference-surface tests: reward-field selection semantics
(short-caption preference, webvid opt-out — reference
train_latent_t2v_turbo_v2.py:1068-1162) and the partial text-encoder
unfreeze optimizer groups (:816-830)."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from t2v_turbo_tpu.training.optim import make_v2_optimizer


class FakeRM:
    def encode_texts(self, texts):
        # deterministic per-text feature so tests can see WHICH caption won
        return np.array([[float(len(t))] for t in texts], np.float32)


def _args(**kw):
    ns = argparse.Namespace(
        seed=0, reward_frames=2, reward_batch=2, video_rm_frames=4,
        video_rm_batch=1, webvid_no_reward=False,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _batches(short):
    b = len(short)
    yield {
        "z_t": np.zeros((b, 8, 4, 4, 4), np.float32),
        "txt": [f"full caption number {i}" for i in range(b)],
        "short_txt": list(short),
    }


class TestV2RewardFields:
    def _run(self, short, **kw):
        from t2v_turbo_tpu.apps.train_v2 import add_v2_reward_fields

        return next(
            add_v2_reward_fields(_batches(short), _args(**kw), FakeRM(), FakeRM())
        )

    def test_short_caption_preference(self):
        """Only short-caption samples are eligible, and they score with the
        SHORT caption (reference :1077-1100)."""
        batch = self._run(["", "cat", "", "dog"])
        assert set(np.flatnonzero(batch["reward_mask"])).issubset({1, 3})
        assert batch["reward_mask"].sum() == 2
        # feats encode caption length: short caps are len 3, full are longer
        feats = batch["reward_text_feats"][:, 0]
        assert feats[1] == 3 and feats[3] == 3  # short captions won
        assert feats[0] > 3 and feats[2] > 3  # full captions elsewhere
        # video mask also restricted to short-caption samples
        assert set(np.flatnonzero(batch["video_reward_mask"])).issubset({1, 3})
        # but the video RM scores with FULL captions (reference :1157)
        assert (batch["video_text_feats"][:, 0] > 3).all()

    def test_no_short_captions_random_selection(self):
        batch = self._run([""] * 4)
        assert batch["reward_mask"].sum() == 2
        assert batch["video_reward_mask"].sum() == 1

    def test_webvid_optout(self):
        """No short captions + webvid opt-out -> reward losses off
        (reference :1086-1090)."""
        batch = self._run([""] * 4, webvid_no_reward=True)
        assert batch["reward_mask"].sum() == 0
        assert batch["video_reward_mask"].sum() == 0
        # ...but short-caption batches still train rewards under opt-out
        batch = self._run(["", "cat", "", ""], webvid_no_reward=True)
        assert batch["reward_mask"].sum() == 1
        assert np.flatnonzero(batch["reward_mask"]).tolist() == [1]


class TestTrainV2CLI:
    """End-to-end CLI integration: apps/train_v2.main with text-encoder
    unfreeze + EMA target on tiny shapes — guards the arg wiring, the
    online text re-encoding, ema_path, and the three exports. The reward
    towers are left OFF here (their selection/loss/adapter layers have
    dedicated tests and tower graphs triple this test's un-cacheable
    trace/lowering time on the 1-core CI box)."""

    def _write_pickles(self, d, n=8, ctx_dim=16):
        import pickle

        rng = np.random.RandomState(0)
        t, lh, lw = 4, 4, 4
        for i in range(n):
            s = {
                "index": np.int32(30 + i),
                "z_t": rng.randn(t, lh, lw, 4).astype(np.float32),
                "cond_teacher_out": rng.randn(t, lh, lw, 4).astype(np.float32),
                "uncond_teacher_out": rng.randn(t, lh, lw, 4).astype(np.float32),
                "score": (rng.randn(t, lh, lw, 4) * 0.01).astype(np.float32),
                "prompt_emb": rng.randn(7, ctx_dim).astype(np.float32),
                "use_motion_guide": True,
                "txt": f"a full caption number {i}",
                "short_txt": "cat" if i % 2 else "",
            }
            pickle.dump(s, open(d / f"{i}.pkl", "wb"))

    def test_cli_end_to_end(self, tmp_path):
        import json

        from t2v_turbo_tpu.apps.train_v2 import main

        lat = tmp_path / "latents"
        lat.mkdir()
        self._write_pickles(lat)
        out = tmp_path / "out"
        # main() repoints the global compilation cache (the CLI apps use the
        # user-level cache dir); restore the test session's dir after
        old_cache = jax.config.jax_compilation_cache_dir
        try:
            main([
                "--cpu", "--tiny-model", "--random-weights",
                "--latent-glob", str(lat / "*.pkl"),
                "--output-dir", str(out),
                "--max-steps", "2", "--batch-size", "8",
                "--optimizer", "adamw",
                "--train-text-encoder", "--unlocked-text-layers", "2",
                "--use-target-unet",
            ])
        finally:
            jax.config.update("jax_compilation_cache_dir", old_cache)
        rows = [
            json.loads(l) for l in open(out / "metrics.jsonl", encoding="utf-8")
        ]
        assert rows[-1]["step"] == 2
        assert np.isfinite(rows[-1]["loss"])
        assert (out / "unet.pt").exists()
        assert (out / "target_unet.pt").exists()  # UNet-only EMA exported
        assert (out / "text_encoder.npz").exists()


class TestV2OptimizerGroups:
    def _tree(self):
        return {
            "unet": {"params": {
                "init_attn": {"kernel": jnp.ones((4, 4))},
                "input_blocks_2_2": {"kernel": jnp.ones((4, 4))},
                "out": {"kernel": jnp.ones((4, 4))},
            }},
            "text": {"params": {
                "token_embedding": jnp.ones((10, 4)),
                "positional_embedding": jnp.ones((7, 4)),
                "resblocks_0": {"kernel": jnp.ones((4, 4))},
                "resblocks_1": {"kernel": jnp.ones((4, 4))},
                "ln_final": {"scale": jnp.ones((4,))},
            }},
        }

    def _updates(self, **kw):
        tree = self._tree()
        tx = make_v2_optimizer("adamw", 1e-2, **kw)
        state = tx.init(tree)
        grads = jax.tree.map(jnp.ones_like, tree)
        updates, _ = tx.update(grads, state, tree)
        return updates

    def test_partial_unfreeze(self):
        """unlocked_text_layers counts blocks of the reference's FULL tower
        (text_resblocks + 1, final block dead under penultimate): here 2 of
        a 3-block full tower -> live resblocks_1 + ln_final train;
        embeddings and resblocks_0 are frozen (reference :816-830)."""
        u = self._updates(
            train_text_encoder=True, unlocked_text_layers=2, text_resblocks=2
        )
        t = u["text"]["params"]
        assert float(jnp.abs(t["token_embedding"]).sum()) == 0
        assert float(jnp.abs(t["positional_embedding"]).sum()) == 0
        assert float(jnp.abs(t["resblocks_0"]["kernel"]).sum()) == 0
        assert float(jnp.abs(t["resblocks_1"]["kernel"]).sum()) > 0
        assert float(jnp.abs(t["ln_final"]["scale"]).sum()) > 0
        # UNet always trains
        assert float(jnp.abs(u["unet"]["params"]["out"]["kernel"]).sum()) > 0

    def test_default_boundary_matches_reference(self):
        """Defaults (unlocked_text_layers=4 of the 24-block ViT-H tower,
        23 live): the reference locks resblocks[:-4] -> 0..19 frozen, and
        block 23 never runs under penultimate extraction
        (condition.py:272-276), so exactly 20,21,22 train."""
        from jax.tree_util import DictKey

        from t2v_turbo_tpu.training.optim import make_v2_label_fn

        label = make_v2_label_fn(train_text_encoder=True)
        path = lambda i: (
            DictKey("text"), DictKey("params"),
            DictKey(f"resblocks_{i}"), DictKey("kernel"),
        )
        assert label(path(19)) == "frozen"
        assert label(path(20)) == "base"
        assert label(path(22)) == "base"

    def test_frozen_leaves_allocate_no_moments(self):
        """optax.masked drops moment slots for frozen text leaves — the
        reference only hands requires_grad=True params to its optimizer
        (:829-845), so frozen layers cost no optimizer memory."""
        tree = self._tree()
        tx = make_v2_optimizer(
            "adamw", 1e-2, train_text_encoder=True,
            unlocked_text_layers=2, text_resblocks=2,
        )
        state = tx.init(tree)
        flat = jax.tree_util.tree_flatten_with_path(state)[0]
        paths = [
            "/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat
        ]
        assert not any("token_embedding" in s for s in paths)
        assert not any("resblocks_0" in s for s in paths)
        assert any("resblocks_1" in s for s in paths)

    def test_text_frozen_without_flag(self):
        u = self._updates(train_text_encoder=False)
        assert all(
            float(jnp.abs(leaf).sum()) == 0
            for leaf in jax.tree.leaves(u["text"])
        )

    def test_temporal_lr_group(self):
        """init_attn + TemporalTransformer modules get the temporal LR
        (reference :799-814,832-845): with a 10x temporal LR their updates
        are ~10x the base ones."""
        u = self._updates(temporal_learning_rate=1e-1, train_text_encoder=True,
                          unlocked_text_layers=2, text_resblocks=2)
        base = float(jnp.abs(u["unet"]["params"]["out"]["kernel"]).mean())
        temporal = float(jnp.abs(u["unet"]["params"]["init_attn"]["kernel"]).mean())
        temporal2 = float(
            jnp.abs(u["unet"]["params"]["input_blocks_2_2"]["kernel"]).mean()
        )
        assert abs(temporal / base - 10.0) < 0.5
        assert abs(temporal2 / base - 10.0) < 0.5
