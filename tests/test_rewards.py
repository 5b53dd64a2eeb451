"""Reward tower tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.models.clip_text import CLIPTextConfig
from t2v_turbo_tpu.rewards.reward_fn import (
    build_image_reward_model,
    build_video_reward_model,
    get_reward_fn,
    preprocess_images,
)
from t2v_turbo_tpu.rewards.vit import (
    VideoViTConfig,
    ViTConfig,
)

TINY_VIT = ViTConfig(image_size=28, patch_size=14, width=32, layers=2, heads=4, output_dim=16)
TINY_VVIT = VideoViTConfig(image_size=28, patch_size=14, width=32, layers=2, heads=4, output_dim=16, num_frames=4)
TINY_TEXT = CLIPTextConfig(vocab_size=60, width=32, heads=4, layers=2, context_length=8, penultimate=False)


class FakeTok:
    def __init__(self, context_length=8):
        self.context_length = context_length

    def __call__(self, texts):
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            n = min(len(t) % 5 + 2, self.context_length)
            out[i, :n] = (np.arange(n) + len(t)) % 59 + 1
        return out


@pytest.fixture(scope="module")
def img_rm():
    return build_image_reward_model(
        vit_cfg=TINY_VIT, text_cfg=TINY_TEXT, tokenizer=FakeTok()
    )


@pytest.fixture(scope="module")
def vid_rm():
    return build_video_reward_model(
        vit_cfg=TINY_VVIT, text_cfg=TINY_TEXT, tokenizer=FakeTok()
    )


class TestPreprocess:
    def test_resize_and_normalize(self):
        imgs = jnp.ones((2, 64, 48, 3)) * 0.5
        out = preprocess_images(imgs, size=28)
        assert out.shape == (2, 28, 28, 3)
        # normalized: (0.5 - mean)/std
        expected = (0.5 - 0.48145466) / 0.26862954
        assert abs(float(out[0, 14, 14, 0]) - expected) < 0.05

    def test_video_batch(self):
        vids = jnp.zeros((1, 4, 40, 40, 3))
        out = preprocess_images(vids, size=28)
        assert out.shape == (1, 4, 28, 28, 3)

    def test_differentiable(self):
        def f(x):
            return jnp.sum(preprocess_images(x, size=28) ** 2)

        g = jax.jit(jax.grad(f))(jnp.ones((1, 40, 40, 3)) * 0.3)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestImageReward:
    def test_score_shape_and_range(self, img_rm):
        images = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32, 3)), 0, 1
        )
        scores = img_rm(images, ["a cat", "a dog", "a bird"])
        assert scores.shape == (3,)
        assert (np.abs(np.asarray(scores)) <= 1.0 + 1e-5).all()  # cosine

    def test_grad_through_images_only(self, img_rm):
        tf = img_rm.encode_texts(["x"])

        def loss(images):
            return -img_rm.score(images, tf).mean()

        g = jax.jit(jax.grad(loss))(jnp.full((1, 32, 32, 3), 0.5))
        assert float(jnp.abs(g).sum()) > 0

    def test_logit_scale(self, img_rm):
        images = jnp.full((1, 32, 32, 3), 0.5)
        tf = img_rm.encode_texts(["y"])
        s = img_rm.score(images, tf)
        sl = img_rm.score(images, tf, logits=True)
        np.testing.assert_allclose(
            np.asarray(sl), np.asarray(s) * img_rm.logit_scale, rtol=1e-5
        )


class TestVideoReward:
    def test_score(self, vid_rm):
        vids = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 32, 32, 3)), 0, 1
        )
        scores = vid_rm(vids, ["a", "b"])
        assert scores.shape == (2,)
        assert (np.abs(np.asarray(scores)) <= 1.0 + 1e-5).all()

    def test_single_frame_uses_mean_temporal_pos(self, vid_rm):
        vids = jnp.full((1, 1, 32, 32, 3), 0.5)
        s = vid_rm(vids, ["z"])
        assert np.isfinite(np.asarray(s)).all()

    def test_grad(self, vid_rm):
        tf = vid_rm.encode_texts(["x"])

        def loss(v):
            return -vid_rm.score(v, tf).mean()

        g = jax.jit(jax.grad(loss))(jnp.full((1, 4, 32, 32, 3), 0.5))
        assert float(jnp.abs(g).sum()) > 0


class TestFactory:
    def test_names(self):
        rm = get_reward_fn(
            "clip", vit_cfg=TINY_VIT, text_cfg=TINY_TEXT, tokenizer=FakeTok()
        )
        assert rm is not None
        from t2v_turbo_tpu.rewards.blip import BertConfig, BlipViTConfig

        ir = get_reward_fn(
            "img_reward",
            vit_cfg=BlipViTConfig(image_size=32, patch_size=16, width=32,
                                  layers=1, heads=4),
            bert_cfg=BertConfig(vocab_size=60, hidden=24, layers=1, heads=4,
                                intermediate=48, max_position=16,
                                encoder_width=32),
            head_dims=(8, 1),
        )
        assert ir is not None
        # vi_clip2 is implemented (see tests/test_internvideo2.py)
        with pytest.raises(ValueError):
            get_reward_fn("nope")


class TestTrainFacades:
    """BlipTrainReward / InternVideo2TrainReward expose the CLIP-reward
    interface (encode_texts -> batch field, score(images01, field)) so the
    reference's img_reward / vi_clip2 towers plug into the v1/v2 trainer
    adapters (reference train_t2v_turbo_v1_lora.py:518-520 default)."""

    def test_blip_train_reward_grad(self):
        from t2v_turbo_tpu.rewards.blip import (
            BertConfig, BlipViTConfig, build_image_reward_blip,
        )
        from t2v_turbo_tpu.rewards.reward_fn import BlipTrainReward

        rm = BlipTrainReward(build_image_reward_blip(
            vit_cfg=BlipViTConfig(image_size=28, patch_size=14, width=32,
                                  layers=1, heads=4),
            bert_cfg=BertConfig(vocab_size=30524, hidden=24, layers=1,
                                heads=4, intermediate=48, encoder_width=32),
            head_dims=(8, 1),
        ))
        ids = rm.encode_texts(["a cat", "a dog runs"])
        assert ids.shape == (2, 35) and ids.dtype == np.int32
        imgs = jnp.full((2, 32, 48, 3), 0.5)
        s = rm.score(imgs, jnp.asarray(ids))
        assert s.shape == (2,) and bool(jnp.all(s <= 0))  # -relu(-r+2) <= 0
        g = jax.jit(jax.grad(lambda im: rm.score(im, jnp.asarray(ids)).sum()))(imgs)
        assert float(jnp.abs(g).sum()) > 0

    def test_iv2_train_reward_grad(self):
        from t2v_turbo_tpu.rewards.blip import BertConfig
        from t2v_turbo_tpu.rewards.internvideo2 import (
            IV2VisionConfig, build_internvideo2_reward,
        )
        from t2v_turbo_tpu.rewards.reward_fn import InternVideo2TrainReward

        rm = InternVideo2TrainReward(build_internvideo2_reward(
            vision_cfg=IV2VisionConfig(img_size=28, patch_size=14, width=32,
                                       depth=1, heads=4, mlp_hidden=64,
                                       num_frames=4, clip_embed_dim=16,
                                       attn_pool_heads=4),
            text_cfg=BertConfig(vocab_size=30524, hidden=24, layers=1,
                                heads=4, intermediate=48,
                                cross_attention=False, encoder_width=32),
            embed_dim=16,
        ), image_size=28)
        tf = rm.encode_texts(["a cat", "a dog"])
        vids = jnp.full((2, 4, 32, 48, 3), 0.5)
        s = rm.score(vids, tf)
        assert s.shape == (2,)
        g = jax.jit(jax.grad(lambda v: rm.score(v, tf).sum()))(vids)
        assert float(jnp.abs(g).sum()) > 0

        # BERT-style tokenizers (the --bert-vocab production path) return an
        # (ids, attention_mask) TUPLE — encode_texts must unpack it and
        # forward the mask, not jnp.asarray the tuple into a (2, B, L) array
        class TupleTok:
            def __call__(self, texts):
                ids = np.zeros((len(texts), 6), np.int32)
                mask = np.zeros((len(texts), 6), np.int32)
                for i, t in enumerate(texts):
                    n = min(len(t.split()) + 2, 6)
                    ids[i, :n] = np.arange(1, n + 1)
                    mask[i, :n] = 1
                return ids, mask

        rm.rm.tokenizer = TupleTok()
        tf2 = rm.encode_texts(["a cat", "a dog runs far"])
        assert tf2.shape == tf.shape
        # the mask must reach the encoder: same ids with an all-ones mask
        # (padding attended) produce different features
        ids, mask = TupleTok()(["a cat", "a dog runs far"])
        with_mask = rm.rm.encode_texts_tokens(jnp.asarray(ids), jnp.asarray(mask))
        no_mask = rm.rm.encode_texts_tokens(jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(tf2), np.asarray(with_mask),
                                   rtol=1e-5, atol=1e-6)
        assert float(jnp.abs(with_mask - no_mask).max()) > 1e-4


class TestScanLayers:
    """scan_layers=True lowers one block body via lax.scan over stacked
    params — must match the unrolled tower exactly (same blocks, same
    order; only the HLO size changes)."""

    def test_vit_scan_matches_unrolled(self):
        import dataclasses

        from t2v_turbo_tpu.rewards.vit import (
            VisionTransformer,
            stack_tower_layers,
            unstack_tower_layers,
        )

        vit = VisionTransformer(cfg=TINY_VIT)
        p = vit.init(jax.random.PRNGKey(0), jnp.zeros((2, 28, 28, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        ref = vit.apply(p, x)

        scfg = dataclasses.replace(TINY_VIT, scan_layers=True)
        svit = VisionTransformer(cfg=scfg)
        sp = {"params": stack_tower_layers(p["params"], TINY_VIT.layers)}
        got = svit.apply(sp, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

        # round-trip back to the per-layer layout
        rt = unstack_tower_layers(sp["params"], TINY_VIT.layers)
        chex = jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            rt, p["params"],
        )
        del chex

        # init in the scanned layout directly has the stacked shapes
        ip = svit.init(jax.random.PRNGKey(2), jnp.zeros((1, 28, 28, 3)))
        ln1 = ip["params"]["resblocks"]["block"]["ln_1"]["scale"]
        assert ln1.shape == (TINY_VIT.layers, TINY_VIT.width)

    def test_video_vit_scan_matches_unrolled(self):
        import dataclasses

        from t2v_turbo_tpu.rewards.vit import (
            VideoVisionTransformer,
            stack_tower_layers,
        )

        vvit = VideoVisionTransformer(cfg=TINY_VVIT)
        p = vvit.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 28, 28, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 28, 28, 3))
        ref = vvit.apply(p, x)

        scfg = dataclasses.replace(TINY_VVIT, scan_layers=True)
        sp = {"params": stack_tower_layers(p["params"], TINY_VVIT.layers)}
        got = VideoVisionTransformer(cfg=scfg).apply(sp, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_scan_grads_flow(self):
        import dataclasses

        from t2v_turbo_tpu.rewards.vit import VisionTransformer

        scfg = dataclasses.replace(TINY_VIT, scan_layers=True)
        svit = VisionTransformer(cfg=scfg)
        p = svit.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
        x = jnp.full((2, 28, 28, 3), 0.5)
        g = jax.jit(jax.grad(lambda im: svit.apply(p, im).sum()))(x)
        assert float(jnp.abs(g).sum()) > 0

    def test_iv2_scan_matches_unrolled(self):
        import dataclasses

        from t2v_turbo_tpu.rewards.internvideo2 import (
            IV2VisionConfig, IV2VisionEncoder,
        )
        from t2v_turbo_tpu.rewards.vit import stack_params_by_prefix

        cfg = IV2VisionConfig(img_size=28, patch_size=14, width=32, depth=3,
                              heads=4, mlp_hidden=64, num_frames=4,
                              clip_embed_dim=16, attn_pool_heads=4)
        enc = IV2VisionEncoder(cfg=cfg)
        p = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 28, 28, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 28, 28, 3))
        ref = enc.apply(p, x)

        scfg = dataclasses.replace(cfg, scan_layers=True)
        sp = {"params": stack_params_by_prefix(p["params"], "blocks", cfg.depth)}
        got = IV2VisionEncoder(cfg=scfg).apply(sp, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_blip_scan_matches_unrolled(self):
        import dataclasses

        from t2v_turbo_tpu.rewards.blip import BlipViT, BlipViTConfig
        from t2v_turbo_tpu.rewards.vit import stack_params_by_prefix

        cfg = BlipViTConfig(image_size=28, patch_size=14, width=32, layers=3,
                            heads=4)
        vit = BlipViT(cfg=cfg)
        p = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
        ref = vit.apply(p, x)

        scfg = dataclasses.replace(cfg, scan_layers=True)
        sp = {"params": stack_params_by_prefix(p["params"], "layers", cfg.layers)}
        got = BlipViT(cfg=scfg).apply(sp, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_builder_restacks_imported_weights(self):
        """build_image_reward_model(weights=..., scan_layers=True) restacks a
        per-layer imported tree automatically."""
        from t2v_turbo_tpu.rewards.reward_fn import build_image_reward_model
        from t2v_turbo_tpu.models.clip_text import CLIPTextConfig

        text_cfg = CLIPTextConfig(vocab_size=60, width=32, heads=4, layers=2,
                                  context_length=8, penultimate=False)
        base = build_image_reward_model(
            vit_cfg=TINY_VIT, text_cfg=text_cfg, tokenizer=FakeTok()
        )
        weights = {
            "visual": base.vision_params["params"],
            "text": base.text_params["params"],
            "logit_scale": float(np.log(base.logit_scale)),
        }
        rm = build_image_reward_model(
            weights=weights, vit_cfg=TINY_VIT, text_cfg=text_cfg,
            tokenizer=FakeTok(), scan_layers=True,
        )
        imgs = jnp.full((2, 28, 28, 3), 0.3)
        tf = base.encode_texts(["a cat", "a dog"])
        np.testing.assert_allclose(
            np.asarray(rm.score(imgs, tf)),
            np.asarray(base.score(imgs, tf)),
            atol=1e-5,
        )
