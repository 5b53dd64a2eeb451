"""Image-conditioned generation glue (LatentVisualDiffusion equivalent,
reference ddpm3d.py:835-887 + condition.py:289-485): preprocessing, both
projection modes, and the end-to-end image-token flow into the
use_image_attention UNet."""

import numpy as np
import jax
import jax.numpy as jnp

from t2v_turbo_tpu.models.image_cond import (
    CLIP_MEAN,
    CLIP_STD,
    ImageCondEncoder,
    append_image_context,
    clip_image_preprocess,
)
from t2v_turbo_tpu.rewards.vit import ViTConfig

TINY_VIT = ViTConfig(
    image_size=16, patch_size=8, width=24, layers=2, heads=2, output_dim=20
)


class TestPreprocess:
    def test_range_and_shape(self):
        x = jnp.zeros((2, 12, 10, 3))  # all-zero in [-1,1] == mid gray
        out = clip_image_preprocess(x, size=16)
        assert out.shape == (2, 16, 16, 3)
        expect = (0.5 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), expect, atol=1e-5
        )


class TestImageCondEncoder:
    def test_coarse_tokens(self):
        enc = ImageCondEncoder.create(
            jax.random.PRNGKey(0), finegrained=False,
            cross_attention_dim=16, vit_cfg=TINY_VIT,
        )
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
            * 2 - 1
        )
        tok = enc(imgs)
        assert tok.shape == (2, 4, 16)  # 4 coarse tokens (ddpm3d.py:843)
        assert np.isfinite(np.asarray(tok)).all()

    def test_finegrained_tokens(self):
        enc = ImageCondEncoder.create(
            jax.random.PRNGKey(1), finegrained=True,
            cross_attention_dim=16, vit_cfg=TINY_VIT,
        )
        imgs = jnp.asarray(
            np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
            * 2 - 1
        )
        tok = enc(imgs)
        assert tok.shape == (1, 16, 16)  # 16 finegrained tokens
        assert np.isfinite(np.asarray(tok)).all()

    def test_image_sensitivity(self):
        enc = ImageCondEncoder.create(
            jax.random.PRNGKey(2), finegrained=False,
            cross_attention_dim=16, vit_cfg=TINY_VIT,
        )
        a = enc(jnp.full((1, 16, 16, 3), -0.5))
        b = enc(jnp.full((1, 16, 16, 3), 0.5))
        assert float(jnp.abs(a - b).max()) > 1e-6


class TestAppendImageContext:
    def test_pad_and_append(self):
        txt = jnp.concatenate(
            [jnp.ones((2, 6, 8)), jnp.full((2, 1, 8), 3.0)], axis=1
        )
        img = jnp.full((2, 4, 8), 2.0)
        ctx = append_image_context(txt, img, text_context_len=10)
        assert ctx.shape == (2, 14, 8)
        np.testing.assert_allclose(np.asarray(ctx[:, :6]), 1.0)
        # pad repeats the LAST text row (not zeros — zero keys would
        # dilute the cross-attention softmax)
        np.testing.assert_allclose(np.asarray(ctx[:, 6:10]), 3.0)
        np.testing.assert_allclose(np.asarray(ctx[:, 10:]), 2.0)

    def test_truncate(self):
        txt = jnp.ones((1, 12, 8))
        img = jnp.zeros((1, 4, 8))
        ctx = append_image_context(txt, img, text_context_len=10)
        assert ctx.shape == (1, 14, 8)
