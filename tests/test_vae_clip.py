"""Tests for the VAE, CLIP text tower, and BPE tokenizer."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    decode_video,
    encode_video,
)
from t2v_turbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

BPE_AVAILABLE = any(
    os.path.exists(p)
    for p in [
        os.environ.get("T2V_TPU_BPE_PATH", ""),
        os.path.join(
            os.path.dirname(__file__), os.pardir, "t2v_turbo_tpu", "assets",
            "bpe_simple_vocab_16e6.txt.gz",
        ),
    ]
    if p
)


def tiny_vae_cfg():
    return VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)


class TestVAE:
    @pytest.fixture(scope="class")
    def vae(self):
        cfg = tiny_vae_cfg()
        model = AutoencoderKL(cfg=cfg)
        x = jnp.zeros((1, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params

    def test_encode_shapes(self, vae):
        model, params = vae
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        mean, logvar = model.apply(params, x, method=model.encode)
        # f = 2^(len(ch_mult)-1) = 2 for the tiny config
        assert mean.shape == (2, 8, 8, 4)
        assert logvar.shape == (2, 8, 8, 4)
        assert np.isfinite(np.asarray(mean)).all()

    def test_decode_shapes(self, vae):
        model, params = vae
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
        out = model.apply(params, z, method=model.decode)
        assert out.shape == (2, 16, 16, 3)

    def test_full_config_structure(self):
        """Full SD-VAE config: f=8, correct latent channels, ~84M params."""
        model = AutoencoderKL(cfg=VAEConfig())
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert 80e6 < n < 90e6, n

    def test_video_roundtrip_shapes(self):
        cfg = tiny_vae_cfg()
        model = AutoencoderKL(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        video = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16, 3))
        # NOTE scale_factor semantics: z = sf * posterior; decode divides back
        z = encode_video(model, params, video, scale_factor=0.18215)
        assert z.shape == (1, 4, 8, 8, 4)
        out = decode_video(model, params, z, scale_factor=0.18215)
        assert out.shape == video.shape

    def test_frame_chunking_equivalent(self):
        cfg = tiny_vae_cfg()
        model = AutoencoderKL(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        video = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16, 16, 3))
        z1 = encode_video(model, params, video)
        z2 = encode_video(model, params, video, frame_chunk=2)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)

    def test_posterior_sampling(self):
        cfg = tiny_vae_cfg()
        model = AutoencoderKL(cfg=cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        video = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 16, 16, 3))
        z_mode = encode_video(model, params, video)
        z_s1 = encode_video(model, params, video, key=jax.random.PRNGKey(1))
        z_s2 = encode_video(model, params, video, key=jax.random.PRNGKey(2))
        assert float(jnp.abs(z_s1 - z_s2).max()) > 0  # stochastic
        assert float(jnp.abs(z_mode - z_s1).max()) > 0

    def test_posterior_kl_nll(self):
        """Closed-form oracle for posterior_kl / posterior_nll (reference
        lvdm/distributions.py:44-70)."""
        from t2v_turbo_tpu.models.vae import posterior_kl, posterior_nll

        rng = np.random.RandomState(0)
        mean = rng.randn(2, 3, 3, 4).astype(np.float32)
        logvar = rng.randn(2, 3, 3, 4).astype(np.float32)

        # standard-normal posterior: kl vs N(0,I) is 0, kl vs itself is 0
        zeros = np.zeros_like(mean)
        np.testing.assert_allclose(
            np.asarray(posterior_kl(zeros, zeros)), 0.0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(posterior_kl(mean, logvar, mean, logvar)), 0.0, atol=1e-5
        )

        # generic case vs the scalar closed form, elementwise-summed
        var = np.exp(logvar)
        want = 0.5 * (mean**2 + var - 1.0 - logvar).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(
            np.asarray(posterior_kl(mean, logvar)), want, rtol=1e-5
        )
        m2 = rng.randn(*mean.shape).astype(np.float32)
        lv2 = rng.randn(*mean.shape).astype(np.float32)
        want2 = 0.5 * (
            (mean - m2) ** 2 / np.exp(lv2) + var / np.exp(lv2) - 1.0 - logvar + lv2
        ).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(
            np.asarray(posterior_kl(mean, logvar, m2, lv2)), want2, rtol=1e-5
        )

        # nll at the mean of a unit Gaussian is 0.5*log(2*pi)*D per example
        d = mean[0].size
        np.testing.assert_allclose(
            np.asarray(posterior_nll(mean, zeros, mean)),
            0.5 * np.log(2 * np.pi) * d,
            rtol=1e-6,
        )
        sample = rng.randn(*mean.shape).astype(np.float32)
        want3 = 0.5 * (
            np.log(2 * np.pi) + logvar + (sample - mean) ** 2 / var
        ).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(
            np.asarray(posterior_nll(mean, logvar, sample)), want3, rtol=1e-5
        )


class TestCLIPText:
    def test_tiny_forward(self):
        cfg = CLIPTextConfig(
            vocab_size=100, width=32, heads=4, layers=3, context_length=16
        )
        model = CLIPTextModel(cfg=cfg)
        toks = jnp.zeros((2, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), toks)
        out = model.apply(params, toks)
        assert out.shape == (2, 16, 32)
        # penultimate: only layers-1 blocks created
        blocks = [k for k in params["params"] if k.startswith("resblocks_")]
        assert len(blocks) == 2

    def test_causality(self):
        """Changing a later token must not affect earlier positions."""
        cfg = CLIPTextConfig(
            vocab_size=100, width=32, heads=4, layers=2, context_length=8
        )
        model = CLIPTextModel(cfg=cfg)
        t1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32) % 100
        t2 = t1.at[0, 6].set(99)
        params = model.init(jax.random.PRNGKey(0), t1)
        o1 = model.apply(params, t1)
        o2 = model.apply(params, t2)
        np.testing.assert_allclose(
            np.asarray(o1[0, :6]), np.asarray(o2[0, :6]), atol=1e-5
        )
        assert float(jnp.abs(o1[0, 6:] - o2[0, 6:]).max()) > 1e-6

    def test_full_size_param_count(self):
        """ViT-H-14 text tower minus final block: ~300M params."""
        model = CLIPTextModel()
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
            )
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert 2.5e8 < n < 4e8, n


@pytest.mark.skipif(not BPE_AVAILABLE, reason="BPE vocab asset not available")
class TestTokenizer:
    @pytest.fixture(scope="class")
    def tok(self):
        from t2v_turbo_tpu.utils.tokenizer import CLIPTokenizer

        return CLIPTokenizer()

    def test_shape_and_special_tokens(self, tok):
        out = tok(["a cat", "a dog running in the park"])
        assert out.shape == (2, 77)
        assert (out[:, 0] == tok.sot_id).all()
        # EOT present, zero padding after
        row = out[0]
        eot_pos = int(np.where(row == tok.eot_id)[0][0])
        assert (row[eot_pos + 1 :] == 0).all()

    def test_known_vocab_size(self, tok):
        assert len(tok.encoder) == 49408
        assert tok.sot_id == 49406 and tok.eot_id == 49407

    def test_roundtrip_stability(self, tok):
        a = tok("A photo of a CAT.")
        b = tok("a photo of a cat.")
        np.testing.assert_array_equal(a, b)  # lowercasing

    def test_truncation(self, tok):
        long = " ".join(["word"] * 200)
        out = tok(long)
        assert out.shape == (1, 77)
        assert out[0, -1] == tok.eot_id
