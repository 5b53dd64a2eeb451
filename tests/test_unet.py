"""Shape/structure tests for the VC2 UNet on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.models import UNetConfig, UNetModel


def tiny_cfg(**kw):
    base = dict(
        in_channels=4,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2),
        num_head_channels=16,
        context_dim=24,
        temporal_length=4,
    )
    base.update(kw)
    return UNetConfig(**base)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_cfg()
    model = UNetModel(cfg=cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 4, 8, 8, 4))
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 24))
    params = model.init(key, x, ts, ctx)
    return model, params


class TestUNet:
    def test_output_shape(self, tiny_model):
        model, params = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 4))
        out = model.apply(
            params, x, jnp.array([10, 900]), jnp.ones((2, 7, 24))
        )
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_init_out_conv(self, tiny_model):
        """out conv is zero-initialized, so a fresh model outputs ~0
        (matches reference zero_module(out), openaimodel3d.py:666-670)."""
        model, params = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4))
        out = model.apply(params, x, jnp.array([5]), jnp.ones((1, 7, 24)))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_timestep_sensitivity(self, tiny_model):
        """Different timesteps must give different internal activations; use
        nonzero out conv by perturbing params."""
        model, params = tiny_model
        params = jax.tree.map(
            lambda p: p + 0.01 * np.random.RandomState(0).randn(*p.shape), params
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8, 4))
        ctx = jnp.ones((1, 7, 24))
        o1 = model.apply(params, x, jnp.array([10]), ctx)
        o2 = model.apply(params, x, jnp.array([900]), ctx)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_context_sensitivity(self, tiny_model):
        model, params = tiny_model
        params = jax.tree.map(
            lambda p: p + 0.01 * np.random.RandomState(1).randn(*p.shape), params
        )
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8, 4))
        o1 = model.apply(params, x, jnp.array([10]), jnp.ones((1, 7, 24)))
        o2 = model.apply(params, x, jnp.array([10]), -jnp.ones((1, 7, 24)))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_lcm_w_cond(self):
        cfg = tiny_cfg(time_cond_proj_dim=8)
        model = UNetModel(cfg=cfg)
        x = jnp.zeros((1, 4, 8, 8, 4))
        ctx = jnp.ones((1, 7, 24))
        w = jnp.ones((1, 8))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.array([1]), ctx, timestep_cond=w
        )
        pkeys = params["params"].keys()
        assert "time_cond_proj" in pkeys
        out = model.apply(params, x, jnp.array([1]), ctx, timestep_cond=w)
        assert out.shape == x.shape

    def test_motion_cond(self):
        cfg = tiny_cfg(time_cond_proj_dim=8, motion_cond_proj_dim=8)
        model = UNetModel(cfg=cfg)
        x = jnp.zeros((1, 4, 8, 8, 4))
        ctx = jnp.ones((1, 7, 24))
        w = jnp.ones((1, 8))
        params = model.init(
            jax.random.PRNGKey(0),
            x,
            jnp.array([1]),
            ctx,
            timestep_cond=w,
            motion_cond=w,
        )
        assert "motion_cond_proj" in params["params"]
        assert "combine_proj" in params["params"]

    def test_param_structure_full_config(self):
        """Full-size config builds the expected block structure (param count
        in the right ballpark for VideoCrafter2+LCM proj: ~1.4B)."""
        cfg = UNetConfig(time_cond_proj_dim=256)
        model = UNetModel(cfg=cfg)
        x = jnp.zeros((1, 2, 8, 8, 4))
        ctx = jnp.zeros((1, 7, 1024))
        params = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                x,
                jnp.zeros((1,), jnp.int32),
                ctx,
                timestep_cond=jnp.zeros((1, 256)),
            )
        )
        n_params = sum(
            np.prod(l.shape) for l in jax.tree.leaves(params)
        )
        # reference VC2 UNet is ~1.4B params
        assert 1.3e9 < n_params < 1.6e9, n_params
        p = params["params"]
        # 11 encoder blocks after conv_in: 2 levels x (2 res) + 3 downsample + ...
        n_input = len([k for k in p if k.startswith("input_blocks_")])
        assert n_input > 0
        assert "init_attn" in p
        assert "fps_embedding_0" in p

    def test_attn_prob_capture(self, tiny_model):
        """MotionClone hook: temporal attention probs are sown on demand."""
        model, params = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8, 4))
        out, inter = model.apply(
            params,
            x,
            jnp.array([10]),
            jnp.ones((1, 7, 24)),
            record_probs=True,
            mutable=["intermediates"],
        )
        probs = [
            v
            for k, v in jax.tree_util.tree_flatten_with_path(inter)[0]
        ]
        assert len(probs) > 0
        # temporal attention over t=4 frames: rows sum to 1
        for pr in probs:
            assert pr.shape[-1] == 4
            np.testing.assert_allclose(np.asarray(pr).sum(-1), 1.0, rtol=1e-4)


class TestImageAttentionVariant:
    def test_forward_with_image_tokens(self):
        """use_image_attention threads through to the spatial attn2
        (reference openaimodel3d.py:368,490): context rows past
        text_context_len are image tokens; they must influence the output
        and init must create to_k_ip/to_v_ip leaves."""
        from tinymodels import tiny_unet

        unet = tiny_unet(use_image_attention=True)
        # context: 6 "text" rows + 2 image tokens with text_context_len=200
        # would make the text split empty at tiny scale, so use the module
        # default (200) with a 202-row context: 200 text + 2 image
        import jax, jax.numpy as jnp, numpy as np

        x = jnp.zeros((1, 4, 8, 8, 4))
        ctx = jnp.asarray(
            np.random.RandomState(0).randn(1, 202, 16).astype(np.float32)
        )
        t = jnp.zeros((1,), jnp.int32)
        params = unet.init(
            jax.random.PRNGKey(0), x, t, ctx,
            fps=jnp.full((1,), 16.0), timestep_cond=jnp.zeros((1, 8)),
        )
        leaves = jax.tree_util.tree_leaves_with_path(params)
        assert any("to_k_ip" in jax.tree_util.keystr(p) for p, _ in leaves)
        # zero-init tails make a fresh model output exactly 0 regardless of
        # inputs; perturb params so sensitivity is observable
        params = jax.tree.map(
            lambda p: p + 0.01 * np.random.RandomState(0).randn(*p.shape),
            params,
        )
        o1 = unet.apply(
            params, x, t, ctx, fps=jnp.full((1,), 16.0),
            timestep_cond=jnp.zeros((1, 8)),
        )
        ctx2 = ctx.at[:, 200:, :].set(0.0)
        o2 = unet.apply(
            params, x, t, ctx2, fps=jnp.full((1,), 16.0),
            timestep_cond=jnp.zeros((1, 8)),
        )
        assert float(jnp.abs(o1 - o2).max()) > 1e-7
