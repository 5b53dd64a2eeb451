"""ModelScope UNet3D tests: torch-oracle forward parity (tests/ms_oracle.py,
the hand-derived diffusers block math, via committed goldens), structure,
shapes, pipeline smoke, and an importer round-trip against a synthesized
diffusers-layout state dict (validates every key path and transpose in
import_ms_unet_params)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import goldens
from t2v_turbo_tpu.io.torch_import import import_ms_unet_params
from t2v_turbo_tpu.models.unet_ms import MSUNetConfig, MSUNet3DConditionModel


def tiny_cfg():
    return MSUNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        attention_head_dim=16,
        cross_attention_dim=24,
        time_cond_proj_dim=8,
    )


@pytest.fixture(scope="module")
def tiny_ms():
    model = MSUNet3DConditionModel(cfg=tiny_cfg())
    x = jnp.zeros((1, 4, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 24))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), ctx,
        timestep_cond=jnp.zeros((1, 8)),
    )
    return model, params


class TestMSUNet:
    def test_forward_shape(self, tiny_ms):
        model, params = tiny_ms
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 4))
        out = model.apply(
            params, x, jnp.array([10, 900]), jnp.ones((2, 7, 24)),
            timestep_cond=jnp.ones((2, 8)),
        )
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_cond_sensitivity(self, tiny_ms):
        model, params = tiny_ms
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4))
        kw = dict(timestep_cond=jnp.ones((1, 8)))
        o1 = model.apply(params, x, jnp.array([10]), jnp.ones((1, 7, 24)), **kw)
        o2 = model.apply(params, x, jnp.array([900]), jnp.ones((1, 7, 24)), **kw)
        o3 = model.apply(params, x, jnp.array([10]), -jnp.ones((1, 7, 24)), **kw)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6
        assert float(jnp.abs(o1 - o3).max()) > 1e-6

    def test_full_config_param_count(self):
        """MS text-to-video UNet is ~1.3-1.5B params."""
        model = MSUNet3DConditionModel(cfg=MSUNetConfig(time_cond_proj_dim=256))
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2, 8, 8, 4)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 7, 1024)),
                timestep_cond=jnp.zeros((1, 256)),
            )
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert 1.2e9 < n < 1.6e9, n

    def test_structure_keys(self, tiny_ms):
        _, params = tiny_ms
        p = params["params"]
        for k in (
            "conv_in", "linear_1", "linear_2", "cond_proj", "transformer_in",
            "down_0_layer_0", "down_0_downsample", "down_1_layer_0",
            "mid_resnet_0", "mid_attn", "mid_temp_attn", "mid_resnet_1",
            "up_0_layer_0", "up_1_layer_0", "up_0_upsample",
            "conv_norm_out", "conv_out",
        ):
            assert k in p, k
        # level 0 has cross attention, last level (1) does not
        assert "attn" in p["down_0_layer_0"]
        assert "attn" not in p["down_1_layer_0"]
        # up block 0 is plain, up block 1 has attention
        assert "attn" not in p["up_0_layer_0"]
        assert "attn" in p["up_1_layer_0"]


def synthesize_diffusers_sd(params, layers_per_block=1, n_levels=2):
    """Inverse-map a flax MS param tree to a diffusers-layout numpy state
    dict (torch weight conventions)."""
    sd = {}

    def dense(dst, node):
        sd[f"{dst}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
        if "bias" in node:
            sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def conv2d(dst, node):
        k = np.asarray(node["kernel"])  # (h, w, i, o)
        sd[f"{dst}.weight"] = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
        if "bias" in node:
            sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def conv1x1(dst, node):
        k = np.asarray(node["kernel"])  # dense (i, o) -> conv (o, i, 1, 1)
        sd[f"{dst}.weight"] = np.ascontiguousarray(k.T[..., None, None])
        if "bias" in node:
            sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def tconv(dst, node):
        k = np.asarray(node["kernel"])  # (3, 1, i, o)
        kt, _, i, o = k.shape
        sd[f"{dst}.weight"] = np.ascontiguousarray(
            k.reshape(kt, i, o).transpose(2, 1, 0)[..., None, None]
        )
        sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def norm(dst, node):
        sd[f"{dst}.weight"] = np.asarray(node["scale"])
        sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def attn_block(dst, node):
        for a in ("attn1", "attn2"):
            for t in ("to_q", "to_k", "to_v"):
                dense(f"{dst}.{a}.{t}", node[a][t])
            dense(f"{dst}.{a}.to_out.0", node[a]["to_out"])
        for nn_ in ("norm1", "norm2", "norm3"):
            norm(f"{dst}.{nn_}", node[nn_])
        # GEGLU proj kernel stored (C, 2, F); the diffusers Linear is (2F, C)
        pk = np.asarray(node["ff"]["proj"]["kernel"])
        dense(
            f"{dst}.ff.net.0.proj",
            {
                "kernel": pk.reshape(pk.shape[0], -1),
                "bias": np.asarray(node["ff"]["proj"]["bias"]).reshape(-1),
            },
        )
        dense(f"{dst}.ff.net.2", node["ff"]["out"])

    def transformer(dst, node, linear_proj):
        norm(f"{dst}.norm", node["norm"])
        (dense if linear_proj else conv1x1)(f"{dst}.proj_in", node["proj_in"])
        (dense if linear_proj else conv1x1)(f"{dst}.proj_out", node["proj_out"])
        attn_block(f"{dst}.transformer_blocks.0", node["blocks_0"])

    def resnet(dst, node):
        norm(f"{dst}.norm1", node["in_norm"])
        conv2d(f"{dst}.conv1", node["in_conv"])
        dense(f"{dst}.time_emb_proj", node["emb_proj"])
        norm(f"{dst}.norm2", node["out_norm"])
        conv2d(f"{dst}.conv2", node["out_conv"])
        if "skip_connection" in node:
            k = np.asarray(node["skip_connection"]["kernel"])  # (1,1,i,o)
            sd[f"{dst}.conv_shortcut.weight"] = np.ascontiguousarray(
                k[0, 0].T[..., None, None]
            )
            sd[f"{dst}.conv_shortcut.bias"] = np.asarray(
                node["skip_connection"]["bias"]
            )

    def temp_conv(dst, node):
        for i in range(1, 5):
            idx = 2 if i == 1 else 3
            norm(f"{dst}.conv{i}.0", node[f"norm{i}"])
            tconv(f"{dst}.conv{i}.{idx}", node[f"conv{i}"])

    p = params["params"]
    conv2d("conv_in", p["conv_in"])
    dense("time_embedding.linear_1", p["linear_1"])
    dense("time_embedding.linear_2", p["linear_2"])
    dense("time_embedding.cond_proj", p["cond_proj"])
    transformer("transformer_in", p["transformer_in"], linear_proj=True)
    norm("conv_norm_out", p["conv_norm_out"])
    conv2d("conv_out", p["conv_out"])

    for i in range(n_levels):
        cross = i < n_levels - 1
        for j in range(layers_per_block):
            node = p[f"down_{i}_layer_{j}"]
            resnet(f"down_blocks.{i}.resnets.{j}", node["resnet"])
            temp_conv(f"down_blocks.{i}.temp_convs.{j}", node["temp_conv"])
            if cross:
                transformer(f"down_blocks.{i}.attentions.{j}", node["attn"], False)
                transformer(
                    f"down_blocks.{i}.temp_attentions.{j}", node["temp_attn"], True
                )
        if i < n_levels - 1:
            conv2d(f"down_blocks.{i}.downsamplers.0.conv",
                   p[f"down_{i}_downsample"]["op"])

    for name, dst in (("mid_resnet_0", "mid_block.resnets.0"),
                      ("mid_resnet_1", "mid_block.resnets.1")):
        resnet(dst, p[name])
    temp_conv("mid_block.temp_convs.0", p["mid_temp_conv_0"])
    temp_conv("mid_block.temp_convs.1", p["mid_temp_conv_1"])
    transformer("mid_block.attentions.0", p["mid_attn"], False)
    transformer("mid_block.temp_attentions.0", p["mid_temp_attn"], True)

    for i in range(n_levels):
        cross = i > 0
        for j in range(layers_per_block + 1):
            node = p[f"up_{i}_layer_{j}"]
            resnet(f"up_blocks.{i}.resnets.{j}", node["resnet"])
            temp_conv(f"up_blocks.{i}.temp_convs.{j}", node["temp_conv"])
            if cross:
                transformer(f"up_blocks.{i}.attentions.{j}", node["attn"], False)
                transformer(
                    f"up_blocks.{i}.temp_attentions.{j}", node["temp_attn"], True
                )
        if i < n_levels - 1:
            conv2d(f"up_blocks.{i}.upsamplers.0.conv", p[f"up_{i}_upsample"]["conv"])
    return sd


def _gen_ms_golden():
    """Tiny random-weight oracle run (torch needed only for regeneration;
    the committed npz makes the parity test self-contained)."""
    torch = pytest.importorskip("torch")
    from ms_oracle import MSUNetOracle

    torch.manual_seed(0)
    ref = MSUNetOracle(
        block_out_channels=(32, 64),
        layers_per_block=1,
        attention_head_dim=16,
        cross_attention_dim=24,
        time_cond_proj_dim=8,
    ).eval()
    with torch.no_grad():
        # randomize EVERY parameter (incl. normally-zero residual tails) so a
        # mapping bug in any branch shows up in the output
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    g = {f"sd.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(5)
    x = rng.randn(2, 4, 4, 8, 8).astype(np.float32)  # (B, C, T, H, W)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    ts = np.array([33, 977], np.int64)
    w = rng.randn(2, 8).astype(np.float32)
    with torch.no_grad():
        y = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            timestep_cond=torch.from_numpy(w),
        ).numpy()
    g.update({"in.x": x, "in.ctx": ctx, "in.ts": ts, "in.w": w, "out.y": y})
    return g


class TestMSOracleParity:
    """Numerical oracle for the MS backbone (VERDICT r3 missing #3): the
    committed golden pins both models/unet_ms.py forward math and the
    import_ms_unet_params key/layout mapping against the reference's block
    semantics (model_scope/unet_3d_condition.py:329-470 wiring, diffusers
    block internals re-derived in tests/ms_oracle.py)."""

    @pytest.fixture(scope="class")
    def golden(self):
        g = goldens.load("ms_unet_tiny")
        if g is None:
            g = _gen_ms_golden()
            goldens.save("ms_unet_tiny", g)
        return g

    def test_forward_parity(self, golden):
        sd = goldens.subdict(golden, "sd")
        params = import_ms_unet_params(sd, layers_per_block=1, n_levels=2)
        model = MSUNet3DConditionModel(cfg=tiny_cfg())
        out = model.apply(
            {"params": params},
            jnp.asarray(golden["in.x"].transpose(0, 2, 3, 4, 1)),  # -> BTHWC
            jnp.asarray(golden["in.ts"].astype(np.int32)),
            jnp.asarray(golden["in.ctx"]),
            timestep_cond=jnp.asarray(golden["in.w"]),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3),
            golden["out.y"],
            atol=2e-4,
            rtol=1e-3,
        )


class TestMSImportRoundTrip:
    def test_roundtrip_identity(self, tiny_ms):
        """export (inverse map) -> import must reproduce identical params and
        identical model output."""
        model, params = tiny_ms
        sd = synthesize_diffusers_sd(params)
        imported = import_ms_unet_params(sd, layers_per_block=1, n_levels=2)

        x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8, 8, 4))
        ctx = jnp.ones((1, 7, 24))
        o1 = model.apply(
            params, x, jnp.array([500]), ctx, timestep_cond=jnp.ones((1, 8))
        )
        o2 = model.apply(
            {"params": imported}, x, jnp.array([500]), ctx,
            timestep_cond=jnp.ones((1, 8)),
        )
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


class TestMSPipeline:
    def test_smoke(self, tiny_ms):
        from t2v_turbo_tpu.diffusion import DiffusionSchedule
        from t2v_turbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig
        from t2v_turbo_tpu.pipelines.ms import T2VTurboMSPipeline

        model, params = tiny_ms
        vae = AutoencoderKL(cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
        vp = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        tcfg = CLIPTextConfig(
            vocab_size=50, width=24, heads=4, layers=2, context_length=8,
            penultimate=False,
        )
        text = CLIPTextModel(cfg=tcfg)
        tp = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))

        class Tok:
            def __call__(self, prompts):
                if isinstance(prompts, str):
                    prompts = [prompts]
                return np.ones((len(prompts), 8), np.int32)

        pipe = T2VTurboMSPipeline(
            unet=model,
            unet_params=params,
            vae=vae,
            vae_params=vp,
            text_model=text,
            text_params=tp,
            tokenizer=Tok(),
            schedule=DiffusionSchedule.create(),
            vae_scale=2,
            w_embedding_dim=8,
            dtype=jnp.float32,
        )
        video = pipe(
            prompt="a cat", height=8, width=8, frames=4, num_inference_steps=2,
            key=jax.random.PRNGKey(0),
        )
        assert video.shape == (1, 4, 8, 8, 3)
        assert np.isfinite(np.asarray(video)).all()
