"""MS backbone multi-file component loading (reference app_ms.py:181-227):
HF CLIPTextModel numerical parity, diffusers-VAE key conversion, and the
directory loader end-to-end."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.io.torch_import import (
    import_diffusers_vae_params,
    import_hf_clip_text_model_params,
    import_vae_params,
)
from t2v_turbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel


class TestHFCLIPTextParity:
    """Numerical oracle: transformers CLIPTextModel (the exact class the
    reference loads, app_ms.py:184-186) on a tiny random config."""

    @pytest.fixture(scope="class")
    def hf_pair(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel as HFText

        torch.manual_seed(0)
        hf = HFText(
            HFCfg(
                vocab_size=64,
                hidden_size=32,
                intermediate_size=128,
                num_hidden_layers=2,
                num_attention_heads=2,
                max_position_embeddings=16,
                hidden_act="quick_gelu",
            )
        ).eval()
        return torch, hf

    def test_last_hidden_state_parity(self, hf_pair):
        torch, hf = hf_pair
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params, cfg_kw = import_hf_clip_text_model_params(sd, quick_gelu=True)
        # heads can't be inferred from width for the tiny config; override
        cfg_kw["heads"] = 2
        model = CLIPTextModel(cfg=CLIPTextConfig(**cfg_kw))

        rng = np.random.RandomState(0)
        tokens = rng.randint(0, 64, size=(2, 16)).astype(np.int64)
        with torch.no_grad():
            # HF applies a causal mask internally, like our tower
            ref = hf(input_ids=torch.from_numpy(tokens)).last_hidden_state
        out = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4
        )


def _orig_to_diffusers_names(sd, n_levels):
    """Independent inverse rename (orig SD layout -> diffusers layout) used
    to synthesize a diffusers-layout state dict for converter testing
    (diffusers itself is not installed in this environment)."""
    import re

    out = {}
    for k, v in sd.items():
        nk = k
        nk = re.sub(r"\.down\.(\d+)\.block\.(\d+)\.", r".down_blocks.\1.resnets.\2.", nk)
        nk = re.sub(
            r"\.down\.(\d+)\.downsample\.conv\.", r".down_blocks.\1.downsamplers.0.conv.", nk
        )
        m = re.match(r"decoder\.up\.(\d+)\.(.+)", nk)
        if m:
            l, rest = int(m.group(1)), m.group(2)
            rest = re.sub(r"^block\.(\d+)\.", r"resnets.\1.", rest)
            rest = re.sub(r"^upsample\.conv\.", "upsamplers.0.conv.", rest)
            nk = f"decoder.up_blocks.{n_levels - 1 - l}.{rest}"
        nk = nk.replace(".mid.block_1.", ".mid_block.resnets.0.")
        nk = nk.replace(".mid.block_2.", ".mid_block.resnets.1.")
        nk = nk.replace(".mid.attn_1.norm.", ".mid_block.attentions.0.group_norm.")
        nk = nk.replace(".mid.attn_1.q.", ".mid_block.attentions.0.to_q.")
        nk = nk.replace(".mid.attn_1.k.", ".mid_block.attentions.0.to_k.")
        nk = nk.replace(".mid.attn_1.v.", ".mid_block.attentions.0.to_v.")
        nk = nk.replace(".mid.attn_1.proj_out.", ".mid_block.attentions.0.to_out.0.")
        nk = nk.replace("nin_shortcut", "conv_shortcut")
        nk = nk.replace("norm_out", "conv_norm_out")
        out[nk] = v
    return out


class TestDiffusersVAEConversion:
    def test_matches_orig_import(self):
        """import_diffusers_vae_params(diffusers-named sd) must produce the
        identical parameter tree as import_vae_params(orig sd). The source
        sd is the committed VAE golden (orig layout, tiny 2-level)."""
        import goldens

        g = goldens.load("vc2_vae_tiny")
        if g is None:
            pytest.skip("vc2_vae_tiny golden not present")
        orig_sd = goldens.subdict(g, "sd")
        # diffusers stores the mid-attention projections as Linear (O, I);
        # squeeze the orig 1x1-conv shapes when renaming
        diff_sd = {}
        for k, v in _orig_to_diffusers_names(orig_sd, n_levels=2).items():
            if ".attentions.0.to_" in k and k.endswith(".weight") and v.ndim == 4:
                v = v[:, :, 0, 0]
            diff_sd[k] = v

        want = import_vae_params(orig_sd, n_levels=2, n_res=1)
        got = import_diffusers_vae_params(diff_sd)  # counts inferred
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
        assert [p for p, _ in flat_w] == [p for p, _ in flat_g]
        for (pw, w), (_, gg) in zip(flat_w, flat_g):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(gg), err_msg=str(pw))


class TestMSDirectoryLoader:
    def test_load_ms_components_smoke(self, tmp_path):
        """Assemble a tiny diffusers-layout directory (unet/ vae/
        text_encoder/) and load every component through load_ms_components,
        mirroring reference app_ms.py:181-227."""
        torch = pytest.importorskip("torch")
        import goldens
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel as HFText

        from t2v_turbo_tpu.io.torch_import import load_ms_components

        g = goldens.load("vc2_vae_tiny")
        if g is None:
            pytest.skip("vc2_vae_tiny golden not present")

        # vae/ in diffusers naming
        orig_sd = goldens.subdict(g, "sd")
        diff_sd = {}
        for k, v in _orig_to_diffusers_names(orig_sd, n_levels=2).items():
            if ".attentions.0.to_" in k and k.endswith(".weight") and v.ndim == 4:
                v = v[:, :, 0, 0]
            diff_sd[k] = v
        os.makedirs(tmp_path / "vae")
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in diff_sd.items()},
            tmp_path / "vae" / "diffusion_pytorch_model.bin",
        )

        # text_encoder/ with config.json
        torch.manual_seed(1)
        hf = HFText(
            HFCfg(
                vocab_size=64, hidden_size=32, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=2,
                max_position_embeddings=16, hidden_act="gelu",
            )
        ).eval()
        os.makedirs(tmp_path / "text_encoder")
        torch.save(hf.state_dict(), tmp_path / "text_encoder" / "pytorch_model.bin")
        json.dump(
            {"hidden_act": "gelu"},
            open(tmp_path / "text_encoder" / "config.json", "w"),
        )

        # unet/ — diffusers-layout state dict synthesized by the inverse
        # mapping (same fixture strategy as test_unet_ms.py; diffusers is
        # not installed in this environment)
        from test_unet_ms import synthesize_diffusers_sd, tiny_cfg

        from t2v_turbo_tpu.models.unet_ms import MSUNet3DConditionModel

        ms = MSUNet3DConditionModel(cfg=tiny_cfg())
        ms_params = ms.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 4, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 24)),
            timestep_cond=jnp.zeros((1, 8)),
        )
        unet_sd = synthesize_diffusers_sd(ms_params)
        os.makedirs(tmp_path / "unet")
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in unet_sd.items()},
            tmp_path / "unet" / "diffusion_pytorch_model.bin",
        )

        comps = load_ms_components(
            str(tmp_path),
            unet_kwargs=dict(layers_per_block=1, n_levels=2),
        )
        assert comps["text_cfg"]["quick_gelu"] is False
        assert comps["text_cfg"]["layers"] == 2
        assert "encoder" in comps["vae"] and "decoder" in comps["vae"]
        assert "conv_in" in comps["unet"]
        # text params drive the jax tower
        cfg_kw = dict(comps["text_cfg"], heads=2)
        model = CLIPTextModel(cfg=CLIPTextConfig(**cfg_kw))
        out = model.apply(
            {"params": comps["text"]}, jnp.zeros((1, 16), jnp.int32)
        )
        assert out.shape == (1, 16, 32)
