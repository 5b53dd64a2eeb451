"""Tests: ip_resampler parity vs reference torch, and the HF CLIP importer
validated against transformers' CLIPModel (installed here)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from t2v_turbo_tpu.models.ip_resampler import (  # noqa: E402
    ImageProjModel,
    PerceiverAttention,
    Resampler,
)


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


class TestIPResamplerParity:
    def test_image_proj_model(self):
        from lvdm.modules.encoders.ip_resampler import ImageProjModel as Ref

        torch.manual_seed(0)
        ref = Ref(cross_attention_dim=32, clip_embeddings_dim=24,
                  clip_extra_context_tokens=4).eval()
        sd = to_np(ref.state_dict())
        params = {
            "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
            "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        }
        model = ImageProjModel(cross_attention_dim=32, clip_extra_context_tokens=4)
        x = np.random.RandomState(0).randn(2, 24).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        out = model.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_resampler(self):
        from lvdm.modules.encoders.ip_resampler import Resampler as Ref

        torch.manual_seed(1)
        kw = dict(dim=32, depth=2, dim_head=8, heads=4, num_queries=3,
                  embedding_dim=24, output_dim=16, ff_mult=2)
        ref = Ref(**kw).eval()
        sd = to_np(ref.state_dict())
        params = {
            "latents": sd["latents"],
            "proj_in": {"kernel": sd["proj_in.weight"].T, "bias": sd["proj_in.bias"]},
            "proj_out": {"kernel": sd["proj_out.weight"].T, "bias": sd["proj_out.bias"]},
            "norm_out": {"scale": sd["norm_out.weight"], "bias": sd["norm_out.bias"]},
        }
        for i in range(2):
            a = f"layers.{i}.0"
            params[f"layers_{i}_attn"] = {
                "norm1": {"scale": sd[f"{a}.norm1.weight"], "bias": sd[f"{a}.norm1.bias"]},
                "norm2": {"scale": sd[f"{a}.norm2.weight"], "bias": sd[f"{a}.norm2.bias"]},
                "to_q": {"kernel": sd[f"{a}.to_q.weight"].T},
                "to_kv": {"kernel": sd[f"{a}.to_kv.weight"].T},
                "to_out": {"kernel": sd[f"{a}.to_out.weight"].T},
            }
            f = f"layers.{i}.1"
            params[f"layers_{i}_ff_norm"] = {
                "scale": sd[f"{f}.0.weight"], "bias": sd[f"{f}.0.bias"]
            }
            params[f"layers_{i}_ff_in"] = {"kernel": sd[f"{f}.1.weight"].T}
            params[f"layers_{i}_ff_out"] = {"kernel": sd[f"{f}.3.weight"].T}

        # latents param: reference shape (1, nq, dim)
        model = Resampler(**{
            "dim": 32, "depth": 2, "dim_head": 8, "heads": 4, "num_queries": 3,
            "embedding_dim": 24, "output_dim": 16, "ff_mult": 2,
        })
        x = np.random.RandomState(2).randn(2, 5, 24).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        out = model.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


class TestHFClipImport:
    def test_against_transformers_clip(self):
        """Build a tiny HF CLIPModel, import its weights, and match both
        pooled text features and image features."""
        from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFText
        from transformers import CLIPVisionConfig as HFVision

        torch.manual_seed(0)
        cfg = CLIPConfig(
            text_config=HFText(
                hidden_size=32, intermediate_size=128, num_attention_heads=4,
                num_hidden_layers=2, max_position_embeddings=12, vocab_size=60,
                hidden_act="gelu", projection_dim=16,
                # HF pools at the eos_token_id position; our pooling uses
                # argmax(ids), identical when eot is the max id (as in CLIP)
                eos_token_id=59,
            ).to_dict(),
            vision_config=HFVision(
                hidden_size=32, intermediate_size=128, num_attention_heads=4,
                num_hidden_layers=2, image_size=28, patch_size=14,
                hidden_act="gelu", projection_dim=16,
            ).to_dict(),
            projection_dim=16,
        )
        hf = CLIPModel(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

        from t2v_turbo_tpu.io.torch_import import import_hf_clip_params
        from t2v_turbo_tpu.models.clip_text import CLIPTextConfig
        from t2v_turbo_tpu.rewards.reward_fn import CLIPTextPooled
        from t2v_turbo_tpu.rewards.vit import ViTConfig, VisionTransformer

        weights = import_hf_clip_params(sd)

        # text: tokens with eot at argmax position
        toks = np.zeros((2, 12), np.int64)
        toks[0, :5] = [1, 7, 8, 9, 59]
        toks[1, :3] = [1, 5, 59]
        with torch.no_grad():
            ref_text = hf.get_text_features(input_ids=torch.from_numpy(toks)).numpy()
        text = CLIPTextPooled(
            cfg=CLIPTextConfig(vocab_size=60, width=32, heads=4, layers=2,
                               context_length=12, penultimate=False),
            proj_dim=16,
        )
        out_t = text.apply(
            {"params": weights["text"]}, jnp.asarray(toks.astype(np.int32))
        )
        np.testing.assert_allclose(np.asarray(out_t), ref_text, atol=2e-5)

        # vision
        px = np.random.RandomState(1).randn(2, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            ref_img = hf.get_image_features(pixel_values=torch.from_numpy(px)).numpy()
        vit = VisionTransformer(
            cfg=ViTConfig(image_size=28, patch_size=14, width=32, layers=2,
                          heads=4, output_dim=16)
        )
        out_v = vit.apply(
            {"params": weights["visual"]}, jnp.asarray(px.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(np.asarray(out_v), ref_img, atol=2e-5)
