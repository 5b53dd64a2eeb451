"""BLIP tower parity vs transformers oracles + ImageReward model smoke."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t2v_turbo_tpu.rewards.blip import (  # noqa: E402
    BertConfig,
    BertCrossEncoder,
    BlipViT,
    BlipViTConfig,
    build_image_reward_blip,
)


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


class TestBlipViTParity:
    def test_vs_transformers_blip_vision(self):
        from transformers import BlipVisionConfig, BlipVisionModel

        torch.manual_seed(0)
        hcfg = BlipVisionConfig(
            hidden_size=32, intermediate_size=128, num_attention_heads=4,
            num_hidden_layers=2, image_size=32, patch_size=16,
        )
        ref = BlipVisionModel(hcfg).eval()
        sd = to_np(ref.state_dict())

        params = {
            "patch_embedding": {
                "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0),
                "bias": sd["embeddings.patch_embedding.bias"],
            },
            "class_embedding": sd["embeddings.class_embedding"],
            "position_embedding": sd["embeddings.position_embedding"],
            "post_layernorm": {
                "scale": sd["post_layernorm.weight"],
                "bias": sd["post_layernorm.bias"],
            },
        }
        for i in range(2):
            rp = f"encoder.layers.{i}"
            params[f"layers_{i}"] = {
                "layer_norm1": {"scale": sd[f"{rp}.layer_norm1.weight"],
                                "bias": sd[f"{rp}.layer_norm1.bias"]},
                "layer_norm2": {"scale": sd[f"{rp}.layer_norm2.weight"],
                                "bias": sd[f"{rp}.layer_norm2.bias"]},
                "qkv": {"kernel": sd[f"{rp}.self_attn.qkv.weight"].T,
                        "bias": sd[f"{rp}.self_attn.qkv.bias"]},
                "projection": {"kernel": sd[f"{rp}.self_attn.projection.weight"].T,
                               "bias": sd[f"{rp}.self_attn.projection.bias"]},
                "fc1": {"kernel": sd[f"{rp}.mlp.fc1.weight"].T,
                        "bias": sd[f"{rp}.mlp.fc1.bias"]},
                "fc2": {"kernel": sd[f"{rp}.mlp.fc2.weight"].T,
                        "bias": sd[f"{rp}.mlp.fc2.bias"]},
            }

        model = BlipViT(cfg=BlipViTConfig(image_size=32, patch_size=16, width=32,
                                          layers=2, heads=4))
        px = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(px)).last_hidden_state.numpy()
        out = model.apply({"params": params}, jnp.asarray(px.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), expected, atol=3e-5)


class TestBertCrossParity:
    def test_vs_transformers_bert_with_cross(self):
        from transformers import BertConfig as HFBertConfig, BertModel

        # stock transformers BERT only allows cross-attention in (causal)
        # decoder mode, while BLIP's text encoder is bidirectional; so:
        # (a) multi-token bidirectional parity WITHOUT cross-attention,
        # (b) single-token parity WITH cross-attention (causality vacuous).
        torch.manual_seed(1)
        hcfg = HFBertConfig(
            vocab_size=60, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, is_decoder=True,
            add_cross_attention=True, hidden_act="gelu",
        )
        ref = BertModel(hcfg, add_pooling_layer=False).eval()
        hcfg_nc = HFBertConfig(
            vocab_size=60, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16, hidden_act="gelu",
        )
        ref_nc = BertModel(hcfg_nc, add_pooling_layer=False).eval()
        ref_nc.load_state_dict(
            {k: v for k, v in ref.state_dict().items() if "crossattention" not in k},
            strict=True,
        )
        sd = to_np(ref.state_dict())

        params = {
            "word_embeddings": sd["embeddings.word_embeddings.weight"],
            "position_embeddings": sd["embeddings.position_embeddings.weight"],
            "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
            "emb_norm": {"scale": sd["embeddings.LayerNorm.weight"],
                         "bias": sd["embeddings.LayerNorm.bias"]},
        }

        def attn(rp):
            return {
                "query": {"kernel": sd[f"{rp}.self.query.weight"].T,
                          "bias": sd[f"{rp}.self.query.bias"]},
                "key": {"kernel": sd[f"{rp}.self.key.weight"].T,
                        "bias": sd[f"{rp}.self.key.bias"]},
                "value": {"kernel": sd[f"{rp}.self.value.weight"].T,
                          "bias": sd[f"{rp}.self.value.bias"]},
                "output": {
                    "dense": {"kernel": sd[f"{rp}.output.dense.weight"].T,
                              "bias": sd[f"{rp}.output.dense.bias"]},
                    "norm": {"scale": sd[f"{rp}.output.LayerNorm.weight"],
                             "bias": sd[f"{rp}.output.LayerNorm.bias"]},
                },
            }

        for i in range(2):
            rp = f"encoder.layer.{i}"
            params[f"layer_{i}"] = {
                "attention": attn(f"{rp}.attention"),
                "crossattention": attn(f"{rp}.crossattention"),
                "intermediate": {"kernel": sd[f"{rp}.intermediate.dense.weight"].T,
                                 "bias": sd[f"{rp}.intermediate.dense.bias"]},
                "out_dense": {"kernel": sd[f"{rp}.output.dense.weight"].T,
                              "bias": sd[f"{rp}.output.dense.bias"]},
                "out_norm": {"scale": sd[f"{rp}.output.LayerNorm.weight"],
                             "bias": sd[f"{rp}.output.LayerNorm.bias"]},
            }

        cfg = BertConfig(vocab_size=60, hidden=32, layers=2, heads=4,
                         intermediate=64, max_position=16, encoder_width=32)
        model = BertCrossEncoder(cfg=cfg)
        # (a) multi-token bidirectional, no cross
        toks = np.array([[2, 5, 9, 11, 3, 7, 8, 4]], np.int64)
        with torch.no_grad():
            exp_nc = ref_nc(input_ids=torch.from_numpy(toks)).last_hidden_state.numpy()
        out_nc = model.apply(
            {"params": params}, jnp.asarray(toks.astype(np.int32)),
            image_states=None,
        )
        np.testing.assert_allclose(np.asarray(out_nc), exp_nc, atol=3e-5)

        # (b) single token with cross-attention
        tok1 = np.array([[2]], np.int64)
        img_states = np.random.RandomState(2).randn(1, 4, 32).astype(np.float32)
        with torch.no_grad():
            expected = ref(
                input_ids=torch.from_numpy(tok1),
                encoder_hidden_states=torch.from_numpy(img_states),
            ).last_hidden_state.numpy()
        out = model.apply(
            {"params": params}, jnp.asarray(tok1.astype(np.int32)),
            image_states=jnp.asarray(img_states),
        )
        np.testing.assert_allclose(np.asarray(out), expected, atol=3e-5)


class TestImageRewardModel:
    def test_score_and_grad(self):
        model = build_image_reward_blip(
            vit_cfg=BlipViTConfig(image_size=32, patch_size=16, width=32,
                                  layers=2, heads=4),
            bert_cfg=BertConfig(vocab_size=60, hidden=24, layers=2, heads=4,
                                intermediate=48, max_position=16,
                                encoder_width=32),
            head_dims=(16, 8, 1),
        )
        images = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)), 0, 1)
        toks = jnp.asarray(np.array([[2, 5, 3, 0], [2, 9, 3, 0]], np.int32))
        scores = model.score(images, toks)
        assert scores.shape == (2,)
        assert np.isfinite(np.asarray(scores)).all()
        g = jax.jit(jax.grad(lambda im: -model.score(im, toks).mean()))(images)
        assert float(jnp.abs(g).sum()) > 0
