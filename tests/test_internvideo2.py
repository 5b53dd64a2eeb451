"""InternVideo2 tower tests: block/pooling parity vs the reference torch
implementation (non-flash path, run read-only with stubs), plus reward-model
smoke and importer round trip."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# stub timm + flash_attn before importing the reference module
import torch.nn as _tnn  # noqa: E402

from conftest import stub_module  # noqa: E402

stub_module("timm")
stub_module("timm.models")
stub_module(
    "timm.models.layers",
    DropPath=lambda *a, **k: _tnn.Identity(),
    to_2tuple=lambda x: x if isinstance(x, tuple) else (x, x),
    trunc_normal_=lambda *a, **k: None,
)
stub_module("timm.models.registry", register_model=lambda f: f)
for name in ("flash_attn", "flash_attn.modules", "flash_attn.modules.mlp",
             "flash_attn.ops", "flash_attn.ops.rms_norm"):
    stub_module(name)
stub_module("flash_attn.flash_attn_interface",
            flash_attn_varlen_qkvpacked_func=None)
stub_module("flash_attn.bert_padding", unpad_input=None, pad_input=None)


def _load_iv2_module():
    """Import the reference internvideo2.py as a standalone package member,
    bypassing intern_vid2's heavy package __init__ chain (torchvision, llama,
    criterions...)."""
    import importlib.util

    if "iv2pkg.internvideo2" in sys.modules:
        return sys.modules["iv2pkg.internvideo2"]
    pkg_dir = f"{REF}/intern_vid2/models/backbones/internvideo2"
    pkg = types.ModuleType("iv2pkg")
    pkg.__path__ = [pkg_dir]
    sys.modules["iv2pkg"] = pkg
    spec = importlib.util.spec_from_file_location(
        "iv2pkg.internvideo2", pkg_dir + "/internvideo2.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["iv2pkg.internvideo2"] = mod
    spec.loader.exec_module(mod)
    return mod

from t2v_turbo_tpu.rewards.internvideo2 import (  # noqa: E402
    AttentionPooling,
    IV2Block,
    IV2VisionConfig,
    RMSNorm,
    build_internvideo2_reward,
)
from t2v_turbo_tpu.rewards.blip import BertConfig  # noqa: E402


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


TINY = IV2VisionConfig(
    img_size=28, patch_size=14, width=32, depth=1, heads=4, mlp_hidden=48,
    num_frames=2, clip_embed_dim=16, attn_pool_heads=4,
)


class TestIV2BlockParity:
    def test_block(self):
        from functools import partial

        iv2 = _load_iv2_module()
        Block, RefRMSNorm = iv2.Block, iv2.RMSNorm

        torch.manual_seed(0)
        ref = Block(
            dim=32, num_heads=4, mlp_ratio=1.5, qkv_bias=False,
            init_values=1e-5, norm_layer=partial(RefRMSNorm, eps=1e-6),
            use_flash_attn=False, use_fused_mlp=False, qk_normalization=True,
            use_fused_rmsnorm=False,
        ).eval()
        sd = to_np(ref.state_dict())
        params = {
            "norm1": {"weight": sd["norm1.weight"]},
            "norm2": {"weight": sd["norm2.weight"]},
            "qkv": {"kernel": sd["attn.qkv.weight"].T},
            "q_norm": {"weight": sd["attn.q_norm.weight"]},
            "k_norm": {"weight": sd["attn.k_norm.weight"]},
            "proj": {"kernel": sd["attn.proj.weight"].T, "bias": sd["attn.proj.bias"]},
            "fc1": {"kernel": sd["mlp.fc1.weight"].T, "bias": sd["mlp.fc1.bias"]},
            "fc2": {"kernel": sd["mlp.fc2.weight"].T, "bias": sd["mlp.fc2.bias"]},
            "ls1": {"gamma": sd["ls1.gamma"]},
            "ls2": {"gamma": sd["ls2.gamma"]},
        }
        cfg = IV2VisionConfig(width=32, heads=4, mlp_hidden=48)
        model = IV2Block(cfg)
        x = np.random.RandomState(0).randn(2, 9, 32).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        out = model.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), expected, atol=3e-5)

    def test_attention_pooling(self):
        AttentionPoolingBlock = _load_iv2_module().AttentionPoolingBlock

        torch.manual_seed(1)
        ref = AttentionPoolingBlock(
            dim=32, num_heads=4, qkv_bias=True, qk_scale=None, drop=0.0,
            attn_drop=0.0, norm_layer=torch.nn.LayerNorm, out_dim=16,
        ).eval()
        sd = to_np(ref.state_dict())
        params = {
            "norm1_q": {"scale": sd["norm1_q.weight"], "bias": sd["norm1_q.bias"]},
            "norm1_k": {"scale": sd["norm1_k.weight"], "bias": sd["norm1_k.bias"]},
            "norm1_v": {"scale": sd["norm1_v.weight"], "bias": sd["norm1_v.bias"]},
            "q": {"kernel": sd["cross_attn.q.weight"].T, "bias": sd["cross_attn.q_bias"]},
            "k": {"kernel": sd["cross_attn.k.weight"].T, "bias": sd["cross_attn.k_bias"]},
            "v": {"kernel": sd["cross_attn.v.weight"].T, "bias": sd["cross_attn.v_bias"]},
            "proj": {"kernel": sd["cross_attn.proj.weight"].T,
                     "bias": sd["cross_attn.proj.bias"]},
        }
        model = AttentionPooling(dim=32, heads=4, out_dim=16)
        x = np.random.RandomState(2).randn(2, 9, 32).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        out = model.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), expected, atol=3e-5)


class TestIV2RewardModel:
    def test_score_and_grad(self):
        model = build_internvideo2_reward(
            vision_cfg=TINY,
            text_cfg=BertConfig(vocab_size=60, hidden=24, layers=1, heads=4,
                                intermediate=48, max_position=16,
                                cross_attention=False, encoder_width=24),
            embed_dim=8,
        )
        vids = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 28, 28, 3)), 0, 1
        )
        toks = jnp.asarray(np.array([[2, 5, 3, 0], [2, 9, 3, 0]], np.int32))
        feats = model.encode_texts_tokens(toks)
        scores = model.score(vids, feats)
        assert scores.shape == (2,)
        assert (np.abs(np.asarray(scores)) <= 1 + 1e-5).all()
        g = jax.jit(jax.grad(lambda v: -model.score(v, feats).mean()))(vids)
        assert float(jnp.abs(g).sum()) > 0

    def test_factory(self):
        from t2v_turbo_tpu.rewards.reward_fn import get_reward_fn

        rm = get_reward_fn(
            "vi_clip2",
            vision_cfg=TINY,
            text_cfg=BertConfig(vocab_size=60, hidden=24, layers=1, heads=4,
                                intermediate=48, max_position=16,
                                cross_attention=False, encoder_width=24),
            embed_dim=8,
        )
        assert rm is not None
