"""Numerical parity of the ViCLIP rebuild vs the reference torch
implementation (viclip/viclip_vision.py, viclip_text.py), run read-only at
B/16 scale with random weights."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# viclip pulls in ftfy/timm/pkg_resources, absent here; stub them with valid
# module specs (see conftest.stub_module)
import torch.nn as _tnn  # noqa: E402
import packaging  # noqa: E402
import packaging.version  # noqa: E402,F401

from conftest import stub_module  # noqa: E402

stub_module("ftfy", fix_text=lambda s: s)
stub_module("timm")
stub_module("timm.models")
stub_module("timm.models.layers", DropPath=lambda *a, **k: _tnn.Identity())
stub_module("timm.models.registry", register_model=lambda f: f)
stub_module("pkg_resources", packaging=packaging)

from t2v_turbo_tpu.io.torch_import import (  # noqa: E402
    import_clip_text_pooled_params,
    import_viclip_params,
)
from t2v_turbo_tpu.models.clip_text import CLIPTextConfig  # noqa: E402
from t2v_turbo_tpu.rewards.reward_fn import CLIPTextPooled  # noqa: E402
from t2v_turbo_tpu.rewards.vit import (  # noqa: E402
    VideoViTConfig,
    VideoVisionTransformer,
)


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


class TestViCLIPVisionParity:
    def test_video_tower(self):
        from viclip.viclip_vision import clip_joint_b16

        torch.manual_seed(0)
        ref = clip_joint_b16(pretrained=False, num_frames=4).eval()
        # reference viclip_vision.py:133 creates `proj` with torch.empty —
        # UNINITIALIZED memory. Freshly-mapped pages are usually zero, but
        # when the heap gets reused the garbage can contain denormals that
        # torch (FTZ via mkldnn) and XLA treat differently -> flaky parity.
        # Give it a real value like the text test does for its empty params.
        with torch.no_grad():
            ref.proj.normal_(0, 0.02)
        sd = {f"vision_encoder.{k}": v for k, v in to_np(ref.state_dict()).items()}
        params = import_viclip_params(sd | {"temp": np.float32(0.01)})["visual"]

        cfg = VideoViTConfig(
            image_size=224, patch_size=16, width=768, layers=12, heads=12,
            output_dim=512, num_frames=4, quick_gelu=True,
        )
        model = VideoVisionTransformer(cfg=cfg)

        rng = np.random.RandomState(0)
        # torch input: (B, C, T, H, W); ours: (B, T, H, W, C)
        x = rng.randn(1, 3, 4, 224, 224).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
        out = jax.jit(model.apply)(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1))
        )
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=1e-3)


class TestViCLIPTextParity:
    def test_text_tower_pooled(self):
        from viclip.viclip_text import clip_text_b16

        torch.manual_seed(1)
        ref = clip_text_b16(pretrained=False).eval()
        # CLIP_TEXT leaves parameters uninitialized (empty) for pos/proj;
        # fill them deterministically
        with torch.no_grad():
            ref.positional_embedding.normal_(0, 0.01)
            ref.text_projection.normal_(0, 0.02)
        sd = to_np(ref.state_dict())
        params = import_clip_text_pooled_params(sd, layers=12)

        cfg = CLIPTextConfig(
            vocab_size=49408, width=512, heads=8, layers=12, context_length=77,
            penultimate=False, quick_gelu=True,
        )
        model = CLIPTextPooled(cfg=cfg, proj_dim=512)

        toks = np.zeros((2, 77), np.int64)
        toks[0, :5] = [49406, 320, 2368, 49407, 0]
        toks[1, :4] = [49406, 320, 49407, 0]
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(toks)).numpy()
        out = jax.jit(model.apply)({"params": params}, jnp.asarray(toks.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)
