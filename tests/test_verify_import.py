"""Dry-run of apps/verify_import.py on SYNTHETIC checkpoints — the
one-command real-weight verification path is proven runnable before any
real VideoCrafter2/T2V-Turbo weights exist in this environment.

The synthetic model.ckpt is assembled from the committed tiny torch goldens
(tests/goldens/vc2_{unet,vae}_tiny.npz — real reference-module state dicts)
plus a schema-faithful tiny open_clip text tower, EMA shadows, and schedule
buffers, so every branch of the verifier (prefix split, coverage with
ignorables, UNet roundtrip, forward smoke) runs against the real key layout.
Match: reference utils/common_utils.py:399-411 (strict load),
:322-387 (validation renders)."""

import numpy as np
import pytest

import goldens
from t2v_turbo_tpu.apps.verify_import import TrackingSD, verify_ms, verify_vc2
from t2v_turbo_tpu.config import VC2ModelSpec
from t2v_turbo_tpu.models.clip_text import CLIPTextConfig
from t2v_turbo_tpu.models.unet_vc2 import UNetConfig
from t2v_turbo_tpu.models.vae import VAEConfig

W, HEADS, LAYERS = 16, 2, 3

TINY_UNET_CFG = dict(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(2, 1),
    channel_mult=(1, 2),
    num_head_channels=16,
    context_dim=24,
    temporal_length=4,
    time_cond_proj_dim=8,
)
TINY_VAE_CFG = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)


def _synth_clip_sd(rng):
    """Schema-faithful tiny open_clip text tower state dict."""
    sd = {
        "token_embedding.weight": rng.randn(49408, W),
        "positional_embedding": rng.randn(77, W),
        "ln_final.weight": rng.randn(W),
        "ln_final.bias": rng.randn(W),
        "attn_mask": np.triu(np.full((77, 77), -np.inf), 1),  # buffer
        "text_projection": rng.randn(W, W),  # pooled head, unused
        "logit_scale": np.asarray(2.6593),
    }
    for i in range(LAYERS):
        rp = f"transformer.resblocks.{i}"
        sd.update({
            f"{rp}.ln_1.weight": rng.randn(W), f"{rp}.ln_1.bias": rng.randn(W),
            f"{rp}.ln_2.weight": rng.randn(W), f"{rp}.ln_2.bias": rng.randn(W),
            f"{rp}.attn.in_proj_weight": rng.randn(3 * W, W),
            f"{rp}.attn.in_proj_bias": rng.randn(3 * W),
            f"{rp}.attn.out_proj.weight": rng.randn(W, W),
            f"{rp}.attn.out_proj.bias": rng.randn(W),
            f"{rp}.mlp.c_fc.weight": rng.randn(4 * W, W),
            f"{rp}.mlp.c_fc.bias": rng.randn(4 * W),
            f"{rp}.mlp.c_proj.weight": rng.randn(W, 4 * W),
            f"{rp}.mlp.c_proj.bias": rng.randn(4 * W)[:W],
        })
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


@pytest.fixture(scope="module")
def synth_ckpt(tmp_path_factory):
    torch = pytest.importorskip("torch")
    unet_g = goldens.load("vc2_unet_tiny")
    vae_g = goldens.load("vc2_vae_tiny")
    assert unet_g is not None and vae_g is not None
    rng = np.random.RandomState(0)
    sd = {}
    for k, v in goldens.subdict(unet_g, "sd").items():
        sd["model.diffusion_model." + k] = v
    for k, v in goldens.subdict(vae_g, "sd").items():
        sd["first_stage_model." + k] = v
    for k, v in _synth_clip_sd(rng).items():
        sd["cond_stage_model.model." + k] = v
    # top-level keys a real LatentDiffusion ckpt carries that importers skip
    sd["betas"] = np.linspace(1e-4, 2e-2, 1000).astype(np.float32)
    sd["alphas_cumprod"] = np.cumprod(1 - sd["betas"])
    sd["model_ema.decay"] = np.asarray(0.9999, np.float32)
    sd["scale_arr"] = np.ones((1000,), np.float32)
    sd["logvar"] = np.zeros((1000,), np.float32)
    path = tmp_path_factory.mktemp("ckpt") / "model.ckpt"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        str(path),
    )
    return str(path)


def _tiny_spec():
    return VC2ModelSpec(
        unet=UNetConfig(**TINY_UNET_CFG),
        vae=VAEConfig(**TINY_VAE_CFG),
        schedule_kwargs={},
    )


class TestVerifyVC2DryRun:
    def test_clean_checkpoint_passes(self, synth_ckpt):
        report = verify_vc2(
            synth_ckpt, _tiny_spec(), clip_layers=LAYERS,
            text_cfg=CLIPTextConfig(width=W, heads=HEADS, layers=LAYERS),
            smoke_shape=(4, 64, 64),
        )
        assert report["ok"], {
            k: v for k, v in report.items()
            if k in ("unet", "vae", "text", "top_level_gaps")
        }
        # layer 1: every tensor of every family consumed (or known-ignorable)
        for fam in ("unet", "vae", "text"):
            assert report[fam]["ok"], report[fam]
            assert not report[fam]["unconsumed_gaps"]
        assert report["unet"]["keys_consumed"] == report["unet"]["keys_total"]
        # the dropped penultimate block + buffers are expected, not gaps
        assert report["text"]["unconsumed_expected"] > 0
        assert report["top_level_gaps"] == []
        # layer 2: roundtrip through io/torch_export is exact
        rt = report["unet"]["roundtrip"]
        assert rt["ok"] and rt["max_abs_delta"] == 0.0
        assert rt["keys_compared"] == report["unet"]["keys_total"]
        assert not rt["missing_from_export"]
        # layer 3: all forwards finite
        assert report["forward"]["ok"]
        for fam in ("unet", "vae", "text"):
            assert report["forward"][fam]["finite"]

    def test_unmapped_key_fails(self, synth_ckpt, tmp_path):
        torch = pytest.importorskip("torch")
        obj = torch.load(synth_ckpt, map_location="cpu", weights_only=False)
        obj["state_dict"]["model.diffusion_model.bogus.weight"] = (
            torch.zeros(3, 3)
        )
        bad = tmp_path / "bad.ckpt"
        torch.save(obj, str(bad))
        report = verify_vc2(
            str(bad), _tiny_spec(), clip_layers=LAYERS,
            text_cfg=CLIPTextConfig(width=W, heads=HEADS, layers=LAYERS),
            smoke_shape=(4, 64, 64),
        )
        assert not report["ok"]
        assert "bogus.weight" in report["unet"]["unconsumed_gaps"]

    def test_unknown_top_level_prefix_fails(self, synth_ckpt, tmp_path):
        torch = pytest.importorskip("torch")
        obj = torch.load(synth_ckpt, map_location="cpu", weights_only=False)
        obj["state_dict"]["mystery_tower.weight"] = torch.zeros(2)
        bad = tmp_path / "bad2.ckpt"
        torch.save(obj, str(bad))
        report = verify_vc2(
            str(bad), _tiny_spec(), clip_layers=LAYERS,
            text_cfg=CLIPTextConfig(width=W, heads=HEADS, layers=LAYERS),
            smoke_shape=(4, 64, 64),
        )
        assert not report["ok"]
        assert "mystery_tower.weight" in report["top_level_gaps"]


class TestTrackingSD:
    def test_records_consumption(self):
        t = TrackingSD({"a": 1, "b": 2, "ema.c": 3})
        _ = t["a"]
        cov = t.coverage(ignorable=(r"^ema\.",))
        assert cov["keys_consumed"] == 1
        assert cov["unconsumed_gaps"] == ["b"]
        assert cov["unconsumed_expected"] == 1
        assert not cov["ok"]
        _ = t["b"]
        assert t.coverage(ignorable=(r"^ema\.",))["ok"]
