"""Numerical parity: reference torch modules vs JAX rebuild with imported
weights, on tiny configs.

The reference implementation at /root/reference is imported read-only and run
on CPU to produce oracles; its randomly-initialized state dicts are mapped
through t2v_turbo_tpu.io.torch_import and must reproduce the same outputs
(layout-transposed) to float tolerance. This is the layer-by-layer parity
strategy SURVEY.md §7 calls the only way to guarantee reference-matching
outputs.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# the reference's utils/basics modules import heavy IO deps not present here;
# stub them (only reflective-config and video-save helpers need them)
from conftest import stub_module  # noqa: E402

for _name in ("torchvision", "torchvision.io", "torchvision.utils", "cv2"):
    stub_module(_name)

from t2v_turbo_tpu.io.torch_import import (  # noqa: E402
    import_unet_params,
    import_vae_params,
)
from t2v_turbo_tpu.models import UNetConfig, UNetModel  # noqa: E402
from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.fixture(scope="module")
def ref_unet_pair():
    """Tiny reference UNet + matching JAX model/params."""
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    torch.manual_seed(0)
    kw = dict(
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=[2, 1],
        channel_mult=[1, 2],
        num_head_channels=16,
        transformer_depth=1,
        context_dim=24,
        use_linear=True,
        use_checkpoint=False,
        temporal_conv=True,
        temporal_attention=True,
        temporal_selfatt_only=True,
        use_relative_position=False,
        use_causal_attention=False,
        temporal_length=4,
        addition_attention=True,
        fps_cond=True,
        time_cond_proj_dim=8,
    )
    ref = RefUNet(**kw).eval()
    cfg = UNetConfig(
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
    params = import_unet_params(to_np(ref.state_dict()), cfg)
    model = UNetModel(cfg=cfg)
    return ref, model, params


class TestUNetParity:
    def test_forward_parity(self, ref_unet_pair):
        ref, model, params = ref_unet_pair
        rng = np.random.RandomState(0)
        b, c, t, h, w = 1, 4, 4, 8, 8
        x = rng.randn(b, c, t, h, w).astype(np.float32)
        ctx = rng.randn(b, 7, 24).astype(np.float32)
        ts = np.array([314], dtype=np.int64)
        wcond = rng.randn(b, 8).astype(np.float32)

        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(x),
                torch.from_numpy(ts),
                context=torch.from_numpy(ctx),
                fps=16,
                timestep_cond=torch.from_numpy(wcond),
            ).numpy()

        x_jax = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # BCTHW -> BTHWC
        out = model.apply(
            {"params": params},
            x_jax,
            jnp.asarray(ts),
            jnp.asarray(ctx),
            fps=jnp.asarray([16.0]),
            timestep_cond=jnp.asarray(wcond),
        )
        out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)  # back to BCTHW
        np.testing.assert_allclose(out_np, ref_out, atol=2e-4, rtol=1e-3)

    def test_parity_multiple_timesteps(self, ref_unet_pair):
        ref, model, params = ref_unet_pair
        rng = np.random.RandomState(1)
        x = rng.randn(2, 4, 4, 8, 8).astype(np.float32)
        ctx = rng.randn(2, 7, 24).astype(np.float32)
        ts = np.array([0, 999], dtype=np.int64)
        wcond = rng.randn(2, 8).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(x),
                torch.from_numpy(ts),
                context=torch.from_numpy(ctx),
                fps=24,
                timestep_cond=torch.from_numpy(wcond),
            ).numpy()
        out = model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
            jnp.asarray(ts),
            jnp.asarray(ctx),
            fps=jnp.asarray([24.0, 24.0]),
            timestep_cond=jnp.asarray(wcond),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3), ref_out, atol=2e-4, rtol=1e-3
        )


class TestVAEParity:
    @pytest.fixture(scope="class")
    def ref_vae_pair(self):
        from lvdm.modules.networks.ae_modules import Encoder as RefEnc
        from lvdm.modules.networks.ae_modules import Decoder as RefDec

        torch.manual_seed(1)
        dd = dict(
            double_z=True,
            z_channels=4,
            resolution=32,
            in_channels=3,
            out_ch=3,
            ch=32,
            ch_mult=[1, 2],
            num_res_blocks=1,
            attn_resolutions=[],
            dropout=0.0,
        )
        enc = RefEnc(**dd).eval()
        dec = RefDec(**dd).eval()
        sd = {}
        sd.update({f"encoder.{k}": v for k, v in to_np(enc.state_dict()).items()})
        sd.update({f"decoder.{k}": v for k, v in to_np(dec.state_dict()).items()})
        # synthesize 1x1 quant convs with torch for mapping coverage
        qc = torch.nn.Conv2d(8, 8, 1)
        pqc = torch.nn.Conv2d(4, 4, 1)
        sd.update({f"quant_conv.{k}": v for k, v in to_np(qc.state_dict()).items()})
        sd.update(
            {f"post_quant_conv.{k}": v for k, v in to_np(pqc.state_dict()).items()}
        )
        cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
        params = import_vae_params(sd, n_levels=2, n_res=1)
        model = AutoencoderKL(cfg=cfg)
        return enc, dec, qc, pqc, model, params

    def test_encode_parity(self, ref_vae_pair):
        enc, dec, qc, pqc, model, params = ref_vae_pair
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            moments = qc(enc(torch.from_numpy(x))).numpy()
        mean_ref, logvar_ref = np.split(moments, 2, axis=1)
        mean, logvar = model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            method=model.encode,
        )
        np.testing.assert_allclose(
            np.asarray(mean).transpose(0, 3, 1, 2), mean_ref, atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(logvar).transpose(0, 3, 1, 2),
            np.clip(logvar_ref, -30, 20),
            atol=2e-4,
            rtol=1e-3,
        )

    def test_decode_parity(self, ref_vae_pair):
        enc, dec, qc, pqc, model, params = ref_vae_pair
        rng = np.random.RandomState(3)
        z = rng.randn(2, 4, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref_out = dec(pqc(torch.from_numpy(z))).numpy()
        out = model.apply(
            {"params": params},
            jnp.asarray(z.transpose(0, 2, 3, 1)),
            method=model.decode,
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=3e-4, rtol=1e-3
        )


class TestCLIPAttentionPacking:
    """Validate the packed-QKV convention against torch MultiheadAttention
    (the open_clip text tower's attention core)."""

    def test_mha_parity(self):
        from t2v_turbo_tpu.ops.attention import attention_xla

        torch.manual_seed(3)
        width, heads, s, b = 32, 4, 7, 2
        mha = torch.nn.MultiheadAttention(width, heads, batch_first=True).eval()
        x = torch.randn(b, s, width)
        mask = torch.full((s, s), float("-inf")).triu(1)
        with torch.no_grad():
            ref_out, _ = mha(x, x, x, attn_mask=mask, need_weights=False)

        w_in = mha.in_proj_weight.detach().numpy()  # (3W, W)
        b_in = mha.in_proj_bias.detach().numpy()
        w_out = mha.out_proj.weight.detach().numpy()
        b_out = mha.out_proj.bias.detach().numpy()

        xn = x.numpy()
        qkv = xn @ w_in.T + b_in
        q, k, v = np.split(qkv, 3, axis=-1)
        d = width // heads
        sp = lambda t: jnp.asarray(
            t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        )
        out = attention_xla(sp(q), sp(k), sp(v), causal=True)
        out = np.asarray(out).transpose(0, 2, 1, 3).reshape(b, s, width)
        out = out @ w_out.T + b_out
        np.testing.assert_allclose(out, ref_out.numpy(), atol=1e-5)
