"""Numerical parity: reference torch oracles vs JAX rebuild with imported
weights, on tiny configs.

Oracles come from committed golden fixtures (tests/goldens/*.npz: tiny
random torch state_dicts + inputs + reference outputs). When a golden is
missing, it is regenerated live from torch + the read-only reference mount
and saved — so the parity contract is reproducible, but running the suite
needs neither torch nor /root/reference once goldens exist. This is the
layer-by-layer parity strategy SURVEY.md §7 calls the only way to guarantee
reference-matching outputs.
"""

import sys

import numpy as np
import pytest

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import goldens
from t2v_turbo_tpu.io.torch_import import (
    import_unet_params,
    import_vae_params,
)
from t2v_turbo_tpu.models import UNetConfig, UNetModel
from t2v_turbo_tpu.models.vae import AutoencoderKL, VAEConfig

REF = "/root/reference"


def _torch_and_reference():
    """Import torch and put the reference on sys.path (generation only)."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from conftest import stub_module

    for _name in ("torchvision", "torchvision.io", "torchvision.utils", "cv2"):
        stub_module(_name)
    return torch


def to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


TINY_UNET_JAX_CFG = dict(
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


def _gen_unet_golden():
    torch = _torch_and_reference()
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(
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
    ).eval()

    g = {f"sd.{k}": v for k, v in to_np(ref.state_dict()).items()}

    # case 1: single batch, fps 16
    rng = np.random.RandomState(0)
    x1 = rng.randn(1, 4, 4, 8, 8).astype(np.float32)
    ctx1 = rng.randn(1, 7, 24).astype(np.float32)
    ts1 = np.array([314], dtype=np.int64)
    w1 = rng.randn(1, 8).astype(np.float32)
    with torch.no_grad():
        out1 = ref(
            torch.from_numpy(x1),
            torch.from_numpy(ts1),
            context=torch.from_numpy(ctx1),
            fps=16,
            timestep_cond=torch.from_numpy(w1),
        ).numpy()
    g.update(
        {"in1.x": x1, "in1.ctx": ctx1, "in1.ts": ts1, "in1.w": w1,
         "in1.fps": np.array([16.0], np.float32), "out1.y": out1}
    )

    # case 2: batch 2, edge timesteps, fps 24
    rng = np.random.RandomState(1)
    x2 = rng.randn(2, 4, 4, 8, 8).astype(np.float32)
    ctx2 = rng.randn(2, 7, 24).astype(np.float32)
    ts2 = np.array([0, 999], dtype=np.int64)
    w2 = rng.randn(2, 8).astype(np.float32)
    with torch.no_grad():
        out2 = ref(
            torch.from_numpy(x2),
            torch.from_numpy(ts2),
            context=torch.from_numpy(ctx2),
            fps=24,
            timestep_cond=torch.from_numpy(w2),
        ).numpy()
    g.update(
        {"in2.x": x2, "in2.ctx": ctx2, "in2.ts": ts2, "in2.w": w2,
         "in2.fps": np.array([24.0, 24.0], np.float32), "out2.y": out2}
    )
    return g


def _gen_vae_golden():
    torch = _torch_and_reference()
    from lvdm.modules.networks.ae_modules import Decoder as RefDec
    from lvdm.modules.networks.ae_modules import Encoder as RefEnc

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
    qc = torch.nn.Conv2d(8, 8, 1)
    pqc = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in to_np(enc.state_dict()).items()})
    sd.update({f"decoder.{k}": v for k, v in to_np(dec.state_dict()).items()})
    sd.update({f"quant_conv.{k}": v for k, v in to_np(qc.state_dict()).items()})
    sd.update(
        {f"post_quant_conv.{k}": v for k, v in to_np(pqc.state_dict()).items()}
    )
    g = {f"sd.{k}": v for k, v in sd.items()}

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments = qc(enc(torch.from_numpy(x))).numpy()
    g.update({"in.enc_x": x, "out.moments": moments})

    rng = np.random.RandomState(3)
    z = rng.randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        dec_out = dec(pqc(torch.from_numpy(z))).numpy()
    g.update({"in.dec_z": z, "out.dec": dec_out})
    return g


def _gen_mha_golden():
    torch = pytest.importorskip("torch")
    torch.manual_seed(3)
    width, heads, s, b = 32, 4, 7, 2
    mha = torch.nn.MultiheadAttention(width, heads, batch_first=True).eval()
    x = torch.randn(b, s, width)
    mask = torch.full((s, s), float("-inf")).triu(1)
    with torch.no_grad():
        ref_out, _ = mha(x, x, x, attn_mask=mask, need_weights=False)
    return {
        "w_in": mha.in_proj_weight.detach().numpy(),
        "b_in": mha.in_proj_bias.detach().numpy(),
        "w_out": mha.out_proj.weight.detach().numpy(),
        "b_out": mha.out_proj.bias.detach().numpy(),
        "in.x": x.numpy(),
        "out.y": ref_out.numpy(),
        "meta.heads": np.array([heads]),
    }


def _golden(name, gen):
    g = goldens.load(name)
    if g is None:
        g = gen()
        goldens.save(name, g)
    return g


@pytest.fixture(scope="module")
def unet_golden():
    return _golden("vc2_unet_tiny", _gen_unet_golden)


@pytest.fixture(scope="module")
def vae_golden():
    return _golden("vc2_vae_tiny", _gen_vae_golden)


class TestUNetParity:
    @pytest.fixture(scope="class")
    def model_params(self, unet_golden):
        cfg = UNetConfig(**TINY_UNET_JAX_CFG)
        params = import_unet_params(goldens.subdict(unet_golden, "sd"), cfg)
        return UNetModel(cfg=cfg), params

    @pytest.mark.parametrize("case", ["1", "2"])
    def test_forward_parity(self, unet_golden, model_params, case):
        g = unet_golden
        model, params = model_params
        x = g[f"in{case}.x"]
        out = model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # BCTHW -> BTHWC
            jnp.asarray(g[f"in{case}.ts"]),
            jnp.asarray(g[f"in{case}.ctx"]),
            fps=jnp.asarray(g[f"in{case}.fps"]),
            timestep_cond=jnp.asarray(g[f"in{case}.w"]),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3),
            g[f"out{case}.y"],
            atol=2e-4,
            rtol=1e-3,
        )


class TestVAEParity:
    @pytest.fixture(scope="class")
    def model_params(self, vae_golden):
        params = import_vae_params(
            goldens.subdict(vae_golden, "sd"), n_levels=2, n_res=1
        )
        cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
        return AutoencoderKL(cfg=cfg), params

    def test_encode_parity(self, vae_golden, model_params):
        model, params = model_params
        x = vae_golden["in.enc_x"]
        mean_ref, logvar_ref = np.split(vae_golden["out.moments"], 2, axis=1)
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

    def test_decode_parity(self, vae_golden, model_params):
        model, params = model_params
        z = vae_golden["in.dec_z"]
        out = model.apply(
            {"params": params},
            jnp.asarray(z.transpose(0, 2, 3, 1)),
            method=model.decode,
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2),
            vae_golden["out.dec"],
            atol=3e-4,
            rtol=1e-3,
        )


class TestCLIPAttentionPacking:
    """Validate the packed-QKV convention against torch MultiheadAttention
    (the open_clip text tower's attention core)."""

    def test_mha_parity(self):
        from t2v_turbo_tpu.ops.attention import attention_xla

        g = _golden("clip_mha", _gen_mha_golden)
        xn = g["in.x"]
        b, s, width = xn.shape
        heads = int(g["meta.heads"][0])
        qkv = xn @ g["w_in"].T + g["b_in"]
        q, k, v = np.split(qkv, 3, axis=-1)
        d = width // heads
        sp = lambda t: jnp.asarray(
            t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        )
        out = attention_xla(sp(q), sp(k), sp(v), causal=True)
        out = np.asarray(out).transpose(0, 2, 1, 3).reshape(b, s, width)
        out = out @ g["w_out"].T + g["b_out"]
        np.testing.assert_allclose(out, g["out.y"], atol=1e-5)


def _gen_img_xattn_golden():
    """Reference CrossAttention with img_cross_attention=True
    (lvdm/modules/attention.py:78-83,151-161): context rows past
    text_context_len=200 go through to_k_ip/to_v_ip, added at scale 1.0."""
    torch = _torch_and_reference()
    from lvdm.modules.attention import CrossAttention as RefXAttn

    torch.manual_seed(5)
    qd, cd, heads, dh = 16, 12, 2, 8
    ref = RefXAttn(
        query_dim=qd, context_dim=cd, heads=heads, dim_head=dh,
        img_cross_attention=True,
    ).eval()
    x = torch.randn(2, 9, qd)
    ctx = torch.randn(2, 200 + 4, cd)  # 200 text rows + 4 image tokens
    with torch.no_grad():
        # force the einsum path (xformers absent on CPU anyway)
        out = RefXAttn.forward(ref, x, context=ctx)
    g = {f"sd.{k}": v for k, v in to_np(ref.state_dict()).items()}
    g.update({
        "in.x": x.numpy(), "in.ctx": ctx.numpy(), "out.y": out.numpy(),
        "meta.dims": np.array([qd, cd, heads, dh]),
    })
    return g


class TestImageCrossAttentionParity:
    def test_forward_parity(self):
        from t2v_turbo_tpu.models.layers import CrossAttention

        g = _golden("vc2_img_xattn_tiny", _gen_img_xattn_golden)
        qd, cd, heads, dh = (int(v) for v in g["meta.dims"])
        sd = goldens.subdict(g, "sd")
        params = {
            "to_q": {"kernel": sd["to_q.weight"].T},
            "to_k": {"kernel": sd["to_k.weight"].T},
            "to_v": {"kernel": sd["to_v.weight"].T},
            "to_k_ip": {"kernel": sd["to_k_ip.weight"].T},
            "to_v_ip": {"kernel": sd["to_v_ip.weight"].T},
            "to_out": {
                "kernel": sd["to_out.0.weight"].T,
                "bias": sd["to_out.0.bias"],
            },
        }
        attn = CrossAttention(
            query_dim=qd, context_dim=cd, heads=heads, dim_head=dh,
            img_cross_attention=True,
        )
        out = attn.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.asarray(g["in.x"]), context=jnp.asarray(g["in.ctx"]),
        )
        np.testing.assert_allclose(
            np.asarray(out), g["out.y"], atol=2e-5, rtol=1e-4
        )

    def test_image_tokens_change_output(self):
        """The image branch must actually read the image tokens."""
        from t2v_turbo_tpu.models.layers import CrossAttention

        attn = CrossAttention(
            query_dim=16, context_dim=12, heads=2, dim_head=8,
            img_cross_attention=True, text_context_len=5,
        )
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
        ctx = jnp.asarray(rng.randn(1, 8, 12).astype(np.float32))
        params = attn.init(jax.random.PRNGKey(0), x, context=ctx)
        o1 = attn.apply(params, x, context=ctx)
        ctx2 = ctx.at[:, 5:, :].set(0.0)
        o2 = attn.apply(params, x, context=ctx2)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6


def _gen_ddim_sampler_golden():
    """Reference DDIMSampler chain (lvdm/models/samplers/ddim.py) on a
    deterministic stand-in eps model, eta=0, 10 steps, T=100 — the
    timestep grid (make_ddim_timesteps 'uniform': i*ratio+1) and per-step
    math are the parity surface."""
    torch = _torch_and_reference()
    from lvdm.models.samplers.ddim import DDIMSampler

    # register_buffer hard-moves to CUDA (ddim.py:19-23); neutralize on CPU
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(
        self, name, attr
    )

    import numpy as _np

    T = 100
    betas_np = _np.linspace(0.00085**0.5, 0.012**0.5, T) ** 2
    ac = _np.cumprod(1 - betas_np)

    class Stub:
        num_timesteps = T
        device = torch.device("cpu")
        use_scale = False
        alphas_cumprod = torch.tensor(ac, dtype=torch.float64)
        alphas_cumprod_prev = torch.tensor(
            _np.append(1.0, ac[:-1]), dtype=torch.float64
        )
        betas = torch.tensor(betas_np, dtype=torch.float64)

        def apply_model(self, x, t, c, **kw):
            return 0.05 * x

    sampler = DDIMSampler(Stub())
    sampler.make_schedule(ddim_num_steps=10, ddim_eta=0.0, verbose=False)
    x = torch.from_numpy(
        _np.random.RandomState(0).randn(1, 8).astype(_np.float32)
    )
    x_T = x.clone()
    with torch.no_grad():
        for i in reversed(range(10)):
            t = torch.full((1,), int(sampler.ddim_timesteps[i]))
            x, _ = sampler.p_sample_ddim(x, None, t, index=i)
    return {
        "in.x_T": x_T.numpy(),
        "out.x0": x.numpy(),
        "meta.ts": _np.asarray(sampler.ddim_timesteps),
    }


class TestDDIMSamplerParity:
    def test_chain_matches_reference(self):
        from t2v_turbo_tpu.diffusion import DiffusionSchedule
        from t2v_turbo_tpu.diffusion.ddim import DDIMSolver, ddim_sample_loop

        g = _golden("ddim_sampler_chain", _gen_ddim_sampler_golden)
        sched = DiffusionSchedule.create(num_timesteps=100)
        solver = DDIMSolver.create(
            np.asarray(sched.alphas_cumprod), timesteps=100, ddim_timesteps=10
        )
        # same uniform grid as make_ddim_timesteps
        T, n = 100, 10
        expect_ts = np.arange(n) * (T // n) + 1
        np.testing.assert_array_equal(g["meta.ts"], expect_ts)
        out = ddim_sample_loop(
            lambda z, t: 0.05 * z, solver, jnp.asarray(g["in.x_T"]),
            grid="sampler",
        )
        # the torch chain broadcasts to (b,1,1,8) via its `size` tuple;
        # compare value-wise
        np.testing.assert_allclose(
            np.asarray(out), g["out.x0"].reshape(np.asarray(out).shape),
            atol=2e-5, rtol=1e-4,
        )
