"""Tests for attention kernels and norm ops against numpy/XLA oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t2v_turbo_tpu.ops import (
    attention_xla,
    flash_attention,
    group_norm,
    layer_norm,
    scaled_dot_product_attention,
)


def _qkv(key, b, h, sq, sk, d, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, sq, d), dtype)
    k = jax.random.normal(k2, (b, h, sk, d), dtype)
    v = jax.random.normal(k3, (b, h, sk, d), dtype)
    return q, k, v


class TestAttentionXLA:
    def test_matches_numpy(self):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 8, 8, 16)
        out = attention_xla(q, k, v)
        qn, kn, vn = map(np.asarray, (q, k, v))
        logits = np.einsum("bhqd,bhkd->bhqk", qn, kn) / np.sqrt(16)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bhkd->bhqd", p, vn)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_causal(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 1, 6, 6, 8)
        out, probs = attention_xla(q, k, v, causal=True, return_probs=True)
        pn = np.asarray(probs)[0, 0]
        assert np.allclose(np.triu(pn, k=1), 0.0, atol=1e-7)
        np.testing.assert_allclose(pn.sum(-1), 1.0, rtol=1e-5)

    def test_bias(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 1, 4, 4, 8)
        bias = jnp.full((1, 1, 4, 4), -1e9).at[:, :, :, 0].set(0.0)
        out = attention_xla(q, k, v, bias=bias)
        # with all mass on k=0, output == v[..., 0, :]
        np.testing.assert_allclose(
            out[0, 0], np.tile(np.asarray(v)[0, 0, 0], (4, 1)), atol=1e-5
        )


class TestFlashAttention:
    @pytest.mark.parametrize(
        "b,h,sq,sk,d",
        [
            (1, 2, 256, 256, 64),  # aligned
            (1, 2, 640, 640, 64),  # spatial self-attn shape at 1/16 res
            (1, 5, 512, 77, 64),  # cross-attn with padded K
            (1, 2, 100, 100, 64),  # unaligned both ways
        ],
    )
    def test_matches_xla(self, b, h, sq, sk, d):
        q, k, v = _qkv(jax.random.PRNGKey(3), b, h, sq, sk, d)
        out = flash_attention(q, k, v)
        expected = attention_xla(q, k, v)
        np.testing.assert_allclose(out, expected, atol=2e-3, rtol=2e-3)

    def test_bf16(self):
        q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 512, 512, 64, jnp.bfloat16)
        out = flash_attention(q, k, v)
        expected = attention_xla(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            out.astype(jnp.float32), expected, atol=3e-2, rtol=3e-2
        )

    def test_grad_matches_xla(self):
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 256, 256, 32)

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(attention_xla(q, k, v) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(a, b_, atol=2e-3, rtol=2e-3)

    def test_dispatcher(self):
        q, k, v = _qkv(jax.random.PRNGKey(6), 1, 1, 16, 16, 8)
        # tiny sequence -> XLA path; bias path -> XLA
        out = scaled_dot_product_attention(q, k, v)
        np.testing.assert_allclose(out, attention_xla(q, k, v), atol=1e-5)
        bias = jnp.zeros((1, 1, 16, 16))
        out2 = scaled_dot_product_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(out2, attention_xla(q, k, v), atol=1e-5)


class TestFlashAttentionBSHD:
    """The layer-native (B, S, H, D) kernels must match the (B, H, S, D)
    path exactly (they share the kernel bodies)."""

    def _qkv_bshd(self, key, b, sq, sk, h, d, dtype=jnp.float32):
        q, k, v = _qkv(key, b, h, sq, sk, d, dtype)
        to_bshd = lambda t: t.transpose(0, 2, 1, 3)
        return to_bshd(q), to_bshd(k), to_bshd(v)

    @pytest.mark.parametrize(
        "b,h,sq,sk,d",
        [
            (1, 2, 256, 256, 64),
            (2, 5, 512, 77, 64),  # cross-attn, padded K, multi-batch
            (1, 2, 100, 100, 64),  # unaligned
        ],
    )
    def test_matches_xla(self, b, h, sq, sk, d):
        from t2v_turbo_tpu.ops.attention import (
            attention_xla_bshd,
            flash_attention_bshd,
        )

        q, k, v = self._qkv_bshd(jax.random.PRNGKey(7), b, sq, sk, h, d)
        out = flash_attention_bshd(q, k, v)
        expected = attention_xla_bshd(q, k, v)
        assert out.shape == (b, sq, h, d)
        np.testing.assert_allclose(out, expected, atol=2e-3, rtol=2e-3)

    def test_xla_bshd_matches_bhsd(self):
        from t2v_turbo_tpu.ops.attention import attention_xla_bshd

        q, k, v = _qkv(jax.random.PRNGKey(8), 2, 3, 64, 32, 16)
        ref, probs_ref = attention_xla(q, k, v, return_probs=True)
        t = lambda x: x.transpose(0, 2, 1, 3)
        out, probs = attention_xla_bshd(t(q), t(k), t(v), return_probs=True)
        np.testing.assert_allclose(t(out), ref, atol=1e-6)
        np.testing.assert_allclose(probs, probs_ref, atol=1e-6)

    def test_grad_matches_xla(self):
        from t2v_turbo_tpu.ops.attention import (
            attention_xla_bshd,
            flash_attention_bshd,
        )

        q, k, v = self._qkv_bshd(jax.random.PRNGKey(9), 1, 256, 256, 2, 32)

        def f_flash(q, k, v):
            return jnp.sum(flash_attention_bshd(q, k, v) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(attention_xla_bshd(q, k, v) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(a, b_, atol=2e-3, rtol=2e-3)

    def test_dispatcher_bias_and_small(self):
        from t2v_turbo_tpu.ops.attention import attention_xla_bshd, sdpa_bshd

        q, k, v = self._qkv_bshd(jax.random.PRNGKey(10), 1, 16, 16, 1, 8)
        out = sdpa_bshd(q, k, v)
        np.testing.assert_allclose(out, attention_xla_bshd(q, k, v), atol=1e-5)


class TestFusedGNSiLUConv:
    """Pallas GN+SiLU+conv kernel vs the unfused XLA composition."""

    @pytest.mark.parametrize(
        "n,h,w,c,o,kh,kw",
        [
            (2, 8, 8, 32, 64, 3, 3),   # spatial 3x3
            (1, 4, 16, 32, 32, 3, 1),  # temporal (3,1), W-tiled path
            (2, 12, 8, 64, 32, 3, 3),  # row-chunk remainder (12 % 8 != 0)
        ],
    )
    def test_matches_reference(self, n, h, w, c, o, kh, kw):
        from t2v_turbo_tpu.ops.fused_conv import (
            _reference_impl,
            fused_gn_silu_conv,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        gs = jnp.asarray(rng.randn(c), jnp.float32)
        gb = jnp.asarray(rng.randn(c), jnp.float32)
        wk = jnp.asarray(rng.randn(kh, kw, c, o) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.randn(o), jnp.float32)
        got = fused_gn_silu_conv(x, gs, gb, wk, bias)
        want = _reference_impl(x, gs, gb, wk, bias, 32, 1e-5)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_film_and_grad(self):
        from t2v_turbo_tpu.ops.fused_conv import (
            _reference_impl,
            fused_gn_silu_conv,
        )

        rng = np.random.RandomState(1)
        n, h, w, c, o = 2, 8, 8, 32, 32
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        gs = jnp.ones((c,), jnp.float32)
        gb = jnp.zeros((c,), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, c, o) * 0.05, jnp.float32)
        bias = jnp.zeros((o,), jnp.float32)
        fs = jnp.asarray(rng.randn(n, c) * 0.1, jnp.float32)
        fh = jnp.asarray(rng.randn(n, c) * 0.1, jnp.float32)
        got = fused_gn_silu_conv(x, gs, gb, wk, bias, film_scale=fs, film_shift=fh)
        want = _reference_impl(x, gs, gb, wk, bias, 32, 1e-5, fs, fh)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

        f = lambda x, wk: jnp.sum(fused_gn_silu_conv(x, gs, gb, wk, bias) ** 2)
        r = lambda x, wk: jnp.sum(
            _reference_impl(x, gs, gb, wk, bias, 32, 1e-5) ** 2
        )
        gx, gw = jax.grad(f, (0, 1))(x, wk)
        rx, rw = jax.grad(r, (0, 1))(x, wk)
        np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(gw, rw, atol=1e-3, rtol=1e-4)


class TestFusedNorms:
    """Interpret-mode parity for the Pallas fused GN/LN kernels
    (ops/fused_norms.py) against the XLA reference math they replace on
    TPU. On CPU the production dispatch in ops/norms.py never routes here
    (see `_fused_enabled`), so these tests drive the kernels directly with
    interpret=True."""

    def test_group_norm_parity(self):
        from t2v_turbo_tpu.ops.fused_norms import _gn_ref, fused_group_norm

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 24, 64), jnp.float32)
        s = jnp.asarray(rng.randn(64), jnp.float32)
        b = jnp.asarray(rng.randn(64), jnp.float32)
        for act in (None, "silu"):
            got = fused_group_norm(x, s, b, 8, 1e-5, act, interpret=True)
            want = _gn_ref(x, s, b, 8, 1e-5, act)
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_group_norm_bf16(self):
        from t2v_turbo_tpu.ops.fused_norms import _gn_ref, fused_group_norm

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 64) * 10, jnp.bfloat16)
        s = jnp.ones((64,), jnp.float32)
        b = jnp.zeros((64,), jnp.float32)
        got = fused_group_norm(x, s, b, 8, 1e-5, "silu", interpret=True)
        want = _gn_ref(x, s, b, 8, 1e-5, "silu")
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            got.astype(jnp.float32), want.astype(jnp.float32),
            atol=2e-2, rtol=2e-2,
        )

    def test_group_norm_grad(self):
        from t2v_turbo_tpu.ops.fused_norms import _gn_ref, fused_group_norm

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
        s = jnp.asarray(rng.randn(32), jnp.float32)
        b = jnp.asarray(rng.randn(32), jnp.float32)
        f = lambda x, s, b: jnp.sum(
            fused_group_norm(x, s, b, 4, 1e-5, "silu", interpret=True) ** 2
        )
        r = lambda x, s, b: jnp.sum(_gn_ref(x, s, b, 4, 1e-5, "silu") ** 2)
        for a, e in zip(
            jax.grad(f, (0, 1, 2))(x, s, b), jax.grad(r, (0, 1, 2))(x, s, b)
        ):
            np.testing.assert_allclose(a, e, atol=1e-4, rtol=1e-4)

    def test_layer_norm_parity_and_row_padding(self):
        from t2v_turbo_tpu.ops.fused_norms import _ln_ref, fused_layer_norm

        rng = np.random.RandomState(3)
        # 300 rows: not a multiple of the 256-row block -> exercises padding
        x = jnp.asarray(rng.randn(300, 64), jnp.float32)
        s = jnp.asarray(rng.randn(64), jnp.float32)
        b = jnp.asarray(rng.randn(64), jnp.float32)
        for act in (None, "silu"):
            got = fused_layer_norm(x, s, b, 1e-5, act, True)
            want = _ln_ref(x, s, b, 1e-5, act)
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_unsupported_shape_falls_back(self):
        from t2v_turbo_tpu.ops import fused_norms

        # per-frame f32 block over the VMEM budget -> must not build a
        # pallas_call at all (the guard ADVICE r4 flagged as dead)
        big = (1, fused_norms._GN_MAX_FRAME_F32_BYTES // (4 * 32) + 8, 32)
        assert not fused_norms.gn_shape_supported(big, 32)
        x = jnp.ones(big, jnp.float32)
        s = jnp.ones((32,), jnp.float32)
        b = jnp.zeros((32,), jnp.float32)
        got = fused_norms.fused_group_norm(x, s, b, 32)
        want = fused_norms._gn_ref(x, s, b, 32, 1e-5, None)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert not fused_norms.ln_shape_supported((8, 64))  # tiny rows
        assert not fused_norms.gn_shape_supported((2, 16, 30), 4)  # C % G
        # fused_layer_norm must self-guard too (same contract as GN): a
        # shape the kernel can't take returns the XLA math, not a crash
        xs = jnp.asarray(np.random.RandomState(5).randn(8, 64), jnp.float32)
        s64, b64 = jnp.ones((64,), jnp.float32), jnp.zeros((64,), jnp.float32)
        got = fused_norms.fused_layer_norm(xs, s64, b64)
        want = fused_norms._ln_ref(xs, s64, b64, 1e-5, None)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_dispatch_inert_on_cpu(self):
        # ops.norms.group_norm must keep the pure-XLA path on CPU: jaxpr
        # contains no pallas_call even for an eligible shape.
        from t2v_turbo_tpu.ops.norms import _fused_enabled, group_norm

        assert not _fused_enabled()
        x = jnp.ones((2, 8, 8, 64), jnp.float32)
        jaxpr = jax.make_jaxpr(
            lambda x: group_norm(x, jnp.ones(64), jnp.zeros(64), 8)
        )(x)
        assert "pallas_call" not in str(jaxpr)

    def test_norms_act_matches_separate_silu(self):
        # group_norm(act='silu') == silu(group_norm(x)) in f32 — the model
        # call sites fused in round 5 depend on this identity.
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 6, 5, 32), jnp.float32)
        s = jnp.asarray(rng.randn(32), jnp.float32)
        b = jnp.asarray(rng.randn(32), jnp.float32)
        fused = group_norm(x, s, b, 8, 1e-5, "silu")
        ref = jax.nn.silu(group_norm(x, s, b, 8))
        np.testing.assert_allclose(fused, ref, atol=1e-7)
        ln_fused = layer_norm(x.reshape(-1, 32), s, b, 1e-5, "silu")
        ln_ref = jax.nn.silu(layer_norm(x.reshape(-1, 32), s, b))
        np.testing.assert_allclose(ln_fused, ln_ref, atol=1e-7)


class TestInt8Conv:
    """The T2V_INT8_CONV inference lever (models/layers.py): forward within
    the measured ~1.2e-2 per-conv error band of nn.Conv, and — the round-5
    review regression — gradients must FLOW (int8 arrays carry no tangent,
    so without the straight-through VJP a training run under the flag
    silently learns nothing below conv_in)."""

    def _setup(self):
        import flax.linen as nn
        from t2v_turbo_tpu.models.layers import Int8Conv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        q = Int8Conv(24)
        f = nn.Conv(24, kernel_size=(3, 3), padding=((1, 1), (1, 1)))
        params = f.init(jax.random.PRNGKey(0), x)
        return q, f, params, x

    def test_forward_parity(self):
        q, f, params, x = self._setup()
        got = q.apply(params, x)
        want = f.apply(params, x)
        scale = float(jnp.abs(want).max())
        assert float(jnp.abs(got - want).max()) / scale < 4e-2

    def test_gradients_flow_straight_through(self):
        q, f, params, x = self._setup()
        lq = lambda p, x: jnp.sum(q.apply(p, x) ** 2)
        lf = lambda p, x: jnp.sum(f.apply(p, x) ** 2)
        gq_p, gq_x = jax.grad(lq, (0, 1))(params, x)
        gf_p, gf_x = jax.grad(lf, (0, 1))(params, x)
        for a, e in zip(jax.tree.leaves(gq_p), jax.tree.leaves(gf_p)):
            assert float(jnp.abs(a).max()) > 0, "int8 conv detached the grads"
            # STE backward uses the float conv of the same residuals; the
            # only drift is the quantized forward inside the loss cotangent
            rel = float(jnp.abs(a - e).max()) / (float(jnp.abs(e).max()) + 1e-9)
            assert rel < 0.1, rel
        assert float(jnp.abs(gq_x).max()) > 0


class TestNorms:
    def test_group_norm_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(0).randn(2, 5, 7, 32).astype(np.float32)
        scale = np.random.RandomState(1).randn(32).astype(np.float32)
        bias = np.random.RandomState(2).randn(32).astype(np.float32)
        out = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 8)
        gn = torch.nn.GroupNorm(8, 32)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
            # torch expects NCHW
            xt = torch.from_numpy(x).permute(0, 3, 1, 2)
            expected = gn(xt).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_group_norm_5d(self):
        # (B, T, H, W, C) — temporal tensors normalize identically
        x = np.random.RandomState(3).randn(1, 4, 3, 3, 16).astype(np.float32)
        out5 = group_norm(
            jnp.asarray(x), jnp.ones(16), jnp.zeros(16), 4
        )
        out4 = group_norm(
            jnp.asarray(x.reshape(1, 12, 3, 16)), jnp.ones(16), jnp.zeros(16), 4
        )
        np.testing.assert_allclose(out5.reshape(1, 12, 3, 16), out4, atol=1e-6)

    def test_layer_norm(self):
        x = np.random.RandomState(4).randn(3, 10).astype(np.float32)
        out = layer_norm(jnp.asarray(x), jnp.ones(10), jnp.zeros(10))
        mu = x.mean(-1, keepdims=True)
        sd = x.std(-1, keepdims=True)
        np.testing.assert_allclose(out, (x - mu) / np.sqrt(sd**2 + 1e-5), atol=1e-5)

    def test_bf16_precision_preserved(self):
        x = (np.random.RandomState(5).randn(2, 8, 64) * 100).astype(np.float32)
        out_f32 = group_norm(jnp.asarray(x), jnp.ones(64), jnp.zeros(64), 32)
        out_bf16 = group_norm(
            jnp.asarray(x, jnp.bfloat16), jnp.ones(64), jnp.zeros(64), 32
        )
        np.testing.assert_allclose(
            out_bf16.astype(jnp.float32), out_f32, atol=2e-2, rtol=2e-2
        )
