"""LoRA pytree-transform tests."""

import numpy as np
import jax
import jax.numpy as jnp

from t2v_turbo_tpu.lora import (
    LoRAConfig,
    count_lora_params,
    init_lora,
    load_lora_npz,
    merge_lora,
    save_lora_npz,
    unet_attention_target,
)

import tinymodels


def tiny_unet(_cache={}):
    """The SHARED single-level tiny UNet (tinymodels.py), built once per
    module, so the persistent compile cache dedupes with the trainer test
    files (the old per-test two-level model cost ~210 s of serial XLA
    compile in the full suite)."""
    if "v" not in _cache:
        model = tinymodels.tiny_unet()
        x = jnp.zeros((1, 4, 8, 8, 4))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, 16)), timestep_cond=jnp.zeros((1, 8)),
        )
        _cache["v"] = (model, params, x)
    return _cache["v"]


class TestLoRA:
    def test_zero_init_is_identity(self):
        model, params, x = tiny_unet()
        lora = init_lora(params, LoRAConfig(rank=4), jax.random.PRNGKey(1))
        assert len(lora) > 0
        merged = merge_lora(params, lora)
        fwd = jax.jit(
            lambda p: model.apply(
                p, x, jnp.array([5]), jnp.ones((1, 7, 16)),
                timestep_cond=jnp.ones((1, 8)),
            )
        )
        out0 = fwd(params)
        out1 = fwd(merged)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)

    def test_nonzero_up_changes_output(self):
        model, params, x = tiny_unet()
        lora = init_lora(params, LoRAConfig(rank=4), jax.random.PRNGKey(1))
        lora = jax.tree.map(lambda a: a + 0.05, lora)
        merged = merge_lora(params, lora)
        args = (x, jnp.array([5]), jnp.ones((1, 7, 16)))
        fwd = jax.jit(
            lambda p: model.apply(p, *args, timestep_cond=jnp.ones((1, 8)))
        )
        o0 = fwd(params)
        o1 = fwd(merged)
        assert float(jnp.abs(o0 - o1).max()) > 1e-6

    def test_grads_flow_only_to_lora(self):
        model, params, _ = tiny_unet()
        # random input: with x=0 every residual branch ends in a zero-init
        # conv and flax biases are zero, so the whole net is exactly 0 and
        # all grads legitimately vanish
        x = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 8, 8, 4))
        lora = init_lora(params, LoRAConfig(rank=2), jax.random.PRNGKey(2))

        def loss(lora_p, base_p):
            merged = merge_lora(base_p, lora_p)
            out = model.apply(
                merged, x, jnp.array([900]), jnp.ones((1, 7, 16)),
                timestep_cond=jnp.ones((1, 8)),
            )
            # plain sum: nonzero output gradient even though the zero-init
            # out-conv makes the model output (and d(out**2)) zero at init
            return jnp.sum(out.astype(jnp.float32))

        g_lora, g_base = jax.jit(jax.grad(loss, argnums=(0, 1)))(lora, params)
        # base gradients must be exactly zero (stop_gradient)
        base_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_base))
        assert base_norm == 0.0
        # up factors are zero at init, so down grads vanish but up grads don't
        up_norm = sum(float(jnp.abs(f["up"]).sum()) for f in g_lora.values())
        assert up_norm > 0.0

    def test_matches_explicit_factorized_linear(self):
        """merge on a Dense kernel equals y = Wx + scale*(x@down)@up."""
        rng = np.random.RandomState(0)
        W = rng.randn(6, 8).astype(np.float32)
        down = rng.randn(6, 3).astype(np.float32)
        up = rng.randn(3, 8).astype(np.float32)
        params = {"layer": {"kernel": jnp.asarray(W)}}
        lora = {("layer", "kernel"): {"down": jnp.asarray(down), "up": jnp.asarray(up)}}
        merged = merge_lora(params, lora, scale=0.7)
        x = rng.randn(2, 6).astype(np.float32)
        y = x @ np.asarray(merged["layer"]["kernel"])
        expected = x @ W + 0.7 * (x @ down) @ up
        np.testing.assert_allclose(y, expected, atol=1e-5)

    def test_conv_kernel_folding(self):
        """Conv kernel (kh,kw,i,o) merge equals conv with weight + reshaped
        delta (the LoraInjectedConv2d semantics)."""
        rng = np.random.RandomState(1)
        W = rng.randn(3, 3, 4, 5).astype(np.float32)
        down = rng.randn(36, 2).astype(np.float32)
        up = rng.randn(2, 5).astype(np.float32)
        params = {"conv": {"kernel": jnp.asarray(W)}}
        lora = {("conv", "kernel"): {"down": jnp.asarray(down), "up": jnp.asarray(up)}}
        merged = np.asarray(merge_lora(params, lora)["conv"]["kernel"])
        np.testing.assert_allclose(
            merged, W + (down @ up).reshape(3, 3, 4, 5), atol=1e-5
        )

    def test_save_load_roundtrip(self, tmp_path):
        _, params, _ = tiny_unet()
        lora = init_lora(params, LoRAConfig(rank=2), jax.random.PRNGKey(3))
        lora = jax.tree.map(lambda a: a + 0.1, lora)
        p = str(tmp_path / "lora.npz")
        save_lora_npz(p, lora)
        loaded = load_lora_npz(p)
        assert set(loaded.keys()) == set(lora.keys())
        for k in lora:
            np.testing.assert_allclose(loaded[k]["down"], lora[k]["down"])
            np.testing.assert_allclose(loaded[k]["up"], lora[k]["up"])

    def test_targeting(self):
        _, params, _ = tiny_unet()
        full = init_lora(params, LoRAConfig(rank=2), jax.random.PRNGKey(0))
        attn_only = init_lora(
            params,
            LoRAConfig(rank=2, target=unet_attention_target),
            jax.random.PRNGKey(0),
        )
        assert 0 < len(attn_only) < len(full)
        assert count_lora_params(attn_only) < count_lora_params(full)
