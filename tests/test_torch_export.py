"""Torch-format artifact export (the reference trainers' unet_lora.pt /
unet.pt pre-save hooks, train_t2v_turbo_v1_lora.py:739-756,
train_latent_t2v_turbo_v2.py:760-773).

Correctness strategy: the importers are the torch-parity-tested ground truth
(goldens carry a real reference state dict), so export is verified by exact
round trips through them:
  * export(import(golden_sd)) == golden_sd, key-for-key;
  * folding an exported LoRA list via the import path reproduces
    merge_lora's weights on every leaf.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import goldens
from t2v_turbo_tpu.io.lora_import import apply_lora_pt
from t2v_turbo_tpu.io.torch_export import (
    export_lora_pt,
    export_unet_params,
    vc2_reference_lora_target,
)
from t2v_turbo_tpu.io.torch_import import import_unet_params
from t2v_turbo_tpu.lora import LoRAConfig, init_lora, merge_lora
from t2v_turbo_tpu.models import UNetConfig

TINY_CFG = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
    context_dim=24, temporal_length=4, time_cond_proj_dim=8,
)


@pytest.fixture(scope="module")
def golden_sd():
    g = goldens.load("vc2_unet_tiny")
    if g is None:
        pytest.skip("vc2_unet_tiny golden missing")
    return goldens.subdict(g, "sd")


class TestUNetExport:
    def test_roundtrip_equals_golden_state_dict(self, golden_sd):
        params = {"params": import_unet_params(golden_sd, TINY_CFG)}
        sd2 = export_unet_params(params, TINY_CFG)
        assert set(sd2) == set(golden_sd), (
            sorted(set(sd2) - set(golden_sd))[:5],
            sorted(set(golden_sd) - set(sd2))[:5],
        )
        for k in golden_sd:
            assert sd2[k].shape == golden_sd[k].shape, k
            np.testing.assert_allclose(
                sd2[k], np.asarray(golden_sd[k], np.float32),
                rtol=1e-6, atol=1e-6, err_msg=k,
            )

    def test_import_of_export_is_identity(self, golden_sd):
        params = import_unet_params(golden_sd, TINY_CFG)
        back = import_unet_params(
            export_unet_params({"params": params}, TINY_CFG), TINY_CFG
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            ),
            params, back,
        )


def _randomize_factors(lora_flat, key, scale=0.5):
    out = {}
    for i, (pt, fac) in enumerate(sorted(lora_flat.items())):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        out[pt] = {
            "down": scale * jax.random.normal(k1, fac["down"].shape),
            "up": scale * jax.random.normal(k2, fac["up"].shape),
        }
    return out


class TestLoraExport:
    @pytest.fixture(scope="class")
    def setup(self, golden_sd):
        params = {"params": import_unet_params(golden_sd, TINY_CFG)}
        cfg = LoRAConfig(rank=3, target=vc2_reference_lora_target(TINY_CFG))
        factors = _randomize_factors(
            init_lora(params, cfg, jax.random.PRNGKey(0)), jax.random.PRNGKey(1)
        )
        return params, factors

    def test_export_fold_matches_merge_lora(self, setup):
        params, factors = setup
        weights = export_lora_pt(factors, TINY_CFG, params=params)
        folded = apply_lora_pt(params, [np.asarray(w) for w in weights], TINY_CFG)
        merged = merge_lora(params, factors, scale=1.0)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-5, atol=2e-5,
            ),
            folded, merged,
        )

    def test_partial_target_zero_fills(self, setup):
        params, _ = setup
        cfg = LoRAConfig(
            rank=2,
            target=lambda pt: vc2_reference_lora_target(TINY_CFG)(pt)
            and "attn1" in "/".join(pt),
        )
        factors = _randomize_factors(
            init_lora(params, cfg, jax.random.PRNGKey(2)), jax.random.PRNGKey(3)
        )
        assert 0 < len(factors)
        weights = export_lora_pt(factors, TINY_CFG, params=params)
        folded = apply_lora_pt(params, [np.asarray(w) for w in weights], TINY_CFG)
        merged = merge_lora(params, factors, scale=1.0)
        got = np.asarray(
            folded["params"]["middle_block_1"]["blocks_0"]["attn1"]["to_q"]["kernel"]
        )
        want = np.asarray(
            merged["params"]["middle_block_1"]["blocks_0"]["attn1"]["to_q"]["kernel"]
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        # a non-targeted slot must be untouched (zero pair emitted)
        np.testing.assert_array_equal(
            np.asarray(folded["params"]["conv_in"]["kernel"]),
            np.asarray(params["params"]["conv_in"]["kernel"]),
        )

    def test_unexportable_factors_raise(self, setup):
        params, _ = setup
        # default target = every kernel leaf, incl. init_attn's Conv1d
        # projections which the reference never injects
        factors = init_lora(params, LoRAConfig(rank=2), jax.random.PRNGKey(4))
        with pytest.raises(ValueError, match="no unet_lora.pt slot"):
            export_lora_pt(factors, TINY_CFG, params=params)

    def test_reference_target_matches_order_length(self, setup):
        params, factors = setup
        from t2v_turbo_tpu.io.lora_import import lora_module_order

        assert len(factors) == len(lora_module_order(TINY_CFG))
