"""models/x_transformer.py parity vs the reference torch module.

Goldens in tests/goldens/x_transformer.npz were produced by
tests/xt_golden_gen.py running the reference lvdm/modules/x_transformer.py
directly (randomized params, eval mode); this file never needs torch or
the reference mount.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from t2v_turbo_tpu.io.torch_import import (
    import_x_transformer_layers,
    import_x_transformer_params,
)
from t2v_turbo_tpu.models.x_transformer import (
    AttentionLayers,
    Encoder,
    TransformerWrapper,
    build_layer_types,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "x_transformer.npz")


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLDEN, allow_pickle=False)


def sd_of(gold, name):
    p = f"{name}/sd/"
    return {k[len(p):]: gold[k] for k in gold.files if k.startswith(p)}


ATOL = 3e-5


class TestTransformerWrapper:
    def test_plain_encoder_logits_embeddings_attn(self, gold):
        lt = build_layer_types(2, False, False, False, None, None, None)
        params = import_x_transformer_params(sd_of(gold, "A"), lt)
        model = TransformerWrapper(
            num_tokens=50, max_seq_len=16,
            attn_layers=dict(dim=32, depth=2, heads=4,
                             attn_kwargs=dict(dim_head=8)),
        )
        tokens = jnp.asarray(gold["A/in/tokens"])
        mask = jnp.asarray(gold["A/in/mask"])
        logits, attn = model.apply(
            {"params": params}, tokens, mask=mask, return_attn=True
        )
        np.testing.assert_allclose(
            np.asarray(logits), gold["A/out/logits"], atol=ATOL
        )
        embs = model.apply(
            {"params": params}, tokens, mask=mask, return_embeddings=True
        )
        np.testing.assert_allclose(
            np.asarray(embs), gold["A/out/embeddings"], atol=ATOL
        )
        for i, m in enumerate(attn):
            np.testing.assert_allclose(
                np.asarray(m), gold[f"A/out/attn_{i}"], atol=ATOL
            )

    def test_exotic_knobs(self, gold):
        # talking heads + mem kv + sparse topk + GLU FF + scalenorm +
        # sandwich + residual attn + memory tokens + emb projection
        lt = build_layer_types(2, False, False, False, None, 1, None)
        assert tuple(lt) == tuple(gold["B/layer_types"])
        params = import_x_transformer_params(
            sd_of(gold, "B"), lt, norm_has_g=True, glu=True
        )
        model = TransformerWrapper(
            num_tokens=50, max_seq_len=16, emb_dim=24, num_memory_tokens=2,
            attn_layers=dict(
                dim=32, depth=2, heads=2, use_scalenorm=True,
                sandwich_coef=1, residual_attn=True,
                attn_kwargs=dict(dim_head=8, talking_heads=True,
                                 num_mem_kv=2, sparse_topk=4),
                ff_kwargs=dict(glu=True),
            ),
        )
        logits = model.apply(
            {"params": params}, jnp.asarray(gold["B/in/tokens"]),
            mask=jnp.asarray(gold["B/in/mask"]),
        )
        np.testing.assert_allclose(
            np.asarray(logits), gold["B/out/logits"], atol=ATOL
        )

    def test_tied_embedding(self, gold):
        lt = build_layer_types(1, False, False, False, None, None, None)
        params = import_x_transformer_params(sd_of(gold, "G"), lt)
        model = TransformerWrapper(
            num_tokens=50, max_seq_len=16, tie_embedding=True,
            attn_layers=dict(dim=32, depth=1, heads=4,
                             attn_kwargs=dict(dim_head=8)),
        )
        logits = model.apply(
            {"params": params}, jnp.asarray(gold["G/in/tokens"]),
            mask=jnp.asarray(gold["G/in/mask"]),
        )
        np.testing.assert_allclose(
            np.asarray(logits), gold["G/out/logits"], atol=ATOL
        )


class TestAttentionLayers:
    def test_causal_gru_rmsnorm(self, gold):
        lt = build_layer_types(2, False, False, False, None, None, None)
        params = import_x_transformer_layers(
            sd_of(gold, "C"), lt, gate_residual=True, norm_has_g=True
        )
        model = AttentionLayers(
            dim=32, depth=2, heads=4, causal=True, gate_residual=True,
            use_rmsnorm=True, attn_kwargs=dict(dim_head=8),
        )
        y = model.apply({"params": params}, jnp.asarray(gold["C/in/x"]))
        np.testing.assert_allclose(np.asarray(y), gold["C/out/y"], atol=ATOL)

    def test_postnorm_rezero_pia_onattn(self, gold):
        lt = build_layer_types(2, False, False, False, None, None, None)
        params = import_x_transformer_layers(
            sd_of(gold, "D"), lt, use_rezero=True, on_attn=True
        )
        model = AttentionLayers(
            dim=32, depth=2, heads=4, pre_norm=False, use_rezero=True,
            position_infused_attn=True,
            attn_kwargs=dict(dim_head=8, on_attn=True),
        )
        y = model.apply({"params": params}, jnp.asarray(gold["D/in/x"]))
        np.testing.assert_allclose(np.asarray(y), gold["D/out/y"], atol=ATOL)

    def test_cross_attend(self, gold):
        lt = build_layer_types(2, True, False, False, None, None, None)
        params = import_x_transformer_layers(sd_of(gold, "E"), lt)
        model = AttentionLayers(
            dim=32, depth=2, heads=4, cross_attend=True,
            cross_residual_attn=True, attn_kwargs=dict(dim_head=8),
        )
        y = model.apply(
            {"params": params}, jnp.asarray(gold["E/in/x"]),
            context=jnp.asarray(gold["E/in/ctx"]),
            context_mask=jnp.asarray(gold["E/in/cmask"]),
        )
        np.testing.assert_allclose(np.asarray(y), gold["E/out/y"], atol=ATOL)


class TestLayerSchedules:
    def test_schedules_match_reference(self, gold):
        want = {
            "par": build_layer_types(4, False, False, False, None, None, 2),
            "sandwich": build_layer_types(4, False, False, False, None, 2,
                                          None),
            "cross": build_layer_types(3, True, False, False, None, None,
                                       None),
            "only_cross": build_layer_types(3, True, True, False, None, None,
                                            None),
        }
        for k, lt in want.items():
            assert tuple(lt) == tuple(gold[f"F/layer_types/{k}"]), k


class TestGuards:
    def test_encoder_refuses_causal(self):
        with pytest.raises(AssertionError):
            Encoder(dim=8, depth=1, causal=True)

    def test_mems_guarded(self):
        model = AttentionLayers(dim=8, depth=1, heads=2,
                                attn_kwargs=dict(dim_head=4))
        x = jnp.zeros((1, 3, 8))
        p = model.init(jax.random.PRNGKey(0), x)
        with pytest.raises(NotImplementedError):
            model.apply(p, x, mems=[jnp.zeros((1, 2, 8))])

    def test_macaron_halves_ff(self):
        # the reference's macaron Scale wrapper tuple-unpacks a tensor and
        # crashes (x_transformer.py:129-131 vs :562) — the rebuild applies
        # the intended 0.5 scale, so: ff-only stack at 0.5x == macaron's
        # own ff layers
        model = AttentionLayers(dim=8, depth=1, heads=2, macaron=True,
                                attn_kwargs=dict(dim_head=4))
        x = jnp.ones((1, 3, 8))
        p = model.init(jax.random.PRNGKey(1), x)
        y = model.apply(p, x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))
