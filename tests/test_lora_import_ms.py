"""MS-backbone LoRA import (app_ms.py:200-215): the cloneofsimo flat list is
consumed in named_modules() DFS order over the diffusers UNet3DConditionModel.

diffusers is not installed in this environment, so there is no live torch
oracle; instead these tests pin the analytic order against the structural
ground truth we do have — the flax MS UNet's parameter tree:

* every LoRA-injected torch module translates to exactly one kernel leaf,
  and every kernel leaf is covered (a bijection): a missed/extra module
  would shift the whole [up, down, ...] stream;
* folding synthetic per-module deltas reproduces up @ down on every leaf
  (verifies pairing, ordering, and every layout conversion at once).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t2v_turbo_tpu.io.lora_import import (
    _delta_kernel,
    _translate_ms,
    apply_lora_pt_ms,
    lora_module_order_ms,
)
from t2v_turbo_tpu.models.unet_ms import MSUNetConfig, MSUNet3DConditionModel


def tiny_cfg():
    return MSUNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        attention_head_dim=16,
        cross_attention_dim=24,
        time_cond_proj_dim=8,
    )


@pytest.fixture(scope="module")
def tiny_ms():
    model = MSUNet3DConditionModel(cfg=tiny_cfg())
    x = jnp.zeros((1, 4, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 24))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), ctx,
        timestep_cond=jnp.zeros((1, 8)),
    )
    return model, params


def _kernel_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_kernel_paths(v, prefix + (k,)))
        elif k == "kernel":
            out[prefix] = np.asarray(v)
    return out


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node["kernel"])


def _synth_pair(rng, kernel, kind, r=4):
    """Random torch-layout (up, down) for a module with this flax kernel."""
    if kind == "linear":
        if kernel.ndim == 3:  # GEGLU proj stored (C, 2, F): Linear is (2F, C)
            i, o = kernel.shape[0], kernel.shape[1] * kernel.shape[2]
        else:
            i, o = kernel.shape
        return rng.randn(o, r).astype(np.float32), rng.randn(r, i).astype(np.float32)
    if kind == "conv2d":
        kh, kw, i, o = kernel.shape
        return (
            rng.randn(o, r, 1, 1).astype(np.float32),
            rng.randn(r, i, kh, kw).astype(np.float32),
        )
    if kind == "conv3d":
        kt, one, i, o = kernel.shape
        assert one == 1
        return (
            rng.randn(o, r, 1, 1, 1).astype(np.float32),
            rng.randn(r, i, kt, 1, 1).astype(np.float32),
        )
    raise ValueError(kind)


class TestMSLoraOrder:
    def test_translation_is_a_bijection_onto_kernels(self, tiny_ms):
        _, params = tiny_ms
        kernels = _kernel_paths(params["params"])
        order = lora_module_order_ms(tiny_cfg())
        paths = [_translate_ms(name) for name, _ in order]
        assert len(paths) == len(set(paths)), "duplicate translation"
        assert set(paths) == set(kernels), (
            sorted(set(paths) - set(kernels))[:5],
            sorted(set(kernels) - set(paths))[:5],
        )

    def test_kind_matches_kernel_rank(self, tiny_ms):
        _, params = tiny_ms
        kernels = _kernel_paths(params["params"])
        for name, kind in lora_module_order_ms(tiny_cfg()):
            k = kernels[_translate_ms(name)]
            if kind == "linear":
                # the GEGLU proj Linear is stored (C, 2, F) for TP
                # (models/layers.py _GEGLUProj); all other linears are 2D
                want = 3 if name.endswith("ff.net.0.proj") else 2
                assert k.ndim == want, name
            else:
                assert k.ndim == 4, name
            if kind == "conv3d":
                assert k.shape[:2] == (3, 1), name

    def test_full_config_pair_count(self):
        # the released MS student: 4 levels, 2 layers/block, cond_proj present
        order = lora_module_order_ms(MSUNetConfig(time_cond_proj_dim=256))
        assert len(order) == 575  # 1150 tensors in unet_lora.pt
        # teacher config (no LCM cond_proj) has one fewer linear
        assert len(lora_module_order_ms(MSUNetConfig())) == 574

    def test_up_blocks_precede_mid(self):
        names = [n for n, _ in lora_module_order_ms(tiny_cfg())]
        i_up = names.index("up_blocks.0.resnets.0.conv1")
        i_mid = names.index("mid_block.resnets.0.conv1")
        i_down = names.index("down_blocks.0.resnets.0.conv1")
        assert i_down < i_up < i_mid  # torch registration order, not dataflow


class TestMSLoraFold:
    def test_fold_matches_up_at_down_everywhere(self, tiny_ms):
        _, params = tiny_ms
        cfg = tiny_cfg()
        order = lora_module_order_ms(cfg)
        rng = np.random.RandomState(0)
        kernels = _kernel_paths(params["params"])
        weights = []
        expected = {}
        for name, kind in order:
            path = _translate_ms(name)
            up, down = _synth_pair(rng, kernels[path], kind)
            weights += [up, down]
            expected[path] = _delta_kernel(up, down, kind).reshape(
                kernels[path].shape
            )
        new = apply_lora_pt_ms(params, weights, cfg)
        for path, delta in expected.items():
            np.testing.assert_allclose(
                _get(new["params"], path),
                _get(params["params"], path) + delta,
                rtol=2e-5, atol=2e-5, err_msg=str(path),
            )

    def test_zero_lora_is_identity_and_changes_forward_otherwise(self, tiny_ms):
        model, params = tiny_ms
        cfg = tiny_cfg()
        order = lora_module_order_ms(cfg)
        kernels = _kernel_paths(params["params"])
        zeros, rand = [], []
        rng = np.random.RandomState(1)
        for name, kind in order:
            up, down = _synth_pair(rng, kernels[_translate_ms(name)], kind)
            zeros += [np.zeros_like(up), down]
            rand += [0.05 * up, 0.05 * down]
        same = apply_lora_pt_ms(params, zeros, cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 24))
        args = (x, jnp.zeros((1,), jnp.int32), ctx)
        kw = dict(timestep_cond=jnp.zeros((1, 8)))
        y0 = model.apply(params, *args, **kw)
        np.testing.assert_allclose(model.apply(same, *args, **kw), y0, atol=1e-6)
        y1 = model.apply(apply_lora_pt_ms(params, rand, cfg), *args, **kw)
        assert float(jnp.abs(y1 - y0).max()) > 1e-4

    def test_wrong_length_raises(self, tiny_ms):
        _, params = tiny_ms
        with pytest.raises(ValueError, match="expected"):
            apply_lora_pt_ms(params, [np.zeros((4, 4))] * 6, tiny_cfg())
