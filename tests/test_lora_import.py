"""Parity of the unet_lora.pt import path against the reference LoRA lib,
via committed golden fixtures: the reference's named_modules() order list,
a pre-collapse base state dict, the saved LoRA weight list, and the
torch-collapsed state dict. When the golden is missing it is regenerated
live from torch + the reference mount (inject -> randomize -> save ->
collapse_lora) and saved."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

import goldens
from t2v_turbo_tpu.io.lora_import import apply_lora_pt, lora_module_order
from t2v_turbo_tpu.io.torch_import import import_unet_params
from t2v_turbo_tpu.models import UNetConfig, UNetModel

REF = "/root/reference"

TINY_KW = dict(
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
TINY_CFG = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
    context_dim=24, temporal_length=4, time_cond_proj_dim=8,
)


def _gen_golden():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from conftest import stub_module

    for _name in ("torchvision", "torchvision.io", "torchvision.utils", "cv2"):
        stub_module(_name)
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet
    from utils.lora import (
        collapse_lora,
        extract_lora_ups_down,
        inject_trainable_lora_extended,
        monkeypatch_remove_lora,
    )

    def ref_unet():
        torch.manual_seed(0)
        return RefUNet(**TINY_KW)

    ref = ref_unet()
    order = [
        name
        for name, mod in ref.named_modules()
        if isinstance(mod, (torch.nn.Linear, torch.nn.Conv2d, torch.nn.Conv3d))
    ]
    pre_sd = {k: v.detach().numpy() for k, v in ref_unet().state_dict().items()}

    inject_trainable_lora_extended(ref, {"UNetModel"}, r=2)
    g = torch.Generator().manual_seed(1)
    for up, down in extract_lora_ups_down(ref, {"UNetModel"}):
        with torch.no_grad():
            up.weight.copy_(torch.randn(up.weight.shape, generator=g) * 0.05)
    weights = []
    for up, down in extract_lora_ups_down(ref, {"UNetModel"}):
        weights.append(up.weight.detach().float().numpy())
        weights.append(down.weight.detach().float().numpy())
    collapse_lora(ref, {"UNetModel"})
    monkeypatch_remove_lora(ref)
    collapsed_sd = {k: v.detach().numpy() for k, v in ref.eval().state_dict().items()}

    gold = {"order": np.asarray(order)}
    gold.update({f"pre_sd.{k}": v for k, v in pre_sd.items()})
    gold.update({f"collapsed_sd.{k}": v for k, v in collapsed_sd.items()})
    gold.update({f"lora.{i:04d}": w for i, w in enumerate(weights)})
    return gold


@pytest.fixture(scope="module")
def gold():
    g = goldens.load("vc2_lora_tiny")
    if g is None:
        g = _gen_golden()
        goldens.save("vc2_lora_tiny", g)
    return g


class TestOrderParity:
    def test_module_order_matches_reference(self, gold):
        """lora_module_order must equal the reference named_modules() DFS
        over Linear/Conv2d/Conv3d (the unet_lora.pt tensor order)."""
        expected = [str(s) for s in gold["order"]]
        ours = [name for name, _ in lora_module_order(TINY_CFG)]
        assert ours == expected


class TestCollapseParity:
    def test_fold_matches_torch_collapse(self, gold):
        """Importing the torch-collapsed weights and importing the
        pre-collapse base + folding the saved LoRA list must produce the
        same forward output."""
        pre_sd = goldens.subdict(gold, "pre_sd")
        collapsed_sd = goldens.subdict(gold, "collapsed_sd")
        n = len([k for k in gold if k.startswith("lora.")])
        weights = [gold[f"lora.{i:04d}"] for i in range(n)]

        params_collapsed = {"params": import_unet_params(collapsed_sd, TINY_CFG)}
        params_folded = apply_lora_pt(
            {"params": import_unet_params(pre_sd, TINY_CFG)}, weights, TINY_CFG
        )

        model = UNetModel(cfg=TINY_CFG)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 4, 8, 8, 4).astype(np.float32))
        ctx = jnp.asarray(rng.randn(1, 7, 24).astype(np.float32))
        kw = dict(
            fps=jnp.asarray([16.0]),
            timestep_cond=jnp.asarray(rng.randn(1, 8).astype(np.float32)),
        )
        o1 = model.apply(params_collapsed, x, jnp.asarray([500]), ctx, **kw)
        o2 = model.apply(params_folded, x, jnp.asarray([500]), ctx, **kw)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
