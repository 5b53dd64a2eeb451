"""Parity of the unet_lora.pt import path against the reference LoRA lib:
order check via the real reference UNet on the torch meta device, and a
full functional check (inject -> randomize -> save -> collapse in torch vs
import -> fold in JAX)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from conftest import stub_module  # noqa: E402

for _name in ("torchvision", "torchvision.io", "torchvision.utils", "cv2"):
    stub_module(_name)

from t2v_turbo_tpu.io.lora_import import (  # noqa: E402
    apply_lora_pt,
    lora_module_order,
)
from t2v_turbo_tpu.io.torch_import import import_unet_params  # noqa: E402
from t2v_turbo_tpu.models import UNetConfig, UNetModel  # noqa: E402

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


def ref_unet():
    from lvdm.modules.networks.openaimodel3d import UNetModel as RefUNet

    torch.manual_seed(0)
    return RefUNet(**TINY_KW)


class TestOrderParity:
    def test_module_order_matches_reference(self):
        """lora_module_order must equal the reference named_modules() DFS
        over Linear/Conv2d/Conv3d (the unet_lora.pt tensor order)."""
        ref = ref_unet()
        expected = [
            name
            for name, mod in ref.named_modules()
            if isinstance(mod, (torch.nn.Linear, torch.nn.Conv2d, torch.nn.Conv3d))
        ]
        ours = [name for name, _ in lora_module_order(TINY_CFG)]
        assert ours == expected


class TestCollapseParity:
    def test_fold_matches_torch_collapse(self):
        """Inject LoRA into the torch reference, randomize factors, save the
        weight list, collapse in torch; the JAX import must reproduce the
        collapsed model's forward output."""
        from utils.lora import (
            collapse_lora,
            extract_lora_ups_down,
            inject_trainable_lora_extended,
            monkeypatch_remove_lora,
        )

        ref = ref_unet()
        inject_trainable_lora_extended(ref, {"UNetModel"}, r=2)
        # randomize up factors (zero-init by default -> no-op otherwise)
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
        ref = ref.eval()

        base_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        # base_sd is ALREADY collapsed; rebuild the pre-collapse base by
        # subtracting? Instead: import collapsed weights directly as oracle,
        # and separately import the pre-collapse base + apply_lora_pt.
        ref2 = ref_unet()  # same seed -> same base weights
        pre_sd = {k: v.detach().numpy() for k, v in ref2.state_dict().items()}

        params_collapsed = {"params": import_unet_params(base_sd, TINY_CFG)}
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
