"""Config loading: the reference's OmegaConf YAML schema -> typed dataclasses.

Replaces reflective `instantiate_from_config` (reference utils/utils.py:29-44,
configs/inference_t2v_512_v2.0.yaml) with explicit parsing into UNetConfig /
VAEConfig / schedule parameters; no dynamic imports.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

from .diffusion import DiffusionSchedule
from .models.unet_vc2 import UNetConfig
from .models.vae import VAEConfig


@dataclasses.dataclass(frozen=True)
class VC2ModelSpec:
    unet: UNetConfig
    vae: VAEConfig
    schedule_kwargs: Dict[str, Any]
    scale_factor: float = 0.18215
    use_scale: bool = True  # VC2 latent scaling during q_sample
    scale_b: float = 0.7

    def make_schedule(self, **overrides) -> DiffusionSchedule:
        kw = dict(self.schedule_kwargs)
        kw.update(overrides)
        return DiffusionSchedule.create(**kw)


def load_vc2_config(
    path: str,
    time_cond_proj_dim: Optional[int] = None,
    motion_cond_proj_dim: Optional[int] = None,
) -> VC2ModelSpec:
    """Parse an inference_t2v_512_v2.0.yaml-style config.

    time_cond_proj_dim/motion_cond_proj_dim build LCM students from a teacher
    config (the trainers mutate the loaded config the same way, reference
    train_t2v_turbo_v1_lora.py:630-641)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    mp = raw["model"]["params"]
    up = mp["unet_config"]["params"]
    dd = mp["first_stage_config"]["params"]["ddconfig"]

    unet = UNetConfig(
        in_channels=up["in_channels"],
        out_channels=up["out_channels"],
        model_channels=up["model_channels"],
        num_res_blocks=up["num_res_blocks"],
        attention_resolutions=tuple(up["attention_resolutions"]),
        channel_mult=tuple(up.get("channel_mult", (1, 2, 4, 8))),
        num_head_channels=up.get("num_head_channels", 64),
        transformer_depth=up.get("transformer_depth", 1),
        context_dim=up.get("context_dim"),
        temporal_conv=up.get("temporal_conv", False),
        temporal_attention=up.get("temporal_attention", True),
        temporal_selfatt_only=up.get("temporal_selfatt_only", True),
        use_relative_position=up.get("use_relative_position", False),
        use_causal_attention=up.get("use_causal_attention", False),
        temporal_length=up.get("temporal_length", 16),
        addition_attention=up.get("addition_attention", False),
        fps_cond=up.get("fps_cond", False),
        time_cond_proj_dim=time_cond_proj_dim or up.get("time_cond_proj_dim"),
        motion_cond_proj_dim=motion_cond_proj_dim or up.get("motion_cond_proj_dim"),
    )
    vae = VAEConfig(
        in_channels=dd["in_channels"],
        out_channels=dd["out_ch"],
        ch=dd["ch"],
        ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"],
        z_channels=dd["z_channels"],
        embed_dim=mp["first_stage_config"]["params"]["embed_dim"],
        double_z=dd.get("double_z", True),
        scale_factor=mp.get("scale_factor", 0.18215),
    )
    schedule_kwargs = dict(
        num_timesteps=mp.get("timesteps", 1000),
        beta_schedule="scaled_linear",
        linear_start=mp.get("linear_start", 0.00085),
        linear_end=mp.get("linear_end", 0.012),
        use_scale=mp.get("use_scale", False),
        scale_b=mp.get("scale_b", 0.7),
    )
    return VC2ModelSpec(
        unet=unet,
        vae=vae,
        schedule_kwargs=schedule_kwargs,
        scale_factor=mp.get("scale_factor", 0.18215),
        use_scale=mp.get("use_scale", False),
        scale_b=mp.get("scale_b", 0.7),
    )
