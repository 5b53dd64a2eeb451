"""T2V-Turbo (ModelScope) prompt->video pipeline.

Equivalent of reference pipeline/t2v_turbo_ms_pipeline.py:15-221: the same
LCM multistep loop as the VC2 pipeline, driving the diffusers-style
UNet3DConditionModel (no fps conditioning, 256x256 default operating point,
HF CLIP text tower with full depth). Shares all machinery with
T2VTurboVC2Pipeline; only the denoiser invocation differs.
"""

from __future__ import annotations

import dataclasses

from .vc2 import T2VTurboVC2Pipeline


@dataclasses.dataclass
class T2VTurboMSPipeline(T2VTurboVC2Pipeline):
    def _unet_call(self, unet_params, lat, tb, ctx, fps, w_emb, motion_cond):
        # MS UNet: no fps / motion conditioning (reference ms pipeline:186-200
        # passes only w-embedding)
        return self.unet.apply(unet_params, lat, tb, ctx, timestep_cond=w_emb)

    def __call__(self, *args, **kwargs):
        kwargs.setdefault("height", 256)
        kwargs.setdefault("width", 256)
        return super().__call__(*args, **kwargs)
