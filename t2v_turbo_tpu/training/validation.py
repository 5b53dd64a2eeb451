"""Periodic validation-video rendering during training.

The reference renders a fixed 10-prompt set at 8 and 16 steps every
--validation_steps and logs the clips to wandb
(utils/common_utils.py:322-387). Here the same prompts render through the
pipeline and land as mp4/gif files under <output_dir>/validation/ plus a
JSONL index — observability without a tracking-service dependency.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

# the reference's fixed validation set (utils/common_utils.py:325-338)
DEFAULT_VALIDATION_PROMPTS = (
    "An astronaut riding a horse.",
    "Darth vader surfing in waves.",
    "Robot dancing in times square.",
    "Clown fish swimming through the coral reef.",
    "A child excitedly swings on a rusty swing set, laughter filling the air.",
    "With the style of van gogh, A young couple dances under the moonlight by the lake.",
    "A young woman with glasses is jogging in the park wearing a pink headband.",
    "Impressionist style, a yellow rubber duck floating on the wave on the sunset",
    "Wolf, turns its head, in the wild",
    "Iron man, walks, on the moon, 8k, high detailed, best quality",
)


def make_validation_logger(
    pipe,
    output_dir: str,
    prompts: Optional[Sequence[str]] = None,
    step_counts: Sequence[int] = (8, 16),
    frames: int = 16,
    height: int = 320,
    width: int = 512,
    save_fps: int = 8,
    max_prompts: Optional[int] = None,
):
    """Returns validation_fn(step, unet_params) for LCDTrainer.run."""
    import jax

    from ..io.video import save_video
    from ..pipelines.vc2 import video_to_uint8

    prompts = list(prompts or DEFAULT_VALIDATION_PROMPTS)
    if max_prompts:
        prompts = prompts[:max_prompts]
    vdir = os.path.join(output_dir, "validation")
    os.makedirs(vdir, exist_ok=True)
    index_path = os.path.join(vdir, "index.jsonl")

    def validation_fn(step: int, unet_params):
        old = pipe.unet_params
        pipe.unet_params = unet_params
        try:
            for n_steps in step_counts:
                for i, prompt in enumerate(prompts):
                    video = pipe(
                        prompt=prompt,
                        height=height,
                        width=width,
                        frames=frames,
                        num_inference_steps=n_steps,
                        key=jax.random.PRNGKey(i),
                    )
                    name = f"step{step:07d}_s{n_steps}_p{i}.mp4"
                    path = save_video(
                        video_to_uint8(video)[0], os.path.join(vdir, name),
                        fps=save_fps,
                    )
                    with open(index_path, "a") as f:
                        f.write(json.dumps({
                            "step": step, "sample_steps": n_steps,
                            "prompt": prompt, "path": path,
                        }) + "\n")
        finally:
            pipe.unet_params = old

    return validation_fn
