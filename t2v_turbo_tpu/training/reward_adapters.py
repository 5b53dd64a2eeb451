"""Adapters connecting reward models to the LCD losses.

The reference decodes a few frames of the student's predicted x_0 inside the
loss and backprops the (negated) reward through the VAE into the UNet
(train_t2v_turbo_v1_lora.py:1043-1098). These adapters build the
`reward_fn(model_pred, batch) -> (B,) rewards` callables `lcd_loss` /
`lcd_v2_loss` expect:

- image reward: `reward_frame_idx` frames of each sample are VAE-decoded and
  scored against precomputed text features (`reward_text_feats` in the
  batch), mirroring the random-frame selection (`:1049`) — frame indices are
  data, so the same jitted program serves every step.
- video reward: `video_frame_idx` strided frames -> video tower
  (`:1066-1098`).

Text features are produced by `precompute_text_feats` on the host side of
the input pipeline (the reference's no-grad text branches).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def chunked_decode(vae, vae_params, frames: jax.Array, decode_chunk=None):
    """VAE-decode (N, h, w, C) latents `decode_chunk` frames at a time
    (the reference's --vae_decode_batch_size micro-batching,
    train_t2v_turbo_v1_lora.py:416-435). Each chunk runs under
    jax.checkpoint, so the decoder's backward pass recomputes one chunk's
    activations at a time instead of holding every chunk's residuals live
    — this is what bounds the reward path's peak memory, not the chunked
    forward alone."""
    n = frames.shape[0]
    if not decode_chunk or decode_chunk >= n:
        return vae.apply(vae_params, frames, method=vae.decode)
    chunks = -(-n // decode_chunk)
    pad = chunks * decode_chunk - n
    fr = frames
    if pad:
        fr = jnp.pad(fr, ((0, pad),) + ((0, 0),) * (frames.ndim - 1))
    fr = fr.reshape(chunks, decode_chunk, *frames.shape[1:])
    dec = jax.checkpoint(
        lambda f: vae.apply(vae_params, f, method=vae.decode)
    )
    out = jax.lax.map(dec, fr)
    out = out.reshape(chunks * decode_chunk, *out.shape[2:])
    return out[:n] if pad else out


def make_image_reward_fn(
    vae,
    vae_params,
    reward_model,
    scale_factor: float = 0.18215,
    decode_chunk: Optional[int] = None,
) -> Callable:
    def reward_fn(model_pred: jax.Array, batch: dict) -> jax.Array:
        """model_pred: (B, T, h, w, C) predicted clean latents."""
        idx = batch["reward_frame_idx"]  # (B, n_frames) int32
        feats = batch["reward_text_feats"]  # (B, D) normalized
        b, t = model_pred.shape[:2]
        n = idx.shape[1]
        sel = jnp.take_along_axis(
            model_pred, idx[:, :, None, None, None], axis=1
        )  # (B, n, h, w, C)
        frames = sel.reshape(b * n, *sel.shape[2:]) / scale_factor
        imgs = chunked_decode(vae, vae_params, frames, decode_chunk)
        imgs = jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)  # (B*n, H, W, 3)
        feats_rep = jnp.repeat(feats, n, axis=0)
        scores = reward_model.score(imgs, feats_rep)  # (B*n,)
        return scores.reshape(b, n).mean(axis=1)

    return reward_fn


def make_video_reward_fn(
    vae,
    vae_params,
    video_reward_model,
    scale_factor: float = 0.18215,
    decode_chunk: Optional[int] = None,
) -> Callable:
    def reward_fn(model_pred: jax.Array, batch: dict) -> jax.Array:
        idx = batch["video_frame_idx"]  # (B, n) int32 strided frames
        feats = batch["video_text_feats"]  # (B, D)
        b = model_pred.shape[0]
        n = idx.shape[1]
        sel = jnp.take_along_axis(
            model_pred, idx[:, :, None, None, None], axis=1
        )
        frames = sel.reshape(b * n, *sel.shape[2:]) / scale_factor
        imgs = chunked_decode(vae, vae_params, frames, decode_chunk)
        imgs = jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
        vids = imgs.reshape(b, n, *imgs.shape[1:])
        return video_reward_model.score(vids, feats)

    return reward_fn


def make_reward_fn_factory(
    vae,
    vae_params,
    image_rm=None,
    video_rm=None,
    scale_factor: float = 0.18215,
    decode_chunk: Optional[int] = None,
):
    """Build `(factory, reward_params)` for
    `LCDTrainer(reward_fn_factory=factory, reward_params=reward_params)`.

    The plain `make_image_reward_fn`/`make_video_reward_fn` closures capture
    the VAE + tower param trees, which jit bakes into the lowered program as
    constants — gigabytes of serialized proto per compile at full size, and
    any sharding on them is lost. This factory instead exposes those trees
    as `reward_params` (the trainer threads them through the step as runtime
    args, under `frozen["rewards"]`, where FSDP shards them like every other
    frozen tower) and rebuilds the reward closures INSIDE the traced loss
    over the tracer subtree via each model's `with_grad_path_params`."""
    reward_params = {"vae": vae_params}
    if image_rm is not None:
        reward_params["image"] = image_rm.grad_path_params
    if video_rm is not None:
        reward_params["video"] = video_rm.grad_path_params

    def factory(rp):
        rf = vrf = None
        if image_rm is not None:
            rf = make_image_reward_fn(
                vae,
                rp["vae"],
                image_rm.with_grad_path_params(rp["image"]),
                scale_factor=scale_factor,
                decode_chunk=decode_chunk,
            )
        if video_rm is not None:
            vrf = make_video_reward_fn(
                vae,
                rp["vae"],
                video_rm.with_grad_path_params(rp["video"]),
                scale_factor=scale_factor,
                decode_chunk=decode_chunk,
            )
        return rf, vrf

    return factory, reward_params


def sample_frame_indices(
    rng, batch_size: int, total_frames: int, n_frames: int, strided: bool = False
):
    """Host-side frame selection per the reference: random permutation for
    the image reward (:1049), random-offset stride for the video reward
    (:1071-1076)."""
    import numpy as np

    out = np.zeros((batch_size, n_frames), np.int32)
    if strided:
        skip = total_frames // n_frames
        for i in range(batch_size):
            start = rng.randint(0, max(skip, 1))
            out[i] = np.arange(start, total_frames, skip)[:n_frames]
    else:
        for i in range(batch_size):
            out[i] = rng.permutation(total_frames)[:n_frames]
    return out


def precompute_text_feats(reward_model, texts):
    """Host helper: normalized, stop-gradient text features for a batch."""
    return reward_model.encode_texts(list(texts))
