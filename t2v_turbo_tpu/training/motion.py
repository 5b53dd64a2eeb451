"""MotionClone motion-prior machinery: temporal-attention prob capture,
rank-k attention loss, score via jax.grad, and the DDIM inversion loop.

Rebuild of reference motion_prior_sample.py:27-84 and
utils/common_utils.py:446-478. The reference tapped temporal attn1 probs of
output_blocks 3..11 via module hooks; here the UNet sows them
(models/unet_vc2.py record_probs) — exactly the nine output-block temporal
transformers, since blocks 0-2 (ds=8) carry no attention. The score is a
plain jax.grad through the capture path (the reference needed
torch.autograd.grad against module state).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..diffusion import DDIMSolver


def temp_attn_probs(
    unet_apply_mutable: Callable,
    params,
    latents: jax.Array,
    ts: jax.Array,
    ctx: jax.Array,
    fps=None,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Run the UNet capturing temporal attention probs.

    unet_apply_mutable(params, z, ts, ctx, fps) must call
    model.apply(..., record_probs=True, mutable=["intermediates"]) and return
    (model_output, intermediates). Returns (eps_pred, [probs...]) with probs
    (B·H·W·heads, T, T) in sow order (output blocks ascending).
    """
    out, inter = unet_apply_mutable(params, latents, ts, ctx, fps)
    leaves = [
        v
        for _, v in sorted(
            jax.tree_util.tree_flatten_with_path(inter)[0],
            key=lambda kv: jax.tree_util.keystr(kv[0]),
        )
    ]
    return out, leaves


def motion_rank_loss(
    probs: Sequence[jax.Array],
    probs_ref: Sequence[jax.Array],
    rank_k: int = 1,
    scale: float = 100.0,
) -> jax.Array:
    """Mean over layers of masked MSE on the top-rank_k reference entries
    (reference calculate_motion_rank_new / compute_temp_loss, x100)."""
    losses = []
    for gen, ref in zip(probs, probs_ref):
        ref = jax.lax.stop_gradient(ref)
        if rank_k == 0:
            losses.append(jnp.zeros(()))
            continue
        t = ref.shape[-1]
        assert rank_k <= t, (rank_k, t)
        thresh = jnp.sort(ref, axis=-1)[..., -rank_k][..., None]
        mask = ref >= thresh
        diff2 = jnp.square(ref - gen) * mask
        losses.append(diff2.sum() / jnp.maximum(mask.sum(), 1))
    return jnp.stack(losses).mean() * scale


def motion_prior_score(
    unet_apply_mutable: Callable,
    params,
    latents: jax.Array,
    ts: jax.Array,
    example_latents: jax.Array,
    original_ctx: jax.Array,
    inference_ctx: jax.Array,
    fps=None,
    temp_loss_scale: float = 1.0,
    rank_k: int = 1,
    return_loss: bool = False,
) -> Tuple[jax.Array, ...]:
    """score = ∇_latents MotionClone loss; also returns the cond teacher
    output at `latents` (reference get_motion_prior_score:59-84).

    return_loss=True appends the UNSCALED rank loss — the motion statistic
    itself — so callers (guided sampling traces, effectiveness tests) can
    observe how far the temporal-attention pattern sits from the reference's
    without paying a second capture forward. The scale multiplies only the
    score, exactly as the reference's temp_loss_scale does."""
    _, probs_ref = temp_attn_probs(
        unet_apply_mutable, params, example_latents, ts, original_ctx, fps
    )
    probs_ref = jax.lax.stop_gradient(probs_ref)

    def loss_fn(z):
        out, probs = temp_attn_probs(
            unet_apply_mutable, params, z, ts, inference_ctx, fps
        )
        raw = motion_rank_loss(probs, probs_ref, rank_k)
        return temp_loss_scale * raw, (out, raw)

    (_, (cond_out, raw)), score = jax.value_and_grad(
        loss_fn, has_aux=True
    )(latents)
    out = (jax.lax.stop_gradient(score), jax.lax.stop_gradient(cond_out))
    if return_loss:
        out = out + (jax.lax.stop_gradient(raw),)
    return out


def reverse_ddim_loop(
    unet_apply: Callable,
    params,
    latents: jax.Array,
    ctx: jax.Array,
    solver: DDIMSolver,
    num_steps: int,
    fps=None,
    return_intermediates: bool = True,
):
    """DDIM inversion: clean latents -> noised trajectory over the first
    `num_steps` grid points (reference motion_prior_sample.py:27-37).
    Returns the stacked intermediate latents (num_steps, B, ...) or the final.
    """
    b = latents.shape[0]

    def body(lat, i):
        ts = jnp.broadcast_to(solver.index_to_timestep(i), (b,))
        eps = unet_apply(params, lat, ts, ctx, fps=fps).astype(jnp.float32)
        lat = solver.ddim_reverse_step(lat, eps, ts)
        return lat, lat

    final, inter = jax.lax.scan(body, latents, jnp.arange(num_steps))
    return inter if return_intermediates else final
