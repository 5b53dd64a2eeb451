"""EMA of parameters (the v2 trainer's target network,
reference train_latent_t2v_turbo_v2.py:671-675,1272-1276 and lvdm/ema.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def update_ema(ema_params, params, decay: float = 0.95):
    """ema <- decay*ema + (1-decay)*params (reference utils/common_utils.py:307-312)."""
    return jax.tree.map(
        lambda e, p: (decay * e + (1.0 - decay) * p.astype(e.dtype)).astype(e.dtype),
        ema_params,
        params,
    )


def warmup_decay(step: jax.Array, decay: float = 0.9999, inv_gamma: float = 1.0, power: float = 1.0):
    """LitEma-style warmup: decay_t = min(decay, (1+t)/(10+t))
    (reference lvdm/ema.py:14-26 uses num_updates warmup)."""
    t = step.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + t) / (10.0 + t))
