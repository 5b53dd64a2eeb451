"""Normalization ops (channels-last).

GroupNorm is computed in float32 regardless of input dtype — the reference's
GroupNorm32 semantics (reference lvdm/basics.py:75-86) — then cast back, so
bf16 activations don't lose normalization precision on TPU.

Dispatch: on a single-TPU process these route eligible shapes to the fused
Pallas kernels in `ops/fused_norms.py` (one HBM read + one write instead of
XLA's convert+reduce multi-pass — the `convert_reduce_fusion` trace slice,
17.4% of the r3 sampling step). Eligibility is decided at trace time:

  - platform is TPU and the process drives ONE device (the kernels carry no
    partitioning rules, so under a real multi-chip mesh the XLA path keeps
    sharding-transparent semantics; CPU keeps pure XLA so the test suite
    never pays Pallas interpret overhead),
  - the per-frame f32 block fits the VMEM budget
    (`fused_norms.gn_shape_supported` / `ln_shape_supported`),
  - `T2V_FUSED_NORMS` is not "0" (kill switch; "force" skips the
    single-device gate for experiments).

The optional `act="silu"` fuses the trailing activation every ResBlock /
TemporalConvBlock / VAE ResnetBlock applies after its GN (reference
openaimodel3d.py:115-309, ae_modules.py), saving one more elementwise
read+write on the XLA side of a Pallas-call boundary. Both paths compute
identical math (fused kernels are exact two-pass f32; parity is gated
on-chip in bench.py and off-chip in tests/test_ops.py interpret-mode tests).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _apply_act(y, act):
    if act is None:
        return y
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    raise ValueError(f"unsupported fused activation: {act}")


def _fused_enabled() -> bool:
    flag = os.environ.get("T2V_FUSED_NORMS", "1")
    if flag == "0":
        return False
    try:
        devs = jax.devices()
    except RuntimeError:  # uninitialized backend in odd test envs
        return False
    if devs[0].platform != "tpu":
        return False
    return flag == "force" or len(devs) == 1


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    """GroupNorm (optionally + activation) over the trailing channel axis.

    All leading axes after the first are treated as spatial; statistics are
    computed per group over (spatial..., C/G) exactly like torch GroupNorm
    on NCHW.
    """
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    lead = x.shape[:1]  # batch
    spatial = x.shape[1:-1]

    if _fused_enabled() and len(x.shape) >= 3:
        from .fused_norms import fused_group_norm, gn_shape_supported

        hw = 1
        for s in spatial:
            hw *= s
        if gn_shape_supported((lead[0], hw, c), num_groups):
            y = fused_group_norm(
                x.reshape(lead[0], hw, c), scale, bias, num_groups, eps, act
            )
            return y.reshape(lead + spatial + (c,))

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(lead + (-1, num_groups, c // num_groups))
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(lead + spatial + (c,))
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _apply_act(y, act).astype(orig_dtype)


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    c = x.shape[-1]

    if _fused_enabled() and len(x.shape) >= 2:
        from .fused_norms import fused_layer_norm, ln_shape_supported

        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if ln_shape_supported((rows, c)):
            y = fused_layer_norm(x.reshape(rows, c), scale, bias, eps, act)
            return y.reshape(x.shape)

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _apply_act(y, act).astype(orig_dtype)
