"""Pallas fused normalization kernels (TPU).

Motivation (round-4 trace, PERF_NOTES): `convert_reduce_fusion` — the
f32-stat GroupNorm/LayerNorm reductions (reference GroupNorm32 semantics,
lvdm/basics.py:75-86) — is 17.4% (~25.5 ms) of the 149.5 ms sampling step.
XLA lowers the centered two-pass variance in `ops/norms.py` as two separate
convert+reduce passes over the bf16 activation plus a third read in the
normalize consumer: ~3 HBM reads per norm. These kernels keep the block in
VMEM and do the exact same two-pass centered math with ONE HBM read and one
write, optionally fusing the trailing SiLU (every ResBlock/TemporalConvBlock
GN is GN→SiLU, reference openaimodel3d.py:115-309).

Layout notes:
- GroupNorm reduces over (spatial, C/G) per (frame, group). To avoid
  lane-dimension reshapes (C -> (G, C/G) relayouts are slow/fragile in
  Mosaic), per-group sums are formed from the per-channel column sums via a
  tiny 0/1 group-membership matmul (C, G) built from iota comparisons — MXU
  does the combine and the broadcast back, no relayout anywhere.
- Statistics are exact two-pass (mean, then centered variance) in f32 while
  the data sits in VMEM, so the kernel matches `ops.norms.group_norm`
  bit-for-bit up to f32 reassociation — no E[x^2]-E[x]^2 cancellation risk.

Gradients: the forward is a Pallas kernel; the VJP recomputes the reference
XLA math (`_gn_ref`/`_ln_ref`) and differentiates it — exact gradients, and
the backward cost matches the pre-kernel implementation (training paths are
not the bench headline; correctness and simplicity win).

Dispatch lives in `ops/norms.py::group_norm/layer_norm`: TPU-only (CPU keeps
the pure-XLA path so the CPU test suite does not pay Pallas interpret
overhead), gated by `gn_shape_supported`/`ln_shape_supported` and the
`T2V_FUSED_NORMS` env switch. Parity is gated on-chip in bench.py next to
the flash-attention gates, and off-chip via the interpret-mode tests in
tests/test_ops.py (TestFusedNorms). The public entry points below also
self-guard: an unsupported shape silently falls back to the XLA reference
math instead of failing at Mosaic compile time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norms import _apply_act  # one act table for kernel and XLA fallback


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # uninitialized backend in odd test envs
        return False


# ---------------------------------------------------------------------------
# Reference XLA math (used for the VJP and the CPU path): must match
# ops.norms.group_norm / layer_norm exactly.
# ---------------------------------------------------------------------------


def _gn_ref(x, scale, bias, num_groups, eps, act):
    orig_dtype = x.dtype
    n, hw, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, hw, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, hw, c)
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _apply_act(y, act).astype(orig_dtype)


def _ln_ref(x, scale, bias, eps, act):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _apply_act(y, act).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, act):
    """One frame per program: x_ref (1, HW, C) -> o_ref (1, HW, C)."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // groups
    # 0/1 group membership, both orientations (no in-kernel transpose).
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m_cg = (ci // cg == gi).astype(jnp.float32)  # (C, G)
    gj = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    m_gc = (cj // cg == gj).astype(jnp.float32)  # (G, C)

    # HIGHEST precision: the MXU multiplies in bf16 by default
    # (preferred_element_type only sets the ACCUMULATOR type), and the
    # variance path cannot afford that — s2 entries are O(HW), all positive,
    # so a 0.4% bf16 multiplicand rounding becomes a ~2e-3 rstd error and a
    # ~3e-2 output error (measured on-chip by bench.py's parity gate; the
    # interpret-mode tests can't see it). The dots are (1,C)x(C,G) — the
    # multi-pass f32 decomposition costs nothing at this size.
    hp = jax.lax.Precision.HIGHEST
    inv = 1.0 / (hw * cg)
    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    mean_g = (
        jax.lax.dot(s1, m_cg, precision=hp, preferred_element_type=jnp.float32)
        * inv
    )  # (1, G)
    mean_c = jax.lax.dot(
        mean_g, m_gc, precision=hp, preferred_element_type=jnp.float32
    )
    d = x - mean_c  # (HW, C)
    s2 = jnp.sum(d * d, axis=0, keepdims=True)  # (1, C)
    var_g = (
        jax.lax.dot(s2, m_cg, precision=hp, preferred_element_type=jnp.float32)
        * inv
    )
    rstd_c = jax.lax.dot(
        jax.lax.rsqrt(var_g + eps), m_gc, precision=hp,
        preferred_element_type=jnp.float32,
    )  # (1, C)
    y = d * rstd_c * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    o_ref[0] = _apply_act(y, act).astype(o_ref.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps, act):
    """x_ref (Rb, C): per-row stats over the lane (channel) axis."""
    x = x_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    d = x - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) / c
    y = d * jax.lax.rsqrt(var + eps) * scale_ref[...].astype(
        jnp.float32
    ) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = _apply_act(y, act).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "interpret")
)
def _gn_impl(x, scale, bias, *, num_groups, eps, act, interpret):
    n, hw, c = x.shape
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=num_groups, eps=eps, act=act),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            vec_spec,
            vec_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # True VMEM need is ~24 B/elem of the (HW, C) frame: bf16 in+out
            # double-buffered (8) + f32 x/d/y temps (12) + slack. At the L0
            # production shape (2560, 320) that is ~18.7 MB — over the 16 MB
            # default scoped limit (measured OOM inside the full UNet) but
            # comfortably inside v5e's 128 MB VMEM. The 4 MB f32-frame gate
            # in gn_shape_supported caps the worst case at ~24 MB.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(x, scale2, bias2)


@functools.partial(
    jax.jit, static_argnames=("eps", "act", "block_rows", "interpret")
)
def _ln_impl(x, scale, bias, *, eps, act, block_rows, interpret):
    r, c = x.shape
    r_pad = (r + block_rows - 1) // block_rows * block_rows
    xp = jnp.pad(x, ((0, r_pad - r), (0, 0))) if r_pad != r else x
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, act=act),
        grid=(r_pad // block_rows,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            vec_spec,
            vec_spec,
        ],
        out_specs=pl.BlockSpec(
            (block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(xp, scale2, bias2)
    return out[:r] if r_pad != r else out


# ---------------------------------------------------------------------------
# Public entry points: custom-VJP wrappers over the kernels.
# ---------------------------------------------------------------------------

# VMEM budget: one frame's block lives as bf16 in + f32 temps (x, d) + out;
# cap the f32 footprint so double-buffered blocks fit comfortably in ~16 MB.
_GN_MAX_FRAME_F32_BYTES = 4 * 1024 * 1024
_LN_BLOCK_ROWS = 256


def gn_shape_supported(x_shape, num_groups: int) -> bool:
    """(N, HW, C) eligible for the fused kernel?"""
    if len(x_shape) != 3:
        return False
    n, hw, c = x_shape
    if c % num_groups != 0:
        return False
    return hw * c * 4 <= _GN_MAX_FRAME_F32_BYTES


def ln_shape_supported(x_shape) -> bool:
    """(R, C) eligible for the fused kernel?

    One grid block is (256, C); cap C so block + f32 temps stay well under
    VMEM with double buffering, and skip degenerate tiny rows where the
    pallas_call launch overhead exceeds the reduction it saves.
    """
    if len(x_shape) != 2:
        return False
    r, c = x_shape
    return r >= _LN_BLOCK_ROWS and c * _LN_BLOCK_ROWS * 4 * 4 <= 8 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_group_norm_vjp(
    x, scale, bias, num_groups, eps, act, interpret
):
    return _gn_impl(
        x, scale, bias, num_groups=num_groups, eps=eps, act=act,
        interpret=interpret,
    )


def fused_group_norm(
    x, scale, bias, num_groups=32, eps=1e-5, act=None, interpret=False
):
    """GroupNorm(+act) over (N, HW, C) via one fused Pallas pass.

    Matches `ops.norms.group_norm` (then act) numerically; f32 stats per
    (frame, group), exact centered two-pass variance. Shapes outside the
    VMEM budget fall back to the XLA reference math.
    """
    if not gn_shape_supported(x.shape, num_groups):
        return _gn_ref(x, scale, bias, num_groups, eps, act)
    return _fused_group_norm_vjp(
        x, scale, bias, num_groups, eps, act, interpret
    )


def _gn_fwd(x, scale, bias, num_groups, eps, act, interpret):
    y = _gn_impl(
        x, scale, bias, num_groups=num_groups, eps=eps, act=act,
        interpret=interpret,
    )
    return y, (x, scale, bias)


def _gn_bwd(num_groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_ref(xx, ss, bb, num_groups, eps, act),
        x, scale, bias,
    )
    return vjp(g)


_fused_group_norm_vjp.defvjp(_gn_fwd, _gn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_layer_norm_vjp(x, scale, bias, eps, act, interpret):
    return _ln_impl(
        x, scale, bias, eps=eps, act=act, block_rows=_LN_BLOCK_ROWS,
        interpret=interpret,
    )


def fused_layer_norm(x, scale, bias, eps=1e-5, act=None, interpret=False):
    """LayerNorm(+act) over the trailing axis of (R, C) via one fused pass.

    Matches `ops.norms.layer_norm` (then act) numerically. Shapes outside
    the (R, C) layout or the VMEM budget fall back to the XLA reference
    math, same contract as `fused_group_norm`.
    """
    if not ln_shape_supported(x.shape):
        return _ln_ref(x, scale, bias, eps, act)
    return _fused_layer_norm_vjp(x, scale, bias, eps, act, interpret)


def _ln_fwd(x, scale, bias, eps, act, interpret):
    y = _ln_impl(
        x, scale, bias, eps=eps, act=act, block_rows=_LN_BLOCK_ROWS,
        interpret=interpret,
    )
    return y, (x, scale, bias)


def _ln_bwd(eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _ln_ref(xx, ss, bb, eps, act), x, scale, bias
    )
    return vjp(g)


_fused_layer_norm_vjp.defvjp(_ln_fwd, _ln_bwd)
