"""Attention ops: Pallas TPU flash-attention + XLA reference paths.

Replaces the reference's xformers `memory_efficient_attention` /
flash-attn CUDA kernels (reference lvdm/modules/attention.py:96-97,206,220 and
intern_vid2 flash_attention_class.py) with a TPU-native design:

- `flash_attention`: tiled online-softmax Pallas kernel for the big-sequence
  spatial self-attention (S = H·W up to a few thousand) hot path. bf16/f32
  IO, f32 accumulation on the MXU, K-side padding masks. The custom VJP is
  also Pallas: the forward saves per-row log-sum-exp and the backward
  recomputes probabilities blockwise (flash-attention backward — dK/dV with
  sequential Q accumulation, dQ with sequential K), so training memory stays
  O(S) instead of the O(S^2) an XLA recompute would materialize.
- `attention_xla`: plain einsum attention with f32 softmax — the reference
  semantics (lvdm/modules/attention.py:102-164) — used for tiny temporal
  sequences (t ≤ 48, where a flash kernel buys nothing), for rel-pos bias /
  causal masks / attention-prob capture (MotionClone), and as the numerical
  oracle in tests.

Shapes follow the JAX convention: q (B, Hq, Sq, D), k/v (B, H, Sk, D).

Status of the BSHD (layout-native) kernel family: built and measured in
round 2 (PERF_NOTES.md r2 #1) — the head-loop BSHD kernel is ~40% slower
than transposing into the BHSD kernel (XLA fuses the transposes to ~free),
so the production dispatcher `sdpa_bshd` deliberately routes BHSD. The BSHD
kernels are kept, unit-tested (tests/test_ops.py), as the measured
alternative: if a future TPU generation or Mosaic release changes the
strided-write cost, flipping the dispatch is a one-line change backed by
existing tests. They are NOT on the hot path today.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _rows(ref):
    """Normalize a q/k/v/g/o block ref to (rows, d): handles both the BHSD
    block (1, block, d) and the BSHD block (1, block, 1, d)."""
    return ref[...].reshape(-1, ref.shape[-1])


def _lse_rows(ref):
    """Normalize an lse/delta block ref to a (block_q, 1) column: handles
    both (1, 8, block_q) and (1, 1, 8, block_q) blocks (rows are
    sublane-replicated 8x for TPU tiling)."""
    return ref[...].reshape(8, -1)[0][:, None]


# ---------------------------------------------------------------------------
# XLA reference attention (also the flash backward / oracle)
# ---------------------------------------------------------------------------


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    return_probs: bool = False,
):
    """Einsum attention with f32 softmax.

    bias: optional additive logits bias broadcastable to (B, H, Sq, Sk)
    (used for temporal relative-position embeddings).
    return_probs: also return the post-softmax probabilities — the
    MotionClone `record_attn_probs` hook (reference attention.py:124-126).
    """
    *_, sq, d = q.shape
    sk = k.shape[-2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    if return_probs:
        return out, probs
    return out


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _flash_fwd_kernel_lse(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, kv_len, block_k, k_axis=2
):
    """Forward that also emits the log-sum-exp rows (for the Pallas backward)."""
    kb = pl.program_id(k_axis)
    nk = pl.num_programs(k_axis)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = _rows(q_ref)
    k = _rows(k_ref)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), _rows(v_ref), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    m_ref[:] = m_next
    l_ref[:] = l_next

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[...] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype).reshape(
            o_ref.shape
        )
        # (8, block_q) sublane-replicated rows: TPU tiling needs the
        # second-to-last block dim divisible by 8
        lse_row = (m_ref[:] + jnp.log(l_ref[:]))[:, 0]
        lse_ref[...] = jnp.broadcast_to(
            lse_row[None, :], (8, lse_row.shape[0])
        ).reshape(lse_ref.shape)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, kv_len, block_k, k_axis=1, q_axis=2
):
    """dK/dV: grid (..., nk, nq); q innermost (sequential) accumulates."""
    qb = pl.program_id(q_axis)
    nq = pl.num_programs(q_axis)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = _rows(q_ref)  # (bq, d)
    k = _rows(k_ref)  # (bk, d)
    v = _rows(v_ref)
    g = _rows(g_ref).astype(jnp.float32)  # (bq, d)
    lse = _lse_rows(lse_ref)  # (bq, 1)
    delta = _lse_rows(delta_ref)  # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    kb_idx = pl.program_id(k_axis)
    col = kb_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # (bq, bk)

    # dV += P^T g
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # dP = g V^T ; dS = P * (dP - delta)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    ds = p * (dp - delta)
    # dK += dS^T q * scale
    dk_acc[:] = dk_acc[:] + scale * jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(qb == nq - 1)
    def _finalize():
        dk_ref[...] = dk_acc[:].astype(dk_ref.dtype).reshape(dk_ref.shape)
        dv_ref[...] = dv_acc[:].astype(dv_ref.dtype).reshape(dv_ref.shape)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_k, k_axis=2
):
    """dQ: grid (..., nq, nk); k innermost (sequential) accumulates."""
    kb = pl.program_id(k_axis)
    nk = pl.num_programs(k_axis)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = _rows(q_ref)
    k = _rows(k_ref)
    v = _rows(v_ref)
    g = _rows(g_ref).astype(jnp.float32)
    lse = _lse_rows(lse_ref)
    delta = _lse_rows(delta_ref)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    ds = p * (dp - delta)
    dq_acc[:] = dq_acc[:] + scale * jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(kb == nk - 1)
    def _finalize():
        dq_ref[...] = dq_acc[:].astype(dq_ref.dtype).reshape(dq_ref.shape)


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale, kv_len, block_k, k_axis=2
):
    """Online-softmax flash attention.

    Grid: (..., num_q_blocks, num_k_blocks); the K dimension is innermost and
    executed sequentially on TPU, so (acc, m, l) scratch carries the running
    softmax state across K blocks.
    """
    kb = pl.program_id(k_axis)
    nk = pl.num_programs(k_axis)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = _rows(q_ref)  # (block_q, d)
    k = _rows(k_ref)  # (block_k, d)
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    s = s * scale

    # mask out-of-range K columns (padding to block multiple)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

    m_prev = m_ref[:]  # (block_q, 1)
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        _rows(v_ref),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    m_ref[:] = m_next
    l_ref[:] = l_next

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[...] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype).reshape(
            o_ref.shape
        )


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_fwd_impl(
    q, k, v, *, scale, block_q=512, block_k=512, interpret=False
):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _ceil_to(sq, 128))
    block_k = min(block_k, _ceil_to(sk, 128))

    sq_p = _ceil_to(sq, block_q)
    sk_p = _ceil_to(sk, block_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))

    bh = b * h
    qr = q.reshape(bh, sq_p, d)
    kr = k.reshape(bh, sk_p, d)
    vr = v.reshape(bh, sk_p, d)

    grid = (bh, sq_p // block_q, sk_p // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, scale=scale, kv_len=sk, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qr, kr, vr)
    return out.reshape(b, h, sq_p, d)[:, :, :sq, :]


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_fwd_lse_impl(
    q, k, v, *, scale, block_q=512, block_k=512, interpret=False
):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _ceil_to(sq, 128))
    block_k = min(block_k, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    bh = b * h
    qr, kr, vr = (t.reshape(bh, -1, d) for t in (q, k, v))
    grid = (bh, sq_p // block_q, sk_p // block_k)
    o, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel_lse, scale=scale, kv_len=sk, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda g, i, j: (g, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq_p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qr, kr, vr)
    return (
        o.reshape(b, h, sq_p, d)[:, :, :sq],
        lse[:, 0].reshape(b, h, sq_p)[:, :, :sq],
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_attention_bwd_impl(
    q, k, v, o, lse, g, *, scale, block_q=512, block_k=512, interpret=False
):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _ceil_to(sq, 128))
    block_k = min(block_k, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)

    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (b, h, sq)
    if sq_p != sq:
        pad_q = ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))
        q = jnp.pad(q, pad_q)
        g = jnp.pad(g, pad_q)
        # padded q rows: make exp(s - lse) = 0 via lse = +inf would produce
        # nan in exp(-inf - inf); use a large finite lse so p ~ 0
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)),
                      constant_values=1e9)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    if sk_p != sk:
        pad_k = ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))
        k = jnp.pad(k, pad_k)
        v = jnp.pad(v, pad_k)

    bh = b * h
    qr, kr, vr, gr = (t.reshape(bh, -1, d) for t in (q, k, v, g))
    lser = jnp.broadcast_to(lse.reshape(bh, 1, -1), (bh, 8, sq_p))
    deltar = jnp.broadcast_to(delta.reshape(bh, 1, -1), (bh, 8, sq_p))

    # dK/dV: grid (bh, nk, nq), q sequential
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, kv_len=sk, block_k=block_k
        ),
        grid=(bh, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g_, j, i: (g_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g_, j, i: (g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g_, j, i: (g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda g_, j, i: (g_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda g_, j, i: (g_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda g_, j, i: (g_, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda g_, j, i: (g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g_, j, i: (g_, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qr, kr, vr, gr, lser, deltar)

    # dQ: grid (bh, nq, nk), k sequential
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, kv_len=sk, block_k=block_k
        ),
        grid=(bh, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda g_, i, j: (g_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda g_, i, j: (g_, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda g_, i, j: (g_, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qr, kr, vr, gr, lser, deltar)

    return (
        dq.reshape(b, h, sq_p, d)[:, :, :sq],
        dk.reshape(b, h, sk_p, d)[:, :, :sk],
        dv.reshape(b, h, sk_p, d)[:, :, :sk],
    )


# ---------------------------------------------------------------------------
# BSHD layout: q/k/v as (B, S, H, D) — the layer-native layout. Blocks carry
# ALL heads, (1, block_s, H, D), so every DMA is a fully contiguous slab of
# the layer tensor and no (B,S,H,D)->(B,H,S,D) transpose is ever
# materialized (PERF_NOTES "BSHD-native" lever; the old path paid ~6 layout
# copies per attention). Heads are a small static loop inside the kernel
# (H=5..8 for the UNet). Mosaic constraint satisfied: the last two block
# dims (H, D) equal the array dims.
# ---------------------------------------------------------------------------


def _flash_fwd_kernel_bshd(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale, kv_len, block_k, nheads, emit_lse=False, lse_ref=None
):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for h in range(nheads):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, h:h + 1]
        l_prev = l_ref[:, h:h + 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, h, :] = acc_ref[:, h, :] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, h, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        m_ref[:, h:h + 1] = m_next
        l_ref[:, h:h + 1] = l_next

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:][:, :, None]).astype(o_ref.dtype)
        if emit_lse:
            # (H, 8, block_q): sublane-replicated rows for TPU tiling
            lse = (m_ref[:] + jnp.log(l_ref[:])).T  # (H, bq)
            lse_ref[0] = jnp.broadcast_to(
                lse[:, None, :], lse_ref.shape[1:]
            )


def _flash_bwd_dkv_kernel_bshd(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, kv_len, block_k, nheads
):
    """dK/dV: grid (b, nk, nq); q innermost (sequential) accumulates."""
    qb = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    kb_idx = pl.program_id(1)
    for h in range(nheads):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        g = g_ref[0, :, h, :].astype(jnp.float32)
        lse = lse_ref[0, h, 0, :][:, None]
        delta = delta_ref[0, h, 0, :][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        col = kb_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # (bq, bk)

        dv_acc[:, h, :] = dv_acc[:, h, :] + jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        dp = jax.lax.dot_general(
            g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        ds = p * (dp - delta)
        dk_acc[:, h, :] = dk_acc[:, h, :] + scale * jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    @pl.when(qb == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel_bshd(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_k, nheads
):
    """dQ: grid (b, nq, nk); k innermost (sequential) accumulates."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    for h in range(nheads):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        g = g_ref[0, :, h, :].astype(jnp.float32)
        lse = lse_ref[0, h, 0, :][:, None]
        delta = delta_ref[0, h, 0, :][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        ds = p * (dp - delta)
        dq_acc[:, h, :] = dq_acc[:, h, :] + scale * jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    @pl.when(kb == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bshd_q_spec(block_q, h, d):
    return pl.BlockSpec(
        (1, block_q, h, d), lambda b, i, j: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _bshd_k_spec(block_k, h, d):
    return pl.BlockSpec(
        (1, block_k, h, d), lambda b, i, j: (b, j, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _bshd_row_spec(block_q, h):
    # lse/delta: (B, H, 8, Sq_p) array, rows blocked with q
    return pl.BlockSpec(
        (1, h, 8, block_q), lambda b, i, j: (b, 0, 0, i),
        memory_space=pltpu.VMEM,
    )


def _bshd_block_cap(h: int) -> int:
    """VMEM-constrained block size: BSHD blocks carry all H heads, so the
    per-block footprint scales with H. 512 fits H=5 (the UNet's level-0
    attention) under the 16MB scoped-vmem limit; shrink proportionally for
    wider levels (H=10 -> 256, H=20 -> 128)."""
    return max(128, ((512 * 5 // max(h, 1)) // 128) * 128)


def _pad_seq(x, target):
    s = x.shape[1]
    if s == target:
        return x
    return jnp.pad(x, ((0, 0), (0, target - s), (0, 0), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_fwd_bshd_impl(
    q, k, v, *, scale, block_q=512, block_k=512, interpret=False
):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    cap = _bshd_block_cap(h)
    block_q = min(block_q, cap, _ceil_to(sq, 128))
    block_k = min(block_k, cap, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
    q = _pad_seq(q, sq_p)
    k = _pad_seq(k, sk_p)
    v = _pad_seq(v, sk_p)

    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel_bshd, scale=scale, kv_len=sk, block_k=block_k,
            nheads=h,
        ),
        grid=(b, sq_p // block_q, sk_p // block_k),
        in_specs=[
            _bshd_q_spec(block_q, h, d),
            _bshd_k_spec(block_k, h, d),
            _bshd_k_spec(block_k, h, d),
        ],
        out_specs=_bshd_q_spec(block_q, h, d),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, h, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, h, d), jnp.float32),
            pltpu.VMEM((block_q, h), jnp.float32),
            pltpu.VMEM((block_q, h), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out[:, :sq]


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_fwd_lse_bshd_impl(
    q, k, v, *, scale, block_q=512, block_k=512, interpret=False
):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    cap = _bshd_block_cap(h)
    block_q = min(block_q, cap, _ceil_to(sq, 128))
    block_k = min(block_k, cap, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
    q = _pad_seq(q, sq_p)
    k = _pad_seq(k, sk_p)
    v = _pad_seq(v, sk_p)

    o, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel_bshd_lse, scale=scale, kv_len=sk,
            block_k=block_k, nheads=h,
        ),
        grid=(b, sq_p // block_q, sk_p // block_k),
        in_specs=[
            _bshd_q_spec(block_q, h, d),
            _bshd_k_spec(block_k, h, d),
            _bshd_k_spec(block_k, h, d),
        ],
        out_specs=(_bshd_q_spec(block_q, h, d), _bshd_row_spec(block_q, h)),
        out_shape=(
            jax.ShapeDtypeStruct((b, sq_p, h, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 8, sq_p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, h, d), jnp.float32),
            pltpu.VMEM((block_q, h), jnp.float32),
            pltpu.VMEM((block_q, h), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return o[:, :sq], lse[:, :, 0, :sq]  # lse (B, H, Sq)


def _flash_fwd_kernel_bshd_lse(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, kv_len, block_k, nheads
):
    _flash_fwd_kernel_bshd(
        q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
        scale=scale, kv_len=kv_len, block_k=block_k, nheads=nheads,
        emit_lse=True, lse_ref=lse_ref,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_bwd_bshd_impl(
    q, k, v, o, lse, g, *, scale, block_q=512, block_k=512, interpret=False
):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    cap = _bshd_block_cap(h)
    block_q = min(block_q, cap, _ceil_to(sq, 128))
    block_k = min(block_k, cap, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)

    # delta rows: (B, Sq, H) -> (B, H, Sq); tiny next to q/k/v traffic
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)
    if sq_p != sq:
        q = _pad_seq(q, sq_p)
        g = _pad_seq(g, sq_p)
        # padded q rows: large finite lse so p ~ 0 (lse=+inf would nan)
        lse = jnp.pad(
            lse, ((0, 0), (0, 0), (0, sq_p - sq)), constant_values=1e9
        )
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    k = _pad_seq(k, sk_p)
    v = _pad_seq(v, sk_p)
    lser = jnp.broadcast_to(lse[:, :, None, :], (b, h, 8, sq_p))
    deltar = jnp.broadcast_to(delta[:, :, None, :], (b, h, 8, sq_p))

    # dK/dV: grid (b, nk, nq), q innermost — index maps take (b, j, i)
    q_spec_kv = pl.BlockSpec(
        (1, block_q, h, d), lambda b_, j, i: (b_, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    k_spec_kv = pl.BlockSpec(
        (1, block_k, h, d), lambda b_, j, i: (b_, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec_kv = pl.BlockSpec(
        (1, h, 8, block_q), lambda b_, j, i: (b_, 0, 0, i),
        memory_space=pltpu.VMEM,
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel_bshd, scale=scale, kv_len=sk,
            block_k=block_k, nheads=h,
        ),
        grid=(b, sk_p // block_k, sq_p // block_q),
        in_specs=[
            q_spec_kv, k_spec_kv, k_spec_kv, q_spec_kv, row_spec_kv,
            row_spec_kv,
        ],
        out_specs=(k_spec_kv, k_spec_kv),
        out_shape=(
            jax.ShapeDtypeStruct((b, sk_p, h, d), q.dtype),
            jax.ShapeDtypeStruct((b, sk_p, h, d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, h, d), jnp.float32),
            pltpu.VMEM((block_k, h, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, g, lser, deltar)

    # dQ: grid (b, nq, nk), k innermost
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel_bshd, scale=scale, kv_len=sk,
            block_k=block_k, nheads=h,
        ),
        grid=(b, sq_p // block_q, sk_p // block_k),
        in_specs=[
            _bshd_q_spec(block_q, h, d),
            _bshd_k_spec(block_k, h, d),
            _bshd_k_spec(block_k, h, d),
            _bshd_q_spec(block_q, h, d),
            _bshd_row_spec(block_q, h),
            _bshd_row_spec(block_q, h),
        ],
        out_specs=_bshd_q_spec(block_q, h, d),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, h, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, h, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, g, lser, deltar)

    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_bshd(q, k, v, scale=None, block_q=512, block_k=512):
    """Flash attention in the layer-native (B, S, H, D) layout — no q/k/v/out
    transposes at all. Semantics identical to `flash_attention`."""
    return _flash_fwd_bshd_impl(
        q, k, v,
        scale=scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
        block_q=block_q, block_k=block_k,
        interpret=not _on_tpu(),
    )


def _flash_bshd_fwd_rule(q, k, v, scale, block_q, block_k):
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    out, lse = _flash_fwd_lse_bshd_impl(
        q, k, v, scale=s, block_q=block_q, block_k=block_k,
        interpret=not _on_tpu(),
    )
    return out, (q, k, v, out, lse)


def _flash_bshd_bwd_rule(scale, block_q, block_k, res, g):
    q, k, v, out, lse = res
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    return _flash_bwd_bshd_impl(
        q, k, v, out, lse, g, scale=s, block_q=block_q, block_k=block_k,
        interpret=not _on_tpu(),
    )


flash_attention_bshd.defvjp(_flash_bshd_fwd_rule, _flash_bshd_bwd_rule)


def attention_xla_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    return_probs: bool = False,
):
    """XLA einsum attention in (B, S, H, D) layout; probs stay (B, H, Sq, Sk)."""
    sq, sk = q.shape[1], k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if return_probs:
        return out, probs
    return out


def sdpa_bshd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """(B, S, H, D) dispatcher, mirroring scaled_dot_product_attention.

    Routing measured on v5e (PERF_NOTES r2): the flash path transposes to
    (B,H,S,D) and runs the proven BHSD kernel — the transposes fuse to
    ~free (5.02 vs 4.98 ms at the level-0 shape) while the head-loop BSHD
    kernel's strided accumulator writes cost 40% (6.98 ms). XLA einsum wins
    outright below S~1024 (2.02 vs 2.66 ms at S=640/H=10), so the flash
    cutoff sits at 1024."""
    if use_flash is None:
        use_flash = (
            bias is None
            and not causal
            and q.shape[1] >= 1024
            and k.shape[1] >= 1024
        )
    if use_flash and bias is None and not causal:
        t = lambda x: x.transpose(0, 2, 1, 3)
        return t(flash_attention(t(q), t(k), t(v), scale))
    return attention_xla_bshd(q, k, v, bias=bias, causal=causal, scale=scale)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale=None, block_q=512, block_k=512):
    """Flash attention with Pallas forward and blocked-XLA backward.

    q: (B, H, Sq, D); k, v: (B, H, Sk, D). No bias/causal support — use
    `attention_xla` for the tiny temporal sequences that need those.
    Falls back to interpret mode off-TPU so tests run on CPU.
    """
    return _flash_attention_fwd_impl(
        q,
        k,
        v,
        scale=scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
        block_q=block_q,
        block_k=block_k,
        interpret=not _on_tpu(),
    )


def _flash_fwd_rule(q, k, v, scale, block_q, block_k):
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    out, lse = _flash_attention_fwd_lse_impl(
        q, k, v, scale=s, block_q=block_q, block_k=block_k,
        interpret=not _on_tpu(),
    )
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(scale, block_q, block_k, res, g):
    q, k, v, out, lse = res
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    return _flash_attention_bwd_impl(
        q, k, v, out, lse, g, scale=s, block_q=block_q, block_k=block_k,
        interpret=not _on_tpu(),
    )


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatcher: Pallas flash kernel for plain big-sequence attention,
    XLA path for bias/causal/small sequences."""
    if use_flash is None:
        # flash wins for big self-attention; XLA is faster for short-K
        # cross-attention (Sk=77) and tiny temporal sequences
        use_flash = (
            bias is None
            and not causal
            and q.shape[-2] >= 512
            and k.shape[-2] >= 512
        )
    if use_flash and bias is None and not causal:
        return flash_attention(q, k, v, scale)
    return attention_xla(q, k, v, bias=bias, causal=causal, scale=scale)
