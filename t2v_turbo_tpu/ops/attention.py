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
    *, scale, kv_len, block_k
):
    """Forward that also emits the log-sum-exp rows (for the Pallas backward)."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
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
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    m_ref[:] = m_next
    l_ref[:] = l_next

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # (8, block_q) sublane-replicated rows: TPU tiling needs the
        # second-to-last block dim divisible by 8
        lse_row = (m_ref[:] + jnp.log(l_ref[:]))[:, 0]
        lse_ref[0] = jnp.broadcast_to(lse_row[None, :], lse_ref.shape[1:])


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, kv_len, block_k
):
    """dK/dV: grid (bh, nk, nq); q innermost (sequential) accumulates."""
    qb = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)  # (bq, d)
    lse = lse_ref[0][0][:, None]  # (bq, 1)
    delta = delta_ref[0][0][:, None]  # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale
    kb_idx = pl.program_id(1)
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
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_k
):
    """dQ: grid (bh, nq, nk); k innermost (sequential) accumulates."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0][0][:, None]
    delta = delta_ref[0][0][:, None]

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
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_len, block_k
):
    """Online-softmax flash attention.

    Grid: (B*H, num_q_blocks, num_k_blocks); the K dimension is innermost and
    executed sequentially on TPU, so (acc, m, l) scratch carries the running
    softmax state across K blocks.
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
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
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    m_ref[:] = m_next
    l_ref[:] = l_next

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


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
