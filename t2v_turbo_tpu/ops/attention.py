"""Attention ops: Pallas TPU flash-attention + XLA reference paths.

Replaces the reference's xformers `memory_efficient_attention` /
flash-attn CUDA kernels (reference lvdm/modules/attention.py:96-97,206,220 and
intern_vid2 flash_attention_class.py) with a TPU-native design:

- `flash_attention`: tiled online-softmax Pallas kernel for the big-sequence
  spatial self-attention (S = H·W up to a few thousand) and cross-attention
  (S_k = 77) hot paths. bf16/f32 IO, f32 accumulation on the MXU, K-side
  padding masks. Differentiable via a custom VJP whose backward recomputes
  attention in blocked XLA (flash backward kernel is a later optimization).
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
    out = flash_attention(q, k, v, scale, block_q, block_k)
    return out, (q, k, v)


def _flash_bwd_rule(scale, block_q, block_k, res, g):
    q, k, v = res
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])

    def ref(q, k, v):
        return attention_xla(q, k, v, scale=s)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


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
