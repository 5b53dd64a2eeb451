"""Fused small-sequence (temporal) attention kernels: a MEASURED NEGATIVE
RESULT (round 4). Keep this so the experiment is reproducible and nobody
re-chases the idea without new hardware/compiler facts.

Motivation (VERDICT r3 next-step #4): the sampling-step trace shows ~10%
`copy` + part of 17.4% `convert_reduce_fusion` attributable to temporal
attention — XLA materializes (R, H, T, T) f32 logits/probs whose 16-lane
minor dim pads 8x under T(8,128) tiling. The hypothesis was a Pallas kernel
holding probs in VMEM would reclaim that traffic.

Measured on v5e (bf16, lax.fori_loop-in-jit timing, host-transfer fence),
R = B*H*W rows, layout (R, T, H, D):

  shape                      XLA einsum   VPU 'loop'   VPU 'vec'   packed-MXU
  init_attn (2560,16,8,64)     1.30 ms      4.48 ms      6.12 ms    compiler
  level0    (2560,16,5,64)     0.95 ms         -            -        crash*
  level1    (640,16,10,64)        -            -            -          *

Why the kernels lose / fail:
- The VPU variants ('loop' = per-query-row, 'vec' = all-queries-broadcast)
  are parity-correct (max|d| ~2e-2 bf16) but COMPUTE-bound on the VPU:
  temporal attention at T=16 is ~0.8-1.3 GFLOP/layer, and the VPU's few
  Tflop/s cannot compete with the MXU path XLA picks for the batched
  (16x64)@(64x16) matmuls, even though XLA pays ~6-8x the minimal HBM
  traffic for the padded probs. Padding waste < compute-engine gap.
- The packed-MXU variant (8 sequences -> one (128,D) segment, full 128x128
  MXU logits + static block-diagonal mask; 8x FLOP waste at full MXU rate,
  parity-correct in interpret mode) crashes this stack's Mosaic remote
  compile helper (HTTP 500, tpu_compile_helper exit 1) — bisected to the
  bare `jax.lax.dot_general` on (128, D) values sliced from a 4D VMEM block
  with two integer indices (`ref[g, :, h, :]`); plain copies of the same
  slices compile fine, and the production flash kernels' dots on 3D-block
  slices (`ref[0, :, h, :]`-style) also compile fine.
- Even a speed-of-light kernel (~0.2 ms/layer traffic floor at measured
  copy bandwidth) would save <~5 ms of the 149.5 ms step across all ~17
  temporal layers (~3%): the XLA baseline per layer is already small. The
  r3 trace reading "copy at 10% bounds what any further layout cleverness
  could buy" stands.

Rerun:  python tests_tpu/bench_small_seq_attention.py   (on the TPU host)
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


def _kernel_loop(q_ref, k_ref, v_ref, o_ref, *, scale, seq, heads):
    """VPU variant: native (rb, T, D) tiling per head, per-query-row loop;
    probs (rb, T, 1) never leave registers."""
    for h in range(heads):
        k = k_ref[:, :, h, :].astype(jnp.float32)
        v = v_ref[:, :, h, :].astype(jnp.float32)
        for tq in range(seq):
            q_tq = q_ref[:, tq, h, :].astype(jnp.float32)
            logits = (q_tq[:, None, :] * k).sum(axis=-1, keepdims=True) * scale
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            o_ref[:, tq, h, :] = (p * v).sum(axis=1).astype(o_ref.dtype)


def _kernel_vec(q_ref, k_ref, v_ref, o_ref, *, scale, seq, heads):
    """VPU variant: all query rows at once ((rb,T,T,D) broadcast temps)."""
    for h in range(heads):
        q = q_ref[:, :, h, :].astype(jnp.float32)
        k = k_ref[:, :, h, :].astype(jnp.float32)
        v = v_ref[:, :, h, :].astype(jnp.float32)
        logits = (q[:, :, None, :] * k[:, None, :, :]).sum(axis=-1) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = (p[:, :, :, None] * v[:, None, :, :]).sum(axis=2)
        o_ref[:, :, h, :] = out.astype(o_ref.dtype)


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale, seq, heads, groups):
    """MXU variant: PACK=128//T sequences per (128, D) segment, full 128x128
    MXU logits, static block-diagonal mask. Crashes Mosaic on the current
    stack (see module docstring); parity-correct in interpret mode."""
    seg = q_ref.shape[1]
    neg = -0.7 * float(jnp.finfo(jnp.float32).max)
    shift = seq.bit_length() - 1  # seq is a power of two
    row = jax.lax.shift_right_logical(
        jax.lax.broadcasted_iota(jnp.int32, (seg, seg), 0), shift)
    col = jax.lax.shift_right_logical(
        jax.lax.broadcasted_iota(jnp.int32, (seg, seg), 1), shift)
    mask = row == col
    for g in range(groups):
        for h in range(heads):
            q = q_ref[g, :, h, :]
            k = k_ref[g, :, h, :]
            v = v_ref[g, :, h, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(mask, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[g, :, h, :] = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "variant", "interpret")
)
def small_seq_attention(q, k, v, *, scale, variant="loop", interpret=False):
    r, t, h, d = q.shape
    if variant == "packed":
        assert 128 % t == 0 and (t & (t - 1)) == 0
        pack, block_g = 128 // t, 4
        r_p = _ceil_to(r, pack * block_g)
        if r_p != r:
            pad = ((0, r_p - r), (0, 0), (0, 0), (0, 0))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        g_total = r_p // pack
        qg, kg, vg = (x.reshape(g_total, pack * t, h, d) for x in (q, k, v))
        spec = pl.BlockSpec((block_g, pack * t, h, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_packed, scale=scale, seq=t, heads=h,
                              groups=block_g),
            grid=(g_total // block_g,),
            in_specs=[spec] * 3,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((g_total, pack * t, h, d), q.dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(qg, kg, vg)
        return out.reshape(r_p, t, h, d)[:r]

    per_row = t * h * d * 2 * 8 + (
        3 * t * d * 4 + 2 * t * t * d * 4 if variant == "vec" else 4 * t * d * 4
    )
    budget = 8_000_000 if variant == "vec" else 10_000_000
    block_r = max(8, min(512, budget // per_row) // 8 * 8)
    r_p = _ceil_to(r, block_r)
    if r_p != r:
        pad = ((0, r_p - r), (0, 0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    spec = pl.BlockSpec((block_r, t, h, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = _kernel_vec if variant == "vec" else _kernel_loop
    out = pl.pallas_call(
        functools.partial(kern, scale=scale, seq=t, heads=h),
        grid=(r_p // block_r,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r_p, t, h, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(q, k, v)
    return out[:r]


def main():
    import numpy as np

    from t2v_turbo_tpu.ops.attention import attention_xla_bshd

    on_tpu = jax.devices()[0].platform == "tpu"
    N = 50

    def bench(fn, q, k, v):
        @jax.jit
        def loop(q, k, v):
            def body(i, q):
                y = fn(q, k, v)
                return y.astype(q.dtype) * jnp.asarray(1e-3, q.dtype) + q
            return jax.lax.fori_loop(0, N, body, q)

        out = loop(q, k, v)
        np.asarray(jax.device_get(out[0, 0, 0]))
        t0 = time.perf_counter()
        out = loop(q, k, v)
        np.asarray(jax.device_get(out[0, 0, 0]))
        return (time.perf_counter() - t0) / N * 1e3

    shapes = ([("init_attn", 2560, 16, 8, 64), ("level0", 2560, 16, 5, 64)]
              if on_tpu else [("tiny", 200, 16, 3, 32)])
    for name, r, t, h, d in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        dt = jnp.bfloat16 if on_tpu else jnp.float32
        q = jax.random.normal(ks[0], (r, t, h, d), dt)
        k = jax.random.normal(ks[1], (r, t, h, d), dt)
        v = jax.random.normal(ks[2], (r, t, h, d), dt)
        scale = 1.0 / math.sqrt(d)
        ref = attention_xla_bshd(q, k, v, scale=scale)
        for variant in ("loop", "vec", "packed"):
            try:
                got = small_seq_attention(q, k, v, scale=scale,
                                          variant=variant,
                                          interpret=not on_tpu)
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - ref.astype(jnp.float32))))
                ms = (f" {bench(lambda a, b, c, _v=variant: small_seq_attention(a, b, c, scale=scale, variant=_v), q, k, v):.3f} ms"
                      if on_tpu else "")
                print(f"{name} {variant}: err {err:.0e}{ms}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {variant}: FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)
        if on_tpu:
            print(f"{name} xla: {bench(lambda a, b, c: attention_xla_bshd(a, b, c, scale=scale), q, k, v):.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
