"""Real-TPU flash-attention parity + microbenchmark.

Run directly on a TPU host (not under tests/conftest.py's CPU forcing):
    python tests_tpu/test_flash_tpu.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import pytest

pytestmark = pytest.mark.tpu  # real-chip suite; CPU CI runs -m 'not tpu'

from t2v_turbo_tpu.ops import attention_xla, flash_attention  # noqa: E402


def parity(b, h, sq, sk, d, dtype, atol):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, sk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, sk, d), dtype)
    out = flash_attention(q, k, v)
    ref = attention_xla(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    ok = err < atol
    print(f"parity {dtype.__name__} ({b},{h},{sq},{sk},{d}): max|Δ|={err:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def bench(b, h, sq, sk, d, dtype, iters=20):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, sk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, sk, d), dtype)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    g = jax.jit(lambda q, k, v: attention_xla(q, k, v))
    for fn, name in [(f, "flash"), (g, "xla  ")]:
        fn(q, k, v).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q, k, v)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        flops = 4 * b * h * sq * sk * d
        print(f"  {name} ({b},{h},{sq},{sk},{d}) {dtype.__name__}: "
              f"{dt*1e3:.3f} ms  {flops/dt/1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu", jax.devices()
    ok = True
    # spatial self-attn at 320x512 (40*64=2560 tokens), 16 frames
    ok &= parity(16, 5, 2560, 2560, 64, jnp.float32, 2e-3)
    ok &= parity(16, 5, 2560, 2560, 64, jnp.bfloat16, 5e-2)
    # cross-attn (77 text tokens)
    ok &= parity(16, 5, 2560, 77, 64, jnp.bfloat16, 5e-2)
    # VAE mid-block bottleneck: single head, d=512 (models/vae.py AttnBlock
    # routes through sdpa_bshd; the reward-training path backprops through
    # this shape)
    ok &= parity(4, 1, 2560, 2560, 512, jnp.bfloat16, 5e-2)
    bench(16, 5, 2560, 2560, 64, jnp.bfloat16)
    bench(16, 10, 640, 640, 64, jnp.bfloat16)
    bench(16, 5, 2560, 77, 64, jnp.bfloat16)
    sys.exit(0 if ok else 1)
