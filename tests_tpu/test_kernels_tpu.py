"""Real-TPU parity for the full Pallas kernel family: flash BACKWARD (custom
VJP) and the BSHD variants — the pieces the CPU suite only exercises in
interpret mode (tests/test_ops.py) and bench.py's gate only covers forward.

Run directly on a TPU host (not under tests/conftest.py's CPU forcing):
    python tests_tpu/test_kernels_tpu.py

Exit code is nonzero on any parity failure, so this can gate a TPU CI lane.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import pytest

pytestmark = pytest.mark.tpu  # real-chip suite; CPU CI runs -m 'not tpu'

from t2v_turbo_tpu.ops.attention import (  # noqa: E402
    attention_xla,
    attention_xla_bshd,
    flash_attention,
    flash_attention_bshd,
)

FAILURES = []


def check(name, err, atol):
    ok = err < atol
    print(f"{name}: max|d|={err:.2e} {'OK' if ok else f'FAIL (atol {atol})'}")
    if not ok:
        FAILURES.append(name)


def fwd_bwd_parity_bhsd(b, h, sq, sk, d, dtype, atol_f, atol_b):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, sq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, sk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, sk, d), dtype)
    g = jax.random.normal(ks[3], (b, h, sq, d), dtype)

    out = flash_attention(q, k, v)
    ref = attention_xla(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    check(
        f"flash fwd {dtype.__name__} ({b},{h},{sq},{sk},{d})",
        float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))),
        atol_f,
    )

    # Pallas backward (custom VJP) vs grads of the f32 XLA oracle
    dq, dk, dv = jax.vjp(flash_attention, q, k, v)[1](g)
    rq, rk, rv = jax.vjp(
        lambda q_, k_, v_: attention_xla(q_, k_, v_).astype(dtype),
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
    )[1](g)
    for name, a, r in (("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv)):
        check(
            f"flash bwd {name} {dtype.__name__} ({b},{h},{sq},{sk},{d})",
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - r))),
            atol_b,
        )


def fwd_bwd_parity_bshd(b, s, h, d, dtype, atol_f, atol_b):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, s, h, d), dtype)
    k = jax.random.normal(ks[1], (b, s, h, d), dtype)
    v = jax.random.normal(ks[2], (b, s, h, d), dtype)
    g = jax.random.normal(ks[3], (b, s, h, d), dtype)

    out = flash_attention_bshd(q, k, v)
    ref = attention_xla_bshd(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    check(
        f"bshd fwd {dtype.__name__} ({b},{s},{h},{d})",
        float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))),
        atol_f,
    )
    dq, dk, dv = jax.vjp(flash_attention_bshd, q, k, v)[1](g)
    rq, rk, rv = jax.vjp(
        lambda q_, k_, v_: attention_xla_bshd(q_, k_, v_).astype(dtype),
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
    )[1](g)
    for name, a, r in (("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv)):
        check(
            f"bshd bwd {name} {dtype.__name__} ({b},{s},{h},{d})",
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - r))),
            atol_b,
        )


def main():
    assert jax.devices()[0].platform == "tpu", "run on a TPU host"
    t0 = time.time()
    # the UNet's level-0 spatial shape (flash-dispatch region) + a VAE-ish
    # bottleneck shape; bwd tolerances follow tests/test_ops.py interpret
    fwd_bwd_parity_bhsd(4, 5, 2560, 2560, 64, jnp.float32, 1e-3, 1e-2)
    fwd_bwd_parity_bhsd(4, 5, 2560, 2560, 64, jnp.bfloat16, 2e-2, 2e-1)
    fwd_bwd_parity_bhsd(1, 1, 2560, 2560, 512, jnp.bfloat16, 2e-2, 5e-1)
    fwd_bwd_parity_bshd(4, 2560, 5, 64, jnp.bfloat16, 2e-2, 2e-1)
    print(f"done in {time.time()-t0:.0f}s; failures: {FAILURES or 'none'}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
