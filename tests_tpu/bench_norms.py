"""Fused-norm kernel bench at the production UNet shapes (v5e).

The 4-step sampling trace shows `convert_reduce_fusion` (f32-stat GN/LN
reductions) at 17.4% / ~25.5 ms of the 149.5 ms step. This measures, per
shape (b=1, t=16, 320x512 -> latent 40x64 layout (N=16, HW, C)):

  - xla:    ops.norms.group_norm / layer_norm (+ silu) as shipped
  - fused:  ops.fused_norms Pallas kernel (one HBM read, stats in VMEM)
  - copy:   y = x + eps  (one read + one write: the traffic floor)

Rerun:  python tests_tpu/bench_norms.py   (on the TPU host)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from t2v_turbo_tpu.ops.norms import group_norm, layer_norm  # noqa: E402
from t2v_turbo_tpu.ops.fused_norms import (  # noqa: E402
    fused_group_norm,
    fused_layer_norm,
)

N_ITERS = 1000


def bench(fn, *args):
    @jax.jit
    def loop(x, rest):
        def body(i, x):
            y = fn(x, *rest)
            return y.astype(x.dtype) * jnp.asarray(1e-3, x.dtype) + x

        return jax.lax.fori_loop(0, N_ITERS, body, x)

    x, rest = args[0], args[1:]
    out = loop(x, rest)
    np.asarray(jax.device_get(out.reshape(-1)[0]))
    t0 = time.perf_counter()
    out = loop(x, rest)
    np.asarray(jax.device_get(out.reshape(-1)[0]))
    return (time.perf_counter() - t0) / N_ITERS * 1e3


def main():
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    gn_shapes = [
        ("gn L0 40x64x320", 16, 2560, 320),
        ("gn L1 20x32x640", 16, 640, 640),
        ("gn L2 10x16x1280", 16, 160, 1280),
        ("gn L3  5x8x1280", 16, 40, 1280),
    ]
    print(f"# {jax.devices()[0].platform} bf16, {N_ITERS} iters in-jit")
    print("## GroupNorm+SiLU (stats per frame x 32 groups)")
    for name, n, hw, c in gn_shapes:
        x = jax.random.normal(key, (n, hw, c), dtype)
        s = jnp.ones((c,), jnp.float32) * 1.1
        b = jnp.zeros((c,), jnp.float32) + 0.05

        xla_ms = bench(
            lambda x, s, b: jax.nn.silu(group_norm(x, s, b, 32)), x, s, b
        )
        fused_ms = bench(
            lambda x, s, b: fused_group_norm(x, s, b, 32, 1e-5, "silu"),
            x, s, b,
        )
        copy_ms = bench(lambda x: x + jnp.asarray(0.1, x.dtype), x)
        y = fused_group_norm(x, s, b, 32, 1e-5, "silu")
        r = jax.nn.silu(group_norm(x, s, b, 32))
        err = float(
            jnp.abs(y.astype(jnp.float32) - r.astype(jnp.float32)).max()
        )
        mb = x.size * 2 / 1e6
        print(
            f"  {name:20s} ({mb:6.1f} MB): xla {xla_ms:7.3f} ms  "
            f"fused {fused_ms:7.3f} ms  copy {copy_ms:7.3f} ms  "
            f"({xla_ms / fused_ms:4.2f}x, max|d|={err:.1e})"
        )

    ln_shapes = [
        ("ln  L0 spatial", 40960, 320),
        ("ln  L1 spatial", 10240, 640),
        ("ln  L2 spatial", 2560, 1280),
        ("ln  L0 temporal", 40960, 320),
    ]
    print("## LayerNorm (per-row stats)")
    for name, r, c in ln_shapes:
        x = jax.random.normal(key, (r, c), dtype)
        s = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        xla_ms = bench(lambda x, s, b: layer_norm(x, s, b), x, s, b)
        fused_ms = bench(
            lambda x, s, b: fused_layer_norm(x, s, b), x, s, b
        )
        copy_ms = bench(lambda x: x + jnp.asarray(0.1, x.dtype), x)
        y = fused_layer_norm(x, s, b)
        rr = layer_norm(x, s, b)
        err = float(
            jnp.abs(y.astype(jnp.float32) - rr.astype(jnp.float32)).max()
        )
        mb = x.size * 2 / 1e6
        print(
            f"  {name:20s} ({mb:6.1f} MB): xla {xla_ms:7.3f} ms  "
            f"fused {fused_ms:7.3f} ms  copy {copy_ms:7.3f} ms  "
            f"({xla_ms / fused_ms:4.2f}x, max|d|={err:.1e})"
        )


if __name__ == "__main__":
    main()
