"""Manual on-chip microbench: int8 quantized convs for inference (ROADMAP
perf lever #3; VERDICT r4 next-step #6).

Question: v5e's MXU runs int8xint8->int32 at ~2x the bf16 rate — does
quantizing the UNet's convs (the FLOP carriers) buy step time at this
operating point? Three variants per production conv shape:

  bf16       — the live path (weights and activations bf16)
  w8         — weight-only int8: dequantize to bf16 then conv. Saves only
               weight HBM traffic (~1.4 GB/fwd -> 0.7 GB); the multiply
               still runs bf16.
  int8       — full int8: dynamic per-tensor activation scale + per-channel
               weight scale, int8 conv accumulating in int32, rescale to
               bf16. The MXU 2x path.

Run:  python tests_tpu/bench_int8.py
Prints ms per conv and the quantization error of the int8 variant so the
accept/reject decision (PERF_NOTES r5) carries both speed AND quality.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (N, H, W, Cin, Cout) — UNet levels at 16f 320x512: L0 40x64x320,
# L1 20x32x640, L2 10x16x1280; N = B*T = 16 frames
SHAPES = [
    (16, 40, 64, 320, 320),
    (16, 20, 32, 640, 640),
    (16, 10, 16, 1280, 1280),
]
DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def conv(x, w, prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=prefer,
    )


def quant_w(w):
    """Per-output-channel symmetric int8."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
    return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s


def quant_x(x):
    s = jnp.max(jnp.abs(x)) / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


ITERS = 100


def _chain(step):
    """Chain ITERS applications inside ONE jitted program: per-call RPC
    dispatch through the remote-TPU tunnel is ~25 ms — 60x the conv itself —
    so eager-loop timing is pure noise here (Cin==Co, y feeds y)."""

    @jax.jit
    def f(x, *args):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, y: step(y, *args), x
        )

    return f


f_bf16 = _chain(lambda y, w: conv(y, w))
f_w8 = _chain(
    lambda y, w8, ws: conv(
        y, w8.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)
    )
)


def _int8_step(y, w8, ws):
    x8, xs = quant_x(y)
    acc = conv(x8, w8, prefer=jnp.int32)
    return (
        acc.astype(jnp.float32) * (xs * ws.reshape(1, 1, 1, -1))
    ).astype(jnp.bfloat16)


f_int8 = _chain(_int8_step)


@jax.jit
def f_int8_once(x, w8, ws):
    return _int8_step(x, w8, ws)


def _block(out):
    # axon: block via a SCALAR host transfer — np.asarray(out) would pull
    # the whole activation (5+ MB) through the tunnel and dominate the time
    return float(jnp.sum(out.astype(jnp.float32)))


def timed(f, *args):
    out = f(*args)
    _block(out)
    t0 = time.perf_counter()
    out = f(*args)
    _block(out)
    return (time.perf_counter() - t0) / ITERS * 1e3, out


def main():
    for n, h, w_, ci, co in SHAPES:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(k1, (n, h, w_, ci), jnp.bfloat16)
        w = (jax.random.normal(k2, (3, 3, ci, co), jnp.float32) / np.sqrt(
            9 * ci
        )).astype(jnp.bfloat16)
        w8, ws = quant_w(w.astype(jnp.float32))

        t_bf16, _ = timed(f_bf16, x, w)
        t_w8, _ = timed(f_w8, x, w8, ws)
        try:
            t_i8, _ = timed(f_int8, x, w8, ws)
            # quality from a SINGLE application vs the bf16 conv
            ref = np.asarray(conv(x, w), np.float32)
            y2 = np.asarray(f_int8_once(x, w8, ws), np.float32)
            err = float(np.abs(y2 - ref).max())
            rel = err / float(np.abs(ref).max())
            i8_msg = f"int8 {t_i8:7.3f} ms  maxerr={err:.3e} rel={rel:.3e}"
        except Exception as e:  # lowering may reject int8 convs
            i8_msg = f"int8 FAILED: {type(e).__name__}: {e}"[:120]
        print(
            f"({n},{h},{w_},{ci})->{co}: bf16 {t_bf16:7.3f} ms | "
            f"w8 {t_w8:7.3f} ms | {i8_msg}",
            flush=True,
        )


if __name__ == "__main__":
    main()
