"""Profiling & observability helpers.

The reference had no profiling beyond wall-clock prints (SURVEY.md §5);
here tracing is first-class:

- `cost_summary`: XLA's own FLOP/byte analysis + measured wall time ->
  TFLOP/s and GB/s against the roofline (the numbers used to drive the
  HBM-bound analysis of the UNet step).
- `trace`: context manager around jax.profiler for TensorBoard traces.
- `step_timer`: lightweight per-step timing with forced device completion
  (this platform's block_until_ready can return early; a tiny host transfer
  is the only reliable fence).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import numpy as np

# v5e single-chip peaks (bf16 MXU, HBM BW)
V5E_PEAK_TFLOPS = 197.0
V5E_PEAK_GBS = 820.0


def force_completion(out) -> None:
    """Reliable device fence: transfer one element of some array leaf."""
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ndim"):
            idx = (0,) * leaf.ndim
            np.asarray(leaf[idx])
            return


def cost_summary(fn: Callable, *args, iters: int = 5, **kw) -> Dict[str, Any]:
    """Compile fn, pull XLA cost analysis, measure wall time, report
    utilization. fn must be jittable."""
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args, **kw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    out = jitted(*args, **kw)
    force_completion(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args, **kw)
    force_completion(out)
    dt = (time.perf_counter() - t0) / iters

    return {
        "wall_ms": dt * 1e3,
        "tflops": flops / 1e12,
        "gb_accessed": bytes_accessed / 1e9,
        "tflops_per_s": flops / dt / 1e12,
        "gb_per_s": bytes_accessed / dt / 1e9,
        "mxu_utilization": flops / dt / 1e12 / V5E_PEAK_TFLOPS,
        "hbm_utilization": bytes_accessed / dt / 1e9 / V5E_PEAK_GBS,
        "arithmetic_intensity": flops / max(bytes_accessed, 1.0),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/t2v_tpu_trace"):
    """jax.profiler trace for TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def top_ops_from_trace(log_dir: str, k: int = 10) -> list:
    """Aggregate per-op device time from a jax.profiler trace directory.

    Parses the xplane.pb with jax.profiler.ProfileData (no tensorboard
    needed). Only the device plane's "XLA Ops" line is counted (leaf op
    executions); `while`/`conditional`/`call` spans are excluded because
    they contain their bodies and would double-count, and the "Async XLA
    Ops" line (copy-start prefetches that overlap compute) is excluded
    from totals for the same reason. Ops are grouped by HLO instruction
    base name — `%fusion.11702` -> `fusion`,
    `%convert_reduce_fusion.753` -> `convert_reduce_fusion`,
    `%_flash_attention_fwd_impl.71` -> `_flash_attention_fwd_impl` — which
    is the fused-kind / custom-call-target granularity PERF_NOTES wants.

    Returns [(group_name, total_ms, pct_of_module_time, event_count), ...]
    for the top-k groups; pct is against the "XLA Modules" total (the
    programs' wall span on the device), so the listed groups' pcts sum to
    ~100 when the leaf ops fully tile the program."""
    import glob as _glob
    import re as _re

    from jax.profiler import ProfileData

    paths = sorted(
        _glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True),
        key=lambda p: p,
    )
    if not paths:
        return []
    p = ProfileData.from_file(paths[-1])

    def _scan(device_only: bool):
        totals: Dict[str, float] = {}
        counts: Dict[str, int] = {}
        module_ns = 0.0
        for plane in p.planes:
            if device_only and not (plane.name or "").startswith("/device:"):
                continue
            for line in plane.lines:
                lname = line.name or ""
                if lname == "XLA Modules":
                    module_ns += sum(ev.duration_ns or 0.0 for ev in line.events)
                if lname != "XLA Ops":
                    continue
                for ev in line.events:
                    en = ev.name or ""
                    if not en:
                        continue
                    tok = en.split(" ", 1)[0] if en.startswith("%") else en.split("(", 1)[0]
                    base = _re.sub(r"\.\d+$", "", tok.lstrip("%"))
                    if base in ("while", "conditional", "call"):
                        continue
                    totals[base] = totals.get(base, 0.0) + (ev.duration_ns or 0.0)
                    counts[base] = counts.get(base, 0) + 1
        return totals, counts, module_ns

    totals, counts, module_ns = _scan(device_only=True)
    if not totals:
        # CPU-only runs put the XLA lines on the host client plane, not a
        # '/device:*' plane — fall back so --profile still reports there.
        totals, counts, module_ns = _scan(device_only=False)
    total = module_ns or sum(totals.values()) or 1.0
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    return [(n, d / 1e6, 100.0 * d / total, counts[n]) for n, d in top]


class step_timer:
    """Accumulates per-step wall times with a proper device fence."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, out=None):
        if out is not None:
            force_completion(out)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        a = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "steps": len(self.times),
        }
