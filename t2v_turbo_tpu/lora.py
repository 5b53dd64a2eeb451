"""LoRA as a pytree transform.

The reference injects wrapper modules into the torch module tree
(utils/lora.py:19-214, inject_trainable_lora_extended:387) and folds them
into base weights at load time (collapse_lora:793). The TPU-native design
needs no module surgery: LoRA is a *parallel pytree* of (down, up) factors
over selected kernel leaves, and `merge_lora` produces W + scale·(down@up)
functionally. Training differentiates through the merge w.r.t. the factors
only (base params are stop_gradient'ed), which is mathematically identical
to the reference's y = Wx + scale·up(down(x)) with zero dropout, and
inference uses the merged weights — zero overhead, the collapse semantics.

Dense kernels (in, out): down (in, r), up (r, out).
Conv kernels (kh, kw, in, out) [or (kt, 1, in, out)]: the spatial dims fold
into the input: down (kh, kw, in, r) contracted as (kh·kw·in, r), up (r, out)
— matching LoraInjectedConv2d/3d (reference utils/lora.py:65-214).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 64
    scale: float = 1.0
    # path predicate: which kernel leaves get factors. Default: every 'kernel'
    # leaf (Dense + Conv) — the reference injects into all Linear/Conv2d/Conv3d
    # under the UNet (train_t2v_turbo_v1_lora.py:643-657).
    target: Optional[Callable[[Tuple[str, ...]], bool]] = None

    def matches(self, path: Tuple[str, ...], leaf) -> bool:
        if path[-1] != "kernel":
            return False
        if getattr(leaf, "ndim", 0) < 2:
            return False
        if self.target is not None and not self.target(path):
            return False
        return True


def _path_tuple(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return tuple(out)


def init_lora(params, cfg: LoRAConfig, key: jax.Array):
    """Create the LoRA factor pytree: a dict mirror of `params` containing
    {"down", "up"} at each targeted kernel path. down ~ N(0, 1/r), up = 0
    (reference utils/lora.py:42-49)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora_flat = {}
    keys = jax.random.split(key, len(flat))
    for (path, leaf), k in zip(flat, keys):
        pt = _path_tuple(path)
        if not cfg.matches(pt, leaf):
            continue
        if leaf.ndim == 3 and pt[-3:] == ("ff", "proj", "kernel"):
            # GEGLU proj kernel stored (C, 2, F) for TP (models/layers.py
            # _GEGLUProj); the reference LoRA factorizes the underlying
            # (2F, C) Linear, so keep in=C, out=2F — the factors then
            # export/import 1:1 against its unet_lora.pt layout, and
            # merge_lora's delta.reshape restores (C, 2, F) row-major
            # exactly like the weight importer's reshape.
            in_f, out_f = leaf.shape[0], leaf.shape[1] * leaf.shape[2]
        else:
            *lead, out_f = leaf.shape
            in_f = int(np.prod(lead))
        down = jax.random.normal(k, (in_f, cfg.rank), jnp.float32) / cfg.rank
        up = jnp.zeros((cfg.rank, out_f), jnp.float32)
        lora_flat[pt] = {"down": down, "up": up}
    return lora_flat


def merge_lora(params, lora_flat, scale: float = 1.0, train_base: bool = False):
    """W + scale·(down@up) over the targeted leaves, returning a full param
    pytree. Gradients flow only into the factors unless train_base."""

    def merge(path, leaf):
        pt = _path_tuple(path)
        fac = lora_flat.get(pt)
        base = leaf if train_base else jax.lax.stop_gradient(leaf)
        if fac is None:
            return base
        delta = (fac["down"] @ fac["up"]) * scale
        return base + delta.reshape(leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def count_lora_params(lora_flat) -> int:
    return sum(
        int(np.prod(v.shape))
        for f in lora_flat.values()
        for v in f.values()
    )


def save_lora_npz(path: str, lora_flat) -> None:
    arrs = {}
    for pt, fac in lora_flat.items():
        joined = "/".join(pt)
        arrs[f"{joined}::down"] = np.asarray(fac["down"])
        arrs[f"{joined}::up"] = np.asarray(fac["up"])
    np.savez(path, **arrs)


def load_lora_npz(path: str):
    data = np.load(path)
    out = {}
    for name in data.files:
        joined, kind = name.rsplit("::", 1)
        out.setdefault(tuple(joined.split("/")), {})[kind] = jnp.asarray(data[name])
    return out


def unet_attention_target(path: Tuple[str, ...]) -> bool:
    """Narrower targeting: only attention/FF Dense kernels (common LoRA
    recipe); the reference default covers everything."""
    joined = "/".join(path)
    return any(s in joined for s in ("attn1", "attn2", "ff", "proj_in", "proj_out"))
