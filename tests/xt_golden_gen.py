"""Generate committed goldens for models/x_transformer.py from the
reference torch module itself (lvdm/modules/x_transformer.py).

Dev-time tool: requires the read-only reference mount; the committed
tests/goldens/x_transformer.npz is what tests/test_x_transformer.py
consumes, so CI never needs the mount. Regenerate with:

    python tests/xt_golden_gen.py

Each config saves its (randomized) state dict, inputs, and outputs under
"<name>/sd/<key>", "<name>/in/<key>", "<name>/out/<key>" npz keys.

The reference's macaron path is NOT goldened: its Scale wrapper tuple-
unpacks the FeedForward's plain tensor return (x_transformer.py:129-131),
so every macaron forward crashes in the reference — the rebuild implements
the intended 0.5-scaled macaron halves and documents the divergence.
"""

import importlib.util
import os
import sys

import numpy as np
import torch

REF = "/root/reference/lvdm/modules/x_transformer.py"
OUT = os.path.join(os.path.dirname(__file__), "goldens", "x_transformer.npz")


def load_ref():
    spec = importlib.util.spec_from_file_location("ref_xt", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)


def save_sd(store, name, module):
    for k, v in module.state_dict().items():
        store[f"{name}/sd/{k}"] = v.detach().numpy()


def main():
    xt = load_ref()
    torch.manual_seed(0)
    store = {}

    # A: plain encoder wrapper — logits, embeddings, attention maps
    enc = xt.Encoder(dim=32, depth=2, heads=4, attn_dim_head=8)
    w = xt.TransformerWrapper(num_tokens=50, max_seq_len=16, attn_layers=enc)
    randomize(w, 1)
    w.eval()
    tokens = torch.randint(0, 50, (2, 12), generator=torch.Generator().manual_seed(2))
    mask = torch.ones(2, 12, dtype=torch.bool)
    mask[1, 9:] = False
    with torch.no_grad():
        logits, attn_maps = w(tokens, mask=mask, return_attn=True)
        embs = w(tokens, mask=mask, return_embeddings=True)
    save_sd(store, "A", w)
    store["A/in/tokens"] = tokens.numpy()
    store["A/in/mask"] = mask.numpy()
    store["A/out/logits"] = logits.numpy()
    store["A/out/embeddings"] = embs.numpy()
    for i, m in enumerate(attn_maps):
        store[f"A/out/attn_{i}"] = m.numpy()

    # B: the exotic-knob pile — talking heads, mem kv, sparse topk, GLU FF,
    # scalenorm, sandwich layout, residual attn, memory tokens, emb projection
    enc = xt.Encoder(
        dim=32, depth=2, heads=2, attn_dim_head=8, attn_talking_heads=True,
        attn_num_mem_kv=2, attn_sparse_topk=4, ff_glu=True,
        use_scalenorm=True, sandwich_coef=1, residual_attn=True,
    )
    w = xt.TransformerWrapper(
        num_tokens=50, max_seq_len=16, attn_layers=enc, emb_dim=24,
        num_memory_tokens=2,
    )
    randomize(w, 3)
    w.eval()
    with torch.no_grad():
        logits = w(tokens, mask=mask)
    save_sd(store, "B", w)
    store["B/in/tokens"] = tokens.numpy()
    store["B/in/mask"] = mask.numpy()
    store["B/out/logits"] = logits.numpy()
    store["B/layer_types"] = np.array(list(enc.layer_types))

    # C: causal + GRU-gated residuals + rmsnorm, bare AttentionLayers
    layers = xt.AttentionLayers(
        dim=32, depth=2, heads=4, attn_dim_head=8, causal=True,
        gate_residual=True, use_rmsnorm=True,
    )
    randomize(layers, 4)
    layers.eval()
    x = torch.randn(2, 10, 32, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        y = layers(x)
    save_sd(store, "C", layers)
    store["C/in/x"] = x.numpy()
    store["C/out/y"] = y.numpy()

    # D: post-norm + rezero + position-infused attention + attention-on-attn
    layers = xt.AttentionLayers(
        dim=32, depth=2, heads=4, attn_dim_head=8, pre_norm=False,
        use_rezero=True, position_infused_attn=True, attn_on_attn=True,
    )
    randomize(layers, 6)
    layers.eval()
    with torch.no_grad():
        y = layers(x)
    save_sd(store, "D", layers)
    store["D/in/x"] = x.numpy()
    store["D/out/y"] = y.numpy()

    # E: cross attention with context mask + cross residual attn
    layers = xt.AttentionLayers(
        dim=32, depth=2, heads=4, attn_dim_head=8, cross_attend=True,
        cross_residual_attn=True,
    )
    randomize(layers, 7)
    layers.eval()
    ctx = torch.randn(2, 7, 32, generator=torch.Generator().manual_seed(8))
    cmask = torch.ones(2, 7, dtype=torch.bool)
    cmask[0, 5:] = False
    with torch.no_grad():
        y = layers(x, context=ctx, context_mask=cmask)
    save_sd(store, "E", layers)
    store["E/in/x"] = x.numpy()
    store["E/in/ctx"] = ctx.numpy()
    store["E/in/cmask"] = cmask.numpy()
    store["E/out/y"] = y.numpy()

    # F: layer-type schedules only (PAR + sandwich + cross variants) — the
    # pure build_layer_types function is checked against the reference's
    layouts = {
        "par": xt.AttentionLayers(dim=8, depth=4, par_ratio=2).layer_types,
        "sandwich": xt.AttentionLayers(dim=8, depth=4, sandwich_coef=2).layer_types,
        "cross": xt.AttentionLayers(dim=8, depth=3, cross_attend=True).layer_types,
        "only_cross": xt.AttentionLayers(
            dim=8, depth=3, cross_attend=True, only_cross=True
        ).layer_types,
    }
    for k, v in layouts.items():
        store[f"F/layer_types/{k}"] = np.array(list(v))

    # G: tied embeddings
    enc = xt.Encoder(dim=32, depth=1, heads=4, attn_dim_head=8)
    w = xt.TransformerWrapper(
        num_tokens=50, max_seq_len=16, attn_layers=enc, tie_embedding=True
    )
    randomize(w, 9)
    w.eval()
    with torch.no_grad():
        logits = w(tokens, mask=mask)
    save_sd(store, "G", w)
    store["G/in/tokens"] = tokens.numpy()
    store["G/in/mask"] = mask.numpy()
    store["G/out/logits"] = logits.numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **store)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB, "
          f"{len(store)} arrays)")


if __name__ == "__main__":
    sys.exit(main())
