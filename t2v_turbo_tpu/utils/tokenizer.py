"""CLIP BPE tokenizer (self-contained; no open_clip dependency).

Implements the standard CLIP byte-pair-encoding scheme used by the OpenCLIP
text tower the reference loads (reference lvdm/modules/encoders/condition.py:
257-259 uses `open_clip.tokenize`; the equivalent vendored tokenizer lives at
reference viclip/simple_tokenizer.py). The merges vocabulary is the public
`bpe_simple_vocab_16e6.txt.gz` asset (the standard OpenAI CLIP vocabulary),
shipped in t2v_turbo_tpu/assets/ so the framework is self-contained; the
path is overridable via argument or the T2V_TPU_BPE_PATH env var.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import List, Optional, Sequence

import numpy as np
import regex as re

_DEFAULT_PATHS = (
    os.environ.get("T2V_TPU_BPE_PATH", ""),
    os.path.join(os.path.dirname(__file__), "..", "assets", "bpe_simple_vocab_16e6.txt.gz"),
)

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"


@functools.lru_cache()
def _bytes_to_unicode():
    """Reversible byte -> printable-unicode map (GPT-2 scheme)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _pairs(word):
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class CLIPTokenizer:
    """context_length=77, zero-padded after EOT — OpenCLIP `tokenize` parity."""

    def __init__(self, bpe_path: Optional[str] = None, context_length: int = 77):
        path = bpe_path or next((p for p in _DEFAULT_PATHS if p and os.path.exists(p)), None)
        if path is None:
            raise FileNotFoundError(
                "CLIP BPE vocab not found; set T2V_TPU_BPE_PATH or pass bpe_path"
            )
        self.context_length = context_length
        self.byte_encoder = _bytes_to_unicode()
        merges = gzip.open(path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend([SOT, EOT])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT: SOT, EOT: EOT}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode_text(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in re.findall(self.pat, _clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def __call__(self, texts: str | Sequence[str]) -> np.ndarray:
        """Tokenize to (B, context_length) int32, truncating long prompts
        (EOT forced into the last slot, like open_clip)."""
        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode_text(text) + [self.eot_id]
            if len(ids) > self.context_length:
                ids = ids[: self.context_length]
                ids[-1] = self.eot_id
            result[i, : len(ids)] = ids
        return result
