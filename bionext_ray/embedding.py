"""Deterministic surrogate text embedder for the entity linker.

Stands in for the reference's SapBERT mention encoder
(/root/reference/src/linker/chemicals.py:66-80: embed the mention, L2
normalize, cosine against a row-normalized KB matrix, accept argmax above
0.9). The surrogate maps a string to a unit-norm vector of hashed character
n-gram counts — fully deterministic across processes (hashlib, not hash()),
vectorizable, and similar strings land close in cosine space so the 0.9
threshold does real work. A real transformer encoder drops into the same
interface (`embed_batch`).
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 64
_NGRAM = 3


def _ngrams(text: str):
    padded = f"#{text}#"
    if len(padded) <= _NGRAM:
        yield padded
        return
    for i in range(len(padded) - _NGRAM + 1):
        yield padded[i:i + _NGRAM]


def embed_text(text: str, dim: int = DIM) -> np.ndarray:
    """Unit-norm float32 vector of hashed char-trigram counts (signed)."""
    v = np.zeros(dim, dtype=np.float32)
    for g in _ngrams(text):
        h = hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
        idx = int.from_bytes(h[:4], "little") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        v[idx] += sign
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return v


def embed_batch(texts: list[str], dim: int = DIM) -> np.ndarray:
    """(len(texts), dim) row-normalized matrix."""
    if not texts:
        return np.zeros((0, dim), dtype=np.float32)
    return np.stack([embed_text(t, dim) for t in texts])


def zero_embed_batch(texts: list[str], dim: int = DIM) -> np.ndarray:
    """All-zero embedder: every cosine scores 0 < threshold, so EVERY
    embedding tier (chem/disease/cell shards AND the per-tax gene matrix)
    is provably inert. Used by the dictionary-tier-only linked-mentions
    query, whose SQL oracle models only the dict cascade + votes — the
    zero embedder turns that restriction into a property of the pipeline
    instead of an assumption about the corpus."""
    return np.zeros((len(texts), dim), dtype=np.float32)


def build_kb_matrix(alias_texts: list[str], dim: int = DIM) -> np.ndarray:
    """Row-aligned, row-normalized KB embedding matrix (the `.npy` analog of
    /root/reference/src/linker/chemicals.py:59-62)."""
    return embed_batch(alias_texts, dim)
