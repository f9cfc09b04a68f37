"""Deterministic surrogate relation/novelty scorer.

Stands in for the reference's BERT + marker-pooling relation classifier
(/root/reference/src/extractor/model/modeling_bionextextractor.py:43-217),
which emits 9 relation logits and 2 novelty logits per (pair, window) sample.
The surrogate derives logits from a keyed hash of (doc_id, entity1, entity2,
sequence_id) — the same inputs the model conditions on at the granularity the
pipeline needs — so results are reproducible across processes and the
downstream softmax-sum fusion (/root/reference/src/extractor/__init__.py:
98-108) is exercised with genuinely differing per-window logits.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _hash_floats(key: str, n: int) -> np.ndarray:
    """n floats in [0, 1) derived from blake2b(key)."""
    h = hashlib.blake2b(key.encode("utf-8"), digest_size=4 * n).digest()
    return np.frombuffer(h, dtype="<u4", count=n).astype(np.float64) / 2**32


def relation_logits(doc_id: str, entity1: str, entity2: str,
                    sequence_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (relation_logits[9], novelty_logits[2]) for one sample.

    ONE keyed digest per sample: bytes 0-35 -> 9 relation floats, 36-43 ->
    2 novelty floats, bytes 44/45 pick the boosted argmax classes. The
    argmax relation class is ~uniform over the 9 classes (8 =
    Negative_Class drops the pair, /root/reference/src/extractor/__init__.py:
    80-82), boosted by +4 so softmax is confident but fusable.
    """
    key = relation_key(doc_id, entity1, entity2, sequence_id).encode("utf-8")
    h = hashlib.blake2b(key, digest_size=48).digest()
    v = np.frombuffer(h, dtype="<u4", count=11).astype(np.float64) / 2**32
    rel = v[:9].copy()
    nov = v[9:11].copy()
    rel[h[44] % 9] += 4.0
    nov[h[45] % 2] += 4.0
    return rel, nov


def relation_key(doc_id: str, entity1: str, entity2: str,
                 sequence_id) -> str:
    """THE sample hash key. Single owner: the scalar and batch scorers
    and every caller building keys for the batch path must agree on the
    delimiter/field order or the two paths silently diverge."""
    return f"{doc_id}|{entity1}|{entity2}|{sequence_id}"


def relation_logits_batch(samples) -> tuple[np.ndarray, np.ndarray]:
    """Batched ``relation_logits`` over ``(doc_id, entity1, entity2,
    sequence_id)`` tuples: one digest per sample as before (blake2b is
    the per-sample floor), but ONE frombuffer + vectorized float
    derivation and boost-add across the batch instead of per-sample numpy
    call overhead (measured ~2x on the extractor stage). Bit-identical to
    the scalar path: same key (``relation_key``), same bytes, same
    float64 ops.

    Returns (rel (n, 9), nov (n, 2))."""
    n = len(samples)
    if n == 0:
        return (np.zeros((0, 9)), np.zeros((0, 2)))
    digests = b"".join(
        hashlib.blake2b(relation_key(*s).encode("utf-8"),
                        digest_size=48).digest()
        for s in samples)
    raw = np.frombuffer(digests, dtype=np.uint8).reshape(n, 48)
    v = np.frombuffer(digests, dtype="<u4").reshape(n, 12)[:, :11] \
        .astype(np.float64) / 2**32
    rel = np.ascontiguousarray(v[:, :9])
    nov = np.ascontiguousarray(v[:, 9:11])
    rows = np.arange(n)
    rel[rows, raw[:, 44] % 9] += 4.0
    nov[rows, raw[:, 45] % 2] += 4.0
    return rel, nov


def softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - np.max(x))
    return e / e.sum()
