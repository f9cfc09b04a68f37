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
    out = np.empty(n, dtype=np.float64)
    h = hashlib.blake2b(key.encode("utf-8"), digest_size=4 * n).digest()
    for i in range(n):
        out[i] = int.from_bytes(h[4 * i:4 * i + 4], "little") / 2**32
    return out


def relation_logits(doc_id: str, entity1: str, entity2: str,
                    sequence_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (relation_logits[9], novelty_logits[2]) for one sample.

    The argmax relation class is uniform over the 9 classes (8 =
    Negative_Class drops the pair, /root/reference/src/extractor/__init__.py:
    80-82), boosted by +4 so softmax is confident but fusable.
    """
    key = f"{doc_id}|{entity1}|{entity2}|{sequence_id}"
    rel = _hash_floats("rel:" + key, 9)
    rel[int.from_bytes(hashlib.blake2b(("relc:" + key).encode(),
                                       digest_size=8).digest(), "little") % 9] += 4.0
    nov = _hash_floats("nov:" + key, 2)
    nov[int.from_bytes(hashlib.blake2b(("novc:" + key).encode(),
                                       digest_size=8).digest(), "little") % 2] += 4.0
    return rel, nov


def softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - np.max(x))
    return e / e.sum()
