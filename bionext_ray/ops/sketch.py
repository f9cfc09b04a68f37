"""Cardinality sketches for wide tables.

KMV (k-minimum-values) distinct counting: keep the k smallest keyed hashes
of the column; if fewer than k distinct hashes exist the count is exact,
otherwise the k-th smallest hash h_k estimates the cardinality as
(k-1) * 2^60 // h_k (hashes are uniform in [0, 2^60): the first 15 hex
digits of md5). Fully DETERMINISTIC — same input, same estimate, on any
cluster — and every step is integer arithmetic an SQL oracle reproduces
bit-for-bit (DuckDB: CAST(CONCAT('0x', substr(md5(v), 1, 15)) AS UBIGINT)).

Scale shape: each block contributes at most k int64 partials (vectorized
np.partition per batch over the block's DISTINCT values), the driver merges
k values per block — the same partial/merge pattern as brute-force top-k.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_HASH_SPACE = 1 << 60          # 15 hex digits of md5


def _kmv_hashes(values, k: int) -> np.ndarray:
    """k smallest distinct 60-bit md5 hashes of the given values."""
    uniq = set()
    for v in values:
        uniq.add(int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:15],
                     16))
    arr = np.fromiter(uniq, dtype=np.int64, count=len(uniq))
    if arr.size > k:
        arr = np.partition(arr, k - 1)[:k]
    return np.sort(arr)


def kmv_estimate(hashes: np.ndarray, k: int) -> tuple[int, bool]:
    """(estimate, is_exact) from the globally k smallest distinct hashes."""
    if hashes.size < k:
        return int(hashes.size), True
    h_k = int(hashes[k - 1])
    return ((k - 1) * _HASH_SPACE) // h_k, False


def kmv_distinct(ds, col: str, k: int = 64):
    """Distinct-count sketch over a Dataset column. Returns a one-row
    pyarrow table (n_distinct_est: int64, is_exact: bool)."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vals = pc.unique(batch[col]).to_pylist()     # block-local distinct
        hs = _kmv_hashes(vals, k)
        return pa.table({"h": pa.array(hs, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # at most k int64 values per block reach the driver
    chunks = [b["h"].to_numpy() for b in parts.iter_batches(
        batch_format="pyarrow", batch_size=None)]
    merged = (np.unique(np.concatenate(chunks)) if chunks
              else np.array([], dtype=np.int64))
    if merged.size > k:
        merged = merged[:k]                           # already sorted
    est, exact = kmv_estimate(merged, k)
    return pa.table({"n_distinct_est": pa.array([est], pa.int64()),
                     "is_exact": pa.array([exact], pa.bool_())})
