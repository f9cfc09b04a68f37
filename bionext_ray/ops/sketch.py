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


def kmv_distinct_grouped(ds, key: str, col: str, k: int = 64,
                         shuffle_partitions: int | None = None):
    """Per-group distinct-count KMV sketch: (key, n_distinct_est, is_exact).

    Partial: per block, each group keeps its k smallest distinct hashes
    (≤ k int64 rows per group per block cross the exchange — the sketch
    property that makes COUNT(DISTINCT) GROUP BY feasible at 100 TB without
    co-locating raw values). Final: ONE bucketed exchange on key; per bucket
    a vectorized pandas groupby merges hash sets, re-takes the k smallest,
    and applies the same integer estimator as the global sketch — so a SQL
    oracle with a PARTITION BY mirror is exact at ANY scale, estimator path
    included. Per-value Python md5 in the partial is the one slow kernel
    (shared with kmv_distinct; needed for oracle exactness).
    """
    import pandas as pd

    from bionext_ray.ops.relational import _key_buckets, coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tbl = pa.table({key: batch[key], col: batch[col]})
        g = tbl.group_by([key, col]).aggregate([])    # block-local distinct
        keys_out, hs_out = [], []
        df = g.to_pandas()
        for kv, grp in df.groupby(key, sort=False):
            hs = _kmv_hashes(grp[col].tolist(), k)
            keys_out.extend([kv] * len(hs))
            hs_out.append(hs)
        hs_all = (np.concatenate(hs_out) if hs_out
                  else np.array([], np.int64))
        t = pa.table({key: pa.array(keys_out,
                                    batch.schema.field(key).type),
                      "h": pa.array(hs_all, pa.int64())})
        kb = _key_buckets(np.asarray(keys_out, dtype=object)
                          if t[key].type == pa.string()
                          else np.asarray(keys_out), P)
        return t.append_column("__bucket", pa.array(kb, pa.int64()))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_e, out_x = [], [], []
        for kv, grp in g.groupby(key, sort=False):
            hs = np.unique(grp["h"].to_numpy(np.int64))
            if hs.size > k:
                hs = hs[:k]
            est, exact = kmv_estimate(hs, k)
            out_k.append(kv)
            out_e.append(est)
            out_x.append(exact)
        return pd.DataFrame({key: out_k, "n_distinct_est": out_e,
                             "is_exact": out_x})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return (coalesce_for_exchange(parts, P)
            .groupby("__bucket")
            .map_groups(merge, batch_format="pandas"))


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


def heavy_hitters(ds, key_col: str, threshold: int,
                  capacity: int | None = None,
                  shuffle_partitions: int | None = None):
    """EXACT frequency heavy hitters: every key with global row count
    >= ``threshold``, with its exact count — ``GROUP BY key HAVING
    COUNT(*) >= T`` at sketch cost. Output: (key, cnt).

    The full grouped count is the wrong shape when keys are
    ~|input|-cardinality and only the few hot ones matter (boilerplate
    URLs, spam n-grams, hot users): almost everything crossing the
    exchange is below threshold. This runs the space-saving idea as two
    bounded passes instead:

    Pass 1 (sketch): per batch, EXACT in-batch counts (vectorized
    pyarrow ``value_counts`` — a batch always fits worker memory), keep
    only keys whose in-batch count exceeds ``n_b // (capacity+1)`` — at
    most ``capacity`` keys can survive per batch, and every dropped key
    lost < n_b/(capacity+1) of its mass there. Survivor (key, cnt)
    partials merge in ONE bucketed sum; any key's global undercount is
    then < E = N/(capacity+1). Candidates = partial >= threshold - E:
    a guaranteed SUPERSET of the true heavy hitters, at most
    N/(threshold - E) keys (driver-bounded, documented).

    Pass 2 (exact): candidate keys broadcast once via ray.put, the input
    re-streamed through a vectorized ``is_in`` filter, exact bucketed
    count of the survivors, final filter >= threshold. Output equals the
    plain HAVING query for ANY capacity — capacity only bounds what
    crosses the exchange. Raises if threshold <= E (capacity too small
    to prune soundly: raise capacity or run bucketed_agg directly).
    ``capacity=None`` (default) auto-sizes to ~4N/threshold so the bound
    stays sound at any input scale.
    """
    import ray

    from bionext_ray.ops.relational import bucketed_agg

    n_total = ds.count()
    if capacity is None:
        # auto-size: err bound <= threshold/4, so pruning stays sound at
        # any input scale (the whole point of a threshold op)
        capacity = max(1024, (4 * n_total) // max(threshold, 1))
    err_bound = n_total // (capacity + 1) + 1
    if threshold <= err_bound:
        raise ValueError(
            f"threshold {threshold} <= sketch error bound {err_bound} "
            f"(N={n_total}, capacity={capacity}); raise capacity above "
            f"~{2 * n_total // max(threshold, 1)} or use bucketed_agg")

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(b[key_col].combine_chunks()
                             if isinstance(b[key_col], pa.ChunkedArray)
                             else b[key_col])
        cnt = vc.field("counts").cast(pa.int64())
        keep = pc.greater(cnt, pa.scalar(b.num_rows // (capacity + 1),
                                         pa.int64()))
        return pa.table({key_col: vc.field("values").filter(keep),
                         "cnt": cnt.filter(keep)})

    partials = bucketed_agg(
        ds.select_columns([key_col]).map_batches(
            partial, batch_format="pyarrow"),
        [key_col], [("cnt", "sum", "cnt")],
        shuffle_partitions=shuffle_partitions)

    cut = threshold - err_bound

    def candidates_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b["cnt"],
                                         pa.scalar(cut, pa.int64())))

    # candidate keys to the driver: <= N/(threshold - E) rows by the
    # sketch bound — the same bounded-concat contract as brute-force top-k
    cand_blocks = ray.get(partials.map_batches(
        candidates_only, batch_format="pyarrow").to_arrow_refs())
    # empty exchange buckets surface as 0-row NO-COLUMN tables — only
    # blocks that actually carry the key column count
    cand_arrays = [t[key_col] for t in cand_blocks
                   if t.num_rows and key_col in t.column_names]
    if not cand_arrays:
        ktype = next((t[key_col].type for t in cand_blocks
                      if key_col in t.column_names), pa.int64())
        empty = pa.table({key_col: pa.array([], ktype),
                          "cnt": pa.array([], pa.int64())})
        import ray.data
        return ray.data.from_arrow(empty)
    cand = pa.concat_arrays([a.combine_chunks() if isinstance(
        a, pa.ChunkedArray) else a for a in cand_arrays])
    cand_ref = ray.put(cand)

    class Member:
        def __init__(self):
            self.keys = ray.get(cand_ref)        # zero-copy local read

        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.is_in(b[key_col], value_set=self.keys))

    from bionext_ray.ops.relational import actor_pool_size
    survivors = ds.select_columns([key_col]).map_batches(
        Member, batch_format="pyarrow", concurrency=actor_pool_size())

    def one(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cnt", pa.array(np.ones(b.num_rows, np.int64), pa.int64()))

    exact = bucketed_agg(survivors.map_batches(one, batch_format="pyarrow"),
                         [key_col], [("cnt", "sum", "cnt")],
                         shuffle_partitions=shuffle_partitions)

    def final(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(
            b["cnt"], pa.scalar(threshold, pa.int64())))

    return exact.map_batches(final, batch_format="pyarrow")
