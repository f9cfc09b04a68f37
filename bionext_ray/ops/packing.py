"""Sequence packing for LLM pretraining corpora.

Two standard packing disciplines over a token-counted document table, both
deterministic at any parallelism (shard = id mod n_shards, id order within
shard), so a distributed rerun and a SQL oracle agree bit-for-bit:

- ``pack_concat_chunks`` — GPT-style concat-and-chunk: each shard's docs are
  (virtually) concatenated in id order into one token stream split into
  fixed-size windows; a document may straddle a window boundary. The
  placement function is a pure running sum, so it composes directly from
  ``running_agg`` (SUM OVER (PARTITION BY shard ORDER BY id)) and is
  ANSI-SQL-mirrorable — the oracle gate for the packing math.
- ``pack_bins_nextfit`` — no-straddle next-fit binning: docs are laid into
  capacity-``chunk_tokens`` bins in id order; a doc that would overflow the
  open bin starts a new one; an oversized doc (> capacity) gets a bin of
  its own (flagged, caller truncates). Next-fit is the discipline T5/PaLM
  -style "no cross-doc attention" packing uses; its reset-on-overflow state
  is not expressible as a closed-form window function, so it is gated by a
  plain-Python reference in pytest instead of SQL.

Scale shape: ONE bucketed exchange each (the running_agg / groupby
co-location of a shard's rows — any exact packing must see its shard in
order); in-bucket work is a vectorized cumsum, and next-fit's only loop is
over output BINS (searchsorted per bin on the shard's cumsum), never over
docs. Shards are independent, so n_shards bounds skew: pick it >> cluster
cores and no single bucket dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_concat_chunks(docs_ds, chunk_tokens: int, n_shards: int = 64,
                       id_col: str = "doc_id", len_col: str = "n_tokens",
                       shuffle_partitions: int | None = None):
    """Concat-and-chunk placement: returns one row per doc with
    (id_col, shard, start_offset, chunk_id) where start_offset is the doc's
    position in its shard's concatenated token stream and chunk_id =
    start_offset // chunk_tokens (the training window its first token lands
    in). Input needs id_col (int64) + len_col (int64 token count)."""
    from bionext_ray.ops.relational import running_agg

    def shard(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "shard": pa.array(np.abs(ids) % n_shards, pa.int64()),
            len_col: pa.compute.cast(b[len_col], pa.int64()),
        })

    cum = running_agg(docs_ds.map_batches(shard, batch_format="pyarrow"),
                      "shard", [id_col], len_col, "cum_tokens",
                      shuffle_partitions=shuffle_partitions)

    def place(b: pd.DataFrame) -> pa.Table:
        start = (b["cum_tokens"] - b[len_col]).to_numpy(np.int64)
        return pa.table({
            id_col: pa.array(b[id_col].to_numpy(np.int64), pa.int64()),
            "shard": pa.array(b["shard"].to_numpy(np.int64), pa.int64()),
            "start_offset": pa.array(start, pa.int64()),
            "chunk_id": pa.array(start // chunk_tokens, pa.int64()),
        })

    return cum.map_batches(place, batch_format="pandas")


def pack_bins_nextfit(docs_ds, chunk_tokens: int, n_shards: int = 64,
                      id_col: str = "doc_id", len_col: str = "n_tokens",
                      shuffle_partitions: int | None = None):
    """Next-fit bin packing: (id_col, shard, bin_id, oversize) per doc.
    Bins are numbered per shard from 0 in id order. ``oversize`` marks docs
    longer than the capacity (they occupy a bin alone; training-side
    truncation is the caller's choice, the placement stays deterministic).
    """
    from bionext_ray.ops.relational import (_key_buckets,
                                            coalesce_for_exchange)

    P = max(16, shuffle_partitions or 0)

    def shard(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = np.abs(ids) % n_shards
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "shard": pa.array(sh, pa.int64()),
            len_col: pa.compute.cast(b[len_col], pa.int64()),
            "__bucket": pa.array(_key_buckets(sh, P), pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values(["shard", id_col], kind="mergesort")
             .reset_index(drop=True))
        lens = g[len_col].to_numpy(np.int64)
        shards = g["shard"].to_numpy(np.int64)
        bins = np.empty(len(g), np.int64)
        # loop over SHARD RUNS then BINS within a run (searchsorted on the
        # run's cumsum finds each bin's last fitting doc) — iterations =
        # number of output bins, not number of docs
        starts = np.flatnonzero(np.r_[True, shards[1:] != shards[:-1]])
        ends = np.r_[starts[1:], len(g)]
        for s, e in zip(starts, ends):
            cum = np.cumsum(lens[s:e])
            i, b_id = 0, 0
            n = e - s
            while i < n:
                target = (cum[i - 1] if i else 0) + chunk_tokens
                j = int(np.searchsorted(cum, target, side="right"))
                if j == i:          # oversize doc: own bin
                    j = i + 1
                bins[s + i:s + j] = b_id
                b_id += 1
                i = j
        g["bin_id"] = bins
        g["oversize"] = lens > chunk_tokens
        return g[["shard", id_col, len_col, "bin_id", "oversize"]]

    tagged = docs_ds.map_batches(shard, batch_format="pyarrow")
    return (coalesce_for_exchange(tagged, P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))
