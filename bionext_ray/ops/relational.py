"""Relational building blocks: broadcast hash join, partial+final grouped
aggregation, tumbling-window aggregation over an event stream.

- broadcast_join: the small side (dimension table) is ray.put ONCE and read
  zero-copy inside each task — never a shuffle, never re-shipped per batch
  (reference joins are all Python-dict lookups against small sides,
  SURVEY.md §2.4).
- partial+final aggregation: combine inside map_batches, then groupby over
  the much smaller partials (the A6 skew pattern).
- tumbling windows: event-time bucketing by integer floor division — Ray Data
  has no watermarks; the reference has no streaming either (SURVEY.md §2.9),
  so windows are plain grouped aggregates over (key, window_start).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def actor_pool_size() -> tuple[int, int]:
    """Actor-pool bounds sized from the cluster, not hard-coded: autoscale
    from 1 (chained pools with min>1 can pre-claim every CPU and starve the
    upstream read) up to just below the CPU count (read tasks need slots)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (1, max(2, ncpu - max(1, ncpu // 8)))


def coalesce_for_exchange(ds, P: int):
    """Re-block an exchange input to max(P, 2*CPUs) blocks before a
    ``groupby("__bucket")``. The sort-based shuffle's fixed cost scales with
    the INPUT block count, and upstream narrow maps inherit the reader's
    many small blocks (64+ tiny blocks at bench scale for a 16-bucket
    exchange); re-blocking to the exchange's own partition granularity —
    still >=2 blocks per CPU, so no parallelism is lost — cuts the
    all-to-all fan ~25-35% wall at bench scale. At 100 TB, P comes from
    estimate_partitions (~64 MB per partition), so this re-block IS the
    intended block size. Split/merge repartition, not a hash shuffle."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return ds.repartition(max(P, 2 * ncpu))


def broadcast_join(big_ds, small_df: pd.DataFrame, on, how: str = "inner",
                   batch_size: int = 8192):
    """Join a big Dataset against a small pandas DataFrame (broadcast)."""
    ref = ray.put(small_df)

    class JoinFn:
        def __init__(self):
            self.small = ray.get(ref)  # zero-copy from local object store

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return big_ds.map_batches(JoinFn, batch_format="pandas",
                              batch_size=batch_size, concurrency=actor_pool_size())


def semi_join_filter(big_ds, keys: set, key_col: str, batch_size: int = 8192):
    """Semi-join: keep rows whose key is in the broadcast key set
    (vectorized pc.is_in against a value set built once per actor)."""
    ref = ray.put(sorted(keys))

    class FilterFn:
        def __init__(self):
            import pyarrow.compute as pc
            self.value_set = pa.array(ray.get(ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.is_in(batch[key_col],
                            value_set=self.value_set.cast(
                                batch.schema.field(key_col).type))
            return batch.filter(mask)

    return big_ds.map_batches(FilterFn, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=actor_pool_size())


_AGGS = {"sum": Sum, "min": Min, "max": Max, "mean": Mean}
_ARROW_FUNS = {"sum": "sum", "min": "min", "max": "max", "count": "count"}


def partial_final_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
                      shuffle_partitions: int | None = 16):
    """Grouped aggregation with in-batch combining.

    specs: [(col, fun, alias)] with fun in {sum, min, max, count}.
    Per batch: arrow group_by combine -> one row per key per block; final:
    Ray groupby over partials (count partials re-aggregate with sum).

    ``shuffle_partitions``: the final groupby's task count follows the
    partial dataset's block count, which tracks the INPUT size — but partials
    are at most (distinct keys x blocks) rows, usually tiny. Coalescing them
    (metadata-only repartition, no row movement) before the groupby cuts the
    all-to-all from blocks^2 tasks to partitions^2 (7x wall-time at bench
    scale). Default 16 is safe for low-cardinality keys at any input scale;
    pass None for high-cardinality keys (e.g. dedup hashes) where partials
    stay proportional to the input.
    """
    def combine(batch: pa.Table) -> pa.Table:
        aggs = [(c, _ARROW_FUNS[f]) for c, f, _ in specs]
        g = batch.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c, f, alias in specs:
            cols[alias] = g[f"{c}_{_ARROW_FUNS[f]}"]
        return pa.table(cols)

    partial = ds.map_batches(combine, batch_format="pyarrow")
    if shuffle_partitions is not None:
        partial = partial.repartition(shuffle_partitions)
    final_aggs = []
    for c, f, alias in specs:
        fun = "sum" if f == "count" else f
        final_aggs.append(_AGGS[fun](alias, alias_name=alias))
    return partial.groupby(keys).aggregate(*final_aggs)


_MERGE_FUN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def bucketed_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
                 shuffle_partitions: int | None = None):
    """Grouped aggregation for HIGH-CARDINALITY keys (the complement of
    ``partial_final_agg``, whose final Ray groupby SORTS the full key
    space — with ~|input| distinct keys that sort dominates wall time;
    measured ~100 s vs ~3 s on a 600k-row / 50k-key edge aggregate).

    Shape (the anti-singleton-group pattern): arrow in-block combine ->
    one row per (key, block); key-hash bucket column -> ONE grouped
    exchange over ~P groups (never one group per key); a C pandas groupby
    inside each bucket merges the partials. specs: [(col, fun, alias)],
    fun in {sum, min, max, count}; partial counts merge with sum.
    """
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def combine(batch: pa.Table) -> pa.Table:
        import numpy as np
        aggs = [(c, _ARROW_FUNS[f]) for c, f, _ in specs]
        g = batch.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c, f, alias in specs:
            cols[alias] = g[f"{c}_{_ARROW_FUNS[f]}"]
        bkt = np.zeros(g.num_rows, np.int64)
        for k in keys:
            karr = g[k].to_numpy(zero_copy_only=False)
            bkt = (bkt * 31 + _key_buckets(karr, P)) % P
        cols["__bucket"] = pa.array(bkt, pa.int64())
        return pa.table(cols)

    merge_map = {alias: (alias, _MERGE_FUN[f]) for _, f, alias in specs}
    out_cols = keys + [alias for _, _, alias in specs]

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        m = g.groupby(keys, sort=False).agg(**merge_map).reset_index()
        # Arrow out (not pandas blocks): downstream ops (shuffle_join)
        # read the Arrow schema, and pandas->Arrow here is one cheap copy
        # of an already-reduced bucket
        return pa.Table.from_pandas(m[out_cols], preserve_index=False)

    partial = ds.map_batches(combine, batch_format="pyarrow")
    return (coalesce_for_exchange(partial, P)
            .groupby("__bucket")
            .map_groups(merge_bucket, batch_format="pandas")
            .select_columns(out_cols))


def estimate_partitions(paths, target_bytes: int = 64 * 1024 * 1024,
                        lo: int = 1, hi: int = 1_000_000) -> int:
    """Scale-aware shuffle-partition count from input size: one partition
    per ~target_bytes of IN-MEMORY data. Cheap (file/parquet metadata only)
    and correct from kilobytes to 100 TB.

    Parquet files report their UNCOMPRESSED row-group size — text columns
    compress 5-10x, and sizing shuffles from compressed bytes was observed
    to collapse a 400k-page canonicalization to ONE final-merge task."""
    import os

    def file_bytes(path: str) -> int:
        if path.endswith(".parquet"):
            try:
                import pyarrow.parquet as pq
                md = pq.ParquetFile(path).metadata
                return sum(md.row_group(i).total_byte_size
                           for i in range(md.num_row_groups))
            except Exception:
                pass
        return os.path.getsize(path)

    total = 0
    for p in ([paths] if isinstance(paths, str) else paths):
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(file_bytes(os.path.join(root, f))
                             for f in files)
        elif os.path.exists(p):
            total += file_bytes(p)
    return max(lo, min(hi, (total + target_bytes - 1) // target_bytes))


def tumbling_window(events_ds, key_col: str, ts_col: str, width_s: int,
                    specs: list[tuple[str, str, str]],
                    shuffle_partitions: int | None = 16):
    """Tumbling event-time windows: adds window_start = floor(epoch/width)
    then partial+final aggregates per (key, window_start)."""
    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        epoch = pc.cast(batch[ts_col], pa.int64())  # microseconds
        win = pc.multiply(pc.divide(epoch, width_s * 1_000_000),
                          width_s * 1_000_000)
        return batch.append_column("window_start",
                                   pc.cast(win, pa.timestamp("us")))

    bucketed = events_ds.map_batches(bucket, batch_format="pyarrow")
    return partial_final_agg(bucketed, [key_col, "window_start"], specs,
                             shuffle_partitions=shuffle_partitions)


def range_join(left_ds, right_ds, key_col: str, left_ts: str, right_ts: str,
               width_s: int, left_cols: list[str], right_cols: list[str],
               strict_after: bool = True,
               shuffle_partitions: int | None = None):
    """Distributed range (band) join: for each left row, all right rows with
    the same key whose ``right_ts`` falls in
    (left_ts, left_ts + width_s]  (strict_after=True; [left_ts, ...] else).

    Same union-tag + ONE bucketed exchange as asof_join; inside each bucket
    the band match is vectorized per key with two ``np.searchsorted`` calls
    over the key's sorted right timestamps (no per-left-row Python work —
    match ranges expand via repeat/arange). Scales as long as per-key match
    counts are bounded (output rows = matches, as any band join).
    """
    import numpy as np

    P = max(16, shuffle_partitions or 0)
    l_t = {c: left_ds.schema().base_schema.field(c).type for c in left_cols}
    r_t = {c: right_ds.schema().base_schema.field(c).type for c in right_cols}

    def tag(side: int, ts_col, own_cols, own_types, other_cols, other_types):
        def fn(b: pa.Table) -> pa.Table:
            key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {"__bucket": pa.array(np.abs(key) % P, pa.int64()),
                    "__side": pa.array([side] * b.num_rows, pa.int8()),
                    key_col: b[key_col],
                    "__ts": pa.compute.cast(b[ts_col], pa.timestamp("us"))}
            for c in own_cols:
                cols[("l_" if side == 0 else "r_") + c] = b[c]
            for c in other_cols:
                cols[("r_" if side == 0 else "l_") + c] = pa.nulls(
                    b.num_rows, type=other_types[c])
            return pa.table(cols)
        return fn

    tagged = (left_ds.select_columns([key_col, left_ts] + left_cols)
              .map_batches(tag(0, left_ts, left_cols, l_t, right_cols, r_t),
                           batch_format="pyarrow")
              .union(right_ds.select_columns([key_col, right_ts] + right_cols)
                     .map_batches(tag(1, right_ts, right_cols, r_t,
                                      left_cols, l_t),
                                  batch_format="pyarrow")))

    width_us = np.int64(width_s) * 1_000_000

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _band_join_bucket(g, key_col, left_ts, right_ts, left_cols,
                                 right_cols, width_us, strict_after)

    return coalesce_for_exchange(tagged, P).groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")


def _band_join_bucket(g: pd.DataFrame, key_col: str, left_ts: str,
                      right_ts: str, left_cols: list[str],
                      right_cols: list[str], width_us,
                      strict_after: bool) -> pd.DataFrame:
    """Band-match one co-located bucket (module-level so tests can
    micro-bench it without the exchange). Right side is sorted ONCE by
    (key, ts); each key's rows are then a contiguous slice found by two
    binary searches over the sorted key column — O(log R) per key plus the
    matches, never an O(R) boolean rescan per key."""
    import numpy as np

    lcols = ["l_" + c for c in left_cols]
    rcols = ["r_" + c for c in right_cols]
    left = g[g["__side"] == 0]
    right = g[g["__side"] == 1].sort_values([key_col, "__ts"],
                                            kind="mergesort")
    out = []
    rts_all = right["__ts"].astype("datetime64[ns]").astype(
        "int64").to_numpy() // 1000
    rkeys = right[key_col].to_numpy()
    for key, lg in left.groupby(key_col, sort=False):
        klo = int(np.searchsorted(rkeys, key, side="left"))
        khi = int(np.searchsorted(rkeys, key, side="right"))
        if klo == khi:
            continue
        rts = rts_all[klo:khi]
        ridx = np.arange(klo, khi)
        lts = lg["__ts"].astype("datetime64[ns]").astype(
            "int64").to_numpy() // 1000
        side = "right" if strict_after else "left"
        lo = np.searchsorted(rts, lts, side=side)
        hi = np.searchsorted(rts, lts + width_us, side="right")
        counts = hi - lo
        if counts.sum() == 0:
            continue
        # expand [lo_i, hi_i) ranges without a per-row loop
        li = np.repeat(np.arange(len(lg)), counts)
        offs = np.arange(int(counts.sum())) - np.repeat(
            np.cumsum(counts) - counts, counts)
        ri = ridx[np.repeat(lo, counts) + offs]
        part = {key_col: np.repeat(key, len(li)),
                left_ts: lg["__ts"].to_numpy()[li],
                right_ts: right["__ts"].to_numpy()[ri]}
        for c in lcols:
            part[c[2:]] = lg[c].to_numpy()[li]
        for c in rcols:
            part[c[2:]] = right[c].to_numpy()[ri]
        out.append(pd.DataFrame(part))
    if not out:
        cols = {key_col: [], left_ts: [], right_ts: []}
        cols.update({c: [] for c in left_cols + right_cols})
        return pd.DataFrame(cols)
    return pd.concat(out, ignore_index=True)


def grouped_topk(ds, key_cols: list[str], order_col: str, k: int,
                 descending: bool = True, tiebreak_cols: list[str] | None = None,
                 shuffle_partitions: int | None = None):
    """Top-k rows per group, distributed: each block keeps only its local
    top-k per key (a per-batch vectorized sort+head — the partial), so at
    most k rows per (key, block) cross the ONE exchange; the final pass
    re-sorts each key's <= k*blocks survivors and heads k. The exchange is
    bucketed on hash(key) % P with the per-key work vectorized inside each
    bucket group (same anti-singleton pattern as the LSH/as-of operators).

    Deterministic: ties on ``order_col`` break by ``tiebreak_cols``
    (ascending) — mirror it in the oracle's ROW_NUMBER() ORDER BY."""
    import numpy as np

    tiebreak_cols = tiebreak_cols or []
    P = max(16, shuffle_partitions or 0)
    sort_cols = key_cols + [order_col] + tiebreak_cols
    ascending = [True] * len(key_cols) + [not descending] + \
        [True] * len(tiebreak_cols)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        out = (b.sort_values(sort_cols, ascending=ascending, kind="mergesort")
               .groupby(key_cols, sort=False).head(k))
        key = np.zeros(len(out), dtype=np.int64)
        with np.errstate(over="ignore"):
            for c in key_cols:
                v = out[c].to_numpy()
                if np.issubdtype(v.dtype, np.integer):
                    h = v.astype(np.int64, copy=False)
                else:
                    import hashlib
                    # keyed digest: process-independent (never Python hash())
                    h = np.fromiter(
                        (int.from_bytes(hashlib.blake2b(
                            str(x).encode(), digest_size=8).digest(),
                            "little") for x in v),
                        np.uint64, len(v)).astype(np.int64)
                key = key * np.int64(1_000_003) + h
        return out.assign(__bucket=np.abs(key) % P)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns="__bucket")
                .sort_values(sort_cols, ascending=ascending, kind="mergesort")
                .groupby(key_cols, sort=False).head(k)
                .reset_index(drop=True))

    return (coalesce_for_exchange(
                ds.map_batches(local_topk, batch_format="pandas"), P)
            .groupby("__bucket")
            .map_groups(final_topk, batch_format="pandas"))


def asof_join(left_ds, right_ds, key_col: str, left_ts: str, right_ts: str,
              right_cols: list[str], direction: str = "backward",
              shuffle_partitions: int | None = None, how: str = "inner"):
    """Distributed as-of join: for each left row, the right row with the same
    key and the greatest ``right_ts`` <= ``left_ts`` (direction="backward";
    "forward" = least >=). Ray Data has no join operator — this is the
    union-tag pattern: both sides are projected onto a common schema with a
    side flag, ONE hash-bucket exchange on the key co-locates each key's rows,
    and each bucket runs a single vectorized ``pd.merge_asof(by=key)`` (C
    kernel) instead of one Python call per key.

    Ties on ``right_ts`` resolve to the row that sorts last by
    ``right_cols`` (deterministic max-by-payload). ``how="inner"`` drops
    unmatched left rows (DuckDB ASOF JOIN default); "left" keeps them with
    nulls. Scale: the exchange ships each side once; P buckets track the
    input size via ``shuffle_partitions``."""
    import numpy as np

    P = max(16, shuffle_partitions or 0)
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    # left payload columns; left_ts travels as __ts (renamed back at the end)
    left_cols = [c for c in left_schema.names
                 if c not in (key_col, left_ts)]
    ltypes = {c: left_schema.base_schema.field(c).type for c in left_cols}
    rtypes = {c: right_schema.base_schema.field(c).type for c in right_cols}

    def tag_left(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__bucket": pa.array(np.abs(key) % P, pa.int64()),
                "__side": pa.array([0] * b.num_rows, pa.int8()),
                key_col: b[key_col],
                "__ts": pa.compute.cast(b[left_ts], pa.timestamp("us"))}
        for c in left_cols:
            cols["l_" + c] = b[c]
        for c in right_cols:
            cols["r_" + c] = pa.nulls(b.num_rows, type=rtypes[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__bucket": pa.array(np.abs(key) % P, pa.int64()),
                "__side": pa.array([1] * b.num_rows, pa.int8()),
                key_col: b[key_col],
                "__ts": pa.compute.cast(b[right_ts], pa.timestamp("us"))}
        for c in left_cols:
            cols["l_" + c] = pa.nulls(b.num_rows, type=ltypes[c])
        for c in right_cols:
            cols["r_" + c] = b[c]
        return pa.table(cols)

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow")
              .union(right_ds.select_columns([key_col, right_ts] + right_cols)
                     .map_batches(tag_right, batch_format="pyarrow")))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == 0]
        right = g[g["__side"] == 1]
        rcols = ["r_" + c for c in right_cols]
        left = left.sort_values("__ts", kind="mergesort")
        right = right.sort_values(["__ts"] + rcols, kind="mergesort")
        merged = pd.merge_asof(
            left[[key_col, "__ts"] + ["l_" + c for c in left_cols]],
            right[[key_col, "__ts"] + rcols].rename(
                columns={"__ts": "__rts"}),
            left_on="__ts", right_on="__rts", by=key_col,
            direction=direction)
        if how == "inner":
            merged = merged[merged["__rts"].notna()]
        out = merged.rename(columns={
            **{"l_" + c: c for c in left_cols},
            **{"r_" + c: c for c in right_cols},
            "__ts": left_ts, "__rts": right_ts})
        return out.reset_index(drop=True)

    return coalesce_for_exchange(tagged, P).groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")


def sessionize(events_ds, key_col: str, ts_col: str, gap_s: int,
               order_cols: list[str] | None = None,
               value_specs: list[tuple[str, str, str]] | None = None,
               shuffle_partitions: int | None = None):
    """Gap-based session windows: per key, sort by event time (plus
    tie-break columns), start a new session when the gap to the previous
    event exceeds ``gap_s`` (Ray Data has no watermarks — the reference has
    no streaming either, SURVEY.md §2.9).

    ONE exchange on hash(key) % P; inside each bucket the whole
    sessionization is a single vectorized pandas pass over ALL keys (sort,
    shift-compare for key change / gap break, cumsum session ids, C-level
    groupby for the aggregates) — never one Python call per key.

    Returns (key, session_id, n_events, start_us, end_us) plus any
    value_specs aggregates [(col, fun, alias)] with fun in {sum, min, max}.
    """
    import numpy as np

    order_cols = order_cols or []
    value_specs = value_specs or []
    P = max(16, shuffle_partitions or 0)
    gap_us = np.int64(gap_s) * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__bucket",
                               pa.array(np.abs(key) % P, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col] + order_cols, kind="mergesort")
        ts = (g[ts_col].astype("datetime64[ns]").astype("int64") // 1000
              ).to_numpy()
        key = g[key_col].to_numpy()
        new_key = np.r_[True, key[1:] != key[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap_us]
        new_sess = new_key | gap_break
        gsid = np.cumsum(new_sess)                 # global session number
        # per-key session_id = gsid - gsid at the key's first row
        first_of_key = np.where(new_key, gsid, 0)
        base = np.maximum.accumulate(first_of_key)
        sid = gsid - base
        agg_src = g.assign(__sid=sid, __ts=ts)
        specs = {"n_events": ("__ts", "size"),
                 "start_us": ("__ts", "min"), "end_us": ("__ts", "max")}
        for c, f, alias in value_specs:
            specs[alias] = (c, f)
        out = (agg_src.groupby([key_col, "__sid"], sort=True)
               .agg(**specs).reset_index()
               .rename(columns={"__sid": "session_id"}))
        out["session_id"] = out["session_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        for col in ("start_us", "end_us"):
            out[col] = out[col].astype("int64")
        for c, f, alias in value_specs:
            out[alias] = out[alias].astype("int64")
        return out

    return (coalesce_for_exchange(
                events_ds.map_batches(add_bucket, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def event_transitions(events_ds, key_col: str, ts_col: str, type_col: str,
                      order_cols: list[str] | None = None,
                      shuffle_partitions: int | None = None):
    """First-order Markov transition counts over per-key event sequences
    (the flow matrix behind product-analytics Sankeys and the bigram table
    a sequence model trains on): per key, events ordered by
    (ts, *order_cols), every adjacent (prev_type -> next_type) pair counted
    corpus-wide.

    ONE exchange on hash(key) % P co-locates each key's events; inside a
    bucket a single vectorized pass handles ALL keys (mergesort, one
    shift-compare for the key boundary, C groupby over the pair columns)
    and reduces the bucket to at most |types|^2 (prev, next, n) partial
    rows. Only those tiny partials cross the final low-cardinality sum —
    the |events|-sized data moves exactly once.

    ``order_cols`` must break ts ties to a total order per key (pass the
    event id); otherwise adjacent-pair identity depends on sort stability
    across partitionings.
    """
    import numpy as np

    order_cols = order_cols or []
    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__bucket",
                               pa.array(np.abs(key) % P, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col] + order_cols, kind="mergesort")
        key = g[key_col].to_numpy()
        typ = g[type_col].to_numpy()
        same = key[1:] == key[:-1]
        pairs = pd.DataFrame({"prev_type": typ[:-1][same],
                              "next_type": typ[1:][same]})
        out = (pairs.groupby(["prev_type", "next_type"], sort=False)
               .size().reset_index(name="n"))
        out["prev_type"] = out["prev_type"].astype(str)
        out["next_type"] = out["next_type"].astype(str)
        out["n"] = out["n"].astype("int64")
        return out

    partials = (coalesce_for_exchange(
                    events_ds.map_batches(add_bucket, batch_format="pyarrow"),
                    P)
                .groupby("__bucket")
                .map_groups(per_bucket, batch_format="pandas"))
    return partial_final_agg(partials, ["prev_type", "next_type"],
                             [("n", "sum", "n")])


def grouped_quantiles(ds, key_cols: list[str], col: str,
                      qs: tuple = (0.5, 0.95),
                      shuffle_partitions: int | None = None):
    """Exact discrete quantiles per group (DuckDB quantile_disc semantics:
    the value at 0-based index max(0, ceil(q*n)-1) of the group's sorted
    values). ONE bucketed exchange on hash(keys) % P; inside each bucket
    all keys are handled in one vectorized pass — sort, run-length group
    boundaries, one fancy-index per quantile — never per-key Python.

    Exact quantiles inherently co-locate each group's values (any exact
    method must see the whole group); for sketch-sized state use a KMV/
    t-digest style operator instead. Output columns: keys + p{q*100}.
    """
    import numpy as np
    import pandas as pd
    from pandas.util import hash_array

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(b), dtype=np.uint64)
        for k in key_cols:
            h = h * np.uint64(1_000_003) + hash_array(
                b[k].to_numpy().astype(object))
        return b.assign(__bucket=(h % P).astype(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values(key_cols + [col], kind="mergesort")
             .reset_index(drop=True))
        change = (g[key_cols] != g[key_cols].shift()).any(axis=1).to_numpy()
        change[0] = True
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(g)]
        ns = ends - starts
        out = {k: g[k].to_numpy()[starts] for k in key_cols}
        vals = g[col].to_numpy()
        for q in qs:
            idx = starts + np.maximum(
                0, np.ceil(q * ns).astype(np.int64) - 1)
            out[f"p{round(q * 100)}"] = vals[idx]
        return pd.DataFrame(out)

    return (coalesce_for_exchange(
                ds.map_batches(add_bucket, batch_format="pandas"), P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def _key_buckets(arr, P: int):
    """Run-internal bucket assignment for a key column (numpy array).
    Integer keys bucket by abs(key) % P directly; everything else hashes
    via pandas hash_array (stable within a run, which is all a shuffle
    exchange needs — cross-run-stable ids use blake2b elsewhere)."""
    import numpy as np
    if np.issubdtype(arr.dtype, np.integer):
        return (np.abs(arr.astype(np.int64)) % P).astype(np.int64)
    from pandas.util import hash_array
    return (hash_array(arr.astype(object)) % np.uint64(P)).astype(np.int64)


def shuffle_join(left_ds, right_ds, on, left_cols: list[str],
                 right_cols: list[str], how: str = "inner",
                 shuffle_partitions: int | None = None,
                 right_types: dict | None = None):
    """Distributed hash (shuffle) join of two LARGE datasets on 1+ keys.

    The big-big complement of ``broadcast_join`` (reference joins are all
    broadcast dict lookups, SURVEY.md §2.4; a 100-TB fact x fact join cannot
    broadcast either side): both inputs are union-tagged and co-located by
    key-hash bucket in ONE groupby exchange; inside each bucket the match is
    a single pandas C hash merge — no per-key Python. ``on`` is a key column
    name, a ``(left_key, right_key)`` pair when the names differ, or a LIST
    of either for a composite key (bucket = mix of per-column buckets; the
    in-bucket merge matches on the actual columns, so bucket-hash collisions
    only affect co-location, never correctness). Output key columns keep the
    left names. Output columns: left_keys + left_cols + right_cols (must be
    disjoint). how: inner|left.

    Skew caveat (documented partitioning assumption): one bucket holds ALL
    rows of its keys; if a single hot key's rows exceed a worker's memory,
    salt that key upstream and re-aggregate after (the A6 pattern).
    """
    import numpy as np
    import pandas as pd

    if isinstance(on, list):
        pairs = [p if isinstance(p, tuple) else (p, p) for p in on]
    else:
        pairs = [on if isinstance(on, tuple) else (on, on)]
    lkeys = [l for l, _ in pairs]
    rkeys = [r for _, r in pairs]
    kcols = [f"__k{i}" for i in range(len(pairs))]
    assert how in ("inner", "left")
    assert not (set(left_cols) & set(right_cols))
    P = max(16, shuffle_partitions or 0)

    # a side can be PROVABLY EMPTY (zero blocks, e.g. a filtered-out
    # bucketed_agg): Ray reports schema() None. Empty left -> empty join
    # either way (left_ds returned verbatim — it has no schema to dress
    # up); empty right -> inner is empty, left keeps every left row with
    # null right columns. On this path the right columns' true types are
    # unknowable from a zero-block dataset: pass ``right_types``
    # ({col -> pa.DataType}) to pin them; columns absent from the hint are
    # typed pa.null() (DOCUMENTED LIMITATION — consumers casting unhinted
    # right columns must tolerate null-typed input; numpy coerces
    # None -> nan).
    _ls, _rs = left_ds.schema(), right_ds.schema()
    if _ls is None:
        return left_ds
    lsch = _ls.base_schema
    if _rs is None:
        hint = right_types or {}

        def pad(b: pa.Table) -> pa.Table:
            cols = {k: b[k] for k in lkeys}
            for c in left_cols:
                cols[c] = b[c]
            for c in right_cols:
                cols[c] = (pa.nulls(b.num_rows, hint[c]) if c in hint
                           else pa.nulls(b.num_rows))
            return pa.table(cols)

        padded = (left_ds.select_columns(lkeys + left_cols)
                  .map_batches(pad, batch_format="pyarrow"))
        if how == "left":
            return padded
        return padded.limit(0)
    rsch = _rs.base_schema
    key_ts = [lsch.field(k).type for k in lkeys]
    l_t = {c: lsch.field(c).type for c in left_cols}
    r_t = {c: rsch.field(c).type for c in right_cols}
    out_schema = pa.schema(list(zip(lkeys, key_ts))
                           + [(c, l_t[c]) for c in left_cols]
                           + [(c, r_t[c]) for c in right_cols])

    def tag(side: int, key_names, own_cols, other_types):
        def fn(b: pa.Table) -> pa.Table:
            keys = [pa.compute.cast(b[k], t)
                    for k, t in zip(key_names, key_ts)]
            # composite bucket: polynomial mix of per-column buckets (same
            # key tuple -> same bucket on both sides, all that's required)
            bkt = np.zeros(b.num_rows, np.int64)
            for key in keys:
                karr = key.to_numpy(zero_copy_only=False)
                bkt = (bkt * 31 + _key_buckets(karr, P)) % P
            cols = {"__bucket": pa.array(bkt, pa.int64()),
                    "__side": pa.array(np.full(b.num_rows, side, np.int8))}
            for kc, key in zip(kcols, keys):
                cols[kc] = key
            # canonical column order on BOTH sides of the union (left cols
            # then right cols) so the unioned blocks share one schema
            for c in left_cols + right_cols:
                cols[c] = (b[c] if c in own_cols
                           else pa.nulls(b.num_rows, type=other_types[c]))
            return pa.table(cols)
        return fn

    tagged = (left_ds.select_columns(lkeys + left_cols)
              .map_batches(tag(0, lkeys, left_cols, r_t),
                           batch_format="pyarrow")
              .union(right_ds.select_columns(rkeys + right_cols)
                     .map_batches(tag(1, rkeys, right_cols, l_t),
                                  batch_format="pyarrow")))

    def join_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        l = df[df["__side"] == 0][kcols + left_cols]
        r = df[df["__side"] == 1][kcols + right_cols]
        m = l.merge(r, on=kcols, how=how)
        m = m.rename(columns=dict(zip(kcols, lkeys)))
        # explicit schema per bucket: an empty/all-null side must not flip
        # a column's dtype (pandas NaN promotion) between buckets
        return pa.Table.from_pandas(m[[f.name for f in out_schema]],
                                    schema=out_schema, preserve_index=False)

    return coalesce_for_exchange(tagged, P).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow")


def detect_hot_keys(ds, key_col: str, threshold: int, top_m: int = 64):
    """Estimate hot join keys: per-block top-``top_m`` frequency partials
    (<= top_m rows per block cross to the driver — bounded, never the data),
    merged and thresholded on total count. A key that misses a block's
    top-m is under-counted, so this is a partitioning HEURISTIC only, never
    a correctness input: ``skew_join`` output is identical whichever keys
    land in the hot set."""
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[key_col].value_counts().head(top_m)
        return pd.DataFrame({key_col: vc.index.to_numpy(),
                             "__n": vc.to_numpy()})

    parts = (ds.select_columns([key_col])
             .map_batches(partial, batch_format="pandas").to_pandas())
    if parts.empty:
        return set()
    tot = parts.groupby(key_col)["__n"].sum()
    return set(tot[tot >= threshold].index.tolist())


def skew_join(left_ds, right_ds, on, left_cols: list[str],
              right_cols: list[str], how: str = "inner",
              hot_keys=None, hot_threshold: int = 100_000, salts: int = 8,
              shuffle_partitions: int | None = None):
    """Skew-aware shuffle join: identical semantics (and output rows) to
    ``shuffle_join``, but rows of HOT keys are salted so no single shuffle
    bucket has to hold a hot key's full row set. This is the documented
    escape hatch for shuffle_join's skew caveat, as its own operator:

    - hot keys come from ``hot_keys`` or are estimated by
      ``detect_hot_keys`` over the left (probe) side;
    - left hot rows get a per-row salt in [0, salts); right hot rows are
      REPLICATED once per salt value (dim-side duplication factor =
      ``salts`` x |right hot rows| — cheap when the hot side is the probe
      side, which is the web-corpus case: millions of pages pointing at one
      domain row);
    - the join key becomes (key, salt), splitting each hot key across
      ``salts`` buckets; cold rows take salt 0 and pay nothing.

    One key column (or a (left, right) name pair) — salting a composite
    key adds nothing over salting its hash. how: inner|left.
    """
    import numpy as np

    lkey, rkey = on if isinstance(on, tuple) else (on, on)
    if hot_keys is None:
        hot_keys = detect_hot_keys(left_ds, lkey, hot_threshold)
    if not hot_keys:
        return shuffle_join(left_ds, right_ds, (lkey, rkey), left_cols,
                            right_cols, how=how,
                            shuffle_partitions=shuffle_partitions)
    hot_ref = ray.put(sorted(hot_keys))

    class _HotBase:
        """Hot-key set fetched ONCE per actor (ray.put broadcast, zero-copy
        object-store read), cast lazily to the batch's key type."""

        def __init__(self):
            self._vs = pa.array(ray.get(hot_ref))

        def hot_mask(self, batch: pa.Table, key: str):
            import pyarrow.compute as pc
            return pc.is_in(
                batch[key],
                value_set=self._vs.cast(batch.schema.field(key).type))

    class SaltLeft(_HotBase):
        def __call__(self, b: pa.Table) -> pa.Table:
            hot = self.hot_mask(b, lkey).to_numpy(zero_copy_only=False)
            salt = np.where(hot, np.arange(b.num_rows) % salts, 0)
            return b.append_column("__salt", pa.array(salt, pa.int64()))

    class ReplicateRightHot(_HotBase):
        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            hot = self.hot_mask(b, rkey)
            cold_t = b.filter(pc.invert(hot))
            cold = cold_t.append_column(
                "__salt", pa.array(np.zeros(cold_t.num_rows, np.int64)))
            hot_t = b.filter(hot)
            tiled = pa.concat_tables([hot_t] * salts).append_column(
                "__salt", pa.array(np.repeat(np.arange(salts, dtype=np.int64),
                                             hot_t.num_rows)))
            return pa.concat_tables([cold, tiled])

    left2 = (left_ds.select_columns(
                 list(dict.fromkeys([lkey] + left_cols)))
             .map_batches(SaltLeft, batch_format="pyarrow",
                          concurrency=actor_pool_size()))
    right2 = (right_ds.select_columns(
                  list(dict.fromkeys([rkey] + right_cols)))
              .map_batches(ReplicateRightHot, batch_format="pyarrow",
                           concurrency=actor_pool_size()))
    joined = shuffle_join(left2, right2,
                          [(lkey, rkey), ("__salt", "__salt")],
                          left_cols, right_cols, how=how,
                          shuffle_partitions=shuffle_partitions)
    return joined.select_columns([lkey] + left_cols + right_cols)


def anti_join_filter(big_ds, keys, key_col: str, batch_size: int = 8192):
    """Anti-join: keep rows whose key is NOT in the broadcast key set
    (NOT EXISTS semantics). Mirror of semi_join_filter — the key set is
    ray.put once and read zero-copy per actor; for an anti-join where the
    right side is itself huge, run shuffle_join(how='left') and filter the
    null matches instead."""
    ref = ray.put(sorted(keys))

    class FilterFn:
        def __init__(self):
            self.value_set = pa.array(ray.get(ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.is_in(batch[key_col],
                            value_set=self.value_set.cast(
                                batch.schema.field(key_col).type))
            return batch.filter(pc.invert(mask))

    return big_ds.map_batches(FilterFn, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=actor_pool_size())


def running_agg(ds, key_col: str, order_cols: list[str], val_col: str,
                alias: str, row_number_alias: str | None = None,
                shuffle_partitions: int | None = None):
    """Per-key running sum — the window function
    ``SUM(val) OVER (PARTITION BY key ORDER BY order_cols)`` — plus an
    optional ``ROW_NUMBER()`` column, distributed.

    ONE bucketed exchange co-locates each key's rows (any exact running
    aggregate must see its whole partition in order); inside a bucket ALL
    keys are handled by one vectorized pass: sort by (key, order), a single
    grouped cumsum / cumcount — never per-key Python. Output = input columns
    + alias (+ row_number_alias). Ties in order_cols follow the sort order,
    so pass a unique tiebreaker column for deterministic output (same
    requirement as the SQL window frame)."""
    import numpy as np
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        karr = b[key_col].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__bucket", pa.array(_key_buckets(karr, P), pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([key_col] + order_cols, kind="mergesort")
             .reset_index(drop=True))
        grouped = g.groupby(key_col, sort=False)[val_col]
        g[alias] = grouped.cumsum()
        if row_number_alias is not None:
            g[row_number_alias] = grouped.cumcount() + 1
        return g

    return (coalesce_for_exchange(
                ds.map_batches(add_bucket, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def _ntile_from_rn0(rn0, n_rows, k):
    """SQL NTILE tile ids (1-based) from 0-based ranks: the first
    n_rows % k tiles get the extra row. Vectorized; n_rows may be an
    array (per-key) or a scalar (global)."""
    q, r = n_rows // k, n_rows % k
    big = rn0 < (q + 1) * r
    tile = np.where(big, rn0 // np.maximum(q + 1, 1),
                    np.where(q > 0,
                             r + (rn0 - (q + 1) * r) // np.maximum(q, 1),
                             rn0))
    return (tile + 1).astype(np.int64)


def window_funcs(ds, key_col: str, order_cols: list[str],
                 specs: list[tuple[str, str, int, str]],
                 fill=None, shuffle_partitions: int | None = None):
    """Per-key ordered window functions beyond the running frame:
    bounded ROWS frames and offsets —

      ("rolling_sum"|"rolling_min"|"rolling_max", col, w, alias)
          = f(col) OVER (PARTITION BY key ORDER BY order
                         ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)
      ("lag"|"lead", col, n, alias)
          = LAG/LEAD(col, n) OVER (PARTITION BY key ORDER BY order)
      ("rank"|"dense_rank", col, 0, alias)
          = RANK/DENSE_RANK() OVER (PARTITION BY key ORDER BY col)
            (ranked by the VALUE column, ties share a rank — pandas
            grouped rank(method='min'/'dense'), order_cols irrelevant)
      ("ntile", None, n, alias)
          = NTILE(n) OVER (PARTITION BY key ORDER BY order)
            (SQL distribution: the first n_rows mod n tiles get the
            extra row)

    Same exchange shape as ``running_agg`` (any exact window function
    must co-locate its whole partition in order): ONE key-bucketed
    exchange, then per bucket a single sort + pandas grouped
    rolling/shift — C kernels across ALL keys of the bucket at once,
    never per-key Python. Integer columns stay integer (rolling emits
    float; cast back — exact below 2^53). ``fill`` replaces the
    out-of-frame NULLs of lag/lead (pass an int to keep the column
    integer and the SQL mirror a COALESCE); None leaves them null.
    Ties in order_cols need a unique tiebreaker for determinism, as in
    SQL."""
    import numpy as np
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        karr = b[key_col].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__bucket", pa.array(_key_buckets(karr, P), pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([key_col] + order_cols, kind="mergesort")
             .reset_index(drop=True))
        gb = g.groupby(key_col, sort=False)
        for fun, col, param, alias in specs:
            was_int = (col is not None
                       and pd.api.types.is_integer_dtype(g[col]))
            if fun.startswith("rolling_"):
                r = getattr(gb[col].rolling(param, min_periods=1),
                            fun[len("rolling_"):])()
                vals = r.reset_index(level=0, drop=True)
                g[alias] = (vals.astype(np.int64) if was_int else vals)
            elif fun in ("lag", "lead"):
                vals = gb[col].shift(param if fun == "lag" else -param)
                if fill is not None:
                    vals = vals.fillna(fill)
                    if was_int:
                        vals = vals.astype(np.int64)
                g[alias] = vals
            elif fun in ("rank", "dense_rank"):
                g[alias] = gb[col].rank(
                    method="min" if fun == "rank" else "dense"
                ).astype(np.int64)
            elif fun == "ntile":
                rn = gb.cumcount().to_numpy()           # 0-based in order
                n_rows = gb[key_col].transform("size").to_numpy()
                g[alias] = _ntile_from_rn0(rn, n_rows, param)
            else:
                raise ValueError(f"unknown window function {fun!r}")
        return g

    return (coalesce_for_exchange(
                ds.map_batches(add_bucket, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def hopping_window(events_ds, key_col: str, ts_col: str, width_s: int,
                   hop_s: int, specs: list[tuple[str, str, str]],
                   shuffle_partitions: int | None = 16):
    """Hopping (sliding) event-time windows: width_s-wide windows every
    hop_s seconds, so each event lands in width_s/hop_s overlapping windows.

    The fan-out is vectorized in map_batches (np.repeat over the batch, one
    window-start formula per hop offset — the unique window with start
    ≡ k*hop (mod width) containing t is floor((t-k*hop)/width)*width+k*hop),
    then the same partial+final aggregate as tumbling_window over
    (key, window_start). Output scales by the overlap factor — that is the
    operator's semantics, not a leak."""
    import numpy as np

    assert width_s % hop_s == 0
    k = width_s // hop_s
    width_us = np.int64(width_s) * 1_000_000
    hop_us = np.int64(hop_s) * 1_000_000

    def fan_out(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        epoch = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        n = len(epoch)
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        t = epoch[idx]
        ws = (t - offs) // width_us * width_us + offs
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column(
            "window_start", pa.array(ws, pa.int64()))

    fanned = events_ds.map_batches(fan_out, batch_format="pyarrow")
    return partial_final_agg(fanned, [key_col, "window_start"], specs,
                             shuffle_partitions=shuffle_partitions)


def rollup_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
               shuffle_partitions: int | None = 16, fill: str = "*ALL*"):
    """GROUP BY ROLLUP: aggregates at every key-prefix level (full keys,
    then dropping the trailing key per level, down to the grand total).

    The input is scanned ONCE: the deepest level runs partial_final_agg over
    the raw rows, and each shallower level RE-AGGREGATES the previous
    level's (already tiny) result — sums of sums, min of mins, max of maxes,
    counts re-aggregate as sums. ``mean`` is not re-aggregable this way and
    is rejected. Dropped key columns are filled with ``fill`` (SQL ROLLUP
    emits NULL there; the oracle mirrors with COALESCE), so keys must be
    string-typed. Output rows = sum over levels of that level's group count.
    """
    assert all(f in ("sum", "min", "max", "count") for _, f, _ in specs), \
        "rollup_agg re-aggregates levels; mean is not decomposable"
    # specs over a level's output columns: count re-aggregates as sum
    respec = [(alias, "sum" if f == "count" else f, alias)
              for _, f, alias in specs]

    def pad(prefix):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (b[k] if k in prefix
                           else pa.array([fill] * b.num_rows, pa.string()))
            for _, _, a in specs:
                cols[a] = b[a]
            return pa.table(cols)
        return fn

    levels = []
    cur = partial_final_agg(ds, keys, specs,
                            shuffle_partitions=shuffle_partitions)
    # the upper levels re-aggregate cur's (tiny) rows repeatedly
    cur = cur.materialize()
    levels.append(cur.map_batches(pad(tuple(keys)), batch_format="pyarrow"))
    for depth in range(len(keys) - 1, -1, -1):
        prefix = keys[:depth]
        if prefix:
            cur = partial_final_agg(cur, prefix, respec,
                                    shuffle_partitions=shuffle_partitions)
            cur = cur.materialize()
        else:
            # grand total: single global aggregate over the level-1 rows.
            # Column types come from the level-1 schema (min/max of a
            # string or float measure must not be cast to int64).
            from ray.data.aggregate import Max, Min, Sum
            aggs = {"sum": Sum, "min": Min, "max": Max}
            lsch = cur.schema()
            if lsch is None:
                # provably-empty input: SQL's grand-total grouping set
                # still emits ONE all-null row; level-1 types are unknown
                # so the aggregates fall back to int64 (count-like)
                sch = {a: pa.int64() for _, _, a in respec}
                row = {}
            else:
                sch = dict(zip(lsch.names, lsch.types))
                row = cur.aggregate(*[aggs[f](a, alias_name=a)
                                      for _, f, a in respec]) or {}
            cur = ray.data.from_arrow(pa.table(
                {a: pa.array([row.get(a)], sch[a])
                 for _, _, a in respec}))
        levels.append(cur.map_batches(pad(tuple(prefix)),
                                      batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_agg(ds, keys: list[str], specs: list[tuple[str, str, str]],
             shuffle_partitions: int | None = 16, fill: str = "*ALL*"):
    """GROUP BY CUBE: aggregates at every SUBSET of ``keys`` (2^k levels).

    Same one-input-scan design as ``rollup_agg``: the full-key level runs
    partial_final_agg over the raw rows; every other subset re-aggregates
    that (tiny) result — sums of sums, counts as sums — so the raw data is
    never re-shuffled per level. ``mean`` rejected (not decomposable).
    Dropped keys are filled with ``fill`` (oracle mirrors with COALESCE over
    GROUP BY CUBE), so keys must be string-typed.
    """
    from itertools import combinations

    assert all(f in ("sum", "min", "max", "count") for _, f, _ in specs), \
        "cube_agg re-aggregates levels; mean is not decomposable"
    respec = [(alias, "sum" if f == "count" else f, alias)
              for _, f, alias in specs]

    def pad(prefix):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (b[k] if k in prefix
                           else pa.array([fill] * b.num_rows, pa.string()))
            for _, _, a in specs:
                cols[a] = b[a]
            return pa.table(cols)
        return fn

    deepest = partial_final_agg(ds, keys, specs,
                                shuffle_partitions=shuffle_partitions)
    deepest = deepest.materialize()      # every subset re-reads it
    levels = [deepest.map_batches(pad(tuple(keys)), batch_format="pyarrow")]
    for depth in range(len(keys) - 1, -1, -1):
        for subset in combinations(keys, depth):
            if subset:
                lv = partial_final_agg(deepest, list(subset), respec,
                                       shuffle_partitions=shuffle_partitions)
            else:
                from ray.data.aggregate import Max, Min, Sum
                aggs = {"sum": Sum, "min": Min, "max": Max}
                dsch = deepest.schema()
                if dsch is None:           # provably-empty input (see
                    sch = {a: pa.int64()   # rollup_agg grand total)
                           for _, _, a in respec}
                    row = {}
                else:
                    sch = dict(zip(dsch.names, dsch.types))
                    row = deepest.aggregate(
                        *[aggs[f](a, alias_name=a)
                          for _, f, a in respec]) or {}
                lv = ray.data.from_arrow(pa.table(
                    {a: pa.array([row.get(a)], sch[a])
                     for _, _, a in respec}))
            levels.append(lv.map_batches(pad(subset),
                                         batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def set_op(left_ds, right_ds, cols: list[str], op: str,
           shuffle_partitions: int | None = None):
    """Distinct-row set operations: ``intersect`` / ``except`` / ``union``
    (ANSI INTERSECT / EXCEPT / UNION — all DISTINCT semantics).

    ONE exchange: each side is reduced per block to (row -> side presence
    counts), the union of partials goes through a single grouped sum keyed
    on the full row, and a vectorized filter picks the rows the operator
    keeps (intersect: present both sides; except: left only; union: any).
    Only per-block-distinct rows cross the shuffle — the exact-dedup
    pattern applied to two tagged inputs.
    """
    assert op in ("intersect", "except", "union")

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            ones = pa.array(np.ones(b.num_rows, np.int64))
            zeros = pa.array(np.zeros(b.num_rows, np.int64))
            t = b.select(cols)
            t = t.append_column("_l", ones if side == 0 else zeros)
            return t.append_column("_r", zeros if side == 0 else ones)
        return fn

    tagged = (left_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(right_ds.map_batches(tag(1), batch_format="pyarrow")))
    counts = partial_final_agg(tagged, cols,
                               [("_l", "sum", "_l"), ("_r", "sum", "_r")],
                               shuffle_partitions=shuffle_partitions)

    def pick(b: pa.Table) -> pa.Table:
        l = b["_l"].to_numpy(zero_copy_only=False)
        r = b["_r"].to_numpy(zero_copy_only=False)
        if op == "intersect":
            keep = (l > 0) & (r > 0)
        elif op == "except":
            keep = (l > 0) & (r == 0)
        else:
            keep = np.ones(len(l), bool)
        return b.filter(pa.array(keep)).select(cols)

    return counts.map_batches(pick, batch_format="pyarrow")


def grouped_mode(ds, key_col: str, val_col: str, alias: str = "mode",
                 count_alias: str = "mode_n",
                 shuffle_partitions: int | None = None):
    """Per-key mode: the most frequent value of ``val_col`` for each key,
    ties broken to the SMALLEST value (deterministic at any parallelism —
    the same rule as ``ROW_NUMBER() OVER (... ORDER BY COUNT(*) DESC,
    v)``). Output: (key, alias, count_alias).

    Shape: per batch an Arrow group_by reduces to (key, value, n) partials
    — bounded by the batch's distinct pairs — then ONE key-bucketed
    exchange and a C pandas merge + sort + first-per-key per bucket. The
    exchange carries pair partials, never raw rows."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({key_col: b[key_col], val_col: b[val_col]}).group_by(
            [key_col, val_col]).aggregate([([], "count_all")])
        karr = g[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: g[key_col], val_col: g[val_col],
            "__n": pa.compute.cast(g["count_all"], pa.int64()),
            "__bucket": pa.array(_key_buckets(karr, P), pa.int64())})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby([key_col, val_col], sort=False)["__n"].sum()
             .reset_index())
        m = m.sort_values([key_col, "__n", val_col],
                          ascending=[True, False, True], kind="mergesort")
        m = m.drop_duplicates(key_col, keep="first")
        return m.rename(columns={val_col: alias, "__n": count_alias})[
            [key_col, alias, count_alias]]

    return (coalesce_for_exchange(
                ds.map_batches(partial, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(pick, batch_format="pandas"))


def grouped_quantiles_cont(ds, key_col: str, val_col: str,
                           percents: list[int],
                           alias: str = "q_micro",
                           shuffle_partitions: int | None = None):
    """Per-key CONTINUOUS (interpolated) percentiles — percentile_cont —
    over an INTEGER value column, with a bit-exact integer contract so an
    SQL oracle can mirror it at any scale: for percent p (0..100) over the
    key's n ascending values v[0..n-1],

        pos = p * (n - 1);  l = pos // 100;  rem = pos % 100
        q_micro = v[l] * 1000 + (v[l+1] - v[l]) * rem * 10

    (*1000/100 == *10 exactly — no rounding anywhere, so q_micro is the
    true interpolated value in 1/1000ths of the input unit). Callers feed
    milli-unit ints; output rows are (key, p, q_micro).

    Same exchange contract as ``grouped_quantiles`` (exact order
    statistics must co-locate each key's values — ONE key-bucketed
    exchange); per bucket everything is C: one stable sort, grouped
    cumcount/size, and two merges picking v[l] and v[l+1] for ALL
    (key, p) pairs at once."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)
    percents = sorted(dict.fromkeys(int(p) for p in percents))
    if not all(0 <= p <= 100 for p in percents):
        raise ValueError(f"percents must be in [0, 100]: {percents}")

    def add_bucket(b: pa.Table) -> pa.Table:
        karr = b[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: b[key_col], val_col: b[val_col],
            "__bucket": pa.array(_key_buckets(karr, P), pa.int64())})

    pdf = pd.DataFrame({"p": pd.array(percents, dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([key_col, val_col], kind="mergesort")
             .reset_index(drop=True))
        gb = g.groupby(key_col, sort=False)
        g["rn"] = gb.cumcount()
        keys = gb.size().rename("n").reset_index()
        kp = keys.merge(pdf, how="cross")
        pos = kp["p"].to_numpy() * (kp["n"].to_numpy() - 1)
        kp["l"] = pos // 100
        kp["rem"] = pos % 100
        lo = kp.merge(g.rename(columns={"rn": "l", val_col: "v_lo"}),
                      on=[key_col, "l"], how="left")
        hi_src = g.assign(l=g["rn"] - 1).rename(columns={val_col: "v_hi"})
        lo = lo.merge(hi_src[[key_col, "l", "v_hi"]],
                      on=[key_col, "l"], how="left")
        v_lo = lo["v_lo"].to_numpy(dtype=np.int64)
        v_hi = lo["v_hi"].fillna(lo["v_lo"]).to_numpy(dtype=np.int64)
        rem = lo["rem"].to_numpy(dtype=np.int64)
        lo[alias] = v_lo * 1000 + (v_hi - v_lo) * rem * 10
        return lo[[key_col, "p", alias]]

    return (coalesce_for_exchange(
                ds.map_batches(add_bucket, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def funnel_counts(events_ds, key_col: str, ts_col: str, type_col: str,
                  steps: list[str], within_s: int | None = None,
                  shuffle_partitions: int | None = None):
    """Funnel analysis: how many keys (users) completed each PREFIX of the
    ordered step sequence — earliest-first greedy semantics (the standard
    product-analytics funnel): t_1 = min ts of step 1; t_i = min ts of a
    step-i event STRICTLY after t_{i-1} (and, when ``within_s`` is set,
    at most ``within_s`` seconds after it — the conversion-window form).
    Output: (step 1-based, n_keys), one row per step.

    ONE key-bucketed exchange co-locates each key's events; per bucket
    every step is a C pass over ALL the bucket's keys at once (filter by
    type, anti-ts merge against the previous step's per-key time, grouped
    min) — no per-key Python. Per-bucket per-step key counts (ints) are
    the only thing the final tiny step-keyed sum sees."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.is_in(b[type_col],
                              value_set=pa.array(steps)))
        karr = b[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: b[key_col], ts_col: b[ts_col], type_col: b[type_col],
            "__bucket": pa.array(_key_buckets(karr, P), pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        prev = None                       # DataFrame[key, __t]
        out_steps, out_counts = [], []
        for i, st in enumerate(steps):
            ev = g[g[type_col] == st][[key_col, ts_col]]
            if prev is not None:
                ev = ev.merge(prev, on=key_col)
                keep = ev[ts_col] > ev["__t"]
                if within_s is not None:
                    keep &= (ev[ts_col]
                             <= ev["__t"] + pd.Timedelta(seconds=within_s))
                ev = ev[keep][[key_col, ts_col]]
            cur = (ev.groupby(key_col, sort=False)[ts_col].min()
                   .rename("__t").reset_index())
            out_steps.append(i + 1)
            out_counts.append(len(cur))
            prev = cur
            if not len(cur):
                # later steps are all zero for this bucket
                for j in range(i + 1, len(steps)):
                    out_steps.append(j + 1)
                    out_counts.append(0)
                break
        return pd.DataFrame({"step": np.array(out_steps, np.int64),
                             "n_keys": np.array(out_counts, np.int64)})

    per = (coalesce_for_exchange(
               events_ds.map_batches(add_bucket, batch_format="pyarrow"),
               P)
           .groupby("__bucket")
           .map_groups(per_bucket, batch_format="pandas"))
    return partial_final_agg(per, ["step"], [("n_keys", "sum", "n_keys")])


def pivot_agg(ds, key_col: str, pivot_col: str, val_col: str,
              categories: list[str], fun: str = "sum",
              shuffle_partitions: int | None = 16):
    """Pivot: one output row per key, one column per category holding
    ``fun`` of ``val_col`` over that (key, category) slice — the
    wide-format report shape (SQL: conditional aggregation). Missing
    slices are 0 for sum/count, NULL-free by contract. Unlisted
    categories are ignored (the caller names the report's columns —
    unbounded pivots belong in long format).

    Per batch the categories become masked integer columns (one Arrow
    filter + group_by per batch, NOT per category-row pair) and the rest
    is the ordinary low-cardinality ``partial_final_agg`` — pivoting adds
    ZERO exchanges over a plain grouped aggregate."""
    assert fun in ("sum", "count")

    def widen(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {key_col: b[key_col]}
        piv = b[pivot_col]
        v = (b[val_col].to_numpy(zero_copy_only=False)
             if fun == "sum" else np.ones(b.num_rows, np.int64))
        for c in categories:
            mask = pc.equal(piv, c).to_numpy(zero_copy_only=False)
            cols[f"{c}"] = pa.array(
                np.where(mask, v, 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    return partial_final_agg(
        ds.map_batches(widen, batch_format="pyarrow"),
        [key_col], [(c, "sum", c) for c in categories],
        shuffle_partitions=shuffle_partitions)


def cohort_retention(events_ds, key_col: str, ts_col: str,
                     period_s: int, max_periods: int,
                     shuffle_partitions: int | None = None):
    """Cohort retention: bucket every key (user) into the cohort of its
    FIRST event's period (epoch // period_s), then count, per (cohort,
    period_offset), the keys active in that later period — the activation
    /retention matrix. Output: (cohort_period, period_offset, n_keys),
    offsets 0..max_periods.

    ONE key-bucketed exchange (first-event assignment needs each key's
    min ts with its activity set); per bucket everything is C: grouped
    min for the cohort, one merge, a drop_duplicates on (key, period),
    offset arithmetic, and a (cohort, offset) groupby count; the final
    tiny sum merges bucket partials."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = b[ts_col].to_numpy(zero_copy_only=False)
        period = (ts.astype("datetime64[s]").astype(np.int64)
                  // period_s).astype(np.int64)
        karr = b[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: b[key_col],
            "__p": pa.array(period, pa.int64()),
            "__bucket": pa.array(_key_buckets(karr, P), pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").drop_duplicates([key_col, "__p"])
        first = (g.groupby(key_col, sort=False)["__p"].min()
                 .rename("__c").reset_index())
        m = g.merge(first, on=key_col)
        m["__off"] = m["__p"] - m["__c"]
        m = m[m["__off"] <= max_periods]
        out = (m.groupby(["__c", "__off"], sort=False)
               .size().rename("n_keys").reset_index())
        return out.rename(columns={"__c": "cohort_period",
                                   "__off": "period_offset"})

    per = (coalesce_for_exchange(
               events_ds.map_batches(add_bucket, batch_format="pyarrow"),
               P)
           .groupby("__bucket")
           .map_groups(per_bucket, batch_format="pandas"))
    return partial_final_agg(per, ["cohort_period", "period_offset"],
                             [("n_keys", "sum", "n_keys")])


def interval_join(left_ds, right_ds, l_span: tuple[str, str],
                  r_span: tuple[str, str], l_cols: list[str],
                  r_cols: list[str], tile: int,
                  shuffle_partitions: int | None = None):
    """Interval OVERLAP join: every (left, right) row pair whose half-open
    integer spans intersect — ``l_start < r_end AND r_start < l_end``
    (time-range conflicts, concurrent sessions, genomic range overlap).
    Spans are int64 (e.g. epoch micros); output columns are
    l_cols + r_cols + the four span columns (caller keeps names disjoint).

    The tiling pattern: each interval is emitted once per ``tile``-width
    window it touches, pairs meet in a tile-bucketed exchange, and each
    candidate pair is KEPT only in the canonical tile containing the
    overlap's start (max of the two starts) — one exchange, exact
    semantics, no second dedup pass, because every overlapping pair
    shares at least the canonical tile by construction. Per-bucket
    matching is one C merge on the tile id + two vectorized filters.

    Fan-out contract (the documented partitioning assumption): a span is
    replicated ceil(len/tile) times, so pick ``tile`` near the TYPICAL
    span length — long-tail spans cost their length; empty spans
    (end <= start) match nothing.
    """
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def explode(s_col, e_col, keep, s_out, e_out):
        def fn(b: pa.Table) -> pa.Table:
            s = b[s_col].to_numpy(zero_copy_only=False).astype(np.int64)
            e = b[e_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ok = e > s
            s, e = s[ok], e[ok]
            t_lo = s // tile
            t_hi = (e - 1) // tile
            counts = (t_hi - t_lo + 1)
            idx = np.repeat(np.arange(len(s)), counts)
            offs = (np.arange(counts.sum())
                    - np.repeat(np.cumsum(counts) - counts, counts))
            cols = {
                "__tile": pa.array(t_lo[idx] + offs, pa.int64()),
                s_out: pa.array(s[idx], pa.int64()),
                e_out: pa.array(e[idx], pa.int64()),
            }
            base = b.filter(pa.array(ok))
            for c in keep:
                cols[c] = base[c].take(pa.array(idx, pa.int64()))
            t = pa.table(cols)
            bkt = (t_lo[idx] + offs) % P
            return t.append_column("__bucket",
                                   pa.array(bkt.astype(np.int64),
                                            pa.int64()))
        return fn

    lt = left_ds.map_batches(
        explode(l_span[0], l_span[1], l_cols, "__ls", "__le"),
        batch_format="pyarrow")
    rt = right_ds.map_batches(
        explode(r_span[0], r_span[1], r_cols, "__rs", "__re"),
        batch_format="pyarrow")

    # union needs ONE schema: each side pads the other side's columns
    # with typed nulls (same pattern as bloom_semi_join's tagged union)
    lsch, rsch = left_ds.schema(), right_ds.schema()
    ltype = dict(zip(lsch.names, lsch.types))
    rtype = dict(zip(rsch.names, rsch.types))

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {c: b[c] for c in b.column_names}
            if side == 0:
                cols["__rs"] = pa.nulls(n, pa.int64())
                cols["__re"] = pa.nulls(n, pa.int64())
                for c in r_cols:
                    cols[c] = pa.nulls(n, rtype[c])
            else:
                cols["__ls"] = pa.nulls(n, pa.int64())
                cols["__le"] = pa.nulls(n, pa.int64())
                for c in l_cols:
                    cols[c] = pa.nulls(n, ltype[c])
            cols["__side"] = pa.array(np.full(n, side, np.int8), pa.int8())
            order = (["__tile", "__ls", "__le", "__rs", "__re"]
                     + l_cols + r_cols + ["__bucket", "__side"])
            return pa.table({c: cols[c] for c in order})
        return fn

    out_cols = (l_cols + r_cols
                + [l_span[0], l_span[1], r_span[0], r_span[1]])

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        # the padded nulls of the OTHER side make pandas lift span columns
        # to float; re-int them after the side split (exact below 2^53,
        # and int64 again from here on)
        import pyarrow as _pa
        lcast = {c: np.int64 for c in l_cols
                 if _pa.types.is_integer(ltype[c])}
        rcast = {c: np.int64 for c in r_cols
                 if _pa.types.is_integer(rtype[c])}
        lf = (g[g["__side"] == 0][["__tile", "__ls", "__le"] + l_cols]
              .astype({"__ls": np.int64, "__le": np.int64, **lcast}))
        rf = (g[g["__side"] == 1][["__tile", "__rs", "__re"] + r_cols]
              .astype({"__rs": np.int64, "__re": np.int64, **rcast}))
        m = lf.merge(rf, on="__tile")
        if not len(m):
            return pd.DataFrame({c: [] for c in out_cols})
        ls, le = m["__ls"].to_numpy(), m["__le"].to_numpy()
        rs, re = m["__rs"].to_numpy(), m["__re"].to_numpy()
        keep = ((ls < re) & (rs < le)
                & (np.maximum(ls, rs) // tile == m["__tile"].to_numpy()))
        m = m[keep]
        m = m.rename(columns={"__ls": l_span[0], "__le": l_span[1],
                              "__rs": r_span[0], "__re": r_span[1]})
        return m[out_cols]

    tagged = (lt.map_batches(tag(0), batch_format="pyarrow")
              .union(rt.map_batches(tag(1), batch_format="pyarrow")))
    return (coalesce_for_exchange(tagged, P)
            .groupby("__bucket")
            .map_groups(bucket_join, batch_format="pandas"))


def table_diff(old_ds, new_ds, key_cols: list[str], val_cols: list[str],
               shuffle_partitions: int | None = None):
    """Snapshot diff (the CDC / regression-check primitive): compare two
    versions of a keyed table and emit one row per difference —
    ``change`` ∈ {'added', 'removed', 'changed'} with the key columns.
    Unchanged rows (key present in both, all val_cols equal) emit
    nothing, so the output is |delta|-sized, never |table|-sized.

    ONE exchange: both sides union-tagged and key-hash-bucketed (the
    set_op shape, but row-level with value comparison); per bucket one C
    outer merge classifies adds/removes/changes vectorized. Duplicate
    keys within a side are the caller's contract violation (first row
    wins, deterministic after an in-bucket stable sort)."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)
    cols = key_cols + val_cols

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            t = b.select(cols)
            bkt = np.zeros(b.num_rows, np.int64)
            for k in key_cols:
                karr = b[k].to_numpy(zero_copy_only=False)
                bkt = (bkt * 31 + _key_buckets(karr, P)) % P
            t = t.append_column("__side", pa.array(
                np.full(b.num_rows, side, np.int8), pa.int8()))
            return t.append_column("__bucket", pa.array(bkt, pa.int64()))
        return fn

    def bucket_diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols, kind="mergesort")
        a = (g[g["__side"] == 0][cols]
             .drop_duplicates(key_cols, keep="first"))
        b = (g[g["__side"] == 1][cols]
             .drop_duplicates(key_cols, keep="first"))
        m = a.merge(b, on=key_cols, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        added = m["_merge"] == "right_only"
        removed = m["_merge"] == "left_only"
        changed = m["_merge"] == "both"
        if val_cols:
            same = np.ones(len(m), bool)
            for v in val_cols:
                o, n = m[f"{v}_o"], m[f"{v}_n"]
                # NULL == NULL counts as unchanged (SQL's o.v <> n.v
                # excludes the row; pandas NaN == NaN would flag it)
                same &= ((o == n) | (o.isna() & n.isna())).to_numpy()
            changed = changed.to_numpy() & ~same
        else:
            changed = np.zeros(len(m), bool)
        out = m[added.to_numpy() | removed.to_numpy() | changed]
        change = np.where(out["_merge"] == "right_only", "added",
                          np.where(out["_merge"] == "left_only",
                                   "removed", "changed"))
        res = out[key_cols].copy()
        res["change"] = change
        return res.reset_index(drop=True)

    tagged = (old_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(new_ds.map_batches(tag(1), batch_format="pyarrow")))
    return (coalesce_for_exchange(tagged, P)
            .groupby("__bucket")
            .map_groups(bucket_diff, batch_format="pandas"))


def gapfill_counts(events_ds, key_col: str, ts_col: str, width_s: int,
                   shuffle_partitions: int | None = None):
    """Dense per-key time series: event counts per ``width_s`` bucket with
    the GAPS FILLED — every key emits one row for EVERY bucket between its
    first and last event, zeros included (the densification step before
    any rolling/forecast model; a plain groupby silently drops empty
    buckets). Output: (key, bucket, n_events).

    ONE key-bucketed exchange; per bucket a C groupby counts occupied
    (key, bucket) cells, a per-key [min, max] range explode (np.repeat +
    arange — vectorized over all keys at once) builds the dense grid, and
    a left merge fills zeros. The grid is |keys x span| rows — the
    documented fan-out: a key spanning years at second granularity costs
    its span; pick width_s to match the analysis resolution."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = b[ts_col].to_numpy(zero_copy_only=False)
        bucket = (ts.astype("datetime64[s]").astype(np.int64)
                  // width_s).astype(np.int64)
        karr = b[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: b[key_col],
            "__b": pa.array(bucket, pa.int64()),
            "__bucket": pa.array(_key_buckets(karr, P), pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        occ = (g.groupby([key_col, "__b"], sort=False)
               .size().rename("n_events").reset_index())
        rng = occ.groupby(key_col, sort=False)["__b"].agg(["min", "max"])
        spans = (rng["max"] - rng["min"] + 1).to_numpy()
        keys = np.repeat(rng.index.to_numpy(), spans)
        offs = (np.arange(spans.sum())
                - np.repeat(np.cumsum(spans) - spans, spans))
        grid = pd.DataFrame({
            key_col: keys,
            "__b": np.repeat(rng["min"].to_numpy(), spans) + offs})
        out = grid.merge(occ, on=[key_col, "__b"], how="left")
        out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
        return out.rename(columns={"__b": "bucket"})

    return (coalesce_for_exchange(
                events_ds.map_batches(add_bucket, batch_format="pyarrow"),
                P)
            .groupby("__bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def range_sample(ds, cols: list[str], per_batch: int = 8) -> list[dict]:
    """Bounded whole-input sample for range-partitioner cutpoints: every
    BATCH contributes up to ``per_batch`` evenly spaced rows, so sorted or
    time-ordered inputs cannot bias the cutpoints toward the head (a
    ``limit(n)`` head sample would send ~all rows of an order-correlated
    input to the last range bucket — the exact skew a range partitioner
    exists to avoid). Driver cost is O(per_batch × batches) tiny rows —
    the same bounded-partials contract as the repo's other driver merges.
    Bucket BALANCE still tracks sample quality; correctness never depends
    on it."""
    import ray

    def spaced(b: pa.Table) -> pa.Table:
        k = min(per_batch, b.num_rows)
        if k == 0:
            return b.select(cols)
        idx = (np.arange(k) * b.num_rows) // k
        return b.select(cols).take(pa.array(idx, pa.int64()))

    out = []
    for t in ray.get(ds.select_columns(cols).map_batches(
            spaced, batch_format="pyarrow").to_arrow_refs()):
        out.extend(t.to_pylist())
    return out


def global_row_number(ds, order_col: str, id_col: str, keep: list[str]
                      | None = None, ntile: int | None = None,
                      sample_size: int = 4096,
                      shuffle_partitions: int | None = None):
    """Distributed ``ROW_NUMBER() OVER (ORDER BY order_col, id_col)`` —
    a dense global 1-based rank over a TOTAL order (the zipWithIndex-by-
    order primitive: global sort positions without a driver-side sort).
    With ``ntile`` also emits the SQL ``NTILE(n)`` tile (equi-depth
    binning over the whole table). Output: (id_col, keep..., rn[, tile]).
    ``order_col`` and ``id_col`` must be ints (the tiebreak mirrors SQL).

    Shape: driver gathers per-batch evenly SPACED (order, id) pairs for
    range cutpoints (``range_sample`` — a head sample would collapse
    order-correlated input into one bucket), thinned to ``sample_size``;
    rows bucket by range
    in ONE exchange; each bucket sorts locally and emits LOCAL ranks plus
    its size. Bucket sizes (≤P ints) come back to the driver, prefix-sum
    to offsets, broadcast once — a second metadata-only pass adds
    offset[bucket] to each local rank. Exactly one data exchange; the
    ranked intermediate is materialized once (it is the output's size)."""
    import pandas as pd
    import ray
    import ray.data

    P = max(16, shuffle_partitions or 0)
    keep = keep or []

    head = range_sample(ds, [order_col, id_col])
    if not head:
        # full output schema even when empty: id_col + keep + rn (+ tile),
        # keep-column types taken from the input schema
        sch = ds.schema()
        in_types = dict(zip(sch.names, sch.types)) if sch else {}
        empty = {id_col: pa.array([], in_types.get(id_col, pa.int64()))}
        for c in keep:
            empty[c] = pa.array([], in_types.get(c, pa.int64()))
        empty["rn"] = pa.array([], pa.int64())
        if ntile:
            empty["tile"] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(empty))
    if len(head) > sample_size:
        step = (np.arange(sample_size) * len(head)) // sample_size
        head = [head[i] for i in step]
    comp = np.sort(np.array(
        [(r[order_col], r[id_col]) for r in head],
        dtype=[("v", np.int64), ("i", np.int64)]))
    cut_idx = (np.arange(1, P) * len(comp)) // P
    cuts = np.unique(comp[cut_idx])

    def assign(b: pa.Table) -> pa.Table:
        v = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rec = np.empty(len(v), dtype=[("v", np.int64), ("i", np.int64)])
        rec["v"], rec["i"] = v, i
        bkt = np.searchsorted(cuts, rec, side="right")
        cols = {order_col: b[order_col], id_col: b[id_col]}
        for c in keep:
            cols[c] = b[c]
        t = pa.table(cols)
        return t.append_column("__bucket",
                               pa.array(bkt.astype(np.int64), pa.int64()))

    def local_rank(g: pd.DataFrame) -> pd.DataFrame:
        bkt = int(g["__bucket"].iloc[0])
        g = (g.drop(columns="__bucket")
             .sort_values([order_col, id_col], kind="mergesort")
             .reset_index(drop=True))
        g["__lr"] = np.arange(len(g), dtype=np.int64)
        g["__bkt"] = bkt
        return g

    ranked = (coalesce_for_exchange(
                  ds.map_batches(assign, batch_format="pyarrow"), P)
              .groupby("__bucket")
              .map_groups(local_rank, batch_format="pandas")
              .materialize())

    # bucket sizes -> prefix offsets (<= P ints on the driver)
    sizes = {}
    for t in ray.get(ranked.map_batches(
            lambda b: pa.table({"b": b["__bkt"]}),
            batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows:
            for bk, n in zip(*np.unique(
                    t["b"].to_numpy(zero_copy_only=False),
                    return_counts=True)):
                sizes[int(bk)] = sizes.get(int(bk), 0) + int(n)
    order = sorted(sizes)
    offsets = {}
    acc = 0
    for bk in order:
        offsets[bk] = acc
        acc += sizes[bk]
    n_total = acc
    off_ref = ray.put(offsets)

    def finish(b: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        bk = b["__bkt"].to_numpy(zero_copy_only=False)
        lr = b["__lr"].to_numpy(zero_copy_only=False)
        rn = (np.array([offs[int(x)] for x in bk], np.int64) + lr + 1)
        cols = {id_col: b[id_col]}
        for c in keep:
            cols[c] = b[c]
        cols["rn"] = pa.array(rn, pa.int64())
        if ntile:
            cols["tile"] = pa.array(
                _ntile_from_rn0(rn - 1, n_total, ntile), pa.int64())
        return pa.table(cols)

    return ranked.map_batches(finish, batch_format="pyarrow")


def melt_batch(batch: pa.Table, id_cols: list[str], value_cols: list[str],
               var_name: str = "variable",
               value_name: str = "value") -> pa.Table:
    """UNPIVOT / melt (wide -> long), batch-local: every input row emits
    one output row per value column, (id_cols..., variable, value). Value
    columns must share a type (cast upstream). Zero exchanges — pure
    column gather + concat per batch, composes with any downstream
    grouped op."""
    n = batch.num_rows
    ids = {c: pa.concat_arrays(
        [batch[c].combine_chunks()] * len(value_cols))
        for c in id_cols}
    var = pa.array(np.repeat(np.arange(len(value_cols)), n), pa.int64())
    names = pa.array(value_cols, pa.string()).take(var)
    vals = pa.concat_arrays(
        [batch[c].combine_chunks().cast(batch[value_cols[0]].type)
         for c in value_cols])
    return pa.table({**ids, var_name: names, value_name: vals})


def latest_by_key(ds, key_cols: list[str], order_col: str,
                  tiebreak: list[str] | None = None,
                  shuffle_partitions: int | None = None):
    """Grouped argmax row-dedup: exactly ONE row per key — the one with
    the greatest (order_col, *tiebreak) — with every payload column kept.
    The crawl-recency pattern (keep the newest capture per URL), also the
    generic CDC "current snapshot" reducer.

    Shape: block-local argmax first (one row per key per block crosses the
    wire, payload included exactly once), then ONE key-hash bucketed
    exchange with a vectorized in-bucket sort + drop_duplicates.

    DETERMINISM: when no ``tiebreak`` is given and order_col fully ties
    within a key, the remaining SCALAR payload columns join the sort as a
    last-resort total order — the winning row is then a pure function of
    the data, not of block layout (without this, the block-local
    keep='first' made the answer depend on partitioning). The fallback is
    SKIPPED when an explicit tiebreak is passed: the tiebreak is the
    caller's uniqueness contract, and sorting wide payload columns on
    every block would buy nothing (a full per-block string argsort for a
    text payload). Nested-typed payload columns (list/struct/map — pandas
    cannot sort them) are always excluded, so rows distinguished ONLY by
    a nested column need that explicit unique tiebreak."""
    import numpy as np
    import pandas as pd

    P = max(16, shuffle_partitions or 0)
    sort_cols = key_cols + [order_col] + list(tiebreak or [])
    if tiebreak:
        payload_rest = []
    else:
        sch = ds.schema()
        nested = (pa.types.is_nested(t) for t in sch.types)
        unsortable = {c for c, n in zip(sch.names, nested) if n}
        payload_rest = [c for c in sch.names
                        if c not in sort_cols and c not in unsortable]
    sort_cols = sort_cols + payload_rest
    asc = [True] * len(key_cols) + [False] * (1 + len(tiebreak or [])
                                              + len(payload_rest))

    def local(b: pa.Table) -> pa.Table:
        df = (b.to_pandas().sort_values(sort_cols, ascending=asc,
                                        kind="mergesort")
              .drop_duplicates(key_cols, keep="first"))
        bkt = np.zeros(len(df), np.int64)
        for k in key_cols:
            bkt = (bkt * 31 + _key_buckets(df[k].to_numpy(), P)) % P
        df = df.assign(__bucket=bkt)
        return pa.Table.from_pandas(df, preserve_index=False)

    out_cols = [c for c in ds.schema().names]

    def merge(g: pd.DataFrame) -> pa.Table:
        m = (g.sort_values(sort_cols, ascending=asc, kind="mergesort")
             .drop_duplicates(key_cols, keep="first"))
        return pa.Table.from_pandas(m[out_cols], preserve_index=False)

    partial = ds.map_batches(local, batch_format="pyarrow")
    return (coalesce_for_exchange(partial, P)
            .groupby("__bucket")
            .map_groups(merge, batch_format="pandas"))
