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

import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Max, Mean, Min, Sum


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
                              batch_size=batch_size, concurrency=(1, 8))


def semi_join_filter(big_ds, keys: set, key_col: str, batch_size: int = 8192):
    """Semi-join: keep rows whose key is in the broadcast key set."""
    ref = ray.put(frozenset(keys))

    class FilterFn:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pa.array([k in self.keys for k in batch[key_col].to_pylist()])
            return batch.filter(mask)

    return big_ds.map_batches(FilterFn, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=(1, 8))


_AGGS = {"sum": Sum, "min": Min, "max": Max, "mean": Mean}
_ARROW_FUNS = {"sum": "sum", "min": "min", "max": "max", "count": "count"}


def partial_final_agg(ds, keys: list[str], specs: list[tuple[str, str, str]]):
    """Grouped aggregation with in-batch combining.

    specs: [(col, fun, alias)] with fun in {sum, min, max, count}.
    Per batch: arrow group_by combine -> one row per key per block; final:
    Ray groupby over partials (count partials re-aggregate with sum).
    """
    def combine(batch: pa.Table) -> pa.Table:
        aggs = [(c, _ARROW_FUNS[f]) for c, f, _ in specs]
        g = batch.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c, f, alias in specs:
            cols[alias] = g[f"{c}_{_ARROW_FUNS[f]}"]
        return pa.table(cols)

    partial = ds.map_batches(combine, batch_format="pyarrow")
    final_aggs = []
    for c, f, alias in specs:
        fun = "sum" if f == "count" else f
        final_aggs.append(_AGGS[fun](alias, alias_name=alias))
    return partial.groupby(keys).aggregate(*final_aggs)


def tumbling_window(events_ds, key_col: str, ts_col: str, width_s: int,
                    specs: list[tuple[str, str, str]]):
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
    return partial_final_agg(bucketed, [key_col, "window_start"], specs)
