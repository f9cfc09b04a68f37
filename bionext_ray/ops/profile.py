"""Dataset profiling: per-column quality stats in one streaming pass.

The pre-training sanity check every data pipeline runs before a big job:
row/null counts, exact distinct cardinality, native min/max per column —
without ever materializing the table. Counts and min/max reduce through
tiny per-batch partials (driver merge is O(batches x columns) scalars);
exact distincts go through ONE column-tagged bucketed exchange of
per-batch-unique values, so the shuffle carries each (column, value) at
most once per batch. Int and string columns only (the stringified
min/max contract matches SQL CAST(x AS VARCHAR) for those types;
floats/timestamps have formatting ambiguity and are the caller's job to
cast first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def profile_table(ds, cols: list[str],
                  shuffle_partitions: int | None = None):
    """(column, n_rows, n_null, n_distinct, min_val, max_val) per column.
    min/max over non-null values, stringified; NULL (empty-table column)
    surfaces as empty string."""
    import pandas as pd
    import ray

    from bionext_ray.ops.relational import (_key_buckets, bucketed_agg,
                                            coalesce_for_exchange)

    P = max(16, shuffle_partitions or 0)

    # ---- pass A: scalar partials (n, nulls, min, max) per batch ----
    def scalars(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        names, ns, nulls, mins, maxs, isint = [], [], [], [], [], []
        for c in cols:
            arr = b[c]
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(arr.null_count)
            # carry the ARROW type alongside: a digit-string column
            # ("9" < "10" lexicographically) must NOT be re-ordered
            # numerically just because its partials parse as ints
            isint.append(pa.types.is_integer(arr.type))
            if b.num_rows - arr.null_count > 0:
                mins.append(str(pc.min(arr).as_py()))
                maxs.append(str(pc.max(arr).as_py()))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "min_s": pa.array(mins, pa.string()),
            "max_s": pa.array(maxs, pa.string()),
            "is_int": pa.array(isint, pa.bool_())})

    parts = ray.get(ds.map_batches(
        scalars, batch_format="pyarrow").to_arrow_refs())
    pdf = pa.concat_tables([t for t in parts if t.num_rows]).to_pandas()

    int_cols = set(pdf[pdf["is_int"]]["column"])

    def _native(col, series, col_min=True):
        vals = series.dropna()
        if not len(vals):
            return ""
        if col in int_cols:            # numeric order, from the Arrow type
            nums = vals.astype(np.int64)
            return str(nums.min() if col_min else nums.max())
        return vals.min() if col_min else vals.max()

    # explicit group iteration: SeriesGroupBy.apply setting s.name to the
    # group key is a pandas implementation detail; if it ever carried the
    # series name instead, int columns would silently fall back to
    # lexicographic min/max ('10' < '9'). The partial table is tiny
    # (#cols x #blocks rows), so a driver loop is fine.
    rows = []
    for col, grp in pdf.groupby("column", sort=False):
        rows.append({
            "column": col,
            "n_rows": grp["n"].sum(),
            "n_null": grp["n_null"].sum(),
            "min_val": _native(col, grp["min_s"], True),
            "max_val": _native(col, grp["max_s"], False),
        })
    agg = pd.DataFrame(rows)

    # ---- pass B: exact distincts, one column-tagged exchange ----
    def uniq(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col_out, val_out = [], []
        for c in cols:
            u = pc.unique(pc.drop_null(b[c]))
            col_out.extend([c] * len(u))
            val_out.extend(str(v) for v in u.to_pylist())
        ones = np.ones(len(col_out), np.int64)
        return pa.table({"column": pa.array(col_out, pa.string()),
                         "v": pa.array(val_out, pa.string()),
                         "_c": pa.array(ones, pa.int64())})

    dist = bucketed_agg(ds.map_batches(uniq, batch_format="pyarrow"),
                        ["column", "v"], [("_c", "sum", "_c")],
                        shuffle_partitions=shuffle_partitions)

    def count_col(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = pa.table({"column": b["column"]}).group_by(
            ["column"]).aggregate([([], "count_all")])
        return pa.table({
            "column": t["column"],
            "n_distinct": pc.cast(t["count_all"], pa.int64())})

    nd = (dist.map_batches(count_col, batch_format="pyarrow")
          .to_pandas().groupby("column", sort=False)["n_distinct"]
          .sum().reset_index())

    out = agg.merge(nd, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    out = out[["column", "n_rows", "n_null", "n_distinct",
               "min_val", "max_val"]]
    import ray.data
    return ray.data.from_pandas(out)
