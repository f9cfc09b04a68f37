"""triples -> canonical graph: salted partial aggregation + final groupby,
then partitioned Parquet materialization (graft-added A6; north rule).

Skew strategy: a bare ``groupby(subj,pred,obj)`` ships every doc-level triple
row through the all-to-all exchange, and head entities (a triple asserted in
millions of pages) hot-spot one reducer. The stage therefore pre-aggregates
INSIDE each map_batches task (one output row per distinct triple per block —
the "salt" is the block boundary itself, so no explicit salt column is
needed), and only the tiny per-block partials cross the shuffle. The final
groupby merges counts. This is the classic partial/combiner + final pattern
(SURVEY.md A6).

Graph materialization: canonical triples written as hash-bucketed Parquet
(bucket = hash(subj) % n) so a rerun can skip completed buckets, plus a
``nodes`` degree table computed with the same partial+final pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

CANONICAL_KEYS = ["subj", "pred", "obj"]


def _partial_agg(batch: pa.Table) -> pa.Table:
    """Per-block combine: distinct (subj,pred,obj) with support and novel
    counts."""
    g = batch.group_by(CANONICAL_KEYS).aggregate([
        ("novel", "sum"), ("novel", "count")])
    return pa.table({
        "subj": g["subj"], "pred": g["pred"], "obj": g["obj"],
        "support": pc.cast(g["novel_count"], pa.int64()),
        "novel_docs": pc.cast(g["novel_sum"], pa.int64()),
    })


def canonicalize_stage(triples_ds, shuffle_partitions: int | None = None,
                       input_blocks: int | None = None):
    """Canonical triples: subj, pred, obj, support (doc count), novel_docs.

    ``shuffle_partitions`` coalesces the (already block-combined) partials
    before the final groupby; size it to the expected distinct-triple volume
    (ops.relational.estimate_partitions on the input corpus is a good proxy),
    or leave None to follow the input block count.

    ``input_blocks`` is the caller's block-count hint for ``triples_ds``
    (map stages keep roughly the input block structure). When the partials
    already sit in <= shuffle_partitions blocks, the coalescing repartition
    is a pure extra exchange — it is skipped."""
    partial = triples_ds.map_batches(_partial_agg, batch_format="pyarrow")
    if shuffle_partitions is not None and (
            input_blocks is None or input_blocks > shuffle_partitions):
        partial = partial.repartition(shuffle_partitions)
    return partial.groupby(CANONICAL_KEYS).aggregate(
        Sum("support", alias_name="support"),
        Sum("novel_docs", alias_name="novel_docs"),
    )


def _bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    # deterministic hash bucket of subj for partitioned, resumable output
    import hashlib
    b = [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(),
                        "little") % n_buckets
         for s in batch["subj"].to_pylist()]
    return batch.append_column("bucket", pa.array(b, pa.int32()))


def node_degrees(canonical_ds):
    """nodes table: node, degree (sum of supports of incident edges)."""
    def _explode(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "node": pa.concat_arrays([batch["subj"].combine_chunks(),
                                      batch["obj"].combine_chunks()]),
            "support": pa.concat_arrays([batch["support"].combine_chunks()] * 2),
        })
        g = t.group_by(["node"]).aggregate([("support", "sum")])
        return pa.table({"node": g["node"],
                         "degree": pc.cast(g["support_sum"], pa.int64())})
    partial = canonical_ds.map_batches(_explode, batch_format="pyarrow")
    return partial.groupby("node").aggregate(Sum("degree", alias_name="degree"))


def materialize_graph(canonical_ds, out_dir: str, n_buckets: int = 16):
    """Write triples (hash-bucketed by subj) and node-degree tables."""
    bucketed = canonical_ds.map_batches(lambda b: _bucket(b, n_buckets),
                                        batch_format="pyarrow")
    bucketed.write_parquet(f"{out_dir}/triples", partition_cols=["bucket"])
    node_degrees(canonical_ds).write_parquet(f"{out_dir}/nodes")
