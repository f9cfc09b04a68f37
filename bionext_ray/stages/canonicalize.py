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
    """Write triples (hash-bucketed by subj) and node-degree tables, then a
    per-partition lineage manifest (`_GRAPH_MANIFEST.json`: row count per
    bucket + totals + write time).

    IDEMPOTENT REPLACE: parquet task files are uuid-named, so a bare
    write_parquet into a non-empty target silently APPENDS a second copy of
    every row (observed: re-running into a previous run's out_dir doubled
    the graph). Any existing triples/nodes output under out_dir — complete
    or half-written from a crashed run — is removed before writing.
    Stage-level skip-if-done resume (don't recompute at all) is
    ``runtime.run_kg_checkpointed``'s job; this function owns the
    all-or-nothing materialization of ONE run's result.
    """
    import json
    import os
    import shutil
    import time

    tri_dir = os.path.join(out_dir, "triples")
    node_dir = os.path.join(out_dir, "nodes")
    adj_dir = os.path.join(out_dir, "adjacency")
    for d in (tri_dir, node_dir, adj_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    # materialize ONCE: three writers fan out from here (triples, node
    # degrees, adjacency). Without this the lazy canonical pipeline —
    # under merge_graph_increment, a re-read of the whole existing triple
    # table plus the union+groupby — would execute three times.
    canonical_ds = canonical_ds.materialize()
    bucketed = canonical_ds.map_batches(lambda b: _bucket(b, n_buckets),
                                        batch_format="pyarrow")
    bucketed.write_parquet(tri_dir, partition_cols=["bucket"])
    node_degrees(canonical_ds).write_parquet(node_dir)
    # adjacency table (north rule: "partitioned Parquet adjacency + triple
    # tables"): subj -> sorted distinct object list, sharded by subj hash
    from bionext_ray.ops.graph import adjacency_list
    adjacency_list(canonical_ds, src="subj", dst="obj",
                   shuffle_partitions=n_buckets).write_parquet(adj_dir)

    # lineage from the written files' parquet metadata (local footer reads,
    # no data scan)
    import pyarrow.parquet as pq
    per_bucket = {}
    for root, _, files in os.walk(tri_dir):
        n = sum(pq.read_metadata(os.path.join(root, f)).num_rows
                for f in files if f.endswith(".parquet"))
        if n:
            per_bucket[os.path.basename(root)] = n
    n_nodes = sum(pq.read_metadata(os.path.join(node_dir, f)).num_rows
                  for f in os.listdir(node_dir) if f.endswith(".parquet"))
    n_adj = sum(pq.read_metadata(os.path.join(adj_dir, f)).num_rows
                for f in os.listdir(adj_dir) if f.endswith(".parquet"))
    manifest = {"triples_per_bucket": dict(sorted(per_bucket.items())),
                "triples_rows": sum(per_bucket.values()),
                "nodes_rows": n_nodes,
                "adjacency_rows": n_adj,
                "n_buckets": n_buckets,
                "written_at": time.time()}
    with open(os.path.join(out_dir, "_GRAPH_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def _finish_swap(out_dir: str, staging: str) -> dict:
    """Complete a (possibly interrupted) staging→live swap. Idempotent:
    a sub-table already moved on a previous attempt (missing in staging,
    present live) is skipped; the live manifest moves LAST, so its
    presence marks the swap complete."""
    import json
    import os
    import shutil

    for sub in ("triples", "nodes", "adjacency"):
        src, dst = os.path.join(staging, sub), os.path.join(out_dir, sub)
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(src, dst)
        elif not os.path.isdir(dst):
            raise RuntimeError(
                f"merge swap cannot recover: {sub} missing from both "
                f"staging ({src}) and live ({dst})")
    man_src = os.path.join(staging, "_GRAPH_MANIFEST.json")
    man_dst = os.path.join(out_dir, "_GRAPH_MANIFEST.json")
    if os.path.isfile(man_src):
        os.replace(man_src, man_dst)
    shutil.rmtree(staging, ignore_errors=True)
    with open(man_dst) as f:
        return json.load(f)


def merge_graph_increment(new_canonical_ds, out_dir: str,
                          n_buckets: int = 16,
                          wave_id: str | None = None):
    """Incremental KG update: fold a NEW batch's canonical triples into an
    already-materialized graph under ``out_dir`` — the production shape
    where a crawl arrives in waves and the graph must grow without
    re-reading every page ever processed. support/novel_docs are SUMS per
    (subj, pred, obj), so the merge is exact: union the existing triple
    table with the increment + one sum-groupby; merge(A-graph, B) ==
    materialize(A ∪ B) by construction — pinned by the runtime test.
    First call on an empty ``out_dir`` degrades to a plain materialize.

    Crash safety + at-least-once retries: the merged graph materializes
    into a STAGING dir whose own manifest (written last by
    materialize_graph) marks it complete; the live swap happens only
    after. On entry, a COMPLETE staging left by a crashed attempt is
    swapped in FIRST (idempotent — already-moved sub-tables are skipped),
    an incomplete one is discarded; the old graph is never the only copy
    while being deleted. Pass a ``wave_id`` to make whole-merge retries
    exactly-once: the manifest records it, and a merge whose wave_id
    matches the live manifest's is a no-op (the increment was already
    folded — re-unioning it would double-count supports)."""
    import json
    import os
    import shutil

    import ray.data

    staging = os.path.join(out_dir, ".merge_staging")
    man_live = os.path.join(out_dir, "_GRAPH_MANIFEST.json")
    # recover a crashed attempt before reading ANY live state
    if os.path.isfile(os.path.join(staging, "_GRAPH_MANIFEST.json")):
        _finish_swap(out_dir, staging)     # complete staging: finish it
    else:
        shutil.rmtree(staging, ignore_errors=True)

    if wave_id is not None and os.path.isfile(man_live):
        with open(man_live) as f:
            live = json.load(f)
        if live.get("wave_id") == wave_id:
            return live                    # increment already folded

    tri_dir = os.path.join(out_dir, "triples")
    merged = new_canonical_ds
    if os.path.isdir(tri_dir):
        existing = ray.data.read_parquet(
            tri_dir, columns=["subj", "pred", "obj", "support",
                              "novel_docs"])
        merged = existing.union(new_canonical_ds)
    canon = merged.groupby(CANONICAL_KEYS).aggregate(
        Sum("support", alias_name="support"),
        Sum("novel_docs", alias_name="novel_docs"),
    )

    materialize_graph(canon, staging, n_buckets=n_buckets)
    if wave_id is not None:
        man_stage = os.path.join(staging, "_GRAPH_MANIFEST.json")
        with open(man_stage) as f:
            m = json.load(f)
        m["wave_id"] = wave_id
        with open(man_stage, "w") as f:
            json.dump(m, f, indent=2)
    return _finish_swap(out_dir, staging)
