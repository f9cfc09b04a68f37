"""Head-entity skew: a triple asserted by a huge number of documents must be
combined inside blocks before the exchange (A6), so the hot key's reducer
sees at most one partial row per block, not the raw row stream."""

import pyarrow as pa


def _triples_table(n_hot: int, n_cold: int) -> pa.Table:
    doc_ids = [f"d{i}" for i in range(n_hot + n_cold)]
    subj = ["HOT"] * n_hot + [f"S{i}" for i in range(n_cold)]
    obj = ["X"] * n_hot + [f"O{i}" for i in range(n_cold)]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(["Association"] * (n_hot + n_cold), pa.string()),
        "obj": pa.array(obj, pa.string()),
        "novel": pa.array([i % 2 == 0 for i in range(n_hot + n_cold)], pa.bool_()),
    })


def test_partial_agg_bounds_hot_key(ray_session):
    import ray.data
    from bionext_ray.stages.canonicalize import _partial_agg, canonicalize_stage

    t = _triples_table(n_hot=20_000, n_cold=500)
    ds = ray.data.from_arrow(t).repartition(16)

    # in-block combine: each block contributes ONE row for the hot key
    partials = ds.map_batches(_partial_agg, batch_format="pyarrow").to_pandas()
    hot_partials = partials[partials.subj == "HOT"]
    assert len(hot_partials) <= 16
    assert hot_partials["support"].sum() == 20_000

    canon = canonicalize_stage(ds, shuffle_partitions=4).to_pandas()
    hot = canon[canon.subj == "HOT"]
    assert len(hot) == 1
    assert int(hot.iloc[0]["support"]) == 20_000
    assert int(hot.iloc[0]["novel_docs"]) == 10_000
    assert len(canon) == 501


def test_graph_materialize_buckets(ray_session, tmp_path):
    import pyarrow.dataset as pds
    import ray.data
    from bionext_ray.stages.canonicalize import canonicalize_stage, materialize_graph

    ds = ray.data.from_arrow(_triples_table(100, 50)).repartition(4)
    canon = canonicalize_stage(ds, shuffle_partitions=2)
    materialize_graph(canon, str(tmp_path), n_buckets=8)
    t = pds.dataset(str(tmp_path / "triples"), partitioning="hive").to_table()
    assert t.num_rows == 51
    nodes = pds.dataset(str(tmp_path / "nodes")).to_table().to_pydict()
    deg = dict(zip(nodes["node"], nodes["degree"]))
    assert deg["HOT"] == 100 and deg["X"] == 100


def test_graph_materialize_idempotent_rerun(ray_session, tmp_path):
    """Re-running into the same out_dir must REPLACE the previous
    materialization (uuid-named parquet files would otherwise append a
    second copy of every row), and the lineage manifest must match."""
    import json

    import pyarrow.dataset as pds
    import ray.data
    from bionext_ray.stages.canonicalize import (canonicalize_stage,
                                                 materialize_graph)

    ds = ray.data.from_arrow(_triples_table(100, 50)).repartition(4)
    canon = canonicalize_stage(ds, shuffle_partitions=2)
    for _ in range(2):
        man = materialize_graph(canon, str(tmp_path), n_buckets=8)
    t = pds.dataset(str(tmp_path / "triples"), partitioning="hive").to_table()
    assert t.num_rows == 51
    assert man["triples_rows"] == 51
    assert sum(man["triples_per_bucket"].values()) == 51
    on_disk = json.load(open(tmp_path / "_GRAPH_MANIFEST.json"))
    assert on_disk["triples_rows"] == 51
    assert on_disk["nodes_rows"] == pds.dataset(
        str(tmp_path / "nodes")).to_table().num_rows
