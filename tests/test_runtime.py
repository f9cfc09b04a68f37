"""Checkpoint/resume semantics (north rule: resumable with per-partition
lineage + metrics)."""

import json
import os
import shutil

import pytest

from bionext_ray.fixtures import make_pages


@pytest.fixture()
def pages_ds(ray_session):
    import ray.data
    return ray.data.from_arrow(make_pages(15, seed=11))


def test_checkpoint_run_and_resume(pages_ds, tmp_path):
    from bionext_ray.runtime import run_kg_checkpointed
    root = str(tmp_path / "run")

    canonical, runner = run_kg_checkpointed(pages_ds, root, concurrency=1,
                                            batch_size=8)
    first = canonical.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert all(not m["resumed"] for m in runner.metrics.values())

    # manifests exist with per-partition lineage
    for stage in ("docs", "tagged", "linked", "triples", "canonical"):
        man = json.load(open(os.path.join(root, stage, "_MANIFEST.json")))
        assert man["rows"] >= 0
        assert isinstance(man["partitions"], list) and man["partitions"]
        assert sum(p["rows"] for p in man["partitions"]) == man["rows"]
        assert man["fingerprint"]

    # resume: everything skips
    canonical2, runner2 = run_kg_checkpointed(pages_ds, root, concurrency=1,
                                              batch_size=8)
    second = canonical2.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert all(m["resumed"] for m in runner2.metrics.values())
    assert first.equals(second)

    # invalidate one mid-pipeline stage -> it recomputes, earlier ones resume
    shutil.rmtree(os.path.join(root, "linked"))
    canonical3, runner3 = run_kg_checkpointed(pages_ds, root, concurrency=1,
                                              batch_size=8)
    third = canonical3.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert runner3.metrics["docs"]["resumed"]
    assert runner3.metrics["tagged"]["resumed"]
    assert not runner3.metrics["linked"]["resumed"]
    assert first.equals(third)


def test_fingerprint_change_invalidates(pages_ds, tmp_path):
    from bionext_ray.runtime import run_kg_checkpointed
    root = str(tmp_path / "run")
    run_kg_checkpointed(pages_ds, root, concurrency=1, batch_size=8,
                        input_fingerprint="v1")
    _, runner = run_kg_checkpointed(pages_ds, root, concurrency=1,
                                    batch_size=8, input_fingerprint="v2")
    assert all(not m["resumed"] for m in runner.metrics.values())


def test_partitioned_resume(ray_session, tmp_path):
    """Partition-level resume: a failed/missing partition recomputes alone;
    completed partitions are skipped by manifest fingerprint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bionext_ray.runtime import read_partitioned_triples, run_kg_partitioned

    # 4 input files of 10 pages each
    files = []
    for i in range(4):
        t = make_pages(10, seed=100 + i)
        p = str(tmp_path / f"pages_{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    root = str(tmp_path / "run")

    r1 = run_kg_partitioned(files, root, n_partitions=2, concurrency=1,
                            batch_size=8)
    assert r1["computed"] == 2 and r1["resumed"] == 0
    full = read_partitioned_triples(root).to_pandas()
    assert len(full) > 0

    # full rerun: everything resumes, nothing recomputes
    r2 = run_kg_partitioned(files, root, n_partitions=2, concurrency=1,
                            batch_size=8)
    assert r2["computed"] == 0 and r2["resumed"] == 2

    # simulate a mid-run failure: kill partition 1's checkpoint
    shutil.rmtree(os.path.join(root, "triples", "part=1"))
    r3 = run_kg_partitioned(files, root, n_partitions=2, concurrency=1,
                            batch_size=8)
    assert r3["computed"] == 1 and r3["resumed"] == 1
    full3 = read_partitioned_triples(root).to_pandas()
    key = ["doc_id", "subj", "pred", "obj"]
    assert (full3.sort_values(key).reset_index(drop=True)[key]
            .equals(full.sort_values(key).reset_index(drop=True)[key]))

    # changed input -> stale fingerprint -> recompute
    pq.write_table(make_pages(10, seed=999), files[0])
    r4 = run_kg_partitioned(files, root, n_partitions=2, concurrency=1,
                            batch_size=8)
    assert r4["computed"] == 1 and r4["resumed"] == 1


def test_merge_graph_increment_equals_full_rebuild(ray_session, tmp_path):
    """merge(materialize(A), B) must equal materialize(A ∪ B) exactly —
    triples, supports, nodes, adjacency, manifest counts."""
    import json

    import pyarrow as pa
    import pyarrow.dataset as pds
    import ray.data

    from bionext_ray.stages.canonicalize import (canonicalize_stage,
                                                 materialize_graph,
                                                 merge_graph_increment)

    def triples(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "subj": pa.array([r[1] for r in rows], pa.string()),
            "pred": pa.array([r[2] for r in rows], pa.string()),
            "obj": pa.array([r[3] for r in rows], pa.string()),
            "novel": pa.array([r[4] for r in rows], pa.bool_())}))

    a = [("d1", "e1", "assoc", "e2", True), ("d2", "e1", "assoc", "e2", False),
         ("d3", "e3", "bind", "e4", True)]
    b = [("d4", "e1", "assoc", "e2", True),     # overlaps A: support sums
         ("d5", "e5", "bind", "e6", False)]     # new triple

    inc_dir = str(tmp_path / "incremental")
    merge_graph_increment(canonicalize_stage(triples(a)), inc_dir)
    merge_graph_increment(canonicalize_stage(triples(b)), inc_dir)

    full_dir = str(tmp_path / "full")
    materialize_graph(canonicalize_stage(triples(a + b)), full_dir)

    def load(d, sub, part=None):
        t = pds.dataset(f"{d}/{sub}", partitioning=part).to_table()
        df = t.to_pandas()
        cols = [c for c in df.columns if c != "bucket"]
        return df[cols].sort_values(cols).reset_index(drop=True)

    for sub, part in (("triples", "hive"), ("nodes", None),
                      ("adjacency", None)):
        got = load(inc_dir, sub, part)
        want = load(full_dir, sub, part)
        assert got.equals(want), sub

    m_inc = json.load(open(f"{inc_dir}/_GRAPH_MANIFEST.json"))
    m_full = json.load(open(f"{full_dir}/_GRAPH_MANIFEST.json"))
    for k in ("triples_rows", "nodes_rows", "adjacency_rows"):
        assert m_inc[k] == m_full[k]
    # support summed across waves for the overlapping triple
    tri = load(inc_dir, "triples", "hive")
    row = tri[(tri["subj"] == "e1") & (tri["obj"] == "e2")]
    assert row["support"].tolist() == [3]
    assert row["novel_docs"].tolist() == [2]


def test_merge_graph_increment_crash_recovery(ray_session, tmp_path):
    """Mid-swap crash simulation: with a COMPLETE staging dir and the live
    triples already swapped (or deleted), a retry must finish the swap —
    never re-merge (double count) or lose the staged graph. With wave_id,
    a whole-merge retry after success is a no-op."""
    import json
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.dataset as pds
    import ray.data

    from bionext_ray.stages.canonicalize import (canonicalize_stage,
                                                 merge_graph_increment)

    def triples(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "subj": pa.array([r[1] for r in rows], pa.string()),
            "pred": pa.array([r[2] for r in rows], pa.string()),
            "obj": pa.array([r[3] for r in rows], pa.string()),
            "novel": pa.array([r[4] for r in rows], pa.bool_())}))

    a = [("d1", "e1", "assoc", "e2", True)]
    b = [("d2", "e1", "assoc", "e2", False)]
    out = str(tmp_path / "g")
    merge_graph_increment(canonicalize_stage(triples(a)), out, wave_id="w1")
    merge_graph_increment(canonicalize_stage(triples(b)), out, wave_id="w2")

    def support():
        t = pds.dataset(f"{out}/triples", partitioning="hive").to_table()
        return t.to_pandas()["support"].sum()

    assert support() == 2

    # (1) whole-merge retry with the SAME wave_id: no double count
    merge_graph_increment(canonicalize_stage(triples(b)), out, wave_id="w2")
    assert support() == 2

    # (2) mid-swap crash: complete staging exists, live triples deleted
    staging = os.path.join(out, ".merge_staging")
    shutil.copytree(out, staging,
                    ignore=shutil.ignore_patterns(".merge_staging"))
    shutil.rmtree(os.path.join(out, "triples"))
    os.remove(os.path.join(out, "_GRAPH_MANIFEST.json"))
    # retry of wave w2: must FIRST finish the swap (restoring triples),
    # then see wave_id == w2 and no-op
    m = merge_graph_increment(canonicalize_stage(triples(b)), out,
                              wave_id="w2")
    assert support() == 2 and m["wave_id"] == "w2"
    assert not os.path.isdir(staging)
