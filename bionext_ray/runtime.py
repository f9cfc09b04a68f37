"""Checkpointed, resumable pipeline execution with per-partition lineage.

North-rule requirement: "resumable from checkpoint with per-partition lineage
+ metrics". The reference's implicit checkpointing is the BioC JSON file each
stage writes (/root/reference/main.py:115-116 — rerunning a stage means
re-feeding the previous stage's file by hand). The rebuild makes that
explicit:

- each stage writes Parquet into ``<root>/<stage>/`` via a temp dir + atomic
  rename, then a ``_MANIFEST.json`` recording the input fingerprint, row
  count, schema, per-file row counts (the partition lineage) and wall time;
- rerunning with the same fingerprint SKIPS the stage and re-reads its
  Parquet (resume); a changed fingerprint invalidates the stage and all
  downstream stages.

Fingerprints chain: stage N's fingerprint hashes stage N-1's fingerprint and
the stage's own config string, so lineage is deterministic without scanning
data.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


MANIFEST = "_MANIFEST.json"


def fingerprint(*parts: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


def _read_manifest(stage_dir: str) -> dict | None:
    path = os.path.join(stage_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class CheckpointRunner:
    """Runs named stages with skip-if-complete semantics.

    >>> runner = CheckpointRunner("/data/kg_run", input_fingerprint="corpus-v1")
    >>> docs = runner.stage("docs", lambda: extract_stage(pages), config="v1")
    >>> tagged = runner.stage("tagged", lambda: tagger_stage(docs, gaz))
    """

    def __init__(self, root: str, input_fingerprint: str):
        self.root = root
        self.chain = input_fingerprint
        self.metrics: dict[str, dict] = {}
        os.makedirs(root, exist_ok=True)

    def stage(self, name: str, build_fn, config: str = ""):
        """Return the stage's Dataset, computing it only if its checkpoint is
        missing or stale. ``build_fn() -> ray.data.Dataset``."""
        import pyarrow.parquet as pq
        import ray.data

        self.chain = fingerprint(self.chain, name, config)
        stage_dir = os.path.join(self.root, name)
        man = _read_manifest(stage_dir)
        if man and man.get("fingerprint") == self.chain:
            self.metrics[name] = {**man, "resumed": True}
            return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])

        # stale or absent -> rebuild from scratch, atomically
        tmp_dir = stage_dir + ".tmp"
        for d in (tmp_dir, stage_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.perf_counter()
        ds = build_fn()
        ds.write_parquet(tmp_dir)
        wall = time.perf_counter() - t0

        files = sorted(f for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
        partitions = []
        total_rows = 0
        for f in files:
            md = pq.read_metadata(os.path.join(tmp_dir, f))
            partitions.append({"file": f, "rows": md.num_rows})
            total_rows += md.num_rows
        schema = [str(f) for f in pq.read_schema(
            os.path.join(tmp_dir, files[0]))] if files else []

        manifest = {
            "stage": name,
            "fingerprint": self.chain,
            "config": config,
            "rows": total_rows,
            "wall_sec": round(wall, 3),
            "schema": schema,
            "partitions": partitions,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp_dir, stage_dir)
        self.metrics[name] = {**manifest, "resumed": False}
        return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])

    def summary(self) -> dict:
        return {name: {k: m.get(k) for k in
                       ("rows", "wall_sec", "resumed", "fingerprint")}
                for name, m in self.metrics.items()}


def run_kg_partitioned(input_files: list[str], root: str, kb=None,
                       n_partitions: int = 8, concurrency=4,
                       batch_size: int = 256,
                       pages_fn=None) -> dict:
    """Partition-level resumable KG run (north rule: "resumable from
    checkpoint with per-partition lineage + metrics").

    The unit of resume is an INPUT-FILE GROUP: the input file list is
    deterministically split into ``n_partitions`` groups, each group runs
    the fused pages->triples pipeline independently and lands its doc-level
    triples under ``<root>/triples/part=<i>/`` via temp-dir + atomic rename
    with a per-partition manifest (input files + fingerprint + row counts +
    wall time). A rerun after a mid-run failure skips every partition whose
    manifest matches and recomputes only the missing ones — at 100 TB each
    group is thousands of files and the loop body is itself a fully
    distributed Ray Data pipeline, so sequential groups still saturate the
    cluster while bounding the blast radius of a failure.

    ``pages_fn(ds) -> pages_ds`` optionally adapts raw input rows to the
    pages schema (the test corpus derives pages from documents rows).
    Returns {"partitions": [...manifests...], "resumed": n, "computed": n}.
    """
    import ray.data

    from .kb import default_kb
    from .stages.extract import extract_stage
    from .stages.fused import kg_fused_stage

    kb = kb or default_kb()
    groups = [sorted(input_files)[i::n_partitions]
              for i in range(n_partitions)]
    triples_root = os.path.join(root, "triples")
    os.makedirs(triples_root, exist_ok=True)
    out = {"partitions": [], "resumed": 0, "computed": 0}
    for i, group in enumerate(groups):
        if not group:
            continue
        # fingerprint = paths + size + mtime (metadata only — no data scan;
        # catches rewritten inputs without reading 100 TB)
        fp = fingerprint("kg-part", *(
            f"{p}:{os.path.getsize(p)}:{int(os.path.getmtime(p) * 1e6)}"
            for p in group))
        part_dir = os.path.join(triples_root, f"part={i}")
        man = _read_manifest(part_dir)
        if man and man.get("fingerprint") == fp:
            out["partitions"].append({**man, "resumed": True})
            out["resumed"] += 1
            continue
        tmp_dir = part_dir + ".tmp"
        for d in (tmp_dir, part_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(group)
        pages = pages_fn(ds) if pages_fn else ds
        triples = kg_fused_stage(extract_stage(pages), kb,
                                 concurrency=concurrency,
                                 batch_size=batch_size)
        triples.write_parquet(tmp_dir)
        wall = time.perf_counter() - t0
        import pyarrow.parquet as pq
        files = sorted(f for f in os.listdir(tmp_dir)
                       if f.endswith(".parquet"))
        rows = sum(pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
                   for f in files)
        manifest = {"partition": i, "fingerprint": fp,
                    "input_files": group, "rows": rows,
                    "wall_sec": round(wall, 3),
                    "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  time.gmtime())}
        with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp_dir, part_dir)
        out["partitions"].append({**manifest, "resumed": False})
        out["computed"] += 1
    return out


def read_partitioned_triples(root: str):
    """All completed partitions' doc-level triples as one Dataset."""
    import ray.data
    triples_root = os.path.join(root, "triples")
    dirs = sorted(os.path.join(triples_root, d)
                  for d in os.listdir(triples_root)
                  if d.startswith("part=") and not d.endswith(".tmp"))
    return ray.data.read_parquet(dirs, file_extensions=["parquet"])


def run_kg_checkpointed(pages_ds, root: str, kb=None, concurrency=4,
                        batch_size: int = 256,
                        input_fingerprint: str = "pages-v1",
                        shuffle_partitions: int | None = None):
    """Full KG pipeline with a checkpoint after every stage boundary.
    Resume = call again with the same root + fingerprint: completed stages
    are read back, only missing ones compute."""
    from .kb import default_kb
    from .stages.canonicalize import canonicalize_stage
    from .stages.extract import extract_stage
    from .stages.extractor import extractor_stage
    from .stages.linker import linker_stage
    from .stages.tagger import tagger_stage

    kb = kb or default_kb()
    runner = CheckpointRunner(root, input_fingerprint)
    docs = runner.stage("docs", lambda: extract_stage(pages_ds))
    tagged = runner.stage(
        "tagged", lambda: tagger_stage(docs, kb.gazetteer,
                                       concurrency=concurrency,
                                       batch_size=batch_size))
    linked = runner.stage(
        "linked", lambda: linker_stage(tagged, kb, concurrency=concurrency,
                                       batch_size=batch_size))
    triples = runner.stage(
        "triples", lambda: extractor_stage(linked, concurrency=concurrency,
                                           batch_size=batch_size))
    canonical = runner.stage(
        "canonical",
        lambda: canonicalize_stage(triples,
                                   shuffle_partitions=shuffle_partitions))
    return canonical, runner
