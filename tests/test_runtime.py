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
