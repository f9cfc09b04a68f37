"""PMID ingest source (S3): pluggable transport, hermetic."""
import json

import pytest

from bionext_ray.fixtures import fake_pmid_transport as _fake_collection
from bionext_ray.sources.pmid import PmidFetcher, default_transport, fetch_pmids

# NOTE: the transport handed to fetch_pmids must be importable by Ray
# WORKERS (an actor constructor argument) — a function defined in a test
# module deserializes only on the driver. Hence the package-level fixture.


def test_default_transport_raises_reference_shaped_error():
    with pytest.raises(RuntimeError, match=r"PMID: 123.*status:"):
        default_transport("123")


def test_fetcher_flattens_with_the_extract_join_rule(tmp_path):
    f = PmidFetcher(transport=_fake_collection, out_dir=str(tmp_path))
    import pyarrow as pa
    out = f(pa.table({"pmid": ["11", "22"]}))
    assert out["doc_id"].to_pylist() == ["11", "22"]
    # title + ' ' + abstract join (reference src/data.py:34)
    assert out["text"].to_pylist()[0] == "Title 11 Abstract of 11."
    assert out["title_len"].to_pylist() == [12, 12]
    m = out["mentions"].to_pylist()[0][0]
    assert (m["label"], m["start_span"], m["end_span"]) == (
        "GeneOrGeneProduct", 6, 11)
    # reference writes pubmed_{pmid}.json per fetched article
    cached = json.load(open(tmp_path / "pubmed_11.json"))
    assert cached["documents"][0]["id"] == "11"


def test_fetch_pmids_dataset_feeds_pipeline(ray_session):
    ds = fetch_pmids(["1", "2", "3"], transport=_fake_collection,
                     concurrency=(1, 2), batch_size=2)
    df = ds.to_pandas()
    assert sorted(df["doc_id"]) == ["1", "2", "3"]
    # schema matches read_bioc_json: downstream stages consume it directly
    # (gold mentions dropped first — the tagger emits its own column)
    from bionext_ray.stages.tagger import tagger_stage
    from bionext_ray.kb import default_kb
    docs = ds.select_columns(["doc_id", "text", "title_len"])
    tagged = tagger_stage(docs, default_kb().gazetteer, concurrency=(1, 2),
                          batch_size=4)
    out = tagged.to_pandas()
    assert len(out) == 3 and "mentions" in out.columns
