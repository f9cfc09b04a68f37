"""BioC JSON source/sink round-trip and plugin surface."""

import json

from bionext_ray.plugins import EchoLLM, parse_llm_variant_output
from bionext_ray.sources.bioc import bioc_file_to_table, docs_to_bioc, read_bioc_json


def _bioc_doc():
    return {
        "id": "36516090",
        "passages": [
            {"offset": 0, "infons": {"type": "title"},
             "text": "spark binds hash",
             "annotations": [
                 {"id": "0", "infons": {"type": "GeneOrGeneProduct",
                                        "identifier": "G100"},
                  "text": "spark",
                  "locations": [{"offset": 0, "length": 5}]}],
             "relations": []},
            {"offset": 17, "infons": {"type": "abstract"},
             "text": "a longer abstract about slow here",
             "annotations": [], "relations": []},
        ],
        "relations": [],
    }


def test_bioc_reader_join_rule(tmp_path):
    path = tmp_path / "pubmed_36516090.json"
    path.write_text(json.dumps({"documents": [_bioc_doc()]}))
    t = bioc_file_to_table(str(path))
    row = t.to_pylist()[0]
    # the ' ' join rule (reference src/data.py:34) and passage offset
    assert row["text"] == "spark binds hash a longer abstract about slow here"
    assert row["title_len"] == 17
    assert row["mentions"][0]["label"] == "GeneOrGeneProduct"
    assert row["mentions"][0]["linked"] == "G100"


def test_bioc_dataset_and_roundtrip(ray_session, tmp_path):
    for i in range(3):
        (tmp_path / f"doc_{i}.json").write_text(
            json.dumps({"documents": [dict(_bioc_doc(), id=str(i))]}))
    ds = read_bioc_json(str(tmp_path))
    table = ds.to_pandas()
    assert len(table) == 3

    import pyarrow as pa
    back = docs_to_bioc(pa.Table.from_pandas(table))
    assert len(back) == 3
    doc = sorted(back, key=lambda d: d["id"])[0]
    assert doc["passages"][0]["text"] == "spark binds hash"
    assert doc["passages"][1]["offset"] == 17
    ann = doc["passages"][0]["annotations"][0]
    assert ann["locations"][0] == {"offset": 0, "length": 5}


def test_plugin_parse():
    out = parse_llm_variant_output("noise c|SUB|c.76A>G|0 and x|y token")
    assert out == ["c|SUB|c.76A>G|0"]
    llm = EchoLLM(address="local")
    assert "c|SUB|" in llm.run("normalize the variant c.76A>G please")


def test_tagger_transform_hooks(ray_session):
    """Per-mention UDF hooks (reference transforms, src/data.py:254-257).

    The hook is defined INSIDE the test so cloudpickle serializes it by
    value — module-level functions in the (non-importable-from-workers)
    tests package would be pickled by reference and hang actor creation.
    """
    def _upper_mention(m):
        m["text"] = m["text"].upper()
        return m
    import pyarrow as pa
    import ray.data
    from bionext_ray.kb import default_kb
    from bionext_ray.stages.tagger import tagger_stage

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d1"], pa.string()),
        "text": pa.array(["spark binds hash"], pa.large_string()),
        "title_len": pa.array([0], pa.int32()),
    }))
    tagged = tagger_stage(docs, default_kb().gazetteer, concurrency=1,
                          batch_size=4, transforms=[_upper_mention])
    ms = tagged.to_pandas().iloc[0]["mentions"]
    assert {m["text"] for m in ms} == {"SPARK", "HASH"}


import os

import pytest

REF_GOLD = "/root/reference/outputs"


@pytest.mark.skipif(not os.path.isdir(REF_GOLD),
                    reason="reference golden outputs not present")
def test_reads_reference_golden_files():
    """Format-compatibility proof: the BioC reader consumes the reference's
    OWN golden per-stage outputs (a reference user can hand this engine the
    files their pipeline produces today). Checks the documented shapes:
    2 passages, ' '-joined text, absolute spans, linked identifiers, and
    the extractor's R{n} relations (subj/obj are KB identifiers)."""
    # tagger output: annotations present, identifier still "-"
    t = bioc_file_to_table(f"{REF_GOLD}/tagger/pubmed_36516090.json")
    row = t.to_pylist()[0]
    assert row["doc_id"] == "36516090"
    assert row["title_len"] > 0
    # title_len is the abstract passage offset (= len(title) + 1, the
    # reference's routing convention) -> the single-space join sits before it
    assert row["text"][row["title_len"] - 1] == " "
    assert len(row["mentions"]) > 0
    assert all(m["linked"] == "-" for m in row["mentions"])
    # spans are absolute into the joined text
    for m in row["mentions"][:10]:
        assert row["text"][m["start_span"]:m["end_span"]] == m["text"]

    # linker output: same doc, identifiers resolved for some mentions
    tl = bioc_file_to_table(f"{REF_GOLD}/linker/pubmed_36516090.json")
    rowl = tl.to_pylist()[0]
    assert rowl["text"] == row["text"]
    assert any(m["linked"] not in ("-", None) for m in rowl["mentions"])

    # extractor output: R{n} relations over linked identifiers
    import json as _json
    with open(f"{REF_GOLD}/extractor/pubmed_36516090.json") as f:
        doc = _json.load(f)["documents"][0]
    rels = doc["relations"]
    assert rels and all(r["id"].startswith("R") for r in rels)
    linked_ids = {m["linked"] for m in
                  bioc_file_to_table(
                      f"{REF_GOLD}/extractor/pubmed_36516090.json"
                  ).to_pylist()[0]["mentions"]}
    for r in rels[:10]:
        assert r["infons"]["entity1"] in linked_ids
        assert r["infons"]["entity2"] in linked_ids


@pytest.mark.skipif(not os.path.isdir(REF_GOLD),
                    reason="reference golden outputs not present")
def test_golden_100doc_run_structural_parity():
    """Structural parity against the reference's OWN 100-doc golden run
    (outputs/{linker,extractor}/predicts.json): the reader consumes the
    full corpus; the linker output obeys the cleaner's id discipline (M12:
    ids renumbered 0..n-1, no '-' identifiers survive); and every one of
    the 1,247 golden relations is reachable by THIS engine's candidate
    machinery — type-pair mask + unique-(id,type) enumeration +
    composite-id comma cross-product — run on the reference's real
    annotations."""
    import json as _json

    from bionext_ray.constants import ID2LABEL_NOVEL, ID2LABEL_RELATION
    from bionext_ray.functions.relext import candidate_pairs

    ln = bioc_file_to_table(f"{REF_GOLD}/linker/predicts.json")
    assert ln.num_rows == 100
    for row in ln.to_pylist():
        ids = [int(m["id"]) for m in row["mentions"]]
        assert ids == list(range(len(ids))), row["doc_id"]
        assert all(m["linked"] not in ("-", "", None)
                   for m in row["mentions"]), row["doc_id"]
        # spans stay absolute into the ' '-joined text at corpus scale
        for m in row["mentions"]:
            assert row["text"][m["start_span"]:m["end_span"]] == m["text"]

    ex = _json.load(open(f"{REF_GOLD}/extractor/predicts.json"))
    ex_rows = bioc_file_to_table(f"{REF_GOLD}/extractor/predicts.json")
    rel_labels = set(ID2LABEL_RELATION.values())
    nov_labels = set(ID2LABEL_NOVEL.values())
    n_rel = 0
    for doc, row in zip(ex["documents"], ex_rows.to_pylist()):
        ments = [{"linked": m["linked"], "label": m["label"]}
                 for m in row["mentions"]]
        expanded = set()
        for e1, e2 in candidate_pairs(ments):
            for p1 in str(e1[0]).split(","):
                for p2 in str(e2[0]).split(","):
                    expanded.add((p1, p2))
                    expanded.add((p2, p1))
        for r in doc.get("relations") or []:
            inf = r["infons"]
            n_rel += 1
            assert inf["type"] in rel_labels, inf
            assert inf["novel"] in nov_labels, inf
            assert (str(inf["entity1"]), str(inf["entity2"])) in expanded, \
                (row["doc_id"], inf)
    assert n_rel == 1247          # the full golden relation set was checked
