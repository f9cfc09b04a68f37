"""BioC JSON corpus source — the reference's native input format.

``read_bioc_json`` maps a directory/list of BioC JSON files (the shape
consumed at /root/reference/src/utils.py:27-43: ``{documents: [{id,
passages: [title, abstract], ...}]}``) to the rebuild's ``docs`` schema,
applying the locked join rule ``passages[0].text + ' ' + passages[1].text``
(/root/reference/src/data.py:34) and carrying ``passages[1].offset`` as
``title_len`` (passage routing, /root/reference/src/tagger/__init__.py:113).

Existing annotations (if the corpus is pre-tagged, e.g. for linker-only or
extractor-only runs — the reference's -l/-e module toggles) come through as a
``mentions`` column in the tagger stage's output shape, so any pipeline
suffix can start from a BioC corpus.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ..stages.tagger import MENTION_TYPE


def _doc_to_row(doc: dict) -> dict:
    passages = doc.get("passages", [])
    title = passages[0]["text"] if len(passages) > 0 else ""
    abstract = passages[1]["text"] if len(passages) > 1 else ""
    text = title + " " + abstract
    title_len = passages[1]["offset"] if len(passages) > 1 else len(title) + 1
    mentions = []
    for p in passages:
        for a in p.get("annotations", []):
            loc = a["locations"][0]
            mentions.append({
                "id": str(a["id"]),
                "label": a["infons"]["type"],
                "text": a["text"],
                "start_span": loc["offset"],
                "end_span": loc["offset"] + loc["length"],
                "linked": a["infons"].get("identifier", "-"),
            })
    return {
        "doc_id": str(doc["id"]),
        "text": text,
        "title_len": int(title_len),
        "mentions": mentions,
    }


def bioc_file_to_table(path: str) -> pa.Table:
    with open(path) as f:
        data = json.load(f)
    docs = data["documents"] if "documents" in data else [data]
    rows = [_doc_to_row(d) for d in docs]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "title_len": pa.array([r["title_len"] for r in rows], pa.int32()),
        "mentions": pa.array([r["mentions"] for r in rows],
                             pa.list_(MENTION_TYPE)),
    })


def read_bioc_json(paths: str | list[str]):
    """Dataset of docs(+mentions) from BioC JSON file(s). Files are read in
    parallel tasks (one file per task — BioC corpora are per-file documents,
    the reference's unit of work)."""
    import os
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".json"))
        else:
            paths = [paths]
    file_ds = ray.data.from_items([{"path": p} for p in paths])

    empty = pa.table({
        "doc_id": pa.array([], pa.string()),
        "text": pa.array([], pa.large_string()),
        "title_len": pa.array([], pa.int32()),
        "mentions": pa.array([], pa.list_(MENTION_TYPE)),
    })

    def load(batch: pa.Table) -> pa.Table:
        tables = [bioc_file_to_table(p) for p in batch["path"].to_pylist()]
        return pa.concat_tables(tables) if tables else empty

    return file_ds.map_batches(load, batch_format="pyarrow")


def docs_to_bioc(docs_with_mentions: pa.Table, relations_by_doc=None) -> list[dict]:
    """Inverse sink: rows (doc_id, text, title_len, mentions[, triples]) ->
    BioC-shaped dicts (the reference's stage output format,
    /root/reference/src/tagger/__init__.py:111-142)."""
    out = []
    relations_by_doc = relations_by_doc or {}
    for row in docs_with_mentions.to_pylist():
        title_len = row.get("title_len") or 0
        text = row["text"]
        if title_len > 0:
            # title_len = len(title) + 1 (the joining space)
            title, abstract = text[:title_len - 1], text[title_len:]
        else:
            title, abstract = "", text
        passages = [
            {"offset": 0, "infons": {"type": "title"}, "text": title,
             "annotations": [], "relations": []},
            {"offset": title_len, "infons": {"type": "abstract"},
             "text": abstract, "annotations": [], "relations": []},
        ]
        for m in row.get("mentions") or []:
            idx = 0 if m["start_span"] < title_len else 1
            passages[idx]["annotations"].append({
                "id": m["id"],
                "infons": {"type": m["label"], "identifier": m["linked"]},
                "text": m["text"],
                "locations": [{"offset": m["start_span"],
                               "length": m["end_span"] - m["start_span"]}],
            })
        out.append({
            "id": row["doc_id"],
            "passages": passages,
            "relations": [
                {"id": f"R{i}", "infons": {
                    "entity1": t["subj"], "entity2": t["obj"],
                    "type": t["pred"],
                    "novel": "Novel" if t["novel"] else "No"}}
                for i, t in enumerate(relations_by_doc.get(row["doc_id"], []))],
        })
    return out
