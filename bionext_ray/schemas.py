"""Declared pyarrow schemas for every pipeline-boundary table, plus the
boundary check. The reference validates shape only with scattered asserts
(/root/reference/src/linker/utils.py:219-246); here each table's schema is
an explicit constant (SURVEY.md §1.2/§1.3) and ``check_schema`` pins a
Dataset to it at stage boundaries — a metadata-only comparison (never
executes the pipeline).
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

DOCS = pa.schema([
    ("url", pa.string()),
    ("doc_id", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.large_string()),
    ("title_len", pa.int32()),
])

MENTION = pa.struct([
    ("id", pa.string()),
    ("label", pa.string()),
    ("text", pa.string()),
    ("start_span", pa.int64()),
    ("end_span", pa.int64()),
    ("linked", pa.string()),
])

TAGGED = DOCS.append(pa.field("mentions", pa.list_(MENTION)))

# linker output: mentions additionally carry the pre-vote candidate id list
# (SURVEY §1.2 `identifiers: list<string>` on linked_mentions)
LINKED_MENTION = pa.struct(
    list(MENTION) + [("candidates", pa.list_(pa.string()))])
LINKED = DOCS.append(pa.field("mentions", pa.list_(LINKED_MENTION)))

TRIPLES = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("novel", pa.bool_()),
])

CANONICAL = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("support", pa.int64()),
    ("novel_docs", pa.int64()),
])


def check_schema(ds, expected: pa.Schema, where: str = ""):
    """Assert a Dataset's schema equals the declared boundary schema.
    Compares names and types (ignores field metadata). Returns ds so it
    chains inside pipeline composition."""
    actual = ds.schema()
    got = list(zip(actual.names, actual.types))
    want = [(f.name, f.type) for f in expected]
    if got != want:
        raise AssertionError(
            f"schema mismatch at {where or 'stage boundary'}:\n"
            f"  got:  {got}\n  want: {want}")
    return ds
