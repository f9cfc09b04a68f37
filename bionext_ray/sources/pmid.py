"""PMID ingest source with a pluggable transport (reference S3).

The reference fetches one article per PMID from the NCBI BioNLP RESTful API
and writes ``testset/pubmed_{pmid}.json`` (/root/reference/src/utils.py:
10-25: GET .../BioC_json/{pmid}/unicode, keep ``response.json()[0]``, raise
on any non-200). This sandbox has no network, so the HTTP call sits behind
an injectable ``transport(pmid) -> dict`` (the BioC collection dict); the
default transport raises the reference-shaped RuntimeError. Everything
around it — the actor-pool fan-out, the optional per-PMID JSON cache, the
BioC->row flattening shared with ``read_bioc_json`` — is real and tested.

Scale shape: PMID lists are small-side metadata; each actor holds one
transport (session reuse / rate limiting lives there) and fetches a batch
of ids per call, emitting the same (doc_id, text, title_len, mentions)
schema the rest of the pipeline consumes.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..stages.tagger import MENTION_TYPE
from .bioc import _doc_to_row


def default_transport(pmid: str) -> dict:
    """Placeholder for the live NCBI GET — no network in this environment."""
    raise RuntimeError(
        f"Failed to fetch article (PMID: {pmid}) status:no-network "
        "(inject transport=... to fetch; sandbox has no network)")


class PmidFetcher:
    """Actor-pool batch fetcher: one transport per actor (__init__), one
    transport call per PMID per batch (__call__)."""

    def __init__(self, transport=None, out_dir: str | None = None):
        self.transport = transport or default_transport
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for pmid in batch["pmid"].to_pylist():
            data = self.transport(str(pmid))
            if self.out_dir:   # reference writes pubmed_{pmid}.json
                with open(os.path.join(self.out_dir,
                                       f"pubmed_{pmid}.json"), "w") as f:
                    json.dump(data, f, indent=2)
            docs = data["documents"] if "documents" in data else [data]
            rows.extend(_doc_to_row(d) for d in docs)
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "title_len": pa.array([r["title_len"] for r in rows],
                                  pa.int32()),
            "mentions": pa.array([r["mentions"] for r in rows],
                                 pa.list_(MENTION_TYPE)),
        })


def fetch_pmids(pmids, transport=None, out_dir: str | None = None,
                concurrency=(1, 4), batch_size: int = 16):
    """Dataset of BioC documents for a PMID list, fetched by an actor pool.

    ``transport(pmid) -> BioC collection dict`` is the injectable HTTP
    seam; actors each construct it once. Output schema matches
    ``read_bioc_json`` so the result feeds the same pipeline stages."""
    import ray.data
    ds = ray.data.from_items([{"pmid": str(p)} for p in pmids])
    return ds.map_batches(
        PmidFetcher, fn_constructor_kwargs={
            "transport": transport, "out_dir": out_dir},
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")
