"""End-to-end KG-construction pipeline composition (Ray-Data-first).

pages --extract--> docs --tag--> +mentions --link--> +identifiers
      --extract-relations--> triples --canonicalize--> canonical graph

Everything before canonicalization is doc-local (zero shuffles); the only
all-to-all exchange is the final partial+final canonical groupby. All stages
are lazy; consume with write_parquet / iter_batches / aggregates.

None of these functions call ray.init(); Ray Data auto-initializes or the
caller (driver, bench.py, pytest fixture) owns the session.
"""

from __future__ import annotations

import html as _html

import pyarrow as pa
import ray.data

from .kb import KnowledgeBase, default_kb
from .stages.canonicalize import canonicalize_stage, materialize_graph
from .stages.extract import extract_stage
from .stages.extractor import extractor_stage
from .stages.linker import linker_stage
from .stages.tagger import explode_mentions, tagger_stage

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def pages_from_documents(sf_dir: str, num_blocks: int | None = None):
    """Derive a deterministic Common-Crawl-style `pages` table from the
    driver's `documents` test table. Rule (mirrored by the SQL oracles in
    __ray_entry__):
      url     = 'https://example.org/doc/' || doc_id
      warc_ts = TIMESTAMP '2024-01-01' + doc_id seconds
      rows with doc_id % 3 == 0 carry pre-extracted text (html NULL);
      all other rows carry html = <title>Doc {doc_id}</title> +
      one <p>{text}</p> (text NULL) -> extracted text 'Doc {id} {text}'.

    ``num_blocks``: small inputs parse to few blocks, which caps every
    downstream actor stage's parallelism at that block count — pass
    ~2x cluster CPUs so the pipeline saturates (at 100 TB the natural
    row-group split already exceeds any cluster; leave None).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"],
                               override_num_blocks=num_blocks)

    def _to_pages(batch: pa.Table) -> pa.Table:
        import datetime
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        base = datetime.datetime(2024, 1, 1)
        urls, ts, htmls, out_texts = [], [], [], []
        for did, text in zip(doc_ids, texts):
            urls.append(f"https://example.org/doc/{did}")
            ts.append(base + datetime.timedelta(seconds=int(did)))
            if did % 3 == 0:
                htmls.append(None)
                out_texts.append(text)
            else:
                htmls.append(
                    f"<html><head><title>Doc {did}</title></head>"
                    f"<body><p>{_html.escape(text)}</p></body></html>".encode())
                out_texts.append(None)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })

    return ds.map_batches(_to_pages, batch_format="pyarrow")


def kg_pipeline(pages_ds, kb: KnowledgeBase | None = None, concurrency=4,
                batch_size: int = 256):
    """Compose pages -> doc-level triples (lazy Dataset). Tag+link+extract
    run as ONE fused actor pool (all doc-local; see stages/fused.py)."""
    from .stages.fused import kg_fused_stage
    kb = kb or default_kb()
    docs = extract_stage(pages_ds, batch_size=max(batch_size, 512))
    return kg_fused_stage(docs, kb, concurrency=concurrency,
                          batch_size=batch_size)


def kg_stage_datasets(pages_ds, kb: KnowledgeBase | None = None,
                      concurrency=4, batch_size: int = 256,
                      shuffle_partitions: int | None = None,
                      check_schemas: bool = False,
                      backends: dict | None = None,
                      input_blocks: int | None = None) -> dict:
    """Each pipeline boundary as its own (lazy) Dataset — checkpointable.

    The intermediate boundaries (tagged/linked) use the separate actor
    pools; the headline triples/canonical path uses the fused pool, so
    consuming only triples pays one actor startup per worker. Both paths
    share the per-stage classes — the parity suite pins them equal."""
    import ray as _ray

    from .stages.fused import kg_fused_stage
    kb = kb or default_kb()
    backends = backends or {}
    kb_ref = _ray.put(kb)   # broadcast once; actors read zero-copy
    docs = extract_stage(pages_ds, batch_size=max(batch_size, 512))
    tagged = tagger_stage(docs, kb.gazetteer, concurrency=concurrency,
                          batch_size=batch_size,
                          backend=backends.get("tagger"))
    linked = linker_stage(tagged, kb_ref, concurrency=concurrency,
                          batch_size=batch_size)
    triples = kg_fused_stage(docs, kb_ref, concurrency=concurrency,
                             batch_size=batch_size, backends=backends)
    out = {
        "docs": docs,
        "tagged": tagged,
        "mentions": explode_mentions(tagged),
        "linked": linked,
        "linked_mentions": explode_mentions(linked),
        "triples": triples,
        "canonical": canonicalize_stage(triples,
                                        shuffle_partitions=shuffle_partitions,
                                        input_blocks=input_blocks),
    }
    if check_schemas:
        # opt-in: schema inference on a LAZY dataset executes a sample
        # block per boundary (~1 s each) — pinned in tests, not per query
        from . import schemas
        for name, expected in (("docs", schemas.DOCS),
                               ("tagged", schemas.TAGGED),
                               ("linked", schemas.LINKED),
                               ("triples", schemas.TRIPLES),
                               ("canonical", schemas.CANONICAL)):
            schemas.check_schema(out[name], expected, name)
    return out


def run_kg_to_graph(pages_ds, out_dir: str, kb: KnowledgeBase | None = None,
                    concurrency=4, batch_size: int = 256, n_buckets: int = 16):
    """Full run: triples -> canonical graph materialized under out_dir."""
    triples = kg_pipeline(pages_ds, kb=kb, concurrency=concurrency,
                          batch_size=batch_size)
    canonical = canonicalize_stage(triples)
    materialize_graph(canonical, out_dir, n_buckets=n_buckets)
    return canonical
