"""pages -> docs: HTML-to-text extraction stage (stateless map_batches).

Input schema (BASELINE.json input_hint):
  url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string
Output `docs` schema:
  url, doc_id: string, warc_ts, lang, text: string, title_len: int32

Rows with a non-null ``text`` pass through byte-identically; rows with null
``text`` are extracted from ``html`` with the locked title+' '+body rule
(bionext_ray.html_text; reference join rule /root/reference/src/data.py:34).
Stateless -> plain function tasks, no actor pool needed.
"""

from __future__ import annotations

import pyarrow as pa

from ..html_text import page_text


def doc_id_from_url(url: str) -> str:
    """Deterministic doc id: last path segment of the url (unique per row in
    all corpora here; fall back to the full url if the segment is empty)."""
    seg = url.rstrip("/").rsplit("/", 1)[-1]
    return seg or url


def extract_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = batch["text"].to_pylist()
    out_text = []
    out_title_len = []
    for h, t in zip(htmls, texts):
        txt, tl = page_text(h, t)
        out_text.append(txt)
        out_title_len.append(tl)
    return pa.table({
        "url": batch["url"],
        "doc_id": pa.array([doc_id_from_url(u) for u in urls], pa.string()),
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "text": pa.array(out_text, pa.large_string()),
        "title_len": pa.array(out_title_len, pa.int32()),
    })


def extract_stage(pages_ds, batch_size: int = 1024):
    return pages_ds.map_batches(extract_batch, batch_format="pyarrow",
                                batch_size=batch_size)
