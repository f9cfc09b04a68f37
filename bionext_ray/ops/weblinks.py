"""Web link-graph construction: anchor extraction -> URL normalization ->
host-level edge aggregation.

The reference pipeline builds a knowledge graph from document CONTENT
(entities/relations); a web-scale crawl pipeline additionally builds the
LINK graph from the same pages — the host->host edge table that feeds
PageRank-style quality priors, crawl frontier scheduling, and spam/host
clustering. This module provides the three primitives as batch kernels plus
one composed Dataset operator:

  extract_links_batch   pages(html, url) -> (src_url, href, anchor_text)
                        one stdlib HTMLParser pass per document (parsing is
                        inherently per-document; the kernel runs inside
                        map_batches so at scale it is an actor/task-pool
                        stage, exactly like html_text.extract_text)
  normalize_links_batch resolve relative hrefs against the source URL,
                        drop non-http(s) targets (mailto:, javascript:, …),
                        strip fragments, lowercase scheme/host
  host_link_graph       compose the two + bucketed (src_host, dst_host)
                        count — the per-block partial combine means only
                        (host-pair, partial_count) rows cross the ONE
                        exchange, never raw links

Scale notes: link extraction is doc-local (zero shuffles); the edge
aggregate uses ops.relational.bucketed_agg (host-pair cardinality grows
with the web, so the key-hash bucket pattern applies, not the
low-cardinality partial_final_agg). Anchor-text aggregation for entity
naming reuses the same incidence with a dst-bucketed exchange.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

class _AnchorCollector(HTMLParser):
    """Collect (href, anchor text) for every <a> element. A stack keeps
    the (illegal but common) nested-anchor case from crashing the parse;
    anchors without href are skipped."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._open: list[tuple[str | None, list[str]]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            href = next((v for k, v in attrs if k == "href"), None)
            self._open.append((href, []))

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._open:
            href, parts = self._open.pop()
            if href:
                self.links.append((href, "".join(parts).strip()))

    def handle_data(self, data: str) -> None:
        if self._open:
            self._open[-1][1].append(data)


def extract_links_batch(batch: pa.Table, html_col: str = "html",
                        url_col: str = "url") -> pa.Table:
    """Flat (src_url, href, anchor_text) table for every anchor in every
    page of the batch. Rows with NULL html (pre-extracted text pages)
    contribute nothing; a malformed document is skipped, not fatal — at
    100 TB one broken page must not kill a block."""
    urls = batch[url_col].to_pylist()
    htmls = batch[html_col].to_pylist()
    src, href, text = [], [], []
    for u, h in zip(urls, htmls):
        if h is None:
            continue
        if isinstance(h, (bytes, bytearray)):
            h = h.decode("utf-8", errors="replace")
        p = _AnchorCollector()
        try:
            p.feed(h)
            p.close()
        except Exception:
            continue
        for hr, tx in p.links:
            src.append(u)
            href.append(hr)
            text.append(tx)
    return pa.table({"src_url": pa.array(src, pa.string()),
                     "href": pa.array(href, pa.string()),
                     "anchor_text": pa.array(text, pa.string())})


def normalize_links_batch(batch: pa.Table) -> pa.Table:
    """Resolve + canonicalize raw hrefs.

    - relative hrefs resolve against src_url (RFC 3986 urljoin)
    - only http/https targets survive (mailto:, javascript:, data:,
      ftp: … are navigation chrome, not graph edges)
    - fragments are stripped (same resource), scheme+host lowercased
    - src_host parses are memoized per batch (one src page emits many
      links, so the split runs once per distinct page, not per link)
    """
    from urllib.parse import urljoin, urlsplit, urlunsplit

    src = batch["src_url"].to_pylist()
    hrefs = batch["href"].to_pylist()
    texts = batch["anchor_text"].to_pylist()
    src_host_cache: dict[str, str | None] = {}
    o_sh, o_dh, o_du, o_tx = [], [], [], []
    for s, h, t in zip(src, hrefs, texts):
        sh = src_host_cache.get(s, "")
        if sh == "":
            try:
                sh = urlsplit(s).hostname
            except ValueError:
                sh = None
            src_host_cache[s] = sh
        if sh is None:
            continue
        try:
            parts = urlsplit(urljoin(s, h))
        except ValueError:
            continue
        if parts.scheme not in ("http", "https") or not parts.hostname:
            continue
        # case-fold host(:port) only — userinfo is case-sensitive per
        # RFC 3986 and must survive verbatim
        if "@" in parts.netloc:
            ui, hostport = parts.netloc.rsplit("@", 1)
            netloc = ui + "@" + hostport.lower()
        else:
            netloc = parts.netloc.lower()
        o_sh.append(sh)
        o_dh.append(parts.hostname)
        o_du.append(urlunsplit(
            (parts.scheme, netloc, parts.path, parts.query, "")))
        o_tx.append(t)
    return pa.table({"src_host": pa.array(o_sh, pa.string()),
                     "dst_host": pa.array(o_dh, pa.string()),
                     "dst_url": pa.array(o_du, pa.string()),
                     "anchor_text": pa.array(o_tx, pa.string())})


def links_dataset(pages_ds, html_col: str = "html", url_col: str = "url"):
    """pages -> normalized link incidence (lazy; doc-local, zero
    shuffles). Extraction and normalization fuse into one map_batches so
    raw hrefs never hit the object store."""
    def fn(b: pa.Table) -> pa.Table:
        return normalize_links_batch(
            extract_links_batch(b, html_col=html_col, url_col=url_col))

    return pages_ds.map_batches(fn, batch_format="pyarrow")


def host_link_graph(pages_ds, shuffle_partitions: int | None = None,
                    html_col: str = "html", url_col: str = "url"):
    """(src_host, dst_host, n_links) edge table over the crawl.

    ONE bucketed exchange: links are counted per (host pair) inside each
    block first, so what crosses the wire is bounded by distinct host
    pairs per block — at web scale that is the natural compression (a
    host's pages link to few distinct hosts relative to link volume)."""
    from .relational import bucketed_agg

    links = links_dataset(pages_ds, html_col=html_col, url_col=url_col)
    proj = links.map_batches(
        lambda b: b.select(["src_host", "dst_host"]),
        batch_format="pyarrow")
    return bucketed_agg(proj, ["src_host", "dst_host"],
                        [("dst_host", "count", "n_links")],
                        shuffle_partitions=shuffle_partitions)


def top_anchor_text(pages_ds, shuffle_partitions: int | None = None,
                    html_col: str = "html", url_col: str = "url"):
    """Per dst_host: the most common anchor text pointing at it, with its
    count (ties break on lexicographically smallest text — deterministic
    and SQL-mirrorable). Anchor text is the classic entity-naming signal
    when promoting a link graph to a knowledge graph.

    Shape: in-block (dst_host, anchor_text) combine -> bucketed count
    (one exchange) -> dst_host-bucketed argmax (second exchange over the
    already-aggregated pair table, which is |distinct pairs| not |links|).
    """
    import pandas as pd

    from .relational import bucketed_agg

    links = links_dataset(pages_ds, html_col=html_col, url_col=url_col)
    proj = links.map_batches(
        lambda b: b.select(["dst_host", "anchor_text"]),
        batch_format="pyarrow")
    pairs = bucketed_agg(proj, ["dst_host", "anchor_text"],
                         [("anchor_text", "count", "n")],
                         shuffle_partitions=shuffle_partitions)

    P = max(16, shuffle_partitions or 0)

    def add_bucket(b: pa.Table) -> pa.Table:
        from .relational import _key_buckets
        h = _key_buckets(b["dst_host"].to_numpy(zero_copy_only=False), P)
        return b.append_column("__b", pa.array(h, pa.int64()))

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dst_host", "n", "anchor_text"],
                          ascending=[True, False, True])
        out = g.drop_duplicates("dst_host")[
            ["dst_host", "anchor_text", "n"]]
        return out.rename(columns={"anchor_text": "top_anchor"})

    return (pairs.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(best, batch_format="pandas"))


def url_stats_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Per-URL structural features — the crawl-frontier/sitemap signals
    (host, registrable-suffix proxy, path depth, query-param count) a
    scheduler or URL-dedup stage keys on. Real RFC-3986 parsing per row
    (urlsplit, same per-doc-loop convention as the link normalizer);
    un-parseable or host-less URLs emit empty host/tld and zero counts
    rather than killing the block."""
    from urllib.parse import urlsplit

    urls = batch[url_col].to_pylist()
    o_host, o_tld, o_depth, o_params = [], [], [], []
    for u in urls:
        host, tld, depth, nparams = "", "", 0, 0
        try:
            parts = urlsplit(u or "")
        except ValueError:
            parts = None
        if parts is not None and parts.hostname:
            host = parts.hostname
            # trailing-dot FQDN form ('example.com.') still yields 'com'
            h = host.rstrip(".")
            tld = h.rsplit(".", 1)[-1] if "." in h else h
            depth = sum(1 for s in parts.path.split("/") if s)
            if parts.query:
                nparams = sum(1 for p in parts.query.split("&") if p)
        o_host.append(host)
        o_tld.append(tld)
        o_depth.append(depth)
        o_params.append(nparams)
    return pa.table({
        url_col: batch[url_col],
        "host": pa.array(o_host, pa.string()),
        "tld": pa.array(o_tld, pa.string()),
        "path_depth": pa.array(o_depth, pa.int64()),
        "n_params": pa.array(o_params, pa.int64()),
    })
