"""Web link-graph kernels: anchor extraction, URL normalization, and the
composed host edge / anchor-text operators."""

import pyarrow as pa
import pytest

from bionext_ray.ops.weblinks import (extract_links_batch, host_link_graph,
                                      links_dataset, normalize_links_batch,
                                      top_anchor_text)


def _pages(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array(
            [r[1].encode() if isinstance(r[1], str) else r[1]
             for r in rows], pa.binary()),
    })


def test_extract_basic_anchor():
    t = extract_links_batch(_pages([
        ("https://a.example/x",
         '<p>hi <a href="/y">go <b>there</b></a> end</p>')]))
    assert t.to_pylist() == [{"src_url": "https://a.example/x",
                              "href": "/y", "anchor_text": "go there"}]


def test_extract_multiple_and_order():
    t = extract_links_batch(_pages([
        ("u1", '<a href="1">one</a><a href="2">two</a>'),
        ("u2", '<a href="3">three</a>')]))
    assert t["href"].to_pylist() == ["1", "2", "3"]
    assert t["src_url"].to_pylist() == ["u1", "u1", "u2"]


def test_extract_skips_null_html_and_no_href():
    t = extract_links_batch(_pages([
        ("u1", None),
        ("u2", '<a name="anchor">no href</a><a href="/ok">ok</a>')]))
    assert t["href"].to_pylist() == ["/ok"]


def test_extract_nested_anchor_does_not_crash():
    # nested <a> is illegal HTML; both hrefs should still surface
    t = extract_links_batch(_pages([
        ("u", '<a href="/o">out <a href="/i">in</a></a>')]))
    assert sorted(t["href"].to_pylist()) == ["/i", "/o"]


def test_extract_entity_refs_in_href():
    t = extract_links_batch(_pages([
        ("u", '<a href="/p?a=1&amp;b=2">q</a>')]))
    assert t["href"].to_pylist() == ["/p?a=1&b=2"]


def _norm(src, href, text="t"):
    return normalize_links_batch(pa.table({
        "src_url": pa.array([src], pa.string()),
        "href": pa.array([href], pa.string()),
        "anchor_text": pa.array([text], pa.string()),
    })).to_pylist()


def test_normalize_relative_resolves_to_src_host():
    [r] = _norm("https://a.example/doc/1", "/p/2#frag")
    assert r == {"src_host": "a.example", "dst_host": "a.example",
                 "dst_url": "https://a.example/p/2", "anchor_text": "t"}


def test_normalize_dotdot_path():
    [r] = _norm("https://a.example/d/e/f", "../g")
    assert r["dst_url"] == "https://a.example/d/g"


def test_normalize_case_folds_scheme_and_host():
    [r] = _norm("https://a.example/", "HTTPS://B.EXAMPLE/Path?Q=1#X")
    assert r["dst_host"] == "b.example"
    # path/query case is significant and kept; fragment stripped
    assert r["dst_url"] == "https://b.example/Path?Q=1"


@pytest.mark.parametrize("href", [
    "mailto:x@y.z", "javascript:void(0)", "ftp://a.example/f",
    "data:text/plain,hi", "tel:+15551234"])
def test_normalize_drops_non_http(href):
    assert _norm("https://a.example/", href) == []


def test_normalize_drops_unparseable():
    # a bracketed non-IPv6 netloc raises ValueError inside urlsplit
    assert _norm("https://a.example/", "https://[bad/") == []


def test_normalize_src_without_host_dropped():
    assert _norm("not-a-url", "https://b.example/x") == []


def test_host_link_graph_counts(ray_session):
    import ray.data
    pages = ray.data.from_arrow(_pages([
        ("https://a.example/1",
         '<a href="/x">l</a><a href="https://b.example/y">l</a>'),
        ("https://a.example/2", '<a href="https://b.example/z#f">l</a>'),
        ("https://b.example/1", '<a href="mailto:x@y">m</a>')]))
    got = sorted(host_link_graph(pages).to_pandas()
                 .itertuples(index=False, name=None))
    assert got == [("a.example", "a.example", 1),
                   ("a.example", "b.example", 2)]


def test_top_anchor_text_tie_breaks_lexicographic(ray_session):
    import ray.data
    pages = ray.data.from_arrow(_pages([
        ("https://a.example/1",
         '<a href="https://c.example/1">zeta</a>'
         '<a href="https://c.example/2">alpha</a>')]))
    got = top_anchor_text(pages).to_pandas()
    assert got.to_dict("records") == [
        {"dst_host": "c.example", "top_anchor": "alpha", "n": 1}]


def test_links_dataset_streams_schema(ray_session):
    import ray.data
    pages = ray.data.from_arrow(_pages([
        ("https://a.example/1", '<a href="/x">t</a>')]))
    t = links_dataset(pages).to_pandas()
    assert list(t.columns) == ["src_host", "dst_host", "dst_url",
                               "anchor_text"]


def test_url_stats_parsing():
    from bionext_ray.ops.weblinks import url_stats_batch
    t = url_stats_batch(pa.table({"url": pa.array([
        "https://Sub.EXAMPLE.org/a/b/c?x=1&y=2",
        "https://h.example/",
        "https://localhost",
        "not a url",
        None,
    ], pa.string())}))
    rows = t.to_pylist()
    assert rows[0] == {"url": "https://Sub.EXAMPLE.org/a/b/c?x=1&y=2",
                       "host": "sub.example.org", "tld": "org",
                       "path_depth": 3, "n_params": 2}
    assert rows[1]["path_depth"] == 0 and rows[1]["n_params"] == 0
    assert rows[2]["tld"] == "localhost"   # no dot -> whole host
    assert rows[3]["host"] == "" and rows[3]["path_depth"] == 0
    assert rows[4]["host"] == ""
