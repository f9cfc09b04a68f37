"""Property-based checks (hypothesis): the three implementations of
mention detection — the direct fast path (single-window identity +
decoder-quirk emulation), the full BIO encode/decode walk, and the
ids-only backend scan — must agree on ARBITRARY corpora, including
adjacent entities, punctuation surfaces, multi-window docs and
whitespace edge cases. Derandomized (CI-stable)."""

from hypothesis import given, settings, strategies as st

from bionext_ray.functions.ner import tag_document, tag_documents_with_backend
from bionext_ray.gazetteer import GazetteerMatcher
from bionext_ray.kb import default_kb
from bionext_ray.models import SurrogateTaggerBackend
from bionext_ray.rangedict import merge_overlapping
from bionext_ray.windows import (bio_labels, decode_doc, make_windows,
                                 window_annotations)

KB = default_kb()
MATCHER = GazetteerMatcher(KB.gazetteer)
BACKEND = SurrogateTaggerBackend(KB.gazetteer)

# vocabulary: gazetteer surfaces (incl. multi-token + punctuated), filler,
# near-miss words, punctuation runs
TOKENS = st.sampled_from(
    list(KB.gazetteer)
    + ["filler", "alpha", "beta", "sparkle", "hashes", "slowly", "Mouse",
       "Rat", "c.76A/G", "rs4242", "SPARK", ".", ",", ";", "-", "(", ")",
       # underscore-adjacent forms: the one character where the regex word
       # boundary and the token class diverge (fast path must fall back)
       "md5_update", "spark_x", "_spark", "slow_merge"])


@st.composite
def documents(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    words = [draw(TOKENS) for _ in range(n)]
    # occasionally double-space or leading/trailing space
    sep = draw(st.sampled_from([" ", " ", " ", "  "]))
    return sep.join(words)


def _full_bio_path(text: str) -> list[dict]:
    """The always-full-decode reference path (no fast-path shortcut)."""
    from bionext_ray.functions.ner import spans_to_mentions
    windows = make_windows(text)
    if not windows:
        return []
    matches = merge_overlapping(MATCHER.find_mentions(text), text)
    label_seqs = [bio_labels(w["offsets"],
                             window_annotations(matches, w["view_offset"]))
                  for w in windows]
    spans = decode_doc(label_seqs, [w["offsets"] for w in windows], text)
    return spans_to_mentions(text, spans)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(documents())
def test_fast_path_equals_full_bio_roundtrip(text):
    assert tag_document(text, MATCHER) == _full_bio_path(text)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(st.lists(documents(), min_size=1, max_size=4))
def test_ids_backend_equals_direct_path(texts):
    direct = [tag_document(t, MATCHER) for t in texts]
    via_backend = tag_documents_with_backend(texts, BACKEND)
    assert direct == via_backend


@settings(max_examples=40, deadline=None, derandomize=True)
@given(documents())
def test_long_docs_multiwindow_consistency(text):
    """Stretch to guaranteed multi-window length by repetition: window
    stitching must behave like one long single pass (set equality over
    spans; classes can legitimately differ only through the documented
    adjacent-span quirk, which both paths share)."""
    long_text = (text + " ") * 6 + text
    assert tag_document(long_text, MATCHER) == _full_bio_path(long_text)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_sorted_neighborhood_random(ray_session, seed):
    """Property: distributed ROWS-window pairs == brute force for random
    key distributions (dup-heavy and near-unique) and random windows."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from bionext_ray.ops.dedup import sorted_neighborhood_pairs
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 120))
    w = int(rng.integers(1, 4))
    kcard = int(rng.integers(2, 30))
    keys = [f"k{rng.integers(0, kcard):03d}" for _ in range(n)]
    ids = rng.permutation(n)
    order = sorted(range(n), key=lambda i: (keys[i], ids[i]))
    want = {(ids[order[i]], ids[order[i + d]])
            for d in range(1, w + 1) for i in range(n - d)}
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "i": pa.array(ids, pa.int64())})).repartition(
            int(rng.integers(1, 5)))
    got = sorted_neighborhood_pairs(ds, "k", "i", window=w).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == want
    assert len(got) == len(want)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_interval_join_random(ray_session, seed):
    """Property: tiled overlap join == brute force for random spans and
    random tile widths (incl. tiles far smaller/larger than spans)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from bionext_ray.ops.relational import interval_join
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 80))
    tile = int(rng.integers(4, 300))
    ls = rng.integers(0, 500, n)
    le = ls + rng.integers(0, 120, n)
    rs = rng.integers(0, 500, n)
    re_ = rs + rng.integers(0, 120, n)
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array(np.arange(n), pa.int64()),
        "ls": pa.array(ls, pa.int64()),
        "le": pa.array(le, pa.int64())})).repartition(2)
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array(np.arange(n), pa.int64()),
        "rs": pa.array(rs, pa.int64()),
        "re": pa.array(re_, pa.int64())})).repartition(3)
    got = interval_join(left, right, ("ls", "le"), ("rs", "re"),
                        ["lid"], ["rid"], tile=tile).to_pandas()
    want = {(i, j) for i in range(n) for j in range(n)
            if ls[i] < re_[j] and rs[j] < le[i]
            and le[i] > ls[i] and re_[j] > rs[j]}
    if len(got) == 0:          # empty Ray->pandas drops column names
        assert want == set()
    else:
        assert set(zip(got["lid"], got["rid"])) == want
        assert len(got) == len(want)


def _dup_spans_ref(texts, k=3):
    """Brute-force substring-dedup reference: count every k-word shingle,
    mark positions of >1-occurrence shingles, merge runs with gap <= k."""
    from collections import Counter
    grams = Counter()
    per_doc = []
    for t in texts:
        words = (t or "").lower().split(" ")
        ps = []
        for p in range(max(0, len(words) - k + 1)):
            g = tuple(words[p:p + k])
            grams[g] += 1
            ps.append((p, g))
        per_doc.append(ps)
    out = set()
    for did, ps in enumerate(per_doc):
        dup = sorted(p for p, g in ps if grams[g] >= 2)
        i = 0
        while i < len(dup):
            j = i
            while j + 1 < len(dup) and dup[j + 1] - dup[j] <= k:
                j += 1
            out.add((did, dup[i], dup[j] + k))
            i = j + 1
    return out


@settings(max_examples=12, deadline=None, derandomize=True)
@given(st.lists(documents(), min_size=0, max_size=12),
       st.integers(min_value=1, max_value=7))
def test_duplicate_text_spans_matches_bruteforce(ray_session, texts, seed):
    """The two-exchange distributed span builder must equal the
    brute-force counter+merge reference on arbitrary corpora (within-doc
    repeats, shared shingles, empty and short docs), at an awkward block
    count."""
    import pyarrow as pa
    import ray.data

    from bionext_ray.ops.dedup import duplicate_text_spans

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    if len(texts) > 1:
        ds = ds.repartition(1 + seed % 3)
    got = duplicate_text_spans(ds, k=3).to_pandas()
    spans = {(int(r.doc_id), int(r.start_word), int(r.end_word))
             for r in got.itertuples(index=False)}
    assert spans == _dup_spans_ref(texts, k=3)


# ---- graph-kernel properties ------------------------------------------

@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=0, max_value=7), max_size=12))
def test_pairs_within_groups_equals_bruteforce(sizes):
    """The grouped-arange pair enumerator (shared by cocitation,
    neighbor_jaccard and clustering_coeff's wedge stage) must emit
    exactly the (i < j) index pairs of each contiguous group, in any
    group-size mix including empty and size-1 groups."""
    import numpy as np

    from bionext_ray.ops.graph import _pairs_within_groups

    arr = np.array(sizes, np.int64)
    li, ri = _pairs_within_groups(arr)
    got = list(zip(li.tolist(), ri.tolist()))
    want = set()
    start = 0
    for s in sizes:
        for i in range(s):
            for j in range(i + 1, s):
                want.add((start + i, start + j))
        start += s
    # emission order is j-major (an implementation detail no caller
    # relies on — every consumer aggregates); the SET must be exact and
    # duplicate-free
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


@settings(max_examples=5, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=3))
def test_label_propagation_property(ray_session, edges, rounds):
    """Dataset-level LPA equals the sequential reference on arbitrary
    small graphs at arbitrary round counts (few examples: each costs a
    Ray job; the dense brute-force unit tests carry layout coverage)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from bionext_ray.ops.graph import label_propagation

    if all(u == v for u, v in edges):
        return                       # self-loop-only graph: empty output
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([u for u, _ in edges], pa.int64()),
        "dst": pa.array([v for _, v in edges], pa.int64())}))
    got = label_propagation(ds, rounds=rounds).to_pandas()
    from tests.test_graph import _lpa_ref
    want = _lpa_ref(edges, rounds)
    assert {r.node: r.label for r in got.itertuples(index=False)} == want
