"""OOV-rate vocabulary filter: top-k vocab builder + broadcast scorer."""

import pyarrow as pa

from bionext_ray.ops.textstats import corpus_vocab_topk, oov_stats


def _docs(rows):
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_vocab_topk_order_and_ties(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs([
        (1, "b b b a a c"), (2, "a  z")]))  # counts: a=3 b=3 c=1 z=1
    # count desc, word asc: a before b (tie), c before z (tie)
    assert corpus_vocab_topk(ds, k=3) == ["a", "b", "c"]


def test_oov_stats_counts_and_empty_docs(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs([
        (1, "a b QUX a"), (2, ""), (3, None), (4, "zzz")]))
    out = (oov_stats(ds, ["a", "b"]).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 1: 4 words, 1 oov ("qux"; case-folded) -> 250000 ppm
    assert out.loc[1].tolist() == [4, 250_000]
    assert out.loc[2].tolist() == [0, 0]
    assert out.loc[3].tolist() == [0, 0]
    assert out.loc[4].tolist() == [1, 1_000_000]


def test_oov_double_space_tokens_dropped(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs([(1, "a  b")]))  # split yields '' token
    out = oov_stats(ds, ["a", "b"]).to_pandas()
    assert out["n_words"].tolist() == [2]
    assert out["oov_ppm"].tolist() == [0]


def test_unigram_logprob_matches_reference_math(ray_session):
    """Exact micro-logprob math vs plain Python over a tiny corpus, incl.
    the OOV penalty for a below-floor word and zero rows for wordless
    docs, invariant across block layouts."""
    import math

    import ray.data

    from bionext_ray.ops.textstats import unigram_logprob

    # counts: a=3, b=2, rare=1; total=6. min_count=2 drops 'rare' -> OOV.
    rows = [(1, "a b A"), (2, "b a rare"), (3, ""), (4, None)]
    total = 6
    lp = {"a": math.floor(1e6 * math.log(3 / total)),
          "b": math.floor(1e6 * math.log(2 / total))}
    oov = math.floor(1e6 * math.log(1.0 / total))
    want = {1: (3, 2 * lp["a"] + lp["b"]),
            2: (3, lp["a"] + lp["b"] + oov),
            3: (0, 0), 4: (0, 0)}
    for parts in (1, 4):
        ds = ray.data.from_arrow(_docs(rows)).repartition(parts)
        out = (unigram_logprob(ds, min_count=2).to_pandas()
               .set_index("doc_id").sort_index())
        got = {i: (int(r["n_words"]), int(r["sum_lp_micro"]))
               for i, r in out.iterrows()}
        assert got == want


def test_unigram_logprob_empty_corpus(ray_session):
    import ray.data

    from bionext_ray.ops.textstats import unigram_logprob

    ds = ray.data.from_arrow(_docs([(1, ""), (2, None)]))
    out = unigram_logprob(ds).to_pandas()
    assert out["n_words"].tolist() == [0, 0]
    assert out["sum_lp_micro"].tolist() == [0, 0]


def test_bm25_topk_matches_bruteforce(ray_session):
    """BM25 vs a plain-Python reference (same Lucene idf, same op order),
    at two block layouts; ties at the k boundary must resolve by doc_id."""
    import math

    import numpy as np
    import ray.data

    from bionext_ray.ops.textstats import bm25_topk

    rows = [(1, "data big data query"), (2, "data"), (3, "query query"),
            (4, ""), (5, None), (6, "data"),     # 2 and 6 tie exactly
            (7, "other words entirely"), (8, "ghostterm")]
    texts = {i: (t or "") for i, t in rows}
    toks = {i: [w for w in t.lower().split(" ") if w] for i, t in texts.items()}
    terms = ["data", "query", "missing"]        # df=0 term must contribute 0
    N = len(rows)
    total = sum(len(v) for v in toks.values())
    avg = total / N
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    idf = {t: math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
           for t in terms}

    def score(i):
        s = 0.0
        dl = len(toks[i])
        for t in terms:
            tf = float(toks[i].count(t))
            s = s + idf[t] * ((tf * (1.2 + 1.0))
                              / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avg)))
        return math.floor(1_000_000 * s)

    want = sorted(((i, score(i)) for i, _ in rows),
                  key=lambda r: (-r[1], r[0]))[:4]
    for parts in (1, 5):
        ds = ray.data.from_arrow(_docs(rows)).repartition(parts)
        got = bm25_topk(ds, terms, k=4).to_pandas()
        assert got["rank"].tolist() == [1, 2, 3, 4]
        assert list(zip(got["doc_id"], got["score_micro"])) == want
    # the exact-tie pair (docs 2 and 6) must be adjacent, doc 2 first
    order = [i for i, _ in want]
    scores = dict(want)
    assert scores[2] == scores[6] and order.index(6) == order.index(2) + 1


def test_rrf_fusion_matches_bruteforce(ray_session):
    """RRF over two bm25 lists vs a plain-Python fusion of the same
    bm25_topk outputs; overlap, single-list, and rank arithmetic all
    exercised. Floor integer contributions: 1e9 // (60 + rank)."""
    import ray.data

    from bionext_ray.ops.textstats import bm25_topk, rrf_fusion

    rows = [(1, "data big data query"), (2, "data"), (3, "query query"),
            (4, "hash join"), (5, "merge hash hash"), (6, "data hash"),
            (7, "other words"), (8, None)]
    qsets = [["data", "query"], ["hash", "join", "merge"]]
    ds = ray.data.from_arrow(_docs(rows))
    want = {}
    for terms in qsets:
        t = bm25_topk(ds, terms, k=4).to_pandas()
        for rank, doc in zip(t["rank"], t["doc_id"]):
            e = want.setdefault(int(doc), [0, 5, 0])
            e[0] += 1
            e[1] = min(e[1], int(rank))
            e[2] += 1_000_000_000 // (60 + int(rank))
    for parts in (1, 4):
        got = rrf_fusion(ds.repartition(parts), qsets, k=4).to_pandas()
        assert {r.doc_id: [r.n_lists, r.best_rank, r.rrf_micro]
                for r in got.itertuples(index=False)} == want
    # doc 6 matches both queries: must appear with n_lists == 2
    assert want[6][0] == 2
