"""Dedup operator invariants: batching must never change results (hashing is
memoized per batch — a pure optimization), LSH must find real duplicates,
and signatures must be deterministic across processes (keyed blake2b, never
Python hash())."""

import numpy as np
import pyarrow as pa
import pytest

from bionext_ray.ops.dedup import (
    _shingle_hashes, jaccard, lsh_bands, minhash_signatures, simhash_batch,
)


def _docs_table(texts, ids=None):
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(ids if ids is not None else list(range(n)),
                           pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quick brown fox jumps over the lazy dog near the river bend",
    "a completely different document about distributed data processing",
    "",
    "one two",          # shorter than shingle k -> no shingles
    "the quick brown fox jumps over the lazy dog near the river bank",  # dup
]


def test_signatures_batch_size_invariant():
    full = minhash_signatures(_docs_table(TEXTS))
    # split into 1-row batches and concat: must be identical
    parts = [minhash_signatures(_docs_table([t], ids=[i]))
             for i, t in enumerate(TEXTS)]
    merged = pa.concat_tables(parts)
    assert full["signature"].to_pylist() == merged["signature"].to_pylist()


def test_exact_duplicates_share_all_bands():
    sigs = minhash_signatures(_docs_table(TEXTS))
    bands = lsh_bands(sigs)
    by_doc = {}
    for r in bands.to_pylist():
        by_doc.setdefault(r["doc_id"], []).append((r["band_id"], r["band_hash"]))
    assert by_doc[0] == by_doc[5]            # identical text -> identical bands
    # near-duplicate (one word differs) shares most but not all bands
    shared = len(set(by_doc[0]) & set(by_doc[1]))
    assert 0 < shared < len(by_doc[0])
    # unrelated doc shares none
    assert not set(by_doc[0]) & set(by_doc[2])


def test_shingle_hashes_match_reference_loop():
    """The vectorized polynomial combine must distinguish word order and
    produce stable unique sets."""
    a = _shingle_hashes("x y z x y z".split(), 3)
    b = _shingle_hashes("z y x z y x".split(), 3)
    assert a.dtype == np.uint64
    assert not set(a.tolist()) == set(b.tolist())
    # all values fit int64 (arrow list<int64> signature column)
    assert int(a.max()) < 2 ** 63


def test_jaccard_consistent_with_shingles():
    assert jaccard(TEXTS[0], TEXTS[0]) == 1.0
    j_near = jaccard(TEXTS[0], TEXTS[1])
    j_far = jaccard(TEXTS[0], TEXTS[2])
    assert j_far < 0.05 < j_near < 1.0
    assert jaccard("", "") == 1.0


def test_simhash_properties():
    out = simhash_batch(_docs_table(TEXTS))
    hs = out["simhash"].to_pylist()
    assert hs[0] == hs[5]                    # identical text
    # hamming distance: near-dup much closer than unrelated
    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")
    assert ham(hs[0], hs[1]) < ham(hs[0], hs[2])
    # bucket is the high prefix_bits of the hash
    assert out["bucket"].to_pylist()[0] == int(hs[0], 16) >> 48
    # batch-size invariance
    parts = [simhash_batch(_docs_table([t], ids=[i]))
             for i, t in enumerate(TEXTS)]
    assert pa.concat_tables(parts)["simhash"].to_pylist() == hs


def test_minhash_lsh_candidates_end_to_end(ray_session):
    import ray.data

    from bionext_ray.ops.dedup import minhash_lsh_candidates
    ds = ray.data.from_arrow(_docs_table(TEXTS))
    pairs = minhash_lsh_candidates(ds).to_pandas()
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 5) in got                     # exact duplicate always collides
    assert (0, 2) not in got and (2, 5) not in got
    # exact dup shares every band
    full = pairs[(pairs.id_a == 0) & (pairs.id_b == 5)]
    assert int(full["n_shared_bands"].iloc[0]) == 16


def test_asof_join_directions_and_ties(ray_session):
    import pandas as pd
    import ray.data

    from bionext_ray.ops.relational import asof_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "lts": pa.array([100, 250, 100, 100], pa.timestamp("us")),
        "lv": pa.array(["a", "b", "c", "d"], pa.string()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "rts": pa.array([50, 200, 200, 300, 90], pa.timestamp("us")),
        "rv": pa.array([10, 20, 30, 40, 50], pa.int64()),
    }))
    # backward: latest rts <= lts; tie at rts=200 resolves to max rv (30)
    out = asof_join(left, right, "k", "lts", "rts", ["rv"]).to_pandas()
    got = {(r.k, int(r.lts.timestamp() * 1e6)): int(r.rv)
           for r in out.itertuples()}
    assert got == {(1, 100): 10, (1, 250): 30, (2, 100): 50}
    # key 3 (no right rows) dropped under inner; kept with null under left
    out_l = asof_join(left, right, "k", "lts", "rts", ["rv"],
                      how="left").to_pandas()
    assert len(out_l) == 4
    assert out_l[out_l.k == 3]["rv"].isna().all()
    # forward: earliest rts >= lts
    out_f = asof_join(left, right, "k", "lts", "rts", ["rv"],
                      direction="forward").to_pandas()
    got_f = {(r.k, int(r.lts.timestamp() * 1e6)): int(r.rv)
             for r in out_f.itertuples()}
    assert got_f == {(1, 100): 20, (2, 100): 40}


def test_grouped_topk(ray_session):
    import ray.data

    from bionext_ray.ops.relational import grouped_topk
    t = pa.table({
        "g": pa.array(["a", "a", "a", "a", "b", "b", "c"], pa.string()),
        "score": pa.array([5, 9, 9, 1, 3, 7, 2], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)   # groups span blocks
    out = grouped_topk(ds, ["g"], "score", k=2,
                       tiebreak_cols=["id"]).to_pandas()
    got = {(r.g, int(r.score), int(r.id)) for r in out.itertuples()}
    # descending by score, ties by ascending id: a -> (9,2),(9,3); b -> 7,3
    assert got == {("a", 9, 2), ("a", 9, 3), ("b", 7, 6), ("b", 3, 5),
                   ("c", 2, 7)}
    # ascending variant
    out2 = grouped_topk(ds, ["g"], "score", k=1, descending=False,
                        tiebreak_cols=["id"]).to_pandas()
    got2 = {(r.g, int(r.score)) for r in out2.itertuples()}
    assert got2 == {("a", 1), ("b", 3), ("c", 2)}


def test_semi_join_filter(ray_session):
    import ray.data

    from bionext_ray.ops.relational import semi_join_filter
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array(list("abcde"), pa.string()),
    }))
    out = semi_join_filter(ds, {2, 4, 9}, "k").to_pandas()
    assert sorted(out["v"]) == ["b", "d"]
    # string keys
    ds2 = ray.data.from_arrow(pa.table({"k": pa.array(list("xyz"))}))
    assert semi_join_filter(ds2, {"y"}, "k").count() == 1


def test_range_join(ray_session):
    import ray.data

    from bionext_ray.ops.relational import range_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lts": pa.array([1_000_000, 5_000_000, 1_000_000], pa.timestamp("us")),
        "lid": pa.array([10, 11, 12], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "rts": pa.array([1_000_000, 2_000_000, 6_000_000, 9_000_000],
                        pa.timestamp("us")),
        "rid": pa.array([20, 21, 22, 23], pa.int64()),
    }))
    # window (lts, lts+2s]: strict lower bound, inclusive upper
    out = range_join(left, right, "k", "lts", "rts", width_s=2,
                     left_cols=["lid"], right_cols=["rid"]).to_pandas()
    got = {(int(r.lid), int(r.rid)) for r in out.itertuples()}
    # lid=10 (t=1s): rts in (1,3] -> rid 21 only (rid 20 at exactly 1s excluded)
    # lid=11 (t=5s): rts in (5,7] -> rid 22
    # lid=12 (k=2, t=1s): rts in (1,3] -> nothing (23 at 9s)
    assert got == {(10, 21), (11, 22)}
    # inclusive lower bound picks up the equal timestamp
    out2 = range_join(left, right, "k", "lts", "rts", width_s=2,
                      left_cols=["lid"], right_cols=["rid"],
                      strict_after=False).to_pandas()
    got2 = {(int(r.lid), int(r.rid)) for r in out2.itertuples()}
    assert got2 == {(10, 20), (10, 21), (11, 22)}


def test_lang_id_ngram():
    from bionext_ray.ops.textstats import lang_id_ngram_batch
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "the quick thing that we know about the world over there",
            "der hund springt ueber viele dinge die wir wissen",
            "le chien saute sur beaucoup de choses que nous savons",
            "zzzz qqqq xxxx",
        ], pa.string()),
    })
    out = lang_id_ngram_batch(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "und"]
    # deterministic across batch splits
    parts = pa.concat_tables([lang_id_ngram_batch(t.slice(i, 1))
                              for i in range(4)])
    assert parts["lang_pred"].to_pylist() == out["lang_pred"].to_pylist()


def test_verify_jaccard_distributed_large_candidate_set(ray_session):
    """The distributed verify (no take_all, docs shingled once per bucket)
    must match the scalar jaccard reference even when the candidate set is
    large (boilerplate-heavy corpus: 120 docs sharing one template)."""
    import math

    import ray.data

    from bionext_ray.ops.dedup import (
        minhash_lsh_candidates, verify_jaccard_pairs,
    )
    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank and then it happened again ") * 2
    texts = [base + f"tail{i % 7} extra{i % 3}" for i in range(120)]
    docs = ray.data.from_arrow(_docs_table(texts)).repartition(8)
    cands = minhash_lsh_candidates(docs).to_pandas()
    assert len(cands) > 500          # boilerplate corpus explodes candidates
    verified = verify_jaccard_pairs(
        ray.data.from_arrow(_docs_table(texts)), cands,
        threshold=0.5).to_pandas()
    got = {(int(a), int(b)): int(j) for a, b, j in zip(
        verified["id_a"], verified["id_b"], verified["jaccard_micro"])}
    # every candidate pair must agree with the scalar reference
    for a, b in zip(cands["id_a"], cands["id_b"]):
        j = jaccard(texts[int(a)], texts[int(b)], 3)
        if j >= 0.5:
            assert got[(int(a), int(b))] == int(math.floor(j * 1_000_000))
        else:
            assert (int(a), int(b)) not in got
    # no duplicates emitted
    assert len(got) == len(verified)


def test_range_join_bucket_cost_linear():
    """Micro-bench of the bucket kernel: 4x the keys (same rows per key,
    same matches per row) must cost ~4x, not 16x — the sorted-key
    searchsorted slice lookup is O(log R) per key, not O(R)."""
    import time

    import pandas as pd

    from bionext_ray.ops.relational import _band_join_bucket

    def mk_bucket(n_keys, per_key=40):
        rows = n_keys * per_key
        keys = np.repeat(np.arange(n_keys, dtype=np.int64), per_key)
        ts = np.tile(np.arange(per_key, dtype=np.int64) * 1_000_000, n_keys)
        left = pd.DataFrame({
            "__side": np.int8(0), "k": keys,
            "__ts": pd.to_datetime(ts, unit="us"),
            "l_lid": np.arange(rows, dtype=np.int64), "r_rid": np.int64(0)})
        right = pd.DataFrame({
            "__side": np.int8(1), "k": keys,
            "__ts": pd.to_datetime(ts, unit="us"),
            "l_lid": np.int64(0), "r_rid": np.arange(rows, dtype=np.int64)})
        return pd.concat([left, right], ignore_index=True)

    def run(n_keys):
        g = mk_bucket(n_keys)
        t0 = time.perf_counter()
        out = _band_join_bucket(g, "k", "lts", "rts", ["lid"], ["rid"],
                                np.int64(2_000_000), True)
        dt = time.perf_counter() - t0
        return dt, len(out)

    run(50)                                   # warm numpy/pandas
    t_small, n_small = run(200)
    t_big, n_big = run(800)
    assert n_big == 4 * n_small               # same matches per key
    # quadratic per-key rescan would be ~16x; allow generous headroom
    assert t_big < 8 * max(t_small, 1e-4), (t_small, t_big)


def test_connected_components(ray_session):
    """Min-label propagation must match union-find on a graph with chains,
    a star, and isolated pairs (chains exercise multi-round convergence)."""
    import ray.data

    from bionext_ray.ops.dedup import connected_components
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),      # 6-chain
             (100, 101), (100, 102), (100, 103),          # star
             (50, 60),                                    # pair
             (7, 8), (8, 9), (9, 7)]                      # triangle
    pairs = pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64()),
    })
    out = connected_components(
        ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(out["node"], out["cluster_id"]))

    # union-find reference
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


def test_kmv_distinct_sketch(ray_session):
    """Deterministic KMV cardinality sketch: exact below k, bounded-error
    estimate above k, identical across batching layouts."""
    import ray.data

    from bionext_ray.ops.sketch import kmv_distinct
    small = pa.table({"v": pa.array([f"u{i % 30}" for i in range(500)])})
    out = kmv_distinct(ray.data.from_arrow(small), "v", k=64).to_pylist()[0]
    assert out == {"n_distinct_est": 30, "is_exact": True}

    big = pa.table({"v": pa.array([f"user-{i}" for i in range(5000)])})
    for blocks in (1, 8):
        ds = ray.data.from_arrow(big).repartition(blocks)
        est = kmv_distinct(ds, "v", k=256).to_pylist()[0]
        assert not est["is_exact"]
        assert abs(est["n_distinct_est"] - 5000) / 5000 < 0.15
        if blocks == 1:
            first = est["n_distinct_est"]
    assert est["n_distinct_est"] == first     # layout-independent


def test_kmv_distinct_grouped(ray_session):
    """Grouped KMV: exact for small groups, estimator for big ones, both
    layout-independent and equal to the global sketch run per group."""
    import ray.data

    from bionext_ray.ops.sketch import kmv_distinct, kmv_distinct_grouped
    vals, keys = [], []
    for i in range(4000):
        keys.append("big")
        vals.append(f"user-{i}")
    for i in range(600):
        keys.append("small")
        vals.append(f"u{i % 20}")
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    for blocks in (1, 8):
        got = {r["k"]: (r["n_distinct_est"], r["is_exact"])
               for r in kmv_distinct_grouped(
                   ray.data.from_arrow(t).repartition(blocks),
                   "k", "v", k=64).take_all()}
        assert got["small"] == (20, True)
        assert not got["big"][1]
        # per-group result identical to the global sketch on that slice
        solo = kmv_distinct(
            ray.data.from_arrow(t.filter(
                pa.compute.equal(t["k"], "big"))), "v", k=64).to_pylist()[0]
        assert got["big"][0] == solo["n_distinct_est"]
        if blocks == 1:
            first = got
    assert got == first


def test_connected_components_long_chain_and_cap(ray_session):
    """Pointer jumping must fully merge a chain far deeper than the round
    count plain propagation could reach; an insufficient iteration cap
    must RAISE, never return silently-wrong clusters."""
    import ray.data

    from bionext_ray.ops.dedup import connected_components
    n = 60
    pairs = pa.table({"id_a": pa.array(list(range(n)), pa.int64()),
                      "id_b": pa.array(list(range(1, n + 1)), pa.int64())})
    out = connected_components(ray.data.from_arrow(pairs)).to_pandas()
    assert (out["cluster_id"] == 0).all() and len(out) == n + 1
    with pytest.raises(RuntimeError):
        connected_components(ray.data.from_arrow(pairs), max_iters=2)


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    """Exact ROWS-window pairs vs brute force, including duplicate keys
    spanning range-bucket boundaries, at several parallelism levels."""
    import ray.data

    from bionext_ray.ops.dedup import sorted_neighborhood_pairs
    rng = np.random.default_rng(59)
    n = 400
    keys = [f"k{rng.integers(0, 40):02d}" for _ in range(n)]  # heavy dups
    ids = rng.permutation(n)
    order = sorted(range(n), key=lambda i: (keys[i], ids[i]))
    want = set()
    for w in range(1, 4):
        for i in range(n - w):
            want.add((ids[order[i]], ids[order[i + w]]))
    for parts in (1, 6):
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(keys, pa.string()),
            "i": pa.array(ids, pa.int64())})).repartition(parts)
        got = sorted_neighborhood_pairs(ds, "k", "i", window=3).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == want
        assert len(got) == len(want)            # no duplicate emissions


def test_sorted_neighborhood_small_and_empty(ray_session):
    import ray.data

    from bionext_ray.ops.dedup import sorted_neighborhood_pairs
    one = ray.data.from_arrow(pa.table({
        "k": pa.array(["x"], pa.string()),
        "i": pa.array([5], pa.int64())}))
    assert sorted_neighborhood_pairs(one, "k", "i", 2).count() == 0
    two = ray.data.from_arrow(pa.table({
        "k": pa.array(["b", "a"], pa.string()),
        "i": pa.array([1, 2], pa.int64())}))
    got = sorted_neighborhood_pairs(two, "k", "i", 2).to_pandas()
    assert list(zip(got["id_a"], got["id_b"])) == [(2, 1)]


def test_edit_distance_pairs_matches_bruteforce(ray_session):
    """All Levenshtein-1 pair classes: substitution, insertion/deletion
    (incl. at word ends), plus distance-2 decoys the blocking admits but
    the verify must kill; split-invariant."""
    import ray.data

    from bionext_ray.ops.dedup import edit_distance_pairs
    words = ["cat", "cut", "cart", "at", "dog", "dig", "dogs", "kart",
             "ca", "cats", "xyz", "cat"]

    def dist(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(words))
    want = {(a, b) for i, a in enumerate(uniq) for b in uniq[i + 1:]
            if dist(a, b) <= 1}
    for parts in (1, 4):
        ds = ray.data.from_arrow(pa.table({
            "w": pa.array(words, pa.string())})).repartition(parts)
        got = edit_distance_pairs(ds, "w").to_pandas()
        assert set(zip(got["word_a"], got["word_b"])) == want
        assert len(got) == len(want)


def test_duplicate_text_spans_merges_islands(ray_session):
    """5-gram 'a b c d e' repeats across docs 1/2; doc 1 has two
    overlapping duplicated shingles that must merge into ONE maximal
    span; the unique tail of doc 3 emits nothing."""
    import pyarrow as pa
    import ray.data

    from bionext_ray.ops.dedup import duplicate_text_spans

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e f unique1 words here a b c d e",
            "x a b c d e f y",
            "totally different words no repeats at all ok",
        ], pa.string()),
    }))
    got = duplicate_text_spans(docs, k=5).to_pandas()
    spans = {(r.doc_id, r.start_word, r.end_word)
             for r in got.itertuples(index=False)}
    # doc 1: 'a b c d e f' head (grams at 0,1 overlap -> one span 0..7?)
    #   gram(0)='a b c d e' (dup with doc1 tail + doc2), gram(1)='b c d e f'
    #   (dup with doc2) -> merged island [0, 6+... ) and tail gram at 9
    assert (1, 0, 6) in spans       # head: positions 0,1 -> [0, 1+5)
    assert (1, 9, 14) in spans      # tail 'a b c d e'
    assert (2, 1, 7) in spans       # doc2 positions 1,2 -> [1, 2+5)
    assert not any(d == 3 for d, _, _ in spans)


# ------------------------------------------------------------- chunk_dedup
def _chunk_dedup_reference(texts, ids, width=8):
    """Plain-Python replay of the chunk_dedup contract."""
    import hashlib
    occ = []   # (chunk, doc, idx)
    per_doc = {}
    for did, t in zip(ids, texts):
        words = [w for w in (t or "").lower().split(" ") if w]
        chunks = [" ".join(words[i:i + width])
                  for i in range(0, len(words), width)]
        per_doc[did] = chunks
        for idx, c in enumerate(chunks):
            occ.append((c, did, idx))
    winner = {}
    for c, did, idx in sorted(occ, key=lambda x: (x[1], x[2])):
        winner.setdefault(c, (did, idx))
    rows = []
    for did in ids:
        chunks = per_doc[did]
        kept = [c for idx, c in enumerate(chunks)
                if winner[c] == (did, idx)]
        rows.append((did, len(chunks), len(chunks) - len(kept),
                     hashlib.md5(" ".join(kept).encode()).hexdigest()))
    return sorted(rows)


def test_chunk_dedup_matches_reference(ray_session):
    """Randomized duplicate-heavy corpus vs the plain replay, at two block
    layouts (results must not depend on partitioning)."""
    import ray.data

    from bionext_ray.ops.dedup import chunk_dedup
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(9)]   # tiny vocab -> real chunk dups
    texts, ids = [], []
    for d in range(60):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(vocab, n)))
        ids.append(d)
    texts[7] = texts[3]                   # full-doc duplicate
    texts[11] = texts[3] + " " + texts[3]  # within-doc repeated chunks
    want = _chunk_dedup_reference(texts, ids, width=4)
    for parts in (1, 7):
        ds = ray.data.from_arrow(_docs_table(texts, ids)).repartition(parts)
        got = sorted(map(tuple, chunk_dedup(ds, width=4)
                         .to_pandas().to_numpy().tolist()))
        assert got == want, parts


def test_chunk_dedup_degenerate_docs(ray_session):
    """Empty / NULL / whitespace-only docs still get a row: (0, 0, md5(''))."""
    import hashlib

    import ray.data

    from bionext_ray.ops.dedup import chunk_dedup
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", None, "   "], pa.string())})
    got = (chunk_dedup(ray.data.from_arrow(t), width=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    empty = hashlib.md5(b"").hexdigest()
    assert got["n_chunks"].tolist() == [0, 0, 0]
    assert got["n_dropped"].tolist() == [0, 0, 0]
    assert got["kept_md5"].tolist() == [empty] * 3


def test_chunk_dedup_first_occurrence_wins(ray_session):
    """The keeper is the minimum (doc_id, idx) occurrence — later docs lose
    their copy even when they appear in an earlier block."""
    import hashlib

    import ray.data

    from bionext_ray.ops.dedup import chunk_dedup
    # doc 1 and doc 9 share one 2-token chunk; doc 9 sorts after doc 1 no
    # matter which block it lands in
    t = pa.table({"doc_id": pa.array([9, 1], pa.int64()),
                  "text": pa.array(["a b x y", "a b"], pa.string())})
    got = (chunk_dedup(ray.data.from_arrow(t), width=2)
           .to_pandas().set_index("doc_id"))
    assert got.loc[1, "n_dropped"] == 0
    assert got.loc[9, "n_dropped"] == 1
    assert got.loc[9, "kept_md5"] == hashlib.md5(b"x y").hexdigest()
