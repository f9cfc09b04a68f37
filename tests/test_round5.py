"""Regression tests for the round-5 advisor fixes and kernel rewrites."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- textstats
def test_normalize_text_strips_only_ascii_ws_class():
    """Engine strip must match the oracle's space-only trim: \\v and NBSP
    are NOT in the collapse class [ \\t\\n\\r\\f], so they survive at the
    edges on both sides (ADVICE r4: Python str.strip() ate them)."""
    from bionext_ray.ops.textstats import normalize_text_batch
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["\x0bhi\x0b", " x ", " \t a b\n "],
                         pa.string()),
    })
    out = normalize_text_batch(batch)
    assert out["norm_text"].to_pylist() == ["\x0bhi\x0b", " x ",
                                           "a b"]
    assert out["n_after"].to_pylist() == [4, 3, 3]


def test_repetition_stats_overflow_fallback_matches_fast_path():
    """The (doc, c1, c2) row-wise unique fallback must reduce to the same
    (doc-major sorted) bigram groups as the composite-key fast path — the
    guard swaps between them based on batch size (ADVICE r4: the int64
    composite could silently wrap)."""
    from bionext_ray.ops import textstats

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a b a c", "x x x y"], pa.string()),
    })
    fast = textstats.repetition_stats_batch(batch)
    # doc 1: bigrams (a b, b a, a b, b a, a c) -> top 'a b' x2 of 5
    # doc 2: bigrams (x x, x x, x y)           -> top 'x x' x2 of 3
    assert fast["top_bigram_ppm"].to_pylist() == [
        1_000_000 * 2 // 5, 1_000_000 * 2 // 3]

    # the two reductions agree element-for-element
    import pandas as pd
    words = ["a b a b a c".split(" "), "x x x y".split(" ")]
    flat = [w for ws in words for w in ws]
    codes, uniq = pd.factorize(np.array(flat))
    codes = codes.astype(np.int64)
    V = np.int64(len(uniq))
    lengths = np.array([len(w) for w in words], np.int64)
    doc_idx = np.repeat(np.arange(2, dtype=np.int64), lengths)
    same = doc_idx[:-1] == doc_idx[1:]
    bdoc = doc_idx[:-1][same]
    c1, c2 = codes[:-1][same], codes[1:][same]
    ubk, cnt_fast = np.unique(bdoc * (V * V) + c1 * V + c2,
                              return_counts=True)
    utrip, cnt_slow = np.unique(np.stack([bdoc, c1, c2], axis=1),
                                axis=0, return_counts=True)
    assert np.array_equal(ubk // (V * V), utrip[:, 0])
    assert np.array_equal(cnt_fast, cnt_slow)


# ---------------------------------------------------------------- relational
def test_latest_by_key_full_tie_is_partition_independent(ray_session):
    """When (order, tiebreak) fully ties, the payload columns are the
    last-resort total order — the same row must win at any block layout
    (ADVICE r4: block-local keep='first' made it layout-dependent)."""
    import ray.data

    from bionext_ray.ops.relational import latest_by_key
    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([5, 5, 5], pa.int64()),
        "payload": pa.array(["b", "c", "a"], pa.string()),
    })
    winners = set()
    for nblocks in (1, 2, 3):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        got = latest_by_key(ds, ["k"], "ts").to_pandas()
        assert len(got) == 1
        winners.add(got["payload"].iloc[0])
    assert winners == {"c"}   # descending payload order: 'c' wins


def test_shuffle_join_empty_right_respects_type_hint(ray_session):
    import pyarrow.compute as pc
    import ray
    import ray.data

    from bionext_ray.ops.relational import shuffle_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "lv": pa.array([10, 20], pa.int64())}))
    # provably-empty right (zero blocks after a drop-everything filter)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([7], pa.int64()),
        "rv": pa.array([70], pa.int64())})).map_batches(
        lambda b: b.filter(pc.equal(b["k"], -1)), batch_format="pyarrow")
    out = shuffle_join(left, right, "k", ["lv"], ["rv"], how="left",
                       right_types={"rv": pa.int64()})
    # the hinted pad column must carry a castable Arrow type, not null
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows])
    assert tbl.num_rows == 2
    assert tbl.schema.field("rv").type == pa.int64()
    assert tbl["rv"].null_count == 2


# ---------------------------------------------------------------- scorer
def test_relation_logits_batch_bit_identical():
    from bionext_ray.scorer import relation_logits, relation_logits_batch
    samples = [(f"doc{i}", f"E{i % 5}", f"F{i % 3}", i % 4)
               for i in range(64)]
    rel_b, nov_b = relation_logits_batch(samples)
    for i, (d, e1, e2, sq) in enumerate(samples):
        r, nv = relation_logits(d, e1, e2, sq)
        assert np.array_equal(r, rel_b[i])
        assert np.array_equal(nv, nov_b[i])


def test_relation_logits_batch_empty():
    from bionext_ray.scorer import relation_logits_batch
    rel, nov = relation_logits_batch([])
    assert rel.shape == (0, 9) and nov.shape == (0, 2)


# ---------------------------------------------------------------- tagger
def test_tag_document_matches_windows_oracle_on_adjacent_spans():
    """The tuple-based fast path must keep the decoder label quirk and
    span identity (the collision merge it skips is the identity on
    non-overlapping regex matches)."""
    from bionext_ray.functions.ner import tag_document
    from bionext_ray.gazetteer import GazetteerMatcher
    from bionext_ray.kb import default_kb
    m = GazetteerMatcher(default_kb().gazetteer)
    text = "slow hash data spark  rs4242 and_window window slow merge"
    out = tag_document(text, m)
    # adjacent via whitespace: 'slow' takes 'hash's chemical label
    assert out[0]["text"] == "slow"
    assert out[0]["label"] == "ChemicalEntity"
    # 'spark' double-space adjacent to rs4242 -> variant label
    spark = [o for o in out if o["text"] == "spark"][0]
    assert spark["label"] == "SequenceVariant"
    # underscore-glued 'window' must NOT match ('and_window'), the free
    # one must; 'slow merge' matched as the longer surface
    texts = [o["text"] for o in out]
    assert texts.count("window") == 1
    assert "slow merge" in texts
    # ids are positional ranks
    assert [o["id"] for o in out] == [str(i) for i in range(len(out))]


def test_zero_embedder_gates_every_embedding_tier():
    from bionext_ray.embedding import zero_embed_batch
    from bionext_ray.functions.ner import tag_document
    from bionext_ray.gazetteer import GazetteerMatcher
    from bionext_ray.kb import default_kb
    from bionext_ray.stages.linker import LinkerStage
    kb = default_kb()
    stage = LinkerStage(kb, embedder=zero_embed_batch)
    matcher = GazetteerMatcher(kb.gazetteer)
    # 'hash' links only via the mesh embedding shard; 'scan' only via the
    # gene embedding matrix -> both must drop with the zero embedder
    ms = tag_document("data hash data customer data scan", matcher)
    cleaned = stage.link_doc(ms)
    kept = {m["text"]: m["linked"] for m in cleaned}
    assert "hash" not in kept and "scan" not in kept
    assert kept["customer"] == "9606"


def test_latest_by_key_tolerates_nested_payload(ray_session):
    """A list-typed payload column must not break the determinism
    fallback (pandas cannot sort it) — nested columns are excluded from
    the last-resort sort and ride along unsorted."""
    import ray.data

    from bionext_ray.ops.relational import latest_by_key
    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([5, 9, 4], pa.int64()),
        "fid": pa.array([10, 11, 12], pa.int64()),
        "sig": pa.array([[1, 2], [3, 4], [5]], pa.list_(pa.int64())),
    })
    got = (latest_by_key(ray.data.from_arrow(t), ["k"], "ts",
                         tiebreak=["fid"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got["ts"].tolist() == [9, 4]
    assert [list(s) for s in got["sig"]] == [[3, 4], [5]]


def test_neardup_verified_oracle_covers_shingleless_docs(ray_session,
                                                         tmp_path):
    """Docs with <3 words have empty shingle sets: the engine pairs them
    at Jaccard 1.0 (identical sentinel signatures make every such pair an
    LSH candidate), and the oracle's short-doc UNION branch must emit the
    same rows."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as em
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hi there", "ok", "w1 w2 w3 w4 w5 w6 w7 w8"],
                         pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = em.queries()["neardup_verified"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(em.oracle_sql()["neardup_verified"]).df()
    con.close()
    assert sorted(map(tuple, got.to_numpy().tolist())) == \
        sorted(map(tuple, want.to_numpy().tolist())) == [(1, 2, 1000000)]
