"""Cross-document n-gram operators: incidence kernel, docfreq table,
per-doc boilerplate fraction."""

import pyarrow as pa

from bionext_ray.ops.textstats import (boilerplate_ppm, ngram_docfreq,
                                       ngram_incidence_batch)


def _docs(rows):
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_incidence_counts_and_totals():
    t = ngram_incidence_batch(_docs([(1, "a b a b a")]), n=2)
    rows = {r["gram"]: r for r in t.to_pylist()}
    assert rows["a b"]["occ"] == 2 and rows["b a"]["occ"] == 2
    assert all(r["n_grams"] == 4 for r in rows.values())


def test_incidence_skips_short_and_null_docs():
    t = ngram_incidence_batch(_docs([(1, "one two"), (2, None), (3, "")]),
                              n=3)
    assert t.num_rows == 0


def test_incidence_lowercases():
    t = ngram_incidence_batch(_docs([(1, "A B c")]), n=3)
    assert t["gram"].to_pylist() == ["a b c"]


def test_docfreq_min_df_filters(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs([
        (1, "x y z tail"), (2, "x y z other"), (3, "unique words only here")]))
    out = ngram_docfreq(ds, n=3, min_df=2).to_pandas()
    assert out.to_dict("records") == [
        {"gram": "x y z", "df": 2, "n_occurrences": 2}]


def test_boilerplate_ppm_left_join_zero_docs(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs([
        (1, "x y z a"), (2, "x y z b"), (3, "too short"), (4, "")]))
    out = (boilerplate_ppm(ds, n=3, min_df=2).to_pandas()
           .set_index("doc_id").sort_index())
    # docs 1/2: 2 trigrams each, 1 duplicated ("x y z") -> 500000 ppm
    assert out.loc[1].tolist() == [2, 500_000]
    assert out.loc[2].tolist() == [2, 500_000]
    # short and empty docs still present with 0
    assert out.loc[3].tolist() == [0, 0]
    assert out.loc[4].tolist() == [0, 0]


def test_normalize_text_batch_semantics():
    from bionext_ray.ops.textstats import normalize_text_batch
    t = normalize_text_batch(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["  a\t b\n\nc  ", "cafe\u0301", None],
                         pa.string()),
    }))
    rows = t.to_pylist()
    assert rows[0]["norm_text"] == "a b c"
    assert rows[0]["n_before"] == 11 and rows[0]["n_after"] == 5
    # NFC composes e + combining U+0301 into one code point
    assert rows[1]["norm_text"] == "caf\u00e9"
    assert rows[1]["n_before"] == 5 and rows[1]["n_after"] == 4
    assert rows[2]["norm_text"] == "" and rows[2]["n_before"] == 0
