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
