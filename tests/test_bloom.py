"""Unit tests for the Bloom-filter semi-join pruning (ops/bloom.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _ds(d):
    return ray.data.from_arrow(pa.table(d))


def test_bloom_no_false_negatives(ray_session):
    """Every inserted key must test positive — the Bloom invariant the
    exact-join finish relies on (a false negative would DROP a true
    match, which no downstream step can recover)."""
    from bionext_ray.ops.bloom import _set_bits, _test_bits
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 40, 5_000)
    for m_bits, n_hashes in [(1 << 14, 4), (1 << 17, 4), (1 << 12, 2)]:
        bits = _set_bits(keys, m_bits, n_hashes)
        assert _test_bits(keys, bits, m_bits, n_hashes).all()


def test_bloom_false_positive_rate_reasonable(ray_session):
    """With m/n ~= 26 bits/key and k=4 the FP rate should be well under
    5% (theory ~0.24% at 26 bits/key); assert a loose bound so the hash
    mixing is actually independent-ish, not broken (h1 == h2 would give
    ~100% FP at these sizes)."""
    from bionext_ray.ops.bloom import _set_bits, _test_bits
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 1 << 40, 5_000)
    probes = rng.integers(1 << 41, 1 << 42, 20_000)  # disjoint range
    bits = _set_bits(keys, 1 << 17, 4)
    fp = _test_bits(probes, bits, 1 << 17, 4).mean()
    assert fp < 0.05, fp


def test_build_bloom_merges_blocks(ray_session):
    """Distributed build over a multi-block dataset must contain every
    key from every block."""
    from bionext_ray.ops.bloom import _test_bits, build_bloom
    keys = np.arange(0, 3_000, dtype=np.int64)
    ds = _ds({"k": pa.array(keys, pa.int64())}).repartition(7)
    bits = build_bloom(ds, "k", m_bits=1 << 16, n_hashes=4)
    assert _test_bits(keys, bits, 1 << 16, 4).all()


def test_bloom_semi_join_exact_small_m(ray_session):
    """With a DELIBERATELY tiny filter (m=256 bits for 40 keys → many
    false positives survive the prune) the exact bucketed finish must
    still produce exactly the IN-subquery row set."""
    from bionext_ray.ops.bloom import bloom_semi_join
    rng = np.random.default_rng(17)
    big_k = rng.integers(0, 200, 2_000)
    big = _ds({"k": pa.array(big_k, pa.int64()),
               "v": pa.array(np.arange(2_000), pa.int64())}).repartition(5)
    right_k = rng.choice(200, 40, replace=False).astype(np.int64)
    right = _ds({"rk": pa.array(right_k, pa.int64())}).repartition(3)

    out = bloom_semi_join(big, right, ("k", "rk"), ["v"],
                          m_bits=256, n_hashes=2).to_pandas()
    exp = pd.DataFrame({"k": big_k, "v": np.arange(2_000)})
    exp = exp[exp["k"].isin(set(right_k.tolist()))]
    out = out.sort_values(["k", "v"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "v"]], exp[["k", "v"]])


def test_bloom_semi_join_string_keys(ray_session):
    """String keys go through the same hash path (pandas hash_array
    handles object dtype); duplicate right keys must not duplicate
    output rows (semi-join, not inner-join, semantics)."""
    from bionext_ray.ops.bloom import bloom_semi_join
    big = _ds({"u": pa.array([f"url{i % 7}" for i in range(50)]),
               "i": pa.array(list(range(50)), pa.int64())})
    right = _ds({"u": pa.array(["url1", "url3", "url3", "nope"])})
    out = bloom_semi_join(big, right, "u", ["i"],
                          m_bits=1 << 12).to_pandas()
    assert sorted(out["u"].unique()) == ["url1", "url3"]
    # 50 rows over 7 url buckets: url1 and url3 appear ceil-ish 7 times
    assert len(out) == sum(1 for i in range(50) if i % 7 in (1, 3))


# ---- heavy hitters (ops/sketch.py) — same sketch-prune + exact-finish
# motif as the Bloom semi join, so the tests live together ----

def test_heavy_hitters_exact_vs_pandas(ray_session):
    """Zipf-ish key mix, deliberately tiny capacity (aggressive per-batch
    pruning, err bound ~N/17): output must still equal the plain
    HAVING-count answer."""
    import pandas as pd
    from bionext_ray.ops.sketch import heavy_hitters
    rng = np.random.default_rng(31)
    keys = rng.zipf(1.5, 5_000) % 400
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64())})).repartition(8)
    got = heavy_hitters(ds, "k", threshold=400, capacity=16).to_pandas()
    want = pd.Series(keys).value_counts()
    want = want[want >= 400]
    assert dict(zip(got["k"], got["cnt"])) == want.to_dict()


def test_heavy_hitters_string_keys_and_empty(ray_session):
    from bionext_ray.ops.sketch import heavy_hitters
    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 5
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)})).repartition(3)
    got = heavy_hitters(ds, "k", threshold=30, capacity=64).to_pandas()
    assert dict(zip(got["k"], got["cnt"])) == {"a": 50, "b": 30}
    none = heavy_hitters(ds, "k", threshold=60, capacity=64).to_pandas()
    assert len(none) == 0


def test_heavy_hitters_rejects_unsound_capacity(ray_session):
    import pytest as _pytest
    from bionext_ray.ops.sketch import heavy_hitters
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(np.zeros(1000, np.int64), pa.int64())}))
    with _pytest.raises(ValueError):
        heavy_hitters(ds, "k", threshold=5, capacity=16)  # E ~ 59 > 5


def test_term_cooccurrence_matches_bruteforce(ray_session):
    """Batch-split invariance + correctness: pair counts must not depend
    on how docs split across batches (the GEMM partial is per-batch)."""
    from itertools import combinations

    from bionext_ray.ops.textstats import term_cooccurrence
    terms = ["alpha", "beta", "gamma", "delta"]
    docs = ["alpha beta gamma", "beta alpha", "gamma delta beta",
            "nothing here", "alpha alpha beta", ""] * 10
    want = {}
    for d in docs:
        present = sorted({t for t in terms if t in d.split(" ")})
        for a, b in combinations(present, 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    for parts in (1, 4):
        ds = ray.data.from_arrow(pa.table({
            "text": pa.array(docs, pa.string())})).repartition(parts)
        got = term_cooccurrence(ds, terms).to_pandas()
        assert {(r.term_a, r.term_b): r.n_docs
                for r in got.itertuples()} == want


def test_contamination_batch_token_boundaries(ray_session):
    """' gram ' containment must match token RUNS, not substrings:
    'scan merge' must not hit 'scanner merged'."""
    from bionext_ray.ops.textstats import contamination_batch
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the scan merge path", "scanner merged fast",
                          None])})
    out = contamination_batch(t, ["scan merge", "fast"], flag_min=2)
    assert out["n_hits"].to_pylist() == [1, 1, 0]
    assert out["contaminated"].to_pylist() == [False, False, False]
    both = contamination_batch(t, ["scan merge", "the"], flag_min=2)
    assert both["n_hits"].to_pylist()[0] == 2
    assert both["contaminated"].to_pylist()[0] is True


def test_profile_table_nulls_and_types(ray_session):
    from bionext_ray.ops.profile import profile_table
    t = pa.table({
        "i": pa.array([3, None, 10, 3, 9], pa.int64()),
        "s": pa.array(["b", "a", None, None, "zz"], pa.string())})
    got = (profile_table(ray.data.from_arrow(t).repartition(3),
                         ["i", "s"])
           .to_pandas().set_index("column"))
    assert got.loc["i", "n_rows"] == 5 and got.loc["i", "n_null"] == 1
    assert got.loc["i", "n_distinct"] == 3          # 3, 10, 9
    assert got.loc["i", "min_val"] == "3"           # numeric, not "10"<"3"
    assert got.loc["i", "max_val"] == "10"
    assert got.loc["s", "n_null"] == 2
    assert got.loc["s", "n_distinct"] == 3
    assert got.loc["s", "min_val"] == "a" and got.loc["s", "max_val"] == "zz"


def test_bloom_semi_join_mixed_key_dtypes(ray_session):
    """int32 right keys (incl. negative values) against an int64 big side
    must not produce Bloom false negatives — keys are dtype-reconciled
    before hashing."""
    from bionext_ray.ops.bloom import bloom_semi_join
    big = _ds({"k": pa.array([-5, -5, 3, 7, -2], pa.int64()),
               "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    right = _ds({"rk": pa.array([-5, -2, 99], pa.int32())})
    out = bloom_semi_join(big, right, ("k", "rk"), ["v"]).to_pandas()
    assert sorted(zip(out["k"], out["v"])) == [(-5, 1), (-5, 2), (-2, 5)]


def test_profile_table_digit_strings_keep_lexicographic_order(ray_session):
    """A VARCHAR column of digit strings must keep SQL's lexicographic
    MIN/MAX ('10' < '9'), while a true int column orders numerically."""
    from bionext_ray.ops.profile import profile_table
    t = pa.table({
        "s": pa.array(["9", "10", "0012"], pa.string()),
        "i": pa.array([9, 10, 12], pa.int64())})
    got = (profile_table(ray.data.from_arrow(t).repartition(2), ["s", "i"])
           .to_pandas().set_index("column"))
    assert got.loc["s", "min_val"] == "0012"
    assert got.loc["s", "max_val"] == "9"
    assert got.loc["i", "min_val"] == "9"
    assert got.loc["i", "max_val"] == "12"
