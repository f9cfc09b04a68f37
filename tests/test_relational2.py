"""Unit tests for the round-3 relational additions: big-big shuffle join,
anti-join, running (window) aggregate, hopping windows, PII redaction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _ds(d):
    return ray.data.from_arrow(pa.table(d))


def test_shuffle_join_inner_and_left(ray_session):
    from bionext_ray.ops.relational import shuffle_join
    left = _ds({"k": pa.array([1, 2, 2, 3, 5], pa.int64()),
                "lv": pa.array([10, 20, 21, 30, 50], pa.int64())})
    right = _ds({"rk": pa.array([1, 2, 4], pa.int64()),
                 "rv": pa.array(["a", "b", "d"], pa.string())})

    inner = shuffle_join(left, right, on=("k", "rk"), left_cols=["lv"],
                         right_cols=["rv"]).to_pandas()
    inner = inner.sort_values(["k", "lv"]).reset_index(drop=True)
    assert inner["k"].tolist() == [1, 2, 2]
    assert inner["lv"].tolist() == [10, 20, 21]
    assert inner["rv"].tolist() == ["a", "b", "b"]

    lj = shuffle_join(left, right, on=("k", "rk"), left_cols=["lv"],
                      right_cols=["rv"], how="left").to_pandas()
    lj = lj.sort_values(["k", "lv"]).reset_index(drop=True)
    assert lj["k"].tolist() == [1, 2, 2, 3, 5]
    assert lj["rv"].tolist()[:3] == ["a", "b", "b"]
    assert lj["rv"].isna().tolist() == [False, False, False, True, True]


def test_shuffle_join_matches_pandas_merge(ray_session):
    """Randomized cross-check vs pandas merge (the single-node oracle)."""
    from bionext_ray.ops.relational import shuffle_join
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 50, 500)
    rk = rng.integers(0, 60, 80)
    left = _ds({"k": pa.array(lk, pa.int64()),
                "lv": pa.array(np.arange(500), pa.int64())})
    right = _ds({"k": pa.array(rk, pa.int64()),
                 "rv": pa.array(np.arange(80) * 7, pa.int64())})
    got = (shuffle_join(left, right, "k", ["lv"], ["rv"])
           .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    want = (pd.DataFrame({"k": lk, "lv": np.arange(500)})
            .merge(pd.DataFrame({"k": rk, "rv": np.arange(80) * 7}), on="k")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_shuffle_join_string_key(ray_session):
    from bionext_ray.ops.relational import shuffle_join
    left = _ds({"k": pa.array(["x", "y", "z"], pa.string()),
                "lv": pa.array([1, 2, 3], pa.int64())})
    right = _ds({"k": pa.array(["y", "z", "w"], pa.string()),
                 "rv": pa.array([20, 30, 40], pa.int64())})
    out = (shuffle_join(left, right, "k", ["lv"], ["rv"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == ["y", "z"]
    assert out["rv"].tolist() == [20, 30]


def test_anti_join_filter(ray_session):
    from bionext_ray.ops.relational import anti_join_filter
    big = _ds({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
               "v": pa.array(list("abcde"), pa.string())})
    out = anti_join_filter(big, {2, 4, 9}, "k").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 3, 5]


def test_running_agg_matches_pandas(ray_session):
    from bionext_ray.ops.relational import running_agg
    rng = np.random.default_rng(3)
    n = 400
    key = rng.integers(0, 20, n)
    order = rng.permutation(n)          # unique tiebreaker
    val = rng.integers(-5, 10, n)
    ds = _ds({"key": pa.array(key, pa.int64()),
              "ord": pa.array(order, pa.int64()),
              "val": pa.array(val, pa.int64())})
    got = (running_agg(ds, "key", ["ord"], "val", "run",
                       row_number_alias="rn")
           .to_pandas().sort_values(["key", "ord"]).reset_index(drop=True))
    df = (pd.DataFrame({"key": key, "ord": order, "val": val})
          .sort_values(["key", "ord"]).reset_index(drop=True))
    df["run"] = df.groupby("key")["val"].cumsum()
    df["rn"] = df.groupby("key").cumcount() + 1
    pd.testing.assert_frame_equal(
        got[["key", "ord", "val", "run", "rn"]],
        df.astype({"rn": got["rn"].dtype}))


def test_hopping_window_membership(ray_session):
    """Each event must appear in exactly width/hop windows, and each of its
    windows must contain the event's timestamp."""
    from bionext_ray.ops.relational import hopping_window
    ts = pa.array(np.array([0, 10, 900, 3599, 3600], dtype="int64")
                  * 1_000_000).cast(pa.timestamp("us"))
    ds = _ds({"k": pa.array(["a"] * 5, pa.string()), "ts": ts,
              "one": pa.array([1] * 5, pa.int64())})
    out = hopping_window(ds, "k", "ts", width_s=3600, hop_s=900,
                         specs=[("one", "sum", "n")]).to_pandas()
    # total memberships = 5 events x 4 windows each
    assert out["n"].sum() == 20
    # the t=0 event: windows starting at 0, -900, -1800, -2700 seconds
    starts = sorted(out[out["n"] > 0]["window_start"])
    assert starts[0] == -2700 * 1_000_000


def test_redact_pii_batch():
    from bionext_ray.ops.textstats import redact_pii_batch
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at jo.doe+x@example.org or call 1234567 now",
            "no pii here, just 12345 (too short)",
            None,
        ], pa.string()),
    })
    out = redact_pii_batch(batch)
    assert out["clean_text"].to_pylist() == [
        "mail me at <EMAIL> or call <NUM> now",
        "no pii here, just 12345 (too short)",
        "",
    ]
    assert out["n_emails"].to_pylist() == [1, 0, 0]
    assert out["n_longnums"].to_pylist() == [1, 0, 0]


def _int_pagerank_ref(edges, iters=3, scale=1_000_000_000, d=85):
    """Plain-Python mirror of ops/graph.py::pagerank's integer recurrence."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    base = scale // n
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: base for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += pr[u] // deg[u]
        pr = {v: ((100 - d) * base) // 100 + (d * contrib[v]) // 100
              for v in nodes}
    return pr


def test_pagerank_matches_reference_recurrence(ray_session):
    from bionext_ray.ops.graph import pagerank
    raw = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 1)]  # dup edge
    ds = _ds({"src": pa.array([u for u, _ in raw], pa.int64()),
              "dst": pa.array([v for _, v in raw], pa.int64())})
    got = pagerank(ds, iters=3).to_pandas().set_index("node")[
        "pr_scaled"].to_dict()
    assert got == _int_pagerank_ref(raw)


def test_pagerank_sink_node_keeps_base_rank(ray_session):
    """A node with no in-edges ends at the base term; a sink (no out-edges)
    still accumulates rank but leaks its mass (documented choice)."""
    from bionext_ray.ops.graph import pagerank
    ds = _ds({"src": pa.array([0, 1], pa.int64()),
              "dst": pa.array([1, 2], pa.int64())})
    got = pagerank(ds, iters=2).to_pandas().set_index("node")[
        "pr_scaled"].to_dict()
    assert got == _int_pagerank_ref([(0, 1), (1, 2)], iters=2)
    base = 1_000_000_000 // 3
    assert got[0] == (15 * base) // 100  # no in-edges -> base term only


def test_pagerank_exchange_path_matches_broadcast(ray_session):
    """The all-exchange (Pregel) path and the broadcast-state path are the
    same integer recurrence — force the exchange path with a zero broadcast
    threshold and compare bit-for-bit."""
    from bionext_ray.ops.graph import pagerank
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 30, (200, 2))

    def edge_ds():
        return _ds({"src": pa.array(raw[:, 0], pa.int64()),
                    "dst": pa.array(raw[:, 1], pa.int64())})

    a = pagerank(edge_ds(), iters=3).to_pandas() \
        .set_index("node")["pr_scaled"].to_dict()
    b = pagerank(edge_ds(), iters=3, broadcast_nodes_max=0).to_pandas() \
        .set_index("node")["pr_scaled"].to_dict()
    assert a == b == _int_pagerank_ref(
        [tuple(e) for e in raw.tolist()])


def test_rollup_matches_pandas(ray_session):
    from bionext_ray.ops.relational import rollup_agg
    rng = np.random.default_rng(11)
    a = rng.choice(list("xyz"), 200)
    b = rng.choice(list("pq"), 200)
    v = rng.integers(0, 100, 200)
    ds = _ds({"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string()),
              "v": pa.array(v, pa.int64())})
    got = (rollup_agg(ds, ["a", "b"], [("v", "sum", "sv"),
                                       ("v", "count", "nv")])
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    df = pd.DataFrame({"a": a, "b": b, "v": v})
    lv2 = df.groupby(["a", "b"]).agg(sv=("v", "sum"),
                                     nv=("v", "count")).reset_index()
    lv1 = df.groupby(["a"]).agg(sv=("v", "sum"),
                                nv=("v", "count")).reset_index()
    lv1["b"] = "*ALL*"
    lv0 = pd.DataFrame({"a": ["*ALL*"], "b": ["*ALL*"],
                        "sv": [v.sum()], "nv": [200]})
    want = (pd.concat([lv2, lv1, lv0], ignore_index=True)
            [["a", "b", "sv", "nv"]]
            .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"sv": "int64", "nv": "int64"}),
        want.astype({"sv": "int64", "nv": "int64"}))


def test_skew_join_matches_pandas_merge(ray_session):
    """Salted path vs pandas merge: a hot key (80% of the probe side) must
    produce IDENTICAL rows to a plain join, inner and left."""
    from bionext_ray.ops.relational import skew_join
    rng = np.random.default_rng(11)
    lk = np.where(rng.random(600) < 0.8, 7, rng.integers(0, 40, 600))
    left = _ds({"k": pa.array(lk, pa.int64()),
                "lv": pa.array(np.arange(600), pa.int64())})
    right = _ds({"rk": pa.array(np.arange(0, 45), pa.int64()),
                 "rv": pa.array(np.arange(0, 45) * 3, pa.int64())})
    ldf = pd.DataFrame({"k": lk, "lv": np.arange(600)})
    rdf = pd.DataFrame({"k": np.arange(0, 45), "rv": np.arange(0, 45) * 3})
    for how in ("inner", "left"):
        got = (skew_join(left, right, ("k", "rk"), ["lv"], ["rv"], how=how,
                         hot_keys={7}, salts=4)
               .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
        want = (ldf.merge(rdf, on="k", how=how)
                .sort_values(["k", "lv"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_skew_join_auto_hot_detection(ray_session):
    """detect_hot_keys finds the hot key; empty hot set falls back to the
    plain shuffle join with the same result."""
    from bionext_ray.ops.relational import detect_hot_keys, skew_join
    lk = np.concatenate([np.full(300, 9), np.arange(20)])
    left = _ds({"k": pa.array(lk, pa.int64()),
                "lv": pa.array(np.arange(320), pa.int64())})
    hot = detect_hot_keys(left, "k", threshold=100)
    assert hot == {9}
    right = _ds({"k": pa.array(np.arange(25), pa.int64()),
                 "rv": pa.array(np.arange(25), pa.int64())})
    auto = (skew_join(left, right, "k", ["lv"], ["rv"], hot_threshold=100)
            .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    none_hot = (skew_join(left, right, "k", ["lv"], ["rv"],
                          hot_keys=set())
                .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(auto, none_hot)
    assert len(auto) == 320


def test_mixture_sample_rates_and_determinism():
    """Per-group keep decision equals hash_sample_batch at that group's
    rate; absent groups use default_rate; batch-split invariant."""
    from bionext_ray.ops.textstats import (hash_sample_batch,
                                           mixture_sample_batch)
    n = 2000
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "g": pa.array([("a", "b", "c")[i % 3] for i in range(n)]),
    })
    rates = {"a": 0.2, "b": 0.7}
    out = mixture_sample_batch(t, "id", "g", rates, default_rate=1.0,
                               seed="5").to_pandas()
    # group c: default 1.0 keeps everything
    assert (out["g"] == "c").sum() == sum(1 for i in range(n) if i % 3 == 2)
    for g, r in rates.items():
        sub = t.filter(pa.compute.equal(t["g"], g))
        want = hash_sample_batch(sub, "id", r, seed="5").to_pandas()
        got = out[out["g"] == g].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
    # splitting the batch changes nothing (parallelism-invariant)
    halves = pd.concat([
        mixture_sample_batch(t.slice(0, n // 2), "id", "g", rates,
                             default_rate=1.0, seed="5").to_pandas(),
        mixture_sample_batch(t.slice(n // 2), "id", "g", rates,
                             default_rate=1.0, seed="5").to_pandas(),
    ]).reset_index(drop=True)
    pd.testing.assert_frame_equal(halves, out)


def test_bucketed_agg_matches_pandas(ray_session):
    """High-cardinality grouped agg (sum/min/max/count) vs pandas."""
    from bionext_ray.ops.relational import bucketed_agg
    rng = np.random.default_rng(3)
    k = rng.integers(0, 5000, 20000)
    v = rng.integers(-100, 100, 20000)
    ds = _ds({"k": pa.array(k, pa.int64()),
              "v": pa.array(v, pa.int64())}).repartition(8)
    got = (bucketed_agg(ds, ["k"], [("v", "sum", "s"), ("v", "min", "lo"),
                                    ("v", "max", "hi"),
                                    ("v", "count", "n")])
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (pd.DataFrame({"k": k, "v": v}).groupby("k")["v"]
            .agg(s="sum", lo="min", hi="max", n="count").reset_index())
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_window_funcs_matches_pandas(ray_session):
    """Rolling sum/min/max + lag/lead vs the single-node pandas oracle,
    across bucket boundaries (many keys, several partitions)."""
    from bionext_ray.ops.relational import window_funcs
    rng = np.random.default_rng(41)
    n = 600
    k = rng.integers(0, 12, n)
    o = rng.permutation(n)
    v = rng.integers(-50, 50, n)
    ds = _ds({"k": pa.array(k, pa.int64()), "o": pa.array(o, pa.int64()),
              "v": pa.array(v, pa.int64())}).repartition(5)
    got = (window_funcs(ds, "k", ["o"],
                        [("rolling_sum", "v", 3, "rs"),
                         ("rolling_min", "v", 3, "rmin"),
                         ("lag", "v", 1, "lg"),
                         ("lead", "v", 2, "ld")], fill=-999)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    df = (pd.DataFrame({"k": k, "o": o, "v": v})
          .sort_values(["k", "o"]).reset_index(drop=True))
    gb = df.groupby("k", sort=False)
    df["rs"] = gb["v"].rolling(3, min_periods=1).sum().reset_index(
        level=0, drop=True).astype("int64")
    df["rmin"] = gb["v"].rolling(3, min_periods=1).min().reset_index(
        level=0, drop=True).astype("int64")
    df["lg"] = gb["v"].shift(1).fillna(-999).astype("int64")
    df["ld"] = gb["v"].shift(-2).fillna(-999).astype("int64")
    pd.testing.assert_frame_equal(
        got[["k", "o", "v", "rs", "rmin", "lg", "ld"]], df)


def test_window_funcs_nullable_lag_and_float(ray_session):
    """fill=None leaves out-of-frame lag null; float columns stay float."""
    from bionext_ray.ops.relational import window_funcs
    ds = _ds({"k": pa.array([1, 1, 1], pa.int64()),
              "o": pa.array([1, 2, 3], pa.int64()),
              "v": pa.array([1.5, 2.5, 3.5], pa.float64())})
    got = (window_funcs(ds, "k", ["o"],
                        [("rolling_sum", "v", 2, "rs"),
                         ("lag", "v", 1, "lg")])
           .to_pandas().sort_values("o").reset_index(drop=True))
    assert got["rs"].tolist() == [1.5, 4.0, 6.0]
    assert np.isnan(got["lg"].iloc[0]) and got["lg"].tolist()[1:] == [1.5, 2.5]


def test_window_funcs_rank_family_matches_duckdb(ray_session):
    """rank / dense_rank (by value, with ties) and NTILE distribution vs
    DuckDB on the same frame."""
    import duckdb
    from bionext_ray.ops.relational import window_funcs
    rng = np.random.default_rng(43)
    n = 300
    k = rng.integers(0, 7, n)
    o = rng.permutation(n)
    v = rng.integers(0, 9, n)          # deliberately heavy ties
    ds = _ds({"k": pa.array(k, pa.int64()), "o": pa.array(o, pa.int64()),
              "v": pa.array(v, pa.int64())}).repartition(4)
    got = (window_funcs(ds, "k", ["o"],
                        [("rank", "v", 0, "r"),
                         ("dense_rank", "v", 0, "dr"),
                         ("ntile", None, 4, "t4")])
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    df = pd.DataFrame({"k": k, "o": o, "v": v})
    want = duckdb.query("""
        SELECT k, o,
               CAST(RANK() OVER (PARTITION BY k ORDER BY v) AS BIGINT) r,
               CAST(DENSE_RANK() OVER (PARTITION BY k ORDER BY v)
                    AS BIGINT) dr,
               CAST(NTILE(4) OVER (PARTITION BY k ORDER BY o)
                    AS BIGINT) t4
        FROM df ORDER BY k, o""").df()
    pd.testing.assert_frame_equal(
        got[["k", "o", "r", "dr", "t4"]].astype("int64"),
        want.astype("int64"))


def test_window_funcs_ntile_more_tiles_than_rows(ray_session):
    from bionext_ray.ops.relational import window_funcs
    ds = _ds({"k": pa.array([1, 1, 1], pa.int64()),
              "o": pa.array([3, 1, 2], pa.int64())})
    got = (window_funcs(ds, "k", ["o"], [("ntile", None, 10, "t")])
           .to_pandas().sort_values("o"))
    assert got["t"].tolist() == [1, 2, 3]


def test_grouped_mode_ties_and_split_invariance(ray_session):
    """Tie -> smallest value; result must not depend on batch layout."""
    from bionext_ray.ops.relational import grouped_mode
    k = [1, 1, 1, 1, 2, 2, 2, 3]
    v = ["b", "a", "a", "b", "z", "y", "z", "q"]  # key1 tie a/b -> a
    for parts in (1, 4):
        ds = _ds({"k": pa.array(k, pa.int64()),
                  "v": pa.array(v, pa.string())}).repartition(parts)
        got = (grouped_mode(ds, "k", "v").to_pandas()
               .sort_values("k").reset_index(drop=True))
        assert got["mode"].tolist() == ["a", "z", "q"]
        assert got["mode_n"].tolist() == [2, 2, 1]


def test_grouped_quantiles_cont_matches_numpy(ray_session):
    """q_micro must equal numpy's linear-interpolation percentile scaled
    to micro-units (exact: both are v_l + frac*(v_hi-v_l) with frac a
    multiple of 1/100)."""
    from bionext_ray.ops.relational import grouped_quantiles_cont
    rng = np.random.default_rng(53)
    k = rng.integers(0, 9, 500)
    v = rng.integers(-10_000, 10_000, 500)
    ds = _ds({"k": pa.array(k, pa.int64()),
              "v": pa.array(v, pa.int64())}).repartition(6)
    got = grouped_quantiles_cont(ds, "k", "v", [0, 25, 50, 90, 100]
                                 ).to_pandas()
    df = pd.DataFrame({"k": k, "v": v})
    for key, grp in df.groupby("k"):
        for p in (0, 25, 50, 90, 100):
            want = np.percentile(grp["v"].to_numpy(), p,
                                 method="linear") * 1000
            cell = got[(got["k"] == key) & (got["p"] == p)]["q_micro"]
            assert len(cell) == 1
            assert abs(cell.iloc[0] - want) < 1e-6, (key, p)


def test_grouped_quantiles_cont_single_value_group(ray_session):
    from bionext_ray.ops.relational import grouped_quantiles_cont
    ds = _ds({"k": pa.array([7], pa.int64()),
              "v": pa.array([42], pa.int64())})
    got = grouped_quantiles_cont(ds, "k", "v", [50, 100]).to_pandas()
    assert got["q_micro"].tolist() == [42_000, 42_000]


def test_grouped_centroids_split_invariance_and_negatives(ray_session):
    """Integer centroid contract: bit-identical across batch layouts,
    SQL trunc-division semantics on negative sums."""
    from bionext_ray.ops.simsearch import grouped_centroids
    rng = np.random.default_rng(61)
    vecs = rng.normal(0, 1, (90, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 90)
    t = pa.table({"label": pa.array(labels, pa.int64()),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs])})
    outs = []
    for parts in (1, 5):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = (grouped_centroids(ds, "label", "embedding").to_pandas()
               .sort_values(["label", "dim"]).reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    micro = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    for lab in range(3):
        m = micro[labels == lab]
        s, n = m.sum(axis=0), (labels == lab).sum()
        want = (np.abs(s) // n) * np.sign(s)
        got = outs[0][outs[0]["label"] == lab]["centroid_micro"].to_numpy()
        assert (got == want).all()


def test_funnel_counts_greedy_semantics(ray_session):
    """Earliest-first greedy: a later A must NOT re-anchor the funnel
    (u2: B before the first A -> step2 not reached even though a later
    A..B' would... no second B exists); ties (ts equal) are NOT after."""
    from bionext_ray.ops.relational import funnel_counts
    rows = [
        (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),     # completes
        (2, 15, "B"), (2, 20, "A"),                   # B before A: stop@A
        (3, 10, "A"), (3, 10, "B"),                   # tie: B not after A
        (4, 10, "A"), (4, 11, "B"),                   # A,B only
    ]
    ds = _ds({"u": pa.array([r[0] for r in rows], pa.int64()),
              "ts": pa.array([r[1] for r in rows], pa.int64()),
              "t": pa.array([r[2] for r in rows], pa.string())})
    got = (funnel_counts(ds, "u", "ts", "t", ["A", "B", "C"])
           .to_pandas().sort_values("step"))
    assert got["n_keys"].tolist() == [4, 2, 1]


def test_pivot_agg_matches_pandas(ray_session):
    from bionext_ray.ops.relational import pivot_agg
    rng = np.random.default_rng(67)
    k = rng.integers(0, 8, 200)
    c = rng.choice(list("xyz"), 200)
    v = rng.integers(-9, 9, 200)
    ds = _ds({"k": pa.array(k, pa.int64()), "c": pa.array(c, pa.string()),
              "v": pa.array(v, pa.int64())}).repartition(4)
    got = (pivot_agg(ds, "k", "c", "v", ["x", "y", "w"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = pd.DataFrame({"k": k, "c": c, "v": v})
    pv = df.pivot_table(index="k", columns="c", values="v",
                        aggfunc="sum", fill_value=0)
    for col in ("x", "y"):
        assert got[col].tolist() == pv[col].tolist()
    assert (got["w"] == 0).all()          # unseen category: all-zero col
    cnt = (pivot_agg(ds, "k", "c", "v", ["x"], fun="count")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert cnt["x"].tolist() == df[df["c"] == "x"].groupby(
        "k").size().reindex(sorted(set(k)), fill_value=0).tolist()


def test_cohort_retention_matches_pandas(ray_session):
    from bionext_ray.ops.relational import cohort_retention
    rng = np.random.default_rng(71)
    n = 400
    users = rng.integers(0, 25, n)
    ts = np.datetime64("2001-01-01", "us") + rng.integers(
        0, 40 * 86400, n).astype("timedelta64[s]").astype("timedelta64[us]")
    ds = _ds({"u": pa.array(users, pa.int64()),
              "ts": pa.array(ts)}).repartition(4)
    got = (cohort_retention(ds, "u", "ts", period_s=7 * 86400,
                            max_periods=3)
           .to_pandas().sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))
    df = pd.DataFrame({
        "u": users,
        "p": ts.astype("datetime64[s]").astype(np.int64) // (7 * 86400)})
    d = df.drop_duplicates()
    f = d.groupby("u")["p"].min().rename("c").reset_index()
    m = d.merge(f, on="u")
    m["off"] = m["p"] - m["c"]
    m = m[m["off"] <= 3]
    want = (m.groupby(["c", "off"]).size().rename("n_keys").reset_index()
            .rename(columns={"c": "cohort_period", "off": "period_offset"})
            .sort_values(["cohort_period", "period_offset"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_interval_join_matches_bruteforce(ray_session):
    """Overlap pairs vs O(n^2) brute force: spans shorter and longer than
    the tile, multi-tile overlaps (dedup via canonical tile), touching
    (non-overlapping) half-open boundaries, empty spans."""
    from bionext_ray.ops.relational import interval_join
    rng = np.random.default_rng(73)
    n = 120
    ls = rng.integers(0, 1000, n)
    le = ls + rng.integers(0, 90, n)          # includes empty spans
    rs = rng.integers(0, 1000, n)
    re_ = rs + rng.integers(1, 250, n)        # some spans >> tile
    left = _ds({"lid": pa.array(np.arange(n), pa.int64()),
                "ls": pa.array(ls, pa.int64()),
                "le": pa.array(le, pa.int64())}).repartition(3)
    right = _ds({"rid": pa.array(np.arange(n), pa.int64()),
                 "rs": pa.array(rs, pa.int64()),
                 "re": pa.array(re_, pa.int64())}).repartition(4)
    got = interval_join(left, right, ("ls", "le"), ("rs", "re"),
                        ["lid"], ["rid"], tile=64).to_pandas()
    want = {(i, j) for i in range(n) for j in range(n)
            if ls[i] < re_[j] and rs[j] < le[i] and le[i] > ls[i]
            and re_[j] > rs[j]}
    assert set(zip(got["lid"], got["rid"])) == want
    assert len(got) == len(want)              # canonical-tile dedup exact


def test_table_diff_classes_and_split_invariance(ray_session):
    from bionext_ray.ops.relational import table_diff
    old = _ds({"k": pa.array([1, 2, 3, 4], pa.int64()),
               "v": pa.array([10, 20, 30, 40], pa.int64()),
               "w": pa.array(["a", "b", "c", "d"], pa.string())})
    new = _ds({"k": pa.array([1, 2, 5], pa.int64()),
               "v": pa.array([10, 21, 50], pa.int64()),
               "w": pa.array(["a", "b", "e"], pa.string())})
    for parts in (1, 3):
        got = (table_diff(old.repartition(parts), new.repartition(parts),
                          ["k"], ["v", "w"])
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert dict(zip(got["k"], got["change"])) == {
            2: "changed", 3: "removed", 4: "removed", 5: "added"}


def test_gapfill_zeros_and_ranges(ray_session):
    from bionext_ray.ops.relational import gapfill_counts
    base = np.datetime64("2001-01-01", "us")
    day = np.timedelta64(86400, "s").astype("timedelta64[us]")
    rows = [(1, 0), (1, 0), (1, 3),       # user 1: days 0..3, gap 1-2
            (2, 5)]                       # user 2: single day
    ds = _ds({"u": pa.array([r[0] for r in rows], pa.int64()),
              "ts": pa.array([base + r[1] * day for r in rows])})
    got = (gapfill_counts(ds, "u", "ts", width_s=86400)
           .to_pandas().sort_values(["u", "bucket"]).reset_index(drop=True))
    u1 = got[got["u"] == 1]
    assert u1["n_events"].tolist() == [2, 0, 0, 1]
    assert (u1["bucket"].diff().dropna() == 1).all()
    u2 = got[got["u"] == 2]
    assert u2["n_events"].tolist() == [1]


def test_global_row_number_matches_duckdb(ray_session):
    """Dense ranks + NTILE vs DuckDB over random ints with ties, at
    several parallelism levels (offsets must compose across buckets)."""
    import duckdb
    from bionext_ray.ops.relational import global_row_number
    rng = np.random.default_rng(79)
    n = 500
    v = rng.integers(-40, 40, n)              # heavy ties
    ids = rng.permutation(n)
    df = pd.DataFrame({"i": ids, "v": v})
    want = duckdb.query("""
        SELECT i, CAST(ROW_NUMBER() OVER (ORDER BY v, i) AS BIGINT) rn,
               CAST(NTILE(6) OVER (ORDER BY v, i) AS BIGINT) tile
        FROM df ORDER BY i""").df()
    for parts in (1, 5):
        ds = _ds({"i": pa.array(ids, pa.int64()),
                  "v": pa.array(v, pa.int64())}).repartition(parts)
        got = (global_row_number(ds, "v", "i", ntile=6)
               .to_pandas().sort_values("i").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["i", "rn", "tile"]].astype("int64"),
            want.astype("int64"))


def test_table_diff_null_values_unchanged(ray_session):
    """A key whose value is NULL in BOTH snapshots is unchanged (SQL
    semantics), not 'changed' (NaN != NaN)."""
    from bionext_ray.ops.relational import table_diff
    old = _ds({"k": pa.array([1, 2], pa.int64()),
               "v": pa.array([None, 5], pa.int64())})
    new = _ds({"k": pa.array([1, 2], pa.int64()),
               "v": pa.array([None, 6], pa.int64())})
    got = table_diff(old, new, ["k"], ["v"]).to_pandas()
    assert dict(zip(got["k"], got["change"])) == {2: "changed"}


def test_grouped_centroids_string_keys(ray_session):
    """Per-language prototypes: string group keys must work."""
    from bionext_ray.ops.simsearch import grouped_centroids
    t = pa.table({
        "lang": pa.array(["en", "de", "en"], pa.string()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [3.0, 6.0]])})
    got = (grouped_centroids(ray.data.from_arrow(t), "lang", "embedding")
           .to_pandas().sort_values(["lang", "dim"]).reset_index(drop=True))
    assert got["lang"].tolist() == ["de", "de", "en", "en"]
    assert got["centroid_micro"].tolist() == [
        3_000_000, 4_000_000, 2_000_000, 4_000_000]


def test_rollup_cube_string_measure_grand_total(ray_session):
    """min/max over a STRING measure: the grand-total row must carry the
    level-1 schema's type instead of hard-casting to int64 (crash or
    corruption before the fix)."""
    from bionext_ray.ops.relational import cube_agg, rollup_agg
    ds = _ds({"a": pa.array(["x", "x", "y"], pa.string()),
              "b": pa.array(["p", "q", "p"], pa.string()),
              "s": pa.array(["mango", "apple", "pear"], pa.string())})
    for fn in (rollup_agg, cube_agg):
        got = fn(ds, ["a", "b"], [("s", "min", "lo"),
                                  ("s", "max", "hi")]).to_pandas()
        grand = got[(got["a"] == "*ALL*") & (got["b"] == "*ALL*")]
        assert len(grand) == 1
        assert grand["lo"].iloc[0] == "apple"
        assert grand["hi"].iloc[0] == "pear"


def test_global_row_number_empty_input_keeps_output_schema(ray_session):
    """Empty input must emit the SAME schema as non-empty output:
    id_col + keep columns + rn (+ tile when ntile is set)."""
    from bionext_ray.ops.relational import global_row_number
    empty = _ds({"i": pa.array([], pa.int64()),
                 "v": pa.array([], pa.int64()),
                 "tag": pa.array([], pa.string())})
    got = global_row_number(empty, "v", "i", keep=["tag"], ntile=4)
    sch = got.schema()
    assert sch.names == ["i", "tag", "rn", "tile"]
    assert got.count() == 0
    nonempty = _ds({"i": pa.array([1], pa.int64()),
                    "v": pa.array([2], pa.int64()),
                    "tag": pa.array(["t"], pa.string())})
    assert global_row_number(nonempty, "v", "i", keep=["tag"],
                             ntile=4).schema().names == sch.names


def test_latest_by_key_ties_and_payload(ray_session):
    import pyarrow as pa
    import ray.data
    from bionext_ray.ops.relational import latest_by_key
    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "ts": pa.array([5, 9, 9, 1, 1], pa.int64()),
        "fid": pa.array([1, 2, 7, 3, 4], pa.int64()),
        "payload": pa.array(list("vwxyz"), pa.string()),
    })
    # force multi-block input so block-local partials + exchange both run
    ds = ray.data.from_arrow(t).repartition(3)
    got = (latest_by_key(ds, ["k"], "ts", tiebreak=["fid"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    # a: ts tie at 9 -> fid 7 wins; b: ts tie at 1 -> fid 4 wins
    assert got[["k", "ts", "fid", "payload"]].values.tolist() == [
        ["a", 9, 7, "x"], ["b", 1, 4, "z"]]


def test_latest_by_key_composite_key(ray_session):
    import pyarrow as pa
    import ray.data
    from bionext_ray.ops.relational import latest_by_key
    t = pa.table({
        "k1": pa.array([1, 1, 2], pa.int64()),
        "k2": pa.array(["x", "x", "x"], pa.string()),
        "ts": pa.array([1, 2, 1], pa.int64()),
    })
    got = latest_by_key(ray.data.from_arrow(t), ["k1", "k2"],
                        "ts").to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [
        (1, "x", 2), (2, "x", 1)]


def test_event_transitions_matches_bruteforce(ray_session):
    """Randomized cross-check vs a plain-pandas bigram count, at two
    parallelism levels (the pair identity must not depend on block
    layout), with ts ties broken by event id."""
    from bionext_ray.ops.relational import event_transitions
    rng = np.random.default_rng(11)
    n = 600
    users = rng.integers(0, 25, n)
    ts = pd.to_datetime(rng.integers(0, 50, n), unit="s")  # heavy ties
    eid = np.arange(n)
    typ = rng.choice(["a", "b", "c", "d"], n)
    df = pd.DataFrame({"user_id": users, "event_id": eid,
                       "ts": ts, "event_type": typ})

    sdf = df.sort_values(["user_id", "ts", "event_id"])
    same = sdf["user_id"].to_numpy()[1:] == sdf["user_id"].to_numpy()[:-1]
    want = (pd.DataFrame({
                "prev_type": sdf["event_type"].to_numpy()[:-1][same],
                "next_type": sdf["event_type"].to_numpy()[1:][same]})
            .groupby(["prev_type", "next_type"]).size()
            .reset_index(name="n"))
    want = want.sort_values(["prev_type", "next_type"]).reset_index(drop=True)

    for parts in (1, 7):
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)).repartition(parts)
        got = (event_transitions(ds, "user_id", "ts", "event_type",
                                 order_cols=["event_id"])
               .to_pandas()
               .sort_values(["prev_type", "next_type"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"n": "int64"}), want.astype({"n": "int64"}))


def test_event_transitions_single_event_keys_emit_nothing(ray_session):
    from bionext_ray.ops.relational import event_transitions
    ds = _ds({"user_id": pa.array([1, 2, 3], pa.int64()),
              "event_id": pa.array([0, 1, 2], pa.int64()),
              "ts": pa.array(pd.to_datetime([0, 1, 2], unit="s")),
              "event_type": pa.array(["a", "b", "c"], pa.string())})
    got = event_transitions(ds, "user_id", "ts", "event_type",
                            order_cols=["event_id"]).to_pandas()
    assert len(got) == 0
