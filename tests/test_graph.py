"""Unit tests for graph analytics (ops/graph.py), composite-key shuffle
join, set operations, and CUBE — cross-checked against plain-Python/pandas
references on small graphs/tables."""

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _ds(d):
    return ray.data.from_arrow(pa.table(d))


def _edge_ds(raw):
    return _ds({"src": pa.array([u for u, _ in raw], pa.int64()),
                "dst": pa.array([v for _, v in raw], pa.int64())})


def test_shuffle_join_composite_key(ray_session):
    from bionext_ray.ops.relational import shuffle_join
    left = _ds({"a": pa.array([1, 1, 2, 2, 9], pa.int64()),
                "b": pa.array([7, 8, 7, 8, 9], pa.int64()),
                "lv": pa.array(list("vwxyz"), pa.string())})
    right = _ds({"x": pa.array([1, 2, 2, 3], pa.int64()),
                 "y": pa.array([8, 7, 9, 7], pa.int64()),
                 "rv": pa.array([100, 200, 201, 300], pa.int64())})
    got = shuffle_join(left, right, on=[("a", "x"), ("b", "y")],
                       left_cols=["lv"], right_cols=["rv"]).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    # matches: (1,8)->100, (2,7)->200
    assert got[["a", "b", "lv", "rv"]].values.tolist() == [
        [1, 8, "w", 100], [2, 7, "x", 200]]

    # same-name composite keys + left join
    right2 = _ds({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array([8, 7], pa.int64()),
                  "rv": pa.array([5, 6], pa.int64())})
    lg = shuffle_join(left, right2, on=["a", "b"], left_cols=["lv"],
                      right_cols=["rv"], how="left").to_pandas()
    assert len(lg) == 5
    assert lg["rv"].notna().sum() == 2


def _tri_brute(raw):
    und = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    return sum(1 for a, b, c in combinations(nodes, 3)
               if (a, b) in und and (a, c) in und and (b, c) in und)


def test_triangle_count_matches_bruteforce(ray_session):
    """Both the broadcast path (default gate) and the exchange path
    (gate forced to 0) must equal brute force."""
    from bionext_ray.ops.graph import triangle_count
    rng = np.random.default_rng(5)
    raw = [tuple(e) for e in rng.integers(0, 25, (160, 2)).tolist()]
    raw += [(0, 1), (1, 2), (2, 0)]            # guarantee one triangle
    want = _tri_brute(raw)
    got_bc = triangle_count(_edge_ds(raw)).to_pandas()["n_triangles"][0]
    got_ex = triangle_count(
        _edge_ds(raw),
        broadcast_edges_max=0).to_pandas()["n_triangles"][0]
    assert got_bc == got_ex == want


def test_triangle_count_noncompact_node_ids(ray_session):
    """Broadcast path compacts ids with np.unique; huge sparse node ids
    (beyond any bincount range pre-compaction) must still count right."""
    from bionext_ray.ops.graph import triangle_count
    big = 10**15
    raw = [(big, big + 7), (big + 7, big + 999), (big + 999, big),
           (big, big + 5)]
    got = triangle_count(_edge_ds(raw)).to_pandas()["n_triangles"][0]
    assert got == 1


def test_triangle_count_no_triangles(ray_session):
    from bionext_ray.ops.graph import triangle_count
    raw = [(0, 1), (1, 2), (2, 3)]             # path graph
    got = triangle_count(_edge_ds(raw)).to_pandas()["n_triangles"][0]
    assert got == 0


def test_degree_distribution(ray_session):
    from bionext_ray.ops.graph import degree_distribution
    raw = [(0, 1), (0, 2), (0, 2), (1, 2), (3, 0)]   # deg: 0->2,1->1,3->1
    got = degree_distribution(_edge_ds(raw)).to_pandas()
    assert dict(zip(got["deg"], got["n_nodes"])) == {2: 1, 1: 2}


def test_set_ops(ray_session):
    from bionext_ray.ops.relational import set_op
    left = _ds({"k": pa.array([1, 1, 2, 3, 4], pa.int64())})
    right = _ds({"k": pa.array([2, 2, 4, 5], pa.int64())})
    inter = sorted(set_op(left, right, ["k"], "intersect")
                   .to_pandas()["k"])
    assert inter == [2, 4]
    exc = sorted(set_op(left, right, ["k"], "except").to_pandas()["k"])
    assert exc == [1, 3]
    uni = sorted(set_op(left, right, ["k"], "union").to_pandas()["k"])
    assert uni == [1, 2, 3, 4, 5]


def test_set_op_multicolumn(ray_session):
    from bionext_ray.ops.relational import set_op
    left = _ds({"a": pa.array(["x", "x", "y"], pa.string()),
                "b": pa.array([1, 2, 1], pa.int64())})
    right = _ds({"a": pa.array(["x"], pa.string()),
                 "b": pa.array([2], pa.int64())})
    exc = (set_op(left, right, ["a", "b"], "except").to_pandas()
           .sort_values(["a", "b"]).values.tolist())
    assert exc == [["x", 1], ["y", 1]]


def test_cube_matches_pandas(ray_session):
    from bionext_ray.ops.relational import cube_agg
    rng = np.random.default_rng(3)
    a = rng.choice(list("xy"), 120)
    b = rng.choice(list("pq"), 120)
    v = rng.integers(0, 50, 120)
    got = (cube_agg(_ds({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "v": pa.array(v, pa.int64())}),
                    ["a", "b"], [("v", "sum", "sv"), ("v", "count", "nv")])
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    df = pd.DataFrame({"a": a, "b": b, "v": v})
    parts = []
    for subset in [["a", "b"], ["a"], ["b"], []]:
        if subset:
            p = df.groupby(subset).agg(sv=("v", "sum"),
                                       nv=("v", "count")).reset_index()
        else:
            p = pd.DataFrame({"sv": [v.sum()], "nv": [120]})
        for k in ("a", "b"):
            if k not in subset:
                p[k] = "*ALL*"
        parts.append(p[["a", "b", "sv", "nv"]])
    want = (pd.concat(parts, ignore_index=True)
            .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"sv": "int64", "nv": "int64"}),
                                  want.astype({"sv": "int64",
                                               "nv": "int64"}))


def _bfs_brute(edges, seeds, max_hops):
    from collections import deque
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def test_bfs_hops_matches_bruteforce(ray_session):
    from bionext_ray.ops.graph import bfs_hops
    rng = np.random.default_rng(23)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    seeds = [0, 7, 13]
    got = bfs_hops(
        _ds({"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}).repartition(5),
        _ds({"v": pa.array(seeds, pa.int64())}),
        max_hops=3).to_pandas()
    want = _bfs_brute(zip(src.tolist(), dst.tolist()), seeds, 3)
    assert dict(zip(got["node"], got["dist"])) == want


def test_bfs_hops_exchange_path_matches_broadcast(ray_session):
    """broadcast_nodes_max=0 forces the all-exchange dataflow path; both
    paths must emit the identical (node, dist) set."""
    from bionext_ray.ops.graph import bfs_hops
    rng = np.random.default_rng(29)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    e = _ds({"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}).repartition(4)
    s = _ds({"v": pa.array([1, 2], pa.int64())})
    a = bfs_hops(e, s, max_hops=2).to_pandas()
    b = bfs_hops(e, s, max_hops=2, broadcast_nodes_max=0).to_pandas()
    assert (dict(zip(a["node"], a["dist"]))
            == dict(zip(b["node"], b["dist"])))


def test_bfs_hops_isolated_seed_and_empty_frontier(ray_session):
    """A seed with no out-edges still appears at dist 0; BFS terminates
    early when the frontier drains before max_hops."""
    from bionext_ray.ops.graph import bfs_hops
    e = _ds({"src": pa.array([1], pa.int64()),
             "dst": pa.array([2], pa.int64())})
    s = _ds({"v": pa.array([1, 99], pa.int64())})
    got = bfs_hops(e, s, max_hops=5).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == {1: 0, 99: 0, 2: 1}


def test_adjacency_list_matches_pandas(ray_session):
    from bionext_ray.ops.graph import adjacency_list
    rng = np.random.default_rng(47)
    src = rng.integers(0, 20, 300)
    dst = rng.integers(0, 20, 300)
    got = (adjacency_list(
        _ds({"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}).repartition(5))
        .to_pandas().sort_values("node").reset_index(drop=True))
    df = (pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
          .sort_values(["src", "dst"]))
    want = df.groupby("src")["dst"].agg(
        out_deg="size", neighbors=lambda s: ",".join(map(str, s))
    ).reset_index().rename(columns={"src": "node"})
    pd.testing.assert_frame_equal(
        got, want[["node", "out_deg", "neighbors"]],
        check_dtype=False)


def test_adjacency_list_string_nodes(ray_session):
    """Canonical-triples shape: string entity ids."""
    from bionext_ray.ops.graph import adjacency_list
    e = _ds({"s": pa.array(["e1", "e1", "e2", "e1"]),
             "o": pa.array(["b", "a", "c", "a"])})
    got = (adjacency_list(e, src="s", dst="o")
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == ["e1", "e2"]
    assert got["neighbors"].tolist() == ["a,b", "c"]
    assert got["out_deg"].tolist() == [2, 1]


def _hits_ref(raw, iters=2, S=1_000_000):
    """Plain-Python HITS reference mirroring the documented integer
    recurrence."""
    edges = sorted(set(raw))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: S for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        raw_a = {v: 0 for v in nodes}
        for u, v in edges:
            raw_a[v] += hub[u]
        m = max(max(raw_a.values()), 1)
        auth = {v: raw_a[v] * S // m for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for u, v in edges:
            raw_h[u] += auth[v]
        m = max(max(raw_h.values()), 1)
        hub = {v: raw_h[v] * S // m for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}


def test_hits_matches_reference_and_paths_agree(ray_session):
    from bionext_ray.ops.graph import hits
    rng = np.random.default_rng(11)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 30, (150, 2))
           if a != b]
    want = _hits_ref(raw)

    bc = hits(_edge_ds(raw), iters=2).to_pandas() \
        .set_index("node").sort_index()
    ex = hits(_edge_ds(raw), iters=2, broadcast_nodes_max=0).to_pandas() \
        .set_index("node").sort_index()
    for got in (bc, ex):
        assert len(got) == len(want)
        for v, (h, a) in want.items():
            assert got.loc[v, "hub"] == h, v
            assert got.loc[v, "auth"] == a, v


def test_hits_sink_and_source_nodes(ray_session):
    from bionext_ray.ops.graph import hits
    # 1 -> 2 -> 3: node 1 is pure source (auth 0), 3 pure sink (hub 0)
    got = hits(_edge_ds([(1, 2), (2, 3)]), iters=2).to_pandas() \
        .set_index("node").sort_index()
    assert got.loc[1, "auth"] == 0
    assert got.loc[3, "hub"] == 0
    want = _hits_ref([(1, 2), (2, 3)])
    assert [tuple(r) for r in got[["hub", "auth"]].values] == \
        [want[1], want[2], want[3]]


def test_hits_empty_graph(ray_session):
    from bionext_ray.ops.graph import hits
    got = hits(_edge_ds([]), iters=2).to_pandas()
    # Ray drops the Arrow schema of an all-empty dataset at to_pandas;
    # the contract here is "no crash, zero rows"
    assert len(got) == 0


def test_cocitation_matches_bruteforce(ray_session):
    from bionext_ray.ops.graph import cocitation
    rng = np.random.default_rng(5)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 12, (80, 2))]
    edges = sorted(set(raw))
    want = {}
    by_src = {}
    for s, d in edges:
        by_src.setdefault(s, set()).add(d)
    for s, ds_ in by_src.items():
        for a, b in combinations(sorted(ds_), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = cocitation(_edge_ds(raw).repartition(3)).to_pandas()
    got_map = {(r.host_a, r.host_b): r.n_common
               for r in got.itertuples(index=False)}
    assert got_map == want


def test_cocitation_degree_cap_and_min_count(ray_session):
    from bionext_ray.ops.graph import cocitation
    # src 1 links to 4 targets (capped out at max_out_degree=3);
    # srcs 2 and 3 both link to {7, 8}
    raw = [(1, 4), (1, 5), (1, 6), (1, 7),
           (2, 7), (2, 8), (3, 7), (3, 8)]
    got = cocitation(_edge_ds(raw), max_out_degree=3).to_pandas()
    assert {(r.host_a, r.host_b): r.n_common
            for r in got.itertuples(index=False)} == {(7, 8): 2}
    got2 = cocitation(_edge_ds(raw), min_count=2).to_pandas()
    assert {(r.host_a, r.host_b): r.n_common
            for r in got2.itertuples(index=False)} == {(7, 8): 2}


def test_rollup_cube_grand_total_on_empty_input(ray_session):
    """A provably-empty input (zero blocks after a drop-everything filter)
    must still emit SQL's grand-total grouping-set row, not crash."""
    import pyarrow.compute as pc
    from bionext_ray.ops.relational import cube_agg, rollup_agg
    ds = _ds({"a": pa.array(["x"], pa.string()),
              "v": pa.array([1], pa.int64())})
    empty = ds.map_batches(
        lambda b: b.filter(pc.equal(b["v"], -1)), batch_format="pyarrow")
    r = rollup_agg(empty, ["a"], [("v", "sum", "sv")]).to_pandas()
    assert len(r) == 1 and r["sv"].isna().all()
    c = cube_agg(empty, ["a"], [("v", "sum", "sv")]).to_pandas()
    assert len(c) == 1 and c["sv"].isna().all()


def _wpr_ref(raw, iters=3, S=1_000_000_000, d=85):
    from collections import Counter
    w = Counter(raw)
    edges = sorted(w)
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    W = {}
    for (u, v), k in w.items():
        W[u] = W.get(u, 0) + k
    base = S // len(nodes)
    pr = {v: base for v in nodes}
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for (u, v), k in w.items():
            c[v] += pr[u] * k // W[u]
        pr = {v: ((100 - d) * base) // 100 + (d * c[v]) // 100
              for v in nodes}
    return pr


def test_pagerank_weighted_matches_reference_both_paths(ray_session):
    from bionext_ray.ops.graph import pagerank_weighted
    rng = np.random.default_rng(17)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 20, (120, 2))]
    want = _wpr_ref(raw)
    for kw in ({}, {"broadcast_nodes_max": 0}):
        got = pagerank_weighted(_edge_ds(raw).repartition(3),
                                iters=3, **kw).to_pandas() \
            .set_index("node").sort_index()
        assert len(got) == len(want)
        for v, p in want.items():
            assert got.loc[v, "pr_scaled"] == p, (kw, v)


def test_pagerank_weighted_all_ones_equals_unweighted(ray_session):
    from bionext_ray.ops.graph import pagerank, pagerank_weighted
    rng = np.random.default_rng(19)
    raw = sorted({(int(a), int(b))
                  for a, b in rng.integers(0, 15, (60, 2))})
    uw = pagerank(_edge_ds(raw), iters=3).to_pandas() \
        .set_index("node").sort_index()
    w = pagerank_weighted(_edge_ds(raw), iters=3).to_pandas() \
        .set_index("node").sort_index()
    assert (uw["pr_scaled"] == w["pr_scaled"]).all()


def test_weighted_edges_explicit_weight_col(ray_session):
    from bionext_ray.ops.graph import weighted_edges
    ds = _ds({"src": pa.array([1, 1, 2], pa.int64()),
              "dst": pa.array([5, 5, 6], pa.int64()),
              "n": pa.array([3, 4, 10], pa.int64())})
    got = weighted_edges(ds, weight_col="n").to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [
        (1, 5, 7), (2, 6, 10)]


def test_weighted_edges_rejects_nonpositive_weights(ray_session):
    import pytest
    from bionext_ray.ops.graph import weighted_edges
    ds = _ds({"src": pa.array([1], pa.int64()),
              "dst": pa.array([2], pa.int64()),
              "n": pa.array([0], pa.int64())})
    with pytest.raises(Exception):       # surfaces via Ray task error
        weighted_edges(ds, weight_col="n").to_pandas()


def test_pagerank_empty_graph(ray_session):
    from bionext_ray.ops.graph import pagerank, pagerank_weighted
    assert len(pagerank(_edge_ds([]), iters=2).to_pandas()) == 0
    assert len(pagerank_weighted(_edge_ds([]), iters=2).to_pandas()) == 0


# -------------------------------------------------- mention_cooccurrence
def test_mention_cooccurrence_matches_reference(ray_session):
    """Hand-built nested tagged dataset vs an inline replay of the PMI
    contract, at two block layouts."""
    import math

    from bionext_ray.ops.graph import mention_cooccurrence

    def doc(did, pairs):
        return {"doc_id": did,
                "mentions": [{"label": l, "text": t} for l, t in pairs]}

    rows = [
        doc("d0", [("Gene", "BRCA1"), ("Disease", "cancer"),
                   ("Gene", "brca1")]),       # case-folds to one key
        doc("d1", [("Gene", "BRCA1"), ("Disease", "cancer")]),
        doc("d2", [("Disease", "cancer")]),   # single key -> no pairs
        doc("d3", []),                        # mention-free, counts in N
        doc("d4", [("Gene", "BRCA1"), ("Chemical", "aspirin"),
                   ("Disease", "cancer")]),
    ]
    n_total = len(rows)
    keysets = [sorted({f"{m['label']}:{m['text'].lower()}"
                       for m in r["mentions"]}) for r in rows]
    df = {}
    for ks in keysets:
        for k in ks:
            df[k] = df.get(k, 0) + 1
    pair_c = {}
    for ks in keysets:
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                pair_c[(ks[i], ks[j])] = pair_c.get((ks[i], ks[j]), 0) + 1
    want = sorted(
        (a, b, c,
         math.floor(1_000_000 * (((math.log(c) + math.log(n_total))
                                  - math.log(df[a])) - math.log(df[b]))))
        for (a, b), c in pair_c.items())

    for parts in (1, 3):
        ds = ray.data.from_items(rows).repartition(parts)
        got = sorted(map(tuple,
                         mention_cooccurrence(ds).to_pandas()
                         .to_numpy().tolist()))
        assert got == want, parts


def test_mention_cooccurrence_empty_corpus(ray_session):
    from bionext_ray.ops.graph import mention_cooccurrence
    ds = ray.data.from_items([{"doc_id": "d0", "mentions": []}])
    got = mention_cooccurrence(ds).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["key_a", "key_b", "n_docs", "pmi_micro"]


def _jaccard_ref(raw):
    by_src = {}
    for s, d in set(raw):
        by_src.setdefault(s, set()).add(d)
    want = {}
    for a, b in combinations(sorted(by_src), 2):
        inter = len(by_src[a] & by_src[b])
        if inter:
            want[(a, b)] = (inter,
                            1_000_000 * inter // len(by_src[a] | by_src[b]))
    return want


def test_neighbor_jaccard_matches_bruteforce(ray_session):
    from bionext_ray.ops.graph import neighbor_jaccard
    rng = np.random.default_rng(11)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 15, (120, 2))]
    want = _jaccard_ref(raw)
    for nblocks in (1, 3):
        got = neighbor_jaccard(_edge_ds(raw).repartition(nblocks)) \
            .to_pandas()
        got_map = {(r.node_a, r.node_b): (r.n_common, r.jaccard_ppm)
                   for r in got.itertuples(index=False)}
        assert got_map == want
    # exchange (shuffle_join) degree path must agree with broadcast
    got2 = neighbor_jaccard(_edge_ds(raw).repartition(3),
                            broadcast_nodes_max=0).to_pandas()
    assert {(r.node_a, r.node_b): (r.n_common, r.jaccard_ppm)
            for r in got2.itertuples(index=False)} == want


def test_neighbor_jaccard_cap_and_min_common(ray_session):
    from bionext_ray.ops.graph import neighbor_jaccard
    # target 9 has in-degree 4 (dropped at cap 3); srcs 1,2 share {7, 8}
    raw = [(1, 7), (1, 8), (2, 7), (2, 8),
           (1, 9), (2, 9), (3, 9), (4, 9)]
    got = neighbor_jaccard(_edge_ds(raw), max_in_degree=3).to_pandas()
    # with 9 dropped as a pair generator, only (1,2) shares targets;
    # degrees still count the FULL neighbor sets ({7,8,9} each)
    assert {(r.node_a, r.node_b): (r.n_common, r.jaccard_ppm)
            for r in got.itertuples(index=False)} == {(1, 2): (2, 500000)}
    # no cap: 1 and 2 share all of {7,8,9} -> Jaccard 1.0
    got2 = neighbor_jaccard(_edge_ds(raw), min_common=3).to_pandas()
    assert {(r.node_a, r.node_b): (r.n_common, r.jaccard_ppm)
            for r in got2.itertuples(index=False)} == {(1, 2): (3, 1000000)}
    assert len(neighbor_jaccard(_edge_ds(raw),
                                min_common=4).to_pandas()) == 0


def _kcore_ref(raw, k):
    edges = {(u, v) for u, v in set(raw) if u != v}
    edges |= {(v, u) for u, v in edges}
    while True:
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        bad = {u for u, d in deg.items() if d < k}
        if not bad:
            return deg
        edges = {(u, v) for u, v in edges if u not in bad and v not in bad}


def test_kcore_matches_bruteforce(ray_session):
    from bionext_ray.ops.graph import kcore
    rng = np.random.default_rng(7)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 20, (90, 2))]
    for k in (2, 4):
        want = _kcore_ref(raw, k)
        for nblocks in (1, 3):
            got = kcore(_edge_ds(raw).repartition(nblocks), k=k).to_pandas()
            assert {r.node: r.deg
                    for r in got.itertuples(index=False)} == want
            assert len(got) == 0 or got["deg"].min() >= k
        got2 = kcore(_edge_ds(raw).repartition(3), k=k,
                     broadcast_nodes_max=0).to_pandas()
        assert {r.node: r.deg for r in got2.itertuples(index=False)} == want


def test_kcore_cascade_and_empty_core(ray_session):
    from bionext_ray.ops.graph import kcore
    # path 1-2-3-4 plus a 4-clique {5,6,7,8}: 2-core = the clique only,
    # found after a multi-round peel of the path (ends fall, then middle)
    raw = [(1, 2), (2, 3), (3, 4)] + \
        [(a, b) for a, b in combinations([5, 6, 7, 8], 2)]
    got = kcore(_edge_ds(raw), k=2).to_pandas()
    assert {r.node: r.deg for r in got.itertuples(index=False)} == \
        {5: 3, 6: 3, 7: 3, 8: 3}
    # k above every degree: whole graph peels away -> empty core
    got2 = kcore(_edge_ds(raw), k=4).to_pandas()
    assert len(got2) == 0


def test_kcore_round_cap_fails_loud(ray_session):
    import pytest

    from bionext_ray.ops.graph import kcore
    # peeling a 5-path at k=2 needs 2 rounds; cap at 1 must raise,
    # never silently return a non-core
    raw = [(1, 2), (2, 3), (3, 4), (4, 5)]
    with pytest.raises(RuntimeError, match="not converged"):
        kcore(_edge_ds(raw), k=2, max_rounds=1)


def _lcc_ref(raw):
    edges = {(min(u, v), max(u, v)) for u, v in set(raw) if u != v}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(len(adj[x] & nb) for x in nb) // 2
        want[v] = (d, tri, 1_000_000 * 2 * tri // (d * (d - 1)))
    return want


def test_clustering_coeff_matches_bruteforce(ray_session):
    from bionext_ray.ops.graph import clustering_coeff
    rng = np.random.default_rng(3)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 18, (100, 2))]
    want = _lcc_ref(raw)
    for nblocks in (1, 3):
        got = clustering_coeff(_edge_ds(raw).repartition(nblocks)) \
            .to_pandas()
        assert {r.node: (r.deg, r.n_tri, r.lcc_ppm)
                for r in got.itertuples(index=False)} == want
    # exchange paths (degree attach via shuffle_join, closing via
    # composite-key join) must agree with the broadcast paths
    got2 = clustering_coeff(_edge_ds(raw).repartition(3),
                            broadcast_nodes_max=0,
                            broadcast_edges_max=0).to_pandas()
    assert {r.node: (r.deg, r.n_tri, r.lcc_ppm)
            for r in got2.itertuples(index=False)} == want


def test_clustering_coeff_shapes(ray_session):
    from bionext_ray.ops.graph import clustering_coeff
    # triangle + pendant: 1,2,3 close a triangle (lcc 1.0); node 4 hangs
    # off 3 (deg(3)=3, 1 triangle -> ppm 333333); deg-1 node 4 excluded;
    # duplicate/reversed/self edges collapse
    raw = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 4), (2, 1)]
    got = clustering_coeff(_edge_ds(raw)).to_pandas()
    assert {r.node: (r.deg, r.n_tri, r.lcc_ppm)
            for r in got.itertuples(index=False)} == \
        {1: (2, 1, 1_000_000), 2: (2, 1, 1_000_000), 3: (3, 1, 333_333)}
    # triangle-free star: centre has deg 3, 0 triangles, lcc 0
    star = [(9, 1), (9, 2), (9, 3)]
    got2 = clustering_coeff(_edge_ds(star)).to_pandas()
    assert {r.node: (r.deg, r.n_tri, r.lcc_ppm)
            for r in got2.itertuples(index=False)} == {9: (3, 0, 0)}


def test_clustering_coeff_empty(ray_session):
    import ray.data

    from bionext_ray.ops.graph import clustering_coeff
    ds = ray.data.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                       "dst": pa.array([], pa.int64())}))
    assert clustering_coeff(ds).count() == 0


def _lpa_ref(raw, rounds):
    edges = {(u, v) for u, v in set(raw) if u != v}
    edges |= {(v, u) for u, v in edges}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    lbl = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, nb in adj.items():
            counts = {}
            for x in nb:
                counts[lbl[x]] = counts.get(lbl[x], 0) + 1
            new[v] = min(counts, key=lambda c: (-counts[c], c))
        lbl = new
    return lbl


def test_label_propagation_matches_bruteforce(ray_session):
    from bionext_ray.ops.graph import label_propagation
    rng = np.random.default_rng(5)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 25, (80, 2))]
    for rounds in (1, 3):
        want = _lpa_ref(raw, rounds)
        for nblocks in (1, 3):
            got = label_propagation(_edge_ds(raw).repartition(nblocks),
                                    rounds=rounds).to_pandas()
            assert {r.node: r.label
                    for r in got.itertuples(index=False)} == want
    # exchange label-attach path must agree with the broadcast path
    got2 = label_propagation(_edge_ds(raw).repartition(3), rounds=3,
                             broadcast_edges_max=0).to_pandas()
    assert {r.node: r.label
            for r in got2.itertuples(index=False)} == _lpa_ref(raw, 3)


def test_label_propagation_two_cliques(ray_session):
    from bionext_ray.ops.graph import label_propagation
    # two 3-cliques joined by one bridge edge. Deterministic synchronous
    # min-tie-break semantics (pinned against the reference): the left
    # clique converges to label 1; on the right, bridge node 7 adopts 3
    # in round 1 (tie {8, 9, 3} -> min), so 8 and 9 see {3, 7} ties in
    # round 2 and take 3 while 7 itself swings back to 7 — bridge-label
    # leakage is EXPECTED under min-tie-break LPA, exactly what the
    # unrolled SQL oracle reproduces.
    raw = [(1, 2), (2, 3), (3, 1), (7, 8), (8, 9), (9, 7), (3, 7)]
    want = _lpa_ref(raw, 2)
    got = label_propagation(_edge_ds(raw), rounds=2).to_pandas()
    lbl = {r.node: r.label for r in got.itertuples(index=False)}
    assert lbl == want
    assert lbl[1] == lbl[2] == lbl[3] == 1   # left clique converged
    assert lbl[8] == lbl[9] == 3 and lbl[7] == 7
