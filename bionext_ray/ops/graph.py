"""Distributed graph analytics over an edge table.

The north rule ends in "graph materialization" (BASELINE.json): triples
become partitioned adjacency tables. These operators answer the questions a
user asks of that graph — degree distributions and PageRank centrality —
composed from this repo's own distributed primitives (shuffle_join,
partial_final_agg), so every exchange is an already-audited pattern:

- all arithmetic is INTEGER (ranks scaled by 1e9, floor division at every
  step), so results are bit-reproducible at any parallelism and an ANSI-SQL
  oracle can mirror them exactly;
- each PageRank iteration is three bucketed exchanges (rank x degree join,
  edge x rate join, contribution aggregate) — the same shape a vertex-
  centric engine (Pregel) runs, expressed as Ray Data dataflow;
- dangling nodes (no out-edges) keep base rank only; their lost mass is NOT
  redistributed (documented choice, mirrored in the oracle).

Companion to ops/dedup.py::connected_components (min-label propagation),
which covers the component-labelling side of graph analytics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000_000


def distinct_edges(edges_ds, src: str = "src", dst: str = "dst",
                   shuffle_partitions: int | None = None):
    """Distinct (src, dst) pairs — the exact-dedup pattern for a
    HIGH-CARDINALITY composite key: block-local distinct in the map side,
    then ONE hash-bucketed exchange with a vectorized pandas
    drop_duplicates per bucket. (A partial+final groupby is wrong here:
    with ~|E| distinct keys the 'partials' are input-sized and a key-sorted
    aggregate over them is the slow path — measured 100s vs 3s on a 600k-row
    edge table.)"""
    from bionext_ray.ops.relational import coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)

    def one(b: pa.Table) -> pa.Table:
        t = pa.table({
            src: pa.compute.cast(b[src], pa.int64()),
            dst: pa.compute.cast(b[dst], pa.int64()),
        }).group_by([src, dst]).aggregate([])      # block-local distinct
        s = t[src].to_numpy(zero_copy_only=False)
        d = t[dst].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            mix = s * np.int64(1000003) + d        # wraparound hash is fine
        return t.append_column(
            "__bucket", pa.array(np.abs(mix) % P, pa.int64()))

    def bucket_distinct(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates([src, dst])
        return pa.Table.from_pandas(df[[src, dst]], preserve_index=False)

    tagged = edges_ds.map_batches(one, batch_format="pyarrow")
    return (coalesce_for_exchange(tagged, P)
            .groupby("__bucket")
            .map_groups(bucket_distinct, batch_format="pyarrow"))


def node_table(edges_ds, src: str = "src", dst: str = "dst",
               shuffle_partitions: int | None = None):
    """Distinct nodes appearing as src or dst (per-block unique reduction,
    one grouped pass). Output column: v."""
    from bionext_ray.ops.relational import bucketed_agg

    def verts(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b[src].to_numpy(zero_copy_only=False).astype(np.int64),
            b[dst].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"v": pa.array(u, pa.int64()),
                         "_c": pa.array(np.ones(len(u), np.int64))})

    # node ids are ~|V|-cardinality: bucketed_agg, never a key-sorted
    # global aggregate
    agg = bucketed_agg(edges_ds.map_batches(verts, batch_format="pyarrow"),
                       ["v"], [("_c", "sum", "_c")],
                       shuffle_partitions=shuffle_partitions)
    return agg.select_columns(["v"])


def out_degrees(edges_ds, src: str = "src",
                shuffle_partitions: int | None = None):
    """Out-degree per source node (high-cardinality bucketed count).
    Output: v, deg."""
    from bionext_ray.ops.relational import bucketed_agg

    def one(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": pa.compute.cast(b[src], pa.int64()),
            "_c": pa.array(np.ones(b.num_rows, dtype=np.int64), pa.int64()),
        })

    return bucketed_agg(edges_ds.map_batches(one, batch_format="pyarrow"),
                        ["v"], [("_c", "sum", "deg")],
                        shuffle_partitions=shuffle_partitions)


def degree_distribution(edges_ds, src: str = "src", dst: str = "dst",
                        shuffle_partitions: int | None = None):
    """Out-degree histogram of the distinct-edge graph: (deg, n_nodes).

    Two partial+final aggregates (node-keyed count, then degree-keyed
    count) — the second input is one row per node with out-edges, already
    tiny relative to the edge table, so the whole query is edge-scan bound.
    """
    from bionext_ray.ops.relational import partial_final_agg

    deg = out_degrees(distinct_edges(edges_ds, src, dst,
                                     shuffle_partitions=shuffle_partitions),
                      shuffle_partitions=shuffle_partitions)

    def one(b: pa.Table) -> pa.Table:
        return pa.table({"deg": b["deg"],
                         "_c": pa.array(np.ones(b.num_rows, np.int64))})

    return partial_final_agg(deg.map_batches(one, batch_format="pyarrow"),
                             ["deg"], [("_c", "sum", "n_nodes")],
                             shuffle_partitions=shuffle_partitions)


def _triangle_count_broadcast(und):
    """Broadcast triangle count: the whole DISTINCT undirected edge list
    fits comfortably in driver + worker memory (gated by caller), so the
    degree/orientation prep runs as local numpy and ONLY the wedge
    enumeration — the superlinear part, sum_a C(outdeg(a), 2) — fans out
    over Ray tasks against a broadcast CSR.

    Per task: two grouped-arange expansions enumerate the slice's wedge
    (x, y) pairs fully vectorized (no sqrt, no per-apex Python), then one
    searchsorted membership test against the sorted composite closing-key
    array. Apex slices are cut on the CUMULATIVE wedge count, so tasks are
    wedge-balanced even though oriented out-degrees vary."""
    import ray
    import ray.data

    tabs = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return ray.data.from_arrow(pa.table(
            {"n_triangles": pa.array([0], pa.int64())}))
    t = pa.concat_tables(tabs)
    u = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    n = np.int64(len(nodes))
    ui, vi = inv[:len(u)], inv[len(u):]
    deg = (np.bincount(ui, minlength=n) + np.bincount(vi, minlength=n))
    # total (deg, id) order over COMPACTED ids: rank = deg*n + id, unique
    rank = deg.astype(np.int64) * n + np.arange(n, dtype=np.int64)
    ru, rv = rank[ui], rank[vi]
    fwd = ru < rv
    a = np.where(fwd, ui, vi)
    b = np.where(fwd, vi, ui)
    # CSR grouped by apex a, neighbours stored in ascending RANK order so
    # within-list pairs (i < j) are already closing-edge oriented
    order = np.lexsort((rank[b], a))
    a_s, b_s = a[order], b[order]
    offsets = np.searchsorted(a_s, np.arange(n + 1))
    ekeys = np.sort(a * n + b)           # sorted composite edge keys
    outdeg = np.diff(offsets).astype(np.int64)
    wedge_per_apex = outdeg * (outdeg - 1) // 2
    cum = np.concatenate([[0], np.cumsum(wedge_per_apex)])
    total_w = int(cum[-1])
    if total_w == 0:
        return ray.data.from_arrow(pa.table(
            {"n_triangles": pa.array([0], pa.int64())}))
    # ~1M wedges per SLICE so per-slice temporaries stay bounded (the
    # count_slice loop walks its batch's slices one at a time) — the
    # slice count tracks the wedge total, never capped; only the TASK
    # count (repartition below) is capped at 4x CPUs for scheduling
    n_slices = total_w // 1_000_000 + 1
    bounds = np.unique(np.searchsorted(
        cum, np.linspace(0, total_w, n_slices + 1)))
    n_tasks = max(1, min(4 * int(ray.cluster_resources().get("CPU", 8)),
                         len(bounds) - 1))
    csr_ref = ray.put((b_s, offsets, ekeys, int(n)))

    def count_slice(batch: pa.Table) -> pa.Table:
        b_s, offsets, ekeys, n = ray.get(csr_ref)
        n = np.int64(n)
        total = 0
        for lo, hi in zip(batch["lo"].to_numpy(), batch["hi"].to_numpy()):
            d = (offsets[lo + 1:hi + 1] - offsets[lo:hi]).astype(np.int64)
            # level 1: (apex, j) rows for j in 1..d-1
            c1 = np.maximum(d - 1, 0)
            apex1 = np.repeat(np.arange(lo, hi, dtype=np.int64), c1)
            starts1 = np.repeat(np.cumsum(c1) - c1, c1)
            jj = np.arange(int(c1.sum()), dtype=np.int64) - starts1 + 1
            if not len(jj):
                continue
            # level 2: each (apex, j) row expands to i in 0..j-1
            apex2 = np.repeat(apex1, jj)
            j2 = np.repeat(jj, jj)
            starts2 = np.repeat(np.cumsum(jj) - jj, jj)
            i2 = np.arange(int(jj.sum()), dtype=np.int64) - starts2
            base = offsets[apex2]
            x = b_s[base + i2]
            y = b_s[base + j2]
            key = x * n + y
            pos = np.searchsorted(ekeys, key)
            pos = np.minimum(pos, len(ekeys) - 1)
            total += int((ekeys[pos] == key).sum())
        return pa.table({"n": pa.array([total], pa.int64())})

    slices = ray.data.from_arrow(pa.table({
        "lo": pa.array(bounds[:-1], pa.int64()),
        "hi": pa.array(bounds[1:], pa.int64())}))
    parts = slices.repartition(n_tasks).map_batches(
        count_slice, batch_format="pyarrow")
    total = sum(r["n"] for r in parts.take_all())
    return ray.data.from_arrow(pa.table(
        {"n_triangles": pa.array([total], pa.int64())}))


def triangle_count(edges_ds, src: str = "src", dst: str = "dst",
                   shuffle_partitions: int | None = None,
                   broadcast_edges_max: int = 4_000_000):
    """Count triangles in the UNDIRECTED simple graph induced by the edge
    table (direction dropped, self-loops removed, duplicates collapsed).
    Returns a one-row (n_triangles) table.

    Two paths, gated like ``pagerank``'s broadcast/exchange dual:

    - **broadcast** (distinct edges <= ``broadcast_edges_max``, ~64 MB at
      the default): local numpy degree/orientation prep, then the wedge
      enumeration — the only superlinear stage — fans out over
      wedge-balanced Ray tasks against a broadcast CSR + sorted edge-key
      array. No join exchanges at all.
    - **exchange** (the 100-TB path): orient every undirected edge from
      its lower-(degree, id) endpoint to the higher one, self-join the
      oriented edges on source to enumerate wedges, pre-aggregate
      duplicate wedges in-task to (wx, wy, cnt), then close with a
      COMPOSITE-key shuffle_join against the oriented edge set and sum
      the surviving counts. Orientation bounds each node's oriented
      out-degree by O(sqrt(m)) [Schank & Wagner 2005], so per-source
      wedge fan-out stays bounded even on power-law webgraphs.

    Exchange-path exchanges: distinct (1), degree agg (1), degree attach
    (2 joins), wedge self-join (1), closing composite join (1) — all
    bucketed, none driver-resident; only the final COUNT collapses.
    """
    from bionext_ray.ops.relational import bucketed_agg, shuffle_join

    # canonical undirected edges: (lo, hi), self-loops dropped
    def undirect(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"src": pa.array(np.minimum(u, v), pa.int64()),
                         "dst": pa.array(np.maximum(u, v), pa.int64())})

    und = distinct_edges(edges_ds.map_batches(undirect,
                                              batch_format="pyarrow"),
                         shuffle_partitions=shuffle_partitions).materialize()

    if und.count() <= broadcast_edges_max:
        return _triangle_count_broadcast(und)

    # undirected degree: each edge counts at both endpoints
    def both_ends(b: pa.Table) -> pa.Table:
        vs = np.concatenate([b["src"].to_numpy(zero_copy_only=False),
                             b["dst"].to_numpy(zero_copy_only=False)])
        return pa.table({"v": pa.array(vs.astype(np.int64), pa.int64()),
                         "_c": pa.array(np.ones(len(vs), np.int64))})

    deg = bucketed_agg(und.map_batches(both_ends, batch_format="pyarrow"),
                       ["v"], [("_c", "sum", "deg")],
                       shuffle_partitions=shuffle_partitions)

    withdeg = shuffle_join(und, deg, on=("src", "v"), left_cols=["dst"],
                           right_cols=["deg"],
                           shuffle_partitions=shuffle_partitions)
    withdeg = shuffle_join(withdeg.map_batches(
                               lambda b: b.rename_columns(
                                   ["src", "dst", "deg_src"]),
                               batch_format="pyarrow"),
                           deg, on=("dst", "v"),
                           left_cols=["src", "deg_src"], right_cols=["deg"],
                           shuffle_partitions=shuffle_partitions)

    # orient lower (deg, id) -> higher (deg, id); total order, no ties
    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ds_ = b["deg_src"].to_numpy(zero_copy_only=False)
        dd = b["deg"].to_numpy(zero_copy_only=False)
        fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
        a = np.where(fwd, s, d)
        c = np.where(fwd, d, s)
        ra = np.where(fwd, ds_, dd).astype(np.int64)
        rc = np.where(fwd, dd, ds_).astype(np.int64)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(c, pa.int64()),
                         "rank_a": pa.array(ra, pa.int64()),
                         "rank_b": pa.array(rc, pa.int64())})

    oriented = withdeg.map_batches(orient, batch_format="pyarrow")
    oriented = oriented.materialize()   # feeds the wedge join twice

    # The wedge phase EXPLODES: output rows ~= sum_a C(outdeg(a), 2),
    # typically several x the edge count even on sparse graphs, so its
    # exchanges must be sized to the intermediate, not to the input file
    # that shuffle_partitions was estimated from. Floor at the cluster's
    # CPU count so the heaviest stage can actually use every core.
    import ray as _ray
    Pw = max(shuffle_partitions or 0, 16,
             int(_ray.cluster_resources().get("CPU", 8)))

    # wedges: for each source a, all ordered pairs of its oriented
    # neighbours (x before y in the same (deg, id) order as the
    # orientation, so the closing edge — if present — is stored as x->y)
    wedges = shuffle_join(
        oriented.map_batches(lambda b: pa.table(
            {"a": b["a"], "x": b["b"], "rx": b["rank_b"]}),
            batch_format="pyarrow"),
        oriented.map_batches(lambda b: pa.table(
            {"a2": b["a"], "y": b["b"], "ry": b["rank_b"]}),
            batch_format="pyarrow"),
        on=("a", "a2"), left_cols=["x", "rx"], right_cols=["y", "ry"],
        shuffle_partitions=Pw)

    def order_wedge(b: pa.Table) -> pa.Table:
        """Keep each unordered wedge once AND pre-aggregate: two apexes
        sharing the same neighbour pair produce identical (wx, wy) rows —
        each is a distinct potential triangle, so they combine to a count
        (never dropped), shrinking the closing join's exchange in-task."""
        import pandas as pd
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        rx = b["rx"].to_numpy(zero_copy_only=False)
        ry = b["ry"].to_numpy(zero_copy_only=False)
        keep = (rx < ry) | ((rx == ry) & (x < y))
        df = pd.DataFrame({"wx": x[keep], "wy": y[keep]})
        g = df.groupby(["wx", "wy"], sort=False).size().reset_index(
            name="cnt")
        return pa.table({"wx": pa.array(g["wx"], pa.int64()),
                         "wy": pa.array(g["wy"], pa.int64()),
                         "cnt": pa.array(g["cnt"], pa.int64())})

    closed = shuffle_join(wedges.map_batches(order_wedge,
                                             batch_format="pyarrow"),
                          oriented.select_columns(["a", "b"]),
                          on=[("wx", "a"), ("wy", "b")],
                          left_cols=["cnt"], right_cols=[],
                          shuffle_partitions=Pw)

    import ray
    from ray.data.aggregate import Sum
    row = closed.aggregate(Sum("cnt", alias_name="n")) or {}
    n = int(row.get("n") or 0)
    return ray.data.from_arrow(pa.table(
        {"n_triangles": pa.array([n], pa.int64())}))


def pagerank(edges_ds, iters: int = 3, damping_pct: int = 85,
             shuffle_partitions: int | None = None,
             broadcast_nodes_max: int = 5_000_000):
    """Integer PageRank over a DISTINCT edge table, ``iters`` fixed
    iterations (no convergence test — bit-deterministic work for the oracle).

    rank_0(v)   = SCALE // N
    rate(u)     = rank_i(u) // deg(u)                 (per out-edge share)
    contrib(v)  = sum over in-edges (u, v) of rate(u)
    rank_{i+1}(v) = ((100 - d) * (SCALE // N)) // 100 + (d * contrib) // 100

    Every step floor-divides, so a DuckDB oracle with the same unrolled
    expressions matches bit-for-bit. Returns (node, pr_scaled).
    Dangling nodes (deg 0) contribute nothing; their mass is NOT
    redistributed (documented choice, mirrored in the oracle).

    Scale shape — the node STATE (rank, degree: 16 B/node) is orders of
    magnitude smaller than a web-scale EDGE table, so it is the textbook
    broadcast side: while it fits (``broadcast_nodes_max``, ~80 MB at the
    5M default), each iteration is ONE streaming pass over the edges
    (ray.put rate vector -> searchsorted lookup per batch -> in-task
    partial sums by dst) plus a tiny dst-keyed partial+final aggregate —
    no edge-table exchange at all, and the edge Dataset itself is never
    driver-resident. Beyond the threshold the same recurrence runs as
    bucketed exchanges (rank x degree join, edge x rate join, contribution
    aggregate — the Pregel shape) with node state sharded in the object
    store. Measured on a 600k-edge / 997-node graph: broadcast path ~8 s
    vs 47 s all-exchange (fixed exchange costs dominate node-sized
    state); both paths produce identical ranks.
    """
    from bionext_ray.ops.relational import bucketed_agg, shuffle_join

    edges = distinct_edges(edges_ds,
                           shuffle_partitions=shuffle_partitions)
    edges = edges.materialize()          # reused every iteration
    nodes = node_table(edges, shuffle_partitions=shuffle_partitions)
    deg = out_degrees(edges, shuffle_partitions=shuffle_partitions)
    n_nodes = nodes.count()
    if n_nodes == 0:                     # empty edge table: empty ranks,
        import ray.data                  # not SCALE // 0
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "pr_scaled": pa.array([], pa.int64())}))
    base = SCALE // n_nodes
    base_term = ((100 - damping_pct) * base) // 100

    if n_nodes <= broadcast_nodes_max:
        return _pagerank_broadcast(edges, nodes, deg, n_nodes, iters,
                                   damping_pct, base, base_term,
                                   shuffle_partitions)

    deg = deg.materialize()              # reused every iteration

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"],
            "pr": pa.array(np.full(b.num_rows, base, np.int64), pa.int64()),
        })

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # per-source share: rank//deg (nodes without out-edges drop out —
        # they contribute nothing, exactly the dangling-mass choice above)
        rated = shuffle_join(ranks, deg, on=("v", "v"),
                             left_cols=["pr"], right_cols=["deg"],
                             shuffle_partitions=shuffle_partitions)

        def rate(b: pa.Table) -> pa.Table:
            pr = b["pr"].to_numpy(zero_copy_only=False)
            d = b["deg"].to_numpy(zero_copy_only=False)
            return pa.table({"v": b["v"],
                             "rate": pa.array(pr // d, pa.int64())})

        per_edge = shuffle_join(edges, rated.map_batches(
                                    rate, batch_format="pyarrow"),
                                on=("src", "v"), left_cols=["dst"],
                                right_cols=["rate"],
                                shuffle_partitions=shuffle_partitions)
        contrib = bucketed_agg(
            per_edge.select_columns(["dst", "rate"]),
            ["dst"], [("rate", "sum", "contrib")],
            shuffle_partitions=shuffle_partitions)
        # next rank over ALL nodes (left join keeps zero-in-degree nodes)
        nxt = shuffle_join(ranks.select_columns(["v"]), contrib,
                           on=("v", "dst"), left_cols=[],
                           right_cols=["contrib"], how="left",
                           shuffle_partitions=shuffle_partitions)

        def step(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            c = pc.coalesce(b["contrib"], pa.scalar(0, pa.int64()))
            c = c.to_numpy(zero_copy_only=False)
            pr = base_term + (damping_pct * c) // 100
            return pa.table({"v": b["v"],
                             "pr": pa.array(pr, pa.int64())})

        ranks = nxt.map_batches(step, batch_format="pyarrow").materialize()

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["v"], "pr_scaled": b["pr"]})

    return ranks.map_batches(shape, batch_format="pyarrow")


def _pagerank_broadcast(edges, nodes, deg, n_nodes, iters, damping_pct,
                        base, base_term, shuffle_partitions):
    """Broadcast-state PageRank: node vector on the driver / object store,
    edges streamed. Same integer recurrence as the exchange path."""
    import ray

    # node + degree vectors to the driver: bounded by broadcast_nodes_max
    # (16 B/node), the documented threshold for this path
    node_arr = np.sort(np.concatenate(
        [t["v"].to_numpy(zero_copy_only=False)
         for t in ray.get(nodes.to_arrow_refs()) if t.num_rows]
        or [np.array([], np.int64)]).astype(np.int64))
    deg_arr = np.zeros(n_nodes, np.int64)
    for t in ray.get(deg.to_arrow_refs()):
        if t.num_rows:
            idx = np.searchsorted(node_arr,
                                  t["v"].to_numpy(zero_copy_only=False))
            deg_arr[idx] = t["deg"].to_numpy(zero_copy_only=False)

    pr = np.full(n_nodes, base, np.int64)
    has_out = deg_arr > 0
    for _ in range(iters):
        rate = np.zeros(n_nodes, np.int64)
        rate[has_out] = pr[has_out] // deg_arr[has_out]
        ref = ray.put((node_arr, rate))

        def contrib_partial(b: pa.Table) -> pa.Table:
            narr, r = ray.get(ref)            # zero-copy local read
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            vals = r[np.searchsorted(narr, s)]
            g = pa.table({"dst": pa.array(d, pa.int64()),
                          "rate": pa.array(vals, pa.int64())}
                         ).group_by(["dst"]).aggregate([("rate", "sum")])
            return pa.table({"dst": g["dst"], "c": g["rate_sum"]})

        # per-block partials (<= nodes rows each) merge on the driver —
        # bounded by the same broadcast threshold the path is gated on
        contrib = np.zeros(n_nodes, np.int64)
        for t in ray.get(edges.map_batches(
                contrib_partial, batch_format="pyarrow").to_arrow_refs()):
            if t.num_rows:
                idx = np.searchsorted(node_arr,
                                      t["dst"].to_numpy(zero_copy_only=False))
                np.add.at(contrib, idx, t["c"].to_numpy(zero_copy_only=False))
        pr = base_term + (damping_pct * contrib) // 100

    import ray.data
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "pr_scaled": pa.array(pr, pa.int64())}))


def bfs_hops(edges_ds, seeds_ds, max_hops: int = 3,
             shuffle_partitions: int | None = None,
             broadcast_nodes_max: int = 5_000_000):
    """Multi-source BFS hop distance over a directed edge table: every node
    reachable from ``seeds_ds`` (column ``v``) within ``max_hops`` edges,
    with its hop distance (seeds themselves at 0). The k-hop-neighbourhood
    query a user runs against the materialized KG ("everything within 3
    hops of these entities"). Returns (node, dist); nodes first reachable
    beyond ``max_hops`` are absent. Bit-deterministic — the DuckDB oracle
    is a bounded recursive CTE with MIN(d) per node.

    Scale shape — identical gating to ``pagerank``: the frontier/visited
    STATE is node-sized (8 B/node), edge-table-sized never. While it fits
    (``broadcast_nodes_max``), each hop is ONE streaming pass over the
    edges (ray.put the sorted frontier -> vectorized searchsorted
    membership per batch -> per-block unique dsts back to the driver,
    bounded by |V|) — no edge exchange at all. Beyond the threshold the
    same frontier expansion runs as dataflow: frontier x edges
    shuffle_join, bucketed distinct of the reached dsts, and a set_op
    EXCEPT against the visited table per hop — O(max_hops) exchanges
    total, each touching only frontier-adjacent edges' dst columns.
    """
    import ray
    import ray.data

    from bionext_ray.ops.relational import bucketed_agg, set_op, shuffle_join

    edges = distinct_edges(
        edges_ds, shuffle_partitions=shuffle_partitions).materialize()
    n_nodes = node_table(
        edges, shuffle_partitions=shuffle_partitions).count()

    if n_nodes <= broadcast_nodes_max:
        seed_arr = np.unique(np.concatenate(
            [t["v"].to_numpy(zero_copy_only=False)
             for t in ray.get(seeds_ds.to_arrow_refs()) if t.num_rows]
            or [np.array([], np.int64)]).astype(np.int64))
        visited = seed_arr
        out_nodes, out_dists = [seed_arr], [np.zeros(len(seed_arr),
                                                     np.int64)]
        frontier = seed_arr
        for hop in range(1, max_hops + 1):
            if not len(frontier):
                break
            ref = ray.put(frontier)                   # sorted, unique

            def reach(b: pa.Table, _ref=ref) -> pa.Table:
                f = ray.get(_ref)                     # zero-copy read
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                idx = np.minimum(np.searchsorted(f, s), len(f) - 1)
                return pa.table({"v": pa.array(
                    np.unique(d[f[idx] == s]), pa.int64())})

            parts = [t["v"].to_numpy(zero_copy_only=False)
                     for t in ray.get(edges.map_batches(
                         reach, batch_format="pyarrow").to_arrow_refs())
                     if t.num_rows]
            cand = (np.unique(np.concatenate(parts)) if parts
                    else np.array([], np.int64))
            newly = np.setdiff1d(cand, visited, assume_unique=True)
            if len(newly):
                out_nodes.append(newly)
                out_dists.append(np.full(len(newly), hop, np.int64))
                visited = np.union1d(visited, newly)
            frontier = newly
        return ray.data.from_arrow(pa.table({
            "node": pa.array(np.concatenate(out_nodes), pa.int64()),
            "dist": pa.array(np.concatenate(out_dists), pa.int64())}))

    # ---- exchange path: node state itself sharded in the object store ----
    def onecol(b: pa.Table) -> pa.Table:
        u = np.unique(b["v"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"v": pa.array(u, pa.int64()),
                         "_c": pa.array(np.ones(len(u), np.int64))})

    frontier = bucketed_agg(
        seeds_ds.map_batches(onecol, batch_format="pyarrow"),
        ["v"], [("_c", "sum", "_c")],
        shuffle_partitions=shuffle_partitions
    ).select_columns(["v"]).materialize()
    visited_ds = frontier

    def with_dist(ds, hop):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["v"],
                "dist": pa.array(np.full(b.num_rows, hop, np.int64),
                                 pa.int64())})
        return ds.map_batches(fn, batch_format="pyarrow")

    parts = [with_dist(frontier, 0)]
    for hop in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        reached = shuffle_join(frontier, edges, on=("v", "src"),
                               left_cols=[], right_cols=["dst"],
                               shuffle_partitions=shuffle_partitions)

        def dsts(b: pa.Table) -> pa.Table:
            u = np.unique(b["dst"].to_numpy(zero_copy_only=False))
            return pa.table({"v": pa.array(u, pa.int64()),
                             "_c": pa.array(np.ones(len(u), np.int64))})

        cand = bucketed_agg(
            reached.map_batches(dsts, batch_format="pyarrow"),
            ["v"], [("_c", "sum", "_c")],
            shuffle_partitions=shuffle_partitions).select_columns(["v"])
        newly = set_op(cand, visited_ds, ["v"], "except",
                       shuffle_partitions=shuffle_partitions).materialize()
        parts.append(with_dist(newly, hop))
        visited_ds = visited_ds.union(newly).materialize()
        frontier = newly

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def adjacency_list(edges_ds, src: str = "src", dst: str = "dst",
                   shuffle_partitions: int | None = None):
    """Adjacency-list materialization: (node, out_deg, neighbors) with the
    DISTINCT out-neighbors ascending, comma-joined — the partitioned
    adjacency table the north rule's "graph materialization" names, in the
    inverted-index shape (ops/textstats.py::inverted_index): per-block
    distinct (src, dst) incidence, ONE src-hash-bucketed exchange (~P
    groups, never one group per node), per bucket a final drop_duplicates
    + C sort + grouped join. Output streams out sharded — a 10^12-edge
    graph never concentrates on the driver."""
    import pandas as pd

    from bionext_ray.ops.relational import _key_buckets, coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)

    def incidence(b: pa.Table) -> pa.Table:
        # type-agnostic (int node ids OR canonical string entity ids)
        t = pa.table({src: b[src], dst: b[dst]}).group_by(
            [src, dst]).aggregate([])                # block-local distinct
        s = t[src].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_key_buckets(s, P), pa.int64()))

    def build_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket").drop_duplicates([src, dst])
             .sort_values([src, dst], kind="mergesort"))
        agg = g.groupby(src, sort=False)[dst].agg(
            out_deg="size", neighbors=lambda s: ",".join(map(str, s)))
        out = agg.reset_index().rename(columns={src: "node"})
        return out[["node", "out_deg", "neighbors"]]

    inc = edges_ds.map_batches(incidence, batch_format="pyarrow")
    return (coalesce_for_exchange(inc, P)
            .groupby("__bucket")
            .map_groups(build_bucket, batch_format="pandas")
            .select_columns(["node", "out_deg", "neighbors"]))


HITS_SCALE = 1_000_000


def hits(edges_ds, iters: int = 2, src: str = "src", dst: str = "dst",
         shuffle_partitions: int | None = None,
         broadcast_nodes_max: int = 5_000_000):
    """Integer HITS (hubs & authorities, Kleinberg 1999) over a DISTINCT
    directed edge table — the companion centrality to ``pagerank`` for a
    web link graph, where a good HUB links to many good authorities and a
    good AUTHORITY is linked from many good hubs.

    Recurrence (``iters`` fixed rounds, bit-deterministic for the oracle):

        hub_0(u)  = HITS_SCALE                    for every node
        a_i(v)    = sum over in-edges  (u, v) of hub_{i-1}(u)
        a_i       = a_i  * HITS_SCALE // max(a_i)      (max-normalized)
        hub_i(u)  = sum over out-edges (u, v) of a_i(v)
        hub_i     = hub_i * HITS_SCALE // max(hub_i)

    HITS_SCALE is 1e6 (not pagerank's 1e9) so every intermediate fits
    int64: raw sums are <= max_degree * 1e6 (~5e10 at 5e4-node bench
    scale) and the normalizing product <= 5e16. Nodes with no in-edges
    get auth 0; no out-edges, hub 0 — both stay in the output.

    Scale shape — identical gating to ``pagerank``: node state (two
    8-byte vectors) broadcasts while it fits ``broadcast_nodes_max``;
    each half-iteration is then ONE streaming pass over the edges
    (ray.put state -> searchsorted lookup -> in-task partial sums) with
    per-block partials merged on the driver (bounded by |V|). Beyond the
    threshold the same recurrence runs as bucketed exchanges
    (state x edge shuffle_join + bucketed sum + node left-join per
    half-iteration). Returns (node, hub, auth)."""
    import ray
    import ray.data

    from bionext_ray.ops.relational import bucketed_agg, shuffle_join

    assert iters >= 1, "hits needs at least one iteration"
    edges = distinct_edges(edges_ds, src=src, dst=dst,
                           shuffle_partitions=shuffle_partitions)
    edges = edges.materialize()          # reused 2x per iteration
    nodes = node_table(edges, src=src, dst=dst,
                       shuffle_partitions=shuffle_partitions)
    nodes = nodes.materialize()          # reused by count, init, and the
    n_nodes = nodes.count()              # left-join of every half-step
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "hub": pa.array([], pa.int64()),
            "auth": pa.array([], pa.int64())}))

    if n_nodes <= broadcast_nodes_max:
        return _hits_broadcast(edges, nodes, n_nodes, iters, src, dst)

    def init(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["v"], "x": pa.array(
            np.full(b.num_rows, HITS_SCALE, np.int64), pa.int64())})

    hub = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def half_step(state, key_in, key_out):
        """One HITS half-iteration as dataflow: edge x state join on
        ``key_in``, bucketed sum keyed by ``key_out``, max-normalize,
        left-join back onto the node table (absent keys -> 0)."""
        per_edge = shuffle_join(edges, state, on=(key_in, "v"),
                                left_cols=[key_out], right_cols=["x"],
                                shuffle_partitions=shuffle_partitions)
        raw = bucketed_agg(per_edge.select_columns([key_out, "x"]),
                           [key_out], [("x", "sum", "s")],
                           shuffle_partitions=shuffle_partitions)
        raw = raw.materialize()          # consumed twice (max + join)
        m = max(int(raw.max("s") or 0), 1)
        joined = shuffle_join(nodes, raw, on=("v", key_out),
                              left_cols=[], right_cols=["s"], how="left",
                              shuffle_partitions=shuffle_partitions)

        def norm(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            s = pc.coalesce(b["s"], pa.scalar(0, pa.int64()))
            s = s.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"v": b["v"], "x": pa.array(
                s * HITS_SCALE // m, pa.int64())})

        return joined.map_batches(norm,
                                  batch_format="pyarrow").materialize()

    for _ in range(iters):
        auth = half_step(hub, src, dst)   # sum hubs over in-edges
        hub = half_step(auth, dst, src)   # sum auths over out-edges

    def rename(col):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"v": b["v"], col: b["x"]})
        return fn

    hub_r = hub.map_batches(rename("hub"), batch_format="pyarrow")
    auth_r = auth.map_batches(rename("auth"), batch_format="pyarrow")
    out = shuffle_join(hub_r, auth_r, on=("v", "v"), left_cols=["hub"],
                       right_cols=["auth"],
                       shuffle_partitions=shuffle_partitions)
    return out.map_batches(
        lambda b: pa.table({"node": b["v"], "hub": b["hub"],
                            "auth": b["auth"]}),
        batch_format="pyarrow")


def _hits_broadcast(edges, nodes, n_nodes, iters, src, dst):
    """Broadcast-state HITS: hub/auth vectors via ray.put, edges
    streamed; per-block partials (<= |V| rows) merge on the driver —
    bounded by the broadcast gate. Same integer recurrence as the
    exchange path (pinned equal by test)."""
    import ray
    import ray.data

    node_arr = np.sort(np.concatenate(
        [t["v"].to_numpy(zero_copy_only=False)
         for t in ray.get(nodes.to_arrow_refs()) if t.num_rows]
        or [np.array([], np.int64)]).astype(np.int64))

    def sweep(vec, key_in, key_out):
        """raw[key_out] += vec[key_in] for every edge, as one streaming
        pass with in-task arrow group-sums."""
        ref = ray.put((node_arr, vec))

        def partial(b: pa.Table) -> pa.Table:
            narr, x = ray.get(ref)
            ki = b[key_in].to_numpy(zero_copy_only=False)
            ko = b[key_out].to_numpy(zero_copy_only=False)
            vals = x[np.searchsorted(narr, ki)]
            g = pa.table({"k": pa.array(ko, pa.int64()),
                          "s": pa.array(vals, pa.int64())}
                         ).group_by(["k"]).aggregate([("s", "sum")])
            return pa.table({"k": g["k"], "s": g["s_sum"]})

        raw = np.zeros(n_nodes, np.int64)
        for t in ray.get(edges.map_batches(
                partial, batch_format="pyarrow").to_arrow_refs()):
            if t.num_rows:
                idx = np.searchsorted(node_arr,
                                      t["k"].to_numpy(zero_copy_only=False))
                np.add.at(raw, idx, t["s"].to_numpy(zero_copy_only=False))
        return raw * HITS_SCALE // max(int(raw.max(initial=0)), 1)

    hub = np.full(n_nodes, HITS_SCALE, np.int64)
    auth = np.zeros(n_nodes, np.int64)
    for _ in range(iters):
        auth = sweep(hub, src, dst)
        hub = sweep(auth, dst, src)

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "hub": pa.array(hub, pa.int64()),
        "auth": pa.array(auth, pa.int64())}))


def _pairs_within_groups(sizes):
    """Vectorized enumeration of all (i < j) row-index pairs inside
    contiguous groups of the given sizes (same two-level grouped-arange
    expansion as the triangle wedge enumerator — no per-group Python)."""
    sizes = sizes.astype(np.int64)
    starts = np.cumsum(sizes) - sizes
    c1 = np.maximum(sizes - 1, 0)
    s1 = np.repeat(np.cumsum(c1) - c1, c1)
    jj = np.arange(int(c1.sum()), dtype=np.int64) - s1 + 1
    if not len(jj):
        e = np.array([], np.int64)
        return e, e
    g1 = np.repeat(np.arange(len(sizes), dtype=np.int64), c1)
    g2 = np.repeat(g1, jj)
    j2 = np.repeat(jj, jj)
    s2 = np.repeat(np.cumsum(jj) - jj, jj)
    i2 = np.arange(int(jj.sum()), dtype=np.int64) - s2
    base = starts[g2]
    return base + i2, base + j2


def cocitation(edges_ds, src: str = "src", dst: str = "dst",
               min_count: int = 1, max_out_degree: int | None = None,
               shuffle_partitions: int | None = None):
    """Co-citation counts: for every unordered pair of targets, how many
    DISTINCT sources link to both — the classic "related pages/hosts"
    signal (Small 1973; a KG edge-confidence prior when promoting a link
    graph). Returns (host_a, host_b, n_common) with host_a < host_b;
    type-agnostic keys (string hosts or int node ids).

    Shape: block-local distinct -> ONE src-bucketed exchange (every edge
    of a source lands in its bucket, so in-bucket dedup is globally
    exact) -> vectorized within-source pair expansion + in-task pair
    pre-aggregation -> ONE pair-bucketed sum.

    Documented fan-out assumption: a source of out-degree d emits
    C(d, 2) pairs; on power-law graphs cap it with ``max_out_degree``
    (sources above the cap are DROPPED — standard practice, a page
    linking to thousands of targets carries no co-citation signal;
    mirror the cap in any oracle)."""
    import pandas as pd

    from bionext_ray.ops.relational import (_key_buckets, bucketed_agg,
                                            coalesce_for_exchange)

    P = max(16, shuffle_partitions or 0)

    def local(b: pa.Table) -> pa.Table:
        t = pa.table({src: b[src], dst: b[dst]}).group_by(
            [src, dst]).aggregate([])           # block-local distinct
        k = t[src].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_key_buckets(k, P), pa.int64()))

    def expand(g: pd.DataFrame) -> pa.Table:
        g = (g.drop_duplicates([src, dst])
             .sort_values([src, dst], kind="mergesort"))
        sizes = g.groupby(src, sort=False).size().to_numpy()
        if max_out_degree is not None:
            keep = np.repeat(sizes <= max_out_degree, sizes)
            g = g[keep]
            sizes = sizes[sizes <= max_out_degree]
        li, ri = _pairs_within_groups(sizes)
        d = g[dst].to_numpy()
        part = (pd.DataFrame({"host_a": d[li], "host_b": d[ri]})
                .groupby(["host_a", "host_b"], sort=False)
                .size().rename("n_common").reset_index())
        return pa.Table.from_pandas(part, preserve_index=False)

    inc = edges_ds.map_batches(local, batch_format="pyarrow")
    pairs = (coalesce_for_exchange(inc, P)
             .groupby("__bucket")
             .map_groups(expand, batch_format="pandas"))
    agg = bucketed_agg(pairs, ["host_a", "host_b"],
                       [("n_common", "sum", "n_common")],
                       shuffle_partitions=shuffle_partitions)
    if min_count > 1:
        import pyarrow.compute as pc
        agg = agg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_common"], min_count)),
            batch_format="pyarrow")
    return agg


def weighted_edges(edges_ds, src: str = "src", dst: str = "dst",
                   weight_col: str | None = None,
                   shuffle_partitions: int | None = None):
    """(src, dst, w) with one row per distinct pair: w = the SUM of
    ``weight_col`` (or the pair's multiplicity when None — parallel edges
    become weight, the information plain distinct_edges throws away).
    Block-local combine + one bucketed exchange."""
    from bionext_ray.ops.relational import bucketed_agg

    def one(b: pa.Table) -> pa.Table:
        cols = {src: pa.compute.cast(b[src], pa.int64()),
                dst: pa.compute.cast(b[dst], pa.int64())}
        if weight_col is None:
            cols["w"] = pa.array(np.ones(b.num_rows, np.int64), pa.int64())
        else:
            w = pa.compute.cast(b[weight_col], pa.int64())
            # fail loud, not silently-diverge-from-SQL: the pr*w//W
            # recurrence needs strictly positive weights (W=0 would be a
            # silent zero-contribution in numpy but an error in the
            # oracle; negative W flips floor-division signs)
            if b.num_rows and pa.compute.min(w).as_py() <= 0:
                raise ValueError(
                    "weighted_edges: weights must be strictly positive")
            cols["w"] = w
        return pa.table(cols)

    return bucketed_agg(edges_ds.map_batches(one, batch_format="pyarrow"),
                        [src, dst], [("w", "sum", "w")],
                        shuffle_partitions=shuffle_partitions)


def pagerank_weighted(edges_ds, iters: int = 3, damping_pct: int = 85,
                      weight_col: str | None = None,
                      shuffle_partitions: int | None = None,
                      broadcast_nodes_max: int = 5_000_000):
    """Weighted integer PageRank: contribution along (u, v) is
    pr(u) * w(u, v) // W(u) with W(u) = u's total out-weight — the
    support-weighted centrality a KG runs over canonical triples, where
    ``pagerank``'s DISTINCT edge table would discard evidence counts.
    With all weights 1 this reduces bit-for-bit to the unweighted
    recurrence ((pr * 1) // deg == pr // deg).

    Same integer contract (SCALE 1e9, floor division everywhere; pr*w
    must stay under 2^63 — weights are supports/multiplicities, not
    large magnitudes) and the same broadcast/exchange gating as
    ``pagerank``; weights make the per-edge rate edge-local, so the
    broadcast path computes (pr[src] * w) // W[src] inside each streaming
    batch instead of pre-dividing per node. Returns (node, pr_scaled)."""
    import ray
    import ray.data

    from bionext_ray.ops.relational import bucketed_agg, shuffle_join

    edges = weighted_edges(edges_ds, weight_col=weight_col,
                           shuffle_partitions=shuffle_partitions)
    edges = edges.materialize()
    nodes = node_table(edges, shuffle_partitions=shuffle_partitions)
    nodes = nodes.materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "pr_scaled": pa.array([], pa.int64())}))
    base = SCALE // n_nodes
    base_term = ((100 - damping_pct) * base) // 100

    # out-weight per source (the weighted out-degree)
    wd = bucketed_agg(edges.select_columns(["src", "w"]),
                      ["src"], [("w", "sum", "W")],
                      shuffle_partitions=shuffle_partitions)

    if n_nodes <= broadcast_nodes_max:
        node_arr = np.sort(np.concatenate(
            [t["v"].to_numpy(zero_copy_only=False)
             for t in ray.get(nodes.to_arrow_refs()) if t.num_rows]
            or [np.array([], np.int64)]).astype(np.int64))
        W_arr = np.zeros(n_nodes, np.int64)
        for t in ray.get(wd.to_arrow_refs()):
            if t.num_rows:
                idx = np.searchsorted(
                    node_arr, t["src"].to_numpy(zero_copy_only=False))
                W_arr[idx] = t["W"].to_numpy(zero_copy_only=False)

        pr = np.full(n_nodes, base, np.int64)
        for _ in range(iters):
            ref = ray.put((node_arr, pr, W_arr))

            def contrib_partial(b: pa.Table) -> pa.Table:
                narr, p, W = ray.get(ref)
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                w = b["w"].to_numpy(zero_copy_only=False)
                idx = np.searchsorted(narr, s)
                vals = (p[idx] * w) // W[idx]   # W>0: src has out-edges
                g = pa.table({"dst": pa.array(d, pa.int64()),
                              "r": pa.array(vals, pa.int64())}
                             ).group_by(["dst"]).aggregate([("r", "sum")])
                return pa.table({"dst": g["dst"], "c": g["r_sum"]})

            contrib = np.zeros(n_nodes, np.int64)
            for t in ray.get(edges.map_batches(
                    contrib_partial,
                    batch_format="pyarrow").to_arrow_refs()):
                if t.num_rows:
                    idx = np.searchsorted(
                        node_arr, t["dst"].to_numpy(zero_copy_only=False))
                    np.add.at(contrib, idx,
                              t["c"].to_numpy(zero_copy_only=False))
            pr = base_term + (damping_pct * contrib) // 100

        return ray.data.from_arrow(pa.table({
            "node": pa.array(node_arr, pa.int64()),
            "pr_scaled": pa.array(pr, pa.int64())}))

    wd = wd.materialize()

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"],
            "pr": pa.array(np.full(b.num_rows, base, np.int64), pa.int64()),
        })

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(iters):
        rated = shuffle_join(ranks, wd, on=("v", "src"),
                             left_cols=["pr"], right_cols=["W"],
                             shuffle_partitions=shuffle_partitions)
        per_edge = shuffle_join(edges, rated, on=("src", "v"),
                                left_cols=["dst", "w"],
                                right_cols=["pr", "W"],
                                shuffle_partitions=shuffle_partitions)

        def rate(b: pa.Table) -> pa.Table:
            p = b["pr"].to_numpy(zero_copy_only=False)
            w = b["w"].to_numpy(zero_copy_only=False)
            W = b["W"].to_numpy(zero_copy_only=False)
            return pa.table({"dst": b["dst"],
                             "r": pa.array((p * w) // W, pa.int64())})

        contrib = bucketed_agg(
            per_edge.map_batches(rate, batch_format="pyarrow"),
            ["dst"], [("r", "sum", "contrib")],
            shuffle_partitions=shuffle_partitions)
        nxt = shuffle_join(nodes, contrib, on=("v", "dst"),
                           left_cols=[], right_cols=["contrib"], how="left",
                           shuffle_partitions=shuffle_partitions)

        def step(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            c = pc.coalesce(b["contrib"], pa.scalar(0, pa.int64()))
            c = c.to_numpy(zero_copy_only=False)
            if c.dtype != np.int64:      # null-typed on empty-contrib path
                c = np.nan_to_num(c.astype(np.float64)).astype(np.int64)
            pr = base_term + (damping_pct * c) // 100
            return pa.table({"v": b["v"],
                             "pr": pa.array(pr, pa.int64())})

        ranks = nxt.map_batches(step, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b["v"], "pr_scaled": b["pr"]}),
        batch_format="pyarrow")


# ------------------------------------------------ entity co-mention PMI
def mention_cooccurrence(tagged_ds, shuffle_partitions: int | None = None):
    """Entity co-mention PMI over the tagger's nested per-doc output —
    the classic step from a mention table to a knowledge-graph signal
    (which entity pairs co-occur more often than chance; reference
    pattern: BioNExt's relation candidates are exactly the per-doc
    entity pairs, src/extractor/dataset.py candidate enumeration).

    A mention key is ``label || ':' || lower(text)`` (labels are a fixed
    identifier set and never contain ':'). Per document the DISTINCT key
    set produces unordered pairs (lexicographic key_a < key_b); the
    output row per pair carries the co-mention document count and
    pmi_micro = floor(1e6 * (((ln(c) + ln(N)) - ln(df_a)) - ln(df_b)))
    with N = total documents. Each ln() argument is a SINGLE integer —
    exact int->double conversion at any corpus size, no c*N product to
    overflow — and the left-associated +/- chain is mirrored
    parenthesis-for-parenthesis by the SQL oracle, so libm ln() parity
    (proven for unigram_logprob / bm25_topk) makes the floored micro
    value bit-identical.

    Shape: ONE pass over the tagged dataset emitting in-batch
    pre-aggregated partials (side 0 = pair counts, side 1 = key doc
    frequencies, side 2 = batch doc count) -> ONE bucketed exchange
    (bucketed_agg) -> the aggregate lands on the driver for final PMI
    scoring. That driver materialization is KB-BOUNDED by construction:
    distinct keys <= |gazetteer surfaces| x |labels| and pairs <= keys^2
    — a property of the tagger's closed vocabulary, not of corpus size —
    so it is the broadcast-small-side pattern, not a corpus collect.
    """
    import math
    from collections import Counter

    from .relational import bucketed_agg

    def partials(b: pa.Table) -> pa.Table:
        pair_c: Counter = Counter()
        df_c: Counter = Counter()
        for ms in b["mentions"].to_pylist():
            keys = sorted({f"{m['label']}:{m['text'].lower()}"
                           for m in ms})
            df_c.update(keys)
            for i in range(len(keys)):
                for j in range(i + 1, len(keys)):
                    pair_c[(keys[i], keys[j])] += 1
        sides, kas, kbs, ns = [], [], [], []
        for (ka, kb), n in pair_c.items():
            sides.append(0); kas.append(ka); kbs.append(kb); ns.append(n)
        for k, n in df_c.items():
            sides.append(1); kas.append(k); kbs.append(""); ns.append(n)
        sides.append(2); kas.append(""); kbs.append("")
        ns.append(b.num_rows)
        return pa.table({"side": pa.array(sides, pa.int8()),
                         "ka": pa.array(kas, pa.string()),
                         "kb": pa.array(kbs, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    agg = bucketed_agg(
        tagged_ds.map_batches(partials, batch_format="pyarrow"),
        ["side", "ka", "kb"], [("n", "sum", "n")],
        shuffle_partitions=shuffle_partitions).to_pandas()
    if "n" not in agg.columns:    # mention-free empty corpus
        return pa.table({"key_a": pa.array([], pa.string()),
                         "key_b": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "pmi_micro": pa.array([], pa.int64())})
    n_total = int(agg.loc[agg["side"] == 2, "n"].sum()) or 1
    df = dict(zip(agg.loc[agg["side"] == 1, "ka"],
                  agg.loc[agg["side"] == 1, "n"].astype(int)))
    pairs = agg[agg["side"] == 0].sort_values(["ka", "kb"],
                                              kind="mergesort")
    ln, floor = math.log, math.floor
    pmi = [floor(1_000_000 * (((ln(int(c)) + ln(n_total))
                               - ln(df[a])) - ln(df[b])))
           for a, b, c in zip(pairs["ka"], pairs["kb"], pairs["n"])]
    return pa.table({
        "key_a": pa.array(pairs["ka"].tolist(), pa.string()),
        "key_b": pa.array(pairs["kb"].tolist(), pa.string()),
        "n_docs": pa.array(pairs["n"].astype(int).tolist(), pa.int64()),
        "pmi_micro": pa.array(pmi, pa.int64()),
    })


def _broadcast_node_lookup(ds, key: str = "v", val: str = "deg"):
    """Collect a node-keyed (key, val) dataset into ONE key-sorted pair of
    int64 arrays and ``ray.put`` it — the shared small-side broadcast for
    the gated degree-attach paths (callers look values up with
    ``searchsorted``; every queried key must be present by construction).
    Caller owns the gate (``ds.count() <= broadcast_nodes_max``)."""
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    keys = np.concatenate(
        [t[key].to_numpy(zero_copy_only=False) for t in parts]
        or [np.array([], np.int64)]).astype(np.int64)
    vals = np.concatenate(
        [t[val].to_numpy(zero_copy_only=False) for t in parts]
        or [np.array([], np.int64)]).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    return ray.put((keys[order], vals[order]))


def neighbor_jaccard(edges_ds, src: str = "src", dst: str = "dst",
                     min_common: int = 1, max_in_degree: int | None = None,
                     shuffle_partitions: int | None = None,
                     broadcast_nodes_max: int = 5_000_000):
    """Out-neighborhood Jaccard similarity between every source pair that
    shares at least one target — the set-overlap companion to
    :func:`cocitation` (SimRank's first iteration; the classic
    "related hosts by common out-links" signal used to promote candidate
    KG edges). Returns (node_a, node_b, n_common, jaccard_ppm) with
    node_a < node_b and jaccard_ppm = (1_000_000 * |A∩B|) // |A∪B| —
    integer floor arithmetic end-to-end so a DuckDB self-join oracle
    matches bit-for-bit. Integer node ids (cast to int64, like the other
    spectral/centrality ops here).

    Shape: ONE dst-bucketed exchange does all the per-target work — every
    copy of an edge lands in its target's bucket, so the in-bucket
    drop_duplicates is globally exact, and the same deduped bucket then
    emits BOTH the source-pair intersection partials (vectorized
    within-target expansion + in-task pre-aggregation) and the per-source
    degree partials, union-tagged in one output (the fused-exchange
    pattern from mention_cooccurrence — a separate distinct_edges +
    out_degrees pass would cost one extra |E| exchange, measured ~4 s of
    12 at bench scale). Then ONE pair-bucketed sum (the dominant, output-
    sized exchange) and one node-sized degree sum. Degrees attach via a
    broadcast lookup while the source-node vector fits
    ``broadcast_nodes_max`` (16 B/node, same gate as pagerank); above it,
    two bucketed shuffle_joins — no driver-resident pair table on either
    path.

    Documented fan-out assumption (mirror in any oracle): a target of
    in-degree d emits C(d, 2) pairs; on power-law in-degree graphs cap it
    with ``max_in_degree`` — targets above the cap are DROPPED as pair
    generators (degrees still count the full neighbor sets), the same
    standard truncation as cocitation's ``max_out_degree``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from bionext_ray.ops.relational import (_key_buckets, bucketed_agg,
                                            coalesce_for_exchange,
                                            shuffle_join)

    # the pair expansion multiplies rows ~avg-in-degree×, so byte-based
    # partition estimates sized on the INPUT starve the exchanges that
    # carry the OUTPUT: floor the bucket count at 2 groups/CPU (measured
    # 12 s -> 4 s at bench scale vs a 16-bucket floor)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = max(16, 2 * ncpu, shuffle_partitions or 0)

    def local(b: pa.Table) -> pa.Table:
        t = pa.table({
            src: pa.compute.cast(b[src], pa.int64()),
            dst: pa.compute.cast(b[dst], pa.int64()),
        }).group_by([src, dst]).aggregate([])  # block-local distinct
        d = t[dst].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_key_buckets(d, P), pa.int64()))

    def expand(g: pd.DataFrame) -> pa.Table:
        g = (g.drop_duplicates([src, dst])    # globally exact: dst-bucketed
             .sort_values([dst, src], kind="mergesort"))
        s = g[src].to_numpy()
        # degree partials BEFORE the cap: degrees count full neighbor sets
        dp = pd.Series(s).value_counts(sort=False)
        sizes = g.groupby(dst, sort=False).size().to_numpy()
        if max_in_degree is not None:
            g = g[np.repeat(sizes <= max_in_degree, sizes)]
            sizes = sizes[sizes <= max_in_degree]
            s = g[src].to_numpy()
        li, ri = _pairs_within_groups(sizes)
        part = (pd.DataFrame({"node_a": s[li], "node_b": s[ri]})
                .groupby(["node_a", "node_b"], sort=False)
                .size().rename("n_common").reset_index())
        na = np.concatenate([part["node_a"].to_numpy(np.int64),
                             dp.index.to_numpy(np.int64)])
        nb = np.concatenate([part["node_b"].to_numpy(np.int64),
                             np.zeros(len(dp), np.int64)])
        nc = np.concatenate([part["n_common"].to_numpy(np.int64),
                             dp.to_numpy(np.int64)])
        side = np.concatenate([np.zeros(len(part), np.int64),
                               np.ones(len(dp), np.int64)])
        return pa.table({"node_a": pa.array(na, pa.int64()),
                         "node_b": pa.array(nb, pa.int64()),
                         "n_common": pa.array(nc, pa.int64()),
                         "__side": pa.array(side, pa.int64())})

    tagged = edges_ds.map_batches(local, batch_format="pyarrow")
    grouped = (coalesce_for_exchange(tagged, P)
               .groupby("__bucket")
               .map_groups(expand, batch_format="pandas"))
    grouped = grouped.materialize()          # two consumers: pairs + degrees

    def deg_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["__side"], 1))
        return pa.table({"v": t["node_a"], "deg": t["n_common"]})

    deg = bucketed_agg(grouped.map_batches(deg_rows, batch_format="pyarrow"),
                       ["v"], [("deg", "sum", "deg")],
                       shuffle_partitions=P).materialize()

    def pair_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["__side"], 0)) \
            .select(["node_a", "node_b", "n_common"])

    inter = bucketed_agg(
        grouped.map_batches(pair_rows, batch_format="pyarrow"),
        ["node_a", "node_b"], [("n_common", "sum", "n_common")],
        shuffle_partitions=P)
    if min_common > 1:
        inter = inter.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_common"], min_common)),
            batch_format="pyarrow")

    def score(b: pa.Table, da, db) -> pa.Table:
        nc = b["n_common"].to_numpy(zero_copy_only=False)
        union = da + db - nc               # >= nc >= 1: never divides by 0
        return pa.table({
            "node_a": b["node_a"], "node_b": b["node_b"],
            "n_common": b["n_common"],
            "jaccard_ppm": pa.array((1_000_000 * nc) // union, pa.int64()),
        })

    if deg.count() <= broadcast_nodes_max:
        ref = _broadcast_node_lookup(deg)

        def lookup(b: pa.Table) -> pa.Table:
            narr, darr = ray.get(ref)      # zero-copy local read
            a = b["node_a"].to_numpy(zero_copy_only=False)
            c = b["node_b"].to_numpy(zero_copy_only=False)
            return score(b, darr[np.searchsorted(narr, a)],
                         darr[np.searchsorted(narr, c)])

        return inter.map_batches(lookup, batch_format="pyarrow")

    # the pair table is the OUTPUT-sized side: both joins get the floored
    # P, not the input-sized estimate (the same starvation the exchange
    # comment above documents)
    j1 = shuffle_join(inter, deg, on=("node_a", "v"),
                      left_cols=["node_b", "n_common"], right_cols=["deg"],
                      shuffle_partitions=P)
    j1 = j1.map_batches(lambda b: b.rename_columns(
        ["deg_a" if c == "deg" else c for c in b.column_names]),
        batch_format="pyarrow")
    j2 = shuffle_join(j1, deg, on=("node_b", "v"),
                      left_cols=["node_a", "n_common", "deg_a"],
                      right_cols=["deg"],
                      shuffle_partitions=P)

    def score_joined(b: pa.Table) -> pa.Table:
        return score(b, b["deg_a"].to_numpy(zero_copy_only=False),
                     b["deg"].to_numpy(zero_copy_only=False))

    return j2.map_batches(score_joined, batch_format="pyarrow")


def kcore(edges_ds, k: int, src: str = "src", dst: str = "dst",
          max_rounds: int = 10, shuffle_partitions: int | None = None,
          broadcast_nodes_max: int = 5_000_000):
    """k-core decomposition by iterative peeling (Seidman 1983): treat the
    input as an UNDIRECTED simple graph (both orientations unioned,
    self-loops dropped, globally distinct), repeatedly delete every node
    of degree < k until none remains, and return the surviving core as
    (node, deg) — deg is the node's degree WITHIN the final core, so
    every emitted deg >= k. The standard web-graph densest-region /
    community-seed primitive.

    Peeling is a fixpoint, so the result is independent of round
    grouping; a DuckDB oracle that unrolls ``max_rounds`` peel rounds as
    chained CTEs matches exactly PROVIDED the engine converged within the
    same bound — the engine raises (fail loud, like the connected-
    components round cap) if a round ``max_rounds`` still has sub-k
    nodes, rather than silently returning a non-core.

    Shape per round: one node-sized bucketed degree count over the
    current edge set, a driver-side scalar count of sub-k nodes (the
    only driver-resident value), then an edge filter. While the victim
    set fits ``broadcast_nodes_max`` the filter is a broadcast
    ``np.isin`` streamed over the edges (no exchange); above it the
    survivor set semi-joins the edges twice (two bucketed exchanges).
    Each round's edge set is materialized because two consumers read it
    (degree count + filter); block count stays at the exchange
    granularity — no union growth across rounds."""
    import ray

    from bionext_ray.ops.relational import shuffle_join

    def sym(b: pa.Table) -> pa.Table:
        s = pa.compute.cast(b[src], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = pa.compute.cast(b[dst], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    cur = distinct_edges(edges_ds.map_batches(sym, batch_format="pyarrow"),
                         shuffle_partitions=shuffle_partitions)
    cur = cur.materialize()

    for rnd in range(max_rounds + 1):
        # symmetric edge table: out-degree IS the undirected degree
        deg = out_degrees(cur,
                          shuffle_partitions=shuffle_partitions)
        deg = deg.materialize()            # read 2-3x below

        def split(keep_core: bool):
            def fn(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                m = pc.greater_equal(b["deg"], k)
                return b.filter(m if keep_core else pc.invert(m))
            return fn

        # materialized: count + (on the broadcast path) the collect below
        # read the same pass instead of re-running the filter
        bad = deg.map_batches(split(False),
                              batch_format="pyarrow").materialize()
        n_bad = bad.count()
        if n_bad == 0:
            return deg.map_batches(
                lambda b: pa.table({"node": b["v"], "deg": b["deg"]}),
                batch_format="pyarrow")
        if rnd == max_rounds:
            raise RuntimeError(
                f"kcore: not converged after {max_rounds} rounds "
                f"({n_bad} sub-{k} nodes remain) — raise max_rounds AND "
                "the oracle's unroll depth together")

        if n_bad <= broadcast_nodes_max:
            bad_arr = np.sort(np.concatenate(
                [t["v"].to_numpy(zero_copy_only=False)
                 for t in ray.get(bad.to_arrow_refs()) if t.num_rows]
                or [np.array([], np.int64)]).astype(np.int64))
            ref = ray.put(bad_arr)

            def drop(b: pa.Table) -> pa.Table:
                barr = ray.get(ref)
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                keep = ~(np.isin(s, barr) | np.isin(d, barr))
                return b.filter(pa.array(keep))

            cur = cur.map_batches(drop, batch_format="pyarrow").materialize()
        else:
            surv = deg.map_batches(split(True), batch_format="pyarrow")
            surv = surv.select_columns(["v"]).materialize()
            half = shuffle_join(cur, surv, on=("src", "v"),
                                left_cols=["dst"], right_cols=[],
                                shuffle_partitions=shuffle_partitions)
            cur = shuffle_join(half, surv, on=("dst", "v"),
                               left_cols=["src"], right_cols=[],
                               shuffle_partitions=shuffle_partitions)
            cur = cur.materialize()


def clustering_coeff(edges_ds, src: str = "src", dst: str = "dst",
                     shuffle_partitions: int | None = None,
                     broadcast_nodes_max: int = 5_000_000,
                     broadcast_edges_max: int = 4_000_000):
    """Local clustering coefficient per node (Watts & Strogatz 1998) over
    the UNDIRECTED simple graph induced by the edge table: for every node
    of degree >= 2, the number of triangles through it and
    lcc_ppm = (1_000_000 * 2 * n_tri) // (deg * (deg - 1)) — integer
    floor arithmetic end-to-end so a DuckDB triangle-enumeration oracle
    matches bit-for-bit. Output: (node, deg, n_tri, lcc_ppm). The
    standard web-graph community-structure / spam-farm signal, and the
    per-node refinement of :func:`triangle_count` (which returns only the
    global total).

    Shape — the degree-ordered node-iterator, per-node variant: canonical
    distinct undirected edges (1 exchange), undirected degrees (1
    node-sized exchange), degree attach (broadcast searchsorted lookup
    under ``broadcast_nodes_max``, else two bucketed joins), orientation
    lower-(deg, id) -> higher, ONE apex-bucketed exchange enumerating
    each apex's oriented-neighbour pairs vectorized (the superlinear
    stage; Schank & Wagner 2005 bounds oriented out-degree by O(sqrt m),
    so per-apex fan-out stays bounded on power-law graphs), then the
    closing-edge test: a broadcast sorted-composite-key ``searchsorted``
    streamed over the wedges while the distinct edge set fits
    ``broadcast_edges_max`` (no exchange), else a composite-key
    ``shuffle_join``. Every matched wedge is ONE triangle crediting all
    three corners; corner credits are pre-binned in-task and fused with
    the degree rows through a single node-sized aggregate (the
    union-tagged pattern from neighbor_jaccard) — zero-triangle nodes
    fall out naturally with n_tri = 0."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from bionext_ray.ops.relational import (_key_buckets, bucketed_agg,
                                            coalesce_for_exchange,
                                            shuffle_join)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = max(16, 2 * ncpu, shuffle_partitions or 0)

    def undirect(b: pa.Table) -> pa.Table:
        u = pa.compute.cast(b[src], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pa.compute.cast(b[dst], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"src": pa.array(np.minimum(u, v), pa.int64()),
                         "dst": pa.array(np.maximum(u, v), pa.int64())})

    und = distinct_edges(edges_ds.map_batches(undirect,
                                              batch_format="pyarrow"),
                         shuffle_partitions=shuffle_partitions)
    und = und.materialize()            # consumed 3x: deg, orient, closing

    def both_ends(b: pa.Table) -> pa.Table:
        vs = np.concatenate([b["src"].to_numpy(zero_copy_only=False),
                             b["dst"].to_numpy(zero_copy_only=False)])
        return pa.table({"v": pa.array(vs.astype(np.int64), pa.int64()),
                         "_c": pa.array(np.ones(len(vs), np.int64))})

    deg = bucketed_agg(und.map_batches(both_ends, batch_format="pyarrow"),
                       ["v"], [("_c", "sum", "deg")],
                       shuffle_partitions=shuffle_partitions)
    deg = deg.materialize()            # consumed 2x: attach + final union

    if deg.count() <= broadcast_nodes_max:
        dref = _broadcast_node_lookup(deg)

        def attach(b: pa.Table) -> pa.Table:
            narr, darr = ray.get(dref)     # zero-copy local read
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            return pa.table({
                "src": b["src"], "dst": b["dst"],
                "deg_src": pa.array(darr[np.searchsorted(narr, s)],
                                    pa.int64()),
                "deg_dst": pa.array(darr[np.searchsorted(narr, d)],
                                    pa.int64())})

        withdeg = und.map_batches(attach, batch_format="pyarrow")
    else:
        withdeg = shuffle_join(und, deg, on=("src", "v"),
                               left_cols=["dst"], right_cols=["deg"],
                               shuffle_partitions=shuffle_partitions)
        withdeg = shuffle_join(
            withdeg.map_batches(
                lambda b: b.rename_columns(["src", "dst", "deg_src"]),
                batch_format="pyarrow"),
            deg, on=("dst", "v"), left_cols=["src", "deg_src"],
            right_cols=["deg"], shuffle_partitions=shuffle_partitions)
        withdeg = withdeg.map_batches(
            lambda b: b.rename_columns(["dst", "src", "deg_src",
                                        "deg_dst"]),
            batch_format="pyarrow")

    # orient lower (deg, id) -> higher (deg, id); total order, no ties
    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ds_ = b["deg_src"].to_numpy(zero_copy_only=False)
        dd = b["deg_dst"].to_numpy(zero_copy_only=False)
        fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
        a = np.where(fwd, s, d)
        x = np.where(fwd, d, s)
        return pa.table({
            "a": pa.array(a, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "degx": pa.array(np.where(fwd, dd, ds_).astype(np.int64),
                             pa.int64()),
            "__bucket": pa.array(_key_buckets(a, P), pa.int64())})

    oriented = withdeg.map_batches(orient, batch_format="pyarrow")
    oriented = oriented.materialize()  # consumed 2x: wedges + closing set

    def expand(g: pd.DataFrame) -> pa.Table:
        # per-apex neighbour pairs in (deg, id) order, so (wx, wy) is
        # stored in the SAME orientation as the closing edge (if any)
        g = g.sort_values(["a", "degx", "x"], kind="mergesort")
        xs = g["x"].to_numpy()
        avals = g["a"].to_numpy()
        sizes = g.groupby("a", sort=False).size().to_numpy()
        li, ri = _pairs_within_groups(sizes)
        return pa.table({
            "apex": pa.array(avals[li], pa.int64()),
            "wx": pa.array(xs[li], pa.int64()),
            "wy": pa.array(xs[ri], pa.int64())})

    wedges = (coalesce_for_exchange(oriented, P)
              .groupby("__bucket")
              .map_groups(expand, batch_format="pandas"))

    if und.count() <= broadcast_edges_max:
        tabs = [t for t in ray.get(oriented.to_arrow_refs()) if t.num_rows]
        if tabs:
            t = pa.concat_tables(tabs)
            ea = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            ex = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            nodes = np.unique(np.concatenate([ea, ex]))
            n = np.int64(len(nodes))
            keys = np.sort(np.searchsorted(nodes, ea) * n
                           + np.searchsorted(nodes, ex))
        else:
            nodes = np.array([], np.int64)
            n, keys = np.int64(0), np.array([], np.int64)
        eref = ray.put((nodes, n, keys))

        def close(b: pa.Table) -> pa.Table:
            nodes, n, keys = ray.get(eref)
            if not b.num_rows or not len(keys):
                return pa.table({"apex": pa.array([], pa.int64()),
                                 "wx": pa.array([], pa.int64()),
                                 "wy": pa.array([], pa.int64())})
            wx = b["wx"].to_numpy(zero_copy_only=False)
            wy = b["wy"].to_numpy(zero_copy_only=False)
            # wedge endpoints are edge sources/targets, so both are
            # guaranteed present in the broadcast node vector
            key = np.searchsorted(nodes, wx) * n + np.searchsorted(
                nodes, wy)
            pos = np.minimum(np.searchsorted(keys, key), len(keys) - 1)
            return b.filter(pa.array(keys[pos] == key))

        closed = wedges.map_batches(close, batch_format="pyarrow")
    else:
        closed = shuffle_join(wedges, oriented.select_columns(["a", "x"]),
                              on=[("wx", "a"), ("wy", "x")],
                              left_cols=["apex"], right_cols=[],
                              shuffle_partitions=max(
                                  shuffle_partitions or 0, P))

    def tri_partials(b: pa.Table) -> pa.Table:
        vs = np.concatenate([b[c].to_numpy(zero_copy_only=False)
                             for c in ("apex", "wx", "wy")]).astype(np.int64)
        u, c = np.unique(vs, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "deg": pa.array(np.zeros(len(u), np.int64)),
                         "tri": pa.array(c.astype(np.int64), pa.int64())})

    def deg_partials(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, np.int64)
        return pa.table({"v": b["v"], "deg": b["deg"],
                         "tri": pa.array(z, pa.int64())})

    fused = bucketed_agg(
        closed.map_batches(tri_partials, batch_format="pyarrow")
        .union(deg.map_batches(deg_partials, batch_format="pyarrow")),
        ["v"], [("deg", "sum", "deg"), ("tri", "sum", "n_tri")],
        shuffle_partitions=shuffle_partitions)

    def final(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["deg"], 2))
        d = b["deg"].to_numpy(zero_copy_only=False)
        t = b["n_tri"].to_numpy(zero_copy_only=False)
        lcc = np.zeros(len(d), np.int64) if not len(d) else \
            (1_000_000 * 2 * t) // (d * (d - 1))
        return pa.table({"node": b["v"], "deg": b["deg"],
                         "n_tri": b["n_tri"],
                         "lcc_ppm": pa.array(lcc, pa.int64())})

    return fused.map_batches(final, batch_format="pyarrow")


def label_propagation(edges_ds, rounds: int = 2, src: str = "src",
                      dst: str = "dst",
                      shuffle_partitions: int | None = None,
                      broadcast_edges_max: int = 4_000_000):
    """Synchronous label propagation (Raghavan et al. 2007, made
    deterministic): over the UNDIRECTED simple graph, every node starts
    labelled with its own id and each round SIMULTANEOUSLY adopts the
    label most frequent among its neighbours, ties broken by the SMALLEST
    label — so the result is a pure function of (graph, rounds),
    independent of block layout, and a DuckDB oracle that unrolls the
    same ``rounds`` as chained CTEs matches exactly. Runs a FIXED number
    of rounds (community detection converges in a handful of sweeps;
    a fixpoint check would make the oracle depth data-dependent).
    Returns (node, label) after the final round — connected regions
    collapse toward hub-anchored communities, the classic cheap
    web-graph community / spam-cluster primitive (contrast
    :func:`connected_components` in ops/dedup.py, which ignores edge
    multiplicity inside a component).

    Shape, gated like the other centrality ops: while the DISTINCT
    symmetric edge count fits ``broadcast_edges_max`` the whole loop
    runs with ZERO per-round exchanges — labels broadcast as two sorted
    int64 arrays (16 B/node, re-``ray.put`` each round), each edge block
    emits in-task (node, label, n) partials, and the node-sized argmax
    reduce runs on the driver (partial rows are bounded by the gated
    edge count, the same driver bound as the triangle broadcast path;
    the O(E) scan stays distributed, only node-sized state is
    driver-resident). Above the gate, each round is a bucketed
    ``shuffle_join`` label attach + ONE node-bucketed argmax exchange
    (count desc, label asc — mergesort + boundary mask, no per-node
    Python), the 100-TB path. Every node appears as a source in the
    symmetric edge table, so each round relabels every non-isolated
    node; isolated nodes never enter an edge-derived graph."""
    import pandas as pd
    import ray

    from bionext_ray.ops.relational import (_key_buckets,
                                            coalesce_for_exchange,
                                            shuffle_join)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = max(16, 2 * ncpu, shuffle_partitions or 0)

    def sym(b: pa.Table) -> pa.Table:
        s = pa.compute.cast(b[src], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = pa.compute.cast(b[dst], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    edges = distinct_edges(edges_ds.map_batches(sym, batch_format="pyarrow"),
                           shuffle_partitions=shuffle_partitions)
    edges = edges.materialize()        # consumed once per round

    def _argmax(df: pd.DataFrame) -> pd.DataFrame:
        # per-node (count desc, label asc) argmax, fully vectorized:
        # after sorting by (node, -count, label) the winner is each
        # node's first row
        g = (df.groupby(["v", "lbl"], sort=False)["n"].sum().reset_index()
             .sort_values(["v", "n", "lbl"],
                          ascending=[True, False, True],
                          kind="mergesort"))
        first = np.ones(len(g), bool)
        vs = g["v"].to_numpy()
        first[1:] = vs[1:] != vs[:-1]
        return pd.DataFrame({"v": vs[first],
                             "lbl": g["lbl"].to_numpy()[first]})

    # the symmetric table holds 2 rows per undirected edge: gate on the
    # UNDIRECTED count so the cutoff lines up with the sibling ops'
    # canonical-edge gates (clustering_coeff, triangle_count)
    if edges.count() // 2 <= broadcast_edges_max:
        # zero-exchange loop: labels live on the driver (node-sized,
        # bounded by the edge gate), the edge scan fans out per round.
        # Node ids via per-block uniques — only node-sized data reaches
        # the driver, never the edge table itself
        parts = [t for t in ray.get(
            edges.map_batches(
                lambda b: pa.table({"v": pa.array(np.unique(
                    b["src"].to_numpy(zero_copy_only=False)), pa.int64())}),
                batch_format="pyarrow").to_arrow_refs()) if t.num_rows]
        narr = np.unique(np.concatenate(
            [t["v"].to_numpy(zero_copy_only=False) for t in parts]
            or [np.array([], np.int64)]).astype(np.int64))
        larr = narr.copy()               # round 0: label(v) = v

        def nb_partials(lref):
            def fn(b: pa.Table) -> pa.Table:
                nodes, lab = ray.get(lref)
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                part = (pd.DataFrame(
                    {"v": s, "lbl": lab[np.searchsorted(nodes, d)]})
                    .groupby(["v", "lbl"], sort=False)
                    .size().rename("n").reset_index())
                return pa.table({"v": pa.array(part["v"], pa.int64()),
                                 "lbl": pa.array(part["lbl"], pa.int64()),
                                 "n": pa.array(part["n"], pa.int64())})
            return fn

        for _ in range(rounds):
            lref = ray.put((narr, larr))
            parts = [t.to_pandas() for t in ray.get(
                edges.map_batches(nb_partials(lref),
                                  batch_format="pyarrow").to_arrow_refs())
                if t.num_rows]
            if not parts:
                break
            win = _argmax(pd.concat(parts, ignore_index=True))
            # every node re-labels each round (symmetric table), so the
            # winner list covers narr exactly, in sorted order
            assert len(win) == len(narr), "label_propagation: node drift"
            larr = win["lbl"].to_numpy(np.int64)

        return ray.data.from_arrow(pa.table({
            "node": pa.array(narr, pa.int64()),
            "label": pa.array(larr, pa.int64())}))

    # exchange path (the 100-TB shape): per round one bucketed label
    # attach + one node-bucketed argmax exchange
    labels = node_table(edges, shuffle_partitions=shuffle_partitions) \
        .map_batches(lambda b: pa.table({"v": b["v"], "lbl": b["v"]}),
                     batch_format="pyarrow").materialize()

    def argmax_bucket(g: pd.DataFrame) -> pa.Table:
        win = _argmax(g)
        return pa.table({"v": pa.array(win["v"], pa.int64()),
                         "lbl": pa.array(win["lbl"], pa.int64())})

    for _ in range(rounds):
        joined = shuffle_join(edges, labels, on=("dst", "v"),
                              left_cols=["src"], right_cols=["lbl"],
                              shuffle_partitions=P)

        def pre_agg(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            lb = b["lbl"].to_numpy(zero_copy_only=False)
            part = (pd.DataFrame({"v": s, "lbl": lb})
                    .groupby(["v", "lbl"], sort=False)
                    .size().rename("n").reset_index())
            t = pa.table({"v": pa.array(part["v"], pa.int64()),
                          "lbl": pa.array(part["lbl"], pa.int64()),
                          "n": pa.array(part["n"], pa.int64())})
            return t.append_column("__bucket", pa.array(_key_buckets(
                part["v"].to_numpy(np.int64), P), pa.int64()))

        partials = joined.map_batches(pre_agg, batch_format="pyarrow")
        labels = (coalesce_for_exchange(partials, P)
                  .groupby("__bucket")
                  .map_groups(argmax_bucket, batch_format="pandas")
                  .materialize())

    return labels.map_batches(
        lambda b: pa.table({"node": b["v"], "label": b["lbl"]}),
        batch_format="pyarrow")
