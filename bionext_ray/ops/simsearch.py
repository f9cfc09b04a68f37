"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k. Query matrix is broadcast once
  (ray.put); each batch does one float64 GEMM and emits only its local top-k
  partials; the tiny partials are merged on the driver. Nothing but the
  per-batch top-k rows ever leaves a task.
- lsh_topk: random-hyperplane LSH bucketing as the approximate scale path —
  candidates share a hyperplane signature with the query; exact rerank inside
  the candidate set only.

Scores are floored to integer micro-units when exported for SQL-hash
comparison (float formatting never crosses the oracle boundary).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — zero-copy
    flatten + reshape when the lists are non-null and equal-length (the
    embedding-table contract), falling back to the Python path otherwise."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if arr.null_count == 0:
        import pyarrow.compute as pc
        lens = pc.list_value_length(arr).to_numpy()
        if lens.min() == lens.max():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(n, -1)
    return np.array(arr.to_pylist(), dtype=np.float64)


def _cosine_scores(M: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    return (M @ qn) / norms


def brute_force_topk(embeddings_ds, query: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact top-k (id, score) by cosine vs one query vector. Returns a
    small pyarrow Table (k rows), already merged."""
    query = np.asarray(query, dtype=np.float64)
    q_ref = ray.put(query)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        M = _batch_matrix(batch, vec_col)
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "score": pa.array([], pa.float64())})
        s = _cosine_scores(M, q)
        top = np.argsort(-s)[:k]
        return pa.table({id_col: batch[id_col].take(pa.array(top)),
                         "score": pa.array(s[top], pa.float64())})

    partials = embeddings_ds.map_batches(local_topk, batch_format="pyarrow")
    # merge tiny partials driver-side (k rows per block)
    rows = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b[id_col].to_pylist(), b["score"].to_pylist()))
    best = heapq.nsmallest(k, rows, key=lambda r: (-r[1], r[0]))
    return pa.table({
        id_col: pa.array([r[0] for r in best]),
        "score": pa.array([r[1] for r in best], pa.float64()),
    })


def _hyperplanes(dim: int, n_planes: int, seed: int = 23) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_signature(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (M @ planes.T) > 0
    return bits @ (1 << np.arange(planes.shape[0], dtype=np.int64))


def lsh_topk(embeddings_ds, query: np.ndarray, k: int = 10,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 23):
    """Approximate top-k: rerank only vectors whose hyperplane signature
    equals the query's (expected 1/2^n_planes of the table)."""
    query = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(len(query), n_planes, seed)
    q_sig = int(lsh_signature(query[None, :], planes)[0])
    refs = ray.put((query, planes))

    def candidates(batch: pa.Table) -> pa.Table:
        q, pl = ray.get(refs)
        M = _batch_matrix(batch, vec_col)
        if M.shape[0] == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "score": pa.array([], pa.float64())})
        sig = lsh_signature(M, pl)
        mask = sig == q_sig
        idx = np.nonzero(mask)[0]
        s = _cosine_scores(M[idx], q) if len(idx) else np.array([])
        return pa.table({id_col: batch[id_col].take(pa.array(idx)),
                         "score": pa.array(s, pa.float64())})

    partials = embeddings_ds.map_batches(candidates, batch_format="pyarrow")
    rows = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b[id_col].to_pylist(), b["score"].to_pylist()))
    best = heapq.nsmallest(k, rows, key=lambda r: (-r[1], r[0]))
    return pa.table({
        id_col: pa.array([r[0] for r in best]),
        "score": pa.array([r[1] for r in best], pa.float64()),
    })


def ranked_ids(topk_table: pa.Table, id_col: str = "vec_id") -> pa.Table:
    """(rank, id) integer view of a top-k result for hash-exact comparison."""
    return pa.table({
        "rank": pa.array(range(1, topk_table.num_rows + 1), pa.int64()),
        id_col: topk_table[id_col],
    })


# --------------------------------------------------------------- IVF variant
def build_ivf_centroids(sample: np.ndarray, n_centroids: int = 16,
                        iters: int = 10, seed: int = 31) -> np.ndarray:
    """Seeded Lloyd's k-means over a driver-side sample (the coarse
    quantizer). Deterministic: fixed init from a seeded permutation, fixed
    iteration count."""
    rng = np.random.RandomState(seed)
    n = sample.shape[0]
    n_centroids = min(n_centroids, n)
    C = sample[rng.permutation(n)[:n_centroids]].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            pts = sample[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)
    return C


def ivf_topk(embeddings_ds, query: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, sample_n: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 31):
    """IVF-style approximate top-k: train a coarse quantizer on a sample,
    probe only the nprobe centroids nearest the query. Each batch computes
    its rows' centroid assignments (one small GEMM) and scores only rows in
    probed cells — the scale path when brute force over every row is too
    expensive."""
    query = np.asarray(query, dtype=np.float64)
    sample_rows = embeddings_ds.limit(sample_n).select_columns([vec_col]).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    C = build_ivf_centroids(sample, n_centroids, seed=seed)
    qd = ((C - query[None, :]) ** 2).sum(axis=1)
    probed = set(np.argsort(qd)[:nprobe].tolist())
    refs = ray.put((query, C, frozenset(probed)))

    def score(batch: pa.Table) -> pa.Table:
        q, cents, cells = ray.get(refs)
        M = _batch_matrix(batch, vec_col)
        if M.shape[0] == 0:
            return pa.table({id_col: batch[id_col],
                             "score": pa.array([], pa.float64())})
        d = ((M[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.array([a in cells for a in assign])
        idx = np.nonzero(mask)[0]
        s = _cosine_scores(M[idx], q) if len(idx) else np.array([])
        return pa.table({id_col: batch[id_col].take(pa.array(idx)),
                         "score": pa.array(s, pa.float64())})

    partials = embeddings_ds.map_batches(score, batch_format="pyarrow")
    rows = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b[id_col].to_pylist(), b["score"].to_pylist()))
    best = heapq.nsmallest(k, rows, key=lambda r: (-r[1], r[0]))
    return pa.table({
        id_col: pa.array([r[0] for r in best]),
        "score": pa.array([r[1] for r in best], pa.float64()),
    })


def grouped_centroids(embeddings_ds, key_col: str, vec_col: str,
                      shuffle_partitions: int | None = 16):
    """Per-group centroid of an embedding column — the class-prototype /
    cluster-center computation an embedding pipeline runs constantly
    (label prototypes, per-language mean vectors, IVF retrain) — with an
    integer contract the SQL oracle mirrors exactly:

        centroid_micro(key, d) = SUM(floor(v_d * 1e6)) // COUNT(*)

    with // the SQL integer division (TRUNCATES toward zero — numpy's
    floor-div differs on negative sums, so the kernel mirrors SQL, not
    numpy).

    Output rows: (key, dim, centroid_micro), one per key x dimension.

    Scale shape: per batch, ONE zero-copy matrix extraction + a pandas
    grouped sum over all dims at once reduces the batch to (keys x dim)
    partial rows; partials flow through the low-cardinality
    ``partial_final_agg`` (keys ~ label count, never ~ rows). The floor-
    then-sum integer order is load-bearing: floats never cross the
    exchange, so the result is bit-identical at any parallelism."""
    import pandas as pd

    from bionext_ray.ops.relational import partial_final_agg

    def partial(batch: pa.Table) -> pa.Table:
        M = _batch_matrix(batch, vec_col)
        micro = np.floor(M * 1_000_000).astype(np.int64)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(micro)
        df["__k"] = keys
        g = df.groupby("__k", sort=False)
        sums = g.sum()
        ns = g.size()
        dim = micro.shape[1] if micro.size else 0
        k_rep = np.repeat(sums.index.to_numpy(), dim)
        return pa.table({
            # type-preserving key (string language/label keys included —
            # an int64 cast here crashed on the docstring's own use case)
            key_col: pa.array(k_rep.tolist(),
                              type=batch.schema.field(key_col).type),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(sums)), pa.int64()),
            "s": pa.array(sums.to_numpy().reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(ns.to_numpy(), dim), pa.int64())})

    agg = partial_final_agg(
        embeddings_ds.map_batches(partial, batch_format="pyarrow"),
        [key_col, "dim"], [("s", "sum", "s"), ("n", "sum", "n")],
        shuffle_partitions=shuffle_partitions)

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        q = (np.abs(s) // n) * np.sign(s)      # SQL trunc-toward-zero //
        return pa.table({
            key_col: b[key_col], "dim": b["dim"],
            "centroid_micro": pa.array(q, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
