"""Deduplication operators for a large documents table.

- exact_dedup: content-hash + hash-partitioned per-group first (the canonical
  exact-dedup shuffle; SURVEY.md D5).
- minhash_lsh: shingle -> minhash signature -> banded LSH buckets -> candidate
  pairs -> Jaccard verify. The per-batch signature step is vectorized numpy;
  only (band, bucket) rows cross the shuffle.
- simhash: 64-bit simhash per doc + bucket by high bits for near-dup grouping.
- ngram_jaccard_pairs: exact n-gram Jaccard over LSH candidates (verification
  step, doc-pair local).

All hashing is keyed blake2b/md5 (process-independent; never Python hash()).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Min

_MERSENNE = (1 << 61) - 1


def _text_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
          for t in batch[text_col].to_pylist()]
    return batch.append_column("text_hash", pa.array(hs, pa.string()))


def exact_dedup(documents_ds, id_col: str = "doc_id", text_col: str = "text",
                shuffle_partitions: int | None = None):
    """One row per distinct text: (text_hash, keeper id = min id).

    Per batch: vectorized hash + in-block combine (distinct hash -> min id),
    so only (hash, id) partials cross the shuffle. ``shuffle_partitions``
    (from ops.relational.estimate_partitions on the input size) coalesces the
    partials before the final groupby — the hash key is high-cardinality, so
    the right partition count tracks the DATA size, not Ray's input block
    heuristic."""
    def combine(b: pa.Table) -> pa.Table:
        t = _text_md5(b, text_col).select(["text_hash", id_col])
        g = t.group_by(["text_hash"]).aggregate([(id_col, "min")])
        return pa.table({"text_hash": g["text_hash"],
                         id_col: g[f"{id_col}_min"]})

    hashed = documents_ds.map_batches(combine, batch_format="pyarrow")
    if shuffle_partitions is not None:
        hashed = hashed.repartition(shuffle_partitions)
    return hashed.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------- MinHash/LSH
def _shingles(words: list[str], k: int) -> set[int]:
    out = set()
    for i in range(max(0, len(words) - k + 1)):
        sh = " ".join(words[i:i + k])
        h = int.from_bytes(
            hashlib.blake2b(sh.encode("utf-8"), digest_size=8).digest(),
            "little")
        out.add(h & 0x7FFF_FFFF_FFFF_FFFF)  # keep within int64
    return out


def _perm_params(n_perm: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, 1 << 62, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(batch: pa.Table, n_perm: int = 64, shingle_k: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc minhash signature (vectorized: one (shingles x perms) modular
    multiply per doc)."""
    a, b = _perm_params(n_perm)
    ids = batch[id_col].to_pylist()
    sigs = []
    for t in batch[text_col].to_pylist():
        sh = _shingles((t or "").lower().split(" "), shingle_k)
        if not sh:
            sigs.append(np.full(n_perm, _MERSENNE, dtype=np.int64))
            continue
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        # (n_shingles, n_perm) hash: uint64 wraparound multiply-add then
        # reduce mod 2^61-1 — deterministic everywhere, LSH-quality mixing
        vals = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        sigs.append(vals.min(axis=0).astype(np.int64))
    return pa.table({
        id_col: batch[id_col],
        "signature": pa.array([s.tolist() for s in sigs], pa.list_(pa.int64())),
    })


def lsh_bands(batch: pa.Table, n_bands: int = 16,
              id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) bucket rows."""
    ids = batch[id_col].to_pylist()
    sigs = batch["signature"].to_pylist()
    rows = {"band_id": [], "band_hash": [], id_col: []}
    for did, sig in zip(ids, sigs):
        rows_per_band = len(sig) // n_bands
        for bnd in range(n_bands):
            chunk = sig[bnd * rows_per_band:(bnd + 1) * rows_per_band]
            h = hashlib.blake2b(
                b"|".join(str(v).encode() for v in chunk),
                digest_size=8).hexdigest()
            rows["band_id"].append(bnd)
            rows["band_hash"].append(h)
            rows[id_col].append(did)
    return pa.table({
        "band_id": pa.array(rows["band_id"], pa.int32()),
        "band_hash": pa.array(rows["band_hash"], pa.string()),
        id_col: pa.array(rows[id_col]),
    })


def minhash_lsh_candidates(documents_ds, n_perm: int = 64, n_bands: int = 16,
                           shingle_k: int = 3, id_col: str = "doc_id",
                           text_col: str = "text",
                           shuffle_partitions: int | None = None):
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    Pipeline: map_batches(signatures) -> map_batches(bands) ->
    groupby(band) -> per-group pair emission -> distinct pairs."""
    import pandas as pd

    import ray
    from ray.data.aggregate import Count

    from .relational import partial_final_agg

    sigs = documents_ds.map_batches(
        lambda b: minhash_signatures(b, n_perm, shingle_k, id_col, text_col),
        batch_format="pyarrow")
    bands = sigs.map_batches(lambda b: lsh_bands(b, n_bands, id_col),
                             batch_format="pyarrow")
    # bands is consumed twice (occupancy counts, then pair emission) and is
    # small (n_docs x n_bands fixed-width rows, ~50 bytes/row even at 10^9
    # docs it's checkpoint-sized) -> pin it instead of recomputing signatures
    bands = bands.materialize()

    # Most buckets hold exactly one doc; a naive groupby().map_groups walks
    # every singleton group serially. Instead: (1) cheap counted groupby of
    # bucket occupancy, (2) keep only collision buckets (the actual near-dup
    # signal, normally a tiny fraction), (3) broadcast those keys, filter the
    # band rows down to them, and only then co-locate per bucket to emit
    # pairs. The expensive path now runs over collisions only.
    def ones(b: pa.Table) -> pa.Table:
        return b.append_column("one", pa.array([1] * b.num_rows, pa.int64()))

    counts = partial_final_agg(
        bands.map_batches(ones, batch_format="pyarrow"),
        ["band_id", "band_hash"], [("one", "sum", "n")],
        shuffle_partitions=shuffle_partitions)
    hot = counts.map_batches(
        lambda b: b.filter(pa.compute.greater(b["n"], 1)),
        batch_format="pyarrow")
    hot_keys = {(r["band_id"], r["band_hash"])
                for r in hot.select_columns(["band_id", "band_hash"]).take_all()}
    if not hot_keys:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "n_shared_bands": pa.array([], pa.int64())}))
    keys_ref = ray.put(frozenset(hot_keys))

    def keep_hot(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        bid = b["band_id"].to_pylist()
        bh = b["band_hash"].to_pylist()
        mask = pa.array([(i, h) in keys for i, h in zip(bid, bh)])
        return b.filter(mask)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].tolist())
        pairs = list(itertools.combinations(ids, 2))
        return pd.DataFrame({"id_a": [p[0] for p in pairs],
                             "id_b": [p[1] for p in pairs]})

    collisions = bands.map_batches(keep_hot, batch_format="pyarrow")
    pairs = collisions.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas")
    # distinct candidate pairs (same pair can collide in several bands)
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Count(alias_name="n_shared_bands"))


def jaccard(a: str, b: str, shingle_k: int = 3) -> float:
    sa = _shingles(a.lower().split(" "), shingle_k)
    sb = _shingles(b.lower().split(" "), shingle_k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------- SimHash
def simhash_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text", prefix_bits: int = 16) -> pa.Table:
    """64-bit word-feature simhash + a high-bit bucket column for grouping."""
    ids = batch[id_col].to_pylist()
    out_h, out_b = [], []
    for t in batch[text_col].to_pylist():
        acc = np.zeros(64, dtype=np.int64)
        for w in set((t or "").lower().split(" ")):
            h = int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
                "little")
            bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
            acc += 2 * bits - 1
        val = 0
        for i in range(64):
            if acc[i] > 0:
                val |= (1 << i)
        out_h.append(f"{val:016x}")
        out_b.append(val >> (64 - prefix_bits))
    return pa.table({
        id_col: batch[id_col],
        "simhash": pa.array(out_h, pa.string()),
        "bucket": pa.array(out_b, pa.int64()),
    })


# ------------------------------------------------------- embedding near-dup
def embedding_neardup(embeddings_ds, threshold: float = 0.95,
                      n_planes: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding", seed: int = 29):
    """Near-duplicate pairs by embedding cosine: random-hyperplane LSH
    bucketing (cheap, shuffle ships only (bucket, id, vector) rows), then
    exact pairwise cosine >= threshold inside each bucket. Bucket count is
    2^n_planes — size n_planes so the expected bucket occupancy stays small
    at the target scale."""
    import pandas as pd

    from .simsearch import _hyperplanes, lsh_signature

    def bucketize(batch: pa.Table) -> pa.Table:
        M = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        if M.shape[0] == 0:
            return pa.table({id_col: batch[id_col],
                             "bucket": pa.array([], pa.int64()),
                             vec_col: batch[vec_col]})
        planes = _hyperplanes(M.shape[1], n_planes, seed)
        sig = lsh_signature(M, planes)
        return pa.table({id_col: batch[id_col],
                         "bucket": pa.array(sig, pa.int64()),
                         vec_col: batch[vec_col]})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].tolist()
        M = np.array(g[vec_col].tolist(), dtype=np.float64)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "cos_micro": pd.Series([], dtype="int64")})
        if len(ids) < 2:
            return empty
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        S = (M / norms[:, None]) @ (M / norms[:, None]).T
        out_a, out_b, out_s = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if S[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(int(np.floor(S[i, j] * 1_000_000)))
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "cos_micro": out_s})

    bucketed = embeddings_ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(pairs_in_bucket,
                                                 batch_format="pandas")


def verify_jaccard_pairs(documents_ds, candidate_pairs, threshold: float = 0.8,
                         shingle_k: int = 3, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Exact n-gram Jaccard verification of LSH candidate pairs. The
    candidate set is small by construction (collision buckets only), so the
    involved documents' texts are fetched once and broadcast; verification is
    a stateless map over the pair rows."""
    import ray

    if isinstance(candidate_pairs, pa.Table):
        pairs_t = candidate_pairs
    elif hasattr(candidate_pairs, "to_arrow"):        # ray Dataset
        pairs_t = candidate_pairs.to_arrow()
    else:                                             # pandas DataFrame
        pairs_t = pa.Table.from_pandas(candidate_pairs)
    if pairs_t.num_rows == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard_micro": pa.array([], pa.int64())})
    involved = set(pairs_t["id_a"].to_pylist()) | set(pairs_t["id_b"].to_pylist())
    inv_ref = ray.put(frozenset(involved))

    def grab(batch: pa.Table) -> pa.Table:
        keep = ray.get(inv_ref)
        mask = pa.array([i in keep for i in batch[id_col].to_pylist()])
        return batch.filter(mask)

    texts_tbl = (documents_ds.map_batches(grab, batch_format="pyarrow")
                 .select_columns([id_col, text_col]).take_all())
    texts = {r[id_col]: r[text_col] for r in texts_tbl}

    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs_t["id_a"].to_pylist(), pairs_t["id_b"].to_pylist()):
        j = jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(int(np.floor(j * 1_000_000)))
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "jaccard_micro": pa.array(out_j, pa.int64())})
