"""Deduplication operators for a large documents table.

- exact_dedup: content-hash + hash-partitioned per-group first (the canonical
  exact-dedup shuffle; SURVEY.md D5).
- minhash_lsh: shingle -> minhash signature -> banded LSH buckets -> candidate
  pairs -> Jaccard verify. The per-batch signature step is vectorized numpy;
  only (band, bucket) rows cross the shuffle.
- simhash: 64-bit simhash per doc + bucket by high bits for near-dup grouping.
- verify_jaccard_pairs: exact n-gram Jaccard over LSH candidates, fully
  distributed (bucketed text joins, each doc shingled once per bucket).
- embedding_neardup / embedding_pairs_exact: cosine near-dup (LSH scale path
  + broadcast-GEMM verification baseline).
- connected_components: cluster ids over the pair graph (min-label
  propagation, one bucketed exchange + min-groupby per round).

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
_MIX = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd constant


def _word_hash(w: str, memo: dict[str, int]) -> int:
    h = memo.get(w)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
            "little")
        memo[w] = h
    return h


def _shingle_hashes(words: list[str], k: int,
                    memo: dict[str, int] | None = None) -> np.ndarray:
    """Unique k-shingle hashes as a uint64 array (63-bit range).

    Each word is blake2b-hashed once (memo shared across a batch so repeated
    vocabulary costs nothing); the k-gram hash is a vectorized polynomial
    combine of the k word hashes — no per-shingle string join or digest."""
    n = len(words)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    if memo is None:
        memo = {}
    wh = np.fromiter((_word_hash(w, memo) for w in words),
                     dtype=np.uint64, count=n)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _MIX + wh[j:j + m]
        # xor-shift finalizer so low bits depend on every word
        h ^= h >> np.uint64(31)
        h *= _MIX
    h &= np.uint64(0x7FFF_FFFF_FFFF_FFFF)  # keep within int64
    return np.unique(h)


def _shingles(words: list[str], k: int) -> set[int]:
    """Set view of _shingle_hashes (kept for the scalar jaccard API)."""
    return set(_shingle_hashes(words, k).tolist())


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
    memo: dict[str, int] = {}   # word-hash cache shared across the batch
    sigs = []
    with np.errstate(over="ignore"):
        for t in batch[text_col].to_pylist():
            x = _shingle_hashes((t or "").lower().split(" "), shingle_k, memo)
            if x.size == 0:
                sigs.append(np.full(n_perm, _MERSENNE, dtype=np.int64))
                continue
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
    """Explode signatures to (band_id, band_hash, doc_id) bucket rows.

    Fully vectorized: signatures reshape to (n_docs, n_bands, rows_per_band)
    and each band key is a polynomial combine along the last axis — one
    int64 per band row instead of a hex digest string, so the bucket shuffle
    ships fixed-width rows."""
    n_docs = batch.num_rows
    if n_docs == 0:
        return pa.table({
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.int64()),
            id_col: batch[id_col],
        })
    sig = np.asarray(batch["signature"].to_pylist(),
                     dtype=np.uint64)             # (n_docs, n_perm)
    rows_per_band = sig.shape[1] // n_bands
    chunks = sig[:, :n_bands * rows_per_band].reshape(
        n_docs, n_bands, rows_per_band)
    with np.errstate(over="ignore"):
        h = np.zeros((n_docs, n_bands), dtype=np.uint64)
        for j in range(rows_per_band):
            h = h * _MIX + chunks[:, :, j]
        h ^= h >> np.uint64(33)
        h *= _MIX
    h &= np.uint64(0x7FFF_FFFF_FFFF_FFFF)
    band_ids = np.tile(np.arange(n_bands, dtype=np.int32), n_docs)
    doc_idx = np.repeat(np.arange(n_docs), n_bands)
    return pa.table({
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(h.reshape(-1).astype(np.int64), pa.int64()),
        id_col: batch[id_col].take(pa.array(doc_idx, pa.int64())),
    })


def minhash_lsh_candidates(documents_ds, n_perm: int = 64, n_bands: int = 16,
                           shingle_k: int = 3, id_col: str = "doc_id",
                           text_col: str = "text",
                           shuffle_partitions: int | None = None):
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.

    Exactly two exchanges, both on a low-cardinality hash-bucket key so the
    per-key work runs vectorized INSIDE each group rather than one Python
    call per band bucket (band buckets are ~all singletons — a per-bucket
    map_groups walk is the classic serial trap):

      signatures -> band rows -> groupby(band-key % P) ->
        [run-length collision scan, combinations per hot key] ->
      pair rows -> groupby(pair-key % P) -> [vectorized pandas dedup+count]

    P (from ``shuffle_partitions`` = estimate_partitions on the input)
    scales with data size; band rows are fixed-width (band_hash is int64,
    not a digest string), so the exchange ships ~24 bytes/row."""
    import pandas as pd

    P = max(16, shuffle_partitions or 0)

    sigs = documents_ds.map_batches(
        lambda b: minhash_signatures(b, n_perm, shingle_k, id_col, text_col),
        batch_format="pyarrow")
    bands = sigs.map_batches(lambda b: lsh_bands(b, n_bands, id_col),
                             batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        bid = b["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = b["band_hash"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            key = bh * np.int64(1_000_003) + bid  # distinct (band,hash)->key
        return pa.table({
            "kbucket": pa.array(np.abs(key) % P, pa.int64()),
            "bkey": pa.array(key, pa.int64()),
            id_col: b[id_col],
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["bkey"].to_numpy(), kind="stable")
        keys = g["bkey"].to_numpy()[order]
        ids = g[id_col].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):     # only hot keys do real work
            if e - s > 1:
                for a, b in itertools.combinations(sorted(ids[s:e]), 2):
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"id_a": pd.Series(out_a, dtype=ids.dtype),
                             "id_b": pd.Series(out_b, dtype=ids.dtype)})

    pairs = (bands.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("kbucket")
             .map_groups(pairs_in_bucket, batch_format="pandas"))

    def add_pair_bucket(b: pa.Table) -> pa.Table:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        if np.issubdtype(ia.dtype, np.integer):
            with np.errstate(over="ignore"):
                k = ia.astype(np.int64, copy=False) * np.int64(2_654_435_761)
        else:
            k = np.fromiter(
                (int.from_bytes(hashlib.blake2b(
                    str(x).encode(), digest_size=8).digest(), "little")
                 for x in ia), np.uint64, len(ia)).astype(np.int64)
        return b.append_column("pbucket",
                               pa.array(np.abs(k) % P, pa.int64()))

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        out = (g[["id_a", "id_b"]]
               .groupby(["id_a", "id_b"], sort=False).size()
               .rename("n_shared_bands").reset_index())
        out["n_shared_bands"] = out["n_shared_bands"].astype("int64")
        return out

    # the same pair can collide in several bands (and land in several
    # kbuckets) -> second bucketed exchange dedups and counts shared bands
    return (pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
            .groupby("pbucket")
            .map_groups(dedup_count, batch_format="pandas"))


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
    """64-bit word-feature simhash + a high-bit bucket column for grouping.

    Vectorized over the batch vocabulary: one Arrow split/lower pass, one
    pandas drop_duplicates for the per-doc word SETS, one blake2b per
    distinct vocabulary word (not per occurrence), then the 64 bit-counts
    accumulate for all docs at once via a scatter-add over the (doc, word)
    incidence — no per-row/per-word Python loop."""
    import pandas as pd
    import pyarrow.compute as pc

    n_docs = batch.num_rows
    weights = np.arange(64, dtype=np.uint64)
    if n_docs == 0:
        return pa.table({id_col: batch[id_col],
                         "simhash": pa.array([], pa.string()),
                         "bucket": pa.array([], pa.int64())})
    words = pc.split_pattern(
        pc.utf8_lower(pc.coalesce(batch[text_col], "")), " ")
    lengths = pc.list_value_length(words).to_numpy()
    flat = pc.list_flatten(words).to_pandas()
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    # per-doc word SET: drop duplicate (doc, word) incidences (C kernel)
    inc = pd.DataFrame({"d": doc_idx, "w": flat}).drop_duplicates()
    vocab, w_idx = np.unique(inc["w"].to_numpy(), return_inverse=True)
    # one keyed digest per distinct vocabulary word in the batch
    hv = np.fromiter(
        (int.from_bytes(hashlib.blake2b(w.encode("utf-8"),
                                        digest_size=8).digest(), "little")
         for w in vocab), np.uint64, len(vocab))
    vocab_bits = ((hv[:, None] >> weights[None, :])
                  & np.uint64(1)).astype(np.int64)       # (V, 64)
    acc = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(acc, inc["d"].to_numpy(), vocab_bits[w_idx])
    n_words = np.bincount(inc["d"].to_numpy(), minlength=n_docs)
    # acc holds ones-count; sign test is 2*acc - n_words > 0
    pos = (2 * acc) > n_words[:, None]
    vals = np.bitwise_or.reduce(
        pos.astype(np.uint64) << weights[None, :], axis=1)
    out_h = [f"{int(v):016x}" for v in vals]
    out_b = (vals >> np.uint64(64 - prefix_bits)).astype(np.int64)
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

    from .simsearch import _batch_matrix, _hyperplanes, lsh_signature

    def bucketize(batch: pa.Table) -> pa.Table:
        M = _batch_matrix(batch, vec_col)
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
        # strict upper triangle of the threshold mask — one nonzero scan
        # instead of the O(n^2) Python double loop
        ii, jj = np.nonzero(np.triu(S >= threshold, k=1))
        if ii.size == 0:
            return empty
        ids_np = np.asarray(ids)
        a = np.minimum(ids_np[ii], ids_np[jj])
        b = np.maximum(ids_np[ii], ids_np[jj])
        cos = np.floor(S[ii, jj] * 1_000_000).astype(np.int64)
        return pd.DataFrame({"id_a": a.astype("int64"),
                             "id_b": b.astype("int64"),
                             "cos_micro": cos})

    bucketed = embeddings_ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(pairs_in_bucket,
                                                 batch_format="pandas")


def embedding_pairs_exact(embeddings_ds, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding"):
    """ALL embedding pairs with cosine >= threshold, exactly: the normalized
    matrix is broadcast once (ray.put, zero-copy per task) and every batch
    GEMMs its rows against it — O(n^2) work split row-wise across the
    cluster, one emit per qualifying pair (id_a < id_b).

    This is the verifiable BASELINE for ``embedding_neardup`` (the LSH
    variant is the scale path: it buckets first and only rescans inside
    buckets, trading recall for avoiding the n^2). Use this one when n
    fits a broadcast matrix (n x dim x 4 bytes), the LSH one beyond."""
    import ray

    mat_t = pa.concat_tables(
        ray.get(embeddings_ds.select_columns([id_col, vec_col])
                .to_arrow_refs()))
    from .simsearch import _batch_matrix
    ids_all = mat_t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    M = _batch_matrix(mat_t, vec_col)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mn = M / norms[:, None]
    ref = ray.put((ids_all, Mn))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all_, Mn_ = ray.get(ref)
        from .simsearch import _batch_matrix
        ids_b = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        B = _batch_matrix(batch, vec_col)
        if B.shape[0] == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        nb = np.linalg.norm(B, axis=1)
        nb[nb == 0] = 1.0
        S = (B / nb[:, None]) @ Mn_.T              # (batch, n)
        ii, jj = np.nonzero(S >= threshold)
        a = ids_b[ii]
        b = ids_all_[jj]
        keep = a < b                                # dedup + drop self
        return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                         "id_b": pa.array(b[keep], pa.int64())})

    return embeddings_ds.map_batches(pairs, batch_format="pyarrow")


def verify_jaccard_pairs(documents_ds, candidate_pairs, threshold: float = 0.8,
                         shingle_k: int = 3, id_col: str = "doc_id",
                         text_col: str = "text",
                         shuffle_partitions: int | None = None):
    """Exact n-gram Jaccard verification of LSH candidate pairs, distributed.

    Texts never reach the driver: candidate docs are semi-filtered with a
    broadcast id set (ids only — ~8 bytes per involved doc), then joined onto
    the pair rows through two bucketed hash exchanges (co-locate by id_a,
    attach text_a; co-locate by id_b, attach text_b and verify). Inside each
    bucket every document is shingled exactly ONCE (memo keyed by doc id),
    however many pairs reference it, and the set intersection is a sorted
    np.intersect1d — no per-pair re-shingling, no take_all, so a
    boilerplate-heavy corpus with an exploding candidate set stays bounded by
    per-bucket memory, not driver memory.
    """
    import pandas as pd
    import ray
    import ray.data

    if isinstance(candidate_pairs, pa.Table):
        pairs_ds = ray.data.from_arrow(candidate_pairs)
    elif isinstance(candidate_pairs, pd.DataFrame):
        pairs_ds = ray.data.from_pandas(candidate_pairs)
    else:                                             # already a ray Dataset
        pairs_ds = candidate_pairs
    # pair rows feed the id-set collection AND two exchanges: materialize
    # once (object-store blocks, not driver memory) instead of recomputing
    pairs_ds = pairs_ds.select_columns(["id_a", "id_b"]).materialize()

    P = max(16, shuffle_partitions or 0)

    # involved ids to the driver as PER-BLOCK UNIQUES, not raw pair rows:
    # each block reduces its (id_a, id_b) columns to one deduped id column
    # in a task, so the driver concat is bounded by the number of distinct
    # involved docs (which it must hold anyway to ray.put the broadcast
    # set), never by the candidate-pair count.
    def _block_ids(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"__id": pa.array(u, pa.int64())})

    id_blocks = ray.get(pairs_ds.map_batches(
        _block_ids, batch_format="pyarrow").to_arrow_refs())
    id_arrays = [t["__id"].to_numpy(zero_copy_only=False)
                 for t in id_blocks if t.num_rows]
    if not id_arrays:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard_micro": pa.array([], pa.int64())}))
    involved = np.unique(np.concatenate(id_arrays))
    inv_ref = ray.put(involved)

    def grab(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = ray.get(inv_ref)                       # zero-copy local read
        mask = pc.is_in(pc.cast(batch[id_col], pa.int64()),
                        value_set=pa.array(keep, pa.int64()))
        kept = batch.filter(mask)
        return pa.table({id_col: kept[id_col], text_col: kept[text_col]})

    # filtered texts also feed both exchanges: materialize once
    texts_ds = documents_ds.map_batches(
        grab, batch_format="pyarrow").materialize()

    def tag_pairs(join_col):
        def fn(b: pa.Table) -> pa.Table:
            jid = b[join_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {"__bucket": pa.array(np.abs(jid) % P, pa.int64()),
                    "__side": pa.array([0] * b.num_rows, pa.int8()),
                    "__jid": pa.array(jid, pa.int64()),
                    "id_a": pa.compute.cast(b["id_a"], pa.int64()),
                    "id_b": pa.compute.cast(b["id_b"], pa.int64()),
                    "text_a": (b["text_a"] if "text_a" in b.column_names
                               else pa.nulls(b.num_rows, pa.string())),
                    "__text": pa.nulls(b.num_rows, pa.string())}
            return pa.table(cols)
        return fn

    def tag_texts(b: pa.Table) -> pa.Table:
        jid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(np.abs(jid) % P, pa.int64()),
            "__side": pa.array([1] * b.num_rows, pa.int8()),
            "__jid": pa.array(jid, pa.int64()),
            "id_a": pa.nulls(b.num_rows, pa.int64()),
            "id_b": pa.nulls(b.num_rows, pa.int64()),
            "text_a": pa.nulls(b.num_rows, pa.string()),
            "__text": b[text_col]})

    def join_a(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["__side"] == 0]
        d = g[g["__side"] == 1].drop_duplicates("__jid")
        m = p[["__jid", "id_a", "id_b"]].merge(
            d[["__jid", "__text"]], on="__jid", how="inner")
        return (m.rename(columns={"__text": "text_a"})
                [["id_a", "id_b", "text_a"]])

    def join_b_verify(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["__side"] == 0]
        d = g[g["__side"] == 1].drop_duplicates("__jid")
        m = p[["__jid", "id_a", "id_b", "text_a"]].merge(
            d[["__jid", "__text"]], on="__jid", how="inner")
        memo: dict[int, np.ndarray] = {}   # each doc shingled once per bucket

        def sh(doc_id, t):
            arr = memo.get(doc_id)
            if arr is None:
                arr = _shingle_hashes((t or "").lower().split(" "), shingle_k)
                memo[doc_id] = arr
            return arr

        out_a, out_b, out_j = [], [], []
        for ida, idb, ta, tb in zip(m["id_a"], m["id_b"],
                                    m["text_a"], m["__text"]):
            sa, sb = sh(int(ida), ta), sh(int(idb), tb)
            if sa.size == 0 and sb.size == 0:
                j = 1.0
            else:
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                j = inter / (sa.size + sb.size - inter)
            if j >= threshold:
                out_a.append(int(ida))
                out_b.append(int(idb))
                out_j.append(int(np.floor(j * 1_000_000)))
        return pd.DataFrame({"id_a": pd.Series(out_a, dtype="int64"),
                             "id_b": pd.Series(out_b, dtype="int64"),
                             "jaccard_micro": pd.Series(out_j, dtype="int64")})

    from bionext_ray.ops.relational import coalesce_for_exchange
    with_a = (coalesce_for_exchange(
                  pairs_ds.map_batches(tag_pairs("id_a"),
                                       batch_format="pyarrow")
                  .union(texts_ds.map_batches(tag_texts,
                                              batch_format="pyarrow")), P)
              .groupby("__bucket")
              .map_groups(join_a, batch_format="pandas"))
    return (coalesce_for_exchange(
                with_a.map_batches(tag_pairs("id_b"), batch_format="pyarrow")
                .union(texts_ds.map_batches(tag_texts,
                                            batch_format="pyarrow")), P)
            .groupby("__bucket")
            .map_groups(join_b_verify, batch_format="pandas"))


# -------------------------------------------------- near-dup cluster labels
def connected_components(pairs_ds, shuffle_partitions: int | None = None,
                         max_iters: int = 30):
    """Cluster assignment over a duplicate-pair graph: each node appearing
    in any pair gets ``cluster_id`` = the minimum node id reachable from it
    (what dedup needs to pick ONE keeper per near-dup group, not just
    pairs).

    Distributed min-label propagation: the directed edge list (each pair
    both ways) is materialized ONCE; every round is exactly one bucketed
    hash exchange (each node's current label is merged onto the edges whose
    source it is, producing a (dst, src_label) message per edge) plus one
    min-groupby over messages + self labels. Rounds needed = graph diameter
    — near-dup clusters are shallow, so a handful. Labels only decrease, so
    the fixpoint test is a tiny ``sum(label)`` aggregate per round (no
    old-vs-new join). An oracle exists as a recursive SQL CTE
    (`neardup_clusters` in __ray_entry__).
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Min, Sum

    P = max(16, shuffle_partitions or 0)

    def to_directed(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, bb])
        dst = np.concatenate([bb, a])
        return pa.table({
            "__bucket": pa.array(np.abs(src) % P, pa.int64()),
            "__side": pa.array(np.zeros(len(src), np.int8), pa.int8()),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "label": pa.nulls(len(src), pa.int64()),
        })

    directed = pairs_ds.select_columns(["id_a", "id_b"]).map_batches(
        to_directed, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "label": pa.array(ids, pa.int64())})

    labels = (directed.map_batches(init_labels, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())

    def tag_labels(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(np.abs(node) % P, pa.int64()),
            "__side": pa.array(np.ones(len(node), np.int8), pa.int8()),
            "src": pa.array(node, pa.int64()),
            "dst": pa.nulls(len(node), pa.int64()),
            "label": b["label"],
        })

    def propagate(t: pa.Table) -> pa.Table:
        # arrow in/out so the result unions with the arrow labels dataset
        g = t.to_pandas()
        e = g[g["__side"] == 0]
        l = g[g["__side"] == 1].drop_duplicates("src")
        m = e[["src", "dst"]].merge(l[["src", "label"]], on="src",
                                    how="inner")
        return pa.table({"node": pa.array(m["dst"].to_numpy(np.int64),
                                          pa.int64()),
                         "label": pa.array(m["label"].to_numpy(np.int64),
                                           pa.int64())})

    # pointer-jumping compression: label[n] <- label[label[n]]. Labels are
    # always node ids of this graph, so the label self-join is total; each
    # compression round halves label-chain depth, making propagate+compress
    # converge in O(log diameter) rounds — plain one-hop propagation needs
    # O(diameter) rounds and would silently truncate long chain components
    # at the iteration cap.
    def tag_query(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(np.abs(lab) % P, pa.int64()),
            "__side": pa.array(np.zeros(len(lab), np.int8), pa.int8()),
            "__key": pa.array(lab, pa.int64()),
            "node": b["node"],
            "label": pa.nulls(len(lab), pa.int64()),
        })

    def tag_target(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(np.abs(node) % P, pa.int64()),
            "__side": pa.array(np.ones(len(node), np.int8), pa.int8()),
            "__key": pa.array(node, pa.int64()),
            "node": pa.nulls(len(node), pa.int64()),
            "label": b["label"],
        })

    def compress(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        q = g[g["__side"] == 0]
        tgt = g[g["__side"] == 1].drop_duplicates("__key")
        m = q[["__key", "node"]].merge(
            tgt[["__key", "label"]], on="__key", how="inner")
        return pa.table({"node": pa.array(m["node"].to_numpy(np.int64),
                                          pa.int64()),
                         "label": pa.array(m["label"].to_numpy(np.int64),
                                           pa.int64())})

    # every union grows the block count and the sort-shuffle schedules
    # (input blocks x output blocks) tasks — without re-coalescing, block
    # counts compound across rounds and the scheduler cost explodes.
    # repartition() here is metadata-only (no row movement) and keeps each
    # round's shuffle at a constant P x P.
    import gc

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        messages = (directed.union(labels.map_batches(
                        tag_labels, batch_format="pyarrow"))
                    .repartition(P)
                    .groupby("__bucket")
                    .map_groups(propagate, batch_format="pyarrow"))
        labels = (messages.union(labels)
                  .repartition(P)
                  .groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(max(2, P // 4))
                  .materialize())
        labels = (labels.map_batches(tag_query, batch_format="pyarrow")
                  .union(labels.map_batches(tag_target,
                                            batch_format="pyarrow"))
                  .repartition(P)
                  .groupby("__bucket")
                  .map_groups(compress, batch_format="pyarrow")
                  .repartition(max(2, P // 4))
                  .materialize())
        # labels only decrease -> unchanged sum == fixpoint
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        # drop the previous round's dataset objects NOW: unreferenced
        # materialized datasets otherwise pile up on the driver across
        # rounds and each round's scheduling gets progressively slower
        gc.collect()
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        # wrong cluster ids are worse than no cluster ids: with pointer
        # jumping, max_iters=default covers diameters up to ~2^max_iters,
        # so hitting the cap means something is broken — fail loud
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "cluster_id": b["label"]})
    return labels.map_batches(rename, batch_format="pyarrow")


def train_example_dedup(samples_ds, gene_lookup: dict[str, str],
                        shuffle_partitions: int | None = None):
    """Train-example dedup (reference D4, src/linker/seq_variant.py:324-346):
    each sample row (text, norm, nearest_gene) becomes the tuple
    (convert_amino_acids(text), norm, gene_lookup[first nearest_gene]) —
    nearest_gene keeps only the part before the first comma, rows whose gene
    is absent from gene_lookup are DROPPED — then exact set dedup.

    Distributed: gene_lookup is broadcast once (ray.put, zero-copy reads in
    every task); each block converts + locally dedups (combiner), so only
    distinct partials cross the one groupby exchange. Output columns:
    (text, norm, gene)."""
    import ray
    from ray.data.aggregate import Count

    from ..functions.variant_norm import convert_amino_acids

    lk_ref = ray.put(dict(gene_lookup))
    keys = ["text", "norm", "gene"]

    def prep(b: pa.Table) -> pa.Table:
        lk = ray.get(lk_ref)
        seen = set()
        for text, norm, ng in zip(b["text"].to_pylist(),
                                  b["norm"].to_pylist(),
                                  b["nearest_gene"].to_pylist()):
            g = lk.get((ng or "").split(",")[0])
            if g is not None:
                seen.add((convert_amino_acids(text or ""), norm or "", g))
        rows = sorted(seen)
        return pa.table({
            "text": pa.array([r[0] for r in rows], pa.string()),
            "norm": pa.array([r[1] for r in rows], pa.string()),
            "gene": pa.array([r[2] for r in rows], pa.string()),
        })

    deduped = samples_ds.map_batches(prep, batch_format="pyarrow")
    if shuffle_partitions is not None:
        deduped = deduped.repartition(shuffle_partitions)
    agg = deduped.groupby(keys).aggregate(Count(alias_name="__n"))
    return agg.map_batches(lambda b: b.select(keys),
                           batch_format="pyarrow")


def sorted_neighborhood_pairs(ds, key_col: str, id_col: str, window: int,
                              shuffle_partitions: int | None = None,
                              sample_size: int = 4096):
    """Sorted-neighborhood blocking (the classic entity-resolution
    candidate generator): order all rows by (key, id) and emit every pair
    within ``window`` POSITIONS of each other — the ROWS-window self-join

        SELECT a.id, b.id FROM ranked a JOIN ranked b
        ON b.rn > a.rn AND b.rn <= a.rn + window

    Output: (id_a, id_b) with id_a the lower-RANK row. Complements the
    LSH/simhash blockers: those bucket by content similarity, this one by
    sort-key adjacency (typo-tolerant keys like phonetic codes or
    truncated fingerprints put near-misses in adjacent ranks even when
    they hash apart).

    Scale shape — a global ROWS window over a total order, without a
    global sort materialization: driver samples ≤``sample_size`` keys and
    picks P-1 range cutpoints over the composite key (key + NUL + fixed-
    width id — NUL-separated so composite order IS (key, id) order even
    for prefix keys); rows range-bucket in one exchange; each bucket
    sorts locally and emits (a) its in-bucket window pairs and (b) tiny
    boundary STRIPS — its first/last ``window`` rows with local ranks and
    the bucket size. Strips (≤ 2wP rows total) gather in one single-group
    pass that reconstructs exact global ranks from the carried bucket
    sizes (empty buckets contribute 0 by construction) and emits the
    cross-bucket pairs — any pair within ``window`` ranks either shares a
    bucket or has both ends within ``window`` of a crossed boundary, so
    the union is exactly the SQL window. Deterministic at any parallelism;
    skewed key runs longer than a bucket are still correct (the strip
    pass sees both sides of every boundary). Ids must be NON-NEGATIVE
    ints (the fixed-width pad in the composite assumes it — a '-' sign
    would break lexicographic == numeric order).
    """
    import pandas as pd
    import ray
    import ray.data

    from .relational import _key_buckets, coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)
    width = 20                                    # fixed id pad width

    def _composite(keys, ids):
        return np.array([f"{k}\x00{i:0{width}d}" for k, i in
                         zip(keys, ids)], dtype=object)

    # driver-side cutpoints from per-batch evenly spaced rows (the
    # range-partitioner pattern; every block contributes, so key-ordered
    # input cannot collapse into one bucket — a biased sample only ever
    # unbalances buckets, never correctness)
    from .relational import range_sample
    head = range_sample(ds, [key_col, id_col])
    if len(head) > sample_size:
        step = (np.arange(sample_size) * len(head)) // sample_size
        head = [head[i] for i in step]
    if not head:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    comp = np.sort(_composite([r[key_col] for r in head],
                              [r[id_col] for r in head]))
    cut_idx = (np.arange(1, P) * len(comp)) // P
    cuts = np.unique(comp[cut_idx])

    def assign(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        c = _composite(keys, ids)
        bkt = np.searchsorted(cuts, c, side="right")
        return pa.table({
            "__key": b[key_col],            # original type; (key, id) sort
            "__id": pa.array(ids.astype(np.int64), pa.int64()),
            "__bucket": pa.array(bkt.astype(np.int64), pa.int64())})

    def bucket_pass(g: pd.DataFrame) -> pa.Table:
        bkt = int(g["__bucket"].iloc[0])
        g = (g.sort_values(["__key", "__id"], kind="mergesort")
             .reset_index(drop=True))
        n = len(g)
        ids = g["__id"].to_numpy()
        # in-bucket pairs: rank diff 1..window
        ia, ib = [], []
        for d in range(1, window + 1):
            if n > d:
                ia.append(ids[:-d])
                ib.append(ids[d:])
        pa_ids = np.concatenate(ia) if ia else np.array([], np.int64)
        pb_ids = np.concatenate(ib) if ib else np.array([], np.int64)
        pairs = pa.table({
            "__kind": pa.array(np.zeros(len(pa_ids), np.int8), pa.int8()),
            "id_a": pa.array(pa_ids, pa.int64()),
            "id_b": pa.array(pb_ids, pa.int64()),
            "__bucket": pa.array(np.full(len(pa_ids), bkt, np.int64)),
            "__rank": pa.nulls(len(pa_ids), pa.int64()),
            "__size": pa.nulls(len(pa_ids), pa.int64())})
        # boundary strips: first/last `window` rows with local rank + size
        sel = np.zeros(n, bool)
        sel[:window] = True
        sel[max(0, n - window):] = True
        idx = np.nonzero(sel)[0]
        strips = pa.table({
            "__kind": pa.array(np.ones(len(idx), np.int8), pa.int8()),
            "id_a": pa.array(ids[idx], pa.int64()),
            "id_b": pa.nulls(len(idx), pa.int64()),
            "__bucket": pa.array(np.full(len(idx), bkt, np.int64)),
            "__rank": pa.array(idx.astype(np.int64), pa.int64()),
            "__size": pa.array(np.full(len(idx), n, np.int64))})
        return pa.concat_tables([pairs, strips])

    tagged = (coalesce_for_exchange(
                  ds.map_batches(assign, batch_format="pyarrow"), P)
              .groupby("__bucket")
              .map_groups(bucket_pass, batch_format="pandas")
              .materialize())

    def only_pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        k = b["__kind"].to_numpy(zero_copy_only=False)
        out = b.filter(pa.array(k == 0))
        return pa.table({"id_a": out["id_a"], "id_b": out["id_b"]})

    in_bucket = tagged.map_batches(only_pairs, batch_format="pyarrow")

    def strips_tbl(b: pa.Table) -> pa.Table:
        k = b["__kind"].to_numpy(zero_copy_only=False)
        out = b.filter(pa.array(k == 1))
        return pa.table({
            "__one": pa.array(np.zeros(out.num_rows, np.int64), pa.int64()),
            "id": out["id_a"], "bucket": out["__bucket"],
            "rank": out["__rank"], "size": out["__size"]})

    def boundary_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = (g.drop_duplicates("bucket").set_index("bucket")["size"]
                 .sort_index())
        offset = sizes.cumsum().shift(fill_value=0)
        grank = (offset.reindex(g["bucket"]).to_numpy()
                 + g["rank"].to_numpy())
        order = np.argsort(grank, kind="stable")
        gr = grank[order]
        ids = g["id"].to_numpy()[order]
        bks = g["bucket"].to_numpy()[order]
        ia, ib = [], []
        m = len(gr)
        for i in range(m):
            j = i + 1
            while j < m and gr[j] - gr[i] <= window:
                if bks[j] != bks[i]:          # same-bucket pairs already out
                    ia.append(ids[i])
                    ib.append(ids[j])
                j += 1
        return pd.DataFrame({"id_a": np.array(ia, np.int64),
                             "id_b": np.array(ib, np.int64)})

    cross = (tagged.map_batches(strips_tbl, batch_format="pyarrow")
             .groupby("__one")
             .map_groups(boundary_pairs, batch_format="pandas"))

    return in_bucket.union(cross)


def edit_distance_pairs(ds, col: str, shuffle_partitions: int | None = None):
    """Similarity self-join on strings: all UNORDERED pairs of distinct
    values of ``col`` within Levenshtein distance 1 (typo pairs across a
    corpus vocabulary — spell-correction candidates, fuzzy entity-surface
    matching). Output: (word_a, word_b), word_a < word_b.

    Symmetric-deletion blocking (the SymSpell idea): two strings are
    within distance 1 IFF they share a variant in {self} ∪ {one-char
    deletions} — substitution deletes the differing position from both,
    insertion/deletion makes the shorter string itself a variant of the
    longer. So: per block, per distinct value, emit its variants
    (vectorized: for each deletion position p one pandas str.slice +
    concat over ALL values at once — a loop over max word LENGTH, never
    over words); ONE variant-hash-bucketed exchange; per bucket,
    candidate pairs = values sharing a variant (C merge), then an exact
    distance-≤1 verify on the candidates only (cheap char comparison —
    candidates are near-always true pairs). Distance-2 collisions the
    blocking admits die in the verify; cross-bucket duplicates are
    impossible (a shared variant lands both sides in ITS bucket, and the
    final distinct covers a pair sharing several variants).
    """
    import pandas as pd

    from .relational import _key_buckets, coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)

    def variants(b: pa.Table) -> pa.Table:
        w = pd.Series(pd.unique(pd.Series(
            b[col].to_numpy(zero_copy_only=False)).dropna()))
        w = w[w != ""].astype(str)
        if not len(w):
            return pa.table({"__v": pa.array([], pa.string()),
                             "__w": pa.array([], pa.string()),
                             "__bucket": pa.array([], pa.int64())})
        frames = [pd.DataFrame({"__v": w, "__w": w})]
        maxlen = int(w.str.len().max())
        for p in range(maxlen):
            m = w[w.str.len() > p]
            if not len(m):
                break
            frames.append(pd.DataFrame({
                "__v": m.str.slice(0, p) + m.str.slice(p + 1),
                "__w": m}))
        d = pd.concat(frames, ignore_index=True).drop_duplicates()
        bkt = _key_buckets(d["__v"].to_numpy(), P)
        return pa.table({"__v": pa.array(d["__v"], pa.string()),
                         "__w": pa.array(d["__w"], pa.string()),
                         "__bucket": pa.array(bkt, pa.int64())})

    def _dist_le1(a: str, b: str) -> bool:
        if a == b:
            return False                       # distinct pair contract
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        s, l = (a, b) if la < lb else (b, a)   # insertion/deletion
        i = 0
        while i < len(s) and s[i] == l[i]:
            i += 1
        return s[i:] == l[i + 1:]

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["__v", "__w"])
        m = g.merge(g, on="__v")
        m = m[m["__w_x"] < m["__w_y"]].drop_duplicates(
            ["__w_x", "__w_y"])
        keep = [
            _dist_le1(x, y)
            for x, y in zip(m["__w_x"], m["__w_y"])]
        m = m[np.array(keep, bool)] if len(m) else m
        return pd.DataFrame({"word_a": m["__w_x"].to_numpy(),
                             "word_b": m["__w_y"].to_numpy()})

    pairs = (coalesce_for_exchange(
                 ds.map_batches(variants, batch_format="pyarrow"), P)
             .groupby("__bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))

    # a pair sharing several variants (e.g. substitution + both orders)
    # appears once per SHARED variant bucket — final distinct
    def tag(b: pa.Table) -> pa.Table:
        ka = b["word_a"].to_numpy(zero_copy_only=False)
        kb = b["word_b"].to_numpy(zero_copy_only=False)
        bkt = (_key_buckets(ka, P) * 31 + _key_buckets(kb, P)) % P
        return b.append_column("__bucket",
                               pa.array(bkt.astype(np.int64), pa.int64()))

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["word_a", "word_b"])[
            ["word_a", "word_b"]]

    return (coalesce_for_exchange(
                pairs.map_batches(tag, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(bucket_distinct, batch_format="pandas"))


# ------------------------------------------------ exact substring dedup
def duplicate_text_spans(documents_ds, k: int = 5, id_col: str = "doc_id",
                         text_col: str = "text",
                         shuffle_partitions: int | None = None):
    """Exact substring-dedup spans (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" primitive): every maximal
    word range covered by k-word shingles that occur MORE THAN ONCE in
    the corpus (across documents or repeated within one). Curation
    pipelines cut these ranges out of the training text; this operator
    emits the range table (id, start_word, end_word exclusive) and leaves
    the cut to the caller.

    Shape — exactly TWO bucketed exchanges, no suffix array (the shingle
    formulation is the scalable equivalent for fixed k):
      1. one (gram-hash-bucket) exchange of fixed-width occurrence rows
         (gk, id, pos); inside each bucket a vectorized factorize+bincount
         marks occurrences whose gram count >= 2 — no per-gram Python, no
         global gram table on the driver;
      2. one (doc-bucket) exchange of the surviving (id, pos) rows;
         inside each bucket per-doc sorted positions merge into maximal
         spans with a cumsum gaps-and-islands scan (adjacent-or-
         overlapping shingles, gap > k breaks the span).
    Gram identity is md5 of the space-joined k words — the same
    SQL-mirrorable digest convention as hash_sample_batch, so the oracle
    can count the very same keys (it uses the gram string directly;
    equality holds absent md5 collisions).
    """
    import hashlib

    import pandas as pd

    from bionext_ray.ops.relational import coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)

    def occurrences(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        texts = pc.coalesce(b[text_col], "").to_pylist()
        ids = b[id_col].to_pylist()
        out_id, out_pos, out_gk = [], [], []
        md5 = hashlib.md5
        for did, t in zip(ids, texts):
            words = t.lower().split(" ")
            if len(words) < k:
                continue
            for p in range(len(words) - k + 1):
                gram = " ".join(words[p:p + k])
                gk = md5(gram.encode("utf-8")).digest()[:8]
                out_id.append(did)
                out_pos.append(p)
                out_gk.append(int.from_bytes(gk, "little", signed=True))
        bkt = (np.abs(np.array(out_gk, np.int64)) % P
               if out_gk else np.array([], np.int64))
        return pa.table({
            "__bucket": pa.array(bkt, pa.int64()),
            "gk": pa.array(out_gk, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "pos": pa.array(out_pos, pa.int64()),
        })

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["gk"].to_numpy())
        counts = np.bincount(codes)
        keep = counts[codes] >= 2
        kept = g[keep]
        return pd.DataFrame({
            id_col: kept[id_col].to_numpy(np.int64),
            "pos": kept["pos"].to_numpy(np.int64)})

    dup_occ = (coalesce_for_exchange(
                   documents_ds.map_batches(occurrences,
                                            batch_format="pyarrow"), P)
               .groupby("__bucket")
               .map_groups(mark_dups, batch_format="pandas"))

    def tag_doc(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__bucket", pa.array(np.abs(ids) % P, pa.int64()))

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        ids = g[id_col].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        if not len(ids):
            return pd.DataFrame({id_col: pd.array([], dtype=np.int64),
                                 "start_word": pd.array([], dtype=np.int64),
                                 "end_word": pd.array([], dtype=np.int64)})
        brk = np.r_[True, (ids[1:] != ids[:-1])
                    | (pos[1:] - pos[:-1] > k)]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(ids)] - 1
        return pd.DataFrame({
            id_col: ids[starts],
            "start_word": pos[starts],
            "end_word": pos[ends] + k})

    return (coalesce_for_exchange(
                dup_occ.map_batches(tag_doc, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(merge_spans, batch_format="pandas"))


# -------------------------------------------------- corpus-level span dedup
def chunk_dedup(documents_ds, width: int = 8, id_col: str = "doc_id",
                text_col: str = "text",
                shuffle_partitions: int | None = None):
    """C4-style corpus-level exact span deduplication with text
    reconstruction (reference pattern: the C4 three-sentence-span rule —
    every occurrence of a repeated span is removed EXCEPT the first one in
    corpus order). Spans here are deterministic fixed-width token chunks:
    tokens are the repo-standard space split of lowercased text with
    empties dropped, chunked into consecutive non-overlapping ``width``
    windows (the final partial chunk is a chunk of its own, so every token
    belongs to exactly one chunk). The keeper of a distinct chunk string
    is its minimum (doc, chunk_idx) occurrence; all other occurrences are
    cut, including repeats inside the keeper document itself.

    Shape — exactly TWO bucketed exchanges, nothing on the driver:
      1. one chunk-hash-bucketed exchange of (chunk, id, idx) occurrence
         rows; inside each bucket one sort + duplicated() scan marks the
         winner per chunk (chunks are bucket-complete, so bucket-local
         min IS the global min) and reduces losers to per-doc drop counts
         — loser chunk STRINGS never cross the second exchange;
      2. one doc-bucketed exchange of winner rows + drop-count partials +
         one sentinel row per document (so token-free docs still get an
         output row); per doc the kept chunks re-join in idx order.

    Returns one row per input document:
    (id, n_chunks, n_dropped, kept_md5) where kept_md5 is md5 of the
    space-joined surviving chunks ('' when nothing survives) — the
    SQL-mirrorable digest convention shared with duplicate_text_spans.
    """
    import pandas as pd

    from bionext_ray.ops.relational import coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)
    md5 = hashlib.md5

    def occurrences(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        texts = pc.coalesce(b[text_col], "").to_pylist()
        ids = b[id_col].to_pylist()
        out_id, out_idx, out_ch, out_bkt = [], [], [], []
        for did, t in zip(ids, texts):
            words = [w for w in t.lower().split(" ") if w]
            for i in range(0, len(words), width):
                chunk = " ".join(words[i:i + width])
                out_id.append(did)
                out_idx.append(i // width)
                out_ch.append(chunk)
                out_bkt.append(int.from_bytes(
                    md5(chunk.encode("utf-8")).digest()[:8],
                    "little") % P)
            # sentinel: routes straight to the doc bucket in exchange 2,
            # guaranteeing an output row for chunk-free documents
            out_id.append(did)
            out_idx.append(-2)
            out_ch.append("")
            out_bkt.append(abs(int(did)) % P)
        return pa.table({
            "__bucket": pa.array(out_bkt, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "idx": pa.array(out_idx, pa.int64()),
            "chunk": pa.array(out_ch, pa.string()),
        })

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        sent = g[g["idx"] == -2]
        occ = g[g["idx"] >= 0]
        occ = occ.sort_values(["chunk", id_col, "idx"], kind="mergesort")
        first = ~occ["chunk"].duplicated().to_numpy()
        kept = occ[first]
        drops = occ[~first].groupby(id_col, sort=False).size()
        return pd.concat([
            pd.DataFrame({id_col: kept[id_col].to_numpy(np.int64),
                          "idx": kept["idx"].to_numpy(np.int64),
                          "chunk": kept["chunk"].to_numpy(object),
                          "drop_n": np.zeros(len(kept), np.int64)}),
            pd.DataFrame({id_col: drops.index.to_numpy(np.int64),
                          "idx": np.full(len(drops), -1, np.int64),
                          "chunk": np.full(len(drops), "", object),
                          "drop_n": drops.to_numpy(np.int64)}),
            pd.DataFrame({id_col: sent[id_col].to_numpy(np.int64),
                          "idx": np.full(len(sent), -2, np.int64),
                          "chunk": np.full(len(sent), "", object),
                          "drop_n": np.zeros(len(sent), np.int64)}),
        ], ignore_index=True)

    marked = (coalesce_for_exchange(
                  documents_ds.map_batches(occurrences,
                                           batch_format="pyarrow"), P)
              .groupby("__bucket")
              .map_groups(winners, batch_format="pandas"))

    def tag_doc(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__bucket", pa.array(np.abs(ids) % P, pa.int64()))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "idx"], kind="mergesort")
        out_id, out_n, out_drop, out_md5 = [], [], [], []
        for did, sub in g.groupby(id_col, sort=False):
            kept = sub[sub["idx"] >= 0]
            n_drop = int(sub["drop_n"].sum())
            out_id.append(did)
            out_n.append(len(kept) + n_drop)
            out_drop.append(n_drop)
            out_md5.append(md5(" ".join(kept["chunk"].tolist())
                               .encode("utf-8")).hexdigest())
        return pd.DataFrame({id_col: pd.array(out_id, dtype=np.int64),
                             "n_chunks": pd.array(out_n, dtype=np.int64),
                             "n_dropped": pd.array(out_drop,
                                                   dtype=np.int64),
                             "kept_md5": pd.array(out_md5, dtype=object)})

    return (coalesce_for_exchange(
                marked.map_batches(tag_doc, batch_format="pyarrow"), P)
            .groupby("__bucket")
            .map_groups(finalize, batch_format="pandas"))
