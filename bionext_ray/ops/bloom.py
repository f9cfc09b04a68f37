"""Bloom-filter semi-join pruning.

``semi_join_filter`` (ops/relational.py) broadcasts the RAW right-side key
set — correct while the keys fit in one object. At web scale the right side
of "keep pages whose url appears in this other crawl" can be billions of
keys: this module builds a FIXED-SIZE Bloom filter over them instead
(m bits regardless of key count), broadcasts that, prunes the big side with
a vectorized membership test (no false negatives, tunable false positives),
and finishes EXACTLY with one bucketed semi join over the survivors only.

The output is always the exact semi join; the Bloom stage just bounds what
crosses the shuffle. At a 1% false-positive rate the exchange moves ~1% of
the non-matching rows instead of all of them — the standard join-pruning
pattern (a runtime filter), expressed as Ray Data dataflow:

  right keys --map_batches--> per-block m-bit arrays --OR-merge--> filter
  big rows  --map_batches(filter test)--> survivors --bucketed semi join-->

Per-block partials are m/8 bytes each (128 KiB at the default m=2^20) and
OR-merge associatively; the merged filter ships once via ray.put and is
read zero-copy by every prune task. Hashing is double hashing over
pandas ``hash_array`` mixes — run-internal only (the final exact join
makes cross-run hash stability irrelevant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """Finalizer-quality uint64 remix (splitmix64), vectorized."""
    h = h + np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _bloom_hashes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams for double hashing. hash_array
    ignores its hash_key for NUMERIC dtypes, so the second stream comes
    from a splitmix64 remix of the first, not a second keyed call."""
    from pandas.util import hash_array
    h1 = hash_array(values).astype(np.uint64)
    # h2 must be odd so (h1 + i*h2) cycles through distinct positions
    return h1, _splitmix64(h1) | np.uint64(1)


def _set_bits(keys: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    h1, h2 = _bloom_hashes(keys)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7))).astype(
                             np.uint8))
    return bits


def _test_bits(keys: np.ndarray, bits: np.ndarray, m_bits: int,
               n_hashes: int) -> np.ndarray:
    h1, h2 = _bloom_hashes(keys)
    mask = np.ones(len(keys), dtype=bool)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        mask &= (byte & (np.uint8(1) << (pos & np.uint64(7))).astype(
            np.uint8)) != 0
    return mask


def build_bloom(keys_ds, key_col: str, m_bits: int = 1 << 20,
                n_hashes: int = 4) -> np.ndarray:
    """Distributed Bloom build: per-block m-bit partials, OR-merged.
    Driver holds two m/8-byte arrays at a time (stream-merged), never the
    keys themselves."""
    def block_bloom(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        bits = _set_bits(keys, m_bits, n_hashes)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    parts = keys_ds.select_columns([key_col]).map_batches(
        block_bloom, batch_format="pyarrow")
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for row in range(t.num_rows):
            merged |= np.frombuffer(t["bits"][row].as_py(), dtype=np.uint8)
    return merged


def bloom_semi_join(big_ds, right_ds, on, big_cols: list[str],
                    m_bits: int = 1 << 20, n_hashes: int = 4,
                    shuffle_partitions: int | None = None):
    """EXACT semi join (rows of big whose key appears in right), with a
    broadcast Bloom filter pruning the big side before the one bucketed
    exchange. ``on`` is a (big_key, right_key) pair or a shared name.
    Output columns: [big_key] + big_cols.
    """
    from .relational import actor_pool_size

    bkey, rkey = on if isinstance(on, tuple) else (on, on)

    # hash_array is dtype-SENSITIVE (int32 -5 and int64 -5 hash
    # differently), and a Bloom false negative silently DROPS a true
    # match — so the right key is cast to the big side's key type before
    # any hashing (the same reconciliation semi_join_filter/shuffle_join
    # do), which also makes the tagged union's schemas agree.
    bk_type = dict(zip(big_ds.schema().names,
                       big_ds.schema().types))[bkey]

    def cast_rkey(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        idx = b.column_names.index(rkey)
        return b.set_column(idx, rkey, pc.cast(b[rkey], bk_type))

    right_ds = right_ds.select_columns([rkey]).map_batches(
        cast_rkey, batch_format="pyarrow")
    bloom = build_bloom(right_ds, rkey, m_bits=m_bits, n_hashes=n_hashes)
    bloom_ref = ray.put(bloom)

    class Prune:
        def __init__(self):
            self.bits = ray.get(bloom_ref)   # zero-copy object-store read

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b[bkey].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(
                _test_bits(keys, self.bits, m_bits, n_hashes)))

    survivors = (big_ds.select_columns(
                     list(dict.fromkeys([bkey] + big_cols)))
                 .map_batches(Prune, batch_format="pyarrow",
                              concurrency=actor_pool_size()))

    # exact finish in ONE exchange: survivors (side 0, full rows) union
    # per-block-distinct right keys (side 1, map-side dedup — no exchange
    # of its own), co-located by key-hash bucket; per bucket a vectorized
    # isin keeps the left rows whose key the right side actually has —
    # false positives die here. (A bucketed right-distinct + inner join
    # would be a second all-to-all; semi-join semantics only need the
    # bucket-local key SET, so fold the dedup into the join bucket.)
    from .relational import _key_buckets, coalesce_for_exchange

    P = max(16, shuffle_partitions or 0)
    out_cols = [bkey] + [c for c in big_cols if c != bkey]
    sch = big_ds.schema()
    col_type = dict(zip(sch.names, sch.types))

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {"__k": b[bkey],
                "__side": pa.array(np.zeros(b.num_rows, np.int8),
                                   pa.int8())}
        for c in out_cols[1:]:
            cols[c] = b[c]
        t = pa.table(cols)
        karr = b[bkey].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_key_buckets(karr, P), pa.int64()))

    def tag_right(b: pa.Table) -> pa.Table:
        u = np.unique(b[rkey].to_numpy(zero_copy_only=False))
        cols = {"__k": pa.array(u, b[rkey].type),
                "__side": pa.array(np.ones(len(u), np.int8), pa.int8())}
        for c in out_cols[1:]:
            cols[c] = pa.nulls(len(u), col_type[c])
        t = pa.table(cols)
        return t.append_column(
            "__bucket", pa.array(_key_buckets(u, P), pa.int64()))

    def semi_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd
        side = g["__side"].to_numpy(zero_copy_only=False)
        keys = g["__k"].to_numpy(zero_copy_only=False)
        right_keys = pd.unique(keys[side == 1])
        keep = (side == 0) & pd.Series(keys).isin(right_keys).to_numpy()
        out = g.filter(pa.array(keep))
        return pa.table({bkey: out["__k"],
                         **{c: out[c] for c in out_cols[1:]}})

    tagged = (survivors.map_batches(tag_left, batch_format="pyarrow")
              .union(right_ds.select_columns([rkey]).map_batches(
                  tag_right, batch_format="pyarrow")))
    return (coalesce_for_exchange(tagged, P)
            .groupby("__bucket")
            .map_groups(semi_bucket, batch_format="pyarrow"))
