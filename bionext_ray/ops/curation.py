"""End-to-end corpus curation: the keep/drop decision a training-data
pipeline makes per document, with machine-readable reject reasons.

Composes the repo's oracle-gated signal operators into ONE verdict table —
the flagship "curate this crawl" pipeline a user of a webtext engine runs
before tokenization:

  bit 0  DUPLICATE    not the min-id keeper of its exact text hash
  bit 1  TOO_SHORT    fewer than ``min_tokens`` word tokens
  bit 2  REPETITIVE   within-doc duplicate-word fraction over threshold
                      (Gopher repetition filter, ops.textstats)
  bit 3  BOILERPLATE  cross-document duplicated-trigram fraction over
                      threshold (RefinedWeb/CCNet signal, ops.textstats)
  bit 4  OOV          out-of-vocabulary rate against the corpus top-k
                      vocabulary over threshold

``keep`` is 1 iff no bit is set. Every signal is integer-ppm with floor
division, so the whole verdict is SQL-mirrorable bit for bit.

Scale shape: the per-doc signals (hash, token count, repetition) compute
batch-local in one pass; the corpus-level signals reuse their gated
operators (exact_dedup: one hash exchange; boilerplate_ppm: gram + doc
exchanges; oov: one vocab exchange + ray.put broadcast); the final
assembly is three doc/hash-keyed shuffle joins over already-reduced
one-row-per-doc tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DUPLICATE, TOO_SHORT, REPETITIVE, BOILERPLATE, OOV = 1, 2, 4, 8, 16


def curate_corpus(documents_ds, min_tokens: int = 20,
                  max_dup_word_ppm: int = 600_000,
                  max_boilerplate_ppm: int = 800_000,
                  max_oov_ppm: int = 200_000,
                  vocab_k: int = 25, ngram_n: int = 3, min_df: int = 2,
                  shuffle_partitions: int | None = None):
    """(doc_id, reasons, keep) verdict per document. ``documents_ds`` must
    carry doc_id + text and be re-iterable (a lazy read, not a consumed
    stream): the signal branches each scan it independently — at 100 TB
    that is six streaming passes over the parquet source (base signals,
    exact dedup, boilerplate incidence + totals, vocab, OOV), never a
    driver-side materialization; the passes are embarrassingly parallel
    reads while every reduction stays in the gated exchange operators."""
    import pyarrow.compute as pc  # noqa: F401 (used in closures below)

    from .dedup import _text_md5, exact_dedup
    from .relational import shuffle_join
    from .textstats import boilerplate_ppm, corpus_vocab_topk, oov_stats

    def base_signals(b: pa.Table) -> pa.Table:
        # delegate the dup-word kernel to the oracle-gated
        # repetition_stats_batch (ONE shared implementation of the Gopher
        # fraction) — both run batch-local in the same task
        from .textstats import repetition_stats_batch
        t = _text_md5(b, "text")
        text = pc.coalesce(b["text"], "")
        n_tokens = pc.cast(pc.count_substring_regex(
            text, r"[A-Za-z0-9_]+"), pa.int64())
        rep = repetition_stats_batch(b)
        return pa.table({
            "doc_id": b["doc_id"],
            "text_hash": t["text_hash"],
            "n_tokens": n_tokens,
            "dup_word_ppm": rep["dup_word_ppm"],
        })

    base = documents_ds.map_batches(base_signals, batch_format="pyarrow")

    keepers = exact_dedup(documents_ds,
                          shuffle_partitions=shuffle_partitions)
    keepers = keepers.map_batches(
        lambda b: pa.table({"text_hash": b["text_hash"],
                            "keeper": b["doc_id"]}),
        batch_format="pyarrow")
    boiler = boilerplate_ppm(documents_ds, n=ngram_n, min_df=min_df,
                             shuffle_partitions=shuffle_partitions)
    boiler = boiler.map_batches(
        lambda b: b.select(["doc_id", "dup_ppm"]), batch_format="pyarrow")
    vocab = corpus_vocab_topk(documents_ds, k=vocab_k,
                              shuffle_partitions=shuffle_partitions)
    oov = oov_stats(documents_ds, vocab).map_batches(
        lambda b: b.select(["doc_id", "oov_ppm"]), batch_format="pyarrow")

    j = shuffle_join(base, keepers, on=("text_hash", "text_hash"),
                     left_cols=["doc_id", "n_tokens", "dup_word_ppm"],
                     right_cols=["keeper"],
                     shuffle_partitions=shuffle_partitions)
    j = shuffle_join(j, boiler, on=("doc_id", "doc_id"),
                     left_cols=["n_tokens", "dup_word_ppm", "keeper"],
                     right_cols=["dup_ppm"],
                     shuffle_partitions=shuffle_partitions)
    j = shuffle_join(j, oov, on=("doc_id", "doc_id"),
                     left_cols=["n_tokens", "dup_word_ppm", "keeper",
                                "dup_ppm"],
                     right_cols=["oov_ppm"],
                     shuffle_partitions=shuffle_partitions)

    def verdict(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.zeros(len(did), np.int64)
        r |= DUPLICATE * (did != b["keeper"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        r |= TOO_SHORT * (b["n_tokens"].to_numpy(
            zero_copy_only=False) < min_tokens)
        r |= REPETITIVE * (b["dup_word_ppm"].to_numpy(
            zero_copy_only=False) > max_dup_word_ppm)
        r |= BOILERPLATE * (b["dup_ppm"].to_numpy(
            zero_copy_only=False) > max_boilerplate_ppm)
        r |= OOV * (b["oov_ppm"].to_numpy(
            zero_copy_only=False) > max_oov_ppm)
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "reasons": pa.array(r, pa.int64()),
                         "keep": pa.array((r == 0).astype(np.int64),
                                          pa.int64())})

    return j.map_batches(verdict, batch_format="pyarrow")
