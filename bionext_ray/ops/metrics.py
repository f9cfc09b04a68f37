"""Span-level NER P/R/F1 metrics as a distributed operator.

Re-expression of the reference's NERMetrics
(/root/reference/src/tagger/metrics.py:82-153): predicted mention spans vs
gold spans, exact (start, end, class) set match per document per class;
micro scores from the global tp/fn/fp sums, macro scores as the
per-document average of the per-class f1PR mean (6 classes, absent classes
contribute zero — f1PR(0,0,0) = 0, metrics.py:12-16).

All scores are INTEGER parts-per-million computed with integer division at
every step (class ppm -> per-doc mean -> corpus mean), so the Ray pipeline
and a SQL oracle agree bit-for-bit — no float summation-order hazards.

Scale shape: one bucketed exchange co-locates each document's pred+gold
spans (hash(doc_id) % P — the anti-singleton-group pattern), the per-bucket
kernel reduces every doc to ONE 7-int row, and the final reduction is a
Ray aggregate over those tiny rows. Nothing text-sized ever shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PPM = 1_000_000


def term_spans_batch(batch: pa.Table, term2cls: dict[str, int],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Vectorized (doc_id, s, e, cls) span rows: occurrences of single-word
    terms in the space-split lowercase word sequence, with char offsets —
    the SQL-checkable mention source for the metrics operator."""
    import pyarrow.compute as pc
    text = pc.coalesce(batch[text_col], "")
    words = pc.split_pattern(pc.utf8_lower(text), " ")
    lengths = pc.list_value_length(words).to_numpy()
    flat = pc.list_flatten(words)
    wlen = pc.cast(pc.utf8_length(flat), pa.int64()).to_numpy()
    n = len(lengths)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    # char start of word i in its doc: within-doc cumulative word lengths
    # plus one separator per preceding word, all from ONE global exclusive
    # cumsum re-based at each doc's first word
    if len(wlen):
        exc = np.concatenate([[0], np.cumsum(wlen)[:-1]])   # global excl.
        first = np.zeros(n, dtype=np.int64)                 # doc -> flat i0
        first[1:] = np.cumsum(lengths)[:-1]
        fi = first[doc_idx]
        starts = exc - exc[fi] + (np.arange(len(wlen), dtype=np.int64) - fi)
    else:
        starts = np.zeros(0, dtype=np.int64)
    terms = list(term2cls)
    ti = pc.index_in(flat, value_set=pa.array(terms, pa.string()))
    hit = pc.is_valid(ti).to_numpy(zero_copy_only=False)
    cls = np.asarray([term2cls[t] for t in terms], dtype=np.int64)
    tidx = pc.fill_null(ti, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_col = batch[id_col].combine_chunks() if isinstance(
        batch[id_col], pa.ChunkedArray) else batch[id_col]
    doc_ids = np.asarray(doc_col.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    s = starts[hit]
    return pa.table({
        "doc_id": pa.array(doc_ids[doc_idx[hit]], pa.int64()),
        "s": pa.array(s, pa.int64()),
        "e": pa.array(s + wlen[hit], pa.int64()),
        "cls": pa.array(cls[tidx[hit]], pa.int64()),
    })


def _f1_ppm(p_ppm: np.ndarray, r_ppm: np.ndarray) -> np.ndarray:
    denom = p_ppm + r_ppm
    return np.where(denom > 0, (2 * p_ppm * r_ppm) // np.maximum(denom, 1),
                    0).astype(np.int64)


def span_prf(pred_ds, gold_ds, n_docs: int, n_classes: int = 6,
             shuffle_partitions: int | None = None):
    """Micro + macro span P/R/F1 (integer ppm) over pred vs gold span
    Datasets with columns (doc_id, s, e, cls). Returns a one-row Dataset:
    (micro_p_ppm, micro_r_ppm, micro_f1_ppm, macro_p_ppm, macro_r_ppm,
    macro_f1_ppm, tp, fn, fp, n_docs)."""
    import pandas as pd
    import ray.data

    P = max(16, shuffle_partitions or 0)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "__bucket": pa.array(np.abs(did) % P, pa.int64()),
                "__side": pa.array(np.full(b.num_rows, side, np.int8)),
                "doc_id": pa.array(did, pa.int64()),
                "s": pa.compute.cast(b["s"], pa.int64()),
                "e": pa.compute.cast(b["e"], pa.int64()),
                "cls": pa.compute.cast(b["cls"], pa.int64()),
            })
        return fn

    key = ["doc_id", "s", "e", "cls"]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # exact span-set match per doc per class (sets: reference
        # metrics.py:88-91 intersects/differences Python sets)
        p = g[g["__side"] == 0].drop_duplicates(key)[key]
        t = g[g["__side"] == 1].drop_duplicates(key)[key]
        m = p.merge(t, on=key, how="outer", indicator=True)
        m["tp"] = (m["_merge"] == "both").astype("int64")
        m["fp"] = (m["_merge"] == "left_only").astype("int64")
        m["fn"] = (m["_merge"] == "right_only").astype("int64")
        cell = m.groupby(["doc_id", "cls"], sort=False)[
            ["tp", "fn", "fp"]].sum().reset_index()
        tp = cell["tp"].to_numpy()
        fn_ = cell["fn"].to_numpy()
        fp = cell["fp"].to_numpy()
        p_ppm = np.where(tp > 0, tp * PPM // np.maximum(tp + fp, 1), 0)
        r_ppm = np.where(tp > 0, tp * PPM // np.maximum(tp + fn_, 1), 0)
        cell["p_ppm"] = p_ppm.astype("int64")
        cell["r_ppm"] = r_ppm.astype("int64")
        cell["f1_ppm"] = _f1_ppm(p_ppm, r_ppm)
        doc = cell.groupby("doc_id", sort=False).agg(
            tp=("tp", "sum"), fn=("fn", "sum"), fp=("fp", "sum"),
            sp=("p_ppm", "sum"), sr=("r_ppm", "sum"),
            sf=("f1_ppm", "sum")).reset_index()
        # per-doc macro: class mean with integer division (absent classes
        # contribute 0, so dividing the sum by n_classes is exact)
        for col in ("sp", "sr", "sf"):
            doc[col] = doc[col] // n_classes
        return doc[["tp", "fn", "fp", "sp", "sr", "sf"]].astype("int64")

    from bionext_ray.ops.relational import coalesce_for_exchange
    per_doc = (coalesce_for_exchange(
                   pred_ds.map_batches(tag(0), batch_format="pyarrow")
                   .union(gold_ds.map_batches(tag(1),
                                              batch_format="pyarrow")), P)
               .groupby("__bucket")
               .map_groups(per_bucket, batch_format="pandas"))

    from ray.data.aggregate import Sum
    tot = per_doc.aggregate(Sum("tp"), Sum("fn"), Sum("fp"),
                            Sum("sp"), Sum("sr"), Sum("sf")) or {}
    tp = int(tot.get("sum(tp)") or 0)
    fn_ = int(tot.get("sum(fn)") or 0)
    fp = int(tot.get("sum(fp)") or 0)
    micro_p = 0 if tp == 0 else tp * PPM // (tp + fp)
    micro_r = 0 if tp == 0 else tp * PPM // (tp + fn_)
    micro_f1 = int(_f1_ppm(np.asarray([micro_p]), np.asarray([micro_r]))[0])
    out = pa.table({
        "micro_p_ppm": pa.array([micro_p], pa.int64()),
        "micro_r_ppm": pa.array([micro_r], pa.int64()),
        "micro_f1_ppm": pa.array([micro_f1], pa.int64()),
        "macro_p_ppm": pa.array([int(tot.get("sum(sp)") or 0) // n_docs],
                                pa.int64()),
        "macro_r_ppm": pa.array([int(tot.get("sum(sr)") or 0) // n_docs],
                                pa.int64()),
        "macro_f1_ppm": pa.array([int(tot.get("sum(sf)") or 0) // n_docs],
                                 pa.int64()),
        "tp": pa.array([tp], pa.int64()),
        "fn": pa.array([fn_], pa.int64()),
        "fp": pa.array([fp], pa.int64()),
        "n_docs": pa.array([n_docs], pa.int64()),
    })
    import ray.data as rd
    return rd.from_arrow(out)
