"""Span-level P/R/F1 metrics operator (reference NERMetrics semantics)."""
import numpy as np
import pyarrow as pa
import pytest

from bionext_ray.ops.metrics import PPM, span_prf, term_spans_batch


def test_term_spans_offsets():
    batch = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["gene x gene tumor", "cell"]),
    })
    out = term_spans_batch(batch, {"gene": 0, "tumor": 1, "cell": 5})
    rows = sorted(zip(out["doc_id"].to_pylist(), out["s"].to_pylist(),
                      out["e"].to_pylist(), out["cls"].to_pylist()))
    assert rows == [(7, 0, 4, 0), (7, 7, 11, 0), (7, 12, 17, 1),
                    (8, 0, 4, 5)]
    # offsets index into the original text
    assert "gene x gene tumor"[7:11] == "gene"


def test_term_spans_empty_and_null():
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", None], pa.string()),
    })
    out = term_spans_batch(batch, {"gene": 0})
    assert out.num_rows == 0


def test_span_prf_reference_semantics(ray_session):
    import ray.data
    # doc 1: pred == gold for cls0 (tp=1); doc 1 cls1 pred-only (fp);
    # doc 2: gold-only (fn); doc 3 in neither but counted in n_docs
    pred = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "s": pa.array([0, 5], pa.int64()),
        "e": pa.array([4, 9], pa.int64()),
        "cls": pa.array([0, 1], pa.int64())}))
    gold = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "s": pa.array([0, 3], pa.int64()),
        "e": pa.array([4, 8], pa.int64()),
        "cls": pa.array([0, 2], pa.int64())}))
    r = span_prf(pred, gold, n_docs=3).to_pandas().iloc[0]
    assert (r["tp"], r["fn"], r["fp"]) == (1, 1, 1)
    assert r["micro_p_ppm"] == PPM // 2 and r["micro_r_ppm"] == PPM // 2
    assert r["micro_f1_ppm"] == PPM // 2
    # doc1 macro: cls0 perfect (1M each), cls1 zero -> sums // 6; doc2 all
    # zero; mean over THREE docs (doc3 contributes zero, f1PR(0,0,0)=0)
    assert r["macro_p_ppm"] == (PPM // 6) // 3
    assert r["n_docs"] == 3


def test_span_prf_set_semantics_dedups(ray_session):
    import ray.data
    # duplicated pred span counts once (reference intersects SETS)
    pred = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "s": pa.array([0, 0], pa.int64()),
        "e": pa.array([4, 4], pa.int64()),
        "cls": pa.array([0, 0], pa.int64())}))
    gold = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "s": pa.array([0], pa.int64()),
        "e": pa.array([4], pa.int64()),
        "cls": pa.array([0], pa.int64())}))
    r = span_prf(pred, gold, n_docs=1).to_pandas().iloc[0]
    assert (r["tp"], r["fn"], r["fp"]) == (1, 0, 0)
    assert r["micro_f1_ppm"] == PPM
