"""Corpus-curation verdict: reason bitmask semantics, including the exact-
duplicate bit that the synthetic documents table never fires."""

import pyarrow as pa

from bionext_ray.ops.curation import (BOILERPLATE, DUPLICATE, OOV,
                                      REPETITIVE, TOO_SHORT, curate_corpus)


def _docs(rows):
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_curation_bits(ray_session):
    import ray.data
    long_clean = " ".join(f"w{i}" for i in range(30))       # 30 distinct
    dup_text = " ".join(f"d{i}" for i in range(25))
    rows = [
        (1, long_clean),                 # unique, clean -> keep
        (2, dup_text),                   # keeper of the duplicate pair
        (3, dup_text),                   # exact duplicate of 2
        (4, "short doc"),                # too short
        (5, " ".join(["same"] * 30)),    # repetitive (dup-word ~97%)
    ]
    ds = ray.data.from_arrow(_docs(rows)).repartition(2)
    out = (curate_corpus(ds, min_tokens=20, max_dup_word_ppm=600_000,
                         max_boilerplate_ppm=800_000,
                         max_oov_ppm=2_000_000,   # oov off for this corpus
                         vocab_k=100)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "reasons"] == 0 and out.loc[1, "keep"] == 1
    # only the non-keeper of the identical pair carries DUPLICATE; both
    # carry BOILERPLATE (their shared trigrams have doc-freq 2 by
    # construction — exact duplication implies cross-doc repetition)
    assert not out.loc[2, "reasons"] & DUPLICATE
    assert out.loc[3, "reasons"] & DUPLICATE
    assert out.loc[2, "reasons"] & BOILERPLATE
    assert out.loc[3, "keep"] == 0
    assert out.loc[4, "reasons"] & TOO_SHORT
    assert out.loc[5, "reasons"] & REPETITIVE
    # clean unique doc must not carry any corpus-level bits
    assert not out.loc[1, "reasons"] & (TOO_SHORT | OOV | BOILERPLATE)


def test_curation_null_text_too_short(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs([(1, None), (2, "")]))
    out = (curate_corpus(ds, min_tokens=1).to_pandas()
           .set_index("doc_id").sort_index())
    assert (out["reasons"] & TOO_SHORT).all()
    # NULL and '' hash identically (COALESCE rule) -> doc 2 is a duplicate
    assert out.loc[2, "reasons"] & DUPLICATE
    assert not out.loc[1, "reasons"] & DUPLICATE
