"""Operator-level unit tests (SURVEY.md §5 / FIXTURES.md §7)."""

import numpy as np

from bionext_ray.constants import CONTEXT_SIZE, MODEL_MAX_LENGTH
from bionext_ray.functions.linking import majority_vote
from bionext_ray.functions.relext import (candidate_pairs, insert_markers,
                                          pair_windows)
from bionext_ray.gazetteer import GazetteerMatcher
from bionext_ray.rangedict import RangeDict, merge_overlapping
from bionext_ray.tokenization import tokenize, tokenize_with_offsets
from bionext_ray.windows import bio_labels, decode_doc, make_windows, window_annotations


# ---- M1 collision merge (reference src/data.py:139-167, src/utils.py:88-100)
def test_rangedict_merge_envelope():
    text = "abcdefghij"
    anns = [
        {"id": "0", "label": "ChemicalEntity", "start_span": 0, "end_span": 4, "text": text[0:4]},
        {"id": "1", "label": "ChemicalEntity", "start_span": 2, "end_span": 7, "text": text[2:7]},
    ]
    merged = merge_overlapping(anns, text)
    assert len(merged) == 1
    m = merged[0]
    assert (m["start_span"], m["end_span"]) == (0, 7)
    assert m["text"] == text[0:7]


def test_rangedict_contains_same_annotation():
    rd = RangeDict()
    a = {"id": "0", "start_span": 0, "end_span": 5}
    b = {"id": "1", "start_span": 5, "end_span": 9}
    rd[(0, 5)] = a
    rd[(5, 9)] = b
    assert (0, 5) in rd
    assert (3, 7) not in rd  # straddles two annotations


# ---- M2/M5: window math + decoder stitch
def test_single_window_roundtrip():
    text = "the spark gene binds hash today"
    ws = make_windows(text)
    assert len(ws) == 1
    anns = [{"id": "0", "label": "GeneOrGeneProduct", "start_span": 4,
             "end_span": 9, "text": "spark"}]
    labels = [bio_labels(w["offsets"], window_annotations(anns, w["view_offset"]))
              for w in ws]
    spans = decode_doc(labels, [w["offsets"] for w in ws], text)
    assert spans == [(4, 9, 0)]


def test_multi_window_roundtrip_and_boundary_span():
    # 383 one-token words, then a 2-word entity straddling the center
    # boundary (tokens 383-384), then filler
    words = [f"w{i}" for i in range(383)] + ["slow", "merge"] + ["tail"] * 30
    text = " ".join(words)
    start = len(" ".join(words[:383])) + 1
    end = start + len("slow merge")
    assert text[start:end] == "slow merge"
    ws = make_windows(text)
    assert len(ws) == 2  # 415 tokens -> two windows
    anns = [{"id": "0", "label": "DiseaseOrPhenotypicFeature",
             "start_span": start, "end_span": end, "text": "slow merge"}]
    labels = [bio_labels(w["offsets"], window_annotations(anns, w["view_offset"]))
              for w in ws]
    spans = decode_doc(labels, [w["offsets"] for w in ws], text)
    assert spans == [(start, end, 1)]


def test_decoder_accepts_o_to_i():
    # a lone I (2*1+2=4 => Disease I) after O opens a span
    # (reference decoder.py:29 "since OII is now valid")
    text = "x " * 70
    offs = tokenize_with_offsets(text)
    sample_offsets = [None] * 0 + [None] + [None] * 63 + offs + [None]
    labels = [0] * len(sample_offsets)
    labels[64 + 3] = 4
    labels[64 + 4] = 4
    spans = decode_doc([labels], [sample_offsets], text)
    assert len(spans) == 1
    s, e, c = spans[0]
    assert c == 1
    assert (s, e) == (offs[3][0], offs[4][1])


def test_window_geometry():
    # 900 tokens -> windows at centers [0,384), [384,768), [768,900)
    text = " ".join(f"t{i}" for i in range(900))
    ws = make_windows(text)
    assert [w["sequence_id"] for w in ws] == [0, 1, 2]
    assert len(ws[0]["offsets"]) == MODEL_MAX_LENGTH
    offs = tokenize_with_offsets(text)
    # j==0 view starts at first token, j>0 views start at their left context
    assert ws[0]["view_offset"][0] == offs[0][0]
    assert ws[1]["view_offset"][0] == offs[384 - 63][0]
    assert ws[2]["view_offset"][1] == offs[-1][1]


# ---- A2 majority vote first-wins ties (taxonomy.py:84-92)
def test_majority_vote_tie_first_wins():
    mentions = [
        {"id": "0", "label": "OrganismTaxon", "linked": ["A", "B"]},
        {"id": "1", "label": "OrganismTaxon", "linked": ["A", "B"]},
    ]
    majority_vote(mentions, ("OrganismTaxon",))
    assert [m["linked"] for m in mentions] == ["A", "A"]


def test_majority_vote_counts():
    mentions = [
        {"id": "0", "label": "OrganismTaxon", "linked": ["A", "B"]},
        {"id": "1", "label": "OrganismTaxon", "linked": ["B"]},
        {"id": "2", "label": "OrganismTaxon", "linked": "-"},
    ]
    majority_vote(mentions, ("OrganismTaxon",))
    assert mentions[0]["linked"] == "B"  # B appears in 2 mentions, A in 1
    assert mentions[2]["linked"] == "-"


# ---- M13 marker insertion in reverse span order (extractor/data.py:97-126)
def test_marker_insertion():
    text = "spark binds hash today"
    mentions = [
        {"linked": "G100", "label": "GeneOrGeneProduct", "start_span": 0, "end_span": 5},
        {"linked": "MESH:D001", "label": "ChemicalEntity", "start_span": 12, "end_span": 16},
    ]
    marked = insert_markers(text, mentions, "G100", "MESH:D001")
    assert marked == "[s1]spark[e1] binds [s2]hash[e2] today"
    # composite id matches via comma split
    marked2 = insert_markers(text, mentions, "X,G100", "MESH:D001")
    assert marked2.startswith("[s1]spark[e1]")


def test_pair_type_mask():
    mentions = [
        {"linked": "9606", "label": "OrganismTaxon"},
        {"linked": "CVCL:0001", "label": "CellLine"},
        {"linked": "G100", "label": "GeneOrGeneProduct"},
        {"linked": "MESH:D001", "label": "ChemicalEntity"},
    ]
    pairs = candidate_pairs(mentions)
    # Organism/CellLine never pair; Gene-Chemical does
    assert (("G100", "GeneOrGeneProduct"), ("MESH:D001", "ChemicalEntity")) in [
        (a, b) for a, b in pairs] or (("MESH:D001", "ChemicalEntity"),
                                      ("G100", "GeneOrGeneProduct")) in pairs
    for a, b in pairs:
        assert a[1] not in ("OrganismTaxon", "CellLine")
        assert b[1] not in ("OrganismTaxon", "CellLine")


# ---- M14 window marker-presence skip + right-aligned last window
def test_pair_windows_skip_and_alignment():
    filler = " ".join(["pad"] * 600)
    text = "[s1]a[e1] " + filler + " [s2]b[e2]"
    wins = [i for i, _ in pair_windows(text, "A", "B")]
    # entities ~600 tokens apart: no 510-token window contains both markers
    assert wins == []
    text2 = "[s1]a[e1] [s2]b[e2] " + filler
    assert [i for i, _ in pair_windows(text2, "A", "B")] == [0]
    # same-entity pair: no marker requirement
    assert [i for i, _ in pair_windows(text, "A", "A")] == [0, 1]


def test_tokenizer_markers_single_token():
    assert tokenize("[s1]spark[e1]") == ["[s1]", "spark", "[e1]"]


# ---- gazetteer leftmost-longest
def test_gazetteer_longest_match():
    g = GazetteerMatcher({"slow": "DiseaseOrPhenotypicFeature",
                          "slow merge": "DiseaseOrPhenotypicFeature"})
    ments = g.find_mentions("a slow merge happened slowly; slow.")
    assert [(m["text"], m["start_span"]) for m in ments] == [
        ("slow merge", 2), ("slow", 30)]


def test_gazetteer_mixed_case_keys_normalized():
    # a caller-supplied gazetteer with non-lowercase keys must work (keys
    # are normalized in __init__) instead of KeyError at match time
    g = GazetteerMatcher({"Mouse": "OrganismTaxon"})
    ments = g.find_mentions("the MOUSE ran")
    assert [(m["text"], m["label"]) for m in ments] == [
        ("MOUSE", "OrganismTaxon")]


def test_term_count_batch_dedupes_terms():
    import pyarrow as pa

    from bionext_ray.ops.textstats import term_count_batch
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["gene gene protein"])})
    out = term_count_batch(batch, ["gene", "protein", "gene"])
    rows = sorted(zip(out["term"].to_pylist(), out["n"].to_pylist()))
    # one row per (doc, distinct term); duplicate entry doesn't double-emit
    assert rows == [("gene", 2), ("protein", 1)]


def test_model_stages_expose_num_gpus():
    """SURVEY §2.3 T1/T2/T6: every model-actor stage must accept a
    per-actor num_gpus fraction (map_batches passthrough) so a real-GPU
    deployment can reserve fractions without editing stage code. GPU
    execution is untestable in this sandbox; pin the signature + default."""
    import inspect

    from bionext_ray.stages.extractor import extractor_stage
    from bionext_ray.stages.fused import kg_fused_stage
    from bionext_ray.stages.linker import linker_stage
    from bionext_ray.stages.tagger import tagger_stage
    for fn in (tagger_stage, linker_stage, extractor_stage, kg_fused_stage):
        par = inspect.signature(fn).parameters.get("num_gpus")
        assert par is not None, fn.__name__
        assert par.default is None, fn.__name__


def test_cli_exposes_num_gpus_flag():
    from bionext_ray.__main__ import build_parser
    args = build_parser().parse_args(["src", "--num-gpus", "0.25"])
    assert args.num_gpus == 0.25
    assert build_parser().parse_args(["src"]).num_gpus is None
