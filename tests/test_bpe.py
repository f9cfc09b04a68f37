"""Window/decode math under a subword (toy BPE) vocab.

The reference tokenizer is subword: one word yields several (id, offset)
pairs (/root/reference/src/data.py:169-171). These tests run the SAME
chunker, BIO labeler and decoder with ToyBPETokenizer so multi-subtoken
words exercise every piece of the window math that the whole-word hash
tokenizer cannot.
"""
import numpy as np

from bionext_ray.tokenization import (MARKER_IDS, ToyBPETokenizer,
                                      HashWordTokenizer, token_id)
from bionext_ray.windows import (bio_labels, decode_doc, make_windows,
                                 window_annotations)


def test_bpe_splits_words_with_correct_offsets():
    t = ToyBPETokenizer([("s", "p"), ("sp", "a"), ("spa", "r")])
    text = "spark gene"
    ids, offs = t.encode_with_offsets(text)
    # 'spark' -> 'spar' + 'k'; 'gene' -> fully char-split (no merges apply)
    assert offs == [(0, 4), (4, 5), (6, 7), (7, 8), (8, 9), (9, 10)]
    assert [text[s:e] for s, e in offs] == ["spar", "k", "g", "e", "n", "e"]
    # continuation pieces hash with the ## prefix: distinct from initials
    assert ids[1] == token_id("##k") != token_id("k")


def test_bpe_merge_priority_order():
    # ("a","b") outranks ("b","c"): "abc" -> ["ab","c"], not ["a","bc"]
    t = ToyBPETokenizer([("a", "b"), ("b", "c")])
    assert t._bpe_word("abc") == ["ab", "c"]
    t2 = ToyBPETokenizer([("b", "c"), ("a", "b")])
    assert t2._bpe_word("abc") == ["a", "bc"]


def test_bpe_markers_stay_single_tokens():
    t = ToyBPETokenizer()
    ids, offs = t.encode_with_offsets("[s1]p53[e1]")
    assert ids[0] == MARKER_IDS["[s1]"] and ids[-1] == MARKER_IDS["[e1]"]
    assert offs[0] == (0, 4) and offs[-1] == (7, 11)


def test_single_window_roundtrip_under_bpe():
    # empty merge table: EVERY multi-char word is multi-subtoken
    tok = ToyBPETokenizer()
    text = "the spark gene binds hash today"
    ws = make_windows(text, with_inputs=True, tokenizer=tok)
    assert len(ws) == 1
    # the entity word spans several subtokens inside the window
    n_sub = sum(1 for o in ws[0]["offsets"]
                if o is not None and 4 <= o[0] < 9)
    assert n_sub == 5                     # s, p, a, r, k
    anns = [{"id": "0", "label": "GeneOrGeneProduct", "start_span": 4,
             "end_span": 9, "text": "spark"}]
    labels = [bio_labels(w["offsets"],
                         window_annotations(anns, w["view_offset"]))
              for w in ws]
    # the B tag sits on the first subtoken, I on the continuations
    span_labels = [l for l, o in zip(labels[0], ws[0]["offsets"])
                   if o is not None and 4 <= o[0] < 9]
    assert span_labels[0] % 2 == 1 and all(
        x == span_labels[0] + 1 for x in span_labels[1:])
    spans = decode_doc(labels, [w["offsets"] for w in ws], text)
    assert spans == [(4, 9, 0)]


def test_multi_window_roundtrip_under_bpe():
    # enough multi-char words that subword explosion forces several windows
    words = [f"gw{i}" for i in range(200)] + ["slow", "merge"] + ["tl"] * 20
    text = " ".join(words)
    start = text.index("slow merge")
    end = start + len("slow merge")
    tok = ToyBPETokenizer([("g", "w")])   # partial merges: mixed piece sizes
    ws = make_windows(text, with_inputs=True, tokenizer=tok)
    assert len(ws) >= 2                   # subwording crossed a window edge
    anns = [{"id": "0", "label": "DiseaseOrPhenotypicFeature",
             "start_span": start, "end_span": end, "text": "slow merge"}]
    labels = [bio_labels(w["offsets"],
                         window_annotations(anns, w["view_offset"]))
              for w in ws]
    spans = decode_doc(labels, [w["offsets"] for w in ws], text)
    assert spans == [(start, end, 1)]
    # input_ids align 1:1 with offsets in every window
    for w in ws:
        assert len(w["input_ids"]) == len(w["offsets"])
        assert len(w["attention_mask"]) == len(w["offsets"])


def test_hash_word_tokenizer_matches_default_path():
    text = "aspirin inhibits cox2 in mice"
    default = make_windows(text, with_inputs=True)
    seamed = make_windows(text, with_inputs=True,
                          tokenizer=HashWordTokenizer())
    assert len(default) == len(seamed)
    for a, b in zip(default, seamed):
        assert a["offsets"] == b["offsets"]
        assert a["input_ids"] == b["input_ids"]
        assert a["view_offset"] == b["view_offset"]


def test_viterbi_decode_composes_with_bpe_windows():
    # logits -> CRF-Viterbi -> decode_doc over subword windows: the whole
    # inference-side path a real model would take
    from bionext_ray.crf import viterbi_decode
    tok = ToyBPETokenizer()
    text = "aa spark bb"
    ws = make_windows(text, with_inputs=True, tokenizer=tok)
    anns = [{"id": "0", "label": "GeneOrGeneProduct", "start_span": 3,
             "end_span": 8, "text": "spark"}]
    gold = [bio_labels(w["offsets"],
                       window_annotations(anns, w["view_offset"]))
            for w in ws]
    # near-one-hot emissions for the gold plan
    L = len(gold[0])
    em = np.full((1, L, 13), -4.0)
    np.put_along_axis(em, np.asarray(gold)[..., None], 4.0, axis=-1)
    # decode unmasked, as the reference does (its window attention masks
    # have left-pad holes; pad positions are dropped by their None offsets)
    dec = viterbi_decode(em)
    spans = decode_doc([dec[0].tolist()], [ws[0]["offsets"]], text)
    assert spans == [(3, 8, 0)]
