"""Doc-local mention detection: window fan-out -> per-window BIO labels ->
stitched decode. Pure function; the Ray tagger stage calls it per document
inside an actor batch, so a document's windows never cross a task boundary
(no groupby shuffle for window regrouping — SURVEY.md A1/§7).

Reference path: window build /root/reference/src/data.py:169-258, per-window
model + regroup /root/reference/src/tagger/__init__.py:84-104, decode
/root/reference/src/tagger/decoder.py.
"""

from __future__ import annotations

from ..constants import ID2LABEL_ENTITY
from ..gazetteer import GazetteerMatcher
from ..windows import bio_labels, decode_doc, make_windows, window_annotations


def spans_to_mentions(text: str, spans: list[tuple]) -> list[dict]:
    """Decoded (start, end, class) spans -> annotation dicts with the
    un-linked sentinel (/root/reference/src/tagger/__init__.py:122-135)."""
    out = []
    for i, (s, e, cls) in enumerate(spans):
        out.append({
            "id": str(i),
            "label": ID2LABEL_ENTITY[cls],
            "text": text[s:e],
            "start_span": s,
            "end_span": e,
            "linked": "-",
        })
    return out


def tag_document(text: str, matcher: GazetteerMatcher) -> list[dict]:
    """Detect mentions in one document. Returns annotation dicts
    ``{id, label, text, start_span, end_span, linked}`` with ``linked='-'``
    (the un-linked sentinel, /root/reference/src/tagger/__init__.py:126).

    Single-window fast path: for a document that fits one window, the BIO
    encode -> stitch -> decode roundtrip is the identity on the matcher's
    annotations — every match is token-aligned by construction (the regex
    requires non-alphanumeric on both sides, exactly where the tokenizer
    splits), all matches are visible (one view spans the whole text), and
    the decoder re-emits each aligned annotation's (start, end, class)
    verbatim. So the per-token labeling walk is skipped entirely; the
    multi-window path (where window edges DO matter) is unchanged, and the
    parity suite pins both against the sequential oracle."""
    from ..constants import CENTER_TOKENS
    from ..tokenization import count_tokens
    n_tokens = count_tokens(text)
    if n_tokens == 0:
        return []
    # Light span tuples, not annotation dicts: at ~18 mentions/doc the
    # dict construction dominated the regex scan itself. The reference's
    # collision merge (M1, rangedict.merge_overlapping) is SKIPPED here
    # because finditer matches are non-overlapping by construction, which
    # makes the merge provably the identity (span_collision is always 0
    # and get_all_annotations returns insertion order) — it still runs on
    # model-backend paths, where overlapping predictions are possible.
    spans = matcher.find_spans(text)
    n = len(text)
    # Token-alignment guard: the regex word boundary ([a-z0-9] lookarounds)
    # and the tokenizer's token class ([A-Za-z0-9_]) differ in exactly one
    # character — '_'. A match touching an underscore is NOT token-aligned
    # (the underscore glues it into a longer token), the BIO labeler drops
    # it, and the fast-path identity would not hold — so fall through to
    # the full windows path for such (rare) documents.
    aligned = all(
        (s == 0 or text[s - 1] != "_") and (e >= n or text[e] != "_")
        for s, e, _ in spans)
    if aligned and n_tokens <= CENTER_TOKENS:   # exactly one window
        # reference-decoder quirk, reproduced faithfully: a B label flushes
        # the previous span using the ALREADY-UPDATED current class
        # (decoder.py:33-38), so a span token-adjacent to the next span
        # (no O between) takes the NEXT span's class. Token-adjacency ==
        # the gap between the (token-aligned) spans is all-whitespace: any
        # non-space gap char would itself tokenize and sit between them.
        gaz = matcher.gazetteer
        out = []
        for i, (s, e, low) in enumerate(spans):
            if i + 1 < len(spans) and not text[e:spans[i + 1][0]].strip():
                label = gaz[spans[i + 1][2]]
            else:
                label = gaz[low]
            out.append({"id": str(i), "label": label, "text": text[s:e],
                        "start_span": s, "end_span": e, "linked": "-"})
        return out
    gaz = matcher.gazetteer
    matches = [{"id": str(i), "label": gaz[low], "text": text[s:e],
                "start_span": s, "end_span": e}
               for i, (s, e, low) in enumerate(spans)]
    windows = make_windows(text)
    # the surrogate "model": gazetteer matches play the role of the CRF's
    # per-window predictions
    label_seqs, offset_seqs = [], []
    for w in windows:
        anns = window_annotations(matches, w["view_offset"])
        label_seqs.append(bio_labels(w["offsets"], anns))
        offset_seqs.append(w["offsets"])
    spans = decode_doc(label_seqs, offset_seqs, text)
    return spans_to_mentions(text, spans)


def tag_documents_with_backend(texts: list[str], backend) -> list[list[dict]]:
    """Batched model path: ALL windows of ALL documents are collated and
    scored in ONE backend call (the cross-doc batching a GPU forward pass
    needs; the reference batches windows across documents too,
    /root/reference/main.py:31-33), then labels regroup per document for the
    stitched decode — the regroup never leaves the task."""
    import numpy as np  # noqa: F401  (kept local: hot path imports once)

    from ..models import collate_tagger_windows

    doc_windows = [make_windows(t, with_inputs=True) for t in texts]
    flat = [w for ws in doc_windows for w in ws]
    labels = None
    if flat:
        feats = collate_tagger_windows(flat)
        labels = backend(feats["input_ids"], feats["attention_mask"])
    mentions, pos = [], 0
    for text, ws in zip(texts, doc_windows):
        if not ws:
            mentions.append([])
            continue
        label_seqs = [labels[pos + k][:len(w["offsets"])].tolist()
                      for k, w in enumerate(ws)]
        offset_seqs = [w["offsets"] for w in ws]
        pos += len(ws)
        spans = decode_doc(label_seqs, offset_seqs, text)
        mentions.append(spans_to_mentions(text, spans))
    return mentions
