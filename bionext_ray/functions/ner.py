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
from ..rangedict import merge_overlapping
from ..windows import bio_labels, decode_doc, make_windows, window_annotations


def tag_document(text: str, matcher: GazetteerMatcher) -> list[dict]:
    """Detect mentions in one document. Returns annotation dicts
    ``{id, label, text, start_span, end_span, linked}`` with ``linked='-'``
    (the un-linked sentinel, /root/reference/src/tagger/__init__.py:126)."""
    windows = make_windows(text)
    if not windows:
        return []
    # the surrogate "model": gazetteer matches play the role of the CRF's
    # per-window predictions
    matches = merge_overlapping(matcher.find_mentions(text), text)
    label_seqs, offset_seqs = [], []
    for w in windows:
        anns = window_annotations(matches, w["view_offset"])
        label_seqs.append(bio_labels(w["offsets"], anns))
        offset_seqs.append(w["offsets"])
    spans = decode_doc(label_seqs, offset_seqs, text)
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
