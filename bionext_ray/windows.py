"""Tagger sliding-window chunker, BIO labeler and span decoder.

Faithful re-expression of the reference's window math and decoding:

- chunker: /root/reference/src/data.py:169-258 — tokenize the full document
  with no special tokens, left-pad 63 PADs, then emit windows of
  [CLS] + 63-left-ctx + 384-center + 63-right-ctx + [SEP] (<=512), each with
  per-token char offsets (None for CLS/SEP/PAD) and a `view_offset` range.
- BIO labeler: /root/reference/src/data.py:316-347 (BIOTagger) — walks window
  offsets against a RangeDict of annotations; B = 2*type+1, I = 2*type+2, O=0.
- decoder: /root/reference/src/tagger/decoder.py:1-61 — strips 64 positions
  from each side of every non-last window (last window: [64:-1]), then walks
  the stitched label/offset sequence tolerating O->I as a span start.

One deliberate fix vs the reference: the reference decoder assumes each
window's label sequence was batch-padded to 512 (decoder.py:12 computes
`offset_padding` against 512); when a batch happens to contain no full-length
window the reference silently drops tail tokens. The rebuild always pads label
sequences to 512 before decoding, which equals the reference behavior whenever
its batch contained a 512-token window (the common case) and is deterministic.
"""

from __future__ import annotations

from .constants import CENTER_TOKENS, CONTEXT_SIZE, CTX, MODEL_MAX_LENGTH, label2int
from .rangedict import RangeDict
from .tokenization import CLS_ID, PAD_ID, SEP_ID, token_id, tokenize_with_offsets

Offset = "tuple[int, int] | None"


def make_windows(text: str, with_inputs: bool = False,
                 tokenizer=None) -> list[dict]:
    """Split a document into tagger windows.

    Returns a list of samples ``{"sequence_id", "offsets", "view_offset"}``
    where ``offsets`` includes the CLS/SEP (None) slots, mirroring
    /root/reference/src/data.py:181-249. A document with zero tokens yields
    zero windows (the reference would KeyError downstream; we emit no
    mentions instead).

    ``with_inputs=True`` additionally fills ``input_ids`` and
    ``attention_mask`` per sample exactly as the reference does
    (/root/reference/src/data.py:238-249): left PADs carry mask 0, every
    real token 1, and the window is [CLS] + 63-left + 384-center +
    63-right + [SEP] with mask 1 on CLS/SEP. This is what a real
    token-classification model consumes.

    ``tokenizer`` (optional) is any object with ``encode_with_offsets(text)
    -> (ids, offsets)`` — e.g. ``tokenization.ToyBPETokenizer`` — so the
    window math runs unchanged under a SUBWORD vocab where one word spans
    several tokens (the reference consumes exactly this ids+offsets pair,
    /root/reference/src/data.py:169-171). Default None keeps the whole-word
    hash-vocab fast path.
    """
    if tokenizer is None:
        offsets = tokenize_with_offsets(text)
        if with_inputs:
            tok_ids = [token_id(text[s:e]) for s, e in offsets]
    else:
        tok_ids, offsets = tokenizer.encode_with_offsets(text)
    padded: list = [None] * CTX + list(offsets)
    if with_inputs:
        ids: list = [PAD_ID] * CTX + tok_ids
        attn: list = [0] * CTX + [1] * len(offsets)
    samples = []
    j = 0
    for i in range(CTX, len(padded), CENTER_TOKENS):
        left = padded[i - CTX:i]
        center = padded[i:i + CENTER_TOKENS]
        right = padded[i + CENTER_TOKENS:i + CENTER_TOKENS + CTX]
        sample_offsets = [None] + left + center + right + [None]
        assert len(sample_offsets) <= MODEL_MAX_LENGTH
        if j == 0:
            low, high = sample_offsets[CONTEXT_SIZE][0], sample_offsets[-2][1]
        else:
            low, high = sample_offsets[1][0], sample_offsets[-2][1]
        sample = {
            "sequence_id": j,
            "offsets": sample_offsets,
            "view_offset": (low, high),
        }
        if with_inputs:
            hi = i + CENTER_TOKENS
            sample["input_ids"] = ([CLS_ID] + ids[i - CTX:i] + ids[i:hi]
                                   + ids[hi:hi + CTX] + [SEP_ID])
            sample["attention_mask"] = ([1] + attn[i - CTX:i] + attn[i:hi]
                                        + attn[hi:hi + CTX] + [1])
            assert len(sample["input_ids"]) == len(sample_offsets)
        samples.append(sample)
        j += 1
    return samples


def window_annotations(annotations: list[dict], view: tuple[int, int]) -> RangeDict:
    """Annotations visible inside a window view, indexed in a RangeDict
    (reference per-window re-index: /root/reference/src/data.py:206-234).
    Collisions are assumed resolved beforehand (merge_overlapping)."""
    low, high = view
    rd = RangeDict()
    for ann in annotations:
        if (low <= ann["start_span"] <= high) or (low <= ann["end_span"] <= high):
            rd[(ann["start_span"], ann["end_span"])] = ann
    return rd


def bio_labels(offsets: list, annotations: RangeDict) -> list[int]:
    """BIO label ids for one window (reference BIOTagger,
    /root/reference/src/data.py:316-347)."""
    labels = [0]
    prev_annotation = None
    current_label = 0
    for offset in offsets[1:]:
        if offset is None:
            current_label = 0
        else:
            if offset in annotations:
                ann = annotations[offset]
                if prev_annotation != ann:
                    current_label = 2 * label2int(ann["label"]) + 1
                    prev_annotation = ann
                else:
                    current_label = 2 * label2int(ann["label"]) + 2
            else:
                current_label = 0
                prev_annotation = None
        labels.append(current_label)
    labels += [0] * (len(offsets) - len(labels))
    return labels


def decode_doc(label_seqs: list[list[int]], offset_seqs: list[list],
               text: str, padding: int = CONTEXT_SIZE) -> list[tuple[int, int, int]]:
    """Stitch per-window label sequences and decode BIO to spans.

    Port of /root/reference/src/tagger/decoder.py:1-61 (with label sequences
    padded to 512 first; see module docstring). Returns [(start, end, class)].
    """
    doc_out: list[int] = []
    doc_off: list = []
    for i in range(len(label_seqs) - 1):
        labels = label_seqs[i] + [0] * (MODEL_MAX_LENGTH - len(label_seqs[i]))
        offset_padding = padding - (MODEL_MAX_LENGTH - len(offset_seqs[i]))
        doc_out.extend(labels[padding:-padding])
        doc_off.extend(offset_seqs[i][padding:-offset_padding])
    doc_out.extend(label_seqs[-1][padding:-1])
    doc_off.extend(offset_seqs[-1][padding:-1])

    prev = 0
    temp: list = []
    data: list = []
    labels_out: list[int] = []
    curr_label = 0
    for label, offset in zip(doc_out, doc_off):
        if label != 0:
            curr_label = (label - 1) // 2
            label = label % 2
            if label == 0:
                label = 2
        if (label == 1) or (prev == 0 and label == 2):
            if len(temp) != 0:
                data.append(temp)
                labels_out.append(curr_label)
            temp = [offset]
        elif label == 2:
            temp.append(offset)
        elif prev != 0 and label == 0:
            if len(temp) != 0:
                data.append(temp)
                labels_out.append(curr_label)
            temp = []
        prev = label
    if len(temp) != 0:
        data.append(temp)
        labels_out.append(curr_label)

    spans = []
    for toks, lab in zip(data, labels_out):
        spans.append((toks[0][0], toks[-1][1], int(lab)))
    return spans
