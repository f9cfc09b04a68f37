"""Doc-local relation extraction: candidate pairs, entity-marker insertion,
window/encode, surrogate scoring, composite-id expansion, logit fusion.

Reference parity:
- candidate generation over unique (identifier, type) with the 6x6
  type-compatibility mask; at inference every compatible pair is a
  Negative_Class candidate (/root/reference/src/extractor/data.py:64-94 —
  relations==[] so shuffle_counter==len(perms)).
- marker insertion: every mention whose comma-split identifier intersects the
  pair gets [s1]/[e1] or [s2]/[e2], inserted in reverse span order
  (data.py:97-131).
- windowing: 512-token windows over the marked text with last-window
  right-alignment min(i*L, max(0, len-L)); windows missing either entity's
  start marker are skipped when entity1 != entity2 (data.py:342-396).
- scoring + pre-fusion filter: per (pair, window) logits; windows whose
  argmax is Negative_Class (8) are dropped before fusion
  (/root/reference/src/extractor/__init__.py:70-83).
- composite expansion + fusion: comma cross-product of entity ids; per
  (doc, e1, e2) with >1 sample, sum softmax(relation logits) and sum novelty
  logits, then argmax; post-fusion Negative_Class filter
  (__init__.py:85-133).

Documented deviation: the reference iterates candidate pairs in Python-set
order and then random.shuffle()s them (data.py:83-85), which makes the
*direction* of emitted negative-candidate pairs nondeterministic. The rebuild
orders the unique id set by (type, identifier) so pair direction is stable.
"""

from __future__ import annotations

import itertools
import math
from collections import defaultdict

import numpy as np

from ..constants import (ID2LABEL_NOVEL, ID2LABEL_RELATION, LABEL2ID_ENTITY,
                         MODEL_MAX_LENGTH, NEGATIVE_CLASS, TYPE_PAIR_MASK)
from ..scorer import softmax
from ..tokenization import tokenize

# CLS/SEP analogs occupy 2 slots (data.py:353-355)
MAX_VALID_LENGTH = MODEL_MAX_LENGTH - 2


def candidate_pairs(mentions: list[dict]) -> list[tuple[tuple, tuple]]:
    """Unique (identifier, type) combinations allowed by the mask."""
    ids = sorted({(m["linked"], m["label"]) for m in mentions})
    out = []
    for e1, e2 in itertools.combinations(ids, 2):
        if TYPE_PAIR_MASK[LABEL2ID_ENTITY[e1[1]]][LABEL2ID_ENTITY[e2[1]]] == 1:
            out.append((e1, e2))
    return out


def _marked_from_splits(split_mentions: list[tuple], r1: set,
                        r2: set) -> list[tuple]:
    """Core of marked_mentions over pre-split identifier lists (the split
    is per-mention work — hoisted out of the per-pair loop)."""
    marked = []
    for start, end, els in split_mentions:
        for el in els:
            if el in r1:
                marked.append((start, end, 1))
                break
            elif el in r2:
                marked.append((start, end, 2))
                break
    return marked


def split_mention_ids(mentions: list[dict]) -> list[tuple]:
    """[(start, end, [comma-split identifier parts])], computed once per doc
    and reused across all candidate pairs."""
    return [(m["start_span"], m["end_span"], m["linked"].split(","))
            for m in mentions]


def marked_mentions(mentions: list[dict], entity1: str, entity2: str) -> list[tuple]:
    """Mentions matched to the pair by comma-split identifier intersection
    (data.py:99-119): [(start, end, entity_order)]."""
    return _marked_from_splits(split_mention_ids(mentions),
                               set(entity1.split(",")),
                               set(entity2.split(",")))


def _insert_from_marked(text: str, marked: list[tuple]) -> str:
    for start, end, order in reversed(marked):
        text = text[:end] + f"[e{order}]" + text[end:]
        text = text[:start] + f"[s{order}]" + text[start:]
    return text


def insert_markers(text: str, mentions: list[dict], entity1: str, entity2: str) -> str:
    """Mark every mention of the two (possibly composite) entity ids
    (data.py:97-126)."""
    return _insert_from_marked(
        text, marked_mentions(mentions, entity1, entity2))


def pair_windows(marked_text: str, entity1: str, entity2: str):
    """Yield (sequence_id, window_tokens) of windows that retain both
    entities' markers (data.py:342-396; the reference checks [s1] and [s2]
    presence; last window is right-aligned)."""
    tokens = tokenize(marked_text)
    L = MAX_VALID_LENGTH
    for i in range(math.ceil(len(tokens) / L)):
        window = tokens[min(i * L, max(0, len(tokens) - L)):min((i + 1) * L, len(tokens))]
        if entity1 != entity2:
            has_s1 = "[s1]" in window
            has_s2 = "[s2]" in window
            if not (has_s1 and has_s2):
                continue
        yield i, window


def generate_pair_samples(doc_id: str, text: str, mentions: list[dict],
                          with_inputs: bool = False) -> list[dict]:
    """Phase 1 of the extractor: one sample dict per scoreable (pair,
    window): {doc_id, entity1, entity2, sequence_id} plus, when
    ``with_inputs``, the model features ``input_ids`` ([CLS] + window +
    [SEP]) and ``indexes`` (positions of every [s1]/[e1]/[s2]/[e2] marker
    token in input_ids, the reference's index_type='both' —
    /root/reference/src/extractor/data.py:355-390)."""
    from ..tokenization import CLS_ID, MARKER_IDS, SEP_ID, token_id

    samples = []
    pairs = candidate_pairs(mentions)
    # Fast path: when the doc provably fits one window even after marker
    # insertion, that single window contains every marker, so the expensive
    # per-pair marker insertion + re-tokenization is skipped entirely.
    # Bound: each of the 2 inserts per marked mention adds the marker token
    # plus at most one token split -> tokens(marked) <= tokens(text) +
    # 4 * n_marked. Semantics identical to the slow path (window [0] with
    # both markers present). Disabled when model features are requested —
    # those need the real marked-window token ids.
    from ..tokenization import count_tokens
    n_tok_text = count_tokens(text) if pairs else 0
    marker_ids = set(MARKER_IDS.values())
    splits = split_mention_ids(mentions) if pairs else []
    for e1, e2 in pairs:
        marked_ms = _marked_from_splits(splits, set(e1[0].split(",")),
                                        set(e2[0].split(",")))
        if not with_inputs and \
                n_tok_text + 4 * len(marked_ms) <= MAX_VALID_LENGTH:
            wins = [(0, None)]
        else:
            marked = _insert_from_marked(text, marked_ms)
            wins = pair_windows(marked, e1[0], e2[0])
        for seq_id, win_tokens in wins:
            s = {"doc_id": doc_id, "entity1": e1[0], "entity2": e2[0],
                 "sequence_id": seq_id}
            if with_inputs:
                ids = [CLS_ID] + [token_id(t) for t in win_tokens] + [SEP_ID]
                s["input_ids"] = ids
                s["indexes"] = [k for k, tid in enumerate(ids)
                                if tid in marker_ids]
            samples.append(s)
    return samples


def fuse_doc_relations(doc_id: str, doc_relations: list[dict]) -> list[dict]:
    """Phase 3: composite-id cross-product expansion (__init__.py:87-94) and
    softmax-sum logit fusion (__init__.py:98-108) over a doc's surviving
    (pair, window) relations. Softmax is computed lazily — only groups with
    >1 sample fuse; singleton groups (the common case) use the precomputed
    argmax label — and memoized per sample across the groups a composite id
    expands into."""
    remapped: dict[tuple, list] = defaultdict(list)
    for pair in doc_relations:
        for p1 in pair["entity1"].split(","):
            for p2 in pair["entity2"].split(","):
                remapped[(p1, p2)].append(pair)

    triples = []
    for (p1, p2), v in remapped.items():
        if len(v) > 1:
            for pair in v:
                if "_rel_soft" not in pair:
                    pair["_rel_soft"] = softmax(pair["relation_logits"])
            rel_sum = np.sum(np.array([pair["_rel_soft"] for pair in v]),
                             axis=0)
            true_label = int(np.argmax(rel_sum))
            novel_sum = np.sum(np.array([pair["novel_logits"] for pair in v]),
                               axis=0)
            novel_label = int(np.argmax(novel_sum))
        else:
            true_label, novel_label = v[0]["label"], v[0]["novel"]
        if true_label != NEGATIVE_CLASS:
            triples.append({
                "doc_id": doc_id,
                "subj": p1,
                "pred": ID2LABEL_RELATION[true_label],
                "obj": p2,
                "novel": ID2LABEL_NOVEL[novel_label] == "Novel",
            })
    return triples


def relations_from_scores(samples: list[dict], rels: np.ndarray,
                          novs: np.ndarray) -> list[dict]:
    """Phase 2 output shaping: apply the pre-fusion Negative_Class filter
    (/root/reference/src/extractor/__init__.py:80-82) and keep the logits
    the fusion needs."""
    # one axis-argmax over the whole sample batch (np.argmax ties break to
    # the first maximum on both the scalar and vector paths)
    rel_cls = np.argmax(rels, axis=1) if len(samples) else np.zeros(0, int)
    nov_cls = np.argmax(novs, axis=1) if len(samples) else np.zeros(0, int)
    doc_relations = []
    for i, s in enumerate(samples):
        rel_class = int(rel_cls[i])
        if rel_class != NEGATIVE_CLASS:
            doc_relations.append({
                "entity1": s["entity1"], "entity2": s["entity2"],
                "label": rel_class, "novel": int(nov_cls[i]),
                "sequence_id": s["sequence_id"],
                "relation_logits": rels[i], "novel_logits": novs[i],
            })
    return doc_relations


def extract_document(doc_id: str, text: str, mentions: list[dict]) -> list[dict]:
    """Full doc-local extractor (generate -> score -> fuse, single doc,
    surrogate scorer). ``mentions`` are the cleaned linker output.
    Returns triple rows {doc_id, subj, pred, obj, novel}."""
    samples = generate_pair_samples(doc_id, text, mentions)
    if not samples:
        return []
    from ..scorer import relation_logits_batch
    rels, novs = relation_logits_batch(
        [(s["doc_id"], s["entity1"], s["entity2"], s["sequence_id"])
         for s in samples])
    return fuse_doc_relations(doc_id, relations_from_scores(samples, rels, novs))
