"""Sequential reference-semantics oracle.

An INDEPENDENT re-implementation of the reference pipeline's inference
semantics in the reference's own style (whole-corpus dicts + loops), used to
verify the Ray Data pipeline. It shares only the "model weights" with the
library under test — the tokenizer, the gazetteer matcher, the hashed
embedder and the hashed relation scorer — while window math, BIO
labeling/decoding, the linking cascade, majority votes, pair generation and
logit fusion are re-derived directly from the reference sources cited below.

Reference anchors: window build src/data.py:169-258; BIOTagger
src/data.py:316-347; decoder src/tagger/decoder.py; linker passes
src/linker/{taxonomy,chemicals,diseases,genes,seq_variant,cells,cleaner}.py;
extractor src/extractor/data.py:64-131,342-396 and
src/extractor/__init__.py:59-133.
"""

from __future__ import annotations

import itertools
import math
from collections import defaultdict

import numpy as np

from bionext_ray.constants import (ID2LABEL_NOVEL, ID2LABEL_RELATION,
                                   LABEL2ID_ENTITY, TYPE_PAIR_MASK)
from bionext_ray.embedding import embed_text
from bionext_ray.gazetteer import GazetteerMatcher
from bionext_ray.scorer import relation_logits, softmax
from bionext_ray.tokenization import tokenize, tokenize_with_offsets

CONTEXT = 64
CTX = CONTEXT - 1
CENTER = 512 - 2 * CONTEXT


# ---------------------------------------------------------------- tagger
def _windows(text):
    offsets = [None] * CTX + tokenize_with_offsets(text)
    out = []
    j = 0
    for i in range(CTX, len(offsets), CENTER):
        so = ([None] + offsets[i - CTX:i] + offsets[i:i + CENTER]
              + offsets[i + CENTER:i + CENTER + CTX] + [None])
        lo = so[CONTEXT][0] if j == 0 else so[1][0]
        out.append((so, (lo, so[-2][1])))
        j += 1
    return out


def _bio(so, anns):
    # anns: list of (start, end, label)
    def find(tok):
        for s, e, lab in anns:
            if s <= tok[0] and tok[1] <= e:
                return (s, e, lab)
        return None
    labels = [0]
    prev = None
    for tok in so[1:]:
        if tok is None:
            cur = 0
        else:
            a = find(tok)
            if a is not None:
                if prev != a:
                    cur = 2 * LABEL2ID_ENTITY[a[2]] + 1
                    prev = a
                else:
                    cur = 2 * LABEL2ID_ENTITY[a[2]] + 2
            else:
                cur = 0
                prev = None
        labels.append(cur)
    return labels


def _decode(label_seqs, offset_seqs):
    pad = CONTEXT
    outs, offs = [], []
    for i in range(len(label_seqs) - 1):
        lab = label_seqs[i] + [0] * (512 - len(label_seqs[i]))
        op = pad - (512 - len(offset_seqs[i]))
        outs.extend(lab[pad:-pad])
        offs.extend(offset_seqs[i][pad:-op])
    outs.extend(label_seqs[-1][pad:-1])
    offs.extend(offset_seqs[-1][pad:-1])
    spans = []
    temp, prev, cur = [], 0, 0
    for label, off in zip(outs, offs):
        if label != 0:
            cur = (label - 1) // 2
            label = label % 2 or 2
        if label == 1 or (prev == 0 and label == 2):
            if temp:
                spans.append((temp[0][0], temp[-1][1], cur))
            temp = [off]
        elif label == 2:
            temp.append(off)
        elif prev != 0 and label == 0:
            if temp:
                spans.append((temp[0][0], temp[-1][1], cur))
            temp = []
        prev = label
    if temp:
        spans.append((temp[0][0], temp[-1][1], cur))
    return spans


def oracle_tag(text, gazetteer):
    matcher = GazetteerMatcher(gazetteer)
    found = [(m["start_span"], m["end_span"], m["label"])
             for m in matcher.find_mentions(text)]
    ws = _windows(text)
    if not ws:
        return []
    labels, offsets = [], []
    for so, (lo, hi) in ws:
        visible = [a for a in found
                   if (lo <= a[0] <= hi) or (lo <= a[1] <= hi)]
        labels.append(_bio(so, visible))
        offsets.append(so)
    ents = []
    for i, (s, e, c) in enumerate(_decode(labels, offsets)):
        ents.append({"id": str(i),
                     "label": {v: k for k, v in
                               {"GeneOrGeneProduct": 0,
                                "DiseaseOrPhenotypicFeature": 1,
                                "ChemicalEntity": 2, "SequenceVariant": 3,
                                "OrganismTaxon": 4, "CellLine": 5}.items()}[c],
                     "text": text[s:e], "start_span": s, "end_span": e,
                     "linked_id": "-"})
    return ents


# ---------------------------------------------------------------- linker
def _emb_lookup(text, shards, threshold=0.9):
    v = embed_text(text.lower())
    best = []
    for _, ids, M in shards:
        scores = M @ v
        if len(scores) == 0:
            continue
        i = int(np.argmax(scores))
        if scores[i] > threshold:
            best.append((ids[i], float(scores[i])))
    if best:
        return [max(best, key=lambda x: x[1])[0]]
    return []


def _vote(doc, types, correction=None, guard=False):
    id_entities = defaultdict(list)
    for ent in doc["entities"]:
        if ent["label"] in types and isinstance(ent["linked_id"], list):
            for lid in ent["linked_id"]:
                id_entities[lid].append(ent["id"])
    for ent in doc["entities"]:
        if ent["label"] in types and isinstance(ent["linked_id"], list):
            ent["candidates"] = list(ent["linked_id"])   # pre-vote list
            cands = [(lid, len(id_entities[lid])) for lid in ent["linked_id"]]
            if guard and not cands:
                ent["linked_id"] = "-"
                continue
            best, _ = max(cands, key=lambda x: x[1])
            if correction and best in correction:
                best = correction[best]
            ent["linked_id"] = best


def oracle_link(doc, kb):
    ents = doc["entities"]
    # taxonomy: case-sensitive direct tier first (taxonomy.py:53), then the
    # lowercased name dict
    tax_direct = kb.direct.get("OrganismTaxon", {})
    for e in ents:
        if e["label"] == "OrganismTaxon":
            if e["text"] in tax_direct:
                v = tax_direct[e["text"]]
                e["linked_id"] = [v[0]] if isinstance(v, list) else [v]
            elif e["text"].lower() in kb.taxonomy:
                e["linked_id"] = list(kb.taxonomy[e["text"].lower()])
    _vote(doc, ("OrganismTaxon",), correction=kb.manual_correction)
    # chemicals
    for e in ents:
        if e["label"] == "ChemicalEntity":
            pred = list(kb.direct.get("ChemicalEntity", {}).get(e["text"].lower(), []))
            if not pred:
                pred = _emb_lookup(e["text"], kb.emb["mesh"])
            e["linked_id"] = pred if pred else "-"
    _vote(doc, ("ChemicalEntity",))
    # diseases
    for e in ents:
        if e["label"] == "DiseaseOrPhenotypicFeature":
            pred = list(kb.direct.get("DiseaseOrPhenotypicFeature", {}).get(e["text"].lower(), []))
            if not pred:
                pred = _emb_lookup(e["text"], kb.emb["ctd"])
            e["linked_id"] = pred if pred else "-"
    _vote(doc, ("DiseaseOrPhenotypicFeature",))
    # genes
    organism_ids = [(e["linked_id"], e["start_span"]) for e in ents
                    if e["label"] == "OrganismTaxon"]
    if not organism_ids:
        organism_ids.append(("9606", 0))
    for e in ents:
        if e["label"] == "GeneOrGeneProduct":
            distance, nearest = 10_000_000, "9606"
            for oid, ostart in organism_ids:
                if abs(e["start_span"] - ostart) < distance and oid in kb.genes:
                    distance, nearest = abs(e["start_span"] - ostart), oid
            pred = []
            # per-tax direct tier before the alias dict (genes.py:141-143)
            per_tax = kb.direct.get("GeneOrGeneProduct", {}).get(nearest, {})
            if e["text"].lower() in per_tax:
                pred = list(per_tax[e["text"].lower()])
            if not pred and e["text"].lower() in kb.genes.get(nearest, {}):
                pred = sorted(set(kb.genes[nearest][e["text"].lower()]))
            if not pred and nearest in kb.gene_emb:
                ids, M = kb.gene_emb[nearest]
                v = embed_text(e["text"].lower())
                s = M @ v
                i = int(np.argmax(s))
                pred = [ids[i] if s[i] > 0.9 else "-"]
            if not pred and e["text"].lower() in kb.backup_gene:
                pred = list(kb.backup_gene[e["text"].lower()])
            e["linked_id"] = pred if pred else "-"
    _vote(doc, ("GeneOrGeneProduct",))
    # sequence variants
    gene_ids = [(e["linked_id"], e["start_span"]) for e in ents
                if e["label"] == "GeneOrGeneProduct"]
    for e in ents:
        if e["label"] == "SequenceVariant":
            distance, nearest = 10_000_000, None
            for gid, gstart in gene_ids:
                if abs(e["start_span"] - gstart) < distance:
                    distance, nearest = abs(e["start_span"] - gstart), gid
            pred = []
            if e["text"].lower().startswith("rs"):
                pred = [e["text"].lower()]
            if not pred and nearest in kb.gene_lookup:
                sym = kb.gene_lookup[nearest]
                norm = e["text"].replace("/", ">").replace("--", "").replace(" ", "")
                pred = list(kb.variant_lookup.get(f"{norm} {sym}", []))
            e["linked_id"] = pred
    _vote(doc, ("SequenceVariant",), guard=True)
    # cells
    for e in ents:
        if e["label"] == "CellLine":
            pred = list(kb.direct.get("CellLine", {}).get(e["text"].lower(), []))
            if not pred:
                pred = _emb_lookup(e["text"], kb.emb["cellosaurus"])
            e["linked_id"] = pred if pred else "-"
    _vote(doc, ("CellLine",))
    # cleaner
    clean, counter = [], 0
    for e in ents:
        if e["linked_id"] != "-" and not isinstance(e["linked_id"], list):
            e = dict(e)
            e["id"] = str(counter)
            counter += 1
            clean.append(e)
    doc["entities"] = clean
    return doc


# ---------------------------------------------------------------- extractor
def oracle_extract(doc):
    text, ents = doc["text"], doc["entities"]
    ids = sorted({(e["linked_id"], e["label"]) for e in ents})
    doc_relations = []
    for e1, e2 in itertools.combinations(ids, 2):
        if TYPE_PAIR_MASK[LABEL2ID_ENTITY[e1[1]]][LABEL2ID_ENTITY[e2[1]]] != 1:
            continue
        r1, r2 = set(e1[0].split(",")), set(e2[0].split(","))
        e_clean = []
        for e in ents:
            for el in e["linked_id"].split(","):
                if el in r1:
                    e_clean.append((e["start_span"], e["end_span"], 1))
                    break
                elif el in r2:
                    e_clean.append((e["start_span"], e["end_span"], 2))
                    break
        marked = text
        for s, en, order in reversed(e_clean):
            marked = marked[:en] + f"[e{order}]" + marked[en:]
            marked = marked[:s] + f"[s{order}]" + marked[s:]
        tokens = tokenize(marked)
        L = 510
        for i in range(math.ceil(len(tokens) / L)):
            win = tokens[min(i * L, max(0, len(tokens) - L)):min((i + 1) * L, len(tokens))]
            if e1[0] != e2[0] and not ("[s1]" in win and "[s2]" in win):
                continue
            rel, nov = relation_logits(doc["id"], e1[0], e2[0], i)
            if int(np.argmax(rel)) != 8:
                doc_relations.append((e1[0], e2[0], i, rel, nov))
    remapped = defaultdict(list)
    for ent1, ent2, seq, rel, nov in doc_relations:
        for p1 in ent1.split(","):
            for p2 in ent2.split(","):
                remapped[(p1, p2)].append(
                    (int(np.argmax(rel)), int(np.argmax(nov)), softmax(rel), nov))
    triples = []
    for (p1, p2), v in remapped.items():
        if len(v) > 1:
            rel_sum = np.sum([x[2] for x in v], axis=0)
            nov_sum = np.sum([x[3] for x in v], axis=0)
            lab, novl = int(np.argmax(rel_sum)), int(np.argmax(nov_sum))
        else:
            lab, novl = v[0][0], v[0][1]
        if lab != 8:
            triples.append((doc["id"], p1, ID2LABEL_RELATION[lab], p2,
                            ID2LABEL_NOVEL[novl] == "Novel"))
    return triples


def run_oracle(pages_rows, kb):
    """pages rows (dicts with url/html/text) -> {docs, mentions, linked,
    triples} keyed for comparison with the Ray pipeline outputs."""
    from bionext_ray.html_text import page_text  # locked rule (shared)
    docs, mentions, linked_ments, triples = [], [], [], []
    for row in pages_rows:
        text, _ = page_text(row.get("html"), row.get("text"))
        doc_id = row["url"].rstrip("/").rsplit("/", 1)[-1]
        ents = oracle_tag(text, kb.gazetteer)
        for e in ents:
            mentions.append((doc_id, e["start_span"], e["end_span"], e["label"], e["text"]))
        doc = {"id": doc_id, "text": text, "entities": ents}
        oracle_link(doc, kb)
        for e in doc["entities"]:
            linked_ments.append((doc_id, e["start_span"], e["end_span"],
                                 e["label"], e["linked_id"],
                                 tuple(e.get("candidates", []))))
        triples.extend(oracle_extract(doc))
        docs.append((doc_id, text))
    return {"docs": docs, "mentions": mentions, "linked": linked_ments,
            "triples": triples}
