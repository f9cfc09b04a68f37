"""Shared label spaces and the relation type-compatibility mask.

Reference parity:
- entity label ids: /root/reference/src/data.py:16-17 (LABEL2ID_ENTITY)
- relation label ids: /root/reference/src/extractor/data.py:35-37
- 6x6 type-pair compatibility mask: /root/reference/src/extractor/data.py:39-62
"""

from __future__ import annotations

LABEL2ID_ENTITY = {
    "GeneOrGeneProduct": 0,
    "DiseaseOrPhenotypicFeature": 1,
    "ChemicalEntity": 2,
    "SequenceVariant": 3,
    "OrganismTaxon": 4,
    "CellLine": 5,
    # aliases accepted by the reference (src/extractor/data.py:32-33)
    "Disease": 1,
    "Gene": 0,
    "Chemical": 2,
    "Mutation": 3,
    "Organism": 4,
}

ID2LABEL_ENTITY = {
    0: "GeneOrGeneProduct",
    1: "DiseaseOrPhenotypicFeature",
    2: "ChemicalEntity",
    3: "SequenceVariant",
    4: "OrganismTaxon",
    5: "CellLine",
}

LABEL2ID_RELATION = {
    "Association": 0,
    "Positive_Correlation": 1,
    "Negative_Correlation": 2,
    "Cotreatment": 3,
    "Bind": 4,
    "Comparison": 5,
    "Conversion": 6,
    "Drug_Interaction": 7,
    "Negative_Class": 8,
}

ID2LABEL_RELATION = {v: k for k, v in LABEL2ID_RELATION.items()}

ID2LABEL_NOVEL = {1: "Novel", 0: "No"}

NEGATIVE_CLASS = 8

# Tagger window geometry (reference: src/tagger/model/configuration_bionexttager.py:12,
# src/data.py:129-130). context_size=64 -> 63 pad/context tokens each side of a
# 384-token center inside a 512-token window with CLS/SEP.
MODEL_MAX_LENGTH = 512
CONTEXT_SIZE = 64
CTX = CONTEXT_SIZE - 1          # 63 (cls + sep adjustment, src/data.py:129)
CENTER_TOKENS = MODEL_MAX_LENGTH - 2 * CONTEXT_SIZE  # 384

# Embedding-linker cosine threshold (src/linker/chemicals.py:32)
MIN_EMB_THRESHOLD = 0.9


def label2int(label: str) -> int:
    """Entity label -> class id (reference src/data.py:296-313)."""
    return LABEL2ID_ENTITY[label]


def build_type_pair_mask() -> list[list[int]]:
    """Bidirectional 6x6 mask of entity-type pairs that may hold a relation.

    Reference: /root/reference/src/extractor/data.py:39-62. OrganismTaxon and
    CellLine never participate in candidate pairs.
    """
    m = [[0] * 6 for _ in range(6)]
    L = LABEL2ID_ENTITY
    pairs = [
        ("Gene", "Gene"),
        ("Chemical", "Disease"),
        ("Disease", "Gene"),
        ("Chemical", "Gene"),
        ("Gene", "Chemical"),
        ("Disease", "SequenceVariant"),
        ("SequenceVariant", "Disease"),
        ("Chemical", "Chemical"),
        ("Chemical", "SequenceVariant"),
        ("SequenceVariant", "Chemical"),
        ("SequenceVariant", "SequenceVariant"),
        ("Disease", "Chemical"),
        ("Gene", "Disease"),
    ]
    for a, b in pairs:
        m[L[a]][L[b]] = 1
    return m


TYPE_PAIR_MASK = build_type_pair_mask()
