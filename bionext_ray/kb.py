"""Synthetic knowledge base: alias dictionaries + embedding shards.

Hermetic stand-in for the reference's downloaded KB assets
(/root/reference/src/linker/utils.py:383-469: NCBI-Taxonomy names,
MeSH / CTD-diseases / Cellosaurus JSONL+npy embedding shards, NCBI-Gene
per-taxonomy alias pickles, tmVar/LitVar variant lookups). The structure is
identical — alias dicts, per-shard row-aligned embedding matrices, per-tax
gene dicts, a gene-id->symbol map and a (variant, gene)->rsid lookup — but the
content is a small deterministic vocabulary aligned with the synthetic test
corpora. Loaded ONCE per linker actor (broadcast via ray.put at scale).

Determinism deviation from the reference: the reference stores per-tax gene
ids in Python sets and extends predictions with `list(set(...))`
(/root/reference/src/linker/genes.py:144), whose order depends on
PYTHONHASHSEED. The rebuild keeps candidate lists sorted so majority-vote
first-wins tie-breaks are reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .embedding import build_kb_matrix


@dataclass
class KnowledgeBase:
    # dict tier: taxonomy names -> [tax ids] (src/linker/taxonomy.py:56-58)
    taxonomy: dict[str, list[str]] = field(default_factory=dict)
    # per-tax gene alias dicts (src/linker/genes.py:32-33)
    genes: dict[str, dict[str, list[str]]] = field(default_factory=dict)
    # "training direct match" stand-in per entity type (chemicals.py:41-46)
    direct: dict[str, dict[str, list[str]]] = field(default_factory=dict)
    # embedding shards per family: {family: [(shard, ids, matrix)]}
    # (chemicals.py:51-62 — multiple .jsonl/.npy shards per KB folder)
    emb: dict[str, list[tuple[str, list[str], np.ndarray]]] = field(default_factory=dict)
    # per-tax gene embedding shards (genes.py:62-73)
    gene_emb: dict[str, tuple[list[str], np.ndarray]] = field(default_factory=dict)
    # gene id -> symbol (seq_variant.py:312-313 gene_lookup.json)
    gene_lookup: dict[str, str] = field(default_factory=dict)
    # "normalized_variant SYMBOL" -> [rsid] (hermetic LitVar stand-in,
    # seq_variant.py:437-444)
    variant_lookup: dict[str, list[str]] = field(default_factory=dict)
    # taxonomy manual corrections (taxonomy.py:60-62)
    manual_correction: dict[str, str] = field(default_factory=dict)
    # surrogate-tagger gazetteer: surface(lowercase) -> entity type
    gazetteer: dict[str, str] = field(default_factory=dict)

    @property
    def backup_gene(self) -> dict[str, list[str]]:
        """Global merge of all per-tax gene aliases (genes.py:55-58).
        Computed once and cached — the hot path hits this per gene mention."""
        cached = self.__dict__.get("_backup_gene")
        if cached is None:
            merged: dict[str, set] = {}
            for gene_map in self.genes.values():
                for w, ids in gene_map.items():
                    merged.setdefault(w, set()).update(ids)
            cached = {w: sorted(ids) for w, ids in merged.items()}
            self.__dict__["_backup_gene"] = cached
        return cached


def default_kb() -> KnowledgeBase:
    """Deterministic synthetic KB whose surfaces appear in both the TPC-H-ish
    `documents` test table vocabulary and the synthetic pages fixtures."""
    kb = KnowledgeBase()

    # --- taxonomy (dict tier; "table" is multi-candidate to exercise the
    # per-doc majority vote first-wins tie-break, taxonomy.py:84-92)
    kb.taxonomy = {
        "customer": ["9606"],
        "table": ["10090", "10091"],
        "mouse": ["10090"],
    }
    # CASE-SENSITIVE taxonomy direct tier (taxonomy.py:53): checked on the
    # raw surface before the lowercased name dict — "Mouse" (capitalized)
    # resolves here to a different id than lowercase "mouse" does via
    # kb.taxonomy. List and scalar values cover both value shapes.
    kb.direct["OrganismTaxon"] = {"Mouse": ["10095"], "Rat": "10116"}
    kb.manual_correction = {"3052230": "11103"}

    # --- genes: per-tax alias dicts; "vector" under 9606 is multi-candidate
    kb.genes = {
        "9606": {"spark": ["G100"], "vector": ["G200", "G201"]},
        "10090": {"spark": ["G101"], "vector": ["G202"]},
        "562": {"stream": ["G300"]},  # reachable only via the backup tier
    }
    # per-tax gene DIRECT tier (genes.py:141-143): consulted before the
    # per-tax alias dict — "blip" resolves only here
    kb.direct["GeneOrGeneProduct"] = {"9606": {"blip": ["G500"]}}
    # gene embedding shard for 9606 only: "scan" links via the embedding tier
    gene_emb_aliases_9606 = [("scan", "G400"), ("spark", "G100"), ("vector", "G200")]
    kb.gene_emb = {
        "9606": (
            [gid for _, gid in gene_emb_aliases_9606],
            build_kb_matrix([t for t, _ in gene_emb_aliases_9606]),
        )
    }
    kb.gene_lookup = {"G100": "SPARK", "G101": "SPARKM", "G200": "VEC1"}

    # --- chemicals (MeSH): direct tier ("training" stand-in) + 2 embedding
    # shards (per-shard argmax then max across shards, chemicals.py:82-92)
    kb.direct["ChemicalEntity"] = {"md5": ["MESH:D001"]}
    mesh_shard_a = [("hash", "MESH:D001"), ("acetaminophen", "MESH:D000082")]
    mesh_shard_b = [("batch", "MESH:D002")]
    kb.emb["mesh"] = [
        ("shard_a", [i for _, i in mesh_shard_a], build_kb_matrix([t for t, _ in mesh_shard_a])),
        ("shard_b", [i for _, i in mesh_shard_b], build_kb_matrix([t for t, _ in mesh_shard_b])),
    ]

    # --- diseases (CTD)
    kb.direct["DiseaseOrPhenotypicFeature"] = {}
    ctd = [("slow", "CTD:C001"), ("slow merge", "CTD:C002"), ("lag", "CTD:C003")]
    kb.emb["ctd"] = [("shard_a", [i for _, i in ctd], build_kb_matrix([t for t, _ in ctd]))]

    # --- cell lines (Cellosaurus)
    kb.direct["CellLine"] = {}
    cvcl = [("window", "CVCL:0001"), ("hela", "CVCL:0030")]
    kb.emb["cellosaurus"] = [("shard_a", [i for _, i in cvcl], build_kb_matrix([t for t, _ in cvcl]))]

    # --- sequence variants: rs-direct + local LitVar stand-in. The composite
    # rsid exercises the extractor's comma cross-product expansion
    # (/root/reference/src/extractor/__init__.py:90-94).
    kb.variant_lookup = {
        "c.76A>G SPARK": ["rs777,rs778"],
        "p.V600E SPARK": ["rs113488022"],
    }

    # --- surrogate-tagger gazetteer: KB alias surfaces plus detect-only
    # surfaces ("checksum"/"sluggish" never link -> cleaner drops them,
    # cleaner.py:18)
    gaz: dict[str, str] = {}
    for t in kb.taxonomy:
        gaz[t] = "OrganismTaxon"
    for alias in ["rat"]:       # links only via the case-sensitive tier
        gaz[alias] = "OrganismTaxon"
    for alias in ["spark", "vector", "stream", "scan", "blip"]:
        gaz[alias] = "GeneOrGeneProduct"
    for alias in ["hash", "batch", "acetaminophen", "md5", "checksum"]:
        gaz[alias] = "ChemicalEntity"
    for alias in ["slow", "slow merge", "lag", "sluggish"]:
        gaz[alias] = "DiseaseOrPhenotypicFeature"
    for alias in ["window", "hela"]:
        gaz[alias] = "CellLine"
    for alias in ["rs4242", "c.76a/g", "p.v600e"]:
        gaz[alias] = "SequenceVariant"
    kb.gazetteer = gaz
    return kb
