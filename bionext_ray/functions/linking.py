"""Doc-local entity-linking cascade, per-doc majority vote, cleaner.

Reference parity (all inference-path semantics preserved, incl. tier order,
first-wins tie-breaks, and the '-' sentinel):

- taxonomy: direct match (case-sensitive) -> lowercased name dict; manual id
  correction; per-doc vote.  /root/reference/src/linker/taxonomy.py:45-92
- chemicals/diseases/cells: lowercased direct ("training") match ->
  per-shard embedding argmax > 0.9 then max across shards; vote.
  /root/reference/src/linker/chemicals.py:22-135 (diseases.py, cells.py same)
- genes: nearest organism whose tax id is in the gene KB (default 9606 when
  the doc has no organism); per-tax alias dict -> per-tax embedding (which
  appends '-' on a miss, making the backup tier unreachable for taxa that
  have embeddings — faithfully kept) -> global backup aliases; vote.
  /root/reference/src/linker/genes.py:107-178
- seq_variant: nearest gene; rs-prefix direct id; normalization
  (/ -> >, strip '--' and spaces) + local (variant, gene-symbol) lookup
  (hermetic LitVar stand-in); vote with empty-candidate guard.
  /root/reference/src/linker/seq_variant.py:386-481
- cleaner: drop identifier=='-', renumber per doc.
  /root/reference/src/linker/cleaner.py:5-30

Stage order is taxonomy -> chemicals -> diseases -> genes -> seq_variant ->
cells -> cleaner (/root/reference/src/linker/__init__.py:29-40): genes consume
taxonomy's links, variants consume genes' links.

Documented deviations (reference behavior is unsafe/nondeterministic):
- candidate lists from sets are sorted (genes.py:144 uses Python-set order);
- when a doc has organisms but none with a tax id in the gene KB the rebuild
  falls back to '9606' (the reference leaks the previous doc's loop variable,
  genes.py:124-128);
- a doc with sequence variants but no gene mentions resolves nearest_gene to
  None -> no lookup tiers (the reference would raise/leak, seq_variant.py:
  398-405).
"""

from __future__ import annotations

from collections import defaultdict

from ..kb import KnowledgeBase

# entity label -> linker family (both reference label spellings accepted,
# same alternatives as the per-stage tuples below)
_LABEL2FAM = {"OrganismTaxon": "org", "Organism": "org",
              "ChemicalEntity": "chem", "Chemical": "chem",
              "DiseaseOrPhenotypicFeature": "dis", "Disease": "dis",
              "GeneOrGeneProduct": "gene", "Gene": "gene",
              "SequenceVariant": "var", "CellLine": "cell"}


def majority_vote(mentions: list[dict], labels: tuple[str, ...],
                  correction: dict[str, str] | None = None,
                  guard_empty: bool = False) -> None:
    """Per-doc disambiguation (A2): each multi-candidate mention takes the
    candidate appearing in the most mentions; ties break to the first
    candidate in list order (Python max first-wins,
    /root/reference/src/linker/taxonomy.py:76-92)."""
    # one filtering pass; families with no list-valued mentions (votes
    # already resolved or nothing linked) exit before any counting work —
    # the vote runs 6x per doc, so the empty case is the hot case
    targets = [m for m in mentions
               if m["label"] in labels and isinstance(m["linked"], list)]
    if not targets:
        return
    id_entities: dict[str, list] = defaultdict(list)
    for m in targets:
        for lid in m["linked"]:
            id_entities[lid].append(m["id"])
    for m in targets:
        # pre-vote candidate list preserved for the linked_mentions
        # `identifiers` column (SURVEY §1.2) — the vote collapses
        # `linked` to one id, but debugging a bad link needs what it
        # chose from
        m["candidates"] = list(m["linked"])
        cands = [(lid, len(id_entities[lid])) for lid in m["linked"]]
        if guard_empty and not cands:
            m["linked"] = "-"
            continue
        best, _ = max(cands, key=lambda x: x[1])
        if correction and best in correction:
            best = correction[best]
        m["linked"] = best


class EmbeddingIndex:
    """Sharded alias embedding kNN (k=1, thresholded): per-shard argmax above
    the cosine threshold, then max across shards
    (/root/reference/src/linker/chemicals.py:71-94). Batched lookup with a
    bounded per-actor memo cache (the reference's lru_cache(1_000_000),
    chemicals.py:71)."""

    def __init__(self, shards, threshold: float, embed_batch_fn, cache_size: int = 1_000_000):
        # shards: [(name, ids, matrix)]
        self.shards = [(ids, M) for _, ids, M in shards]
        self.threshold = threshold
        self.embed_batch = embed_batch_fn
        self.cache: dict[str, list[str]] = {}
        self.cache_size = cache_size

    def lookup_many(self, texts: list[str]) -> dict[str, list[str]]:
        """One GEMM per shard over the batch's unique uncached surfaces.

        Computed results are always returned, even when the bounded memo is
        full and the insert is skipped — a full cache degrades to recompute,
        never to a silent miss."""
        computed: dict[str, list[str]] = {}
        todo = sorted({t for t in texts if t not in self.cache})
        if todo:
            Q = self.embed_batch([t.lower() for t in todo])  # (n, dim)
            best_ids = [[] for _ in todo]
            best_scores = [[] for _ in todo]
            for ids, M in self.shards:
                scores = M @ Q.T                       # (aliases, n)
                arg = scores.argmax(axis=0)
                mx = scores[arg, range(len(todo))]
                for i in range(len(todo)):
                    if mx[i] > self.threshold:
                        best_ids[i].append(ids[arg[i]])
                        best_scores[i].append(float(mx[i]))
            for i, t in enumerate(todo):
                if best_ids[i]:
                    j = max(range(len(best_scores[i])), key=lambda k: best_scores[i][k])
                    res = [best_ids[i][j]]
                else:
                    res = []
                computed[t] = res
                if len(self.cache) < self.cache_size:
                    self.cache[t] = res
        return {t: computed.get(t, self.cache.get(t, [])) for t in set(texts)}


def _link_dict_then_emb(mentions, labels, direct, emb_index):
    """Shared chemicals/diseases/cells cascade: lowercased direct match, else
    embedding tier; '-' on total miss (chemicals.py:101-116)."""
    targets = [m for m in mentions if m["label"] in labels]
    need_emb = [m for m in targets if not direct.get(m["text"].lower())]
    emb_hits = emb_index.lookup_many([m["text"] for m in need_emb]) if need_emb else {}
    for m in targets:
        prediction = list(direct.get(m["text"].lower(), []))
        if not prediction:
            prediction = list(emb_hits.get(m["text"], []))
        m["linked"] = prediction if prediction else "-"


def link_document(mentions: list[dict], kb: KnowledgeBase,
                  chem_idx: EmbeddingIndex, dis_idx: EmbeddingIndex,
                  cell_idx: EmbeddingIndex,
                  gene_emb_lookup, llm_predict=None) -> list[dict]:
    """Run the full linker over one document's mentions (in offset order).
    Mutates ``linked`` in place; returns the cleaned mention list."""

    # ONE label-partition pass (order within each family = doc offset
    # order, which the nearest-organism/nearest-gene first-wins ties rely
    # on) instead of six full-mention scans — the scans were the linker's
    # top per-doc cost after the embedding memo warms
    fams: dict[str, list] = {"org": [], "chem": [], "dis": [], "gene": [],
                             "var": [], "cell": []}
    for m in mentions:
        f = _LABEL2FAM.get(m["label"])
        if f is not None:
            fams[f].append(m)

    # ---- taxonomy (taxonomy.py:67-92)
    tax_direct = kb.direct.get("OrganismTaxon", {})
    for m in fams["org"]:
        if m["text"] in tax_direct:
            m["linked"] = [tax_direct[m["text"]][0]] if isinstance(
                tax_direct[m["text"]], list) else [tax_direct[m["text"]]]
        elif m["text"].lower() in kb.taxonomy:
            m["linked"] = list(kb.taxonomy[m["text"].lower()])
    majority_vote(fams["org"], ("OrganismTaxon", "Organism"),
                  correction=kb.manual_correction)

    # ---- chemicals / diseases (order matters only for lineage; doc-local)
    _link_dict_then_emb(fams["chem"], ("ChemicalEntity", "Chemical"),
                        kb.direct.get("ChemicalEntity", {}), chem_idx)
    majority_vote(fams["chem"], ("ChemicalEntity", "Chemical"))
    _link_dict_then_emb(fams["dis"], ("DiseaseOrPhenotypicFeature", "Disease"),
                        kb.direct.get("DiseaseOrPhenotypicFeature", {}), dis_idx)
    majority_vote(fams["dis"], ("DiseaseOrPhenotypicFeature", "Disease"))

    # ---- genes (genes.py:107-160)
    organism_ids = [(m["linked"], m["start_span"]) for m in fams["org"]]
    if not organism_ids:
        organism_ids.append(("9606", 0))
    for m in fams["gene"]:
        distance = 10_000_000
        nearest_org = "9606"  # deviation: reference leaks the loop var
        for org_id, org_start in organism_ids:
            if abs(m["start_span"] - org_start) < distance and org_id in kb.genes:
                distance = abs(m["start_span"] - org_start)
                nearest_org = org_id
        m["pred_tax"] = nearest_org
        prediction: list[str] = []
        per_tax_direct = kb.direct.get("GeneOrGeneProduct", {}).get(nearest_org, {})
        if not prediction and m["text"].lower() in per_tax_direct:
            prediction.extend(list(per_tax_direct[m["text"].lower()]))
        if not prediction and m["text"].lower() in kb.genes.get(nearest_org, {}):
            prediction.extend(sorted(set(kb.genes[nearest_org][m["text"].lower()])))
        if not prediction and nearest_org in kb.gene_emb:
            prediction.append(gene_emb_lookup(m["text"], nearest_org))
        if not prediction and m["text"].lower() in kb.backup_gene:
            prediction.extend(kb.backup_gene[m["text"].lower()])
        m["linked"] = prediction if prediction else "-"
    majority_vote(fams["gene"], ("GeneOrGeneProduct", "Gene"))

    # ---- sequence variants (seq_variant.py:386-481)
    gene_ids = [(m["linked"], m["start_span"]) for m in fams["gene"]]
    for m in fams["var"]:
        nearest_g = None
        distance = 10_000_000
        for gid, gstart in gene_ids:
            if abs(m["start_span"] - gstart) < distance:
                distance = abs(m["start_span"] - gstart)
                nearest_g = gid
        m["pred_gene"] = nearest_g
        prediction = []
        if m["text"].lower().startswith("rs"):
            prediction = [m["text"].lower()]
        norm = m["text"].replace("/", ">").replace("--", "").replace(" ", "")
        if not prediction and nearest_g in kb.gene_lookup:
            symbol = kb.gene_lookup[nearest_g]
            prediction = list(kb.variant_lookup.get(f"{norm} {symbol}", []))
        if not prediction and llm_predict is not None:
            # optional few-shot LLM tier (seq_variant.py:445-453):
            # mention text codon-normalized, gene as symbol if known
            from .variant_norm import convert_amino_acids
            sym = kb.gene_lookup.get(nearest_g, nearest_g)
            prediction = [llm_predict(convert_amino_acids(norm), str(sym))]
        m["linked"] = prediction
    majority_vote(fams["var"], ("SequenceVariant",), guard_empty=True)

    # ---- cell lines (cells.py, same cascade as chemicals)
    _link_dict_then_emb(fams["cell"], ("CellLine",),
                        kb.direct.get("CellLine", {}), cell_idx)
    majority_vote(fams["cell"], ("CellLine",))

    # ---- cleaner (cleaner.py:5-30): drop unlinked, renumber per doc
    cleaned = []
    counter = 0
    for m in mentions:
        if m["linked"] != "-" and not isinstance(m["linked"], list):
            m = dict(m)
            m["id"] = str(counter)
            counter += 1
            cleaned.append(m)
    return cleaned
