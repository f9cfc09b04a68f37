"""tagged docs -> linked docs: entity-linking actor pool.

Stateful stage: KB alias dicts and sharded embedding matrices are loaded ONCE
per actor in ``__init__`` (the reference loads them per linker pass,
/root/reference/src/linker/chemicals.py:49-68 — recomputed for every stage;
here they live for the actor's lifetime). At cluster scale the KB is
broadcast: pass a ``ray.ObjectRef`` from ``ray.put(kb)`` so each actor reads
it zero-copy from the local object store instead of re-shipping per task.

Embedding lookups are batched: all of a batch's chemical/disease/cell surface
forms are embedded and matmul'd per shard in one call, and memoized in the
per-actor cache (the reference's lru_cache(1_000_000) per mention,
chemicals.py:71 — T3 in SURVEY.md).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..constants import MIN_EMB_THRESHOLD
from ..embedding import embed_batch
from ..functions.linking import EmbeddingIndex, link_document
from ..kb import KnowledgeBase
from .tagger import MENTION_TYPE

# linked mentions additionally carry the PRE-VOTE candidate id list
# (SURVEY §1.2 `identifiers: list<string>`): what the majority vote chose
# `linked` from, before manual correction
LINKED_MENTION_TYPE = pa.struct(
    list(MENTION_TYPE) + [("candidates", pa.list_(pa.string()))])


class LinkerStage:
    def __init__(self, kb, llm_spec: dict | None = None, embedder=None):
        """``embedder``: optional batch encoder ``list[str] -> (n, dim)
        row-normalized matrix`` replacing the hashed-trigram surrogate —
        the SapBERT shape (see bionext_ray.models.TorchEmbedderBackend).
        The KB shard matrices must come from the same encoder."""
        if isinstance(kb, ray.ObjectRef):
            kb = ray.get(kb)
        self.kb: KnowledgeBase = kb
        self.embed = embedder if embedder is not None else embed_batch
        self.chem_idx = EmbeddingIndex(kb.emb.get("mesh", []), MIN_EMB_THRESHOLD, self.embed)
        self.dis_idx = EmbeddingIndex(kb.emb.get("ctd", []), MIN_EMB_THRESHOLD, self.embed)
        self.cell_idx = EmbeddingIndex(kb.emb.get("cellosaurus", []), MIN_EMB_THRESHOLD, self.embed)
        self._gene_cache: dict[tuple[str, str], str] = {}
        # optional few-shot LLM tier (T4): plugin + predictor instantiated
        # ONCE PER ACTOR — network clients/rate limiters are actor-local
        # (llm_spec = {"module": "MyAPICall" | "pkg.mod:Cls",
        #              "kwargs": {...}, "examples": [(mention, code, gene)]})
        self.llm_predict = None
        if llm_spec:
            from ..functions.variant_norm import LLMVariantPredictor
            from ..plugins import load_plugin
            plugin = load_plugin(llm_spec["module"], **llm_spec.get("kwargs", {}))
            self.llm_predict = LLMVariantPredictor(
                plugin, llm_spec.get("examples", []))

    def gene_emb_lookup(self, text: str, tax: str) -> str:
        """Per-tax gene embedding argmax > threshold, else '-'
        (/root/reference/src/linker/genes.py:84-103)."""
        key = (text.lower(), tax)
        if key not in self._gene_cache:
            ids, M = self.kb.gene_emb[tax]
            v = self.embed([text.lower()])[0]
            scores = M @ v
            i = int(scores.argmax()) if len(scores) else -1
            code = ids[i] if i >= 0 and scores[i] > MIN_EMB_THRESHOLD else "-"
            if len(self._gene_cache) < 1_000_000:
                self._gene_cache[key] = code
            else:
                return code
        return self._gene_cache[key]

    def warm_caches(self, all_mentions: list[list[dict]]) -> None:
        """ONE batched embedding lookup per KB family over the batch's
        surfaces (fills the per-actor memo before the per-doc cascade)."""
        chem, dis, cell = [], [], []
        for ms in all_mentions:
            for m in ms:
                if m["label"] in ("ChemicalEntity", "Chemical"):
                    chem.append(m["text"])
                elif m["label"] in ("DiseaseOrPhenotypicFeature", "Disease"):
                    dis.append(m["text"])
                elif m["label"] == "CellLine":
                    cell.append(m["text"])
        if chem:
            self.chem_idx.lookup_many(chem)
        if dis:
            self.dis_idx.lookup_many(dis)
        if cell:
            self.cell_idx.lookup_many(cell)

    def link_doc(self, mentions: list[dict]) -> list[dict]:
        """Link one doc's mention dicts in place (mentions must be owned by
        the caller — fresh dicts, not shared)."""
        return link_document(
            mentions, self.kb, self.chem_idx, self.dis_idx, self.cell_idx,
            self.gene_emb_lookup, llm_predict=self.llm_predict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_mentions = batch["mentions"].to_pylist()
        self.warm_caches(all_mentions)
        linked = []
        for ms in all_mentions:
            # to_pylist() materialized fresh dicts above — link_document may
            # mutate them in place without a defensive copy
            cleaned = self.link_doc(ms)
            linked.append([{**{k: m[k] for k in
                               ("id", "label", "text", "start_span",
                                "end_span", "linked")},
                            "candidates": m.get("candidates", [])}
                           for m in cleaned])
        batch = batch.drop_columns(["mentions"])
        return batch.append_column("mentions",
                                   pa.array(linked,
                                            pa.list_(LINKED_MENTION_TYPE)))


def linker_stage(tagged_ds, kb, concurrency=4, batch_size: int = 256,
                 num_cpus: float = 1, llm_spec: dict | None = None,
                 embedder=None, num_gpus: float | None = None):
    """num_gpus: per-actor GPU fraction for a real embedder backend
    (SURVEY §2.3 T2); None (default) requests no GPUs."""
    extra = {} if num_gpus is None else {"num_gpus": num_gpus}
    return tagged_ds.map_batches(
        LinkerStage, fn_constructor_args=(kb, llm_spec, embedder),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus, **extra)
