"""docs -> triples in ONE actor pool: tag + link + extract fused.

Every stage between text extraction and canonicalization is doc-local
(SURVEY.md §4 "doc-locality discipline"), so the three per-doc actor stages
compose inside a single actor: one process startup + one KB deserialization
per worker instead of three, and the intermediate mention list<struct>
columns never cross the object store. The per-stage classes are reused
verbatim — semantics are identical to running the pools separately (the
parity suite pins both paths).

The KB is broadcast: callers pass ``ray.put(kb)`` so each actor reads it
zero-copy from the local object store instead of re-shipping the alias
dicts + embedding shards with every actor constructor.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from .extractor import ExtractorStage
from .linker import LinkerStage
from .tagger import TaggerStage


class KGFusedStage:
    def __init__(self, kb, llm_spec: dict | None = None, transforms=None,
                 backends: dict | None = None):
        """``backends``: optional {"tagger": ..., "extractor": ...} model
        backends (bionext_ray.models) — None keeps the direct surrogate
        fast paths. Both variants are pinned equal by the parity suite."""
        if isinstance(kb, ray.ObjectRef):
            kb = ray.get(kb)
        backends = backends or {}
        self.tag = TaggerStage(kb.gazetteer, transforms,
                               backend=backends.get("tagger"))
        self.link = LinkerStage(kb, llm_spec,
                                embedder=backends.get("embedder"))
        self.extract = ExtractorStage(backend=backends.get("extractor"))
        self._chain = bool(backends.get("tagger")
                           or backends.get("extractor"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._chain:     # model backends: use the stage chain unchanged
            return self.extract(self.link(self.tag(batch)))
        # Surrogate fast path: the three sub-stages run over plain Python
        # objects inside the actor — the batch's text column is materialized
        # ONCE and the mention lists never round-trip through Arrow struct
        # columns between stages. Semantics are identical to the chained
        # stages (the parity suite pins both); what changes is memory
        # traffic, which is the scaling ceiling on many-core nodes.
        from ..functions.ner import tag_document
        from ..functions.relext import extract_document
        from .extractor import TRIPLE_SCHEMA
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        mentions = [tag_document(t, self.tag.matcher) for t in texts]
        for fn in self.tag.transforms:
            mentions = [[fn(dict(m)) for m in ms] for ms in mentions]
        self.link.warm_caches(mentions)
        rows = {k: [] for k in ("doc_id", "subj", "pred", "obj", "novel")}
        for did, text, ms in zip(doc_ids, texts, mentions):
            cleaned = self.link.link_doc(ms)
            for t in extract_document(did, text, cleaned):
                for k in rows:
                    rows[k].append(t[k])
        return pa.table(rows, schema=TRIPLE_SCHEMA)


def kg_fused_stage(docs_ds, kb, concurrency=4, batch_size: int = 64,
                   num_cpus: float = 1, llm_spec: dict | None = None,
                   transforms=None, backends: dict | None = None,
                   num_gpus: float | None = None):
    """num_gpus: per-actor GPU fraction when real model backends are
    plugged in (the fused actor hosts tagger+linker+extractor, so the
    fraction covers all three); None (default) requests no GPUs."""
    kb_ref = kb if isinstance(kb, ray.ObjectRef) else ray.put(kb)
    extra = {} if num_gpus is None else {"num_gpus": num_gpus}
    return docs_ds.map_batches(
        KGFusedStage,
        fn_constructor_args=(kb_ref, llm_spec, transforms, backends),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus, **extra)
