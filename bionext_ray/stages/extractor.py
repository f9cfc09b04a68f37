"""linked docs -> triples: relation+novelty extraction actor pool.

Doc-local fan-out stage: one input doc row -> K triple rows. Pair
generation, marker insertion, windowing, scoring, composite expansion and
softmax-sum fusion all run inside the actor for a batch of docs (reference
pipeline: /root/reference/src/extractor/__init__.py:59-133). With a real
transformer the (pair, window) samples of the whole batch would be scored in
one batched forward pass; the surrogate scorer is pure and needs no state,
but the stage stays an actor pool so model weights have a home.

Output schema: doc_id, subj, pred, obj, novel(bool).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.relext import (extract_document, fuse_doc_relations,
                                generate_pair_samples, relations_from_scores)

TRIPLE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("novel", pa.bool_()),
])


class ExtractorStage:
    def __init__(self, backend=None):
        """``backend``: optional model backend ``(features, metadata) ->
        (rel_logits (B, 9), nov_logits (B, 2))`` (see bionext_ray.models).
        When set, the (pair, window) samples of ALL the batch's documents
        are scored in ONE backend call (collated input_ids + marker
        ``indexes`` when ``backend.wants_inputs``); when None, the direct
        surrogate scorer runs per doc. Model weights load here, once per
        actor."""
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        # to_pylist dicts carry exactly the keys the sample generator reads
        # (linked/label/start_span/end_span) — no per-mention projection copy
        mentions = batch["mentions"].to_pylist()
        rows = {k: [] for k in ("doc_id", "subj", "pred", "obj", "novel")}
        if self.backend is None:
            for did, text, ms in zip(doc_ids, texts, mentions):
                for t in extract_document(did, text, ms):
                    for k in rows:
                        rows[k].append(t[k])
        else:
            for t in self._extract_with_backend(doc_ids, texts, mentions):
                for k in rows:
                    rows[k].append(t[k])
        return pa.table(rows, schema=TRIPLE_SCHEMA)

    def _extract_with_backend(self, doc_ids, texts, mentions):
        """Cross-doc batched scoring: generate every (pair, window) sample
        of the batch, collate, score in one backend call, then regroup and
        fuse per doc (the regroup never leaves the task)."""
        import numpy as np

        from ..models import collate_marker_windows
        wants_inputs = getattr(self.backend, "wants_inputs", True)
        per_doc, flat = [], []
        for did, text, ms in zip(doc_ids, texts, mentions):
            s = generate_pair_samples(did, text, ms,
                                      with_inputs=wants_inputs)
            per_doc.append(len(s))
            flat.extend(s)
        if not flat:
            return []
        features = collate_marker_windows(flat) if wants_inputs else {}
        metadata = {k: [s[k] for s in flat]
                    for k in ("doc_id", "entity1", "entity2", "sequence_id")}
        rels, novs = self.backend(features, metadata)   # ONE call per batch
        rels, novs = np.asarray(rels), np.asarray(novs)
        triples, pos = [], 0
        for did, n in zip(doc_ids, per_doc):
            if n == 0:
                continue
            doc_rel = relations_from_scores(
                flat[pos:pos + n], rels[pos:pos + n], novs[pos:pos + n])
            triples.extend(fuse_doc_relations(did, doc_rel))
            pos += n
        return triples


def extractor_stage(linked_ds, concurrency=4, batch_size: int = 128,
                    num_cpus: float = 1, backend=None,
                    num_gpus: float | None = None):
    """num_gpus: per-actor GPU fraction for a real model backend
    (SURVEY §2.3 T6); None (default) requests no GPUs."""
    extra = {} if num_gpus is None else {"num_gpus": num_gpus}
    return linked_ds.map_batches(
        ExtractorStage, fn_constructor_args=(backend,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus, **extra)
