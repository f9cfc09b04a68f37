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

from ..functions.relext import extract_document

TRIPLE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("novel", pa.bool_()),
])


class ExtractorStage:
    def __init__(self):
        pass  # model weights would load here (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        mentions = batch["mentions"].to_pylist()
        rows = {k: [] for k in ("doc_id", "subj", "pred", "obj", "novel")}
        for did, text, ms in zip(doc_ids, texts, mentions):
            for t in extract_document(did, text,
                                      [{"linked": m["linked"],
                                        "label": m["label"],
                                        "start_span": m["start_span"],
                                        "end_span": m["end_span"]} for m in ms]):
                for k in rows:
                    rows[k].append(t[k])
        return pa.table(rows, schema=TRIPLE_SCHEMA)


def extractor_stage(linked_ds, concurrency=4, batch_size: int = 128,
                    num_cpus: float = 1):
    return linked_ds.map_batches(
        ExtractorStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
