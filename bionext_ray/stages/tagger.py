"""docs -> tagged docs: mention detection as an actor-pool map_batches stage.

The stage is FUSED per document: tokenize -> window fan-out -> per-window
label prediction -> stitched decode all happen inside one actor call, so a
document's windows never leave the task (no window->doc regroup shuffle;
SURVEY.md A1/§7.2). With a real transformer the same class holds the model
and runs batched inference over the windows of the whole batch in
``__call__``; the surrogate matcher is compiled once in ``__init__``
(reference model load: /root/reference/src/tagger/__init__.py:55-76).

Output schema: docs columns + ``mentions: list<struct{id,label,text,
start_span,end_span,linked}>`` (doc-aligned nested mentions; explode with
``explode_mentions`` when a flat table is wanted).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.ner import tag_document
from ..gazetteer import GazetteerMatcher

MENTION_TYPE = pa.struct([
    ("id", pa.string()),
    ("label", pa.string()),
    ("text", pa.string()),
    ("start_span", pa.int64()),
    ("end_span", pa.int64()),
    ("linked", pa.string()),
])


class TaggerStage:
    def __init__(self, gazetteer: dict[str, str], transforms=None,
                 backend=None):
        """``backend``: optional model backend ``(input_ids (B, L),
        attention_mask (B, L)) -> (B, L) BIO label ids`` (see
        bionext_ray.models). When set, ALL windows of the batch's documents
        are collated and scored in ONE backend call per batch; when None,
        the direct regex-gazetteer fast path runs per doc (no model, no
        input_ids to build). The parity suite pins both paths equal."""
        self.backend = backend
        self.matcher = (None if backend is not None
                        else GazetteerMatcher(gazetteer))  # once per actor
        # per-mention UDF hooks (reference transform lists applied per
        # sample, /root/reference/src/data.py:254-257): each callable takes
        # and returns a mention dict; must be picklable (top-level fns)
        self.transforms = list(transforms or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if self.backend is not None:
            from ..functions.ner import tag_documents_with_backend
            mentions = tag_documents_with_backend(texts, self.backend)
        else:
            mentions = [tag_document(t, self.matcher) for t in texts]
        for fn in self.transforms:
            mentions = [[fn(dict(m)) for m in ms] for ms in mentions]
        return batch.append_column(
            "mentions", pa.array(mentions, pa.list_(MENTION_TYPE)))


def tagger_stage(docs_ds, gazetteer: dict[str, str], concurrency=4,
                 batch_size: int = 256, num_cpus: float = 1,
                 transforms=None, backend=None,
                 num_gpus: float | None = None):
    """num_gpus: per-actor GPU fraction for a real model backend
    (SURVEY §2.3 T1 prescribes map_batches(..., num_gpus=...)); None (the
    default) requests no GPUs — correct for the surrogate backends."""
    extra = {} if num_gpus is None else {"num_gpus": num_gpus}
    return docs_ds.map_batches(
        TaggerStage, fn_constructor_args=(gazetteer, transforms, backend),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus, **extra)


def explode_mentions(tagged_ds):
    """Flatten the nested mentions column into one row per mention
    (doc_id, mention_id, label, text, start, end, identifier[, identifiers
    — the pre-vote candidate list, present on linker output])."""
    def _explode(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        mentions = batch["mentions"].to_pylist()
        # decide from the STRUCT TYPE, not the data, so empty blocks keep
        # the same schema as populated ones
        mention_struct = batch.schema.field("mentions").type.value_type
        has_cands = any(f.name == "candidates" for f in mention_struct)
        rows = {"doc_id": [], "mention_id": [], "label": [], "text": [],
                "start": [], "end": [], "identifier": []}
        cands = []
        for did, ms in zip(doc_ids, mentions):
            for m in ms:
                rows["doc_id"].append(did)
                rows["mention_id"].append(int(m["id"]))
                rows["label"].append(m["label"])
                rows["text"].append(m["text"])
                rows["start"].append(m["start_span"])
                rows["end"].append(m["end_span"])
                rows["identifier"].append(m["linked"])
                if has_cands:
                    cands.append(m.get("candidates") or [])
        out = {
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "mention_id": pa.array(rows["mention_id"], pa.int32()),
            "label": pa.array(rows["label"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "start": pa.array(rows["start"], pa.int64()),
            "end": pa.array(rows["end"], pa.int64()),
            "identifier": pa.array(rows["identifier"], pa.string()),
        }
        if has_cands:
            out["identifiers"] = pa.array(cands, pa.list_(pa.string()))
        return pa.table(out)
    return tagged_ds.map_batches(_explode, batch_format="pyarrow")
