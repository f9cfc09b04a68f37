"""Model adapter layer: pluggable backends for the tagger and extractor
actor stages, plus the inference collators that pad model features.

The contract is the one a transformer has:

- Tagger backend: ``(input_ids (B, L) int64, attention_mask (B, L) int64)
  -> (B, L) BIO label ids`` — exactly what BioLinkBERT+CRF emits per window
  (/root/reference/src/tagger/model/modeling_bionexttagger.py:18-103).
- Extractor backend: ``(features, metadata) -> (rel_logits (B, 9),
  nov_logits (B, 2))`` where ``features`` are the padded
  input_ids/attention_mask/indexes tensors (the reference's
  DataCollatorForInference splits model features from metadata the same
  way, /root/reference/src/extractor/collator.py:46-73) and ``metadata``
  carries doc_id/entity1/entity2/sequence_id lists.

Two implementations each, behind the same protocol:

- Surrogate backends (default): the ids-only gazetteer gram matcher and the
  keyed-hash logit scorer. ``SurrogateTaggerBackend`` consumes ONLY
  input_ids/attention_mask — no text side-channel — proving a real
  token-classifier slots in unchanged.
- Torch backends: thin adapters that wrap any HuggingFace-style model;
  ``import torch`` happens lazily in ``__init__`` so this module imports
  (and the surrogate path runs) in torch-free environments.

Stages invoke the backend ONCE PER BATCH over all windows of all documents
(the cross-doc batching a GPU model needs; the reference batches 8/128
windows per forward, /root/reference/main.py:31-33,67-69).
"""

from __future__ import annotations

import numpy as np

from .constants import MODEL_MAX_LENGTH, label2int
from .tokenization import MARKER_IDS, PAD_ID, encode


# ---------------------------------------------------------------- collators
def collate_tagger_windows(samples: list[dict]) -> dict[str, np.ndarray]:
    """Pad a batch of tagger window samples (from ``make_windows(...,
    with_inputs=True)``) to rectangular input_ids/attention_mask arrays
    (the reference's tokenizer pad step, /root/reference/src/data.py:60-66)."""
    B = len(samples)
    L = max((len(s["input_ids"]) for s in samples), default=0)
    ids = np.full((B, L), PAD_ID, dtype=np.int64)
    mask = np.zeros((B, L), dtype=np.int64)
    for i, s in enumerate(samples):
        n = len(s["input_ids"])
        ids[i, :n] = s["input_ids"]
        mask[i, :n] = s["attention_mask"]
    return {"input_ids": ids, "attention_mask": mask}


def collate_marker_windows(samples: list[dict]) -> dict[str, np.ndarray]:
    """Inference collator for extractor (pair, window) samples (M15):
    pads input_ids/attention_mask to the batch max and the marker-position
    ``indexes`` lists with -1 (the gather sentinel the reference model
    masks on — /root/reference/src/extractor/collator.py:4-27 and
    model/modeling_bionextextractor.py:58-75)."""
    B = len(samples)
    L = max((len(s["input_ids"]) for s in samples), default=0)
    K = max((len(s["indexes"]) for s in samples), default=0)
    ids = np.full((B, L), PAD_ID, dtype=np.int64)
    mask = np.zeros((B, L), dtype=np.int64)
    idxs = np.full((B, K), -1, dtype=np.int64)
    for i, s in enumerate(samples):
        n = len(s["input_ids"])
        ids[i, :n] = s["input_ids"]
        mask[i, :n] = 1
        k = len(s["indexes"])
        idxs[i, :k] = s["indexes"]
    return {"input_ids": ids, "attention_mask": mask, "indexes": idxs}


# ---------------------------------------------------------------- tagger
class SurrogateTaggerBackend:
    """Ids-only gazetteer matcher: the hash-vocab token-id n-gram of every
    gazetteer surface is precomputed once, then each window's input_ids get
    a leftmost-longest non-overlapping scan (the same semantics as the
    compiled-regex matcher, which sorts alternations by length). Emits BIO
    label ids per token: B = 2*class+1, I = 2*class+2, O = 0.

    Consumes ONLY (input_ids, attention_mask) — no text side-channel — so
    substituting a real token-classification model is a one-line change.
    """

    def __init__(self, gazetteer: dict[str, str]):
        index: dict[int, list] = {}
        for surface, label in gazetteer.items():
            ids = encode(surface)
            if not ids:
                continue
            index.setdefault(ids[0], []).append(
                (np.asarray(ids, dtype=np.int64), label2int(label)))
        # leftmost-LONGEST: longest gram first at each candidate position
        self.index = {k: sorted(v, key=lambda x: -len(x[0]))
                      for k, v in index.items()}
        self._first_ids = np.fromiter(self.index.keys(), dtype=np.int64,
                                      count=len(self.index))

    def __call__(self, input_ids: np.ndarray,
                 attention_mask: np.ndarray) -> np.ndarray:
        B, L = input_ids.shape
        labels = np.zeros((B, L), dtype=np.int64)
        for b in range(B):
            row = input_ids[b]
            cand = np.flatnonzero(np.isin(row, self._first_ids))
            nxt = 0
            for i in cand:
                if i < nxt:
                    continue
                for gram, cls in self.index[int(row[i])]:
                    g = len(gram)
                    if i + g <= L and np.array_equal(row[i:i + g], gram):
                        labels[b, i] = 2 * cls + 1
                        if g > 1:
                            labels[b, i + 1:i + g] = 2 * cls + 2
                        nxt = i + g
                        break
        return labels


class TorchTaggerBackend:
    """Adapter for a real token-classification model (BioLinkBERT+CRF shape).

    ``model`` is any callable following the HuggingFace convention:
    ``model(input_ids=..., attention_mask=...)`` returning an object with
    ``.logits`` (B, L, n_labels) — or the decoded (B, L) label ids directly
    when ``decodes=True`` (a CRF head does its own Viterbi decode,
    /root/reference/src/tagger/model/modeling_bionexttagger.py:113-450).
    With ``decodes=False`` the logits go through the numpy CRF-Viterbi
    layer (``bionext_ray.crf.viterbi_decode``) with the reference's
    impossible-transition mask, so even a plain token-classification head
    emits BIO-valid sequences; learned CRF scores are picked up from
    ``model.crf.{start_transitions,transitions,end_transitions}`` when the
    model carries them. Pass ``viterbi=False`` for a raw argmax.
    Torch is imported lazily; construction fails fast without it.
    """

    def __init__(self, model, device: str = "cpu", decodes: bool = False,
                 viterbi: bool = True, torch_module=None):
        # torch_module seam: tests drive the exact adapter glue (dtype,
        # device, .logits/.cpu() handling) with a numpy mock that follows
        # the HF calling convention; production leaves it None -> torch
        if torch_module is None:
            import torch  # noqa: F401 — hard requirement for this backend
            torch_module = torch
        self._torch = torch_module
        self.model = model.to(device).eval() if hasattr(model, "to") else model
        self.device = device
        self.decodes = decodes
        self.viterbi = viterbi
        # learned CRF scores, if the model exposes a torchcrf-shaped head
        self._crf_scores = {}
        crf = getattr(model, "crf", None)
        if crf is not None:
            for name, kw in (("start_transitions", "start_transitions"),
                             ("transitions", "transitions"),
                             ("end_transitions", "end_transitions")):
                p = getattr(crf, name, None)
                if p is not None:
                    arr = p.detach().cpu().numpy() if hasattr(p, "detach") \
                        else np.asarray(p, dtype=np.float64)
                    self._crf_scores[kw] = arr

    def __call__(self, input_ids: np.ndarray,
                 attention_mask: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            out = self.model(
                input_ids=torch.as_tensor(input_ids, device=self.device),
                attention_mask=torch.as_tensor(attention_mask,
                                               device=self.device))
        if self.decodes:   # CRF already emitted label ids
            dec = out.logits if hasattr(out, "logits") else out
            return np.asarray(dec.cpu() if hasattr(dec, "cpu") else dec,
                              dtype=np.int64)
        logits = out.logits.cpu().numpy()
        if self.viterbi:
            # the reference decodes UNMASKED — crf.decode(logits) with no
            # mask (modeling_bionexttagger.py:103); window attention masks
            # have LEFT-pad holes the torchcrf recurrence doesn't support
            # anyway. Pad positions decode to whatever wins and are dropped
            # later by their None offsets.
            from .crf import viterbi_decode
            return viterbi_decode(logits, **self._crf_scores)
        return logits.argmax(-1).astype(np.int64)


# ---------------------------------------------------------------- extractor
class SurrogateExtractorBackend:
    """Keyed-hash logit scorer behind the extractor backend protocol: scores
    from the metadata key (doc_id, entity1, entity2, sequence_id) — the same
    inputs the reference model conditions on at the granularity the pipeline
    needs — ignoring the padded model features.

    ``wants_inputs=False`` lets the stage skip building input_ids/indexes
    for the fast path; a real model sets True and receives the collated
    tensors."""

    wants_inputs = False

    def __call__(self, features: dict, metadata: dict):
        from .scorer import relation_logits_batch
        return relation_logits_batch(
            list(zip(metadata["doc_id"], metadata["entity1"],
                     metadata["entity2"], metadata["sequence_id"])))


class TorchExtractorBackend:
    """Adapter for a real relation+novelty classifier
    (/root/reference/src/extractor/model/modeling_bionextextractor.py:
    158-217: marker-gather + MHA pooling, returns relation and novelty
    logits). Receives the collated features (input_ids, attention_mask,
    indexes with -1 padding) exactly as the reference collator builds them.
    """

    wants_inputs = True

    def __init__(self, model, device: str = "cpu", torch_module=None):
        if torch_module is None:
            import torch  # noqa: F401
            torch_module = torch
        self._torch = torch_module
        self.model = model.to(device).eval() if hasattr(model, "to") else model
        self.device = device

    def __call__(self, features: dict, metadata: dict):
        torch = self._torch
        with torch.no_grad():
            out = self.model(
                input_ids=torch.as_tensor(features["input_ids"],
                                          device=self.device),
                attention_mask=torch.as_tensor(features["attention_mask"],
                                               device=self.device),
                indexes=torch.as_tensor(features["indexes"],
                                        device=self.device).unsqueeze(-1))
        rel, nov = out if isinstance(out, tuple) else (out.logits, out.novel)
        return (np.asarray(rel.cpu(), dtype=np.float64),
                np.asarray(nov.cpu(), dtype=np.float64))


# ---------------------------------------------------------------- linker
class TorchEmbedderBackend:
    """Adapter for a real mention encoder (SapBERT shape,
    /root/reference/src/linker/chemicals.py:49-80): batch-encode surface
    strings to row-normalized vectors. Drop-in for
    ``bionext_ray.embedding.embed_batch`` in EmbeddingIndex."""

    def __init__(self, model, tokenizer, device: str = "cpu",
                 max_length: int = MODEL_MAX_LENGTH, torch_module=None):
        if torch_module is None:
            import torch  # noqa: F401
            torch_module = torch
        self._torch = torch_module
        self.model = model.to(device).eval() if hasattr(model, "to") else model
        self.tokenizer = tokenizer
        self.device = device
        self.max_length = max_length

    def __call__(self, texts: list[str]) -> np.ndarray:
        torch = self._torch
        enc = self.tokenizer(texts, padding=True, truncation=True,
                             max_length=self.max_length, return_tensors="pt")
        with torch.no_grad():
            out = self.model(**{k: v.to(self.device) for k, v in enc.items()})
        # CLS pooling + L2 norm (chemicals.py:74-78)
        v = out.last_hidden_state[:, 0, :]
        v = v / v.norm(dim=1, keepdim=True).clamp_min(1e-12)
        return v.cpu().numpy()


MARKER_ID_SET = frozenset(MARKER_IDS.values())
