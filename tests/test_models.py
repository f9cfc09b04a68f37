"""Model adapter layer: the backend protocol must (a) reproduce the direct
surrogate paths exactly (parity), (b) be invoked ONCE per batch over all
windows of all docs (the GPU-forward contract), and (c) carry real model
features — input_ids, attention_mask, marker indexes — shaped like the
reference collators build them (/root/reference/src/data.py:238-249,
src/extractor/collator.py:4-73)."""

import numpy as np
import pyarrow as pa
import pytest

from bionext_ray.fixtures import expected_text, make_documents, pages_table
from bionext_ray.kb import default_kb
from bionext_ray.models import (SurrogateExtractorBackend,
                                SurrogateTaggerBackend,
                                collate_marker_windows,
                                collate_tagger_windows)
from bionext_ray.stages.extractor import ExtractorStage
from bionext_ray.stages.linker import LinkerStage
from bionext_ray.stages.tagger import TaggerStage
from bionext_ray.tokenization import (CLS_ID, MARKER_IDS, PAD_ID, S1_ID,
                                      S2_ID, SEP_ID, token_id)


@pytest.fixture(scope="module")
def kb():
    return default_kb()


@pytest.fixture(scope="module")
def docs_batch():
    docs = make_documents(30, seed=7)
    return pa.table({
        "url": pa.array([f"u{d['doc_id']}" for d in docs], pa.string()),
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
        "text": pa.array([expected_text(d) for d in docs], pa.string()),
    })


# ---------------------------------------------------------------- windows
def test_make_windows_inputs_match_reference_shape():
    from bionext_ray.constants import CTX, MODEL_MAX_LENGTH
    from bionext_ray.windows import make_windows
    text = ("the spark gene was upregulated in customer tissue " * 70).strip()
    ws = make_windows(text, with_inputs=True)
    assert len(ws) > 1
    for j, w in enumerate(ws):
        ids, mask, offs = w["input_ids"], w["attention_mask"], w["offsets"]
        assert len(ids) == len(mask) == len(offs) <= MODEL_MAX_LENGTH
        assert ids[0] == CLS_ID and ids[-1] == SEP_ID
        assert mask[0] == 1 and mask[-1] == 1
        # mask is 0 exactly where the offset slot is a left-PAD (None
        # before the document starts), 1 on every real token
        for tid, m, off in zip(ids[1:-1], mask[1:-1], offs[1:-1]):
            if off is None:
                assert m == 0 and tid == PAD_ID
            else:
                assert m == 1 and tid == token_id(text[off[0]:off[1]])
        if j == 0:
            assert mask[1:CTX + 1] == [0] * CTX      # first window left-pads
        else:
            assert 0 not in mask                      # later windows full


def test_collate_tagger_windows_pads():
    samples = [{"input_ids": [CLS_ID, 10, 11, SEP_ID],
                "attention_mask": [1, 1, 1, 1]},
               {"input_ids": [CLS_ID, 12, SEP_ID],
                "attention_mask": [1, 1, 1]}]
    f = collate_tagger_windows(samples)
    assert f["input_ids"].shape == (2, 4)
    assert f["input_ids"][1].tolist() == [CLS_ID, 12, SEP_ID, PAD_ID]
    assert f["attention_mask"][1].tolist() == [1, 1, 1, 0]


def test_collate_marker_windows_pads_indexes():
    samples = [{"input_ids": [CLS_ID, S1_ID, 10, S2_ID, SEP_ID],
                "indexes": [1, 3]},
               {"input_ids": [CLS_ID, 11, SEP_ID], "indexes": []}]
    f = collate_marker_windows(samples)
    assert f["indexes"].shape == (2, 2)
    assert f["indexes"][0].tolist() == [1, 3]
    assert f["indexes"][1].tolist() == [-1, -1]       # the gather sentinel
    assert f["attention_mask"][1].tolist() == [1, 1, 1, 0, 0]


# ---------------------------------------------------------------- tagger
def test_tagger_backend_parity(kb, docs_batch):
    """Ids-only backend == direct regex path, mention for mention, over the
    whole fixture corpus (incl. multi-token and punctuation surfaces)."""
    direct = TaggerStage(kb.gazetteer)(docs_batch)
    via_backend = TaggerStage(
        kb.gazetteer, backend=SurrogateTaggerBackend(kb.gazetteer))(docs_batch)
    assert direct["mentions"].to_pylist() == via_backend["mentions"].to_pylist()


def test_tagger_backend_called_once_per_batch(kb, docs_batch):
    calls = []
    inner = SurrogateTaggerBackend(kb.gazetteer)

    def counting(ids, mask):
        calls.append(ids.shape)
        return inner(ids, mask)

    TaggerStage(kb.gazetteer, backend=counting)(docs_batch)
    assert len(calls) == 1                    # one forward per batch
    n_windows, L = calls[0]
    assert n_windows > docs_batch.num_rows    # long docs fan out windows
    assert L <= 512


def test_tagger_backend_multitoken_surface(kb):
    """Punctuated multi-token grams ('c.76a/g' -> 5 tokens) must match as
    one B,I,I,I,I span through the ids-only scan."""
    batch = pa.table({
        "url": pa.array(["u"]), "doc_id": pa.array(["d"]),
        "text": pa.array(["the c.76A/G variant of spark alters hash binding"]),
    })
    out = TaggerStage(kb.gazetteer,
                      backend=SurrogateTaggerBackend(kb.gazetteer))(batch)
    ms = out["mentions"].to_pylist()[0]
    got = {(m["text"], m["label"]) for m in ms}
    assert ("c.76A/G", "SequenceVariant") in got
    assert ("spark", "GeneOrGeneProduct") in got
    assert ("hash", "ChemicalEntity") in got


# ---------------------------------------------------------------- extractor
@pytest.fixture(scope="module")
def linked_batch(ray_session, kb, docs_batch):
    tagged = TaggerStage(kb.gazetteer)(docs_batch)
    return LinkerStage(kb)(tagged)


def test_extractor_backend_parity(kb, linked_batch):
    direct = ExtractorStage()(linked_batch).to_pylist()
    via_backend = ExtractorStage(
        backend=SurrogateExtractorBackend())(linked_batch).to_pylist()
    assert direct == via_backend
    assert len(direct) > 20


def test_extractor_backend_called_once_with_collated_features(kb, linked_batch):
    """A wants_inputs backend receives the padded model features in ONE
    call: rectangular input_ids with CLS/SEP, -1-padded marker indexes that
    point at marker token ids, and [s1]/[s2] present whenever e1 != e2
    (the reference's skip rule)."""
    captured = {}
    inner = SurrogateExtractorBackend()

    class Recording:
        wants_inputs = True

        def __call__(self, features, metadata):
            captured.setdefault("calls", []).append(features)
            captured["metadata"] = metadata
            return inner({}, metadata)

    triples = ExtractorStage(backend=Recording())(linked_batch).to_pylist()
    assert len(captured["calls"]) == 1
    f = captured["calls"][0]
    ids, idxs = f["input_ids"], f["indexes"]
    B, L = ids.shape
    assert B == len(captured["metadata"]["doc_id"]) and B > 50
    assert L <= 512
    marker_ids = set(MARKER_IDS.values())
    for b in range(B):
        row = ids[b]
        assert row[0] == CLS_ID
        # every non-(-1) index points at a marker token
        for k in idxs[b]:
            if k >= 0:
                assert int(row[k]) in marker_ids
        e1 = captured["metadata"]["entity1"][b]
        e2 = captured["metadata"]["entity2"][b]
        if e1 != e2:
            assert (row == S1_ID).any() and (row == S2_ID).any()
    # and the scored output still fuses to the exact surrogate triples
    assert triples == ExtractorStage()(linked_batch).to_pylist()


# ---------------------------------------------------------------- end-to-end
def test_full_pipeline_parity_with_backends(ray_session, kb):
    """The done-criterion: the parity suite's triple check passes with the
    adapter backends substituted for the direct surrogate paths."""
    import ray.data

    from bionext_ray.pipeline import kg_stage_datasets
    from tests.oracle_ref import run_oracle
    docs = make_documents(30, seed=7)
    pages = pages_table(docs)
    stages = kg_stage_datasets(
        ray.data.from_arrow(pages), concurrency=2, batch_size=8,
        backends={"tagger": SurrogateTaggerBackend(kb.gazetteer),
                  "extractor": SurrogateExtractorBackend()})
    got = {(r.doc_id, r.subj, r.pred, r.obj, r.novel)
           for r in stages["triples"].to_pandas().itertuples()}
    want = set(run_oracle(pages.to_pylist(), kb)["triples"])
    assert got == want and len(got) > 20


# ---------------------------------------------------------------- torch
def test_torch_backends_require_torch():
    """The lazy-import contract: constructing a torch backend without torch
    raises ImportError at __init__ (not at module import)."""
    torch_missing = False
    try:
        import torch  # noqa: F401
    except ImportError:
        torch_missing = True
    if not torch_missing:
        pytest.skip("torch present; covered by test_torch_tagger_adapter")
    from bionext_ray.models import TorchExtractorBackend, TorchTaggerBackend
    with pytest.raises(ImportError):
        TorchTaggerBackend(model=object())
    with pytest.raises(ImportError):
        TorchExtractorBackend(model=object())


def test_torch_tagger_adapter():
    """With torch installed, a HF-style token classifier runs through the
    adapter and its argmax labels reach the decoder unchanged."""
    torch = pytest.importorskip("torch")
    from bionext_ray.models import TorchTaggerBackend

    class TinyModel(torch.nn.Module):
        def forward(self, input_ids=None, attention_mask=None):
            B, L = input_ids.shape
            logits = torch.zeros((B, L, 13))
            logits[:, :, 0] = 1.0
            from types import SimpleNamespace
            return SimpleNamespace(logits=logits)

    backend = TorchTaggerBackend(TinyModel())
    out = backend(np.zeros((2, 8), dtype=np.int64),
                  np.ones((2, 8), dtype=np.int64))
    assert out.shape == (2, 8) and (out == 0).all()


def test_linker_pluggable_embedder(kb, docs_batch):
    """A custom batch encoder drops into LinkerStage (SapBERT shape); with
    the surrogate encoder injected explicitly the output is identical to
    the default, and the injected callable is actually used."""
    calls = []
    from bionext_ray.embedding import embed_batch

    def counting_embedder(texts):
        calls.append(len(texts))
        return embed_batch(texts)

    tagged = TaggerStage(kb.gazetteer)(docs_batch)
    default = LinkerStage(kb)(tagged)["mentions"].to_pylist()
    injected = LinkerStage(kb, embedder=counting_embedder)(
        tagged)["mentions"].to_pylist()
    assert default == injected
    assert calls and sum(calls) > 0
