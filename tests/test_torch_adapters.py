"""Drive the Torch adapter glue with the numpy HF-convention mock.

Torch does not exist in this sandbox; these tests execute the exact
adapter code paths (device moves, dtype casts, ``.logits`` vs tuple
handling, ``.cpu()``/``__array__`` conversion, indexes ``unsqueeze``, CRF
parameter pickup) through the ``torch_module`` seam, so the glue is
covered rather than merely read.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import torch_mock as tm  # noqa: E402

from bionext_ray.models import (TorchEmbedderBackend, TorchExtractorBackend,
                                TorchTaggerBackend)


def test_tagger_adapter_viterbi_path():
    # model emits near-one-hot logits for a plan containing an INVALID BIO
    # step (I-class1 straight after O); masked Viterbi must repair it
    def plan(ids):
        B, L = ids.shape
        p = np.zeros((B, L), dtype=np.int64)
        p[:, 1] = 4          # I-class1 after O — impossible
        p[:, 2] = 3          # B-class1
        p[:, 3] = 4          # I-class1 — valid continuation
        return p

    model = tm.MockTaggerModel(plan)
    be = TorchTaggerBackend(model, device="meta", torch_module=tm)
    assert model.seen_devices == ["meta"] and model.eval_called
    ids = np.arange(20, dtype=np.int64).reshape(2, 10)
    mask = np.ones((2, 10), dtype=np.int64)
    out = be(ids, mask)
    assert out.shape == (2, 10) and out.dtype == np.int64
    # the impossible I got replaced (B-class1 is the best legal tag there,
    # logit margin aside Viterbi may also pick O); positions 2-3 survive
    assert out[0, 1] in (0, 3)
    assert out[0, 2] == 3 and out[0, 3] == 4


def test_tagger_adapter_raw_argmax_path():
    def plan(ids):
        p = np.zeros(ids.shape, dtype=np.int64)
        p[:, 1] = 4
        return p

    be = TorchTaggerBackend(tm.MockTaggerModel(plan), viterbi=False,
                            torch_module=tm)
    out = be(np.ones((1, 4), dtype=np.int64), np.ones((1, 4), dtype=np.int64))
    assert out[0].tolist() == [0, 4, 0, 0]        # argmax keeps the invalid I


def test_tagger_adapter_decodes_path():
    class DecodingModel(tm.MockTaggerModel):
        def __call__(self, input_ids=None, attention_mask=None):
            dec = self.plan_fn(input_ids.arr)
            from types import SimpleNamespace
            return SimpleNamespace(logits=tm.MockTensor(dec))

    def plan(ids):
        return np.minimum(np.arange(ids.shape[1]), 2) * np.ones(
            (ids.shape[0], 1), dtype=np.int64)

    be = TorchTaggerBackend(DecodingModel(plan), decodes=True,
                            torch_module=tm)
    out = be(np.ones((2, 5), dtype=np.int64), np.ones((2, 5), dtype=np.int64))
    assert out.dtype == np.int64 and out[0].tolist() == [0, 1, 2, 2, 2]


def test_tagger_adapter_picks_up_crf_scores():
    from types import SimpleNamespace
    start = np.zeros(13)
    trans = np.zeros((13, 13))
    end = np.zeros(13)
    trans[3, 4] = 2.5       # learned preference B1->I1
    crf = SimpleNamespace(start_transitions=tm.MockTensor(start),
                          transitions=tm.MockTensor(trans),
                          end_transitions=tm.MockTensor(end))
    model = tm.MockTaggerModel(lambda ids: np.zeros(ids.shape, np.int64),
                               crf=crf)
    be = TorchTaggerBackend(model, torch_module=tm)
    assert set(be._crf_scores) == {"start_transitions", "transitions",
                                   "end_transitions"}
    assert be._crf_scores["transitions"][3, 4] == 2.5


def test_extractor_adapter_tuple_and_attr_outputs():
    feats = {"input_ids": np.ones((3, 8), dtype=np.int64),
             "attention_mask": np.ones((3, 8), dtype=np.int64),
             "indexes": np.array([[1, 2, -1, -1], [3, 4, 5, 6],
                                  [2, 3, 4, -1]], dtype=np.int64)}
    meta = {"doc_id": ["a", "b", "c"]}
    for as_tuple in (True, False):
        model = tm.MockExtractorModel(as_tuple=as_tuple)
        be = TorchExtractorBackend(model, torch_module=tm)
        rel, nov = be(feats, meta)
        # the adapter unsqueezes indexes to (B, K, 1) — the gather shape
        assert model.last_indexes_shape == (3, 4, 1)
        assert rel.shape == (3, 9) and nov.shape == (3, 2)
        assert rel.dtype == np.float64 and nov.dtype == np.float64
        assert nov[1, 0] == 6.0       # derived from the features: glue real


def test_embedder_adapter_cls_pooling_and_norm():
    be = TorchEmbedderBackend(tm.MockEncoderModel(), tm.MockTokenizer(),
                              torch_module=tm)
    v = be(["aspirin", "p53", ""])
    assert v.shape == (3, 4)
    norms = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-9)
    # deterministic: same input -> same vector
    v2 = be(["aspirin", "p53", ""])
    np.testing.assert_array_equal(v, v2)


def test_adapters_still_gate_on_torch_without_seam():
    with pytest.raises(ImportError):
        TorchTaggerBackend(tm.MockTaggerModel(lambda i: np.zeros(i.shape,
                                                                 np.int64)))
