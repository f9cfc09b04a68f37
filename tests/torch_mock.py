"""Pure-numpy stand-in for the slice of the torch API the adapters use.

Injected through the ``torch_module`` seam of TorchTaggerBackend /
TorchExtractorBackend / TorchEmbedderBackend so the adapter glue (dtype
handling, device moves, ``.logits`` vs tuple outputs, ``.cpu()`` /
``.numpy()`` conversion, ``unsqueeze``) executes in this torch-free
sandbox. The surface mirrors the HF calling convention exactly: models are
called with keyword tensors and return objects with ``.logits`` (or
tuples); tensors support the methods the adapters actually touch.
"""
from __future__ import annotations

import contextlib
from types import SimpleNamespace

import numpy as np


class MockTensor:
    def __init__(self, arr, device="cpu"):
        self.arr = np.asarray(arr)
        self.device = device
        self.shape = self.arr.shape

    # --- conversion / movement -------------------------------------------
    def cpu(self):
        return MockTensor(self.arr, "cpu")

    def numpy(self):
        return self.arr

    def __array__(self, dtype=None):
        return self.arr.astype(dtype) if dtype is not None else self.arr

    def to(self, device):
        return MockTensor(self.arr, device)

    def detach(self):
        return self

    # --- shape / math ------------------------------------------------------
    def unsqueeze(self, dim):
        return MockTensor(np.expand_dims(self.arr, dim), self.device)

    def argmax(self, dim=-1):
        return MockTensor(self.arr.argmax(dim), self.device)

    def norm(self, dim=None, keepdim=False):
        return MockTensor(np.linalg.norm(self.arr, axis=dim,
                                         keepdims=keepdim), self.device)

    def clamp_min(self, v):
        return MockTensor(np.maximum(self.arr, v), self.device)

    def __getitem__(self, key):
        return MockTensor(self.arr[key], self.device)

    def __truediv__(self, other):
        o = other.arr if isinstance(other, MockTensor) else other
        return MockTensor(self.arr / o, self.device)


def as_tensor(x, device="cpu"):
    return MockTensor(x.arr if isinstance(x, MockTensor) else x, device)


@contextlib.contextmanager
def no_grad():
    yield


# ----------------------------------------------------------------- models
class MockTaggerModel:
    """HF-convention token-classification model: logits = one-hot of a
    fixed label plan (so the expected decode is known), optionally with a
    torchcrf-shaped ``crf`` attribute carrying learned scores."""

    def __init__(self, plan_fn, n_tags=13, crf=None):
        self.plan_fn = plan_fn          # (input_ids arr) -> (B, L) label ids
        self.n_tags = n_tags
        if crf is not None:
            self.crf = crf
        self.seen_devices = []
        self.eval_called = False

    def to(self, device):
        self.seen_devices.append(device)
        return self

    def eval(self):
        self.eval_called = True
        return self

    def __call__(self, input_ids=None, attention_mask=None):
        ids = input_ids.arr
        plan = self.plan_fn(ids)
        logits = np.full(plan.shape + (self.n_tags,), -5.0)
        np.put_along_axis(logits, plan[..., None], 5.0, axis=-1)
        return SimpleNamespace(logits=MockTensor(logits))


class MockExtractorModel:
    """HF-convention relation+novelty model. Returns a tuple or an object
    with .logits/.novel depending on ``as_tuple`` — both shapes the adapter
    must handle. Records the indexes tensor shape to prove the unsqueeze."""

    def __init__(self, n_rel=9, as_tuple=True):
        self.n_rel = n_rel
        self.as_tuple = as_tuple
        self.last_indexes_shape = None

    def to(self, device):
        return self

    def eval(self):
        return self

    def __call__(self, input_ids=None, attention_mask=None, indexes=None):
        self.last_indexes_shape = indexes.arr.shape
        B = input_ids.arr.shape[0]
        # deterministic logits derived from the features themselves
        rel = np.stack([np.arange(self.n_rel, dtype=np.float64)
                        + input_ids.arr[b].sum() % 7 for b in range(B)])
        nov = np.stack([[float(indexes.arr[b].max()), 1.0]
                        for b in range(B)])
        if self.as_tuple:
            return MockTensor(rel), MockTensor(nov)
        return SimpleNamespace(logits=MockTensor(rel),
                               novel=MockTensor(nov))


class MockEncoderModel:
    """SapBERT-shaped encoder: last_hidden_state whose CLS row is a
    deterministic function of the input ids."""

    def to(self, device):
        return self

    def eval(self):
        return self

    def __call__(self, input_ids=None, attention_mask=None):
        ids = input_ids.arr
        B, L = ids.shape
        h = np.zeros((B, L, 4))
        for b in range(B):
            h[b, 0] = [ids[b].sum() % 11 + 1, ids[b, 0] % 5,
                       len(ids[b]) % 3, 1.0]
        return SimpleNamespace(last_hidden_state=MockTensor(h))


class MockTokenizer:
    """HF-convention tokenizer: returns a dict of .to()-able tensors."""

    def __call__(self, texts, padding=True, truncation=True, max_length=512,
                 return_tensors="pt"):
        assert return_tensors == "pt"
        ids = [[len(t) % 97 + 1] + [ord(c) % 97 + 2 for c in t[:8]]
               for t in texts]
        L = min(max((len(r) for r in ids), default=1), max_length)
        arr = np.zeros((len(ids), L), dtype=np.int64)
        mask = np.zeros((len(ids), L), dtype=np.int64)
        for i, r in enumerate(ids):
            n = min(len(r), L)
            arr[i, :n] = r[:n]
            mask[i, :n] = 1
        return {"input_ids": MockTensor(arr),
                "attention_mask": MockTensor(mask)}
