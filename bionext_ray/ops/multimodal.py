"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode kernels are STUBS — ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True`` selects the deterministic fake
(byte-length + keyed content digest features). Everything Ray-side is real
and tested: schema, actor-pool stage, small batch sizes for large binary
rows, pyarrow-only batch format (binary columns must never round-trip
through pandas object dtype).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def decode_image(payload: bytes) -> dict:
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use FeatureExtractStage(fake=True) for plumbing tests")


def decode_audio(payload: bytes) -> dict:
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "environment; use FeatureExtractStage(fake=True) for plumbing tests")


def _fake_features(payload: bytes | None) -> dict:
    payload = payload or b""
    digest = hashlib.blake2b(payload, digest_size=8).hexdigest()
    return {"n_bytes": len(payload), "content_id": digest}


class FeatureExtractStage:
    """Actor-pool stage: binary column -> feature columns.

    Use small ``batch_size`` (large binary payloads x concurrency must fit a
    worker heap) and ``batch_format='pyarrow'`` end to end.
    """

    def __init__(self, payload_col: str = "payload", fake: bool = False):
        self.payload_col = payload_col
        self.fake = fake
        self.decoder = _fake_features if fake else decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decoder(p) for p in batch[self.payload_col].to_pylist()]
        batch = batch.append_column(
            "n_bytes", pa.array([f["n_bytes"] for f in feats], pa.int64()))
        return batch.append_column(
            "content_id", pa.array([f["content_id"] for f in feats], pa.string()))


def feature_extract(ds, payload_col: str = "payload", fake: bool = False,
                    batch_size: int = 64, concurrency=2):
    return ds.map_batches(
        FeatureExtractStage, fn_constructor_kwargs={
            "payload_col": payload_col, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
