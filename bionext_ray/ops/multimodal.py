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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "environment; use ResizeStage(fake=True) for plumbing tests")


def _fake_resize(payload: bytes | None, width: int, height: int) -> bytes:
    # deterministic stand-in: digest keyed by target size, length w*h
    # (bounded) so output size scales like a real thumbnail
    seed = hashlib.blake2b((payload or b"") + f"{width}x{height}".encode(),
                           digest_size=16).digest()
    n = min(width * height, 4096)
    return (seed * (n // len(seed) + 1))[:n]


class ResizeStage:
    """Actor-pool stage: binary image column -> resized binary column +
    typed size metadata (width/height). Same heap rule as feature extract:
    batch_size x payload size x concurrency must fit the worker."""

    def __init__(self, width: int, height: int,
                 payload_col: str = "payload", fake: bool = False):
        self.width, self.height = width, height
        self.payload_col = payload_col
        self.resizer = _fake_resize if fake else (
            lambda p, w, h: resize_image(p, w, h))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.resizer(p, self.width, self.height)
               for p in batch[self.payload_col].to_pylist()]
        n = batch.num_rows
        return (batch
                .append_column("resized", pa.array(out, pa.binary()))
                .append_column("width", pa.array([self.width] * n, pa.int32()))
                .append_column("height", pa.array([self.height] * n,
                                                  pa.int32())))


def resize_images(ds, width: int, height: int, payload_col: str = "payload",
                  fake: bool = False, batch_size: int = 32, concurrency=2):
    return ds.map_batches(
        ResizeStage, fn_constructor_kwargs={
            "width": width, "height": height,
            "payload_col": payload_col, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    raise NotImplementedError(
        "video frame sampling requires a video library not present in this "
        "environment; use FrameSampleStage(fake=True) for plumbing tests")


def _fake_frames(payload: bytes | None, every_n: int) -> list[bytes]:
    # deterministic fan-out: n_frames derives from payload length, each
    # frame is a keyed digest — stable across batching and processes
    payload = payload or b""
    n_frames = max(1, len(payload) // max(1, every_n) // 16)
    return [hashlib.blake2b(payload + i.to_bytes(4, "little"),
                            digest_size=16).digest()
            for i in range(min(n_frames, 64))]


class FrameSampleStage:
    """Actor-pool fan-out stage: one video row -> K frame rows
    (id, frame_idx, frame). The Ray-side shape is the point: a binary
    fan-out must stay pyarrow end-to-end and keep batches small, and the
    output block can be much larger than the input block (Ray splits
    oversized output blocks automatically)."""

    def __init__(self, every_n: int = 1, id_col: str = "doc_id",
                 payload_col: str = "payload", fake: bool = False):
        self.every_n = every_n
        self.id_col = id_col
        self.payload_col = payload_col
        self.sampler = _fake_frames if fake else (
            lambda p, n: sample_frames(p, n))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for vid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            for i, frame in enumerate(self.sampler(p, self.every_n)):
                ids.append(vid)
                idxs.append(i)
                frames.append(frame)
        return pa.table({
            self.id_col: pa.array(ids),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def sample_video_frames(ds, every_n: int = 1, id_col: str = "doc_id",
                        payload_col: str = "payload", fake: bool = False,
                        batch_size: int = 16, concurrency=2):
    return ds.map_batches(
        FrameSampleStage, fn_constructor_kwargs={
            "every_n": every_n, "id_col": id_col,
            "payload_col": payload_col, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
