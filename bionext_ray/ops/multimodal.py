"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image and audio decoders are REAL pure-Python/numpy codecs for the two
classic header+payload container formats — 24-bit uncompressed BMP
(``decode_bmp``/``encode_bmp``) and 16-bit PCM WAV
(``decode_wav``/``encode_wav``) — so the feature-extract and resize stages
exercise genuine decode work (header parse, padded-row/chunk walk, pixel
math) with zero external libraries. Codec-library formats (JPEG/MP3/MP4)
would slot into the same kernels. Video is a real demuxer too: the BMPS
container (magic + length-prefixed BMP frames, MJPEG-style) feeds the
frame-sampling fan-out stage.
Everything Ray-side is real and tested: schema, actor-pool stage, small
batch sizes for large binary rows, pyarrow-only batch format (binary
columns must never round-trip through pandas object dtype).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


# ------------------------------------------------------------- BMP codec
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows,
    4-byte row padding)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    bgr = np.ascontiguousarray(pixels[:, :, ::-1])
    pad = b"\x00" * (row_size - w * 3)
    rows = [bgr[r].tobytes() + pad for r in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB array. Handles
    bottom-up (positive height) and top-down (negative) pixel order and the
    4-byte row padding; rejects compressed or non-24-bit files."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, np.uint8, row_size * h,
                        data_offset).reshape(h, row_size)
    bgr = arr[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()           # BGR -> RGB


def decode_image(payload: bytes) -> dict:
    """Real image decode (BMP): dimensions + per-channel mean features."""
    rgb = decode_bmp(payload)
    n = rgb.shape[0] * rgb.shape[1]
    # exact integer channel means (milli-scaled) so an SQL oracle over the
    # generated pixel pattern can reproduce them bit-for-bit
    sums = (rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            if n else np.zeros(3, dtype=np.int64))
    return {
        "n_bytes": len(payload),
        "content_id": hashlib.blake2b(payload, digest_size=8).hexdigest(),
        "width": int(rgb.shape[1]),
        "height": int(rgb.shape[0]),
        "mean_r_milli": int(1000 * sums[0] // n) if n else 0,
        "mean_g_milli": int(1000 * sums[1] // n) if n else 0,
        "mean_b_milli": int(1000 * sums[2] // n) if n else 0,
    }


# ------------------------------------------------------------- WAV codec
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (RIFF/fmt/data chunks)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (int16 sample array, sample_rate). Walks the RIFF
    chunk list (fmt may not directly precede data); rejects non-PCM or
    non-16-bit encodings."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, bits, fmt_code, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload,
                                                             pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size}, got {len(body)}")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"short fmt chunk: {len(body)} bytes, need 16")
            fmt_code, _, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)        # chunks are word-aligned
    if fmt_code != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM WAV supported "
                         f"(fmt={fmt_code}, bits={bits})")
    if data is None:
        raise ValueError("WAV payload has no data chunk")
    return np.frombuffer(data, dtype="<i2"), int(sample_rate)


def decode_audio(payload: bytes) -> dict:
    """Real audio decode (PCM WAV): duration + RMS loudness features."""
    samples, rate = decode_wav(payload)
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) \
        if samples.size else 0.0
    return {
        "n_bytes": len(payload),
        "content_id": hashlib.blake2b(payload, digest_size=8).hexdigest(),
        "sample_rate": rate,
        "n_samples": int(samples.size),
        "duration_ms": int(samples.size) * 1000 // rate if rate else 0,
        "rms_milli": int(rms * 1000),
    }


def _fake_features(payload: bytes | None) -> dict:
    payload = payload or b""
    digest = hashlib.blake2b(payload, digest_size=8).hexdigest()
    return {"n_bytes": len(payload), "content_id": digest}


_FEATURE_COLS = {
    "fake": ["n_bytes", "content_id"],
    "image": ["n_bytes", "content_id", "width", "height",
              "mean_r_milli", "mean_g_milli", "mean_b_milli"],
    "audio": ["n_bytes", "content_id", "sample_rate", "n_samples",
              "duration_ms", "rms_milli"],
}


class FeatureExtractStage:
    """Actor-pool stage: binary column -> typed feature columns.

    ``modality``: 'image' (BMP decode), 'audio' (WAV decode) — real decode
    work per row — or the deterministic fake when ``fake=True``. Use small
    ``batch_size`` (large binary payloads x concurrency must fit a worker
    heap) and ``batch_format='pyarrow'`` end to end.
    """

    def __init__(self, payload_col: str = "payload", fake: bool = False,
                 modality: str = "image"):
        self.payload_col = payload_col
        if fake:
            self.decoder, self.cols = _fake_features, _FEATURE_COLS["fake"]
        elif modality == "audio":
            self.decoder, self.cols = decode_audio, _FEATURE_COLS["audio"]
        else:
            self.decoder, self.cols = decode_image, _FEATURE_COLS["image"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decoder(p) for p in batch[self.payload_col].to_pylist()]
        for col in self.cols:
            typ = pa.string() if col == "content_id" else pa.int64()
            batch = batch.append_column(
                col, pa.array([f[col] for f in feats], typ))
        return batch


def feature_extract(ds, payload_col: str = "payload", fake: bool = False,
                    modality: str = "image", batch_size: int = 64,
                    concurrency=2):
    return ds.map_batches(
        FeatureExtractStage, fn_constructor_kwargs={
            "payload_col": payload_col, "fake": fake, "modality": modality},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize: BMP decode -> nearest-neighbor resample (two
    vectorized index maps) -> BMP re-encode."""
    rgb = decode_bmp(payload)
    h, w = rgb.shape[:2]
    yi = (np.arange(height, dtype=np.int64) * h) // height
    xi = (np.arange(width, dtype=np.int64) * w) // width
    return encode_bmp(rgb[yi][:, xi])


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


def encode_bmp_stream(frames: list[bytes]) -> bytes:
    """MJPEG-style toy video container: magic + frame count + a sequence of
    length-prefixed BMP frames. Real enough to demux (magic check, bounds
    checks, frame walk) with zero external libraries; a codec container
    (MP4/AVI) would slot into the same sampler."""
    out = [b"BMPS", struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Real demux of the BMPS container: walk the length-prefixed frame
    sequence, keep every ``every_n``-th frame (always including frame 0),
    validating each kept frame's BMP magic."""
    if len(payload) < 8 or payload[:4] != b"BMPS":
        raise ValueError("not a BMPS video payload")
    n_frames = struct.unpack_from("<I", payload, 4)[0]
    pos, idx, kept = 8, 0, []
    while pos + 4 <= len(payload) and idx < n_frames:
        size = struct.unpack_from("<I", payload, pos)[0]
        frame = payload[pos + 4:pos + 4 + size]
        if len(frame) != size:
            raise ValueError(f"truncated frame {idx}")
        if idx % max(1, every_n) == 0:
            if frame[:2] != b"BM":
                raise ValueError(f"frame {idx} is not a BMP")
            kept.append(frame)
        pos += 4 + size
        idx += 1
    return kept


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


def ahash_image(payload: bytes, grid: int = 8) -> int:
    """Average-hash perceptual fingerprint of a decoded BMP: downsample to
    a grid x grid luma matrix (mean over cell blocks), threshold at the
    global mean, pack row-major into an integer — near-identical images
    (resizes, small noise) agree on most bits; Hamming distance ranks
    similarity. Pure integer/numpy arithmetic, deterministic everywhere."""
    px = decode_bmp(payload).astype(np.int64)
    luma = px.sum(axis=2)                      # 3x-scaled luma, integer
    h, w = luma.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    cells = np.empty((grid, grid), np.int64)
    for i in range(grid):
        for j in range(grid):
            blk = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = blk.sum() // blk.size
    bits = (cells >= cells.sum() // (grid * grid)).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


class AHashStage:
    """Actor-pool stage: payload -> (ahash, bucket of top bits). Decode +
    hash once per image in __call__; grid precomputed in __init__."""

    def __init__(self, grid: int = 8, bucket_bits: int = 16):
        self.grid = grid
        self.bucket_bits = bucket_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        batch = batch.filter(pc.is_valid(batch["payload"]))
        hs = [ahash_image(p, self.grid)
              for p in batch["payload"].to_pylist()]
        shift = self.grid * self.grid - self.bucket_bits
        # hashes are unsigned grid*grid-bit ints; store two's-complement
        # int64 (top bit set would overflow a signed column otherwise)
        signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hs]
        return pa.table({
            "doc_id": batch["doc_id"],
            "ahash": pa.array(signed, pa.int64()),
            "hash_bucket": pa.array([h >> shift for h in hs],
                                    pa.int64())})


def image_neardup_pairs(ds, max_hamming: int = 6, grid: int = 8,
                        bucket_bits: int = 16,
                        shuffle_partitions: int | None = None):
    """Perceptual image near-dup candidates: aHash per image on an actor
    pool, bucket by the hash's TOP bits (near-identical images share them
    — coarse structure lands in the high-order cells), then inside each
    bucket a vectorized XOR-popcount pair scan keeps pairs within
    ``max_hamming`` bits. The multimodal member of the dedup family: same
    block-then-verify shape as MinHash-LSH, with Hamming verification
    exact INSIDE buckets (cross-bucket near-dups beyond the top-bit
    agreement are the documented recall trade-off, like any LSH)."""
    import pandas as pd

    from bionext_ray.ops.relational import actor_pool_size

    P = max(16, shuffle_partitions or 0)

    class Stage(AHashStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = super().__call__(batch)
            # exchange key: hash_bucket folded to ~P groups (the repo's
            # anti-singleton-group rule — 2^bucket_bits sorted groups is
            # the measured slow path); the TRUE bucket rides along and
            # the in-group pandas groupby restores it
            hb = t["hash_bucket"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "__bucket", pa.array(np.abs(hb) % P, pa.int64()))

    hashed = ds.map_batches(Stage,
                            fn_constructor_kwargs={
                                "grid": grid, "bucket_bits": bucket_bits},
                            batch_format="pyarrow",
                            concurrency=actor_pool_size())

    _LUT = np.array([bin(i).count("1") for i in range(256)], np.int64)

    def _scan(h, ids):
        """Exact Hamming pair scan, memory-bounded: row-chunks against the
        tail keep the candidate XOR matrix <= ~4M entries regardless of a
        hot bucket's size (O(n^2) compute is the exact-verify contract;
        O(n^2) MEMORY in one task is not)."""
        n = len(h)
        out_a, out_b, out_d = [], [], []
        chunk = max(1, (1 << 22) // max(n, 1))
        for i0 in range(0, n - 1, chunk):
            hi = h[i0:i0 + chunk]
            x = hi[:, None] ^ h[None, i0 + 1:]       # chunk x tail
            ham = np.zeros(x.shape, np.int64)
            for k in range(8):
                ham += _LUT[np.bitwise_and(
                    x >> np.uint64(8 * k),
                    np.uint64(0xFF)).astype(np.int64)]
            ii, jj = np.nonzero(ham <= max_hamming)
            gi = ii + i0
            gj = jj + i0 + 1
            keep = gj > gi                           # upper triangle only
            out_a.append(ids[gi[keep]])
            out_b.append(ids[gj[keep]])
            out_d.append(ham[ii[keep], jj[keep]])
        if not out_a:
            return (np.array([], np.int64),) * 3
        return (np.concatenate(out_a), np.concatenate(out_b),
                np.concatenate(out_d))

    def exchange_group(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, grp in g.groupby("hash_bucket", sort=False):
            grp = grp.sort_values("doc_id")
            if len(grp) < 2:
                continue
            a, b, d = _scan(
                grp["ahash"].to_numpy(np.int64).astype(np.uint64),
                grp["doc_id"].to_numpy(np.int64))
            frames.append(pd.DataFrame(
                {"id_a": a, "id_b": b, "hamming": d}))
        if not frames:
            return pd.DataFrame({"id_a": pd.array([], dtype=np.int64),
                                 "id_b": pd.array([], dtype=np.int64),
                                 "hamming": pd.array([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    return (hashed.groupby("__bucket")
            .map_groups(exchange_group, batch_format="pandas"))
