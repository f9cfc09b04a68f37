"""Multimodal: REAL pure-Python BMP/WAV codecs (roundtrip + feature
extraction pinned here and by the image_features/audio_features SQL
oracles), plus the Ray-side shape — pyarrow-only binary columns, actor-pool
stages, fan-out explosion, typed metadata. Only video frame sampling stays
a stub (container demuxing needs an external lib)."""

import pyarrow as pa
import pytest


def _payload_table(n=6):
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
        "payload": pa.array([bytes(range(0, 32 * (i + 1), 1)) * 8
                             for i in range(n)], pa.binary()),
    })


def test_decoders_reject_junk():
    from bionext_ray.ops.multimodal import (decode_audio, decode_image,
                                            resize_image, sample_frames)
    for fn, args in [(decode_image, (b"x",)), (decode_audio, (b"x",)),
                     (resize_image, (b"x", 4, 4)),
                     (sample_frames, (b"xxxxxxxxxx", 2))]:
        with pytest.raises(ValueError):
            fn(*args)


def test_bmps_video_demux_roundtrip():
    import numpy as np

    from bionext_ray.ops.multimodal import (decode_bmp, encode_bmp,
                                            encode_bmp_stream, sample_frames)
    frames = [encode_bmp(np.full((4, 4, 3), 10 * i, np.uint8))
              for i in range(5)]
    stream = encode_bmp_stream(frames)
    kept = sample_frames(stream, every_n=2)       # frames 0, 2, 4
    assert kept == [frames[0], frames[2], frames[4]]
    assert decode_bmp(kept[1])[0, 0, 0] == 20
    assert sample_frames(stream, every_n=1) == frames


def test_bmp_codec_roundtrip_and_features():
    import numpy as np

    from bionext_ray.ops.multimodal import (decode_bmp, decode_image,
                                            encode_bmp, resize_image)
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (9, 17, 3)).astype(np.uint8)  # odd width -> pad
    payload = encode_bmp(px)
    assert np.array_equal(decode_bmp(payload), px)
    f = decode_image(payload)
    assert (f["width"], f["height"]) == (17, 9)
    sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    assert f["mean_r_milli"] == 1000 * sums[0] // (17 * 9)
    # real nearest-neighbor resize: output decodes to the target dims
    small = decode_bmp(resize_image(payload, 5, 4))
    assert small.shape == (4, 5, 3)
    # corner pixels survive nearest-neighbor
    assert tuple(small[0, 0]) == tuple(px[0, 0])


def test_wav_codec_roundtrip_and_features():
    import numpy as np

    from bionext_ray.ops.multimodal import decode_audio, decode_wav, encode_wav
    s = ((np.arange(3200) * 37) % 4096 - 2048).astype(np.int16)
    payload = encode_wav(s, 16000)
    s2, rate = decode_wav(payload)
    assert np.array_equal(s, s2) and rate == 16000
    f = decode_audio(payload)
    assert f["n_samples"] == 3200 and f["duration_ms"] == 200
    assert f["n_bytes"] == 44 + 2 * 3200


def test_real_decode_stage(ray_session):
    import numpy as np
    import ray.data

    from bionext_ray.ops.multimodal import encode_bmp, feature_extract
    tbl = pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "payload": pa.array([
            encode_bmp(np.full((4, 6, 3), 10, np.uint8)),
            encode_bmp(np.full((8, 2, 3), 250, np.uint8))], pa.binary()),
    })
    out = feature_extract(ray.data.from_arrow(tbl), modality="image",
                          batch_size=1).to_pandas().sort_values("doc_id")
    assert out["width"].tolist() == [6, 2]
    assert out["height"].tolist() == [4, 8]
    assert out["mean_g_milli"].tolist() == [10000, 250000]


def test_feature_extract_and_resize(ray_session):
    import ray.data

    from bionext_ray.ops.multimodal import feature_extract, resize_images
    ds = ray.data.from_arrow(_payload_table())
    feats = feature_extract(ds, fake=True, batch_size=4).to_pandas()
    assert set(feats.columns) >= {"doc_id", "n_bytes", "content_id"}
    assert feats["n_bytes"].tolist() == [256 * (i + 1) for i in range(6)]
    # deterministic across reruns
    feats2 = feature_extract(ray.data.from_arrow(_payload_table()),
                             fake=True, batch_size=2).to_pandas()
    assert sorted(feats["content_id"]) == sorted(feats2["content_id"])

    rs = resize_images(ds, 32, 16, fake=True, batch_size=4).to_pandas()
    assert (rs["width"] == 32).all() and (rs["height"] == 16).all()
    assert all(len(b) == 32 * 16 for b in rs["resized"])


def test_frame_sample_fanout(ray_session):
    import ray.data

    from bionext_ray.ops.multimodal import sample_video_frames
    ds = ray.data.from_arrow(_payload_table())
    frames = sample_video_frames(ds, every_n=2, fake=True,
                                 batch_size=3).to_pandas()
    # fan-out: more frame rows than video rows; frame_idx dense per video
    assert len(frames) > 6
    per_vid = frames.groupby("doc_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per_vid["min"] == 0).all()
    assert (per_vid["max"] + 1 == per_vid["count"]).all()
    # frames are binary and deterministic wrt payload
    assert all(isinstance(b, bytes) and len(b) == 16 for b in frames["frame"])


def test_wav_rejects_truncated_chunk():
    import numpy as np

    from bionext_ray.ops.multimodal import decode_wav, encode_wav
    payload = encode_wav(np.arange(10, dtype=np.int16), 16000)
    with pytest.raises(ValueError):
        decode_wav(payload[:-4])       # truncated data chunk


def test_wav_rejects_short_fmt_chunk():
    import struct

    from bionext_ray.ops.multimodal import decode_wav
    # well-formed RIFF whose fmt chunk body is only 8 bytes (< the 16 the
    # PCM header needs) must raise ValueError, not struct.error
    fmt_body = struct.pack("<HHI", 1, 1, 16000)        # 8 bytes
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body)) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body)
    with pytest.raises(ValueError, match="short fmt chunk"):
        decode_wav(payload)


def test_ahash_invariance_and_discrimination():
    """aHash ignores small noise (1 px) but separates different patterns;
    resize-stability within a couple of bits."""
    import numpy as np

    from bionext_ray.ops.multimodal import ahash_image, encode_bmp

    def pat(base, h=16, w=16, noise=None):
        y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                              indexing="ij")
        # class-dependent checkerboard (structure, not brightness —
        # aHash is deliberately shift-invariant)
        px = 255 * (((x // (1 + base % 4)) + (y // (1 + (base // 4) % 4)))
                    % 2) + 0 * c
        if noise is not None:
            px[0, 0, 0] = noise
        return encode_bmp(px.astype(np.uint8))

    h_a = ahash_image(pat(3))
    h_a_noise = ahash_image(pat(3, noise=250))
    h_b = ahash_image(pat(29))
    pop = lambda x: bin(x).count("1")
    assert pop(h_a ^ h_a_noise) <= 2
    assert pop(h_a ^ h_b) >= 6


def test_image_neardup_pairs_recall(ray_session):
    """Docs sharing a visual class must pair (hamming ~0); cross-class
    pairs must not survive the Hamming gate."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from bionext_ray.ops.multimodal import encode_bmp, image_neardup_pairs

    def pat(base, noise):
        y, x, c = np.meshgrid(np.arange(16), np.arange(16), np.arange(3),
                              indexing="ij")
        px = 255 * (((x // (1 + base)) + (y // (1 + 2 * base))) % 2) + 0 * c
        px[0, 0, 0] = noise
        return encode_bmp(px.astype(np.uint8))

    rows = [(i, pat(i % 3, 17 * i % 251)) for i in range(12)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
    })).repartition(3)
    got = image_neardup_pairs(ds, max_hamming=6).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    same = {(a, b) for a in range(12) for b in range(a + 1, 12)
            if a % 3 == b % 3}
    assert same <= pairs            # full recall within a class
    for a, b in pairs:
        assert a % 3 == b % 3       # no cross-class survivors
