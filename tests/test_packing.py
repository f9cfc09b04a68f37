"""Sequence-packing placement vs plain-Python references (ops/packing.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _docs(ids, lens):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(lens, pa.int64())}))


def test_pack_concat_chunks_matches_pandas(ray_session):
    from bionext_ray.ops.packing import pack_concat_chunks
    rng = np.random.default_rng(9)
    ids = rng.permutation(400).tolist()
    lens = rng.integers(0, 300, 400).tolist()
    got = (pack_concat_chunks(_docs(ids, lens), chunk_tokens=256,
                              n_shards=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    df = pd.DataFrame({"doc_id": ids, "n_tokens": lens})
    df["shard"] = df["doc_id"] % 8
    df = df.sort_values(["shard", "doc_id"])
    df["start_offset"] = (df.groupby("shard")["n_tokens"].cumsum()
                          - df["n_tokens"])
    df["chunk_id"] = df["start_offset"] // 256
    want = (df[["doc_id", "shard", "start_offset", "chunk_id"]]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def _nextfit_ref(ids, lens, cap, n_shards):
    rows = sorted(zip(ids, lens))
    out = {}
    state = {}                     # shard -> (open bin id, used tokens)
    for i, n in rows:
        sh = i % n_shards
        b, used = state.get(sh, (0, 0))
        if used and used + n > cap:
            b, used = b + 1, 0
        out[i] = b
        state[sh] = (b, used + n)
    return out


def test_pack_bins_nextfit_matches_reference(ray_session):
    from bionext_ray.ops.packing import pack_bins_nextfit
    rng = np.random.default_rng(4)
    ids = rng.permutation(300).tolist()
    # include oversize docs (> cap) and zero-length docs
    lens = rng.integers(0, 400, 300).tolist()
    got = (pack_bins_nextfit(_docs(ids, lens), chunk_tokens=256,
                             n_shards=4).to_pandas())
    want = _nextfit_ref(ids, lens, 256, 4)
    assert dict(zip(got["doc_id"], got["bin_id"])) == want
    lens_by_id = dict(zip(ids, lens))
    for _, r in got.iterrows():
        assert bool(r["oversize"]) == (lens_by_id[r["doc_id"]] > 256)


def test_pack_bins_oversize_doc_gets_own_bin(ray_session):
    from bionext_ray.ops.packing import pack_bins_nextfit
    got = (pack_bins_nextfit(_docs([0, 4, 8], [10, 999, 10]),
                             chunk_tokens=100, n_shards=1)
           .to_pandas().sort_values("doc_id"))
    assert got["bin_id"].tolist() == [0, 1, 2]
    assert got["oversize"].tolist() == [False, True, False]
