"""Unit tests for the round-3 relational additions: big-big shuffle join,
anti-join, running (window) aggregate, hopping windows, PII redaction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _ds(d):
    return ray.data.from_arrow(pa.table(d))


def test_shuffle_join_inner_and_left(ray_session):
    from bionext_ray.ops.relational import shuffle_join
    left = _ds({"k": pa.array([1, 2, 2, 3, 5], pa.int64()),
                "lv": pa.array([10, 20, 21, 30, 50], pa.int64())})
    right = _ds({"rk": pa.array([1, 2, 4], pa.int64()),
                 "rv": pa.array(["a", "b", "d"], pa.string())})

    inner = shuffle_join(left, right, on=("k", "rk"), left_cols=["lv"],
                         right_cols=["rv"]).to_pandas()
    inner = inner.sort_values(["k", "lv"]).reset_index(drop=True)
    assert inner["k"].tolist() == [1, 2, 2]
    assert inner["lv"].tolist() == [10, 20, 21]
    assert inner["rv"].tolist() == ["a", "b", "b"]

    lj = shuffle_join(left, right, on=("k", "rk"), left_cols=["lv"],
                      right_cols=["rv"], how="left").to_pandas()
    lj = lj.sort_values(["k", "lv"]).reset_index(drop=True)
    assert lj["k"].tolist() == [1, 2, 2, 3, 5]
    assert lj["rv"].tolist()[:3] == ["a", "b", "b"]
    assert lj["rv"].isna().tolist() == [False, False, False, True, True]


def test_shuffle_join_matches_pandas_merge(ray_session):
    """Randomized cross-check vs pandas merge (the single-node oracle)."""
    from bionext_ray.ops.relational import shuffle_join
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 50, 500)
    rk = rng.integers(0, 60, 80)
    left = _ds({"k": pa.array(lk, pa.int64()),
                "lv": pa.array(np.arange(500), pa.int64())})
    right = _ds({"k": pa.array(rk, pa.int64()),
                 "rv": pa.array(np.arange(80) * 7, pa.int64())})
    got = (shuffle_join(left, right, "k", ["lv"], ["rv"])
           .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    want = (pd.DataFrame({"k": lk, "lv": np.arange(500)})
            .merge(pd.DataFrame({"k": rk, "rv": np.arange(80) * 7}), on="k")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_shuffle_join_string_key(ray_session):
    from bionext_ray.ops.relational import shuffle_join
    left = _ds({"k": pa.array(["x", "y", "z"], pa.string()),
                "lv": pa.array([1, 2, 3], pa.int64())})
    right = _ds({"k": pa.array(["y", "z", "w"], pa.string()),
                 "rv": pa.array([20, 30, 40], pa.int64())})
    out = (shuffle_join(left, right, "k", ["lv"], ["rv"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == ["y", "z"]
    assert out["rv"].tolist() == [20, 30]


def test_anti_join_filter(ray_session):
    from bionext_ray.ops.relational import anti_join_filter
    big = _ds({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
               "v": pa.array(list("abcde"), pa.string())})
    out = anti_join_filter(big, {2, 4, 9}, "k").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 3, 5]


def test_running_agg_matches_pandas(ray_session):
    from bionext_ray.ops.relational import running_agg
    rng = np.random.default_rng(3)
    n = 400
    key = rng.integers(0, 20, n)
    order = rng.permutation(n)          # unique tiebreaker
    val = rng.integers(-5, 10, n)
    ds = _ds({"key": pa.array(key, pa.int64()),
              "ord": pa.array(order, pa.int64()),
              "val": pa.array(val, pa.int64())})
    got = (running_agg(ds, "key", ["ord"], "val", "run",
                       row_number_alias="rn")
           .to_pandas().sort_values(["key", "ord"]).reset_index(drop=True))
    df = (pd.DataFrame({"key": key, "ord": order, "val": val})
          .sort_values(["key", "ord"]).reset_index(drop=True))
    df["run"] = df.groupby("key")["val"].cumsum()
    df["rn"] = df.groupby("key").cumcount() + 1
    pd.testing.assert_frame_equal(
        got[["key", "ord", "val", "run", "rn"]],
        df.astype({"rn": got["rn"].dtype}))


def test_hopping_window_membership(ray_session):
    """Each event must appear in exactly width/hop windows, and each of its
    windows must contain the event's timestamp."""
    from bionext_ray.ops.relational import hopping_window
    ts = pa.array(np.array([0, 10, 900, 3599, 3600], dtype="int64")
                  * 1_000_000).cast(pa.timestamp("us"))
    ds = _ds({"k": pa.array(["a"] * 5, pa.string()), "ts": ts,
              "one": pa.array([1] * 5, pa.int64())})
    out = hopping_window(ds, "k", "ts", width_s=3600, hop_s=900,
                         specs=[("one", "sum", "n")]).to_pandas()
    # total memberships = 5 events x 4 windows each
    assert out["n"].sum() == 20
    # the t=0 event: windows starting at 0, -900, -1800, -2700 seconds
    starts = sorted(out[out["n"] > 0]["window_start"])
    assert starts[0] == -2700 * 1_000_000


def test_redact_pii_batch():
    from bionext_ray.ops.textstats import redact_pii_batch
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at jo.doe+x@example.org or call 1234567 now",
            "no pii here, just 12345 (too short)",
            None,
        ], pa.string()),
    })
    out = redact_pii_batch(batch)
    assert out["clean_text"].to_pylist() == [
        "mail me at <EMAIL> or call <NUM> now",
        "no pii here, just 12345 (too short)",
        "",
    ]
    assert out["n_emails"].to_pylist() == [1, 0, 0]
    assert out["n_longnums"].to_pylist() == [1, 0, 0]
