"""Driver-style correctness gate: run every queries() entry at sf0.001 and
compare row count + order-insensitive values against oracle_sql() via DuckDB
(columns sorted by name, rows sorted, exact value equality)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_vs_oracle(ray_session, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _normalize(_to_df(q(SF_DIR)))
    con = _duck(SF_DIR)
    want = _normalize(con.sql(sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    mismatch = (got != want).any(axis=1)
    assert not mismatch.any(), (
        name, got[mismatch].head(3), want[mismatch].head(3))


def test_rows_only_queries(ray_session):
    """Queries without SQL oracles must at least run and return rows with a
    stable schema."""
    qs = entrymod.queries()
    no_oracle = set(qs) - set(entrymod.oracle_sql())
    for name in sorted(no_oracle):
        df = _to_df(qs[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(ray_session):
    df = entrymod.entry()
    assert len(df) >= 0 and "subj" in df.columns
