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


TEXTSTATS_QUERIES = ["token_count", "bpe_token_count", "lang_id", "quality",
                     "fingerprint", "term_counts", "top_docs_per_lang",
                     "repetition_stats", "chunk_dedup"]


def test_degenerate_documents_vs_oracle(ray_session, tmp_path):
    """Engine and SQL oracle must agree on empty-string and NULL documents —
    the zero-safe contract (engine emits 0/'', never NULL, for token-free
    text) holds on both sides."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = pq.read_table(f"{SF_DIR}/documents.parquet")
    extra = pa.table({
        "doc_id": pa.array([900001, 900002, 900003], pa.int64()),
        "text": pa.array(["", None, "   "], pa.string()),
        "lang": pa.array(["en", "de", "en"], pa.string()),
        "source": pa.array(["synthetic"] * 3, pa.string()),
        "n_chars": pa.array([0, 0, 3], pa.int64()),
    })
    mixed = pa.concat_tables([base.select(extra.column_names), extra])
    pq.write_table(mixed, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in TEXTSTATS_QUERIES:
        got = _normalize(_to_df(qs[name](str(tmp_path))))
        want = _normalize(con.sql(oracles[name]).df())
        assert len(got) == len(want), (name, len(got), len(want))
        mismatch = (got != want).any(axis=1)
        assert not mismatch.any(), (
            name, got[mismatch].head(3), want[mismatch].head(3))
    con.close()


def test_entry_smoke(ray_session):
    df = entrymod.entry()
    assert len(df) >= 0 and "subj" in df.columns
