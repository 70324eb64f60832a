"""Local mirror of the driver's correctness gate: every queries()
entry with an oracle_sql() twin must match DuckDB on the same parquet
(row count + schema + values), at sf0.001 for speed (the driver runs
sf0.01)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            if df[c].abs().max() < 1e9:  # scaling in round() is lossy above
                df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


_QUERIES = entrymod.queries()
_SQLS = entrymod.oracle_sql()
_CHECKED = sorted(set(_QUERIES) & set(_SQLS))
_ROWS_ONLY = sorted(set(_QUERIES) - set(_SQLS))


def _run(name):
    res = _QUERIES[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return pd.DataFrame(res)


@pytest.mark.parametrize("name", _CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    got = _norm(_run(name))
    want = _norm(con.execute(_SQLS[name]).fetchdf())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(ray_session, name):
    got = _run(name)
    assert isinstance(got, pd.DataFrame)
    assert len(got.columns) > 0
