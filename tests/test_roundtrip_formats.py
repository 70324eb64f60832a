"""Hostile-string drive of the JSONL/CSV source-format gates: the
synthetic corpus is plain ASCII word salad, so this corpus supplies
what the format parsers actually choke on — embedded quotes, commas,
backslashes, CR/LF, JSON-special characters and non-ASCII text — and
requires the round-trip stats to stay hash-identical to DuckDB over
the original parquet."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

HOSTILE = [
    'plain words here',
    'comma, separated, values, inside',
    'a "quoted" phrase and ""doubled"" quotes',
    "single 'quotes' too",
    'back\\slash and \\n literal escape',
    'embedded\nnewline line two',
    'tab\tseparated\tfields',
    'trailing comma,',
    ',leading comma',
    'quote at end "',
    '" quote at start',
    'json specials { } [ ] : null true false',
    'unicode café naïve 中文 ☃',
    'mixed, "all\nof\tit" \\ together',
    '',
    '   ',
]


@pytest.fixture(scope="module")
def hostile_sf(tmp_path_factory):
    rows = [(i, t) for i, t in enumerate(HOSTILE)]
    d = tmp_path_factory.mktemp("hostile_sf")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([f"s{r[0] % 3}" for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def hostile_con(hostile_sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{hostile_sf}/documents.parquet')")
    return con


@pytest.mark.parametrize("name", ["jsonl_roundtrip_stats",
                                  "gzip_roundtrip_stats",
                                  "csv_roundtrip_stats",
                                  "warc_roundtrip_stats",
                                  "ipc_roundtrip_stats"])
def test_roundtrip_survives_hostile_strings(ray_session, hostile_sf,
                                            hostile_con, name):
    got = entrymod.queries()[name](hostile_sf)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = hostile_con.execute(entrymod.oracle_sql()[name]).fetchdf()
    got = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
