"""Adversarial oracle drive: every text-derived oracle query must stay
hash-identical to DuckDB on a corpus built from the reviewed edge
cases — a 70-member exact-dup cluster (exceeds the old LSH bucket
cap), tab/newline-padded text, an embedded vertical tab (RE2 \\s would
not split it; the explicit class does), an exactly-window-length doc
plus a doc containing it as a window (hash-family boundary), empty and
whitespace-only docs, and sub-threshold-length docs."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

NAMES = ["dedup_simhash", "dedup_simhash_pairs", "dedup_minhash_pairs",
         "dedup_minhash_remove", "dedup_jaccard_exact", "dedup_ngram_pairs",
         "text_langid", "text_token_count", "text_fingerprint",
         "m8_randomizers", "dedup_exact", "dedup_exact_remove",
         # round-4 continuation: corpus-audit family over the same
         # empty/whitespace/dup-cluster edges
         "gopher_rules", "simpson_diversity", "source_cosine_matrix",
         # source-format gates: the embedded \t/\n/\x0b docs exercise
         # JSON escaping and CSV quoted-newline parsing end to end
         "jsonl_roundtrip_stats", "csv_roundtrip_stats",
         # session-6: substring counting over empty/whitespace/dup
         # docs; the gzip gate adds the codec seam on the same edges
         "pattern_match_counts", "gzip_roundtrip_stats"]

BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    rows = [(i, BASE) for i in range(70)]       # giant exact-dup cluster
    rows += [
        (100, "\tthe cat sat on the mat and the dog sat too\n"),
        (101, "the cat sat on the mat and the dog sat too"),
        (102, "one\x0btwo three four five six seven eight nine ten"),
        (103, "one two three four five six seven eight nine ten"),
        (104, "abcde"),                  # exactly one 5-gram window
        (105, "xabcdey abcde trailing"), # contains that window
        (106, ""),
        (107, "  \t\n  "),
        (108, "ab"),
        (109, "el la de que y en un una los por el la de que"),
    ]
    d = tmp_path_factory.mktemp("edge_sf")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        "source": pa.array([f"h{r[0] % 7}" for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{edge_sf}/documents.parquet')")
    return con


@pytest.mark.parametrize("name", NAMES)
def test_edge_corpus_oracle(ray_session, edge_sf, edge_con, name):
    got = entrymod.queries()[name](edge_sf)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = pd.DataFrame(got)
    want = edge_con.execute(entrymod.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
