#!/usr/bin/env python
"""Deterministic synthetic table-set generator, schema-identical to the
driver testdata (TESTDATA.md), for scale levels the driver does not
ship (the sf1 stretch gate — VERDICT r02 item 9).

Values are NOT the driver generator's values and don't need to be: the
sf1 gate compares the Ray engine against DuckDB on the SAME generated
parquet, so correctness is self-contained. What matters is schema
equality and that the value distributions exercise every oracle
query's filters (date windows, segments, priorities, discount bands,
stopword languages, CJK detection, JSON props).

Usage: python tools/make_sf.py <out_dir> <scale>   # scale 1.0 == sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
PWORDS1 = ["small", "red", "big", "blue", "green", "round", "flat", "heavy"]
PWORDS2 = ["ring", "widget", "gear", "bolt", "panel", "tube", "cap", "disk"]
LANG_WORDS = {
    "en": "the a of and to in is it that for table row query data scan".split(),
    "es": "el la de que y en un una los por mesa fila datos".split(),
    "de": "der die das und ist von mit den ein zu tabelle zeile".split(),
    "fr": "le la de et les des un une est dans table ligne".split(),
    # romanized, matching the driver corpus (pure ASCII — checked):
    # the engine's text stack documents an ASCII tokenization contract
    # (stages/text.py) and the byte-level SQL hash mirrors
    # (simhash/fingerprint) rely on char==byte; langid's actual CJK
    # short-circuit is pinned by tests/test_text_and_search.py
    "zh": "shuju biao hang chaxun saomiao paixu neirong wendang".split(),
}


def _ts(rng, n, lo, hi):
    """Random timestamp[us] column in [lo, hi) (numpy datetime64 strings)."""
    lo64 = np.datetime64(lo, "us").astype(np.int64)
    hi64 = np.datetime64(hi, "us").astype(np.int64)
    return rng.integers(lo64, hi64, size=n).astype("datetime64[us]")


def _day_ts(rng, n, lo, hi):
    """Random midnight-aligned timestamp[us] (the driver's date columns
    are day-resolution)."""
    lo_d = np.datetime64(lo, "D").astype(np.int64)
    hi_d = np.datetime64(hi, "D").astype(np.int64)
    days = rng.integers(lo_d, hi_d, size=n).astype("datetime64[D]")
    return days.astype("datetime64[us]")


def make_tables(out_dir: str, scale: float, seed: int = 7) -> dict[str, int]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    counts = {
        "region": 5, "nation": 25,
        "customer": int(150_000 * scale), "supplier": int(10_000 * scale),
        "part": int(200_000 * scale), "orders": int(1_500_000 * scale),
        "lineitem": int(6_000_000 * scale), "events": int(1_000_000 * scale),
        "documents": int(50_000 * scale), "embeddings": int(20_000 * scale),
    }

    def write(name, table):
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                       row_group_size=1 << 20)

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS)}))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    n = counts["customer"]
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n)])}))

    n = counts["supplier"]
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n), 2))}))

    n = counts["part"]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array([f"{PWORDS1[i % 8]} {PWORDS2[(i // 8) % 8]}"
                            for i in range(n)]),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(1, 26, n)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n)]),
        "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2100, n), 2))}))

    n = counts["orders"]
    n_cust = counts["customer"]
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.choice(3, n, p=[0.48, 0.48, 0.04])]),
        "o_totalprice": pa.array(np.round(rng.uniform(800, 500_000, n), 2)),
        "o_orderdate": pa.array(_day_ts(rng, n, "1995-01-01", "2001-09-01")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n)])}))

    n = counts["lineitem"]
    n_ord = counts["orders"]
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, counts["part"], n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, counts["supplier"], n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105_000, n), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(RETFLAGS)[rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(np.array(LINESTATUS)[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(_day_ts(rng, n, "1995-01-02", "2001-12-01"))}))

    n = counts["events"]
    write("events", pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(np.sort(_ts(rng, n, "2024-01-01", "2024-01-31"))),
        "user_id": pa.array(rng.integers(0, max(1, n // 20), n), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0.01, 490, n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)])}))

    n = counts["documents"]
    langs = np.array(["en", "es", "de", "fr", "zh"])[
        rng.choice(5, n, p=[0.4, 0.15, 0.15, 0.15, 0.15])]
    texts = []
    for i in range(n):
        lw = LANG_WORDS[langs[i]]
        k = int(rng.integers(20, 80))
        words = [lw[j] for j in rng.integers(0, len(lw), k)]
        if rng.random() < 0.05 and i > 0:     # exact dups for dedup gates
            texts.append(texts[-1])
        else:
            texts.append(" ".join(words))
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 64, n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    n = counts["embeddings"]
    mat = rng.standard_normal((n, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32))}))
    return counts


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    counts = make_tables(out, scale)
    print({"out": out, "scale": scale, **counts})
