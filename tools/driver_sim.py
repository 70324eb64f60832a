#!/usr/bin/env python
"""Simulate the driver's correctness grading EXACTLY (r04 verdict
item 1): a fresh process that

  1. calls ``ray.init(address="local", num_cpus=32)`` BEFORE importing
     ``__ray_entry__`` (the driver's order),
  2. smoke-runs ``entry()``,
  3. grades the FIRST ``--window`` (default 50) ``queries()`` dict
     entries against their ``oracle_sql()`` twins on the driver
     parquet (default /root/testdata/sf0.01) with the driver's
     row-count + schema + value-hash contract (columns sorted by
     name, rows sorted, values rendered to strings before hashing),

while bounding and RECORDING per-query wall time and driver RSS — the
two silent killers that could plausibly explain r04's empty
``CORRECTNESS_r04.json`` (the bench step in the same round ran clean,
so the grading process died environmentally, not on query logic).

Writes a CORRECTNESS_r*-shaped JSON to ``--out``
(default /tmp/driver_sim_correctness.json) plus a timing sidecar, and
exits non-zero on any mismatch, per-query budget overrun, or RSS
ceiling breach so it can gate commits.

Usage:
  python tools/driver_sim.py [--sf DIR] [--window N] [--budget SEC]
                             [--rss-mb MB] [--out PATH]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def norm(df):
    import pandas as pd
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df) -> str:
    import pandas as pd
    return hashlib.md5(pd.util.hash_pandas_object(
        df.astype(str), index=False).values.tobytes()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--budget", type=float, default=60.0,
                    help="per-query wall-time budget (sec)")
    ap.add_argument("--rss-mb", type=float, default=8192.0,
                    help="driver RSS ceiling (MiB)")
    ap.add_argument("--out", default="/tmp/driver_sim_correctness.json")
    args = ap.parse_args()

    t0 = time.monotonic()
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd
    import __ray_entry__ as em

    # driver step 1: entry() smoke
    te = time.monotonic()
    ent = em.entry()
    ent_df = ent.to_pandas() if hasattr(ent, "to_pandas") else pd.DataFrame(ent)
    entry_sec = time.monotonic() - te
    print(f"entry(): {len(ent_df)} rows, {entry_sec:.2f}s, rss {rss_mb():.0f} MiB",
          flush=True)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf.rstrip('/')}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = em.queries(), em.oracle_sql()
    window = list(qs)[:args.window]
    results: dict[str, dict] = {}
    timing: dict[str, dict] = {}
    violations: list[str] = []
    for i, name in enumerate(window):
        tq = time.monotonic()
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            res = qs[name](args.sf)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            got = norm(pd.DataFrame(res))
            row["spark_rows"] = int(len(got))
            if name in sqls:
                want = norm(con.execute(sqls[name]).fetchdf())
                row["oracle_rows"] = int(len(want))
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = list(got.columns) == list(want.columns)
                row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                     and value_hash(got) == value_hash(want))
            else:
                # rows-only contract: ran, returned a stable schema
                row["rows_match"] = row["schema_match"] = True
                row["hash_match"] = len(got.columns) > 0
                row["err"] = "rows_only"
        except Exception as exc:  # a raising query must not kill the window
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        dt = time.monotonic() - tq
        m = rss_mb()
        timing[name] = {"sec": round(dt, 3), "rss_mb": round(m, 1)}
        ok = row["hash_match"] and not (row["err"] and row["err"] != "rows_only")
        if not ok:
            violations.append(f"{name}: FAIL {row['err'] or 'hash/schema/rows'}")
        if dt > args.budget:
            violations.append(f"{name}: over budget {dt:.1f}s > {args.budget}s")
        if m > args.rss_mb:
            violations.append(f"{name}: rss {m:.0f} MiB > {args.rss_mb}")
        results[name] = row
        print(f"[{i + 1:2d}/{len(window)}] {name}: "
              f"{'OK' if ok else 'FAIL'} rows={row['spark_rows']} "
              f"{dt:6.2f}s rss={m:.0f}MiB"
              f"{' ROWS_ONLY' if row['err'] == 'rows_only' else ''}",
              flush=True)

    total = time.monotonic() - t0
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    with open(args.out.replace(".json", "_timing.json"), "w") as f:
        json.dump({"entry_sec": round(entry_sec, 2),
                   "total_sec": round(total, 2),
                   "window": len(window),
                   "violations": violations,
                   "per_query": timing}, f, indent=1)
    n_ok = sum(1 for r in results.values()
               if r["hash_match"] and (not r["err"] or r["err"] == "rows_only"))
    print(json.dumps({"metric": "driver_sim", "sf": args.sf,
                      "window": len(window), "green": n_ok,
                      "total_sec": round(total, 1),
                      "violations": violations}), flush=True)
    ray.shutdown()
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
