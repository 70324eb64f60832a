"""Randomized brute-force property tests for the session-10
sequential/stateful operators: 200 independently-random users in ONE
dataset, each user's output verified against a straight-line Python
reference — the hypothesis-style complement to the DuckDB oracle gate
(which checks one corpus) and the crafted-edge tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

H = 3_600_000_000  # 1h in us
T0 = np.datetime64("2024-01-01T00:00:00", "us")


def _random_events(tmp_path, seed=7, n_users=200):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(1, n_users + 1):
        n = int(rng.integers(1, 12))
        # hour offsets with duplicates and bursts
        offs = np.sort(rng.integers(0, 200, n))
        for o in offs:
            rows.append((T0 + int(o) * H + int(rng.integers(0, 3)),
                         u, "view", float(rng.integers(0, 5000)) / 100))
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = t.to_pandas()
    df["ts_i"] = df["ts"].astype("datetime64[us]").astype("int64")
    return str(tmp_path), df


def test_throttle_matches_brute_greedy(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_throttle_events

    sf, df = _random_events(tmp_path)
    got = (q_throttle_events(sf).to_pandas()
           .sort_values(["user_id", "keep_rank"]))
    gap = 24 * H
    exp_rows = []
    for u, grp in df.sort_values(["ts_i", "event_id"]).groupby("user_id"):
        last = None
        rank = 0
        for r in grp.itertuples():
            if last is None or r.ts_i >= last + gap:
                last = r.ts_i
                rank += 1
                exp_rows.append((u, r.event_id, rank))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "event_id",
                                          "keep_rank"])
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "keep_rank"]].reset_index(drop=True),
        exp.reset_index(drop=True), check_dtype=False)


def test_ffill_matches_brute(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_events_ffill_daily

    sf, df = _random_events(tmp_path, seed=11)
    got = (q_events_ffill_daily(sf).to_pandas()
           .sort_values(["user_id", "grid_day"]).reset_index(drop=True))
    D = 24 * H
    exp_rows = []
    for u, grp in df.groupby("user_id"):
        grp = grp.sort_values(["ts_i", "event_id"])
        day = grp["ts_i"].to_numpy() // D
        vc = np.round(grp["value"].to_numpy() * 100).astype(np.int64)
        per_day_last = {}
        for d, v in zip(day, vc):
            per_day_last[int(d)] = int(v)  # later rows overwrite
        days = sorted(per_day_last)
        cur = None
        for g in range(days[0], days[-1] + 1):
            if g in per_day_last:
                cur = per_day_last[g]
            exp_rows.append((u, np.datetime64(int(g * D), "us"), cur,
                             int(g in per_day_last)))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "grid_day",
                                          "value_c", "is_observed"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_ohlc_matches_brute(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_events_ohlc_hourly

    sf, df = _random_events(tmp_path, seed=13)
    got = (q_events_ohlc_hourly(sf).to_pandas()
           .sort_values(["user_id", "hour"]).reset_index(drop=True))
    exp_rows = []
    for (u, h), grp in df.assign(h=df["ts_i"] // H).groupby(
            ["user_id", "h"]):
        grp = grp.sort_values(["ts_i", "event_id"])
        vc = np.round(grp["value"].to_numpy() * 100).astype(np.int64)
        exp_rows.append((u, np.datetime64(int(h * H), "us"),
                         int(vc[0]), int(vc.max()), int(vc.min()),
                         int(vc[-1]), len(vc)))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "hour", "open_c",
                                          "high_c", "low_c", "close_c",
                                          "n"]).sort_values(
        ["user_id", "hour"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
