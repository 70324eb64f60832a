"""Crafted-case tests for the round-3 session-9 operators: exact
heavy hitters (local-candidate lemma + exact verify), grouped MODE
with deterministic tie-break, and INTERSECT / EXCEPT set ops. The
parametrized oracle mirror (test_queries_oracle) hash-checks them
against DuckDB; these pin the SEMANTICS on crafted edges."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_heavy_hitters_threshold_boundary(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import \
        q_heavy_hitter_tokens

    # counts: a=50, b=2, z=1; total=53. With phi_recip=31 the bar is
    # n*31 >= 53 -> n >= 2 (2*31=62): a and b pass (b exactly at the
    # >= boundary), z fails. z IS a local candidate (single tiny
    # batch) -- the exact pass must remove it.
    text = " ".join(["a"] * 50 + ["b"] * 2 + ["z"])
    d = _write_docs(tmp_path, [(text, "s1", len(text))])
    out = q_heavy_hitter_tokens(d)
    assert list(out["token"]) == ["a", "b"]
    assert list(out["n"]) == [50, 2]


def test_mode_tie_breaks_to_smallest_value(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_mode_chars_per_source

    # s1: n_chars 10 x2 and 20 x2 tie -> mode must be 10 (value asc);
    # s2: clear mode 7 x3 over 9 x1
    rows = [("t", "s1", 10), ("t", "s1", 10),
            ("t", "s1", 20), ("t", "s1", 20),
            ("t", "s2", 7), ("t", "s2", 7), ("t", "s2", 7),
            ("t", "s2", 9)]
    out = q_mode_chars_per_source(_write_docs(tmp_path, rows)) \
        .set_index("source")
    assert out.loc["s1", "mode_chars"] == 10
    assert out.loc["s1", "n_mode"] == 2
    assert out.loc["s2", "mode_chars"] == 7
    assert out.loc["s2", "n_mode"] == 3


def test_set_ops_users(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import (
        q_except_users, q_intersect_users)

    HI, LO = 96.0, 10.0  # bar is value_cents > 9500
    rows = [
        (100, 1, "click", HI), (200, 1, "purchase", HI),   # intersect
        (100, 2, "click", HI), (200, 2, "purchase", LO),   # except
        (100, 3, "purchase", HI),                          # neither
        (100, 4, "click", LO),                             # neither
        (100, 5, "click", 95.0),                           # 9500 !> 9500
        (100, 6, "click", HI), (150, 6, "click", HI),      # dup-safe
        (200, 6, "purchase", HI),
    ]
    d = _write_events(tmp_path, rows)
    assert list(q_intersect_users(d)["user_id"]) == [1, 6]
    assert list(q_except_users(d)["user_id"]) == [2]


def test_set_ops_empty_result(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_intersect_users

    rows = [(100, 1, "click", 96.0)]
    out = q_intersect_users(_write_events(tmp_path, rows))
    assert len(out) == 0 and list(out.columns) == ["user_id"]


def test_covar_stats_exact(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_covar_qty_discount

    t = pa.table({
        "l_returnflag": pa.array(["A", "A", "R"], pa.string()),
        "l_quantity": pa.array([2.0, 3.0, 5.0], pa.float64()),
        "l_discount": pa.array([0.01, 0.10, 0.05], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = q_covar_qty_discount(str(tmp_path)).set_index("l_returnflag")
    # A: q=(2,3) d_e2=(1,10) -> n=2 sq=5 sd=11 sqq=13 sdd=101 sqd=32
    assert out.loc["A"].tolist() == [2, 5, 11, 13, 101, 32]
    assert out.loc["R"].tolist() == [1, 5, 5, 25, 25, 25]


def test_conversion_lag_min_merge(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_conversion_lag

    rows = [
        (100, 1, "view", 0.0), (300, 1, "purchase", 0.0),   # +200
        (50, 2, "purchase", 0.0), (100, 2, "view", 0.0),    # -50
        (100, 3, "view", 0.0),                              # absent
        (100, 4, "purchase", 0.0),                          # absent
        (150, 5, "view", 0.0), (50, 5, "view", 0.0),        # min view 50
        (400, 5, "purchase", 0.0), (200, 5, "purchase", 0.0),  # +150
        (100, 6, "click", 0.0),                             # absent
    ]
    out = q_conversion_lag(_write_events(tmp_path, rows)) \
        .set_index("user_id")
    assert out.index.tolist() == [1, 2, 5]
    assert out["lag_us"].tolist() == [200, -50, 150]


def test_weighted_median_lower_convention(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_weighted_median_chars

    # s1: lengths 1x5 (w=5) and 10x1 (w=10) -> tot=15, cum(1)=5
    # (2*5<15), cum(10)=15 (2*15>=15) -> wmedian 10, though the
    # UNweighted median of (1,1,1,1,1,10) is 1
    rows = [("t", "s1", 1)] * 5 + [("t", "s1", 10)]
    # s2: exact midpoint pick -- lengths 3 (w=3) and 3x1? use 2,2,4:
    # w(2)=4, w(4)=4, tot=8; cum(2)=4, 2*4>=8 -> wmedian 2 (lower)
    rows += [("t", "s2", 2), ("t", "s2", 2), ("t", "s2", 4)]
    out = q_weighted_median_chars(_write_docs(tmp_path, rows)) \
        .set_index("source")
    assert out.loc["s1", "wmedian_chars"] == 10
    assert out.loc["s2", "wmedian_chars"] == 2


def test_trailing_range_window(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_trailing_window_value

    H = 3_600_000_000  # 1h in us
    rows = [
        (0, 1, "view", 1.0),            # frame: {0} -> 100
        (H, 1, "view", 2.0),            # [0, H]: both -> 300
        (2 * H + 1, 1, "view", 4.0),    # [H+1, 2H+1]: only self -> 400
        (2 * H + 1, 1, "view", 8.0),    # equal-ts PEER: both 4+8 -> 1200
        (0, 2, "view", 16.0),           # other user isolated -> 1600
    ]
    out = q_trailing_window_value(_write_events(tmp_path, rows))
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert df["trailing_sum_c"].tolist() == [100, 300, 1200, 1200, 1600]
    assert df["n_in_range"].tolist() == [1, 2, 2, 2, 1]


def test_source_vocab_overlap_exact(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import \
        q_source_vocab_overlap

    rows = [
        ("a b c", "s1", 5), ("b c", "s1", 3),   # s1 vocab {a,b,c}
        ("b c d", "s2", 5),                     # s2 vocab {b,c,d}
        ("x", "s3", 1),                         # s3 disjoint
    ]
    out = q_source_vocab_overlap(_write_docs(tmp_path, rows))
    out = out.set_index(["src_a", "src_b"])
    assert out.loc[("s1", "s2"), "n_common"] == 2   # {b, c}
    assert out.loc[("s1", "s2"), "n_a"] == 3
    assert out.loc[("s1", "s2"), "n_b"] == 3
    # disjoint pairs are absent, matching the SQL inner-join twin
    assert ("s1", "s3") not in out.index
    assert len(out) == 1


def test_bloom_semi_join_exact_and_superset(ray_session, tmp_path):
    import ray.data as rd
    from crawling_infrastructure_ray.stages.joins import bloom_semi_join

    data = rd.from_items(
        [{"k": i, "payload": i * 10} for i in range(2000)])
    keys = rd.from_items([{"k": i} for i in range(0, 2000, 7)])
    out = bloom_semi_join(data, keys, on="k").to_pandas()
    # exact: precisely the multiples of 7, no bloom false positives
    # survive the exact stage
    assert sorted(out["k"]) == list(range(0, 2000, 7))
    assert (out.set_index("k")["payload"] ==
            out.set_index("k").index * 10).all()


def test_bloom_semi_join_tiny_filter_still_exact(ray_session):
    # undersized bitmap -> high FPP; the exact stage must still
    # remove every false positive
    import ray.data as rd
    from crawling_infrastructure_ray.stages.joins import bloom_semi_join

    data = rd.from_items([{"k": i} for i in range(500)])
    keys = rd.from_items([{"k": 3}, {"k": 497}])
    out = bloom_semi_join(data, keys, on="k", nbits=64).to_pandas()
    assert sorted(out["k"]) == [3, 497]


def test_winsorize_clip_bounds(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_winsorize_value

    # 20 'view' values 1..20 cents-> p05 = ceil(0.05*20)-1 = idx 0 ->
    # 1c... use dollars: v=k -> v_c=100k. p05 idx 0 -> 100, p95 idx
    # ceil(19)-1=18 -> 1900. Values clip to [100, 1900].
    rows = [(i, 1, "view", float(i + 1)) for i in range(20)]
    out = q_winsorize_value(_write_events(tmp_path, rows)).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    assert out["value_clip_c"].iloc[0] == 100
    assert out["value_clip_c"].iloc[18] == 1900
    assert out["value_clip_c"].iloc[19] == 1900  # 2000 clipped down
    assert out["value_clip_c"].iloc[5] == 600    # interior untouched


def test_host_bfs_depth_levels(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import \
        q_host_bfs_depth

    # Construct sources so the derived edge step is known: with S
    # sources, doc with source index i links to (i + 4*(1+h%8)) % S.
    # Rather than predict h, assert structural invariants: root depth
    # 0 at min(source); every reached node's depth equals 1 + min
    # depth among its undirected neighbors on the derived edge set.
    rows = [(f"d{i}", f"s{i % 7:02d}", 3) for i in range(40)]
    rows = [(t, s, n) for (t, s, n) in rows]
    out = q_host_bfs_depth(_write_docs(tmp_path, rows))
    assert out.loc[out["depth"] == 0, "source"].tolist() == ["s00"]
    assert (out["depth"] >= 0).all()
    # depths are contiguous levels: no gaps in the sorted unique set
    ds_ = sorted(out["depth"].unique())
    assert ds_ == list(range(len(ds_)))


def test_sessionize_gap_boundaries(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_sessionize_events

    H = 3_600_000_000  # 1h in us
    # user 1: events at 0h, 1h, 20h, 21h -> two 2-event sessions
    # (8h threshold); user 2: 0h, 9h, 18h -> gaps exactly 9h > 8h
    # each -> three 1-event sessions; user 3: 0h, 8h -> gap == 8h
    # is NOT > threshold -> one session
    rows = [(0, 1, "v", 0.0), (1 * H, 1, "v", 0.0),
            (20 * H, 1, "v", 0.0), (21 * H, 1, "v", 0.0),
            (0, 2, "v", 0.0), (9 * H, 2, "v", 0.0),
            (18 * H, 2, "v", 0.0),
            (0, 3, "v", 0.0), (8 * H, 3, "v", 0.0)]
    out = q_sessionize_events(_write_events(tmp_path, rows))
    got = {(r.user_id, r.session_id): (r.n_events, r.start_us, r.end_us)
           for r in out.itertuples()}
    assert got == {
        (1, 0): (2, 0, 1 * H), (1, 1): (2, 20 * H, 21 * H),
        (2, 0): (1, 0, 0), (2, 1): (1, 9 * H, 9 * H),
        (2, 2): (1, 18 * H, 18 * H),
        (3, 0): (2, 0, 8 * H)}


def test_snapshot_diff_classification(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_snapshot_diff

    # deterministic edit rule: %7==0 removed, survivors %5==0 changed
    # (+17), %11==0 spawns added at id+10M (+3 chars). ids 0..10:
    #  0: %7 & %11 -> removed + added(10000000)
    #  5: %5 -> changed 105->122 ; 7: %7 -> removed
    #  10: %5 -> changed 110->127 ; others unchanged (dropped)
    rows = [("x" * (100 + i), "s", 100 + i) for i in range(11)]
    out = q_snapshot_diff(_write_docs(tmp_path, rows))
    got = {(r.doc_id, r.change): (r.old_chars, r.new_chars)
           for r in out.itertuples()}
    assert got == {
        (0, "removed"): (100, -1),
        (7, "removed"): (107, -1),
        (5, "changed"): (105, 122),
        (10, "changed"): (110, 127),
        (10000000, "added"): (-1, 103)}


def test_zorder_interleave_golden(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_zorder_layout

    # doc_id 0, n_chars 3 (=0b11) -> zkey 0b0101 = 5, shard 0;
    # doc_id 1023 (y=0b1111111111), n_chars 1023 -> zkey 2^20-1,
    # shard (2^20-1)>>16 = 15. Interleave golden: x bits at even
    # positions, y bits at odd.
    rows = [("aaa", "s", 3)] + [("b", "s", 1023)]
    sf = _write_docs(tmp_path, rows)
    # overwrite doc_id of the second row to 1023 for the y-bit case
    import pyarrow.parquet as pq
    t = pq.read_table(sf + "/documents.parquet")
    t = t.set_column(0, "doc_id", pa.array([0, 1023], pa.int64()))
    pq.write_table(t, sf + "/documents.parquet")
    out = q_zorder_layout(sf)
    by_shard = {r.shard: r for r in out.itertuples()}
    assert set(by_shard) == {0, 15}
    assert by_shard[0].min_zkey == 5 and by_shard[0].max_zkey == 5
    assert by_shard[15].min_zkey == (1 << 20) - 1
    assert by_shard[0].min_chars == 3 and by_shard[15].max_chars == 1023


def test_q12_priority_classes(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import q_q12_shipmode

    # orders: 1 high (1-URGENT), 2 high (2-HIGH), 3 low (5-LOW);
    # lineitem: order 1 -> 2 'F' lines in-window + 1 out-of-window,
    # order 2 -> 1 'O' line, order 3 -> 1 'F' + 1 'O' line.
    # Expect F: high 2 / low 1 ; O: high 1 / low 1.
    d_in = np.datetime64("1995-06-01T00:00:00", "us")
    d_out = np.datetime64("1997-06-01T00:00:00", "us")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F"]),
        "o_totalprice": pa.array([1.0, 1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array([d_in] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "5-LOW"])})
    li_rows = [(1, "F", d_in), (1, "F", d_in), (1, "F", d_out),
               (2, "O", d_in), (3, "F", d_in), (3, "O", d_in)]
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([1] * 6, pa.int64()),
        "l_suppkey": pa.array([1] * 6, pa.int64()),
        "l_linenumber": pa.array(range(6), pa.int32()),
        "l_quantity": pa.array([1.0] * 6, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 6, pa.float64()),
        "l_discount": pa.array([0.0] * 6, pa.float64()),
        "l_tax": pa.array([0.0] * 6, pa.float64()),
        "l_returnflag": pa.array(["N"] * 6),
        "l_linestatus": pa.array([r[1] for r in li_rows]),
        "l_shipdate": pa.array([r[2] for r in li_rows], pa.timestamp("us"))})
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
    out = q_q12_shipmode(str(tmp_path))
    got = {r.l_linestatus: (r.high_line_count, r.low_line_count)
           for r in out.itertuples()}
    assert got == {"F": (2, 1), "O": (1, 1)}


def test_ntile_fill_rule(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import q_part_ntile

    # brand A: 6 rows, k=4 -> sizes 2,2,1,1 (first n%k tiles get the
    # extra row); brand B: 2 rows < k -> tiles 1,2 (zero-size tails).
    # Price ties inside brand A (rows 2,3 equal) break by partkey.
    prices = {"A": [10.0, 10.0, 10.0, 20.0, 30.0, 40.0], "B": [5.0, 6.0]}
    rows = [(b, p) for b in ("A", "B") for p in prices[b]]
    t = pa.table({
        "p_partkey": pa.array(range(len(rows)), pa.int64()),
        "p_name": pa.array(["x"] * len(rows)),
        "p_brand": pa.array([r[0] for r in rows]),
        "p_type": pa.array(["T"] * len(rows)),
        "p_size": pa.array([1] * len(rows), pa.int32()),
        "p_retailprice": pa.array([r[1] for r in rows], pa.float64())})
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_part_ntile(str(tmp_path))
    tiles = {r.p_partkey: r.tile for r in out.itertuples()}
    # brand A order = partkeys 0..5 (price asc, key tiebreak)
    assert [tiles[i] for i in range(6)] == [1, 1, 2, 2, 3, 4]
    assert [tiles[i] for i in (6, 7)] == [1, 2]


def test_search_phrase_boundaries(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_search_phrase

    # top bigram = 'a b' (3 occurrences; 'b a' has 2 -> count wins);
    # doc 2 ends with 'a' and doc 3 starts with 'b' -- the boundary
    # must NOT produce a phantom 'a b' hit across docs.
    rows = [("a b a b", "s", 7), ("a b c", "s", 5),
            ("c a", "s", 3), ("b c", "s", 3)]
    out = q_search_phrase(_write_docs(tmp_path, rows))
    assert list(out["doc_id"]) == [0, 1]
    assert list(out["n_hits"]) == [2, 1]
    assert set(out["left_tok"]) == {"a"} and set(out["right_tok"]) == {"b"}


def test_ffill_daily_gaps_and_ties(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_events_ffill_daily

    D = 86_400_000_000  # 1 day in us
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        # user 1: day 0 has two equal-ts events (event_id 1 wins the
        # per-day-last), day 1-2 empty (filled with 2.0), day 3 = 9.0
        (t0, 1, "view", 5.0), (t0, 1, "view", 2.0),
        (t0 + 3 * D, 1, "view", 9.0),
        # user 2: single event -> one grid row, observed
        (t0 + 10 * D, 2, "click", 7.0),
    ]
    out = (q_events_ffill_daily(_write_events(tmp_path, rows))
           .to_pandas().sort_values(["user_id", "grid_day"])
           .reset_index(drop=True))
    u1 = out[out["user_id"] == 1]
    assert list(u1["value_c"]) == [200, 200, 200, 900]
    assert list(u1["is_observed"]) == [1, 0, 0, 1]
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2.iloc[0]["value_c"] == 700 \
        and u2.iloc[0]["is_observed"] == 1


def test_bm25_formula_brute(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_bm25_topk

    # frequency ranks: a x10, b x9, c x8, d x7, e x6, f x5 -> query
    # terms are ranks 5 and 6 = (e, f). doc2 has neither (excluded).
    docs = ["a a a a b b b c c e e f", "a a a b b b c c c e",
            "a a a b b b c c c d d d", "d d d d e e e f f f f"]
    rows = [(t, "s", len(t)) for t in docs]
    out = q_bm25_topk(_write_docs(tmp_path, rows))

    # brute recompute of the documented integer formula
    toks = [d.split() for d in docs]
    n_docs, total = len(docs), sum(len(t) for t in toks)
    avgdl = max(total // n_docs, 1)
    tf = [(t.count("e"), t.count("f"), len(t)) for t in toks]
    df1 = sum(1 for x in tf if x[0] > 0)
    df2 = sum(1 for x in tf if x[1] > 0)
    idf1 = (n_docs - df1) * 1_000_000 // df1
    idf2 = (n_docs - df2) * 1_000_000 // df2
    exp = {}
    for i, (t1, t2, dl) in enumerate(tf):
        if t1 + t2 == 0:
            continue
        s = 0
        if t1:
            s += idf1 * t1 * 44 * avgdl // (20 * avgdl * t1 + 6 * avgdl + 18 * dl)
        if t2:
            s += idf2 * t2 * 44 * avgdl // (20 * avgdl * t2 + 6 * avgdl + 18 * dl)
        exp[i] = s
    got = {r.doc_id: r.score_e6 for r in out.itertuples()}
    assert got == exp
    assert 2 not in got  # no-match doc excluded
    # ranking order: score desc, doc_id asc
    assert list(out["score_e6"]) == sorted(out["score_e6"], reverse=True)


def test_throttle_greedy_chain(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_throttle_events

    H = 3_600_000_000  # 1h in us
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    # user 1 hours: 0,1,2,25,26,49 with 24h gap -> keep 0, 25, 49.
    # NOTE: vs sessionize semantics, 25 is kept because the chain
    # measures from the last KEPT (0), not the previous raw event (2).
    hrs = [0, 1, 2, 25, 26, 49]
    rows = [(t0 + h * H, 1, "view", 0.0) for h in hrs]
    # user 2: equal-ts pair -> only the lower event_id is kept
    rows += [(t0, 2, "view", 0.0), (t0, 2, "view", 0.0)]
    out = (q_throttle_events(_write_events(tmp_path, rows))
           .to_pandas().sort_values(["user_id", "keep_rank"])
           .reset_index(drop=True))
    u1 = out[out["user_id"] == 1]
    assert list(u1["event_id"]) == [0, 3, 5]
    assert list(u1["keep_rank"]) == [1, 2, 3]
    u2 = out[out["user_id"] == 2]
    assert list(u2["event_id"]) == [6] and list(u2["keep_rank"]) == [1]


def test_ohlc_merge_semantics(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_events_ohlc_hourly

    M = 60_000_000  # 1 min in us
    t0 = np.datetime64("2024-01-01T10:00:00", "us")
    rows = [
        # user 1, hour 10: open=5 (t+0), high=9, low=2, close=7 (t+50m)
        (t0 + 10 * M, 1, "view", 9.0), (t0, 1, "view", 5.0),
        (t0 + 20 * M, 1, "view", 2.0), (t0 + 50 * M, 1, "view", 7.0),
        # user 1, hour 11: single event -> all four equal
        (t0 + 70 * M, 1, "view", 3.0),
        # user 2, hour 10: equal-ts pair -> event_id breaks open/close
        (t0, 2, "view", 1.0), (t0, 2, "view", 4.0),
    ]
    out = (q_events_ohlc_hourly(_write_events(tmp_path, rows))
           .to_pandas().sort_values(["user_id", "hour"])
           .reset_index(drop=True))
    r = out[(out["user_id"] == 1)].reset_index(drop=True)
    assert r.loc[0, ["open_c", "high_c", "low_c", "close_c", "n"]] \
        .tolist() == [500, 900, 200, 700, 4]
    assert r.loc[1, ["open_c", "high_c", "low_c", "close_c", "n"]] \
        .tolist() == [300, 300, 300, 300, 1]
    r2 = out[out["user_id"] == 2].reset_index(drop=True)
    # event_id 5 (value 1.0) precedes event_id 6 (4.0) at equal ts
    assert r2.loc[0, ["open_c", "close_c"]].tolist() == [100, 400]


def test_basket_rules_counts(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_basket_rules

    H = 3_600_000_000
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    # baskets: u1h0 {click,view}, u1h1 {click}, u2h0 {view,click,buy}
    # (duplicate click in u1h0 must not double-count), u3h0 {view}
    rows = [
        (t0, 1, "click", 0.0), (t0, 1, "view", 0.0), (t0, 1, "click", 0.0),
        (t0 + H, 1, "click", 0.0),
        (t0, 2, "view", 0.0), (t0, 2, "click", 0.0), (t0, 2, "buy", 0.0),
        (t0, 3, "view", 0.0),
    ]
    out = q_basket_rules(_write_events(tmp_path, rows))
    got = {(r.type_a, r.type_b): (r.n_ab, r.n_a, r.n_b) for r in
           out.itertuples()}
    # totals: 4 baskets; click in 3, view in 3, buy in 1
    assert got == {("buy", "click"): (1, 1, 3),
                   ("buy", "view"): (1, 1, 3),
                   ("click", "view"): (2, 3, 3)}
    r = out.set_index(["type_a", "type_b"]).loc[("click", "view")]
    assert r["n_baskets"] == 4
    assert r["support_e6"] == 2 * 1_000_000 // 4
    assert r["confidence_e6"] == 2 * 1_000_000 // 3
    assert r["lift_e6"] == 2 * 4 * 1_000_000 // 9


def test_profiler_distinct_and_bounds(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_profile_events

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(t0, 7, "click", 1.5), (t0, 7, "view", 2.0),
            (t0 + 1, 9, "click", 1.5)]
    out = q_profile_events(_write_events(tmp_path, rows)) \
        .set_index("column")
    assert out.loc["user_id"].tolist() == [3, 0, 2, 7, 9, "", ""]
    assert out.loc["value_c"].tolist() == [3, 0, 2, 150, 200, "", ""]
    assert out.loc["event_type", "n_distinct"] == 2
    assert out.loc["event_type", "min_s"] == "click"
    assert out.loc["event_type", "max_s"] == "view"
    assert out.loc["ts_us", "n_distinct"] == 2


def test_percent_rank_tie_semantics(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_percentile_rank_parts

    t = pa.table({
        "p_partkey": pa.array([0, 1, 2, 3], pa.int64()),
        "p_name": pa.array(["x"] * 4),
        "p_brand": pa.array(["A", "A", "A", "B"]),
        "p_type": pa.array(["T"] * 4),
        "p_size": pa.array([1] * 4, pa.int32()),
        "p_retailprice": pa.array([10.0, 10.0, 20.0, 5.0], pa.float64())})
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_percentile_rank_parts(str(tmp_path)).set_index("p_partkey")
    # brand A: ties at 10 share rank 1 -> pr 0; cume counts peers
    # inclusively (2 of 3)
    assert out.loc[0, "pr_e6"] == 0 and out.loc[1, "pr_e6"] == 0
    assert out.loc[2, "pr_e6"] == 1_000_000
    assert out.loc[0, "cd_e6"] == 2 * 1_000_000 // 3
    assert out.loc[2, "cd_e6"] == 1_000_000
    # single-row brand: pr 0, cd 1
    assert out.loc[3, "pr_e6"] == 0 and out.loc[3, "cd_e6"] == 1_000_000


def test_value_histogram_clamp(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_value_histogram

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(t0, 1, "click", 0.01),   # bin 0
            (t0, 1, "click", 9.99),   # 999 -> bin 0
            (t0, 1, "click", 10.00),  # 1000 -> bin 1
            (t0, 1, "click", 250.0)]  # 25000 -> clamped bin 19
    out = q_value_histogram(_write_events(tmp_path, rows)) \
        .set_index("bin")
    assert out.loc[0, "n"] == 2 and out.loc[0, "sum_value_c"] == 1000
    assert out.loc[1, "n"] == 1
    assert out.loc[19, "n"] == 1 and out.loc[19, "sum_value_c"] == 25000


def test_timeline_zipper_tiebreak(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_user_timeline

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    _write_events(tmp_path, [(t0, 1, "view", 0.0),
                             (t0 + 5, 1, "click", 0.0)])
    orders = pa.table({
        "o_orderkey": pa.array([100], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderstatus": pa.array(["F"]),
        "o_totalprice": pa.array([1.0], pa.float64()),
        "o_orderdate": pa.array([t0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["5-LOW"])})
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = (q_user_timeline(str(tmp_path)).to_pandas()
           .sort_values("seq").reset_index(drop=True))
    # equal ts at t0: event (src 0) precedes order (src 1)
    assert list(out["item"]) == ["event:view", "order:F", "event:click"]
    assert list(out["seq"]) == [1, 2, 3]


def test_gini_fairness_golden(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_crawl_fairness

    # equal counts -> gini 0
    rows = [("t", "s1", 1), ("t", "s2", 1), ("t", "s3", 1)]
    out = q_crawl_fairness(_write_docs(tmp_path, rows))
    assert out.iloc[0]["gini_e6"] == 0
    # counts (1, 3): G = (2*(1*1+2*3) - 3*4) / (2*4) = 0.25
    d2 = tmp_path / "g2"
    d2.mkdir()
    rows = [("t", "a", 1)] + [("t", "b", 1)] * 3
    out = q_crawl_fairness(_write_docs(d2, rows))
    assert out.iloc[0].tolist() == [2, 4, 250_000]


def test_hierarchy_rollup_sparse_tree(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import \
        q_hierarchy_rollup

    # docs at sparse ids: 305 (path 305->30->3->0), 307 (->30->3->0),
    # 42 (->4->0). Internal nodes 30/3/4 are NOT docs themselves.
    rows = [("a", "s", 10), ("b", "s", 20), ("c", "s", 7)]
    sf = _write_docs(tmp_path, rows)
    t = pq.read_table(sf + "/documents.parquet")
    t = t.set_column(0, "doc_id", pa.array([305, 307, 42], pa.int64()))
    pq.write_table(t, sf + "/documents.parquet")
    out = q_hierarchy_rollup(sf).set_index("node")
    assert out.loc[305].tolist() == [1, 10]
    assert out.loc[30].tolist() == [2, 30]   # subtree {305, 307}
    assert out.loc[3].tolist() == [2, 30]
    assert out.loc[4].tolist() == [1, 7]     # subtree {42}
    assert out.loc[0].tolist() == [3, 37]    # root sees everything
    assert set(out.index) == {305, 307, 30, 3, 42, 4, 0}


def test_pq_codes_brute(ray_session, tmp_path):
    from crawling_infrastructure_ray.functions.hashing import splitmix64_np
    from crawling_infrastructure_ray.pipelines.training import q_pq_codes

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((6, 64)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(6), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32())),
                  "label": pa.array([0] * 6, pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_pq_codes(str(tmp_path)).set_index("vec_id")

    comp = splitmix64_np(np.arange(4 * 16 * 16, dtype=np.uint64))
    cb = ((comp % np.uint64(2001)).astype(np.int64) - 1000) \
        .reshape(4, 16, 16)
    x = np.floor(vecs.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    for v in range(6):
        err = 0
        for m in range(4):
            d = ((x[v, m * 16:(m + 1) * 16][None, :] - cb[m]) ** 2) \
                .sum(axis=1)
            k = int(np.argmin(d))
            assert out.loc[v, f"code{m}"] == k
            err += int(d[k])
        assert out.loc[v, "err"] == err


def test_contrastive_pairs_blocking(ray_session, tmp_path):
    from crawling_infrastructure_ray.functions.hashing import splitmix64_np
    from crawling_infrastructure_ray.pipelines.training import \
        q_contrastive_pairs

    # blocks: (s1, 10) -> docs {0, 2, 3}; (s1, 20) -> {1}; (s2, 10)
    # -> {4, 5}. Positives: (0,2), (0,3), (4,5).
    rows = [("a", "s1", 10), ("b", "s1", 20), ("c", "s1", 10),
            ("d", "s1", 10), ("e", "s2", 10), ("f", "s2", 10)]
    out = q_contrastive_pairs(_write_docs(tmp_path, rows))
    got_pos = set(zip(out["anchor"], out["positive"]))
    assert got_pos == {(0, 2), (0, 3), (4, 5)}
    assert len(out) == 6  # 3 positives x 2 neg slots
    # draws: neg_id = splitmix64(anchor*2 + j) % 6; member set =
    # {0, 2, 3, 4, 5} (1 is in a singleton block)
    mem = {0, 2, 3, 4, 5}
    for r in out.itertuples():
        exp_neg = int(splitmix64_np(
            np.array([r.anchor * 2 + r.neg_slot], np.uint64))[0]
            % np.uint64(6))
        assert r.neg_id == exp_neg
        assert r.neg_clean == int(exp_neg not in mem)


def test_median_cont_even_odd(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_median_cont_value_per_type

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    # even n: values (1, 2, 3, 4) -> middles 2,3 -> med2x 500;
    # odd n: (1, 2, 10) -> middle 2 doubled -> 400
    rows = [(t0, 1, "even", float(v)) for v in (1, 2, 3, 4)]
    rows += [(t0, 1, "odd", float(v)) for v in (1, 2, 10)]
    out = q_median_cont_value_per_type(_write_events(tmp_path, rows)) \
        .set_index("event_type")
    assert out.loc["even", "med2x_c"] == 500
    assert out.loc["odd", "med2x_c"] == 400
