"""Crafted-case tests for the round-4 session-6 operators: the
politeness wait replay (max-plus closed form vs a literal sequential
FIFO simulation) and the LRU stack-distance replay (vs a literal
OrderedDict LRU run at every capacity). The oracle mirror hash-checks
these against DuckDB at sf0.001/0.01/0.1; here the SEMANTICS are
pinned against brute-force simulations on adversarial streams (ties,
bursts, idle gaps, single-access keys)."""

import collections

import numpy as np
import pytest
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, ts_us, user_ids):
    n = len(ts_us)
    t = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(np.asarray(ts_us, np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array(np.asarray(user_ids, np.int64),
                            pa.int64()),
        "event_type": pa.array(["view"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_politeness_wait_matches_sequential_sim(tmp_path, ray_session):
    """The closed-form running-max schedule equals the literal
    sequential fold sched_i = max(t_i, sched_{i-1} + T) per host,
    on a bursty stream with same-µs ties broken by event_id."""
    from crawling_infrastructure_ray.pipelines.analytics import (
        POLITE_REPLAY_HOSTS, POLITE_REPLAY_T_US,
        q_politeness_wait_replay)

    rng = np.random.default_rng(7)
    n = 400
    base = 1_700_000_000_000_000
    # bursts: many claims in tight windows, then idle gaps; a few
    # exact-duplicate timestamps on the same host (event_id breaks
    # the tie deterministically in both engines)
    ts = base + np.sort(rng.choice(200_000_000, size=n,
                                   replace=True)).astype(np.int64)
    uid = rng.integers(0, 7, size=n)  # 7 users -> 7 hosts, heavy reuse
    sf = _write_events(tmp_path, ts, uid)

    got = q_politeness_wait_replay(sf)

    T = POLITE_REPLAY_T_US
    sim = {}
    order = np.lexsort((np.arange(1, n + 1), ts,
                        uid % POLITE_REPLAY_HOSTS))
    for i in order:
        h = int(uid[i]) % POLITE_REPLAY_HOSTS
        st = sim.setdefault(h, {"sched": None, "n": 0, "tw": 0,
                                "mw": 0, "last": 0})
        s = int(ts[i]) if st["sched"] is None \
            else max(int(ts[i]), st["sched"] + T)
        w = s - int(ts[i])
        st["sched"] = s
        st["n"] += 1
        st["tw"] += w
        st["mw"] = max(st["mw"], w)
        st["last"] = max(st["last"], s)
    exp = pd.DataFrame(
        [(h, v["n"], v["tw"], v["mw"], v["last"])
         for h, v in sorted(sim.items())],
        columns=["host", "n_claims", "total_wait_us", "max_wait_us",
                 "last_sched_us"]).astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_lru_stats_match_ordereddict_sim(tmp_path, ray_session):
    """Stack-distance counting equals a literal OrderedDict LRU at
    every graded capacity, on a stream with re-references at every
    distance class plus never-reused keys."""
    from crawling_infrastructure_ray.pipelines.analytics import (
        LRU_CAPS, LRU_KEYS, q_lru_cache_stats)

    rng = np.random.default_rng(11)
    n = 1500
    # zipf-ish key reuse over a universe larger than the biggest
    # capacity, plus a cold tail of single-touch keys
    keys = np.concatenate([
        rng.zipf(1.3, size=n - 100).astype(np.int64) % 400,
        np.arange(400, 500, dtype=np.int64)])[:n]
    rng.shuffle(keys)
    ts = 1_700_000_000_000_000 + \
        np.arange(n, dtype=np.int64) * 1_000_000
    sf = _write_events(tmp_path, ts, keys)

    got = q_lru_cache_stats(sf)

    for cap in LRU_CAPS:
        cache = collections.OrderedDict()
        hits = comp = capmiss = 0
        seen = set()
        for k in keys:
            k = int(k) % LRU_KEYS
            if k in cache:
                hits += 1
                cache.move_to_end(k)
            else:
                if k in seen:
                    capmiss += 1
                else:
                    comp += 1
                    seen.add(k)
                cache[k] = True
                if len(cache) > cap:
                    cache.popitem(last=False)
        row = got[got["capacity"] == cap].iloc[0]
        assert int(row["n_accesses"]) == n
        assert int(row["compulsory_misses"]) == comp
        assert int(row["capacity_misses"]) == capmiss
        assert int(row["hits"]) == hits


def test_lru_duplicate_ts_asserts(tmp_path, ray_session):
    """Duplicate access timestamps make the LRU order undefined —
    the index build must fail loudly, not diverge silently."""
    import pytest

    from crawling_infrastructure_ray.pipelines.analytics import \
        q_lru_cache_stats

    ts = np.array([1_700_000_000_000_000] * 2 +
                  [1_700_000_000_000_001], np.int64)
    sf = _write_events(tmp_path, ts, np.array([1, 2, 3], np.int64))
    with pytest.raises(AssertionError, match="duplicate access"):
        q_lru_cache_stats(sf)


def _tiny(tmp_path, name, cols):
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))


def test_orphan_audit_detects_violations(tmp_path, ray_session):
    """Broken FKs on both probe paths are counted exactly: broadcast
    dimension probes (orders->customer, customer->nation) and the
    bucketed fact->fact anti-join (lineitem->orders), with repeated
    orphan keys collapsing in n_orphan_keys."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_orphan_audit

    i64 = pa.int64()
    _tiny(tmp_path, "region", {"r_regionkey": pa.array([0, 1], i64)})
    _tiny(tmp_path, "nation", {"n_nationkey": pa.array([0, 1], i64),
                               "n_regionkey": pa.array([0, 9], i64)})
    _tiny(tmp_path, "customer",
          {"c_custkey": pa.array([1, 2], i64),
           "c_nationkey": pa.array([0, 7], i64)})
    _tiny(tmp_path, "supplier",
          {"s_suppkey": pa.array([1], i64),
           "s_nationkey": pa.array([1], i64)})
    _tiny(tmp_path, "part", {"p_partkey": pa.array([1, 2], i64)})
    _tiny(tmp_path, "orders",
          {"o_orderkey": pa.array([10, 11, 12], i64),
           "o_custkey": pa.array([1, 99, 99], i64)})
    _tiny(tmp_path, "lineitem",
          {"l_orderkey": pa.array([10, 50, 50, 51], i64),
           "l_partkey": pa.array([1, 2, 1, 3], i64),
           "l_suppkey": pa.array([1, 1, 1, 1], i64)})
    _tiny(tmp_path, "events",
          {"user_id": pa.array([1, 2, 77], i64)})

    out = q_orphan_audit(str(tmp_path)).set_index("fk_edge")
    assert out.loc["orders->customer"].tolist() == [3, 2, 1]
    assert out.loc["lineitem->orders"].tolist() == [4, 3, 2]
    assert out.loc["customer->nation"].tolist() == [2, 1, 1]
    assert out.loc["nation->region"].tolist() == [2, 1, 1]
    assert out.loc["lineitem->part"].tolist() == [4, 1, 1]
    assert out.loc["events->customer"].tolist() == [3, 1, 1]
    assert out.loc["supplier->nation"].tolist() == [1, 0, 0]
    assert out.loc["lineitem->supplier"].tolist() == [4, 0, 0]


def test_vectorized_fnv_bit_identity():
    """stable_hash64_col_np == stable_hash64 for empty/ascii/utf-8/
    null values, on sliced and chunked arrays."""
    from crawling_infrastructure_ray.functions.hashing import (
        stable_hash64, stable_hash64_col_np)

    strs = ["", "a", "d17", "café", "abcdefghij" * 5, "中文☃", "x\t\n"]
    col = pa.array(strs + [None])
    got = stable_hash64_col_np(col, seed=42)
    want = np.array([stable_hash64(s, 42) for s in strs]
                    + [stable_hash64("", 42)], np.uint64)
    assert (got == want).all()
    sl = col.slice(2, 4)
    got2 = stable_hash64_col_np(sl, seed=7)
    want2 = np.array([stable_hash64(s, 7) for s in strs[2:6]],
                     np.uint64)
    assert (got2 == want2).all()
    ch = pa.chunked_array([pa.array(["aa", "bb"]), pa.array(["cc"])])
    assert (stable_hash64_col_np(ch)
            == np.array([stable_hash64(s) for s in ["aa", "bb", "cc"]],
                        np.uint64)).all()


def test_robots_query_matches_live_robotscache(tmp_path, ray_session):
    """The robots_verdict_stats counts equal a literal per-URL drive
    of the LIVE RobotsCache.allowed() over the same URL universe —
    pinning the query to the engine function end to end (mask build,
    path-segment parse, shard probe)."""
    from crawling_infrastructure_ray.pipelines.analytics import (
        ROBOTS_SEED, q_robots_verdict_stats)
    from crawling_infrastructure_ray.state.politeness import \
        RobotsCache

    rng = np.random.default_rng(3)
    n = 300
    srcs = [f"h{i}" for i in range(9)]
    src = [srcs[i] for i in rng.integers(0, len(srcs), n)]
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["w"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array([1] * n, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = q_robots_verdict_stats(str(tmp_path)).set_index("source")

    rc = RobotsCache(seed=ROBOTS_SEED)
    exp = {}
    for i, s in enumerate(src):
        url = f"http://{s}.example/d{i}"
        a = rc.allowed(url)
        d = exp.setdefault(s, [0, 0])
        d[0] += 1
        d[1] += 0 if a else 1
    for s, (nu, nd) in exp.items():
        row = got.loc[s]
        assert int(row["n_urls"]) == nu
        assert int(row["n_denied"]) == nd
        assert int(row["n_allowed"]) == nu - nd
        assert int(row["mask"]) == rc._rules(f"{s}.example")


def test_bloom_audit_matches_live_filter(tmp_path, ray_session):
    """The vectorized bloom audit equals a literal drive of the LIVE
    BloomFilter: popcount of the bit array and per-probe membership,
    at a tiny capacity chosen to force REAL false positives."""
    from crawling_infrastructure_ray.pipelines.analytics import (
        BLOOM_FPP, BLOOM_SEED, q_urlseen_bloom_audit)
    from crawling_infrastructure_ray.state.filters import BloomFilter

    n = 400
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["w"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"s{i % 4}" for i in range(n)],
                           pa.string()),
        "n_chars": pa.array([1] * n, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    cap = 60  # overloaded filter -> false positives guaranteed
    got = q_urlseen_bloom_audit(str(tmp_path), capacity=cap).iloc[0]

    bf = BloomFilter(cap, BLOOM_FPP, BLOOM_SEED)
    srcs = [f"s{i % 4}" for i in range(n)]
    for i, s in enumerate(srcs):
        bf.add(f"http://{s}.example/d{i}")
    fp = sum(bf.contains(f"http://{s}.example/p{i}")
             for i, s in enumerate(srcs))
    pop = int(np.bitwise_count(bf.bits).sum()) \
        if hasattr(np, "bitwise_count") else \
        int(sum(bin(int(w)).count("1") for w in bf.bits))

    assert int(got["num_bits"]) == bf.num_bits
    assert int(got["num_hashes"]) == bf.num_hashes
    assert int(got["n_keys"]) == n
    assert int(got["bits_set"]) == pop
    assert int(got["n_probes"]) == n
    assert int(got["n_false_positives"]) == fp
    assert fp > 0, "capacity too large: FP path not exercised"


def test_cuckoo_audit_matches_live_filter(tmp_path, ray_session):
    """The vectorized cuckoo audit equals a literal drive of the LIVE
    CuckooFilter: stored-entry count (.count) and per-probe
    contains(), at a load high enough that evictions occur (kicks
    move entries but never change the observable membership set)."""
    from crawling_infrastructure_ray.pipelines.analytics import (
        BLOOM_SEED, q_urlseen_cuckoo_audit)
    from crawling_infrastructure_ray.state.filters import CuckooFilter

    n = 900
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["w"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"s{i % 5}" for i in range(n)],
                           pa.string()),
        "n_chars": pa.array([1] * n, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    cap = 1000  # nbuckets=512 -> ~44% slot load, evictions plausible
    got = q_urlseen_cuckoo_audit(str(tmp_path), capacity=cap).iloc[0]

    cf = CuckooFilter(cap, BLOOM_SEED)
    srcs = [f"s{i % 5}" for i in range(n)]
    for i, s in enumerate(srcs):
        cf.add(f"http://{s}.example/d{i}")
    fp = sum(cf.contains(f"http://{s}.example/p{i}")
             for i, s in enumerate(srcs))

    assert int(got["nbuckets"]) == cf.nbuckets
    assert int(got["n_keys"]) == n
    assert int(got["n_stored"]) == cf.count
    assert int(got["n_probes"]) == n
    assert int(got["n_false_positives"]) == fp
    assert int(got["max_pair_load"]) <= 2 * CuckooFilter.SLOTS


def test_maxplus_closed_form_property():
    """Property sweep (no Ray): on 300 random claim sequences —
    bursts, ties, idle gaps, single claims — the politeness closed
    form i*T + runmax(t_j - j*T) equals the literal sequential fold
    sched_i = max(t_i, sched_{i-1} + T), element for element."""
    rng = np.random.default_rng(99)
    T = 30_000_000
    for _ in range(300):
        n = int(rng.integers(1, 40))
        t = np.sort(rng.choice(
            rng.integers(1, 10) * T * 4, size=n,
            replace=True)).astype(np.int64)
        i = np.arange(n, dtype=np.int64)
        closed = np.maximum.accumulate(t - i * T) + i * T
        sched = np.empty(n, np.int64)
        acc = None
        for j in range(n):
            acc = t[j] if acc is None else max(t[j], acc + T)
            sched[j] = acc
        assert (closed == sched).all()


@pytest.mark.parametrize("seed", [23, 57])
def test_lru_stats_property_seeds(tmp_path, ray_session, seed):
    """The LRU e2e equality holds across independently-random
    streams (different reuse mixes), not just the one crafted case."""
    rng = np.random.default_rng(seed)
    n = 800
    keys = rng.zipf(1.5, size=n).astype(np.int64) % 300
    ts = 1_700_000_000_000_000 + \
        np.arange(n, dtype=np.int64) * 777_777
    sf = _write_events(tmp_path, ts, keys)

    from crawling_infrastructure_ray.pipelines.analytics import (
        LRU_CAPS, LRU_KEYS, q_lru_cache_stats)
    got = q_lru_cache_stats(sf)

    for cap in LRU_CAPS:
        cache = collections.OrderedDict()
        hits = comp = capmiss = 0
        seen = set()
        for k in keys:
            k = int(k) % LRU_KEYS
            if k in cache:
                hits += 1
                cache.move_to_end(k)
            else:
                if k in seen:
                    capmiss += 1
                else:
                    comp += 1
                    seen.add(k)
                cache[k] = True
                if len(cache) > cap:
                    cache.popitem(last=False)
        row = got[got["capacity"] == cap].iloc[0]
        assert (int(row["hits"]), int(row["capacity_misses"]),
                int(row["compulsory_misses"])) == (hits, capmiss, comp)


def test_interval_scheduling_matches_bruteforce(tmp_path, ray_session):
    """The vectorized DP equals exhaustive 2^n subset enumeration on
    random overlapping intervals (n <= 8 per user), including users
    with nested/identical/touching intervals."""
    from itertools import combinations

    from crawling_infrastructure_ray.pipelines.analytics import \
        q_interval_scheduling

    rng = np.random.default_rng(17)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    expect = {}
    for u in range(1, 31):
        n = int(rng.integers(1, 9))
        iv = []
        for _ in range(n):
            s = base + int(rng.integers(0, 50)) * 1_000_000
            v = int(rng.integers(1, 30))  # cents (v>0: DP precondition)
            iv.append((s, s + v * 1_000_000, v))
            rows.append((eid, s, u, "purchase", v / 100.0))
            eid += 1
        best = 0
        for r in range(n + 1):
            for comb in combinations(range(n), r):
                sel = sorted((iv[i] for i in comb),
                             key=lambda t: t[1])
                if all(sel[j][1] <= sel[j + 1][0]
                       for j in range(len(sel) - 1)):
                    best = max(best, sum(t[2] for t in sel))
        expect[u] = (n, best)

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = q_interval_scheduling(str(tmp_path)).set_index("user_id")
    for u, (n, best) in expect.items():
        assert int(got.loc[u, "n_intervals"]) == n
        assert int(got.loc[u, "best_weight_c"]) == best


def test_bpe_trainer_boundary_and_chain(tmp_path, ray_session):
    """BPE merge semantics on crafted words: the boundary padding
    must stop 'a b' matching inside symbols like 'xa b', and the
    documented merge-chain contract holds — the separator-consuming
    replace turns 'a a a a' into 'aa a a' in round 1, 'aa aa' when
    (a,a) re-wins round 2, then merges (aa,aa); the 'xab' words
    survive untouched until their own pairs win."""
    from crawling_infrastructure_ray.pipelines.training import \
        q_bpe_train_merges

    # corpus: 'aaaa' x4 (pairs a+a dominate), 'xab' x3 (after round
    # 1 merges a+a, 'x a b' must NOT have been corrupted into 'x ab')
    docs = ["aaaa aaaa aaaa aaaa", "xab xab xab"]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["s"] * len(docs), pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = q_bpe_train_merges(str(tmp_path))
    rows = [(r["lhs"], r["rhs"], int(r["pair_count"]))
            for _, r in got.sort_values("round").iterrows()]
    # round 1: 'a a' = 3 per 'aaaa' x 4 words = 12; word -> 'aa a a'
    # round 2: tie (aa,a)=4 vs (a,a)=4 -> lex 'a a' wins; -> 'aa aa'
    # round 3: (aa,aa)=4; round 4: tie (a,b)/(x,a)=3 -> 'a b' wins
    # ('xab' words intact through rounds 1-3 — boundary padding);
    # round 5: (x,ab)=3
    assert rows == [("a", "a", 12), ("a", "a", 4), ("aa", "aa", 4),
                    ("a", "b", 3), ("x", "ab", 3)]


def test_lis_matches_bruteforce(tmp_path, ray_session):
    """LIS DP equals exhaustive subsequence enumeration on random
    value sequences with duplicates (strictness matters: equal
    values must NOT extend a run)."""
    from itertools import combinations

    from crawling_infrastructure_ray.pipelines.analytics import \
        q_lis_per_user

    rng = np.random.default_rng(29)
    rows, expect, eid = [], {}, 0
    base = 1_700_000_000_000_000
    for u in range(1, 26):
        n = int(rng.integers(1, 10))
        vals = [int(rng.integers(1, 6)) for _ in range(n)]  # dupes
        for j, v in enumerate(vals):
            rows.append((eid, base + j * 1_000_000, u, v / 100.0))
            eid += 1
        best = 1
        for r in range(1, n + 1):
            for comb in combinations(range(n), r):
                if all(vals[comb[j]] < vals[comb[j + 1]]
                       for j in range(r - 1)):
                    best = max(best, r)
        expect[u] = (n, best)

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["purchase"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = q_lis_per_user(str(tmp_path)).set_index("user_id")
    for u, (n, best) in expect.items():
        assert int(got.loc[u, "n_items"]) == n
        assert int(got.loc[u, "lis_len"]) == best


def test_ed2_banded_matches_full_dp():
    """The k=2 banded Levenshtein equals the full O(nm) DP (capped at
    3) on random string pairs covering equal/±1/±2/±3 lengths,
    transpositions (ed 2 here), repeats, and identical strings."""
    from crawling_infrastructure_ray.pipelines.training import \
        _ed2_banded

    def full_dp(a, b):
        n, m = len(a), len(b)
        D = list(range(m + 1))
        for i in range(1, n + 1):
            prev, D[0] = D[0], i
            for j in range(1, m + 1):
                cur = min(D[j] + 1, D[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, D[j] = D[j], cur
        return min(D[m], 3)

    rng = np.random.default_rng(41)
    al, bl = [], []
    for _ in range(300):
        n = int(rng.integers(0, 14))
        a = "".join(chr(97 + c) for c in rng.integers(0, 4, n))
        b = list(a)
        for _ in range(int(rng.integers(0, 4))):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, max(len(b), 1)))
            if op == 0 and b:
                b[p] = chr(97 + int(rng.integers(0, 4)))
            elif op == 1:
                b.insert(p, chr(97 + int(rng.integers(0, 4))))
            elif b:
                del b[p]
        al.append(a)
        bl.append("".join(b))
    al.append("abcd"); bl.append("abdc")   # transposition -> 2
    al.append(""); bl.append("")           # both empty -> 0
    al.append("aaaa"); bl.append("aaaaaa") # +2 inserts
    got = _ed2_banded(np.array(al, object), np.array(bl, object))
    want = np.array([full_dp(a, b) for a, b in zip(al, bl)], np.int64)
    assert (got == want).all(), \
        (np.flatnonzero(got != want)[:5], got[:10], want[:10])
