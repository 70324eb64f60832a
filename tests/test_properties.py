"""Property-based tests (hypothesis) for the invariant-bearing cores:
URL canonicalization, membership filters, token buckets, and the
frontier state machine under arbitrary operation sequences. The
reference has no property tests (SURVEY.md §5) — these guard the
semantics the conformance suite spot-checks."""

import hypothesis.strategies as st
from hypothesis import given, settings

from crawling_infrastructure_ray.functions.hashing import stable_hash64
from crawling_infrastructure_ray.functions.urltools import (
    canonicalize_and_host, canonicalize_url, parse_host)
from crawling_infrastructure_ray.state.filters import (BloomFilter,
                                                       CuckooFilter,
                                                       ScalableSeenFilter)
from crawling_infrastructure_ray.state.frontier import (COMPLETED, FAILED,
                                                        INITIAL, RUNNING,
                                                        FrontierShardCore)
from crawling_infrastructure_ray.state.politeness import TokenBucket

url_st = st.builds(
    lambda scheme, host, path, q: f"{scheme}://{host}/{path}" + (f"?{q}" if q else ""),
    st.sampled_from(["http", "https", "HTTP"]),
    st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.-]{0,20}", fullmatch=True),
    st.from_regex(r"[a-zA-Z0-9_/.-]{0,24}", fullmatch=True),
    st.from_regex(r"[a-z0-9=&]{0,10}", fullmatch=True))


@given(url_st)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url):
    c1 = canonicalize_url(url)
    assert canonicalize_url(c1) == c1


@given(url_st)
@settings(max_examples=200, deadline=None)
def test_fast_path_matches_full_canonicalizer(url):
    # the hot-path canonicalizer must agree with the urlsplit-based one
    curl, host = canonicalize_and_host(url)
    assert curl == canonicalize_url(url)
    assert host == parse_host(curl)


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=200,
                unique=True))
@settings(max_examples=50, deadline=None)
def test_filters_no_false_negatives(keys):
    for cls in (lambda: BloomFilter(1000), lambda: CuckooFilter(1000),
                lambda: ScalableSeenFilter(64)):
        f = cls()
        for k in keys:
            f.add(k)
        assert all(f.contains(k) for k in keys)   # membership never lost


@given(st.lists(st.floats(min_value=0.01, max_value=5.0), min_size=1,
                max_size=50))
@settings(max_examples=50, deadline=None)
def test_token_bucket_never_exceeds_budget(gaps):
    rate, burst = 2.0, 3.0
    b = TokenBucket(rate, burst, now=0.0)
    now, taken = 0.0, 0
    for g in gaps:
        now += g
        while b.try_take(now):
            taken += 1
    # total grants ≤ burst + rate × elapsed (no over-spend, ever)
    assert taken <= burst + rate * now + 1e-6


ops_st = st.lists(st.tuples(st.sampled_from(["lease", "commit_ok", "commit_fail",
                                             "rollback", "retry", "expire"]),
                            st.integers(0, 5)), max_size=60)


@given(st.integers(1, 30), ops_st)
@settings(max_examples=60, deadline=None)
def test_frontier_conservation_under_arbitrary_ops(n_items, ops):
    """Invariant: items are never lost or duplicated — the status
    histogram always sums to the number of inserted items, and
    lease/heal transitions keep statuses in the legal state machine."""
    sh = FrontierShardCore(0, max_retries=3, lease_ttl=5.0)
    sh.enqueue(list(range(n_items)),
               [f"http://h{i % 3}.example/{i}" for i in range(n_items)],
               [0] * n_items)
    open_leases = []
    now = 0.0
    for op, k in ops:
        now += 1.0
        if op == "lease":
            lease = sh.lease(k + 1, now=now)
            if lease["seq"]:
                open_leases.append(lease)
        elif op in ("commit_ok", "commit_fail") and open_leases:
            lease = open_leases.pop()
            status = "completed" if op == "commit_ok" else "failed"
            sh.commit(lease["lease_id"], lease["seq"],
                      [status] * len(lease["seq"]), now=now)
        elif op == "rollback" and open_leases:
            lease = open_leases.pop()
            sh.rollback(lease["lease_id"])
        elif op == "retry":
            if sh.status_histogram()["running"] == 0:
                sh.retry_failed()
        elif op == "expire":
            expired = sh.expire_leases(now=now + 10.0)
            if expired:
                open_leases.clear()
        h = sh.status_histogram()
        assert sum(h.values()) == n_items          # conservation
        assert h["running"] == sum(len(l["seq"]) for l in open_leases) or \
            h["running"] <= sum(len(l["seq"]) for l in open_leases)
    # drain: everything still reachable terminates
    for _ in range(10):
        lease = sh.lease(n_items, now=now)
        now += 1.0
        if not lease["seq"]:
            if sh.status_histogram()["running"] == 0 and sh.retry_failed():
                continue
            break
        sh.commit(lease["lease_id"], lease["seq"],
                  ["completed"] * len(lease["seq"]), now=now)
    h = sh.status_histogram()
    assert h["initial"] == 0 or h["running"] == 0
    assert sum(h.values()) == n_items


@settings(max_examples=25, deadline=None)
@given(
    n_data=st.integers(1, 60),
    n_keys=st.integers(0, 30),
    seed=st.integers(0, 10_000),
)
def test_union_find_matches_reference_components(n_data, n_keys, seed):
    """union_find_components == brute-force component labeling with
    smallest-id representative, for random edge lists."""
    import numpy as np
    from crawling_infrastructure_ray.stages.joins import union_find_components
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:03d}" for i in range(n_data)]
    edges = [(nodes[rng.integers(n_data)], nodes[rng.integers(n_data)])
             for _ in range(n_keys)]
    roots = union_find_components(edges)
    # brute force: BFS components over the same edges
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for start in sorted(adj):
        if start in want:
            continue
        comp, queue = {start}, [start]
        while queue:
            x = queue.pop()
            for y in adj.get(x, ()):
                if y not in comp:
                    comp.add(y)
                    queue.append(y)
        rep = min(comp)
        for x in comp:
            want[x] = rep
    assert roots == want


def test_bucketed_semi_anti_join_match_pandas(ray_session):
    """semi/anti joins == pandas isin on random tables (partition
    invariant: every key wholly in one bucket)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from crawling_infrastructure_ray.stages.joins import (bucketed_anti_join,
                                                          bucketed_semi_join)
    rng = np.random.default_rng(5)
    data = pd.DataFrame({
        "doc_id": [f"d{int(i):04d}" for i in rng.integers(0, 300, 400)],
        "payload": rng.integers(0, 1000, 400)}).drop_duplicates("doc_id")
    keys = pd.DataFrame({
        "doc_id": [f"d{int(i):04d}" for i in rng.integers(0, 300, 100)]
    }).drop_duplicates()
    dds = rd.from_arrow(pa.Table.from_pandas(data, preserve_index=False))
    kds = rd.from_arrow(pa.Table.from_pandas(keys, preserve_index=False))
    semi = (bucketed_semi_join(dds, kds, on="doc_id", num_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    anti = (bucketed_anti_join(dds, kds, on="doc_id", num_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    in_keys = data["doc_id"].isin(set(keys["doc_id"]))
    want_semi = data[in_keys].sort_values("doc_id").reset_index(drop=True)
    want_anti = data[~in_keys].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(semi, want_semi, check_dtype=False)
    pd.testing.assert_frame_equal(anti, want_anti, check_dtype=False)
    # partition: semi+anti == data (no row lost or duplicated)
    assert len(semi) + len(anti) == len(data)
