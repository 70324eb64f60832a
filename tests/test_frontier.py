"""Frontier state-machine tests — pytest ports of the reference's
queue-semantics assertions (crawler/test/remote_tests.ts, SURVEY.md §5):
observable row counts and statuses after orchestrated lease/commit/
rollback/retry sequences, plus the SURVEY.md §3.2 ordering invariant.

These run on FrontierShardCore directly (no Ray) — the single-writer
core IS the semantics; the actor wrapper adds only message passing.
"""

import pytest

from crawling_infrastructure_ray.state.frontier import (
    COMPLETED, FAILED, INITIAL, RUNNING, FrontierShardCore)


def make_shard(**kw):
    kw.setdefault("order", "fifo")
    return FrontierShardCore(0, **kw)


def enqueue_urls(shard, urls, start_seq=0, depth=0):
    shard.enqueue(list(range(start_seq, start_seq + len(urls))), urls,
                  [depth] * len(urls))
    return start_seq + len(urls)


def test_fifo_claim_order():
    # §3.2: claim = first n rows in enqueue_seq order with status==initial
    sh = make_shard()
    enqueue_urls(sh, [f"http://h.example/{i}" for i in range(10)])
    lease = sh.lease(4, now=0.0)
    assert lease["seq"] == [0, 1, 2, 3]
    lease2 = sh.lease(4, now=0.0)
    assert lease2["seq"] == [4, 5, 6, 7]


def test_lease_marks_running_and_commit_completes():
    # remote_tests.ts:26-110 — lease of 3 → 3 completed
    sh = make_shard()
    enqueue_urls(sh, [f"http://h.example/{i}" for i in range(3)])
    lease = sh.lease(3, now=0.0)
    assert sh.status_histogram() == {"initial": 0, "running": 3, "completed": 0, "failed": 0}
    sh.commit(lease["lease_id"], lease["seq"], ["completed"] * 3, now=1.0)
    assert sh.status_histogram() == {"initial": 0, "running": 0, "completed": 3, "failed": 0}
    assert sh.is_finished()


def test_rollback_on_abort():
    # remote_tests.ts:112-145 — no-proxy failure rolls ALL lease items
    # back to initial, zero crawled
    sh = make_shard()
    enqueue_urls(sh, [f"http://h.example/{i}" for i in range(5)])
    lease = sh.lease(5, now=0.0)
    n = sh.rollback(lease["lease_id"])
    assert n == 5
    assert sh.status_histogram()["initial"] == 5
    # retries unchanged by rollback (R5)
    release = sh.lease(5, now=0.0)
    assert release["retries"] == [0] * 5
    # and FIFO position preserved
    assert release["seq"] == [0, 1, 2, 3, 4]


def test_partial_commit_rolls_back_remainder():
    # R5/R7: uncommitted lease members return to initial
    sh = make_shard()
    enqueue_urls(sh, [f"http://h.example/{i}" for i in range(4)])
    lease = sh.lease(4, now=0.0)
    sh.commit(lease["lease_id"], lease["seq"][:2], ["completed", "failed"], now=1.0)
    h = sh.status_histogram()
    assert h == {"initial": 2, "running": 0, "completed": 1, "failed": 1}


def test_retry_at_original_position():
    # R1 (queue.model.ts:258-266): failed→initial keeps original seq position
    sh = make_shard(max_retries=3)
    enqueue_urls(sh, [f"http://h.example/{i}" for i in range(4)])
    lease = sh.lease(2, now=0.0)           # seqs 0,1
    sh.commit(lease["lease_id"], lease["seq"], ["failed", "completed"], now=1.0)
    assert sh.retry_failed() == 1          # seq 0 back to initial
    lease2 = sh.lease(3, now=2.0)
    # seq 0 re-claimed FIRST (original position), before 2 and 3
    assert lease2["seq"] == [0, 2, 3]
    assert lease2["retries"][0] == 1


def test_retry_exhaustion_terminal():
    sh = make_shard(max_retries=3)
    enqueue_urls(sh, ["http://h.example/x"])
    for attempt in range(3):
        lease = sh.lease(1, now=float(attempt))
        assert lease["seq"] == [0]
        sh.commit(lease["lease_id"], [0], ["failed"], now=float(attempt))
        retried = sh.retry_failed()
        if attempt < 2:
            assert retried == 1
        else:
            assert retried == 0            # retries==3 → terminal
    assert sh.status_histogram()["failed"] == 1
    assert sh.is_finished()
    assert sh.seen_set() == ["http://h.example/x"]


def test_blocked_does_not_consume_retry():
    # R6 (handler.ts:171-176): block-detected failure keeps retries
    sh = make_shard(max_retries=3)
    enqueue_urls(sh, ["http://h.example/x"])
    lease = sh.lease(1, now=0.0)
    assert lease["attempt"] == [0]
    sh.commit(lease["lease_id"], [0], ["blocked"], ["HTTP 429"], now=0.0)
    assert sh.retry_failed() == 1
    lease2 = sh.lease(1, now=1.0)
    assert lease2["retries"] == [0]        # unchanged
    assert lease2["attempt"] == [1]        # but attempt advanced


def test_requeue_all_failed_resets():
    # R4 (queue.model.ts:274-287)
    sh = make_shard(max_retries=1)
    enqueue_urls(sh, ["http://h.example/a", "http://h.example/b"])
    lease = sh.lease(2, now=0.0)
    sh.commit(lease["lease_id"], lease["seq"], ["failed", "failed"], now=0.0)
    assert sh.status_histogram()["failed"] == 2
    assert sh.requeue_all_failed() == 2
    lease2 = sh.lease(2, now=1.0)
    assert lease2["retries"] == [0, 0]     # counters reset


def test_heal_running():
    # R2 (queue.model.ts:295-308)
    sh = make_shard()
    enqueue_urls(sh, ["http://h.example/a", "http://h.example/b"])
    sh.lease(2, now=0.0)
    assert sh.heal_running() == 2
    assert sh.status_histogram()["initial"] == 2


def test_lease_ttl_expiry():
    # R3 lost-worker healing via lease TTL
    sh = make_shard(lease_ttl=10.0)
    enqueue_urls(sh, ["http://h.example/a"])
    sh.lease(1, now=0.0)
    assert sh.expire_leases(now=5.0) == 0
    assert sh.expire_leases(now=10.0) == 1
    assert sh.status_histogram()["initial"] == 1


def test_duplicates_allowed_fidelity_mode():
    # reference allows duplicates (crawltask.service.ts:782-785)
    sh = make_shard(dedup=False)
    enqueue_urls(sh, ["http://h.example/x", "http://h.example/x"])
    assert sh.status_histogram()["initial"] == 2


def test_dedup_mode_filters():
    sh = make_shard(dedup=True)
    n = sh.enqueue([0, 1, 2], ["http://h.example/x", "http://h.example/x",
                               "http://h.example/y"], [0, 0, 0])
    assert n == 2
    assert sh.get_counters()["deduped"] == 1
    # canonicalization-aware: same canonical form is a duplicate
    n2 = sh.enqueue([3], ["HTTP://H.EXAMPLE:80/x#frag"], [0])
    assert n2 == 0


def test_robots_denial_is_terminal():
    sh = make_shard(robots=True, seed=42)
    urls = [f"http://h1.example/s{i}/p" for i in range(40)]
    enqueue_urls(sh, urls)
    lease = sh.lease(40, now=0.0)
    h = sh.status_histogram()
    denied = h["failed"]
    assert denied > 0 and lease["seq"]     # some denied, some leased
    assert sh.get_counters()["robots_denied"] == denied
    sh.commit(lease["lease_id"], lease["seq"],
              ["completed"] * len(lease["seq"]), now=0.0)
    assert sh.retry_failed() == 0          # robots denial never retried
    assert sh.is_finished()


def test_politeness_defers_but_preserves_order():
    # FIXTURES.md scenario: per-host gaps ≥ budget, order within host kept
    sh = make_shard(politeness=True, default_rate=1.0, default_burst=1.0)
    enqueue_urls(sh, ["http://a.example/1", "http://a.example/2",
                      "http://b.example/1"])
    lease = sh.lease(3, now=0.0)
    # one token per host: a/1 and b/1 claimed, a/2 deferred
    assert lease["url"] == ["http://a.example/1", "http://b.example/1"]
    sh.commit(lease["lease_id"], lease["seq"], ["completed"] * 2, now=0.0)
    assert sh.lease(3, now=0.5)["seq"] == []   # bucket not refilled yet
    lease2 = sh.lease(3, now=1.0)
    assert lease2["url"] == ["http://a.example/2"]


def test_priority_order_mode():
    # north-star heap: (crawl_depth, -priority, enqueue_seq)
    sh = make_shard(order="priority")
    sh.enqueue([0], ["http://h.example/deep"], [2], [1])
    sh.enqueue([1], ["http://h.example/shallow"], [0], [1])
    sh.enqueue([2], ["http://h.example/hi-prio"], [0], [5])
    lease = sh.lease(3, now=0.0)
    assert lease["url"] == ["http://h.example/hi-prio",
                            "http://h.example/shallow",
                            "http://h.example/deep"]


def test_evict_terminal_keeps_histogram():
    sh = make_shard()
    enqueue_urls(sh, [f"http://h.example/{i}" for i in range(6)])
    lease = sh.lease(4, now=0.0)
    sh.commit(lease["lease_id"], lease["seq"],
              ["completed", "completed", "failed", "completed"], now=1.0)
    before = sh.status_histogram()
    seen_before = sh.seen_set()
    assert sh.evict_terminal() == 3        # 3 completed evicted (failed not terminal yet)
    assert sh.status_histogram() == before
    assert sh.seen_set() == seen_before


def test_snapshot_restore_roundtrip(tmp_path):
    sh = make_shard(dedup=True, max_retries=3)
    enqueue_urls(sh, [f"http://h{i % 3}.example/{i}" for i in range(10)])
    lease = sh.lease(4, now=0.0)
    sh.commit(lease["lease_id"], lease["seq"][:3],
              ["completed", "failed", "blocked"], now=1.0)
    # seq 3 still running (in-flight lease) at snapshot time
    sh.snapshot(str(tmp_path / "s0"))
    sh2 = FrontierShardCore(0)
    sh2.restore(str(tmp_path / "s0"))
    h2 = sh2.status_histogram()
    # running item healed to initial on restore
    assert h2 == {"initial": 7, "running": 0, "completed": 1, "failed": 2}
    assert sh2.seen_set() == sh.seen_set()
    assert sh2.get_counters() == sh.get_counters()
    # dedup filter survives: re-enqueue of a seen URL is filtered
    assert sh2.enqueue([99], ["http://h0.example/0"], [0]) == 0
    # FIFO resumes at correct position (healed 3 first, then 4..)
    assert sh2.lease(3, now=2.0)["seq"] == [3, 4, 5]


def test_enqueue_dataset_distributed_ingest(ray_session, tmp_path):
    """S1/S2 at scale: Dataset-driven ingest routes batches to shards
    from inside map_batches tasks — same final state as driver-side
    enqueue (histogram totals, dedup, host→shard affinity), and the
    crawl over it drains normally."""
    import ray.data as rd
    import pyarrow as pa
    from crawling_infrastructure_ray.pipelines.crawl import run_crawl_pump
    from crawling_infrastructure_ray.sources.corpus import make_seed_urls

    seeds = make_seed_urls(2000, seed=7, num_hosts=64)
    urls = seeds["url"].to_pylist()
    n_distinct = len(set(urls))

    from crawling_infrastructure_ray.state.frontier import Frontier
    fr = Frontier(4, seed=42, dedup=True)
    ds = rd.from_arrow(pa.table({"url": seeds["url"]}))
    inserted = fr.enqueue_dataset(ds)
    assert inserted == n_distinct               # dedup inside shards
    assert fr.status_histogram()["initial"] == n_distinct

    # same totals as the driver-side path
    from crawling_infrastructure_ray.state.frontier import Frontier
    fr2 = Frontier(4, seed=42, dedup=True)
    assert fr2.enqueue(urls) == n_distinct

    # host→shard affinity: re-inserting a URL (any route) dedups
    assert fr.enqueue([urls[0]]) == 0

    res = run_crawl_pump(None, frontier=fr, seed=42, max_depth=0,
                         chunk_size=256, out_dir=str(tmp_path / "di"))
    h = res.histogram
    assert h["initial"] == 0 and h["running"] == 0
    assert h["completed"] + h["failed"] == n_distinct
