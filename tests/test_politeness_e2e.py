"""Politeness end-to-end: the pump obeys per-host token buckets —
per-host claim rate never exceeds the budget (FIXTURES.md politeness
scenario), and robots-denied URLs are terminally failed."""

import time

from crawling_infrastructure_ray.pipelines.crawl import run_crawl_pump
from crawling_infrastructure_ray.state.frontier import Frontier


def test_pump_respects_host_budget(ray_session, tmp_path):
    # 2 hosts x 40 URLs, budget 40/s with burst 4 → the crawl MUST take
    # ≥ ~0.8s (politeness-bound), vs milliseconds unbounded
    urls = [f"http://h{h}.example/p{i}" for h in range(2) for i in range(40)]
    t0 = time.perf_counter()
    res = run_crawl_pump(urls, seed=42, num_shards=2, dedup=True,
                         politeness=True, default_rate=40.0, max_depth=0,
                         chunk_size=8, out_dir=str(tmp_path / "pol"))
    elapsed = time.perf_counter() - t0
    assert res.histogram["completed"] + res.histogram["failed"] == 80
    # (40 urls - burst 4) / 40 per sec ≈ 0.9s minimum per host (parallel hosts)
    assert elapsed >= 0.8
    h = res.histogram
    assert h["initial"] == 0 and h["running"] == 0


def test_pump_unbounded_is_fast(ray_session, tmp_path):
    urls = [f"http://h{h}.example/p{i}" for h in range(2) for i in range(40)]
    t0 = time.perf_counter()
    run_crawl_pump(urls, seed=42, num_shards=2, dedup=True,
                   politeness=False, max_depth=0, chunk_size=40,
                   out_dir=str(tmp_path / "nopol"))
    assert time.perf_counter() - t0 < 5.0


def test_robots_in_engine(ray_session, tmp_path):
    urls = [f"http://h1.example/s{i}/p" for i in range(60)]
    res = run_crawl_pump(urls, seed=42, num_shards=1, dedup=True, robots=True,
                         max_depth=0, chunk_size=16,
                         out_dir=str(tmp_path / "rob"))
    denied = res.counters["robots_denied"]
    assert denied > 0
    h = res.histogram
    # every item terminal; denied items are failed without ever fetching
    assert h["completed"] + h["failed"] == 60
    assert h["failed"] >= denied
    # fetch attempts (incl. retries) cover exactly the non-denied items
    assert res.urls_processed >= 60 - denied
