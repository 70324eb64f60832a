"""A3 warm persistent handler (persistant_handler.ts:25-157 analog):
state survives across calls, the code cache hits after first use,
restart clears warm state, and the pool outlives pipeline runs."""

import ray

from crawling_infrastructure_ray.stages.warm import (WarmCrawlPool,
                                                     _WarmCrawlCore)


def test_warm_core_cache_and_counters():
    core = _WarmCrawlCore(seed=42)
    urls = [f"http://warm.example/p{i}" for i in range(5)]
    r1 = core.crawl(urls)
    r2 = core.crawl(urls)
    assert r1 == r2                               # deterministic fetcher
    st = core.stats()
    assert st["counter"] == 2
    assert st["cache_misses"] == 1                # warm after first call
    assert st["cached_fns"] == ["fetch_sim_actor"]
    assert st["session_fetches"] == 10            # fetcher state persisted
    core.restart()
    core.crawl(urls)
    assert core.stats()["cache_misses"] == 2      # rebuilt after restart


def test_warm_core_restart_every():
    core = _WarmCrawlCore(seed=42, restart_every=2)
    urls = ["http://warm.example/x"]
    for _ in range(5):
        core.crawl(urls)
    # restarts at call 2 and 4 (restart_before_crawl analog)
    assert core.stats()["restarts"] == 2


def test_warm_pool_persists_across_calls(ray_session):
    pool = WarmCrawlPool(size=2, seed=42)
    try:
        urls = [f"http://warm.example/q{i}" for i in range(4)]
        for _ in range(4):
            out = pool.crawl(urls)
            assert len(out["url"]) == 4
        stats = pool.stats()
        # round-robin: each of the 2 actors served 2 calls, each built
        # its fetcher exactly once and kept it warm
        assert sorted(s["counter"] for s in stats) == [2, 2]
        assert all(s["cache_misses"] == 1 for s in stats)
        assert all(s["session_fetches"] == 8 for s in stats)
    finally:
        pool.shutdown()
