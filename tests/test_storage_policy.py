"""K1/K2 storage-policy conformance (reference crawler/src/index.ts:220-276).

itemwise (K1): an item whose store fails is reset to initial ALONE —
the rest of the lease commits normally (index.ts:265-268) and the
reset does NOT consume a retry (R7).
merged (K2): one blob per worker, all-or-nothing — a storage failure
resets EVERY item of the lease to initial (index.ts:237-243).
"""

import pyarrow.compute as pc

from crawling_infrastructure_ray.config import JobConfig
from crawling_infrastructure_ray.pipelines.crawl import (read_documents,
                                                         run_crawl)
from crawling_infrastructure_ray.sources.corpus import fetch_outcome


def _urls(n):
    """n clean urls + 1 STOREFAIL url, all chosen to COMPLETE on
    attempt 0 (the corpus injects ~10% deterministic transient fetch
    failures — exclude them so wave counts isolate STORAGE failures)."""
    out, i = [], 0
    while len(out) < n:
        u = f"http://sp.example/ok{i}"
        if fetch_outcome(u, 0, 42)["status"] == "completed":
            out.append(u)
        i += 1
    i = 0
    while True:
        u = f"http://sp.example/STOREFAIL{i}"
        if fetch_outcome(u, 0, 42)["status"] == "completed" \
                and fetch_outcome(u, 1, 42)["status"] == "completed":
            return out + [u]
        i += 1


def test_itemwise_storage_failure_resets_only_that_item(ray_session, tmp_path):
    out = str(tmp_path / "iw")
    res = run_crawl(_urls(9), seed=42, num_shards=1, dedup=True, max_depth=0,
                    items_per_wave=64, out_dir=out,
                    config=JobConfig(storage_policy="itemwise"),
                    store_fail_marker="STOREFAIL")
    # first wave: 9 items commit, 1 rolls back alone; second wave
    # re-leases just that item (attempt=1) and succeeds
    assert res.histogram == {"initial": 0, "running": 0,
                             "completed": 10, "failed": 0}
    assert res.counters["rolled_back"] == 1
    docs = read_documents(out).to_pandas()
    assert len(docs) == 10 and docs["doc_id"].is_unique
    # wave 0 wrote the 9 good items; the recovered item landed in a
    # later wave's fragment
    assert sorted(docs["wave"].unique()) == [0, 1]
    assert (docs["wave"] == 1).sum() == 1   # only the recovered item


def test_merged_storage_failure_resets_whole_lease(ray_session, tmp_path):
    out = str(tmp_path / "mg")
    res = run_crawl(_urls(9), seed=42, num_shards=1, dedup=True, max_depth=0,
                    items_per_wave=64, out_dir=out,
                    config=JobConfig(storage_policy="merged"),
                    store_fail_marker="STOREFAIL")
    # first wave: the whole 10-item lease rolls back (nothing written);
    # second wave re-leases all 10 (attempt=1) and succeeds
    assert res.histogram == {"initial": 0, "running": 0,
                             "completed": 10, "failed": 0}
    assert res.counters["rolled_back"] == 10
    docs = read_documents(out).to_pandas()
    assert len(docs) == 10 and docs["doc_id"].is_unique
    # all-or-nothing: every document was written by the SECOND wave
    assert sorted(docs["wave"].unique()) == [1]


def test_retries_not_consumed_by_storage_failure(ray_session, tmp_path):
    # drive the frontier directly so we can inspect per-item retries
    from crawling_infrastructure_ray.state.frontier import Frontier
    out = str(tmp_path / "rt")
    fr = Frontier(1, seed=42, dedup=True)
    run_crawl(_urls(4), seed=42, frontier=fr, num_shards=1, max_depth=0,
              items_per_wave=64, out_dir=out,
              storage_policy="itemwise", store_fail_marker="STOREFAIL")
    tbl = fr.dump_table()
    assert pc.max(tbl["retries"]).as_py() == 0   # R7: no retry consumed
    # the storage-failed item was leased twice (attempt counter)
    fail_rows = tbl.filter(pc.match_substring(tbl["url"], "STOREFAIL"))
    assert fail_rows["attempts"].to_pylist() == [2]


def test_storage_policies_in_pump_mode(ray_session, tmp_path):
    """Same K1/K2 semantics through the async pump: both policies
    recover to full completion with unique docs; merged rolls the whole
    lease back (rolled_back == lease size), itemwise only the item."""
    from crawling_infrastructure_ray.pipelines.crawl import run_crawl_pump

    urls = _urls(7)   # 7 clean + 1 STOREFAIL, all complete on attempt 0
    for policy, min_rb in (("itemwise", 1), ("merged", len(urls))):
        out = str(tmp_path / f"p_{policy}")
        res = run_crawl_pump(urls, seed=42, num_shards=1, dedup=True,
                             max_depth=0, chunk_size=64, out_dir=out,
                             storage_policy=policy,
                             store_fail_marker="STOREFAIL")
        assert res.histogram["completed"] == len(urls), policy
        assert res.counters["rolled_back"] >= min_rb, policy
        docs = read_documents(out).to_pandas()
        assert len(docs) == len(urls) and docs["doc_id"].is_unique, policy
