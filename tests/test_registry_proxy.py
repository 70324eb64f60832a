import pyarrow as pa
import pytest

from crawling_infrastructure_ray.functions.registry import (
    get_crawl_fn, list_crawl_fns, register_crawl_fn)
from crawling_infrastructure_ray.state.proxy_pool import (
    DAMAGED, FUNCTIONAL, ProxyPoolCore)


def test_builtin_registrations():
    assert {"fetch_sim", "fetch_sim_actor", "fetch_store"} <= set(list_crawl_fns())
    fn = get_crawl_fn("fetch_sim")
    out = fn(pa.table({"url": pa.array(["http://h1.example/a"]),
                       "depth": pa.array([0], pa.int32()),
                       "attempt": pa.array([0], pa.int32())}), seed=42)
    assert out.num_rows == 1


def test_register_decorator_and_errors():
    @register_crawl_fn("my_test_fn")
    def my_fn(batch):
        return batch
    assert get_crawl_fn("my_test_fn") is my_fn
    with pytest.raises(KeyError):
        get_crawl_fn("nope_not_registered")


def _pool_with(n=3):
    p = ProxyPoolCore()
    p.upsert([{"proxy": f"10.0.0.{i}:8080", "proxy_fail_counter": 0}
              for i in range(n)])
    return p


def test_proxy_upsert_dedup():
    # R8: unique compound identity (proxy.model.ts:79,96-124)
    p = _pool_with(3)
    assert p.size() == 3
    assert p.upsert([{"proxy": "10.0.0.1:8080"}]) == 0   # duplicate identity
    assert p.upsert([{"proxy": "10.0.0.1:8080", "username": "u"}]) == 1


def test_proxy_claim_order():
    # O2: asc (fail_counter, last_used, obtain_counter) — least failed,
    # least recently used first (crawler/src/proxy.ts:129-144)
    p = _pool_with(3)
    first = p.claim()["proxy"]
    second = p.claim()["proxy"]
    assert first != second                     # LRU rotates
    p.report(p.identity({"proxy": "10.0.0.2:8080"}), failed=True)
    order = [p.claim()["proxy"] for _ in range(4)]
    # failed proxy sorts after ALL healthy proxies (asc fail_counter
    # dominates), so it is never claimed while healthy ones rotate
    assert "10.0.0.2:8080" not in order


def test_proxy_damaged_skipped():
    p = _pool_with(2)
    key = p.identity({"proxy": "10.0.0.0:8080"})
    p.proxies[key]["status"] = DAMAGED
    for _ in range(4):
        assert p.claim()["proxy"] == "10.0.0.1:8080"


def test_fetchsim_proxy_rotation(ray_session):
    import ray
    from crawling_infrastructure_ray.state.proxy_pool import ProxyPool
    from crawling_infrastructure_ray.stages.fetch import FetchSim
    pool = ProxyPool.remote()
    ray.get(pool.upsert.remote([{"proxy": f"10.0.0.{i}:1"} for i in range(4)]))
    f = FetchSim(seed=42, proxy_pool=pool, proxy_change_every=10)
    batch = pa.table({"url": pa.array([f"http://h.example/{i}" for i in range(10)]),
                      "depth": pa.array([0] * 10, pa.int32()),
                      "attempt": pa.array([0] * 10, pa.int32())})
    f(batch)
    p1 = f.current_proxy["proxy"]
    f(batch)                                   # crosses change_every=10
    p2 = f.current_proxy["proxy"]
    assert p1 != p2                            # rotated (A4)
