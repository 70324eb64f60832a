from crawling_infrastructure_ray.state.politeness import (
    HostPoliteness, RobotsCache, TokenBucket)


def test_token_bucket_basic():
    b = TokenBucket(rate=1.0, burst=2.0, now=0.0)
    assert b.try_take(0.0)
    assert b.try_take(0.0)
    assert not b.try_take(0.0)       # burst exhausted
    assert not b.try_take(0.5)       # only 0.5 tokens refilled
    assert b.try_take(1.0)           # 1 token refilled at t=1


def test_token_bucket_burst_cap():
    b = TokenBucket(rate=10.0, burst=3.0, now=0.0)
    assert b.available(100.0) == 3.0  # never exceeds burst


def test_host_politeness_isolation():
    p = HostPoliteness(default_rate=1.0, default_burst=1.0)
    assert p.try_take("a.example", 0.0)
    assert not p.try_take("a.example", 0.0)
    assert p.try_take("b.example", 0.0)  # separate bucket per host


def test_host_politeness_overrides_and_cap():
    p = HostPoliteness(default_rate=1.0, default_burst=1.0,
                       overrides={"fast.example": (1000.0, 5.0)})
    b = p._bucket("fast.example", 0.0)
    assert b.rate == HostPoliteness.MAX_RATE  # reference MAX_IPS=200 cap


def test_politeness_state_roundtrip():
    p = HostPoliteness(2.0, 3.0)
    p.try_take("a.example", 1.0)
    q = HostPoliteness.from_state(p.state())
    assert q.buckets["a.example"].state() == p.buckets["a.example"].state()


def test_robots_deterministic():
    r1 = RobotsCache(seed=42)
    r2 = RobotsCache(seed=42)
    urls = [f"http://h{i % 7}.example/s{i % 20}/x" for i in range(200)]
    v1 = [r1.allowed(u) for u in urls]
    v2 = [r2.allowed(u) for u in urls]
    assert v1 == v2
    assert any(v1) and not all(v1)  # some allowed, some denied
    # different seed → different rules somewhere
    r3 = RobotsCache(seed=7)
    assert [r3.allowed(u) for u in urls] != v1


def test_robots_per_prefix_consistency():
    r = RobotsCache(seed=42)
    # same host + same first path segment → same verdict
    assert r.allowed("http://h1.example/s3/a") == r.allowed("http://h1.example/s3/b?z=1")
