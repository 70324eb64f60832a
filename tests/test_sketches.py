import numpy as np

from crawling_infrastructure_ray.functions.sketches import HyperLogLog


def test_hll_accuracy():
    h = HyperLogLog(p=12)
    h.add(f"user{i}" for i in range(10_000))
    est = h.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05   # ~1.6% stderr at p=12


def test_hll_merge_equals_union():
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add(f"x{i}" for i in range(5000))
    b.add(f"x{i}" for i in range(2500, 7500))  # 50% overlap
    a.merge(b)
    est = a.estimate()
    assert abs(est - 7500) / 7500 < 0.05


def test_hll_state_roundtrip():
    h = HyperLogLog(p=12)
    h.add(f"k{i}" for i in range(1000))
    g = HyperLogLog.from_state(h.state(), p=12)
    assert g.estimate() == h.estimate()


def test_hll_small_cardinality_linear_counting():
    h = HyperLogLog(p=12)
    h.add(["a", "b", "c"])
    assert 2 <= h.estimate() <= 4
