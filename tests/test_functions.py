import numpy as np
import pytest

from crawling_infrastructure_ray.functions import (
    average, gaussian, format_bytes, time_format, chunk, seeded_rng,
    stable_hash64, md5_id, rolling_fingerprint,
    canonicalize_url, parse_host, truncate_host_labels)


def test_average():
    # reference lib/misc/stats.ts:5-18 — mean, 0 for empty
    assert average([1, 2, 3]) == 2.0
    assert average([]) == 0.0


def test_gaussian_abs_and_seeded():
    rng = seeded_rng(42, "g")
    vals = [gaussian(5.0, 2.0, rng) for _ in range(100)]
    assert all(v >= 0 for v in vals)  # reference takes Math.abs
    rng2 = seeded_rng(42, "g")
    assert vals[0] == gaussian(5.0, 2.0, rng2)


def test_format_bytes():
    assert format_bytes(0) == "0 Bytes"
    assert format_bytes(1024) == "1.00 KB"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(1024 ** 3) == "1.00 GB"


def test_time_format():
    assert time_format(1000) == "1s"
    assert time_format(61_000) == "1m 1s"
    assert time_format(90_061_000) == "1d 1h 1m 1s"


def test_chunk():
    assert chunk([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
    with pytest.raises(ValueError):
        chunk([1], 0)


def test_stable_hash64_stable_and_spread():
    assert stable_hash64("http://a.example/") == stable_hash64("http://a.example/")
    assert stable_hash64("a") != stable_hash64("b")
    assert stable_hash64("a", seed=1) != stable_hash64("a", seed=2)
    # spread over shards is roughly uniform
    buckets = np.zeros(8)
    for i in range(8000):
        buckets[stable_hash64(f"u{i}") % 8] += 1
    assert buckets.min() > 800


def test_md5_id():
    assert md5_id("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_rolling_fingerprint():
    fp1 = rolling_fingerprint("the quick brown fox jumps over the lazy dog")
    fp2 = rolling_fingerprint("the quick brown fox jumps over the lazy dog")
    assert fp1 == fp2 and len(fp1) == 8
    fp3 = rolling_fingerprint("a completely different document body here")
    assert fp1 != fp3
    assert rolling_fingerprint("") == []
    assert len(rolling_fingerprint("short")) == 1


def test_canonicalize_url():
    assert canonicalize_url("HTTP://Example.COM:80/a#frag") == "http://example.com/a"
    assert canonicalize_url("https://x.org:443/") == "https://x.org/"
    assert canonicalize_url("https://x.org:8443/p?q=1") == "https://x.org:8443/p?q=1"
    assert canonicalize_url("http://h1.example") == "http://h1.example/"
    # idempotent
    u = "http://h1.example/p?a=1"
    assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)


def test_parse_host_and_truncate():
    # reference master/other/domain_count.js:41-44
    assert parse_host("http://www.sub.Example.com/x") == "www.sub.example.com"
    assert truncate_host_labels("www.sub.example.com") == "sub.example.com"
    assert truncate_host_labels("example.com") == "example.com"
