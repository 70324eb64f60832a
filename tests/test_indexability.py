"""Indexability parsing tests (stages/html.py page_indexability)."""

from crawling_infrastructure_ray.functions.hashing import stable_hash64
from crawling_infrastructure_ray.sources.corpus import make_html_page
from crawling_infrastructure_ray.stages.html import page_indexability


def test_meta_robots_attr_order_independent():
    a = page_indexability(
        '<head><meta name="robots" content="noindex, nofollow"></head>'
        '<body><a href="/x">x</a></body>')
    b = page_indexability(
        '<head><meta content="noindex, nofollow" name="robots"></head>'
        '<body><a href="/x">x</a></body>')
    assert a == b
    assert a["noindex"] and a["nofollow"] and a["n_links"] == 1


def test_tokens_case_and_whitespace():
    r = page_indexability('<meta name="robots" content=" NoIndex ">')
    assert r["noindex"] and not r["nofollow"]
    # a non-robots meta must not trigger
    r2 = page_indexability('<meta name="viewport" content="noindex">')
    assert not r2["noindex"]


def test_canonical_and_script_decoy():
    html = ('<head><link href="http://a/canon" rel="canonical"></head>'
            '<body><script>var d = \'<a href="/decoy">x</a>\';</script>'
            '<a href="/real1">1</a><a href="/real2">2</a></body>')
    r = page_indexability(html)
    assert r["canonical"] == "http://a/canon"
    assert r["n_links"] == 2  # decoy inside <script> is not followable


def test_generator_closed_form_roundtrip():
    hits = {"noindex": 0, "nofollow": 0, "canon": 0}
    for i in range(150):
        url = f"http://h{i % 5}.example/p{i:06x}"
        h = stable_hash64(url, 42 ^ 0x4A7B)
        m = h % 100
        r = page_indexability(make_html_page(url, seed=42))
        assert r["noindex"] == (m < 15)
        assert r["nofollow"] == (10 <= m < 25)
        if (h >> 8) % 100 < 20:
            assert r["canonical"].endswith(f"/p{(h >> 16) % (1 << 24):06x}")
            hits["canon"] += 1
        else:
            assert r["canonical"] == ""
        assert r["n_links"] == 2 + (h >> 40) % 4
        hits["noindex"] += r["noindex"]
        hits["nofollow"] += r["nofollow"]
    assert all(v > 0 for v in hits.values())  # corpus hits every branch
