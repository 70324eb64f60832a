"""Crafted-case tests for the round-3 session-6 operators: hashed
linear classifier, k-NN graph / SemDeDup removal, substring duplicate
windows, grouped distinct / median. The parametrized oracle mirror
(test_queries_oracle) hash-checks them against DuckDB; these pin the
SEMANTICS on inputs constructed to hit the edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _doc_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_classifier_empty_and_null(ray_session):
    from crawling_infrastructure_ray.stages.text import (
        QC_BIAS, QC_MOD, classifier_score_batch)
    from crawling_infrastructure_ray.functions.hashing import stable_hash64

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["hello world", "", None], pa.string())})
    out = classifier_score_batch(t).to_pandas()
    w = lambda tok: (stable_hash64(tok) % QC_MOD) - QC_BIAS
    assert out.loc[0, "logit"] == w("hello") + w("world")
    assert out.loc[0, "n_tokens"] == 2
    # empty and NULL docs: zero tokens, zero logit, keep=0
    assert (out.loc[1:, ["logit", "n_tokens", "keep"]] == 0).all().all()


def test_classifier_multiplicity(ray_session):
    from crawling_infrastructure_ray.stages.text import (
        QC_BIAS, QC_MOD, classifier_score_batch)
    from crawling_infrastructure_ray.functions.hashing import stable_hash64

    out = classifier_score_batch(_doc_table(["a a a b"])).to_pandas()
    w = lambda tok: (stable_hash64(tok) % QC_MOD) - QC_BIAS
    assert out.loc[0, "logit"] == 3 * w("a") + w("b")


def test_knn_graph_exact_and_ties(ray_session):
    import ray.data as rd
    from crawling_infrastructure_ray.stages.simsearch import knn_graph_brute

    # 4 unit-ish vectors: 0 and 1 identical (dot 1e6), 2 orthogonal,
    # 3 = negative of 0
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    t = pa.table({"vec_id": pa.array(range(4), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out = knn_graph_brute(rd.from_arrow(t), k=2).to_pandas()
    out = out.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    # vec 0's nearest is its twin 1 (dot 1e6), then the orthogonal 2
    # (dot 0) beats the antipode 3 (dot -1e6)
    r0 = out[out["vec_id"] == 0]
    assert list(r0["neighbor_id"]) == [1, 2]
    assert list(r0["dot_e6"]) == [1_000_000, 0]
    # tie-break: vec 2 sees dots 0 from all three -> neighbor ids asc
    r2 = out[out["vec_id"] == 2]
    assert list(r2["neighbor_id"]) == [0, 1]


def test_semdedup_removes_cluster_keeps_least(ray_session):
    import ray
    import duckdb
    # crafted embeddings parquet: 0,1,2 near-identical; 3,4 distinct
    import tempfile, os
    import pyarrow.parquet as pq
    from crawling_infrastructure_ray.pipelines.training import (
        q_semdedup_remove)

    rng = np.random.default_rng(7)
    base = rng.standard_normal(8).astype(np.float32)
    vecs = [base, base * 1.001, base * 0.999,
            rng.standard_normal(8).astype(np.float32),
            rng.standard_normal(8).astype(np.float32)]
    vecs = [v / np.linalg.norm(v) for v in vecs]
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 5, pa.int32())}),
        os.path.join(d, "embeddings.parquet"))
    kept = q_semdedup_remove(d, k=2, threshold_e6=900_000)
    if hasattr(kept, "to_pandas"):
        kept = kept.to_pandas()
    kept_ids = sorted(int(x) for x in kept["vec_id"])
    # the near-identical cluster {0,1,2} keeps only its least id
    assert 0 in kept_ids and 1 not in kept_ids and 2 not in kept_ids
    assert 3 in kept_ids and 4 in kept_ids


def test_dup_windows_any_alignment(ray_session):
    import ray.data as rd
    from crawling_infrastructure_ray.stages.dedup import dup_window_stats

    span = " ".join(f"tok{i}" for i in range(16))     # 16-token span
    texts = [
        "x y z " + span,                  # span at offset 3
        span + " p q",                    # span at offset 0
        " ".join(f"other{i}" for i in range(20)),   # no dup
        "short doc",                      # < 16 tokens -> 0 windows
    ]
    out = dup_window_stats(rd.from_arrow(_doc_table(texts))).to_pandas()
    out = out.set_index("doc_id").sort_index()
    # doc 0: 19 tokens -> 4 windows, exactly 1 (the span) duplicated
    assert out.loc[0, "n_windows"] == 4 and out.loc[0, "n_dup_windows"] == 1
    # doc 1: 18 tokens -> 3 windows, 1 duplicated
    assert out.loc[1, "n_windows"] == 3 and out.loc[1, "n_dup_windows"] == 1
    assert out.loc[2, "n_dup_windows"] == 0
    assert out.loc[3, "n_windows"] == 0


def test_rolling_hash_matches_direct(ray_session):
    """The O(1)-sliding prefix computation equals the direct
    positional polynomial."""
    from crawling_infrastructure_ray.stages.dedup import (
        RK_P, window_hash_batch)
    from crawling_infrastructure_ray.functions.hashing import stable_hash64

    toks = [f"w{i}" for i in range(20)]
    out = window_hash_batch(_doc_table([" ".join(toks)]),
                            window=16).to_pandas()
    th = [stable_hash64(t) for t in toks]
    direct = []
    for i in range(5):
        h = 0
        for j in range(16):
            h = (h + th[i + j] * pow(RK_P, 15 - j, 1 << 64)) % (1 << 64)
        direct.append(h)
    got = out["whash"].to_numpy().astype(np.int64).view(np.uint64)
    assert [int(x) for x in got] == direct


def test_median_per_type_even_odd(ray_session):
    from crawling_infrastructure_ray.pipelines.analytics import (
        q_median_value_per_type)
    import duckdb
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    # type A: 4 values (even n -> lower middle); type B: 3 values
    vals = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
            ("B", 10.0), ("B", 20.0), ("B", 30.0)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([0] * len(vals), pa.timestamp("us")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array([v[0] for v in vals], pa.string()),
        "value": pa.array([v[1] for v in vals], pa.float64()),
        "props": pa.array(["{}"] * len(vals), pa.string())}),
        os.path.join(d, "events.parquet"))
    out = q_median_value_per_type(d).set_index("event_type")
    assert out.loc["A", "median_value_c"] == 200    # lower middle of 4
    assert out.loc["B", "median_value_c"] == 2000


def test_salted_semi_join_equal_and_balanced(ray_session):
    import ray.data as rd
    from crawling_infrastructure_ray.stages.joins import (
        _tagged_union, bucketed_anti_join, bucketed_semi_join)

    # 90% of rows carry one hot key — the skew the salt path exists for
    n = 2000
    keys = ["hot.example"] * (n * 9 // 10) + \
           [f"h{i}.example" for i in range(n - n * 9 // 10)]
    data = rd.from_arrow(pa.table({
        "host": pa.array(keys, pa.string()),
        "row": pa.array(range(n), pa.int64())}))
    keep = rd.from_arrow(pa.table({
        "host": pa.array(["hot.example", "h3.example"], pa.string())}))

    plain = bucketed_semi_join(data, keep, on="host").to_pandas()
    salted = bucketed_semi_join(data, keep, on="host", salt=8).to_pandas()
    key = ["host", "row"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True)[key],
        salted.sort_values(key).reset_index(drop=True)[key])

    plain_a = bucketed_anti_join(data, keep, on="host").to_pandas()
    salted_a = bucketed_anti_join(data, keep, on="host", salt=8).to_pandas()
    pd.testing.assert_frame_equal(
        plain_a.sort_values(key).reset_index(drop=True)[key],
        salted_a.sort_values(key).reset_index(drop=True)[key])

    # balance: the hot key's DATA rows spread across 8 sub-buckets,
    # so no single shuffle group holds more than ~1/8 of them (+ the
    # uniform remainder); unsalted, one group holds >= 90%
    tu = _tagged_union(data, keep, "host", 64, 8).to_pandas()
    d = tu[~tu["is_key"]]
    top_share = d.groupby("jbucket").size().max() / len(d)
    assert top_share < 0.25, top_share
    tu1 = _tagged_union(data, keep, "host", 64, 1).to_pandas()
    d1 = tu1[~tu1["is_key"]]
    assert d1.groupby("jbucket").size().max() / len(d1) >= 0.9


def test_dup_window_remove_coverage(ray_session):
    import ray.data as rd
    from crawling_infrastructure_ray.functions.hashing import stable_hash64
    from crawling_infrastructure_ray.stages.dedup import (
        dup_window_remove_stats)

    span = " ".join(f"tok{i}" for i in range(16))     # shared 16-token span
    texts = [
        "x y z " + span,                  # span covers tokens 3..18
        span + " p q",                    # span covers tokens 0..15
        " ".join(f"other{i}" for i in range(20)),   # untouched
        "short doc",                      # < 16 tokens, nothing to cover
        "",                               # empty
    ]
    out = dup_window_remove_stats(
        rd.from_arrow(_doc_table(texts))).to_pandas()
    out = out.set_index("doc_id").sort_index()

    def wsum(toks):
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for t in toks:
                acc += np.uint64(stable_hash64(t))
        return acc

    # doc 0: exactly the 16 span tokens stripped, x y z survive
    assert out.loc[0, "n_tokens"] == 19 and out.loc[0, "n_covered"] == 16
    assert np.uint64(out.loc[0, "kept_sum"]) == wsum(["x", "y", "z"])
    # doc 1: p q survive
    assert out.loc[1, "n_tokens"] == 18 and out.loc[1, "n_covered"] == 16
    assert np.uint64(out.loc[1, "kept_sum"]) == wsum(["p", "q"])
    # doc 2: nothing covered, kept_sum over all tokens
    assert out.loc[2, "n_covered"] == 0
    assert np.uint64(out.loc[2, "kept_sum"]) == wsum(
        [f"other{i}" for i in range(20)])
    # doc 3/4: too short / empty -> zero coverage (and doc 4 zero toks)
    assert out.loc[3, "n_covered"] == 0 and out.loc[3, "n_tokens"] == 2
    assert out.loc[4, "n_tokens"] == 0 and out.loc[4, "kept_sum"] == 0


def test_dup_window_remove_overlapping_spans(ray_session):
    """Two OVERLAPPING duplicated windows must union their coverage,
    not double-count: doc A shares tokens 0..15 with doc B and tokens
    1..16 with doc C -> A's covered set is 0..16 (17 tokens)."""
    import ray.data as rd
    from crawling_infrastructure_ray.stages.dedup import (
        dup_window_remove_stats)

    base = [f"w{i}" for i in range(17)]               # 17 tokens -> 2 windows
    texts = [
        " ".join(base),                                # A: both windows hot
        " ".join(base[:16]) + " zzz",                  # B shares window 0
        "aaa " + " ".join(base[1:]),                   # C shares window 1
    ]
    out = dup_window_remove_stats(
        rd.from_arrow(_doc_table(texts))).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[0, "n_covered"] == 17               # union, not 32
    assert out.loc[1, "n_covered"] == 16
    assert out.loc[2, "n_covered"] == 16
