"""Crafted-case tests for the rank-statistics family (AUC, KS,
Spearman, chi-square, Gini): tiny corpora constructed so the exact
tie-handling arithmetic has a hand-computable answer. The parametrized
oracle mirror (test_queries_oracle) hash-checks the full queries
against DuckDB; these pin SEMANTICS at the edges (ties, perfect
separation, independence, equality)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: list of (event_type, value, hour)."""
    n = len(rows)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([int(h) * 3_600_000_000 for _, _, h in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([float(r[1]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_auc_tie_averaging(tmp_path, ray_session):
    """purchase values {0.03, 0.01} vs click {0.02, 0.02}: one win
    each way through the tied middle -> AUC exactly 0.5 via the
    doubled tie-averaged rank sum."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_auc_mannwhitney
    sf = _write_events(tmp_path, [
        ("purchase", 0.03, 0), ("purchase", 0.01, 1),
        ("click", 0.02, 2), ("click", 0.02, 3),
        ("error", 9.99, 4),  # other types must be ignored
    ])
    out = q_auc_mannwhitney(sf).iloc[0]
    assert out["n_pos"] == 2 and out["n_neg"] == 2
    # R1*2 = 2*(4 + 1) = 10; U*2 = 10 - 2*3 = 4; AUC = 4/8
    assert out["u_x2"] == 4
    assert out["auc"] == 0.5


def test_auc_perfect_separation(tmp_path, ray_session):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_auc_mannwhitney
    sf = _write_events(tmp_path, [
        ("purchase", 5.0, 0), ("purchase", 6.0, 1),
        ("click", 1.0, 2), ("click", 2.0, 3)])
    out = q_auc_mannwhitney(sf).iloc[0]
    assert out["auc"] == 1.0


def test_ks_identical_and_disjoint(tmp_path, ray_session):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_ks_test_value
    # identical value multisets -> D = 0
    sf = _write_events(tmp_path, [
        ("purchase", 1.0, 0), ("purchase", 2.0, 0),
        ("error", 1.0, 1), ("error", 2.0, 1)])
    out = q_ks_test_value(sf).iloc[0]
    assert out["d_num"] == 0 and out["ks_stat"] == 0.0


def test_ks_disjoint_supports(tmp_path, ray_session):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_ks_test_value
    sf = _write_events(tmp_path, [
        ("purchase", 1.0, 0), ("purchase", 2.0, 0),
        ("error", 5.0, 1), ("error", 6.0, 1), ("error", 7.0, 1)])
    out = q_ks_test_value(sf).iloc[0]
    # supports disjoint -> sup|F1-F2| = 1 -> d_num = n1*n2
    assert out["d_num"] == out["n_a"] * out["n_b"]
    assert out["ks_stat"] == 1.0


def _write_lineitem(tmp_path, qd):
    """qd: list of (quantity, discount)."""
    t = pa.table({
        "l_quantity": pa.array([float(q) for q, _ in qd], pa.float64()),
        "l_discount": pa.array([float(d) for _, d in qd], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_spearman_monotone(tmp_path, ray_session):
    """Strictly increasing pairing, no ties -> rho = 1 exactly."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_spearman_rank_corr
    sf = _write_lineitem(tmp_path,
                         [(1, 0.01), (2, 0.02), (3, 0.05), (4, 0.08)])
    out = q_spearman_rank_corr(sf).iloc[0]
    assert out["n"] == 4
    assert abs(out["rho"] - 1.0) < 1e-15


def test_spearman_reversed_with_ties(tmp_path, ray_session):
    """Anti-monotone with a tie block: rho matches the closed-form
    tie-corrected Pearson-on-ranks value (hand-checked -0.9486...;
    scipy's spearmanr agrees on this input)."""
    import math
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_spearman_rank_corr
    sf = _write_lineitem(tmp_path,
                         [(1, 0.08), (2, 0.05), (3, 0.02), (3, 0.01)])
    out = q_spearman_rank_corr(sf).iloc[0]
    # ranks q: 1,2,3.5,3.5 ; ranks d: 4,3,2,1 -> Pearson on ranks
    x = np.array([1.0, 2.0, 3.5, 3.5])
    y = np.array([4.0, 3.0, 2.0, 1.0])
    expect = float(np.corrcoef(x, y)[0, 1])
    assert math.isclose(out["rho"], expect, rel_tol=1e-12)


def test_chi2_independent_is_zero(tmp_path, ray_session):
    """Perfectly proportional type x hour counts: O*N == R*C in every
    cell -> chi2_e6 exactly 0 everywhere (including the grid cells)."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_chi2_type_hour
    rows = []
    for h, mult in [(0, 1), (1, 2)]:  # hour 1 carries 2x the traffic
        rows += [("click", 1.0, h)] * (2 * mult)
        rows += [("view", 1.0, h)] * (1 * mult)
    sf = _write_events(tmp_path, rows)
    out = q_chi2_type_hour(sf)
    assert len(out) == 4  # 2 types x 2 observed hours
    assert (out["chi2_e6"] == 0).all()
    assert int(out["o"].sum()) == len(rows)


def test_chi2_zero_cell_counted(tmp_path, ray_session):
    """A type absent from one hour still yields a grid row with o=0
    and positive chi2 mass."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_chi2_type_hour
    sf = _write_events(tmp_path, [
        ("click", 1.0, 0), ("click", 1.0, 0),
        ("view", 1.0, 1), ("view", 1.0, 1)])
    out = q_chi2_type_hour(sf).set_index(["event_type", "hour"])
    assert out.loc[("click", 1), "o"] == 0
    # O=0, N=4, R=2, C=2 -> (0-4)^2 * 1e6 // (4*2*2) = 1e6
    assert out.loc[("click", 1), "chi2_e6"] == 1_000_000


def _write_orders(tmp_path, totals):
    t = pa.table({
        "o_custkey": pa.array(range(len(totals)), pa.int64()),
        "o_totalprice": pa.array([float(x) for x in totals],
                                 pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_gini_equal_is_zero(tmp_path, ray_session):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_gini_revenue
    sf = _write_orders(tmp_path, [5.0, 5.0, 5.0])
    out = q_gini_revenue(sf).iloc[0]
    assert out["gini"] == 0.0
    assert out["n_customers"] == 3 and out["total_cents"] == 1500


def test_gini_known_value(tmp_path, ray_session):
    """Totals (1, 3) -> G = 0.25 (classic two-point Gini)."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_gini_revenue
    sf = _write_orders(tmp_path, [0.01, 0.03])
    out = q_gini_revenue(sf).iloc[0]
    assert out["gini"] == 0.25


def test_gini_multi_order_customers(tmp_path, ray_session):
    """Per-customer totals aggregate across orders before ranking."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_gini_revenue
    t = pa.table({
        "o_custkey": pa.array([0, 0, 1], pa.int64()),
        "o_totalprice": pa.array([0.01, 0.02, 0.01], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_gini_revenue(str(tmp_path)).iloc[0]
    # totals (3, 1) after the per-customer fold
    assert out["n_customers"] == 2 and out["gini"] == 0.25


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["x"] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([1] * len(rows), pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_clustering_coefficient_bounds(tmp_path, ray_session):
    """cc_e6 in [0, 1e6]; deg<2 nodes report 0; a complete triangle
    (if formed) reports exactly 1e6."""
    from crawling_infrastructure_ray.pipelines.training import \
        q_host_clustering
    rows = [(i, f"s{i % 6}") for i in range(60)]
    out = q_host_clustering(_write_docs(tmp_path, rows))
    assert (out["cc_e6"] >= 0).all() and (out["cc_e6"] <= 1_000_000).all()
    low = out[out["degree"] < 2]
    assert (low["cc_e6"] == 0).all()


def test_link_prediction_excludes_adjacent(tmp_path, ray_session):
    """Every emitted pair is NON-adjacent under the LP draw, ordered
    a < b, with >= 1 common neighbor and jaccard_e6 in (0, 1e6]."""
    from crawling_infrastructure_ray.pipelines.training import \
        q_link_prediction
    rows = [(i, f"s{i % 12}") for i in range(240)]
    out = q_link_prediction(_write_docs(tmp_path, rows))
    if len(out):
        assert (out["src_a"] < out["src_b"]).all()
        assert (out["n_common"] >= 1).all()
        assert (out["jaccard_e6"] > 0).all()
        assert (out["jaccard_e6"] <= 1_000_000).all()


def test_theil_sen_known_median(tmp_path, ray_session):
    """User with purchases at (hour,cents) (0,0),(1,2),(2,2):
    pairwise slopes {2, 1, 0} -> lower median 1 selected as the
    exact rational (2, 2)."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_theil_sen_trend, REGR_EPOCH_US
    rows = [(0, 0.00), (1, 0.02), (2, 0.02)]
    t = pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([REGR_EPOCH_US + h * 3_600_000_000
                        for h, _ in rows], pa.timestamp("us")),
        "user_id": pa.array([7] * 3, pa.int64()),
        "event_type": pa.array(["purchase"] * 3, pa.string()),
        "value": pa.array([v for _, v in rows], pa.float64()),
        "props": pa.array(["{}"] * 3, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_theil_sen_trend(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["user_id"] == 7 and r["n_pairs"] == 3
    assert (r["med_num"], r["med_den"]) == (2, 2)


def test_theil_sen_vertical_pairs_excluded(tmp_path, ray_session):
    """Two purchases in the SAME hour contribute no pair; a user with
    only same-hour events is absent."""
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_theil_sen_trend, REGR_EPOCH_US
    t = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([REGR_EPOCH_US + 100, REGR_EPOCH_US + 200],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["purchase"] * 2, pa.string()),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "props": pa.array(["{}"] * 2, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_theil_sen_trend(str(tmp_path))
    assert len(out) == 0


def test_weighted_sample_small_corpus_returns_all(tmp_path,
                                                  ray_session):
    """Corpus smaller than k: every doc is selected, sorted by id."""
    from crawling_infrastructure_ray.pipelines.training import \
        q_weighted_sample_aes
    t = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "n_chars": pa.array([50 + i for i in range(10)], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_weighted_sample_aes(str(tmp_path))
    assert list(out["doc_id"]) == list(range(10))


def test_embedding_covariance_orthonormal(tmp_path, ray_session):
    """Two axis-aligned unit vectors: cov numerators are (1e6, -1e6,
    1e6) for cells (0,0), (0,1), (1,1)."""
    from crawling_infrastructure_ray.pipelines.training import \
        q_embedding_covariance
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_embedding_covariance(str(tmp_path)) \
        .set_index(["i", "j"])["cov_num"]
    assert out.loc[(0, 0)] == 1_000_000
    assert out.loc[(0, 1)] == -1_000_000
    assert out.loc[(1, 1)] == 1_000_000
