"""Crafted-case tests for the round-3 session-8 operators: ordered
funnel, gaps-and-islands interval merge, connected components, text
normalization, bigram-LM scoring. The parametrized oracle mirror
(test_queries_oracle) hash-checks them against DuckDB; these pin the
SEMANTICS on inputs constructed to hit the edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_order_and_partial_steps(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_events_funnel

    # user 1: full chain in order; user 2: click BEFORE its only view
    # (click must not count -> stuck at view); user 3: purchase before
    # click (purchase must not count); user 4: no view at all (absent)
    rows = [
        (100, 1, "view", 1.0), (200, 1, "click", 1.0),
        (300, 1, "purchase", 1.0),
        (100, 2, "click", 1.0), (200, 2, "view", 1.0),
        (100, 3, "view", 1.0), (150, 3, "purchase", 1.0),
        (200, 3, "click", 1.0),
        (100, 4, "click", 1.0), (200, 4, "purchase", 1.0),
    ]
    out = q_events_funnel(_write_events(tmp_path, rows))
    out = out.set_index("user_id")
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1].tolist() == [100, 200, 300]
    assert out.loc[2].tolist() == [200, -1, -1]
    assert out.loc[3].tolist() == [100, 200, -1]  # purchase@150 < click


def test_funnel_strictly_after(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_events_funnel

    # click at the SAME microsecond as the view does not qualify
    rows = [(100, 1, "view", 1.0), (100, 1, "click", 1.0),
            (101, 1, "click", 1.0)]
    out = q_events_funnel(_write_events(tmp_path, rows))
    assert out.loc[0, "click_us"] == 101


def test_interval_merge_overlap_touch_disjoint(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_interval_coverage

    # value is MINUTES -> dur_us = round(value*100) * 600_000.
    # 0.01 min = 600_000 us exactly.
    us = 600_000
    rows = [
        # user 1: [0, 1u] + [0.5u, 1.5u] overlap -> one island [0, 1.5u];
        # [1.5u, 2.5u] TOUCHES (s == pmax) -> still merged;
        # [10u, 11u] disjoint -> second island
        (0, 1, "view", 0.01), (us // 2, 1, "view", 0.01),
        (us * 3 // 2, 1, "view", 0.01), (10 * us, 1, "view", 0.01),
        # user 2: a single event
        (0, 2, "view", 0.02),
    ]
    out = q_interval_coverage(_write_events(tmp_path, rows)) \
        .set_index("user_id")
    assert out.loc[1, "n_intervals"] == 2
    assert out.loc[1, "covered_us"] == (us * 5 // 2) + us
    assert out.loc[2, "n_intervals"] == 1
    assert out.loc[2, "covered_us"] == 2 * us


def test_host_components_match_brute_union_find(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import (
        HC_SALT, q_host_components)
    from crawling_infrastructure_ray.stages.sampling import row_hash

    # 9 sources (S not divisible by 4 -> wrap mixes residues), 60 docs
    S, n_docs = 9, 60
    sources = [f"h{i}" for i in range(S)]
    doc_ids = np.arange(n_docs, dtype=np.int64)
    src_col = [sources[i % S] for i in range(n_docs)]
    t = pa.table({"doc_id": pa.array(doc_ids),
                  "source": pa.array(src_col, pa.string()),
                  "text": pa.array([""] * n_docs, pa.string()),
                  "lang": pa.array(["en"] * n_docs, pa.string()),
                  "n_chars": pa.array([0] * n_docs, pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = q_host_components(str(tmp_path)).set_index("source")

    # brute union-find over the same deterministic edge rule
    h = row_hash(pa.array(doc_ids), HC_SALT)
    step = 4 * (1 + (h % np.uint64(8)).astype(np.int64))
    nodes = sorted(sources)
    idx = {s: i for i, s in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for d in range(n_docs):
        a = idx[src_col[d]]
        b = (a + step[d]) % len(nodes)
        ra, rb = find(a), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    reps = {s: nodes[find(i)] for s, i in idx.items()}
    sizes = pd.Series(list(reps.values())).value_counts()
    for s in nodes:
        assert out.loc[s, "component_rep"] == reps[s]
        assert out.loc[s, "component_size"] == sizes[reps[s]]


def test_normalize_text_semantics(ray_session):
    from crawling_infrastructure_ray.functions.hashing import stable_hash64
    from crawling_infrastructure_ray.stages.text import normalize_text_batch

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(["He,LLO!!  World-9", "...", None,
                                    "a"], pa.string())})
    out = normalize_text_batch(t).to_pandas().set_index("doc_id")
    # "He,LLO!!  World-9" -> "he llo world 9"
    assert out.loc[0, "n_norm_tokens"] == 4
    assert out.loc[0, "norm_len"] == len("he llo world 9")
    expect = sum(stable_hash64(w) for w in ["he", "llo", "world", "9"]) \
        % (1 << 64)
    assert int(out.loc[0, "tokhash_sum"]) == expect
    # pure punctuation and NULL normalize to empty
    assert (out.loc[1:2, ["n_norm_tokens", "norm_len"]] == 0).all().all()
    assert (out.loc[1:2, "tokhash_sum"] == 0).all()
    assert out.loc[3, "n_norm_tokens"] == 1


WEEK = 604_800_000_000


def test_cohort_retention_triangle(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_cohort_retention

    # user 1: first event week 0, active weeks 0,0,2 (dup week-0
    # activity counts once); user 2: first event week 1, active week 3
    rows = [(10, 1, "view", 1.0), (20, 1, "view", 1.0),
            (2 * WEEK + 5, 1, "view", 1.0),
            (WEEK + 1, 2, "view", 1.0), (3 * WEEK + 1, 2, "view", 1.0)]
    out = q_cohort_retention(_write_events(tmp_path, rows))
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (1, 2): 1}


def test_time_weighted_value_step_semantics(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_time_weighted_value

    # user 1: value 2.00 holds for 100us, then 3.00 for 50us, last
    # event's value holds nothing; user 2: single event -> all zeros
    rows = [(0, 1, "view", 2.0), (100, 1, "view", 3.0),
            (150, 1, "view", 9.0), (0, 2, "view", 5.0)]
    out = q_time_weighted_value(_write_events(tmp_path, rows)) \
        .set_index("user_id")
    assert out.loc[1, "n_segments"] == 2
    assert out.loc[1, "total_us"] == 150
    assert out.loc[1, "tw_value_c_us"] == 100 * 200 + 50 * 300
    assert out.loc[2].tolist() == [0, 0, 0]


def test_value_stats_second_moments(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_value_stats_per_type

    rows = [(0, 1, "view", 1.5), (1, 1, "view", 2.5),
            (2, 1, "click", 10.0)]
    out = q_value_stats_per_type(_write_events(tmp_path, rows)) \
        .set_index("event_type")
    assert out.loc["view", "n_events"] == 2
    assert out.loc["view", "sum_value_c"] == 150 + 250
    assert out.loc["view", "sumsq_value_c2"] == 150 ** 2 + 250 ** 2
    assert out.loc["click", "sumsq_value_c2"] == 1000 ** 2


def test_event_transitions_crafted(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_event_transitions

    # user 1: view->click->view; user 2: click->click; transitions
    # never cross users
    rows = [(0, 1, "view", 1.0), (10, 1, "click", 1.0),
            (20, 1, "view", 1.0),
            (0, 2, "click", 1.0), (10, 2, "click", 1.0)]
    out = q_event_transitions(_write_events(tmp_path, rows))
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("view", "click"): 1, ("click", "view"): 1,
                   ("click", "click"): 1}


def test_dense_rank_ties_share_no_gaps(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_part_price_rank_dense

    t = pa.table({"p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "p_brand": pa.array(["B1"] * 4 + ["B2"], pa.string()),
                  "p_name": pa.array(["x"] * 5, pa.string()),
                  "p_type": pa.array(["t"] * 5, pa.string()),
                  "p_size": pa.array([1] * 5, pa.int32()),
                  "p_retailprice": pa.array(
                      [9.0, 9.0, 5.0, 1.0, 3.0], pa.float64())})
    _pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_part_price_rank_dense(str(tmp_path)).set_index("p_partkey")
    # ties share rank 1; next distinct value takes 2 (dense, no gap)
    assert out.loc[[1, 2, 3, 4], "rank_dense"].tolist() == [1, 1, 2, 3]
    assert out.loc[5, "rank_dense"] == 1


def test_typo_pairs_match_brute_levenshtein(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.functions.hashing import stable_hash64
    from crawling_infrastructure_ray.pipelines.training import \
        q_typo_token_pairs

    # natural pairs: substitution (cat/bat), deletion (cat/cats),
    # plus whatever the deterministic injection adds
    texts = ["cat bat", "cats cat", "dog", "ab"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts), pa.string()),
                  "source": pa.array(["s"] * len(texts), pa.string()),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    _pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_typo_token_pairs(str(tmp_path))
    got = {(r.tok_a, r.tok_b): (r.n_a, r.n_b) for r in out.itertuples()}

    # brute-force mirror: vocab + injection, all pairs, DP levenshtein
    vocab = {}
    for s in texts:
        for w in s.split():
            vocab[w] = vocab.get(w, 0) + 1
    for w in list(vocab):
        if stable_hash64(w) % 3 == 0 and len(w) >= 3:
            v = ("z" + w[1:]) if w[0] == "q" else ("q" + w[1:])
            vocab[v] = vocab.get(v, 0) + 1

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    toks = sorted(vocab)
    want = {(a, b): (vocab[a], vocab[b])
            for i, a in enumerate(toks) for b in toks[i + 1:]
            if lev(a, b) == 1}
    assert ("bat", "cat") in want  # non-degenerate by construction
    assert got == want


def test_mad_outliers_crafted(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_value_outliers_mad

    # values (cents): 100,100,100,200,200,10000 -> med=100 (idx
    # (6-1)//2=2), abs devs 0,0,0,100,100,9900 -> MAD=0... make MAD
    # nonzero: 100,200,300,400,500,99.99k -> med=300, devs
    # 200,100,0,100,200,99600 -> sorted 0,100,100,200,200,99600 ->
    # MAD=100; outliers: dev > 300 -> one
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 996.0]
    rows = [(i, 1, "view", v) for i, v in enumerate(vals)]
    out = q_value_outliers_mad(_write_events(tmp_path, rows)) \
        .set_index("event_type")
    assert out.loc["view", "median_value_c"] == 300
    assert out.loc["view", "mad_c"] == 100
    assert out.loc["view", "n_outliers"] == 1
    assert out.loc["view", "n_events"] == 6


def test_top_terms_concat_rank_order(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.pipelines.training import \
        q_top_terms_concat

    # source s1: 'aa' tf=3, 'bb' tf=2, 'cc' tf=1 (all df=1 -> score
    # order = tf order); concat must follow rank order, not alpha
    texts = ["aa aa aa bb bb cc"]
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"], pa.string()),
                  "source": pa.array(["s1"], pa.string()),
                  "n_chars": pa.array([len(texts[0])], pa.int64())})
    _pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_top_terms_concat(str(tmp_path))
    assert out.loc[0, "terms"] == "aa,bb,cc"
    assert out.loc[0, "n_terms"] == 3


def test_label_centroids_exact_sums(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.pipelines.training import \
        q_label_centroids

    vecs = [[1.0, -2.0], [3.0, 0.5], [10.0, 10.0]]
    labels = [0, 0, 1]
    t = pa.table({"vec_id": pa.array(range(3), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array(labels, pa.int32())})
    _pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_label_centroids(str(tmp_path)).set_index(["label", "dim"])
    assert out.loc[(0, 0), "sum_q_e3"] == 1000 + 3000
    assert out.loc[(0, 1), "sum_q_e3"] == -2000 + 500
    assert out.loc[(1, 0), "sum_q_e3"] == 10000
    assert out.loc[(0, 0), "n_vecs"] == 2
    assert out.loc[(1, 1), "n_vecs"] == 1


def test_host_triangles_match_brute(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.pipelines.training import (
        HC_SALT, q_host_triangles)
    from crawling_infrastructure_ray.stages.sampling import row_hash

    S, n_docs = 7, 80
    sources = [f"h{i}" for i in range(S)]
    doc_ids = np.arange(n_docs, dtype=np.int64)
    src_col = [sources[i % S] for i in range(n_docs)]
    t = pa.table({"doc_id": pa.array(doc_ids),
                  "source": pa.array(src_col, pa.string()),
                  "text": pa.array([""] * n_docs, pa.string()),
                  "lang": pa.array(["en"] * n_docs, pa.string()),
                  "n_chars": pa.array([0] * n_docs, pa.int64())})
    _pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_host_triangles(str(tmp_path)).set_index("source")

    # brute adjacency over the same deterministic edge rule
    h = row_hash(pa.array(doc_ids), HC_SALT)
    step = 4 * (1 + (h % np.uint64(8)).astype(np.int64))
    nodes = sorted(sources)
    idx = {s: i for i, s in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for d in range(n_docs):
        a = idx[src_col[d]]
        b = int((a + step[d]) % len(nodes))
        if a != b:
            A[a, b] = A[b, a] = 1
    tri = np.diag(A @ A @ A) // 2
    assert tri.sum() > 0  # non-degenerate by construction
    for s in nodes:
        assert out.loc[s, "n_triangles"] == tri[idx[s]]
        assert out.loc[s, "degree"] == A[idx[s]].sum()


def test_pareto_frontier_dominance_and_ties(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_part_pareto_frontier

    # brand B1 (price, size): (1,5) frontier; (2,3) frontier;
    # (2,4) dominated by (2,3) same-price; (3,3) dominated by (2,3);
    # (3,2) frontier; duplicates (4,1)x2 both survive (no strict
    # dominance between equals); (5,1) dominated by (4,1)
    pts = [(1, 5), (2, 3), (2, 4), (3, 3), (3, 2), (4, 1), (4, 1),
           (5, 1)]
    t = pa.table({"p_partkey": pa.array(range(len(pts)), pa.int64()),
                  "p_brand": pa.array(["B1"] * len(pts), pa.string()),
                  "p_name": pa.array(["x"] * len(pts), pa.string()),
                  "p_type": pa.array(["t"] * len(pts), pa.string()),
                  "p_size": pa.array([z for _, z in pts], pa.int32()),
                  "p_retailprice": pa.array(
                      [float(p) for p, _ in pts], pa.float64())})
    _pq.write_table(t, str(tmp_path / "part.parquet"))
    out = q_part_pareto_frontier(str(tmp_path))
    assert sorted(out["p_partkey"]) == [0, 1, 4, 5, 6]


def test_hopping_distinct_users_dedups_within_window(ray_session,
                                                     tmp_path):
    from crawling_infrastructure_ray.pipelines.analytics import \
        q_hopping_distinct_users

    h = 3_600_000_000
    # user 1 twice inside hour 1 (dedups); user 2 once; each event
    # lands in windows [hour, hour-1] -> window at hour 0 and hour 1
    # both see {1, 2}
    rows = [(h + 10, 1, "view", 1.0), (h + 20, 1, "view", 1.0),
            (h + 30, 2, "view", 1.0)]
    out = q_hopping_distinct_users(_write_events(tmp_path, rows))
    got = {int(w.value // (h * 1000)): n for w, n in  # .value is ns
           zip(out["window_start"], out["n_users"])}
    assert got == {0: 2, 1: 2}


def test_pps_sample_weighting_bounds(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from crawling_infrastructure_ray.pipelines.training import (
        PPS_SALT, q_pps_sample)
    from crawling_infrastructure_ray.stages.sampling import row_hash

    # n_chars >= 600 -> always kept; n_chars == 0 -> never kept;
    # in between -> exactly when draw < n_chars
    n_chars = [600, 700, 0, 0, 300, 300, 300, 300]
    t = pa.table({"doc_id": pa.array(range(len(n_chars)), pa.int64()),
                  "text": pa.array(["x"] * len(n_chars), pa.string()),
                  "lang": pa.array(["en"] * len(n_chars), pa.string()),
                  "source": pa.array(["s"] * len(n_chars), pa.string()),
                  "n_chars": pa.array(n_chars, pa.int64())})
    _pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_pps_sample(str(tmp_path))
    kept = set(out["doc_id"])
    assert {0, 1} <= kept and not ({2, 3} & kept)
    draws = row_hash(pa.array(np.arange(len(n_chars), dtype=np.int64)),
                     PPS_SALT) % np.uint64(600)
    expect = {i for i, (d, n) in enumerate(zip(draws, n_chars))
              if int(d) < n}
    assert kept == expect


def test_lm_bigram_score_exact(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import \
        q_lm_bigram_score

    texts = ["a b", "a b", "a c", "x", ""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts), pa.string()),
                  "source": pa.array(["s"] * len(texts), pa.string()),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_lm_bigram_score(str(tmp_path)).set_index("doc_id")
    # c(a,b)=2, c(a,c)=1, prefix c(a.)=3
    assert list(out.index) == [0, 1, 2]  # <2-token docs excluded
    assert out.loc[0, "lm_score"] == (10000 * 2) // 3
    assert out.loc[2, "lm_score"] == (10000 * 1) // 3
    assert (out["n_bigrams"] == 1).all()
