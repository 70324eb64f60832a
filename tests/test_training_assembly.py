"""Training-data assembly operators: incremental shard-vs-corpus dedup
(q_dedup_incremental) and token-budget sequence packing
(q_pack_sequences). The driver oracle-checks both on the synthetic
corpus (which contains no real duplicates); these tests pin the actual
REMOVAL and packing semantics on crafted inputs."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawling_infrastructure_ray.pipelines.training import (
    q_dedup_incremental, q_pack_sequences)


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len().astype("int64")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_incremental_dedup_removes_corpus_and_intra_dups(ray_session,
                                                         tmp_path):
    # ids 0..9 -> split = 9*6//10 = 5: corpus = ids 0-4, increment 5-9
    rows = [{"doc_id": i, "source": "s", "text": f"corpus doc {i}"}
            for i in range(5)]
    rows += [
        {"doc_id": 5, "source": "s", "text": "corpus doc 0"},  # corpus dup
        {"doc_id": 6, "source": "s", "text": "fresh one"},     # kept
        {"doc_id": 7, "source": "s", "text": "fresh one"},     # intra dup
        {"doc_id": 8, "source": "s", "text": "fresh two"},     # kept
        {"doc_id": 9, "source": "s", "text": "corpus doc 3"},  # corpus dup
    ]
    sf = _write_docs(tmp_path, rows)
    kept = q_dedup_incremental(sf).to_pandas()
    assert sorted(kept["doc_id"]) == [6, 8]
    # n_chars rides through the joins untouched
    assert kept.set_index("doc_id")["n_chars"].to_dict() == {
        6: len("fresh one"), 8: len("fresh two")}


def test_pack_sequences_first_crossing_rule(ray_session, tmp_path):
    # source a: token counts 3,3,3 with budget 5 ->
    #   cum_before = 0,3,6 -> packs 0,0,1 (boundary doc stays in pack 0)
    # source b packs independently from offset 0
    rows = [
        {"doc_id": 0, "source": "a", "text": "t t t"},
        {"doc_id": 1, "source": "a", "text": "t t t"},
        {"doc_id": 2, "source": "a", "text": "t t t"},
        {"doc_id": 3, "source": "b", "text": "x x x x"},
        {"doc_id": 4, "source": "b", "text": "x x"},
    ]
    sf = _write_docs(tmp_path, rows)
    out = (q_pack_sequences(sf, budget=5).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [3, 3, 3, 4, 2]
    assert out["pack_id"].tolist() == [0, 0, 1, 0, 0]
    # every pack holds contiguous docs and overflows by at most one doc
    for (_, _), g in out.groupby(["source", "pack_id"]):
        assert g["doc_id"].is_monotonic_increasing


# ----------------------------------------------------------------------
# sampling / splits / decontamination / vocabulary / bins (r03)
# ----------------------------------------------------------------------
import numpy as np
import ray.data as rd

from crawling_infrastructure_ray.stages import sampling as sp


def _ids_in_bucket(pred, n=4, start=0):
    """First n integer doc_ids whose split bucket satisfies pred."""
    out, i = [], start
    while len(out) < n:
        b = int(sp.split_bucket(pa.array([i], pa.int64()))[0])
        if pred(b):
            out.append(i)
        i += 1
    return out


def test_decontaminate_removes_crafted_overlap(ray_session):
    train_ids = _ids_in_bucket(lambda b: b < sp.TRAIN_LT, n=3)
    test_ids = _ids_in_bucket(lambda b: b >= sp.TEST_GE, n=1)
    secret = "w1 w2 w3 w4 w5 w6 w7 w8"          # the contaminating 8-gram
    rows = [
        # contaminated: contains the test doc's 8-gram mid-document
        {"doc_id": train_ids[0], "text": f"x0 {secret} y0"},
        # clean: shares 7 of the 8 tokens in order, but never all 8
        {"doc_id": train_ids[1], "text": "w1 w2 w3 w4 w5 w6 w7 q w8"},
        {"doc_id": train_ids[2], "text": "completely different text"},
        {"doc_id": test_ids[0], "text": f"eval pad {secret} tail"},
    ]
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len().astype("int64")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    kept = sp.decontaminate_ds(ds, k=8).to_pandas()
    assert sorted(kept["doc_id"]) == sorted(train_ids[1:])


def test_mixture_sample_deterministic_and_rate_shaped(ray_session):
    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": ["src%d" % (i % 8) for i in range(n)]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    kept = sp.mixture_sample_ds(ds, sp.source_rate_e6).to_pandas()
    kept2 = sp.mixture_sample_ds(ds, sp.source_rate_e6).to_pandas()
    pd.testing.assert_frame_equal(
        kept.sort_values("doc_id").reset_index(drop=True),
        kept2.sort_values("doc_id").reset_index(drop=True))
    frac = kept.groupby("source").size() / (n / 8)
    for s, f in frac.items():
        want = sp.source_rate_e6(s) / 1e6
        assert abs(f - want) < 0.08, (s, f, want)


def test_length_bins_match_rank_formula(ray_session):
    rng = np.random.default_rng(7)
    n, k = 1000, 8
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "n_chars": rng.integers(10, 60, n, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = sp.length_bins_ds(ds, k_bins=k)
    ref = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    ref["bin"] = (np.arange(n, dtype=np.int64) * k) // n
    want = (ref.groupby("bin", as_index=False)
            .agg(n_docs=("n_chars", "size"), min_chars=("n_chars", "min"),
                 max_chars=("n_chars", "max")))
    pd.testing.assert_frame_equal(got, want.astype("int64"))


def test_vocab_partial_counts_exact():
    batch = pa.table({"text": pa.array(["a b a", "", None, "b  c\tb"])})
    out = sp.vocab_partial_counts(batch).to_pandas()
    got = dict(zip(out["token"], out["n"]))
    assert got == {"a": 2, "b": 3, "c": 1}


def test_repetition_stats_crafted():
    from crawling_infrastructure_ray.stages.text import repetition_stats_batch
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b a b a b",          # 6 toks, 2 distinct; "a b" x3 of 5 bigrams
            "x y z w",              # all distinct, each bigram once
            "q q q q",              # 4 toks 1 distinct; "q q" x3 of 3
            "",                     # empty
            None]),
    })
    out = repetition_stats_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[0].tolist() == [6, 2, 2 * 10000 // 6, 3, 3 * 10000 // 5]
    assert out.loc[1].tolist() == [4, 4, 10000, 1, 1 * 10000 // 3]
    assert out.loc[2].tolist() == [4, 1, 2500, 3, 10000]
    assert out.loc[3].tolist() == [0, 0, 0, 0, 0]
    assert out.loc[4].tolist() == [0, 0, 0, 0, 0]


def test_chunk_batch_boundaries_and_content():
    from crawling_infrastructure_ray.functions.hashing import stable_hash64
    toks65 = " ".join(f"t{i}" for i in range(65))
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", toks65, "", None]),
    })
    out = sp.chunk_batch(batch, window=64, stride=48).to_pandas()
    # doc 0: 3 tokens -> one chunk [0, 3); docs 2/3: nothing
    d0 = out[out.doc_id == 0]
    assert d0[["chunk_id", "start_tok", "n_tok"]].values.tolist() == [[0, 0, 3]]
    want0 = sum(stable_hash64(t) for t in ["a", "b", "c"]) % (1 << 64)
    assert int(d0.tokhash_sum.iloc[0]) == want0
    # doc 1: 65 tokens -> chunks [0,64) and [48,65)
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    assert d1[["chunk_id", "start_tok", "n_tok"]].values.tolist() == \
        [[0, 0, 64], [1, 48, 17]]
    want1 = sum(stable_hash64(f"t{i}") for i in range(48, 65)) % (1 << 64)
    assert int(d1.tokhash_sum.iloc[1]) == want1
    assert set(out.doc_id) == {0, 1}


def test_shuffle_shards_rank_is_key_order(ray_session):
    from crawling_infrastructure_ray.functions.hashing import splitmix64_np
    n = 500
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    out = sp.shuffle_shards_ds(ds, num_shards=8).to_pandas()
    key = splitmix64_np(ids.view(np.uint64) ^ np.uint64(sp.SHUF_SALT))
    want = pd.DataFrame({"doc_id": ids,
                         "shard": (key % np.uint64(8)).astype(np.int64),
                         "shuffle_key": key})
    want["pos_in_shard"] = (want.sort_values(["shuffle_key", "doc_id"])
                            .groupby("shard").cumcount()
                            .reindex(want.index))
    got = out.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert (got["shard"].to_numpy() == want["shard"].to_numpy()).all()
    assert (got["shuffle_key"].to_numpy(dtype=np.uint64)
            == want["shuffle_key"].to_numpy()).all()
    assert (got["pos_in_shard"].to_numpy()
            == want["pos_in_shard"].to_numpy()).all()


def test_sample_per_source_deterministic_reservoir(ray_session, tmp_path):
    from crawling_infrastructure_ray.functions.hashing import splitmix64_np
    from crawling_infrastructure_ray.pipelines.training import \
        q_sample_per_source
    n = 600
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids,
                       "source": [f"src{i % 3}" for i in ids]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = q_sample_per_source(str(tmp_path), k=4).to_pandas()
    draw = splitmix64_np(ids.view(np.uint64) ^ np.uint64(sp.SAMPLE_SALT))
    df["draw"] = draw
    want = (df.sort_values(["source", "draw", "doc_id"])
            .groupby("source").head(4))
    assert len(out) == 12
    got_ids = set(map(tuple, out[["source", "doc_id"]].values))
    assert got_ids == set(map(tuple, want[["source", "doc_id"]].values))
    # rank order inside each source follows the draw
    for s, g in out.groupby("source"):
        g = g.sort_values("sample_rank")
        assert (np.diff(g["draw"].to_numpy(dtype=np.uint64).astype(object))
                > 0).all()


def test_oov_stats_crafted(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_oov_stats
    # "a" x60 dominates; top-1 vocab = {"a"}; everything else is OOV
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a " * 30 + "rare1 rare2",   # 32 toks, 2 oov
                 "a a a",                      # 0 oov
                 "zz yy xx",                   # 3 oov
                 ""],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = (q_oov_stats(str(tmp_path), top=1).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0].tolist() == [32, 2, 2 * 10000 // 32]
    assert out.loc[1].tolist() == [3, 0, 0]
    assert out.loc[2].tolist() == [3, 3, 10000]
    assert out.loc[3].tolist() == [0, 0, 0]


def test_export_partitioned_resumable_skips_finished(ray_session, tmp_path):
    import shutil
    from crawling_infrastructure_ray.sources.storage import \
        export_partitioned_resumable
    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                       "shard": (np.arange(100) % 4).astype(np.int64)})
    out = str(tmp_path / "exp")
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    summary, skipped = export_partitioned_resumable(ds, out, "shard")
    assert sorted(summary["shard"].astype(int)) == [0, 1, 2, 3]
    assert skipped == []
    # simulate a failed run: nuke shard=2 entirely and shard=3's marker
    shutil.rmtree(out + "/shard=2")
    os.remove(out + "/shard=3/_SUCCESS")
    ds2 = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    summary2, skipped2 = export_partitioned_resumable(ds2, out, "shard")
    assert sorted(summary2["shard"].astype(int)) == [2, 3]  # re-written
    assert sorted(map(int, skipped2)) == [0, 1]             # untouched
    # read-back: hive discovery restores shard; content complete
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 100
    assert sorted(back["doc_id"]) == list(range(100))
    assert (back.groupby(back["shard"].astype(int)).size() == 25).all()


def test_host_pagerank_mass_and_determinism(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_host_pagerank
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "source": [f"s{i % 5}" for i in range(300)]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    a = q_host_pagerank(str(tmp_path))
    b = q_host_pagerank(str(tmp_path))
    pd.testing.assert_frame_equal(a, b)          # bit-deterministic
    assert sorted(a["source"]) == [f"s{i}" for i in range(5)]
    assert (a["n_out"] == 60).all()              # every doc emits one edge
    total = a["pagerank_e9"].sum()
    # integer floors only shrink mass: total in ((1-eps)*1e9, 1e9]
    assert 0.98 * 1e9 < total <= 1e9
    # ranks differ across nodes (the hash draw is not uniform per node)
    assert a["pagerank_e9"].nunique() > 1


def test_boilerplate_stats_hot_threshold(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines import training as qt
    n = 200  # 200/3 -> 67 injected boilerplate lines >= BP_MIN_COUNT=50
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # unique body per doc; a pair-shared line would stay below T
        "text": [f"unique body {i} of document" for i in range(n)],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = (qt.q_boilerplate_stats(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    inj = out.index % qt.BP_EVERY == 0
    assert (out.loc[inj, "n_lines"] == 2).all()
    assert (out.loc[inj, "n_boiler"] == 1).all()   # only the injected line
    assert (out.loc[~inj, "n_lines"] == 1).all()
    assert (out.loc[~inj, "n_boiler"] == 0).all()
    # kept chars = the unique body only, never the boilerplate line
    body_len = out.index.map(
        lambda i: len(f"unique body {i} of document")).to_numpy()
    assert (out["n_chars_kept"].to_numpy() == body_len).all()


def test_source_terms_idf_ranking(ray_session, tmp_path):
    from crawling_infrastructure_ray.pipelines.training import q_source_terms
    # "common" appears in every doc (df=8 -> low score); each source
    # has an exclusive marker token (df=4 -> double the score)
    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "source": ["sA"] * 4 + ["sB"] * 4,
        "text": [f"common alpha{'x' if i % 2 else ''}" for i in range(4)]
              + [f"common beta{'x' if i % 2 else ''}" for i in range(4)],
    })
    df["text"] = df["text"].str.replace(r"alphax?", "alpha", regex=True) \
        .str.replace(r"betax?", "beta", regex=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = q_source_terms(str(tmp_path), k=2).to_pandas()
    top = out[out.term_rank == 1].set_index("source")["token"]
    assert top["sA"] == "alpha" and top["sB"] == "beta"
    a = out[(out.source == "sA") & (out.token == "alpha")].iloc[0]
    assert a.tf == 4 and a.df == 4 and a.score == 4 * 8 // 4
    c = out[(out.source == "sA") & (out.token == "common")].iloc[0]
    assert c.score == 4 * 8 // 8
