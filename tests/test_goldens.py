"""Golden oracles for the formerly rows-only queries (VERDICT item 7).

Each deterministic function gets an INDEPENDENT sequential oracle:
the same math evaluated row-by-row in plain Python/numpy on the
driver, compared exactly against the distributed Ray pipeline over the
real driver testdata. This is the non-SQL analog of the DuckDB gate —
a stored golden would drift; a recomputed sequential oracle cannot.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_golden_text_langid(ray_session, docs_pdf):
    from crawling_infrastructure_ray.pipelines.training import q_text_langid
    from crawling_infrastructure_ray.stages.text import _STOPWORDS
    out = (q_text_langid(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # sequential oracle: stopword hit-count argmax (shared denominator),
    # CJK short-circuit, floor-1e4 integer score
    def oracle(t):
        t = (t or "").lower()
        if any("一" <= c <= "鿿" for c in t[:200]):
            return "zh", 10000
        toks = t.split()
        best_lang, best = "und", 0
        for lang, sw in _STOPWORDS.items():
            hits = sum(1 for w in toks if w in sw)
            if hits > best:
                best_lang, best = lang, hits
        return (best_lang if best > 0 else "und"), \
            (best * 10000) // len(toks) if toks else 0

    g = docs_pdf.sort_values("doc_id").reset_index(drop=True)
    want = [oracle(t) for t in g["text"]]
    assert out["doc_id"].tolist() == g["doc_id"].tolist()
    assert out["lang_pred"].tolist() == [w[0] for w in want]
    assert out["lang_score_e4"].tolist() == [w[1] for w in want]


def test_golden_text_fingerprint(ray_session, docs_pdf):
    """The exploded (doc_id, fp_rank, fp_hash) rows reassemble into
    exactly the sequential rolling_fingerprint per doc."""
    from crawling_infrastructure_ray.functions.hashing import rolling_fingerprint
    from crawling_infrastructure_ray.pipelines.training import q_text_fingerprint
    out = (q_text_fingerprint(SF).to_pandas()
           .sort_values(["doc_id", "fp_rank"]).reset_index(drop=True))
    got = {d: grp["fp_hash"].tolist()
           for d, grp in out.groupby("doc_id", sort=True)}
    g = docs_pdf.sort_values("doc_id").reset_index(drop=True)
    for d, text in zip(g["doc_id"], g["text"]):
        want = rolling_fingerprint(text or "")
        assert got.get(d, []) == want, d


def test_golden_dedup_simhash(ray_session, docs_pdf):
    from crawling_infrastructure_ray.pipelines.training import q_dedup_simhash
    from crawling_infrastructure_ray.stages.dedup import simhash64
    out = (q_dedup_simhash(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    g = docs_pdf.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == g["doc_id"].tolist()
    want = [simhash64(t, 42) for t in g["text"]]
    assert [int(x) for x in out["simhash"]] == want


def test_golden_dedup_simhash_pairs_sound_and_complete(ray_session, docs_pdf):
    """Sequential all-pairs oracle: the 7-block pigeonhole LSH is
    COMPLETE for hamming <= 6, so the pipeline must return EXACTLY
    the brute-force <=6 pair set — no block condition."""
    from crawling_infrastructure_ray.pipelines.training import q_dedup_simhash_pairs
    from crawling_infrastructure_ray.stages.dedup import simhash64
    out = q_dedup_simhash_pairs(SF)
    got = {(a, b): h for a, b, h in zip(out["a"], out["b"], out["hamming"])}

    g = docs_pdf.sort_values("doc_id").reset_index(drop=True)
    ids = [str(x) for x in g["doc_id"]]
    sigs = np.array([simhash64(t, 42) for t in g["text"]], dtype=np.uint64)
    want = {}
    for i in range(len(ids)):
        x = sigs[i] ^ sigs[i + 1:]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for off in np.flatnonzero(ham <= 6):
            j = i + 1 + off
            a, b = sorted((ids[i], ids[j]))
            want[(a, b)] = int(ham[off])
    assert got == want


def test_golden_ann_ivf(ray_session):
    """IVF is approximate by construction → golden properties:
    bit-determinism across runs, rank-consistency, recall vs the exact
    brute oracle, and exactness under nprobe = n_centroids."""
    from crawling_infrastructure_ray.pipelines.training import (
        _load_queries, q_ann_brute_topk, q_ann_ivf_topk)
    from crawling_infrastructure_ray.sources.readers import read_table
    from crawling_infrastructure_ray.stages.simsearch import IVFIndex

    r1 = q_ann_ivf_topk(SF)
    r2 = q_ann_ivf_topk(SF)
    pd.testing.assert_frame_equal(r1, r2)          # deterministic
    assert len(r1) == 40 and r1["rank"].max() == 10
    brute = q_ann_brute_topk(SF)
    bm = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    im = {(r.query_id, r.neighbor_id) for r in r1.itertuples()}
    assert len(bm & im) / len(bm) >= 0.4           # nprobe=3/8 recall floor
    # full probe == exact: IVF with nprobe=n_centroids must equal brute
    q, qids = _load_queries(SF, 4)
    ds = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    index = IVFIndex(ds, n_centroids=8, seed=42)
    full = index.search(q, qids, k=10, nprobe=8)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True),
        brute.reset_index(drop=True), check_dtype=False)


def test_golden_minhash_pairs_sound(ray_session, docs_pdf):
    """Soundness oracle for the MinHash pipeline: every returned pair's
    TRUE token-shingle Jaccard (computed sequentially) must be >= the
    threshold — the verification stage may never let a false positive
    through. (Completeness is probabilistic by LSH design.)"""
    import numpy as np
    from crawling_infrastructure_ray.pipelines.training import q_dedup_minhash_pairs
    from crawling_infrastructure_ray.stages.dedup import _token_shingles
    out = q_dedup_minhash_pairs(SF)
    assert len(out) > 0
    texts = dict(zip(docs_pdf["doc_id"].astype(str), docs_pdf["text"]))
    for a, b, je6 in zip(out["a"], out["b"], out["jaccard_e6"]):
        sa, sb = _token_shingles(texts[a], 3), _token_shingles(texts[b], 3)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        assert inter / union >= 0.4               # threshold holds
        assert je6 == inter * 1_000_000 // union  # reported value exact
