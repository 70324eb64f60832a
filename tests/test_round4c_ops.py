"""Crafted-case tests for the round-4 continuation operators: KMV set
sketches (exactness when unsaturated), SymSpell ed-1 URL pairing (the
vectorized verifier's edge cases), and the JL ±1 projection (sign
determinism + the one-hot ratio invariant). The parametrized oracle
mirror (test_queries_oracle) hash-checks the full queries against
DuckDB; these pin SEMANTICS on inputs constructed to hit the edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[0]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_ed1_verify_edges():
    """Exact ed-1 verifier: substitution / head / middle / tail
    insertion pass; equal strings, ed-2, and transpositions fail."""
    from crawling_infrastructure_ray.pipelines.training import \
        _ed1_verify
    pairs = pd.DataFrame({
        "url_a": ["abcdef",    # one substitution        -> keep
                  "abcdef",    # tail insertion           -> keep
                  "abcdef",    # head insertion           -> keep
                  "abcdef",    # middle insertion         -> keep
                  "abcdef",    # two substitutions        -> drop
                  "abcdef",    # transposition (ed 2)     -> drop
                  "abcdef",    # len diff 2               -> drop
                  "abcdef"],   # final-char substitution  -> keep
        "url_b": ["abXdef",
                  "abcdefX",
                  "Xabcdef",
                  "abcXdef",
                  "aXcdeX",
                  "abdcef",
                  "abcdefXX",
                  "abcdeX"],
    })
    got = _ed1_verify(pairs)
    kept = set(got["url_b"])
    assert kept == {"abXdef", "abcdefX", "Xabcdef", "abcXdef",
                    "abcdeX"}  # last: substitution of final char
    assert (got["ed"] == 1).all()


def test_ed1_verify_deletion_orientation():
    """Length-diff pairs verify identically regardless of which side
    is shorter (the verifier re-orients internally)."""
    from crawling_infrastructure_ray.pipelines.training import \
        _ed1_verify
    pairs = pd.DataFrame({"url_a": ["abcdefg"], "url_b": ["abcdef"]})
    got = _ed1_verify(pairs)
    assert len(got) == 1 and got["ed"].iloc[0] == 1


def test_kmv_exact_when_unsaturated(tmp_path, ray_session):
    """Sources with < k distinct tokens: the KMV sketch IS the token
    set, so jaccard_kmv and union_est are EXACT."""
    from crawling_infrastructure_ray.pipelines.training import \
        q_kmv_source_jaccard
    rows = [("a b c d", "s1"), ("c d e f", "s2"), ("a b", "s1"),
            ("g h", "s3")]
    sf = _write_docs(tmp_path, rows)
    out = q_kmv_source_jaccard(sf)
    out = out.set_index(["src_a", "src_b"])
    r12 = out.loc[("s1", "s2")]
    # s1 = {a,b,c,d}, s2 = {c,d,e,f}: J = 2/6, union = 6
    assert r12["n_inter"] == 2 and r12["k_used"] == 6
    assert abs(r12["jaccard_kmv"] - 2.0 / 6.0) < 1e-12
    assert r12["union_est"] == 6.0
    r13 = out.loc[("s1", "s3")]
    assert r13["n_inter"] == 0 and r13["union_est"] == 6.0


def test_jl_signs_deterministic_and_onehot_ratio():
    """Sign matrix is a pure function of dim; a one-hot e3 vector has
    per-vector ratio exactly 1 (each proj component is ±q)."""
    from crawling_infrastructure_ray.pipelines.training import (
        JL_DOUT, _jl_signs)
    s1, s2 = _jl_signs(64), _jl_signs(64)
    assert s1 is s2 and set(np.unique(s1)) == {-1, 1}
    q = np.zeros((1, 64), np.int64)
    q[0, 7] = 1000
    proj = q @ s1
    assert (np.abs(proj) == 1000).all()
    ratio = float((proj * proj).sum()) / (16.0 * float((q * q).sum()))
    assert ratio == 1.0
    assert s1.shape == (64, JL_DOUT)
