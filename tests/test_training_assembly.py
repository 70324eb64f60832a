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
