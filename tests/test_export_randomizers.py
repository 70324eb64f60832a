"""K7 export bundling, M8 randomizer columns, O7 latency stats."""

import json
import tarfile

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawling_infrastructure_ray.functions.randomizers import (
    ACCEPT_LANGUAGES, USER_AGENTS, VIEWPORTS, randomize_batch)
from crawling_infrastructure_ray.pipelines.crawl import (read_documents,
                                                         run_crawl)
from crawling_infrastructure_ray.pipelines.export import export_sample_tar
from crawling_infrastructure_ray.sources.corpus import make_seed_urls


def test_k7_export_sample_tar(ray_session, tmp_path):
    seeds = make_seed_urls(60, seed=42)["url"].to_pylist()
    out = str(tmp_path / "c")
    run_crawl(seeds, seed=42, num_shards=1, dedup=True, max_depth=0,
              items_per_wave=128, out_dir=out)
    docs = read_documents(out)
    tar_path = str(tmp_path / "sample.tar.gz")
    listing = export_sample_tar(docs, tar_path, n=10)
    assert len(listing) == 10
    with tarfile.open(tar_path) as tf:
        members = tf.getnames()
        assert sorted(members) == listing["name"].tolist()
        # member payloads round-trip as span JSON
        doc = json.load(tf.extractfile(members[0]))
        assert {"doc_id", "url", "enqueue_seq", "spans"} <= set(doc)
        assert all({"kind", "text", "media_ref", "offset"} <= set(s)
                   for s in doc["spans"])
    # most-recent semantics: exported seqs are the top-10 of the table
    docs_pdf = docs.to_pandas()
    top = set(docs_pdf.nlargest(10, "enqueue_seq")["doc_id"])
    assert {n[:-5] for n in listing["name"]} == top


def test_m8_randomizers_deterministic_and_uniformish(ray_session):
    seeds = make_seed_urls(400, seed=42)
    ds = rd.from_arrow(seeds.select(["url"]))
    out1 = ds.map_batches(randomize_batch, fn_kwargs={"seed": 42},
                          batch_format="pyarrow").to_pandas().sort_values("url")
    out2 = ds.map_batches(randomize_batch, fn_kwargs={"seed": 42},
                          batch_format="pyarrow").to_pandas().sort_values("url")
    # deterministic across runs (the reference is unseeded; we are not)
    assert out1.reset_index(drop=True).equals(out2.reset_index(drop=True))
    assert set(out1["user_agent"]) <= set(USER_AGENTS)
    assert set(out1["accept_language"]) <= set(ACCEPT_LANGUAGES)
    assert set(zip(out1["viewport_w"], out1["viewport_h"])) <= set(VIEWPORTS)
    # every list member is actually drawn (uniform-ish over 400 urls)
    assert out1["user_agent"].nunique() == len(USER_AGENTS)
    assert out1["viewport_w"].nunique() >= len({v[0] for v in VIEWPORTS}) - 1
    # same url → same draw under a different batch split
    tbl = pa.table({"url": seeds["url"]})
    direct = randomize_batch(tbl, seed=42).to_pandas().sort_values("url")
    assert direct["user_agent"].tolist() == out1["user_agent"].tolist()


def test_o7_latency_stats_matches_numpy(ray_session):
    from crawling_infrastructure_ray.pipelines.analytics import q_o7_latency_stats
    import pandas as pd
    sf = "/root/testdata/sf0.001"
    out = q_o7_latency_stats(sf).to_pandas().sort_values("event_type")
    raw = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    for _, r in out.iterrows():
        v = raw.loc[raw["event_type"] == r["event_type"], "value"].to_numpy()
        assert r["n_lat"] == v.size
        assert r["p50_value"] == np.quantile(v, 0.5, method="inverted_cdf")
        assert r["p95_value"] == np.quantile(v, 0.95, method="inverted_cdf")
        assert r["max_value"] == v.max()


def test_media_ann_and_wave_stats_queries(ray_session):
    """The two newest rows-only queries: media→ANN end-to-end (self is
    rank-1 per query ref) and the per-wave lineage stats."""
    from crawling_infrastructure_ray.pipelines.training import (
        q_crawl_wave_stats, q_media_ann_topk)
    sf = "/root/testdata/sf0.001"
    ann = q_media_ann_topk(sf)
    assert len(ann) == 15 and ann["rank"].max() == 5
    top = ann[ann["rank"] == 1]
    assert (top["query_id"] == top["neighbor_id"]).all()
    assert (top["cosine"] == 1.0).all()
    ws = q_crawl_wave_stats(sf)
    assert len(ws) >= 1
    assert (ws["leased"] >= ws["completed"]).all()
    assert int(ws["completed"].sum()) > 0
