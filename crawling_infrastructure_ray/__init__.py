"""crawling_infrastructure_ray — a Ray-Data-native crawl data-processing engine.

A from-scratch rebuild (NOT a port) of the query / data-processing
capabilities of NikolaiT/Crawling-Infrastructure (reference at
/root/reference, analyzed in SURVEY.md):

- ``state.frontier``   — sharded URL-frontier actors reproducing the
  reference's MongoDB queue semantics (lease / commit / rollback /
  retry; SURVEY.md §3.2 invariant), plus the north-star additions:
  cuckoo/bloom URL-seen filters, per-host politeness token buckets,
  robots caching, priority heap.
- ``stages``           — ``map_batches`` stages: simulated fetch
  (actor pool), HTML cleaning, link extraction, text analysis, dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, multimodal stubs.
- ``pipelines``        — end-to-end crawl job (wave loop with
  checkpoint/resume) and wide analytics jobs (groupby / sort / join).
- ``sources``          — deterministic synthetic corpus (FIXTURES.md)
  and parquet/text readers.
- ``functions``        — scalar/string/hash helpers mirroring the
  reference's ``lib/misc`` utilities (SURVEY.md §2.9).

Everything is built on public Ray Data / pyarrow APIs only.
"""

__version__ = "0.1.0"
