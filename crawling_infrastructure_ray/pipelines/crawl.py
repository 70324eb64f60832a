"""End-to-end crawl job: frontier → FetchSim actor pool → documents.

Rebuild of the reference's main path (SURVEY.md §3.1): scheduler
daemon launches waves of ephemeral workers, each worker leases a batch
from the queue, crawls sequentially, persists blobs to S3, writes back
statuses, and the daemon heals/retries between waves
(master/scheduler/daemon.ts:308-391, crawler/src/index.ts:69-173).

Here one **wave** = one synchronized lease across all frontier shards
→ one ``ray.data.Dataset`` mapped through the FetchSim actor pool
(``map_batches(FetchSim, concurrency=N, batch_format="pyarrow")``) →
one parquet fragment of the documents table + per-lease commits +
discovered-URL tail appends. Waves stream: only one wave's results are
ever materialized (bounded by ``items_per_wave``); the documents table
accumulates as one parquet file per wave (resumable layout — a rerun
skips finished waves).

Ray-level retries are disabled on the fetch stage (``max_retries=0``
mirror of the reference's deliberate Lambda ``maxRetries: 0``,
master/scheduler/runner.ts:449-452): the frontier is the single retry
authority (SURVEY.md §7.4).

Determinism: after each wave the fetched rows are sorted by
``enqueue_seq`` before commits and discovered-URL appends, so the
final frontier state, documents table, and crawl order are independent
of Ray's block scheduling.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.hashing import stable_hash64
from ..sources.corpus import spans_arrow_type
from ..stages.fetch import FetchSim, fetch_sim_batch
from ..state.frontier import Frontier

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("enqueue_seq", pa.uint64()),
    ("url_hash_part", pa.uint16()),  # explicit hash partition key (north rule)
    ("wave", pa.int32()),
    ("spans", spans_arrow_type()),
])


@dataclass
class CrawlResult:
    out_dir: str
    waves: int
    histogram: dict
    counters: dict
    seen_set_size: int
    docs_written: int
    elapsed_sec: float
    urls_processed: int = 0
    lineage: list = field(default_factory=list)

    @property
    def throughput(self) -> float:
        """URLs scheduled+fetched per second (BASELINE.json metric)."""
        return self.urls_processed / self.elapsed_sec if self.elapsed_sec else 0.0


def _atomic_write_parquet(tbl: pa.Table, path: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)


def _append_manifest(path: str, row: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")


def _read_manifest(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def run_crawl(seed_urls: list[str] | None = None, *,
              frontier: Frontier | None = None,
              seed: int = 42,
              num_shards: int = 1,
              dedup: bool = True,
              politeness: bool = False,
              robots: bool = False,
              default_rate: float = 1.0,
              max_depth: int = 2,
              max_retries: int = 3,
              num_hosts: int = 64,
              items_per_wave: int = 4096,
              fetch_concurrency: int = 4,
              batch_size: int = 1024,
              out_dir: str = "/tmp/crawl_out",
              resume: bool = False,
              checkpoint_every: int = 0,
              max_waves: int | None = None,
              now_fn=None,
              use_actors: bool = False,
              preserve_order: bool = True) -> CrawlResult:
    """Run a crawl to drain (or ``max_waves``). Returns CrawlResult.

    ``resume=True`` restores the frontier from ``out_dir/ckpt`` and
    skips waves whose parquet fragments already exist (north rule:
    a killed run resumes exactly).
    """
    docs_dir = os.path.join(out_dir, "documents")
    claims_dir = os.path.join(out_dir, "claims")
    ckpt_dir = os.path.join(out_dir, "ckpt")
    manifest = os.path.join(out_dir, "manifest.jsonl")

    start_wave = 0
    if resume and os.path.exists(os.path.join(ckpt_dir, "frontier.pkl")):
        frontier = Frontier.restore(ckpt_dir)
        done = _read_manifest(manifest)
        ckpt_wave = max((r["wave"] for r in done if r.get("checkpointed")), default=-1)
        start_wave = ckpt_wave + 1
        # drop fragments from waves after the checkpoint (uncommitted work)
        for d in (docs_dir, claims_dir):
            if os.path.isdir(d):
                for f in os.listdir(d):
                    if f.startswith("wave_") and int(f[5:10]) >= start_wave:
                        os.remove(os.path.join(d, f))
        # truncate manifest to the checkpoint
        kept = [r for r in done if r["wave"] < start_wave]
        with open(manifest, "w") as fh:
            for r in kept:
                fh.write(json.dumps(r) + "\n")
    else:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(docs_dir, exist_ok=True)
        if frontier is None:
            frontier = Frontier(num_shards, seed=seed, dedup=dedup,
                                politeness=politeness, robots=robots,
                                default_rate=default_rate,
                                max_retries=max_retries, order="fifo")
        if seed_urls:
            frontier.enqueue(seed_urls)

    t0 = time.perf_counter()
    wave = start_wave
    urls_processed = 0
    docs_written = 0
    lineage = []
    n_per_shard = max(1, items_per_wave // frontier.num_shards)

    while True:
        if max_waves is not None and wave - start_wave >= max_waves:
            break
        now = now_fn() if now_fn else None
        leases = frontier.lease_wave(n_per_shard, now)
        if not leases:
            # between-wave healing (reference daemon cycle: R1 retry gate)
            if frontier.retry_failed() > 0:
                continue
            if frontier.expire_leases(now) > 0:
                continue
            break
        wave_t0 = time.perf_counter()
        # one Arrow table for the wave, tagged with routing metadata
        parts = []
        for lease in leases:
            n = len(lease["seq"])
            parts.append(pa.table({
                "enqueue_seq": pa.array(lease["seq"], pa.uint64()),
                "url": pa.array(lease["url"], pa.string()),
                "host": pa.array(lease["host"], pa.string()),
                "depth": pa.array(lease["depth"], pa.int32()),
                "retries": pa.array(lease["retries"], pa.int32()),
                "attempt": pa.array(lease["attempt"], pa.int32()),
                "shard": pa.array([lease["shard"]] * n, pa.int32()),
                "lease_id": pa.array([lease["lease_id"]] * n, pa.int64()),
            }))
        wave_tbl = pa.concat_tables(parts)
        # claims audit log — the engine's crawl order (golden-order test;
        # within a wave, claim order = ascending enqueue_seq, §3.2)
        claims_tbl = wave_tbl.select(["enqueue_seq", "url", "attempt"]).sort_by("enqueue_seq")
        claims_tbl = claims_tbl.append_column("wave", pa.array([wave] * claims_tbl.num_rows, pa.int32()))
        _atomic_write_parquet(claims_tbl, os.path.join(claims_dir, f"wave_{wave:05d}.parquet"))

        ds = rd.from_arrow(wave_tbl)
        if use_actors:
            # actor-pool form — what a real stateful fetcher (session /
            # browser, A1/A2) uses; per-wave pool startup makes it the
            # slower choice for the stateless simulated fetch
            fetched_ds = ds.map_batches(
                FetchSim,
                fn_constructor_kwargs={"seed": seed, "max_depth": max_depth,
                                       "num_hosts": num_hosts},
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=fetch_concurrency, num_cpus=1,
                max_task_retries=0,  # frontier is the single retry authority
            )
        else:
            fetched_ds = ds.map_batches(
                fetch_sim_batch,
                fn_kwargs={"seed": seed, "max_depth": max_depth,
                           "num_hosts": num_hosts},
                batch_format="pyarrow", batch_size=batch_size,
                max_retries=0,  # frontier is the single retry authority
            )
        # a wave is bounded (items_per_wave) → safe to collect, then sort
        # by enqueue_seq for scheduling-independent determinism
        fetched = pa.concat_tables(
            [b for b in fetched_ds.iter_batches(batch_size=batch_size,
                                                batch_format="pyarrow")]
        ) if wave_tbl.num_rows else wave_tbl
        fetched = fetched.sort_by("enqueue_seq")

        # 1) documents fragment (completed rows only) — write BEFORE commit
        #    (reference R7 ordering: storage failure must leave items
        #    uncommitted, crawler/src/index.ts:237-243)
        ok_mask = pc.equal(fetched["status"], "completed")
        ok = fetched.filter(ok_mask)
        if ok.num_rows:
            urls = ok["url"].to_pylist()
            part_col = pa.array(
                [stable_hash64(u, seed) % 1024 for u in urls], pa.uint16())
            doc_tbl = pa.table({
                "doc_id": ok["doc_id"], "url": ok["url"], "host": ok["host"],
                "depth": ok["depth"], "enqueue_seq": ok["enqueue_seq"],
                "url_hash_part": part_col,
                "wave": pa.array([wave] * ok.num_rows, pa.int32()),
                "spans": ok["spans"],
            })
            _atomic_write_parquet(doc_tbl, os.path.join(docs_dir, f"wave_{wave:05d}.parquet"))
            docs_written += ok.num_rows

        # 2) commits per (shard, lease)
        commit_refs = []
        by_lease: dict[tuple[int, int], list[int]] = {}
        seqs = fetched["enqueue_seq"].to_pylist()
        shards_col = fetched["shard"].to_pylist()
        lease_col = fetched["lease_id"].to_pylist()
        statuses = fetched["status"].to_pylist()
        errors = fetched["error"].to_pylist()
        for i in range(fetched.num_rows):
            by_lease.setdefault((shards_col[i], lease_col[i]), []).append(i)
        for (sh, lid), idxs in by_lease.items():
            commit_refs.append(frontier.commit(
                sh, lid,
                [seqs[i] for i in idxs],
                [statuses[i] for i in idxs],
                [errors[i] for i in idxs], now))
        ray.get(commit_refs)

        # 3) discovered URLs → tail append in enqueue_seq order
        #    (reference enqueue() appends with fresh _ids, enqueue.ts:71-116)
        disc_urls: list[str] = []
        disc_depths: list[int] = []
        discovered = ok["discovered"].to_pylist() if ok.num_rows else []
        ok_depths = ok["depth"].to_pylist() if ok.num_rows else []
        for children, d in zip(discovered, ok_depths):
            for c in children:
                disc_urls.append(c)
                disc_depths.append(d + 1)
        if disc_urls:
            frontier.enqueue(disc_urls, disc_depths)

        urls_processed += fetched.num_rows
        row = {"wave": wave, "leased": int(wave_tbl.num_rows),
               "completed": int(ok.num_rows),
               "failed": int(fetched.num_rows - ok.num_rows),
               "discovered": len(disc_urls),
               "sec": round(time.perf_counter() - wave_t0, 4),
               "checkpointed": False}
        # 4) checkpoint
        if checkpoint_every and (wave + 1) % checkpoint_every == 0:
            frontier.checkpoint(ckpt_dir)
            row["checkpointed"] = True
        _append_manifest(manifest, row)
        lineage.append(row)
        wave += 1

    elapsed = time.perf_counter() - t0
    return CrawlResult(out_dir=out_dir, waves=wave,
                       histogram=frontier.status_histogram(),
                       counters=frontier.counters(),
                       seen_set_size=len(frontier.seen_set()),
                       docs_written=docs_written, elapsed_sec=elapsed,
                       urls_processed=urls_processed, lineage=lineage)


def read_documents(out_dir: str) -> rd.Dataset:
    """The crawled documents table as a Dataset (one fragment per wave)."""
    return rd.read_parquet(os.path.join(out_dir, "documents"))


def direct_crawl(items: list[str], *, seed: int = 42,
                 fetch_concurrency: int = 4, batch_size: int = 1024) -> pa.Table:
    """Entry point B — synchronous scatter-gather crawl (no queue, no
    retries): the reference's POST /crawl path chunks items across
    concurrent Lambdas and merges responses
    (master/src/api.service.ts:169-222, runner.ts:156-273). In Ray Data
    this is exactly from_items → map_batches → collect (SURVEY.md §3.3).
    """
    tbl = pa.table({"url": pa.array(items, pa.string()),
                    "depth": pa.array([0] * len(items), pa.int32()),
                    "retries": pa.array([0] * len(items), pa.int32())})
    ds = rd.from_arrow(tbl).map_batches(
        FetchSim, fn_constructor_kwargs={"seed": seed},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=fetch_concurrency, num_cpus=1, max_task_retries=0)
    out = pa.concat_tables(ds.iter_batches(batch_size=batch_size * 8,
                                           batch_format="pyarrow"))
    return out.sort_by("url")
