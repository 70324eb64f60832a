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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..sources.corpus import spans_arrow_type
from ..stages.fetch import FetchSim, FetchStoreActor, fetch_store_batch
from ..state.frontier import Frontier

# raw-task form of the fetch+store stage (see run_crawl fetch_via docs).
# The wave table is ray.put ONCE; each task slices its range zero-copy
# from the shared object — the driver serializes the wave once instead
# of once per task.
@ray.remote(num_cpus=1)
def _fetch_slice_task(tbl: pa.Table, offset: int, length: int, **kwargs) -> pa.Table:
    return fetch_store_batch(tbl.slice(offset, length), **kwargs)


@ray.remote(num_cpus=1)
def _fetch_commit_task(seqs: list, urls: list, hosts: list, depths: list,
                       attempts: list, shard: int, shard_handle,
                       lease_id: int,
                       now, all_shards=None, route_seed: int = 42, **kwargs):
    """Pump-mode chunk: fetch + store + COMMIT + route inside the task.

    The task commits its own lease to the owning shard actor
    (store-then-commit ordering, reference R7) and, when given the
    shard handle list, routes discovered children DIRECTLY to their
    host shards (which allocate their own seq blocks) — neither
    per-row statuses nor child URLs transit the driver, whose loop
    stays O(chunks). Child inserts are awaited before the task
    returns, so the driver's drained-ness check stays sound.

    The lease arrives as the shard's RAW column lists and the Arrow
    table is built HERE, in the task: pickling a small pa.Table on the
    driver costs ~1.3 ms/chunk (Arrow-IPC fixed cost) vs ~0.06 ms for
    the plain lists — at 256-item polite chunks that difference alone
    was ~25% of the driver pump's busy time at 32 cpus."""
    from ..functions.hashing import stable_hash64

    t_start = time.time()
    n = len(seqs)
    tbl = pa.table({
        "enqueue_seq": pa.array(seqs, pa.uint64()),
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "depth": pa.array(depths, pa.int32()),
        "attempt": pa.array(attempts, pa.int32()),
        "shard": pa.array([shard] * n, pa.int32()),
        "lease_id": pa.array([lease_id] * n, pa.int64()),
    })
    ctl = fetch_store_batch(tbl, **kwargs)
    # itemwise storage failures are NOT reported in the commit — the
    # lease's unreported members roll back to INITIAL (R5) without
    # consuming a retry, mirroring the reference's per-item upload
    # failure reset (crawler/src/index.ts:265-268, R7)
    rep = ctl.filter(pc.not_equal(ctl["status"], "storage_failed"))
    statuses = rep["status"].to_pylist()
    ray.get(shard_handle.commit.remote(
        lease_id, rep["enqueue_seq"].to_pylist(), statuses,
        rep["error"].to_pylist(), now, True))
    n_ok = statuses.count("completed")
    flat = pc.list_flatten(ctl["discovered"])
    # children=None unless the driver must relay them: returning even
    # an EMPTY pa.Table costs the driver ~1 ms of Arrow-IPC
    # deserialization per chunk on ray.get — plain lists (or None)
    # keep the per-chunk result msgpack-cheap
    children = None
    if len(flat):
        lens = pc.list_value_length(ctl["discovered"]).to_numpy(zero_copy_only=False)
        depths = np.repeat(ctl["depth"].to_numpy(zero_copy_only=False) + 1,
                           lens).astype(np.int64)
        if all_shards is None:
            children = (flat.to_pylist(), depths.tolist())
        else:
            k = len(all_shards)
            per: dict[int, tuple[list, list]] = {}
            host_shard: dict[str, int] = {}
            for u, d in zip(flat.to_pylist(), depths.tolist()):
                # SAME host extraction as Frontier._route (strip
                # userinfo/port, lowercase BEFORE memoizing) — a
                # divergent router would send ports/userinfo/uppercase
                # hosts to the wrong shard, breaking shard-local URL
                # dedup and splitting per-host politeness state
                rest = u.split("://", 1)[-1]
                host = (rest.split("/", 1)[0].rsplit("@", 1)[-1]
                        .split(":", 1)[0].lower())
                sh = host_shard.get(host)
                if sh is None:
                    sh = stable_hash64(host, route_seed) % k
                    host_shard[host] = sh
                b = per.get(sh)
                if b is None:
                    b = per.setdefault(sh, ([], []))
                b[0].append(u)
                b[1].append(d)
            # fire-and-forget: actor calls execute reliably while the
            # actor lives; the pump's double-check drain (below) covers
            # the tiny window where an insert lands after this task is
            # observed complete
            for sh, (us, ds) in per.items():
                all_shards[sh].enqueue_discovered.remote(us, ds)
    return {"n": ctl.num_rows, "n_ok": n_ok,
            "started": t_start, "ended": time.time()}, children

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("enqueue_seq", pa.uint64()),
    ("url_hash_part", pa.uint16()),  # explicit hash partition key (north rule)
    ("wave", pa.int32()),
    ("simhash", pa.uint64()),        # signature-at-ingest (dedup input)
    ("fingerprint", pa.list_(pa.uint64())),
    ("spans", spans_arrow_type()),
])


class CrawlQuarantined(RuntimeError):
    """Raised when lost-lease thresholds are exceeded — the job-level
    circuit breaker (reference task quarantine: lost-ratio ≥
    max_lost_workers_ratio ∧ lost ≥ max_lost_workers,
    master/scheduler/daemon.ts:141-149)."""


def check_quarantine(counters: dict, max_lost_leases: int = 10,
                     max_lost_ratio: float = 0.01) -> None:
    """Evaluate the reference circuit-breaker rule on frontier
    counters; raises CrawlQuarantined when tripped."""
    lost = counters.get("expired_leases", 0)
    started = max(1, counters.get("leases_issued", 1))
    if lost >= max_lost_leases and lost / started >= max_lost_ratio:
        raise CrawlQuarantined(
            f"lost leases {lost}/{started} exceeds thresholds "
            f"(max_lost_leases={max_lost_leases}, ratio≥{max_lost_ratio})")


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
    pq.write_table(tbl, tmp, compression="snappy")
    os.replace(tmp, path)


def _append_manifest(path: str, row: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")


def _write_lineage(out_dir: str, rows: list[tuple]) -> None:
    """Per-lease lineage table (reference worker_meta analog)."""
    if not rows:
        return
    tbl = pa.table({
        "lease_id": pa.array([r[0] for r in rows], pa.int64()),
        "shard": pa.array([r[1] for r in rows], pa.int32()),
        "n_items": pa.array([r[2] for r in rows], pa.int64()),
        "n_ok": pa.array([r[3] for r in rows], pa.int64()),
        "n_failed": pa.array([r[4] for r in rows], pa.int64()),
        "started": pa.array([r[5] for r in rows], pa.float64()),
        "ended": pa.array([r[6] for r in rows], pa.float64()),
    })
    _atomic_write_parquet(tbl, os.path.join(out_dir, "lineage.parquet"))


def read_lineage(out_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(out_dir, "lineage.parquet"))


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
              exact_dedup: bool = False,
              politeness: bool = False,
              politeness_overrides: dict | None = None,
              robots: bool = False,
              default_rate: float = 1.0,
              default_burst: float = 4.0,
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
              fetch_via: str = "tasks",
              order: str = "fifo",
              global_order: bool = False,
              storage_policy: str = "merged",
              store_fail_marker: str = "",
              config=None) -> CrawlResult:
    """Run a crawl to drain (or ``max_waves``). Returns CrawlResult.

    ``config`` (a ``JobConfig``) supplies ``storage_policy`` (K1/K2
    failure granularity — see ``fetch_store_batch``) and
    ``retry_failed_items`` when given.

    ``resume=True`` restores the frontier from ``out_dir/ckpt`` and
    skips waves whose parquet fragments already exist (north rule:
    a killed run resumes exactly).

    ``fetch_via`` selects how a wave's batches reach ``fetch_store_batch``:
      'tasks'   (default) — raw ``ray.remote`` tasks, one per slice.
                The crawl is an ITERATIVE feedback loop (each wave's
                discovered URLs feed the next wave's lease), which the
                Dataset API cannot express in one pipeline; a fresh
                Dataset per wave pays ~2s of executor startup/teardown
                per wave (measured), which dominates at high wave
                counts. Raw tasks run the SAME batch function with
                ~ms-level submission cost. Results are identical.
      'dataset' — one Ray Data pipeline per wave (map_batches tasks);
                the fully Dataset-native form, used in conformance
                tests and the right choice when waves are few and big.
    ``use_actors=True`` additionally routes 'dataset' mode through the
    FetchStoreActor pool (the stateful-fetcher A1/A2 shape).
    """
    if config is not None:
        storage_policy = config.storage_policy
        max_retries = config.retry_failed_items
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
                        p = os.path.join(d, f)
                        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
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
                                exact_seen=exact_dedup,
                                politeness=politeness,
                                politeness_overrides=politeness_overrides,
                                robots=robots,
                                default_rate=default_rate,
                                default_burst=default_burst,
                                max_retries=max_retries, order=order)
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
        t_lease = time.perf_counter()
        # global_order (SURVEY §7.4): cross-shard global-FIFO
        # interleave — the K>1 conformance mode whose claim stream is
        # bit-identical to K=1 (same DuckDB replay oracle gates both)
        leases = (frontier.lease_wave_global(items_per_wave, now)
                  if global_order
                  else frontier.lease_wave(n_per_shard, now))
        lease_sec = round(time.perf_counter() - t_lease, 3)
        if not leases:
            # between-wave healing (reference daemon cycle: R1 retry gate)
            if frontier.retry_failed() > 0:
                continue
            if frontier.expire_leases(now) > 0:
                continue
            break
        wave_t0 = time.perf_counter()
        phase = {"lease": lease_sec}
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
        phase["build"] = round(time.perf_counter() - wave_t0, 3)

        # split the wave into block-sized zero-copy slices BEFORE from_arrow:
        # a single Arrow table would become one block → one sequential task.
        # Cap the block count — from_arrow pays a per-block ray.put.
        # combine_chunks per slice: pickling a lazily-sliced table copies
        # the FULL parent buffers for every slice (measured 18x slower)
        t = time.perf_counter()
        step = max(batch_size, -(-max(1, wave_tbl.num_rows) // 128))
        if fetch_via != "tasks" or use_actors:
            slices = [wave_tbl.slice(i, step).combine_chunks()
                      for i in range(0, wave_tbl.num_rows, step)] or [wave_tbl]
            ds = rd.from_arrow(slices)
        phase["mkds"] = round(time.perf_counter() - t, 3)
        fetch_kwargs = {"seed": seed, "max_depth": max_depth,
                        "num_hosts": num_hosts, "docs_dir": docs_dir,
                        "wave": wave, "storage_policy": storage_policy,
                        "store_fail_marker": store_fail_marker}
        # fetch tasks write their own document fragments (commit-after-
        # store, reference R7) and return ONLY control columns — span
        # payloads never cross the driver. The control set is bounded
        # (items_per_wave) → safe to collect, then sort by enqueue_seq
        # for scheduling-independent determinism.
        t = time.perf_counter()
        if fetch_via == "tasks" and not use_actors:
            wave_ref = ray.put(wave_tbl)
            phase["put"] = round(time.perf_counter() - t, 3)
            refs = [_fetch_slice_task.options(max_retries=0).remote(
                        wave_ref, off, step, **fetch_kwargs)
                    for off in range(0, wave_tbl.num_rows, step)]
            phase["submit"] = round(time.perf_counter() - t, 3)
            fetched = pa.concat_tables(ray.get(refs))
            del wave_ref
        else:
            if use_actors:
                # actor-pool form — what a real stateful fetcher (session /
                # browser, A1/A2) uses; per-wave pool startup makes it the
                # slower choice for the stateless simulated fetch
                fetched_ds = ds.map_batches(
                    FetchStoreActor, fn_constructor_kwargs=fetch_kwargs,
                    batch_format="pyarrow", batch_size=batch_size,
                    concurrency=fetch_concurrency, num_cpus=1,
                    max_task_retries=0,  # frontier is the single retry authority
                )
            else:
                fetched_ds = ds.map_batches(
                    fetch_store_batch, fn_kwargs=fetch_kwargs,
                    batch_format="pyarrow", batch_size=batch_size,
                    max_retries=0,  # frontier is the single retry authority
                )
            fetched = pa.concat_tables(
                [b for b in fetched_ds.iter_batches(batch_size=batch_size * 8,
                                                    batch_format="pyarrow")]
            ) if wave_tbl.num_rows else wave_tbl
        fetched = fetched.sort_by("enqueue_seq")
        ok_mask = pc.equal(fetched["status"], "completed")
        ok = fetched.filter(ok_mask)
        docs_written += ok.num_rows
        phase["fetch"] = round(time.perf_counter() - t, 3)
        t = time.perf_counter()

        # 2) commits per (shard, lease) — numpy-grouped, no row loop
        commit_refs = []
        seqs_np = fetched["enqueue_seq"].to_numpy(zero_copy_only=False)
        shard_np = fetched["shard"].to_numpy(zero_copy_only=False)
        lease_np = fetched["lease_id"].to_numpy(zero_copy_only=False)
        status_np = np.asarray(fetched["status"].to_pylist(), dtype=object)
        error_np = np.asarray(fetched["error"].to_pylist(), dtype=object)
        reported = status_np != "storage_failed"  # itemwise R7: omit →
        for lid in np.unique(lease_np):           # R5 rollback to initial
            idx = np.flatnonzero((lease_np == lid) & reported)
            if idx.size == 0:
                idx_all = np.flatnonzero(lease_np == lid)
                commit_refs.append(frontier.commit(
                    int(shard_np[idx_all[0]]), int(lid), [], [], [], now))
                continue
            commit_refs.append(frontier.commit(
                int(shard_np[idx[0]]), int(lid), seqs_np[idx].tolist(),
                status_np[idx].tolist(), error_np[idx].tolist(), now))
        ray.get(commit_refs)
        phase["commit"] = round(time.perf_counter() - t, 3)
        t = time.perf_counter()

        # 3) discovered URLs → tail append in enqueue_seq order
        #    (reference enqueue() appends with fresh _ids, enqueue.ts:71-116)
        #    — flattened with Arrow list kernels, no Python nesting loop
        disc_urls: list[str] = []
        disc_depths: list[int] = []
        if ok.num_rows:
            disc_col = ok["discovered"]
            disc_urls = pc.list_flatten(disc_col).to_pylist()
            if disc_urls:
                lens = pc.list_value_length(disc_col).to_numpy(zero_copy_only=False)
                depths_np = ok["depth"].to_numpy(zero_copy_only=False)
                disc_depths = np.repeat(depths_np + 1, lens).tolist()
        if disc_urls:
            frontier.enqueue(disc_urls, disc_depths)
        phase["enqueue"] = round(time.perf_counter() - t, 3)

        urls_processed += fetched.num_rows
        row = {"wave": wave, "leased": int(wave_tbl.num_rows),
               "completed": int(ok.num_rows),
               "failed": int(fetched.num_rows - ok.num_rows),
               "discovered": len(disc_urls),
               "sec": round(time.perf_counter() - wave_t0, 4),
               "phase": phase,
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


def run_crawl_pump(seed_urls: list[str] | None = None, *,
                   frontier: Frontier | None = None,
                   seed: int = 42,
                   num_shards: int = 8,
                   dedup: bool = True,
                   exact_dedup: bool = False,
                   politeness: bool = False,
                   politeness_overrides: dict | None = None,
                   robots: bool = False,
                   default_rate: float = 1.0,
                   default_burst: float = 4.0,
                   max_depth: int = 2,
                   max_retries: int = 3,
                   num_hosts: int = 64,
                   chunk_size: int = 512,
                   target_inflight: int | None = None,
                   out_dir: str = "/tmp/crawl_pump",
                   resume: bool = False,
                   checkpoint_every_commits: int = 0,
                   longliving: bool = False,
                   stop_when=None,
                   max_commits: int | None = None,
                   track_seen: bool = True,
                   evict_every_commits: int = 0,
                   max_lost_leases: int = 10,
                   fetch_fail_marker: str = "",
                   fetch_fail_after_store_marker: str = "",
                   order: str = "fifo",
                   storage_policy: str = "merged",
                   store_fail_marker: str = "",
                   config=None,
                   now_fn=None) -> CrawlResult:
    """Asynchronous frontier pump — the throughput mode.

    Instead of synchronized waves (``run_crawl``), the driver keeps
    ``target_inflight`` fetch CHUNKS in flight at all times: each chunk
    is one frontier lease of ``chunk_size`` items running as one raw
    Ray task; as chunks complete (``ray.wait``) their statuses are
    committed, discovered URLs are appended, and fresh leases are
    issued immediately. No wave barrier → no per-wave straggler tail,
    CPUs stay saturated — the Ray analog of the reference scheduler's
    endless launch loop (master/scheduler/daemon.ts:61-79,308-391).

    Trade-off vs wave mode: discovered URLs are appended in task
    COMPLETION order, so ``enqueue_seq`` assignment (and claim order)
    is not deterministic across runs; the final seen SET, histogram
    totals, and per-document contents are unchanged (documents are a
    pure function of (seed, url)). Conformance/golden-order runs use
    ``run_crawl``; checkpointing here happens at soft barriers (drain
    in-flight → snapshot) every ``checkpoint_every_commits`` chunk
    commits. On resume, fragments written after the checkpoint
    (lease_id ≥ the snapshot's per-shard next_lease_id) are deleted
    before continuing, so the documents table never double-counts.
    """
    if config is not None:
        storage_policy = config.storage_policy
        max_retries = config.retry_failed_items
        max_lost_leases = config.max_lost_workers
        longliving = longliving or config.longliving
    docs_dir = os.path.join(out_dir, "documents")
    ckpt_dir = os.path.join(out_dir, "ckpt")
    manifest = os.path.join(out_dir, "manifest.jsonl")
    _seed_tail_refs: list = []

    if resume and os.path.exists(os.path.join(ckpt_dir, "frontier.pkl")):
        frontier = Frontier.restore(ckpt_dir)
        next_ids = ray.get([sh.get_next_lease_id.remote() for sh in frontier.shards])
        if os.path.isdir(docs_dir):
            for f in os.listdir(docs_dir):
                if f.startswith("part-") and f.endswith(".parquet"):
                    lid = int(f[5:-8])
                    sh = lid // 1_000_000_000
                    if sh < len(next_ids) and lid >= next_ids[sh]:
                        os.remove(os.path.join(docs_dir, f))
    else:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(docs_dir, exist_ok=True)
        if frontier is None:
            frontier = Frontier(num_shards, seed=seed, dedup=dedup,
                                exact_seen=exact_dedup,
                                politeness=politeness,
                                politeness_overrides=politeness_overrides,
                                robots=robots,
                                default_rate=default_rate,
                                default_burst=default_burst,
                                max_retries=max_retries, order=order,
                                track_seen_urls=track_seen)
        if seed_urls is not None and hasattr(seed_urls, "map_batches"):
            # Dataset seed list (S1/S2 at 10^10 scale): distributed
            # ingest — map_batches tasks route straight to the shards,
            # the driver never holds the seed list
            frontier.enqueue_dataset(seed_urls)
        elif seed_urls:
            # ramp overlap: land the first slice synchronously so leasing
            # can start, stream the rest in asynchronously (the refs join
            # pending_enq below, so drained-ness checks stay correct)
            head = min(len(seed_urls), 8192)
            frontier.enqueue(seed_urls[:head])
            if len(seed_urls) > head:
                _seed_tail_refs.extend(frontier.enqueue_async(seed_urls[head:]))

    if target_inflight is None:
        ncpu = int(ray.available_resources().get("CPU", 8))
        target_inflight = max(8, 3 * ncpu)

    t0 = time.perf_counter()
    inflight: dict = {}            # ObjectRef -> (shard, lease_id)
    urls_processed = 0
    docs_written = 0
    commits = 0
    disc_urls: list[str] = []
    disc_depths: list[int] = []
    # lineage = per-lease worker-meta rows (reference K5/G4,
    # lib/types/workermeta.ts): (lease_id, shard, n, ok, failed,
    # started, ended) — written as out_dir/lineage.parquet
    lineage_rows: list[tuple] = []
    lost_tasks = 0
    fetch_kwargs = {"seed": seed, "max_depth": max_depth,
                    "num_hosts": num_hosts, "docs_dir": docs_dir,
                    "storage_policy": storage_policy,
                    "store_fail_marker": store_fail_marker,
                    "fail_marker": fetch_fail_marker,
                    "fail_after_store_marker": fetch_fail_after_store_marker}

    pending_enq: list = list(_seed_tail_refs)

    def drop_orphan_fragment(lease_id: int) -> None:
        """A task that died between its fragment write and its commit
        leaves an orphan part-<lease_id>.parquet; the lease rolls back
        and the retry writes a NEW part-<new_lease_id> fragment, so the
        orphan would double-count those docs within the run. Delete it
        on the rollback path (the reference analog is the merged-sink
        all-or-nothing rollback, crawler/src/index.ts:237-243)."""
        p = os.path.join(docs_dir, f"part-{lease_id:015d}.parquet")
        if os.path.exists(p):
            os.remove(p)

    def flush_discovered(block: bool = False):
        nonlocal disc_urls, disc_depths
        if disc_urls:
            pending_enq.extend(
                frontier.enqueue_async(disc_urls, disc_depths))
            disc_urls, disc_depths = [], []
        if block and pending_enq:
            ray.get(pending_enq)
            pending_enq.clear()

    def submit(lease: dict, shard: int):
        # raw lists, not a pa.Table — the table is built in the task
        # (see _fetch_commit_task docstring: ~20x cheaper driver-side
        # serialization per chunk)
        ref = _fetch_commit_task.options(max_retries=0).remote(
            lease["seq"], lease["url"], lease["host"], lease["depth"],
            lease["attempt"], shard,
            frontier.shards[shard], lease["lease_id"],
            now_fn() if now_fn else None,
            all_shards=frontier.shards, route_seed=frontier.seed,
            part_label=f"{lease['lease_id']:015d}", **fetch_kwargs)
        inflight[ref] = (shard, lease["lease_id"])

    lease_pending: dict = {}   # lease_many ObjectRef -> shard index
    last_ckpt_commits = 0

    def refill(now, block: bool = False):
        """Overlapped refill: lease_many rounds run while fetch tasks
        compute. Responses are collected PER SHARD as each becomes
        ready (no all-8-shards barrier — one slow shard, e.g. one
        mid-enqueue, must not delay the other seven's leases; measured
        on the polite 32-cpu pump this barrier plus the 8-completion
        main-loop wait capped lease supply at ~105 leases/s and
        starved a third of the CPUs). ``block`` awaits everything —
        the drained-ness path needs a definite answer."""
        got = 0
        if lease_pending:
            if block:
                ready = list(lease_pending.keys())
            else:
                ready, _ = ray.wait(list(lease_pending.keys()),
                                    num_returns=len(lease_pending),
                                    timeout=0)
            for ref in ready:
                shard = lease_pending.pop(ref)
                for lease in ray.get(ref):
                    submit(lease, shard)
                    got += 1
        if not lease_pending and len(inflight) + got < target_inflight:
            flush_discovered()
            want = target_inflight - len(inflight) - got
            per_shard = max(1, -(-want // frontier.num_shards))
            refs = [sh.lease_many.remote(per_shard, chunk_size, now)
                    for sh in frontier.shards]
            if block and not got:
                for shard, leases in enumerate(ray.get(refs)):
                    for lease in leases:
                        submit(lease, shard)
                        got += 1
            else:
                for i, ref in enumerate(refs):
                    lease_pending[ref] = i
        return got

    idle_rounds = 0
    while True:
        if max_commits is not None and commits >= max_commits:
            # interrupt point (kill simulation / bounded runs): cancel
            # in-flight tasks the way a real driver death would (Ray
            # reclaims tasks owned by a dead driver) — a straggler
            # finishing AFTER a resume's orphan-fragment cleanup would
            # otherwise re-insert its fragment and double-count docs.
            # Their leases TTL-heal; a resume restores from the last
            # checkpoint anyway.
            for ref in inflight:
                try:
                    ray.cancel(ref, force=True)
                except Exception:
                    pass
            break
        now = now_fn() if now_fn else None
        got = refill(now)
        if not inflight:
            flush_discovered(block=True)  # inserts must land before the
            if refill(now, block=True):   # drained check can be trusted
                continue
            if frontier.retry_failed() > 0:
                continue
            if frontier.expire_leases(now) > 0:
                check_quarantine(frontier.counters())  # daemon.ts:141-149
                continue
            hist = frontier.status_histogram()
            if hist["initial"] > 0 and idle_rounds < 200:
                # politeness back-off: eligible items exist but all
                # host buckets are empty right now
                idle_rounds += 1
                time.sleep(0.02)
                continue
            if longliving and not (stop_when and stop_when()):
                # reference longliving tasks never finish — they wait
                # for externally-enqueued items (crawltask.model.ts:194-196;
                # finish check skipped, daemon.ts:96-100)
                time.sleep(0.05)
                continue
            # double-check drain: in-flight fire-and-forget child
            # inserts may land just after their task was observed done
            time.sleep(0.05)
            if refill(now, block=True) or frontier.retry_failed() > 0 \
                    or frontier.status_histogram()["initial"] > 0:
                continue
            break
        idle_rounds = 0
        # event wait: wake on the FIRST completion of either kind —
        # a fetch task (commit + children) or a lease response (more
        # tasks to submit). Waiting for a fixed batch of task
        # completions here (the old num_returns=8) delayed lease
        # collection by ~8/completion-rate and starved the pool
        # whenever leases are small (politeness chunk 256).
        pool = list(inflight.keys()) + list(lease_pending.keys())
        ray.wait(pool, num_returns=1)
        # then drain every task that is ready right now (batch commit)
        done, _ = ray.wait(list(inflight.keys()),
                           num_returns=len(inflight), timeout=0)
        for ref in done:
            shard, lease_id = inflight.pop(ref)
            try:
                counts, children = ray.get(ref)
            except Exception:
                # lost worker (reference J5/R3): the task died before
                # committing — roll its lease back to INITIAL, delete
                # any orphan fragment it wrote pre-commit, and trip
                # the circuit breaker if thresholds are exceeded
                frontier.rollback(shard, lease_id)
                drop_orphan_fragment(lease_id)
                lost_tasks += 1
                c = frontier.counters()
                c["expired_leases"] = c.get("expired_leases", 0) + lost_tasks
                check_quarantine(c, max_lost_leases=max_lost_leases)
                continue
            docs_written += counts["n_ok"]
            urls_processed += counts["n"]
            lineage_rows.append((lease_id, shard, counts["n"], counts["n_ok"],
                                 counts["n"] - counts["n_ok"],
                                 counts["started"], counts["ended"]))
            if children is not None:
                disc_urls.extend(children[0])
                disc_depths.extend(children[1])
            commits += 1
        if evict_every_commits and commits and \
                commits % evict_every_commits == 0:
            # bound shard memory at scale: terminal items leave the
            # actors (histogram counts preserved; docs/lineage tables
            # are the durable record)
            frontier.evict_terminal()
        if checkpoint_every_commits and \
                commits - last_ckpt_commits >= checkpoint_every_commits:
            # soft barrier: drain, snapshot, continue.
            # (threshold on commits-since-last-checkpoint, NOT
            # ``commits % N == 0``: commits advances by several per
            # pump round, so an exact multiple can be skipped —
            # observed as an interrupted run with no checkpoint at
            # all, which a resume then rmtree'd.)
            # The OUTSTANDING lease round must be drained too: its
            # leases are already RUNNING on the shards but no task was
            # ever submitted for them — snapshotting them as phantom
            # RUNNING leases (with next_lease_id already advanced past
            # them) means the original run later writes their
            # fragments BELOW the snapshot's orphan-cleanup watermark,
            # while the resumed run heals and re-crawls the same items
            # → duplicated documents. Roll them back before the
            # snapshot; the next refill re-leases them.
            for ref_, shard_i in list(lease_pending.items()):
                for lease_ in ray.get(ref_):
                    frontier.rollback(shard_i, lease_["lease_id"])
            lease_pending.clear()
            while inflight:
                done, _ = ray.wait(list(inflight.keys()),
                                   num_returns=len(inflight))
                for ref in done:
                    shard, lease_id = inflight.pop(ref)
                    try:
                        counts, children = ray.get(ref)
                    except Exception:
                        frontier.rollback(shard, lease_id)
                        drop_orphan_fragment(lease_id)
                        lost_tasks += 1
                        continue
                    docs_written += counts["n_ok"]
                    urls_processed += counts["n"]
                    lineage_rows.append((lease_id, shard, counts["n"],
                                         counts["n_ok"],
                                         counts["n"] - counts["n_ok"],
                                         counts["started"], counts["ended"]))
                    if children is not None:
                        disc_urls.extend(children[0])
                        disc_depths.extend(children[1])
            flush_discovered(block=True)
            # settle: fire-and-forget child inserts from the drained
            # tasks must land before the snapshot (histogram stability)
            prev = frontier.status_histogram()
            while True:
                time.sleep(0.05)
                cur = frontier.status_histogram()
                if cur == prev:
                    break
                prev = cur
            frontier.checkpoint(ckpt_dir)
            _write_lineage(out_dir, lineage_rows)
            _append_manifest(manifest, {"commits": commits,
                                        "checkpointed": True,
                                        "docs": docs_written})
            last_ckpt_commits = commits

    _write_lineage(out_dir, lineage_rows)
    elapsed = time.perf_counter() - t0
    return CrawlResult(out_dir=out_dir, waves=commits,
                       histogram=frontier.status_histogram(),
                       counters=frontier.counters(),
                       seen_set_size=(len(frontier.seen_set())
                                      if track_seen else -1),
                       docs_written=docs_written, elapsed_sec=elapsed,
                       urls_processed=urls_processed,
                       lineage=[{"lease_id": r[0], "shard": r[1], "n": r[2],
                                 "n_ok": r[3]} for r in lineage_rows[:100]])


def read_documents(out_dir: str) -> rd.Dataset:
    """The crawled documents table as a Dataset (one fragment per
    lease/wave). Goes through the storage seam — Lance when available,
    parquet in this container (see sources/storage.py)."""
    from ..sources.storage import read_dataset
    return read_dataset(os.path.join(out_dir, "documents"))


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
