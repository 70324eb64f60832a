"""Sharded URL frontier — the rebuild of the reference's MongoDB queue.

The reference keeps one MongoDB collection per task
(``item_queue_<task_id>``) with a per-item state machine
{initial=0, running=1, completed=2, failed=3} (lib/types/queue.ts:3-13)
and these semantics (SURVEY.md §3.2 invariant):

  Claim = first ``n`` rows in ``enqueue_seq`` order with
  ``status==initial``, marked ``running`` atomically
  (crawler/src/crawl_queue.ts:89-117); commit in lease order
  (crawl_queue.ts:119-149); ``failed→initial`` restores eligibility at
  the item's ORIGINAL position (master/src/models/queue.model.ts:258-266
  updates in place); worker-side ``enqueue()`` appends at the tail with
  a fresh ``enqueue_seq`` (crawler/src/enqueue.ts:71-116); block
  detection does not consume a retry (crawler/src/handler.ts:171-176);
  worker abort / storage failure rolls uncommitted lease items back to
  ``initial`` (crawler/src/handler.ts:90-103, crawler/src/index.ts:237-243).

Here each ``FrontierShardCore`` is a single-writer owner of one hash
partition of the URL space (shard = stable_hash64(host) % K, so per-host
politeness state is shard-local). Single-writer actors make the
reference's "atom write operation" claims (crawl_queue.ts:82-88)
trivially race-free — the known ``num_workers_running`` races
(crawltask.model.ts:202-204) disappear by construction.

North-star additions the reference lacks: cuckoo/bloom URL-seen dedup
(mode flag — fidelity mode allows duplicates like the reference),
per-host token-bucket politeness, robots verdicts, lease TTL healing,
and parquet+pickle shard checkpoints for exact resume.

Scale notes (10^10 URLs, 256 nodes): state per shard is O(in-flight +
not-yet-terminal) items plus an O(1)-per-URL cuckoo filter; terminal
items are evicted to the lineage/documents tables (``evict_terminal``)
so shard memory stays bounded. Leases move as columnar dicts (one
message per lease, not per item).
"""

from __future__ import annotations

import heapq
import os
import pickle
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import stable_hash64
from ..functions.urltools import canonicalize_and_host
from .filters import (BloomFilter, CuckooFilter, ExactSeenSet,
                      ScalableSeenFilter)
from .politeness import HostPoliteness, RealRobots, RobotsCache

# per-item states — values match the reference enum (lib/types/queue.ts:13)
INITIAL, RUNNING, COMPLETED, FAILED = 0, 1, 2, 3

# item tuple layout inside a shard. retries = the reference's retry
# counter (block-detection doesn't consume one, R6); attempts = total
# number of times the item was actually leased (always increments) —
# what the reference's `retries += 1; if blocked: retries -= 1`
# sequence transiently counts (crawler/src/handler.ts:109,171-176).
_URL, _HOST, _DEPTH, _PRIORITY, _STATUS, _RETRIES, _ERROR, _CRAWLED, _ATTEMPTS = range(9)


class FrontierShardCore:
    """Single shard of the frontier. Pure Python — wrapped by ray.remote
    below; used directly (K=1) as the single-threaded conformance oracle."""

    def __init__(self, shard_id: int = 0, *, dedup: bool = False,
                 use_cuckoo: bool = True, exact_seen: bool = False,
                 filter_capacity: int = 1 << 20,
                 politeness: bool = False, default_rate: float = 1.0,
                 default_burst: float = 4.0,
                 politeness_overrides: dict | None = None,
                 robots: bool = False, robots_impl: str = "simulated",
                 max_retries: int = 3, lease_ttl: float = 600.0,
                 order: str = "fifo", seed: int = 42,
                 track_seen_urls: bool = True):
        self.shard_id = shard_id
        self.dedup = dedup
        self.max_retries = max_retries  # reference retry_failed_items default 3 (crawltask.model.ts:399-403)
        self.lease_ttl = lease_ttl
        self.order = order  # "fifo" (reference fidelity) | "priority" (north-star heap)
        self.seed = seed
        self.items: dict[int, list] = {}
        self.heap: list[tuple] = []        # (order_key..., seq) lazy-deleted
        self.leases: dict[int, tuple[list[int], float]] = {}
        self.next_lease_id = shard_id * 1_000_000_000
        # shard-local seq block for task-routed discovered URLs (async
        # pump): disjoint from driver-assigned seqs and from other
        # shards; per-shard FIFO tail-append is preserved because local
        # seqs sort after all driver seqs
        self.next_local_seq = (shard_id + 1) * 10 ** 12
        self.seen = None
        if dedup:
            # scalable cuckoo chain: no hard capacity ceiling (grows by
            # tiers as the frontier exceeds the initial estimate).
            # exact_seen (conformance/soak runs): a filter false
            # positive silently drops a genuinely-new URL, and which
            # URL collides depends on insertion order — runs needing a
            # deterministic final document SET use the exact set
            # (~35 B/key; the cuckoo chain is the 10^10 path).
            if exact_seen:
                self.seen = ExactSeenSet(seed)
            else:
                self.seen = (ScalableSeenFilter(filter_capacity, seed)
                             if use_cuckoo
                             else BloomFilter(filter_capacity, 0.001, seed))
        # per-host budget table (FIXTURES F5): host → (rate, burst)
        self.politeness = (HostPoliteness(default_rate, default_burst,
                                          politeness_overrides)
                           if politeness else None)
        # robots_impl: 'simulated' (hash verdicts, checkpoint-stable —
        # the conformance default) | 'real' (RealRobots: the RFC-9309
        # text parser over the synthetic per-host robots.txt origin;
        # same interface, oracle-gated by robots_real_verdicts)
        if not robots:
            self.robots = None
        elif robots_impl == "real":
            self.robots = RealRobots(seed)
        else:
            self.robots = RobotsCache(seed)
        # lineage counters (reference worker_meta analog, lib/types/workermeta.ts)
        self.counters = {"enqueued": 0, "deduped": 0, "robots_denied": 0,
                         "leased": 0, "leases_issued": 0,
                         "committed_ok": 0, "committed_fail": 0,
                         "committed_blocked": 0, "rolled_back": 0,
                         "retried": 0, "expired_leases": 0, "evicted": 0}
        # terminal counts survive eviction so histograms stay exact
        self._evicted_completed = 0
        self._evicted_failed = 0
        # politeness parking lot (see lease()): host → blocked heap
        # entries; ready-time heap readmits them; pending guards
        # against duplicate ready-time rows per host
        self._parked: dict[str, list[tuple]] = {}
        self._park_heap: list[tuple] = []
        self._park_pending: set[str] = set()
        # exact seen-set audit (conformance mode). At 10^10-URL scale
        # this list is the one O(corpus) structure — disable it
        # (track_seen_urls=False) and membership lives only in the
        # cuckoo filter + counters.
        self.track_seen_urls = track_seen_urls
        self._terminal_seen: list[str] = []

    # ------------------------------------------------------------------
    # ingest (reference S1 insertItems, queue.model.ts:32-68)
    # ------------------------------------------------------------------
    def enqueue(self, seqs: list[int], urls: list[str], depths: list[int],
                priorities: list[int] | None = None) -> int:
        """Insert items with caller-assigned global enqueue seqs.

        Returns number actually inserted (dedup mode may skip). The
        caller (Frontier facade / commit pump) assigns monotonically
        increasing seqs — the Mongo ``_id`` insertion-order analog.
        """
        priorities = priorities or [1] * len(urls)
        inserted = 0
        for seq, url, depth, prio in zip(seqs, urls, depths, priorities):
            curl, host = canonicalize_and_host(url)
            if self.seen is not None:
                if not self.seen.add(curl):  # already present → duplicate
                    self.counters["deduped"] += 1
                    continue
            self.items[seq] = [curl, host, depth, prio, INITIAL, 0, "", 0.0, 0]
            heapq.heappush(self.heap, self._key(seq, depth, prio))
            inserted += 1
        self.counters["enqueued"] += inserted
        return inserted

    def enqueue_discovered(self, urls: list[str], depths: list[int]) -> int:
        """Tail-append discovered URLs with SHARD-ALLOCATED seqs —
        called directly from fetch tasks in the async pump so child
        routing never transits the driver (the reference's worker-side
        enqueue, crawler/src/enqueue.ts:71-116, similarly writes
        straight to the queue)."""
        n = len(urls)
        seqs = list(range(self.next_local_seq, self.next_local_seq + n))
        self.next_local_seq += n
        return self.enqueue(seqs, urls, depths)

    def _key(self, seq: int, depth: int, prio: int) -> tuple:
        if self.order == "priority":
            # north-star heap: (crawl_depth, enqueue_seq); host budget is
            # enforced at claim time via the token buckets (BASELINE.json
            # north_star: priority heap keyed by crawl-depth, host-budget,
            # enqueue-time)
            return (depth, -prio, seq)
        return (seq,)

    # ------------------------------------------------------------------
    # claim (reference S7 getItemsToCrawlSafe, crawl_queue.ts:89-117)
    # ------------------------------------------------------------------
    def lease(self, n: int, now: float | None = None) -> dict:
        """Atomically claim up to ``n`` eligible items: initial→running.

        Returns a columnar dict {lease_id, seq[], url[], host[],
        depth[], retries[], priority[]}. Politeness-blocked items stay
        eligible (skipped this claim); robots-disallowed items go
        terminal ``failed`` with error='robots_disallowed'.
        """
        now = time.monotonic() if now is None else now
        claimed: list[int] = []
        # politeness PARKING LOT: a blocked item leaves the main heap
        # into a per-host side buffer and only returns when that
        # host's bucket has a token again (ready-time heap). This is
        # the classic polite-frontier structure and fixes two failure
        # modes of scan-and-restore designs at once: the O(frontier)
        # busy-scan when the heap head is a blocked hot-host run
        # (every claim call re-walked it), and the starvation of items
        # queued BEHIND a never-refilling (rate≈0) host's window —
        # parked items don't block the scan from reaching other hosts.
        if self.politeness is not None:
            while self._park_heap and self._park_heap[0][0] <= now:
                _, h = heapq.heappop(self._park_heap)
                self._park_pending.discard(h)
                for entry in self._parked.pop(h, ()):
                    heapq.heappush(self.heap, entry)
        blocked_hosts: set[str] = set()
        # per-call work bound: park at most this many blocked entries
        # per claim call (the rest stay in the heap for the next call,
        # which resumes deeper because parked entries are gone)
        max_park = max(8 * n, 1024)
        n_parked = 0
        while self.heap and len(claimed) < n and n_parked < max_park:
            entry = heapq.heappop(self.heap)
            seq = entry[-1]
            it = self.items.get(seq)
            if it is None or it[_STATUS] != INITIAL:
                continue  # stale heap entry (lazy deletion)
            if self.robots is not None and not self.robots.allowed(it[_URL]):
                it[_STATUS] = FAILED
                it[_RETRIES] = self.max_retries  # terminal — robots never flips
                it[_ERROR] = "robots_disallowed"
                self.counters["robots_denied"] += 1
                if self.track_seen_urls:
                    self._terminal_seen.append(it[_URL])
                continue
            if self.politeness is not None:
                host = it[_HOST]
                if host in blocked_hosts or not self.politeness.try_take(host, now):
                    self._parked.setdefault(host, []).append(entry)
                    blocked_hosts.add(host)
                    n_parked += 1
                    continue
            it[_STATUS] = RUNNING
            it[_ATTEMPTS] += 1
            claimed.append(seq)
        for h in blocked_hosts:
            if h not in self._park_pending:
                self._park_pending.add(h)
                heapq.heappush(self._park_heap,
                               (self.politeness.next_available(h, now), h))
        if not claimed:
            return {"lease_id": -1, "seq": [], "url": [], "host": [],
                    "depth": [], "retries": [], "priority": [], "attempt": []}
        lease_id = self.next_lease_id
        self.next_lease_id += 1
        self.leases[lease_id] = (claimed, now + self.lease_ttl)
        self.counters["leased"] += len(claimed)
        self.counters["leases_issued"] += 1
        its = [self.items[s] for s in claimed]
        return {"lease_id": lease_id, "seq": claimed,
                "url": [i[_URL] for i in its], "host": [i[_HOST] for i in its],
                "depth": [i[_DEPTH] for i in its],
                "retries": [i[_RETRIES] for i in its],
                "priority": [i[_PRIORITY] for i in its],
                "attempt": [i[_ATTEMPTS] - 1 for i in its]}

    def lease_many(self, k: int, n: int, now: float | None = None) -> list[dict]:
        """Up to ``k`` leases of ``n`` items in one actor round-trip
        (amortizes RPC cost for the async pump).

        Stops early when a lease comes back PARTIAL (< n items): that
        means current supply — eligible items or politeness tokens —
        is exhausted, and issuing the remaining k-1 leases would only
        fragment it into tiny chunks (measured: polite chunk=1024
        requests came back as median-39-item leases, 4x the task count
        for the same URLs). The next pump round re-asks after tokens
        refill."""
        out = []
        for _ in range(k):
            lease = self.lease(n, now)
            if not lease["seq"]:
                break
            out.append(lease)
            if len(lease["seq"]) < n:
                break
        return out

    def get_next_lease_id(self) -> int:
        return self.next_lease_id

    # ------------------------------------------------------------------
    # global-FIFO interleave mode (SURVEY §7.4): two-phase claim
    # ------------------------------------------------------------------
    def peek_open(self, n: int) -> list[int]:
        """The shard's ``n`` smallest OPEN enqueue_seqs, without
        claiming — phase 1 of the cross-shard global-FIFO interleave
        (``Frontier.lease_wave_global``): the driver merges every
        shard's peek and claims the globally smallest seqs, so a K>1
        run reproduces the K=1 claim stream EXACTLY. Stale heap
        entries encountered are dropped (the usual lazy deletion);
        valid ones are re-pushed. Conformance-mode primitive —
        throughput mode is the pump."""
        valid: list[tuple] = []
        while self.heap and len(valid) < n:
            entry = heapq.heappop(self.heap)
            it = self.items.get(entry[-1])
            if it is None or it[_STATUS] != INITIAL:
                continue
            valid.append(entry)
        for entry in valid:
            heapq.heappush(self.heap, entry)
        return [e[-1] for e in valid]

    def lease_seqs(self, seqs: list[int], now: float | None = None) -> dict:
        """Phase 2 of the global-FIFO interleave: claim EXACTLY these
        seqs (all must be open — the driver just peeked them; wave
        mode has no concurrent mutation between the phases). Same
        lease bookkeeping as ``lease``; heap entries stay behind as
        stale rows for lazy deletion."""
        now = time.monotonic() if now is None else now
        claimed: list[int] = []
        for seq in seqs:
            it = self.items.get(seq)
            if it is None or it[_STATUS] != INITIAL:
                continue
            it[_STATUS] = RUNNING
            it[_ATTEMPTS] += 1
            claimed.append(seq)
        if not claimed:
            return {"lease_id": -1, "seq": [], "url": [], "host": [],
                    "depth": [], "retries": [], "priority": [],
                    "attempt": []}
        lease_id = self.next_lease_id
        self.next_lease_id += 1
        self.leases[lease_id] = (claimed, now + self.lease_ttl)
        self.counters["leased"] += len(claimed)
        self.counters["leases_issued"] += 1
        its = [self.items[s] for s in claimed]
        return {"lease_id": lease_id, "seq": claimed,
                "url": [i[_URL] for i in its],
                "host": [i[_HOST] for i in its],
                "depth": [i[_DEPTH] for i in its],
                "retries": [i[_RETRIES] for i in its],
                "priority": [i[_PRIORITY] for i in its],
                "attempt": [i[_ATTEMPTS] - 1 for i in its]}

    # ------------------------------------------------------------------
    # commit (reference K4 updateQueueNew, crawl_queue.ts:119-149)
    # ------------------------------------------------------------------
    def commit(self, lease_id: int, seqs: list[int], statuses: list[str],
               errors: list[str] | None = None, now: float | None = None,
               eager_retry: bool = False) -> dict:
        """Write back results for (part of) a lease.

        ``statuses[i]`` ∈ {'completed', 'failed', 'blocked'}:
          completed → COMPLETED, crawled_at stamped
          failed    → FAILED, retries += 1   (handler.ts:109,161-162)
          blocked   → FAILED, retries unchanged (R6, handler.ts:171-176)
        Uncommitted lease members roll back to INITIAL (R5).

        ``eager_retry=True`` (async-pump mode) applies R1 at commit
        time: a retryable failure goes straight back to INITIAL at its
        original seq instead of waiting for the global
        failed>0 ∧ running==0 gate — same final states and retry
        counts, no full-drain barrier between retry rounds.
        """
        now = time.time() if now is None else now
        errors = errors or [""] * len(seqs)
        lease = self.leases.pop(lease_id, None)
        lease_seqs = set(lease[0]) if lease else set()
        for seq, st, err in zip(seqs, statuses, errors):
            it = self.items.get(seq)
            if it is None or it[_STATUS] != RUNNING:
                continue
            lease_seqs.discard(seq)
            if st == "completed":
                it[_STATUS] = COMPLETED
                it[_CRAWLED] = now
                self.counters["committed_ok"] += 1
                if self.track_seen_urls:
                    self._terminal_seen.append(it[_URL])
            elif st == "blocked":
                it[_ERROR] = err or "blocked"
                self.counters["committed_blocked"] += 1
                if eager_retry:
                    it[_STATUS] = INITIAL
                    heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                    self.counters["retried"] += 1
                else:
                    it[_STATUS] = FAILED
            else:
                it[_RETRIES] += 1
                it[_ERROR] = err or "failed"
                self.counters["committed_fail"] += 1
                if it[_RETRIES] >= self.max_retries:
                    it[_STATUS] = FAILED
                    if self.track_seen_urls:
                        self._terminal_seen.append(it[_URL])
                elif eager_retry:
                    it[_STATUS] = INITIAL
                    heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                    self.counters["retried"] += 1
                else:
                    it[_STATUS] = FAILED
        # R5: anything leased but not reported rolls back to initial
        rolled = 0
        for seq in lease_seqs:
            it = self.items.get(seq)
            if it is not None and it[_STATUS] == RUNNING:
                it[_STATUS] = INITIAL
                heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                rolled += 1
        self.counters["rolled_back"] += rolled
        return {"rolled_back": rolled}

    def rollback(self, lease_id: int) -> int:
        """Worker-abort rollback (R5): every lease item running→initial."""
        lease = self.leases.pop(lease_id, None)
        if lease is None:
            return 0
        n = 0
        for seq in lease[0]:
            it = self.items.get(seq)
            if it is not None and it[_STATUS] == RUNNING:
                it[_STATUS] = INITIAL
                heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                n += 1
        self.counters["rolled_back"] += n
        return n

    def expire_leases(self, now: float | None = None) -> int:
        """Lease-TTL healing (maps reference R3 lost-worker healing,
        workermeta.model.ts:175-203)."""
        now = time.monotonic() if now is None else now
        expired = [lid for lid, (_, exp) in self.leases.items() if exp <= now]
        n = 0
        for lid in expired:
            n += self.rollback(lid)
            self.counters["expired_leases"] += 1
        return n

    # ------------------------------------------------------------------
    # retry / heal (reference R1-R4, queue.model.ts:245-308)
    # ------------------------------------------------------------------
    def retry_failed(self) -> int:
        """R1: failed ∧ retries < max → initial, at ORIGINAL seq position.

        The reference updates rows in place so a retried item keeps its
        queue position (queue.model.ts:258-266); re-pushing the original
        seq into the heap reproduces that exactly.
        """
        n = 0
        for seq, it in self.items.items():
            if it[_STATUS] == FAILED and it[_RETRIES] < self.max_retries \
                    and it[_ERROR] != "robots_disallowed":
                it[_STATUS] = INITIAL
                heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                n += 1
        self.counters["retried"] += n
        return n

    def requeue_all_failed(self) -> int:
        """R4 manual re-enqueue: failed → initial, retries/error reset
        (queue.model.ts:274-287)."""
        n = 0
        for seq, it in self.items.items():
            if it[_STATUS] == FAILED:
                it[_STATUS] = INITIAL
                it[_RETRIES] = 0
                it[_ERROR] = ""
                heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                n += 1
        return n

    def requeue_seqs(self, seqs: list[int], reset_retries: bool = True) -> int:
        """M6 enqueue-check requeue (queue.service.ts:106-180): reset
        the given (already-crawled) items to INITIAL so they re-crawl;
        unknown seqs are ignored (callers broadcast to shards)."""
        n = 0
        for seq in seqs:
            it = self.items.get(seq)
            if it is None or it[_STATUS] == RUNNING:
                continue
            if it[_STATUS] != INITIAL:
                it[_STATUS] = INITIAL
                if reset_retries:
                    it[_RETRIES] = 0
                    it[_ERROR] = ""
                heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                n += 1
        return n

    def heal_running(self) -> int:
        """R2 manual heal: every running → initial (queue.model.ts:295-308)."""
        n = 0
        for seq, it in self.items.items():
            if it[_STATUS] == RUNNING:
                it[_STATUS] = INITIAL
                heapq.heappush(self.heap, self._key(seq, it[_DEPTH], it[_PRIORITY]))
                n += 1
        self.leases.clear()
        return n

    # ------------------------------------------------------------------
    # aggregates (reference G1/G2, queue.model.ts:98-127)
    # ------------------------------------------------------------------
    def status_histogram(self) -> dict[str, int]:
        h = {"initial": 0, "running": 0, "completed": self._evicted_completed,
             "failed": self._evicted_failed}
        names = ("initial", "running", "completed", "failed")
        for it in self.items.values():
            h[names[it[_STATUS]]] += 1
        return h

    def is_finished(self) -> bool:
        """G2 task-finished predicate: nothing initial/running and every
        failed item is terminally failed (retries exhausted)."""
        for it in self.items.values():
            st = it[_STATUS]
            if st in (INITIAL, RUNNING):
                return False
            if st == FAILED and it[_RETRIES] < self.max_retries \
                    and it[_ERROR] != "robots_disallowed":
                return False
        return True

    def seen_set(self) -> list[str]:
        """Distinct canonical URLs that reached completed or terminal
        failed — the derived 'URL-seen set' (SURVEY.md §1.1)."""
        out = set(self._terminal_seen)
        for it in self.items.values():
            if it[_STATUS] == COMPLETED or (
                    it[_STATUS] == FAILED and (it[_RETRIES] >= self.max_retries
                                               or it[_ERROR] == "robots_disallowed")):
                out.add(it[_URL])
        return sorted(out)

    def get_counters(self) -> dict:
        return dict(self.counters)

    def dump_items(self) -> dict:
        """Full item table as a columnar dict (small shards / tests)."""
        seqs = sorted(self.items)
        cols = {"enqueue_seq": seqs}
        for name, idx in [("url", _URL), ("host", _HOST), ("depth", _DEPTH),
                          ("priority", _PRIORITY), ("status", _STATUS),
                          ("retries", _RETRIES), ("error", _ERROR),
                          ("crawled_at", _CRAWLED), ("attempts", _ATTEMPTS)]:
            cols[name] = [self.items[s][idx] for s in seqs]
        return cols

    def evict_terminal(self) -> int:
        """Drop terminal items from memory (counts preserved) — keeps
        shard memory O(active frontier) at 10^10-URL scale."""
        gone = [s for s, it in self.items.items()
                if it[_STATUS] == COMPLETED
                or (it[_STATUS] == FAILED and (it[_RETRIES] >= self.max_retries
                                               or it[_ERROR] == "robots_disallowed"))]
        for s in gone:
            it = self.items.pop(s)
            if it[_STATUS] == COMPLETED:
                self._evicted_completed += 1
            else:
                self._evicted_failed += 1
        self.counters["evicted"] += len(gone)
        return len(gone)

    # ------------------------------------------------------------------
    # checkpoint / restore (north rule: resumable from checkpoint)
    # ------------------------------------------------------------------
    def snapshot(self, path: str) -> str:
        """Write shard state atomically: items → parquet, control state
        (filter/buckets/counters/heap) → pickle. Returns the path."""
        os.makedirs(path, exist_ok=True)
        cols = self.dump_items()
        tbl = pa.table({
            "enqueue_seq": pa.array(cols["enqueue_seq"], pa.uint64()),
            "url": pa.array(cols["url"], pa.string()),
            "host": pa.array(cols["host"], pa.string()),
            "depth": pa.array(cols["depth"], pa.int32()),
            "priority": pa.array(cols["priority"], pa.int32()),
            "status": pa.array(cols["status"], pa.uint8()),
            "retries": pa.array(cols["retries"], pa.uint8()),
            "error": pa.array(cols["error"], pa.string()),
            "crawled_at": pa.array(cols["crawled_at"], pa.float64()),
            "attempts": pa.array(cols["attempts"], pa.int32()),
        })
        ctrl = {
            "shard_id": self.shard_id, "dedup": self.dedup,
            "max_retries": self.max_retries, "lease_ttl": self.lease_ttl,
            "order": self.order, "seed": self.seed,
            "next_lease_id": self.next_lease_id,
            "next_local_seq": self.next_local_seq,
            "counters": self.counters,
            "evicted_completed": self._evicted_completed,
            "evicted_failed": self._evicted_failed,
            "track_seen_urls": self.track_seen_urls,
            "terminal_seen": self._terminal_seen,
            "seen": self.seen.state() if self.seen is not None else None,
            "politeness": self.politeness.state() if self.politeness is not None else None,
            "robots": self.robots.state() if self.robots is not None else None,
        }
        # atomic: write temp then rename (ray_guide resumable-output pattern)
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        os.close(fd)
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(path, "items.parquet"))
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(ctrl, f)
        os.replace(tmp, os.path.join(path, "control.pkl"))
        return path

    def restore(self, path: str) -> int:
        """Load state written by ``snapshot``. In-flight leases become
        running items healed back to initial (a killed run never
        committed them). Returns item count."""
        with open(os.path.join(path, "control.pkl"), "rb") as f:
            ctrl = pickle.load(f)
        self.shard_id = ctrl["shard_id"]
        self.dedup = ctrl["dedup"]
        self.max_retries = ctrl["max_retries"]
        self.lease_ttl = ctrl["lease_ttl"]
        self.order = ctrl["order"]
        self.seed = ctrl["seed"]
        self.next_lease_id = ctrl["next_lease_id"]
        # parking lot resets: parked items are in the item table and
        # re-enter the rebuilt heap below (ready times are recomputed
        # lazily on the next blocked claim)
        self._parked = {}
        self._park_heap = []
        self._park_pending = set()
        self.next_local_seq = ctrl.get("next_local_seq",
                                       (self.shard_id + 1) * 10 ** 12)
        self.counters = ctrl["counters"]
        self._evicted_completed = ctrl["evicted_completed"]
        self._evicted_failed = ctrl["evicted_failed"]
        self.track_seen_urls = ctrl.get("track_seen_urls", True)
        self._terminal_seen = ctrl["terminal_seen"]
        st = ctrl["seen"]
        if st is None:
            self.seen = None
        elif st["kind"] == "exact":
            self.seen = ExactSeenSet.from_state(st)
        elif st["kind"] == "scalable":
            self.seen = ScalableSeenFilter.from_state(st)
        elif st["kind"] == "cuckoo":
            self.seen = CuckooFilter.from_state(st)
        else:
            self.seen = BloomFilter.from_state(st)
        self.politeness = (HostPoliteness.from_state(ctrl["politeness"])
                           if ctrl["politeness"] is not None else None)
        rst = ctrl["robots"]
        if rst is None:
            self.robots = None
        elif rst.get("kind") == "real":
            self.robots = RealRobots.from_state(rst)
        else:
            self.robots = RobotsCache.from_state(rst)
        tbl = pq.read_table(os.path.join(path, "items.parquet"))
        self.items = {}
        self.heap = []
        self.leases = {}
        cols = {name: tbl[name].to_pylist() for name in tbl.column_names}
        for i in range(tbl.num_rows):
            seq = cols["enqueue_seq"][i]
            status = cols["status"][i]
            if status == RUNNING:  # heal in-flight leases (R3)
                status = INITIAL
            self.items[seq] = [cols["url"][i], cols["host"][i], cols["depth"][i],
                               cols["priority"][i], status, cols["retries"][i],
                               cols["error"][i], cols["crawled_at"][i],
                               cols["attempts"][i]]
            if status == INITIAL:
                heapq.heappush(self.heap, self._key(seq, cols["depth"][i], cols["priority"][i]))
        return len(self.items)


FrontierShard = ray.remote(FrontierShardCore)


class Frontier:
    """Driver-side facade over K FrontierShard actors.

    Routing: shard = stable_hash64(host) % K — host-affine so per-host
    politeness and URL dedup are shard-local (a canonical URL always
    lands on the same shard). The facade owns the global
    ``enqueue_seq`` counter — the single ingest point, like the
    reference master API (queue.model.ts:32-68). Conformance mode is
    K=1 (global FIFO identical to the reference, SURVEY.md §7.4);
    K>1 gives per-shard FIFO with deterministic shard interleaving.
    """

    def __init__(self, num_shards: int = 1, *, seed: int = 42,
                 shard_resources: list[dict] | None = None,
                 **shard_kwargs):
        # shard_resources: optional per-shard custom-resource demands
        # (len == num_shards), e.g. [{"nodeA": 0.5}, {"nodeB": 0.5}, …]
        # — lets a multi-node deployment (or the single-box placement
        # rehearsal, tools/remote_shards.py) pin each shard to a node
        # group; placement changes WHERE a shard runs, never routing
        # (shard = stable_hash64(host) % K is placement-independent).
        self.num_shards = num_shards
        self.seed = seed
        self.shard_kwargs = dict(shard_kwargs, seed=seed)
        if shard_resources is not None:
            assert len(shard_resources) == num_shards
            self.shards = [FrontierShard.options(
                resources=shard_resources[i]).remote(
                    i, **self.shard_kwargs)
                for i in range(num_shards)]
        else:
            self.shards = [FrontierShard.remote(i, **self.shard_kwargs)
                           for i in range(num_shards)]
        self.next_seq = 0
        # memoized host → shard; bounded (web-scale host sets reach
        # 10^7-10^8 — an unbounded driver-side memo would be its own
        # memory cliff). Cleared wholesale past the cap: rehashing a
        # host is cheap, correctness never depends on the memo.
        self._host_shard: dict[str, int] = {}
        self._host_shard_cap = 1 << 20

    def _route(self, url: str) -> int:
        # hot path: cheap host extraction (full canonicalization happens
        # inside the shard, in parallel); memoized per host — the host
        # set is tiny relative to the URL stream
        rest = url.split("://", 1)[-1]
        host = rest.split("/", 1)[0].rsplit("@", 1)[-1].split(":", 1)[0].lower()
        sh = self._host_shard.get(host)
        if sh is None:
            if len(self._host_shard) >= self._host_shard_cap:
                self._host_shard.clear()
            sh = stable_hash64(host, self.seed) % self.num_shards
            self._host_shard[host] = sh
        return sh

    def enqueue(self, urls: list[str], depths: list[int] | None = None,
                priorities: list[int] | None = None) -> int:
        """Assign global seqs in list order and scatter to shards.

        Vectorized routing: hosts extracted with an Arrow C++ regex,
        dictionary-encoded, and only the (small) distinct-host set is
        hashed in Python — the driver cost is O(urls) numpy work, not
        O(urls) Python parsing.
        """
        n = len(urls)
        if n == 0:
            return 0
        if n < 256:  # small batches: plain loop is cheaper than arrow setup
            return self._enqueue_slow(urls, depths, priorities)
        refs = self.enqueue_async(urls, depths, priorities)
        return sum(ray.get(refs)) if refs else 0

    def enqueue_async(self, urls: list[str], depths: list[int] | None = None,
                      priorities: list[int] | None = None) -> list:
        """Non-blocking enqueue: returns the shard insert refs instead
        of waiting (the async pump overlaps inserts with fetches;
        callers must drain the refs before trusting drained-ness)."""
        n = len(urls)
        if n == 0:
            return []
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        arr = pa.array(urls, pa.string())
        hosts = pc.extract_regex(pc.utf8_lower(arr), r"^[a-z0-9+.-]+://(?P<h>[^/?#]+)")
        host_field = pc.struct_field(hosts, "h")
        if host_field.null_count:
            # rare fallback: synchronous slow path; wrap the count so
            # callers can still sum(ray.get(refs))
            return [ray.put(self._enqueue_slow(urls, depths, priorities))]
        enc = pc.dictionary_encode(host_field)
        dictionary = enc.dictionary.to_pylist()
        shard_list = []
        for h in dictionary:
            hh = h.rsplit("@", 1)[-1].split(":", 1)[0]
            sh = self._host_shard.get(hh)
            if sh is None:
                if len(self._host_shard) >= self._host_shard_cap:
                    self._host_shard.clear()
                sh = stable_hash64(hh, self.seed) % self.num_shards
                self._host_shard[hh] = sh
            shard_list.append(sh)
        shard_of_host = np.array(shard_list, dtype=np.int64)
        shard_ids = shard_of_host[enc.indices.to_numpy(zero_copy_only=False)]
        urls_np = np.asarray(urls, dtype=object)
        depths_np = (np.asarray(depths, dtype=np.int64) if depths is not None
                     else np.zeros(n, dtype=np.int64))
        prios_np = (np.asarray(priorities, dtype=np.int64) if priorities is not None
                    else np.ones(n, dtype=np.int64))
        base = self.next_seq
        self.next_seq += n
        refs = []
        for sh in np.unique(shard_ids):
            idx = np.flatnonzero(shard_ids == sh)
            refs.append(self.shards[int(sh)].enqueue.remote(
                (base + idx).tolist(), urls_np[idx].tolist(),
                depths_np[idx].tolist(), prios_np[idx].tolist()))
        return refs

    def _enqueue_slow(self, urls, depths=None, priorities=None) -> int:
        depths = depths or [0] * len(urls)
        priorities = priorities or [1] * len(urls)
        per_shard: dict[int, tuple[list, list, list, list]] = {}
        seq = self.next_seq
        route = self._route
        for url, d, p in zip(urls, depths, priorities):
            b = per_shard.get(route(url))
            if b is None:
                b = per_shard.setdefault(route(url), ([], [], [], []))
            b[0].append(seq)
            b[1].append(url)
            b[2].append(d)
            b[3].append(p)
            seq += 1
        self.next_seq = seq
        refs = [self.shards[sh].enqueue.remote(*b) for sh, b in per_shard.items()]
        return sum(ray.get(refs))

    def enqueue_dataset(self, ds, url_column: str = "url",
                        depth_column: str | None = None) -> int:
        """DISTRIBUTED seed ingest (S1/S2 at 10^10 scale): consume a
        ``ray.data.Dataset`` of URLs with map_batches tasks that route
        each batch straight to the owning shards — the driver never
        reads the seed list. Shards allocate their own seq blocks
        (``enqueue_discovered``), so per-shard FIFO holds while global
        interleaving follows block scheduling — the same documented
        trade as async-pump child routing; use ``enqueue`` (driver
        seqs) when exact global FIFO conformance is required.
        Returns the number of URLs inserted (after dedup)."""
        shards = self.shards
        seed = self.seed
        k = self.num_shards

        def route(batch: pa.Table) -> pa.Table:
            urls = batch[url_column].to_pylist()
            depths = (batch[depth_column].to_pylist() if depth_column
                      else [0] * len(urls))
            per: dict[int, tuple[list, list]] = {}
            memo: dict[str, int] = {}
            for u, d in zip(urls, depths):
                rest = u.split("://", 1)[-1]
                host = (rest.split("/", 1)[0].rsplit("@", 1)[-1]
                        .split(":", 1)[0].lower())
                sh = memo.get(host)
                if sh is None:
                    sh = stable_hash64(host, seed) % k
                    memo[host] = sh
                b = per.get(sh)
                if b is None:
                    b = per.setdefault(sh, ([], []))
                b[0].append(u)
                b[1].append(d)
            refs = [shards[sh].enqueue_discovered.remote(us, ds_)
                    for sh, (us, ds_) in per.items()]
            inserted = sum(ray.get(refs))  # await: consumption == landed
            return pa.table({"inserted": pa.array([inserted], pa.int64())})

        out = ds.map_batches(route, batch_format="pyarrow").to_pandas()
        return int(out["inserted"].sum())

    def lease_wave(self, n_per_shard: int, now: float | None = None) -> list[dict]:
        """One synchronized claim across all shards (deterministic shard
        order). Returns non-empty lease dicts tagged with 'shard'."""
        refs = [sh.lease.remote(n_per_shard, now) for sh in self.shards]
        out = []
        for i, lease in enumerate(ray.get(refs)):
            if lease["seq"]:
                lease["shard"] = i
                out.append(lease)
        return out

    def lease_wave_global(self, n: int,
                          now: float | None = None) -> list[dict]:
        """Cross-shard GLOBAL-FIFO wave (SURVEY §7.4): claim the ``n``
        globally smallest open enqueue_seqs across all K shards, via
        peek-merge-claim. A K>1 run in this mode produces the exact
        K=1 claim stream — the same closed-form DuckDB replay gates
        both (q_crawl_order / q_crawl_order_sharded). Two actor
        round-trips per wave instead of one: the conformance-mode
        price; throughput mode is the async pump."""
        peeks = ray.get([sh.peek_open.remote(n) for sh in self.shards])
        ranked = sorted((seq, i) for i, seqs in enumerate(peeks)
                        for seq in seqs)[:n]
        per_shard: dict[int, list[int]] = {}
        for seq, i in ranked:
            per_shard.setdefault(i, []).append(seq)
        refs = {i: self.shards[i].lease_seqs.remote(seqs, now)
                for i, seqs in per_shard.items()}
        out = []
        for i in sorted(refs):
            lease = ray.get(refs[i])
            if lease["seq"]:
                lease["shard"] = i
                out.append(lease)
        return out

    def commit(self, shard: int, lease_id: int, seqs, statuses, errors=None,
               now: float | None = None, eager_retry: bool = False):
        return self.shards[shard].commit.remote(lease_id, seqs, statuses,
                                                errors, now, eager_retry)

    def rollback(self, shard: int, lease_id: int) -> int:
        return ray.get(self.shards[shard].rollback.remote(lease_id))

    def retry_failed(self) -> int:
        """R1 with the reference gate: only fires when no items are
        running (daemon.ts:188-194)."""
        h = self.status_histogram()
        if h["running"] > 0 or h["failed"] == 0:
            return 0
        return sum(ray.get([sh.retry_failed.remote() for sh in self.shards]))

    def expire_leases(self, now: float | None = None) -> int:
        return sum(ray.get([sh.expire_leases.remote(now) for sh in self.shards]))

    def evict_terminal(self) -> int:
        """Bound shard memory: drop terminal items (counts preserved)."""
        return sum(ray.get([sh.evict_terminal.remote() for sh in self.shards]))

    def status_histogram(self) -> dict[str, int]:
        hists = ray.get([sh.status_histogram.remote() for sh in self.shards])
        out = {"initial": 0, "running": 0, "completed": 0, "failed": 0}
        for h in hists:
            for k, v in h.items():
                out[k] += v
        return out

    def is_finished(self) -> bool:
        return all(ray.get([sh.is_finished.remote() for sh in self.shards]))

    def seen_set(self) -> list[str]:
        out: set[str] = set()
        for part in ray.get([sh.seen_set.remote() for sh in self.shards]):
            out.update(part)
        return sorted(out)

    def counters(self) -> dict:
        parts = ray.get([sh.get_counters.remote() for sh in self.shards])
        out: dict[str, int] = {}
        for p in parts:
            for k, v in p.items():
                out[k] = out.get(k, 0) + v
        return out

    def dump_table(self) -> pa.Table:
        dumps = ray.get([sh.dump_items.remote() for sh in self.shards])
        tables = []
        for cols in dumps:
            if cols["enqueue_seq"]:
                tables.append(pa.table({
                    "enqueue_seq": pa.array(cols["enqueue_seq"], pa.uint64()),
                    "url": pa.array(cols["url"], pa.string()),
                    "host": pa.array(cols["host"], pa.string()),
                    "depth": pa.array(cols["depth"], pa.int32()),
                    "priority": pa.array(cols["priority"], pa.int32()),
                    "status": pa.array(cols["status"], pa.uint8()),
                    "retries": pa.array(cols["retries"], pa.uint8()),
                    "error": pa.array(cols["error"], pa.string()),
                    "crawled_at": pa.array(cols["crawled_at"], pa.float64()),
                    "attempts": pa.array(cols["attempts"], pa.int32()),
                }))
        if not tables:
            return pa.table({"enqueue_seq": pa.array([], pa.uint64())})
        tbl = pa.concat_tables(tables)
        return tbl.sort_by("enqueue_seq")

    # ---- checkpoint / resume -----------------------------------------
    def checkpoint(self, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        ray.get([sh.snapshot.remote(os.path.join(ckpt_dir, f"shard_{i:04d}"))
                 for i, sh in enumerate(self.shards)])
        meta = {"num_shards": self.num_shards, "seed": self.seed,
                "next_seq": self.next_seq, "shard_kwargs": self.shard_kwargs}
        fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(meta, f)
        os.replace(tmp, os.path.join(ckpt_dir, "frontier.pkl"))

    @classmethod
    def restore(cls, ckpt_dir: str) -> "Frontier":
        with open(os.path.join(ckpt_dir, "frontier.pkl"), "rb") as f:
            meta = pickle.load(f)
        fr = cls.__new__(cls)
        fr.num_shards = meta["num_shards"]
        fr.seed = meta["seed"]
        fr.shard_kwargs = meta["shard_kwargs"]
        fr.next_seq = meta["next_seq"]
        fr._host_shard = {}
        fr._host_shard_cap = 1 << 20
        fr.shards = [FrontierShard.remote(i, **fr.shard_kwargs)
                     for i in range(fr.num_shards)]
        ray.get([sh.restore.remote(os.path.join(ckpt_dir, f"shard_{i:04d}"))
                 for i, sh in enumerate(fr.shards)])
        return fr
