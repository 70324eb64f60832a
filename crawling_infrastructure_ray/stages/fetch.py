"""FetchSim — the simulated fetch/render stage (reference M1/M2).

The reference's fetch is a user-supplied ``crawl(item)`` UDF run
sequentially per lease inside a Lambda/docker worker
(crawler/src/handler.ts:83-189) holding per-worker state: a configured
HTTP client or a headless browser, proxy rotation counters, seeded
jitter (A1/A2/A4). Here the stage is a callable CLASS for
``Dataset.map_batches(FetchSim, concurrency=N, batch_format="pyarrow")``
— an actor pool: per-actor state (RNG, session counters, compiled
nothing-else) built once in ``__init__``, per-batch work vectorized in
``__call__``.

The sandbox has no network, so fetching is a deterministic pure
function of (seed, url, attempt) — ``sources.corpus.fetch_outcome`` —
producing interleaved text+media span documents
(``sources.corpus.make_spans``) and discovered out-links
(``link_children``), which the crawl driver routes back to the
frontier (reference worker-side enqueue, crawler/src/enqueue.ts:71-116).

Output schema adds to the input columns:
  status: string ('completed'|'failed'|'blocked'), error: string,
  latency_ms: int32, doc_id: string, spans: list<struct<...>> (F1),
  discovered: list<string>.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.scalars import seeded_rng
from ..sources.corpus import (doc_id_for_url, fetch_outcome, link_children,
                              make_spans, spans_arrow_type)


def fetch_sim_batch(batch: pa.Table, *, seed: int = 42, max_depth: int = 2,
                    num_hosts: int = 64) -> pa.Table:
    """Stateless-function form of FetchSim for ``map_batches`` TASKS.

    The simulated fetch holds no session state, so the cheap/elastic
    task form avoids per-Dataset actor-pool startup (the crawl wave
    loop creates one Dataset per wave). A real network fetcher holds a
    session/browser → use the FetchSim actor class instead (A1/A2).
    """
    return FetchSim(seed=seed, max_depth=max_depth, num_hosts=num_hosts)(batch)


class FetchSim:
    def __init__(self, seed: int = 42, max_depth: int = 2, num_hosts: int = 64,
                 simulate_latency: bool = False):
        # once-per-actor setup (reference setup(), crawler/src/worker.ts:231-260)
        self.seed = seed
        self.max_depth = max_depth
        self.num_hosts = num_hosts
        self.simulate_latency = simulate_latency
        self.rng = seeded_rng(seed, "fetchsim")
        self.session_fetches = 0  # A4-style per-worker counter

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist() if "depth" in batch.column_names else [0] * len(urls)
        if "attempt" in batch.column_names:
            attempts = batch["attempt"].to_pylist()
        elif "retries" in batch.column_names:
            attempts = batch["retries"].to_pylist()
        else:
            attempts = [0] * len(urls)
        n = len(urls)
        status = np.empty(n, dtype=object)
        error = np.empty(n, dtype=object)
        latency = np.empty(n, dtype=np.int32)
        doc_ids = np.empty(n, dtype=object)
        spans: list = [None] * n
        discovered: list = [None] * n
        for i, (url, depth, attempt) in enumerate(zip(urls, depths, attempts)):
            out = fetch_outcome(url, attempt, self.seed)
            status[i] = out["status"]
            error[i] = out["error"]
            latency[i] = out["latency_ms"]
            if out["status"] == "completed":
                doc_ids[i] = doc_id_for_url(url)
                spans[i] = make_spans(url, self.seed)
                discovered[i] = link_children(url, depth, self.seed,
                                              self.max_depth, self.num_hosts)
            else:
                doc_ids[i] = ""
                spans[i] = []
                discovered[i] = []
        self.session_fetches += n
        if self.simulate_latency:
            # politeness-envelope simulation: sleep the max per-host
            # deterministic latency (kept off in bench; on in timing tests)
            import time
            time.sleep(float(latency.max()) / 1000.0)
        cols = {name: batch[name] for name in batch.column_names}
        cols["status"] = pa.array(status, pa.string())
        cols["error"] = pa.array(error, pa.string())
        cols["latency_ms"] = pa.array(latency)
        cols["doc_id"] = pa.array(doc_ids, pa.string())
        cols["spans"] = pa.array(spans, spans_arrow_type())
        cols["discovered"] = pa.array(discovered, pa.list_(pa.string()))
        return pa.table(cols)
