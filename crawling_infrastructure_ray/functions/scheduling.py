"""Fleet-sizing / lease-sizing formulas (reference feedback controller).

Exact reimplementation of the reference's scheduling math:

- fleet size (``maxWorkersConcurrentlyRunning``,
  master/src/models/crawltask.model.ts:449-478): when ANY rate
  measurements exist (length > 0) use their average; with none, assume
  cold-start 0.5 (http) / 0.2 (browser) items/s; clamp the average up
  to MIN_AVG_IPS=0.01 when it is smaller
  (constants/crawlTaskApi.constants.ts:6); workers =
  max_items_per_second / avg, floor'd when > 1, min 1.
- lease size (``getNumItems``, master/scheduler/runner.ts:302-329):
  configured defaults 15 browser / 30 http until ≥7 measurements
  exist; then avg = average(measurements), falling back to the
  cold-start value when avg ≤ 0 (NOT a MIN_AVG_IPS clamp), and
  num_items = floor(max_crawling_time / (1/avg)). The
  whitelisted-proxies/docker hard limit OVERWRITES num_items to
  100 (browser) / 200 (http) — it can raise a smaller computed value,
  it is not a cap. ``max_items_per_worker`` is a min-cap applied last.

In the Ray rebuild these numbers size the actor-pool ``concurrency``
and ``chunk_size`` instead of a Lambda fleet, but the control law is
the reference's.
"""

from __future__ import annotations

import math

from ..config import HARD_LIMIT_MAX_WORKERS, MIN_AVG_IPS
from .scalars import average

COLD_START_IPS = {"http": 0.5, "browser": 0.2}  # crawltask.model.ts:454
DEFAULT_LEASE = {"http": 30, "browser": 15}     # scheduler.conf.json:6-7
WHITELISTED_LEASE = {"http": 200, "browser": 100}  # runner.ts:320-322
MIN_MEASUREMENTS = 7                             # runner.ts:305


def avg_items_per_second(measurements: list[float], worker_type: str = "http") -> float:
    """Fleet-sizing rate (crawltask.model.ts:450-467): measured average
    whenever any measurements exist, else cold-start; MIN_AVG_IPS
    clamp applied to tiny averages."""
    if len(measurements) <= 0:
        return COLD_START_IPS.get(worker_type, 0.5)
    rate = average(measurements)
    if rate < MIN_AVG_IPS:
        rate = MIN_AVG_IPS
    return rate


def fleet_size(max_items_per_second: float, measurements: list[float],
               worker_type: str = "http",
               max_workers: int = HARD_LIMIT_MAX_WORKERS) -> int:
    """Reference fleet controller (crawltask.model.ts:449-478), plus the
    scheduler's max_workers / HARD_LIMIT_MAX_WORKERS caps applied at
    launch time (daemon.ts:363-376)."""
    rate = avg_items_per_second(measurements, worker_type)
    n = max_items_per_second / rate
    n = 1 if n <= 1 else math.floor(n)
    return min(n, max_workers, HARD_LIMIT_MAX_WORKERS)


def lease_size(measurements: list[float], worker_type: str = "http",
               max_crawling_time_s: int = 240, whitelisted: bool = False,
               max_items_per_worker: int | None = None) -> int:
    """Reference getNumItems (runner.ts:302-329).

    ``whitelisted`` mirrors ``task.whitelisted_proxies`` (the docker
    path): it OVERWRITES the computed size with 100/200.
    """
    n = DEFAULT_LEASE.get(worker_type, 30)
    if len(measurements) >= MIN_MEASUREMENTS:
        rate = average(measurements)
        if rate <= 0:
            rate = COLD_START_IPS.get(worker_type, 0.5)
        seconds_per_item = 1.0 / rate
        n = math.floor(max_crawling_time_s / seconds_per_item)
    if whitelisted:
        n = WHITELISTED_LEASE.get(worker_type, 200)
    if max_items_per_worker:
        n = min(n, max_items_per_worker)
    return n
