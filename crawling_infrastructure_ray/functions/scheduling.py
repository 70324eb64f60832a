"""Fleet-sizing / lease-sizing formulas (reference feedback controller).

Exact reimplementation of the reference's scheduling math:
- fleet size = floor(max_items_per_second / avg measured per-worker
  rate), min 1, with cold-start assumptions 0.5 (http) / 0.2 (browser)
  items/s and the MIN_AVG_IPS=0.01 clamp
  (master/src/models/crawltask.model.ts:449-478,
   constants/crawlTaskApi.constants.ts:6)
- lease size = floor(max_crawling_time / seconds_per_item) once ≥7
  rate measurements exist, else the configured defaults 15/30; docker
  caps 100/200 (master/scheduler/runner.ts:302-329).

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
DOCKER_LEASE_CAP = {"http": 200, "browser": 100}  # runner.ts:320-322
MIN_MEASUREMENTS = 7                             # runner.ts:306


def avg_items_per_second(measurements: list[float], worker_type: str = "http") -> float:
    """Measured average rate with cold-start fallback + MIN clamp."""
    if len(measurements) < MIN_MEASUREMENTS:
        return COLD_START_IPS.get(worker_type, 0.5)
    return max(average(measurements), MIN_AVG_IPS)


def fleet_size(max_items_per_second: float, measurements: list[float],
               worker_type: str = "http",
               max_workers: int = HARD_LIMIT_MAX_WORKERS) -> int:
    """Reference fleet controller (crawltask.model.ts:449-478)."""
    rate = avg_items_per_second(measurements, worker_type)
    n = math.floor(max_items_per_second / rate)
    return max(1, min(n, max_workers, HARD_LIMIT_MAX_WORKERS))


def lease_size(measurements: list[float], worker_type: str = "http",
               max_crawling_time_s: int = 240, docker: bool = False,
               max_items_per_worker: int | None = None) -> int:
    """Reference getNumItems (runner.ts:302-329)."""
    if len(measurements) < MIN_MEASUREMENTS:
        n = DEFAULT_LEASE.get(worker_type, 30)
    else:
        rate = max(average(measurements), MIN_AVG_IPS)
        seconds_per_item = 1.0 / rate
        n = math.floor(max_crawling_time_s / seconds_per_item)
        n = max(1, n)
    if docker:
        n = min(n, DOCKER_LEASE_CAP.get(worker_type, 200))
    if max_items_per_worker:
        n = min(n, max_items_per_worker)
    return n
