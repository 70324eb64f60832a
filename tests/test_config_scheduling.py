import json

import pytest

from crawling_infrastructure_ray.config import (CrawlOptions, JobConfig,
                                                HARD_LIMIT_MAX_WORKERS, MAX_IPS)
from crawling_infrastructure_ray.functions.scheduling import (
    avg_items_per_second, fleet_size, lease_size)


def test_jobconfig_defaults_match_reference():
    c = JobConfig()
    assert c.retry_failed_items == 3          # crawltask.model.ts:399-403
    assert c.max_lost_workers == 10           # crawltask.model.ts:323-327
    assert c.num_items_browser == 15          # scheduler.conf.json:6
    assert c.num_items_http == 30             # scheduler.conf.json:7
    assert c.max_crawling_time_s == 240       # scheduler.conf.json:19
    assert c.crawl_options.default_navigation_timeout_ms == 40_000


def test_jobconfig_clamps_and_validation():
    c = JobConfig(max_items_per_second=9999, max_workers=100_000)
    assert c.max_items_per_second == MAX_IPS          # MAX_IPS=200 clamp
    assert c.max_workers == HARD_LIMIT_MAX_WORKERS    # 500 cap
    with pytest.raises(ValueError):
        JobConfig(priority=11)
    with pytest.raises(ValueError):
        JobConfig(worker_type="lambda")


def test_jobconfig_json_passthrough():
    payload = {"name": "t1", "priority": 5, "custom_field": {"a": 1},
               "crawl_options": {"viewport_width": 800, "unknown_opt": True}}
    c = JobConfig.from_json(json.dumps(payload))
    assert c.priority == 5
    assert c.extra == {"custom_field": {"a": 1}}      # dynamic-schema passthrough
    assert c.crawl_options.viewport_width == 800
    # round-trips
    assert json.loads(c.to_json())["name"] == "t1"


def test_cold_start_rates():
    # crawltask.model.ts:450-457 — cold-start only with ZERO
    # measurements; any measurements at all (even < 7) use the average
    assert avg_items_per_second([], "http") == 0.5
    assert avg_items_per_second([], "browser") == 0.2
    assert avg_items_per_second([1.0] * 6, "browser") == 1.0
    assert avg_items_per_second([2.0] * 7, "http") == 2.0
    # MIN_AVG_IPS clamp (crawltask.model.ts:460-466)
    assert avg_items_per_second([0.0] * 7, "http") == 0.01


def test_fleet_size_formula():
    # max_ips / rate: 1 when <= 1, else floor (crawltask.model.ts:468-476)
    assert fleet_size(1.0, [], "http") == 2          # 1.0 / 0.5
    assert fleet_size(1.0, [], "browser") == 5       # 1.0 / 0.2
    assert fleet_size(10.0, [2.0] * 7) == 5
    assert fleet_size(0.1, [2.0] * 7) == 1           # min 1
    assert fleet_size(200.0, [0.0] * 7) == 500       # clamp at HARD_LIMIT


def test_lease_size_formula():
    # defaults until 7 measurements exist (runner.ts:304-305,
    # scheduler.conf.json:6-7) — 6 measurements still use the default
    assert lease_size([], "http") == 30
    assert lease_size([], "browser") == 15
    assert lease_size([10.0] * 6, "http") == 30
    # floor(240 / seconds_per_item) (runner.ts:306-317)
    assert lease_size([0.5] * 7, "http") == 120
    # avg <= 0 falls back to the cold-start rate, not a clamp
    # (runner.ts:308-310): 240 / (1/0.5) = 120
    assert lease_size([0.0] * 7, "http") == 120
    assert lease_size([0.0] * 7, "browser") == 48    # 240 * 0.2
    # whitelisted-proxies OVERWRITES to 100/200 (runner.ts:320-322) —
    # it can RAISE a smaller computed value, it is not a min-cap
    assert lease_size([10.0] * 7, "http", whitelisted=True) == 200
    assert lease_size([10.0] * 7, "browser", whitelisted=True) == 100
    assert lease_size([0.1] * 7, "http", whitelisted=True) == 200  # raised from 24
    # max_items_per_worker cap applied last (runner.ts:324-326)
    assert lease_size([0.5] * 7, "http", max_items_per_worker=50) == 50
    assert lease_size([10.0] * 7, "http", whitelisted=True,
                      max_items_per_worker=50) == 50
