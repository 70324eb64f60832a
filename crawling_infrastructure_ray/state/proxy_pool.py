"""Proxy pool actor — rebuild of the reference proxy subsystem.

Reference: proxy documents with usage counters
(lib/types/proxy.ts:77-175), unique identity index
(master/src/models/proxy.model.ts:79, R8), and claim ordering
ascending (proxy_fail_counter, last_used, obtain_counter) — least
failed, least-recently-used first (crawler/src/proxy.ts:129-144, O2).
Fetcher actors claim a proxy per N crawls (A4 rotation,
crawler/src/worker.ts:333-400).

Implemented as a single small Ray actor (the pool is tiny — a lookup
side, never a shuffle side); claims are O(log n) heap operations.
"""

from __future__ import annotations


import ray

FUNCTIONAL, DAMAGED, EXPIRED = 0, 1, 2


class ProxyPoolCore:
    def __init__(self):
        self.proxies: dict[str, dict] = {}  # identity -> record
        self._clock = 0  # logical time for last_used ordering

    @staticmethod
    def identity(rec: dict) -> str:
        # unique compound identity (proxy.model.ts:79)
        return f"{rec.get('protocol','http')}://{rec.get('username','')}:{rec.get('password','')}@{rec['proxy']}"

    def upsert(self, records: list[dict]) -> int:
        """R8 dedup: insert only if identity absent (proxy.model.ts:96-124)."""
        n = 0
        for rec in records:
            key = self.identity(rec)
            if key not in self.proxies:
                self.proxies[key] = {
                    "proxy": rec["proxy"], "protocol": rec.get("protocol", "http"),
                    "username": rec.get("username", ""), "password": rec.get("password", ""),
                    "status": rec.get("status", FUNCTIONAL),
                    "rotating": rec.get("rotating", False),
                    "whitelisted": rec.get("whitelisted", False),
                    "proxy_fail_counter": rec.get("proxy_fail_counter", 0),
                    "last_used": rec.get("last_used", 0),
                    "obtain_counter": rec.get("obtain_counter", 0),
                    "block_counter": rec.get("block_counter", 0),
                }
                n += 1
        return n

    def claim(self) -> dict | None:
        """O2 claim order: asc (fail_counter, last_used, obtain_counter)."""
        best_key, best = None, None
        for key, rec in self.proxies.items():
            if rec["status"] != FUNCTIONAL:
                continue
            order = (rec["proxy_fail_counter"], rec["last_used"], rec["obtain_counter"])
            if best is None or order < best:
                best, best_key = order, key
        if best_key is None:
            return None
        rec = self.proxies[best_key]
        self._clock += 1
        rec["last_used"] = self._clock
        rec["obtain_counter"] += 1
        return dict(rec)

    def report(self, proxy_identity: str, *, failed: bool = False, blocked: bool = False):
        rec = self.proxies.get(proxy_identity)
        if rec is None:
            return
        if failed:
            rec["proxy_fail_counter"] += 1
        if blocked:
            rec["block_counter"] += 1

    def size(self) -> int:
        return len(self.proxies)

    def dump(self) -> list[dict]:
        return [dict(r) for r in self.proxies.values()]


ProxyPool = ray.remote(ProxyPoolCore)
