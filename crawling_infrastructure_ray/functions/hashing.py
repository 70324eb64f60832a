"""Stable hashing utilities.

``md5_id`` mirrors the reference's md5 request ids
(crawler/src/persistant_handler.ts:159-162). ``stable_hash64`` is the
partitioning hash used for frontier sharding and hash-partitioned
output layout — a splitmix64-finalized FNV-1a, stable across processes
(unlike Python's ``hash``). ``rolling_fingerprint`` is a Rabin-Karp
style rolling hash for document fingerprinting (training-data
pipeline addition; no reference analog).
"""

from __future__ import annotations

import hashlib

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = 0xFFFFFFFFFFFFFFFF


def stable_hash64(s: str | bytes, seed: int = 0) -> int:
    """64-bit stable string hash (FNV-1a + splitmix64 finalizer)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    h = (_FNV_OFFSET ^ (seed & _MASK)) & _MASK
    for b in s:
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    # splitmix64 finalizer for avalanche
    h = (h + 0x9E3779B97F4A7C15) & _MASK
    z = h
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return (z ^ (z >> 31)) & _MASK


def stable_hash64_np(arr, seed: int = 0) -> np.ndarray:
    """Vectorized stable 64-bit hash over an iterable of strings."""
    return np.fromiter((stable_hash64(s, seed) for s in arr), dtype=np.uint64, count=len(arr))


def md5_id(s: str | bytes) -> str:
    """Hex md5, used for doc ids (reference crawler/src/persistant_handler.ts:159-162)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return hashlib.md5(s).hexdigest()


def rolling_fingerprint(text: str, window: int = 16, keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint.

    Rabin-Karp rolling hash over character windows; keep the ``keep``
    smallest window hashes (a deterministic, order-insensitive sketch).
    Public algorithm (Schleimer et al., 'Winnowing: Local Algorithms
    for Document Fingerprinting', SIGMOD 2003).
    """
    if not text:
        return []
    data = text.encode("utf-8", "surrogatepass")
    n = len(data)
    if n <= window:
        return [stable_hash64(data)]
    base, mod = 257, (1 << 61) - 1
    power = pow(base, window - 1, mod)
    h = 0
    hashes = np.empty(n - window + 1, dtype=np.uint64)
    for i in range(window):
        h = (h * base + data[i]) % mod
    hashes[0] = h
    for i in range(1, n - window + 1):
        h = ((h - data[i - 1] * power) * base + data[i + window - 1]) % mod
        hashes[i] = h
    uniq = np.unique(hashes)
    return [int(x) for x in uniq[:keep]]
