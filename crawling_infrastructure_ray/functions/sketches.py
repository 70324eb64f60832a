"""Mergeable sketches for approximate aggregates at scale.

The reference has no sketches (its distinct counts are exact JS Sets,
stats.service.ts:132-157 — fine at its scale, impossible at 10^10).
HyperLogLog (Flajolet et al. 2007) is the scale path: one sketch per
batch inside ``map_batches``, merged in a tiny reduce — the shuffle
moves 2^p bytes per batch instead of every distinct value.
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_hash64


class HyperLogLog:
    """Dense HLL with 2^p registers (p=12 → 4 KB, ~1.6% rel. error)."""

    def __init__(self, p: int = 12, seed: int = 0):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.seed = seed

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(h.shape[0], dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        done = np.zeros(h.shape[0], dtype=bool)
        for i in range(64 - self.p + 1):
            hit = (~done) & ((cur & mask) != 0)
            lz[hit] = i + 1
            done |= hit
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, lz)

    def add(self, values) -> None:
        self.add_hashes(np.fromiter(
            (stable_hash64(str(v), self.seed) for v in values),
            dtype=np.uint64))

    def add_arrow(self, col) -> None:
        """Vectorized hash feed for an Arrow column: dictionary-encode
        so ``stable_hash64`` runs once per DISTINCT value (the
        ``bucketing.tag_bucket_fn`` recipe) — and because HLL registers
        are a per-index MAX, duplicate values can be dropped entirely:
        the distinct hashes alone produce bit-identical registers. The
        per-row cost is Arrow's C dictionary encode, not a Python
        loop. Null handling matches ``add`` (str(None) == 'None')."""
        import pyarrow as pa
        import pyarrow.compute as pc
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not (pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        col = pc.fill_null(col, "None")
        uniq = pc.unique(col)
        if not len(uniq):
            return
        from ..functions.hashing import stable_hash64_col_np
        self.add_hashes(stable_hash64_col_np(uniq, self.seed))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert other.p == self.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def stats(self) -> tuple[int, int]:
        """Exact-integer sketch summary: (n_zero_registers,
        harmonic_scaled) with harmonic_scaled = sum over NON-zero
        registers of 2^(S - rank), S = 64 - p + 1 (the max possible
        rank, so every term is an integer >= 1). Pure Python-int
        arithmetic — no float summation, so the value is
        order-insensitive and bit-identical across engines (the SQL
        oracle recomputes it with the same integer terms)."""
        S = 64 - self.p + 1
        nz = self.registers[self.registers > 0]
        zeros = int(self.registers.size - nz.size)
        harmonic = sum(1 << (S - int(r)) for r in nz)
        return zeros, harmonic

    def estimate(self) -> float:
        """HLL estimate from the exact-integer harmonic sum: the
        float expression tree (literal-constant numerator / one
        integer-derived double, then the linear-counting branch on
        libm log) is kept IDENTICAL to the DuckDB oracle SQL so both
        engines produce the same IEEE double."""
        import math
        m = self.m
        S = 64 - self.p + 1
        zeros, harmonic = self.stats()
        alpha = 0.7213 / (1 + 1.079 / m)
        total_scaled = harmonic + zeros * (1 << S)  # rank-0 term = 2^S
        e = alpha * m * m * float(1 << S) / float(total_scaled)
        if e <= 2.5 * m and zeros:
            e = m * math.log(m / zeros)   # linear counting correction
        return float(e)

    def state(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_state(cls, data: bytes, p: int = 12, seed: int = 0) -> "HyperLogLog":
        h = cls(p, seed)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h
