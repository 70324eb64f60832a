"""URL-seen membership filters for frontier shards.

The reference has NO dedup — duplicates are allowed in the queue
(master/src/services/crawltask.service.ts:782-785; SURVEY.md §1.1/A6).
These filters are the north-star addition: each frontier shard holds a
cuckoo filter (supports deletion, ~3% default FPP budget here far
tighter) over canonical-URL hashes; cold shards can start with the
cheaper bloom filter. Both are pure-numpy, serializable (for shard
checkpoints), and sized for hundreds of millions of keys per shard at
10^10-URL total scale (a 2^27-bucket cuckoo filter with 16-bit
fingerprints is 1 GiB per shard for ~500M keys; shards scale out).

Public algorithms: Bloom (CACM 1970); cuckoo filter (Fan et al.,
CoNEXT 2014).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import stable_hash64

_MASK = 0xFFFFFFFFFFFFFFFF


class BloomFilter:
    """Classic bloom filter over 64-bit key hashes.

    ``capacity`` items at ``fpp`` false-positive rate. Double hashing
    (Kirsch-Mitzenmacher): g_i(x) = h1 + i*h2 mod m.
    """

    def __init__(self, capacity: int = 1_000_000, fpp: float = 0.01, seed: int = 0):
        capacity = max(1, capacity)
        m = int(np.ceil(-capacity * np.log(fpp) / (np.log(2) ** 2)))
        self.num_bits = max(64, m)
        self.num_hashes = max(1, int(round(self.num_bits / capacity * np.log(2))))
        self.bits = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)
        self.seed = seed
        self.count = 0

    def _positions(self, key_hash: int) -> np.ndarray:
        h1 = key_hash & _MASK
        h2 = (stable_hash64(key_hash.to_bytes(8, "little"), self.seed ^ 0xA5A5) | 1) & _MASK
        idx = (h1 + np.arange(self.num_hashes, dtype=np.uint64) * h2) % np.uint64(self.num_bits)
        return idx

    def add_hash(self, key_hash: int) -> bool:
        """Insert; returns True if the key was (probably) new."""
        pos = self._positions(key_hash)
        word, bit = pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
        present = bool(np.all(self.bits[word] & bit))
        np.bitwise_or.at(self.bits, word, bit)  # .at handles duplicate word indices
        if not present:
            self.count += 1
        return not present

    def contains_hash(self, key_hash: int) -> bool:
        pos = self._positions(key_hash)
        word, bit = pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
        return bool(np.all(self.bits[word] & bit))

    def add(self, key: str) -> bool:
        return self.add_hash(stable_hash64(key, self.seed))

    def contains(self, key: str) -> bool:
        return self.contains_hash(stable_hash64(key, self.seed))

    # -- checkpointing -------------------------------------------------
    def state(self) -> dict:
        return {"kind": "bloom", "num_bits": self.num_bits, "num_hashes": self.num_hashes,
                "seed": self.seed, "count": self.count, "bits": self.bits.tobytes()}

    @classmethod
    def from_state(cls, st: dict) -> "BloomFilter":
        f = cls.__new__(cls)
        f.num_bits, f.num_hashes = st["num_bits"], st["num_hashes"]
        f.seed, f.count = st["seed"], st["count"]
        f.bits = np.frombuffer(st["bits"], dtype=np.uint64).copy()
        return f


class CuckooFilter:
    """Cuckoo filter with 4-slot buckets and 16-bit fingerprints.

    Supports delete (needed when a lease is rolled back in dedup mode
    and the URL must become insertable again — the bloom filter can't
    do that). Partial-key cuckoo hashing: alternate bucket =
    i ^ hash(fingerprint).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1_000_000, seed: int = 0):
        nbuckets = 1
        while nbuckets * self.SLOTS < capacity * 1.05:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)  # 0 = empty
        self.seed = seed
        self.count = 0
        self._rng = np.random.default_rng(seed ^ 0xC0C0)

    def _fp_and_index(self, key_hash: int) -> tuple[int, int]:
        fp = (key_hash & 0xFFFF) or 1  # fingerprint 1..65535 (0 means empty)
        i1 = (key_hash >> 16) & (self.nbuckets - 1)
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        return (i ^ stable_hash64(fp.to_bytes(2, "little"), self.seed ^ 0x5C5C)) & (self.nbuckets - 1)

    def contains_hash(self, key_hash: int) -> bool:
        fp, i1 = self._fp_and_index(key_hash)
        if fp in self.table[i1]:
            return True
        return fp in self.table[self._alt_index(i1, fp)]

    def add_hash(self, key_hash: int) -> bool:
        """Insert; returns True if newly inserted, False if already present.

        Raises RuntimeError when full (caller should grow / re-shard).
        """
        if self.contains_hash(key_hash):
            return False
        fp, i1 = self._fp_and_index(key_hash)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop — record the kick path so a failed insert can be
        # rolled back atomically: without the rollback, the last
        # displaced victim fingerprint would be dropped from the table,
        # turning a previously-seen key into a false negative (possible
        # duplicate crawl) when the caller opens a new filter tier.
        i = i1 if self._rng.integers(2) == 0 else i2
        kicks: list[tuple[int, int, int]] = []  # (bucket, slot, displaced_fp)
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            kicks.append((i, slot, fp))
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # undo every kick in reverse: each step put the new/previous fp
        # into (bucket, slot) and took the old one in hand — restore it
        for bucket, slot, displaced in reversed(kicks):
            self.table[bucket, slot] = displaced
        raise RuntimeError("cuckoo filter full; grow capacity or add shards")

    def delete_hash(self, key_hash: int) -> bool:
        fp, i1 = self._fp_and_index(key_hash)
        for i in (i1, self._alt_index(i1, fp)):
            row = self.table[i]
            hit = np.flatnonzero(row == fp)
            if hit.size:
                row[hit[0]] = 0
                self.count -= 1
                return True
        return False

    def add(self, key: str) -> bool:
        return self.add_hash(stable_hash64(key, self.seed))

    def contains(self, key: str) -> bool:
        return self.contains_hash(stable_hash64(key, self.seed))

    def delete(self, key: str) -> bool:
        return self.delete_hash(stable_hash64(key, self.seed))

    # -- checkpointing -------------------------------------------------
    def state(self) -> dict:
        return {"kind": "cuckoo", "nbuckets": self.nbuckets, "seed": self.seed,
                "count": self.count, "table": self.table.tobytes()}

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.nbuckets, f.seed, f.count = st["nbuckets"], st["seed"], st["count"]
        f.table = np.frombuffer(st["table"], dtype=np.uint16).reshape(f.nbuckets, cls.SLOTS).copy()
        f._rng = np.random.default_rng(f.seed ^ 0xC0C0)
        return f


class ScalableSeenFilter:
    """Unbounded-capacity membership: a chain of cuckoo filters.

    Cuckoo/bloom filters cannot grow in place (growing needs original
    keys, which are deliberately not stored). The standard fix
    (Almeida et al., 'Scalable Bloom Filters', 2007) is a chain: query
    every filter; insert into the newest; when the newest reaches its
    load limit, open a new filter with 2x capacity. Lookup cost grows
    O(log(total/initial)) — bounded and cheap.

    This is what lets a frontier shard absorb an unplanned number of
    URLs (10^10-scale runs) without a hard capacity failure.
    """

    GROWTH = 2
    LOAD_LIMIT = 0.9

    def __init__(self, capacity: int = 1 << 20, seed: int = 0):
        self.seed = seed
        self.initial_capacity = capacity
        self.filters: list[CuckooFilter] = [CuckooFilter(capacity, seed)]
        self._cap = capacity

    @property
    def count(self) -> int:
        return sum(f.count for f in self.filters)

    def contains_hash(self, key_hash: int) -> bool:
        return any(f.contains_hash(key_hash) for f in self.filters)

    def add_hash(self, key_hash: int) -> bool:
        if self.contains_hash(key_hash):
            return False
        newest = self.filters[-1]
        if newest.count >= self.LOAD_LIMIT * newest.nbuckets * newest.SLOTS:
            self._cap *= self.GROWTH
            newest = CuckooFilter(self._cap, self.seed ^ len(self.filters))
            self.filters.append(newest)
        try:
            return newest.add_hash(key_hash)
        except RuntimeError:
            # eviction-loop failure before the load limit — open the
            # next tier and retry
            self._cap *= self.GROWTH
            nxt = CuckooFilter(self._cap, self.seed ^ len(self.filters))
            self.filters.append(nxt)
            return nxt.add_hash(key_hash)

    def add(self, key: str) -> bool:
        return self.add_hash(stable_hash64(key, self.seed))

    def contains(self, key: str) -> bool:
        return self.contains_hash(stable_hash64(key, self.seed))

    def state(self) -> dict:
        return {"kind": "scalable", "seed": self.seed,
                "initial_capacity": self.initial_capacity, "cap": self._cap,
                "filters": [f.state() for f in self.filters]}

    @classmethod
    def from_state(cls, st: dict) -> "ScalableSeenFilter":
        f = cls.__new__(cls)
        f.seed = st["seed"]
        f.initial_capacity = st["initial_capacity"]
        f._cap = st["cap"]
        f.filters = [CuckooFilter.from_state(s) for s in st["filters"]]
        return f


class ExactSeenSet:
    """EXACT membership on stable_hash64(canonical url) — the
    conformance/soak-mode seen set.

    The endurance soak found that approximate membership makes the
    final document SET order-dependent at scale: a cuckoo (or bloom)
    false positive silently drops a genuinely-new URL, and WHICH URL
    collides depends on insertion order — two drains of the same
    frontier differ by ~1 URL per ~10^6 under the async pump's
    nondeterministic completion order. Exact runs (kill/resume
    equality gates, conformance crawls) use this set; the cuckoo chain
    remains the 10^10 path (1-2 B/key vs ~35 B/key here; a 64-bit
    hash collision is ~n²/2^65 — immaterial at any feasible n).
    """

    def __init__(self, seed: int = 42):
        self.seed = seed
        self._s: set[int] = set()

    def add_hash(self, key_hash: int) -> bool:
        if key_hash in self._s:
            return False
        self._s.add(key_hash)
        return True

    def add(self, key: str) -> bool:
        return self.add_hash(stable_hash64(key, self.seed))

    def contains(self, key: str) -> bool:
        return stable_hash64(key, self.seed) in self._s

    def __len__(self) -> int:
        return len(self._s)

    def state(self) -> dict:
        return {"kind": "exact", "seed": self.seed,
                "keys": np.fromiter(self._s, dtype=np.uint64,
                                    count=len(self._s))}

    @classmethod
    def from_state(cls, st: dict) -> "ExactSeenSet":
        f = cls(st["seed"])
        f._s = set(int(x) for x in st["keys"])
        return f
