"""Multimodal column stages — Ray-side plumbing, decode stubbed.

Media is carried as opaque references/bytes with typed metadata (the
input_hint documents table stores ``media_ref`` strings inside spans;
a payload variant stores a ``binary`` column). Image/audio codec
libraries are NOT in this container, so the decode kernel is a
clearly-marked stub: ``DecodeStub`` either raises NotImplementedError
(strict mode) or produces a deterministic fake feature vector derived
from the payload hash (test mode). Everything around it — schema,
batch sizing (small batches: wide binary rows), actor-pool signature,
output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),          # opaque bytes (empty when ref-only)
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def media_rows_from_spans(batch: pa.Table) -> pa.Table:
    """Explode documents' media spans into one row per media_ref with
    deterministic typed metadata (pure function of the ref)."""
    doc_ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    docs, refs, types, w, h, dur = [], [], [], [], [], []
    for doc, spans in zip(doc_ids, spans_col):
        for s in spans or []:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            hh = stable_hash64(ref)
            docs.append(doc)
            refs.append(ref)
            types.append(("image", "audio", "video")[hh % 3])
            w.append(160 + (hh >> 8) % 1920)
            h.append(120 + (hh >> 16) % 1080)
            dur.append(int((hh >> 24) % 300_000))
    return pa.table({"doc_id": pa.array(docs, pa.string()),
                     "media_ref": pa.array(refs, pa.string()),
                     "media_type": pa.array(types, pa.string()),
                     "width": pa.array(w, pa.int32()),
                     "height": pa.array(h, pa.int32()),
                     "duration_ms": pa.array(dur, pa.int32())})


class DecodeStub:
    """Actor-pool decode/feature-extract stage (A1-style heavyweight
    state). STUB: real codecs are unavailable in this container.

    mode='fake'  → deterministic 8-dim feature from the ref hash
                   (keeps downstream plumbing testable end to end)
    mode='strict'→ NotImplementedError (what production would replace
                   with a real decoder: PIL/libav model load in
                   __init__, batched decode in __call__)
    """

    FEATURE_DIM = 8

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode
        # real impl: load decoder/model ONCE per actor here

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "container; run with mode='fake' for the deterministic stub")
        refs = batch["media_ref"].to_pylist()
        feats = np.empty((len(refs), self.FEATURE_DIM))
        for i, ref in enumerate(refs):
            h = stable_hash64(ref)
            feats[i] = [((h >> (8 * j)) & 0xFF) / 255.0
                        for j in range(self.FEATURE_DIM)]
        return batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64())))


class ResizeStub:
    """Image resize stage stub: recomputes metadata (target box,
    aspect-preserving) without touching payload bytes."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["width"].to_pylist(), dtype=np.float64)
        h = np.asarray(batch["height"].to_pylist(), dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return (batch.append_column("resized_w", pa.array((w * scale).astype(np.int32)))
                     .append_column("resized_h", pa.array((h * scale).astype(np.int32))))


def frame_sample_plan(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling plan: one row per planned frame timestamp
    (plumbing only — extraction itself is the stubbed decode).
    Vectorized explode: per-video frame counts via ceil-div, then one
    np.repeat + offset arange — no per-ref Python loop."""
    mask = pc.equal(batch["media_type"], "video").to_numpy(
        zero_copy_only=False)
    refs = np.asarray(batch["media_ref"].to_pylist(), dtype=object)[mask]
    dur = batch["duration_ms"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[mask]
    n = (dur + every_ms - 1) // every_ms  # frames at 0..dur-1
    idx = np.repeat(np.arange(len(refs)), n)
    total = int(n.sum())
    starts = np.concatenate(([0], np.cumsum(n)))[:-1]
    offs = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
    return pa.table({"media_ref": pa.array(refs[idx], pa.string()),
                     "frame_ts_ms": pa.array(
                         (offs * every_ms).astype(np.int32), pa.int32())})
