"""K7 sample-download/export bundling (reference ``downloadSample``,
master/src/services/crawltask.service.ts:208-253: inflate the N most
recent result blobs and tar them for download).

Rebuild: take the top-N most recent documents (highest enqueue_seq —
the insertion-order recency key; the reference sorts ``-crawled``),
serialize each document's interleaved spans as one JSON member named
``<doc_id>.json``, and write a tar archive. Only the N selected
documents are ever collected — the sort+limit runs distributed and the
driver streams just the sample into the tar.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
import ray.data as rd


def export_sample_tar(docs: rd.Dataset, tar_path: str, n: int = 20) -> pd.DataFrame:
    """Bundle the ``n`` most recent documents into ``tar_path``.

    Returns the member listing (name, size_bytes, n_spans) — the
    audit record of what was exported.
    """
    sample = (docs.select_columns(["doc_id", "url", "enqueue_seq", "spans"])
              .sort(["enqueue_seq", "doc_id"], descending=[True, False])
              .limit(n).to_pandas())
    os.makedirs(os.path.dirname(tar_path) or ".", exist_ok=True)
    rows = []
    with tarfile.open(tar_path, "w:gz") as tf:
        for _, r in sample.iterrows():
            payload = json.dumps(
                {"doc_id": r["doc_id"], "url": r["url"],
                 "enqueue_seq": int(r["enqueue_seq"]),
                 "spans": [dict(s) for s in r["spans"]]},
                sort_keys=True).encode()
            info = tarfile.TarInfo(name=f"{r['doc_id']}.json")
            info.size = len(payload)
            info.mtime = 0  # deterministic archive
            tf.addfile(info, io.BytesIO(payload))
            rows.append({"name": info.name, "size_bytes": len(payload),
                         "n_spans": len(r["spans"])})
    return (pd.DataFrame(rows, columns=["name", "size_bytes", "n_spans"])
            .sort_values("name").reset_index(drop=True))
