"""Input readers (reference S1-S6 ingest surface, SURVEY.md §2.1).

``read_table`` is the standard entry: parquet with column pruning
(prune at the read — only requested columns leave storage).
``read_items_file`` replaces the reference's hand-rolled 5 MB chunked
newline reader (lib/misc/helpers.ts:49-94 chunkRead) with
``ray.data.read_text``, which chunks into blocks natively and streams.
"""

from __future__ import annotations

import os

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """Read one synthetic table with column pruning pushed to the scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_items_file(path: str) -> rd.Dataset:
    """Newline-delimited items file → Dataset of {'item': str}.

    Reference: chunkRead splits 5 MB chunks on newlines and carries the
    partial tail line across chunks (lib/misc/helpers.ts:49-94);
    ray.data.read_text handles all of that natively. Gzip transparently
    supported via arrow (reference S3 gunzips downloads,
    crawltask.service.ts:1039-1067).
    """
    kwargs = {}
    if path.endswith(".gz"):
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = rd.read_text(path, **kwargs)
    return ds.map_batches(lambda b: {"item": b["text"]}, batch_format="numpy")
