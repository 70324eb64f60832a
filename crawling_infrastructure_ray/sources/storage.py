"""Documents-table storage layer (Lance per the north rule; parquet as
the environment-forced substitution).

BASELINE.json's north rule specifies "writing Lance tables ...
read_lance". This container has NO lance/pylance package and installs
are forbidden, so every table is written as hash-partitioned parquet
fragments instead — the same columnar, fragment-per-commit, resumable
layout Lance would give us (one fragment per lease/wave, atomic
tmp+rename writes, partition column ``url_hash_part``). This module is
the single seam where the substitution lives: the backend resolves to
``"lance"`` automatically when the package is importable, and
everything above it (`fetch_store_batch` fragments,
``read_documents``) goes through these helpers, so restoring the Lance
backend on a real cluster is a dependency change, not a refactor.

The substitution is also documented in README.md ("Storage backend")
and SURVEY.md §1.7.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

try:  # pragma: no cover - lance is absent in this container
    import lance  # type: ignore

    _HAS_LANCE = True
except ImportError:
    lance = None
    _HAS_LANCE = False

DEFAULT_BACKEND = "lance" if _HAS_LANCE else "parquet"


def backend_available(backend: str) -> bool:
    return backend == "parquet" or (backend == "lance" and _HAS_LANCE)


def write_fragment(tbl: pa.Table, out_dir: str, name: str,
                   backend: str | None = None) -> str:
    """Atomically write one fragment of a table.

    parquet: tmp-file + rename (crash-safe — a killed writer leaves no
    partial fragment visible); lance: append-mode ``write_dataset``
    (fragment commit is atomic in the Lance manifest).
    Returns the fragment path.
    """
    backend = backend or DEFAULT_BACKEND
    os.makedirs(out_dir, exist_ok=True)
    if backend == "lance":  # pragma: no cover - env-blocked
        lance.write_dataset(tbl, out_dir, mode="append")
        return out_dir
    path = os.path.join(out_dir, f"{name}.parquet")
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp, compression="snappy")
    os.replace(tmp, path)
    return path


def read_dataset(path: str, backend: str | None = None, *,
                 columns: list[str] | None = None) -> rd.Dataset:
    """The stored table as a streaming ``ray.data.Dataset``."""
    backend = backend or DEFAULT_BACKEND
    if backend == "lance":  # pragma: no cover - env-blocked
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)
