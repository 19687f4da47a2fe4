"""Lance-or-Parquet storage abstraction (SURVEY.md §7).

The engine's canonical table format is Lance (per the north rule); this
sandbox has no ``pylance`` wheel, so the same schema round-trips through
Parquet. All call sites go through these two functions; swapping the format
is a deployment detail, not a code change.
"""

from __future__ import annotations

from typing import Optional

import ray.data

try:  # pragma: no cover - lance not installed in this sandbox
    import lance  # noqa: F401

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def have_lance() -> bool:
    return _HAVE_LANCE


def _stripped_file_schema(uri: str, columns: Optional[list]):
    """Metadata-free read schema for a single parquet file.

    Pandas-written parquet carries a ``pandas`` schema-metadata dict that
    makes pyarrow Schemas UNHASHABLE, defeating Ray's schema-deduplication in
    every downstream hash shuffle ("Failed to hash the schemas ...
    unhashable type: 'dict'"). Passing an explicit stripped schema to
    ``read_parquet`` removes the metadata at the source (a downstream strip
    stage is too late — the read operator's own blocks already warn).
    Directory reads return None: our ingested corpora are Ray-written (no
    pandas metadata) and may be hive-partitioned, where an explicit schema
    would drop the partition column.
    """
    import os

    if os.path.isdir(uri):
        return None
    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pq.read_schema(uri).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def read_table(uri: str, columns: Optional[list] = None, **kwargs) -> ray.data.Dataset:
    """Read a document table as a Ray Dataset (column-pruned at the read).

    Format dispatch by extension: ``.lance`` (when pylance is installed),
    ``.jsonl``/``.json`` (newline-delimited JSON), ``.csv``, else Parquet
    (the canonical format). For row-oriented formats column pruning happens
    AFTER parse (``select_columns``) — the format physically stores whole
    rows; at 100 TB convert to Parquet/Lance at ingest and prune at the
    read.
    """
    if _HAVE_LANCE and uri.endswith(".lance"):
        return ray.data.read_lance(uri, columns=columns, **kwargs)
    if uri.endswith((".jsonl", ".json")):
        ds = ray.data.read_json(uri, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if uri.endswith(".csv"):
        ds = ray.data.read_csv(uri, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if "schema" not in kwargs:
        try:
            sch = _stripped_file_schema(uri, columns)
        except Exception:
            sch = None
        if sch is not None:
            kwargs["schema"] = sch
    return ray.data.read_parquet(uri, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, uri: str, **kwargs) -> None:
    """Write a Dataset as a directory of part files (resumable layout).

    Format dispatch mirrors :func:`read_table`: ``.lance`` / ``.jsonl`` /
    ``.csv`` by extension, Parquet otherwise.
    """
    if _HAVE_LANCE and uri.endswith(".lance"):
        ds.write_lance(uri, **kwargs)
    elif uri.endswith((".jsonl", ".json")):
        ds.write_json(uri, **kwargs)
    elif uri.endswith(".csv"):
        ds.write_csv(uri, **kwargs)
    else:
        ds.write_parquet(uri, **kwargs)
