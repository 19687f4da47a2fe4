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


def strip_schema_metadata(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop schema-level metadata (e.g. parquet's ``pandas`` key) from every
    block. Schemas carrying metadata dicts are unhashable, which defeats
    Ray's schema-deduplication in the hash-shuffle path ("Failed to hash the
    schemas ... unhashable type: 'dict'") on every groupby/join over blocks
    read straight from pandas-written parquet. Zero-copy (metadata swap
    only) and fused into the adjacent map stage by the streaming planner."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def read_table(uri: str, columns: Optional[list] = None, **kwargs) -> ray.data.Dataset:
    """Read a document table as a Ray Dataset (column-pruned at the read)."""
    if _HAVE_LANCE and uri.endswith(".lance"):
        return strip_schema_metadata(ray.data.read_lance(uri, columns=columns, **kwargs))
    return strip_schema_metadata(ray.data.read_parquet(uri, columns=columns, **kwargs))


def write_table(ds: ray.data.Dataset, uri: str, **kwargs) -> None:
    """Write a Dataset as a directory of part files (resumable layout)."""
    if _HAVE_LANCE and uri.endswith(".lance"):
        ds.write_lance(uri, **kwargs)
    else:
        ds.write_parquet(uri, **kwargs)
