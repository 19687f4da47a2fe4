"""End-to-end extraction pipelines (lazy Ray Data graphs; callers consume).

Plan shape (doc-parallel flagship):

    read_table (column-pruned) → [size pre-pass] → map_batches(DocumentExtractor,
    actor pool) → write / flatten — zero shuffles.

Skew handling (north rule): a cheap vectorized pre-pass computes
``payload_bytes`` per doc; docs above ``explode_threshold`` take the
page-exploded branch (pages decoded in parallel, one groupby(doc_id) shuffle
to reassemble), the rest take the fused doc-parallel branch; branches union.
At 10^12-doc scale this keeps one 5,000-page document from pinning a task
while the bulk of the corpus streams shuffle-free.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from pdftext_ray.kernel.document import ExtractConfig
from pdftext_ray.stages import extract as X
from pdftext_ray.storage import read_table


def _read_parallelism() -> int:
    """Read-task count: ~2 blocks per CPU. The streaming executor pays
    ~10-12 ms of serialized overhead PER TASK (measured: a 256-task pure-burn
    pipeline runs 1.54x its mp.Pool wall, 512 tasks 1.96x, 64 tasks 1.19x),
    so hundreds of small file-blocks cost seconds of pure scheduling; a few
    large blocks starve the pool. 2x CPUs keeps every core fed while keeping
    the per-task tax ~2% of a 2-3 s task."""
    try:
        import ray

        return 2 * int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 16


def read_documents(path: str, columns=("doc_id", "spans")) -> ray.data.Dataset:
    return read_table(path, columns=list(columns), override_num_blocks=_read_parallelism())


def _default_pool_size(reserve: int = 2) -> int:
    """Actor-pool size: node CPUs minus headroom for read/write stages, so
    the pool doesn't starve the rest of the pipeline (a pool reserving every
    CPU serializes the stages)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus - reserve)


def extract_spans(
    ds: ray.data.Dataset,
    cfg: Optional[ExtractConfig] = None,
    batch_size: int = 128,
    concurrency: Optional[int] = None,
) -> ray.data.Dataset:
    """Flagship doc-parallel span-sequence extraction (no shuffle).

    Note on the pool form: we pass a constructed INSTANCE, which Ray runs as
    a task pool (the callable pickles per task — cheap: it holds only the
    config dataclass). The expensive warm state (imports, unicode tables,
    compiled regexes) lives at module level and persists in Ray's reused
    worker processes either way. The class+fn_constructor_args actor-pool
    form was measured too: it pins `concurrency` CPUs per stage, which
    starves multi-branch plans (skew union + groupby) on small nodes, for
    <5% throughput difference on this workload.

    Concurrency is UNCAPPED by default (round-2 measurement: an explicit
    `concurrency=cpus-2` cap ran 13.0–15.2 s at the 100k-doc bench vs
    11.5–15.7 s uncapped — the cap never wins, and a fixed absolute reserve
    makes the worker pool grow super-proportionally between cluster sizes,
    muddying scaling measurements). Pass `concurrency` to bound the stage
    explicitly when co-scheduling against other pipelines.
    """
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(X.DocumentExtractor(cfg), **kwargs)


def extract_spans_exploded(
    ds: ray.data.Dataset,
    cfg: Optional[ExtractConfig] = None,
    page_batch_size: int = 128,
    concurrency: Optional[int] = None,
) -> ray.data.Dataset:
    """Page-exploded extraction for heavy documents: explode → per-page decode
    → groupby(doc_id).map_groups reassembly (the one shuffle, keyed doc_id)."""
    cfg = cfg or ExtractConfig()
    kwargs = dict(batch_format="pyarrow", batch_size=page_batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    pages = ds.map_batches(X.explode_pages, batch_format="pyarrow").map_batches(
        X.PageExtractor(cfg), **kwargs
    )
    return pages.groupby("doc_id").map_groups(
        lambda g: X.assemble_document(g, cfg), batch_format="pyarrow"
    )


def extract_spans_skew_aware(
    ds: ray.data.Dataset,
    cfg: Optional[ExtractConfig] = None,
    explode_threshold: Optional[int] = None,
    batch_size: int = 128,
) -> ray.data.Dataset:
    """Size-bucketed plan: small docs fused, huge docs page-exploded, union.

    NOTE: sizes in flight — the shared lineage (read + size pre-pass) executes
    once per branch. Prefer :func:`extract_corpus_skew_aware` over an
    ingest-bucketed corpus, which reads each branch's files exactly once.
    """
    cfg = cfg or ExtractConfig()
    if explode_threshold is None:
        from pdftext_ray.pipelines.corpus_io import SIZE_BUCKET_THRESHOLD

        explode_threshold = SIZE_BUCKET_THRESHOLD
    sized = ds.map_batches(X.payload_sizes, batch_format="pyarrow")
    small = sized.filter(expr=f"payload_bytes <= {explode_threshold}").drop_columns(["payload_bytes"])
    large = sized.filter(expr=f"payload_bytes > {explode_threshold}").drop_columns(["payload_bytes"])
    small_out = extract_spans(small, cfg, batch_size=batch_size)
    # heavy bucket: small page batches so one batch never holds two monsters
    large_out = extract_spans_exploded(large, cfg, page_batch_size=32)
    return small_out.union(large_out)


def _heavy_bucket_blocks(large_dir: str, nblocks: int) -> int:
    """Block count for the heavy-doc bucket, sized from parquet FOOTERS
    (row counts are free). Ray's default splitting gave the 8-row heavy
    bucket 64 blocks at bench scale, and the reassembly groupby inherits
    that as 64 sort partitions — ~13 s of pure shuffle fixed overhead for
    96 page rows (ds.stats audit, round 3). ~8 heavy docs (≈100 exploded
    pages) per block keeps the shuffle proportional to the data while
    4×read-parallelism caps it for genuinely large heavy buckets."""
    import glob as _glob
    import math
    import os as _os

    import pyarrow.parquet as _pq

    try:
        rows = sum(
            _pq.read_metadata(f).num_rows
            for f in _glob.glob(_os.path.join(large_dir, "**", "*.parquet"), recursive=True)
        )
    except OSError:  # unreadable footer only — anything else should surface
        return nblocks
    return max(2, min(math.ceil(rows / 8), 4 * nblocks))


def extract_corpus_skew_aware(
    path: str,
    cfg: Optional[ExtractConfig] = None,
    explode_threshold: Optional[int] = None,
    batch_size: int = 128,
) -> ray.data.Dataset:
    """Skew-bucketed plan over an ingested corpus: heavy documents take the
    page-exploded branch, the bulk takes the fused doc-parallel branch.

    If the corpus was written with hive ``size_bucket=small|large``
    partitions (pdftext_ray ingest does this), each branch reads ONLY its
    bucket's directory - routing costs zero extra scans. Otherwise both
    branches read with a parquet predicate pushdown on the ``n_bytes``
    ingest column. This is the 100 TB-correct layout - bucket at ingest,
    prune at the read (SURVEY.md §4 skew).
    """
    import os

    import pyarrow.compute as pc

    cfg = cfg or ExtractConfig()
    if explode_threshold is None:
        from pdftext_ray.pipelines.corpus_io import SIZE_BUCKET_THRESHOLD

        explode_threshold = SIZE_BUCKET_THRESHOLD
    small_dir = os.path.join(path, "size_bucket=small")
    large_dir = os.path.join(path, "size_bucket=large")
    nblocks = _read_parallelism()
    if os.path.isdir(small_dir):
        small = ray.data.read_parquet(
            small_dir, columns=["doc_id", "spans"], override_num_blocks=nblocks
        )
        large = (
            ray.data.read_parquet(
                large_dir, columns=["doc_id", "spans"],
                override_num_blocks=_heavy_bucket_blocks(large_dir, nblocks),
            )
            if os.path.isdir(large_dir)
            else None
        )
    else:
        small = ray.data.read_parquet(
            path, columns=["doc_id", "spans"], override_num_blocks=nblocks,
            filter=(pc.field("n_bytes") <= explode_threshold),
        )
        large = ray.data.read_parquet(
            path, columns=["doc_id", "spans"], filter=(pc.field("n_bytes") > explode_threshold)
        )
    small_out = extract_spans(small, cfg, batch_size=batch_size)
    if large is None:
        return small_out
    # heavy bucket: small page batches so one batch never holds two monsters
    large_out = extract_spans_exploded(large, cfg, page_batch_size=32)
    return small_out.union(large_out)


def flat_spans(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Span-sequence rows → one row per span (driver-comparable shape)."""
    return ds.map_batches(X.flatten_spans, batch_format="pyarrow")


def extract_plain_text(
    ds: ray.data.Dataset, cfg: Optional[ExtractConfig] = None, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(X.PlainTextExtractor(cfg), batch_format="pyarrow", batch_size=batch_size)


def extract_plain_text_corpus_skew_aware(
    path: str,
    cfg: Optional[ExtractConfig] = None,
    batch_size: int = 128,
) -> ray.data.Dataset:
    """Skew-bucketed PLAIN-TEXT plan over an ingested corpus — same routing
    as extract_corpus_skew_aware (hive size buckets, predicate-pushdown
    fallback), same reason: the fused doc-parallel map measures ~1.7 ms/doc
    single-core, but monster documents straggle whole batches (measured 25 s
    vs 16 s for the equivalent spans plans at 100k docs/32 cpus). Small
    bucket: fused PlainTextExtractor; large bucket: page-exploded decode →
    one keyed shuffle → doc-wide link resolution + merge."""
    import os

    import pyarrow.compute as pc

    cfg = cfg or ExtractConfig()
    from pdftext_ray.pipelines.corpus_io import SIZE_BUCKET_THRESHOLD

    small_dir = os.path.join(path, "size_bucket=small")
    large_dir = os.path.join(path, "size_bucket=large")
    nblocks = _read_parallelism()
    if os.path.isdir(small_dir):
        small = ray.data.read_parquet(
            small_dir, columns=["doc_id", "spans"], override_num_blocks=nblocks
        )
        large = (
            ray.data.read_parquet(
                large_dir, columns=["doc_id", "spans"],
                override_num_blocks=_heavy_bucket_blocks(large_dir, nblocks),
            )
            if os.path.isdir(large_dir)
            else None
        )
    else:
        small = ray.data.read_parquet(
            path, columns=["doc_id", "spans"], override_num_blocks=nblocks,
            filter=(pc.field("n_bytes") <= SIZE_BUCKET_THRESHOLD),
        )
        large = ray.data.read_parquet(
            path, columns=["doc_id", "spans"], filter=(pc.field("n_bytes") > SIZE_BUCKET_THRESHOLD)
        )
    small_out = extract_plain_text(small, cfg, batch_size=batch_size)
    if large is None:
        return small_out
    pages = large.map_batches(X.explode_pages, batch_format="pyarrow").map_batches(
        X.PageExtractor(cfg), batch_format="pyarrow", batch_size=32
    )
    large_out = pages.groupby("doc_id").map_groups(
        lambda g: X.assemble_plain_text(g, cfg), batch_format="pyarrow"
    )
    return small_out.union(large_out)


def extract_paginated_plain_text(
    ds: ray.data.Dataset, cfg: Optional[ExtractConfig] = None, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(
        X.PaginatedPlainTextExtractor(cfg), batch_format="pyarrow", batch_size=batch_size
    )


def extract_dictionary(
    ds: ray.data.Dataset, cfg: Optional[ExtractConfig] = None, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(X.DictionaryExtractor(cfg), batch_format="pyarrow", batch_size=batch_size)


def extract_tables(
    ds: ray.data.Dataset, cfg: Optional[ExtractConfig] = None, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(X.TableCellExtractor(cfg), batch_format="pyarrow", batch_size=batch_size)


def extract_tables_with_inputs(
    ds: ray.data.Dataset,
    table_inputs,  # pa.Table: doc_id, page, tables list<bbox4>, img_size list2
    cfg: Optional[ExtractConfig] = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """J5 keyed broadcast join: external detector regions broadcast once."""
    import ray as _ray

    ref = _ray.put(table_inputs)
    return ds.map_batches(
        X.TableCellExtractorWithInputs,
        fn_constructor_args=(ref, cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_default_pool_size(),
    )
