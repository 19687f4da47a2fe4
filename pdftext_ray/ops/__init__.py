"""Training-data operators over document corpora (dedup, similarity search,
text analysis, multimodal plumbing) — the large-scale pipeline toolkit the
100 TB target needs alongside extraction (task brief: first-class components).
"""

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — matches DuckDB/SQL ROUND semantics.

    numpy/pandas round half-to-even, which disagrees with the SQL oracles at
    exact midpoints (e.g. 105/128 = 0.8203125 → SQL 0.820313, numpy
    0.820312), so every float column compared against an oracle goes through
    this instead.
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def default_num_partitions(
    per_cpu: int = 4,
    lo: int = 8,
    hi: int = 256,
    rows: int = None,
    rows_per_part: int = 20_000,
) -> int:
    """Partition count for few-partition keyed shuffles (shared policy for
    the pair-count, blob-merge and CC-contraction plans).

    Pass ``rows`` when the shuffled row count is already known for free
    (e.g. from a materialized upstream table): tiny inputs then get tiny
    partition counts — each partition of a keyed shuffle carries ~0.5-1 s of
    fixed cost on this executor, so 128 partitions over 5k rows doubles an
    op's wall time for nothing. Results are partition-count-independent
    (hash-bucket aggregation is associative), so the hint is purely a
    scheduling knob."""
    try:
        import ray

        base = max(lo, min(hi, int(ray.cluster_resources().get("CPU", 8)) * per_cpu))
    except Exception:
        base = 32
    if rows is not None:
        base = min(base, max(lo, -(-int(rows) // rows_per_part)))
    return base


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix view of a fixed-width ``list<float/double>`` column —
    flatten + reshape on the Arrow child buffer, replacing the
    ``np.asarray(col.to_pylist())`` per-row Python materialization that was
    the embedding ops' per-batch constant factor (the reference's
    vectorize-the-fold ethos, `pages.py:171-188`, applied to vectors).
    Values are bit-identical to the to_pylist path: float32 widens exactly,
    float64 passes through. Raises on ragged or null rows (embedding
    columns are fixed-dim by contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(a)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if a.null_count:
        raise ValueError("vec_matrix: embedding column has null rows")
    lens = pc.list_value_length(a).to_numpy(zero_copy_only=False)
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("vec_matrix: ragged list column (fixed dim required)")
    flat = a.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, dim).astype(dtype, copy=False)


def from_pandas_clean(df):
    """pandas → Arrow without the ``pandas`` schema-metadata dict.

    ``pa.Table.from_pandas`` attaches schema metadata that makes pyarrow
    Schemas unhashable, which defeats Ray's schema deduplication in every
    downstream hash shuffle ("Failed to hash the schemas ... unhashable
    type: 'dict'"). Every map_batches stage that converts a frame by hand
    must go through this instead.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

def transient_retry_args(max_retries: int = 3) -> dict:
    """``ray_remote_args`` enabling application-exception retry for a task
    stage (``map_batches`` with a plain function).

    On a large cluster, transient UDF failures — a flaky page decode, an
    OOM-killed worker mid-batch, a network hiccup fetching a blob — should
    re-execute the one failed task, not kill a multi-hour run. Ray retries
    SYSTEM failures by default but surfaces application exceptions
    immediately; opting a stage in via
    ``map_batches(fn, **transient_retry_args())`` (map_batches forwards
    extra kwargs to ``ray.remote``) bounds the
    blast radius of a transient bug to ``max_retries`` re-runs of one
    block. Deterministic failures still fail the run after the retries —
    this is containment, not error swallowing. (Actor-pool stages use
    ``max_task_retries`` on the actor instead; the checkpoint runner's
    partition manifests give the coarser whole-partition resume layer.)
    """
    return {"max_retries": int(max_retries), "retry_exceptions": True}


def money_cents(values) -> "np.ndarray":
    """Exact int64 cents from a 2-decimal float money column.

    Shared by every pandas-side fixed-point contract (invariant 13) so the
    rounding convention is half-away-from-zero EVERYWHERE — matching both
    DuckDB's ``round(value * 100)`` and the arrow-side
    ``pc.round(..., round_mode="half_towards_infinity")`` call sites. For
    genuinely 2-decimal inputs any mode agrees (value*100 is within an ulp
    of an integer, never at .5), but a per-call-site ``np.round``
    (half-to-even) would silently diverge from the oracle the first time a
    3-decimal value appears.
    """
    return round_half_away(np.asarray(values, dtype=np.float64) * 100.0, 0).astype(np.int64)


def assert_fixed_point_headroom(n_rows, per_row_bound: int, what: str) -> None:
    """Raise before an int64 fixed-point group sum can silently wrap.

    pandas/arrow integer sums are unchecked: a group with more than
    2^62 / per_row_bound rows can overflow int64 and return a WRONG total
    while the DuckDB oracle (HUGEINT) stays exact — the failure mode is
    invisible at gate scale by construction. ``n_rows``: per-group row
    counts (post-aggregation, free); ``per_row_bound``: documented max
    absolute fixed-point contribution of one row (e.g. 2^31 for e4
    revenue = prices ≤ ~$214k). Mirrors the PCA partial's overflow guard.
    """
    if len(n_rows) == 0:
        return
    worst = int(np.max(n_rows))
    if worst > (2**62) // int(per_row_bound):
        raise OverflowError(
            f"{what}: a group holds {worst} rows; int64 fixed-point sums "
            f"at per-row bound {per_row_bound} can wrap past 2^63. Split "
            "the aggregation into sub-group partials (or use a two-level "
            "hi/lo accumulator) before trusting these totals."
        )
