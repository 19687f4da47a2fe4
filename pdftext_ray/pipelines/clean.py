"""Composed corpus-cleaning pipeline: the canonical training-data flow.

    documents → quality/lang gates (vectorized, no shuffle)
              → exact dedup (hash groupby keeps min doc_id)
              → kept rows

All stages are the already-verified operators from pdftext_ray.ops composed
into one lazy Dataset graph — the filters run BEFORE the dedup shuffle so the
exchange only carries surviving (hash, doc_id) pairs. Thresholds are explicit
arguments mirrored exactly by the DuckDB oracle in __ray_entry__.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdftext_ray.ops import round_half_away
from pdftext_ray.ops.textstats import TOKEN_RE, _stop_counts


def quality_gate_batch(
    batch: pa.Table,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
    min_stop_ratio: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> pa.Table:
    """The per-batch quality/lang gate + survivor content hash shared by
    clean_corpus and the training-mixture pipeline. Emits
    (id, keep_cols..., n_tokens, alpha_ratio, stop_ratio, text_hash) for
    rows passing every threshold; hashes only the survivors (gates reject
    most docs in real cleaning)."""
    text = batch.column(text_col)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = pc.count_substring_regex(text, "[a-zA-Z]").to_numpy(zero_copy_only=False).astype(np.float64)
    stop = _stop_counts(text).astype(np.float64)
    alpha_ratio = n_alpha / np.maximum(n_chars, 1.0)
    stop_ratio = stop / np.maximum(n_tokens, 1.0)
    keep = (n_tokens >= min_tokens) & (alpha_ratio >= min_alpha_ratio) & (stop_ratio >= min_stop_ratio)
    arrays = [batch.column(id_col)]
    names = [id_col]
    for c in keep_cols:
        arrays.append(batch.column(c))
        names.append(c)
    arrays += [
        text,
        pa.array(n_tokens.astype(np.int64)),
        pa.array(round_half_away(alpha_ratio, 6)),
        pa.array(round_half_away(stop_ratio, 6)),
    ]
    names += ["__text", "n_tokens", "alpha_ratio", "stop_ratio"]
    kept = pa.Table.from_arrays(arrays, names=names).filter(pa.array(keep))
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in kept.column("__text").to_pylist()]
    return kept.drop_columns(["__text"]).append_column("text_hash", pa.array(digests, pa.string()))


def clean_corpus(
    ds: ray.data.Dataset,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
    min_stop_ratio: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Returns (doc_id, n_tokens, alpha_ratio, stop_ratio) for every KEPT doc:
    passes the quality/lang gates AND is the min-id representative of its
    exact-duplicate group."""
    import functools

    gated = ds.map_batches(
        functools.partial(
            quality_gate_batch,
            min_tokens=min_tokens,
            min_alpha_ratio=min_alpha_ratio,
            min_stop_ratio=min_stop_ratio,
            id_col=id_col,
            text_col=text_col,
        ),
        batch_format="pyarrow",
    )

    # dedup among survivors: keep the min doc_id per content hash; carry the
    # doc-level stats via min-aggregates (identical within a hash group).
    # text_hash cardinality ≈ corpus size, so this routes through the
    # few-partition hash shuffle + vectorized per-partition agg (CLAUDE.md
    # invariant 9) — a per-distinct-key Ray aggregate pays ~65 µs/key, which
    # at web scale IS the job.
    from pdftext_ray.ops.relational import hash_grouped_agg

    return hash_grouped_agg(
        gated,
        "text_hash",
        {
            id_col: (id_col, "min"),
            "n_tokens": ("n_tokens", "min"),
            "alpha_ratio": ("alpha_ratio", "min"),
            "stop_ratio": ("stop_ratio", "min"),
        },
    ).drop_columns(["text_hash"])
